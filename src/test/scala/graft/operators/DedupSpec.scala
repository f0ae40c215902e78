package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: 3-gram windows, distinct, short-doc guard") {
    val out = Seq("a b c d", "a b", "x").toDF("text")
      .select(Dedup.shingles($"text").as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b")) // < 3 tokens → whole doc as one shingle
    assert(out(2) == Seq("x"))
  }

  test("minhash LSH finds planted near-duplicates and skips distinct docs") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 59).map(i => s"w$i").mkString(" ") + " CHANGED"
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("mega-bucket guard: candidate volume stays O(B) on a planted bucket") {
    // 500 identical docs — every band puts them in ONE bucket. All-pairs
    // would be 500·499/2 ≈ 125k candidates; the guard pairs adjacent ids
    // instead: 499 distinct chain pairs (identical across bands).
    val boiler = (1 to 40).map(i => s"b$i").mkString(" ")
    val mega = (0 until 500).map(i => (i.toLong, boiler))
    val other = (1000 until 1010).map(i =>
      (i.toLong, (i * 100 to i * 100 + 40).map(j => s"u$j").mkString(" ")))
    val docs = (mega ++ other).toDF("doc_id", "text")
    val cands = Dedup.candidatePairs(docs)
    val n = cands.count()
    assert(n == 499L, s"candidate count was $n, want 499 (B-1 chain pairs)")
    // the chain still recovers the full duplicate set as ONE cluster
    val clusters = Dedup.connectedComponents(Dedup.minhashPairs(docs, 0.9))
    val byCluster = clusters.groupBy("cluster_id").count()
      .as[(Long, Long)].collect().toMap
    assert(byCluster == Map(0L -> 500L), s"clusters were $byCluster")
  }

  test("small buckets keep exhaustive all-pairs candidates") {
    // 3 identical docs (bucket size 3 ≤ threshold) → all 3 pairs emitted
    val txt = (1 to 30).map(i => s"s$i").mkString(" ")
    val docs = Seq((1L, txt), (2L, txt), (3L, txt)).toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(docs)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("adaptive threshold: typical buckets widen it, the cap bounds outliers") {
    import spark.implicits._
    // synthetic bucket frame: 100 buckets of size 3 and 5 of size 200 —
    // a "short docs, low signature diversity" corpus where 200-doc
    // buckets are normal. p99 lands on 200, so the adaptive threshold
    // lets them pair exhaustively instead of degrading recall.
    val buckets = ((0 until 100).flatMap(b =>
      (0 until 3).map(i => (0, b.toLong, (b * 10 + i).toLong))) ++
      (100 until 105).flatMap(b =>
        (0 until 200).map(i => (0, b.toLong, (10000 + b * 1000 + i).toLong))))
      .toDF("band", "band_hash", "doc_id")
    val t = Dedup.observedBucketThreshold(buckets)
    assert(t == 200, s"threshold $t, want 200 (p99 of observed sizes)")
    // uniform tiny buckets: stays at the fixed floor
    val uniform = (0 until 200).flatMap(b =>
      (0 until 2).map(i => (0, b.toLong, (b * 10 + i).toLong)))
      .toDF("band", "band_hash", "doc_id")
    assert(Dedup.observedBucketThreshold(uniform) == Dedup.MegaBucketThreshold)
    // degenerate corpus: one colossal bucket — the cap still guards it
    val giant = (0 until 5000).map(i => (0, 1L, i.toLong))
      .toDF("band", "band_hash", "doc_id")
    assert(Dedup.observedBucketThreshold(giant) == 1024)
  }

  test("adaptive threshold recovers all-pairs recall on a moderate bucket") {
    // 100 near-identical docs: bucket size 100 > fixed 64 → chain pairs
    // only; with the adaptive override (p99 = 100) all-pairs come back.
    val boiler = (1 to 40).map(i => s"m$i").mkString(" ")
    val docs = (0 until 100).map(i => (i.toLong, boiler)).toDF("doc_id", "text")
    val fixed = Dedup.candidatePairs(docs).count()
    assert(fixed == 99L, s"fixed-threshold chain pairs: $fixed")
    val sigs = docs.select(col("doc_id"),
      graft.functions.MinHashFunctions.minhash_signature(col("text")).as("sig"))
    val t = Dedup.observedBucketThreshold(Dedup.bandedBuckets(sigs))
    assert(t == 100, s"adaptive threshold $t")
    val adaptive = Dedup.candidatePairs(docs, Some(t)).count()
    assert(adaptive == 100L * 99 / 2, s"adaptive all-pairs: $adaptive")
  }

  test("minhash signature is deterministic across evaluations") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val s1 = Dedup.signatures(docs).select("sig").head().getSeq[Long](0)
    val s2 = Dedup.signatures(docs).select("sig").head().getSeq[Long](0)
    assert(s1 == s2 && s1.length == Dedup.NumHashes)
  }

  test("native MinHashSignature is bit-identical to the aggregate formulation") {
    val corpus = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select($"doc_id", $"text")
    val native = Dedup.signatures(corpus).select($"doc_id", $"sig")
    val agg = Dedup.aggSignatures(corpus)
      .select($"doc_id", $"sig".as("agg_sig"))
    val mismatches = native.join(agg, "doc_id")
      .filter($"sig" =!= $"agg_sig").count()
    assert(mismatches == 0L)
  }

  test("native SimHash64 is bit-identical to the interpreted HOF fold") {
    // real corpus text + synthetic edge cases (empty, whitespace-only,
    // single token, mixed case)
    val corpus = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select($"doc_id", $"text")
    val edge = Seq((9001L, ""), (9002L, "   "), (9003L, "One"),
      (9004L, "a A a\tB b")).toDF("doc_id", "text")
    val mismatches = corpus.union(edge)
      .select($"doc_id",
        graft.functions.SimHashFunctions.simhash64($"text").as("native"),
        Dedup.hofSimhash($"text").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(mismatches == 0L)
  }

  test("simhash: identical docs collide, near-dups within small hamming") {
    val base = (1 to 50).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, base + " x y z"))
      .toDF("doc_id", "text")
    val sims = Dedup.withSimhash(docs).orderBy("doc_id")
      .select("simhash").as[Long].collect()
    assert(sims(0) == sims(1))
    val hamming = java.lang.Long.bitCount(sims(0) ^ sims(2))
    assert(hamming <= 8, s"near-dup hamming was $hamming")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("simhash mega-bucket guard: candidate volume stays O(B·k) on a planted bucket") {
    // 500 identical docs share all 4 simhash chunks — all-pairs banding
    // would emit 4 × 500·499/2 ≈ 500k candidates; the guard pairs each
    // doc with its next SimhashMegaAdjacency ranks instead: O(B·k) per
    // chunk, and the 4 chunks emit the SAME rank pairs (identical sort).
    val boiler = (1 to 40).map(i => s"m$i").mkString(" ")
    val mega = (0 until 500).map(i => (i.toLong, boiler))
    val other = (1000 until 1010).map(i =>
      (i.toLong, (i * 50 to i * 50 + 40).map(j => s"w$j").mkString(" ")))
    val docs = (mega ++ other).toDF("doc_id", "text")
    val k = Dedup.SimhashMegaAdjacency
    val cands = Dedup.simhashCandidates(docs).count()
    assert(cands <= 4L * 500 * k + 100, s"candidate volume was $cands — guard regressed")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
    // next-k pairing over 500 equal sigs: Σ_{d=1..k} (500 − d) distinct pairs
    val expected = (1 to k).map(500 - _).sum.toLong
    assert(pairs.count() == expected)
    // the Hamming-0 chain still recovers the duplicate set as ONE cluster
    val byCluster = Dedup.connectedComponents(pairs)
      .groupBy("cluster_id").count().as[(Long, Long)].collect().toMap
    assert(byCluster == Map(0L -> 500L), s"clusters were $byCluster")
  }

  test("simhash heterogeneous mega-bucket: sorted-fingerprint recall, quantified") {
    // The regime the docstring's recall bound describes: >64 docs share
    // ONE 16-bit chunk value WITHOUT being near-identical. Planted
    // fingerprints (not texts) pin the behavior exactly:
    //  - a Hamming-2 pair whose ends sort ADJACENT in the remaining bits
    //    is recovered even though the bucket is mega;
    //  - a Hamming-1 pair separated by > SimhashMegaAdjacency ranks is
    //    MISSED — the documented recall-for-scale trade;
    //  - precision stays 1.0 (every emitted pair verified ≤ maxHamming).
    // All 100 docs share chunks 0-2 (⇒ THREE mega buckets, each holding
    // every doc, each with the SAME sort order) and differ only in chunk
    // 3 — so the only candidate path is mega-bucket rank pairing; there
    // is no small-bucket fallback that could mask the recall behavior.
    def sig(c3: Long): Long = (c3 << 48) | (0x0ABCL << 32) | (0x5678L << 16) | 0x1234L
    val fillers = (0 until 96).map(i => (i.toLong, sig(0x0200L + i * 0x40L)))
    val nearA = (200L, sig(0x0100L))
    val nearB = (201L, sig(0x0101L))   // hamming 1, numerically adjacent sort
    val farA  = (300L, sig(0x0000L))   // sorts first
    val farB  = (301L, sig(0x4000L))   // hamming 1 from farA, sorts after all fillers
    val sigs = (fillers ++ Seq(nearA, nearB, farA, farB)).toDF("doc_id", "simhash")
    // precondition: enough docs sort between the far pair's ends
    val between = fillers.count { case (_, s) => s > farA._2 && s < farB._2 }
    assert(between > Dedup.SimhashMegaAdjacency,
      s"planted gap too small ($between) — adjust the far pair")
    val cands = Dedup.simhashCandidatesFromSigs(sigs)
    val volume = cands.count()
    assert(volume <= 4L * 100 * Dedup.SimhashMegaAdjacency + 200,
      s"candidate volume was $volume — mega guard not engaged")
    val pairs = cands.distinct().filter($"hamming" <= 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((200L, 201L)), "adjacent-sort near pair must be recovered")
    assert(!pairs.contains((300L, 301L)),
      "far pair recovered — the documented miss regime changed; update the recall bound docs")
    // precision 1.0: every emitted pair is a true ≤3-Hamming pair
    val all = (fillers ++ Seq(nearA, nearB, farA, farB)).toMap
    pairs.foreach { case (x, y) =>
      assert(java.lang.Long.bitCount(all(x) ^ all(y)) <= 3)
    }
  }

  test("simhash pairs equal brute-force Hamming pairs on the gate corpus") {
    // Banding at maxHamming=3 over 4 chunks is lossless (pigeonhole: ≤3
    // differing bits leave ≥1 of the 4 16-bit chunks equal), so on a
    // corpus with no mega buckets the guarded pair set must EQUAL the
    // all-pairs Hamming compare — pins "rows unchanged" for the guard.
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf0001)
      .select($"doc_id", $"text")
    val got = Dedup.simhashPairs(docs, maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sims = Dedup.withSimhash(docs)
    val a = sims.select($"doc_id".as("doc_a"), $"simhash".as("sa"))
    val b = sims.select($"doc_id".as("doc_b"), $"simhash".as("sb"))
    val brute = a.join(b, $"doc_a" < $"doc_b")
      .filter(bit_count($"sa".bitwiseXOR($"sb")) <= 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == brute)
  }

  test("simhash gate envelopes hold on the gate corpus") {
    val env = Dedup.ddSimhashEnvelope(spark, graft.TestSpark.sf0001).collect()(0)
    assert(env.getAs[Long]("n_mismatch") == 0L)
    assert(env.getAs[Boolean]("kernels_agree"))
    val pe = Dedup.ddSimhashPairsEnvelope(spark, graft.TestSpark.sf0001).collect()(0)
    assert(pe.getAs[Long]("n_true_highsim") > 0L)
    assert(pe.getAs[Boolean]("precision_ok"), "unigram-jaccard precision floor broken")
    assert(pe.getAs[Boolean]("recall_ok"), "trigram-jaccard recall ratio floor broken")
  }

  test("positional shingles: 0-based positions, duplicates kept, short docs empty") {
    import spark.implicits._
    val out = Seq("A b c b c", "x y").toDF("text")
      .select(graft.functions.ShingleFunctions
        .positional_shingles(col("text"), 3).as("sh"))
      .select(explode(col("sh")).as("g"))
      .select(col("g.pos"), col("g.gram"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // lowercased, sliding, positions 0..2; the 2-token doc emits nothing
    assert(out == Seq((0, "a b c"), (1, "b c b"), (2, "c b c")))
  }

  test("duplicate spans: shared W-token run found, coverage exact, clean docs zero") {
    import spark.implicits._
    // docs 1+2 share a 10-token run (→ three 8-gram starts each, covering
    // 10 tokens); doc 3 is disjoint
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val d1 = s"$shared ${(1 to 5).map(i => s"a$i").mkString(" ")}"   // 15 toks
    val d2 = s"${(1 to 4).map(i => s"b$i").mkString(" ")} $shared"   // 14 toks
    val d3 = (1 to 20).map(i => s"c$i").mkString(" ")                // 20 toks
    val dir = java.nio.file.Files.createTempDirectory("dupspans").toString
    Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.ddDupSpans(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(1L) == ((15L, 3L, 10L, 10.0 / 15)), rows(1L).toString)
    assert(rows(2L) == ((14L, 3L, 10L, 10.0 / 14)), rows(2L).toString)
    assert(rows(3L) == ((20L, 0L, 0L, 0.0)), rows(3L).toString)
  }

  test("hashed-gram production flavor matches the string-gram gate flavor") {
    import spark.implicits._
    // real corpus (sf0.001, 500 docs with genuine cross-doc duplicates):
    // keying the gram shuffle by xxhash64 must not change a single row
    val dir = graft.TestSpark.sf0001
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().toSeq
    assert(sorted(Dedup.ddDupSpansHashed(spark, dir)) ==
      sorted(Dedup.ddDupSpans(spark, dir)))
  }

  test("decontamination flags planted eval-overlap, exact counts") {
    import spark.implicits._
    // doc 25 is "eval" (25 % 25 == 0); train doc 1 embeds eval's 8-token
    // run, train doc 2 is clean, train doc 3 is too short to shingle
    val run = (1 to 8).map(i => s"e$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    Seq(
      (25L, s"$run x1 x2"),                                   // eval: 3 grams
      (1L, s"t1 t2 $run t3"),                                 // overlaps: 1 gram of 4
      (2L, (1 to 12).map(i => s"c$i").mkString(" ")),          // clean: 5 grams
      (3L, "too short")                                        // < 8 tokens
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Dedup.ddDecontaminate(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(rows.keySet == Set(1L, 2L))
    assert(rows(1L) == ((4L, 1L, true)), rows(1L).toString)
    assert(rows(2L) == ((5L, 0L, false)), rows(2L).toString)
  }

  test("decontamination hashed flavor matches string flavor on real corpus") {
    import spark.implicits._
    val dir = graft.TestSpark.sf0001
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect().toSeq
    assert(sorted(Dedup.ddDecontaminateHashed(spark, dir)) ==
      sorted(Dedup.ddDecontaminate(spark, dir)))
  }

  test("incremental minhash: batch near-dups found vs corpus, bipartite, cap bounds fan-out") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"tok$i").mkString(" ") + " changed"
    val dir = java.nio.file.Files.createTempDirectory("mhinc").toString
    // corpus = ids not ≡0 mod 10 (three copies of `base` + one unrelated);
    // batch = ids ≡0 mod 10 (one near-dup of base, one unrelated)
    Seq((1L, base), (2L, base), (3L, base),
      (4L, (1 to 30).map(i => s"other$i").mkString(" ")),
      (10L, nearDup),
      (20L, (1 to 30).map(i => s"unique$i").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Dedup.ddMinhashIncremental(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // batch doc 10 pairs with every corpus copy of base; nothing else, and
    // never corpus-corpus (1,2,3 are mutual dups but not emitted)
    assert(pairs == Set((10L, 1L), (10L, 2L), (10L, 3L)), pairs.toString)
    // the per-doc cap bounds verification fan-out but still flags the doc
    val capped = Dedup.minhashIncrementalPairs(
      spark.read.parquet(s"$dir/documents.parquet").filter($"doc_id" % 10 === 0),
      spark.read.parquet(s"$dir/documents.parquet").filter($"doc_id" % 10 =!= 0),
      Dedup.MinhashThreshold, perDocCap = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((10L, 1L), (10L, 2L)), capped.toString)
  }

  test("adaptive per-doc cap: p99 of normal fan-outs, outliers truncated") {
    import spark.implicits._
    // 300 batch docs with 1 candidate each + one boilerplate doc with 500
    // (outlier beyond the p99 rank): p99 of fan-outs is 1 → the outlier
    // is capped at the floor, normals untouched
    val cands = ((1 to 300).map(b => (b.toLong, 1000L + b)) ++
      (1 to 500).map(c => (999L, 2000L + c)))
      .toDF("batch_doc", "corpus_doc")
    val cap = Dedup.observedPerDocCap(cands)
    assert(cap >= 16 && cap < 500, s"cap $cap")
    // empty candidate set falls back to the floor
    assert(Dedup.observedPerDocCap(
      Seq.empty[(Long, Long)].toDF("batch_doc", "corpus_doc")) == 16)
  }

  test("streaming exact-dedup gate equals batch DISTINCT across micro-batches") {
    import spark.implicits._
    val dir = graft.TestSpark.sf0001
    val streamed = Dedup.ddStreamExact(spark, dir)
      .collect().map(_.getString(0)).toSet
    val batch = graft.Tables.documents(spark, dir)
      .select(md5(TextAnalysis.normalized($"text")).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(streamed == batch)
    // and on a planted corpus with cross-batch duplicates (even/odd split
    // puts each dup pair in DIFFERENT micro-batches), the state store
    // catches them: 6 docs, 3 distinct texts
    val planted = java.nio.file.Files.createTempDirectory("ddstream").toString
    Seq((0L, "alpha beta"), (1L, "alpha  BETA"), (2L, "gamma"),
      (3L, "Gamma "), (4L, "delta"), (5L, "DELTA"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$planted/documents.parquet")
    val kept = Dedup.ddStreamExact(spark, planted)
      .collect().map(_.getString(0)).toSet
    assert(kept.size == 3)
  }

  test("exact dedup groups identical normalized text") {
    val docs = Seq((1L, "Same  Doc"), (2L, "same doc"), (3L, "unique"))
      .toDF("doc_id", "text")
    val grouped = docs
      .groupBy(md5(TextAnalysis.normalized($"text")).as("fp"))
      .agg(count(lit(1)).as("n"), min($"doc_id").as("canonical"))
      .filter($"n" > 1).collect()
    assert(grouped.length == 1 && grouped(0).getAs[Long]("n") == 2
      && grouped(0).getAs[Long]("canonical") == 1L)
  }

  test("fuzzy length-band blocking is lossless and shrinks blocks") {
    // lengths 7 and 8 straddle a band boundary (width 8) but are 1 edit
    // apart — adjacent-band replication must still pair them
    val part = Seq(
      (1L, "BrandX", "abcdefg"),
      (2L, "BrandX", "abcdefgh"),
      (3L, "BrandX", "abcdefgi"),
      (4L, "BrandX", "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
      (5L, "BrandY", "abcdefg")
    ).toDF("p_partkey", "p_brand", "p_name")
    val got = Dedup.fuzzyNamePairs(part)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    // brute force within brand
    val a = part.select($"p_brand", $"p_partkey".as("key_a"), $"p_name".as("na"))
    val b = part.select($"p_brand", $"p_partkey".as("key_b"), $"p_name".as("nb"))
    val brute = a.join(b, Seq("p_brand")).filter($"key_a" < $"key_b")
      .filter(levenshtein($"na", $"nb") <= Dedup.FuzzyMaxEdits)
      .select("key_a", "key_b").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // the composite key yields strictly more, smaller blocks than
    // brand-only: doc 4 never meets docs 1-3 in any candidate block
    val blocks = part
      .groupBy($"p_brand", expr(s"length(p_name) div ${Dedup.FuzzyBandWidth}"))
      .count().agg(max("count")).head().getLong(0)
    val brandOnly = part.groupBy($"p_brand").count()
      .agg(max("count")).head().getLong(0)
    assert(blocks < brandOnly)
  }

  test("connected components: chains merge into one min-labeled cluster") {
    import spark.implicits._
    // a-b, b-c chain + isolated pair (x, y)
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.9), (10L, 11L, 0.8))
      .toDF("doc_a", "doc_b", "jaccard")
    val out = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("bucketCap bounds the incremental band join on a planted mega bucket") {
    import spark.implicits._
    // corpus: 60 near-identical boilerplate docs (one mega bucket per
    // band) + distinct docs; batch: one boilerplate twin + one distinct
    val boiler = "terms of service apply to all users of this site always"
    val corpus = ((0 until 60).map(i => (100L + i, boiler)) ++
      Seq((500L, "a completely different document about gardening plants"),
        (501L, "yet another unrelated text concerning astronomy and stars")))
      .toDF("doc_id", "text")
    val batch = Seq((1L, boiler),
      (2L, "this batch document matches nothing in the stored corpus at all"))
      .toDF("doc_id", "text")
    val bands = Dedup.docBands(corpus).withColumnRenamed("doc_id", "corpus_doc")
    val cap = 4
    val capped = Dedup.minhashIncrementalAgainstBands(
      batch, bands, corpus, Dedup.MinhashThreshold, bucketCap = Some(cap))
    val rows = capped.collect()
    // the boilerplate batch doc is still flagged (any representative
    // suffices), the distinct one is not
    assert(rows.map(_.getLong(0)).toSet == Set(1L))
    // candidate/verify volume is bounded by the cap: only the cap
    // smallest corpus ids can appear, not the whole 60-doc bucket
    assert(rows.length <= cap)
    assert(rows.map(_.getLong(1)).forall(_ < 100L + cap))
    // and the capped-path plan pre-prunes map-side
    assert(capped.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("retainAfterDedup keeps singletons plus one canonical doc per cluster") {
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters: {1,4,7} (min 1) and {2,8} (min 2); 0,3,5,6,9 singletons
    val pairs = Seq((1L, 4L), (4L, 7L), (2L, 8L)).toDF("doc_a", "doc_b")
    val clusters = Dedup.connectedComponents(pairs)
    val kept = Dedup.retainAfterDedup(docs, clusters)
      .select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 2L, 3L, 5L, 6L, 9L))
  }

  test("connected components: 1000-node chain converges in O(log n) rounds") {
    import spark.implicits._
    val chain = (0L until 999L).map(i => (i, i + 1, 1.0))
      .toDF("doc_a", "doc_b", "jaccard")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(chain)
    assert(rounds <= 12, s"took $rounds rounds — pointer jumping regressed")
    val distinctLabels = labels.select("cluster_id").distinct().collect()
    assert(distinctLabels.map(_.getLong(0)).toSeq == Seq(0L))
    assert(labels.count() == 1000L)
  }
}
