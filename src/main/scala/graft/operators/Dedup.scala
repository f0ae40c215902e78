package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents`, the four standard rungs of a
  * training-data dedup ladder:
  *
  *  1. exact   — md5 of normalized text, one hash-aggregate;
  *  2. n-gram Jaccard — exact pairwise similarity (quadratic: kept for
  *     bounded blocks / verification, never the 100 TB path);
  *  3. MinHash + LSH — the scale path: per-doc signature (narrow, no
  *     shuffle), banded bucket join (shuffle on band hash — candidates
  *     only), exact Jaccard verification of candidates;
  *  4. SimHash — 64-bit weighted sign fingerprint, near-dup = small
  *     Hamming distance, banded by 16-bit chunks (spec-tested).
  *
  * All hashes are Spark's codegen'd xxhash64 — deterministic across runs,
  * executors, and cluster sizes, so signatures computed in different jobs
  * agree (the same property the reference demands of its SHA1 partitioner,
  * /root/reference/lib/map_reduce/hash_partitioner.rb:28-30).
  */
object Dedup {

  /** Distinct 3-gram word shingles of the lowercased text.
    *
    * A native codegen'd expression (graft.functions.NGramShingles), not
    * array higher-order functions and not a UDF: the HOF formulation
    * (`transform` over `sequence` with `slice` + `concat_ws`) is
    * CodegenFallback — interpreted per position with an array copy per
    * slice, O(tokens²), ~1 ms/doc measured — and a Scala UDF pays a
    * Row/encoder conversion per row. The expression is one O(tokens) JVM
    * loop invoked directly from the generated stage. Short docs
    * (< 3 tokens) collapse to one whole-doc shingle. */
  def shingles(text: Column): Column =
    graft.functions.ShingleFunctions.ngram_shingles(text, 3)

  // DuckDB twin of the shingle expression, for the oracles (tokenizer
  // twin shared with TextAnalysis — single source of truth).
  private val toksSql = TextAnalysis.toksSql
  private val shinglesSql =
    s"""CASE WHEN len($toksSql) >= 3
       | THEN list_distinct(list_transform(range(len($toksSql) - 2),
       |        i -> $toksSql[i+1] || ' ' || $toksSql[i+2] || ' ' || $toksSql[i+3]))
       | ELSE [array_to_string($toksSql, ' ')] END""".stripMargin.replace("\n", " ")

  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  // ------------------------------------------------------------ exact dedup:
  // one hash-aggregate on the content fingerprint; min(doc_id) elects the
  // canonical survivor deterministically.
  def ddExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5(TextAnalysis.normalized($"text")).as("fingerprint"))
      .agg(count(lit(1)).as("n_copies"), min($"doc_id").as("canonical_id"))
  }

  val ddExactSql: String =
    """SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  COUNT(*) AS n_copies, MIN(doc_id) AS canonical_id
      |FROM documents GROUP BY 1""".stripMargin

  // --------------------------------------- incremental dedup (Bloom sketch).
  /** Dedup an INCOMING batch against the EXISTING corpus without joining
    * it: aggregate the corpus fingerprints into a mergeable Bloom sketch
    * (graft.functions.BloomSketchBytes — partials are m-bit arrays,
    * merge is a bitwise OR, so partitioning never changes the bytes),
    * then admit the batch with one scan-side BloomMightContain filter on
    * the collected sketch literal. At 100 TB the sketch is built once
    * per shard/day and OR-merged; each new batch then pays a single scan
    * instead of an anti-join against the full corpus. Guarantees: no
    * false negatives (a known fingerprint is always dropped); at most
    * ~fpp of genuinely-new docs lost to false positives.
    *
    * Gate form (envelope): the corpus = docs with doc_id % 10 != 0, the
    * batch = all docs. Exact n_incoming / n_truly_new hash-match the
    * DuckDB oracle; the booleans assert zero false negatives and the
    * measured false-positive count within the sized envelope. The
    * verification join exists only to gate — production is sketch +
    * filter. */
  val BloomFpp = 0.01

  private def bloomParts(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Byte]) = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", md5(TextAnalysis.normalized($"text")).as("fp"))
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val nCorpus = corpus.count() // sizing pass (table stats at scale)
    val sketch = corpus
      .agg(graft.functions.BloomFunctions
        .bloom_sketch($"fp", nCorpus, BloomFpp).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    (docs, corpus, sketch)
  }

  /** Production form (what the bench times): corpus sketch build + the
    * scan-side admit filter, emitting the admitted batch — no
    * verification join (that exists only so the gate can check). The
    * sketch rides a BROADCAST variable, not a plan literal: a corpus-
    * scale sketch (~1.2 bytes/element at 1% FPP) embedded via `lit`
    * would be re-serialized with every task's plan and blow up the
    * driver; the broadcast handle is bytes-small and executors fetch
    * the bit array once each (see BloomMightContainBroadcast). */
  def ddBloomAdmit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (docs, _, sketch) = bloomParts(s, dir)
    val bc = s.sparkContext.broadcast(sketch)
    docs.filter(!graft.functions.BloomFunctions
      .bloom_might_contain_bc(bc, $"fp"))
  }

  def ddBloomIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (docs, corpus, sketch) = bloomParts(s, dir)
    val bc = s.sparkContext.broadcast(sketch)
    val admitted = !graft.functions.BloomFunctions
      .bloom_might_contain_bc(bc, $"fp")
    docs
      .join(broadcast(corpus.select($"fp".as("cfp")).distinct()),
        $"fp" === $"cfp", "left")
      .select($"fp", $"cfp".isNotNull.as("in_corpus"), admitted.as("admitted"))
      .agg(
        count(lit(1)).as("n_incoming"),
        sum(when(!$"in_corpus", 1L).otherwise(0L)).as("n_truly_new"),
        (sum(when($"in_corpus" && $"admitted", 1L).otherwise(0L)) === 0L)
          .as("no_false_negatives"),
        (sum(when(!$"in_corpus" && !$"admitted", 1L).otherwise(0L)) <=
          greatest(lit(5.0), lit(3 * BloomFpp) *
            sum(when(!$"in_corpus", 1L).otherwise(0L)))).as("fpr_ok"))
  }

  // ----------------------------------------- SHARDED Bloom construction.
  /** The 10¹⁰+-element rung of the Bloom ladder: shard the corpus by
    * fingerprint hash, build one mergeable sketch per shard (a single
    * aggregate — each shard's partials OR-merge exactly like the global
    * sketch's), and admit incoming rows by joining their shard's sketch.
    * No single byte array grows with the corpus beyond its shard's
    * slice, shards refresh independently (ingest day N touches only the
    * shards its fingerprints land in), and the S-row sketch table
    * broadcasts. Determinism carries over: the shard assignment is
    * xxhash64 (stable anywhere) and each per-shard sketch is the same
    * OR-merge the whole-corpus sketch is. */
  val BloomShards = 16

  /** One row per shard: (shard, sk). `expectedItems` sizes EACH shard's
    * sketch (corpus size / shards, padded for imbalance). */
  def shardedBloomSketches(corpus: DataFrame, fp: Column, shards: Int,
      expectedItems: Long, fpp: Double): DataFrame =
    corpus.groupBy(pmod(xxhash64(fp), lit(shards.toLong)).as("shard"))
      .agg(graft.functions.BloomFunctions
        .bloom_sketch(fp, expectedItems, fpp).as("sk"))

  /** Sharded twin of [[ddBloomAdmit]]: same corpus/batch split, admit
    * via the per-shard sketch table instead of one whole-corpus
    * sketch. The sketch join is a LEFT join and a missing sketch row
    * ADMITS: a shard with no corpus fingerprints (skewed hash, small
    * corpus, or a per-day incremental table that only carries the
    * shards that day touched) provably cannot contain the incoming
    * fingerprint — an inner join would silently drop those provably
    * new docs instead. */
  def ddBloomAdmitSharded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .select($"doc_id", md5(TextAnalysis.normalized($"text")).as("fp"))
    val corpus = docs.filter($"doc_id" % 10 =!= 0)
    val nCorpus = corpus.count()
    // pad per-shard capacity 2x over the even split so hash imbalance
    // cannot push a shard past its sized fpp
    val perShard = math.max(64L, 2L * nCorpus / BloomShards)
    val sketches = shardedBloomSketches(corpus, $"fp", BloomShards,
      perShard, BloomFpp)
    docs.withColumn("shard", pmod(xxhash64($"fp"), lit(BloomShards.toLong)))
      .join(broadcast(sketches), Seq("shard"), "left")
      .filter(coalesce(!graft.functions.BloomFunctions
        .bloom_might_contain_shard($"shard", $"sk", $"fp"), lit(true)))
      .select($"doc_id", $"fp")
  }

  /** Envelope gate for the sharded construction — same shape as
    * [[ddBloomIncremental]]: exact incoming/truly-new counts hash-match
    * the oracle; booleans assert zero false negatives (no corpus member
    * admitted — the property sharding must not break: every fp joins
    * the sketch that contains it) and the sized FPR envelope. */
  def ddBloomSharded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val admitted = ddBloomAdmitSharded(s, dir).select($"fp").distinct()
      .withColumn("__adm", lit(1))
    val docs = Tables.documents(s, dir)
      .select($"doc_id", md5(TextAnalysis.normalized($"text")).as("fp"))
    val corpusFps = docs.filter($"doc_id" % 10 =!= 0)
      .select($"fp".as("cfp")).distinct()
    docs
      .join(broadcast(corpusFps), $"fp" === $"cfp", "left")
      .join(broadcast(admitted), Seq("fp"), "left")
      .select($"fp", $"cfp".isNotNull.as("in_corpus"),
        ($"__adm".isNotNull).as("admitted"))
      .agg(
        count(lit(1)).as("n_incoming"),
        sum(when(!$"in_corpus", 1L).otherwise(0L)).as("n_truly_new"),
        (sum(when($"in_corpus" && $"admitted", 1L).otherwise(0L)) === 0L)
          .as("no_false_negatives"),
        (sum(when(!$"in_corpus" && !$"admitted", 1L).otherwise(0L)) <=
          greatest(lit(5.0), lit(3 * BloomFpp) *
            sum(when(!$"in_corpus", 1L).otherwise(0L)))).as("fpr_ok"))
  }

  val ddBloomIncrementalSql: String =
    """WITH fps AS (SELECT doc_id,
      |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents),
      |corpus AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 <> 0)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_incoming,
      |  CAST(SUM(CASE WHEN fp NOT IN (SELECT fp FROM corpus) THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_truly_new,
      |  TRUE AS no_false_negatives, TRUE AS fpr_ok
      |FROM fps""".stripMargin

  // ------------------------------- cross-document duplicate spans (W-grams).
  /** Exact substring-level dedup signal (the "dedup training data"
    * construction): token spans of length ≥ W that appear in MORE THAN
    * ONE document, reported per doc as start count, covered-token count
    * and covered fraction — the C4/Gopher-grade filter for boilerplate
    * and cross-page template text that document-level near-dup misses.
    *
    * Plan: positional W-gram shingles scan-side (native codegen'd
    * PositionalShingles — positions matter here, so the distinct-set
    * shingle form doesn't fit) → one hash-aggregate over grams keeps
    * those in >1 distinct doc → semi-join marks duplicated starts → an
    * explode(W offsets)+distinct turns starts into the covered-index
    * union, all grouped per doc. Every stage is a shuffle on a key
    * (gram, then doc_id) — no quadratic pairing anywhere, corpus-size
    * scalable.
    *
    * Two flavors of the gram shuffle key:
    *  - GATE flavor keys by the gram STRING, so DuckDB reproduces every
    *    intermediate verbatim;
    *  - PRODUCTION flavor ([[ddDupSpansHashed]]) keys by xxhash64(gram)
    *    and drops the string before the shuffle — W-gram text is ~8×
    *    token bytes, the hash is 8 bytes, so shuffle volume drops ~8×
    *    at identical output (a 64-bit collision needs ~2³² distinct
    *    grams colliding pairwise — harmless for the >1-doc predicate,
    *    and the spec pins output equality on the gate corpus). */
  val SpanW = 8

  private def dupSpansPipeline(s: SparkSession, dir: String,
      hashedGramKey: Boolean): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val nTok = docs.select($"doc_id",
      size(graft.functions.ShingleFunctions.tokens($"text")).cast("long")
        .as("n_tokens"))
    val rawStarts = docs.select($"doc_id",
        explode(graft.functions.ShingleFunctions
          .positional_shingles($"text", SpanW)).as("g"))
      .select($"doc_id", $"g.pos".as("pos"), $"g.gram".as("gram"))
    // production: replace the gram string with its 64-bit hash BEFORE the
    // shuffle so only 8 bytes per start travel the wire
    val starts =
      if (hashedGramKey)
        rawStarts.select($"doc_id", $"pos", xxhash64($"gram").as("gram"))
      else rawStarts
    val dupGrams = starts.groupBy($"gram")
      .agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" > 1).select($"gram")
    val dupStarts = starts.join(dupGrams, Seq("gram"), "left_semi")
    // covered tokens = |union of [pos, pos+W-1] intervals| — computed by
    // interval merging over pos-sorted starts (first start contributes W,
    // each next start min(gap, W)), NOT by exploding W indices per start
    // and distinct-counting them: the lag window needs one shuffle on
    // doc_id, reused as-is by the per-doc aggregate, where the explode
    // form shipped 8x the rows through an extra distinct exchange.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"pos")
    val perDoc = dupStarts
      .withColumn("__prev", lag($"pos", 1).over(w))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("dup_starts"),
        sum(when($"__prev".isNull, lit(SpanW.toLong))
          .otherwise(least(($"pos" - $"__prev").cast("long"),
            lit(SpanW.toLong)))).as("covered_tokens"))
    nTok
      .join(perDoc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_tokens",
        coalesce($"dup_starts", lit(0L)).as("dup_starts"),
        coalesce($"covered_tokens", lit(0L)).as("covered_tokens"),
        (coalesce($"covered_tokens", lit(0L)).cast("double") / $"n_tokens")
          .as("dup_frac"))
  }

  /** Gate flavor (string gram key — DuckDB-reproducible). */
  def ddDupSpans(s: SparkSession, dir: String): DataFrame =
    dupSpansPipeline(s, dir, hashedGramKey = false)

  /** Production flavor (xxhash64 gram key — ~8× fewer shuffle bytes). */
  def ddDupSpansHashed(s: SparkSession, dir: String): DataFrame =
    dupSpansPipeline(s, dir, hashedGramKey = true)

  // ------------------------------------- eval-set decontamination (W-grams).
  /** Benchmark DECONTAMINATION — the training-data hygiene step the
    * dedup ladder doesn't cover: find training documents that share any
    * W-token span with an evaluation/benchmark document, so they can be
    * dropped (or the eval marked compromised) before training. The
    * classic construction is N-gram overlap against the eval set
    * (C4/GPT-3-style); here W = [[SpanW]] tokens.
    *
    * Gate split: docs with doc_id % 25 == 0 play the eval set (4%), the
    * rest are the training corpus. Output: one row per ≥W-token train
    * doc with its distinct-gram count, how many of those grams appear in
    * ANY eval doc, and the contaminated flag.
    *
    * Plan shape at 100 TB: distinct (doc, gram) pairs scan-side → the
    * eval gram set is grouped then BROADCAST (an eval benchmark is small
    * by construction — even 10⁶ grams hash to single-digit MBs in the
    * hashed flavor) → per-doc count aggregate. The only corpus-sized
    * shuffles are keyed on (doc_id, gram) and doc_id; no pairing, and
    * the train side never shuffles on the gram at all thanks to the
    * broadcast. Same two flavors as dup spans: the gate keys grams by
    * STRING (DuckDB twin), production by xxhash64. */
  private def decontamPipeline(s: SparkSession, dir: String,
      hashedGramKey: Boolean): DataFrame = {
    import s.implicits._
    val raw = Tables.documents(s, dir)
      .select($"doc_id",
        explode(graft.functions.ShingleFunctions
          .positional_shingles($"text", SpanW)).as("g"))
      .select($"doc_id", $"g.gram".as("gram"))
    val grams = (if (hashedGramKey)
      raw.select($"doc_id", xxhash64($"gram").as("gram"))
    else raw).distinct()
    val evalGrams = grams.filter($"doc_id" % 25 === 0)
      .select($"gram").distinct().withColumn("__hit", lit(1))
    grams.filter($"doc_id" % 25 =!= 0)
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"__hit".isNotNull, 1L).otherwise(0L)).as("n_contaminated"))
      .withColumn("contaminated", $"n_contaminated" > 0)
  }

  /** Gate flavor (string gram key — DuckDB-reproducible). */
  def ddDecontaminate(s: SparkSession, dir: String): DataFrame =
    decontamPipeline(s, dir, hashedGramKey = false)

  /** Production flavor (xxhash64 gram key). */
  def ddDecontaminateHashed(s: SparkSession, dir: String): DataFrame =
    decontamPipeline(s, dir, hashedGramKey = true)

  val ddDecontaminateSql: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sh AS (SELECT DISTINCT doc_id,
       |         array_to_string(tk[i+1:i+$SpanW], ' ') AS gram
       |       FROM toks, unnest(range(len(tk) - ${SpanW - 1})) u(i)
       |       WHERE len(tk) >= $SpanW),
       |ev AS (SELECT DISTINCT gram FROM sh WHERE doc_id % 25 = 0)
       |SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       |  CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_contaminated,
       |  SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) > 0
       |    AS contaminated
       |FROM sh d LEFT JOIN ev e ON d.gram = e.gram
       |WHERE d.doc_id % 25 <> 0
       |GROUP BY d.doc_id""".stripMargin

  val ddDupSpansSql: String =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS tk FROM documents),
       |sh AS (SELECT doc_id, i AS pos, array_to_string(tk[i+1:i+$SpanW], ' ') AS gram
       |       FROM toks, unnest(range(len(tk) - ${SpanW - 1})) u(i)
       |       WHERE len(tk) >= $SpanW),
       |dup AS (SELECT gram FROM sh GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1),
       |ds AS (SELECT doc_id, pos FROM sh WHERE gram IN (SELECT gram FROM dup)),
       |lagged AS (SELECT doc_id, pos,
       |    LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM ds),
       |agg AS (SELECT doc_id, COUNT(*) AS dup_starts,
       |    SUM(CASE WHEN prev IS NULL THEN $SpanW
       |        ELSE LEAST(pos - prev, $SpanW) END) AS covered_tokens
       |  FROM lagged GROUP BY doc_id)
       |SELECT t.doc_id, CAST(len(t.tk) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(a.dup_starts, 0) AS BIGINT) AS dup_starts,
       |  CAST(COALESCE(a.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       |  CAST(COALESCE(a.covered_tokens, 0) AS DOUBLE) / len(t.tk) AS dup_frac
       |FROM toks t
       |LEFT JOIN agg a ON t.doc_id = a.doc_id""".stripMargin

  // ------------------------------------------- exact n-gram Jaccard pairs.
  // Quadratic by construction — bounded to a doc_id block so the exact
  // variant stays a verification tool; the full-corpus path is MinHash.
  val JaccardBlockCap = 1000
  val JaccardThreshold = 0.3

  def ddNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, dir)
      .filter($"doc_id" < JaccardBlockCap)
      .select($"doc_id", shingles($"text").as("sh"))
    val a = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val b = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    a.join(b, $"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b", jaccard($"sh_a", $"sh_b").as("jaccard"))
      .filter($"jaccard" >= JaccardThreshold)
  }

  val ddNgramJaccardSql: String =
    s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |FROM (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE doc_id < $JaccardBlockCap) a
       |JOIN (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE doc_id < $JaccardBlockCap) b
       |  ON a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $JaccardThreshold""".stripMargin

  // ---------------------------------------------------------- MinHash + LSH.
  // 64 minhashes per doc, computed scan-side with higher-order functions
  // (zero shuffle); 32 bands × 2 rows ⇒ P(candidate | j=0.9) ≈ 1 − 5e-23,
  // P(candidate | j=0.1) ≈ 3%, so candidate volume stays near-linear.
  // Candidates are exact-verified with true Jaccard before emission: the
  // output is provably a subset of the exact result, and equals it when
  // every true pair lands in ≥1 shared band (the sf0.01 corpus has a clean
  // similarity gap: planted dups at j ≥ 0.9, background at j ≤ 0.1).
  val NumHashes = 64
  val Bands = 32 // rows per band = NumHashes / Bands = 2
  val MinhashThreshold = 0.5

  /** Per-j salts for the hash family h_j(x) = xxhash64(x ⊕ salt_j): each
    * shingle STRING is xxhash64'd once, the 64 family members re-hash the
    * resulting 8-byte long — ~60× less string hashing than hashing
    * (shingle, j) pairs, and overflow-free under ANSI mode. Owned by
    * the native kernel (one source of truth); from a fixed LCG so
    * signatures are stable across jobs and cluster layouts. */
  private def hashSalt(j: Int): Long = graft.functions.MinHashKernel.salts(j)

  /** doc_id → (shingle set, minhash signature array<long>), computed by
    * the native MinHashSignature expression: the whole 64-min fold is
    * row-local (every shingle of a doc lives in its row), so it runs
    * scan-side in ONE codegen'd loop — no explode, no aggregate, no
    * shuffle. [[aggSignatures]] keeps the old explode + 64-min-aggs
    * formulation as the spec's semantic twin. */
  def signatures(docs: DataFrame): DataFrame =
    Scale.ensureParallelism(docs)
      .select(col("doc_id"), shingles(col("text")).as("sh"),
        graft.functions.MinHashFunctions.minhash_signature(col("text")).as("sig"))

  /** The original aggregate formulation, retained ONLY as the reference
    * implementation the spec pins MinHashSignature against. */
  def aggSignatures(docs: DataFrame): DataFrame = {
    val withSh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
    val exploded = withSh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    val aggs = (1 until NumHashes).map(j =>
      min(xxhash64(col("h").bitwiseXOR(lit(hashSalt(j))))).as(s"m$j"))
    val sigs = exploded.groupBy(col("doc_id"))
      .agg(min(xxhash64(col("h").bitwiseXOR(lit(hashSalt(0))))).as("m0"), aggs: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(j => col(s"m$j")): _*).as("sig"))
    withSh.join(sigs, "doc_id")
  }

  /** (doc_id, band, band_hash) — one row per band for the bucket join;
    * band hash = multi-arg xxhash64 over (band, its signature slice),
    * read straight off the signature array (element_at is codegen'd). */
  def bandedBuckets(sigs: DataFrame): DataFrame = {
    val rows = NumHashes / Bands
    val bandHashes = (0 until Bands).map(b =>
      xxhash64((lit(b) +: (0 until rows).map(r =>
        element_at(col("sig"), b * rows + r + 1))): _*))
    sigs.select(col("doc_id"), posexplode(array(bandHashes: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Buckets with more than this many docs switch from all-pairs to
    * adjacent-by-id pairing. All-pairs on a bucket of B near-identical
    * docs (the "every page has this boilerplate" corpus) is B²/2
    * candidates from a single bucket — the one place LSH degenerates to
    * quadratic. Adjacent pairing emits B−1 chain pairs instead; the
    * chain still connects every true duplicate through
    * [[connectedComponents]], so cluster-level dedup output is
    * unchanged while candidate volume stays O(B) per bucket. Below the
    * threshold all-pairs is kept (≤ T²/2 pairs, constant-bounded) so
    * the pair-level result is exhaustive for normal buckets. */
  val MegaBucketThreshold = 64

  /** LSH candidate pairs (doc_a < doc_b), mega-bucket-guarded.
    *
    * Signatures materialize scan-side in the native MinHashSignature
    * expression (zero shuffle, see [[signatures]]); band hashes read
    * straight off the signature array. One window pass (same shuffle
    * key as the bucket join) ranks docs within their bucket so
    * oversized buckets can pair adjacent-by-id instead of all-pairs. */
  /** Corpus-adaptive mega-bucket threshold: buckets up to the q-quantile
    * of observed bucket sizes are "normal for this corpus" and pair
    * exhaustively; only genuine outliers get the adjacency guard. On a
    * short-doc / low-diversity corpus where 200-doc buckets are TYPICAL,
    * the fixed 64 would needlessly degrade recall on a third of the
    * data; conversely the cap keeps a boilerplate-heavy corpus (where
    * the p99 itself explodes) from re-opening the quadratic path —
    * all-pairs work stays ≤ cap²/2 per bucket. percentile_approx over
    * one row per bucket (the same aggregate the banding shuffle already
    * groups by), collected as a single scalar — the corpus-statistics
    * analog of the IVF probe tuning. Opt-in via `candidatePairs(docs,
    * Some(threshold))`; gate queries keep the fixed default so their
    * output is partition-exact. */
  def observedBucketThreshold(buckets: DataFrame, q: Double = 0.99,
      floor: Int = MegaBucketThreshold, cap: Int = 1024): Int = {
    val p = buckets.groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("bsz"))
      .agg(percentile_approx(col("bsz"), lit(q), lit(10000)).as("p"))
      .head().getLong(0)
    p.max(floor.toLong).min(cap.toLong).toInt
  }

  def candidatePairs(docs: DataFrame,
      thresholdOverride: Option[Int] = None): DataFrame = {
    val threshold = thresholdOverride.getOrElse(MegaBucketThreshold)
    // the 64-min signature fold is decode-class per-row work: never on
    // one small-file input split (no-op past defaultParallelism)
    val sigs = Scale.ensureParallelism(docs).select(col("doc_id"),
      graft.functions.MinHashFunctions.minhash_signature(col("text")).as("sig"))
    val buckets = bandedBuckets(sigs)
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("band_hash"))
    val ranked = buckets
      .withColumn("rk", row_number().over(byBucket.orderBy(col("doc_id"))))
      .withColumn("bsz", count(lit(1)).over(byBucket))
    // ONE self-join serves both regimes (bsz is bucket-constant, so the
    // OR below resolves per bucket): normal buckets pair exhaustively,
    // mega buckets pair adjacent-by-rank only. A single join keeps the
    // ranked pipeline to the two scans a self-join needs, instead of
    // four with separate small/mega joins.
    ranked.as("x")
      .join(ranked.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_hash") === col("y.band_hash") &&
          ((col("x.bsz") <= threshold &&
            col("x.doc_id") < col("y.doc_id")) ||
           (col("x.bsz") > threshold &&
            col("x.rk") + 1 === col("y.rk"))))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    // CPU-heavy scan stages must not run on one small-file input split
    val docsP = Scale.ensureParallelism(docs)
    val cands = candidatePairs(docsP)
    // Exact-verify ONLY candidate docs: semi-join the candidate id set,
    // shingle just those rows, join the shingle table to both sides of
    // the pair join — the full corpus is never re-scanned. No broadcast
    // hints: the candidate set is corpus-dependent (boilerplate-heavy
    // corpora make it a large fraction of the input), so AQE picks
    // broadcast vs shuffle from the MEASURED size instead of an
    // unbounded compile-time promise.
    val candIds = cands.select(col("doc_a").as("doc_id"))
      .union(cands.select(col("doc_b").as("doc_id"))).distinct()
    val shCand = docsP
      .join(candIds, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    cands
      .join(shCand.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shCand.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Oracle-gated variant: full LSH pipeline, block-capped so the DuckDB
    * brute-force oracle stays tractable at verification SF. */
  val MinhashBlockCap = 2000
  def ddMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    minhashPairs(Tables.documents(s, dir).filter($"doc_id" < MinhashBlockCap),
      MinhashThreshold)
  }

  val ddMinhashLshSql: String =
    s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
       |FROM (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE doc_id < $MinhashBlockCap) a
       |JOIN (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE doc_id < $MinhashBlockCap) b
       |  ON a.doc_id < b.doc_id
       |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $MinhashThreshold""".stripMargin

  /** Unbounded scale path. Oracle-able after all: the emitted pairs are
    * exact-verified (true Jaccard ≥ threshold), so the output equals
    * the brute-force pair set whenever banding catches every true pair
    * — guaranteed on this corpus by the similarity gap (planted dups at
    * j ≥ 0.9 miss a band with P ≈ (1−0.81)³² ≈ 1e-23, and the hashes
    * are deterministic, so the result is a fixed set, not a sample).
    * The DuckDB twin is the full-corpus quadratic compare — fine at
    * verification SF, never the Spark-side plan. */
  def ddMinhashLshFull(s: SparkSession, dir: String): DataFrame =
    minhashPairs(Tables.documents(s, dir), MinhashThreshold)

  /** Inverted-index formulation (docs pair only through a SHARED
    * shingle, intersection = count of shared shingles) — equivalent to
    * the quadratic all-pairs compare because jaccard > 0 requires a
    * shared shingle, but near-linear on a corpus where unrelated docs
    * overlap rarely: the quadratic twin takes ~10 min in DuckDB at
    * sf0.1, this one seconds. */
  val ddMinhashLshFullSql: String =
    s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS s, len($shinglesSql) AS n FROM documents),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    ANY_VALUE(a.n) AS n_a, ANY_VALUE(b.n) AS n_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (n_a + n_b - i) AS jaccard
       |FROM inter WHERE CAST(i AS DOUBLE) / (n_a + n_b - i) >= $MinhashThreshold""".stripMargin

  // ------------------------------------- INCREMENTAL MinHash near-dedup.
  /** The near-dup analog of the Bloom admit: screen an incoming BATCH
    * against an already-ingested CORPUS without re-pairing the corpus
    * with itself. In production the corpus side is a STORED band table
    * ((band, band_hash, doc_id) — exactly [[bandedBuckets]]' output,
    * appended per ingest since signatures/bands are deterministic);
    * each new batch computes its own bands scan-side and joins the
    * stored table on the band key, so the work is
    * O(batch + matched buckets), never O(corpus²) and never a corpus
    * rescan. Candidates are exact-verified like every minhash path.
    *
    * `perDocCap` bounds verification fan-out for boilerplate-heavy
    * batches (a batch doc landing in a mega bucket would otherwise
    * verify against the whole bucket): keep the `cap` smallest corpus
    * ids per batch doc — enough to answer "does this doc have a
    * near-dup" deterministically, though no longer the exhaustive pair
    * list. The gate runs uncapped (this corpus's similarity gap keeps
    * candidate volume tiny) so the DuckDB exact cross-pair oracle
    * matches in full. */
  /** (band, band_hash, doc_id) for a docs frame — the rows a stored
    * corpus band table accumulates per ingest (signatures and band
    * hashes are deterministic, so appended rows from different jobs
    * agree). */
  def docBands(docs: DataFrame): DataFrame =
    bandedBuckets(Scale.ensureParallelism(docs).select(col("doc_id"),
      graft.functions.MinHashFunctions.minhash_signature(col("text")).as("sig")))

  def minhashIncrementalPairs(batch: DataFrame, corpus: DataFrame,
      threshold: Double, perDocCap: Option[Int] = None): DataFrame =
    minhashIncrementalAgainstBands(batch,
      docBands(corpus).withColumnRenamed("doc_id", "corpus_doc"),
      corpus, threshold, perDocCap)

  /** The stored-table form: `corpusBands` is the accumulated
    * (band, band_hash, corpus_doc) table (see [[docBands]]) — the shape
    * a foreachBatch ingest loop appends to per micro-batch — and
    * `corpusDocs` supplies text only for the candidate ids the verify
    * step semi-joins (at scale, a store of shingle sets serves the same
    * role without keeping raw text). */
  /** Corpus-adaptive verify cap for the incremental band join — the
    * [[observedBucketThreshold]] idea applied to per-batch-doc
    * candidate counts: caps at the q-quantile of observed fan-outs
    * (clamped), so normal docs verify exhaustively and only genuine
    * boilerplate outliers are truncated. One aggregate over the
    * candidate set the join already produced. Opt-in (tuning-time),
    * like every adaptive knob here. */
  def observedPerDocCap(cands: DataFrame, q: Double = 0.99,
      floor: Int = 16, cap: Int = 1024): Int = {
    val p = cands.groupBy(col("batch_doc"))
      .agg(count(lit(1)).as("n"))
      .agg(percentile_approx(col("n"), lit(q), lit(10000)).as("p"))
      .head()
    if (p.isNullAt(0)) floor
    else p.getLong(0).max(floor.toLong).min(cap.toLong).toInt
  }

  /** [[observedPerDocCap]] as a LAZY one-row frame, for use inside a
    * single plan: the quantile aggregate broadcast-joins onto the
    * candidate set instead of being collected driver-side. Nothing
    * executes eagerly and nothing needs caching — the right shape for
    * a foreachBatch ingest loop, which must not leak a cached RDD per
    * micro-batch (the empty set falls back to the floor via coalesce). */
  private def perDocCapFrame(cands: DataFrame, q: Double = 0.99,
      floor: Int = 16, cap: Int = 1024): DataFrame =
    cands.groupBy(col("batch_doc"))
      .agg(count(lit(1)).as("n"))
      .agg(percentile_approx(col("n"), lit(q), lit(10000)).as("p"))
      .select(greatest(lit(floor.toLong),
        least(lit(cap.toLong), coalesce(col("p"), lit(floor.toLong))))
        .as("__cap"))

  /** `bucketCap`: mega-bucket guard on the STORED-table side — the
    * batch path's [[MegaBucketThreshold]] idea applied to the
    * incremental join. A boilerplate bucket in the corpus band table
    * (B near-identical docs sharing a band hash) would otherwise emit B
    * candidates per matching batch doc BEFORE the per-doc cap can
    * trim them — the cap bounds verification, not the join's shuffle.
    * With `bucketCap = c`, each (band, band_hash) keeps its c smallest
    * corpus ids (rank-≤-c plans a map-side WindowGroupLimit pre-prune,
    * so the trim happens before the bucket rows ever shuffle), bounding
    * join output at c per (batch band, bucket). Recall argument: a
    * batch doc matching a boilerplate bucket is near-identical to ALL
    * its members, so any representative suffices to flag it — the same
    * trade the batch path's adjacent-rank pairing makes, spec-pinned.
    * At ingest time the same rank filter can compact the stored table
    * itself (the representatives are stable: smallest ids). */
  def minhashIncrementalAgainstBands(batch: DataFrame, corpusBands: DataFrame,
      corpusDocs: DataFrame, threshold: Double,
      perDocCap: Option[Int] = None,
      adaptiveCap: Boolean = false,
      bucketCap: Option[Int] = None): DataFrame = {
    val bBands = docBands(batch).withColumnRenamed("doc_id", "batch_doc")
    val corpus = corpusDocs
    val prunedBands = bucketCap match {
      case Some(c) =>
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("band_hash"))
          .orderBy(col("corpus_doc"))
        corpusBands.withColumn("__bk", row_number().over(wb))
          .filter(col("__bk") <= c).drop("__bk")
      case None => corpusBands
    }
    val cands0 = bBands.join(prunedBands, Seq("band", "band_hash"))
      .select(col("batch_doc"), col("corpus_doc")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("batch_doc")).orderBy(col("corpus_doc"))
    val cands =
      if (adaptiveCap) {
        // the measured cap joins in as a broadcast scalar — one plan, no
        // eager job, no cache to leak (the distinct's exchange is shared
        // between the quantile subtree and the main path via Spark's
        // exchange reuse)
        cands0.withColumn("__rk", row_number().over(w))
          .join(broadcast(perDocCapFrame(cands0)))
          .filter(col("__rk") <= col("__cap")).drop("__rk", "__cap")
      } else perDocCap match {
        case Some(cap) =>
          cands0.withColumn("__rk", row_number().over(w))
            .filter(col("__rk") <= cap).drop("__rk")
        case None => cands0
      }
    val shB = batch
      .join(cands.select(col("batch_doc").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("batch_doc"), shingles(col("text")).as("sh_a"))
    val shC = corpus
      .join(cands.select(col("corpus_doc").as("doc_id")).distinct(),
        Seq("doc_id"), "left_semi")
      .select(col("doc_id").as("corpus_doc"), shingles(col("text")).as("sh_b"))
    cands.join(shB, "batch_doc").join(shC, "corpus_doc")
      .select(col("batch_doc"), col("corpus_doc"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Gate: batch = docs ≡ 0 (mod 10), corpus = the rest; verified
    * cross pairs against the exact inverted-index oracle (same recall
    * argument as [[ddMinhashLshFull]]). */
  def ddMinhashIncremental(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    minhashIncrementalPairs(docs.filter($"doc_id" % 10 === 0),
      docs.filter($"doc_id" % 10 =!= 0), MinhashThreshold)
  }

  val ddMinhashIncrementalSql: String =
    s"""WITH sh AS (SELECT doc_id, unnest($shinglesSql) AS s, len($shinglesSql) AS n FROM documents),
       |inter AS (SELECT a.doc_id AS batch_doc, b.doc_id AS corpus_doc,
       |    ANY_VALUE(a.n) AS n_a, ANY_VALUE(b.n) AS n_b, COUNT(*) AS i
       |  FROM sh a JOIN sh b ON a.s = b.s
       |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT batch_doc, corpus_doc, CAST(i AS DOUBLE) / (n_a + n_b - i) AS jaccard
       |FROM inter WHERE CAST(i AS DOUBLE) / (n_a + n_b - i) >= $MinhashThreshold""".stripMargin

  // -------------------------------------------------- dedup CLUSTERS:
  // connected components over the verified near-dup pairs — the actual
  // deliverable of corpus dedup (keep min doc_id per component, drop the
  // rest). Each round combines min-label propagation over edges with
  // pointer jumping (label(v) := label(label(v))): propagation alone is
  // O(component diameter) rounds — fine for blob-shaped near-dup
  // clusters, degenerate on chain-shaped graphs (exactly what the
  // mega-bucket guard's adjacent-by-id pairing produces) — while the
  // jump halves the label-tree depth every round, so convergence is
  // O(log diameter). Every step is a join + min-aggregate (all
  // executor-side, no collect); localCheckpoint truncates the iterative
  // lineage. Deterministic: the fixpoint is the component-minimum,
  // independent of iteration order or partitioning.
  def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** Exposes the round count so specs can pin the O(log n) behavior. */
  def connectedComponentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct().localCheckpoint()
    var labels = edges.groupBy(col("src").as("doc_id"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .localCheckpoint()
    // Convergence metric: Σ labels. Every step takes a MIN over a set
    // containing the current label, so per-doc labels are monotonically
    // non-increasing and the fixpoint is reached exactly when the sum
    // stops decreasing — one scalar aggregate per round instead of the
    // previous join + filter + count (a shuffle join per round; on a
    // 5-round run that overhead dominated the whole dd_retain bench
    // entry). Decimal sum: exact at any n·max(doc_id), no overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head() match {
        case r if r.isNullAt(0) => java.math.BigDecimal.ZERO
        case r => r.getDecimal(0)
      }
    var prevSum = labelSum(labels)
    var changed = true
    var rounds = 0
    while (changed) {
      rounds += 1
      // min label among neighbors (edges run both directions)
      val prop = edges.join(labels, col("dst") === col("doc_id"))
        .select(col("src").as("doc_id"), col("label"))
      // pointer jump: adopt the label of your label
      val jump = labels.as("l")
        .join(labels.as("p"), col("l.label") === col("p.doc_id"))
        .select(col("l.doc_id").as("doc_id"), col("p.label").as("label"))
      val next = labels.union(prop).union(jump)
        .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      changed = nextSum.compareTo(prevSum) < 0
      prevSum = nextSum
      labels = next
    }
    (labels.withColumnRenamed("label", "cluster_id"), rounds)
  }

  /** Block-capped cluster assignment over the LSH-verified pairs (same
    * cap/threshold as dd_minhash_lsh ⇒ shares its oracle data). */
  def ddClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(ddMinhashLsh(s, dir))

  /** Recursive-CTE twin: transitive closure of the exact pair set, then
    * min reachable id per doc. */
  val ddClustersSql: String =
    s"""WITH RECURSIVE pairs AS (${ddMinhashLshSql.replace("\n", " ")}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, src FROM edges
       |  UNION SELECT src, dst FROM edges
       |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
       |SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src""".stripMargin

  // --------------------------------------------------------- dedup RETENTION:
  // the final corpus-dedup DELIVERABLE: one canonical document per
  // near-duplicate cluster (the cluster minimum — any deterministic
  // data-derived rule works) plus every singleton. Everything upstream
  // (pairs, components) exists to produce THIS table.
  /** Documents surviving dedup: `docs` minus every clustered doc that is
    * not its cluster's canonical (minimum) id. Plan: the cluster table is
    * proportional to the DUPLICATED subset, not the corpus — on real
    * corpora a small fraction — so the anti-join's build side stays
    * small and AQE broadcasts it; the corpus side streams through
    * map-side without a shuffle. Falls back to a doc_id-keyed shuffle
    * join only when duplication is pathological (and then the shuffle is
    * the honest cost of the answer). */
  def retainAfterDedup(docs: DataFrame, clusters: DataFrame): DataFrame =
    docs.join(
      clusters.filter(col("doc_id") =!= col("cluster_id")).select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** Gate: retention over the block-capped LSH clusters (shares
    * dd_clusters' oracle data); emits the kept ids with their metadata
    * columns (no text — the gate checks membership, not payload). */
  def ddRetain(s: SparkSession, dir: String): DataFrame =
    retainAfterDedup(Tables.documents(s, dir), ddClusters(s, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  val ddRetainSql: String =
    s"""WITH RECURSIVE pairs AS (${ddMinhashLshSql.replace("\n", " ")}),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, src FROM edges
       |  UNION SELECT src, dst FROM edges
       |  UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |clus AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
       |         FROM reach GROUP BY src)
       |SELECT d.doc_id, d.lang, d.source, d.n_chars FROM documents d
       |WHERE d.doc_id NOT IN
       |  (SELECT doc_id FROM clus WHERE doc_id <> cluster_id)""".stripMargin

  // --------------------------------------------------------------- SimHash:
  // 64-bit weighted sign hash of the token multiset. Bit i of the simhash
  // is the sign of Σ_tokens (bit i of xxhash64(token) ? +1 : −1).
  // The fold runs in the native codegen'd SimHash64 expression — the
  // previous `aggregate`/`zip_with` higher-order-function formulation is
  // CodegenFallback (interpreted, ~64 allocations per token per row);
  // `hofSimhash` below keeps that formulation as the spec's semantic
  // twin. Scan-parallel, no shuffle. Near-dup candidates pair on any
  // equal 16-bit chunk (Hamming ≤ 3 over 4 chunks ⇒ some chunk equal,
  // pigeonhole).
  /** doc_id → 64-bit simhash. */
  def withSimhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHashFunctions.simhash64(col("text")).as("simhash"))

  /** The original interpreted HOF formulation, retained ONLY as the
    * reference implementation the spec pins SimHash64 against. */
  def hofSimhash(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(
        acc,
        array((0 until 64).map(i =>
          when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)): _*),
        (x, y) => x + y))
    (0 until 64).map(i =>
      when(element_at(counts, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  def ddSimhash(s: SparkSession, dir: String): DataFrame =
    withSimhash(Tables.documents(s, dir))

  /** SimHash near-dup pairs via 16-bit chunk banding + Hamming verify,
    * mega-bucket-guarded like [[candidatePairs]]: a duplicate-heavy
    * corpus puts B near-identical docs in the same 4 chunk buckets, and
    * all-pairs within those buckets is ~4·B²/2 candidates from one
    * cluster. One window pass (same shuffle key as the bucket join)
    * ranks docs within their (chunk, chunk_val) bucket; buckets above
    * [[MegaBucketThreshold]] pair each doc with its next
    * [[SimhashMegaAdjacency]] ranks — O(B·k) candidates — while normal
    * buckets keep the exhaustive all-pairs compare.
    *
    * Mega-bucket RECALL BOUND (explicit): ranks inside a mega bucket
    * order by the remaining 48 simhash bits (the matched chunk is equal
    * bucket-wide), the sorted-fingerprint locality of Manku/Jarvelin/
    * Sarma's WWW'07 simhash dedup — identical fingerprints are ALWAYS
    * rank-adjacent (Hamming-0 chains, reconnected by
    * [[connectedComponents]]), and fingerprints differing only in
    * low-order bits of that chunk sort nearby. A Hamming-1..3 pair
    * inside a HETEROGENEOUS mega bucket (> threshold docs sharing one
    * 16-bit chunk value without being near-identical) is recovered only
    * if < [[SimhashMegaAdjacency]] other docs sort between its ends in
    * every shared chunk's bucket — a documented recall-for-scale trade;
    * the spec plants exactly this regime and quantifies it. */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame =
    simhashCandidates(docs)
      .distinct()
      .filter(col("hamming") <= maxHamming)

  /** Next-k-ranks pairing width inside mega buckets. */
  val SimhashMegaAdjacency = 4

  /** The banding stage: (doc_a, doc_b, hamming) candidates BEFORE the
    * Hamming filter (and before distinct), exposed so specs can pin the
    * O(B)-per-mega-bucket candidate-volume guarantee directly. */
  def simhashCandidates(docs: DataFrame): DataFrame =
    // text IS NOT NULL up front: with SimHash64 marked nullIntolerant
    // the join keys' inferred not-null constraints simplify to this
    // same scan-level predicate instead of a second simhash64 eval.
    simhashCandidatesFromSigs(withSimhash(
      Scale.ensureParallelism(docs).filter(col("text").isNotNull)))

  /** Banding over precomputed (doc_id, simhash) rows — the production
    * path feeds [[withSimhash]] output; specs feed PLANTED fingerprints
    * to pin mega-bucket candidate volume and recall directly. */
  def simhashCandidatesFromSigs(withSim: DataFrame): DataFrame = {
    val chunks = withSim.select(col("doc_id"), col("simhash"), posexplode(
      array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL)): _*)))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_val")
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk"), col("chunk_val"))
    // mega-bucket rank order = unsigned simhash (sign bit flipped), then
    // doc_id: within a bucket the matched chunk is constant, so this
    // sorts by the remaining bits — near fingerprints land near ranks
    val ranked = chunks
      .withColumn("rk", row_number().over(byBucket.orderBy(
        col("simhash").bitwiseXOR(lit(Long.MinValue)), col("doc_id"))))
      .withColumn("bsz", count(lit(1)).over(byBucket))
    val hamming = bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
    ranked.as("x")
      .join(ranked.as("y"),
        col("x.chunk") === col("y.chunk") &&
          col("x.chunk_val") === col("y.chunk_val") &&
          ((col("x.bsz") <= MegaBucketThreshold &&
            col("x.doc_id") < col("y.doc_id")) ||
           (col("x.bsz") > MegaBucketThreshold &&
            col("y.rk") - col("x.rk") >= 1 &&
            col("y.rk") - col("x.rk") <= SimhashMegaAdjacency)))
      .select(
        least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"),
        hamming.as("hamming"))
  }

  def ddSimhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir), maxHamming = 3)

  // ---------------------------------------------- simhash gate ENVELOPES:
  // the per-doc signatures and the pair set depend on xxhash64, which the
  // oracle engine cannot reproduce — so the GATE forms emit measured
  // accuracy instead of raw hashes: quantities the oracle CAN compute
  // exactly (doc counts, exact n-gram-Jaccard ground truth) plus booleans
  // asserting the measured deltas sit inside the shipped envelope. The
  // raw forms stay public API ([[ddSimhash]], [[ddSimhashPairs]]) and
  // spec-pinned.

  /** dd_simhash gate: the native codegen'd SimHash64 kernel must agree
    * bit-for-bit with the interpreted HOF reference fold on EVERY doc —
    * measured per run, doc count cross-checked against the oracle. */
  def ddSimhashEnvelope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        graft.functions.SimHashFunctions.simhash64($"text").as("native"),
        hofSimhash($"text").as("hof"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(!($"native" <=> $"hof"), 1L).otherwise(0L)), lit(0L))
          .as("n_mismatch"))
      .select($"n_docs", $"n_mismatch", ($"n_mismatch" === 0).as("kernels_agree"))
  }

  val ddSimhashEnvelopeSql: String =
    """SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
      |  CAST(0 AS BIGINT) AS n_mismatch, TRUE AS kernels_agree""".stripMargin

  /** Precision floor on UNIGRAM (token-set) Jaccard: simhash is an
    * ORDERLESS bag-of-tokens fingerprint, so Hamming ≤ 3 of 64 implies
    * heavily-overlapping token sets — NOT overlapping trigram sequences
    * (same words reordered ⇒ identical simhash, near-zero trigram
    * Jaccard; measured: trigram min 0.0, unigram min 0.50/0.86/0.90
    * across sf0.1/0.01/0.001). The envelope therefore checks precision
    * against the similarity simhash actually sketches. */
  val SimhashPrecisionJaccard = 0.45
  /** Recall ground truth: exact TRIGRAM-Jaccard pairs at or above this
    * similarity inside the capped block (the planted near-dups). */
  val SimhashRecallJaccard = 0.9
  /** Recall ratio floor: Hamming ≤ 3 is a strict bar (bit-exact up to 3
    * votes), so it recovers a fraction of trigram-0.9 near-dups —
    * measured 0.60/0.78/0.86 across the gate corpora; shipped floor 0.5. */
  val SimhashRecallRatio = 0.5

  /** dd_simhash_pairs gate: measured precision/recall of the banded
    * simhash pair set against EXACT Jaccard ground truth — the "Jaccard
    * spot-check" as a machine-checked envelope. Precision: every emitted
    * pair has unigram Jaccard ≥ [[SimhashPrecisionJaccard]] (checked
    * over ALL emitted pairs). Recall: at least [[SimhashRecallRatio]] of
    * the trigram-Jaccard ≥ [[SimhashRecallJaccard]] pairs inside the
    * oracle-matched quadratic block (doc_id < [[JaccardBlockCap]], the
    * [[ddNgramJaccard]] ground truth) are recovered. `n_true_highsim`
    * is recomputed exactly by the oracle engine; the booleans assert
    * the measured envelope. */
  def ddSimhashPairsEnvelope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val pairs = simhashPairs(docs, maxHamming = 3)
    val uni = docs.select($"doc_id",
      array_distinct(graft.functions.ShingleFunctions.tokens(lower($"text")))
        .as("u"))
    val withJ = pairs
      .join(uni.select($"doc_id".as("doc_a"), $"u".as("u_a")), "doc_a")
      .join(uni.select($"doc_id".as("doc_b"), $"u".as("u_b")), "doc_b")
      .select(jaccard($"u_a", $"u_b").as("j"))
    val precision = withJ.agg(
      coalesce(min($"j"), lit(1.0)).as("min_j"))
    val truth = ddNgramJaccard(s, dir)
      .filter($"jaccard" >= SimhashRecallJaccard)
      .select($"doc_a", $"doc_b")
    val recovered = truth.join(pairs, Seq("doc_a", "doc_b"), "left_semi")
    val recall = truth.agg(count(lit(1)).as("n_true_highsim"))
      .crossJoin(recovered.agg(count(lit(1)).as("n_recovered")))
    precision.crossJoin(recall).select(
      $"n_true_highsim",
      ($"min_j" >= SimhashPrecisionJaccard).as("precision_ok"),
      ($"n_recovered" >= $"n_true_highsim" * SimhashRecallRatio).as("recall_ok"))
  }

  def ddSimhashPairsEnvelopeSql: String =
    s"""SELECT (SELECT COUNT(*) FROM (
       |  SELECT 1 FROM (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE doc_id < $JaccardBlockCap) a
       |  JOIN (SELECT doc_id, $shinglesSql AS sh FROM documents WHERE doc_id < $JaccardBlockCap) b
       |    ON a.doc_id < b.doc_id
       |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $SimhashRecallJaccard) t
       |) AS n_true_highsim, TRUE AS precision_ok, TRUE AS recall_ok""".stripMargin

  // ---------------------------------------------------- STREAMING dedup:
  /** Near-exact dedup on an unbounded stream: key = the full 64-min
    * MinHash signature (computed scan-side by the native expression, so
    * the stream stage stays stateless until the dedup operator), state
    * bounded by the watermark — the ingest-time guard a training-data
    * firehose needs. Full-signature equality keeps precision ~1 (only
    * j≈1 docs collide on all 64 mins); band-level candidate suppression
    * would also drop moderate-similarity docs and is left to the batch
    * LSH path where candidates get exact verification. */
  def streamingMinhashDedup(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("sig",
        graft.functions.MinHashFunctions.minhash_signature(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("sig")

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** STREAMING-mode dedup gate: the documents parquet replayed through a
    * real file-source micro-batch stream — split into TWO files
    * (`maxFilesPerTrigger=1` ⇒ two micro-batches) so duplicate pairs
    * cross the batch boundary and the dedup STATE STORE, not just
    * within-batch hashing, does the work. Keyed on the exact content
    * fingerprint (md5 of normalized text) rather than the minhash
    * signature so the gate emits a value DuckDB recomputes verbatim;
    * only the fingerprint column reaches the sink because WHICH doc of
    * a duplicate group survives is partition-order-dependent, while the
    * SET of surviving fingerprints is exact.
    *
    * Event time is synthesized as doc_id mod 60 seconds past a fixed
    * epoch, so the whole corpus spans one minute against a 1-hour
    * watermark delay: no fingerprint's state can be evicted mid-replay
    * and the converged sink must equal batch DISTINCT exactly. (The
    * production form keys the same operator on the minhash signature —
    * [[streamingMinhashDedup]] — where near-j=1 docs also collapse.) */
  def ddStreamExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val schema = docs.schema
    val src = java.nio.file.Files.createTempDirectory("graft_dd_stream")
    def writeSplit(idx: Int, part: DataFrame): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_dd_split$idx")
      try {
        part.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val listing = java.nio.file.Files.list(tmp)
        val f = try listing.toArray.map(_.toString)
          .filter(_.endsWith(".parquet")).sorted.head
        finally listing.close()
        val dest = src.resolve(f"0${idx}_docs.parquet")
        java.nio.file.Files.move(java.nio.file.Paths.get(f), dest)
        dest.toFile.setLastModified(1000000L + idx * 10000L)
        ()
      } finally deleteRecursively(tmp)
    }
    writeSplit(1, docs.filter($"doc_id" % 2 === 0))
    writeSplit(2, docs.filter($"doc_id" % 2 =!= 0))
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + $"doc_id" % 60))
      .withColumn("fp", md5(TextAnalysis.normalized($"text")))
      .select($"ts", $"fp")
    val name = s"dd_stream_exact_${streamRuns.incrementAndGet()}"
    // dedup state partitions from replayed bytes (clamped no-op at scale)
    val q = graft.streaming.StreamTune.withAdaptivePartitions(s,
      graft.streaming.StreamTune.dirBytes(src)) {
      stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("fp")
        .select($"fp")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
    }
    // drain, stop, then reclaim the corpus-sized replay dir — repeated
    // gate/bench runs must not accumulate copies of the corpus in /tmp
    try q.processAllAvailable() finally { q.stop(); deleteRecursively(src) }
    s.table(name)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
    finally walk.close()
  }

  val ddStreamExactSql: String =
    """SELECT DISTINCT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
      |  AS fp FROM documents""".stripMargin

  // ------------------------------------------------ fuzzy (edit-distance)
  // dedup: blocked by (brand × name-length band), exact levenshtein
  // within the block — the classic blocking+verify shape for typo-level
  // near-dups. Brand alone is a CONSTANT number of blocks (~25 in
  // TPC-H), so within-block pairing would stay O(n²/25) at any scale;
  // the length band grows the block count with the data. Blocking is
  // lossless: edits ≤ FuzzyMaxEdits bounds |len(a) − len(b)| ≤
  // FuzzyMaxEdits < FuzzyBandWidth, so a true pair is at most one band
  // apart — the a-side is replicated into its three adjacent bands
  // (3× one side, the price of losslessness) and every true pair meets
  // exactly once. The levenshtein threshold variant bails out of the
  // DP early for clearly-distant names.
  val FuzzyMaxEdits = 5
  /** Must exceed FuzzyMaxEdits for the adjacent-band guarantee. */
  val FuzzyBandWidth = 8
  def fuzzyNamePairs(part: DataFrame): DataFrame = {
    val p = part
      .select(col("p_partkey"), col("p_brand"), col("p_name"),
        expr(s"length(p_name) div $FuzzyBandWidth").as("band"))
    val a = p.select(col("p_brand"), col("p_partkey").as("key_a"),
      col("p_name").as("name_a"),
      explode(array(col("band") - 1, col("band"), col("band") + 1)).as("band"))
    val b = p.select(col("p_brand"), col("p_partkey").as("key_b"),
      col("p_name").as("name_b"), col("band"))
    a.join(b, Seq("p_brand", "band"))
      .filter(col("key_a") < col("key_b") &&
        abs(length(col("name_a")) - length(col("name_b"))) <= FuzzyMaxEdits)
      .select(col("p_brand"), col("key_a"), col("key_b"),
        levenshtein(col("name_a"), col("name_b"), FuzzyMaxEdits).as("edits"))
      .filter(col("edits") >= 0 && col("edits") <= FuzzyMaxEdits)
  }

  def ddFuzzyNames(s: SparkSession, dir: String): DataFrame =
    fuzzyNamePairs(Tables.part(s, dir))

  val ddFuzzyNamesSql: String =
    s"""SELECT a.p_brand, a.p_partkey AS key_a, b.p_partkey AS key_b,
       |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edits
       |FROM part a JOIN part b ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
       |WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxEdits""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_fuzzy_names" -> ddFuzzyNames,
    "dd_exact" -> ddExact,
    "dd_stream_exact" -> ddStreamExact,
    "dd_bloom_incremental" -> ddBloomIncremental,
    "dd_bloom_sharded" -> ddBloomSharded,
    "dd_dup_spans" -> ddDupSpans,
    "dd_decontaminate" -> ddDecontaminate,
    "dd_ngram_jaccard" -> ddNgramJaccard,
    "dd_minhash_lsh" -> ddMinhashLsh,
    "dd_minhash_lsh_full" -> ddMinhashLshFull,
    "dd_minhash_incremental" -> ddMinhashIncremental,
    "dd_clusters" -> ddClusters,
    "dd_retain" -> ddRetain,
    "dd_simhash" -> ddSimhashEnvelope,
    "dd_simhash_pairs" -> ddSimhashPairsEnvelope,
  )

  /** The raw simhash signatures/pairs need xxhash64 inside the oracle
    * engine (DuckDB has none), so their GATE forms emit measured
    * accuracy envelopes instead — kernel cross-implementation equality
    * for dd_simhash, exact-Jaccard precision/recall for
    * dd_simhash_pairs — whose expected rows the oracle CAN compute.
    * Raw forms remain public API and spec-pinned. */
  val oracles: Map[String, String] = Map(
    "dd_fuzzy_names" -> ddFuzzyNamesSql,
    "dd_exact" -> ddExactSql,
    "dd_stream_exact" -> ddStreamExactSql,
    "dd_bloom_incremental" -> ddBloomIncrementalSql,
    // same expected row as the whole-corpus form: exact counts + TRUE
    // booleans — the sharded construction must preserve both
    "dd_bloom_sharded" -> ddBloomIncrementalSql,
    "dd_dup_spans" -> ddDupSpansSql,
    "dd_decontaminate" -> ddDecontaminateSql,
    "dd_ngram_jaccard" -> ddNgramJaccardSql,
    "dd_minhash_lsh" -> ddMinhashLshSql,
    "dd_minhash_lsh_full" -> ddMinhashLshFullSql,
    "dd_minhash_incremental" -> ddMinhashIncrementalSql,
    "dd_clusters" -> ddClustersSql,
    "dd_retain" -> ddRetainSql,
    "dd_simhash" -> ddSimhashEnvelopeSql,
    "dd_simhash_pairs" -> ddSimhashPairsEnvelopeSql,
  )
}
