package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Corpus-wide approximate k-NN join ([[Similarity.knnJoinOn]]): exact
  * recall on a planted clustered fixture, the O(n·nprobe·cell) cost
  * contract, and the no-cartesian plan shape. */
class KnnJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 8

  /** 3 tight clusters around orthogonal axes: 12 vectors each, axis
    * component 1.0, a small deterministic per-vector wiggle on one
    * other coordinate so vectors are distinct, all unit-normalized. */
  private def fixture() = {
    val rows = for {
      cl <- 0 until 3
      j <- 0 until 12
    } yield {
      val v = Array.fill(Dim)(0.0)
      v(cl) = 1.0
      v(3 + (j % 4)) = 0.05 + 0.01 * j
      val n = math.sqrt(v.map(x => x * x).sum)
      (cl * 12L + j, cl.toLong, v.map(x => (x / n).toFloat).toSeq)
    }
    rows.toDF("vec_id", "cluster", "embedding")
  }

  test("probe-1 join on a planted clustered corpus is exact within clusters") {
    val fix = fixture()
    val cents = Similarity.trainCentroids(
      fix.select($"vec_id", $"embedding"), k = 3, rounds = 5)
    val nn = Similarity.knnJoinOn(
      fix.select($"vec_id", $"embedding"), cents, nprobe = 1, k = 5)
    // every vector has exactly 5 neighbors, all from its own cluster
    val joined = nn.join(fix.select($"vec_id".as("q_id"),
        $"cluster".as("q_cluster")), Seq("q_id"))
      .join(fix.select($"vec_id".as("neighbor_id"),
        $"cluster".as("n_cluster")), Seq("neighbor_id"))
    assert(joined.count() == 36 * 5)
    assert(joined.filter($"q_cluster" =!= $"n_cluster").count() == 0,
      "a probe-1 neighbor crossed clusters on a cleanly separated corpus")
    // and matches brute force exactly (probe-1 covers the true top-5
    // because the true neighbors share the query's cell)
    val brute = Similarity.knnBruteOn(
      fix.select($"vec_id", $"embedding"), numQueries = 36, k = 5)
      .select($"q_id", $"neighbor_id")
    assert(nn.select($"q_id", $"neighbor_id")
      .exceptAll(brute).count() == 0, "join disagrees with brute force")
  }

  test("candidate count is Σ|probed cells| − own-cell hits, never all-pairs") {
    val fix = fixture().select($"vec_id", $"embedding")
    val cents = Similarity.trainCentroids(fix, k = 3, rounds = 5)
    val nprobe = 2
    val n = fix.count()
    val got = Similarity.knnJoinCandidates(fix, cents, nprobe).count()
    // expected: per query, the sizes of its nprobe probed cells, minus
    // one when its own cell is probed (self excluded) — computed
    // independently of the join under test
    val assigned = fix.select($"vec_id",
      Similarity.assignCell($"embedding", cents).as("cell"))
    val cellSizes = assigned.groupBy($"cell").agg(count(lit(1)).as("sz"))
    val probes = fix.select($"vec_id".as("q_id"),
      Similarity.assignCell($"embedding", cents).as("own_cell"),
      explode(Similarity.probeCells($"embedding", cents, nprobe)).as("cell"))
    val expected = probes.join(cellSizes, Seq("cell"))
      .select(($"sz" - when($"cell" === $"own_cell", 1L).otherwise(0L))
        .as("c"))
      .agg(sum($"c")).head().getLong(0)
    assert(got == expected, s"candidate count $got != expected $expected")
    assert(got < n * (n - 1), "candidate set degenerated to all-pairs")
  }

  test("salting splits a planted hot cell; candidate set unchanged") {
    // skewed corpus: 30 of 36 vectors share cluster 0's cell
    val rows = (0 until 36).map { j =>
      val v = Array.fill(Dim)(0.0)
      if (j < 30) { v(0) = 1.0; v(3 + (j % 4)) = 0.05 + 0.01 * j }
      else { v(1 + (j % 2)) = 1.0; v(5) = 0.05 + 0.01 * j }
      val n = math.sqrt(v.map(x => x * x).sum)
      (j.toLong, v.map(x => (x / n).toFloat).toSeq)
    }
    val fix = rows.toDF("vec_id", "embedding")
    val cents = Similarity.trainCentroids(fix, k = 3, rounds = 5)
    val plain = Similarity.knnJoinCandidates(fix, cents, nprobe = 1)
    val salted = Similarity.knnJoinCandidates(fix, cents, nprobe = 1,
      salts = 4)
    // identical candidate pairs — each (q, x) meets at exactly one salt
    assert(salted.select($"q_id", $"vec_id")
      .exceptAll(plain.select($"q_id", $"vec_id")).count() == 0)
    assert(plain.select($"q_id", $"vec_id")
      .exceptAll(salted.select($"q_id", $"vec_id")).count() == 0)
    // no single-task concentration: the hot cell's candidates spread
    // over `salts` join-key groups, each well under the unsalted mass
    val hot = plain.groupBy($"cell").count()
      .orderBy($"count".desc).head()
    val hotCell = hot.getInt(0)
    val hotMass = hot.getLong(1)
    val saltedAssign = fix.select($"vec_id",
      Similarity.assignCell($"embedding", cents).as("cell"),
      graft.operators.Scale.saltOf(Seq($"vec_id"), 4).cast("int")
        .as("salt"))
    val groups = saltedAssign.filter($"cell" === hotCell)
      .groupBy($"salt").count().collect().map(r => r.getLong(1))
    assert(groups.length == 4, s"hot cell not split: ${groups.toSeq}")
    assert(groups.max < hotMass,
      "one salt shard still holds the whole hot cell")
    // the PQ join accepts salting through the same path and stays exact
    // on the clustered fixture (probe-1, clusters cleanly separated)
    val books = Similarity.trainCodebooks(
      fixture().select($"vec_id", $"embedding"))
    val nnSalted = Similarity.knnJoinPqOn(
      fixture().select($"vec_id", $"embedding"), cents = Similarity
        .trainCentroids(fixture().select($"vec_id", $"embedding"), 3, 5),
      books = books, nprobe = 1, k = 5, shortlist = 12, salts = 4)
    val brute = Similarity.knnBruteOn(
      fixture().select($"vec_id", $"embedding"), numQueries = 36, k = 5)
      .select($"q_id", $"neighbor_id")
    val hits = nnSalted.select($"q_id", $"neighbor_id")
      .join(brute, Seq("q_id", "neighbor_id"), "left_semi").count()
    assert(hits >= (36 * 5 * 0.9).toInt,
      s"salted PQ join recall collapsed: $hits/180")
  }

  test("packed PQ codes agree with the array form bit-for-bit") {
    val fix = fixture().select($"vec_id", $"embedding")
    val books = Similarity.trainCodebooks(fix)
    val both = fix.select(
      Similarity.pqEncode($"embedding", books).as("arr"),
      Similarity.pqEncodePacked($"embedding", books).as("packed"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val arr = r.getSeq[Int](0)
      val packed = r.getLong(1)
      arr.zipWithIndex.foreach { case (c, m) =>
        assert(((packed >> (8 * m)) & 0xFFL).toInt == c,
          s"code $m diverged: arr=$arr packed=$packed")
      }
    }
  }

  test("PQ join from STORED codes equals scan-side encoding") {
    val fix = fixture().select($"vec_id", $"embedding")
    val cents = Similarity.trainCentroids(fix, k = 3, rounds = 5)
    val books = Similarity.trainCodebooks(fix)
    // persist (vec_id, cell, codes) — the stored-index shape where the
    // candidate path never touches raw vectors — and round-trip it
    val codedPath = java.nio.file.Files
      .createTempDirectory("graft_join_codes").toString
    fix.select($"vec_id",
        Similarity.assignCell($"embedding", cents).as("cell"),
        Similarity.pqEncodePacked($"embedding", books).as("codes"))
      .write.mode("overwrite").parquet(codedPath)
    val stored = spark.read.parquet(codedPath)
    val viaStored = Similarity.knnJoinPqOn(fix, cents, books, nprobe = 1,
      k = 5, shortlist = 12, coded = Some(stored))
    val viaScan = Similarity.knnJoinPqOn(fix, cents, books, nprobe = 1,
      k = 5, shortlist = 12)
    assert(viaStored.collect().map(_.toString).sorted.toSeq ==
      viaScan.collect().map(_.toString).sorted.toSeq)
  }

  test("PQ join from a CoW code table: DV retraction flows through; " +
      "codebook pin refused on mismatch") {
    val fix = fixture().select($"vec_id", $"embedding")
    val cents = Similarity.trainCentroids(fix, k = 3, rounds = 5)
    val books = Similarity.trainCodebooks(fix)
    val table = java.nio.file.Files
      .createTempDirectory("graft_join_codes_cow").toString + "/t"
    // incremental build: even half init, odd half MERGE
    CowTable.init(Similarity.pqCodesFrame(
      fix.filter($"vec_id" % 2 === 0), cents, books), table)
    CowTable.mergeInto(spark, table, Similarity.pqCodesFrame(
      fix.filter($"vec_id" % 2 === 1), cents, books), Seq("vec_id"))
    // the snapshot equals scan-side encoding of the whole corpus
    val coded = Similarity.readCowPqCodes(spark, table, books)
    val viaCow = Similarity.knnJoinPqOn(fix, cents, books, nprobe = 1,
      k = 5, shortlist = 12, coded = Some(coded))
    val viaScan = Similarity.knnJoinPqOn(fix, cents, books, nprobe = 1,
      k = 5, shortlist = 12)
    assert(viaCow.collect().map(_.toString).sorted.toSeq ==
      viaScan.collect().map(_.toString).sorted.toSeq)
    // retraction: a DV delete removes vectors from the candidate side
    CowTable.deleteWhere(spark, table, $"vec_id" < 6L)
    val afterDel = Similarity.knnJoinPqOn(fix, cents, books, nprobe = 1,
      k = 5, shortlist = 12,
      coded = Some(Similarity.readCowPqCodes(spark, table, books)))
    assert(afterDel.filter($"neighbor_id" < 6L).count() == 0,
      "a retracted vector resurfaced as a neighbor")
    assert(afterDel.groupBy($"q_id").count()
      .filter($"count" =!= 5L).count() == 0, "coverage lost after DV")
    // a codebook rebuild must be refused loudly
    val otherBooks = Similarity.trainCodebooks(
      fix.withColumn("embedding", reverse($"embedding")))
    val ex = intercept[IllegalArgumentException] {
      Similarity.readCowPqCodes(spark, table, otherBooks)
    }
    assert(ex.getMessage.contains("codebook"))
  }

  test("filtered join: neighbors all qualify and equal brute-force-on-filtered") {
    val fix = fixture()
    val emb = fix.select($"vec_id", $"embedding",
      ($"vec_id" % 3).as("label"))
    val cents = Similarity.trainCentroids(
      fix.select($"vec_id", $"embedding"), k = 3, rounds = 5)
    val books = Similarity.trainCodebooks(
      fix.select($"vec_id", $"embedding"))
    val pred = col("label") === 1 // 12 of 36 qualify, across clusters
    val nn = Similarity.knnJoinPqFilteredOn(emb, pred, cents, books,
      nprobe = 1, k = 5, shortlist = 12)
    // every emitted neighbor qualifies
    assert(nn.join(emb.filter(pred).select($"vec_id".as("neighbor_id")),
      Seq("neighbor_id"), "left_anti").count() == 0)
    // every query gets exactly min(k, qualifying-excl-self)
    val per = nn.groupBy($"q_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L until 36L).foreach { q =>
      val avail = if (q % 3 == 1) 11 else 12
      assert(per.getOrElse(q, 0L) == math.min(5, avail).toLong,
        s"query $q coverage ${per.get(q)}")
    }
    // equals brute force restricted to the qualifying corpus: the
    // probe widening (nprobe 1 / p=1/3 -> 3 = all cells) makes the
    // filtered join EXACT here
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
    val truth = emb.filter(pred).as("c")
      .join(fix.select($"vec_id".as("q_id"), $"embedding".as("q_vec")),
        col("vec_id") =!= col("q_id"))
      .select($"q_id", $"vec_id",
        Similarity.cosine($"q_vec", $"embedding").as("cosine"))
      .withColumn("rank", row_number().over(wb))
      .filter($"rank" <= 5)
      .select($"q_id", $"vec_id".as("neighbor_id"))
    assert(nn.select($"q_id", $"neighbor_id").exceptAll(truth).count() == 0,
      "filtered join diverged from brute-force-on-filtered")
    // post-filtering the UNfiltered top-k provably under-delivers here
    // (a cluster's top-5 are same-cluster; only ~1/3 qualify)
    val post = Similarity.knnJoinPqOn(fix.select($"vec_id", $"embedding"),
        cents, books, nprobe = 1, k = 5, shortlist = 12)
      .join(emb.filter(pred).select($"vec_id".as("neighbor_id")),
        Seq("neighbor_id"), "left_semi")
    assert(post.count() < nn.count(),
      "post-filter should lose neighbors the pushed filter keeps")
  }

  test("packed encoding refuses >8 subspaces (BIGINT capacity guard)") {
    val nine = IndexedSeq.fill(9)(IndexedSeq(Array(0.0, 1.0)))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqEncodePacked($"embedding", nine)
    }
    assert(e.getMessage.contains("8 subspaces"), e.getMessage)
  }

  test("a stale array<int> code table is refused with an explicit message") {
    val fix = fixture().select($"vec_id", $"embedding")
    val cents = Similarity.trainCentroids(fix, k = 3, rounds = 5)
    val books = Similarity.trainCodebooks(fix)
    val table = java.nio.file.Files
      .createTempDirectory("graft_join_codes_stale").toString + "/t"
    // persist codes under the PRE-packed array<int> layout with the
    // CURRENT codebook fingerprint — the pin alone would let it through
    CowTable.init(fix.select($"vec_id",
      Similarity.assignCell($"embedding", cents).as("cell"),
      Similarity.pqEncode($"embedding", books).as("codes"),
      lit(PqIndex.codebookHash(books)).as("book_fp")), table)
    val e = intercept[IllegalArgumentException] {
      Similarity.readCowPqCodes(spark, table, books)
    }
    assert(e.getMessage.contains("stale code table"), e.getMessage)
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("plan: one cell join + one window, no cartesian product") {
    val fix = fixture().select($"vec_id", $"embedding")
    val cents = Similarity.trainCentroids(fix, k = 3, rounds = 5)
    val nn = Similarity.knnJoinOn(fix, cents, nprobe = 2, k = 5)
    val plan = nn.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"k-NN join planned a product join:\n$plan")
    // the top-k is the group-limit window, rank pushed into the sort
    assert(plan.contains("WindowGroupLimit") || plan.contains("Window"),
      s"missing windowed top-k:\n$plan")
  }
}
