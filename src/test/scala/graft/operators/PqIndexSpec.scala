package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class PqIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshIndex(): String = {
    val base = java.nio.file.Files.createTempDirectory("pqindex").toString
    PqIndex.buildPqIndex(spark, TestSpark.sf0001, base)
    base
  }

  test("ss_knn_pq_stored gate: recall envelope holds and plan is index-only") {
    val row = PqIndex.ssKnnPqStored(spark, TestSpark.sf0001).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("n_queries") == Similarity.NumQueries)
    assert(row(0).getAs[Long]("k") == Similarity.K)
    assert(row(0).getAs[Boolean]("recall_ok"),
      "stored-index recall vs brute force fell below the envelope")
    assert(row(0).getAs[Boolean]("index_only"),
      "served plan scanned the corpus parquet instead of only the index")
  }

  test("second batch touches only the index: no corpus scan in the plan") {
    val base = freshIndex()
    // a FRESH batch arriving from memory — never seen at build time
    val rnd = new scala.util.Random(23)
    val batch = (1000L to 1004L).map { id =>
      val v = Array.fill(Similarity.PqDim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(x => (x / n).toFloat))
    }.toDF("q_id", "embedding")
    val knn = PqIndex.knnPqStored(spark, base, batch)
    val paths = PqIndex.scannedPaths(knn)
    assert(paths.nonEmpty)
    assert(paths.forall(_.contains(base)),
      s"plan scans outside the index: ${paths.filterNot(_.contains(base))}")
    assert(!paths.exists(_.contains("embeddings.parquet")),
      "second batch re-scanned the corpus parquet")
    val rows = knn.collect()
    assert(rows.length == 5 * Similarity.K)
    rows.groupBy(_.getAs[Long]("q_id")).values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to Similarity.K))
    }
  }

  test("append encodes only the batch; appended vector is immediately served") {
    val base = freshIndex()
    // plant a vector nearly identical to query 7's embedding
    val q7 = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .filter($"vec_id" === 7L).select($"embedding")
      .as[Array[Float]].head()
    val planted = 999999L
    val batchDf = Seq((planted, q7.map(x => x * 0.5f)))
      .toDF("vec_id", "embedding") // scaled copy: cosine 1 with q7
    PqIndex.appendToPqIndex(spark, base, batchDf)
    // the append itself must not scan the corpus — only write batch rows
    val codes = spark.read.parquet(s"$base/codes.parquet")
    assert(codes.filter($"vec_id" === planted).count() == 1)
    val q = Seq((7L, q7)).toDF("q_id", "embedding")
    val top = PqIndex.knnPqStored(spark, base, q)
      .filter($"rank" === 1).select($"neighbor_id").as[Long].head()
    assert(top == planted,
      s"appended near-identical vector not served as top neighbor (got $top)")
  }

  test("codebook version mismatch is refused with a typed error") {
    val base = freshIndex()
    // pin a DIFFERENT codebook version in meta — as if the codes were
    // written under other centroids
    val meta = spark.read.parquet(s"$base/meta.parquet").collect()(0)
    val tampered = Seq((meta.getAs[Int]("format"),
      meta.getAs[Long]("book_fp") + 1L, meta.getAs[Long]("data_fp"),
      meta.getAs[Int]("m"), meta.getAs[Int]("k"), meta.getAs[Int]("dim"),
      meta.getAs[Int]("shortlist")))
      .toDF("format", "book_fp", "data_fp", "m", "k", "dim", "shortlist")
    tampered.write.mode("overwrite").parquet(s"$base/meta.parquet")
    val batch = Seq((0L, Array.fill(Similarity.PqDim)(0.1f)))
      .toDF("q_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      PqIndex.knnPqStored(spark, base, batch).collect()
    }
    assert(ex.getMessage.contains("codebook"),
      s"expected a codebook-version refusal, got: ${ex.getMessage}")
  }

  test("foreign format tag is refused, never probed") {
    val base = freshIndex()
    val meta = spark.read.parquet(s"$base/meta.parquet").collect()(0)
    val tampered = Seq((12345,
      meta.getAs[Long]("book_fp"), meta.getAs[Long]("data_fp"),
      meta.getAs[Int]("m"), meta.getAs[Int]("k"), meta.getAs[Int]("dim"),
      meta.getAs[Int]("shortlist")))
      .toDF("format", "book_fp", "data_fp", "m", "k", "dim", "shortlist")
    tampered.write.mode("overwrite").parquet(s"$base/meta.parquet")
    val ex = intercept[IllegalArgumentException] {
      PqIndex.readMeta(spark, base)
    }
    assert(ex.getMessage.contains("format"))
  }

  test("stored codes equal a fresh encode: build is deterministic") {
    val base = freshIndex()
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
    val books = Similarity.cachedCodebooks(emb, TestSpark.sf0001)
    val fresh = emb.select($"vec_id",
      Similarity.pqEncode($"embedding", books).as("codes"))
    val stored = spark.read.parquet(s"$base/codes.parquet")
      .select($"vec_id", $"codes")
    assert(stored.join(fresh, Seq("vec_id"))
      .filter(stored("codes") =!= fresh("codes")).count() == 0)
  }

  test("append with a stale codebook expectation is refused; current pin is accepted") {
    val base = freshIndex()
    val meta = PqIndex.readMeta(spark, base)
    val batch = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .filter($"vec_id" === 3L)
      .select(lit(888888L).as("vec_id"), $"embedding")
    // a batch prepared against a codebook version the index no longer
    // pins (rebuilt in between) must be refused, not silently mixed in
    val ex = intercept[IllegalArgumentException] {
      PqIndex.appendToPqIndex(spark, base, batch,
        expectBookFp = Some(meta.bookFp + 1L))
    }
    assert(ex.getMessage.contains("rebuilt"))
    assert(spark.read.parquet(s"$base/codes.parquet")
      .filter($"vec_id" === 888888L).count() == 0, "refused append wrote rows")
    // the matching pin goes through
    PqIndex.appendToPqIndex(spark, base, batch,
      expectBookFp = Some(meta.bookFp))
    assert(spark.read.parquet(s"$base/codes.parquet")
      .filter($"vec_id" === 888888L).count() == 1)
  }

  test("concurrent ensurePqIndex builders converge on one consistent index") {
    // point both builders at a base that does not exist yet
    val tmp = java.nio.file.Files.createTempDirectory("pq_race")
    val saved = System.getProperty("java.io.tmpdir")
    System.setProperty("java.io.tmpdir", tmp.toString)
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val dirs = Await.result(
        Future.sequence(Seq(
          Future(PqIndex.ensurePqIndex(spark, TestSpark.sf0001)),
          Future(PqIndex.ensurePqIndex(spark, TestSpark.sf0001)))),
        10.minutes)
      assert(dirs.distinct.size == 1)
      val base = dirs.head
      // the surviving index is complete and readable...
      val meta = PqIndex.readMeta(spark, base)
      assert(meta.dataFp == Similarity.dataFingerprint(spark, TestSpark.sf0001))
      assert(spark.read.parquet(s"$base/codes.parquet").count() ==
        graft.Tables.embeddings(spark, TestSpark.sf0001).count())
      // ...and no losing staging tree lingers next to it
      val siblings = java.nio.file.Files.list(
          java.nio.file.Paths.get(base).getParent)
        .toArray.map(_.toString)
      assert(!siblings.exists(_.contains("__staging_")),
        s"staging leftovers: ${siblings.filter(_.contains("__staging_")).toSeq}")
    } finally System.setProperty("java.io.tmpdir", saved)
  }
}
