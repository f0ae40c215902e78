package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.PqIndex

/** Streaming ANN serving loop: vector ingest and query serving as one
  * foreachBatch micro-batch loop over the STORED PQ index — each batch
  * appends its vectors under the frozen build-time codebooks (carrying
  * the caller-side version pin) and then serves a probe query, so the
  * sink records what a caller would have retrieved AT THAT POINT in the
  * stream. Appends must be visible to the very next serve, and a
  * mid-stream index rebuild must fail the pinned append loudly instead
  * of mixing code spaces. */
class StreamingAnnServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-batch append is served immediately; results track the stream") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ann_serve").toString
    PqIndex.buildPqIndex(spark, TestSpark.sf0001, base)
    val bookFp = PqIndex.readMeta(spark, base).bookFp
    // probe = corpus vector 7's embedding, served as an external query
    val probe = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .filter($"vec_id" === 7L).select($"embedding")
      .as[Array[Float]].head()
    val served = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          PqIndex.appendToPqIndex(spark, base, batch,
            expectBookFp = Some(bookFp))
          val top = PqIndex.knnPqStored(spark, base,
            Seq((7L, probe)).toDF("q_id", "embedding"))
            .filter(col("rank") === 1)
            .select(col("neighbor_id")).as[Long].head()
          served.add(id -> top)
          ()
        }
      }
      .start()
    try {
      // batch 1: a scaled copy of the probe (cosine 1) under a new id —
      // must immediately displace the corpus top-1
      input.addData(Seq((700001L, probe.map(_ * 0.5f))))
      q.processAllAvailable()
      // batch 2: an even closer vector under a higher id; ADC ties at
      // cosine 1 break by vec_id ASC, so the earlier plant stays top-1 —
      // the serve must still see BOTH appended rows in the index
      input.addData(Seq((700002L, probe.map(_ * 2.0f))))
      q.processAllAvailable()
    } finally q.stop()
    val results = served.toArray(Array.empty[(Long, Long)]).toSeq.map(_._2)
    assert(results == Seq(700001L, 700001L),
      s"served top-1 per batch: $results")
    // both streamed vectors landed in the stored index
    val ids = spark.read.parquet(s"$base/codes.parquet")
      .filter(col("vec_id") >= 700000L).select(col("vec_id"))
      .as[Long].collect().toSet
    assert(ids == Set(700001L, 700002L))
  }

  test("a mid-stream index rebuild fails the pinned append loudly") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ann_rebuild").toString
    PqIndex.buildPqIndex(spark, TestSpark.sf0001, base)
    val bookFp = PqIndex.readMeta(spark, base).bookFp
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = input.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          PqIndex.appendToPqIndex(spark, base, batch,
            expectBookFp = Some(bookFp))
          ()
        }
      }
      .start()
    val vec = Array.fill(64)(0.1f)
    try {
      input.addData(Seq((800001L, vec)))
      q.processAllAvailable()
      // simulate a rebuild that repinned the codebooks: bump book_fp
      val meta = spark.read.parquet(s"$base/meta.parquet").collect().head
      Seq((meta.getAs[Int]("format"), meta.getAs[Long]("book_fp") + 1L,
        meta.getAs[Long]("data_fp"), meta.getAs[Int]("m"),
        meta.getAs[Int]("k"), meta.getAs[Int]("dim"),
        meta.getAs[Int]("shortlist")))
        .toDF("format", "book_fp", "data_fp", "m", "k", "dim", "shortlist")
        .coalesce(1).write.mode("overwrite").parquet(s"$base/meta.parquet")
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        input.addData(Seq((800002L, vec)))
        q.processAllAvailable()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("rebuilt"))),
        s"expected the pin-refusal error, got: ${ex.getMessage}")
    } finally q.stop()
  }
}
