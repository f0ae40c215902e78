package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** Multi-micro-batch Bloom-pruned join with a MID-STREAM sketch refresh:
  * batches before the dimension rebuild prune against sketch v1, batches
  * after against v2 — without restarting the query — and every batch's
  * output equals the plain join against the dimension version it saw. */
class StreamingBloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Shards = 8

  test("per-batch sketch refresh: pruning follows the stored dimension version") {
    import spark.implicits._
    val sketchDir = java.nio.file.Files.createTempDirectory("sbj_sk").toString
    val smallDir = java.nio.file.Files.createTempDirectory("sbj_dim").toString
    val outDir = java.nio.file.Files.createTempDirectory("sbj_out").toString

    def publishDim(maxKey: Long): Unit = {
      val dim = (0L until maxKey).map(k => (k, s"payload_$k")).toDF("k", "p")
      dim.write.mode("overwrite").parquet(smallDir)
      Dedup.shardedBloomSketches(dim, col("k"), Shards,
          expectedItems = math.max(64L, 2L * maxKey / Shards), fpp = 0.01)
        .write.mode("overwrite").parquet(sketchDir)
    }

    publishDim(50L) // v1: keys 0..49
    val counts = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val input = MemoryStream[(Long, Long)](spark)
    val q = StreamingBloomJoin.start(
      input.toDF().toDF("fact_id", "k"), sketchDir, smallDir, outDir,
      key = "k", shards = Shards, instrument = true,
      onBatch = (n, surv) => { counts.add((n, surv)); () })
    try {
      // batch 1: facts 0..99 against v1 → only k<50 should join
      input.addData((0L until 100L).map(i => (1000L + i, i)))
      q.processAllAvailable()
      // dimension rebuild lands MID-STREAM (no query restart)
      publishDim(80L) // v2: keys 0..79
      // batch 2: same key range against v2 → k<80 joins now
      input.addData((0L until 100L).map(i => (2000L + i, i)))
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.read.parquet(outDir)
      .select($"fact_id", $"k", $"p").as[(Long, Long, String)]
      .collect().toSet
    val expected =
      (0L until 50L).map(k => (1000L + k, k, s"payload_$k")).toSet ++
      (0L until 80L).map(k => (2000L + k, k, s"payload_$k")).toSet
    assert(out == expected)

    // the Bloom layer did real pruning pre-join: survivors ≪ batch size
    // and ≥ the true match count (FPs possible, FNs impossible)
    val recorded = counts.toArray(Array.empty[(Long, Long)]).toSeq
      .filter(_._1 > 0) // the engine may schedule empty micro-batches
    assert(recorded.size == 2)
    val Seq((n1, s1), (n2, s2)) = recorded
    assert(n1 == 100L && s1 >= 50L && s1 < 100L,
      s"batch 1: $s1 of $n1 survived (expected ~50)")
    assert(n2 == 100L && s2 >= 80L && s2 < 100L,
      s"batch 2: $s2 of $n2 survived (expected ~80)")
  }
}
