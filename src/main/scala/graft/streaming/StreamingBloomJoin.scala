package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming Bloom-pruned join — the per-micro-batch form of
  * operators.Scale.bloomPrunedJoin: each micro-batch is pruned against
  * the STORED sharded-sketch table (operators.Dedup.shardedBloomSketches
  * artifact) before the real join, and the sketch table is RE-READ every
  * batch, so a dimension refresh lands mid-stream without restarting the
  * query — the sketch is versioned data, not query state.
  *
  * Why sharded: one row per shard broadcasts like any small dim table
  * and no single byte array grows with the dimension; the batch row
  * hashes to its shard and probes only that sketch. A shard row absent
  * from the table means the dimension holds NO keys in that shard, so
  * the batch row provably cannot join — it is pruned (inner-join
  * semantics; contrast the dedup ADMIT where absent ⇒ provably new ⇒
  * keep). Bloom false positives die in the real join, so output equals
  * the plain join against whichever dimension version the batch saw.
  *
  * At 100 TB rates this is the shape that keeps a fact stream joinable
  * against a huge slowly-changing dimension: the stream never shuffles
  * on unmatched keys (~match-rate × batch rows reach the join), and the
  * nightly dimension rebuild just overwrites the sketch table.
  */
object StreamingBloomJoin {

  /** Prune ONE batch against the sharded sketch table, then join. */
  def prunedBatchJoin(batch: DataFrame, sketches: DataFrame,
      small: DataFrame, key: String, shards: Int): DataFrame =
    prunedBatch(batch, sketches, key, shards).join(small, Seq(key))

  /** The Bloom reduction alone (pre-join survivor set). */
  def prunedBatch(batch: DataFrame, sketches: DataFrame, key: String,
      shards: Int): DataFrame =
    batch
      .withColumn("__shard", pmod(xxhash64(col(key)), lit(shards.toLong)))
      .join(broadcast(sketches.select(col("shard").as("__shard"), col("sk"))),
        Seq("__shard"), "left")
      .filter(coalesce(graft.functions.BloomFunctions
        .bloom_might_contain_shard(col("__shard"), col("sk"), col(key)),
        lit(false)))
      .drop("__shard", "sk")

  /** Start the foreachBatch loop: per micro-batch, re-read the stored
    * sketch table + dimension, prune, join, append to the parquet sink.
    * `onBatch(batchRows, survivorRows)` (only invoked when `instrument`)
    * lets callers observe the reduction ratio. */
  def start(stream: DataFrame, sketchDir: String, smallDir: String,
      outDir: String, key: String, shards: Int,
      instrument: Boolean = false,
      onBatch: (Long, Long) => Unit = (_, _) => ()): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val sketches = s.read.parquet(sketchDir)
        val small = s.read.parquet(smallDir)
        val pruned = prunedBatch(batch, sketches, key, shards)
        if (instrument) onBatch(batch.count(), pruned.count())
        pruned.join(small, Seq(key))
          .write.mode("append").parquet(outDir)
      }
      .start()
}
