package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

/** Scale-adaptive parallelism for STREAMING queries — the streaming
  * twin of AQE partition coalescing, which micro-batch queries cannot
  * use (Spark disables AQE under streaming): the state/shuffle
  * partition count of a stateful streaming query is frozen at
  * `spark.sql.shuffle.partitions` when the query first starts, and
  * every epoch then pays one state-store load + checkpoint write PER
  * PARTITION regardless of how little data flows. Sizing that count
  * from the INPUT VOLUME (bytes ÷ the session's advisory partition
  * size, clamped to [1, configured partitions]) keeps a production
  * run at its configured parallelism — at real volumes the clamp is a
  * no-op — while a replay of a small slice stops paying hundreds of
  * empty state stores per epoch. The count does not affect results
  * (same keys, same aggregates, exact decimal sums); Spark pins it
  * into the checkpoint, so restarts stay consistent even if the conf
  * changes between runs. */
object StreamTune {

  /** Total bytes of regular files under `p` (0 when absent) — the
    * input-volume estimate for a staged file replay. */
  def dirBytes(p: Path): Long =
    if (!Files.isDirectory(p)) 0L
    else {
      val walk = Files.walk(p)
      try walk.filter(Files.isRegularFile(_))
        .mapToLong(f => Files.size(f)).sum()
      finally walk.close()
    }

  /** ceil(inputBytes / advisoryPartitionSize) clamped to
    * [1, spark.sql.shuffle.partitions]. */
  def adaptivePartitions(spark: SparkSession, inputBytes: Long): Int = {
    val cur = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val advisory = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "64MB"))
    val want = math.ceil(inputBytes.toDouble / math.max(1L, advisory)).toInt
    math.max(1, math.min(cur, want))
  }

  /** Serializes the set/start/restore windows: two concurrent query
    * starts mutating the same session's `spark.sql.shuffle.partitions`
    * could otherwise capture or restore each other's temporary value
    * (the conf only matters at `.start()` — Spark clones the session
    * into the stream — so holding the lock across `body` is cheap). */
  private val confLock = new Object

  /** Runs `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n` (restored after) — scoping the adaptive count to the streaming
    * query's start so the surrounding session keeps its parallelism. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    confLock.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val old = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try body finally spark.conf.set(key, old)
    }

  /** [[withShufflePartitions]] at [[adaptivePartitions]] of
    * `inputBytes`. */
  def withAdaptivePartitions[T](spark: SparkSession, inputBytes: Long)(
      body: => T): T =
    withShufflePartitions(spark, adaptivePartitions(spark, inputBytes))(body)
}
