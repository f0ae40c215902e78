package graft.operators

import org.apache.spark.sql.Dataset

/** Input-parallelism floor for DECODE-CLASS stages — operators whose
  * per-row cost dwarfs their row bytes (image/audio/video decodes,
  * per-vector centroid scoring, per-document signatures). A small
  * corpus arrives as ONE parquet file, and a 1-row-group file cannot
  * be split, so the scan plans a single task and the entire decode
  * serializes through one core while the rest of the cluster idles
  * (guide §2.5's unsplittable-input shape). `Spread(ds)` round-robin
  * repartitions the (tiny) driving rows up to the cluster's default
  * parallelism — ONLY when the input has fewer partitions than that:
  * a corpus-scale input already carries thousands of scan partitions
  * and passes through untouched, so no production shuffle is added.
  * Row-to-partition assignment is deterministic under retries (Spark
  * sorts before round-robin repartition, SPARK-23207), and none of
  * the callers' results depend on row placement. */
object Spread {
  /** Dataset-generic twin of [[Scale.ensureParallelism]] (same no-job
    * probe: `toRdd.getNumPartitions` asks the scan for its splits
    * without instantiating a Row-encoder lineage or running a job). */
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.queryExecution.toRdd.getNumPartitions >= want) ds
    else ds.repartition(want)
  }
}
