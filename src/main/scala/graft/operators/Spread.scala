package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.catalyst.plans.logical._

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
  /** Narrow pass-throughs over ONE leaf: exactly the shapes whose
    * physical plan is exchange-free, so the `toRdd` partition probe
    * below cannot materialize anything. A plan with an aggregation /
    * join / repartition in it would, under AQE, run (and discard) its
    * upstream shuffle stages just to answer `getNumPartitions` — and
    * such a plan already gets its parallelism from the exchange, so
    * the floor is moot there and the input passes through untouched. */
  private[operators] def probeSafe(p: LogicalPlan): Boolean = scanRooted(p)

  private def scanRooted(p: LogicalPlan): Boolean = p match {
    case _: LeafNode => true
    case _: Project | _: Filter | _: SubqueryAlias | _: TypedFilter |
         _: SerializeFromObject | _: DeserializeToObject |
         _: MapPartitions | _: MapElements => scanRooted(p.children.head)
    case _ => false
  }

  /** Dataset-generic twin of [[Scale.ensureParallelism]] (same no-job
    * probe: `toRdd.getNumPartitions` asks the scan for its splits
    * without instantiating a Row-encoder lineage or running a job —
    * guarded to scan-rooted plans, where that no-job claim holds even
    * with AQE enabled). */
  def apply[T](ds: Dataset[T]): Dataset[T] = {
    if (!scanRooted(ds.queryExecution.optimizedPlan)) return ds
    val want = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.queryExecution.toRdd.getNumPartitions >= want) ds
    else ds.repartition(want)
  }
}
