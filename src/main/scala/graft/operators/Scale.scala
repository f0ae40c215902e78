package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling building blocks for the 1000-executor case. AQE's skew
  * join handles sort-merge skew automatically; these are for the two
  * situations AQE does not cover: aggregation hot keys, and broadcast-
  * ineligible skewed joins where one key floods a task.
  *
  * Both are pure plan rewrites (no RDDs): salting is a column expression,
  * so everything stays inside codegen and the optimizer.
  */
object Scale {

  /** Repartition ONLY when the plan is under-parallel (e.g. one small
    * parquet file ⇒ one input split ⇒ a single task doing all the CPU
    * work). At real scale the scan already has thousands of splits and
    * this is a no-op — it guards the small-file edge without imposing a
    * corpus-wide shuffle on big inputs. */
  def ensureParallelism(df: DataFrame, minParts: Int): DataFrame =
    // probe the physical plan's partition count directly (toRdd is the
    // InternalRow RDD — no Row-encoder lineage is instantiated, and no
    // job runs; getNumPartitions only asks the scan for its splits)
    if (df.queryExecution.toRdd.getNumPartitions >= minParts) df
    else df.repartition(minParts)

  def ensureParallelism(df: DataFrame): DataFrame =
    ensureParallelism(df, df.sparkSession.sparkContext.defaultParallelism)

  /** Two-phase aggregation for hot grouping keys: group by (key, salt)
    * first (spreads a hot key over `salts` reducers), then re-aggregate
    * by key. Correct for any associative aggregate expressed as
    * (partialExpr, mergeExpr) pair on the same column name. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"), count(lit(1)).as("pn"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("total"), sum(col("pn")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a random salt
    * in [0, salts); the right side is replicated `salts` times so every
    * (key, salt) bucket finds its match. Turns one flooded task into
    * `salts` even ones; right-side blowup is the explicit price. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
