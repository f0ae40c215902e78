package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  * Plain `spark.read.parquet` so Catalyst gets pushdown/pruning on the
  * scan; at cluster scale these would be partitioned/bucketed tables but
  * the call sites stay identical. */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which vanilla Spark rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a raw nanos long and convert to
    * a microsecond TIMESTAMP with integer `div` (a double division would
    * lose precision above 2^53 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Materialize lineitem + orders bucketed AND sorted on their join
    * keys (equal bucket counts), the physical layout that makes the
    * fact⋈fact join exchange-free: both sides hash to the same bucket
    * space, so SortMergeJoin reads co-located buckets with no shuffle —
    * at cluster scale this turns the biggest shuffle of the workload
    * into a map-side join. One-time cost, amortized across every
    * downstream orderkey join; idempotent per (JVM tmpdir, sfDir). */
  def materializeBucketed(s: SparkSession, dir: String,
      buckets: Int = 8): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/$tag"
    val li = s"li_bkt_$tag"
    val ord = s"ord_bkt_$tag"
    if (!s.catalog.tableExists(li)) {
      lineitem(s, dir).write
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$base/lineitem").mode("overwrite").saveAsTable(li)
    }
    if (!s.catalog.tableExists(ord)) {
      orders(s, dir).write
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$base/orders").mode("overwrite").saveAsTable(ord)
    }
    (li, ord)
  }

  /** Second bucketed hot key — customer ⋈ orders co-located on custkey —
    * showing the bucketed-layout story generalizes beyond the lineitem
    * fact join (same exchange-free plan shape on a different join
    * axis). */
  def materializeBucketedCust(s: SparkSession, dir: String,
      buckets: Int = 8): (String, String) = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_bucketed/$tag"
    val cust = s"cust_bkt_$tag"
    val ordc = s"ordc_bkt_$tag"
    if (!s.catalog.tableExists(cust)) {
      customer(s, dir).write
        .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
        .option("path", s"$base/customer").mode("overwrite").saveAsTable(cust)
    }
    if (!s.catalog.tableExists(ordc)) {
      orders(s, dir).write
        .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
        .option("path", s"$base/orders_by_cust").mode("overwrite").saveAsTable(ordc)
    }
    (cust, ordc)
  }
}
