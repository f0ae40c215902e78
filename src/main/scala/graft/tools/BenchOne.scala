package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-protocol timing for a single named query (args(0)), with the
  * run count in args(1) (default 7) — the drift-adjudication harness:
  * same session config, warm-up, noop sink, and cache clearing as
  * graft.Bench, but many runs of ONE query so run-to-run spread on a
  * shared host is visible instead of folded into a min-of-3. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 7
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // ad-hoc unsalted twins of the sc_* gates, for the salted-overhead
    // comparison recorded in BASELINE.md (not part of the gate surface)
    val adhoc: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "adhoc_plain_sum_hicard" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        graft.Tables.lineitem(s, d)
          .groupBy(pmod(col("l_orderkey"), lit(1000L)).as("key"))
          .agg(sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("total"), count(lit(1)).as("n"))
      }),
      "adhoc_plain_join" -> ((s, d) => {
        import org.apache.spark.sql.functions._
        val left = graft.Tables.lineitem(s, d)
          .select(col("l_orderkey").as("orderkey"), col("l_linenumber"),
            col("l_quantity"))
        val right = graft.Tables.orders(s, d)
          .select(col("o_orderkey").as("orderkey"), col("o_custkey"),
            col("o_orderstatus"))
        left.join(right, "orderkey")
      }))
    val q = adhoc.getOrElse(name,
      graft.Bench.raw.getOrElse(name, graft.SparkEntry.queries(name)))
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[benchone] $name runs: ${times.map(t => f"$t%.3f").mkString(", ")}" +
      f" min=${times.min}%.3f median=${times.sorted.apply(runs / 2)}%.3f")
    spark.stop()
  }
}
