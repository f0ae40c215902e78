package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line on stdout (driver contract).
  *
  * Headline queries span the engine's surface: scan-agg, broadcast and
  * fact⋈fact joins, window top-k, as-of, minhash dedup, knn, text
  * quality, sessionization. Each is forced through the `noop` sink so
  * the FULL plan executes (a bare `count()` would let Catalyst prune
  * projected expressions).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q2_filter_project", "q3_region_revenue",
    "q4_fact_join", "q4_bucketed", "q7_topk_per_group", "q9_top10_global",
    "q21_asof_join", "q29_asof_native", "wordcount_dataframe", "ta_quality",
    "ta_langid_ngram", "q33_theta_sketch",
    "dd_minhash_lsh_full", "dd_simhash_pairs", "ss_knn_brute", "ev_sessions")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warm-up outside the timed region
    SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    // two timed runs per query, report the min: steady-state cost without
    // first-run codegen/JIT compilation noise
    val results = headline.map { name =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        finally spark.catalog.clearCache() // isolate per-query cache/memory
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
