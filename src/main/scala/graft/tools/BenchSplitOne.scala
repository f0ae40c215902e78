package graft.tools

import org.apache.spark.sql.SparkSession

/** Converged-tail adjudication for ANY benchSplit gate (args(0)), the
  * generalization of [[BenchChanges]]: the fixture builds ONCE, then
  * the OP half runs args(1) times (default 9) against the same table —
  * so a bench drift attributes to the operator or to the build/JIT/
  * driver-latency half instead of being folded into min-of-3 of the
  * whole gate. Build time is reported once; op times as a full tail. */
object BenchSplitOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm-up
    val mk = graft.operators.CowTable.benchSplit(name)(spark, sfDir)
    val tb0 = System.nanoTime()
    val table = mk._1()
    val tb1 = System.nanoTime()
    val op = mk._2
    val times = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      op(table).write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      spark.catalog.clearCache()
      (t1 - t0) / 1e9
    }
    println(f"[benchsplit] $name build=${(tb1 - tb0) / 1e9}%.3f")
    println(f"[benchsplit] $name op: " +
      times.map(t => f"$t%.3f").mkString(", ") +
      f" min=${times.min}%.3f median=${times.sorted.apply(runs / 2)}%.3f")
    spark.stop()
  }
}
