package graft.tools

import org.apache.spark.sql.SparkSession

/** Converged-tail adjudication of the `lh_changes` OP half (the
  * round-12 drift watch): builds the gate fixture ONCE, then times the
  * v0→v2 change feed many times with the construction (manifest
  * file-set algebra + DV-touched discovery, driver-coordinated jobs)
  * separated from the execution (the keyed diff join) — so a drift
  * attributes to a STAGE, not to the whole op. */
object BenchChanges {
  def main(args: Array[String]): Unit = {
    val runs = if (args.nonEmpty) args(0).toInt else 9
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
    val mk = graft.operators.CowTable.benchSplit("lh_changes")(spark, sfDir)
    val table = mk._1()
    val op = mk._2
    val rows = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val df = op(table) // construction: file algebra + DV discovery
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save() // the diff join
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    val c = rows.map(_._1)
    val e = rows.map(_._2)
    println(f"[benchchanges] construct: " +
      rows.map(r => f"${r._1}%.3f").mkString(", ") +
      f" min=${c.min}%.3f")
    println(f"[benchchanges] execute:   " +
      rows.map(r => f"${r._2}%.3f").mkString(", ") +
      f" min=${e.min}%.3f")
    println(f"[benchchanges] op total min=${c.min + e.min}%.3f " +
      f"median=${rows.map(r => r._1 + r._2).sorted.apply(runs / 2)}%.3f")
    spark.stop()
  }
}
