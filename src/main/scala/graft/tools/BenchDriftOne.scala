package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Cross-run ACCUMULATION check for a benchSplit gate (args(0)) — the
  * drift shape [[BenchSplitOne]] cannot see: BenchSplitOne builds the
  * fixture once and re-runs the op, but the driver's bench rebuilds a
  * FRESH table per run (exactly like `Bench.main`), so a monotonic
  * per-run growth there (round-15 verdict: lh_bloom_prune 13.1 →
  * 15.8 → 21.3 in the driver session vs 2.96 s quiet) could come from
  * state that compounds ACROSS whole-gate runs — tmp-dir growth, block
  * -manager litter, sidecar re-work — rather than the operator.
  *
  * Per run it reports wall seconds for the build and op halves PLUS
  * the task-metrics the drift hypotheses predict would grow:
  * executor bytes read/written, shuffle bytes, task count, GC time,
  * and the gate-table byte footprint left on disk. Run N doing the
  * same IO as run 1 but taking longer = host/JVM aging, not
  * accumulation; growing IO = a real compounding bug to fix. */
object BenchDriftOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // driver heap is fixed by the forked JVM's -Xmx (build.sbt) — a
    // spark.driver.memory set here, after JVM start, is a no-op in
    // local mode, so no such knob is offered

    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0L)
    val bytesWritten = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val gcMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytesRead.addAndGet(m.inputMetrics.bytesRead)
          bytesWritten.addAndGet(m.outputMetrics.bytesWritten)
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead +
            m.shuffleWriteMetrics.bytesWritten)
          gcMs.addAndGet(m.jvmGCTime)
          tasks.incrementAndGet()
        }
      }
    })

    def dirBytes(p: java.nio.file.Path): Long =
      if (!java.nio.file.Files.exists(p)) 0L
      else {
        val s = java.nio.file.Files.walk(p)
        try s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
        finally s.close()
      }

    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm-up

    val mk = graft.operators.CowTable.benchSplit(name)
    println("[benchdrift] run build_s op_s tasks input_mb output_mb " +
      "shuffle_mb gc_ms table_mb")
    (1 to runs).foreach { run =>
      bytesRead.set(0); bytesWritten.set(0); shuffleBytes.set(0)
      gcMs.set(0); tasks.set(0)
      val (build, op) = mk(spark, sfDir)
      val t0 = System.nanoTime()
      val table = build()
      val t1 = System.nanoTime()
      op(table).write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      val tblMb = dirBytes(java.nio.file.Paths.get(table)) / 1e6
      println(f"[benchdrift] $run%2d ${(t1 - t0) / 1e9}%7.3f " +
        f"${(t2 - t1) / 1e9}%7.3f ${tasks.get()}%6d " +
        f"${bytesRead.get() / 1e6}%9.1f ${bytesWritten.get() / 1e6}%9.1f " +
        f"${shuffleBytes.get() / 1e6}%10.1f ${gcMs.get()}%6d $tblMb%8.1f")
    }
    spark.stop()
  }
}
