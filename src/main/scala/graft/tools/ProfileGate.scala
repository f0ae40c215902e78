package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-level profile of ONE bench query: registers a listener that
  * prints every Spark job's wall duration, task count, and call site,
  * then runs the named query once through the bench's noop-sink
  * protocol (benchSplit gates run build and op halves separately, each
  * labelled). The measure-first tool of the optimization rounds: the
  * bench says WHICH gate is slow, this says WHICH of its jobs.
  * Args: name[,name…] [runs=1]. */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val runs = if (args.length > 1) args(1).toInt else 1
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
    val starts = new ConcurrentHashMap[Int, (Long, String, Int)]()
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(), site, nTasks))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (s, site, nTasks) =>
          val now = System.nanoTime()
          println(f"[job] id=${je.jobId}%3d at=${(s - t0) / 1e9}%7.3f " +
            f"dur=${(now - s) / 1e9}%6.3f tasks=$nTasks%4d  $site")
        }
      }
    })
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() // warm-up
    for (name <- names; r <- 1 to runs) {
      graft.operators.CowTable.benchSplit.get(name) match {
        case Some(mk0) =>
          val (bld, op) = mk0(spark, sfDir)
          t0 = System.nanoTime()
          println(s"=== run $r BUILD $name")
          val table = bld()
          val tb = System.nanoTime()
          println(f"=== build done ${(tb - t0) / 1e9}%.3f s")
          println(s"=== run $r OP $name")
          op(table).write.format("noop").mode("overwrite").save()
          println(f"=== op done ${(System.nanoTime() - tb) / 1e9}%.3f s")
        case None =>
          val q = graft.Bench.raw.getOrElse(name,
            graft.SparkEntry.queries(name))
          t0 = System.nanoTime()
          println(s"=== run $r $name")
          q(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"=== done ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
