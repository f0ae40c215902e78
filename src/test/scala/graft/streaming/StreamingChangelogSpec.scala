package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Changelog

/** The CDC ingest loop: `foreachBatch` applying each micro-batch of
  * changelog rows to a STORED snapshot — compaction via
  * [[Changelog.applyChangelog]] and interval maintenance via
  * [[Changelog.scd2Apply]]. The production shape of both: state tables
  * stay snapshot-sized, history is never rescanned, and the final
  * stored state must equal the full-history batch computation exactly
  * (the same equivalence the `cdc_apply`/`cdc_scd2_apply` gates prove
  * for one split, here proved across MANY incremental applications). */
class StreamingChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (key, version, op, payload) — op "d" = tombstone
  private def history: Seq[(Long, Long, String, Double)] =
    (1L to 300L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", i * 1.5))

  test("foreachBatch compaction loop converges to the full-history state") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("cdc_loop")
    var snapDir: Option[String] = None
    val input = MemoryStream[(Long, Long, String, Double)](spark)
    val q = input.toDF().toDF("k", "v", "op", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val snapshot = snapDir match {
          case Some(d) => spark.read.parquet(d).withColumn("op", lit("u"))
          case None => batch.limit(0)
        }
        val next = Changelog.applyChangelog(snapshot, batch, Seq("k"),
          Seq(col("v")), col("op") === "d", Seq("v", "payload"))
        val dir = root.resolve(s"snap_$id").toString
        next.write.mode("overwrite").parquet(dir)
        snapDir = Some(dir)
      }
      .start()
    try {
      history.grouped(75).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()
    val stored = spark.read.parquet(snapDir.get)
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    val ref = Changelog.compact(history.toDF("k", "v", "op", "payload"),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .select($"k", $"v", $"payload").as[(Long, Long, Double)].collect().toSet
    assert(stored == ref)
  }

  test("foreachBatch MV-maintenance loop converges to the full rebuild") {
    import spark.implicits._
    // maintain BOTH the snapshot (auxiliary state) and the aggregate MV;
    // each micro-batch touches O(|batch|) state and O(|mv|) aggregate rows
    def bandAgg(state: org.apache.spark.sql.DataFrame) =
      state.groupBy(floor(col("payload") / 100).cast("long").as("grp"))
        .agg(count(lit(1)).as("n_keys"),
          sum(col("payload").cast("decimal(12,2)")).as("sum_payload"))
    val root = java.nio.file.Files.createTempDirectory("mv_loop")
    var snapDir: Option[String] = None
    var mvDir: Option[String] = None
    val input = MemoryStream[(Long, Long, String, Double)](spark)
    val q = input.toDF().toDF("k", "v", "op", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val snapshot = snapDir match {
          case Some(d) => spark.read.parquet(d).withColumn("op", lit("u"))
          case None => batch.limit(0)
        }
        val mv = mvDir match {
          case Some(d) => spark.read.parquet(d)
          case None => bandAgg(snapshot)
        }
        val nextMv = Changelog.aggMaintain(mv, snapshot, batch, Seq("k"),
          Seq(col("v")), col("op") === "d", Seq("v", "payload"),
          bandAgg, Seq("grp"), "n_keys")
        val nextSnap = Changelog.applyChangelog(snapshot, batch, Seq("k"),
          Seq(col("v")), col("op") === "d", Seq("v", "payload"))
        val (mvOut, snapOut) =
          (root.resolve(s"mv_$id").toString, root.resolve(s"snap_$id").toString)
        nextMv.write.mode("overwrite").parquet(mvOut)
        nextSnap.write.mode("overwrite").parquet(snapOut)
        mvDir = Some(mvOut); snapDir = Some(snapOut)
      }
      .start()
    try {
      history.grouped(75).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()
    val stored = spark.read.parquet(mvDir.get)
      .select($"grp", $"n_keys", $"sum_payload".cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    val ref = bandAgg(Changelog.compact(
        history.toDF("k", "v", "op", "payload"), Seq("k"), Seq(col("v")),
        col("op") === "d", Seq("v", "payload")))
      .select($"grp", $"n_keys", $"sum_payload".cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(stored == ref && stored.nonEmpty)
  }

  test("foreachBatch SCD2 loop converges to the full-history intervals") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("scd2_loop")
    var snapDir: Option[String] = None
    val input = MemoryStream[(Long, Long, String, Double)](spark)
    val q = input.toDF().toDF("k", "v", "op", "payload").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val next = snapDir match {
          case Some(d) => Changelog.scd2Apply(spark.read.parquet(d), batch,
            Seq("k"), col("v"), Seq.empty, col("op") === "d", Seq("payload"))
          case None => Changelog.scd2(batch, Seq("k"), col("v"), Seq.empty,
            col("op") === "d", Seq("payload"))
        }
        val dir = root.resolve(s"iv_$id").toString
        next.write.mode("overwrite").parquet(dir)
        snapDir = Some(dir)
      }
      .start()
    try {
      history.grouped(60).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()
    val stored = spark.read.parquet(snapDir.get)
      .select($"k", $"valid_from", $"valid_to", $"payload")
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    val ref = Changelog.scd2(history.toDF("k", "v", "op", "payload"),
      Seq("k"), col("v"), Seq.empty, col("op") === "d", Seq("payload"))
      .select($"k", $"valid_from", $"valid_to", $"payload")
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    assert(stored == ref)
  }

  test("streamed MV maintenance SERVES the rewrite after every batch") {
    import spark.implicits._
    import graft.plans.{MvCatalog, MvRewriteApi}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // state rows carry the band as a STORED column so queries can group
    // by an attribute the rewrite recognizes; MV naming follows the
    // sums-only register contract (cnt + sum_payload)
    def stateAgg(state: org.apache.spark.sql.DataFrame) =
      state.groupBy("band").agg(count(lit(1)).as("cnt"),
        sum(col("payload").cast("decimal(12,2)")).as("sum_payload"))
    def scanPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case r: LogicalRelation => r.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
      }.flatten
    val hist = (1L to 240L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", i * 1.5, (i % 20) / 5))
    val root = java.nio.file.Files.createTempDirectory("mv_serve_loop")
    var snapDir: Option[String] = None
    var mvDir: Option[String] = None
    val input = MemoryStream[(Long, Long, String, Double, Long)](spark)
    val q = input.toDF().toDF("k", "v", "op", "payload", "band").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val snapshot = snapDir match {
          case Some(d) => spark.read.parquet(d).withColumn("op", lit("u"))
          case None => batch.limit(0)
        }
        val mv = mvDir match {
          case Some(d) => spark.read.parquet(d)
          case None => stateAgg(snapshot)
        }
        val nextMv = Changelog.aggMaintain(mv, snapshot, batch, Seq("k"),
          Seq(col("v")), col("op") === "d", Seq("v", "payload", "band"),
          stateAgg, Seq("band"), "cnt")
        val nextSnap = Changelog.applyChangelog(snapshot, batch, Seq("k"),
          Seq(col("v")), col("op") === "d", Seq("v", "payload", "band"))
        val (mvOut, snapOut) =
          (root.resolve(s"summary_$id").toString, root.resolve(s"snap_$id").toString)
        nextMv.write.mode("overwrite").parquet(mvOut)
        nextSnap.write.mode("overwrite").parquet(snapOut)
        mvDir = Some(mvOut); snapDir = Some(snapOut)
        // publish: the freshly maintained MV now serves the new snapshot
        MvCatalog.register(spark, "bands", snapOut, Seq("band"),
          Seq("payload"), mvOut)
        MvRewriteApi.enable(spark)
      }
      .start()
    try {
      var batchNo = 0
      hist.grouped(80).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
        batchNo += 1
        // mid-stream query against the CURRENT snapshot: answered from
        // the maintained MV, equal to the direct computation
        val serveQ = () => spark.read.parquet(snapDir.get).groupBy("band")
          .agg(sum(col("payload")).as("s"), count(lit(1)).as("c"))
        MvCatalog.clear()
        val want = serveQ().collect().map(_.toString).sorted.toSeq
        MvCatalog.register(spark, "bands", snapDir.get, Seq("band"),
          Seq("payload"), mvDir.get)
        val served = serveQ()
        assert(scanPaths(served).forall(_.contains("summary_")),
          s"batch $batchNo not served from the MV: ${scanPaths(served)}")
        assert(served.collect().map(_.toString).sorted.toSeq == want,
          s"batch $batchNo served values diverge")
      }
    } finally q.stop()
  }
}
