package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ChangelogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (key, version, op, value) — op "d" = tombstone
  private def log(rows: (Long, Long, String, Double)*) =
    rows.toDF("k", "v", "op", "payload")

  private def compacted(df: org.apache.spark.sql.DataFrame) =
    Changelog.compact(df, Seq("k"), Seq(col("v")), col("op") === "d",
      Seq("v", "payload"))
      .select($"k", $"v", $"payload").as[(Long, Long, Double)]
      .collect().toSet

  test("compact: latest version wins, tombstones drop the key") {
    val l = log(
      (1L, 1L, "u", 10.0), (1L, 3L, "u", 30.0), (1L, 2L, "u", 20.0),
      (2L, 1L, "u", 1.0), (2L, 2L, "d", 0.0),
      (3L, 5L, "d", 0.0), (3L, 7L, "u", 7.0))
    assert(compacted(l) == Set((1L, 3L, 30.0), (3L, 7L, 7.0)))
  }

  test("compact is partitioning-invariant") {
    val rows = (1L to 500L).map(i =>
      (i % 40, i, if (i % 17 == 0) "d" else "u", i.toDouble))
    val ref = compacted(log(rows: _*))
    for (parts <- Seq(1, 7, 32))
      assert(compacted(log(rows: _*).repartition(parts)) == ref, s"parts=$parts")
  }

  test("applyChangelog(snapshot, slice) == compact(full history) at any split") {
    val rows = (1L to 400L).map(i =>
      (i % 25, i, if (i % 11 == 0) "d" else "u", i * 1.5))
    val full = log(rows: _*)
    val ref = compacted(full)
    for (split <- Seq(100L, 250L, 399L)) {
      val snapshot = Changelog.compact(full.filter($"v" < split),
        Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
        .withColumn("op", lit("u"))
      val applied = Changelog.applyChangelog(snapshot,
        full.filter($"v" >= split), Seq("k"), Seq(col("v")),
        col("op") === "d", Seq("v", "payload"))
        .select($"k", $"v", $"payload").as[(Long, Long, Double)]
        .collect().toSet
      assert(applied == ref, s"split=$split")
    }
  }

  test("a tombstoned key stays dead unless the slice re-inserts it") {
    val history = log((9L, 1L, "u", 1.0), (9L, 2L, "d", 0.0))
    val snapshot = Changelog.compact(history, Seq("k"), Seq(col("v")),
      col("op") === "d", Seq("v", "payload")).withColumn("op", lit("u"))
    assert(snapshot.isEmpty) // key 9 is dead in the snapshot
    val slice = log((9L, 3L, "u", 3.0))
    val applied = Changelog.applyChangelog(snapshot, slice, Seq("k"),
      Seq(col("v")), col("op") === "d", Seq("v", "payload"))
    assert(applied.select($"k", $"v", $"payload").as[(Long, Long, Double)]
      .collect().toSet == Set((9L, 3L, 3.0)))
  }

  test("rank-1 compaction plans a WindowGroupLimit pre-prune") {
    val plan = Changelog.cdcLatest(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pre-prune in:\n$plan")
  }

  private def scd2Of(df: org.apache.spark.sql.DataFrame) =
    Changelog.scd2(df, Seq("k"), col("v"), Seq.empty, col("op") === "d",
      Seq("payload"))
      .select($"k", $"valid_from", $"valid_to", $"payload")
      .as[(Long, Long, Option[Long], Double)].collect().toSet

  test("scd2: versions chain, tombstones close but emit nothing") {
    val l = log(
      (1L, 1L, "u", 10.0), (1L, 3L, "u", 30.0), (1L, 2L, "u", 20.0),
      (2L, 1L, "u", 1.0), (2L, 2L, "d", 0.0),
      (3L, 5L, "d", 0.0), (3L, 7L, "u", 7.0))
    assert(scd2Of(l) == Set(
      (1L, 1L, Some(2L), 10.0), (1L, 2L, Some(3L), 20.0),
      (1L, 3L, None, 30.0),
      (2L, 1L, Some(2L), 1.0), // closed by the tombstone, which emits nothing
      (3L, 7L, None, 7.0)))
  }

  test("scd2 point-in-time slice == compact of the history up to t") {
    val rows = (1L to 400L).map(i =>
      (i % 25, i, if (i % 11 == 0) "d" else "u", i * 1.5))
    val full = log(rows: _*)
    val intervals = scd2Of(full)
    for (t <- Seq(50L, 199L, 400L)) {
      val atT = intervals.collect {
        case (k, from, to, p) if from <= t && to.forall(_ > t) => (k, p)
      }
      val ref = compacted(full.filter($"v" <= t))
        .map { case (k, _, p) => (k, p) }
      assert(atT == ref, s"t=$t")
    }
  }

  test("scd2 plans one exchange: keyed shuffle + window, no self-join") {
    val plan = Changelog.cdcScd2(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length -
      "ReusedExchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one exchange in:\n$plan")
  }

  test("scd2Apply(snapshot, slice) == scd2(full history) at any split") {
    val rows = (1L to 400L).map(i =>
      (i % 25, i, if (i % 11 == 0) "d" else "u", i * 1.5))
    val full = log(rows: _*)
    val ref = scd2Of(full)
    for (split <- Seq(100L, 250L, 399L)) {
      val snapshot = Changelog.scd2(full.filter($"v" < split), Seq("k"),
        col("v"), Seq.empty, col("op") === "d", Seq("payload"))
      val merged = Changelog.scd2Apply(snapshot, full.filter($"v" >= split),
        Seq("k"), col("v"), Seq.empty, col("op") === "d", Seq("payload"))
        .select($"k", $"valid_from", $"valid_to", $"payload")
        .as[(Long, Long, Option[Long], Double)].collect().toSet
      assert(merged == ref, s"split=$split")
    }
  }

  test("scd2Apply: tombstone-first slice closes without emitting; untouched keys stay open") {
    val history = log((1L, 1L, "u", 1.0), (2L, 1L, "u", 2.0))
    val snapshot = Changelog.scd2(history, Seq("k"), col("v"), Seq.empty,
      col("op") === "d", Seq("payload"))
    // slice touches only key 1, and its first row is a tombstone
    val slice = log((1L, 5L, "d", 0.0), (1L, 8L, "u", 8.0))
    val merged = Changelog.scd2Apply(snapshot, slice, Seq("k"), col("v"),
      Seq.empty, col("op") === "d", Seq("payload"))
      .select($"k", $"valid_from", $"valid_to", $"payload")
      .as[(Long, Long, Option[Long], Double)].collect().toSet
    assert(merged == Set(
      (1L, 1L, Some(5L), 1.0), // closed at the tombstone, which emits nothing
      (1L, 8L, None, 8.0), // re-inserted after the delete
      (2L, 1L, None, 2.0))) // untouched key keeps its open interval
  }

  test("gate twins agree: cdc_apply == cdc_latest on testdata") {
    val latest = Changelog.cdcLatest(spark, TestSpark.sf0001)
    val applied = Changelog.cdcApply(spark, TestSpark.sf0001)
    assert(latest.count() > 0)
    assert(latest.exceptAll(applied).isEmpty && applied.exceptAll(latest).isEmpty)
  }

  test("point-in-time join: facts hit the interval containing them; tombstone gaps give NULL") {
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(60000L * min)
    // user 1: v1@10, tombstone@20, v2@30  → intervals [10,20) and [30,∞)
    // user 2: no versions at all
    val dimLog = Seq(
      (1L, ts(10), 100L, 1.0, "view"),
      (1L, ts(20), 101L, 0.0, "error"),
      (1L, ts(30), 102L, 2.0, "view"))
      .toDF("user_id", "ts", "event_id", "value", "event_type")
    val dim = Changelog.scd2(dimLog, Seq("user_id"), col("ts"),
        Seq(col("event_id")), col("event_type") === "error",
        Seq("event_id", "value"))
      .select($"user_id".as("d_user_id"), $"valid_from", $"valid_to",
        $"event_id".as("s_event_id"), $"value".as("s_value"))
    val facts = Seq(
      (900L, 1L, ts(5)),   // before any version → NULL
      (901L, 1L, ts(15)),  // inside [10,20) → v1
      (902L, 1L, ts(20)),  // AT the tombstone boundary → NULL (gap)
      (903L, 1L, ts(25)),  // inside the gap → NULL
      (904L, 1L, ts(30)),  // AT v2's valid_from → v2 (inclusive)
      (905L, 1L, ts(99)),  // open interval → v2
      (906L, 2L, ts(50)))  // keyless user → NULL
      .toDF("purchase_id", "user_id", "ts")
    val joined = graft.plans.AsofJoinApi.joinAsof(
      facts, dim, Seq(facts("user_id")), Seq(dim("d_user_id")),
      facts("ts"), dim("valid_from"))
    val live = col("valid_from").isNotNull &&
      (col("valid_to").isNull || col("ts") < col("valid_to"))
    val got = joined.select($"purchase_id",
        when(live, $"s_event_id").as("state_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      900L -> None, 901L -> Some(100L), 902L -> None, 903L -> None,
      904L -> Some(102L), 905L -> Some(102L), 906L -> None))
  }

  test("cdc_scd2_pit gate: every purchase resolves, state versions precede the fact") {
    val pit = Changelog.cdcScd2Pit(spark, TestSpark.sf0001)
    val n = pit.count()
    assert(n > 0)
    // no resolved state may start after its fact's time
    assert(pit.filter($"state_valid_from" > $"ts").isEmpty)
    // matched rows carry a full state tuple; unmatched rows a fully-null one
    assert(pit.filter($"state_event_id".isNotNull &&
      ($"state_value".isNull || $"state_valid_from".isNull)).isEmpty)
  }

  // ------------------------------------------------- aggMaintain (MV upkeep)

  // MV over the test log's state: payload decade bands, count + exact sum.
  private def bandAgg(state: org.apache.spark.sql.DataFrame) =
    state.groupBy(floor(col("payload") / 10).cast("long").as("grp"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("payload").cast("decimal(12,2)")).as("sum_payload"))

  private def mvRows(df: org.apache.spark.sql.DataFrame) =
    df.select($"grp", $"n_keys", $"sum_payload".cast("double"))
      .as[(Long, Long, Double)].collect().toSet

  private def maintained(full: org.apache.spark.sql.DataFrame, split: Long) = {
    val snapshot = Changelog.compact(full.filter($"v" < split),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .withColumn("op", lit("u"))
    Changelog.aggMaintain(bandAgg(snapshot), snapshot,
      full.filter($"v" >= split), Seq("k"), Seq(col("v")),
      col("op") === "d", Seq("v", "payload"), bandAgg,
      Seq("grp"), "n_keys")
  }

  test("aggMaintain == full re-aggregation at any split") {
    val rows = (1L to 400L).map(i =>
      (i % 25, i, if (i % 11 == 0) "d" else "u", (i % 73) * 1.5))
    val full = log(rows: _*)
    val ref = mvRows(bandAgg(Changelog.compact(full, Seq("k"),
      Seq(col("v")), col("op") === "d", Seq("v", "payload"))))
    for (split <- Seq(100L, 250L, 399L))
      assert(mvRows(maintained(full, split)) == ref, s"split=$split")
  }

  test("aggMaintain: a group empties out when its last key is tombstoned") {
    // key 1 is band 9's only member in the snapshot; the slice deletes it
    val full = log(
      (1L, 1L, "u", 95.0), (2L, 1L, "u", 10.0), (3L, 1L, "u", 12.0),
      (1L, 5L, "d", 0.0))
    val mv = mvRows(maintained(full, 3L))
    assert(!mv.exists(_._1 == 9L), s"band 9 should be gone: $mv")
    assert(mv == Set((1L, 2L, 22.0)))
  }

  test("aggMaintain: an upsert migrates a key between groups exactly") {
    // key 1 moves from band 0 (5.0) to band 3 (35.0); band 0 keeps key 2
    val full = log(
      (1L, 1L, "u", 5.0), (2L, 1L, "u", 7.0),
      (1L, 5L, "u", 35.0))
    val mv = mvRows(maintained(full, 3L))
    assert(mv == Set((0L, 1L, 7.0), (3L, 1L, 35.0)))
  }

  test("aggMaintain: a slice-only insert creates its group from nothing") {
    val full = log((2L, 1L, "u", 7.0), (8L, 5L, "u", 41.0))
    val mv = mvRows(maintained(full, 3L))
    assert(mv == Set((0L, 1L, 7.0), (4L, 1L, 41.0)))
  }

  test("aggMaintain keeps a stable MV schema across repeated cycles") {
    val rows = (1L to 299L).map(i =>
      (i % 20, i, if (i % 13 == 0) "d" else "u", (i % 57) * 2.0))
    val full = log(rows: _*)
    val ref = mvRows(bandAgg(Changelog.compact(full, Seq("k"),
      Seq(col("v")), col("op") === "d", Seq("v", "payload"))))
    // three maintenance cycles: 0→100→200→300
    var snapshot = Changelog.compact(full.filter($"v" < 100),
      Seq("k"), Seq(col("v")), col("op") === "d", Seq("v", "payload"))
      .withColumn("op", lit("u"))
    var mv = bandAgg(snapshot)
    val schema0 = mv.schema.map(f => (f.name, f.dataType))
    for (lo <- Seq(100L, 200L)) {
      val slice = full.filter($"v" >= lo && $"v" < lo + 100)
      mv = Changelog.aggMaintain(mv, snapshot, slice, Seq("k"),
        Seq(col("v")), col("op") === "d", Seq("v", "payload"), bandAgg,
        Seq("grp"), "n_keys")
      snapshot = Changelog.applyChangelog(snapshot, slice, Seq("k"),
        Seq(col("v")), col("op") === "d", Seq("v", "payload"))
        .withColumn("op", lit("u"))
      assert(mv.schema.map(f => (f.name, f.dataType)) == schema0,
        "measure types must not widen across maintenance cycles")
    }
    assert(mvRows(mv) == ref)
  }

  test("cdc_agg_maintain gate: maintained MV equals the full rebuild") {
    val got = Changelog.cdcAggMaintain(spark, TestSpark.sf0001)
      .as[(Long, Long, Double)].collect().toSet
    val events = graft.Tables.events(spark, TestSpark.sf0001)
    val ref = Changelog.valueBandAgg(Changelog.compact(events,
        Seq("user_id"), Seq(col("ts"), col("event_id")),
        col("event_type") === "error", Seq("ts", "event_id", "value")))
      .select($"grp", $"n_keys", $"sum_value".cast("double"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == ref && got.nonEmpty)
  }
}
