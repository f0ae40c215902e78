package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC / changelog materialization — the "apply the upsert stream"
  * operator every warehouse ingest pipeline runs: a changelog of
  * versioned UPSERT/DELETE rows per key compacts to the latest state
  * (latest-wins, tombstones drop the key), and a stored snapshot plus a
  * newer changelog slice re-compacts to exactly the full-history state.
  *
  * The gate treats `events` as the changelog: key = user_id, total
  * version order = (ts, event_id), `event_type = 'error'` rows as
  * tombstones, everything else as an upsert of `value`.
  *
  * Plan shape at 100 TB: one shuffle keyed on the CDC key, then a
  * per-key window taking rank 1 by version DESC — the rank-1 filter
  * triggers Catalyst's WindowGroupLimit rewrite, so every map task
  * pre-prunes to its local latest row per key BEFORE the exchange and
  * the shuffle carries ≤ one row per (task, key), not the full
  * changelog. The incremental form ([[applyChangelog]]) is the
  * production loop: state tables stay snapshot-sized, each batch
  * compacts against the snapshot instead of re-reading history —
  * the same snapshot+delta shape as the incremental minhash dedup.
  */
object Changelog {

  /** Latest row per key (ties impossible once `versions` is a total
    * order), tombstones dropped. Emits the key, the version columns,
    * and `payload` columns of the winning row. */
  def compact(log: DataFrame, key: Seq[String], versions: Seq[Column],
      isDelete: Column, payload: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key.map(col): _*)
      .orderBy(versions.map(_.desc): _*)
    log.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1 && !isDelete)
      .drop("__rk")
      .select((key ++ payload).map(col): _*)
  }

  /** Apply a newer changelog slice to a compacted snapshot: the snapshot
    * rows re-enter as upserts at their stored versions (all older than
    * every slice row), so one [[compact]] over the union yields the same
    * state as compacting the full history — tombstoned keys stay dead
    * unless the slice re-inserts them, upserts win by version. The gate
    * asserts this equivalence against the full-history oracle. */
  def applyChangelog(snapshot: DataFrame, slice: DataFrame, key: Seq[String],
      versions: Seq[Column], isDelete: Column, payload: Seq[String])
      : DataFrame =
    compact(snapshot.unionByName(slice, allowMissingColumns = true),
      key, versions, isDelete, payload)

  /** SCD2 intervalization: the changelog re-expressed as validity
    * intervals — each surviving version of a key is valid from its own
    * timestamp until the NEXT change of that key (upsert or tombstone),
    * `valid_to` NULL for the current version. The other half of the CDC
    * family: [[compact]] answers "what is the state now", `scd2` answers
    * "what was the state at time t" (point-in-time joins, training-data
    * as-of-date snapshots).
    *
    * Tombstones participate in the LEAD (they close the preceding
    * version's interval) but emit no row themselves — a deleted key has
    * no valid version until re-inserted.
    *
    * Plan shape at 100 TB: identical to [[compact]] — one shuffle keyed
    * on the CDC key, one per-key sorted window pass (LEAD over the
    * version order). No self-join, no second exchange; history stays
    * distributed. `timeCol` is the version column that defines interval
    * endpoints (the remaining `versions` only tie-break the order). */
  def scd2(log: DataFrame, key: Seq[String], timeCol: Column,
      versions: Seq[Column], isDelete: Column, payload: Seq[String])
      : DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key.map(col): _*)
      .orderBy(timeCol +: versions: _*)
    log.withColumn("__valid_to", lead(timeCol, 1).over(w))
      .filter(!isDelete)
      .select((key.map(col) :+ timeCol.as("valid_from") :+
        col("__valid_to").as("valid_to")) ++ payload.map(col): _*)
  }

  /** Incremental SCD2 maintenance — merge a newer changelog slice into a
    * stored [[scd2]] interval table WITHOUT rebuilding history: each key
    * touched by the slice gets its open interval closed at the key's
    * FIRST slice version (tombstone or upsert — both end the previous
    * validity), and the slice's own intervals are appended via [[scd2]]
    * on the slice alone. Precondition (same as [[applyChangelog]]):
    * every slice version is newer than every stored version of its key.
    *
    * Equivalence to `scd2(full history)` — the gate proves it against
    * the same oracle: intervals fully inside the snapshot are untouched
    * by later rows (LEAD looks only forward within a key, and slice rows
    * sort after all snapshot rows); the one OPEN interval per touched
    * key is exactly the row whose LEAD, in the full history, is the
    * key's first slice version; slice-internal LEADs see nothing after
    * the slice. Tombstone-first slices close without emitting —
    * a deleted key's interval ends at the delete, and the key has no
    * valid version until re-inserted.
    *
    * Plan shape at 100 TB: the close-join's build side is one row per
    * TOUCHED key (slice-sized, typically delta ≪ snapshot) so AQE
    * broadcasts it and the snapshot streams map-side; the append side
    * shuffles only the slice. History is never rescanned — the same
    * snapshot+delta economics as [[applyChangelog]]. */
  def scd2Apply(snapshot: DataFrame, slice: DataFrame, key: Seq[String],
      timeCol: Column, versions: Seq[Column], isDelete: Column,
      payload: Seq[String]): DataFrame = {
    val ordered = struct(timeCol.as("__t") +:
      versions.zipWithIndex.map { case (c, i) => c.as(s"__v$i") }: _*)
    val firsts = slice.groupBy(key.map(col): _*)
      .agg(min(ordered).as("__m"))
      .select(key.map(col) :+ col("__m.__t").as("__first"): _*)
    val closed = snapshot.join(firsts, key, "left")
      .withColumn("valid_to",
        when(col("valid_to").isNull && col("__first").isNotNull,
          col("__first")).otherwise(col("valid_to")))
      .drop("__first")
    closed.unionByName(
      scd2(slice, key, timeCol, versions, isDelete, payload))
  }

  /** Incremental materialized-aggregate maintenance — keep a grouped
    * aggregate of the compacted state current under a changelog slice
    * WITHOUT re-aggregating the full state (the DBSP/differential
    * retract-add pattern: Budiu et al., "DBSP: Automatic Incremental
    * View Maintenance", VLDB 2023).
    *
    * `stateAgg` maps a state table to the materialized view; its measure
    * columns (everything not in `grpCols`) must be ADDITIVE and EXACT
    * (counts, integral or decimal sums) — retraction is algebraic
    * negation, which is only sound in exact arithmetic (a double sum
    * retracted and re-added drifts by cancellation; a decimal does not).
    * Averages and other ratios derive from maintained sums at read time.
    *
    * The update touches O(|slice|) state: the slice's distinct keys
    * semi-join their OLD rows out of the snapshot, the NEW rows come
    * from compacting just those keys' rows with the slice, and the MV
    * merges `mv − stateAgg(old) + stateAgg(new)` with one grouped sum.
    * Groups whose maintained `countGuard` drops to zero disappear —
    * exactly as they would under a full re-aggregation.
    *
    * Plan shape at 100 TB: the touched-key semi-join broadcasts the
    * slice's key set, so the snapshot is read once map-side with no
    * shuffle of state; the merge aggregates |mv| + 2·|touched groups|
    * rows, both delta-sized. The MV never depends on snapshot scan
    * order, so the maintained table is bit-identical to the rebuilt one.
    *
    * Preconditions mirror [[applyChangelog]]: snapshot rows evaluate
    * `isDelete` false and carry their version columns; every slice
    * version is newer than every stored version of its key. Measure
    * columns are cast back to the incoming MV's exact types so repeated
    * maintenance cycles keep a stable schema (decimal sums widen per
    * aggregation and would otherwise hit the precision cap). */
  def aggMaintain(mv: DataFrame, snapshot: DataFrame, slice: DataFrame,
      key: Seq[String], versions: Seq[Column], isDelete: Column,
      payload: Seq[String], stateAgg: DataFrame => DataFrame,
      grpCols: Seq[String], countGuard: String): DataFrame = {
    val touched = slice.select(key.map(col): _*).distinct()
    val oldRows = snapshot.join(broadcast(touched), key, "left_semi")
    val newRows = applyChangelog(oldRows, slice, key, versions, isDelete,
      payload)
    val oldAgg = stateAgg(oldRows)
    val measures = oldAgg.columns.filterNot(grpCols.contains).toSeq
    val retract = oldAgg.select(
      grpCols.map(col) ++ measures.map(c => (-col(c)).as(c)): _*)
    val merged = mv.unionByName(retract).unionByName(stateAgg(newRows))
      .groupBy(grpCols.map(col): _*)
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(c => sum(col(c)).as(c)): _*)
      .filter(col(countGuard) > 0)
    val mvTypes = mv.schema.map(f => f.name -> f.dataType).toMap
    merged.select(merged.columns.toSeq.map(c =>
      col(c).cast(mvTypes(c)).as(c)): _*)
  }

  // --------------------------------------------------------- gate queries

  private val eventKey = Seq("user_id")
  private def eventVersions: Seq[Column] = Seq(col("ts"), col("event_id"))
  private def eventDelete: Column = col("event_type") === "error"
  private val eventPayload = Seq("ts", "event_id", "value")

  /** Full-history compaction: current state of every user. */
  def cdcLatest(s: SparkSession, dir: String): DataFrame =
    compact(Tables.events(s, dir), eventKey, eventVersions, eventDelete,
      eventPayload)

  val cdcLatestSql: String =
    """SELECT user_id, ts, event_id, value FROM (
      |  SELECT user_id, ts, event_id, value, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rk
      |  FROM events) t
      |WHERE rk = 1 AND event_type <> 'error'""".stripMargin

  /** Snapshot + delta equivalence: compact the first half of the month
    * into a state table, apply the second half as a changelog slice —
    * must equal the full-history compaction exactly (same oracle). The
    * snapshot keeps only live keys (tombstoned users are absent), and
    * the slice can delete, update, or re-insert them. */
  val CdcSplit = "2024-01-16 00:00:00"

  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val cutoff = to_timestamp(lit(CdcSplit))
    // the snapshot keeps its version columns (ts, event_id are payload
    // here), so re-compaction needs no sentinel versions
    val snapshot = compact(events.filter(col("ts") < cutoff),
      eventKey, eventVersions, eventDelete, eventPayload)
      .withColumn("event_type", lit("upsert"))
    applyChangelog(snapshot, events.filter(col("ts") >= cutoff),
      eventKey, eventVersions, eventDelete, eventPayload)
  }

  /** SCD2 over the events changelog: every non-tombstone version of
    * every user with its validity interval. Full oracle — the LEAD is
    * computed over ALL rows (tombstones included) in both engines, then
    * tombstones are dropped. */
  def cdcScd2(s: SparkSession, dir: String): DataFrame =
    scd2(Tables.events(s, dir), eventKey, col("ts"),
      Seq(col("event_id")), eventDelete, Seq("event_id", "value"))

  val cdcScd2Sql: String =
    """SELECT user_id, valid_from, valid_to, event_id, value FROM (
      |  SELECT user_id, ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS valid_to,
      |    event_id, value, event_type
      |  FROM events) t
      |WHERE event_type <> 'error'""".stripMargin

  /** Merge-into gate: SCD2 of the first half of the month merged with
    * the second half as a slice — must equal the full-history [[scd2]]
    * exactly (same oracle), the interval analog of [[cdcApply]]. */
  def cdcScd2Apply(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val cutoff = to_timestamp(lit(CdcSplit))
    val snapshot = scd2(events.filter(col("ts") < cutoff), eventKey,
      col("ts"), Seq(col("event_id")), eventDelete, Seq("event_id", "value"))
    scd2Apply(snapshot, events.filter(col("ts") >= cutoff), eventKey,
      col("ts"), Seq(col("event_id")), eventDelete, Seq("event_id", "value"))
  }

  /** Point-in-time (AS OF) join — the query SCD2 exists to serve: each
    * fact row (a purchase) looks up the dimension version (the user's
    * latest non-purchase state) valid AT the fact's own event time.
    *
    * Implementation bridges the CDC and as-of machinery: [[scd2]] builds
    * the interval table, the NATIVE as-of operator
    * (graft.plans.AsofJoin) picks the latest `valid_from <= ts` version
    * per fact in one streaming merge, and a `valid_to` guard nulls out
    * matches whose interval closed before the fact time — which is
    * exactly interval containment, including tombstone gaps (a deleted
    * user's purchases between delete and re-insert get NULL state). The
    * changelog is pre-collapsed to one version per (user, ts) so
    * `valid_from` is strictly increasing per key and containment is
    * unique.
    *
    * Plan shape at 100 TB: dimension build is one keyed shuffle + one
    * window pass (the [[scd2]] contract); the as-of is one co-partitioned
    * merge — no per-row range probe, no interval explosion. */
  def cdcScd2Pit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val log = events.filter($"event_type" =!= "purchase")
      .groupBy($"user_id", $"ts")
      .agg(max($"event_id").as("event_id"),
        max_by($"value", $"event_id").as("value"),
        max_by($"event_type", $"event_id").as("event_type"))
    val dim = scd2(log, eventKey, col("ts"), Seq(col("event_id")),
        eventDelete, Seq("event_id", "value"))
      .select(col("user_id").as("d_user_id"), col("valid_from"),
        col("valid_to"), col("event_id").as("s_event_id"),
        col("value").as("s_value"))
    val facts = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val joined = graft.plans.AsofJoinApi.joinAsof(
      facts, dim,
      Seq(facts("user_id")), Seq(dim("d_user_id")),
      facts("ts"), dim("valid_from"))
    val live = col("valid_from").isNotNull &&
      (col("valid_to").isNull || col("ts") < col("valid_to"))
    joined.select($"purchase_id", $"user_id", $"ts",
      when(live, col("s_event_id")).as("state_event_id"),
      when(live, col("s_value")).as("state_value"),
      when(live, col("valid_from")).as("state_valid_from"))
  }

  /** Interval-containment oracle: LEFT JOIN on
    * valid_from <= ts < valid_to — the declarative form of the same
    * point-in-time semantics (LEAD over the FULL log including
    * tombstones, tombstone versions dropped before the join). */
  val cdcScd2PitSql: String =
    """WITH log AS (
      |  SELECT user_id, ts, MAX(event_id) AS event_id,
      |    MAX_BY(value, event_id) AS value,
      |    MAX_BY(event_type, event_id) AS event_type
      |  FROM events WHERE event_type <> 'purchase' GROUP BY user_id, ts),
      |dim AS (
      |  SELECT user_id, ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
      |    event_id, value, event_type
      |  FROM log)
      |SELECT f.event_id AS purchase_id, f.user_id, f.ts,
      |  d.event_id AS state_event_id, d.value AS state_value,
      |  d.valid_from AS state_valid_from
      |FROM events f LEFT JOIN (SELECT * FROM dim WHERE event_type <> 'error') d
      |  ON f.user_id = d.user_id AND d.valid_from <= f.ts
      |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
      |WHERE f.event_type = 'purchase'""".stripMargin

  /** The gate MV: live users bucketed by value band (users migrate
    * bands when an upsert changes `value`, so maintenance exercises
    * cross-group moves, not just in-place updates), with a count and an
    * exact decimal sum per band. */
  private[operators] def valueBandAgg(state: DataFrame): DataFrame =
    state.groupBy(floor(col("value") / 100).cast("long").as("grp"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("value").cast("decimal(12,2)")).as("sum_value"))

  /** Incremental-MV gate: the view built on the first half of the month
    * and maintained with the second half as a changelog slice must equal
    * the view rebuilt from the full-history state exactly — including
    * groups that appear, empty out, or whose members migrated in from
    * another band. */
  def cdcAggMaintain(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
    val cutoff = to_timestamp(lit(CdcSplit))
    val snapshot = compact(events.filter(col("ts") < cutoff),
      eventKey, eventVersions, eventDelete, eventPayload)
      .withColumn("event_type", lit("upsert"))
    val mv0 = valueBandAgg(snapshot)
    val mv1 = aggMaintain(mv0, snapshot, events.filter(col("ts") >= cutoff),
      eventKey, eventVersions, eventDelete, eventPayload,
      valueBandAgg, Seq("grp"), "n_keys")
    mv1.select(col("grp"), col("n_keys"),
      col("sum_value").cast("double").as("sum_value"))
  }

  /** Full rebuild in SQL: aggregate over the latest-wins live state. */
  val cdcAggMaintainSql: String =
    """SELECT CAST(FLOOR(value / 100) AS BIGINT) AS grp,
      |  COUNT(*) AS n_keys,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT user_id, value FROM (
      |    SELECT user_id, value, event_type,
      |      ROW_NUMBER() OVER (PARTITION BY user_id
      |        ORDER BY ts DESC, event_id DESC) AS rk
      |    FROM events) t
      |  WHERE rk = 1 AND event_type <> 'error')
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_latest" -> cdcLatest,
    "cdc_apply" -> cdcApply,
    "cdc_scd2" -> cdcScd2,
    "cdc_scd2_apply" -> cdcScd2Apply,
    "cdc_scd2_pit" -> cdcScd2Pit,
    "cdc_agg_maintain" -> cdcAggMaintain,
  )

  val oracles: Map[String, String] = Map(
    "cdc_latest" -> cdcLatestSql,
    // snapshot+delta must reproduce the full-history state exactly
    "cdc_apply" -> cdcLatestSql,
    "cdc_scd2" -> cdcScd2Sql,
    // merge-into must reproduce the full-history intervals exactly
    "cdc_scd2_apply" -> cdcScd2Sql,
    "cdc_scd2_pit" -> cdcScd2PitSql,
    // maintained MV must equal the full rebuild exactly
    "cdc_agg_maintain" -> cdcAggMaintainSql,
  )
}
