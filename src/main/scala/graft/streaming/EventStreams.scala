package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.Tables

/** Structured-Streaming surface over the `events` schema. Every transform
  * is written against a plain DataFrame, so the SAME code runs in batch
  * (for the oracle-checked queries below) and behind `readStream` (specs
  * drive it with MemoryStream) — Structured Streaming's core contract.
  *
  * Watermarks bound state: at production rates the 10-minute watermark
  * caps the live window count regardless of total volume, and the session
  * state store holds only open sessions.
  */
object EventStreams {

  // ------------------------------------------------------ windowed aggregates
  /** Tumbling 1-hour counts/sums per event type. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 1-hour window every 30 minutes: late-tolerant moving load. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Session windows per user with a 30-minute inactivity gap. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("session_start"), col("user_id"),
        col("n"), col("sum_value"))

  // ------------------------------------------------------- streaming wrappers
  /** Streaming tumbling aggregate with a 10-minute watermark: state for a
    * window is dropped once the watermark passes its end — bounded memory
    * under unbounded input. */
  def streamingTumbling(events: DataFrame): DataFrame =
    tumblingCounts(events.withWatermark("ts", "10 minutes"))

  def streamingSessions(events: DataFrame): DataFrame =
    sessionCounts(events.withWatermark("ts", "10 minutes"))

  def streamingSliding(events: DataFrame): DataFrame =
    slidingCounts(events.withWatermark("ts", "10 minutes"))

  // ------------------------------------------- streaming distinct (sketch)
  /** Distinct users per hour with the mergeable KMV theta sketch as the
    * aggregation state — the streaming-cardinality pattern that matters
    * at scale: COUNT(DISTINCT) inside a streaming aggregation is not
    * supported (and a dropDuplicates+count workaround keeps EVERY
    * distinct key in the state store, state ∝ cardinality), while the
    * sketch keeps ≤ k longs per window no matter how many users arrive.
    * The same TypedImperativeAggregate serves batch and streaming — its
    * serialized buffer IS the state-store row, and its merge is
    * associative, so partial aggregation stays map-side in both modes.
    *
    * Gate contract (q33 pattern): the estimate is a deterministic
    * function of the value set but not SQL-reproducible, so the gate
    * recomputes the exact per-window cardinality alongside and asserts
    * the envelope. At the gate SFs every window sits under k=256 —
    * KMV's exact regime — so the shipped 3σ ≈ 19% bound holds with
    * enormous margin; ThetaSketchSpec pins estimation-regime error. */
  val DistinctErrBound = 0.19

  def distinctUsersHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.ThetaSketchFunctions.theta_distinct(col("user_id"))
        .as("theta_users"), count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("theta_users"), col("n"))

  def streamingDistinct(events: DataFrame): DataFrame =
    distinctUsersHourly(events.withWatermark("ts", "10 minutes"))

  private def distinctGate(s: SparkSession, dir: String, est: DataFrame)
      : DataFrame = {
    val exact = Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .select(col("w.start").as("window_start"), col("exact_users"))
    est.join(exact, Seq("window_start"))
      .select(col("window_start"), col("exact_users"), col("n"),
        (abs(col("theta_users") - col("exact_users")).cast("double")
          / col("exact_users") <= DistinctErrBound).as("theta_ok"))
  }

  def evDistinct(s: SparkSession, dir: String): DataFrame =
    distinctGate(s, dir, distinctUsersHourly(Tables.events(s, dir)))

  /** STREAMING-mode twin: the sketch aggregates through the state store
    * (replay harness; complete mode, so the converged sink holds every
    * window) and must land inside the same envelope as the batch form. */
  def evDistinctStream(s: SparkSession, dir: String): DataFrame =
    distinctGate(s, dir,
      replayToMemorySink(s, dir, "ev_distinct_stream", streamingDistinct))

  val evDistinctSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n,
      |  TRUE AS theta_ok
      |FROM events GROUP BY 1""".stripMargin

  // ----------------------------------------- streaming quantiles (sketch)
  /** Per-hour value quantiles with the mergeable KLL sketch as the
    * aggregation state — the quantile analog of [[distinctUsersHourly]]:
    * exact streaming percentiles would buffer every value per window
    * (state ∝ rows), while the KLL buffer is O(k) per window at any
    * input rate, and the same TypedImperativeAggregate serves batch and
    * streaming.
    *
    * Gate contract: a KLL estimate is deterministic but not
    * SQL-reproducible, so the gate asserts the RANK envelope — the
    * fraction of the window's values ≤ (resp. <) the estimate must
    * bracket q within [[QuantileRankBound]]. The two-sided ≤/< form is
    * the correct discrete statement (a one-row window has frac_le 1 and
    * frac_lt 0 — both sides hold trivially, as they must). At gate SFs
    * every window is far below k=200, KLL's exact regime, so the 5%
    * bound holds with enormous margin; KllSketchSpec pins
    * estimation-regime error. The gate also re-counts the window rows
    * through the join (`n_ok`), so a replay that dropped rows fails
    * even if the surviving values still bracket the quantile. */
  val QuantileRankBound = 0.05

  def valueQuantilesHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.KllFunctions
          .kll_quantile(col("value").cast("double"), 0.5).as("kll_median"),
        graft.functions.KllFunctions
          .kll_quantile(col("value").cast("double"), 0.9).as("kll_p90"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"),
        col("kll_median"), col("kll_p90"), col("n"))

  def streamingQuantiles(events: DataFrame): DataFrame =
    valueQuantilesHourly(events.withWatermark("ts", "10 minutes"))

  private def quantilesGate(s: SparkSession, dir: String, est: DataFrame)
      : DataFrame = {
    val ev = Tables.events(s, dir)
      .select(window(col("ts"), "1 hour").getField("start")
        .as("window_start"), col("value").cast("double").as("v"))
    def rankOk(q: Double, estCol: Column): Column = {
      val le = sum(when(col("v") <= estCol, 1L).otherwise(0L))
      val lt = sum(when(col("v") < estCol, 1L).otherwise(0L))
      (le.cast("double") / count(lit(1)) >= q - QuantileRankBound) &&
        (lt.cast("double") / count(lit(1)) <= q + QuantileRankBound)
    }
    est.join(ev, "window_start")
      .groupBy(col("window_start"), col("kll_median"), col("kll_p90"),
        col("n"))
      .agg(rankOk(0.5, col("kll_median")).as("median_ok"),
        rankOk(0.9, col("kll_p90")).as("p90_ok"),
        (count(lit(1)) === col("n")).as("n_ok"))
      .select(col("window_start"), col("n"),
        col("median_ok"), col("p90_ok"), col("n_ok"))
  }

  def evQuantiles(s: SparkSession, dir: String): DataFrame =
    quantilesGate(s, dir, valueQuantilesHourly(Tables.events(s, dir)))

  /** STREAMING-mode twin: the KLL buffer aggregates through the state
    * store (replay harness, complete mode) and must land inside the
    * same rank envelope as the batch form. */
  def evQuantilesStream(s: SparkSession, dir: String): DataFrame =
    quantilesGate(s, dir,
      replayToMemorySink(s, dir, "ev_quantiles_stream", streamingQuantiles))

  val evQuantilesSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  COUNT(*) AS n, TRUE AS median_ok, TRUE AS p90_ok, TRUE AS n_ok
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------- streaming heavy hitters (sketch)
  /** Per-hour top users with the mergeable Misra–Gries sketch as the
    * aggregation state — the third sketch-state streaming aggregate
    * (distinct → theta, quantiles → KLL, frequent items → MG): exact
    * per-window frequency tables keep every (window, user) pair in the
    * state store, the MG sketch keeps ≤ k counters per window at any
    * input rate and merges associatively through the store.
    *
    * k is deliberately small ([[HhWindowK]]): at sf0.01 windows sit
    * below capacity (exact regime), at sf0.1 they exceed it, so the SAME
    * gate exercises both regimes across the driver's verification SFs.
    * The gate asserts the two PODS'12 merge-bound guarantees per window
    * by joining the ≤k-row sketch against an exact recount:
    * every user with true count > N/(k+1) is retained, and every
    * estimate lies in [true − N/(k+1), true]. Both hold under ANY
    * partitioning and any micro-batch split. */
  val HhWindowK = 16

  def topUsersHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(graft.functions.HeavyHitterFunctions
          .heavy_hitters_sketch(col("user_id").cast("string"), HhWindowK)
          .as("sk"),
        count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("sk"), col("n"))

  def streamingTopUsers(events: DataFrame): DataFrame =
    topUsersHourly(events.withWatermark("ts", "10 minutes"))

  private def topUsersGate(s: SparkSession, dir: String, est0: DataFrame)
      : DataFrame = {
    import graft.functions.HeavyHitterFunctions.hh_items
    // The gate references the estimate table three times (items, bound
    // carrier, output spine). A memory-sink view keeps ONE attribute set
    // across all references, which the analyzer rejects as conflicting
    // in the outer joins — a parquet roundtrip of the (≤ hours-in-range)-
    // row table gives each read fresh attributes. Batch callers pass a
    // plain aggregate and pay one cheap materialization.
    val tmp = java.nio.file.Files.createTempDirectory("hh_gate").toString
    est0.write.mode("overwrite").parquet(tmp)
    val est = s.read.parquet(tmp)
    val exact = Tables.events(s, dir)
      .select(window(col("ts"), "1 hour").getField("start")
        .as("window_start"), col("user_id"))
      .groupBy(col("window_start"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    val items = est.select(col("window_start"), col("n"),
        explode(hh_items(col("sk"))).as("e"))
      .select(col("window_start"), col("n"),
        col("e._1").cast("long").as("user_id"), col("e._2").as("est"))
    val bound = col("n").cast("double") / (HhWindowK + 1)
    // retention: every over-threshold user is present in the sketch
    val ret = exact.join(items.select(col("window_start"),
          col("user_id"), lit(true).as("in_sketch")),
        Seq("window_start", "user_id"), "left")
      .join(est.select(col("window_start"), col("n")), Seq("window_start"))
      .groupBy(col("window_start"))
      .agg(coalesce(bool_and(
        when(col("cnt") > bound, coalesce(col("in_sketch"), lit(false)))
          .otherwise(lit(true))), lit(true)).as("retained_ok"))
    // bounds: no invented items; every estimate within [true − N/(k+1), true]
    val bnd = items.join(exact, Seq("window_start", "user_id"), "left")
      .groupBy(col("window_start"))
      .agg(coalesce(bool_and(col("cnt").isNotNull &&
        col("est") <= col("cnt") &&
        col("est") >= col("cnt") - bound), lit(true)).as("bounds_ok"))
    est.select(col("window_start"), col("n"))
      .join(ret, Seq("window_start"), "left")
      .join(bnd, Seq("window_start"), "left")
      .select(col("window_start"), col("n"),
        coalesce(col("retained_ok"), lit(true)).as("retained_ok"),
        coalesce(col("bounds_ok"), lit(true)).as("bounds_ok"))
  }

  def evTopUsers(s: SparkSession, dir: String): DataFrame =
    topUsersGate(s, dir, topUsersHourly(Tables.events(s, dir)))

  /** STREAMING-mode twin: MG counters merge through the state store
    * across micro-batches; the merged sketch must satisfy the same
    * per-window bounds. */
  def evTopUsersStream(s: SparkSession, dir: String): DataFrame =
    topUsersGate(s, dir,
      replayToMemorySink(s, dir, "ev_top_users_stream", streamingTopUsers))

  val evTopUsersSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
      |  COUNT(*) AS n, TRUE AS retained_ok, TRUE AS bounds_ok
      |FROM events GROUP BY 1""".stripMargin

  // ------------------------------------------------- stream-stream join
  /** View→purchase attribution: each purchase joins every view by the
    * same user in the preceding [[AttributionWindowSql]] — written
    * against plain DataFrames so the SAME code runs in batch (oracle)
    * and as a Structured Streaming STREAM-STREAM inner join (the
    * streaming gate below). */
  val AttributionWindowSql = "INTERVAL 6 HOURS"

  private def attributionViews(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))

  private def attributionPurchases(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))

  private def attributionJoin(views: DataFrame, purchases: DataFrame)
      : DataFrame =
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(AttributionWindowSql))
      .select(col("v_user").as("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))

  def attribution(events: DataFrame): DataFrame =
    attributionJoin(attributionViews(events), attributionPurchases(events))

  private def attributionOuterJoin(views: DataFrame,
      purchases: DataFrame): DataFrame =
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("purchase_ts") > col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(AttributionWindowSql),
      "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"), col("view_ts"),
        col("purchase_id"), col("purchase_ts"), col("purchase_value"))

  /** LEFT-OUTER attribution: EVERY view emits — with its in-window
    * purchases, or NULL-extended once provably unmatched. The batch
    * form is a plain left join; the streaming twin below exercises the
    * semantics inner joins can't: the state store may only emit the
    * null row after the WATERMARK proves no matching purchase can still
    * arrive. */
  def attributionOuter(events: DataFrame): DataFrame =
    attributionOuterJoin(attributionViews(events),
      attributionPurchases(events))

  /** Streaming form: both sides carry a watermark (applied AFTER the
    * rename — aliasing a watermarked attribute can drop its event-time
    * tag) and the join carries the time-range condition, so the state
    * store can evict a buffered view once the watermark passes
    * view_ts + window, and a purchase once it passes purchase_ts —
    * bounded state under unbounded input, the contract that makes
    * stream-stream joins viable at production rates. Inner join in
    * append mode: a match is emitted as soon as both sides have
    * arrived. */
  def streamingAttribution(events: DataFrame): DataFrame =
    attributionJoin(
      attributionViews(events).withWatermark("view_ts", "10 minutes"),
      attributionPurchases(events).withWatermark("purchase_ts", "10 minutes"))

  // ----------------------------------------------------- ordered funnel
  /** Ordered-funnel stage times: for each user, t₁ = earliest stage-1
    * event, tᵢ = earliest stage-i event STRICTLY after tᵢ₋₁
    * (earliest-completion semantics; equal timestamps do not advance a
    * stage). One row per user with one nullable timestamp per stage —
    * a user reached stage i iff tᵢ is non-null.
    *
    * Plan shape at 100 TB: ONE shuffle keyed on the user. Each stage is
    * a whole-partition window min (unbounded frame — no sort needed) on
    * the same partitioning, and the per-user collapse is a groupBy on
    * that same key, so Catalyst plans window → window → … → aggregate
    * over a single exchange. No self-joins — the classic k-way
    * funnel-by-join (one join per stage) would shuffle the events k
    * times; this shuffles them once. */
  def funnelTimes(events: DataFrame, user: Column, ts: Column,
      stages: Seq[Column]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(user)
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (df, (pred, i)) =>
        val gate = if (i == 0) pred else pred && ts > col(s"__t$i")
        df.withColumn(s"__t${i + 1}", min(when(gate, ts)).over(w))
    }
    staged.groupBy(user.as("user"))
      .agg(max(col("__t1")).as("t1"),
        (2 to stages.size).map(i => max(col(s"__t$i")).as(s"t$i")): _*)
  }

  /** [[funnelTimes]] with PER-STAGE HORIZONS: stage i counts only if it
    * happens within `horizons(i)` of stage i−1 (strictly after it, at
    * most the horizon later) — "view within 24h of signup, purchase
    * within 48h of that view". `horizons(i) = None` means unbounded
    * (plain strictly-after); index 0 is ignored (stage 1 has no
    * predecessor). Same earliest-anchor semantics as the base operator
    * — tᵢ is anchored on the EARLIEST qualifying tᵢ₋₁, which both the
    * streaming fold and the oracle CTE encode identically — and the
    * same single-shuffle plan: the horizon is one more conjunct in the
    * stage gate, not a join. */
  def funnelTimesH(events: DataFrame, user: Column, ts: Column,
      stages: Seq[Column], horizons: Seq[Option[String]]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(horizons.size == stages.size,
      "one horizon slot per stage (index 0 is ignored)")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(user)
    val staged = stages.zipWithIndex.foldLeft(events) {
      case (df, (pred, i)) =>
        val gate =
          if (i == 0) pred
          else horizons(i).foldLeft(pred && ts > col(s"__t$i")) {
            case (g, h) => g && ts <= col(s"__t$i") + expr(s"INTERVAL $h")
          }
        df.withColumn(s"__t${i + 1}", min(when(gate, ts)).over(w))
    }
    staged.groupBy(user.as("user"))
      .agg(max(col("__t1")).as("t1"),
        (2 to stages.size).map(i => max(col(s"__t$i")).as(s"t$i")): _*)
  }

  /** Horizon-funnel gate: signup → view within 24h → purchase within
    * 48h of that view. Bigint-exact counts like the base gate. */
  def evFunnelHorizon(s: SparkSession, dir: String): DataFrame = {
    val times = funnelTimesH(Tables.events(s, dir), col("user_id"), col("ts"),
      Seq(col("event_type") === "signup", col("event_type") === "view",
        col("event_type") === "purchase"),
      Seq(None, Some("24 HOURS"), Some("48 HOURS")))
    times.agg(count(lit(1)).as("n_users"),
      count(col("t1")).as("n_s1"),
      count(col("t2")).as("n_s2"),
      count(col("t3")).as("n_s3"))
  }

  val evFunnelHorizonSql: String =
    """WITH s1 AS (SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1 FROM events),
      |  s2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t1
      |      AND ts <= t1 + INTERVAL 24 HOURS
      |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      |  s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
      |      AND ts <= t2 + INTERVAL 48 HOURS
      |      THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2),
      |  u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      |    FROM s3 GROUP BY user_id)
      |SELECT COUNT(*) AS n_users, COUNT(t1) AS n_s1, COUNT(t2) AS n_s2,
      |  COUNT(t3) AS n_s3
      |FROM u""".stripMargin

  /** Funnel gate: signup → view → purchase over the events table, with
    * an exact 24h completion-latency count — every output column is a
    * bigint count, so the oracle match is exact. */
  def evFunnel(s: SparkSession, dir: String): DataFrame = {
    val times = funnelTimes(Tables.events(s, dir), col("user_id"), col("ts"),
      Seq(col("event_type") === "signup", col("event_type") === "view",
        col("event_type") === "purchase"))
    times.agg(count(lit(1)).as("n_users"),
      count(col("t1")).as("n_signup"),
      count(col("t2")).as("n_signup_view"),
      count(col("t3")).as("n_full_funnel"),
      count(when(col("t3") <= col("t1") + expr("INTERVAL 24 HOURS"), 1))
        .as("n_within_24h"))
  }

  /** 4-stage instance of the GENERALIZED funnel (signup → click → view
    * → purchase) through the same k-generic [[funnelTimes]] — the stage
    * list is data, not code. Same bigint-exact count shape. */
  def evFunnel4(s: SparkSession, dir: String): DataFrame = {
    val times = funnelTimes(Tables.events(s, dir), col("user_id"), col("ts"),
      Seq(col("event_type") === "signup", col("event_type") === "click",
        col("event_type") === "view", col("event_type") === "purchase"))
    times.agg(count(lit(1)).as("n_users"),
      count(col("t1")).as("n_s1"),
      count(col("t2")).as("n_s2"),
      count(col("t3")).as("n_s3"),
      count(col("t4")).as("n_s4"))
  }

  val evFunnel4Sql: String =
    """WITH s1 AS (SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1 FROM events),
      |  s2 AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
      |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      |  s3 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t2
      |      THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2),
      |  s4 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t3
      |      THEN ts END) OVER (PARTITION BY user_id) AS t4 FROM s3),
      |  u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3,
      |    MAX(t4) AS t4 FROM s4 GROUP BY user_id)
      |SELECT COUNT(*) AS n_users, COUNT(t1) AS n_s1, COUNT(t2) AS n_s2,
      |  COUNT(t3) AS n_s3, COUNT(t4) AS n_s4
      |FROM u""".stripMargin

  val evFunnelSql: String =
    """WITH s1 AS (SELECT user_id, ts, event_type,
      |    MIN(CASE WHEN event_type = 'signup' THEN ts END)
      |      OVER (PARTITION BY user_id) AS t1 FROM events),
      |  s2 AS (SELECT *, MIN(CASE WHEN event_type = 'view' AND ts > t1
      |      THEN ts END) OVER (PARTITION BY user_id) AS t2 FROM s1),
      |  s3 AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
      |      THEN ts END) OVER (PARTITION BY user_id) AS t3 FROM s2),
      |  u AS (SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      |    FROM s3 GROUP BY user_id)
      |SELECT COUNT(*) AS n_users, COUNT(t1) AS n_signup,
      |  COUNT(t2) AS n_signup_view, COUNT(t3) AS n_full_funnel,
      |  COUNT(CASE WHEN t3 <= t1 + INTERVAL 24 HOURS THEN 1 END)
      |    AS n_within_24h
      |FROM u""".stripMargin

  // -------------------------------------- custom state: flatMapGroupsWithState
  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class UserSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n: Long, sum_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Custom sessionization with explicit state + processing-time timeout:
    * the `(flatM|m)apGroupsWithState` surface the reference's users would
    * need for stateful logic Spark's built-in windows can't express.
    * Emits a session when a gap exceeds SessionGapMs or the group times
    * out. Events within a micro-batch are sorted per key; cross-batch
    * order is handled by the gap logic. */
  def sessionize(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => UserSession(userId,
              new Timestamp(s.start), new Timestamp(s.last + SessionGapMs),
              s.n, s.sum))
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= SessionGapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= UserSession(userId, new Timestamp(s.start),
                    new Timestamp(s.last + SessionGapMs), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(SessionGapMs)
            }
            closed.reverseIterator
          }
      }
  }

  // ----------------------------------------------------- batch query entries
  def evTumbling(s: SparkSession, dir: String): DataFrame =
    tumblingCounts(Tables.events(s, dir))

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)
  private[streaming] def nextStreamRun(): Int = streamRuns.incrementAndGet()

  /** STREAMING-mode sessionization through the gate. Session windows in
    * append mode only emit once the watermark passes a session's end —
    * so a pure replay would withhold every trailing session forever.
    * The harness stages PUNCTUATION files (rows for a user id outside
    * the domain, 10 then 20 hours past max ts) so they arrive in their
    * own micro-batches: eviction in batch N uses the watermark computed
    * after batch N−1, so the batch carrying punct #2 flushes every real
    * session, while the punctuation's own session stays open and is
    * never emitted — the standard drain/barrier pattern for finite
    * replays. Result: the streaming output must equal the batch
    * gaps-and-islands oracle exactly.
    *
    * The replay is a REAL file-source stream: all three files exist
    * before the query starts (this build's FileStreamSource does not
    * reliably discover files added mid-query under a stateful agg) with
    * staged modification times, and `maxFilesPerTrigger=1` turns them
    * into ordered micro-batches. No dataset ever reaches the driver —
    * only max(ts) (one scalar) and the punctuation rows (two rows)
    * do; round 2's whole-table collect is gone. */
  def evSessionsStream(s: SparkSession, dir: String): DataFrame =
    evSessionsStreamImpl(s, dir, rocksDb = false)

  /** [[evSessionsStream]] under the ROCKSDB state-store provider — the
    * 100 TB streaming-state story wired and gate-checked, not prose: a
    * session/join state that outgrows executor heap needs a
    * disk-backed, incrementally-checkpointed store, and Spark ships
    * one (`RocksDBStateStoreProvider`, on the classpath via
    * rocksdbjni). The provider is a session-conf toggle picked up at
    * query start; this gate runs the stateful-heaviest pipeline
    * (session windows + watermark drain) under it, ASSERTS the
    * provider actually served the state ops (rocksdb* custom metrics
    * in the final progress — a silently-defaulted provider fails the
    * gate loudly), and must produce output identical to the
    * batch gaps-and-islands oracle, same as the default-provider
    * twin. */
  def evSessionsStreamRocksDb(s: SparkSession, dir: String): DataFrame =
    evSessionsStreamImpl(s, dir, rocksDb = true)

  private val StateProviderKey =
    "spark.sql.streaming.stateStore.providerClass"
  private val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def evSessionsStreamImpl(s: SparkSession, dir: String,
      rocksDb: Boolean): DataFrame = {
    val raw = Tables.eventsRaw(s, dir)
    val maxUs = Tables.maxTsMicros(raw)
    val tsType = raw.schema("ts").dataType
    val src = java.nio.file.Files.createTempDirectory("graft_ev_sessions")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("00_events.parquet"))
    // one punctuation file per drain step, written through Spark with
    // the same raw physical ts type as the events file
    def writePunct(idx: Int, id: Long, hours: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_punct$idx")
      Tables.punctDF(s, tsType, Seq((id, maxUs + hours * 3600L * 1000000L, -1L)))
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")).sorted.head
      val dest = src.resolve(f"0${idx}_punct.parquet")
      java.nio.file.Files.move(java.nio.file.Paths.get(part), dest)
      ()
    }
    writePunct(1, -1L, 10)
    writePunct(2, -2L, 20)
    // staged mtimes pin the micro-batch order (FileStreamSource takes
    // oldest files first)
    Seq("00_events.parquet", "01_punct.parquet", "02_punct.parquet")
      .zipWithIndex.foreach { case (f, i) =>
        src.resolve(f).toFile.setLastModified(1000000L + i * 10000L)
      }
    val stream = Tables.normalizeEventTs(
      s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src.toString))
    val name = s"ev_sessions_stream_${streamRuns.incrementAndGet()}"
    // NOTE: do NOT filter the punctuation user inside the streaming
    // query — a `user_id != -1` predicate on the aggregate is pushed
    // below the session aggregation AND the EventTimeWatermark node
    // (user_id is a grouping key), silently dropping the punctuation
    // rows at the source so the watermark never advances. The filter
    // is applied to the SINK table instead (batch side, post-stream).
    val prevProvider = s.conf.getOption(StateProviderKey)
    if (rocksDb) s.conf.set(StateProviderKey, RocksDbProvider)
    try {
      val q = StreamTune.withAdaptivePartitions(s,
        StreamTune.dirBytes(src)) {
        streamingSessions(stream)
          .writeStream.format("memory").queryName(name)
          .outputMode(OutputMode.Append()).start()
      }
      try q.processAllAvailable() finally q.stop()
      if (rocksDb) {
        import scala.jdk.CollectionConverters._
        val served = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .exists(_.customMetrics.keySet().asScala
            .exists(_.startsWith("rocksdb")))
        require(served, "ev_sessions_stream_rocksdb: the state ops did " +
          "not run on the RocksDB provider — toggle silently ignored")
      }
    } finally if (rocksDb) prevProvider match {
      case Some(v) => s.conf.set(StateProviderKey, v)
      case None => s.conf.unset(StateProviderKey)
    }
    s.table(name).filter(col("user_id") =!= -1L)
  }


  /** STREAMING-mode twin of [[evTumbling]], registered in the driver's
    * oracle gate: the events parquet is replayed through a real
    * file-source micro-batch stream (micro-batch engine, state store,
    * watermark tracking all live) into a memory sink, and the sink's
    * final state is returned for the DuckDB compare — proving
    * batch/stream equivalence at the gate, not just in specs.
    *
    * One input file ⇒ one micro-batch, so the 10-minute watermark never
    * advances past in-flight rows and drops nothing; with complete
    * output the converged state must equal the batch aggregate exactly.
    * The memory sink holds one row per (window, event_type) — thousands
    * at verification SF; at production scale the same query writes to a
    * real sink (see ForeachBatchSpec) and this entry stays a gate-sized
    * harness. */
  def evTumblingStream(s: SparkSession, dir: String): DataFrame =
    replayToMemorySink(s, dir, "ev_tumbling_stream", streamingTumbling)

  /** Shared single-file replay harness for the complete-output streaming
    * gates: stage the events parquet in a temp dir, run `transform` over
    * a file-source stream of it into a memory sink, drain, stop, and
    * reclaim the staged copy. One input file ⇒ one micro-batch, so the
    * watermark never drops in-flight rows and the converged sink equals
    * the batch aggregate (see [[evTumblingStream]]'s contract note). */
  private def replayToMemorySink(s: SparkSession, dir: String,
      namePrefix: String, transform: DataFrame => DataFrame,
      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val rawSchema = Tables.eventsRaw(s, dir).schema
    val src = java.nio.file.Files.createTempDirectory(namePrefix)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("events.parquet"))
    val stream = Tables.normalizeEventTs(
      s.readStream.schema(rawSchema).parquet(src.toString))
    val name = s"${namePrefix}_${streamRuns.incrementAndGet()}"
    // state/shuffle partitions sized from the replayed bytes: a gate
    // replay stops paying a full constant of state stores per epoch;
    // at real volumes the clamp keeps the configured parallelism
    val q = StreamTune.withAdaptivePartitions(s, StreamTune.dirBytes(src)) {
      transform(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode(mode).start()
    }
    try q.processAllAvailable() finally {
      q.stop()
      val walk = java.nio.file.Files.walk(src)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    s.table(name)
  }

  /** STREAMING-mode twin of [[evSliding]] (overlapping windows: every
    * event lands in TWO live windows, so the state store tracks ~2× the
    * window count of the tumbling gate). */
  def evSlidingStream(s: SparkSession, dir: String): DataFrame =
    replayToMemorySink(s, dir, "ev_sliding_stream", streamingSliding)

  def evAttribution(s: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(s, dir))

  /** STREAMING-mode stream-stream join gate: the events parquet replays
    * as ONE micro-batch feeding BOTH join sides (a streaming self-join —
    * two filtered branches of the same watermarked source), through the
    * real symmetric-hash join state store, in append mode. One batch ⇒
    * the watermark never evicts an in-flight row, and an INNER join
    * emits a match in the batch where both sides are present — so the
    * sink must equal the batch join exactly (same oracle). */
  def evAttributionStream(s: SparkSession, dir: String): DataFrame =
    replayToMemorySink(s, dir, "ev_attribution_stream",
      streamingAttribution, OutputMode.Append())

  def evAttributionOuter(s: SparkSession, dir: String): DataFrame =
    attributionOuter(Tables.events(s, dir))

  /** STREAMING-mode LEFT-OUTER stream-stream join gate: the semantics
    * the inner gate cannot reach — a view's NULL-extended row may only
    * emit once the watermark passes view_ts + 6h (no purchase can still
    * arrive), so the final result depends on watermark-driven state
    * eviction, not just match emission. Replay: the events file is
    * micro-batch 1; a single punctuation row (user −1, +8h past max
    * event time) rides BOTH branch filters via the user-id escape hatch
    * and advances BOTH watermarks past every view's match window —
    * Spark's multi-watermark policy takes the MIN, so one side alone
    * would hold the global watermark back — draining every pending
    * null row. The sink (punctuation filtered) must equal the batch
    * LEFT JOIN exactly. */
  def evAttributionOuterStream(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.eventsRaw(s, dir)
    val maxUs = Tables.maxTsMicros(raw)
    val tsType = raw.schema("ts").dataType
    val src = java.nio.file.Files.createTempDirectory("graft_ev_attr_outer")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      src.resolve("00_events.parquet"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_attr_punct")
    Tables.punctDF(s, tsType,
        Seq((-1L, maxUs + 8L * 3600L * 1000000L, -1L)))
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).sorted.head
    java.nio.file.Files.move(java.nio.file.Paths.get(part),
      src.resolve("01_punct.parquet"))
    Seq("00_events.parquet", "01_punct.parquet").zipWithIndex.foreach {
      case (f, i) => src.resolve(f).toFile.setLastModified(
        1000000L + i * 10000L)
    }
    val stream = Tables.normalizeEventTs(
      s.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString))
    val views = stream
      .filter(col("event_type") === "view" || col("user_id") === -1L)
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val purchases = stream
      .filter(col("event_type") === "purchase" || col("user_id") === -1L)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "10 minutes")
    val name = s"ev_attr_outer_stream_${streamRuns.incrementAndGet()}"
    // state/shuffle partitions sized from the replay's input volume —
    // the symmetric-hash join keeps 4 state stores PER PARTITION per
    // epoch, so an oversized constant multiplies checkpoint I/O
    val q = StreamTune.withAdaptivePartitions(s, StreamTune.dirBytes(src)) {
      attributionOuterJoin(views, purchases)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
    }
    try q.processAllAvailable() finally {
      q.stop()
      val walk = java.nio.file.Files.walk(src)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }
    s.table(name).filter(col("user_id") =!= -1L)
  }

  val evTumblingSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  def evSliding(s: SparkSession, dir: String): DataFrame =
    slidingCounts(Tables.events(s, dir))

  /** A row lands in the two 1-hour windows that contain it (stride 30m). */
  val evSlidingSql: String =
    """SELECT time_bucket(INTERVAL '30 minutes', ts) + (k * INTERVAL '30 minutes')
      |    - INTERVAL '30 minutes' AS window_start, event_type, COUNT(*) AS n
      |FROM events, (SELECT UNNEST([0, 1]) AS k) shifts
      |WHERE time_bucket(INTERVAL '30 minutes', ts) + (k * INTERVAL '30 minutes')
      |    - INTERVAL '30 minutes' <= ts
      |GROUP BY 1, 2""".stripMargin

  def evSessions(s: SparkSession, dir: String): DataFrame =
    sessionCounts(Tables.events(s, dir))

  /** The BUILT-IN twin: `session_window(ts, '30 minutes')` — Spark's
    * native gap-session operator (one shuffle on the user, sessions
    * merged inside the aggregate) against the SAME gaps-and-islands
    * oracle as ev_sessions, pinning that the windowed-aggregate form
    * and the native operator implement identical session semantics.
    * `session_window.start` is the session's first event time, so the
    * projection matches the oracle's MIN(ts) exactly. */
  def evSessionsNative(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n"), col("sum_value"))

  /** Gaps-and-islands twin of session_window (30-minute gap). */
  val evSessionsSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |           > INTERVAL '30 minutes' OR
      |         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |numbered AS (
      |  SELECT *, SUM(new_session) OVER (
      |    PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT MIN(ts) AS session_start, user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM numbered GROUP BY user_id, session_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling" -> evTumbling,
    "ev_tumbling_stream" -> evTumblingStream,
    "ev_sliding" -> evSliding,
    "ev_sliding_stream" -> evSlidingStream,
    "ev_sessions" -> evSessions,
    "ev_sessions_native" -> evSessionsNative,
    "ev_sessions_stream" -> evSessionsStream,
    "ev_sessions_stream_rocksdb" -> evSessionsStreamRocksDb,
    "ev_attribution" -> evAttribution,
    "ev_attribution_stream" -> evAttributionStream,
    "ev_attribution_outer" -> evAttributionOuter,
    "ev_attribution_outer_stream" -> evAttributionOuterStream,
    "ev_funnel" -> evFunnel,
    "ev_funnel_stream" -> ((s, d) => StreamingFunnel.evFunnelStream(s, d)),
    "ev_funnel4" -> evFunnel4,
    "ev_funnel_horizon" -> evFunnelHorizon,
    "ev_funnel4_stream" -> ((s, d) => StreamingFunnel.evFunnel4Stream(s, d)),
    "ev_distinct" -> evDistinct,
    "ev_distinct_stream" -> evDistinctStream,
    "ev_quantiles" -> evQuantiles,
    "ev_quantiles_stream" -> evQuantilesStream,
    "ev_top_users" -> evTopUsers,
    "ev_top_users_stream" -> evTopUsersStream,
  )

  val evAttributionSql: String =
    """SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
      |  p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  p.value AS purchase_value
      |FROM events v JOIN events p ON v.user_id = p.user_id
      |  AND v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL '6 hours'""".stripMargin

  val evAttributionOuterSql: String =
    """SELECT v.user_id, v.event_id AS view_id, v.ts AS view_ts,
      |  p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ON v.user_id = p.user_id AND p.ts > v.ts
      |  AND p.ts <= v.ts + INTERVAL '6 hours'""".stripMargin

  val oracles: Map[String, String] = Map(
    "ev_tumbling" -> evTumblingSql,
    "ev_tumbling_stream" -> evTumblingSql, // same oracle: batch ≡ stream
    "ev_sliding" -> evSlidingSql,
    "ev_sliding_stream" -> evSlidingSql, // same oracle: batch ≡ stream
    "ev_sessions" -> evSessionsSql,
    "ev_sessions_native" -> evSessionsSql, // same oracle: native ≡ windowed
    "ev_sessions_stream" -> evSessionsSql, // same oracle: batch ≡ stream
    "ev_sessions_stream_rocksdb" -> evSessionsSql, // ≡ under RocksDB state
    "ev_attribution" -> evAttributionSql,
    "ev_attribution_stream" -> evAttributionSql, // same oracle: batch ≡ stream
    "ev_attribution_outer" -> evAttributionOuterSql,
    "ev_attribution_outer_stream" -> evAttributionOuterSql, // batch ≡ stream
    "ev_funnel" -> evFunnelSql,
    "ev_funnel_stream" -> StreamingFunnel.evFunnelStreamSql,
    "ev_funnel4" -> evFunnel4Sql,
    "ev_funnel_horizon" -> evFunnelHorizonSql,
    "ev_funnel4_stream" -> StreamingFunnel.evFunnel4StreamSql,
    "ev_distinct" -> evDistinctSql,
    "ev_distinct_stream" -> evDistinctSql, // same oracle: batch ≡ stream
    "ev_quantiles" -> evQuantilesSql,
    "ev_quantiles_stream" -> evQuantilesSql, // same oracle: batch ≡ stream
    "ev_top_users" -> evTopUsersSql,
    "ev_top_users_stream" -> evTopUsersSql, // same oracle: batch ≡ stream
  )
}
