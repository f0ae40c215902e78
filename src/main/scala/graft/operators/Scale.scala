package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-handling building blocks for the 1000-executor case. AQE's skew
  * join handles sort-merge skew automatically; these are for the two
  * situations AQE does not cover: aggregation hot keys, and broadcast-
  * ineligible skewed joins where one key floods a task.
  *
  * Both are pure plan rewrites (no RDDs): salting is a column expression,
  * so everything stays inside codegen and the optimizer.
  */
object Scale {

  /** Repartition ONLY when the plan is under-parallel (e.g. one small
    * parquet file ⇒ one input split ⇒ a single task doing all the CPU
    * work). At real scale the scan already has thousands of splits and
    * this is a no-op — it guards the small-file edge without imposing a
    * corpus-wide shuffle on big inputs. */
  def ensureParallelism(df: DataFrame, minParts: Int): DataFrame =
    // probe the physical plan's partition count directly (toRdd is the
    // InternalRow RDD — no Row-encoder lineage is instantiated, and no
    // job runs; getNumPartitions only asks the scan for its splits).
    // The no-job claim holds only for exchange-free plans — under AQE,
    // toRdd on a plan WITH exchanges materializes (and discards) its
    // upstream shuffle stages — so the probe is guarded to scan-rooted
    // inputs; anything else already gets parallelism from its exchange
    // and passes through untouched (same guard as [[Spread]]).
    if (!Spread.probeSafe(df.queryExecution.optimizedPlan)) df
    else if (df.queryExecution.toRdd.getNumPartitions >= minParts) df
    else df.repartition(minParts)

  def ensureParallelism(df: DataFrame): DataFrame =
    ensureParallelism(df, df.sparkSession.sparkContext.defaultParallelism)

  /** Deterministic per-row salt in [0, salts), derived by hashing STABLE
    * row columns (a primary key, or any columns that identify the row in
    * its source). Determinism is not optional at cluster scale: a salt
    * drawn from `rand()` or `monotonically_increasing_id()` is a
    * nondeterministic SHUFFLE KEY, and on a partial stage retry (fetch
    * failure) the re-executed map tasks would assign different salts
    * while reducers have already consumed the old attempt's output —
    * duplicating or dropping rows (the SPARK-23207 failure class). A
    * hash of stable columns reproduces the same salt on every attempt. */
  def saltOf(saltBy: Seq[Column], salts: Int): Column =
    pmod(xxhash64(saltBy: _*), lit(salts.toLong)).cast("int")

  /** Two-phase aggregation for hot grouping keys: group by (key, salt)
    * first (spreads a hot key over `salts` reducers), then re-aggregate
    * by key. Correct for any associative aggregate expressed as
    * (partialExpr, mergeExpr) pair on the same column name. `saltBy`
    * must be stable row-identifying columns (see [[saltOf]]). */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int,
      saltBy: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltOf(saltBy, salts))
    salted
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("partial"), count(lit(1)).as("pn"))
      .groupBy(col("key"))
      .agg(sum(col("partial")).as("total"), sum(col("pn")).as("n"))
  }

  /** Salted equi-join for a skewed LEFT side: left rows get a
    * deterministic salt in [0, salts); the right side is replicated
    * `salts` times so every (key, salt) bucket finds its match. Turns
    * one flooded task into `salts` even ones; right-side blowup is the
    * explicit price. `saltBy` must be stable left-row columns (see
    * [[saltOf]]). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, saltBy: Seq[Column]): DataFrame = {
    val saltedLeft = left.withColumn("__salt", saltOf(saltBy, salts))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Choose a salt count from OBSERVED key skew instead of a guess
    * (mirrors Dedup's adaptive mega-bucket threshold): estimate the top
    * key's share of rows from a deterministic-seed sample, then size
    * salts so the hot key's per-(key,salt) slice shrinks to roughly the
    * even per-reducer share — share·N/m ≈ N/P gives m = ceil(share·P),
    * clamped to [1, parallelism]. A near-uniform key (share ≤ 1/P)
    * yields 1, i.e. salting disabled — the common case should pay zero
    * overhead. TUNING-time only (like the IVF probe autotune): the
    * sample is partitioning-dependent, so pin the result into job
    * config rather than recomputing per run when bit-stable plans
    * matter. */
  def chooseSalts(df: DataFrame, key: Column, parallelism: Int,
      sampleFrac: Double = 0.01, seed: Long = 42L): Int = {
    val counts = df.sample(sampleFrac, seed).groupBy(key.as("k")).count()
    val row = counts.agg(max(col("count")).as("top"),
      sum(col("count")).as("n")).head()
    if (row.isNullAt(1) || row.getLong(1) == 0L) 1
    else {
      val share = row.getLong(0).toDouble / row.getLong(1)
      math.min(parallelism, math.max(1, math.ceil(share * parallelism).toInt))
    }
  }

  /** [[saltedSum]] with the salt count measured from the data. */
  def saltedSumAdaptive(df: DataFrame, key: Column, value: Column,
      saltBy: Seq[Column]): DataFrame =
    saltedSum(df, key, value,
      chooseSalts(df, key, df.sparkSession.sparkContext.defaultParallelism),
      saltBy)

  // --------------------------------------------------------- gate queries.
  // Salting is only admissible if it is SEMANTICS-PRESERVING — the salted
  // plan must produce byte-identical results to the plain one under any
  // partitioning. These gates pin that contract against plain-SQL
  // oracles: the oracle knows nothing about salts, so a salt leaking
  // into the result (wrong re-aggregate, dropped/duplicated rows at the
  // replicate join) fails the hash gate. The salt itself is a hash of
  // the row's primary key (l_orderkey, l_linenumber), so the salted
  // shuffle key is deterministic across task retries too.

  val SaltedSalts = 8

  /** l_returnflag is a 3-value key — the degenerate hot-key case where an
    * unsalted aggregate would bottleneck on 3 reducers at any cluster
    * size. Decimal sums keep the total order-independent (exact decimal
    * addition), so the two-phase re-aggregate is bit-stable no matter
    * which salt each row draws. */
  def scSaltedSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    saltedSum(Tables.lineitem(s, dir),
      $"l_returnflag", $"l_quantity".cast("decimal(12,2)"), SaltedSalts,
      Seq($"l_orderkey", $"l_linenumber"))
      .select($"key", $"total".cast("double").as("total"), $"n")
  }

  val scSaltedSumSql: String =
    """SELECT l_returnflag AS key,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Salted fact⋈fact equi-join vs the plain join oracle: every lineitem
    * row must meet its order exactly once (the right side is replicated
    * once per salt, and each left row carries exactly one salt — a wrong
    * replication range or a salt collision would duplicate or drop
    * rows). */
  def scSaltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val left = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("orderkey"), $"l_linenumber", $"l_quantity")
    val right = Tables.orders(s, dir)
      .select($"o_orderkey".as("orderkey"), $"o_custkey", $"o_orderstatus")
    saltedJoin(left, right, "orderkey", SaltedSalts,
      Seq($"orderkey", $"l_linenumber"))
  }

  val scSaltedJoinSql: String =
    """SELECT l_orderkey AS orderkey, l_linenumber, l_quantity,
      |  o_custkey, o_orderstatus
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  /** High-cardinality twin of sc_salted_sum: l_orderkey % 1000 gives ~1000
    * distinct keys sharing the same 8 salt values, so salt REUSE across
    * keys (the (key, salt) composite grouping, not just per-key spread)
    * is exercised — the 3-key gate alone only touches ≤24 composite
    * groups. */
  def scSaltedSumHicard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    saltedSum(Tables.lineitem(s, dir),
      pmod($"l_orderkey", lit(1000L)), $"l_quantity".cast("decimal(12,2)"),
      SaltedSalts, Seq($"l_orderkey", $"l_linenumber"))
      .select($"key", $"total".cast("double").as("total"), $"n")
  }

  val scSaltedSumHicardSql: String =
    """SELECT l_orderkey % 1000 AS key,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Bloom-pruned join — semi-join reduction for the regime where the
    * build side is too big to broadcast-HASH-join (hashtable = keys +
    * rows) but its BLOOM fits comfortably (~1.2 bytes/key at 1% FPP:
    * 10⁸ keys ≈ 120 MB sketch vs a multi-GB hashtable): build one
    * mergeable sketch over the small side's keys, broadcast the BYTES,
    * and filter the big side AT THE SCAN, before its rows ever enter
    * the join exchange. A 1% match rate means ~99% of the big side's
    * shuffle bytes never leave the map side; Bloom false positives are
    * removed by the real join, so the result is EXACTLY the plain join
    * (the gate's oracle). The sketch collect is one sized scalar
    * (expectedItems · 1.2 bytes), the bounded-driver pattern every
    * graft sketch uses; Spark's own runtime row-group Bloom pushdown
    * (spark.sql.optimizer.runtime.bloomFilter) is the built-in cousin —
    * this form makes the reduction explicit, sizable, and reusable
    * across queries (store the sketch, reuse per batch). */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = small.agg(graft.functions.BloomFunctions
      .bloom_sketch(col(key), expectedItems, fpp).as("sk"))
      .head().getAs[Array[Byte]](0)
    val bc = big.sparkSession.sparkContext.broadcast(bytes)
    big.filter(graft.functions.BloomFunctions
      .bloom_might_contain_bc(bc, col(key)))
      .join(small, Seq(key))
  }

  /** Gate: lineitem pruned-joined to a selective slice of orders — must
    * equal the plain join exactly (false positives die in the join). */
  def scBloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("orderkey"), $"l_linenumber", $"l_quantity")
    val small = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT" &&
        $"o_totalprice" > 150000.0)
      .select($"o_orderkey".as("orderkey"), $"o_totalprice")
    val n = small.count()
    bloomPrunedJoin(big, small, "orderkey", math.max(n, 1L))
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(12,2)")).cast("double")
          .as("sum_qty"),
        sum($"o_totalprice".cast("decimal(14,2)")).cast("double")
          .as("sum_price"))
  }

  val scBloomJoinSql: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
      |    AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000.0"""
      .stripMargin

  /** Exact ROW-skew report for a keyed shuffle — the diagnostic that
    * closes AQE's blind spot (SCALE.md round 10): AQE detects skew in
    * shuffle BYTES, and a single repeated key compresses to almost
    * nothing, so a row-skewed-but-compressible hot key can flood one
    * task's CPU while the byte stats look uniform. This reports rows:
    * the heaviest key (ties broken by largest key — deterministic in
    * both engines), its row count, totals, and the salt count
    * [[chooseSalts]]' formula would pick at `parallelism`, computed in
    * INTEGER arithmetic (⌈top·P/n⌉ via (top·P + n − 1) div n) so the
    * oracle match is exact, not float-rounded. One aggregation pass —
    * run it ad hoc before keying a 100 TB shuffle, or continuously on
    * samples; `chooseSalts` is this probe folded into the operator. */
  def skewReport(df: DataFrame, key: Column, parallelism: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    counts
      .agg(max(struct(col("cnt"), col("key"))).as("top"),
        sum(col("cnt")).as("n"), count(lit(1)).as("n_keys"))
      .select(col("top.key").as("top_key"), col("top.cnt").as("top_rows"),
        col("n").as("n_rows"), col("n_keys"),
        least(lit(parallelism.toLong), greatest(lit(1L),
          expr(s"(top.cnt * ${parallelism}L + n - 1L) div n")))
          .as("salts"))
  }

  /** Gate: report over a deterministically skewed key (~29% of lineitem
    * rows collapse onto key 0) at parallelism 32 — every column integer,
    * bigint-exact oracle. */
  def scSkewReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    skewReport(Tables.lineitem(s, dir),
      when(pmod($"l_orderkey", lit(10L)) < 8, 0L)
        .otherwise(pmod($"l_orderkey", lit(1000L))),
      parallelism = 32)
  }

  val scSkewReportSql: String =
    """WITH c AS (SELECT CASE WHEN l_orderkey % 10 < 8 THEN 0
      |    ELSE l_orderkey % 1000 END AS key, COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |  COUNT(*) AS n_keys FROM c),
      |t AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key DESC LIMIT 1)
      |SELECT t.key AS top_key, t.cnt AS top_rows, tot.n AS n_rows,
      |  tot.n_keys,
      |  LEAST(32, GREATEST(1, (t.cnt * 32 + tot.n - 1) // tot.n)) AS salts
      |FROM t, tot""".stripMargin

  // ------------------------------------------ sketch-based join planning
  // Estimate |orders ⋈ lineitem| and the lineitem-side skew moment F2
  // from two one-pass AMS sketches BEFORE running the join — the
  // pre-flight a 1000-executor fact⋈fact decision wants (shuffle vs
  // broadcast vs salt) without touching the data twice. The gate also
  // executes the exact join and gates the estimates inside a measured
  // envelope (rel. error ≤ 0.2; measured ≤ 0.05 at sf0.001/0.01/0.1 —
  // theory: sd/true ≈ sqrt(2·F2A·F2B/width)/true ≈ 4% here), so the
  // oracle row is exact bigints + envelope booleans.
  val JoinEstBound = 0.2

  def scJoinEstimate(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AmsFunctions._
    val o = Tables.orders(s, dir).select(col("o_orderkey").cast("long").as("k"))
    val l = Tables.lineitem(s, dir).select(col("l_orderkey").cast("long").as("k"))
    val sketches = o.agg(ams_sketch(col("k")).as("sk_o"))
      .crossJoin(l.agg(ams_sketch(col("k")).as("sk_l")))
      .select(ams_join_estimate(col("sk_o"), col("sk_l")).as("est_join"),
        ams_self_join(col("sk_l")).as("est_f2"))
    val exactJoin = o.join(l, "k").agg(count(lit(1)).as("exact_rows"))
    val exactF2 = l.groupBy("k").agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt") * col("cnt")).as("exact_f2"))
    exactJoin.crossJoin(exactF2).crossJoin(sketches).select(
      col("exact_rows"), col("exact_f2"),
      (abs(col("est_join") - col("exact_rows")) <=
        col("exact_rows") * JoinEstBound).as("join_est_ok"),
      (abs(col("est_f2") - col("exact_f2")) <=
        col("exact_f2") * JoinEstBound).as("f2_est_ok"))
  }

  val scJoinEstimateSql: String =
    """SELECT
      |  (SELECT COUNT(*) FROM orders o JOIN lineitem l
      |     ON o.o_orderkey = l.l_orderkey) AS exact_rows,
      |  (SELECT CAST(SUM(cnt * cnt) AS BIGINT) FROM (
      |     SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey)) AS exact_f2,
      |  TRUE AS join_est_ok, TRUE AS f2_est_ok""".stripMargin

  // ---------------------------------------------- join strategy advisor
  // The pre-flight report a fact⋈fact decision wants, as ONE row of
  // exact integers + a decision string: per-side row counts, per-side
  // hottest-key row counts, the skewReport salt recommendation for
  // each side, and the broadcast/salted/shuffle verdict. Decision rule
  // (deterministic, mirrored in the DuckDB oracle):
  //   n_right ≤ broadcastMaxRows → broadcast_right
  //   else n_left ≤ broadcastMaxRows → broadcast_left
  //   else either side's salt recommendation > 1 → salted_shuffle
  //   else shuffle.
  // The row-count broadcast proxy is the GATE form (byte sizes are not
  // reproducible in the oracle); production callers can combine this
  // report with ams_join_estimate/ams_self_join (sc_join_estimate) for
  // output-size and skew-moment estimates from the same single passes.
  def adviseJoin(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column,
      broadcastMaxRows: Long, parallelism: Int): DataFrame = {
    def side(df: DataFrame, key: Column, tag: String): DataFrame =
      df.groupBy(key.as("k")).agg(count(lit(1)).as("cnt"))
        .agg(sum(col("cnt")).as(s"n_$tag"), max(col("cnt")).as(s"top_$tag"))
    def salts(n: Column, top: Column): Column =
      least(lit(parallelism.toLong), greatest(lit(1L),
        expr(s"(${top.toString} * ${parallelism}L + ${n.toString} - 1L) div ${n.toString}")))
    side(left, leftKey, "left").crossJoin(side(right, rightKey, "right"))
      .select(col("n_left"), col("n_right"),
        col("top_left").as("top_left_rows"), col("top_right").as("top_right_rows"),
        salts(col("n_left"), col("top_left")).as("salts_left"),
        salts(col("n_right"), col("top_right")).as("salts_right"))
      .withColumn("decision",
        when(col("n_right") <= broadcastMaxRows, "broadcast_right")
          .when(col("n_left") <= broadcastMaxRows, "broadcast_left")
          .when(greatest(col("salts_left"), col("salts_right")) > 1L,
            "salted_shuffle")
          .otherwise("shuffle"))
  }

  val AdvisorBroadcastMaxRows = 20000L

  def scJoinAdvisor(s: SparkSession, dir: String): DataFrame =
    adviseJoin(
      Tables.lineitem(s, dir), col("l_orderkey"),
      Tables.orders(s, dir), col("o_orderkey"),
      AdvisorBroadcastMaxRows, parallelism = 32)

  val scJoinAdvisorSql: String =
    s"""WITH l AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, MAX(cnt) AS top FROM (
       |    SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey)),
       |r AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, MAX(cnt) AS top FROM (
       |    SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey))
       |SELECT l.n AS n_left, r.n AS n_right,
       |  l.top AS top_left_rows, r.top AS top_right_rows,
       |  LEAST(32, GREATEST(1, (l.top * 32 + l.n - 1) // l.n)) AS salts_left,
       |  LEAST(32, GREATEST(1, (r.top * 32 + r.n - 1) // r.n)) AS salts_right,
       |  CASE WHEN r.n <= $AdvisorBroadcastMaxRows THEN 'broadcast_right'
       |       WHEN l.n <= $AdvisorBroadcastMaxRows THEN 'broadcast_left'
       |       WHEN GREATEST(
       |           LEAST(32, GREATEST(1, (l.top * 32 + l.n - 1) // l.n)),
       |           LEAST(32, GREATEST(1, (r.top * 32 + r.n - 1) // r.n))) > 1
       |         THEN 'salted_shuffle'
       |       ELSE 'shuffle' END AS decision
       |FROM l, r""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sc_join_advisor" -> scJoinAdvisor,
    "sc_join_estimate" -> scJoinEstimate,
    "sc_salted_sum" -> scSaltedSum,
    "sc_salted_sum_hicard" -> scSaltedSumHicard,
    "sc_salted_join" -> scSaltedJoin,
    "sc_bloom_join" -> scBloomJoin,
    "sc_skew_report" -> scSkewReport,
  )

  val oracles: Map[String, String] = Map(
    "sc_join_advisor" -> scJoinAdvisorSql,
    "sc_join_estimate" -> scJoinEstimateSql,
    "sc_salted_sum" -> scSaltedSumSql,
    "sc_salted_sum_hicard" -> scSaltedSumHicardSql,
    "sc_salted_join" -> scSaltedJoinSql,
    "sc_bloom_join" -> scBloomJoinSql,
    "sc_skew_report" -> scSkewReportSql,
  )
}
