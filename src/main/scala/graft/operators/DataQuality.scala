package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Single-pass data-quality audit — Deequ-style constraint checking
  * shaped for 100 TB: every row-level check (not-null, range, accepted
  * values, regex) compiles to one `sum(when(violated,1,0))` inside ONE
  * aggregate over ONE scan of the table; uniqueness rides the same
  * aggregate as `count(*) − count(distinct keys)`; referential integrity
  * joins the (broadcast, deduplicated) dimension key before the same
  * aggregate, so the whole audit is one fact-table pass regardless of
  * how many constraints it evaluates. The one-row metric vector is then
  * unpivoted with `stack` into the (check_name, violations, n_rows,
  * pass) report — driver-side cost is k rows for k checks.
  *
  * Violation semantics (pinned by DataQualitySpec):
  *  - not_null: NULL violates;
  *  - range/accepted/matches: NULL violates (a row that cannot prove the
  *    constraint fails it — assert not_null separately if NULLs are
  *    expected);
  *  - ref: NULL foreign keys do NOT violate (that is not_null's job) —
  *    only non-NULL keys missing from the dimension;
  *  - unique: violations = rows − distinct keys (0 when unique).
  */
object DataQuality {

  sealed trait DqCheck { def name: String }
  /** NULL in `column` violates. */
  case class DqNotNull(column: String) extends DqCheck {
    val name = s"not_null:$column"
  }
  /** Value outside [lo, hi] (or NULL) violates. */
  case class DqInRange(column: String, lo: Double, hi: Double) extends DqCheck {
    val name = s"range:$column"
  }
  /** Value not in `values` (or NULL) violates. */
  case class DqAccepted(column: String, values: Seq[String]) extends DqCheck {
    val name = s"accepted:$column"
  }
  /** Value not matching `regex` (or NULL) violates. */
  case class DqMatches(column: String, regex: String) extends DqCheck {
    val name = s"matches:$column"
  }
  /** Duplicate key combinations violate: count(*) − count(distinct). */
  case class DqUnique(columns: Seq[String]) extends DqCheck {
    val name = s"unique:${columns.mkString(",")}"
  }
  /** Non-NULL `column` absent from `dim.dimColumn` violates. `dim` must
    * be broadcast-sized (a dimension key set). */
  case class DqRef(column: String, dim: DataFrame, dimColumn: String)
      extends DqCheck {
    val name = s"ref:$column->$dimColumn"
  }

  /** One-pass audit of `df` under `checks`; returns one row per check:
    * (check_name, violations, n_rows, pass). */
  def audit(df: DataFrame, checks: Seq[DqCheck]): DataFrame = {
    require(checks.nonEmpty, "audit: no checks given")
    require(checks.map(_.name).distinct.size == checks.size,
      s"audit: duplicate check names in ${checks.map(_.name)}")
    // referential dims join (broadcast, deduplicated) BEFORE the single
    // aggregate; tag columns keep multiple refs to the same dim apart
    val refs = checks.zipWithIndex.collect { case (r: DqRef, i) => (r, i) }
    val joined = refs.foldLeft(df) { case (d, (r, i)) =>
      val tag = s"__dq_ref_$i"
      d.join(
        broadcast(r.dim.select(col(r.dimColumn).as(tag)).distinct()),
        d(r.column) === col(tag), "left")
    }
    def violated(c: DqCheck, i: Int): Column = c match {
      case DqNotNull(cn) => col(cn).isNull
      case DqInRange(cn, lo, hi) =>
        col(cn).isNull || col(cn) < lo || col(cn) > hi
      case DqAccepted(cn, vs) => col(cn).isNull || !col(cn).isin(vs: _*)
      case DqMatches(cn, re) => col(cn).isNull || !col(cn).rlike(re)
      case DqRef(cn, _, _) => col(cn).isNotNull && col(s"__dq_ref_$i").isNull
      case _: DqUnique => lit(false) // handled as its own aggregate below
    }
    val metricCols: Seq[Column] = checks.zipWithIndex.map {
      case (u: DqUnique, i) =>
        (count(lit(1)) - count_distinct(col(u.columns.head),
          u.columns.tail.map(col): _*)).as(s"__dq_$i")
      case (c, i) =>
        sum(when(violated(c, i), 1L).otherwise(0L)).as(s"__dq_$i")
    }
    val one = joined.agg(count(lit(1)).as("n_rows"), metricCols: _*)
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"'${c.name}', __dq_$i" }.mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${checks.size}, $stackArgs) AS (check_name, violations)")
      .select(col("check_name"), col("violations"),
        col("n_rows"), (col("violations") === 0L).as("pass"))
  }

  // ------------------------------------------------------------- gate
  // Orders-table audit: five passing constraints plus one REAL failure
  // (the price cap) so the gate exercises non-zero violation counting,
  // all oracle-exact bigints.
  val AuditPriceCap = 400000.0

  def dqAudit(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    audit(orders, Seq(
      DqNotNull("o_custkey"),
      DqInRange("o_totalprice", 0.0, AuditPriceCap),
      DqAccepted("o_orderstatus", Seq("F", "O", "P")),
      DqMatches("o_orderpriority", "^[1-5]-"),
      DqUnique(Seq("o_orderkey")),
      DqRef("o_custkey", customer, "c_custkey"),
    ))
  }

  val dqAuditSql: String =
    s"""SELECT check_name, violations, n_rows, violations = 0 AS pass FROM (
       |  SELECT 'not_null:o_custkey' AS check_name,
       |    (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS violations,
       |    (SELECT COUNT(*) FROM orders) AS n_rows
       |  UNION ALL SELECT 'range:o_totalprice',
       |    (SELECT COUNT(*) FROM orders
       |     WHERE o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > $AuditPriceCap),
       |    (SELECT COUNT(*) FROM orders)
       |  UNION ALL SELECT 'accepted:o_orderstatus',
       |    (SELECT COUNT(*) FROM orders
       |     WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('F','O','P')),
       |    (SELECT COUNT(*) FROM orders)
       |  UNION ALL SELECT 'matches:o_orderpriority',
       |    (SELECT COUNT(*) FROM orders
       |     WHERE o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-')),
       |    (SELECT COUNT(*) FROM orders)
       |  UNION ALL SELECT 'unique:o_orderkey',
       |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
       |    (SELECT COUNT(*) FROM orders)
       |  UNION ALL SELECT 'ref:o_custkey->c_custkey',
       |    (SELECT COUNT(*) FROM orders o
       |     LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
       |       ON o.o_custkey = c.c_custkey
       |     WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL),
       |    (SELECT COUNT(*) FROM orders)
       |)""".stripMargin

  // ------------------------------------------------ distribution drift

  /** A drift dimension: how one column's values bucket into a
    * histogram key. Numeric columns bin into `bins` fixed-width
    * buckets over [lo, hi] (out-of-range clamps to the edge buckets,
    * NULL gets its own bucket) — the reference snapshot's expected
    * range is the caller's domain knowledge, pinned so the two sides
    * bucket identically; categorical columns key by value. */
  sealed trait DriftSpec {
    def column: String
    def name: String
    private[operators] def key: Column
  }
  case class NumDrift(column: String, bins: Int, lo: Double, hi: Double)
      extends DriftSpec {
    require(bins >= 2 && hi > lo, s"NumDrift($column): need bins>=2, hi>lo")
    val name = s"num:$column"
    private[operators] def key: Column = {
      val w = (hi - lo) / bins
      when(col(column).isNull, lit(-1L))
        .otherwise(least(greatest(
          floor((col(column) - lit(lo)) / lit(w)), lit(0L)),
          lit(bins - 1L))).cast("string")
    }
  }
  case class CatDrift(column: String) extends DriftSpec {
    val name = s"cat:$column"
    private[operators] def key: Column =
      coalesce(col(column).cast("string"), lit("__null__"))
  }

  /** Distribution drift of `cur` against a pinned reference snapshot,
    * one row per spec'd column: EXACT total-variation distance over
    * the spec's histogram, reported as the cross-multiplied integer
    * `dist = Σ_b |n_cur(b)·N_ref − n_ref(b)·N_cur|` (= 2·TV·N_cur·N_ref,
    * DECIMAL(38,0) — no float ever enters, so the report is
    * bit-reproducible across engines and SFs) plus the thresholded
    * verdict `drifted ⟺ TV > num/den` evaluated in the same integer
    * domain. Cost shape for 100 TB: ONE scan per side (every column's
    * histogram rides a single explode→hash-aggregate; bins×columns
    * rows leave the executors), then driver-trivial join algebra —
    * no per-column passes, no sort, no collect of anything
    * data-sized. */
  def driftReport(cur: DataFrame, ref: DataFrame, specs: Seq[DriftSpec],
      thresholdNum: Int = 1, thresholdDen: Int = 20): DataFrame = {
    require(specs.nonEmpty, "driftReport needs at least one DriftSpec")
    require(thresholdNum > 0 && thresholdDen > 0, "threshold must be > 0")
    def hist(df: DataFrame): DataFrame =
      df.select(explode(array(specs.map(sp =>
          struct(lit(sp.name).as("col"), sp.key.as("key"))): _*)).as("e"))
        .groupBy(col("e.col").as("col"), col("e.key").as("key"))
        .agg(count(lit(1)).as("n"))
    val hc = hist(cur).withColumnRenamed("n", "nc")
    val hr = hist(ref).withColumnRenamed("n", "nr")
    val j = hc.join(hr, Seq("col", "key"), "full_outer")
      .select(col("col"), col("key"),
        coalesce(col("nc"), lit(0L)).as("nc"),
        coalesce(col("nr"), lit(0L)).as("nr"))
    val d18 = "decimal(18,0)"
    val totals = j.groupBy("col")
      .agg(sum("nc").as("ncur"), sum("nr").as("nref"))
    j.join(totals, "col")
      .groupBy(col("col").as("column"))
      .agg(
        first(col("nref")).as("n_ref"),
        first(col("ncur")).as("n_cur"),
        sum(abs(col("nc").cast(d18) * col("nref").cast(d18) -
          col("nr").cast(d18) * col("ncur").cast(d18)))
          .cast("decimal(38,0)").as("dist"))
      .withColumn("drifted",
        col("dist") * lit(thresholdDen) >
          col("n_cur").cast(d18) * col("n_ref").cast(d18) *
            lit(2 * thresholdNum))
  }

  /** Gate fixture: a synthetically drifted copy of orders — a third of
    * the rows' prices grow 1.5× and a fifth of the rows' priorities
    * collapse to '1-URGENT'; custkey and status are untouched controls
    * that must report dist = 0, drifted = false. */
  def dqDrift(s: SparkSession, dir: String): DataFrame = {
    val ref = Tables.orders(s, dir)
    val cur = ref
      .withColumn("o_totalprice",
        when(pmod(col("o_orderkey"), lit(3)) === 0,
          col("o_totalprice") * 1.5).otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(pmod(col("o_orderkey"), lit(5)) === 0, lit("1-URGENT"))
          .otherwise(col("o_orderpriority")))
    // the library report carries dist as DECIMAL(38,0); the gate casts
    // it to double for the cross-engine compare (exact below 2^53 —
    // dist <= 2*N^2, fine at every gate SF; DuckDB's pandas bridge
    // floats wide decimals, so a decimal-typed gate column would
    // dtype-mismatch on values that are equal)
    driftReport(cur, ref, Seq(
      NumDrift("o_totalprice", 20, 0.0, 600000.0),
      NumDrift("o_custkey", 16, 0.0, 10000.0),
      CatDrift("o_orderpriority"),
      CatDrift("o_orderstatus")))
      .withColumn("dist", col("dist").cast("double"))
  }

  val dqDriftSql: String =
    """WITH cur AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.5
      |         ELSE o_totalprice END AS o_totalprice,
      |    CASE WHEN o_orderkey % 5 = 0 THEN '1-URGENT'
      |         ELSE o_orderpriority END AS o_orderpriority
      |  FROM orders),
      |hc AS (
      |  SELECT 'num:o_totalprice' AS col, CAST(CASE WHEN o_totalprice IS NULL
      |      THEN -1 ELSE LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 30000.0)
      |      AS BIGINT), 0), 19) END AS VARCHAR) AS key, COUNT(*) AS n
      |    FROM cur GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'num:o_custkey', CAST(CASE WHEN o_custkey IS NULL
      |      THEN -1 ELSE LEAST(GREATEST(CAST(FLOOR((o_custkey - 0.0) / 625.0)
      |      AS BIGINT), 0), 15) END AS VARCHAR), COUNT(*)
      |    FROM cur GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'cat:o_orderpriority', COALESCE(o_orderpriority, '__null__'),
      |      COUNT(*) FROM cur GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'cat:o_orderstatus', COALESCE(o_orderstatus, '__null__'),
      |      COUNT(*) FROM cur GROUP BY 1, 2),
      |hr AS (
      |  SELECT 'num:o_totalprice' AS col, CAST(CASE WHEN o_totalprice IS NULL
      |      THEN -1 ELSE LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 30000.0)
      |      AS BIGINT), 0), 19) END AS VARCHAR) AS key, COUNT(*) AS n
      |    FROM orders GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'num:o_custkey', CAST(CASE WHEN o_custkey IS NULL
      |      THEN -1 ELSE LEAST(GREATEST(CAST(FLOOR((o_custkey - 0.0) / 625.0)
      |      AS BIGINT), 0), 15) END AS VARCHAR), COUNT(*)
      |    FROM orders GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'cat:o_orderpriority', COALESCE(o_orderpriority, '__null__'),
      |      COUNT(*) FROM orders GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'cat:o_orderstatus', COALESCE(o_orderstatus, '__null__'),
      |      COUNT(*) FROM orders GROUP BY 1, 2),
      |j AS (
      |  SELECT COALESCE(hc.col, hr.col) AS col, COALESCE(hc.key, hr.key) AS key,
      |    COALESCE(hc.n, 0) AS nc, COALESCE(hr.n, 0) AS nr
      |  FROM hc FULL OUTER JOIN hr ON hc.col = hr.col AND hc.key = hr.key),
      |t AS (SELECT col, CAST(SUM(nc) AS BIGINT) AS ncur,
      |  CAST(SUM(nr) AS BIGINT) AS nref FROM j GROUP BY col)
      |SELECT j.col AS "column", t.nref AS n_ref, t.ncur AS n_cur,
      |  CAST(SUM(ABS(CAST(j.nc AS DECIMAL(18,0)) * CAST(t.nref AS DECIMAL(18,0))
      |    - CAST(j.nr AS DECIMAL(18,0)) * CAST(t.ncur AS DECIMAL(18,0))))
      |    AS DOUBLE) AS dist,
      |  SUM(ABS(CAST(j.nc AS DECIMAL(18,0)) * CAST(t.nref AS DECIMAL(18,0))
      |    - CAST(j.nr AS DECIMAL(18,0)) * CAST(t.ncur AS DECIMAL(18,0)))) * 20
      |    > CAST(t.ncur AS DECIMAL(18,0)) * CAST(t.nref AS DECIMAL(18,0)) * 2
      |    AS drifted
      |FROM j JOIN t ON j.col = t.col
      |GROUP BY j.col, t.nref, t.ncur""".stripMargin

  /** Gate: drift ACROSS LAKEHOUSE VERSIONS — "did yesterday's ingest
    * shift the distribution?" composed from two existing primitives:
    * VERSION AS OF time travel pins both sides of [[driftReport]] to
    * immutable snapshots of ONE table (no copy of the reference data
    * ever made — the v0 manifest IS the pinned baseline), and the
    * ingest between them is a real file-pruned MERGE. Prices double on
    * even keys (drifts), priorities are untouched (control, dist = 0).
    * The oracle replays the merge relationally. */
  def dqDriftCow(s: SparkSession, dir: String): DataFrame = {
    val table =
      s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
        java.util.UUID.randomUUID().toString.take(8)
    val orders = Tables.orders(s, dir)
    val m0 = CowTable.init(orders, table)
    CowTable.mergeInto(s, table, orders
        .filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      Seq("o_orderkey"), insert = false)
    driftReport(
      CowTable.read(s, table),
      CowTable.readVersion(s, table, m0.version),
      Seq(NumDrift("o_totalprice", 20, 0.0, 600000.0),
        CatDrift("o_orderpriority")))
      .withColumn("dist", col("dist").cast("double"))
  }

  val dqDriftCowSql: String =
    """WITH cur AS (SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderpriority
      |  FROM orders),
      |hc AS (
      |  SELECT 'num:o_totalprice' AS col, CAST(CASE WHEN o_totalprice IS NULL
      |      THEN -1 ELSE LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 30000.0)
      |      AS BIGINT), 0), 19) END AS VARCHAR) AS key, COUNT(*) AS n
      |    FROM cur GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'cat:o_orderpriority', COALESCE(o_orderpriority, '__null__'),
      |      COUNT(*) FROM cur GROUP BY 1, 2),
      |hr AS (
      |  SELECT 'num:o_totalprice' AS col, CAST(CASE WHEN o_totalprice IS NULL
      |      THEN -1 ELSE LEAST(GREATEST(CAST(FLOOR((o_totalprice - 0.0) / 30000.0)
      |      AS BIGINT), 0), 19) END AS VARCHAR) AS key, COUNT(*) AS n
      |    FROM orders GROUP BY 1, 2
      |  UNION ALL
      |  SELECT 'cat:o_orderpriority', COALESCE(o_orderpriority, '__null__'),
      |      COUNT(*) FROM orders GROUP BY 1, 2),
      |j AS (
      |  SELECT COALESCE(hc.col, hr.col) AS col, COALESCE(hc.key, hr.key) AS key,
      |    COALESCE(hc.n, 0) AS nc, COALESCE(hr.n, 0) AS nr
      |  FROM hc FULL OUTER JOIN hr ON hc.col = hr.col AND hc.key = hr.key),
      |t AS (SELECT col, CAST(SUM(nc) AS BIGINT) AS ncur,
      |  CAST(SUM(nr) AS BIGINT) AS nref FROM j GROUP BY col)
      |SELECT j.col AS "column", t.nref AS n_ref, t.ncur AS n_cur,
      |  CAST(SUM(ABS(CAST(j.nc AS DECIMAL(18,0)) * CAST(t.nref AS DECIMAL(18,0))
      |    - CAST(j.nr AS DECIMAL(18,0)) * CAST(t.ncur AS DECIMAL(18,0))))
      |    AS DOUBLE) AS dist,
      |  SUM(ABS(CAST(j.nc AS DECIMAL(18,0)) * CAST(t.nref AS DECIMAL(18,0))
      |    - CAST(j.nr AS DECIMAL(18,0)) * CAST(t.ncur AS DECIMAL(18,0)))) * 20
      |    > CAST(t.ncur AS DECIMAL(18,0)) * CAST(t.nref AS DECIMAL(18,0)) * 2
      |    AS drifted
      |FROM j JOIN t ON j.col = t.col
      |GROUP BY j.col, t.nref, t.ncur""".stripMargin

  // ---------------------------------------- sketch-backed drift (hi-card)

  /** Bounded-state drift spec for HIGH-CARDINALITY columns — the
    * [[DriftSpec]] histogram is exact but its state is the column's
    * support; pointing it at a 10⁸-distinct column ships a histogram
    * the size of the column. These flavors keep O(k) state per column
    * regardless of support. */
  sealed trait SketchDriftSpec { def column: String; def kind: String }
  /** Numeric: KLL quantile-bin TV — the reference sketch's `bins`
    * quantiles become shared bin edges, each side's bin mass is a cdf
    * difference on its own sketch, TV = ½·Σ|curFrac − refFrac|. Rank
    * error is O(1/k) per edge, so the estimate's error is a few
    * percent at k=400 — an envelope, not an exact (the spec and the
    * gate pin it against exact TV on planted drifts). */
  case class KllDrift(column: String, bins: Int = 32, k: Int = 400)
      extends SketchDriftSpec { val kind = "kll" }
  /** Categorical: CMS point-frequency distance over the union of both
    * sides' heavy hitters, plus the residual-mass term — drift that
    * moves mass onto/off frequent values (the shape that matters) is
    * fully visible; a permutation within the never-frequent tail is
    * not, the documented bound of any bounded-state detector. */
  case class CmsDrift(column: String, topK: Int = 64, depth: Int = 4,
      width: Int = 8192) extends SketchDriftSpec { val kind = "cms" }

  /** Drift of `cur` vs `ref` with BOUNDED per-column state: ONE
    * aggregate per side carries every spec'd column's sketch (KLL
    * bytes / CMS bytes + Misra–Gries top-k), two rows total reach the
    * driver, and the TV estimates are driver-trivial algebra on the
    * sketches. 100 TB shape: two scans (one per side), shuffle-free
    * partial/final aggregation, O(k·columns) bytes of state — the
    * exact [[driftReport]] stays the right tool for bounded-support
    * columns; this one never materializes a support-sized histogram. */
  def driftReportSketched(cur: DataFrame, ref: DataFrame,
      specs: Seq[SketchDriftSpec], thresholdNum: Int = 1,
      thresholdDen: Int = 20): DataFrame = {
    require(specs.nonEmpty, "driftReportSketched needs at least one spec")
    require(thresholdNum > 0 && thresholdDen > 0, "threshold must be > 0")
    import graft.functions.{CmsFunctions, CmsKernel, HeavyHitterFunctions,
      KllFunctions, KllKernel}
    val aggs = specs.flatMap {
      case KllDrift(c, _, k) => Seq(
        KllFunctions.kll_sketch(col(c).cast("double"), k),
        count(col(c)))
      case CmsDrift(c, topK, depth, width) => Seq(
        CmsFunctions.cms_sketch(col(c), depth, width),
        HeavyHitterFunctions.heavy_hitters(col(c), topK),
        count(col(c)))
    }
    def sideRow(df: DataFrame) = df.agg(aggs.head, aggs.tail: _*).head()
    val (rc, rr) = (sideRow(cur), sideRow(ref))
    var i = 0
    val rows = specs.map { sp =>
      val (tv, nCur, nRef) = sp match {
        case KllDrift(_, bins, _) =>
          val (skC, nC) = (rc.getAs[Array[Byte]](i), rc.getLong(i + 1))
          val (skR, nR) = (rr.getAs[Array[Byte]](i), rr.getLong(i + 1))
          i += 2
          if (nC == 0L || nR == 0L) (0.0, nC, nR)
          else {
            val edges = KllKernel.quantiles(skR,
              (1 until bins).map(_.toDouble / bins).toArray).distinct.sorted
            def fracs(sk: Array[Byte]): Array[Double] = {
              val cdf = KllKernel.cdf(sk, edges)
              (cdf :+ 1.0).zip(0.0 +: cdf.toSeq).map { case (b, a) => b - a }
            }
            val tv = 0.5 * fracs(skC).zip(fracs(skR))
              .map { case (a, b) => math.abs(a - b) }.sum
            (tv, nC, nR)
          }
        case CmsDrift(_, _, _, _) =>
          val (cmC, hhC, nC) = (rc.getAs[Array[Byte]](i),
            rc.getSeq[org.apache.spark.sql.Row](i + 1), rc.getLong(i + 2))
          val (cmR, hhR, nR) = (rr.getAs[Array[Byte]](i),
            rr.getSeq[org.apache.spark.sql.Row](i + 1), rr.getLong(i + 2))
          i += 3
          if (nC == 0L || nR == 0L) (0.0, nC, nR)
          else {
            val items = (hhC ++ hhR).map(_.getString(0)).distinct
            def p(cm: Array[Byte], n: Long)(v: String): Double =
              math.min(1.0, CmsKernel.estimateString(cm, v).toDouble / n)
            val (pc, pr) = (p(cmC, nC) _, p(cmR, nR) _)
            val hhTerm = items.map(v => math.abs(pc(v) - pr(v))).sum
            val restC = math.max(0.0, 1.0 - items.map(pc).sum)
            val restR = math.max(0.0, 1.0 - items.map(pr).sum)
            (0.5 * (hhTerm + math.abs(restC - restR)), nC, nR)
          }
      }
      (sp.column, sp.kind, nRef, nCur, tv,
        tv > thresholdNum.toDouble / thresholdDen)
    }
    import cur.sparkSession.implicits._
    rows.toDF("column", "kind", "n_ref", "n_cur", "tv_est", "drifted")
  }

  /** Gate fixture: ~10⁵-distinct columns from lineitem — numeric id
    * `v` (a third of the mass shifted out of the support entirely) and
    * hi-card categorical `c` (a fifth collapsed onto one hot value),
    * with untouched controls. */
  private def driftSketchSides(s: SparkSession, dir: String,
      drifted: Boolean): DataFrame = {
    val id = col("l_orderkey") * 8 + col("l_linenumber")
    Tables.lineitem(s, dir).select(
      (if (drifted) when(pmod(id, lit(3)) === 0, id + 100000000L)
        .otherwise(id) else id).cast("double").as("v"),
      pmod(id, lit(1000)).cast("double").as("v_ctl"),
      (if (drifted) when(pmod(id, lit(5)) === 0, lit("HOT"))
        .otherwise(concat(lit("u"), pmod(id, lit(99991)).cast("string")))
      else concat(lit("u"), pmod(id, lit(99991)).cast("string"))).as("c"),
      pmod(id, lit(37)).cast("string").as("c_ctl"))
  }

  /** Gate: sketch drift on planted hi-card drifts, with the ESTIMATE
    * pinned in-gate against the EXACT by-value TV (the [[driftReport]]
    * machinery — affordable at gate SF, the thing the sketches replace
    * at 10⁸ support): `envelope_ok ⟺ |tv_est − tv_exact| ≤ 0.05`.
    * Output is fully oracle-predictable (counts + verdicts +
    * envelope booleans); the raw estimates stay in-gate because a
    * mergeable sketch's exact bytes depend on the merge tree. */
  /** The production form — sketches only, no exact-TV recomputation
    * (that lives in the GATE purely so the oracle can pin the
    * envelope). The bench times this one. */
  def dqDriftSketchRaw(s: SparkSession, dir: String): DataFrame =
    driftReportSketched(
      driftSketchSides(s, dir, drifted = true),
      driftSketchSides(s, dir, drifted = false),
      Seq(KllDrift("v"), KllDrift("v_ctl"), CmsDrift("c"), CmsDrift("c_ctl")))

  def dqDriftSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (cur, ref) = (driftSketchSides(s, dir, drifted = true),
      driftSketchSides(s, dir, drifted = false))
    val rep = driftReportSketched(cur, ref, Seq(
      KllDrift("v"), KllDrift("v_ctl"), CmsDrift("c"), CmsDrift("c_ctl")))
      .collect()
    // exact by-value TV per column (CatDrift keys by value — exact)
    val exact = driftReport(cur, ref,
      Seq("v", "v_ctl", "c", "c_ctl").map(c =>
        CatDrift(c): DriftSpec))
      .collect().map { r =>
        val dist = r.getDecimal(3).doubleValue()
        r.getString(0).stripPrefix("cat:") ->
          dist / (2.0 * r.getLong(1) * r.getLong(2))
      }.toMap
    rep.map { r =>
      val tvExact = exact(r.getString(0))
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5), math.abs(r.getDouble(4) - tvExact) <= 0.05)
    }.toSeq
      .toDF("column", "kind", "n_ref", "n_cur", "drifted", "envelope_ok")
  }

  val dqDriftSketchSql: String =
    """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem)
      |SELECT 'v' AS "column", 'kll' AS kind, n AS n_ref, n AS n_cur,
      |  TRUE AS drifted, TRUE AS envelope_ok FROM n
      |UNION ALL SELECT 'v_ctl', 'kll', n, n, FALSE, TRUE FROM n
      |UNION ALL SELECT 'c', 'cms', n, n, TRUE, TRUE FROM n
      |UNION ALL SELECT 'c_ctl', 'cms', n, n, FALSE, TRUE FROM n""".stripMargin

  /** The versioned fixture for the sketch-drift-over-versions gate:
    * hi-card columns shaped like [[driftSketchSides]]'s land in a CoW
    * table at v0 (the pinned baseline — no copy of the reference data
    * ever made), and the ingest between the versions is TWO PARTIAL-COLUMN
    * upserts ([[CowTable.upsertMor]] `preserveMissing`): one carries
    * only (id, v) and shifts a third of the numeric mass out of the
    * support, the other only (id, c) and collapses a fifth of the
    * categorical mass onto one hot value. Keys hit by BOTH (id ≡ 0
    * mod 15) exercise preserve-over-postimage ordering: the second
    * upsert must keep the FIRST upsert's shifted `v`, newest live row
    * winning — a stale-preimage bug would break the exact envelope. */
  private def driftSketchCowTable(s: SparkSession, dir: String): String = {
    val table =
      s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
        java.util.UUID.randomUUID().toString.take(8)
    // keyed on o_orderkey — the driver's orders keys are dense AND
    // unique (lineitem's (orderkey, linenumber) pairs are NOT, and an
    // upsert source must be duplicate-free); the derived columns keep
    // [[driftSketchSides]]'s shape at orders cardinality
    val id = col("o_orderkey")
    val base = Tables.orders(s, dir).select(
      id.as("id"),
      id.cast("double").as("v"),
      pmod(id, lit(1000)).cast("double").as("v_ctl"),
      concat(lit("u"), pmod(id, lit(99991)).cast("string")).as("c"),
      pmod(id, lit(37)).cast("string").as("c_ctl"))
    CowTable.init(base, table)
    CowTable.upsertMor(s, table,
      base.filter(pmod(col("id"), lit(3)) === 0)
        .select(col("id"), (col("v") + 100000000.0).as("v")),
      Seq("id"), preserveMissing = true)
    CowTable.upsertMor(s, table,
      base.filter(pmod(col("id"), lit(5)) === 0)
        .select(col("id"), lit("HOT").as("c")),
      Seq("id"), preserveMissing = true)
    table
  }

  /** Gate: SKETCH drift ACROSS LAKEHOUSE VERSIONS — the hi-card twin
    * of [[dqDriftCow]] and the versioned twin of [[dqDriftSketch]]:
    * `VERSION AS OF` time travel pins the reference side to the v0
    * manifest of ONE table, the current side reads the head after two
    * partial-column ingests, and the drift report is the
    * bounded-state [[driftReportSketched]] (one sketch aggregate per
    * side — works at 10⁸-distinct support where the exact report's
    * by-value histogram would not). The estimate is pinned in-gate
    * against the exact by-value TV (affordable at gate SF):
    * `envelope_ok ⟺ |tv_est − tv_exact| ≤ 0.05`. */
  def dqDriftSketchCow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val table = driftSketchCowTable(s, dir)
    val cur = CowTable.read(s, table)
    val ref = CowTable.readVersion(s, table, 0)
    val rep = driftReportSketched(cur, ref, Seq(
      KllDrift("v"), KllDrift("v_ctl"), CmsDrift("c"), CmsDrift("c_ctl")))
      .collect()
    val exact = driftReport(cur, ref,
      Seq("v", "v_ctl", "c", "c_ctl").map(c => CatDrift(c): DriftSpec))
      .collect().map { r =>
        val dist = r.getDecimal(3).doubleValue()
        r.getString(0).stripPrefix("cat:") ->
          dist / (2.0 * r.getLong(1) * r.getLong(2))
      }.toMap
    rep.map { r =>
      val tvExact = exact(r.getString(0))
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5), math.abs(r.getDouble(4) - tvExact) <= 0.05)
    }.toSeq
      .toDF("column", "kind", "n_ref", "n_cur", "drifted", "envelope_ok")
  }

  /** The production form — sketches over the two version reads only,
    * no exact-TV recomputation (the bench times this one). */
  def dqDriftSketchCowRaw(s: SparkSession, dir: String): DataFrame = {
    val table = driftSketchCowTable(s, dir)
    driftReportSketched(
      CowTable.read(s, table), CowTable.readVersion(s, table, 0),
      Seq(KllDrift("v"), KllDrift("v_ctl"),
        CmsDrift("c"), CmsDrift("c_ctl")))
  }

  val dqDriftSketchCowSql: String =
    """WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders)
      |SELECT 'v' AS "column", 'kll' AS kind, n AS n_ref, n AS n_cur,
      |  TRUE AS drifted, TRUE AS envelope_ok FROM n
      |UNION ALL SELECT 'v_ctl', 'kll', n, n, FALSE, TRUE FROM n
      |UNION ALL SELECT 'c', 'cms', n, n, TRUE, TRUE FROM n
      |UNION ALL SELECT 'c_ctl', 'cms', n, n, FALSE, TRUE FROM n""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_audit" -> dqAudit,
    "dq_drift" -> dqDrift,
    "dq_drift_cow" -> dqDriftCow,
    "dq_drift_sketch" -> dqDriftSketch,
    "dq_drift_sketch_cow" -> dqDriftSketchCow,
  )

  val oracles: Map[String, String] = Map(
    "dq_audit" -> dqAuditSql,
    "dq_drift" -> dqDriftSql,
    "dq_drift_cow" -> dqDriftCowSql,
    "dq_drift_sketch" -> dqDriftSketchSql,
    "dq_drift_sketch_cow" -> dqDriftSketchCowSql,
  )
}
