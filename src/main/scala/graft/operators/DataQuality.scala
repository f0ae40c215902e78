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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dq_audit" -> dqAudit,
  )

  val oracles: Map[String, String] = Map(
    "dq_audit" -> dqAuditSql,
  )
}
