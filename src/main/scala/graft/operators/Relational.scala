package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The general relational surface (SURVEY §2.2): everything the reference
  * delegates to user-space map/reduce patterns, expressed as declarative
  * Catalyst plans so pushdown / pruning / partial-agg / join-strategy
  * selection are automatic (SURVEY §4: zero custom rules needed).
  *
  * Scale notes baked into every query:
  *  - dimension tables (region/nation/supplier/part/customer at TPC-H
  *    ratios) are broadcast explicitly — no shuffle of the fact table for
  *    a dim join at any SF;
  *  - fact⋈fact joins (lineitem⋈orders) are plain equi-joins on the
  *    natural key so Catalyst plans a shuffled hash / sort-merge join and
  *    AQE can re-plan or skew-split at runtime;
  *  - aggregates cast 2-decimal monetary doubles to exact decimals BEFORE
  *    summing: decimal sums are order-independent (bit-identical under any
  *    partitioning / AQE re-plan), where double sums would drift per run —
  *    a correctness property at 1000 executors, not just an oracle trick.
  */
object Relational {

  /** Exact-decimal view of a 2-decimal monetary double column: the cast is
    * exact for the data domain, and decimal addition is associative, so
    * aggregation results do not depend on Spark's partitioning. */
  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private def asDouble(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------- scans +
  // aggregation (TPC-H Q1 style): partial+final HashAggregate, one shuffle.
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        asDouble(sum(dec($"l_quantity"))).as("sum_qty"),
        asDouble(sum(dec($"l_extendedprice"))).as("sum_base_price"),
        asDouble(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec($"l_discount"))))
          .as("sum_disc_price"),
        asDouble(sum(dec($"l_extendedprice") * (lit(1).cast("decimal(12,2)") - dec($"l_discount"))
          * (lit(1).cast("decimal(12,2)") + dec($"l_tax")))).as("sum_charge"),
        (asDouble(sum(dec($"l_quantity"))) / count(lit(1))).as("avg_qty"),
        (asDouble(sum(dec($"l_discount"))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val q1Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ----------------------------------------------------- filter + projection
  // (TPC-H Q6 style). Both the predicate and the 4-column ReadSchema reach
  // the parquet scan — verified via explain in RelationalPlanSpec.
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
        $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
        $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .select($"l_orderkey", $"l_linenumber",
        asDouble(dec($"l_extendedprice") * dec($"l_discount")).as("disc_revenue"))
  }

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS disc_revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin

  // ------------------------------------------------- broadcast join pipeline
  // customer⋈nation⋈region are broadcast (dims), orders streams through —
  // zero shuffles of the fact side until the final aggregation.
  def q3RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(asDouble(sum(dec($"o_totalprice"))).as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  val q3Sql: String =
    """SELECT r_name, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  // ------------------------------------------------------- fact ⋈ fact join
  // lineitem⋈orders on the natural key: shuffled join, AQE-replannable.
  def q4FactJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_orderkey").as("n_orders"),
        asDouble(sum(dec($"l_extendedprice"))).as("sum_price"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority""".stripMargin

  /** Same query over bucket-materialized fact tables
    * (Tables.materializeBucketed): both sides pre-hashed and sorted on
    * the join key with equal bucket counts, so the fact⋈fact join runs
    * with NO exchange — the physical layout a 100 TB deployment would
    * maintain for its hottest join key. The only remaining shuffle is
    * the final small aggregation. */
  def q4Bucketed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (li, ord) = Tables.materializeBucketed(s, dir)
    s.table(li)
      .join(s.table(ord), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_orderkey").as("n_orders"),
        asDouble(sum(dec($"l_extendedprice"))).as("sum_price"))
  }

  /** Bucketed layout on a SECOND hot key (customer ⋈ orders co-located
    * on custkey, Tables.materializeBucketedCust): per-segment order
    * stats with the join exchange-free — the bucketing story is a
    * per-key layout decision, not a one-off. */
  def q35BucketedCust(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (cust, ordc) = Tables.materializeBucketedCust(s, dir)
    s.table(cust)
      .join(s.table(ordc), $"c_custkey" === $"o_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct($"c_custkey").as("n_customers"),
        asDouble(sum(dec($"o_totalprice"))).as("sum_price"))
  }

  val q35Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  COUNT(DISTINCT c_custkey) AS n_customers,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------ semi / anti
  def q5SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderstatus" === "F"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
  }

  val q5Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin

  def q6AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_totalprice" > 400000),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_acctbal")
  }

  val q6Sql: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin

  // -------------------------------------------------------- window: top-k
  // per group. Tie-break on the unique key makes the result deterministic
  // under any physical ordering — required for cross-engine equality.
  def q7TopOrdersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
  }

  val q7Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) t
      |WHERE rn <= 3""".stripMargin

  // --------------------------------------------- window: running aggregate.
  // Decimal accumulator ⇒ the cumulative sum is exact, so the row-framed
  // running total is engine-independent given the deterministic sort key.
  // The synthetic lineitem does NOT keep (l_orderkey, l_linenumber)
  // unique, so l_quantity joins the tie-break: rows still tied after
  // that are tied on the ADDEND too, making every ordering of them
  // produce identical running sums (sf0.1 has exactly one such tie —
  // ambiguous under the shorter key, harmless under this one).
  def q8RunningTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate".asc, $"l_orderkey".asc, $"l_linenumber".asc,
        $"l_quantity".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, dir)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        asDouble(sum(dec($"l_quantity")).over(w)).as("running_qty"))
  }

  val q8Sql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC, l_quantity ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem""".stripMargin

  // ------------------------------------------------------ global sort + limit
  // (top-k): Spark plans TakeOrderedAndProject — no global shuffle sort.
  def q9Top10Orders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
  }

  val q9Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  // ----------------------------------------------------------------- set ops
  def q10SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val f = o.filter($"o_orderstatus" === "F").select($"o_custkey").distinct()
    val p = o.filter($"o_orderstatus" === "O").select($"o_custkey").distinct()
    f.except(p).withColumn("tag", lit("f_only"))
      .unionByName(f.intersect(p).withColumn("tag", lit("both")))
      .select($"tag", $"o_custkey")
  }

  val q10Sql: String =
    """SELECT 'f_only' AS tag, o_custkey FROM
      |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |   EXCEPT SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') t1
      |UNION ALL
      |SELECT 'both' AS tag, o_custkey FROM
      |  (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |   INTERSECT SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O') t2""".stripMargin

  // ------------------------------------------------------------ distinct agg
  def q11DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(countDistinct($"c_custkey").as("n_customers"),
        countDistinct($"c_nationkey").as("n_nations"),
        countDistinct($"c_mktsegment").as("n_segments"))
  }

  val q11Sql: String =
    """SELECT r_name, COUNT(DISTINCT c_custkey) AS n_customers,
      |  COUNT(DISTINCT c_nationkey) AS n_nations,
      |  COUNT(DISTINCT c_mktsegment) AS n_segments
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  // -------------------------------------------------------- rollup and cube.
  // COALESCE folds the subtotal NULLs into a sentinel so the grouping level
  // is explicit in the value domain (data contains no 'ALL' literal).
  def q12Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(asDouble(sum(dec($"l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
        coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
        $"sum_qty", $"n")
  }

  val q12Sql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  def q13Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .cube($"n_name", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec($"o_totalprice"))).as("revenue"))
      .select(coalesce($"n_name", lit("ALL")).as("nation"),
        coalesce($"o_orderpriority", lit("ALL")).as("priority"),
        $"n", $"revenue")
  }

  val q13Sql: String =
    """SELECT COALESCE(n_name, 'ALL') AS nation,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE (n_name, o_orderpriority)""".stripMargin

  // -------------------------------------------------- grouping sets (via SQL
  // — the DataFrame API has no direct grouping-sets builder; Catalyst plans
  // an Expand + single aggregate either way).
  def q14GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("gs_orders")
    s.sql(
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  COUNT(*) AS n
        |FROM gs_orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
  }

  val q14Sql: String =
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n
      |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin

  // ------------------------------------------------------- scalar functions:
  // string / math / conditional, all codegen'd builtins.
  def q15ScalarFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir).select(
      $"p_partkey",
      upper($"p_name").as("name_upper"),
      substring($"p_type", 1, 6).as("type_prefix"),
      length($"p_name").as("name_len"),
      concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
      abs($"p_size" - 25).as("size_dist"),
      ($"p_partkey" % 7).as("key_mod"),
      asDouble(floor($"p_retailprice")).as("price_floor"),
      asDouble(ceil($"p_retailprice")).as("price_ceil"),
      when($"p_retailprice" > 1500, "premium").otherwise("standard").as("tier"),
      replace($"p_name", lit(" "), lit("_")).as("name_snake"))
  }

  val q15Sql: String =
    """SELECT p_partkey, UPPER(p_name) AS name_upper,
      |  SUBSTRING(p_type, 1, 6) AS type_prefix,
      |  LENGTH(p_name) AS name_len,
      |  CONCAT_WS('|', p_brand, p_type) AS brand_type,
      |  ABS(p_size - 25) AS size_dist,
      |  p_partkey % 7 AS key_mod,
      |  CAST(FLOOR(p_retailprice) AS DOUBLE) AS price_floor,
      |  CAST(CEIL(p_retailprice) AS DOUBLE) AS price_ceil,
      |  CASE WHEN p_retailprice > 1500 THEN 'premium' ELSE 'standard' END AS tier,
      |  REPLACE(p_name, ' ', '_') AS name_snake
      |FROM part""".stripMargin

  // ------------------------------------------------------------- date funcs
  def q16DateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(year($"o_orderdate").as("yr"), quarter($"o_orderdate").as("qtr"))
      .agg(count(lit(1)).as("n"), asDouble(sum(dec($"o_totalprice"))).as("revenue"))
  }

  val q16Sql: String =
    """SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(QUARTER(o_orderdate) AS INT) AS qtr,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------- JSON access
  def q17Json(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").cast("long").as("k"))
      .filter($"k" >= 50)
  }

  val q17Sql: String =
    """SELECT event_id, event_type, CAST(props->>'$.k' AS BIGINT) AS k
      |FROM events WHERE CAST(props->>'$.k' AS BIGINT) >= 50""".stripMargin

  // ------------------------------------------------------------ case + having
  def q18CaseHaving(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select(when($"o_totalprice" > 150000, "big")
        .when($"o_totalprice" > 50000, "mid")
        .otherwise("small").as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n"))
      .filter($"n" > 10)
  }

  val q18Sql: String =
    """SELECT bucket, COUNT(*) AS n FROM (
      |  SELECT CASE WHEN o_totalprice > 150000 THEN 'big'
      |              WHEN o_totalprice > 50000 THEN 'mid'
      |              ELSE 'small' END AS bucket FROM orders) t
      |GROUP BY bucket HAVING COUNT(*) > 10""".stripMargin

  // -------------------------------------------------------------- IN-subquery
  // (planned as a left-semi join; the build side is broadcast-able).
  def q19InSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val building = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    Tables.orders(s, dir)
      .join(broadcast(building), $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec($"o_totalprice"))).as("revenue"))
  }

  val q19Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderstatus""".stripMargin

  // ----------------------------------------------------- range (theta) join:
  // equi key + range residual. Catalyst plans the equi part as the join key
  // and evaluates the band predicate as a post-join filter.
  def q20RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)),
        $"l_partkey" === $"p_partkey" &&
          $"l_extendedprice" >= $"p_retailprice" * 0.5 &&
          $"l_extendedprice" <= $"p_retailprice" * 2.0)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), asDouble(sum(dec($"l_quantity"))).as("sum_qty"))
  }

  val q20Sql: String =
    """SELECT p_brand, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |  AND l_extendedprice >= p_retailprice * 0.5
      |  AND l_extendedprice <= p_retailprice * 2.0
      |GROUP BY p_brand""".stripMargin

  // ------------------------------------------------------------ as-of join.
  // Spark has no ASOF JOIN operator; the scalable formulation is the
  // union + last_value(ignoreNulls) window sweep: one shuffle on the key,
  // one sort — identical asymptotics to a native as-of merge join, and no
  // per-row range probe. Orders are pre-collapsed to one row per
  // (custkey, day) so the as-of match is unique ⇒ deterministic.
  def q21AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordersDaily = Tables.orders(s, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
    val ev = Tables.events(s, dir)
      .select($"user_id", $"ts".as("t"), $"event_id",
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), lit(1).as("is_event"))
    val or = ordersDaily
      .select($"o_custkey".as("user_id"), $"o_orderdate".as("t"),
        lit(null).cast("long").as("event_id"),
        $"o_orderkey", $"o_totalprice", lit(0).as("is_event"))
    // order rows sort before event rows at equal t ⇒ "<=" semantics
    val w = Window.partitionBy($"user_id")
      .orderBy($"t".asc, $"is_event".asc, $"o_orderkey".asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(or)
      .withColumn("asof_orderkey", last($"o_orderkey", ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last($"o_totalprice", ignoreNulls = true).over(w))
      .filter($"is_event" === 1)
      .select($"event_id", $"user_id", $"asof_orderkey", $"asof_totalprice")
  }

  val q21Sql: String =
    """SELECT e.event_id, e.user_id, o.o_orderkey AS asof_orderkey,
      |  o.o_totalprice AS asof_totalprice
      |FROM events e ASOF LEFT JOIN (
      |  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
      |    MAX_BY(o_totalprice, o_orderkey) AS o_totalprice
      |  FROM orders GROUP BY o_custkey, o_orderdate) o
      |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin

  /** Same as-of semantics through the NATIVE operator
    * (graft.plans.AsofJoin: LogicalPlan → Strategy → merge-pass SparkPlan)
    * instead of the union + window sweep — identical results, one
    * streaming merge per co-partition. Shares q21's DuckDB oracle. */
  def q29AsofNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ordersDaily = Tables.orders(s, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
    val ev = Tables.events(s, dir).select($"event_id", $"user_id", $"ts")
    // o_orderdate is TIMESTAMP_NTZ in the parquet; cast to the left side's
    // TIMESTAMP explicitly (the q21 window sweep gets the same coercion
    // implicitly from unionByName) — the strategy rejects mixed time types
    graft.plans.AsofJoinApi.joinAsof(
      ev, ordersDaily,
      Seq(ev("user_id")), Seq(ordersDaily("o_custkey")),
      ev("ts"), ordersDaily("o_orderdate").cast("timestamp"))
      .select($"event_id", $"user_id",
        $"o_orderkey".as("asof_orderkey"),
        $"o_totalprice".as("asof_totalprice"))
  }

  /** q29's as-of reached ENTIRELY through SQL: the asof_join table-valued
    * function (graft.plans.AsofSqlFunction) over temp views — what a
    * spark.sql-only user writes. Shares q21's DuckDB oracle. */
  def q36AsofSql(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.events(s, dir).select($"event_id", $"user_id", $"ts")
      .createOrReplaceTempView("asof_events")
    Tables.orders(s, dir)
      .groupBy($"o_custkey", $"o_orderdate")
      .agg(max($"o_orderkey").as("o_orderkey"),
        max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
      .createOrReplaceTempView("asof_orders_daily")
    s.sql(
      """SELECT event_id, user_id, o_orderkey AS asof_orderkey,
        |  o_totalprice AS asof_totalprice
        |FROM asof_join('asof_events', 'asof_orders_daily',
        |  'l.user_id', 'r.o_custkey',
        |  'l.ts', 'CAST(r.o_orderdate AS TIMESTAMP)')""".stripMargin)
  }

  /** FORWARD as-of: each purchase looks up the user's NEXT error event
    * at-or-after the purchase time — the "what broke after this"
    * direction pandas calls `direction='forward'`, composed from the
    * native backward merge by time negation
    * (graft.plans.AsofDirectionsApi). Errors pre-collapse to one row per
    * (user, ts) so the match is unique and the oracle deterministic. */
  def q40AsofForward(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val errs = events.filter($"event_type" === "error")
      .groupBy($"user_id".as("e_user"), $"ts".as("e_ts"))
      .agg(max($"event_id").as("err_id"))
    val facts = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    graft.plans.AsofDirectionsApi.joinAsofForward(
      facts, errs, Seq(facts("user_id")), Seq(errs("e_user")),
      facts("ts"), errs("e_ts"))
      .select($"purchase_id", $"user_id", $"ts",
        $"e_ts".as("next_error_ts"), $"err_id".as("next_error_id"))
  }

  val q40Sql: String =
    """WITH errs AS (
      |  SELECT user_id AS e_user, ts AS e_ts, MAX(event_id) AS err_id
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT f.event_id AS purchase_id, f.user_id, f.ts,
      |  n.e_ts AS next_error_ts, n.err_id AS next_error_id
      |FROM events f LEFT JOIN LATERAL (
      |  SELECT e_ts, err_id FROM errs e
      |  WHERE e.e_user = f.user_id AND e.e_ts >= f.ts
      |  ORDER BY e.e_ts LIMIT 1) n ON TRUE
      |WHERE f.event_type = 'purchase'""".stripMargin

  /** NEAREST as-of: the closer of the previous and next error, ties to
    * the earlier — `direction='nearest'`. Backward pass + forward pass
    * over the same key partitioning, then a codegen'd per-row choice. */
  def q41AsofNearest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val errs = events.filter($"event_type" === "error")
      .groupBy($"user_id".as("e_user"), $"ts".as("e_ts"))
      .agg(max($"event_id").as("err_id"))
    val facts = events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    graft.plans.AsofDirectionsApi.joinAsofNearest(
      facts, errs, Seq("user_id" -> "e_user"), "ts", "e_ts")
      .select($"purchase_id", $"user_id", $"ts",
        $"e_ts".as("near_error_ts"), $"err_id".as("near_error_id"))
  }

  val q41Sql: String =
    """WITH errs AS (
      |  SELECT user_id AS e_user, ts AS e_ts, MAX(event_id) AS err_id
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT f.event_id AS purchase_id, f.user_id, f.ts,
      |  n.e_ts AS near_error_ts, n.err_id AS near_error_id
      |FROM events f LEFT JOIN LATERAL (
      |  SELECT e_ts, err_id FROM errs e WHERE e.e_user = f.user_id
      |  ORDER BY abs(epoch_us(e.e_ts) - epoch_us(f.ts)) ASC, e.e_ts ASC
      |  LIMIT 1) n ON TRUE
      |WHERE f.event_type = 'purchase'""".stripMargin

  // ----------------------------------------------- time bucketing over events
  def q22EventsHourly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        asDouble(sum(dec($"value"))).as("sum_value"),
        countDistinct($"user_id").as("n_users"))
  }

  val q22Sql: String =
    """SELECT DATE_TRUNC('hour', ts) AS hour, event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY 1, 2""".stripMargin

  // ------------------------------------------- window: RANGE interval frame
  /** Trailing 6-hour activity per user — a RANGE frame over event time
    * (every peer row within the interval joins the frame, unlike q8's
    * ROWS frame). Spark's `rangeBetween` takes numeric offsets, so the
    * order key is epoch MICROS and the frame is −6h in micros; the
    * oracle mirrors the same numeric frame. RANGE semantics make the
    * result tie-independent (all rows at the same instant share one
    * frame), and the decimal accumulator keeps the sum exact — full
    * oracle. One keyed shuffle + one sorted window pass, same 100 TB
    * shape as every window query here. */
  def q37TrailingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-6L * 3600 * 1000000, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("ts_us", unix_micros($"ts"))
      .select($"user_id", $"event_id",
        count(lit(1)).over(w).as("n_6h"),
        asDouble(sum(dec($"value")).over(w)).as("sum_6h"))
  }

  val q37Sql: String =
    """SELECT user_id, event_id,
      |  COUNT(*) OVER w AS n_6h,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_6h
      |FROM (SELECT *, epoch_us(ts) AS ts_us FROM events) t
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
      |  RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)""".stripMargin

  // --------------------------------------------------------- full outer join
  /** FULL OUTER customer ⋈ per-customer order aggregate. The two sides
    * are filtered on DIFFERENT moduli (customers: key % 3 ≠ 0; orders:
    * key % 2 = 0) so both unmatched directions occur by construction in
    * the synthetic data (where otherwise every customer has orders):
    * odd-keyed customers keep null aggregates, and order groups whose
    * customer key is a multiple of 3 keep a null name. */
  def q38FullOuter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir)
      .filter(pmod($"c_custkey", lit(3L)) =!= 0)
      .select($"c_custkey", $"c_name")
    val ords = Tables.orders(s, dir)
      .filter(pmod($"o_custkey", lit(2L)) === 0)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec($"o_totalprice"))).as("total_price"))
    cust.join(ords, $"c_custkey" === $"o_custkey", "full_outer")
      .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
        $"c_name", $"n_orders", $"total_price")
  }

  val q38Sql: String =
    """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, c.c_name,
      |  o.n_orders, o.total_price
      |FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0) c
      |FULL JOIN (SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |      AS total_price
      |  FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey) o
      |ON c.c_custkey = o.o_custkey""".stripMargin

  // ---------------------------------------------------------------- unpivot
  /** UNPIVOT via `stack`: the four lineitem measures melt into
    * (measure, value) rows — the inverse of q25's pivot. Scan-side
    * narrow fan-out (4 rows per input row, no shuffle); values are the
    * raw column doubles, so the oracle (a UNION ALL melt) is exact. */
  def q39Unpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 100)
      .selectExpr("l_orderkey", "l_linenumber",
        """stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice,
          |  'discount', l_discount, 'tax', l_tax) AS (measure, value)"""
          .stripMargin)

  val q39Sql: String =
    """SELECT l_orderkey, l_linenumber, m AS measure, v AS value
      |FROM (SELECT * FROM lineitem WHERE l_orderkey < 100) l, LATERAL (
      |  VALUES ('quantity', l.l_quantity),
      |    ('extendedprice', l.l_extendedprice),
      |    ('discount', l.l_discount), ('tax', l.l_tax)) AS t(m, v)"""
      .stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q37_trailing_window" -> q37TrailingWindow,
    "q38_full_outer" -> q38FullOuter,
    "q39_unpivot" -> q39Unpivot,
    "q1_pricing_summary" -> q1PricingSummary,
    "q2_filter_project" -> q2FilterProject,
    "q3_region_revenue" -> q3RegionRevenue,
    "q4_fact_join" -> q4FactJoin,
    "q4_bucketed" -> q4Bucketed,
    "q35_bucketed_cust" -> q35BucketedCust,
    "q5_semi_join" -> q5SemiJoin,
    "q6_anti_join" -> q6AntiJoin,
    "q7_topk_per_group" -> q7TopOrdersPerCustomer,
    "q8_running_total" -> q8RunningTotal,
    "q9_top10_global" -> q9Top10Orders,
    "q10_set_ops" -> q10SetOps,
    "q11_distinct_agg" -> q11DistinctAgg,
    "q12_rollup" -> q12Rollup,
    "q13_cube" -> q13Cube,
    "q14_grouping_sets" -> q14GroupingSets,
    "q15_scalar_funcs" -> q15ScalarFuncs,
    "q16_date_funcs" -> q16DateFuncs,
    "q17_json" -> q17Json,
    "q18_case_having" -> q18CaseHaving,
    "q19_in_subquery" -> q19InSubquery,
    "q20_range_join" -> q20RangeJoin,
    "q21_asof_join" -> q21AsofJoin,
    "q29_asof_native" -> q29AsofNative,
    "q40_asof_forward" -> q40AsofForward,
    "q41_asof_nearest" -> q41AsofNearest,
    "q36_asof_sql" -> q36AsofSql,
    "q22_events_hourly" -> q22EventsHourly,
  )

  val oracles: Map[String, String] = Map(
    "q37_trailing_window" -> q37Sql,
    "q38_full_outer" -> q38Sql,
    "q39_unpivot" -> q39Sql,
    "q1_pricing_summary" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_region_revenue" -> q3Sql,
    "q4_fact_join" -> q4Sql,
    "q4_bucketed" -> q4Sql,
    "q35_bucketed_cust" -> q35Sql,
    "q5_semi_join" -> q5Sql,
    "q6_anti_join" -> q6Sql,
    "q7_topk_per_group" -> q7Sql,
    "q8_running_total" -> q8Sql,
    "q9_top10_global" -> q9Sql,
    "q10_set_ops" -> q10Sql,
    "q11_distinct_agg" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_cube" -> q13Sql,
    "q14_grouping_sets" -> q14Sql,
    "q15_scalar_funcs" -> q15Sql,
    "q16_date_funcs" -> q16Sql,
    "q17_json" -> q17Sql,
    "q18_case_having" -> q18Sql,
    "q19_in_subquery" -> q19Sql,
    "q20_range_join" -> q20Sql,
    "q21_asof_join" -> q21Sql,
    "q29_asof_native" -> q21Sql, // identical semantics, same oracle
    "q40_asof_forward" -> q40Sql,
    "q41_asof_nearest" -> q41Sql,
    "q36_asof_sql" -> q21Sql, // SQL TVF surface over the same native op
    "q22_events_hourly" -> q22Sql,
  )
}
