package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** TPC-H-derived multi-join suite (public benchmark queries, adapted to
  * the driver schema: no partsupp table; lineitem lacks
  * commitdate/receiptdate/shipmode, orders lacks shippriority, customer
  * lacks phone — queries needing those are either adapted, with the
  * adaptation noted, or omitted). Everything is DataFrame-API (one
  * `spark.sql` surface already exists via q36's TVF), with the q1
  * float discipline throughout: revenue terms are cast to
  * DECIMAL(12,2) per factor BEFORE multiplying/summing in BOTH engines,
  * so sums are exact under any partitioning and the DuckDB hash
  * comparison is stable; ratios divide two exact decimals cast to
  * double (one fp op, identical in both engines).
  *
  * Plan shapes worth noting at 100 TB: q5/q7/q8 are the classic
  * snowflake joins — small dims (nation/region/supplier/customer at
  * gate SF) broadcast onto the lineitem⋈orders backbone, which shuffles
  * once on orderkey; q13 is the left-outer fact join + double
  * aggregation; q18 reuses the lineitem orderkey aggregate as a
  * semi-join filter before the wide join (having-pushdown by hand).
  */
object TpchDerived {

  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  private val one = lit(1).cast("decimal(12,2)")
  /** Exact decimal revenue term: extprice · (1 − discount). */
  private def revTerm: Column =
    dec(col("l_extendedprice")) * (one - dec(col("l_discount")))
  private val RevSql =
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"

  // ---------------------------------------------------------------- Q3
  /** Shipping priority (adapted: no o_shippriority column). */
  def tpchQ3(s: SparkSession, dir: String): DataFrame = {
    val d = lit("1998-01-01").cast("timestamp")
    Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, dir).filter(col("o_orderdate") < d), col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_shipdate") > d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(sum(revTerm).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderdate"), asc("l_orderkey"))
      .limit(10)
  }

  val tpchQ3Sql: String =
    s"""SELECT l_orderkey, o_orderdate, CAST(SUM($RevSql) AS DOUBLE) AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Order-priority checking (adapted EXISTS: a line shipped more than
    * 60 days after the order replaces commitdate < receiptdate). */
  def tpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    o.join(l, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
      "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
  }

  val tpchQ4Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- Q5
  /** Local-supplier volume: revenue by nation inside one region where
    * the customer and supplier share the nation. */
  def tpchQ5(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(revTerm).cast("double").as("revenue"))
  }

  val tpchQ5Sql: String =
    s"""SELECT n_name, CAST(SUM($RevSql) AS DOUBLE) AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1997-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** Volume shipping between two nations by ship year. */
  def tpchQ7(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cust_nk"), col("n_name").as("cust_nation"))
    Tables.supplier(s, dir)
      .join(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("supp_nk") === col("s_nationkey"))
      .join(n2, col("cust_nk") === col("c_nationkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(revTerm).cast("double").as("revenue"))
  }

  val tpchQ7Sql: String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(YEAR(l_shipdate) AS INT) AS l_year,
       |  CAST(SUM($RevSql) AS DOUBLE) AS revenue
       |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |  JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
       |GROUP BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Market share of NATION_3 suppliers for PROMO parts sold to EUROPE
    * customers, by order year. Share = exact-decimal national volume /
    * exact-decimal total volume, one double division. */
  def tpchQ8(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cust_nk"), col("n_regionkey").as("cust_rk"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("supp_nk"), col("n_name").as("supp_nation"))
    Tables.part(s, dir).filter(col("p_type") === "PROMO")
      .join(Tables.lineitem(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(n1, col("cust_nk") === col("c_nationkey"))
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("r_regionkey") === col("cust_rk"))
      .join(n2, col("supp_nk") === col("s_nationkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", revTerm)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
        sum(revTerm).cast("double")).as("mkt_share"))
  }

  val tpchQ8Sql: String =
    s"""SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $RevSql
       |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
       |  / CAST(SUM($RevSql) AS DOUBLE) AS mkt_share
       |FROM part JOIN lineitem ON l_partkey = p_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = n1.n_regionkey
       |  JOIN nation n2 ON n2.n_nationkey = s_nationkey
       |WHERE p_type = 'PROMO' AND r_name = 'EUROPE'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- Q10
  /** Returned-item reporting: top 20 customers by lost revenue. */
  def tpchQ10(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, dir).filter(col("l_returnflag") === "R"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.nation(s, dir), col("n_nationkey") === col("c_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(revTerm).cast("double").as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(20)
  }

  val tpchQ10Sql: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  CAST(SUM($RevSql) AS DOUBLE) AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN lineitem ON l_orderkey = o_orderkey
       |  JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1997-07-01'
       |  AND o_orderdate < TIMESTAMP '1997-10-01'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey ASC LIMIT 20""".stripMargin

  // --------------------------------------------------------------- Q13
  /** Customer order-count distribution (left outer + double agg). */
  def tpchQ13(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  val tpchQ13Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count""".stripMargin

  // --------------------------------------------------------------- Q14
  /** Promotion effect: PROMO revenue share of one month, in percent. */
  def tpchQ14(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .join(Tables.part(s, dir), col("p_partkey") === col("l_partkey"))
      .agg(((sum(when(col("p_type") === "PROMO", revTerm)
          .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") * 100.0) /
        sum(revTerm).cast("double")).as("promo_revenue"))
  }

  val tpchQ14Sql: String =
    s"""SELECT (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $RevSql
       |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0)
       |  / CAST(SUM($RevSql) AS DOUBLE) AS promo_revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
       |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  // --------------------------------------------------------------- Q18
  /** Large-volume customers: orders whose line quantities sum past 150
    * (integral doubles — exact), with the aggregate reused as a
    * semi-join filter BEFORE the wide join (hand-pushed HAVING). */
  val Q18Threshold = 150.0

  def tpchQ18(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val bigOrders = l.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > Q18Threshold)
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .join(bigOrders, col("l_orderkey") === col("o_orderkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
  }

  val tpchQ18Sql: String =
    s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |  JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
       |        FROM lineitem GROUP BY l_orderkey
       |        HAVING SUM(l_quantity) > $Q18Threshold) big
       |    ON big.l_orderkey = o_orderkey""".stripMargin

  // ---------------------------------------------------------------- Q6
  /** Forecasting revenue change: the pure scan-aggregate — every
    * predicate (date range, discount band, quantity cap) must reach the
    * parquet scan as a pushed filter; the aggregate is one map-combined
    * decimal sum with no shuffle beyond the 1-row final. */
  def tpchQ6(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"))
  }

  val tpchQ6Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
      |    * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04
      |  AND l_quantity < 24""".stripMargin

  // --------------------------------------------------------------- Q12
  /** Shipping-mode priority counting (adapted: no shipmode/commitdate —
    * the mode split becomes late vs ontime by shipdate lag, the
    * priority CASE keeps TPC-H's urgent/high vs other split). Bigint
    * conditional counts over the fact join — exact by construction. */
  def tpchQ12(s: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"), "late")
        .otherwise("ontime").as("ship_class"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
  }

  val tpchQ12Sql: String =
    """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |    THEN 'late' ELSE 'ontime' END AS ship_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- Q15
  /** Top supplier: revenue per supplier over one quarter, keep the
    * supplier(s) at the maximum. The tie-safe "= (SELECT MAX(...))"
    * scalar subquery is a one-row broadcast cross join over the
    * supplier-level aggregate — the aggregate shuffles once on suppkey,
    * the max rides back as a scalar, no second shuffle. Revenue
    * equality is decided on the EXACT decimal (cast to double only for
    * output) so both engines select identical winners. */
  def tpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(revTerm).as("rev_dec"))
    val mx = rev.agg(max(col("rev_dec")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_dec") === col("mx"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
  }

  val tpchQ15Sql: String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey, SUM($RevSql) AS rev_dec FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |    AND l_shipdate < TIMESTAMP '1997-04-01'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
       |WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)""".stripMargin

  // --------------------------------------------------------------- Q16
  /** Parts/supplier relationship (adapted: no partsupp — lineitem IS
    * the observed part↔supplier relation; the complaints-comment
    * exclusion becomes negative-balance suppliers). Distinct-count
    * aggregation behind a broadcast NOT-IN anti-join. */
  def tpchQ16(s: SparkSession, dir: String): DataFrame = {
    val excluded = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))),
        col("p_partkey") === col("l_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val tpchQ16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      |  AND l_suppkey NOT IN
      |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------------------------- Q17
  /** Small-quantity-order revenue (adapted: brand only, no container).
    * The correlated "quantity < 0.5 · per-part average" subquery is a
    * per-part aggregate joined back to the fact — and the half-average
    * comparison is done in INTEGER form (2·qty·cnt < sum over integral
    * quantities), so the borderline row can never flip on a last-ulp
    * float difference between engines. Both lineitem passes are
    * pre-filtered to the brand's parts via a broadcast semi-join. */
  def tpchQ17(s: SparkSession, dir: String): DataFrame = {
    val bParts = broadcast(Tables.part(s, dir)
      .filter(col("p_brand") === "Brand#23").select("p_partkey"))
    val li = Tables.lineitem(s, dir)
      .join(bParts, col("p_partkey") === col("l_partkey"), "left_semi")
    val perPart = li.groupBy(col("l_partkey").as("agg_pk"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_q"),
        count(lit(1)).as("cnt_q"))
    li.join(perPart, col("agg_pk") === col("l_partkey"))
      .filter(col("l_quantity").cast("long") * 2 * col("cnt_q") < col("sum_q"))
      .agg((sum(dec(col("l_extendedprice"))).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  val tpchQ17Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
      |    / 7.0 AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |JOIN (SELECT l_partkey AS agg_pk,
      |        SUM(CAST(l_quantity AS BIGINT)) AS sum_q,
      |        COUNT(*) AS cnt_q
      |      FROM lineitem
      |      WHERE l_partkey IN
      |        (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23')
      |      GROUP BY 1) a ON agg_pk = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND CAST(l_quantity AS BIGINT) * 2 * cnt_q < sum_q""".stripMargin

  // --------------------------------------------------------------- Q19
  /** Discounted revenue (adapted: brand/size/quantity, no container):
    * three disjunctive predicate arms across the part⋈lineitem join.
    * The join stays a broadcast hash join on partkey with the OR-arms
    * as a post-join filter; the part-side conjunction common to all
    * arms (size ≤ 15, three brands) prunes the build side at the scan. */
  def tpchQ19(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_size").between(1, 15) &&
        col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
    Tables.lineitem(s, dir)
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(sum(revTerm).cast("double").as("revenue"))
  }

  val tpchQ19Sql: String =
    s"""SELECT CAST(SUM($RevSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       |    AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       |    AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // --------------------------------------------------------------- Q22
  /** Global sales opportunity (adapted: no phone column — the country
    * codes become a nationkey list, and "never ordered" becomes "no
    * order in the most recent window", because this data's customers
    * average ten orders lifetime): customers above the average positive
    * balance who have gone quiet. The above-average test is decided in
    * exact decimal form (bal · cnt > sum) so no borderline customer
    * flips on engine-specific AVG rounding; NOT EXISTS is a shuffle
    * anti-join against the date-pruned orders scan. */
  val Q22Since = "2001-06-01"

  def tpchQ22(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .filter(col("c_nationkey").isin(1L, 3L, 5L, 7L, 9L, 11L))
    val stats = cust.filter(col("c_acctbal") > 0)
      .agg(sum(dec(col("c_acctbal"))).as("sum_bal"),
        count(lit(1)).as("cnt_bal"))
    cust.crossJoin(broadcast(stats))
      .filter(dec(col("c_acctbal")) * col("cnt_bal") > col("sum_bal"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit(Q22Since).cast("timestamp"))
          .select("o_custkey"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
  }

  val tpchQ22Sql: String =
    s"""WITH cust AS (
       |  SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)),
       |stats AS (
       |  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS sum_bal,
       |    COUNT(*) AS cnt_bal
       |  FROM cust WHERE c_acctbal > 0)
       |SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
       |FROM cust, stats
       |WHERE CAST(c_acctbal AS DECIMAL(12,2)) * cnt_bal > sum_bal
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '$Q22Since')
       |GROUP BY 1""".stripMargin

  // --------------------------------------------------------------- Q21
  /** Suppliers who kept orders waiting (adapted lateness: a line
    * shipped more than 60 days after the order date replaces
    * receiptdate > commitdate, the tpch_q4/q12 convention; the gate
    * nation is NATION_9 — the driver schema's synthetic names).
    *
    * The double correlated subquery — EXISTS(another supplier on the
    * same order) AND NOT EXISTS(another supplier ALSO late) — is
    * decorrelated into one per-order aggregate: over the F-status
    * lineitem⋈orders backbone, count distinct suppliers and distinct
    * LATE suppliers per order; a late line waits iff the order has > 1
    * suppliers and exactly 1 late one (the line's own). That turns two
    * correlated rescans of lineitem into a single shuffle on orderkey
    * whose exchange the late-line side reuses — the 100 TB shape. */
  def tpchQ21(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val perOrder = l.groupBy("l_orderkey")
      .agg(count_distinct(col("l_suppkey")).as("n_supp"),
        count_distinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
    l.filter(col("late"))
      .join(perOrder.filter(col("n_supp") > 1 && col("n_late_supp") === 1),
        Seq("l_orderkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_9")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
  }

  val tpchQ21Sql: String =
    """WITH l AS (SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, COUNT(*) AS numwait
      |FROM supplier, l l1, nation
      |WHERE s_suppkey = l1.l_suppkey
      |  AND l1.l_shipdate > l1.o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM l l2
      |    WHERE l2.l_orderkey = l1.l_orderkey
      |      AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3
      |    WHERE l3.l_orderkey = l1.l_orderkey
      |      AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l3.o_orderdate + INTERVAL 60 DAY)
      |  AND s_nationkey = n_nationkey AND n_name = 'NATION_9'
      |GROUP BY s_name""".stripMargin

  // ---------------------------------------------------------------- Q2
  /** Minimum-cost supplier (adapted: the driver schema has no partsupp
    * table, so the supplier↔part catalog derives from lineitem — a
    * (part, supplier) pair's cost is its MINIMUM extended price, exact
    * decimal, no division). The q2 SHAPE survives intact: a correlated
    * MIN subquery over the region-restricted catalog selects, per
    * qualifying part, the supplier(s) achieving the regional minimum.
    * No LIMIT — every tie emits, so the result set is deterministic. */
  def tpchQ2(s: SparkSession, dir: String): DataFrame = {
    val supply = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("sp_pk"), col("l_suppkey").as("sp_sk"))
      .agg(min(dec(col("l_extendedprice"))).as("sp_cost"))
    val eur = Tables.supplier(s, dir)
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
        col("r_regionkey") === col("n_regionkey"))
    val eurSupply = supply.join(eur, col("sp_sk") === col("s_suppkey"))
    val minCost = eurSupply.groupBy(col("sp_pk").as("min_pk"))
      .agg(min(col("sp_cost")).as("min_cost"))
    Tables.part(s, dir)
      .filter(col("p_size") <= 10 && col("p_type") === "SMALL")
      .join(eurSupply, col("sp_pk") === col("p_partkey"))
      .join(minCost, col("min_pk") === col("p_partkey") &&
        col("sp_cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("sp_cost").cast("double").as("cost"))
  }

  val tpchQ2Sql: String =
    """WITH supply AS (
      |  SELECT l_partkey AS sp_pk, l_suppkey AS sp_sk,
      |    MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp_cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s_acctbal, s_name, n_name, p_partkey,
      |  CAST(sp_cost AS DOUBLE) AS cost
      |FROM part, supply, supplier, nation, region
      |WHERE p_partkey = sp_pk AND s_suppkey = sp_sk
      |  AND p_size <= 10 AND p_type = 'SMALL'
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE'
      |  AND sp_cost = (SELECT MIN(s2.sp_cost)
      |    FROM supply s2, supplier sup2, nation n2, region r2
      |    WHERE s2.sp_pk = p_partkey AND s2.sp_sk = sup2.s_suppkey
      |      AND sup2.s_nationkey = n2.n_nationkey
      |      AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Product-type profit by nation and year (adapted: no partsupp, so
    * supply cost is the deterministic proxy 0.6 · p_retailprice per
    * unit — exact decimal arithmetic end to end, cast to double only
    * after the SUM). The q9 shape — 5-table join, expression aggregate,
    * LIKE part filter, (nation, year) rollup — survives intact. */
  def tpchQ9(s: SparkSession, dir: String): DataFrame = {
    val costTerm = dec(col("p_retailprice")) *
      lit(0.6).cast("decimal(12,2)") * col("l_quantity").cast("decimal(12,2)")
    Tables.part(s, dir).filter(col("p_name").contains("red"))
      .join(Tables.lineitem(s, dir), col("l_partkey") === col("p_partkey"))
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(Tables.orders(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.nation(s, dir), col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(sum(revTerm - costTerm).cast("double").as("sum_profit"))
  }

  val tpchQ9Sql: String =
    s"""SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
       |  CAST(SUM($RevSql
       |    - CAST(p_retailprice AS DECIMAL(12,2))
       |      * CAST(0.6 AS DECIMAL(12,2))
       |      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
       |FROM part JOIN lineitem ON l_partkey = p_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '%red%'
       |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------------- Q11
  /** Important-part identification (adapted: a part's "value" is the
    * revenue its NATION_1-supplied lineitems carry, not partsupp stock
    * value). The q11 shape survives: per-part aggregate HAVING-compared
    * against a global-scalar fraction of the same aggregate. The global
    * total rides a broadcast one-row cross join — no driver collect —
    * and both engines compare in DOUBLE after exact decimal sums. Like
    * the real q11's SF-scaled fraction, the cut is SCALE-ADAPTIVE: a
    * part qualifies above 2× the average per-part share, so the gate
    * returns a meaningful slice at every SF. */
  def tpchQ11(s: SparkSession, dir: String): DataFrame = {
    val natLi = Tables.lineitem(s, dir)
      .join(Tables.supplier(s, dir), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_1")),
        col("n_nationkey") === col("s_nationkey"))
    val total = natLi.agg(sum(revTerm).cast("double").as("total"),
      count_distinct(col("l_partkey")).as("nd"))
    natLi.groupBy(col("l_partkey").as("ps_partkey"))
      .agg(sum(revTerm).as("value_d"))
      .crossJoin(broadcast(total))
      .filter(col("value_d").cast("double") > col("total") * 2.0 / col("nd"))
      .select(col("ps_partkey"), col("value_d").cast("double").as("value"))
  }

  val tpchQ11Sql: String =
    s"""SELECT l_partkey AS ps_partkey,
       |  CAST(SUM($RevSql) AS DOUBLE) AS value
       |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation ON n_nationkey = s_nationkey
       |WHERE n_name = 'NATION_1'
       |GROUP BY 1
       |HAVING CAST(SUM($RevSql) AS DOUBLE) > (
       |  SELECT CAST(SUM($RevSql) AS DOUBLE) * 2.0
       |      / COUNT(DISTINCT l_partkey)
       |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
       |    JOIN nation ON n_nationkey = s_nationkey
       |  WHERE n_name = 'NATION_1')""".stripMargin

  // --------------------------------------------------------------- Q20
  /** Excess-share suppliers (adapted: no ps_availqty, so the q20
    * half-sum test becomes "this supplier shipped MORE THAN HALF of the
    * part's total 1997 quantity" — integer-exact, same nested
    * IN-with-correlated-half-sum shape). */
  def tpchQ20(s: SparkSession, dir: String): DataFrame = {
    val li97 = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("qty"))
    val perSupp = li97
      .groupBy(col("l_partkey").as("q_pk"), col("l_suppkey").as("q_sk"))
      .agg(sum(col("qty")).as("supp_qty"))
    val perPart = li97.groupBy(col("l_partkey").as("t_pk"))
      .agg(sum(col("qty")).as("tot_qty"))
    val dominant = perSupp.join(perPart, col("t_pk") === col("q_pk"))
      .filter(col("supp_qty") * 2 > col("tot_qty"))
      .select(col("q_sk")).distinct()
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)
          .filter(col("n_name") === "NATION_2")),
        col("n_nationkey") === col("s_nationkey"))
      .join(dominant, col("q_sk") === col("s_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
  }

  val tpchQ20Sql: String =
    """SELECT s_name, s_acctbal
      |FROM supplier JOIN nation ON n_nationkey = s_nationkey
      |WHERE n_name = 'NATION_2' AND s_suppkey IN (
      |  SELECT l_suppkey
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |  GROUP BY l_partkey, l_suppkey
      |  HAVING SUM(CAST(l_quantity AS BIGINT)) * 2 > (
      |    SELECT SUM(CAST(l2.l_quantity AS BIGINT))
      |    FROM lineitem l2 JOIN orders o2 ON o2.o_orderkey = l2.l_orderkey
      |    WHERE l2.l_partkey = lineitem.l_partkey
      |      AND o2.o_orderdate >= TIMESTAMP '1997-01-01'
      |      AND o2.o_orderdate < TIMESTAMP '1998-01-01'))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tpch_q2" -> tpchQ2,
    "tpch_q9" -> tpchQ9,
    "tpch_q11" -> tpchQ11,
    "tpch_q20" -> tpchQ20,
    "tpch_q3" -> tpchQ3,
    "tpch_q4" -> tpchQ4,
    "tpch_q5" -> tpchQ5,
    "tpch_q6" -> tpchQ6,
    "tpch_q7" -> tpchQ7,
    "tpch_q8" -> tpchQ8,
    "tpch_q10" -> tpchQ10,
    "tpch_q12" -> tpchQ12,
    "tpch_q13" -> tpchQ13,
    "tpch_q14" -> tpchQ14,
    "tpch_q15" -> tpchQ15,
    "tpch_q16" -> tpchQ16,
    "tpch_q17" -> tpchQ17,
    "tpch_q18" -> tpchQ18,
    "tpch_q19" -> tpchQ19,
    "tpch_q21" -> tpchQ21,
    "tpch_q22" -> tpchQ22,
  )

  val oracles: Map[String, String] = Map(
    "tpch_q2" -> tpchQ2Sql,
    "tpch_q9" -> tpchQ9Sql,
    "tpch_q11" -> tpchQ11Sql,
    "tpch_q20" -> tpchQ20Sql,
    "tpch_q3" -> tpchQ3Sql,
    "tpch_q4" -> tpchQ4Sql,
    "tpch_q5" -> tpchQ5Sql,
    "tpch_q6" -> tpchQ6Sql,
    "tpch_q7" -> tpchQ7Sql,
    "tpch_q8" -> tpchQ8Sql,
    "tpch_q10" -> tpchQ10Sql,
    "tpch_q12" -> tpchQ12Sql,
    "tpch_q13" -> tpchQ13Sql,
    "tpch_q14" -> tpchQ14Sql,
    "tpch_q15" -> tpchQ15Sql,
    "tpch_q16" -> tpchQ16Sql,
    "tpch_q17" -> tpchQ17Sql,
    "tpch_q18" -> tpchQ18Sql,
    "tpch_q19" -> tpchQ19Sql,
    "tpch_q21" -> tpchQ21Sql,
    "tpch_q22" -> tpchQ22Sql,
  )
}
