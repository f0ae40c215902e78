package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.plans.{MvCatalog, MvRewriteApi}

/** Materialized-view serving gates — the user-visible face of
  * [[graft.plans.MvRewriteRule]].
  *
  * The gates express their query against the BASE lineitem table; the
  * optimizer rule transparently re-aggregates the registered keys-level
  * summary instead. The DuckDB oracle executes the same SQL on the raw
  * parquet, so the gate proves the rewrite is value-identical end-to-end
  * (MvRewriteSpec separately proves the plan really scans only the MV).
  *
  * Measure choice is deliberate for exact-hash oracle-ability:
  * `l_quantity` is integral-valued, so sum-of-group-sums equals the
  * direct sum bit-for-bit in doubles; `l_extendedprice` rides MIN/MAX
  * (order-free). At 100 TB the same rewrite turns a fact-table scan into
  * a |keys|-row summary scan, and the MV stays current via
  * [[Changelog.aggMaintain]]'s retract-add loop rather than rebuilds. */
object MatView {

  val keys: Seq[String] = Seq("l_returnflag", "l_linestatus")
  val measures: Seq[String] = Seq("l_quantity", "l_extendedprice")

  private def mvPath(dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_mv/$tag/lineitem_by_flag_status"
  }

  /** Fingerprint of the base table's physical files (name, size,
    * mtime): the staleness test that catches a REGENERATED dataset at
    * the same dir path. The cached MV lives under java.io.tmpdir keyed
    * by the dir string and survives across JVMs — without the data
    * fingerprint, regenerating the parquet would leave the
    * session-global rewrite serving a silently stale summary to every
    * in-shape lineitem aggregate. */
  private def baseFingerprint(s: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val h = fs.listStatus(p).toSeq.sortBy(_.getPath.getName)
      .foldLeft(17L) { (acc, st) =>
        ((acc * 31 + st.getPath.getName.hashCode) * 31 + st.getLen) * 31 +
          st.getModificationTime
      }
    java.lang.Long.toHexString(h)
  }

  /** Build (once per JVM tmpdir + sfDir + base-data fingerprint),
    * register, and enable the rewrite on this session. Returns the MV
    * path. */
  def ensureLineitemMv(s: SparkSession, dir: String): String = {
    val path = mvPath(dir)
    val success = new java.io.File(path, "_SUCCESS")
    val fpFile = new java.io.File(path, "_graft_base_fingerprint")
    val fp = baseFingerprint(s, dir)
    // rebuild when absent, from an older schema vintage (a stored MV
    // without the per-measure non-null counts would silently refuse
    // avg/count(col) rewrites), or built from DIFFERENT base data
    val stale = success.isFile && {
      val cols = s.read.parquet(path).columns.map(_.toLowerCase).toSet
      !measures.forall(m => cols.contains(s"cnt_$m")) ||
        !fpFile.isFile ||
        new String(java.nio.file.Files.readAllBytes(fpFile.toPath),
          "UTF-8") != fp
    }
    if (!success.isFile || stale) {
      MvCatalog.buildMv(Tables.lineitem(s, dir), keys, measures, path)
      java.nio.file.Files.write(fpFile.toPath, fp.getBytes("UTF-8"))
    }
    MvCatalog.register(s, "lineitem_by_flag_status",
      s"$dir/lineitem.parquet", keys, measures, path)
    MvRewriteApi.enable(s)
    path
  }

  /** Full-key aggregate: answered by the MV rows one-for-one. avg rides
    * sum_x/cnt_x (exact here: integral quantity sums, one division in
    * both engines); count(col) rides the stored non-null count. */
  def mvRewrite(s: SparkSession, dir: String): DataFrame = {
    ensureLineitemMv(s, dir)
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        avg(col("l_quantity")).as("avg_qty"),
        max(col("l_extendedprice")).as("max_price"),
        count(col("l_extendedprice")).as("cnt_price"),
        count(lit(1)).as("cnt_rows"))
  }

  /** Subset-key rollup with a key-column filter: the MV re-aggregates
    * across `l_linestatus` groups after the remapped filter. */
  def mvRewriteRollup(s: SparkSession, dir: String): DataFrame = {
    ensureLineitemMv(s, dir)
    Tables.lineitem(s, dir)
      .filter(col("l_linestatus") === "O")
      .groupBy("l_returnflag")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        min(col("l_extendedprice")).as("min_price"),
        count(lit(1)).as("cnt_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv_rewrite" -> mvRewrite,
    "mv_rewrite_rollup" -> mvRewriteRollup,
  )

  val oracles: Map[String, String] = Map(
    "mv_rewrite" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  SUM(l_quantity) / COUNT(l_quantity) AS avg_qty,
        |  MAX(l_extendedprice) AS max_price,
        |  COUNT(l_extendedprice) AS cnt_price,
        |  COUNT(*) AS cnt_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "mv_rewrite_rollup" ->
      """SELECT l_returnflag,
        |  SUM(l_quantity) AS sum_qty,
        |  MIN(l_extendedprice) AS min_price,
        |  COUNT(*) AS cnt_rows
        |FROM lineitem
        |WHERE l_linestatus = 'O'
        |GROUP BY l_returnflag""".stripMargin,
  )
}
