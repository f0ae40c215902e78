package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental loop for lakehouse tables, closed end to end:
  * [[CowTable.tableChanges]] (the version-to-version change data feed)
  * feeds [[Changelog.aggMaintain]] (DBSP-style retract-add), so a
  * downstream aggregate follows the table version-by-version touching
  * only deltas — the table is never re-scanned, and the maintained MV
  * is bit-equal to a rebuild at every step. */
class CowCdfMaintainSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def bandAgg(df: DataFrame): DataFrame =
    df.groupBy((col("id") % 7).as("band"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("v").cast("decimal(12,2)")).as("sum_v"))

  private def mvRows(df: DataFrame): Set[(Long, Long, BigDecimal)] =
    df.select(col("band"), col("n_keys"),
      col("sum_v").cast("decimal(12,2)"))
      .as[(Long, Long, java.math.BigDecimal)].collect()
      .map { case (b, n, s) => (b, n, BigDecimal(s)) }.toSet

  test("CDF-maintained MV equals rebuild across merge and delete cycles") {
    val t = Files.createTempDirectory("graft_cdf").resolve("t").toString
    def df(rows: Seq[(Long, Double)]) = rows.toDF("id", "v")
    CowTable.init(df((0L until 60L).map(i => (i, i * 0.5))).repartition(3), t)
    var ver = 0
    var mv = bandAgg(CowTable.read(spark, t))
    val schema0 = mv.schema.map(f => (f.name, f.dataType))
    val cycles: Seq[() => Unit] = Seq(
      // update + two inserts
      () => CowTable.mergeInto(spark, t,
        df(Seq((3L, 100.0), (70L, 7.0), (71L, 1.25))), Seq("id")),
      // merge-on-read delete (ids ≡ 4 mod 9)
      () => CowTable.deleteWhere(spark, t, pmod($"id", lit(9)) === 4),
      // re-insert of a deleted key + update + insert
      () => CowTable.mergeInto(spark, t,
        df(Seq((70L, 70.5), (4L, 44.0), (90L, 9.0))), Seq("id")),
    )
    cycles.foreach { step =>
      step()
      val cur = CowTable.latestManifest(t).get.version
      // changelog slice from the CDF: post-images and inserts upsert,
      // deletes tombstone; pre-images are bookkeeping, not state
      val slice = CowTable.tableChanges(spark, t, ver, cur, Seq("id"))
        .filter($"_change_type" =!= "update_preimage")
        .withColumn("__ver", lit(cur))
      val snapshot = CowTable.readVersion(spark, t, ver)
        .withColumn("__ver", lit(ver))
        .withColumn("_change_type", lit("na"))
      mv = Changelog.aggMaintain(mv, snapshot, slice, Seq("id"),
        Seq(col("__ver")), col("_change_type") === "delete",
        Seq("v"), bandAgg, Seq("band"), "n_keys")
      assert(mv.schema.map(f => (f.name, f.dataType)) == schema0,
        "MV schema drifted across maintenance cycles")
      assert(mvRows(mv) == mvRows(bandAgg(CowTable.read(spark, t))),
        s"maintained != rebuilt after version $cur")
      ver = cur
    }
  }
}
