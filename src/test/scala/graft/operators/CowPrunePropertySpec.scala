package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized soundness sweep for the stats rewriters: on a table of
  * seeded-random data (nulls included, duplicate values, string and
  * numeric columns, skewed file layout), EVERY predicate drawn from the
  * supported grammar must satisfy
  *
  *   readWhere == read.filter          (keep predicate never over-prunes)
  *   countWhere == read.filter.count   (full predicate never over-claims)
  *
  * The two rewrites fail in opposite directions — keep must err towards
  * TRUE, full towards FALSE — so a single sign error in either min/max
  * bound or null guard flips a result here. Deterministic seed: a
  * failure reproduces. */
class CowPrunePropertySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(20260814L)

  private def fixture(): (String, Seq[(Long, java.lang.Long, String)]) = {
    val rows = (0L until 120L).map { i =>
      val a = rnd.nextInt(40).toLong // duplicates guaranteed
      val b: java.lang.Long =
        if (rnd.nextInt(5) == 0) null else Long.box(rnd.nextInt(20).toLong)
      val s = if (rnd.nextInt(7) == 0) null else s"w${rnd.nextInt(15)}"
      (a, b, s)
    }
    // skewed layout loosely clustered by a: files get uneven ranges
    val df = rows.zipWithIndex.map { case ((a, b, s), i) =>
      (i.toLong, a, b, s, (a / 8 + 1).toInt)
    }.toDF("id", "a", "b", "s", "__f")
    val t = s"${System.getProperty("java.io.tmpdir")}/graft_cow_prop/" +
      java.util.UUID.randomUUID().toString.take(8)
    CowTable.initFiled(df, t, "__f", 5)
    (t, rows)
  }

  /** Random predicate from the supported grammar (plus the occasional
    * opaque one, which must fall back to full scans, still correct). */
  private def randPred(depth: Int): Column = {
    def leaf(): Column = rnd.nextInt(12) match {
      case 0 => col("a") === rnd.nextInt(45).toLong
      case 1 => col("a") >= rnd.nextInt(45).toLong
      case 2 => col("a") < rnd.nextInt(45).toLong
      case 3 => col("b") === rnd.nextInt(22).toLong
      case 4 => col("b") <= rnd.nextInt(22).toLong
      case 5 => col("b").isNull
      case 6 => col("b").isNotNull
      case 7 => col("s") === s"w${rnd.nextInt(17)}"
      case 8 => col("s").isin(s"w${rnd.nextInt(17)}", s"w${rnd.nextInt(17)}")
      case 9 => col("s") =!= s"w${rnd.nextInt(17)}"
      case 10 => lit(rnd.nextInt(45).toLong) <= col("a")
      case 11 => pmod(col("a"), lit(3)) === rnd.nextInt(3) // opaque
    }
    if (depth <= 0) leaf()
    else rnd.nextInt(3) match {
      case 0 => leaf()
      case 1 => randPred(depth - 1) && randPred(depth - 1)
      case 2 => randPred(depth - 1) || randPred(depth - 1)
    }
  }

  test("80 random grammar predicates: keep never over-prunes, full never over-claims") {
    val (t, _) = fixture()
    // one DV pass so metadata counts must subtract deletes
    CowTable.deleteWhere(spark, t, pmod($"id", lit(13)) === 5)
    val base = CowTable.read(spark, t)
    var metaAnswered = 0
    var pruned = 0
    for (i <- 0 until 80) {
      val p = randPred(depth = 2)
      val want = base.filter(p).collect().map(_.toString).sorted.toSeq
      val got = CowTable.readWhere(spark, t, p)
        .collect().map(_.toString).sorted.toSeq
      assert(got == want, s"predicate #$i over-pruned: $p")
      val cb = CowTable.countWhereDetailed(spark, t, p)
      assert(cb.total == want.size,
        s"predicate #$i count ${cb.total} != ${want.size}: $p ($cb)")
      if (cb.fullFiles > 0) metaAnswered += 1
      if (cb.prunedFiles > 0) pruned += 1
    }
    // the sweep must actually exercise both machineries, not no-op
    assert(pruned > 10, s"pruning never fired ($pruned)")
    assert(metaAnswered > 5, s"metadata counting never fired ($metaAnswered)")
  }
}
