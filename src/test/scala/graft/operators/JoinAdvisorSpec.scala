package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JoinAdvisorSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def df(keys: Seq[Long]) = keys.toDF("k")

  private def decide(l: Seq[Long], r: Seq[Long],
      cap: Long = 5L, par: Int = 4): (String, Long, Long) = {
    val row = Scale.adviseJoin(df(l), col("k"), df(r), col("k"), cap, par)
      .select("decision", "salts_left", "salts_right").head()
    (row.getString(0), row.getLong(1), row.getLong(2))
  }

  private val big = (0L until 8L) // 8 uniform keys, above cap 5
  private val hot = Seq(1L, 1L, 1L, 1L, 1L, 1L, 2L, 3L) // 6/8 on one key

  test("small right side wins broadcast_right before anything else") {
    assert(decide(big, Seq(1L, 2L))._1 == "broadcast_right")
    // even a skewed left does not override the broadcast short-circuit
    assert(decide(hot, Seq(1L, 2L))._1 == "broadcast_right")
  }

  test("small left side wins broadcast_left when right is big") {
    assert(decide(Seq(1L, 2L), big)._1 == "broadcast_left")
  }

  test("hot key above the cap on either side recommends salted_shuffle with sized salts") {
    val (d1, sl, _) = decide(hot, big)
    assert(d1 == "salted_shuffle")
    // ceil(6 * 4 / 8) = 3 salts for the hot side
    assert(sl == 3L)
    val (d2, _, sr) = decide(big, hot)
    assert(d2 == "salted_shuffle" && sr == 3L)
  }

  test("big uniform sides recommend a plain shuffle") {
    val (d, sl, sr) = decide(big, big)
    assert(d == "shuffle" && sl == 1L && sr == 1L)
  }
}
