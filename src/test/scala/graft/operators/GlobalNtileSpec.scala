package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[GlobalNtile]] must be VALUE-IDENTICAL to
  * `ntile(n).over(Window.orderBy(...))` — the gate fixtures' file
  * assignment is oracle-pinned (`planned_files` / `total_files`), so
  * the distributed rewrite may not move a single row between buckets. */
class GlobalNtileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def check(n: Int, rows: Int): Unit = {
    // non-monotonic unique key so the range exchange really reorders
    val df = spark.range(rows.toLong)
      .select(($"id" * 7919L % rows).as("k"), $"id".as("tie"))
    val serial = df.withColumn("b",
      ntile(n).over(Window.orderBy($"k", $"tie")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val dist = GlobalNtile.withBucket(df, "b", n, Seq($"k", $"tie"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(dist == serial, s"ntile($n) over $rows rows diverged")
  }

  test("bucket assignment equals the serial window ntile") {
    check(32, 10007) // N % n != 0: first N%n buckets one row wider
    check(8, 4096)   // N % n == 0: equal buckets
    check(7, 3)      // N < n: buckets 1..N, one row each
  }

  test("empty input yields an empty result with the bucket column") {
    val df = spark.range(0).select($"id".as("k"))
    val out = GlobalNtile.withBucket(df, "b", 4, Seq($"k"))
    assert(out.columns.toSeq == Seq("k", "b") && out.count() == 0)
  }

  test("no single-partition window: the plan carries no WindowExec") {
    val df = spark.range(1000L).select(($"id" % 97L).as("k"), $"id".as("t"))
    val out = GlobalNtile.withBucket(df, "b", 16, Seq($"k", $"t"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"distributed ntile must not plan a window:\n$plan")
  }
}
