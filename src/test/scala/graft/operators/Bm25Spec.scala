package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class Bm25Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // Hand-checkable corpus: 3 docs, terms "a" (everywhere), "b" (one doc).
  private val docs = Seq(
    (1L, "a a b c"),   // dl=4, tf_a=2, tf_b=1
    (2L, "a c c c"),   // dl=4, tf_a=1
    (3L, "c c"),       // dl=2
  ).toDF("doc_id", "text")

  private def ref(tf: Double, dl: Double, df: Double, n: Double,
      avgdl: Double, k1: Double = 1.2, b: Double = 0.75): Double = {
    if (tf == 0) 0.0
    else math.log((n - df + 0.5) / (df + 0.5) + 1) *
      (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
  }

  test("scores match the closed-form BM25 formula") {
    val got = TextAnalysis.bm25(docs, Seq("a", "b"), topK = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val n = 3.0; val avgdl = 10.0 / 3.0
    val want = Map(
      1L -> (ref(2, 4, 2, n, avgdl) + ref(1, 4, 1, n, avgdl)),
      2L -> (ref(1, 4, 2, n, avgdl) + 0.0),
      3L -> 0.0)
    for ((id, (_, s)) <- got)
      assert(math.abs(s - want(id)) < 1e-6, s"doc $id: $s vs ${want(id)}")
    // doc 1 matches both terms and more often -> must rank first; doc 3
    // matches nothing -> last
    assert(got(1L)._1 == 1 && got(3L)._1 == 3)
  }

  test("per-term contributions add in fixed order and absent terms contribute 0") {
    // querying a term absent from the corpus must not perturb scores
    val base = TextAnalysis.bm25(docs, Seq("a"), topK = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val withGhost = TextAnalysis.bm25(docs, Seq("a", "zzz"), topK = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(base == withGhost)
  }

  test("plan: one exchange for the per-doc aggregate, stats ride a broadcast") {
    val df = TextAnalysis.bm25(docs, Seq("a", "b"), topK = 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"stats should broadcast:\n$plan")
    // global top-k must be TakeOrderedAndProject, not a full sort
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("duplicate query terms are refused") {
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25(docs, Seq("a", "A"))
    }
    assert(e.getMessage.contains("distinct"))
  }
}
