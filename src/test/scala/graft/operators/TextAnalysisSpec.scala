package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokens splits on whitespace and drops empties") {
    val out = Seq("the  Fast \t fox", "", "one").toDF("text")
      .select(TextAnalysis.tokens($"text").as("t"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("the", "fast", "fox"))
    assert(out(1) == Seq())
    assert(out(2) == Seq("one"))
  }

  test("langid picks argmax marker count with fixed tie priority") {
    val df = TextAnalysis.taLangId(spark, TestSpark.sf0001)
    assert(df.count() == 500)
    // no markers at all → tie on 0 everywhere → priority order says "en"
    val row = df.filter($"c_en" === 0 && $"c_de" === 0 && $"c_fr" === 0 && $"c_es" === 0)
    row.collect().foreach(r => assert(r.getAs[String]("pred_lang") == "en"))
  }

  test("ngram-profile langid scores bigram-typical text toward its language") {
    import spark.implicits._
    val docs = Seq(
      (1L, "??", "the weather there then and the other"), // th/he/er heavy
      (2L, "??", "ich suche durch manche bücher nach sprache"), // ch/en heavy
      (3L, "??", "le quai le quart quelque le")) // le/qu heavy
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdNgram(docs)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("pred_lang") == "en")
    assert(out(1).getAs[String]("pred_lang") == "de")
    assert(out(2).getAs[String]("pred_lang") == "fr")
    // deterministic: scores identical across evaluations
    val again = TextAnalysis.langIdNgram(docs).orderBy("doc_id").collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("quality metrics are consistent on a known doc") {
    val df = Seq((1L, "the cat and the hat")).toDF("doc_id", "text")
    val r = df.select(
      size(TextAnalysis.tokens($"text")).as("n"),
      length($"text").as("c")).head()
    assert(r.getInt(0) == 5 && r.getInt(1) == 19)
    val q = TextAnalysis.taQuality(spark, TestSpark.sf0001)
    val bad = q.filter($"stopword_ratio" < 0 || $"stopword_ratio" > 1 ||
      $"quality_score" < 0 || $"quality_score" > 1).count()
    assert(bad == 0)
  }

  test("fingerprint is whitespace/case insensitive") {
    val fps = Seq((1L, "Hello  World"), (2L, "hello world "), (3L, "other"))
      .toDF("doc_id", "text")
      .select(md5(TextAnalysis.normalized($"text")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }
}
