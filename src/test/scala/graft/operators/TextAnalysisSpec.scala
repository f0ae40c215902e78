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

  test("repetition metrics: repeated phrases raise dup_trigram_frac") {
    val docs = Seq(
      (1L, "a b c d e f g h"),                       // no repetition
      (2L, "spam spam spam spam spam spam spam"),    // one token repeated
      (3L, "buy now buy now buy now buy now"),       // repeated phrase
      (4L, "xy"),                                    // short-doc edge
      (5L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.taRepetition(spark, TestSpark.sf0001)
    // gate-corpus sanity: ratios in range
    val bad = out.filter($"distinct_token_ratio" < 0 || $"distinct_token_ratio" > 1 ||
      $"dup_trigram_frac" < 0 || $"dup_trigram_frac" > 1).count()
    assert(bad == 0)
    // behavioral pins on planted docs (run the same projection inline)
    val toks = TextAnalysis.tokens($"text")
    val nTok = size(toks).cast("long")
    val planted = docs.select($"doc_id",
      (size(array_distinct(toks)).cast("double") / greatest(nTok, lit(1L)))
        .as("dtr"),
      (lit(1.0) - size(Dedup.shingles($"text")).cast("double") /
        greatest(nTok - 2, lit(1L))).as("dup"))
      .collect().map(row => row.getLong(0) ->
        ((row.getDouble(1), row.getDouble(2)))).toMap
    assert(planted(1L) == ((1.0, 0.0)))                 // all distinct
    assert(planted(2L)._1 < 0.2 && planted(2L)._2 > 0.7) // token spam
    assert(planted(3L)._1 < 0.4 && planted(3L)._2 > 0.5) // phrase spam
    assert(planted(4L) == ((1.0, 0.0)))                 // short doc
    assert(planted(5L)._2 == 0.0)                       // empty doc
  }

  test("chunking: overlapping token windows with full coverage") {
    val out = TextAnalysis.taChunks(spark, TestSpark.sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.values.foreach { chunks =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      // chunk ids are dense from 0
      assert(sorted.map(_.getAs[Long]("chunk_id")).toSeq ==
        (0L until sorted.length.toLong))
      // every chunk bounded by ChunkSize; all but possibly the last are
      // full or end-clamped
      sorted.foreach(c =>
        assert(c.getAs[Long]("chunk_tokens") <= TextAnalysis.ChunkSize))
    }
    // reconstruction: stride-aligned prefix of each chunk re-concatenates
    // to the tokenized doc (coverage without gaps)
    val doc = graft.Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
      .collect().map(r => r.getAs[Long](0) -> r.getSeq[String](1)).toMap
    byDoc.foreach { case (id, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_id"))
      val rebuilt = sorted.zipWithIndex.flatMap { case (c, i) =>
        val toks = c.getAs[String]("chunk_text").split(" ").filter(_.nonEmpty)
        if (i == sorted.length - 1) toks
        else toks.take(TextAnalysis.ChunkStride)
      }.toSeq
      assert(rebuilt == doc(id), s"doc $id chunk coverage broken")
    }
  }

  test("pii scrub redacts emails, phones, and long ids; counts them") {
    val docs = Seq(
      (1L, "contact jane.doe+x@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "account 123456789012 paid"),
      (3L, "clean text with no pii")).toDF("doc_id", "text")
    val out = docs.select($"doc_id",
        TextAnalysis.scrubbed($"text").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact <EMAIL> or call <PHONE> now", out(1L))
    assert(out(2L) == "account <ID> paid")
    assert(out(3L) == "clean text with no pii")
    // counts on the gate corpus stay consistent with the scrub
    val gate = TextAnalysis.taPiiScrub(spark, TestSpark.sf0001)
    val bad = gate.filter(
      ($"n_emails" > 0 && !$"scrubbed".contains("<EMAIL>")) ||
      ($"n_phones" > 0 && !$"scrubbed".contains("<PHONE>"))).count()
    assert(bad == 0)
  }

  test("over-capacity heavy-hitters gate: MG envelope holds on real corpus") {
    // k=8 < 31-token vocabulary → the sketch must actually approximate,
    // and both Misra–Gries envelope booleans must still come out true
    val row = TextAnalysis.taHeavyHittersApprox(spark, TestSpark.sf0001).head()
    assert(row.getAs[Long]("n_vocab") == 31L, "premise: vocab over k=8")
    assert(row.getAs[Long]("n_total") > 0L)
    assert(row.getAs[Boolean]("all_frequent_retained"))
    assert(row.getAs[Boolean]("est_within_bound"))
  }

  test("token commonness: planted rare-token doc scores below common-token doc") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("commonness").toString
    // "common common" appears in both docs 1,2 → count 4 each token slot;
    // doc 3 is all singletons
    Seq((1L, "common common"), (2L, "common common"), (3L, "rare1 rare2"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.taCommonness(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows(1L) == ((2L, 4.0)))   // 'common' occurs 4x globally
    assert(rows(2L) == ((2L, 4.0)))
    assert(rows(3L) == ((2L, 1.0)))   // singletons
  }

  test("ta_cms_freq gate: both CMS guarantees hold on the gate corpus") {
    val rows = TextAnalysis.taCmsFreq(spark, graft.TestSpark.sf0001).collect()
    assert(rows.length == 31) // the corpus vocabulary
    assert(rows.forall(_.getAs[Boolean]("never_undercounts")))
    assert(rows.forall(_.getAs[Boolean]("within_markov_bound")))
  }

  test("filter funnel: attribution sums to total drops, funnel is monotone") {
    val rows = TextAnalysis.taFilterFunnel(spark, graft.TestSpark.sf001)
      .orderBy("stage").collect()
    assert(rows.length == 5)
    val nDocs = graft.Tables.documents(spark, graft.TestSpark.sf001).count()
    val firstFails = rows.map(_.getAs[Long]("n_first_fail")).sum
    val survivors = rows.map(_.getAs[Long]("survivors"))
    // first-failing-filter attribution partitions the dropped docs
    assert(firstFails + survivors.last == nDocs)
    // the funnel only narrows, and stage i drops exactly n_first_fail(i+1)
    survivors.toSeq.sliding(2).zip(rows.drop(1).iterator).foreach {
      case (Seq(prev, next), r) =>
        assert(prev - next == r.getAs[Long]("n_first_fail"))
      case _ => fail("unexpected window shape")
    }
    // every rule does something in isolation on the gate corpus
    assert(rows.forall(_.getAs[Long]("n_fail") > 0))
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
