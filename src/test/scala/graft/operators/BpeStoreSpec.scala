package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.BpeTokenizer.BpeStore

/** Stored (frozen) BPE vocabulary lifecycle. */
class BpeStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def corpusDir(texts: Seq[String]): String = {
    val root = java.nio.file.Files.createTempDirectory("bpe_store").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    root
  }

  test("build-then-load round-trips the merges and the content hash") {
    val dir = corpusDir(Seq("the batch merge the window", "the spark batch",
      "merge the batch window spark"))
    val store = s"${java.nio.file.Files.createTempDirectory("bpe_s")}/v"
    val built = BpeStore.ensure(spark, dir, store)
    val loaded = BpeStore.ensure(spark, dir, store)
    assert(built.merges.nonEmpty && built.merges == loaded.merges)
    val meta = BpeStore.readMeta(store)
    assert(meta.format == BpeStore.FormatTag)
    assert(meta.hash == BpeStore.vocabHash(loaded))
    assert(meta.numMerges == BpeTokenizer.TrainMerges)
  }

  test("the stored vocabulary is FROZEN: corpus drift does not retrain") {
    val dir = corpusDir(Seq("aaa bbb aaa", "aaa ccc"))
    val store = s"${java.nio.file.Files.createTempDirectory("bpe_s")}/v"
    val v1 = BpeStore.ensure(spark, dir, store)
    // regenerate the corpus with entirely different text
    Seq((0L, "zzz yyy xxx"), (1L, "yyy zzz")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val v2 = BpeStore.ensure(spark, dir, store)
    assert(v2.merges == v1.merges,
      "pinned store retrained under corpus drift — tokenizer not frozen")
    // while the fresh-training path DOES see the new corpus
    val retrained = BpeTokenizer.trainFromCorpus(spark, dir)
    assert(retrained.merges != v1.merges)
  }

  test("a foreign format tag is refused, never probed") {
    val store = java.nio.file.Files.createTempDirectory("bpe_bad")
    java.nio.file.Files.write(store.resolve("meta"),
      "someone-elses-format-v9\n1\n2\n3\nabc".getBytes("UTF-8"))
    java.nio.file.Files.write(store.resolve("merges.tsv"),
      "a\tb".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      BpeStore.load(store.toString)
    }
    assert(e.getMessage.contains(BpeStore.FormatTag))
  }
}
