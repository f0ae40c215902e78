package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE training (deterministic reference algorithm) and the native
  * encode expression. */
class BpeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("training merges the most frequent pair, ties lexicographic") {
    // "ab"×3, "abc"×1 → pairs: (a,b)=4, (b,</w>)=3, (b,c)=1, (c,</w>)=1
    val m = Bpe.train(Seq(("ab", 3L), ("abc", 1L)), numMerges = 2)
    assert(m == Vector(("a", "b"), ("ab", Bpe.EndMark)))
    val v = BpeVocab(m)
    assert(v.encodeWord("ab").toSeq == Seq("ab</w>"))
    assert(v.encodeWord("abc").toSeq == Seq("ab", "c", Bpe.EndMark))
    // unseen characters segment to chars + marker
    assert(v.encodeWord("xy").toSeq == Seq("x", "y", Bpe.EndMark))
  }

  test("the Sennrich running example orders es → est → lo") {
    // low×5 lower×2 newest×6 widest×3 (chars + terminal marker):
    // es=9, st=9, t</w>=9 … es wins lexicographically at count 9? No:
    // pairs at 9: (e,s), (s,t), (t,</w>) → (e,s) first; then (es,t)=9
    // beats (t,</w>)… after es: (es,t)=9, (t,</w>)=9 → (es,t) first.
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val m = Bpe.train(words, numMerges = 3)
    assert(m.take(2) == Vector(("e", "s"), ("es", "t")))
    // third merge: (est,</w>)=9 vs (l,o)=7 → est</w>
    assert(m(2) == ("est", Bpe.EndMark))
  }

  test("training is deterministic and min-rank encode replays rank order") {
    val words = Seq(("spark", 4L), ("sparse", 3L), ("park", 5L),
      ("spar", 2L), ("s", 9L))
    val m1 = Bpe.train(words, 10)
    val m2 = Bpe.train(words, 10)
    assert(m1 == m2)
    val v = BpeVocab(m1)
    // sequential exhaustive replay in rank order must equal the
    // min-rank iterative encoder (the REPLACE-chain oracle's contract)
    def sequential(w: String): Seq[String] = {
      var syms: Array[String] = (w.map(_.toString) :+ Bpe.EndMark).toArray
      for ((a, b) <- m1) syms = Bpe.mergePass(syms, a, b)
      syms.toSeq
    }
    for (w <- Seq("spark", "park", "sparse", "spars", "zq", "parks"))
      assert(v.encodeWord(w).toSeq == sequential(w), s"divergence on $w")
  }

  test("overlapping pairs merge left-to-right, one pass per rank") {
    val v = BpeVocab(Vector(("a", "a")))
    assert(v.encodeWord("aaa").toSeq == Seq("aa", "a", Bpe.EndMark))
    assert(v.encodeWord("aaaa").toSeq == Seq("aa", "aa", Bpe.EndMark))
  }

  test("the expression matches the kernel and round-trips the corpus") {
    val docs = Seq("the window batch merge", "spark scan the the table",
      "  spaced   out  words ").toDF("text")
    val vocab = BpeVocab(Bpe.train(
      Seq(("the", 5L), ("batch", 3L), ("spark", 2L)), 8))
    val got = docs.select(
      BpeFunctions.bpe_tokens(col("text"), vocab).as("t"))
      .collect().map(_.getSeq[String](0))
    val want = docs.collect().map(r => vocab.encode(r.getString(0)).toSeq)
    assert(got.map(_.toSeq).toSeq == want.toSeq)
    // lossless decode: markers back to spaces reproduce the word stream
    for ((toks, text) <- got.zip(docs.collect().map(_.getString(0)))) {
      val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      assert(toks.mkString("").replace(Bpe.EndMark, " ").trim ==
        words.mkString(" "))
    }
  }
}
