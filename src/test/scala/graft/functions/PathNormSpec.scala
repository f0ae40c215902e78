package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[PathNorm]] must agree byte-for-byte with the regex-chain SQL form
  * it replaced (the CoW path-identity convention) on every input shape
  * the lakehouse produces. */
class PathNormSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val inputs = Seq(
    "/tmp/t/v3-ab/part-0.parquet",
    "file:/tmp/t/v3-ab/part-0.parquet",
    "file:///tmp/t/v3-ab/part-0.parquet",
    "file:/tmp/a%20b/part-0.parquet",          // encoded space
    "/tmp/a b/part-0.parquet",                 // raw space
    "file:/tmp/x+y/part-0.parquet",            // literal + preserved
    "/tmp//double//slash/part.parquet",
    "file:/tmp/__p_region=r2/part-1-3.parquet",
    "file:/tmp/%C3%A9t%C3%A9/part.parquet",    // UTF-8 multibyte
    "/tmp/mid/file:colon/part.parquet")        // scheme-like mid-path

  test("agrees with the regex-chain normalization on every shape") {
    val df = inputs.toDF("p")
    val regex = df.select(regexp_replace(url_decode(regexp_replace(
      regexp_replace($"p", "^file:", ""), "\\+", "%2B")), "/+", "/"))
      .as[String].collect().toSeq
    val fast = df.select(
      org.apache.spark.sql.graftbridge.ColumnBridge.column(
        PathNorm(org.apache.spark.sql.graftbridge.ColumnBridge
          .expression($"p"))))
      .as[String].collect().toSeq
    assert(fast == regex)
    // scheme-like text mid-path survives (only a PREFIX strips)
    assert(fast.last == "/tmp/mid/file:colon/part.parquet")
  }

  test("memo is safe under reused input buffers and changing values") {
    val memo = new PathNormMemo
    // simulate a reused buffer: same UTF8String object, bytes swapped
    val buf = new Array[Byte](64)
    def load(s: String): UTF8String = {
      val b = s.getBytes("UTF-8")
      System.arraycopy(b, 0, buf, 0, b.length)
      UTF8String.fromBytes(buf, 0, b.length)
    }
    val a = memo(load("file:/tmp/a/p.parquet")).toString
    assert(a == "/tmp/a/p.parquet")
    // same backing array, different content — the memo must MISS
    val b = memo(load("file:/tmp/b/p.parquet")).toString
    assert(b == "/tmp/b/p.parquet")
    // repeat hits return the cached result
    assert(memo(load("file:/tmp/b/p.parquet")).toString == b)
  }
}
