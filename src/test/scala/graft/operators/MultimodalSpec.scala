package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Multimodal.{DecodeStub, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ingest produces binary payloads with typed metadata") {
    import spark.implicits._
    val media = Multimodal.ingest(spark, TestSpark.sf0001).collect()
    assert(media.length == 500)
    media.foreach { m =>
      assert(m.payload.nonEmpty)
      assert(m.width >= 64 && m.height >= 48 && m.n_frames >= 1)
      assert(m.mime == "image/png" || m.mime == "image/jpeg")
    }
  }

  test("decode stub: brightness = mean of first 8 payload bytes") {
    val rec = MediaRecord(1L, "abcdefghij".getBytes("UTF-8"), "image/png", 64, 48, 3)
    val f = DecodeStub.decodeBatch(Seq(rec)).head
    val expected = "abcdefgh".getBytes("UTF-8").map(_ & 0xFF).sum / 8.0
    assert(f.brightness == expected)
    assert(f.byte_len == 10)
  }

  test("decodeFeatures runs partition-parallel and preserves all rows") {
    import spark.implicits._
    val media = Multimodal.ingest(spark, TestSpark.sf0001).repartition(4)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.count() == 500)
    assert(feats.filter(f => f.brightness <= 0).count() == 0)
  }

  test("ppm codec round-trips and rejects corrupt headers") {
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 11 % 256).toByte)
    val payload = Multimodal.PpmCodec.encode(2, 3, rgb)
    val (w, h, back) = Multimodal.PpmCodec.decode(payload)
    assert(w == 2 && h == 3 && back.sameElements(rgb))
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode("JFIF-nope".getBytes("US-ASCII"))
    }
  }

  test("ppm decode recovers dimensions from the payload header, not metadata") {
    val out = Multimodal.mmDecodePpm(spark, graft.TestSpark.sf0001)
      .orderBy("doc_id").limit(5).collect()
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("width") == 2 + (id % 7).toInt)
      assert(r.getAs[Int]("height") == 2 + (id % 5).toInt)
      assert(r.getAs[Double]("brightness") > 0.0)
    }
  }

  test("frame sampling emits every k-th frame") {
    import spark.implicits._
    val frames = Multimodal.mmFrameSample(spark, TestSpark.sf0001)
    val byDoc = frames.groupBy("doc_id").count()
    // every media row emits ceil(n_frames / stride) frames
    val joined = Multimodal.ingest(spark, TestSpark.sf0001).toDF()
      .select($"doc_id", $"n_frames").join(byDoc, "doc_id")
    joined.collect().foreach { r =>
      val expect = (r.getAs[Int]("n_frames") + Multimodal.FrameStride - 1) /
        Multimodal.FrameStride
      assert(r.getAs[Long]("count") == expect)
    }
  }
}
