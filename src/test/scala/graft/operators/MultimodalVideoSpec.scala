package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Perceptual video dedup ([[Multimodal.ddVideoFrames]]): GV1 container
  * roundtrip, frame-hash dispersion (no two frames of the corpus
  * collide — the containment count's soundness), and the exact planted
  * pair set (re-encode = all frames shared, trim = all remaining). */
class MultimodalVideoSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import Multimodal.{ImageCodec, VideoCodec}

  test("GV1 container roundtrips frames byte-exactly; bad magic refused") {
    val frames = (0 until 5).map(f =>
      ImageCodec.encode(VideoCodec.synthFrame(42L, f), "png"))
    // cross-codec hash identity: a PPM base frame and an ImageIO
    // PNG re-encode of the SAME pixels hash equal
    (0 until 5).foreach { f =>
      val rgb = VideoCodec.synthRgb(42L, f)
      val viaPpm = VideoCodec.frameHash(
        Multimodal.PpmCodec.encode(VideoCodec.FrameW, VideoCodec.FrameH, rgb))
      val viaPng = VideoCodec.frameHash(frames(f))
      assert(viaPpm == viaPng, s"frame $f hashes diverge across codecs")
    }
    val payload = VideoCodec.encode(frames)
    val back = VideoCodec.decode(payload)
    assert(back.size == 5)
    frames.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    intercept[IllegalArgumentException] {
      VideoCodec.decode("GA1 3\nxxx".getBytes("US-ASCII"))
    }
  }

  test("frame hashes are dispersion-clean across the corpus: a trimmed " +
      "copy shares exactly its frames, nothing else collides") {
    // every (id, frame) of a 400-video corpus must hash uniquely —
    // a within- or cross-video collision would break the containment
    // count in either direction
    val hashes = for {
      id <- 0L until 400L
      f <- 0 until (3 + (id % 3).toInt)
    } yield ((id, f),
      VideoCodec.dHashRgb(VideoCodec.FrameW, VideoCodec.FrameH,
        VideoCodec.synthRgb(id, f)))
    assert(hashes.map(_._2).distinct.size == hashes.size,
      "frame dHash collision in the corpus")
    // re-encoded frames decode to identical hashes (PNG is lossless)
    val viaPng = ImageCodec.dHash(ImageCodec.decode(
      ImageCodec.encode(VideoCodec.synthFrame(7L, 2), "png")))
    assert(viaPng == VideoCodec.dHashRgb(VideoCodec.FrameW,
      VideoCodec.FrameH, VideoCodec.synthRgb(7L, 2)))
  }

  test("gate output equals the planted pair set on sf0.001") {
    val rows = Multimodal.ddVideoFrames(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3))).toSet
    val expected =
      (0L until 500L).filter(_ % 4 == 0).map(id =>
        (id, id + Multimodal.VideoReencOffset, "reencoded",
          3 + (id % 3).toInt)).toSet ++
      (0L until 500L).filter(_ % 4 == 1).map(id =>
        (id, id + Multimodal.VideoTrimOffset, "trimmed",
          2 + (id % 3).toInt)).toSet
    assert(rows == expected)
  }
}
