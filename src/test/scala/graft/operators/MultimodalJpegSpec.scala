package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Lossy-JPEG perceptual dedup ([[Multimodal.ddImageJpeg]]): the gate
  * that exercises the NONZERO-Hamming band-blocking recall path for
  * real. The corpus is engineered so the planted twin's dHash distance
  * is an exact deterministic function of the id DESPITE the lossy
  * codec: blocky 2×2-px cells aligned to the 8×9 downsample grid with
  * ≥50-gray-level margins between adjacent cells (JPEG block error at
  * the gate's quality stays far below half the margin), and the twin
  * inverts exactly k ∈ {1,2} engineered comparisons confined to the
  * LAST cell column (cells that participate in exactly one dHash bit),
  * so hamming == k survives encode→decode exactly. */
class MultimodalJpegSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import Multimodal.{ImageCodec, JpegBlocks}

  test("JPEG roundtrip is genuinely lossy but cell margins survive: " +
      "hamming == engineered flip count, exactly") {
    (0L until 240L).foreach { id =>
      val k = 1 + (id % 2).toInt
      val base = JpegBlocks.image(JpegBlocks.cellVals(id, 0))
      val twin = JpegBlocks.image(JpegBlocks.cellVals(id, k))
      val baseDec = ImageCodec.decode(ImageCodec.encode(base, "png"))
      val jpegBytes = JpegBlocks.encodeJpeg(twin)
      val twinDec = ImageCodec.decode(jpegBytes)
      // lossy for real: the decoded twin differs from its source pixels
      val diffs = (0 until 16).flatMap(y => (0 until 18).map(x =>
        (twin.getRGB(x, y) & 0xFFFFFF) != (twinDec.getRGB(x, y) & 0xFFFFFF)))
        .count(identity)
      assert(diffs > 0, s"id=$id: JPEG roundtrip was lossless")
      val ham = java.lang.Long.bitCount(
        ImageCodec.dHash(baseDec) ^ ImageCodec.dHash(twinDec))
      assert(ham == k, s"id=$id: hamming $ham, engineered $k")
    }
  }

  test("flips confine to last-column cells: the undistorted twin " +
      "differs in exactly the engineered bit positions") {
    (0L until 64L).foreach { id =>
      val k = 1 + (id % 2).toInt
      val hb = ImageCodec.dHash(JpegBlocks.image(JpegBlocks.cellVals(id, 0)))
      val ht = ImageCodec.dHash(JpegBlocks.image(JpegBlocks.cellVals(id, k)))
      val x = hb ^ ht
      assert(java.lang.Long.bitCount(x) == k)
      // every differing bit is a (row, col=7) comparison — bit r*8+7
      (0 until 64).foreach { b =>
        if (((x >> b) & 1L) == 1L)
          assert(b % 8 == 7, s"id=$id: flipped bit $b is not last-column")
      }
    }
  }

  test("gate output matches the planted pair set on sf0.001") {
    val rows = Multimodal.ddImageJpeg(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getBoolean(4))).toSet
    val expected = (0L until 500L).filter(_ % 3 == 0).map(id =>
      (id, id + Multimodal.JpegOffset, "jpeg", 1 + (id % 2).toInt,
        false)).toSet
    assert(rows == expected)
    assert(rows.forall(_._4 > 0), "every planted pair must be nonzero-Hamming")
  }
}
