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

  test("patchify: grid positions, byte content, and ragged-edge crop on a handcrafted image") {
    import spark.implicits._
    // 5x3 image -> 2x1 grid of 2x2 patches; col 4 and row 2 cropped
    val w = 5; val h = 3
    val rgb = Array.tabulate(w * h * 3)(i => i.toByte)
    val rec = Multimodal.PpmRecord(7L,
      Multimodal.PpmCodec.encode(w, h, rgb))
    val got = Multimodal.patchifyPpm(Seq(rec).toDS(), patch = 2)
      .collect().sortBy(p => (p.patch_row, p.patch_col))
    assert(got.map(p => (p.patch_row, p.patch_col)).toSeq ==
      Seq((0, 0), (0, 1)))
    // patch (0,1) covers x in {2,3}, y in {0,1}: rows of 6 contiguous
    // bytes starting at (y*5+2)*3
    val expectBytes = (0 until 2).flatMap(y =>
      (0 until 6).map(k => rgb((y * w + 2) * 3 + k))).toArray
    assert(java.util.Arrays.equals(got(1).patch, expectBytes))
    val expectMean = expectBytes.map(_ & 0xFF).sum.toDouble / 12
    assert(got(1).patch_mean == expectMean)
    // patch bytes tile the cropped region exactly: every byte of the
    // kept 4x2 area appears in exactly one patch
    val covered = got.flatMap(_.patch.map(_.toInt)).sorted.toSeq
    val keptArea = (for (y <- 0 until 2; x <- 0 until 4; c <- 0 until 3)
      yield rgb((y * w + x) * 3 + c).toInt).sorted
    assert(covered == keptArea)
  }

  test("audio windows: framing arithmetic and energy from a handcrafted payload") {
    import spark.implicits._
    // 300 samples of constant value 65 ('A'): windows at hop 128 ->
    // starts 0 and... (300-256)/128 = 0, so exactly ONE window; energy 65
    val oneWin = Seq((1L, Array.fill(300)('A'.toByte), 16000, 300))
      .toDF("doc_id", "payload", "sample_rate", "n_samples")
      .as[Multimodal.AudioRecord]
    val w1 = Multimodal.audioWindows(oneWin).collect()
    assert(w1.toSeq == Seq(
      Multimodal.AudioWindow(1L, 0, 0, 256, 65.0)))
    // 512 samples: starts 0, 128, 256 -> three windows; too-short
    // payload (100 < win) -> zero windows, no partial tail
    val multi = Seq(
      (2L, Array.fill(512)('B'.toByte), 16000, 512),
      (3L, Array.fill(100)('C'.toByte), 16000, 100))
      .toDF("doc_id", "payload", "sample_rate", "n_samples")
      .as[Multimodal.AudioRecord]
    val w2 = Multimodal.audioWindows(multi).collect()
    assert(w2.count(_.doc_id == 2L) == 3)
    assert(w2.count(_.doc_id == 3L) == 0)
    assert(w2.filter(_.doc_id == 2L).map(_.start_sample).sorted.toSeq ==
      Seq(0, 128, 256))
  }

  test("ImageIO PNG roundtrip is pixel-exact; dHash invariants hold") {
    import Multimodal.ImageCodec
    val img = ImageCodec.synthesize(42L, 0)
    val back = ImageCodec.decode(ImageCodec.encode(img, "png"))
    assert(back.getWidth == img.getWidth && back.getHeight == img.getHeight)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((back.getRGB(x, y) & 0xFFFFFF) == (img.getRGB(x, y) & 0xFFFFFF),
        s"PNG roundtrip changed pixel ($x,$y)")
    // BMP re-encode of the SAME pixels: identical dHash, different bytes
    val bmpBytes = ImageCodec.encode(img, "bmp")
    val pngBytes = ImageCodec.encode(img, "png")
    assert(!java.util.Arrays.equals(bmpBytes, pngBytes))
    assert(ImageCodec.dHash(ImageCodec.decode(bmpBytes)) ==
      ImageCodec.dHash(img))
    // uniform brightness shift: provably hash-invariant (both mixers)
    (0L until 50L).foreach { id =>
      assert(ImageCodec.dHash(ImageCodec.synthesize(id, 1)) ==
        ImageCodec.dHash(ImageCodec.synthesize(id, 0)),
        s"brightness shift changed dHash for id $id")
      assert(ImageCodec.dHash(
          ImageCodec.synthesize(id, 1, ImageCodec.strongPixel)) ==
        ImageCodec.dHash(
          ImageCodec.synthesize(id, 0, ImageCodec.strongPixel)),
        s"brightness shift changed strong-mixer dHash for id $id")
    }
    // the CORPUS mixer disperses: every image hashes apart
    val hashes = (0L until 200L).map(id => ImageCodec.dHash(
      ImageCodec.synthesize(id, 0, ImageCodec.strongPixel)))
    assert(hashes.distinct.size == 200,
      s"dHash collapse: only ${hashes.distinct.size} distinct of 200")
    // and no unrelated pair lands within the gate's Hamming threshold
    val close = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.size
      if java.lang.Long.bitCount(hashes(i) ^ hashes(j)) <=
        Multimodal.PhashMaxHamming
    } yield (i, j))
    assert(close.isEmpty, s"unrelated near-collisions: $close")
  }

  test("mega buckets pair adjacent-by-hash: exact dups survive, no quadratic blowup") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 300 // one constant-image population >> threshold (64)
    // 150 identical-hash images (ids 0..149), plus 150 distinct fillers
    // sharing NO bands with them; two exact-dup pairs planted INSIDE
    // the mega population via identical payload_fp being irrelevant —
    // identical dhash IS the dup signal here
    val rows =
      (0 until 150).map(i => (i.toLong, 0x1234567890ABCDEFL, i.toLong)) ++
      (150 until n).map(i =>
        (i.toLong, Multimodal.ImageCodec.strongMix(i.toLong), i.toLong))
    val hashed = rows.toDF("img_id", "dhash", "payload_fp")
    val pairs = Multimodal.phashPairs(hashed).collect()
    // every adjacent identical-hash pair found (149 consecutive pairs),
    // no all-pairs explosion (would be 150*149/2 = 11175)
    val megaPairs = pairs.filter(r => r.getLong(0) < 150 && r.getLong(1) < 150)
    assert(megaPairs.forall(_.getInt(2) == 0))
    assert(megaPairs.length == 149,
      s"adjacency regime produced ${megaPairs.length} pairs (want 149: " +
        "the identical-hash chain, not the 11175 all-pairs square)")
    // fillers (distinct strong hashes) contribute no pairs
    assert(pairs.count(r => r.getLong(1) >= 150) == 0)
    // corpus-adaptive threshold: this corpus has ONE outlier bucket
    // among singletons, so the default p99 stays at the floor (the
    // guard engages — correct) while q=1.0 lifts to the max bucket
    // size and the same corpus pairs exhaustively — 150*149/2
    // identical-hash pairs
    assert(Multimodal.observedPhashThreshold(hashed) == 64)
    val obs = Multimodal.observedPhashThreshold(hashed, q = 1.0)
    assert(obs >= 150 && obs <= 1024, s"observed threshold $obs")
    val exhaustive = Multimodal.phashPairs(hashed, Some(obs)).count()
    assert(exhaustive == 150L * 149L / 2L,
      s"adaptive threshold should restore exhaustive pairing: $exhaustive")
    // empty corpus: the percentile aggregate returns NULL — the
    // threshold must fall back to the floor, never NPE
    val empty = Seq.empty[(Long, Long, Long)]
      .toDF("img_id", "dhash", "payload_fp")
    assert(Multimodal.observedPhashThreshold(empty) ==
      Multimodal.PhashMegaBucketThreshold)
  }

  test("audio container roundtrip; energy hash invariants hold") {
    import Multimodal.AudioCodec
    val samples = AudioCodec.synthesize(42L, 0)
    // container roundtrip: pad changes the bytes, never the samples
    val a = AudioCodec.encode(samples, 7)
    val b = AudioCodec.encode(samples, 23)
    assert(!java.util.Arrays.equals(a, b))
    assert(java.util.Arrays.equals(AudioCodec.decode(a), samples))
    assert(java.util.Arrays.equals(AudioCodec.decode(b), samples))
    intercept[IllegalArgumentException] {
      AudioCodec.decode("WAV0junk".getBytes("US-ASCII"))
    }
    // DC-offset invariance is exact (equal-width windows)
    (0L until 30L).foreach { id =>
      assert(AudioCodec.eHash(AudioCodec.synthesize(id, 1)) ==
        AudioCodec.eHash(AudioCodec.synthesize(id, 0)),
        s"DC offset changed eHash for id $id")
    }
    // dispersion across clips
    val hs = (0L until 200L).map(id =>
      AudioCodec.eHash(AudioCodec.synthesize(id, 0)))
    assert(hs.distinct.size == 200)
  }

  test("WAV codec: RIFF roundtrip is sample-exact, cross-codec hash " +
      "identity holds, and dd_audio_wav finds exactly the planted twins") {
    import Multimodal.AudioCodec
    val samples = AudioCodec.synthesize(42L, 0)
    val wav = AudioCodec.encodeWav(samples)
    // a REAL RIFF container, not one shared byte with the GA1 encoding
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    assert(java.util.Arrays.equals(AudioCodec.decodeWav(wav), samples))
    // the sniffing decoder routes both containers to the same samples
    assert(java.util.Arrays.equals(AudioCodec.decodeAuto(wav), samples))
    assert(java.util.Arrays.equals(
      AudioCodec.decodeAuto(AudioCodec.encode(samples, 7)), samples))
    // cross-codec hash identity — the class byte dedup cannot see
    assert(AudioCodec.eHash(AudioCodec.decodeAuto(wav)) ==
      AudioCodec.eHash(samples))

    val got = Multimodal.ddAudioWav(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getBoolean(4))).toSet
    val docIds = Multimodal.ingest(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want =
      docIds.filter(_ % 3 == 0).map(id =>
        (id, id + Multimodal.ReencodeOffset, "wav_reencode", 0, false)) ++
      docIds.filter(_ % 3 == 1).map(id =>
        (id, id + Multimodal.BrightOffset, "wav_dc", 0, false))
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }

  test("dd_image_phash finds exactly the planted twins on sf0.001") {
    val got = Multimodal.ddImagePhash(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getBoolean(4))).toSet
    val docIds = Multimodal.ingest(spark, TestSpark.sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want =
      docIds.filter(_ % 4 == 0).map(id =>
        (id, id + Multimodal.ReencodeOffset, "reencoded", 0, false)) ++
      docIds.filter(_ % 4 == 1).map(id =>
        (id, id + Multimodal.BrightOffset, "brightness", 0, false))
    assert(got == want,
      s"extra=${(got -- want).take(5)} missing=${(want -- got).take(5)}")
  }
}
