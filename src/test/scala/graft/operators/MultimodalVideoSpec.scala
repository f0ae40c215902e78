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

  test("decode lineage executes once and the frame cache does not leak: " +
      "the pair table is checkpointed, the scoped persist released") {
    import spark.implicits._
    // behavioral decode-once proof: an accumulator in the frame
    // lineage counts how many times each row is produced — the scoped
    // persist must make the self-join (BOTH sides, whatever join
    // strategy) consume each frame exactly once, and the checkpointed
    // pair result must never re-execute the lineage on re-collection
    val decoded = spark.sparkContext.longAccumulator("frames_decoded")
    val rows = (0 until 64).flatMap { v =>
      Seq((v.toLong, 2, 0, 5000L + v % 8), (v.toLong, 2, 1, 9000L + v))
    }
    val frames = rows.toDF("vid", "nf", "fidx", "fhash")
      .filter { (_: org.apache.spark.sql.Row) => decoded.add(1L); true }
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Multimodal.videoFramePairs(frames)
    assert(decoded.value == rows.size,
      s"frame lineage must execute exactly once during the pair build, " +
        s"saw ${decoded.value} row productions for ${rows.size} rows")
    pairs.collect(); pairs.collect()
    assert(decoded.value == rows.size,
      "re-collecting the checkpointed pair table must not re-decode")
    // leak check: every persistent RDD this call left behind is the
    // checkpointed pair result (GC-reclaimed), never the frame cache
    // (which the old code left in the CacheManager forever)
    val leaked = spark.sparkContext.getPersistentRDDs
      .filter { case (k, _) => !before.contains(k) }.values
      .filterNot(_.isCheckpointed)
    assert(leaked.isEmpty,
      s"videoFramePairs must release its scoped frame cache, found: " +
        leaked.map(_.toString).mkString(", "))
  }

  test("alignment gate finds re-encodes at offset 0 and trims at offset 1, " +
      "and REJECTS the reversed decoy containment accepts") {
    val aligned = Multimodal.ddVideoAlign(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getInt(3), r.getInt(4))).toSet
    val expected =
      (0L until 500L).filter(_ % 4 == 0).map(id =>
        (id, id + Multimodal.VideoReencOffset, "reencoded", 0,
          3 + (id % 3).toInt)).toSet ++
      (0L until 500L).filter(_ % 4 == 1).map(id =>
        (id, id + Multimodal.VideoTrimOffset, "trimmed", 1,
          2 + (id % 3).toInt)).toSet
    assert(aligned == expected, "reversed decoys must align at no offset")

    // the semantic line the decoy draws: CONTAINMENT (order-blind set
    // semantics) accepts every reversed copy as a full duplicate
    val byId = Multimodal
      .ingestVideosAligned(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.img_id -> VideoCodec.decode(r.payload)
        .map(VideoCodec.frameHash).toSet).toMap
    val decoys = (0L until 500L).filter(_ % 4 == 2)
    assert(decoys.nonEmpty)
    decoys.foreach { id =>
      assert(byId(id) == byId(id + Multimodal.VideoShuffleOffset),
        s"decoy $id must be a full duplicate under set semantics")
    }
  }

  test("mega-bucket guard keeps a frame-farm corpus near-linear without " +
      "losing distinctive-frame pairs") {
    import spark.implicits._
    val nHot = 300
    // every video carries the SAME hot frame (hash 0 — an intro card)
    // at fidx 0 plus one distinctive frame; videos i and i+1000 share
    // distinctive hash i — the planted pair set
    val rows =
      (0 until nHot).flatMap { i =>
        Seq((i.toLong, 2, 0, 0L), (i.toLong, 2, 1, 1000L + i))
      } ++ (0 until nHot).flatMap { i =>
        Seq((i + 1000L, 2, 0, 0L), (i + 1000L, 2, 1, 1000L + i))
      }
    val frames = rows.toDF("vid", "nf", "fidx", "fhash")
    val cands = Multimodal.videoFramePairs(frames).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(4), r.getInt(5)))
    // hot bucket (2*nHot rows) pairs ADJACENT only: 2*nHot − 1
    // candidates instead of the quadratic ~2nHot²; distinctive buckets
    // (2 rows each, far under the threshold) keep their full pair
    val hot = cands.count { case (_, _, fa, fb) => fa == 0 && fb == 0 }
    assert(hot == 2 * nHot - 1,
      s"hot-frame bucket must pair linearly, got $hot")
    val planted = cands.collect {
      case (a, b, 1, 1) => (a, b)
    }.toSet
    assert(planted == (0 until nHot).map(i => (i.toLong, i + 1000L)).toSet,
      "distinctive-frame pairs must survive the guard untouched")
    assert(cands.length == hot + planted.size)
  }
}
