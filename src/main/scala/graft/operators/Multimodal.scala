package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted via partition-local
  * batches.
  *
  * The Spark-side shape is what a 100 TB media pipeline needs — binary
  * column + typed metadata struct, partition-parallel batched decode
  * with a typed schema, deterministic frame sampling via a generator —
  * and the decode legs run REAL codecs on the stock JVM:
  * [[ImageCodec]] (PNG/BMP/JPEG via `javax.imageio`), the pure-bytes
  * P6 PPM codec, [[AudioCodec]] (GA1 container + WAV via
  * `javax.sound.sampled`), and [[VideoCodec]] (GV1 multi-frame
  * container with format-sniffed per-frame decode). One deliberate
  * exception remains: [[DecodeStub]] is the format-AGNOSTIC batch stub
  * kept for `mm_decode_meta`, whose oracle replays its deterministic
  * fake in SQL — it documents the swap-one-function seam for codecs
  * this container lacks (e.g. H.264), while every schema, partition,
  * and batch shape is shared with the real-codec paths.
  */
object Multimodal {

  /** Typed media record: what an ingested multimodal table row looks like.
    * Payload here is the utf-8 text bytes standing in for image data. */
  final case class MediaRecord(
      doc_id: Long, payload: Array[Byte],
      mime: String, width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(
      doc_id: Long, byte_len: Long, brightness: Double,
      width: Int, height: Int, n_frames: Int)

  /** STUB decoder — a deterministic fake kept for the format-agnostic
    * metadata gate (`mm_decode_meta`), whose oracle replays the fake in
    * SQL. The REAL codecs live alongside it in this file: [[ImageCodec]]
    * decodes actual PNG/BMP/JPEG bytes via `javax.imageio`
    * (`mm_decode_png`, `dd_image_phash`), the P6 PPM codec parses raw
    * pixel containers, and [[AudioCodec]] parses the GA1 audio
    * container (`dd_audio_phash`). The fake derives "brightness" =
    * mean of the first 8 payload bytes, keeping the plumbing —
    * batched `mapPartitions` shape, schema, partitioning — identical
    * to the real-codec paths. */
  object DecodeStub {
    val BatchSize = 32
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val head = r.payload.take(8).map(_ & 0xFF)
        MediaFeatures(r.doc_id, r.payload.length.toLong,
          if (head.isEmpty) 0.0 else head.sum.toDouble / head.length,
          r.width, r.height, r.n_frames)
      }
  }

  /** documents → typed media table: binary payload + metadata struct.
    * Metadata is derived deterministically from n_chars so every engine
    * (and the oracle) agrees on it. */
  def ingest(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        $"doc_id",
        encode($"text", "UTF-8").as("payload"),
        when($"doc_id" % 2 === 0, "image/png").otherwise("image/jpeg").as("mime"),
        (lit(64) + ($"n_chars" % 577)).cast("int").as("width"),
        (lit(48) + ($"n_chars" % 433)).cast("int").as("height"),
        (lit(1) + ($"n_chars" % 24)).cast("int").as("n_frames"))
      .as[MediaRecord]
  }

  /** Partition-parallel batched decode: the `mapPartitions` +
    * `grouped(BatchSize)` shape is exactly how a vectorized decoder is
    * driven (amortized per-batch setup, bounded memory per task). */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeStub.BatchSize)
      .flatMap(b => DecodeStub.decodeBatch(b)))
  }

  def mmDecodeMeta(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(ingest(s, dir)).toDF()

  /** Oracle twin: the stub's arithmetic, in SQL over the source text. */
  val mmDecodeMetaSql: String =
    """SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS byte_len,
      |  list_sum(list_transform(range(LEAST(8, LENGTH(text))),
      |    i -> ascii(text[i+1])))::DOUBLE / LEAST(8, LENGTH(text)) AS brightness,
      |  CAST(64 + n_chars % 577 AS INT) AS width,
      |  CAST(48 + n_chars % 433 AS INT) AS height,
      |  CAST(1 + n_chars % 24 AS INT) AS n_frames
      |FROM documents""".stripMargin

  /** Deterministic frame sampling: every k-th frame index per media row,
    * via a generator (posexplode of a sequence) — row-parallel, no UDF. */
  val FrameStride = 5
  def mmFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ingest(s, dir).toDF()
      .select($"doc_id", $"n_frames",
        explode(sequence(lit(0), $"n_frames" - 1, lit(FrameStride))).as("frame_idx"))
  }

  val mmFrameSampleSql: String =
    s"""SELECT doc_id, CAST(1 + n_chars % 24 AS INT) AS n_frames,
       |  CAST(UNNEST(range(0, 1 + n_chars % 24, $FrameStride)) AS INT) AS frame_idx
       |FROM documents""".stripMargin

  // ------------------------------------------------------- REAL codec path.
  // PPM (P6) is a complete, real image format implementable without any
  // library, so one leg of the pipeline runs an ACTUAL decoder — header
  // parse, dimension extraction, pixel scan — not a stand-in. The gate
  // query proves it end to end: Spark reads width/height out of the
  // binary payload's header bytes, while the DuckDB oracle derives the
  // same values from the synthesis arithmetic; any decode bug
  // hash-mismatches.
  object PpmCodec {
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "rgb size mismatch")
      s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ rgb
    }

    /** (width, height, rgb bytes) from a P6 payload. */
    def decode(payload: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(payload.length >= 2 &&
        payload(0) == 'P'.toByte && payload(1) == '6'.toByte, "not a P6 PPM")
      var i = 2
      def nextInt(): Int = {
        while (Character.isWhitespace(payload(i))) i += 1
        var v = 0
        while (i < payload.length && !Character.isWhitespace(payload(i))) {
          v = v * 10 + (payload(i) - '0'.toByte); i += 1
        }
        v
      }
      val w = nextInt(); val h = nextInt(); val maxVal = nextInt()
      require(maxVal == 255, s"unsupported max value $maxVal")
      i += 1 // exactly one whitespace byte separates header and raster
      (w, h, java.util.Arrays.copyOfRange(payload, i, i + w * h * 3))
    }
  }

  final case class PpmRecord(doc_id: Long, payload: Array[Byte])
  final case class PpmFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, brightness: Double)

  /** Synthesize a real PPM payload per document (deterministic pixels
    * from doc_id, so the oracle can predict the decoded features without
    * parsing bytes). Typed-map synthesis is source-side scaffolding —
    * production ingests payloads from storage. */
  def ingestPpm(s: SparkSession, dir: String): Dataset[PpmRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long]).map { id =>
      val w = 2 + (id % 7).toInt
      val h = 2 + (id % 5).toInt
      val rgb = Array.tabulate(w * h * 3)(i => ((id * 31 + i * 7) % 256).toByte)
      PpmRecord(id, PpmCodec.encode(w, h, rgb))
    }
  }

  /** Batched partition-parallel decode through the REAL codec: width and
    * height come out of the payload header, brightness from the pixel
    * raster. */
  def decodePpm(media: Dataset[PpmRecord]): Dataset[PpmFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.map { r =>
      val (w, h, px) = PpmCodec.decode(r.payload)
      PpmFeatures(r.doc_id, w, h, w * h,
        px.map(_ & 0xFF).sum.toDouble / px.length)
    }))
  }

  def mmDecodePpm(s: SparkSession, dir: String): DataFrame =
    decodePpm(ingestPpm(s, dir)).toDF()

  /** The synthesis arithmetic, replayed in SQL: exact integer sums, so
    * the division matches bit-for-bit. */
  val mmDecodePpmSql: String =
    """SELECT doc_id,
      |  CAST(2 + doc_id % 7 AS INT) AS width,
      |  CAST(2 + doc_id % 5 AS INT) AS height,
      |  CAST((2 + doc_id % 7) * (2 + doc_id % 5) AS INT) AS n_pixels,
      |  list_sum(list_transform(range((2 + doc_id % 7) * (2 + doc_id % 5) * 3),
      |    i -> (doc_id * 31 + i * 7) % 256))::DOUBLE
      |    / ((2 + doc_id % 7) * (2 + doc_id % 5) * 3) AS brightness
      |FROM documents""".stripMargin

  // ------------------------------------------------- audio frame windows.
  /** Audio-as-binary: PCM samples stand behind an opaque payload (here
    * one byte = one sample, text bytes standing in for a WAV body) with
    * typed metadata. The WINDOWING is the operator: fixed `AudioWin`
    * samples every `AudioHop` (tail dropped — standard STFT framing),
    * per-window energy computed in the partition-local batched decode.
    * Every window boundary is integer arithmetic on the metadata, so the
    * oracle checks the full framing AND the stub's energy exactly. At
    * scale this is scan-side: windows per row explode locally, no
    * shuffle, and a real PCM decoder swaps in at the same one function
    * as the image stub. */
  final case class AudioRecord(doc_id: Long, payload: Array[Byte],
      sample_rate: Int, n_samples: Int)
  final case class AudioWindow(doc_id: Long, window_idx: Int,
      start_sample: Int, end_sample: Int, energy: Double)

  val AudioWin = 256
  val AudioHop = 128

  def ingestAudio(s: SparkSession, dir: String): Dataset[AudioRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"),
        lit(16000).as("sample_rate"),
        length($"text").cast("int").as("n_samples"))
      .as[AudioRecord])
  }

  def audioWindows(media: Dataset[AudioRecord]): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.flatMap { r =>
      val nWin =
        if (r.n_samples >= AudioWin) (r.n_samples - AudioWin) / AudioHop + 1
        else 0
      (0 until nWin).map { i =>
        val start = i * AudioHop
        val window = r.payload.slice(start, start + AudioWin).map(_ & 0xFF)
        AudioWindow(r.doc_id, i, start, start + AudioWin,
          window.sum.toDouble / AudioWin)
      }
    }))
  }

  def mmAudioWindows(s: SparkSession, dir: String): DataFrame =
    audioWindows(ingestAudio(s, dir)).toDF()

  val mmAudioWindowsSql: String =
    s"""SELECT doc_id, CAST(i AS INT) AS window_idx,
       |  CAST(i * $AudioHop AS INT) AS start_sample,
       |  CAST(i * $AudioHop + $AudioWin AS INT) AS end_sample,
       |  list_sum(list_transform(range(i * $AudioHop, i * $AudioHop + $AudioWin),
       |    j -> ascii(text[j+1])))::DOUBLE / $AudioWin AS energy
       |FROM (SELECT doc_id, text, UNNEST(range(0,
       |    CASE WHEN LENGTH(text) >= $AudioWin
       |      THEN (LENGTH(text) - $AudioWin) // $AudioHop + 1
       |      ELSE 0 END)) AS i
       |  FROM documents)""".stripMargin

  // ----------------------------------------------- ViT-style patchify.
  /** Non-overlapping `PatchSize`×`PatchSize` patch grid per image
    * (ragged right/bottom edges cropped — the ViT preprocessing
    * convention), one output row per patch carrying the raw patch bytes
    * (the model input) plus its grid position and mean intensity. The
    * decode+patchify runs inside the partition-local batched loop: rows
    * explode scan-side, no shuffle — at 100 TB this is the embarrassingly
    * parallel leg feeding the embedding stage. The gate emits the
    * integer-exact scalar columns (grid position, mean from an integer
    * pixel sum) so the REAL decoder's raster indexing is oracle-checked
    * patch by patch against the synthesis arithmetic. */
  final case class PpmPatch(doc_id: Long, patch_row: Int, patch_col: Int,
      patch_mean: Double, patch: Array[Byte])

  val PatchSize = 2

  def patchifyPpm(media: Dataset[PpmRecord],
      patch: Int = PatchSize): Dataset[PpmPatch] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.flatMap { r =>
      val (w, h, px) = PpmCodec.decode(r.payload)
      for {
        pr <- 0 until h / patch
        pc <- 0 until w / patch
      } yield {
        val bytes = new Array[Byte](patch * patch * 3)
        var sum = 0L
        var o = 0
        for (dy <- 0 until patch; k <- 0 until patch * 3) {
          val i = ((pr * patch + dy) * w + pc * patch) * 3 + k
          bytes(o) = px(i)
          sum += (px(i) & 0xFF)
          o += 1
        }
        PpmPatch(r.doc_id, pr, pc,
          sum.toDouble / (patch * patch * 3), bytes)
      }
    }))
  }

  def mmPatches(s: SparkSession, dir: String): DataFrame =
    patchifyPpm(ingestPpm(s, dir)).toDF()
      .select("doc_id", "patch_row", "patch_col", "patch_mean")

  /** The synthesis arithmetic replayed per patch: two rows of
    * `PatchSize`·3 contiguous raster bytes each, integer sum, one
    * division. */
  val mmPatchesSql: String = {
    val p = PatchSize
    s"""WITH d AS (
       |  SELECT doc_id, CAST(2 + doc_id % 7 AS INT) AS w,
       |    CAST(2 + doc_id % 5 AS INT) AS h
       |  FROM documents),
       |p1 AS (SELECT doc_id, w, h, unnest(range(h // $p)) AS pr FROM d),
       |p2 AS (SELECT doc_id, w, h, pr, unnest(range(w // $p)) AS pc FROM p1)
       |SELECT doc_id, CAST(pr AS INT) AS patch_row, CAST(pc AS INT) AS patch_col,
       |  CAST(list_sum(flatten(list_transform(range($p), dy ->
       |    list_transform(range($p * 3), k ->
       |      (doc_id * 31 + (((pr * $p + dy) * w + pc * $p) * 3 + k) * 7) % 256))))
       |    AS DOUBLE) / ${p * p * 3} AS patch_mean
       |FROM p2""".stripMargin
  }

  // --------------------------------------- PNG/JPEG-class codec path.
  /** REAL image-format decode through `javax.imageio` (pure-JVM, no
    * native libs): PNG in, BMP as the re-encode twin. Payload synthesis
    * is deterministic integer arithmetic so the DuckDB oracle predicts
    * the DECODED pixels without parsing a byte — PNG/BMP are lossless,
    * so a single wrong pixel anywhere in encode→decode hash-mismatches
    * the gate. The pixel mixer carries an id×position interaction term:
    * an additive-in-id pattern would give every image identical
    * GRADIENTS and collapse every dHash to one value. */
  object ImageCodec {
    java.lang.System.setProperty("java.awt.headless", "true")

    /** Base pixel channel value in 0..254 (the brightness twin adds a
      * UNIFORM +1 and must never clamp). Quadratic-residue mixing —
      * square an affine seed modulo a prime — because anything affine
      * in (id, i) leaves every image's GRADIENT field correlated and
      * distinct images then dHash-collide (observed at sf0.1: 51
      * chance pairs under a linear mixer). All intermediates fit
      * BIGINT (k < 2^24, k² < 2^48), so the oracle replays it in SQL
      * verbatim. */
    def mixPixel(id: Long, i: Int): Int = {
      val p = 16777213L
      val k = (id * 2654435761L + i.toLong * 97L + 13L) % p
      (k * k % p % 255L).toInt
    }

    def dims(id: Long): (Int, Int) =
      (12 + (id % 9).toInt, 10 + (id % 7).toInt)

    /** splitmix64 finalizer — the phash CORPUS pixel mixer. The dedup
      * gate's oracle never replays pixels (it predicts the planted
      * PAIR SET), so this side can use real 64-bit avalanche mixing —
      * and must: any polynomial-mod scheme leaves the DIFFERENCE of
      * two images' pixel fields low-degree in position (observed:
      * ids 3843 apart dHash-collided at Hamming 0 even under a
      * quadratic-residue mixer), while avalanche mixing makes cross-
      * image dHash collisions ~2⁻⁶⁴-rare. */
    def strongMix(x0: Long): Long = {
      var x = x0 + 0x9E3779B97F4A7C15L
      x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
      x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
      x ^ (x >>> 31)
    }

    /** Corpus pixel in 0..254 (uniform +1 never clamps); raster index
      * i < 1024 keeps id*1024+i injective across the corpus. */
    def strongPixel(id: Long, i: Int): Int =
      (((strongMix(id * 1024L + i) >>> 40) & 0xFFFFFFL) % 255L).toInt

    def synthesize(id: Long, brightShift: Int,
        px: (Long, Int) => Int = mixPixel): java.awt.image.BufferedImage = {
      val (w, h) = dims(id)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val k = (y * w + x) * 3
          def ch(j: Int): Int = px(id, k + j) + brightShift
          img.setRGB(x, y, (ch(0) << 16) | (ch(1) << 8) | ch(2))
          x += 1
        }
        y += 1
      }
      img
    }

    def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, bos),
        s"no ImageIO writer for $fmt")
      bos.toByteArray
    }

    def decode(payload: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "undecodable image payload")
      img
    }

    /** 64-bit dHash: green channel, 8×9 box-downsample with EXACT
      * integer cell compare (cross-multiplied — no division, no float),
      * bit = cell(r,c) brighter than cell(r,c+1). Provably invariant
      * under a uniform brightness shift: comparing (S+A·δ)·A' against
      * (S'+A'·δ)·A cancels the δ·A·A' term on both sides. */
    def dHash(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      require(w >= 9 && h >= 8, s"dHash needs >=9x8, got ${w}x$h")
      val sums = Array.ofDim[Long](8, 9)
      val areas = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val r = y * 8 / h
        var x = 0
        while (x < w) {
          val c = x * 9 / w
          sums(r)(c) += (img.getRGB(x, y) >> 8) & 0xFF
          areas(r)(c) += 1L
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var bit = 0
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (sums(r)(c) * areas(r)(c + 1) > sums(r)(c + 1) * areas(r)(c))
            hash |= 1L << bit
          bit += 1
          c += 1
        }
        r += 1
      }
      hash
    }
  }

  final case class ImgRecord(img_id: Long, payload: Array[Byte])
  final case class PngFeatures(doc_id: Long, width: Int, height: Int,
      n_pixels: Int, brightness: Double)

  /** Gate: REAL PNG decode — synthesize → ImageIO PNG encode → ImageIO
    * decode → integer-exact features; the oracle replays the synthesis
    * arithmetic, so the whole lossless roundtrip is pixel-checked. */
  def mmDecodePng(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long])
      .mapPartitions(_.map { id =>
        ImgRecord(id, ImageCodec.encode(ImageCodec.synthesize(id, 0), "png"))
      })
      .mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.map { r =>
        val img = ImageCodec.decode(r.payload)
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        PngFeatures(r.img_id, w, h, w * h, sum.toDouble / (w * h * 3))
      })).toDF()
  }

  val mmDecodePngSql: String =
    """SELECT doc_id,
      |  CAST(12 + doc_id % 9 AS INT) AS width,
      |  CAST(10 + doc_id % 7 AS INT) AS height,
      |  CAST((12 + doc_id % 9) * (10 + doc_id % 7) AS INT) AS n_pixels,
      |  list_sum(list_transform(
      |    range((12 + doc_id % 9) * (10 + doc_id % 7) * 3),
      |    i -> ((doc_id * 2654435761 + i * 97 + 13) % 16777213)
      |      * ((doc_id * 2654435761 + i * 97 + 13) % 16777213)
      |      % 16777213 % 255))::DOUBLE
      |    / ((12 + doc_id % 9) * (10 + doc_id % 7) * 3) AS brightness
      |FROM documents""".stripMargin

  val ReencodeOffset = 1000000000L
  val BrightOffset = 2000000000L
  val PhashMaxHamming = 2
  /** Buckets past this pair adjacent-by-hash instead of all-pairs. */
  val PhashMegaBucketThreshold = 64

  /** The perceptual-dedup corpus: every doc gets a base PNG; docs ≡0
    * (mod 4) additionally get a BYTE-DIFFERENT re-encode of the SAME
    * pixels (BMP — the container changed, the content didn't, exactly
    * what a crawl dedupe meets), docs ≡1 a uniform brightness+1 twin
    * (pixel bytes differ EVERYWHERE — dHash's gradient invariance is
    * the only thing that can catch it). */
  def ingestImages(s: SparkSession, dir: String): Dataset[ImgRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long])
      .mapPartitions(_.flatMap { id =>
        val px = ImageCodec.strongPixel _
        val base = ImgRecord(id,
          ImageCodec.encode(ImageCodec.synthesize(id, 0, px), "png"))
        val twin = (id % 4) match {
          case 0 => Seq(ImgRecord(id + ReencodeOffset,
            ImageCodec.encode(ImageCodec.synthesize(id, 0, px), "bmp")))
          case 1 => Seq(ImgRecord(id + BrightOffset,
            ImageCodec.encode(ImageCodec.synthesize(id, 1, px), "png")))
          case _ => Nil
        }
        base +: twin
      })
  }

  /** Gate: PERCEPTUAL image dedup — decode (ImageIO) → dHash on the
    * scan → 16-bit Hamming-band blocking (the dd_simhash shape: 4
    * bands, a ≤2-bit-distant pair shares at least one intact band) →
    * exact Hamming verify on candidates only. Byte-level identity is
    * carried alongside and is FALSE for every found pair — the planted
    * duplicates are invisible to byte dedup by construction, and the
    * oracle pins that the banded pipeline finds EXACTLY the planted
    * twins (re-encoded container + uniform-brightness shift), each at
    * Hamming 0 (BMP: same pixels; brightness: the cross-multiplied
    * cell compare cancels a uniform shift exactly). At 100 TB this is
    * scan-parallel decode+hash, a bucket join on (band, key), and a
    * candidate-only verify — never all-pairs. */
  def ddImagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = ingestImages(s, dir)
      .mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.map { r =>
        (r.img_id, ImageCodec.dHash(ImageCodec.decode(r.payload)),
          java.util.Arrays.hashCode(r.payload).toLong)
      })).toDF("img_id", "dhash", "payload_fp")
    phashPairs(hashed)
      .select($"base_id", $"dup_id",
        when($"dup_id" >= BrightOffset, "brightness")
          .otherwise("reencoded").as("kind"),
        $"hamming".cast("int").as("hamming"), $"byte_dup")
  }

  /** Banded candidate pairs + exact Hamming verify over a
    * (img_id, dhash, payload_fp) table — the join core of
    * [[ddImagePhash]], factored so the mega-bucket regime is
    * spec-drivable on synthetic hash populations. */
  /** Corpus-adaptive mega-bucket threshold — [[graft.operators.Dedup
    * .observedBucketThreshold]]'s discipline for the image corpus: a
    * near-duplicate-heavy crawl where 200-image buckets are TYPICAL
    * should not degrade their recall under the fixed 64, while the cap
    * keeps a banner-farm corpus (p99 itself explodes) off the
    * quadratic path. One percentile over one row per bucket. */
  def observedPhashThreshold(hashed: DataFrame, q: Double = 0.99,
      floor: Int = PhashMegaBucketThreshold, cap: Int = 1024): Int = {
    import hashed.sparkSession.implicits._
    val p = hashed.select(explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright($"dhash", b * 16).bitwiseAND(lit(0xFFFFL))
            .as("key"))): _*)).as("e"))
      .groupBy($"e.band", $"e.key").agg(count(lit(1)).as("bsz"))
      .agg(coalesce(percentile_approx($"bsz", lit(q), lit(10000)),
        lit(floor.toLong)).as("p"))
      .head().getLong(0) // coalesce: empty input -> NULL percentile
    p.max(floor.toLong).min(cap.toLong).toInt
  }

  def phashPairs(hashed: DataFrame,
      thresholdOverride: Option[Int] = None): DataFrame = {
    import hashed.sparkSession.implicits._
    val megaThreshold = thresholdOverride.getOrElse(PhashMegaBucketThreshold)
    val banded0 = hashed.select($"img_id", $"dhash", $"payload_fp",
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright($"dhash", b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
        .as("e"))
      .select($"img_id", $"dhash", $"payload_fp",
        $"e.band".as("band"), $"e.key".as("key"))
    // mega-bucket guard (the dd_minhash discipline, same single-join
    // dual-regime shape): a near-constant image population (solid
    // banners, tracking pixels) lands thousands of rows on one
    // (band, key) and the self-join squares it. Oversized buckets pair
    // ADJACENT-BY-(dhash, img_id) instead of all-pairs — identical
    // hashes sort adjacent, so exact-duplicate recall survives even
    // inside a mega bucket; near-dup recall degrades there only, the
    // documented bound. The rank window shuffles on the SAME key as
    // the join. Gate-scale buckets stay far below the threshold.
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy($"band", $"key")
    val banded = banded0
      .withColumn("rk",
        row_number().over(byBucket.orderBy($"dhash", $"img_id")))
      .withColumn("bsz", count(lit(1)).over(byBucket))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          ((col("a.bsz") <= megaThreshold &&
            col("a.img_id") < col("b.img_id")) ||
           (col("a.bsz") > megaThreshold &&
            col("a.rk") + 1 === col("b.rk") &&
            col("a.img_id") =!= col("b.img_id"))))
      .select(
        least(col("a.img_id"), col("b.img_id")).as("base_id"),
        greatest(col("a.img_id"), col("b.img_id")).as("dup_id"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"),
        (col("a.payload_fp") === col("b.payload_fp")).as("byte_dup"))
      .distinct()
      .filter($"hamming" <= PhashMaxHamming)
  }

  val ddImagePhashSql: String =
    s"""SELECT doc_id AS base_id, doc_id + $ReencodeOffset AS dup_id,
       |  'reencoded' AS kind, 0 AS hamming, FALSE AS byte_dup
       |FROM documents WHERE doc_id % 4 = 0
       |UNION ALL
       |SELECT doc_id, doc_id + $BrightOffset, 'brightness', 0, FALSE
       |FROM documents WHERE doc_id % 4 = 1""".stripMargin

  // ---------------------------- lossy JPEG near-dup dedup (dd_image_jpeg)
  val JpegOffset = 3000000000L
  /** ImageIO JPEG quality for the twin encode — prototype-measured: at
    * 0.75/0.85/0.9 ALL sf0.1-scale planted twins decode to EXACTLY the
    * engineered hamming (0 drift), so 0.85 is a mid-band choice, not a
    * tuned edge. */
  val JpegQuality = 0.85f

  /** The corpus engineering that makes a LOSSY codec oracle-exact: the
    * dHash distance of a JPEG re-encode is normally an emergent
    * function of the DCT noise (unpinnable in SQL), so these images are
    * built from 2×2-px constant cells ALIGNED to dHash's 8×9 grid
    * (18×16 px), every horizontally-adjacent cell pair ≥50 gray levels
    * apart — far above the cell-mean error JPEG block coding produces
    * at [[JpegQuality]] — and the twin inverts exactly k engineered
    * comparisons confined to the LAST cell column, whose cells
    * participate in exactly ONE dHash bit (bit (r,7)). The twin's
    * decoded hamming is then k = 1 + id%2 deterministically, despite
    * 80%+ of pixels changing in the roundtrip (the lossiness is real;
    * MultimodalJpegSpec pins both). Cross-image false pairs: cell
    * levels derive from [[ImageCodec.strongMix]] avalanche chains —
    * measured over the full sf0.1 corpus (6667 images): zero pairs at
    * hamming ≤ 2 outside the planted set, minimum cross hamming 7. */
  object JpegBlocks {
    private def mix(id: Long, r: Int, c: Int): Int =
      ((ImageCodec.strongMix(id * 256L + r * 16L + c) >>> 33) &
        0x7FFFFFFFL).toInt

    /** 8×9 cell grays. Base: v = 50 + 50·d, d ∈ 0..3, adjacent cells
      * never equal (the level chain steps by 1 + mix%3 mod 4). Twin
      * (`flips` ∈ 1..2): rows id%8 and (id%8+4)%8 move their LAST cell
      * to the other side of cell 7 at the same 50-level margin (0..250
      * stays in byte range), flipping bit (r,7) and nothing else. */
    def cellVals(id: Long, flips: Int): Array[Array[Int]] = {
      val v = Array.ofDim[Int](8, 9)
      var r = 0
      while (r < 8) {
        var d = mix(id, r, 0) % 4
        v(r)(0) = 50 + 50 * d
        var c = 1
        while (c < 9) {
          d = (d + 1 + mix(id, r, c) % 3) % 4
          v(r)(c) = 50 + 50 * d
          c += 1
        }
        r += 1
      }
      var j = 0
      while (j < flips) {
        val r = ((id % 8).toInt + 4 * j) % 8
        v(r)(8) = if (v(r)(7) > v(r)(8)) v(r)(7) + 50 else v(r)(7) - 50
        j += 1
      }
      v
    }

    /** 18×16 gray image (2 px per cell; channels equal so JPEG chroma
      * subsampling is neutral for the green-channel dHash). */
    def image(cells: Array[Array[Int]]): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(18, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 18) {
          val g = cells(y / 2)(x / 2)
          im.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      im
    }

    /** Explicit-quality JPEG encode (ImageIO's writer param surface —
      * the default-quality `ImageIO.write` leaves the knob implicit). */
    def encodeJpeg(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(JpegQuality)
      w.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      w.dispose()
      bos.toByteArray
    }
  }

  /** Every doc gets a lossless base PNG; docs ≡0 (mod 3) get a
    * QUALITY-DEGRADED JPEG twin — the lossy re-encode shape a real
    * crawl dedups, invisible to byte dedup AND to exact-hash dedup
    * (hamming ≥ 1 by construction). */
  def ingestJpegImages(s: SparkSession, dir: String): Dataset[ImgRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long])
      .mapPartitions(_.flatMap { id =>
        val base = ImgRecord(id,
          ImageCodec.encode(JpegBlocks.image(JpegBlocks.cellVals(id, 0)),
            "png"))
        if (id % 3 == 0)
          Seq(base, ImgRecord(id + JpegOffset, JpegBlocks.encodeJpeg(
            JpegBlocks.image(JpegBlocks.cellVals(id, 1 + (id % 2).toInt)))))
        else Seq(base)
      })
  }

  /** Gate: perceptual dedup catching LOSSY JPEG re-encodes at
    * Hamming 1–2 — the nonzero band-blocking recall path
    * ([[phashPairs]]' 4×16-bit bands guarantee any ≤2-bit pair shares
    * an intact band) exercised for real, with the pair set AND the
    * exact hamming of every pair oracle-pinned (see [[JpegBlocks]] for
    * why a lossy codec can be pinned at all). Same 100 TB shape as
    * [[ddImagePhash]]: scan-parallel decode+hash, banded bucket join,
    * candidate-only exact verify. */
  def ddImageJpeg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = ingestJpegImages(s, dir)
      .mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.map { r =>
        (r.img_id, ImageCodec.dHash(ImageCodec.decode(r.payload)),
          java.util.Arrays.hashCode(r.payload).toLong)
      })).toDF("img_id", "dhash", "payload_fp")
    phashPairs(hashed)
      .select($"base_id", $"dup_id", lit("jpeg").as("kind"),
        $"hamming".cast("int").as("hamming"), $"byte_dup")
  }

  val ddImageJpegSql: String =
    s"""SELECT doc_id AS base_id, doc_id + $JpegOffset AS dup_id,
       |  'jpeg' AS kind, CAST(1 + doc_id % 2 AS INT) AS hamming,
       |  FALSE AS byte_dup
       |FROM documents WHERE doc_id % 3 = 0""".stripMargin

  // ------------------------- video perceptual dedup (dd_video_frames)
  val VideoReencOffset = 4000000000L
  val VideoTrimOffset = 5000000000L
  val VideoShuffleOffset = 6000000000L

  /** A tiny multi-frame video container ("GV1 <n>\n" + n length-
    * prefixed image frames) + the frame synthesis for the video dedup
    * corpus. Enough real structure that the decode leg PARSES a
    * container and runs a REAL image codec per frame; small enough
    * that the oracle predicts the planted pair set exactly. */
  object VideoCodec {
    /** Frame pixel — avalanche-mixed with (id, frame, raster) domain
      * separation (frames of one video must not repeat, or a shared-
      * frame count would overshoot containment; see the image corpus
      * war story for why nothing weaker than avalanche survives). */
    def framePixel(id: Long, f: Int, i: Int): Int =
      (((ImageCodec.strongMix(id * (1L << 22) + f.toLong * (1L << 12) + i)
        >>> 40) & 0xFFFFFFL) % 255L).toInt

    val FrameW = 12
    val FrameH = 10

    def synthRgb(id: Long, f: Int): Array[Byte] =
      Array.tabulate(FrameW * FrameH * 3)(i =>
        framePixel(id, f, i).toByte)

    def synthFrame(id: Long, f: Int): java.awt.image.BufferedImage = {
      val rgb = synthRgb(id, f)
      val img = new java.awt.image.BufferedImage(FrameW, FrameH,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < FrameH) {
        var x = 0
        while (x < FrameW) {
          val k = (y * FrameW + x) * 3
          img.setRGB(x, y, ((rgb(k) & 0xFF) << 16) |
            ((rgb(k + 1) & 0xFF) << 8) | (rgb(k + 2) & 0xFF))
          x += 1
        }
        y += 1
      }
      img
    }

    /** [[ImageCodec.dHash]] over a raw interleaved-RGB raster — the
      * same green-channel cross-multiplied box compare, bit-identical
      * to hashing the equivalent BufferedImage (spec-pinned), so a
      * PPM-decoded base frame and an ImageIO-decoded PNG re-encode of
      * the SAME pixels hash equal across codecs. */
    def dHashRgb(w: Int, h: Int, rgb: Array[Byte]): Long = {
      require(w >= 9 && h >= 8, s"dHash needs >=9x8, got ${w}x$h")
      val sums = Array.ofDim[Long](8, 9)
      val areas = Array.ofDim[Long](8, 9)
      var y = 0
      while (y < h) {
        val r = y * 8 / h
        var x = 0
        while (x < w) {
          val c = x * 9 / w
          sums(r)(c) += rgb((y * w + x) * 3 + 1) & 0xFF
          areas(r)(c) += 1L
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var bit = 0
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          if (sums(r)(c) * areas(r)(c + 1) > sums(r)(c + 1) * areas(r)(c))
            hash |= 1L << bit
          bit += 1
          c += 1
        }
        r += 1
      }
      hash
    }

    /** Per-frame decode+hash, format-sniffed: P6 PPM frames decode
      * through the pure-bytes codec, PNG/BMP frames through ImageIO —
      * the mixed-codec corpus a real crawl is. */
    def frameHash(fb: Array[Byte]): Long =
      if (fb.length >= 2 && fb(0) == 'P'.toByte && fb(1) == '6'.toByte) {
        val (w, h, rgb) = PpmCodec.decode(fb)
        dHashRgb(w, h, rgb)
      } else ImageCodec.dHash(ImageCodec.decode(fb))

    def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
      val header = s"GV1 ${frames.size}\n".getBytes("US-ASCII")
      val buf = java.nio.ByteBuffer.allocate(
        header.length + frames.map(_.length + 4).sum)
      buf.put(header)
      frames.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
      buf.array()
    }

    def decode(payload: Array[Byte]): Seq[Array[Byte]] = {
      require(payload.length > 4 && payload(0) == 'G'.toByte &&
        payload(1) == 'V'.toByte && payload(2) == '1'.toByte, "not GV1")
      var i = 4
      var n = 0
      while (payload(i) != '\n'.toByte) {
        n = n * 10 + (payload(i) - '0'.toByte)
        i += 1
      }
      i += 1
      val buf = java.nio.ByteBuffer.wrap(payload)
      (0 until n).map { _ =>
        val len = buf.getInt(i)
        val fb = java.util.Arrays.copyOfRange(payload, i + 4, i + 4 + len)
        i += 4 + len
        fb
      }
    }
  }

  /** The video-dedup corpus: every doc gets a base video of
    * 3 + id%3 P6 PPM frames; docs ≡0 (mod 4) get a RE-ENCODED copy
    * (every frame re-encoded PNG through ImageIO — container and
    * bytes change, content doesn't) and docs ≡1 a TRIMMED copy (first
    * frame dropped — the cut-intro shape), the two duplicate classes
    * a crawl's video dedup actually meets and byte-level identity
    * cannot see. */
  def ingestVideos(s: SparkSession, dir: String): Dataset[ImgRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long])
      .mapPartitions(_.flatMap { id =>
        val nf = 3 + (id % 3).toInt
        // bases and trims carry P6 PPM frames (a real format with a
        // pure-bytes codec); the re-encode twin is the CROSS-CODEC
        // case — the same pixels re-encoded PNG through ImageIO
        def ppmFrames: Seq[Array[Byte]] = (0 until nf).map { f =>
          val rgb = VideoCodec.synthRgb(id, f)
          PpmCodec.encode(VideoCodec.FrameW, VideoCodec.FrameH, rgb)
        }
        val base = ImgRecord(id, VideoCodec.encode(ppmFrames))
        val twin = (id % 4) match {
          case 0 => Seq(ImgRecord(id + VideoReencOffset,
            VideoCodec.encode((0 until nf).map(f => ImageCodec.encode(
              VideoCodec.synthFrame(id, f), "png")))))
          case 1 => Seq(ImgRecord(id + VideoTrimOffset,
            VideoCodec.encode(ppmFrames.drop(1))))
          case _ => Nil
        }
        base +: twin
      })
  }

  /** Decode leg shared by both video gates: container parse + REAL
    * per-frame image decode + per-frame dHash, scan-parallel batched
    * `mapPartitions` — emits one 20-byte (vid, nf, fidx, fhash) row
    * per frame; pixels never leave the scan task. */
  private def videoFrameTable(s: SparkSession,
      corpus: Dataset[ImgRecord]): DataFrame = {
    import s.implicits._
    corpus
      .mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.flatMap { r =>
        val fbs = VideoCodec.decode(r.payload)
        fbs.iterator.zipWithIndex.map { case (fb, i) =>
          (r.img_id, fbs.size, i, VideoCodec.frameHash(fb))
        }
      })).toDF("vid", "nf", "fidx", "fhash")
  }

  /** Frame-match candidates: self-join of the frame table on the
    * 64-bit frame hash (the hash IS the blocking key), guarded by the
    * image gate's mega-bucket discipline wired onto `fhash` — a HOT
    * frame (intro card, black frame — ubiquitous in real video) lands
    * thousands of rows on one hash and an unguarded self-join squares
    * it. Oversized buckets pair ADJACENT-BY-(vid, fidx) instead of
    * all-pairs, keeping candidate volume linear in the bucket; the
    * documented recall bound is that a ubiquitous frame stops driving
    * pairing by itself (its videos still pair via their distinctive
    * frames — arguably the RIGHT semantics for an intro card). The
    * rank window shuffles on the SAME key as the join, so the guard
    * adds no extra exchange. */
  def videoFramePairs(frames: DataFrame,
      thresholdOverride: Option[Int] = None): DataFrame = {
    import frames.sparkSession.implicits._
    val thr = thresholdOverride.getOrElse(PhashMegaBucketThreshold)
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy($"fhash")
    // PERSIST the ranked frame table before self-joining it: without
    // this, a broadcast-eligible side re-executes the whole decode
    // lineage to build its hash relation (exchange reuse only saves the
    // sort-merge shape) — decoding every video TWICE, the dominant cost
    // at scale. The cached rows are (vid, nf, fidx, rk, bsz, fhash) —
    // tens of bytes per frame, never pixels — and MEMORY_AND_DISK
    // spills gracefully on a 10⁹-frame corpus. The persist is SCOPED
    // to this call: the pair result is materialized eagerly
    // (localCheckpoint — pair rows are shared-frame volume, 20-byte
    // rows, and the checkpoint blocks free on GC) and the frame cache
    // released in a finally — the CacheManager would otherwise hold a
    // copy of the full frame table per invocation for the session's
    // lifetime.
    val ranked = frames
      .withColumn("rk", row_number().over(byBucket.orderBy($"vid", $"fidx")))
      .withColumn("bsz", count(lit(1)).over(byBucket))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try ranked.as("a").join(ranked.as("b"),
        col("a.fhash") === col("b.fhash") && col("a.vid") < col("b.vid") &&
          (col("a.bsz") <= thr || col("a.rk") + 1 === col("b.rk")))
      .select(col("a.vid").as("vida"), col("b.vid").as("vidb"),
        col("a.nf").as("nfa"), col("b.nf").as("nfb"),
        col("a.fidx").as("fa"), col("b.fidx").as("fb"))
      .localCheckpoint()
    finally { ranked.unpersist(); () }
  }

  /** Gate: perceptual VIDEO dedup by frame-hash CONTAINMENT — per-pair
    * shared-frame count; a pair is a duplicate when one side's frames
    * are FULLY CONTAINED in the other's (shared == min(nf_a, nf_b)),
    * which catches the re-encode (all frames shared) and the trim
    * (every remaining frame shared) exactly — the oracle pins the pair
    * set, each pair's kind, and its exact shared-frame count. Set
    * semantics are ORDER-BLIND: a reordered edit also passes this test
    * — [[ddVideoAlign]] is the order-aware refinement that rejects it.
    * 100 TB shape: decode+hash is scan-parallel ([[videoFrameTable]]),
    * the join shuffles 20-byte rows — never pixels — with the
    * mega-bucket guard of [[videoFramePairs]], so candidate volume is
    * the true shared-frame volume plus ~2⁻⁶⁴ noise, linear even on a
    * frame-farm corpus. */
  def ddVideoFrames(s: SparkSession, dir: String): DataFrame = {
    val frames = videoFrameTable(s, ingestVideos(s, dir))
    videoFramePairs(frames)
      .groupBy(col("vida").as("base_id"), col("vidb").as("dup_id"),
        col("nfa"), col("nfb"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") === least(col("nfa"), col("nfb")))
      .select(col("base_id"), col("dup_id"),
        when(col("dup_id") >= VideoTrimOffset, "trimmed")
          .otherwise("reencoded").as("kind"),
        col("shared").cast("int").as("shared_frames"))
  }

  /** [[ingestVideos]] plus a REORDERED decoy: docs ≡2 (mod 4) get a
    * copy whose frames are REVERSED (the shuffled-edit / reversed-clip
    * shape). Every frame is shared, so set containment accepts the
    * decoy as a full duplicate; no single temporal offset aligns more
    * than one frame of a reversal (offsets 2i−(nf−1) are all
    * distinct), so the alignment gate rejects it — the exact semantic
    * line between [[ddVideoFrames]] and [[ddVideoAlign]]. */
  def ingestVideosAligned(s: SparkSession, dir: String): Dataset[ImgRecord] = {
    import s.implicits._
    ingestVideos(s, dir).mapPartitions(_.flatMap { r =>
      if (r.img_id >= VideoReencOffset || r.img_id % 4 != 2) Seq(r)
      else Seq(r, ImgRecord(r.img_id + VideoShuffleOffset,
        VideoCodec.encode(VideoCodec.decode(r.payload).reverse)))
    })
  }

  /** Gate: TEMPORALLY ALIGNED video dedup — the order-aware refinement
    * of [[ddVideoFrames]]. Frame matches vote on their temporal offset
    * (fidx_a − fidx_b); a pair is a duplicate only when ONE offset
    * carries a CONTIGUOUS aligned run covering the shorter side
    * (run == min(nf_a, nf_b)) — catching re-encodes (offset 0) and
    * trims (offset = number of cut intro frames) exactly while
    * REJECTING reordered edits, which containment wrongly accepts: the
    * planted reversed decoy shares every frame yet aligns at no
    * offset, and the oracle pins it absent. Run detection is
    * gaps-and-islands (island = fidx − row_number per (pair, offset)),
    * grouped on a superset of the window's partition keys so the two
    * steps share ONE exchange. 100 TB shape: offset voting and run
    * detection run over candidate frame-match rows (20-byte,
    * mega-bucket-guarded by [[videoFramePairs]]) — never pixels — and
    * per-(pair, offset) state is bounded by the shorter video's frame
    * count. */
  def ddVideoAlign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = videoFrameTable(s, ingestVideosAligned(s, dir))
    val byOff = org.apache.spark.sql.expressions.Window
      .partitionBy($"vida", $"vidb", $"off").orderBy($"fa")
    videoFramePairs(frames)
      .withColumn("off", $"fa" - $"fb")
      .withColumn("isl", $"fa" - row_number().over(byOff))
      .groupBy($"vida", $"vidb", $"nfa", $"nfb", $"off", $"isl")
      .agg(count(lit(1)).as("run"))
      .filter($"run" === least($"nfa", $"nfb"))
      .select($"vida".as("base_id"), $"vidb".as("dup_id"),
        when($"dup_id" >= VideoShuffleOffset, "reordered")
          .when($"dup_id" >= VideoTrimOffset, "trimmed")
          .otherwise("reencoded").as("kind"),
        $"off".cast("int").as("offset"),
        $"run".cast("int").as("shared_frames"))
  }

  /** The alignment pin: re-encodes align at offset 0 over all nf
    * frames, trims at offset +1 over the nf−1 kept frames, and the
    * reversed decoys (docs ≡2 mod 4) — full duplicates to set
    * containment — appear NOWHERE. */
  val ddVideoAlignSql: String =
    s"""SELECT doc_id AS base_id, doc_id + $VideoReencOffset AS dup_id,
       |  'reencoded' AS kind, 0 AS "offset",
       |  CAST(3 + doc_id % 3 AS INT) AS shared_frames
       |FROM documents WHERE doc_id % 4 = 0
       |UNION ALL
       |SELECT doc_id, doc_id + $VideoTrimOffset, 'trimmed', 1,
       |  CAST(2 + doc_id % 3 AS INT)
       |FROM documents WHERE doc_id % 4 = 1""".stripMargin

  val ddVideoFramesSql: String =
    s"""SELECT doc_id AS base_id, doc_id + $VideoReencOffset AS dup_id,
       |  'reencoded' AS kind, CAST(3 + doc_id % 3 AS INT) AS shared_frames
       |FROM documents WHERE doc_id % 4 = 0
       |UNION ALL
       |SELECT doc_id, doc_id + $VideoTrimOffset, 'trimmed',
       |  CAST(2 + doc_id % 3 AS INT)
       |FROM documents WHERE doc_id % 4 = 1""".stripMargin

  // ------------------------------- audio perceptual dedup (dd_audio_phash)
  /** Window count fixes the 64-bit hash (65 energy sums → 64 gradient
    * bits); every synthetic clip is exactly [[AudioHashLen]] samples. */
  val AudioHashWindows = 65
  val AudioHashLen: Int = (AudioHashWindows - 1) * AudioHop + AudioWin

  /** A tiny length-prefixed audio container ("GA1 <pad>\n" + pad junk
    * + raw 8-bit samples): enough real structure that the decode leg
    * PARSES bytes, and a "re-encode" twin changes the container
    * (different pad) without touching one sample — the duplicate shape
    * byte-level dedup cannot see. */
  object AudioCodec {
    def encode(samples: Array[Byte], pad: Int): Array[Byte] = {
      val junk = Array.tabulate(pad)(i => (i * 37 % 251).toByte)
      s"GA1 $pad\n".getBytes("US-ASCII") ++ junk ++ samples
    }

    def decode(payload: Array[Byte]): Array[Byte] = {
      require(payload.length > 4 && payload(0) == 'G'.toByte &&
        payload(1) == 'A'.toByte && payload(2) == '1'.toByte, "not GA1")
      var i = 4
      var pad = 0
      while (payload(i) != '\n'.toByte) {
        pad = pad * 10 + (payload(i) - '0'.toByte)
        i += 1
      }
      java.util.Arrays.copyOfRange(payload, i + 1 + pad, payload.length)
    }

    /** Sample in 0..249 — avalanche-mixed for the same reason as the
      * image corpus ([[ImageCodec.strongPixel]]); a +1 DC offset never
      * wraps the byte. i < 16384 keeps id*16384+i injective. */
    def sample(id: Long, i: Int): Int =
      (((ImageCodec.strongMix(id * 16384L + i) >>> 40) & 0xFFFFFFL)
        % 250L).toInt

    /** REAL RIFF/WAV container via `javax.sound.sampled` (8-bit
      * unsigned PCM mono — the stock-JVM audio codec), the cross-codec
      * leg mirroring what ImageIO PNG/JPEG prove for images: the same
      * samples in a WAV and a GA1 container must hash identically even
      * though not one byte of the two payloads matches. */
    def encodeWav(samples: Array[Byte]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** WAV → raw unsigned 8-bit samples (byte-exact for PCM_UNSIGNED
      * 8-bit mono, so eHash sees the same stream either way). */
    def decodeWav(payload: Array[Byte]): Array[Byte] = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 8 && fmt.getChannels == 1,
        s"decodeWav: expected 8-bit mono PCM, got $fmt")
      ais.readAllBytes()
    }

    /** Container sniff: RIFF magic → WAV, otherwise the GA1 parse —
      * the mixed-container corpus a real crawl's audio column is. */
    def decodeAuto(payload: Array[Byte]): Array[Byte] =
      if (payload.length >= 4 && payload(0) == 'R'.toByte &&
          payload(1) == 'I'.toByte && payload(2) == 'F'.toByte &&
          payload(3) == 'F'.toByte) decodeWav(payload)
      else decode(payload)

    def synthesize(id: Long, dc: Int): Array[Byte] =
      Array.tabulate(AudioHashLen)(i => (sample(id, i) + dc).toByte)

    /** 64-bit ENERGY-GRADIENT hash over the STFT framing the
      * mm_audio_windows operator already uses: integer window energy
      * sums, bit = sum(w) > sum(w+1). Windows are equal-sized, so a
      * uniform DC offset adds the same constant to both sides of every
      * compare and the hash is EXACTLY invariant — the audio analog of
      * dHash's brightness invariance, no cross-multiply needed. */
    def eHash(samples: Array[Byte]): Long = {
      require(samples.length >= AudioHashLen,
        s"eHash needs >= $AudioHashLen samples, got ${samples.length}")
      val sums = Array.tabulate(AudioHashWindows) { w =>
        var s = 0L
        var i = w * AudioHop
        val end = i + AudioWin
        while (i < end) { s += (samples(i) & 0xFF); i += 1 }
        s
      }
      var h = 0L
      var w = 0
      while (w < 64) {
        if (sums(w) > sums(w + 1)) h |= 1L << w
        w += 1
      }
      h
    }
  }

  /** The audio-dedup corpus: every doc a base clip; docs ≡0 (mod 3) a
    * container re-encode (same samples, different bytes), docs ≡1 a
    * DC+1 twin (every sample byte differs). */
  def ingestAudioCorpus(s: SparkSession, dir: String): Dataset[ImgRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long])
      .mapPartitions(_.flatMap { id =>
        val samples = AudioCodec.synthesize(id, 0)
        val base = ImgRecord(id, AudioCodec.encode(samples, 7))
        val twin = (id % 3) match {
          case 0 => Seq(ImgRecord(id + ReencodeOffset,
            AudioCodec.encode(samples, 23)))
          case 1 => Seq(ImgRecord(id + BrightOffset,
            AudioCodec.encode(AudioCodec.synthesize(id, 1), 7)))
          case _ => Nil
        }
        base +: twin
      })
  }

  /** Gate: PERCEPTUAL audio dedup — container parse + energy-gradient
    * hash on the scan, then the SAME banded candidate machinery as
    * [[ddImagePhash]] ([[phashPairs]] is hash-agnostic). The oracle
    * pins exactly the planted twins: a re-encoded container (byte
    * dedup blind — byte_dup=false pinned) and a DC-offset copy (every
    * byte differs; only the gradient invariance catches it), each at
    * Hamming 0. */
  def ddAudioPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = ingestAudioCorpus(s, dir)
      .mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.map { r =>
        (r.img_id, AudioCodec.eHash(AudioCodec.decode(r.payload)),
          java.util.Arrays.hashCode(r.payload).toLong)
      })).toDF("img_id", "dhash", "payload_fp")
    phashPairs(hashed)
      .select($"base_id", $"dup_id",
        when($"dup_id" >= BrightOffset, "dc_offset")
          .otherwise("reencoded").as("kind"),
        $"hamming".cast("int").as("hamming"), $"byte_dup")
  }

  val ddAudioPhashSql: String =
    s"""SELECT doc_id AS base_id, doc_id + $ReencodeOffset AS dup_id,
       |  'reencoded' AS kind, 0 AS hamming, FALSE AS byte_dup
       |FROM documents WHERE doc_id % 3 = 0
       |UNION ALL
       |SELECT doc_id, doc_id + $BrightOffset, 'dc_offset', 0, FALSE
       |FROM documents WHERE doc_id % 3 = 1""".stripMargin

  /** The cross-codec audio corpus: every doc a GA1 base clip; docs ≡0
    * (mod 3) the SAME samples re-encoded as a real RIFF/WAV (zero
    * shared bytes between the payloads), docs ≡1 a WAV carrying a DC+1
    * twin — the cross-codec AND content-invariance class at once. */
  def ingestAudioWavCorpus(s: SparkSession, dir: String): Dataset[ImgRecord] = {
    import s.implicits._
    Spread(Tables.documents(s, dir).select($"doc_id").as[Long])
      .mapPartitions(_.flatMap { id =>
        val samples = AudioCodec.synthesize(id, 0)
        val base = ImgRecord(id, AudioCodec.encode(samples, 7))
        val twin = (id % 3) match {
          case 0 => Seq(ImgRecord(id + ReencodeOffset,
            AudioCodec.encodeWav(samples)))
          case 1 => Seq(ImgRecord(id + BrightOffset,
            AudioCodec.encodeWav(AudioCodec.synthesize(id, 1))))
          case _ => Nil
        }
        base +: twin
      })
  }

  /** Gate: CROSS-CODEC audio dedup — the decode leg sniffs the
    * container (RIFF → `javax.sound.sampled` WAV, else the GA1 parse)
    * and the energy-gradient hash closes over both, so a GA1 base and
    * its WAV re-encode pair at Hamming 0 with `byte_dup=false`
    * (payloads share no bytes — container dedup is blind to this
    * class), and the WAV DC+1 twin pairs through the hash's gradient
    * invariance on top of the codec change. Same banded machinery as
    * every perceptual gate ([[phashPairs]]). */
  def ddAudioWav(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = ingestAudioWavCorpus(s, dir)
      .mapPartitions(_.grouped(DecodeStub.BatchSize).flatMap(_.map { r =>
        (r.img_id, AudioCodec.eHash(AudioCodec.decodeAuto(r.payload)),
          java.util.Arrays.hashCode(r.payload).toLong)
      })).toDF("img_id", "dhash", "payload_fp")
    phashPairs(hashed)
      .select($"base_id", $"dup_id",
        when($"dup_id" >= BrightOffset, "wav_dc")
          .otherwise("wav_reencode").as("kind"),
        $"hamming".cast("int").as("hamming"), $"byte_dup")
  }

  val ddAudioWavSql: String =
    s"""SELECT doc_id AS base_id, doc_id + $ReencodeOffset AS dup_id,
       |  'wav_reencode' AS kind, 0 AS hamming, FALSE AS byte_dup
       |FROM documents WHERE doc_id % 3 = 0
       |UNION ALL
       |SELECT doc_id, doc_id + $BrightOffset, 'wav_dc', 0, FALSE
       |FROM documents WHERE doc_id % 3 = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> mmDecodeMeta,
    "mm_decode_ppm" -> mmDecodePpm,
    "mm_decode_png" -> mmDecodePng,
    "mm_frame_sample" -> mmFrameSample,
    "mm_audio_windows" -> mmAudioWindows,
    "mm_patches" -> mmPatches,
    "dd_image_phash" -> ddImagePhash,
    "dd_image_jpeg" -> ddImageJpeg,
    "dd_audio_phash" -> ddAudioPhash,
    "dd_audio_wav" -> ddAudioWav,
    "dd_video_frames" -> ddVideoFrames,
    "dd_video_align" -> ddVideoAlign,
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" -> mmDecodeMetaSql,
    "mm_decode_ppm" -> mmDecodePpmSql,
    "mm_decode_png" -> mmDecodePngSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_audio_windows" -> mmAudioWindowsSql,
    "mm_patches" -> mmPatchesSql,
    "dd_image_phash" -> ddImagePhashSql,
    "dd_image_jpeg" -> ddImageJpegSql,
    "dd_audio_phash" -> ddAudioPhashSql,
    "dd_audio_wav" -> ddAudioWavSql,
    "dd_video_frames" -> ddVideoFramesSql,
    "dd_video_align" -> ddVideoAlignSql,
  )
}
