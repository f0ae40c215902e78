package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted via a partition-local batch
  * stub.
  *
  * The Spark-side shape is the real thing a 100 TB media pipeline needs —
  * binary column + typed metadata struct, partition-parallel batched
  * decode with a typed schema, deterministic frame sampling via a
  * generator — while the actual codec call is STUBBED (no image/audio
  * libraries in this environment): `DecodeStub.decodeBatch` derives
  * deterministic fake features from the payload bytes. Swapping in a real
  * decoder changes ONE function; every schema, partition, and batch shape
  * stays.
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

  /** STUB decoder — deterministic fake in place of a codec library.
    * Real implementation would decode `payload` (JPEG/PNG/WAV...) per
    * batch; the fake derives "brightness" = mean of the first 8 payload
    * bytes, keeping the whole pipeline testable end-to-end. */
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
    Tables.documents(s, dir).select($"doc_id").as[Long].map { id =>
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
    Tables.documents(s, dir)
      .select($"doc_id", encode($"text", "UTF-8").as("payload"),
        lit(16000).as("sample_rate"),
        length($"text").cast("int").as("n_samples"))
      .as[AudioRecord]
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> mmDecodeMeta,
    "mm_decode_ppm" -> mmDecodePpm,
    "mm_frame_sample" -> mmFrameSample,
    "mm_audio_windows" -> mmAudioWindows,
    "mm_patches" -> mmPatches,
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_meta" -> mmDecodeMetaSql,
    "mm_decode_ppm" -> mmDecodePpmSql,
    "mm_frame_sample" -> mmFrameSampleSql,
    "mm_audio_windows" -> mmAudioWindowsSql,
    "mm_patches" -> mmPatchesSql,
  )
}
