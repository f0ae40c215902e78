package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Bpe, BpeFunctions, BpeVocab}

/** Corpus-trained BPE tokenization gates (see [[graft.functions.Bpe]]
  * for the algorithm and its scale shape).
  *
  * Verification strategy, two layers:
  *  - `ta_bpe_pinned`: the segmentation ENGINE under a PINNED merge
  *    table, with a FULL DuckDB oracle — merges replay as a chain of
  *    string REPLACEs over the space-delimited symbol string (rank
  *    order ≡ min-rank iterative application; see Bpe doc), so per-doc
  *    token counts are bit-exact across engines. The replace chain is
  *    GENERATED from the same Scala merge list the expression uses —
  *    one source of truth.
  *  - `ta_bpe`: TRAINING on the corpus (top-word table → deterministic
  *    merge loop), gated by invariants the trained vocab must satisfy —
  *    lossless round-trip on every document, closed vocabulary, actual
  *    compression — as an envelope (floating training state itself is
  *    not SQL-reproducible; the booleans are).
  *
  * `sa_pack_bins_bpe` retrofits the token-budget bin packer with REAL
  * BPE token counts (pinned vocab ⇒ the packing remains fully oracled
  * end-to-end: replayed counts → same running-sum window in DuckDB). */
object BpeTokenizer {

  /** Pinned 16-merge table for the oracle-exact gates. Any fixed list
    * is valid (both engines replay the same ranks); this one is chosen
    * to actually fire on the synthetic corpus vocabulary. */
  val PinnedMerges: IndexedSeq[(String, String)] = Vector(
    ("e", Bpe.EndMark), ("t", "h"), ("a", "t"), ("e", "r"),
    ("i", "n"), ("o", "r"), ("a", "r"), ("s", "t"),
    ("th", s"e${Bpe.EndMark}"), ("er", Bpe.EndMark), ("in", Bpe.EndMark),
    ("t", Bpe.EndMark), ("w", Bpe.EndMark), ("n", Bpe.EndMark),
    ("a", "ta"), ("o", "w"))

  // replay-soundness constraints (see rankSql and taChunksBpe docs):
  // unequal sides (self-overlapping runs would re-order), and no end
  // marker inside a LEFT side (doc-level replay must not cross words)
  require(PinnedMerges.forall { case (a, b) =>
    a != b && !a.contains(Bpe.EndMark)
  }, "pinned BPE merges must have a != b and marker-free left sides")

  val PinnedVocab: BpeVocab = BpeVocab(PinnedMerges)

  /** Trained-vocab sizing: bounded driver state (top words, merges). */
  val TrainTopWords = 2000
  val TrainMerges = 64

  private val vocabCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), BpeVocab]()

  private def docsFingerprint(s: SparkSession, dir: String): Long = {
    val path = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.listStatus(path).foldLeft(0L) { (acc, st) =>
      ((acc * 31 + st.getPath.getName.hashCode) * 31 + st.getLen) * 31 +
        st.getModificationTime
    }
  }

  /** One corpus aggregate (word → count, top-V deterministic), then the
    * driver-side merge loop. */
  def trainFromCorpus(s: SparkSession, dir: String): BpeVocab = {
    val wc = Tables.documents(s, dir)
      .select(explode(graft.functions.ShingleFunctions.tokens(col("text")))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w")).limit(TrainTopWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    BpeVocab(Bpe.train(wc, TrainMerges))
  }

  /** [[trainFromCorpus]] cached per corpus fingerprint so repeated
    * queries in one JVM reuse the vocab (and a regenerated dataset
    * retrains instead of serving stale merges). */
  def cachedVocab(s: SparkSession, dir: String): BpeVocab = {
    val key = (dir, docsFingerprint(s, dir))
    vocabCache.computeIfAbsent(key, _ => trainFromCorpus(s, dir))
  }

  // --------------------------------------------------- stored vocabulary
  //
  // A production tokenizer must be FROZEN: every pipeline stage of a
  // training run (counting, chunking, packing, the model itself) must
  // segment identically, across JVMs and weeks. The store is the
  // PqIndex discipline applied to the merge table: built into a staging
  // dir and ATOMIC_MOVE-renamed into place (a concurrent builder loses
  // cleanly), tagged with a format version (foreign tags are refused,
  // never probed), carrying the training corpus fingerprint and a
  // CONTENT hash of the merges so downstream artifacts can pin the
  // exact vocabulary they were produced with. ensure() LOADS when
  // present — corpus drift does NOT silently retrain (that is the
  // point); rebuilding is an explicit act.

  object BpeStore {
    val FormatTag = "graft-bpe-v1"

    /** Content hash of the merge table — the pin for "produced with
      * exactly this vocabulary". */
    def vocabHash(v: BpeVocab): String = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      v.merges.foreach { case (a, b) =>
        md.update(a.getBytes("UTF-8")); md.update(0.toByte)
        md.update(b.getBytes("UTF-8")); md.update(1.toByte)
      }
      md.digest().take(16).map("%02x".format(_)).mkString
    }

    case class Meta(format: String, fingerprint: Long, topWords: Int,
        numMerges: Int, hash: String)

    private def writeStore(store: java.nio.file.Path, v: BpeVocab,
        meta: Meta): Unit = {
      val staging = store.resolveSibling(
        store.getFileName.toString + ".tmp-" +
          java.util.UUID.randomUUID().toString.take(8))
      java.nio.file.Files.createDirectories(staging)
      java.nio.file.Files.write(staging.resolve("merges.tsv"),
        v.merges.map { case (a, b) => s"$a\t$b" }.mkString("\n")
          .getBytes("UTF-8"))
      java.nio.file.Files.write(staging.resolve("meta"),
        Seq(meta.format, meta.fingerprint.toString, meta.topWords.toString,
          meta.numMerges.toString, meta.hash).mkString("\n")
          .getBytes("UTF-8"))
      try java.nio.file.Files.move(staging, store,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException |
             _: java.nio.file.AccessDeniedException =>
          // a concurrent builder won the rename; its store is complete
          // and (deterministic training) identical — discard staging
          staging.toFile.listFiles.foreach(_.delete())
          java.nio.file.Files.deleteIfExists(staging)
      }
    }

    def readMeta(storePath: String): Meta = {
      val lines = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(storePath, "meta")), "UTF-8").split("\n")
      require(lines.length >= 5 && lines(0) == FormatTag,
        s"bpe store $storePath has format '${lines.headOption.getOrElse("")}'" +
          s" — this reader understands only $FormatTag")
      Meta(lines(0), lines(1).toLong, lines(2).toInt, lines(3).toInt,
        lines(4))
    }

    def load(storePath: String): BpeVocab = {
      readMeta(storePath) // format check
      val merges = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(storePath, "merges.tsv")), "UTF-8")
        .split("\n").toIndexedSeq.filter(_.nonEmpty).map { l =>
          val t = l.split("\t", 2); (t(0), t(1))
        }
      BpeVocab(merges)
    }

    /** Load the frozen vocabulary, or train-and-store it if absent. */
    def ensure(s: SparkSession, dir: String, storePath: String): BpeVocab = {
      val store = java.nio.file.Paths.get(storePath)
      if (java.nio.file.Files.isDirectory(store)) return load(storePath)
      val v = trainFromCorpus(s, dir)
      writeStore(store, v, Meta(FormatTag, docsFingerprint(s, dir),
        TrainTopWords, TrainMerges, vocabHash(v)))
      load(storePath)
    }
  }

  // -------------------------------------------------- ta_bpe_pinned gate

  def taBpePinned(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(graft.functions.ShingleFunctions.tokens(col("text")))
          .cast("long").as("n_words"),
        size(BpeFunctions.bpe_tokens(col("text"), PinnedVocab))
          .cast("long").as("n_tokens"))
      .filter(col("n_words") > 0)

  /** One merge rank as SQL: REPLACE applied TWICE. A single REPLACE
    * scans left-to-right consuming the pattern's trailing space, so of
    * a run of ADJACENT occurrences (" th e</w> th e</w> ") it merges
    * only every other one — the second pass picks up the skipped ones,
    * which by then are isolated (leftovers are never adjacent: a skip
    * happens only right after a match). Exactly the kernel's one-pass
    * merge-all, PROVIDED a ≠ b (equal sides self-overlap and the
    * leftmost-disjoint choice can differ on runs ≥ 5) — [[PinnedMerges]]
    * honors that, and BpeTokenizerSpec pins the constraint. */
  private def rankSql(acc: String, a: String, b: String): String = {
    val once = s"REPLACE($acc, ' $a $b ', ' ${a + b} ')"
    s"REPLACE($once, ' $a $b ', ' ${a + b} ')"
  }

  /** The REPLACE-chain replay of [[PinnedMerges]] over one word `w`,
    * generated from the same list the expression uses. */
  private def replaySql(wExpr: String): String = {
    val base =
      s"' ' || regexp_replace($wExpr, '(.)', '\\1 ', 'g') || '${Bpe.EndMark} '"
    PinnedMerges.foldLeft(base) { case (acc, (a, b)) => rankSql(acc, a, b) }
  }

  val taBpePinnedSql: String =
    s"""WITH words AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> t <> '')) AS w
       |  FROM documents)
       |SELECT doc_id, COUNT(*) AS n_words,
       |  CAST(SUM(len(list_filter(string_split(trim(${replaySql("w")}), ' '),
       |    x -> x <> ''))) AS BIGINT) AS n_tokens
       |FROM words GROUP BY doc_id""".stripMargin

  // --------------------------------------------------------- ta_bpe gate

  /** Trained-vocab envelope: n_docs exact; round-trip (decoding the
    * token stream — end markers back to spaces — reproduces the word
    * sequence of EVERY document), closed vocabulary (every emitted
    * token is a single character, the end marker, or a trained merge
    * product), and real compression (the merges fire: total tokens <
    * total unmerged symbols) asserted corpus-wide. */
  def taBpe(s: SparkSession, dir: String): DataFrame = {
    val vocab = cachedVocab(s, dir)
    val toks = graft.functions.ShingleFunctions.tokens(col("text"))
    val bpe = BpeFunctions.bpe_tokens(col("text"), vocab)
    val perDoc = Tables.documents(s, dir)
      .filter(size(toks) > 0)
      .select(
        // decode: concat symbols, end markers become separators
        (replace(array_join(bpe, ""), lit(Bpe.EndMark), lit(" ")) ===
          concat(array_join(toks, " "), lit(" "))).as("rt_ok"),
        size(bpe).cast("long").as("n_bpe"),
        // unmerged symbol count: chars of the words + one marker each
        (length(array_join(toks, "")) + size(toks)).cast("long")
          .as("n_syms"),
        bpe.as("bpe"))
    val allowed = vocab.products + Bpe.EndMark
    val vocabOk = perDoc.select(explode(col("bpe")).as("t")).distinct()
      .filter(length(col("t")) =!= 1 && !col("t").isin(allowed.toSeq: _*))
      .count() == 0
    val agg = perDoc.agg(
      count(lit(1)).as("n_docs"),
      min(col("rt_ok").cast("int")).as("rt_min"),
      sum(col("n_bpe")).as("tot_bpe"),
      sum(col("n_syms")).as("tot_syms")).head()
    import s.implicits._
    Seq((agg.getLong(0), agg.getInt(1) == 1, vocabOk,
      agg.getLong(2) < agg.getLong(3), TrainMerges.toLong))
      .toDF("n_docs", "round_trip_ok", "vocab_ok", "compressed_ok",
        "n_merges")
  }

  val taBpeSql: String =
    s"""SELECT (SELECT COUNT(*) FROM documents
       |    WHERE len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> t <> '')) > 0) AS n_docs,
       |  TRUE AS round_trip_ok, TRUE AS vocab_ok, TRUE AS compressed_ok,
       |  CAST($TrainMerges AS BIGINT) AS n_merges""".stripMargin

  // ---------------------------------------------------- ta_bpe_stored gate

  /** Envelope: the stored-vocabulary lifecycle — build trains and
    * persists, a second ensure() is a pure LOAD that reproduces the
    * merges bit-for-bit (and therefore the content hash), and the
    * loaded vocab equals the in-memory trained one. The store path
    * carries the corpus fingerprint, so a regenerated dataset builds a
    * NEW store instead of silently serving the old tokenizer (within
    * one dataset the store stays frozen — BpeStoreSpec pins that corpus
    * drift does NOT retrain a pinned path). */
  def taBpeStored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tag = java.lang.Long.toHexString(docsFingerprint(s, dir))
    val store = s"${System.getProperty("java.io.tmpdir")}/graft_bpe/" +
      s"${dir.replaceAll("[^A-Za-z0-9]", "_")}-$tag"
    val v1 = BpeStore.ensure(s, dir, store)
    val v2 = BpeStore.ensure(s, dir, store)
    val trained = cachedVocab(s, dir)
    Seq((v1.merges.size.toLong, v1.merges == v2.merges,
      v1.merges == trained.merges,
      BpeStore.readMeta(store).hash == BpeStore.vocabHash(v1)))
      .toDF("n_merges", "load_stable", "matches_trained", "hash_pinned")
  }

  val taBpeStoredSql: String =
    s"""SELECT CAST($TrainMerges AS BIGINT) AS n_merges,
       |  TRUE AS load_stable, TRUE AS matches_trained,
       |  TRUE AS hash_pinned""".stripMargin

  // ------------------------------------------------ sa_pack_bins_bpe gate

  /** [[Sampling.saPackBins]] with REAL (pinned-vocab) BPE token counts:
    * the bin boundaries move to where the actual token budget lands,
    * and the whole pipeline — segmentation, counts, running-sum packing
    * — stays bit-exact against the oracle. */
  def saPackBinsBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source",
      size(BpeFunctions.bpe_tokens($"text", PinnedVocab)).cast("long")
        .as("n_tokens"))
      .filter($"n_tokens" > 0)
    Sampling.packBins(docs, $"source", $"doc_id", $"n_tokens",
      Sampling.PackBudget)
  }

  val saPackBinsBpeSql: String =
    s"""WITH words AS (
       |  SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      t -> t <> '')) AS w
       |  FROM documents),
       |cnt AS (
       |  SELECT doc_id,
       |    CAST(SUM(len(list_filter(string_split(trim(${replaySql("w")}), ' '),
       |      x -> x <> ''))) AS BIGINT) AS n_tokens
       |  FROM words GROUP BY doc_id),
       |d AS (SELECT documents.doc_id, source, n_tokens
       |  FROM documents JOIN cnt ON documents.doc_id = cnt.doc_id
       |  WHERE n_tokens > 0)
       |SELECT doc_id, source, n_tokens,
       |  CAST(FLOOR((cum - n_tokens) / ${Sampling.PackBudget}.0) AS BIGINT)
       |    AS bin
       |FROM (SELECT doc_id, source, n_tokens,
       |  SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM d) t""".stripMargin

  // -------------------------------------------------- ta_chunks_bpe gate

  /** [[TextAnalysis.taChunks]] rebased from word windows onto REAL BPE
    * token windows (pinned vocab): chunk boundaries land on token
    * budget, chunk text decodes the symbols back (end markers →
    * spaces). Oracle replays the merge chain over the WHOLE document at
    * once — sound because no trained merge has a left component
    * containing the end marker (nothing follows `</w>` within a word),
    * so merges never fire across a word boundary and the doc-level
    * replay equals the per-word one. */
  def taChunksBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import TextAnalysis.{ChunkSize, ChunkStride}
    val toks = BpeFunctions.bpe_tokens($"text", PinnedVocab)
    val nTok = size(toks)
    val nChunks = greatest(
      ceil((nTok - lit(ChunkSize)).cast("double") / ChunkStride).cast("int")
        + lit(1),
      lit(1))
    Tables.documents(s, dir)
      .filter(size(graft.functions.ShingleFunctions.tokens($"text")) > 0)
      .select($"doc_id", toks.as("toks"), nChunks.as("nc"))
      .select($"doc_id", $"toks", posexplode(sequence(lit(0), $"nc" - 1)))
      .select($"doc_id",
        col("col").cast("long").as("chunk_id"),
        size(slice($"toks", col("col") * ChunkStride + 1, lit(ChunkSize)))
          .cast("long").as("chunk_tokens"),
        replace(array_join(
            slice($"toks", col("col") * ChunkStride + 1, lit(ChunkSize)), ""),
          lit(Bpe.EndMark), lit(" ")).as("chunk_text"))
  }

  val taChunksBpeSql: String = {
    import TextAnalysis.{ChunkSize, ChunkStride}
    // whole-document symbolization: words separated/terminated by \x01,
    // every char space-delimited, \x01 becomes the </w> symbol
    val docSyms = "' ' || REPLACE(regexp_replace(" +
      "regexp_replace(trim(lower(text)), '\\s+', chr(1), 'g') || chr(1), " +
      "'(.)', '\\1 ', 'g'), chr(1) || ' ', '</w> ')"
    val replayed = PinnedMerges.foldLeft(docSyms) { case (acc, (a, b)) =>
      rankSql(acc, a, b)
    }
    val toks = s"list_filter(string_split(trim($replayed), ' '), x -> x <> '')"
    val nTok = s"len(toks)"
    val win = s"toks[(i*$ChunkStride + 1):(i*$ChunkStride + $ChunkSize)]"
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents
       |  WHERE len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |    x -> x <> '')) > 0)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |  CAST(len($win) AS BIGINT) AS chunk_tokens,
       |  REPLACE(array_to_string($win, ''), '</w>', ' ') AS chunk_text
       |FROM t, UNNEST(range(0, GREATEST(
       |  CAST(CEIL(CAST($nTok - $ChunkSize AS DOUBLE) / $ChunkStride)
       |    AS INT) + 1, 1))) AS u(i)""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_pinned" -> taBpePinned,
    "ta_bpe" -> taBpe,
    "sa_pack_bins_bpe" -> saPackBinsBpe,
    "ta_chunks_bpe" -> taChunksBpe,
    "ta_bpe_stored" -> taBpeStored,
  )

  val oracles: Map[String, String] = Map(
    "ta_bpe_pinned" -> taBpePinnedSql,
    "ta_bpe" -> taBpeSql,
    "sa_pack_bins_bpe" -> saPackBinsBpeSql,
    "ta_chunks_bpe" -> taChunksBpeSql,
    "ta_bpe_stored" -> taBpeStoredSql,
  )
}
