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
    * driver-side merge loop; cached per corpus fingerprint so repeated
    * queries in one JVM reuse the vocab (and a regenerated dataset
    * retrains instead of serving stale merges). */
  def cachedVocab(s: SparkSession, dir: String): BpeVocab = {
    val key = (dir, docsFingerprint(s, dir))
    vocabCache.computeIfAbsent(key, { _ =>
      val wc = Tables.documents(s, dir)
        .select(explode(graft.functions.ShingleFunctions.tokens(col("text")))
          .as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("w")).limit(TrainTopWords)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      BpeVocab(Bpe.train(wc, TrainMerges))
    })
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

  /** The REPLACE-chain replay of [[PinnedMerges]] over one word `w`,
    * generated from the same list the expression uses. */
  private def replaySql(wExpr: String): String = {
    val base =
      s"' ' || regexp_replace($wExpr, '(.)', '\\1 ', 'g') || '${Bpe.EndMark} '"
    PinnedMerges.foldLeft(base) { case (acc, (a, b)) =>
      s"REPLACE($acc, ' $a $b ', ' ${a + b} ')"
    }
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bpe_pinned" -> taBpePinned,
    "ta_bpe" -> taBpe,
    "sa_pack_bins_bpe" -> saPackBinsBpe,
  )

  val oracles: Map[String, String] = Map(
    "ta_bpe_pinned" -> taBpePinnedSql,
    "ta_bpe" -> taBpeSql,
    "sa_pack_bins_bpe" -> saPackBinsBpeSql,
  )
}
