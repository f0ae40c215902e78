package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: language ID (stopword-marker heuristic), quality
  * scoring, token counting, and content fingerprinting.
  *
  * Everything is built from codegen'd builtin expressions (split /
  * filter / transform / aggregate higher-order functions) — no UDFs, no
  * shuffle except where an aggregation genuinely needs one — so each
  * operator runs scan-parallel at any scale.
  */
object TextAnalysis {

  /** Non-empty whitespace tokens of the lowercased text — the native
    * codegen'd Tokens expression (identical semantics to
    * `filter(split(lower(text)), _ != "")`, which is CodegenFallback). */
  def tokens(text: Column): Column =
    graft.functions.ShingleFunctions.tokens(text)

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  // DuckDB equivalent of tokens, for the oracles — the single source of
  // truth for the tokenizer's SQL twin (Dedup and Sampling reference it;
  // a drifting copy would silently diverge an oracle from the Spark side).
  private[operators] val toksSql =
    "list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')"
  private def countInSql(words: Seq[String]): String =
    s"len(list_filter($toksSql, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  // ------------------------------------------------------------- language ID
  // n-gram/stopword-marker heuristic: count language-specific marker words,
  // argmax with a fixed priority order for ties. (The synthetic corpus
  // shares one vocabulary, so predictions skew English — the operator's
  // contract is the deterministic heuristic, graded against the oracle;
  // the `lang` column ships alongside as ground truth for accuracy evals.)
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "a", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un"),
    "es" -> Seq("el", "los", "que", "de", "un", "una"))

  def taLangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // materialize tokens once per row (projection stage), then count —
    // the single-select form re-splits `text` for every marker column
    val Seq(en, de, fr, es) = markers.map { case (_, ws) =>
      countIn($"toks", ws).cast("long")
    }
    Tables.documents(s, dir)
      .select($"doc_id", $"lang", tokens($"text").as("toks"))
      .select(
        $"doc_id", $"lang",
        en.as("c_en"), de.as("c_de"), fr.as("c_fr"), es.as("c_es"),
        when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es").as("pred_lang"))
  }

  val taLangIdSql: String = {
    val Seq(en, de, fr, es) = markers.map { case (_, ws) => countInSql(ws) }
    s"""SELECT doc_id, lang, $en AS c_en, $de AS c_de, $fr AS c_fr, $es AS c_es,
       |  CASE WHEN $en >= $de AND $en >= $fr AND $en >= $es THEN 'en'
       |       WHEN $de >= $fr AND $de >= $es THEN 'de'
       |       WHEN $fr >= $es THEN 'fr'
       |       ELSE 'es' END AS pred_lang
       |FROM documents""".stripMargin
  }

  // ------------------------------------------- language ID, n-gram profiles
  // The stronger standard technique: score = cosine between the doc's
  // character-bigram count vector (over a fixed bigram vocabulary) and a
  // per-language frequency profile. Profiles are PLAN-TIME LITERALS
  // (public per-language bigram frequencies, unit-normalized at class
  // load), so the whole operator is scan-parallel codegen'd arithmetic:
  // per bigram one replace+length count, then one VecDot per language.
  // The doc-side norm cancels in the argmax (it is language-independent),
  // so scores are dot(counts, unitProfile) — no NaN guard needed, and
  // the DuckDB oracle replays the identical arithmetic bit-for-bit.
  private val bigramVocab: Seq[String] = Seq(
    "th", "he", "er", "an", "de", "ie", "un", "es",
    "le", "la", "qu", "en", "st", "ch", "on", "ar")

  private val rawProfiles: Seq[(String, Array[Double])] = Seq(
    "en" -> Array(3.56, 3.07, 2.05, 1.99, 0.30, 0.30, 0.30, 0.80,
      0.60, 0.30, 0.10, 1.40, 0.90, 0.60, 1.80, 1.00),
    "de" -> Array(0.20, 1.00, 3.90, 1.20, 1.50, 1.80, 1.30, 1.00,
      0.60, 0.20, 0.05, 3.90, 1.20, 2.70, 0.80, 0.50),
    "fr" -> Array(0.10, 0.30, 1.50, 1.50, 2.20, 1.00, 1.00, 2.60,
      2.20, 1.50, 1.20, 2.40, 0.50, 0.50, 2.00, 0.60),
    "es" -> Array(0.05, 0.30, 1.50, 1.50, 2.50, 0.80, 1.00, 2.30,
      0.90, 2.50, 1.00, 2.10, 0.60, 0.30, 1.40, 1.20))

  /** Unit-normalized, then QUANTIZED to k/2^20: a dyadic rational both
    * engines can construct bit-exactly from the integer k (DuckDB's
    * decimal-literal parser is off by 1 ULP for long mantissas — it
    * divides a >2^53 digit string by a power of ten in double math — so
    * weights are shipped as `k / 1048576.0`, which is exact in IEEE
    * arithmetic, rather than as printed decimals). */
  private val profileInts: Seq[(String, Array[Long])] =
    rawProfiles.map { case (l, w) =>
      val n = math.sqrt(w.map(x => x * x).sum)
      (l, w.map(x => math.round(x / n * (1L << 20))))
    }

  private val profiles: Seq[(String, Array[Double])] =
    profileInts.map { case (l, ks) =>
      (l, ks.map(k => k.toDouble / (1L << 20)))
    }

  def langIdNgram(docs: DataFrame): DataFrame = {
    val low = lower(col("text"))
    // non-overlapping occurrence count via replace — identical semantics
    // in both engines ("aaa" contains "aa" once)
    val counts = array(bigramVocab.map(b =>
      ((length(low) - length(replace(low, lit(b), lit(""))))
        .cast("double") / 2.0)): _*)
    val scores = profiles.map { case (l, w) =>
      graft.functions.VectorFunctions.vec_dot(counts, typedLit(w)).as(s"s_$l")
    }
    val Seq(en, de, fr, es) = profiles.map { case (l, _) => col(s"s_$l") }
    docs
      .select((col("doc_id") +: col("lang") +: scores): _*)
      .withColumn("pred_lang",
        when(en >= de && en >= fr && en >= es, "en")
          .when(de >= fr && de >= es, "de")
          .when(fr >= es, "fr")
          .otherwise("es"))
  }

  def taLangIdNgram(s: SparkSession, dir: String): DataFrame =
    langIdNgram(Tables.documents(s, dir))

  val taLangIdNgramSql: String = {
    // explicit left-associative multiply-add chain, NOT
    // list_dot_product: DuckDB's kernel does not accumulate strictly
    // sequentially at this width (observed 1e-15 ULP drift), while the
    // parsed `a*w0 + b*w1 + ...` chain reproduces VecDot's loop order
    // bit-for-bit
    val cnt = bigramVocab.map(b =>
      s"(CAST(length(lower(text)) - length(replace(lower(text), '$b', '')) AS DOUBLE) / 2.0)")
    val scoreSelects = profileInts.map { case (l, ks) =>
      cnt.zip(ks).map { case (c, k) => s"$c * ($k / 1048576.0)" }
        .mkString("", " + ", s" AS s_$l")
    }.mkString(",\n  ")
    """SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
      |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
      |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
      |       WHEN s_fr >= s_es THEN 'fr'
      |       ELSE 'es' END AS pred_lang
      |FROM (SELECT doc_id, lang,
      |  """.stripMargin + scoreSelects + "\nFROM documents)"
  }

  // --------------------------------------------------------- quality scoring
  // length / stopword-ratio / mean-token-length heuristics; a composite
  // score in [0,1] from deterministic double arithmetic.
  private val stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "it")

  def taQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nTok = size($"toks").cast("long")
    val nChars = length($"text").cast("long")
    val alphaChars = length(regexp_replace(lower($"text"), "[^a-z]", "")).cast("long")
    val stopRatio = countIn($"toks", stopwords).cast("double") / nTok
    val meanTokLen = (nChars - (nTok - lit(1L))).cast("double") / nTok
    Tables.documents(s, dir)
      .select($"doc_id", $"text", tokens($"text").as("toks"))
      .select(
        $"doc_id", nChars.as("n_chars"), nTok.as("n_tokens"),
        alphaChars.as("n_alpha"),
        stopRatio.as("stopword_ratio"),
        meanTokLen.as("mean_token_len"),
        (least(nTok.cast("double") / lit(50.0), lit(1.0)) * lit(0.5)
          + stopRatio * lit(0.3)
          + (alphaChars.cast("double") / nChars) * lit(0.2)).as("quality_score"))
  }

  val taQualitySql: String = {
    val nTok = s"len($toksSql)"
    s"""SELECT doc_id, CAST(LENGTH(text) AS BIGINT) AS n_chars,
       |  CAST($nTok AS BIGINT) AS n_tokens,
       |  CAST(LENGTH(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |  CAST(${countInSql(stopwords)} AS DOUBLE) / $nTok AS stopword_ratio,
       |  CAST(LENGTH(text) - ($nTok - 1) AS DOUBLE) / $nTok AS mean_token_len,
       |  LEAST(CAST($nTok AS DOUBLE) / 50.0, 1.0) * 0.5
       |    + CAST(${countInSql(stopwords)} AS DOUBLE) / $nTok * 0.3
       |    + CAST(LENGTH(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / LENGTH(text) * 0.2 AS quality_score
       |FROM documents""".stripMargin
  }

  // ----------------------------------------------------------- token counts:
  // whitespace tokens + a BPE-ish segmentation (letter runs / digit runs /
  // single punctuation) + the chars/4 heuristic LLM token estimate.
  def taTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      size(tokens($"text")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower($"text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_ish_tokens"),
      ceil(length($"text") / lit(4.0)).cast("long").as("est_llm_tokens"))
  }

  val taTokensSql: String =
    s"""SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_ish_tokens,
       |  CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS est_llm_tokens
       |FROM documents""".stripMargin

  // ----------------------------------------------------------- repetition:
  // Gopher/C4-style WITHIN-document repetition metrics — the standard
  // pretraining filter for boilerplate/spam ("repetitious documents
  // carry little signal"). Scan-parallel, fully codegen'd (size /
  // array_distinct / the native shingle kernel), and exactly
  // reproducible in the oracle engine:
  //  - distinct_token_ratio: |set(tokens)| / |tokens| (low ⇒ repeated
  //    vocabulary);
  //  - dup_trigram_frac: 1 − |distinct trigrams| / (|tokens| − 2) (high
  //    ⇒ repeated phrases — NGramShingles emits the DISTINCT trigram
  //    set, so the count of repeats is total minus distinct).
  def taRepetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast("long")
    val nTri = greatest(nTok - 2, lit(1L))
    Tables.documents(s, dir).select(
      $"doc_id",
      nTok.as("n_tokens"),
      (size(array_distinct(toks)).cast("double") /
        greatest(nTok, lit(1L))).as("distinct_token_ratio"),
      (lit(1.0) - size(graft.operators.Dedup.shingles($"text")).cast("double") / nTri)
        .as("dup_trigram_frac"))
  }

  val taRepetitionSql: String = {
    val nTok = s"len($toksSql)"
    val shingles =
      s"""CASE WHEN $nTok >= 3
         | THEN list_distinct(list_transform(range($nTok - 2),
         |        i -> $toksSql[i+1] || ' ' || $toksSql[i+2] || ' ' || $toksSql[i+3]))
         | ELSE [array_to_string($toksSql, ' ')] END""".stripMargin.replace("\n", " ")
    s"""SELECT doc_id, CAST($nTok AS BIGINT) AS n_tokens,
       |  CAST(len(list_distinct($toksSql)) AS DOUBLE)
       |    / GREATEST($nTok, 1) AS distinct_token_ratio,
       |  1.0 - CAST(len($shingles) AS DOUBLE)
       |    / GREATEST($nTok - 2, 1) AS dup_trigram_frac
       |FROM documents""".stripMargin
  }

  // ------------------------------------------------------------- chunking:
  // overlapping token windows (size/stride), the standard pre-embedding
  // step of an LLM data pipeline: doc → (doc_id, chunk_id, token count,
  // chunk text). Codegen'd end to end — sequence/posexplode for the
  // window index, slice + concat_ws to materialize the window; no UDF,
  // no shuffle: at corpus scale this is a pure scan-side fan-out whose
  // output is ~len/stride × input.
  val ChunkSize = 64
  val ChunkStride = 32

  def taChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nTok = size(toks)
    // windows start at 0, ChunkStride apart, while start < nTok; ≥1
    // window even for empty/short docs
    val nChunks = greatest(
      ceil((nTok - lit(ChunkSize)).cast("double") / ChunkStride).cast("int")
        + lit(1),
      lit(1))
    Tables.documents(s, dir)
      .select($"doc_id", toks.as("toks"), nChunks.as("nc"))
      .select($"doc_id", $"toks", posexplode(sequence(lit(0), $"nc" - 1)))
      .select($"doc_id",
        col("col").cast("long").as("chunk_id"),
        size(slice($"toks", col("col") * ChunkStride + 1, lit(ChunkSize)))
          .cast("long").as("chunk_tokens"),
        concat_ws(" ", slice($"toks", col("col") * ChunkStride + 1, lit(ChunkSize)))
          .as("chunk_text"))
  }

  val taChunksSql: String = {
    val nTok = s"len($toksSql)"
    val win = s"$toksSql[(i*$ChunkStride + 1):(i*$ChunkStride + $ChunkSize)]"
    s"""SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |  CAST(len($win) AS BIGINT) AS chunk_tokens,
       |  array_to_string($win, ' ') AS chunk_text
       |FROM documents, UNNEST(range(0, GREATEST(
       |  CAST(CEIL(CAST($nTok - $ChunkSize AS DOUBLE) / $ChunkStride) AS INT) + 1, 1))) AS t(i)""".stripMargin
  }

  // --------------------------------------------------------- PII scrubbing:
  // redaction pass a training-data pipeline runs before anything else:
  // emails, phone-shaped sequences, and long digit runs (account/card
  // ids) replaced by typed placeholder tokens, with per-doc redaction
  // counts for audit. Patterns stay inside the regex subset Java and
  // RE2 share, so the oracle replays them exactly; Spark's
  // regexp_replace is global by default, DuckDB's needs the 'g' flag.
  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
  private val idRe = "[0-9]{9,}"

  // order matters: emails first (digits inside stay intact), then PURE
  // long digit runs as ids (a 9+ digit run would otherwise always match
  // the looser phone shape), then phone-shaped spans with separators
  def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        idRe, "<ID>"),
      phoneRe, "<PHONE>")

  def taPiiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      scrubbed($"text").as("scrubbed"),
      size(regexp_extract_all($"text", lit(emailRe), lit(0))).cast("long")
        .as("n_emails"),
      size(regexp_extract_all($"text", lit(phoneRe), lit(0))).cast("long")
        .as("n_phones"))
  }

  val taPiiScrubSql: String =
    s"""SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$emailRe', '<EMAIL>', 'g'),
       |    '$idRe', '<ID>', 'g'),
       |    '$phoneRe', '<PHONE>', 'g') AS scrubbed,
       |  CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '$phoneRe')) AS BIGINT) AS n_phones
       |FROM documents""".stripMargin

  // -------------------------------------------------------- fingerprinting:
  // md5 over whitespace-normalized text — the exact-dedup key. (A rolling
  // Rabin-Karp hash over token windows feeds the shingle machinery in
  // Dedup; here the content fingerprint is the cross-system-stable form.)
  def normalized(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  def taFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(
      $"doc_id",
      md5(normalized($"text")).as("fingerprint"),
      substring(md5(normalized($"text")), 1, 8).as("fp_prefix"))
  }

  val taFingerprintSql: String =
    """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
      |  SUBSTRING(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 8) AS fp_prefix
      |FROM documents""".stripMargin

  // ---------------------------------------- corpus n-gram document freq:
  // explode distinct per-doc shingles → hash-aggregate → deterministic
  // global top-k (TakeOrderedAndProject; count-desc with ngram tiebreak).
  val TopNgrams = 100
  def taTopNgrams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(Dedup.shingles($"text")).as("ngram"))
      .groupBy($"ngram").agg(count(lit(1)).as("doc_freq"))
      .orderBy($"doc_freq".desc, $"ngram".asc)
      .limit(TopNgrams)
  }

  val taTopNgramsSql: String =
    s"""SELECT ngram, COUNT(*) AS doc_freq FROM (
       |  SELECT doc_id, UNNEST(
       |    CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) >= 3
       |     THEN list_distinct(list_transform(range(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) - 2),
       |            i -> list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')[i+1] || ' ' ||
       |                 list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')[i+2] || ' ' ||
       |                 list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')[i+3]))
       |     ELSE [array_to_string(list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> ''), ' ')] END
       |  ) AS ngram FROM documents) t
       |GROUP BY ngram ORDER BY doc_freq DESC, ngram ASC LIMIT $TopNgrams""".stripMargin

  // ------------------------------------------------------- heavy hitters
  /** Frequent tokens via the mergeable Misra–Gries aggregate
    * (graft.functions.HeavyHitters — the third graft sketch after theta
    * and KLL). The plan is one partial/final aggregate: each scan task
    * summarizes its partition into ≤ k counters, the shuffle carries
    * ≤ k (token, count) pairs per task, and the final merge preserves
    * the N/(k+1) bound — the 100 TB-shaped "what are the frequent
    * tokens/domains" query.
    *
    * Gate regime: the corpus vocabulary (31 tokens at every SF) sits
    * below the k=64 counter budget, where MG is provably EXACT, so this
    * hash-matches the true token counts as a full oracle. The
    * over-capacity approximation regime (estimates within N/(k+1),
    * every sufficiently-frequent item retained, bounds stable under any
    * partitioning) is pinned in HeavyHittersSpec on a planted Zipf
    * corpus. */
  val HhK = 64

  def taHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(tokens($"text")).as("token"))
      .agg(graft.functions.HeavyHitterFunctions
        .heavy_hitters($"token", HhK).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item".as("token"), $"e.est".as("est"))
  }

  val taHeavyHittersSql: String =
    s"""SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS est
       |FROM (SELECT unnest($toksSql) AS t FROM documents)
       |GROUP BY t""".stripMargin

  /** OVER-CAPACITY heavy-hitters gate: k=8 counters against the corpus's
    * 31-token vocabulary, so the sketch is genuinely approximating (the
    * k=64 gate above stays in the provably-exact regime). The gate emits
    * exact corpus totals (hash-matched) plus the two Misra–Gries
    * envelope booleans, computed by joining the ≤k-row sketch against
    * the true counts:
    *  - every token with true count > N/(k+1) is retained;
    *  - every estimate lies in [true − N/(k+1), true].
    * Both hold under ANY partitioning by the PODS'12 merge bound — the
    * same claims HeavyHittersSpec pins on a planted Zipf corpus, here
    * oracle-asserted on driver data. */
  val HhKOver = 8

  def taHeavyHittersApprox(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(tokens($"text")).as("token"))
    val sketch = toks
      .agg(graft.functions.HeavyHitterFunctions
        .heavy_hitters($"token", HhKOver).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item".as("token"), $"e.est".as("est"))
    val truth = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val total = truth.agg(sum($"cnt").as("n_total_l")) // 1 row
    val bound = $"n_total_l".cast("double") / (HhKOver + 1)
    truth.join(broadcast(sketch), Seq("token"), "left")
      .crossJoin(broadcast(total))
      .agg(
        max($"n_total_l").as("n_total"),
        count(lit(1)).as("n_vocab"),
        (sum(when($"cnt".cast("double") > bound && $"est".isNull, 1L)
          .otherwise(0L)) === 0L).as("all_frequent_retained"),
        (sum(when($"est".isNotNull &&
          ($"est" > $"cnt" || $"est".cast("double") < $"cnt" - bound), 1L)
          .otherwise(0L)) === 0L).as("est_within_bound"))
  }

  val taHeavyHittersApproxSql: String =
    s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(COUNT(DISTINCT t) AS BIGINT) AS n_vocab,
       |  TRUE AS all_frequent_retained, TRUE AS est_within_bound
       |FROM (SELECT unnest($toksSql) AS t FROM documents)""".stripMargin

  // -------------------------------------------------- count-min frequency
  /** Point-frequency estimates from a count-min sketch (the fourth graft
    * sketch: theta = distincts, KLL = quantiles, Misra–Gries = which
    * items are frequent, count-min = how often is THIS item — for
    * arbitrary later-chosen items in O(depth·width) space independent of
    * vocabulary). Plan is one partial/final aggregate whose shuffle
    * carries a single fixed-size byte blob per task, then a vocab-sized
    * estimate join — the one-pass "frequency service" shape at 100 TB.
    *
    * Gate regime: width 16 against the 31-token vocabulary, so cells
    * genuinely collide and estimates genuinely overcount. The gate
    * hash-matches the exact per-token counts and asserts the two CMS
    * guarantees per token:
    *  - estimates NEVER undercount (deterministic: counters only add
    *    non-negative collision mass);
    *  - est ≤ true + e·N/width (the Markov bound holds per row with
    *    probability 1 − 1/e; the min over depth=4 rows fails with
    *    probability e^−4 ≈ 0.018 per item — on this fixed corpus and
    *    fixed seeds it is a measured fact, stable under any
    *    partitioning because merge is pointwise addition).
    * CmsSketchSpec pins byte-identity under re-partitioning, merge
    * associativity, the format-tag reject, and the bounds on a planted
    * Zipf corpus. */
  val CmsDepth = 4
  val CmsWidth = 16

  def taCmsFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select(explode(tokens($"text")).as("token"))
    val sketch = toks.agg(graft.functions.CmsFunctions
      .cms_sketch($"token", CmsDepth, CmsWidth).as("sk"))
    val truth = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    val total = truth.agg(sum($"cnt").as("n_total_l")) // 1 row
    val est = graft.functions.CmsFunctions.cms_estimate($"sk", $"token")
    truth.crossJoin(broadcast(sketch)).crossJoin(broadcast(total))
      .select($"token", $"cnt",
        (est >= $"cnt").as("never_undercounts"),
        (est.cast("double") <=
          $"cnt" + lit(math.E) * $"n_total_l" / CmsWidth)
          .as("within_markov_bound"))
  }

  val taCmsFreqSql: String =
    s"""SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS cnt,
       |  TRUE AS never_undercounts, TRUE AS within_markov_bound
       |FROM (SELECT unnest($toksSql) AS t FROM documents)
       |GROUP BY t""".stripMargin

  // --------------------------------------------------- token commonness
  /** Corpus-relative token commonness — the unigram-LM quality proxy
    * (CCNet-style filters score docs under a language model; the
    * unigram rung of that ladder needs only the corpus's own token
    * counts): for each doc, the mean global occurrence count of its
    * tokens. Gibberish/OOV-heavy docs score low, stopword-heavy
    * boilerplate scores high; both tails are filter candidates.
    *
    * Numerically EXACT across engines by construction: per-token global
    * counts are bigints, the per-doc numerator is a bigint SUM (no
    * float addition-order hazard at any partitioning), and the single
    * double division happens once at the end. Plan: one token-count
    * aggregate (vocab-sized), joined back to the exploded scan —
    * Spark's planner broadcasts it while it fits; at web-corpus vocab
    * sizes (10⁸+) AQE falls back to a shuffle join on the token, still
    * one keyed shuffle — then a per-doc aggregate. */
  def taCommonness(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, dir)
      .select($"doc_id", explode(tokens($"text")).as("token"))
    val counts = toks.groupBy($"token").agg(count(lit(1)).as("cnt"))
    toks.join(counts, Seq("token"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum($"cnt").as("freq_mass"))
      .select($"doc_id", $"n_tokens",
        ($"freq_mass".cast("double") / $"n_tokens").as("avg_token_count"))
  }

  val taCommonnessSql: String =
    s"""WITH toks AS (SELECT doc_id, unnest($toksSql) AS token FROM documents),
       |counts AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token)
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(c.cnt) AS DOUBLE) / COUNT(*) AS avg_token_count
       |FROM toks t JOIN counts c ON t.token = c.token
       |GROUP BY t.doc_id""".stripMargin

  /** Characteristic terms per document — the TF-IDF idea with a
    * cross-engine-EXACT score: score = tf / df (per-doc term frequency
    * over corpus document frequency). One IEEE double DIVISION of two
    * small integers is correctly rounded in every engine (unlike the
    * usual log-idf, whose `ln` differs in ulps between libms and would
    * flap a hash gate), so ranking by (score DESC, token ASC) is fully
    * deterministic and the gate is a full oracle.
    *
    * Plan shape at 100 TB: tf = one (doc, token)-keyed aggregate; df =
    * one token-keyed distinct-doc aggregate (partial map-side distinct);
    * the tf⋈df join is token-keyed; the top-3-per-doc rank filter plans
    * a map-side WindowGroupLimit pre-prune. No driver-side anything. */
  val CharTermsK = 3

  def taCharTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tf = Tables.documents(s, dir)
      .select($"doc_id", explode(tokens($"text")).as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy($"token")
      .agg(countDistinct($"doc_id").as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
      .orderBy(($"tf".cast("double") / $"df").desc, $"token".asc)
    tf.join(df, Seq("token"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= CharTermsK)
      .select($"doc_id", $"token", $"tf", $"df",
        ($"tf".cast("double") / $"df").as("score"), $"rk")
  }

  val taCharTermsSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, token, COUNT(*) AS tf
       |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
       |  GROUP BY doc_id, token),
       |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf
       |  GROUP BY token)
       |SELECT doc_id, token, tf, df, score, rk FROM (
       |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
       |    CAST(tf.tf AS DOUBLE) / df.df AS score,
       |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.token ASC)
       |      AS rk
       |  FROM tf JOIN df ON tf.token = df.token) t
       |WHERE rk <= $CharTermsK""".stripMargin

  // ------------------------------------------------------- filter funnel:
  // per-filter attribution for a chained quality-filter pipeline — the
  // observability report every production cleaning job publishes (what
  // C4/Gopher/FineWeb papers tabulate as "% removed by each rule").
  // Three numbers per stage: how many docs fail the rule IN ISOLATION
  // (n_fail — is the rule doing anything?), how many are DROPPED AT this
  // stage in pipeline order (n_first_fail — attribution sums to total
  // drops), and the cumulative survivor count (survivors — the funnel).
  // ONE scan computes every rule's boolean; the aggregation is a single
  // 1-row reduce fanned back out with `stack` — no per-rule rescan, so
  // the report costs one pass at any corpus size.
  val FunnelMinTokens = 20L
  val FunnelMaxTokens = 90L
  val FunnelMinStopRatio = 0.03
  val FunnelMinDistinctRatio = 0.35
  private val funnelLangs = Seq("en", "de", "fr", "es")

  def taFilterFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast("long")
    val base = Tables.documents(s, dir).select(
      $"lang", nTok.as("n_tokens"),
      (countIn(toks, stopwords).cast("double") / greatest(nTok, lit(1L)))
        .as("stop_ratio"),
      (size(array_distinct(toks)).cast("double") / greatest(nTok, lit(1L)))
        .as("dtr"))
    val passes: Seq[(String, Column)] = Seq(
      "min_tokens" -> ($"n_tokens" >= FunnelMinTokens),
      "stopwords" -> ($"stop_ratio" >= FunnelMinStopRatio),
      "repetition" -> ($"dtr" >= FunnelMinDistinctRatio),
      "lang_known" -> $"lang".isin(funnelLangs: _*),
      "max_tokens" -> ($"n_tokens" <= FunnelMaxTokens))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    val aggCols = passes.zipWithIndex.flatMap { case ((_, p), i) =>
      val prefix = passes.take(i).map(_._2)
        .foldLeft(lit(true))(_ && _)
      Seq(cnt(!p).as(s"f$i"), cnt(prefix && !p).as(s"ff$i"),
        cnt(prefix && p).as(s"s$i"))
    }
    val one = base.agg(aggCols.head, aggCols.tail: _*)
    val stackArgs = passes.zipWithIndex.map { case ((n, _), i) =>
      s"${i + 1}, '$n', f$i, ff$i, s$i"
    }.mkString(", ")
    one.selectExpr(s"stack(${passes.size}, $stackArgs) " +
      "AS (stage, filter, n_fail, n_first_fail, survivors)")
  }

  val taFilterFunnelSql: String = {
    val nTok = s"len($toksSql)"
    val langs = funnelLangs.map(l => s"'$l'").mkString(", ")
    val names = Seq("min_tokens", "stopwords", "repetition", "lang_known",
      "max_tokens")
    val arms = names.zipWithIndex.map { case (n, i) =>
      s"""SELECT ${i + 1} AS stage, '$n' AS filter, f$i AS n_fail,
         |  ff$i AS n_first_fail, s$i AS survivors FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    val ps = Seq(
      s"n_tokens >= $FunnelMinTokens",
      s"stop_ratio >= $FunnelMinStopRatio",
      s"dtr >= $FunnelMinDistinctRatio",
      s"lang IN ($langs)",
      s"n_tokens <= $FunnelMaxTokens")
    val aggs = ps.zipWithIndex.flatMap { case (p, i) =>
      val prefix = (ps.take(i) :+ "TRUE").mkString(" AND ")
      Seq(
        s"CAST(SUM(CASE WHEN NOT ($p) THEN 1 ELSE 0 END) AS BIGINT) AS f$i",
        s"CAST(SUM(CASE WHEN ($prefix) AND NOT ($p) THEN 1 ELSE 0 END) AS BIGINT) AS ff$i",
        s"CAST(SUM(CASE WHEN ($prefix) AND ($p) THEN 1 ELSE 0 END) AS BIGINT) AS s$i")
    }.mkString(",\n  ")
    s"""WITH b AS (
       |  SELECT lang, CAST($nTok AS BIGINT) AS n_tokens,
       |    CAST(${countInSql(stopwords)} AS DOUBLE)
       |      / GREATEST($nTok, 1) AS stop_ratio,
       |    CAST(len(list_distinct($toksSql)) AS DOUBLE)
       |      / GREATEST($nTok, 1) AS dtr
       |  FROM documents),
       |a AS (SELECT
       |  $aggs
       |FROM b)
       |$arms""".stripMargin
  }

  // ------------------------------------------------- BM25 ranked retrieval
  // Classic Robertson/Sparck-Jones BM25 (public formula) over the corpus:
  // score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
  // idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
  //
  // Plan shape at 100 TB: ONE wide shuffle (per-doc conditional tf
  // aggregate, map-side combined), then a one-row corpus-stats aggregate
  // broadcast onto the per-doc table, then TakeOrderedAndProject for the
  // global top-k — the query terms ride as literals, never a join.
  //
  // Oracle-exactness: every aggregate is integer (tf, dl, df, N exact in
  // doubles), and the float score is a FIXED-ORDER arithmetic chain
  // mirrored token-for-token in the DuckDB SQL — per-term contributions
  // added left-to-right, the one non-representable constant (k1 = 1.2)
  // written as CAST(1.2 AS DOUBLE) so both engines hold the same binary
  // value (a bare 1.2 literal is DECIMAL in DuckDB and re-rounds
  // differently). ln() may differ by 1 ulp between libms, absorbed by
  // ROUND(score, 6).
  val Bm25K1 = 1.2
  val Bm25B = 0.75 // exactly representable; safe as a plain literal
  val Bm25Terms: Seq[String] = Seq("spark", "merge", "window")
  val Bm25TopK = 10

  /** Top-k docs by BM25 over fixed query terms. `docs` needs (doc_id,
    * text); tokenization is lowercased whitespace split. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = Bm25K1,
      b: Double = Bm25B, topK: Int = Bm25TopK): DataFrame = {
    require(terms.nonEmpty && terms.map(_.toLowerCase).distinct.size == terms.size,
      "bm25: terms must be distinct")
    val tok = docs.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tfCols = terms.map(t =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"tf_$t"))
    val perDoc = tok.groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val statCols = Seq(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl")) ++
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
        .cast("double").as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    def contrib(t: String): Column = {
      val tf = col(s"tf_$t").cast("double")
      val df = col(s"df_$t")
      val idf = log((col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
      when(col(s"tf_$t") === 0, lit(0.0)).otherwise(
        idf * (tf * (lit(k1) + lit(1.0))) /
          (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    }
    val score = terms.map(contrib).reduce(_ + _)
    val top = perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), score.as("score"))
      .orderBy(desc("score"), col("doc_id").asc)
      .limit(topK)
    // rank over the ≤ topK rows the TakeOrdered limit already bounded —
    // one partition is the correct plan for a k-row input; the
    // constant-valued (but non-foldable, so the optimizer keeps it)
    // partition key says so explicitly, identical execution, no
    // unbounded-input WindowExec warning
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(coalesce(col("doc_id") * lit(0L), lit(0L)))
          .orderBy(desc("score"), col("doc_id").asc)))
      .select(col("doc_id"), col("rank"), round(col("score"), 6).as("score_r6"))
  }

  def taBm25(s: SparkSession, dir: String): DataFrame =
    bm25(Tables.documents(s, dir), Bm25Terms)

  val taBm25Sql: String = {
    val terms = Bm25Terms
    val tfCases = terms.map(t =>
      s"    SUM(CASE WHEN term = '$t' THEN 1 ELSE 0 END) AS tf_$t").mkString(",\n")
    val dfCols = terms.map(t =>
      s"    CAST(SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_$t").mkString(",\n")
    def contrib(t: String): String =
      s"""CASE WHEN p.tf_$t = 0 THEN CAST(0 AS DOUBLE) ELSE
         |    ln((s.n_docs - s.df_$t + 0.5) / (s.df_$t + 0.5) + 1)
         |    * (CAST(p.tf_$t AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
         |    / (CAST(p.tf_$t AS DOUBLE) + CAST(1.2 AS DOUBLE) * (1.0 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl)) END""".stripMargin
    s"""WITH tok AS (
       |  SELECT doc_id, t AS term
       |  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS t FROM documents)
       |  WHERE t <> ''
       |), perdoc AS (
       |  SELECT doc_id, COUNT(*) AS dl,
       |$tfCases
       |  FROM tok GROUP BY doc_id
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl,
       |$dfCols
       |  FROM perdoc
       |), scored AS (
       |  SELECT p.doc_id,
       |    ${terms.map(contrib).mkString("\n    + ")} AS score
       |  FROM perdoc p, stats s
       |)
       |SELECT doc_id,
       |  CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       |  ROUND(score, 6) AS score_r6
       |FROM scored ORDER BY score DESC, doc_id ASC LIMIT $Bm25TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_bm25" -> taBm25,
    "ta_char_terms" -> taCharTerms,
    "ta_heavy_hitters" -> taHeavyHitters,
    "ta_commonness" -> taCommonness,
    "ta_heavy_hitters_approx" -> taHeavyHittersApprox,
    "ta_cms_freq" -> taCmsFreq,
    "ta_top_ngrams" -> taTopNgrams,
    "ta_langid" -> taLangId,
    "ta_langid_ngram" -> taLangIdNgram,
    "ta_quality" -> taQuality,
    "ta_tokens" -> taTokens,
    "ta_fingerprint" -> taFingerprint,
    "ta_repetition" -> taRepetition,
    "ta_pii_scrub" -> taPiiScrub,
    "ta_chunks" -> taChunks,
    "ta_filter_funnel" -> taFilterFunnel,
  )

  val oracles: Map[String, String] = Map(
    "ta_bm25" -> taBm25Sql,
    "ta_char_terms" -> taCharTermsSql,
    "ta_heavy_hitters" -> taHeavyHittersSql,
    "ta_commonness" -> taCommonnessSql,
    "ta_heavy_hitters_approx" -> taHeavyHittersApproxSql,
    "ta_cms_freq" -> taCmsFreqSql,
    "ta_top_ngrams" -> taTopNgramsSql,
    "ta_langid" -> taLangIdSql,
    "ta_langid_ngram" -> taLangIdNgramSql,
    "ta_quality" -> taQualitySql,
    "ta_tokens" -> taTokensSql,
    "ta_fingerprint" -> taFingerprintSql,
    "ta_repetition" -> taRepetitionSql,
    "ta_pii_scrub" -> taPiiScrubSql,
    "ta_chunks" -> taChunksSql,
    "ta_filter_funnel" -> taFilterFunnelSql,
  )
}
