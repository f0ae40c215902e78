package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import Similarity._

/** STORED product-quantization index — the similarity-search analog of
  * the stored MinHash band table (`Dedup.minhashIncrementalAgainstBands`):
  * encode the corpus ONCE, persist the compressed representation, and
  * serve every subsequent query batch against the stored codes with no
  * corpus re-scan and no re-encoding.
  *
  * Layout (all under one index directory, `Tables.materializeBucketed`
  * style — at cluster scale these are warehouse tables):
  *
  *   - `meta.parquet` — ONE row: format tag, codebook content hash,
  *     source-data fingerprint, layout params (M, K, dim), and the
  *     TUNED shortlist (a tuning-time property of the data, measured at
  *     build — queries never re-tune).
  *   - `codebook.parquet` — (m, j, centroid) rows, M·K total. Bounded:
  *     loading it is a driver-side read of M·K·(dim/M) doubles.
  *   - `codes.parquet` — (vec_id, codes array<int>, scale, qvec
  *     array<int>): the 5-byte/vector PQ codes for the ADC stage plus
  *     an int8 sidecar (`Similarity.ssQuantizeInt8`'s representation)
  *     for the rerank stage — 1 byte/dim instead of 4, and since cosine
  *     is scale-invariant the rerank scores the int8 array DIRECTLY
  *     (the per-vector dequantization scale cancels).
  *
  * Versioning discipline (the `BloomKernel.FormatTag` pattern applied
  * to codebooks): codes encoded under codebook version v are
  * meaningless ADC'd against codebook v′ — the code ids index DIFFERENT
  * centroids and the scores are silent garbage, the unsafe direction.
  * So `meta` pins the codebook CONTENT hash; the loader recomputes the
  * hash of `codebook.parquet` and refuses a mismatch with a typed error
  * instead of scoring. Same for the format tag: readers reject foreign
  * layouts rather than translate (an index is cheap to rebuild from
  * data; a misread one silently corrupts every downstream retrieval).
  *
  * Scale shape: the build is one corpus scan (codes + int8 are both
  * scan-side projections, no shuffle); a query batch reads ONLY
  * `codes.parquet` — ADC needs (vec_id, codes), rerank joins the
  * Q·shortlist survivors back by broadcasting them onto a second
  * codes scan reading (vec_id, qvec) — so serving cost is
  * O(index + batch) however large the original corpus was, and appends
  * (`appendToPqIndex`) encode only the new batch (codebooks are frozen
  * at build, the standard IVF/PQ index contract). */
object PqIndex {

  /** 8 bits of magic + a version, negative like `BloomKernel.FormatTag`
    * so it can never collide with a row-count or size field of some
    * other layout. Bump on ANY change to the code/rerank semantics —
    * readers refuse, never translate. */
  val FormatTag: Int = 0x9D1C0000 | 1 // version 1: PQ codes + int8 rerank sidecar

  /** Deterministic content hash of a codebook set (fold over doubles in
    * (m, j, dim) order) — the version identity that codes are bound to. */
  def codebookHash(books: IndexedSeq[IndexedSeq[Array[Double]]]): Long = {
    var h = 17L
    books.foreach(_.foreach(_.foreach { d =>
      h = h * 31 + java.lang.Double.doubleToLongBits(d)
    }))
    h
  }

  case class Meta(format: Int, bookFp: Long, dataFp: Long,
      m: Int, k: Int, dim: Int, shortlist: Int)

  /** Build (or overwrite) the index for a corpus directory: train/reuse
    * the cached codebooks and tuned shortlist, then ONE corpus scan
    * writes codes + int8 sidecar. */
  def buildPqIndex(s: SparkSession, dir: String, indexBase: String): Unit = {
    val emb = Tables.embeddings(s, dir)
    val books = cachedCodebooks(emb, dir)
    val shortlist = tunedShortlist(emb, dir)
    val sub = PqDim / PqM
    val subCols = (0 until PqM).map(m =>
      slice(col("embedding"), m * sub + 1, sub).as(s"__sub$m"))
    // one scan-side pass: PQ codes and the int8 rerank sidecar together
    emb.select((col("vec_id") +: col("embedding") +: subCols): _*)
      .select(col("vec_id"),
        array((0 until PqM).map(m =>
          assignCell(col(s"__sub$m"), books(m))): _*).as("codes"),
        (array_max(transform(col("embedding"),
          x => abs(x.cast("double")))) / 127.0).as("scale"),
        col("embedding"))
      .select(col("vec_id"), col("codes"), col("scale"),
        when(col("scale") === 0.0,
          transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"), x =>
            least(greatest(floor(x.cast("double") / col("scale") + 0.5),
              lit(-127.0)), lit(127.0)).cast("int")))
          .as("qvec"))
      .write.mode("overwrite").parquet(s"$indexBase/codes.parquet")
    val bookRows = for {
      m <- 0 until PqM; j <- 0 until PqK
    } yield (m, j, books(m)(j).toSeq)
    import s.implicits._
    bookRows.toDF("m", "j", "centroid")
      .coalesce(1) // M·K rows — one tiny file
      .write.mode("overwrite").parquet(s"$indexBase/codebook.parquet")
    Seq((FormatTag, codebookHash(books), dataFingerprint(s, dir),
      PqM, PqK, PqDim, shortlist))
      .toDF("format", "book_fp", "data_fp", "m", "k", "dim", "shortlist")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexBase/meta.parquet")
  }

  /** Read + validate the one-row meta. Refuses foreign format tags with
    * a typed error (never probes an unknown layout). */
  def readMeta(s: SparkSession, indexBase: String): Meta = {
    val r = s.read.parquet(s"$indexBase/meta.parquet").head()
    val meta = Meta(r.getAs[Int]("format"), r.getAs[Long]("book_fp"),
      r.getAs[Long]("data_fp"), r.getAs[Int]("m"), r.getAs[Int]("k"),
      r.getAs[Int]("dim"), r.getAs[Int]("shortlist"))
    require(meta.format == FormatTag,
      f"PqIndex: unsupported index format 0x${meta.format}%08x " +
        f"(expected 0x$FormatTag%08x) — rebuild the index, do not translate")
    require(meta.m == PqM && meta.k == PqK && meta.dim == PqDim,
      s"PqIndex: layout (M=${meta.m}, K=${meta.k}, dim=${meta.dim}) does " +
        s"not match this build (M=$PqM, K=$PqK, dim=$PqDim) — rebuild")
    meta
  }

  /** Load the codebook artifact and verify its CONTENT hash against the
    * meta pin — codes bound to codebook version v must never be scored
    * against v′. */
  def readCodebooks(s: SparkSession, indexBase: String, meta: Meta)
      : IndexedSeq[IndexedSeq[Array[Double]]] = {
    val rows = s.read.parquet(s"$indexBase/codebook.parquet")
      .select(col("m"), col("j"), col("centroid")).collect()
    val books = (0 until meta.m).map { m =>
      val perM = rows.filter(_.getAs[Int]("m") == m)
      require(perM.length == meta.k,
        s"PqIndex: codebook artifact has ${perM.length} entries for " +
          s"subspace $m, expected ${meta.k}")
      (0 until meta.k).map { j =>
        perM.find(_.getAs[Int]("j") == j)
          .getOrElse(throw new IllegalArgumentException(
            s"PqIndex: codebook artifact missing entry ($m, $j)"))
          .getSeq[Double](2).toArray
      }
    }
    val fp = codebookHash(books)
    require(fp == meta.bookFp,
      s"PqIndex: codebook artifact hash $fp does not match the index " +
        s"meta's pinned version ${meta.bookFp} — the stored codes were " +
        "encoded under a different codebook and cannot be ADC-scored " +
        "against this one; rebuild the index")
    books
  }

  /** Append a new batch of vectors to the stored index: encode ONLY the
    * batch under the FROZEN build-time codebooks (verified against the
    * meta pin) and append to `codes.parquet` — O(batch), no corpus
    * touch. Deterministic codebooks ⇒ appended rows from any job agree. */
  def appendToPqIndex(s: SparkSession, indexBase: String,
      batch: DataFrame, expectBookFp: Option[Long] = None): Unit = {
    val meta = readMeta(s, indexBase)
    // a caller that prepared its batch against codebook version v pins
    // that expectation; if the index was REBUILT in between (new
    // codebooks, new fp), appending v-encoded work would silently mix
    // incompatible code spaces — refuse instead
    expectBookFp.foreach { fp =>
      require(fp == meta.bookFp,
        s"PqIndex: append expects codebook version $fp but the stored " +
          s"index now pins ${meta.bookFp} — the index was rebuilt since " +
          "this batch was prepared; re-encode against the current index")
    }
    val books = readCodebooks(s, indexBase, meta)
    val sub = meta.dim / meta.m
    val subCols = (0 until meta.m).map(m =>
      slice(col("embedding"), m * sub + 1, sub).as(s"__sub$m"))
    batch.select((col("vec_id") +: col("embedding") +: subCols): _*)
      .select(col("vec_id"),
        array((0 until meta.m).map(m =>
          assignCell(col(s"__sub$m"), books(m))): _*).as("codes"),
        (array_max(transform(col("embedding"),
          x => abs(x.cast("double")))) / 127.0).as("scale"),
        col("embedding"))
      .select(col("vec_id"), col("codes"), col("scale"),
        when(col("scale") === 0.0,
          transform(col("embedding"), _ => lit(0)))
          .otherwise(transform(col("embedding"), x =>
            least(greatest(floor(x.cast("double") / col("scale") + 0.5),
              lit(-127.0)), lit(127.0)).cast("int")))
          .as("qvec"))
      .write.mode("append").parquet(s"$indexBase/codes.parquet")
  }

  /** k-NN for a QUERY BATCH against the stored index: ADC over
    * `codes.parquet` (reads vec_id + codes only), shortlist at the
    * build-time tuned size, exact-ordered rerank over the int8 sidecar
    * (cosine is scale-invariant, so the int8 array scores directly).
    * The batch is collected driver-side (bounded, like the brute-force
    * broadcast); the returned plan touches NOTHING but the index. Rows
    * whose vec_id equals the query id are excluded (self-match, for
    * corpus-resident queries). */
  def knnPqStored(s: SparkSession, indexBase: String, batch: DataFrame,
      k: Int = K): DataFrame = {
    val meta = readMeta(s, indexBase)
    val books = readCodebooks(s, indexBase, meta)
    val sub = meta.dim / meta.m
    // bounded driver-side collect: the arriving query batch
    val qRows = batch.select(col("q_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    require(qRows.nonEmpty, "knnPqStored: empty query batch")
    val qIds: Array[Long] = qRows.map(_._1)
    // tables(q)(m)(j) = dot(query q's m-th slice, books(m)(j))
    val tables: IndexedSeq[IndexedSeq[Array[Double]]] =
      qRows.toIndexedSeq.map { case (_, v) =>
        (0 until meta.m).map { m =>
          Array.tabulate(meta.k) { j =>
            val c = books(m)(j)
            var acc = 0.0
            var i = 0
            while (i < sub) { acc += v(m * sub + i) * c(i); i += 1 }
            acc
          }
        }
      }
    val codes = s.read.parquet(s"$indexBase/codes.parquet")
    val adcPerQuery = array(qIds.indices.map { q =>
      (0 until meta.m).map(m =>
        element_at(typedLit(tables(q)(m)),
          element_at(col("codes"), m + 1) + 1)).reduce(_ + _)
    }: _*)
    val adc = codes.select(col("vec_id"), posexplode(adcPerQuery))
      .select(col("vec_id"),
        element_at(typedLit(qIds), col("pos") + 1).as("q_id"),
        col("col").as("adc"))
      .filter(col("vec_id") =!= col("q_id"))
    val wAdc = Window.partitionBy(col("q_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val short = adc.withColumn("srk", row_number().over(wAdc))
      .filter(col("srk") <= meta.shortlist)
      .select(col("q_id"), col("vec_id"))
    import s.implicits._
    val queries = qRows.toSeq.toDF("q_id", "q_vec")
    // rerank reads the int8 sidecar from the INDEX (second codes scan,
    // pruned to vec_id + qvec + scale); the Q·shortlist survivors ride a
    // broadcast onto it, so the index never shuffles
    val wExact = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    codes.select(col("vec_id"), col("scale"), col("qvec"))
      .join(broadcast(short), Seq("vec_id"))
      .join(broadcast(queries), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        when(col("scale") === 0.0, lit(-1.0))
          .otherwise(cosine(col("q_vec"), col("qvec"))).as("cosine"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("cosine"))
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { java.nio.file.Files.deleteIfExists(f); () })
      finally walk.close()
    }

  /** Idempotent per (JVM tmpdir, corpus dir): build once, reuse while
    * the source data fingerprint matches (the `materializeBucketed`
    * contract). Returns the index directory.
    *
    * Existence is probed with a filesystem check, NOT by catching
    * `readMeta`'s failure — a genuinely corrupt index must propagate as
    * an error, never trigger a silent rebuild that papers over it. The
    * build lands in a process-unique staging directory and is swapped in
    * with an ATOMIC_MOVE rename, so concurrent builders each complete a
    * consistent tree, exactly one rename wins, and no reader ever
    * observes a half-written index (the losing staging tree is
    * discarded — the build is deterministic, so both are identical). At
    * cluster scale the same protocol runs through the object-store
    * commit rename instead of a local-FS move. */
  def ensurePqIndex(s: SparkSession, dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_pq_index/$tag"
    val current = dataFingerprint(s, dir)
    val metaExists = java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$base/meta.parquet"))
    val fresh = metaExists && readMeta(s, base).dataFp == current
    if (!fresh) {
      val staging = s"${base}__staging_${java.util.UUID.randomUUID().toString.take(8)}"
      buildPqIndex(s, dir, staging)
      deleteRecursively(java.nio.file.Paths.get(base))
      try java.nio.file.Files.move(
        java.nio.file.Paths.get(staging), java.nio.file.Paths.get(base),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          // a concurrent builder's rename won; its index is complete
          deleteRecursively(java.nio.file.Paths.get(staging))
      }
    }
    base
  }

  /** Root paths of every file scan in a frame's plan — the evidence for
    * the index-only serving claim. */
  def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  /** Gate: serve the standard query batch from the STORED index and
    * hold the same recall envelope as `ss_knn_pq`, plus the index-only
    * claim — the served plan's file scans all point at the index
    * directory, never at the corpus parquet (the second-batch/no-
    * re-encode contract, also spec-driven with a fresh batch). */
  def ssKnnPqStored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val indexBase = ensurePqIndex(s, dir)
    val emb = Tables.embeddings(s, dir)
    val batch = emb.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val knn = knnPqStored(s, indexBase, batch)
    val indexOnly = scannedPaths(knn).forall(!_.contains("embeddings.parquet"))
    val brute = knnBruteOn(emb).select($"q_id", $"neighbor_id")
    val hits = knn.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
    hits.agg(count(lit(1)).as("hits"))
      .select(
        lit(NumQueries).cast("long").as("n_queries"),
        lit(K).cast("long").as("k"),
        ($"hits".cast("double") / (NumQueries * K) >= PqRecallFloor)
          .as("recall_ok"),
        lit(indexOnly).as("index_only"))
  }

  val ssKnnPqStoredSql: String =
    s"SELECT CAST($NumQueries AS BIGINT) AS n_queries, " +
      s"CAST($K AS BIGINT) AS k, TRUE AS recall_ok, TRUE AS index_only"
}
