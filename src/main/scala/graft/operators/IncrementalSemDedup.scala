package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity.{assignCell, cosine}

/** Incremental semantic dedup — the stored-artifact rung of the
  * SemDeDup family, completing the same ladder the Bloom / MinHash
  * flavors already climb (whole-corpus → incremental-with-stored-state):
  * new document batches are deduplicated against a STORED per-cell
  * assignment table in O(batch · cell) work, with no corpus re-compare.
  *
  * Store layout (one directory):
  *   - `assignments.parquet` (cell, vec_id, embedding) — every ingested
  *     vector under its k-means cell, survivors and drops alike. Drops
  *     must stay: the batch rule drops b iff ANY lower-id cell-mate is
  *     within threshold, dropped or not — keeping only survivors would
  *     admit a doc whose sole near-partner was itself dropped, and the
  *     incremental result would drift from the batch one.
  *   - `meta.parquet` — format tag + centroid CONTENT hash + (dim, k,
  *     threshold). Cell ids are meaningless across centroid versions,
  *     so ingest under a rebuilt centroid set is REFUSED with a typed
  *     error (same versioned-artifact discipline as [[PqIndex]]).
  *
  * EXACT batch equivalence (spec-proved, not approximate): if batches
  * partition the corpus and arrive id-monotone (every new id ≥ all
  * stored ids — the "new docs get new ids" contract, the same
  * precondition as `Changelog.applyChangelog`), the union of admitted
  * ids over any batch split equals `Similarity.semanticDedupRetain` on
  * the full corpus. The pairwise lower-id drop rule only ever looks
  * backwards, and id-monotone ingest guarantees every backward partner
  * is already in the store.
  *
  * Plan shape at 100 TB: cell assignment is scan-side (codegen'd
  * literal dots, no shuffle); the only shuffle is the batch⋈store cell
  * join, and cells are ~constant-sized by construction (k grows with
  * the corpus, cell ≈ corpus/k), so per-batch cost is O(batch · cell)
  * regardless of corpus size. The store is append-only parquet — the
  * same economics as the stored MinHash band table. */
object IncrementalSemDedup {

  val FormatTag: Int = 0x53444901 // "SDI" v1

  final case class Meta(format: Int, centFp: Long, dim: Int, k: Int,
      threshold: Double)

  /** Content hash of a centroid set — the version pin. */
  def centroidHash(cents: IndexedSeq[Array[Double]]): Long = {
    var h = 17L
    cents.foreach(_.foreach { d =>
      h = h * 31 + java.lang.Double.doubleToLongBits(d)
    })
    h
  }

  /** Create an empty store bound to one centroid version. */
  def initStore(s: SparkSession, storeDir: String,
      cents: IndexedSeq[Array[Double]], threshold: Double): Unit = {
    import s.implicits._
    Seq((FormatTag, centroidHash(cents), cents.head.length, cents.length,
      threshold))
      .toDF("format", "cent_fp", "dim", "k", "threshold")
      .coalesce(1).write.mode("overwrite").parquet(s"$storeDir/meta.parquet")
    Seq.empty[(Int, Long, Array[Float])]
      .toDF("cell", "vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$storeDir/assignments.parquet")
  }

  def readMeta(s: SparkSession, storeDir: String): Meta = {
    val r = s.read.parquet(s"$storeDir/meta.parquet").head()
    val meta = Meta(r.getAs[Int]("format"), r.getAs[Long]("cent_fp"),
      r.getAs[Int]("dim"), r.getAs[Int]("k"), r.getAs[Double]("threshold"))
    require(meta.format == FormatTag,
      f"IncrementalSemDedup: unsupported store format 0x${meta.format}%08x " +
        f"(expected 0x$FormatTag%08x) — rebuild the store, do not translate")
    meta
  }

  /** Ingest one batch (vec_id, embedding): admitted rows are returned,
    * ALL rows (admitted or dropped) are appended to the store. The
    * centroids must hash to the store's pinned version. Precondition:
    * batch ids are new and ≥ every stored id (id-monotone ingest). */
  def ingest(s: SparkSession, storeDir: String, batch: DataFrame,
      cents: IndexedSeq[Array[Double]]): DataFrame = {
    val meta = readMeta(s, storeDir)
    require(centroidHash(cents) == meta.centFp,
      s"IncrementalSemDedup: centroid version ${centroidHash(cents)} does " +
        s"not match the store's pinned ${meta.centFp} — cell ids are not " +
        "comparable across centroid versions; rebuild the store or load " +
        "its centroids")
    val assigned = batch
      .select(assignCell(col("embedding"), cents).as("cell"),
        col("vec_id"), col("embedding"))
    val stored = s.read.parquet(s"$storeDir/assignments.parquet")
    // backward partners: stored cell-mates plus lower-id batch-mates
    val pool = stored.unionByName(assigned)
      .select(col("cell"), col("vec_id").as("vec_a"),
        col("embedding").as("emb_a"))
    val dropped = assigned
      .select(col("cell"), col("vec_id").as("vec_b"),
        col("embedding").as("emb_b"))
      .join(pool, Seq("cell"))
      .filter(col("vec_a") < col("vec_b") &&
        cosine(col("emb_a"), col("emb_b")) >= meta.threshold)
      .select(col("vec_b").as("vec_id")).distinct()
    val admitted = assigned.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"))
    // materialize the admit decision BEFORE the append mutates the store
    // it reads (classic read-your-own-write hazard on file sources)
    val admittedRows = admitted.cache()
    admittedRows.count()
    assigned.write.mode("append").parquet(s"$storeDir/assignments.parquet")
    admittedRows
  }

  // --------------------------------------------------------- gate query

  /** Gate: two id-ordered half-corpus batches through a fresh store must
    * admit EXACTLY the batch keep-set (`semanticDedupRetain`) — the
    * snapshot+delta ≡ full-history equivalence, semantic-dedup edition.
    * Emits SQL-assertable anchors plus the equality booleans. */
  def ssSemDedupIncr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
      .filter($"vec_id" < Similarity.NearDupCap)
    val cents = Similarity.cachedCentroids(Tables.embeddings(s, dir), dir)
    val storeDir = java.nio.file.Files
      .createTempDirectory("graft_semdedup_incr").toString
    initStore(s, storeDir, cents, Similarity.SemDedupThreshold)
    val mid = Similarity.NearDupCap / 2
    val admitted1 = ingest(s, storeDir, emb.filter($"vec_id" < mid), cents)
    val admitted2 = ingest(s, storeDir, emb.filter($"vec_id" >= mid), cents)
    val admitted = admitted1.select($"vec_id")
      .unionByName(admitted2.select($"vec_id"))
    val batchKeep = Similarity
      .semanticDedupRetain(emb, cents, Similarity.SemDedupThreshold)
      .select($"vec_id")
    val missing = batchKeep.join(admitted, Seq("vec_id"), "left_anti")
    val extra = admitted.join(batchKeep, Seq("vec_id"), "left_anti")
    val storeRows = s.read.parquet(s"$storeDir/assignments.parquet")
    emb.agg(count(lit(1)).as("n_docs"))
      .crossJoin(storeRows.agg(count(lit(1)).as("__n_store")))
      .crossJoin(missing.agg((count(lit(1)) === 0L).as("__no_missing")))
      .crossJoin(extra.agg((count(lit(1)) === 0L).as("__no_extra")))
      .select($"n_docs", lit(2L).as("n_batches"),
        ($"__n_store" === $"n_docs").as("store_complete"),
        ($"__no_missing" && $"__no_extra").as("matches_batch"))
  }

  /** Anchors are SQL-computable; the equivalence booleans are the
    * claim under test and must come out TRUE. */
  val ssSemDedupIncrSql: String =
    s"""SELECT (SELECT COUNT(*) FROM embeddings
       |   WHERE vec_id < ${Similarity.NearDupCap}) AS n_docs,
       |  2 AS n_batches, TRUE AS store_complete,
       |  TRUE AS matches_batch""".stripMargin
}
