package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`, unit-normalized, dim 64).
  *
  * Ladder mirrors Dedup: brute-force cosine top-k as the exact baseline
  * (linear scan per query — right answer for small query sets and the
  * verification oracle), then sign-LSH bucketing and IVF cells as the
  * sublinear scale paths.
  *
  * Cosines are computed in double with sequential index-order folds
  * (`zip_with` + `aggregate`) — bit-reproducible across engines and
  * cluster layouts, entirely inside whole-stage codegen; no UDF, no
  * driver-side collect of vectors.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double, sequential — the native codegen'd VecDot
    * expression (see graft.functions.VectorExpressions for why not the
    * interpreted `aggregate(zip_with(...))` formulation). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vec_cosine(a, b)

  // ------------------------------------------------------- brute-force k-NN:
  // Q query vectors (broadcast) × linear scan of candidates, window rank.
  // At 100 TB this is the per-batch exact scorer you run AFTER candidate
  // generation; standalone it is exact k-NN for bounded Q.
  val NumQueries = 10
  val K = 5

  def ssKnnBrute(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val w = Window.partitionBy($"q_id")
      .orderBy($"cosine".desc, $"vec_id".asc)
    emb.join(broadcast(queries), $"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id",
        cosine($"q_vec", $"embedding").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"q_id", $"vec_id".as("neighbor_id"), $"rank", $"cosine")
  }

  val ssKnnBruteSql: String =
    s"""SELECT q_id, vec_id AS neighbor_id, rank, cosine FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id,
       |    list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[])
       |      / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
       |         * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS cosine,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q.vec_id
       |      ORDER BY list_dot_product(q.embedding::DOUBLE[], e.embedding::DOUBLE[])
       |      / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
       |         * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) DESC,
       |      e.vec_id ASC) AS INT) AS rank
       |  FROM (SELECT * FROM embeddings WHERE vec_id < $NumQueries) q
       |  JOIN embeddings e ON e.vec_id <> q.vec_id) t
       |WHERE rank <= $K""".stripMargin

  // --------------------------------------------- embedding near-dup pairs:
  // exact cosine over a bounded block (the verification tool); the full
  // corpus goes through the LSH bucket path below.
  val NearDupCap = 1500
  val NearDupThreshold = 0.45

  def ddEmbedCosine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir).filter($"vec_id" < NearDupCap)
    val a = emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a"))
    val b = emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b"))
    a.join(b, $"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b", cosine($"emb_a", $"emb_b").as("cosine"))
      .filter($"cosine" >= NearDupThreshold)
  }

  val ddEmbedCosineSql: String =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
       |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
       |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS cosine
       |FROM (SELECT * FROM embeddings WHERE vec_id < $NearDupCap) a
       |JOIN (SELECT * FROM embeddings WHERE vec_id < $NearDupCap) b ON a.vec_id < b.vec_id
       |WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
       |    / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
       |       * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= $NearDupThreshold""".stripMargin

  // ------------------------------------------------------------ sign-LSH.
  // Hyperplane bits from deterministic Rademacher planes: plane p weight
  // for dim i = ±1 by parity of xxhash64(p:i). Bit = sign(Σ wᵢ·vᵢ).
  // 16 bands × 8 bits; near-dup candidates share any full band, then
  // exact cosine verify. Sub-linear: the scan computes signatures
  // narrowly; only bucket-mates join.
  val LshBands = 16
  val LshBits = 8

  /** Deterministic Rademacher (±1) plane weights, precomputed at plan
    * time with the same xxhash64 Catalyst evaluator the previous
    * expression-level formulation used — signatures are stable across
    * jobs while the per-row work is one codegen'd VecDot per plane. */
  private def rademacherPlane(plane: Int): Array[Double] =
    Array.tabulate(64) { i =>
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(s"$plane:$i")), 42L)
        .eval(null).asInstanceOf[Long]
      if ((h & 1L) == 1L) 1.0 else -1.0
    }

  /** One signed-projection bit per (band, bit) plane → array<long> of
    * band codes, each an LshBits-bit integer. Planes are unrolled at plan
    * time; each projection is one codegen'd dot against a literal plane. */
  def lshBands(vec: Column): Column =
    array((0 until LshBands).map { band =>
      (0 until LshBits).map { bit =>
        val plane = band * LshBits + bit
        val proj = dot(vec, typedLit(rademacherPlane(plane)))
        when(proj > 0, lit(1L << bit)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }: _*)

  def annPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val sigs = emb.select(col("vec_id"), col("embedding"),
      lshBands(col("embedding")).as("bands")).cache()
    val buckets = sigs.select(col("vec_id"), posexplode(col("bands")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "code")
    val cands = buckets.as("x")
      .join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.code") === col("y.code") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
    cands
      .join(sigs.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(sigs.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"), cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Full-corpus ANN near-dup pairs (probabilistic recall — rows-only). */
  def ssAnnLsh(s: SparkSession, dir: String): DataFrame =
    annPairs(Tables.embeddings(s, dir), NearDupThreshold)

  // ---------------------------------------------------------------- IVF.
  // Coarse cells from the `label` column (stand-in for k-means cells):
  // centroid per cell = mean embedding (exact decimal-free double mean is
  // fine here — centroids are internal, not compared across engines);
  // query probes the top-`nprobe` cells by centroid cosine, exact-scores
  // only those cells: the classic inverted-file trade of recall for a
  // ~cells/nprobe scan reduction.
  val NProbe = 2

  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("v"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("label"), transform(col("pv"), x => x.getField("v")).as("centroid"))

  def ssKnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val cents = centroids(emb)
    val queries = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // per query: the NProbe closest cells by centroid cosine
    val wc = Window.partitionBy($"q_id").orderBy($"ccos".desc, $"label".asc)
    val probed = queries.join(broadcast(cents))
      .select($"q_id", $"q_vec", $"label", cosine($"q_vec", $"centroid").as("ccos"))
      .withColumn("crank", row_number().over(wc))
      .filter($"crank" <= NProbe)
      .select($"q_id", $"q_vec", $"label")
    // exact scoring restricted to probed cells
    val w = Window.partitionBy($"q_id").orderBy($"cosine".desc, $"vec_id".asc)
    emb.join(broadcast(probed), Seq("label"))
      .filter($"vec_id" =!= $"q_id")
      .select($"q_id", $"vec_id", cosine($"q_vec", $"embedding").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"q_id", $"vec_id".as("neighbor_id"), $"rank", $"cosine")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_knn_brute" -> ssKnnBrute,
    "dd_embed_cosine" -> ddEmbedCosine,
    "ss_ann_lsh" -> ssAnnLsh,
    "ss_knn_ivf" -> ssKnnIvf,
  )

  /** ss_ann_lsh / ss_knn_ivf are approximate (probabilistic recall) — no
    * SQL twin; rows-only in the driver, recall pinned by specs. */
  val oracles: Map[String, String] = Map(
    "ss_knn_brute" -> ssKnnBruteSql,
    "dd_embed_cosine" -> ddEmbedCosineSql,
  )
}
