package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Measures what the ITERATIVE (parametric) OPQ alternation buys over
  * the non-parametric PCA+snake init: per-iteration sample MSE and
  * end-to-end PQ recall on (a) a mixed-subspace fixture whose cluster
  * structure is rotated across subspace boundaries while its covariance
  * spectrum stays near-flat (the PCA init's blind spot), and (b) the
  * driver embeddings. Evidence for the `ss_knn_pq_opq_it` adoption
  * gate's threshold. Tools-only. */
object MeasureOpqIter {

  /** Independent per-subspace clusters (4 sign-pattern codewords per
    * 8-dim subspace), mixed by a fixed random orthogonal Q — in the
    * right basis PQ is near-lossless, in the mixed basis every subspace
    * sees a blend. Deterministic (seeded). */
  def mixedSubspaceFixture(spark: SparkSession, n: Int)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dim = Similarity.PqDim
    val m = Similarity.PqM
    val sub = dim / m
    val rnd = new scala.util.Random(11)
    // 48 codewords per subspace > PqK=32 codes: quantization is lossy
    // even in the right basis, and catastrophically blended in the
    // mixed basis — basis quality becomes visible in recall
    val codewords = Array.fill(m, 48)(
      Array.fill(sub)((if (rnd.nextBoolean()) 1.0 else -1.0) / math.sqrt(dim)))
    // fixed orthogonal mix: QR of a seeded Gaussian matrix
    val g = breeze.linalg.DenseMatrix.fill(dim, dim)(rnd.nextGaussian())
    val q = breeze.linalg.qr(g).q
    val rows = (0 until n).map { id =>
      val x = new Array[Double](dim)
      for (s <- 0 until m) {
        val cw = codewords(s)(rnd.nextInt(48))
        var j = 0
        while (j < sub) { x(s * sub + j) = cw(j) + rnd.nextGaussian() * 0.03; j += 1 }
      }
      val y = Array.tabulate(dim)(i =>
        (0 until dim).map(j => q(i, j) * x(j)).sum)
      val nn = math.sqrt(y.map(v => v * v).sum)
      (id.toLong, y.map(v => (v / nn).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  def recallOn(emb: org.apache.spark.sql.DataFrame,
      rot: Option[Array[Array[Double]]]): Double = {
    import emb.sparkSession.implicits._
    val base = rot.map(r => Similarity.rotatedEmb(emb, r)).getOrElse(emb)
    val books = Similarity.trainCodebooks(Similarity.trainSample(base))
    val pq = Similarity.knnPqOn(base, books)
    val brute = Similarity.knnBruteOn(emb).select($"q_id", $"neighbor_id")
    val hits = pq.join(brute, Seq("q_id", "neighbor_id"), "left_semi").count()
    hits.toDouble / (Similarity.NumQueries * Similarity.K)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sampleOf(df: org.apache.spark.sql.DataFrame): Array[Array[Double]] =
      Similarity.trainSample(df).select(col("embedding"))
        .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)

    // (a) mixed-subspace fixture
    val fix = mixedSubspaceFixture(spark, 2048).cache()
    val fs = sampleOf(fix)
    val dim = fs.head.length
    val eye = Array.tabulate(dim)(i =>
      Array.tabulate(dim)(j => if (i == j) 1.0 else 0.0))
    val snake = Similarity.opqRotationIfAnisotropic(fs, Similarity.PqM)
    println(s"fixture: snake-init anisotropic? ${snake.isDefined}")
    val init = snake.getOrElse(eye)
    val (r, errs) = Similarity.opqRefine(fs, Similarity.PqM, init)
    println(s"fixture MSE trace: ${errs.map(e => f"$e%.6f").mkString(" -> ")}")
    println(f"fixture gain: ${1 - errs.last / errs.head}%.3f")
    println(f"fixture recall plain:   ${recallOn(fix, None)}%.3f")
    println(f"fixture recall snake:   ${recallOn(fix, snake)}%.3f")
    println(f"fixture recall refined: ${recallOn(fix, Some(r))}%.3f")
    println(f"fixture sampleAdcRecall plain:   ${Similarity.sampleAdcRecall(fs, Similarity.PqM, None)}%.3f")
    println(f"fixture sampleAdcRecall refined: ${Similarity.sampleAdcRecall(fs, Similarity.PqM, Some(r))}%.3f")
    println(s"fixture adoption: ${Similarity.opqRefinedRotation(fs, Similarity.PqM).isDefined}")

    // (b) driver embeddings: MSE gain AND whether it moves recall
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val emb = Tables.embeddings(spark, s"/root/testdata/$sf").cache()
      val es = sampleOf(emb)
      val einit = Similarity.opqRotationIfAnisotropic(es, Similarity.PqM)
        .getOrElse(eye)
      val (er, eerrs) = Similarity.opqRefine(es, Similarity.PqM, einit)
      println(s"$sf MSE trace: ${eerrs.map(e => f"$e%.6f").mkString(" -> ")}")
      println(f"$sf gain: ${1 - eerrs.last / eerrs.head}%.3f")
      println(f"$sf recall plain:   ${recallOn(emb, None)}%.3f")
      println(f"$sf recall refined: ${recallOn(emb, Some(er))}%.3f")
      println(f"$sf sampleAdcRecall plain:   ${Similarity.sampleAdcRecall(es, Similarity.PqM, None)}%.3f")
      println(f"$sf sampleAdcRecall refined: ${Similarity.sampleAdcRecall(es, Similarity.PqM, Some(er))}%.3f")
      println(s"$sf adoption: ${Similarity.opqRefinedRotation(es, Similarity.PqM).isDefined}")
      emb.unpersist()
    }
    spark.stop()
  }
}
