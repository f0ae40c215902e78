package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Measures whether an OPQ-style deterministic rotation (PCA basis +
  * eigenvalue-balanced subspace allocation, the non-parametric init of
  * Ge et al.'s OPQ) improves PQ recall at the FIXED shortlist on
  * (a) an anisotropic correlated clustered fixture and (b) the driver
  * embeddings. Evidence for/against shipping a rotated-PQ operator
  * (docs/NEXT.md round-9 candidate #1). Tools-only. */
object MeasureOpq {

  /** PCA + snake allocation from a collected training sample (bounded:
    * the same TrainTargetRows-sized draw codebook training uses).
    * Returns the row-major rotation: rotated_i = R(i) · x. */
  def opqRotation(sample: Array[Array[Double]], m: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val n = sample.length.toDouble
    val mean = Array.tabulate(dim)(j => sample.map(_(j)).sum / n)
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    sample.foreach { v =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          cov(i, j) += (v(i) - mean(i)) * (v(j) - mean(j)); j += 1
        }
        i += 1
      }
    }
    cov :/= n
    val eig = breeze.linalg.eigSym(cov)
    // eigenpairs descending by eigenvalue
    val order = (0 until dim).sortBy(i => -eig.eigenvalues(i))
    // snake-allocate dims to the m subspaces balancing Σ log λ
    val sub = dim / m
    val sums = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(List.empty[Int])
    order.foreach { e =>
      val open = (0 until m).filter(b => buckets(b).length < sub)
      val b = open.minBy(sums)
      buckets(b) = e :: buckets(b)
      sums(b) += math.log(math.max(eig.eigenvalues(e), 1e-12))
    }
    val perm = buckets.flatMap(_.reverse)
    perm.map(e => Array.tabulate(dim)(j => eig.eigenvectors(j, e)))
  }

  def rotate(vec: Column, r: Array[Array[Double]]): Column =
    array(r.map(row => Similarity.dot(vec, typedLit(row))): _*)

  def recallOf(emb: DataFrame, rotated: Boolean): Double = {
    val spark = emb.sparkSession
    import spark.implicits._
    val base = if (!rotated) emb else {
      val sample = Similarity.trainSample(emb).select($"embedding")
        .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val r = opqRotation(sample, Similarity.PqM)
      emb.select($"vec_id",
        rotate($"embedding".cast("array<double>"), r)
          .cast("array<float>").as("embedding"))
    }
    val books = Similarity.trainCodebooks(Similarity.trainSample(base))
    val pq = Similarity.knnPqOn(base, books).cache()
    val brute = Similarity.knnBruteOn(emb)
      .select($"q_id", $"neighbor_id")
    val hits = pq.join(brute, Seq("q_id", "neighbor_id"), "left_semi").count()
    pq.unpersist()
    hits.toDouble / (Similarity.NumQueries * Similarity.K)
  }

  /** Anisotropic, correlated clusters: 8 direction clusters whose noise
    * is stretched along a few shared directions — the correlation
    * structure OPQ exists to decorrelate (a uniform sphere shows no
    * gain by symmetry). */
  def clusteredFixture(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = Similarity.PqDim
    val centers = (0 until 8).map { c =>
      val v = Array.tabulate(dim)(i => if (i % 8 == c) 1.0 else 0.0)
      val nn = math.sqrt(v.map(x => x * x).sum); v.map(_ / nn)
    }
    // shared anisotropy: 4 stretch directions with large scales
    val stretch = (0 until 4).map(_ =>
      Array.fill(dim)(rnd.nextGaussian()))
      .map(v => { val s = math.sqrt(v.map(x => x * x).sum); v.map(_ / s) })
    val rows = (0 until n).map { id =>
      val c = centers(id % 8)
      val g = Array.fill(dim)(rnd.nextGaussian() * 0.02)
      val along = stretch.map(_ => rnd.nextGaussian() * 0.15)
      val noisy = Array.tabulate(dim)(i =>
        c(i) + g(i) + stretch.zip(along).map { case (s, a) => s(i) * a }.sum)
      val nn = math.sqrt(noisy.map(x => x * x).sum)
      (id.toLong, noisy.map(x => (x / nn).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fix = clusteredFixture(spark, 4000)
    println(f"[opq] clustered fixture: pq=${recallOf(fix, rotated = false)}%.3f" +
      f" opq=${recallOf(fix, rotated = true)}%.3f")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    println(f"[opq] driver sf0.01:    pq=${recallOf(emb, rotated = false)}%.3f" +
      f" opq=${recallOf(emb, rotated = true)}%.3f")
    spark.stop()
  }
}
