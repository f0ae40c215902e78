package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IncrementalSemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore(cents: IndexedSeq[Array[Double]],
      threshold: Double): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("semdedup_incr").toString
    IncrementalSemDedup.initStore(spark, dir, cents, threshold)
    dir
  }

  private lazy val corpusCents =
    Similarity.cachedCentroids(
      graft.Tables.embeddings(spark, TestSpark.sf0001), TestSpark.sf0001)

  test("id-ordered batched ingest equals the full-batch keep-set at any split") {
    val emb = graft.Tables.embeddings(spark, TestSpark.sf0001)
      .filter($"vec_id" < Similarity.NearDupCap)
    val ref = Similarity
      .semanticDedupRetain(emb, corpusCents, Similarity.SemDedupThreshold)
      .select($"vec_id").as[Long].collect().toSet
    for (splits <- Seq(Seq(500L), Seq(300L, 900L))) {
      val dir = freshStore(corpusCents, Similarity.SemDedupThreshold)
      val bounds = (0L +: splits) :+ Similarity.NearDupCap.toLong
      val admitted = bounds.sliding(2).flatMap { case Seq(lo, hi) =>
        IncrementalSemDedup.ingest(spark, dir,
          emb.filter($"vec_id" >= lo && $"vec_id" < hi), corpusCents)
          .select($"vec_id").as[Long].collect()
      }.toSet
      assert(admitted == ref, s"splits=$splits")
    }
  }

  test("dropped vectors stay in the store as future drop partners") {
    // a (id 1) and b (id 2) are near-dups; c (id 3) is near b but NOT
    // near a. Batch rule: b dropped (partner a), c dropped (partner b,
    // even though b itself was dropped). A survivors-only store would
    // wrongly admit c when it arrives after b was dropped.
    val va = Array.fill(64)(0.0f); va(0) = 1.0f
    val vb = va.clone(); vb(1) = 0.4f // cos(a,b) ≈ 0.93
    val vc = va.clone(); vc(1) = 0.9f // cos(a,c) ≈ 0.74, cos(b,c) ≈ 0.94
    val threshold = 0.9
    // two centroids (assignCell needs ≥2); all fixture vectors point
    // near e0, far from the -e2 decoy, so they co-cluster in cell 0
    val cents = IndexedSeq(
      Array.fill(64)(0.0).updated(0, 1.0),
      Array.fill(64)(0.0).updated(2, -1.0))
    def df(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      dot / (math.sqrt(x.map(p => p.toDouble * p).sum) *
        math.sqrt(y.map(p => p.toDouble * p).sum))
    }
    assert(cos(va, vb) >= threshold && cos(vb, vc) >= threshold &&
      cos(va, vc) < threshold, "fixture geometry broken")
    val dir = freshStore(cents, threshold)
    val adm1 = IncrementalSemDedup.ingest(spark, dir, df(1L -> va, 2L -> vb),
      cents).select($"vec_id").as[Long].collect().toSet
    assert(adm1 == Set(1L)) // b dropped against a
    val adm2 = IncrementalSemDedup.ingest(spark, dir, df(3L -> vc), cents)
      .select($"vec_id").as[Long].collect().toSet
    assert(adm2 == Set.empty[Long],
      "c must be dropped against the DROPPED b — drops are partners too")
  }

  test("ingest under a rebuilt centroid set is refused") {
    val dir = freshStore(corpusCents, Similarity.SemDedupThreshold)
    val other = corpusCents.map(_.map(_ + 1.0))
    val ex = intercept[IllegalArgumentException] {
      IncrementalSemDedup.ingest(spark, dir,
        graft.Tables.embeddings(spark, TestSpark.sf0001).limit(1), other)
    }
    assert(ex.getMessage.contains("centroid version"))
  }

  test("ss_semdedup_incr gate: equivalence booleans hold on testdata") {
    val row = IncrementalSemDedup
      .ssSemDedupIncr(spark, TestSpark.sf0001).head()
    assert(row.getAs[Boolean]("store_complete"))
    assert(row.getAs[Boolean]("matches_batch"))
    assert(row.getAs[Long]("n_docs") > 0)
  }
}
