package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Measures semantic-dedup cluster-coverage of the exact near-dup pair
  * set per SF (tools-only): what fraction of full-quadratic pairs at
  * the gate threshold co-cluster under the cached k-means centroids —
  * the evidence behind [[Similarity.SemDedupCoverageFloor]]. */
object MeasureSemDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
        .filter(col("vec_id") < Similarity.NearDupCap)
      val cents = Similarity.cachedCentroids(Tables.embeddings(spark, dir), dir)
      val exact = Similarity.ddEmbedCosine(spark, dir)
        .select(col("vec_a"), col("vec_b"))
      val clustered = Similarity
        .semanticPairs(emb, cents, Similarity.SemDedupThreshold)
        .select(col("vec_a"), col("vec_b"))
      val total = exact.count()
      val caught = exact.join(clustered, Seq("vec_a", "vec_b"), "left_semi").count()
      val dropped = clustered.select(col("vec_b")).distinct().count()
      val covered = Similarity.ssSemDedup(spark, dir).head()
      println(s"[semdedup] $sf exact_pairs=$total co_clustered=$caught " +
        f"pair_coverage=${caught.toDouble / math.max(1, total)}%.3f " +
        s"dropped=$dropped gate_row=$covered")
    }
    spark.stop()
  }
}
