package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Similarity

/** Measures PQ+rerank recall vs brute force per SF — the numbers quoted
  * in Similarity's PQ scaladoc and backing the shipped PqRecallFloor. */
object MeasurePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val pq = Similarity.knnPq(spark, dir)
        .select("q_id", "neighbor_id")
      val brute = Similarity.ssKnnBrute(spark, dir)
        .select("q_id", "neighbor_id")
      val hits = pq.join(brute, Seq("q_id", "neighbor_id"), "left_semi").count()
      val total = Similarity.NumQueries * Similarity.K
      println(f"[pq] $sf recall = ${hits.toDouble / total}%.3f " +
        f"($hits/$total, corpus = ${emb.count()})")
    }
    spark.stop()
  }
}
