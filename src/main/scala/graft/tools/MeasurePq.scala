package graft.tools

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.operators.Similarity

/** Measures PQ+rerank recall vs brute force per SF — the numbers quoted
  * in Similarity's PQ scaladoc and backing the shipped PqRecallFloor.
  * Reports both the fixed-default shortlist ([[Similarity.PqShortlist]],
  * the scale-safe configuration) and the tuning-time
  * [[Similarity.chooseShortlist]] value the `knnPq` entry point uses. */
object MeasurePq {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val total = Similarity.NumQueries * Similarity.K
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val books = Similarity.cachedCodebooks(emb, dir)
      val brute = Similarity.ssKnnBrute(spark, dir)
        .select("q_id", "neighbor_id").cache()
      def recallOf(shortlist: Int): Double = {
        val pq = Similarity.knnPqOn(emb, books, shortlist = shortlist)
          .select("q_id", "neighbor_id")
        pq.join(brute, Seq("q_id", "neighbor_id"), "left_semi")
          .count().toDouble / total
      }
      val fixed = recallOf(Similarity.PqShortlist)
      val tuned = Similarity.tunedShortlist(emb, dir)
      val tunedRecall = recallOf(tuned)
      println(f"[pq] $sf corpus=${emb.count()} " +
        f"fixed(${Similarity.PqShortlist}) recall=$fixed%.3f | " +
        f"tuned shortlist=$tuned recall=$tunedRecall%.3f")
      brute.unpersist()
    }
    spark.stop()
  }
}
