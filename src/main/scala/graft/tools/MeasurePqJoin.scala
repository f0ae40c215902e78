package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Measures the PQ JOIN's economics per SF on the CLUSTERED corpus
  * ([[Similarity.clusteredCorpus]]): the recall-vs-shortlist curve,
  * the 0.9-tuned shortlist, and the cell join's corpus-side exchange
  * bytes for codes vs raw vectors — the numbers behind
  * `ss_knn_join_pq_econ`'s gate booleans. */
object MeasurePqJoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.001", "sf0.01")
    sfs.foreach { sf =>
      val dir = s"/root/testdata/$sf"
      val emb0 = Tables.embeddings(spark, dir)
      val kCells = math.max(Similarity.IvfCells, (emb0.count() / 32L).toInt)
      val cents = Similarity.trainCentroids(emb0, k = kCells)
      val emb = Similarity.clusteredCorpus(emb0, cents).persist()
      val n = emb.count()
      val sample = Similarity.trainSample(emb).persist()
      val books = Similarity.trainCodebooksResidual(sample, cents)
      sample.unpersist()
      val truth = Similarity.knnJoinOn(emb, cents, Similarity.IvfProbe)
        .filter(col("q_id") < Similarity.NumQueries)
        .select(col("q_id"), col("neighbor_id")).cache()
      val tot = truth.count()
      Seq(5, 10, 20, 40).foreach { sl =>
        val hits = Similarity.knnJoinPqOn(emb, cents, books,
          Similarity.IvfProbe, shortlist = sl,
          sampleQ = Some(Similarity.NumQueries), residual = true)
          .select(col("q_id"), col("neighbor_id"))
          .join(truth, Seq("q_id", "neighbor_id"), "left_semi").count()
        println(s"$sf n=$n RECALL sl=$sl -> ${hits.toDouble / tot}")
      }
      val tuned = Similarity.chooseJoinShortlist(emb, cents, books,
        residual = true)
      println(s"$sf TUNED shortlist=$tuned (k=${Similarity.K})")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val exact = Similarity.knnJoinOn(emb, cents, Similarity.IvfProbe)
      Similarity.executeForMetrics(exact)
      val vecB = Similarity.cellJoinScanBytes(exact, "embedding")
      val pq = Similarity.knnJoinPqOn(emb, cents, books,
        Similarity.IvfProbe, shortlist = tuned, residual = true)
      Similarity.executeForMetrics(pq)
      val codeB = Similarity.cellJoinScanBytes(pq, "codes")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      println(s"$sf BYTES vectors=$vecB codes=$codeB " +
        f"ratio=${vecB.toDouble / math.max(1L, codeB)}%.2f")
      truth.unpersist()
      emb.unpersist()
    }
    spark.stop()
  }
}
