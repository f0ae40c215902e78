package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** One-off: measured IVF recall vs brute force per (sf, nprobe, sample
  * mod) — the numbers behind the shipped probe count and recall floor. */
object MeasureIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val brute = Similarity.ssKnnBrute(spark, dir)
        .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
      for (probe <- Seq(8, 10, 12, 14)) {
        val ivf = Similarity.knnIvf(spark, dir, probe)
          .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val recall = (brute & ivf).size.toDouble / brute.size
        println(f"[$sf] probe=$probe recall=$recall%.3f")
      }
    }
    spark.stop()
  }
}
