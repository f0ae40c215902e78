package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling

/** Measures KLL range-bucket balance per SF (tools-only): per-bucket
  * shares and the worst ABSOLUTE deviation from 1/n — the evidence
  * behind [[Sampling.RangeBucketTolAbs]] (KLL bounds each boundary's
  * rank error absolutely, so the envelope is absolute, not relative). */
object MeasureRangeBuckets {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val li = Tables.lineitem(spark, dir)
        .select(col("l_extendedprice").cast("double").as("v"))
      val bounds = Sampling.rangeBucketBoundaries(li, col("v"),
        Sampling.RangeBuckets)
      val counts = Sampling.withRangeBucket(li, col("v"), bounds)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket")).collect()
      val total = counts.map(_.getLong(1)).sum.toDouble
      val shares = counts.map(r => r.getLong(1) / total)
      val even = 1.0 / Sampling.RangeBuckets
      val worst = shares.map(s => math.abs(s - even)).max
      println(f"[rangebuckets] $sf buckets=${counts.length} " +
        f"worst_abs_dev=$worst%.4f shares=${shares.map(s => f"$s%.4f").mkString(",")}")
    }
    spark.stop()
  }
}
