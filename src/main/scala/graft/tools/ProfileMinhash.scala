package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Throwaway stage profiler for the minhash pipeline (not part of the
  * driver contract). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    val docs = Tables.documents(spark, sfDir)
    time("warmup count")(docs.count())
    val withSh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles")(withSh.write.format("noop").mode("overwrite").save().asInstanceOf[Any] match { case _ => withSh.count() })
    val sigs = Dedup.signatures(docs)
    time("signatures")(sigs.count())
    val sigsC = sigs.cache()
    time("signatures cached")(sigsC.count())
    val buckets = Dedup.bandedBuckets(sigsC)
    time("buckets")(buckets.count())
    val cands = buckets.as("x").join(buckets.as("y"),
      col("x.band") === col("y.band") && col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    time("candidates")(cands.count())
    time("full pairs")(Dedup.ddMinhashLshFull(spark, sfDir).count())
    spark.stop()
  }
}
