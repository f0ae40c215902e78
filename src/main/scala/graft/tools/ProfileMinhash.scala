package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Scale}

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
    val docsP = Scale.ensureParallelism(docs)
    val withSh = docsP.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
    time("shingles (x2)")({ withSh.count(); withSh.count() })
    val sigs = Dedup.signatures(docs)
    time("signatures+join (x2)")({ sigs.count(); sigs.count() })
    for (i <- 1 to 3)
      time(s"full pairs run$i")(Dedup.ddMinhashLshFull(spark, sfDir).count())
    spark.stop()
  }
}
