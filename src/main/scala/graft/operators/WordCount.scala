package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{MapReduce, MapReduceSpec}

/** The reference's canonical end-to-end example
  * (/root/reference/README.md:34-46): map = whitespace-split the text and
  * emit (word, 1); reduce = sum. Two equivalent engines:
  *
  *  - `viaMapReduce` exercises the MapReduceJob kernel (flatMap →
  *    partial+final aggregate), proving the user-callback surface;
  *  - `viaDataFrame` is the pure-Catalyst plan (explode/split/groupBy),
  *    whole-stage-codegen'd end to end — the one you'd run at 100 TB.
  */
object WordCount {

  final class Job extends MapReduceSpec[String, String, Long] {
    override def map(text: String): IterableOnce[(String, Long)] =
      text.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L))
    override def reduce(key: String, a: Long, b: Long): Long = a + b
  }

  def viaMapReduce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val texts = Tables.documents(spark, dir).select($"text").as[String]
    MapReduce.run(texts, new Job).toDF("word", "cnt")
  }

  def viaDataFrame(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(split($"text", "\\s+")).as("word"))
      .where($"word" =!= "")
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
  }
}
