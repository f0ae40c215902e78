package graft.core

import scala.reflect.ClassTag

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession

/** The reference's cross-machine topology is two independent jobs
  * rendezvousing through files in external storage
  * (/root/reference/README.md:52-118): each mapper job uploads one
  * JSON-lines file per partition; each reducer job downloads its
  * partition's chunk set and merge-reduces it. Inside one Spark job the
  * DAG scheduler makes this invisible, but this "exported shuffle" mode
  * mirrors the two-job layout for API parity:
  *
  *  - `write`: run the full map-stage pipeline (MapReduce.shuffle) and
  *    persist partition i as the i-th output file (`part-00000...`) of
  *    JSON-lines `[key, value]` records, key-sorted — exactly the
  *    partition-file contract of /root/reference/lib/map_reduce/mapper.rb:76-121.
  *  - `read`: ingest any number of such chunk files (from one or many
  *    mapper jobs — multiset union, /root/reference/lib/map_reduce/reducer.rb:34-42)
  *    and re-reduce into final key-sorted partitions
  *    (/root/reference/lib/map_reduce/reducer.rb:69-100).
  *
  * Keys here are dynamic JSON values under RubyOrdering, because the
  * files are a language-neutral rendezvous format.
  */
object ExportedShuffle {

  implicit private val anyOrd: Ordering[Any] = RubyOrdering
  implicit private val anyTag: ClassTag[Any] = ClassTag.Any

  /** Map-stage job: shuffle + write partition files. One output file per
    * partition, named part-NNNNN (the reference's `{partition → path}`
    * yield, mapper.rb:87). */
  def write(
      pairs: RDD[(Any, Any)],
      dir: String,
      numPartitions: Int = 32,
      reduce: Option[(Any, Any, Any) => Any] = None,
      chunkLimit: Int = 32): Unit = {
    MapReduce.validateChunkLimit(chunkLimit)
    MapReduce
      .shufflePairs(pairs, numPartitions, reduce)
      .map { case (k, v) => JsonLines.generatePair(k, v) }
      .saveAsTextFile(dir)
  }

  /** Reduce-stage job: read chunk dirs/files (each line `[key, value]`)
    * and produce the final key-sorted, partitioned pairs. Without a
    * combiner this is the merge-only multiset passthrough of
    * /root/reference/spec/map_reduce/reducer_spec.rb:37-62. */
  def read(
      spark: SparkSession,
      paths: Seq[String],
      numPartitions: Int = 32,
      reduce: Option[(Any, Any, Any) => Any] = None,
      chunkLimit: Int = 32): RDD[(Any, Any)] = {
    MapReduce.validateChunkLimit(chunkLimit)
    val pairs = spark.sparkContext
      .textFile(paths.mkString(","))
      .map(JsonLines.parsePair)
    MapReduce.shufflePairs(pairs, numPartitions, reduce)
  }
}
