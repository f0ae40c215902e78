package graft.core

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import org.apache.spark.Partitioner
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-exact re-expression of the reference's hash partitioner
  * (/root/reference/lib/map_reduce/hash_partitioner.rb:28-30):
  * `SHA1(JSON(key))` → first 5 hex digits → base-16 int → mod N.
  *
  * Same key ⇒ same partition must be stable across jobs and languages
  * because partition files are rendezvous points in external storage
  * (/root/reference/README.md:60-84), so parity is load-bearing; pinned
  * vectors live in Sha1HashPartitionerSpec.
  */
final case class Sha1HashPartitioner(numPartitions: Int) extends (Any => Int) with Serializable {
  require(numPartitions > 0, "numPartitions must be positive")

  def apply(key: Any): Int = partitionForJson(RubyJson.generate(key))

  /** First 5 hex digits of SHA1 = the top 20 bits of the digest. */
  def partitionForJson(keyJson: String): Int = {
    val d = MessageDigest.getInstance("SHA-1").digest(keyJson.getBytes(UTF_8))
    val top20 = ((d(0) & 0xff) << 12) | ((d(1) & 0xff) << 4) | ((d(2) & 0xff) >>> 4)
    top20 % numPartitions
  }
}

object Sha1HashPartitioner {

  /** Spark `Partitioner` for RDD-level shuffles
    * (`repartitionAndSortWithinPartitions`) with the same arithmetic. */
  final class AsSparkPartitioner(n: Int) extends Partitioner {
    private val p = Sha1HashPartitioner(n)
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = p(key)
    override def equals(other: Any): Boolean = other match {
      case o: AsSparkPartitioner => o.numPartitions == n
      case _ => false
    }
    override def hashCode(): Int = n
  }

  /** Column-level equivalent for the DataFrame path, applied to a column
    * that already holds the canonical JSON of the key:
    * `conv(substring(sha1(j),1,5),16,10) % n`. Stays inside whole-stage
    * codegen (all built-in expressions). */
  def partitionColForJson(keyJson: Column, n: Int): Column =
    (conv(substring(sha1(keyJson), 1, 5), 16, 10).cast("long") % n).cast("int")
}
