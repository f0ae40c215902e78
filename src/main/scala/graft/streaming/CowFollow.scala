package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CowTable

/** Follow-the-table: drive a downstream consumer from a CoW table's
  * change data feed, version by version — the "table as a stream"
  * pattern (Delta's CDF-as-source) without inventing a source: the
  * commit log IS the offset log. Each committed version is one
  * micro-batch; [[catchUp]] applies every not-yet-seen version's
  * row-level change slice IN ORDER, and [[follow]] wraps it in a
  * bounded poll loop for live tables.
  *
  * Semantics the CDF already guarantees carry over: slices are
  * change-file-bounded (cost follows what each commit rewrote),
  * compaction/Z-order versions produce EMPTY slices (layout maintenance
  * is invisible downstream), and a consumer that applies
  * inserts/updates as upserts and deletes as removals reconstructs the
  * table exactly — the spec proves a replica driven only by slices
  * equals the final snapshot while a writer commits concurrently.
  *
  * Crash-resume is the caller's high-water mark: persist the returned
  * version with the consumer's own state (the exactly-once discipline
  * of FileSinkExactlyOnceSpec) and pass it back as `fromV`. Vacuum
  * retention must cover the consumer's lag — a vacuumed version's
  * manifest is gone and the feed cannot be rebuilt from before it. */
object CowFollow {

  /** Apply every committed version in (fromV, latest] as one
    * change-slice call each; returns the new high-water version.
    * A version committed DURING the catch-up is picked up too. */
  def catchUp(spark: SparkSession, table: String, keys: Seq[String],
      fromV: Int)(apply: (DataFrame, Int) => Unit): Int = {
    var v = fromV
    var latest = CowTable.latestManifest(table).map(_.version).getOrElse(v)
    while (v < latest) {
      while (v < latest) {
        val slice = CowTable.tableChanges(spark, table, v, v + 1, keys)
        apply(slice, v + 1)
        v += 1
      }
      latest = CowTable.latestManifest(table).map(_.version).getOrElse(v)
    }
    v
  }

  /** Poll loop over [[catchUp]]: keeps following until `idlePolls`
    * consecutive polls observe no new version. Returns the final
    * high-water version. */
  def follow(spark: SparkSession, table: String, keys: Seq[String],
      fromV: Int, pollMs: Long = 50L, idlePolls: Int = 10)(
      apply: (DataFrame, Int) => Unit): Int = {
    var v = fromV
    var idle = 0
    while (idle < idlePolls) {
      val nv = catchUp(spark, table, keys, v)(apply)
      if (nv == v) {
        idle += 1
        Thread.sleep(pollMs)
      } else {
        idle = 0
        v = nv
      }
    }
    v
  }
}
