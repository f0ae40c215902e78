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

/** TRANSACTIONAL follow: consumer offset and sink commit are ONE atomic
  * step — the FileSinkExactlyOnce discipline applied to the change
  * feed. Each source version's slice writes to the DETERMINISTIC path
  * `<sink>/slice-v<N>` (idempotent: a replay overwrites byte-equivalent
  * content, because source manifests are immutable and the slice is a
  * pure function of two manifests), and the high-water mark advances by
  * atomically creating the marker `<sink>/_commits/v<N>`. The marker IS
  * both the offset record and the sink's commit point:
  *
  *  - crash AFTER slice write, BEFORE marker → restart recomputes the
  *    same slice into the same dir and commits once; the orphan bytes
  *    were never visible;
  *  - crash AFTER marker → restart resumes from N, never re-applies;
  *  - [[readFeed]] resolves ONLY marker-committed slices, so a
  *    concurrent reader can never observe a half-written slice.
  *
  * This is Delta-CDF-as-a-stream with the consumer's checkpoint and
  * output unified in one filesystem transaction; at 100 TB the markers
  * are O(1)-sized and the slice cost stays delta-priced. Vacuum
  * retention on the SOURCE must cover the consumer's lag. */
object CowFollowSink {

  private def commitsDir(sink: String) =
    java.nio.file.Paths.get(sink, "_commits")

  private def sliceDir(sink: String, v: Int) = s"$sink/slice-v$v"

  /** Highest marker-committed source version (the checkpointed offset);
    * `initialV` for a fresh sink. */
  def committedVersion(sink: String, initialV: Int = 0): Int = {
    val dir = commitsDir(sink)
    if (!java.nio.file.Files.isDirectory(dir)) return initialV
    val s = java.nio.file.Files.list(dir)
    try {
      val it = s.iterator()
      var mx = initialV
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("v")) mx = math.max(mx, n.drop(1).toInt)
      }
      mx
    } finally s.close()
  }

  /** Catch the sink up to the source's latest version; returns the new
    * committed high-water mark. Restart-safe at any point. With
    * `cursorId` set, the committed high-water also registers at the
    * SOURCE table ([[CowTable.registerFeedCursor]]) after every slice
    * commit, so timestamp retention ([[CowTable.expireSnapshots]])
    * cannot expire manifests this consumer still needs — the lag
    * guard of the CDF contract. */
  def catchUp(spark: SparkSession, table: String, keys: Seq[String],
      sink: String, initialV: Int = 0,
      cursorId: Option[String] = None): Int = {
    java.nio.file.Files.createDirectories(commitsDir(sink))
    val hi = CowFollow.catchUp(spark, table, keys,
      committedVersion(sink, initialV)) { (slice, v) =>
      val stamped = slice.withColumn("_commit_version",
        org.apache.spark.sql.functions.lit(v.toLong))
      // schema sidecar: lets readFeed return a typed EMPTY feed when
      // every committed slice is empty (maintenance-only versions)
      val sf = java.nio.file.Paths.get(sink, "schema.json")
      if (!java.nio.file.Files.exists(sf))
        java.nio.file.Files.write(sf, stamped.schema.json.getBytes("UTF-8"))
      stamped.write.mode("overwrite").parquet(sliceDir(sink, v))
      // atomic offset+commit: the marker's existence is the transaction
      try java.nio.file.Files.createFile(commitsDir(sink).resolve(s"v$v"))
      catch { case _: java.nio.file.FileAlreadyExistsException => }
      cursorId.foreach(CowTable.registerFeedCursor(table, _, v))
    }
    // a caught-up consumer pins from its high-water even when no new
    // slice landed this call
    cursorId.foreach(CowTable.registerFeedCursor(table, _, hi))
    hi
  }

  /** Every marker-committed slice, in version order, as one DataFrame
    * (`_commit_version` carries provenance). Uncommitted slice bytes
    * are invisible by construction. Empty slices (layout-maintenance
    * versions) may have no part files and contribute nothing — a sink
    * whose EVERY committed slice is empty (it caught up over
    * maintenance-only commits) yields a typed EMPTY feed via the
    * schema sidecar; only a genuinely fresh sink (no commits at all)
    * throws. */
  def readFeed(spark: SparkSession, sink: String,
      initialV: Int = 0): DataFrame = {
    val hi = committedVersion(sink, initialV)
    val dirs = (initialV + 1 to hi).map(v => sliceDir(sink, v)).filter { d =>
      val p = java.nio.file.Paths.get(d)
      java.nio.file.Files.isDirectory(p) && {
        val s = java.nio.file.Files.list(p)
        try {
          var found = false
          val it = s.iterator()
          while (it.hasNext && !found)
            found = it.next().getFileName.toString.endsWith(".parquet")
          found
        } finally s.close()
      }
    }
    if (dirs.nonEmpty) return spark.read.parquet(dirs: _*)
    val sf = java.nio.file.Paths.get(sink, "schema.json")
    if (hi > initialV && java.nio.file.Files.exists(sf)) {
      val schema = org.apache.spark.sql.types.DataType.fromJson(
        new String(java.nio.file.Files.readAllBytes(sf), "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else throw new IllegalArgumentException(
      s"no committed slices in $sink")
  }
}
