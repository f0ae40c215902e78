package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Copy-on-write table with manifest-pinned snapshot versions and a
  * MERGE INTO that rewrites ONLY the files containing touched keys —
  * the lakehouse primitive (Delta/Iceberg's core idea, built here from
  * plain parquet + a text manifest, no table-format dependency).
  *
  * Layout:
  * {{{
  *   <table>/data/v<N>-<uniq>/part-*.parquet -- files written by version N
  *   <table>/dv/v<N>-<uniq>/part-*.parquet   -- deletion vectors of version N
  *   <table>/manifest/v<N>.manifest     -- header, then one file path/line
  *                                         (deletion vectors as dv:<path>)
  * }}}
  * A version's manifest lists the files that make up that snapshot —
  * typically a mix of files written by older versions (untouched by
  * later merges) and the current version's rewrites. Readers resolve
  * the highest complete manifest; old manifests stay readable (time
  * travel), and replaced data files are never deleted by a merge.
  *
  * Commit protocol (optimistic concurrency): the committer atomically
  * CREATES `v<N>.manifest` (create-exclusive — the loser of a race gets
  * FileAlreadyExistsException and must retry on the new version), then
  * writes the content through a temp file + atomic rename. A reader that
  * lands in the tiny window between create and rename sees an empty
  * manifest and falls back to the previous version ([[latestManifest]]
  * skips unparseable/empty manifests).
  *
  * MERGE INTO semantics (update-all flavor): source rows REPLACE
  * matched target rows' non-key columns; a matched source row with
  * `deleteCond` true deletes the target row; unmatched source rows are
  * inserted when `insert = true`. Source keys must be unique — multiple
  * matches for one target row are refused (the SQL MERGE error).
  *
  * 100 TB shape: touched-file discovery is ONE scan of the target with
  * the (broadcast, delta-sized) source key set semi-joined against
  * `input_file_name()` — on a table laid out by key (range partition,
  * Z-order, or compaction by key), a delta that touches few key ranges
  * rewrites few files while every other file is carried by reference
  * into the new manifest, never read or rewritten. The merge join runs
  * only over the touched files' rows ∪ source.
  */
object CowTable {

  private val Header = "graft-cow-manifest-v1"
  private val DvPrefix = "dv:"

  /** `files` are the data files of the snapshot; `dvs` are its deletion
    * vector files — parquet of (file_path, row_index) row identities a
    * reader must anti-join away. A v1 manifest with no `dv:` lines
    * parses with `dvs = Nil`, so pre-DV manifests stay readable. */
  case class Manifest(version: Int, files: Seq[String],
      dvs: Seq[String] = Nil)

  private def manifestDir(table: String): Path = Paths.get(table, "manifest")
  private def manifestPath(table: String, v: Int): Path =
    manifestDir(table).resolve(s"v$v.manifest")

  /** `input_file_name()` yields a URI; manifests store filesystem paths. */
  private def normalize(p: String): String = {
    val noScheme = if (p.startsWith("file:")) p.stripPrefix("file:") else p
    java.net.URLDecoder.decode(noScheme, "UTF-8").replaceAll("/+", "/")
  }

  private def parseManifest(path: Path, v: Int): Option[Manifest] = {
    if (!Files.isRegularFile(path)) return None
    val lines = scala.io.Source.fromFile(path.toFile, "UTF-8")
    try {
      val all = lines.getLines().toList
      all match {
        case Header :: rest if rest.nonEmpty =>
          val (dvLines, dataLines) = rest.partition(_.startsWith(DvPrefix))
          Some(Manifest(v, dataLines, dvLines.map(_.stripPrefix(DvPrefix))))
        case _ => None // empty or half-written: fall back to older version
      }
    } finally lines.close()
  }

  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[Path]()
      while (it.hasNext) buf += it.next()
      buf.toSeq
    } finally s.close()
  }

  def latestManifest(table: String): Option[Manifest] = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) return None
    listDir(dir).map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted(Ordering[Int].reverse).iterator
      .flatMap(v => parseManifest(manifestPath(table, v), v))
      .nextOption()
  }

  def readManifest(table: String, version: Int): Manifest =
    parseManifest(manifestPath(table, version), version).getOrElse(
      throw new IllegalArgumentException(
        s"cow table $table has no complete manifest v$version"))

  /** Create-exclusive claim on the version, then tmp-write + atomic
    * rename. Throws FileAlreadyExistsException when racing a committer
    * that claimed the same version first. */
  def commit(table: String, version: Int, files: Seq[String],
      dvs: Seq[String] = Nil): Manifest = {
    require(files.nonEmpty, s"cow commit v$version with no files")
    val dir = manifestDir(table)
    Files.createDirectories(dir)
    val target = manifestPath(table, version)
    Files.createFile(target) // atomic claim; loser throws here
    val tmp = dir.resolve(s".tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    Files.write(tmp,
      (Header +: (files ++ dvs.map(DvPrefix + _))).mkString("\n")
        .getBytes("UTF-8"))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    Manifest(version, files, dvs)
  }

  private def listPartFiles(out: Path): Seq[String] =
    listDir(out).map(_.toAbsolutePath.toString)
      .filter { p =>
        val n = Paths.get(p).getFileName.toString
        n.startsWith("part-") && n.endsWith(".parquet")
      }.sorted

  /** Version dirs carry a unique suffix because data is written BEFORE
    * the version is claimed: two committers racing the same version
    * number must not land in the same directory, or the loser's
    * `mode(overwrite)` write could delete the winner's files in the
    * window before the winner's manifest rename. Manifests reference
    * absolute file paths, so the directory name is free to vary; vacuum
    * walks every version dir regardless of name. */
  private def versionDir(table: String, kind: String, v: Int): Path =
    Paths.get(table, kind,
      s"v$v-${java.util.UUID.randomUUID().toString.take(8)}")

  /** Write `df` as version `v`'s data files and return their paths. */
  private def writeData(df: DataFrame, table: String, v: Int): Seq[String] = {
    val out = versionDir(table, "data", v)
    df.write.mode("overwrite").parquet(out.toString)
    listPartFiles(out)
  }

  /** Initialize the table at version 0 with `df`'s rows. */
  def init(df: DataFrame, table: String): Manifest =
    commit(table, 0, writeData(df, table, 0))

  /** DV-aware snapshot read: scan the data files, anti-join away the
    * deleted row identities. `_metadata.row_index` is the row's stable
    * position within its parquet file — a PUBLIC Spark metadata column,
    * so the anti-join is an exact positional delete with no key or
    * schema requirement on the table. The DV side rides a broadcast
    * (delete sets are delta-sized by design; a delete too big to
    * broadcast is what [[rewriteDeletes]] is for). Restricting the scan
    * to `onlyFiles` keeps the same semantics on a file subset: DV
    * entries for files outside the subset simply never match. */
  private def readSnapshot(spark: SparkSession, m: Manifest,
      onlyFiles: Option[Seq[String]] = None): DataFrame = {
    val files = onlyFiles.getOrElse(m.files)
    if (files.isEmpty)
      return spark.read.parquet(m.files: _*).limit(0)
    val data = spark.read.parquet(files: _*)
    if (m.dvs.isEmpty) data
    else {
      val dv = spark.read.parquet(m.dvs: _*)
        .select(col("file_path").as("__dv_fp"),
          col("row_index").as("__dv_ri"))
      data
        .withColumn("__fp", col("_metadata.file_path"))
        .withColumn("__ri", col("_metadata.row_index"))
        .join(broadcast(dv),
          col("__fp") === col("__dv_fp") && col("__ri") === col("__dv_ri"),
          "left_anti")
        .drop("__fp", "__ri")
    }
  }

  def read(spark: SparkSession, table: String): DataFrame = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    readSnapshot(spark, m)
  }

  def readVersion(spark: SparkSession, table: String, v: Int): DataFrame =
    readSnapshot(spark, readManifest(table, v))

  /** Merge-on-read DELETE: one snapshot scan finds the matching rows'
    * (file, row_index) identities and writes them as this version's
    * deletion vector — NO data file is read back or rewritten. On a
    * 100 TB table a delete touching a few thousand rows costs one scan
    * (file-pruned by the predicate like any other scan) plus a KB-sized
    * sidecar write; the copy-on-write alternative rewrites every file
    * containing a matching row. Scans through [[readSnapshot]] pay one
    * broadcast anti-join until [[rewriteDeletes]] or a compaction
    * materializes. The scan excludes already-deleted rows, so repeating
    * a delete is a no-op (returns the current manifest unchanged) and
    * DV files never accumulate duplicate identities. */
  def deleteWhere(spark: SparkSession, table: String,
      cond: Column): Manifest = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    val raw = spark.read.parquet(m.files: _*)
    val cand = raw.filter(cond)
      .select(col("_metadata.file_path").as("file_path"),
        col("_metadata.row_index").as("row_index"))
    val fresh =
      if (m.dvs.isEmpty) cand
      else cand.join(spark.read.parquet(m.dvs: _*),
        Seq("file_path", "row_index"), "left_anti")
    if (fresh.isEmpty) return m
    val v = m.version + 1
    val out = versionDir(table, "dv", v)
    fresh.write.mode("overwrite").parquet(out.toString)
    commit(table, v, m.files, m.dvs ++ listPartFiles(out))
  }

  /** Materialize deletion vectors: rewrite ONLY the files that carry a
    * live DV entry (discovered from the DVs themselves — a delta-sized
    * read, not a table scan), drop every DV, carry the rest by
    * reference. The periodic cleanup that bounds the reader's anti-join
    * cost; a no-op on a DV-free table. */
  def rewriteDeletes(spark: SparkSession, table: String): Manifest = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    if (m.dvs.isEmpty) return m
    val dvFiles = spark.read.parquet(m.dvs: _*)
      .select("file_path").distinct()
      .collect().map(r => normalize(r.getString(0))).toSet
    val (touched, untouched) =
      m.files.partition(f => dvFiles.contains(normalize(f)))
    val v = m.version + 1
    val newFiles =
      if (touched.isEmpty) Nil
      else {
        val clean = readSnapshot(spark, m, Some(touched))
        if (clean.isEmpty) Nil else writeData(clean, table, v)
      }
    commit(table, v, untouched ++ newFiles)
  }

  /** MERGE `source` into the table's latest snapshot on `keys`. Returns
    * the committed manifest. See the object doc for semantics. */
  def mergeInto(spark: SparkSession, table: String, source: DataFrame,
      keys: Seq[String], deleteCond: Option[Column] = None,
      insert: Boolean = true): Manifest = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    // unique-source-keys contract (multiple matches = SQL MERGE error);
    // source is delta-sized so the check is one small aggregate
    val uniq = source.agg(count(lit(1)).as("n"),
      count_distinct(col(keys.head), keys.tail.map(col): _*).as("d")).head()
    require(uniq.getLong(0) == uniq.getLong(1),
      s"mergeInto: source has ${uniq.getLong(0) - uniq.getLong(1)} duplicate keys")

    val target = spark.read.parquet(m.files: _*)
    require(keys.forall(target.columns.contains) &&
      keys.forall(source.columns.contains), s"merge keys $keys missing")
    val dataCols = target.columns.filterNot(keys.contains).toSeq
    require(dataCols.forall(source.columns.contains),
      "mergeInto: source must carry every target column (update-all form)")

    // 1. touched-file discovery: one target scan, broadcast key set.
    // The RAW scan is deliberate with DVs present: a file whose only
    // matching rows are deleted gets rewritten (its DV entries
    // materialize a version early) — conservative, never wrong.
    val srcKeys = source.select(keys.map(col): _*).distinct()
    val touched = target.withColumn("__file", input_file_name())
      .join(broadcast(srcKeys), keys, "left_semi")
      .select("__file").distinct()
      .collect().map(r => normalize(r.getString(0))).toSet
    val (touchedFiles, untouchedFiles) =
      m.files.partition(f => touched.contains(normalize(f)))

    // 2. merge only touched rows (deletion-vector-applied: a deleted
    // row is absent, so a source row with its key INSERTS) with the
    // source
    val touchedRows =
      if (touchedFiles.isEmpty) target.limit(0)
      else readSnapshot(spark, m, Some(touchedFiles))
    val srcTagged = source
      .withColumn("__del", deleteCond.getOrElse(lit(false)))
      .withColumn("__src", lit(1))
      .select(keys.map(col) ++ dataCols.map(col) :+ col("__del") :+
        col("__src"): _*)
    val tgtTagged = touchedRows.withColumn("__tgt", lit(1))
    val joined = tgtTagged.as("t")
      .join(srcTagged.as("s"), keys, "full_outer")
    val matchedDelete = col("__src").isNotNull && col("__tgt").isNotNull &&
      col("__del")
    val insertOnly = col("__tgt").isNull
    val kept = joined
      .filter(!coalesce(matchedDelete, lit(false)))
      .filter(if (insert) lit(true) else !insertOnly)
    val merged = kept.select(
      keys.map(col) ++ dataCols.map(c =>
        when(col("__src").isNotNull, col(s"s.$c"))
          .otherwise(col(s"t.$c")).as(c)): _*)

    // 3. new snapshot = carried untouched files + this version's
    // rewrites. DVs are carried as-is: entries for untouched files are
    // still live; entries for rewritten files reference paths no longer
    // in the manifest and can never match again (version dirs are never
    // reused) — compaction or rewriteDeletes trims them.
    val v = m.version + 1
    val newFiles =
      if (merged.isEmpty) Nil else writeData(merged, table, v)
    commit(table, v, untouchedFiles ++ newFiles, m.dvs)
  }

  /** Compact the latest snapshot's small files into ~targetBytes files
    * as a NEW table version: right-sized files are carried by reference
    * (the metadata-only move [[Layout.compactSmallFiles]] documents),
    * only the small tail is read and rewritten. No-op (returns the
    * current manifest) when ≤1 small file exists. */
  def compactTable(spark: SparkSession, table: String, targetBytes: Long,
      smallThreshold: Option[Long] = None): Manifest = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    val small = smallThreshold.getOrElse(targetBytes / 2)
    val sized = m.files.map(f => (f, Files.size(Paths.get(f))))
    val (keep, smalls) = sized.partition(_._2 >= small)
    if (smalls.size <= 1) return m
    val smallBytes = smalls.map(_._2).sum
    val n = math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt)
    val v = m.version + 1
    val out = versionDir(table, "data", v)
    // DV-applied rows: compaction materializes the tail's deletes for
    // free; kept files' DV entries stay live and are carried
    Layout.compactRows(readSnapshot(spark, m, Some(smalls.map(_._1))),
      n, out.toString)
    commit(table, v, keep.map(_._1) ++ listPartFiles(out), m.dvs)
  }

  /** [[compactTable]] with Z-order re-clustering of the rewritten tail
    * ([[Layout.compactSmallFilesZorder]]): right-sized files are still
    * carried by reference, but the small files — which a streaming CDC
    * merge loop produces in arrival order, i.e. clustered by NOTHING —
    * come out tiling the `zCols` space, so file-level min/max pruning on
    * any clustered dimension recovers as the table is maintained. The
    * compaction IS the layout job; there is no separate rewrite. */
  def compactTableZorder(spark: SparkSession, table: String,
      targetBytes: Long, zCols: Seq[String], bits: Int = Layout.ZBits,
      smallThreshold: Option[Long] = None): Manifest = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    val small = smallThreshold.getOrElse(targetBytes / 2)
    val sized = m.files.map(f => (f, Files.size(Paths.get(f))))
    val (keep, smalls) = sized.partition(_._2 >= small)
    if (smalls.size <= 1) return m
    val smallBytes = smalls.map(_._2).sum
    val n = math.max(1, math.ceil(smallBytes.toDouble / targetBytes).toInt)
    val v = m.version + 1
    val out = versionDir(table, "data", v)
    Layout.compactRowsZorder(readSnapshot(spark, m, Some(smalls.map(_._1))),
      n, out.toString, zCols, bits)
    commit(table, v, keep.map(_._1) ++ listPartFiles(out), m.dvs)
  }

  /** Delete data files and manifests unreachable from the newest
    * `keepVersions` complete snapshots; returns the deleted data files.
    * Time travel to vacuumed versions is gone by design. Claimed-but-
    * unwritten manifests NEWER than the latest complete one are left
    * alone (an in-flight commit owns them). */
  def vacuum(table: String, keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, s"vacuum must keep >= 1 version")
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) return Nil
    val versions = listDir(dir).map(_.getFileName.toString)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toInt }
      .sorted(Ordering[Int].reverse)
    val complete = versions.flatMap(v => parseManifest(manifestPath(table, v), v))
    val kept = complete.take(keepVersions)
    if (kept.isEmpty) return Nil
    val live = kept.flatMap(m => m.files ++ m.dvs).map(normalize).toSet
    val oldestKept = kept.map(_.version).min
    val deleted = scala.collection.mutable.ArrayBuffer[String]()
    Seq(Paths.get(table, "data"), Paths.get(table, "dv"))
      .filter(Files.isDirectory(_)).foreach { root =>
        listDir(root).filter(Files.isDirectory(_)).foreach { vdir =>
          listPartFiles(vdir).foreach { f =>
            if (!live.contains(normalize(f))) {
              Files.deleteIfExists(Paths.get(f))
              deleted += f
            }
          }
        }
      }
    versions.filter(_ < oldestKept).foreach { v =>
      Files.deleteIfExists(manifestPath(table, v))
    }
    deleted.toSeq
  }

  /** Change data feed: the row-level delta between two committed
    * versions, classified per key as
    * `insert` / `delete` / `update_preimage` / `update_postimage`
    * (Delta CDF's vocabulary). `keys` must be a unique key in both
    * versions — the same contract MERGE already enforces.
    *
    * The diff never scans the table: both sides are restricted to the
    * CHANGED file set — files present in exactly one manifest (rewrites,
    * compactions, new data) plus common files that gained deletion
    * vector entries — so the cost is proportional to what the merges
    * actually rewrote, not to table size. Rows a rewrite carried
    * unchanged (and everything a compaction or Z-order pass moved
    * between files) compare identical under the full-outer key join and
    * vanish from the feed: layout maintenance is change-free by
    * construction. One shuffle (the key join); the pre/post branches
    * reuse its exchange.
    *
    * This is what closes the incremental-MV loop for CoW tables: feed
    * the postimages/inserts as upserts and the deletes as tombstones
    * into [[Changelog.aggMaintain]] and a downstream aggregate follows
    * the table version-by-version without ever re-scanning it
    * (CowCdfMaintainSpec proves maintained ≡ rebuilt). */
  def tableChanges(spark: SparkSession, table: String, fromV: Int,
      toV: Int, keys: Seq[String]): DataFrame = {
    require(fromV < toV, s"tableChanges: need fromV < toV, got $fromV..$toV")
    val fm = readManifest(table, fromV)
    val tm = readManifest(table, toV)
    val fmSet = fm.files.map(normalize).toSet
    val tmSet = tm.files.map(normalize).toSet
    val remF = fm.files.filterNot(f => tmSet.contains(normalize(f)))
    val addF = tm.files.filterNot(f => fmSet.contains(normalize(f)))
    val dvNew = tm.dvs.filterNot(fm.dvs.toSet)
    val dvAffected: Seq[String] =
      if (dvNew.isEmpty) Nil
      else {
        val touched = spark.read.parquet(dvNew: _*)
          .select("file_path").distinct()
          .collect().map(r => normalize(r.getString(0))).toSet
        tm.files.filter(f => touched.contains(normalize(f)) &&
          fmSet.contains(normalize(f)))
      }
    val oldSide = readSnapshot(spark, fm, Some((remF ++ dvAffected).distinct))
    val newSide = readSnapshot(spark, tm, Some((addF ++ dvAffected).distinct))
    require(keys.forall(oldSide.columns.contains), s"keys $keys missing")
    // a duplicated key would silently misclassify under the key join;
    // both sides are changed-file-sized, so the check is delta-priced
    Seq("from" -> oldSide, "to" -> newSide).foreach { case (side, df) =>
      val u = df.agg(count(lit(1)).as("n"),
        count_distinct(col(keys.head), keys.tail.map(col): _*).as("d")).head()
      require(u.getLong(0) == u.getLong(1),
        s"tableChanges: $side version has ${u.getLong(0) - u.getLong(1)} " +
          s"duplicate keys on $keys")
    }
    val dataCols = oldSide.columns.filterNot(keys.contains).toSeq

    val o = oldSide.select(keys.map(col) ++
      dataCols.map(c => col(c).as(s"__o_$c")) :+ lit(1).as("__in_o"): _*)
    val n = newSide.select(keys.map(col) ++
      dataCols.map(c => col(c).as(s"__n_$c")) :+ lit(1).as("__in_n"): _*)
    val j = o.join(n, keys, "full_outer")
    val same = dataCols.map(c => col(s"__o_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val pre = j.filter(col("__in_o").isNotNull &&
        (col("__in_n").isNull || !same))
      .select(keys.map(col) ++ dataCols.map(c => col(s"__o_$c").as(c)) :+
        when(col("__in_n").isNull, "delete").otherwise("update_preimage")
          .as("_change_type"): _*)
    val post = j.filter(col("__in_n").isNotNull &&
        (col("__in_o").isNull || !same))
      .select(keys.map(col) ++ dataCols.map(c => col(s"__n_$c").as(c)) :+
        when(col("__in_o").isNull, "insert").otherwise("update_postimage")
          .as("_change_type"): _*)
    pre.unionByName(post)
  }

  /** Build (one snapshot scan) and register an MV of the CURRENT
    * snapshot, pinned to its exact file set: after any later merge the
    * scan's file set changes, the registration no longer matches, and
    * the rewrite stands down instead of serving a stale summary —
    * re-invoke after maintaining the MV for the new version. Sums-only
    * by default (the maintained-MV shape); pass `withMinMax = true` for
    * a rebuild-style MV that also answers min/max. */
  def registerMv(spark: SparkSession, table: String, name: String,
      groupKeys: Seq[String], measures: Seq[String], mvPath: String,
      withMinMax: Boolean = false): Manifest = {
    val m = latestManifest(table).getOrElse(throw new IllegalArgumentException(
      s"cow table $table does not exist"))
    // the rewrite matches the raw file-set scan, but a DV'd snapshot is
    // scan + anti-join — the summary would silently include deleted
    // rows. Materialize first.
    require(m.dvs.isEmpty,
      s"registerMv: $table v${m.version} has deletion vectors; " +
        "run rewriteDeletes before registering an MV")
    graft.plans.MvCatalog.buildMv(spark.read.parquet(m.files: _*),
      groupKeys, measures, mvPath, withMinMax)
    graft.plans.MvCatalog.registerFiles(spark, name, m.files,
      groupKeys, measures, mvPath)
    graft.plans.MvRewriteApi.enable(spark)
    m
  }

  // ------------------------------------------------------------- gate
  // Merge a doubled-price even-orderkey slice into a snapshot of the
  // odd-ish orders (keys % 4 != 0): exercises update (matched, status
  // not F), delete (matched source rows with status F), insert (keys
  // % 4 == 0 absent from the target), and untouched carry (odd keys
  // never in the source). The gate reads the final table content —
  // oracle is the same MERGE expressed as anti-join/join/anti-join
  // UNION ALL in DuckDB. Fresh table per invocation (UUID dir) so
  // repeated verifies never double-merge.
  def lhMerge(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
      java.util.UUID.randomUUID().toString.take(8)
    init(orders.filter(pmod(col("o_orderkey"), lit(4)) =!= 0), table)
    val source = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeInto(s, table, source, Seq("o_orderkey"),
      deleteCond = Some(col("o_orderstatus") === "F"), insert = true)
    read(s, table)
  }

  val lhMergeSql: String =
    """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 0),
      |source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0)
      |SELECT * FROM target
      |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
      |UNION ALL
      |SELECT s.* FROM source s JOIN target t USING (o_orderkey)
      |WHERE s.o_orderstatus <> 'F'
      |UNION ALL
      |SELECT s.* FROM source s
      |WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM target)""".stripMargin

  /** Gate: streaming-shaped ingest (init + an insert-only merge, each
    * half of orders by orderkey parity — the merge's full-outer output
    * partitioning leaves a genuine multi-file arrival-ordered tail);
    * [[compactTableZorder]] rewrites the whole
    * tail clustered on (o_custkey, o_orderkey). The emitted per-z-cell
    * aggregate recomputes the gate-exact Morton code from the COLUMNS at
    * read time, so it pins exact content preservation through
    * merge + z-compaction regardless of physical layout — the oracle is
    * the same aggregate straight over orders. The layout property
    * itself (contiguous z-ranges per rewritten file, pruning recovery,
    * right-sized files carried by reference) is spec-measured on the
    * real written files in CowTableSpec. */
  def lhCompactZorder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir)
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
      java.util.UUID.randomUUID().toString.take(8)
    init(ord.filter(pmod($"o_orderkey", lit(2)) === 1), table)
    mergeInto(s, table, ord.filter(pmod($"o_orderkey", lit(2)) === 0),
      Seq("o_orderkey"))
    val sizes = latestManifest(table).get.files.map(f =>
      Files.size(Paths.get(f)))
    compactTableZorder(s, table, targetBytes = math.max(1L, sizes.sum / 2),
      zCols = Seq("o_custkey", "o_orderkey"),
      smallThreshold = Some(sizes.max + 1))
    val t = read(s, table)
    val m = t.agg(max($"o_custkey"), max($"o_orderkey")).head()
    val (mx, my) = (m.getLong(0), m.getLong(1))
    t.withColumn("zv", Layout.zValue(
        Seq(expr(s"(o_custkey * ${Layout.ZLevels}) div ${mx + 1}"),
          expr(s"(o_orderkey * ${Layout.ZLevels}) div ${my + 1}")),
        Layout.ZBits))
      .groupBy($"zv")
      .agg(count(lit(1)).as("n"),
        count_distinct($"o_custkey").as("n_cust"),
        sum($"o_totalprice".cast("decimal(12,2)")).cast("double")
          .as("sum_price"))
  }

  val lhCompactZorderSql: String = {
    val z = Layout.zValueSql(Seq("xq", "yq"), Layout.ZBits)
    s"""SELECT ($z) AS zv, COUNT(*) AS n,
       |  COUNT(DISTINCT o_custkey) AS n_cust,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
       |    AS sum_price
       |FROM (SELECT
       |    ((o_custkey * ${Layout.ZLevels}) //
       |      (SELECT MAX(o_custkey) + 1 FROM orders)) AS xq,
       |    ((o_orderkey * ${Layout.ZLevels}) //
       |      (SELECT MAX(o_orderkey) + 1 FROM orders)) AS yq,
       |    o_custkey, o_totalprice
       |  FROM orders) q
       |GROUP BY 1""".stripMargin
  }

  /** Gate: two stacked merge-on-read deletes (different predicates, so
    * the second DV accumulates on top of the first and overlapping row
    * identities are deduplicated) against a snapshot of orders, read
    * back through the DV-applying reader and aggregated per status —
    * the oracle is the same aggregate over orders with both delete
    * predicates negated. That no data file was touched, the DV-file
    * mechanics, and rewriteDeletes equivalence are spec-pinned on real
    * files in CowTableSpec. */
  def lhDeleteVectors(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
      java.util.UUID.randomUUID().toString.take(8)
    init(orders, table)
    deleteWhere(s, table, col("o_orderstatus") === "F" &&
      pmod(col("o_orderkey"), lit(10)) === 3)
    deleteWhere(s, table, pmod(col("o_custkey"), lit(97)) === 5)
    read(s, table).groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        count_distinct(col("o_custkey")).as("n_cust"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double")
          .as("sum_price"))
  }

  val lhDeleteVectorsSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  COUNT(DISTINCT o_custkey) AS n_cust,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
      |    AS sum_price
      |FROM orders
      |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 3)
      |  AND NOT (o_custkey % 97 = 5)
      |GROUP BY 1""".stripMargin

  /** Gate: the change feed across a MERGE (v0→v1, the lh_merge
    * construction) followed by a merge-on-read DELETE (v1→v2), read as
    * one v0→v2 diff. The oracle rebuilds the same classification
    * relationally: deletes are target keys absent from the final state,
    * inserts are final keys absent from the target, and matched keys
    * whose row content differs emit a pre/post image pair. Only
    * o_totalprice can differ for a matched key (the update rewrites it;
    * every other column rides along from the same orders row), so the
    * oracle's difference test is that single column in both engines. */
  def lhChanges(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val table = s"${System.getProperty("java.io.tmpdir")}/graft_cow/" +
      java.util.UUID.randomUUID().toString.take(8)
    init(orders.filter(pmod(col("o_orderkey"), lit(4)) =!= 0), table)
    val source = orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    mergeInto(s, table, source, Seq("o_orderkey"),
      deleteCond = Some(col("o_orderstatus") === "F"), insert = true)
    deleteWhere(s, table, pmod(col("o_custkey"), lit(5)) === 2)
    tableChanges(s, table, 0, 2, Seq("o_orderkey"))
  }

  val lhChangesSql: String =
    """WITH target AS (SELECT * FROM orders WHERE o_orderkey % 4 <> 0),
      |source AS (SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 2 = 0),
      |merged AS (
      |  SELECT * FROM target
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)
      |  UNION ALL
      |  SELECT s.* FROM source s JOIN target t USING (o_orderkey)
      |  WHERE s.o_orderstatus <> 'F'
      |  UNION ALL
      |  SELECT s.* FROM source s
      |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM target)),
      |final AS (SELECT * FROM merged WHERE o_custkey % 5 <> 2)
      |SELECT t.*, 'delete' AS _change_type FROM target t
      |WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM final)
      |UNION ALL
      |SELECT f.*, 'insert' FROM final f
      |WHERE f.o_orderkey NOT IN (SELECT o_orderkey FROM target)
      |UNION ALL
      |SELECT t.*, 'update_preimage'
      |FROM target t JOIN final f USING (o_orderkey)
      |WHERE t.o_totalprice <> f.o_totalprice
      |UNION ALL
      |SELECT f.*, 'update_postimage'
      |FROM final f JOIN target t USING (o_orderkey)
      |WHERE t.o_totalprice <> f.o_totalprice""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "lh_merge" -> lhMerge,
    "lh_compact_zorder" -> lhCompactZorder,
    "lh_delete_vectors" -> lhDeleteVectors,
    "lh_changes" -> lhChanges,
  )

  val oracles: Map[String, String] = Map(
    "lh_merge" -> lhMergeSql,
    "lh_compact_zorder" -> lhCompactZorderSql,
    "lh_delete_vectors" -> lhDeleteVectorsSql,
    "lh_changes" -> lhChangesSql,
  )
}
