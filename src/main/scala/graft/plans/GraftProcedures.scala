package graft.plans

import java.util.{Collections, Iterator => JIterator}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, FunctionCatalog, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.UnboundFunction
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.CowTable

/** SQL WRITE surface for the CoW lakehouse: Spark 4's DSv2 stored
  * procedures (the `CALL` statement) — the surface Iceberg exposes for
  * writes and maintenance, built here on the public `ProcedureCatalog`
  * extension point. Register once per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", "graft.plans.GraftCatalog")
  *   CALL graft.cow_merge(table => '/path', source => 'src_view',
  *     keys => 'o_orderkey', delete_cond => 'o_orderstatus = ''F''')
  *   CALL graft.cow_delete(table => '/path', cond => 'o_custkey % 5 = 2')
  *   CALL graft.cow_compact(table => '/path', target_bytes => 134217728)
  *   CALL graft.cow_vacuum(table => '/path', keep_versions => 2)
  * }}}
  * Each CALL returns a one-row summary (committed version + live file /
  * DV counts) through a `LocalScan`; reads stay on the `cow_read` TVF
  * ([[CowSqlFunction]]), so the whole lakehouse loop — ingest, merge,
  * delete, compact, vacuum, query — is drivable from SQL end-to-end.
  */
class GraftCatalog extends CatalogPlugin with ProcedureCatalog
    with TableCatalog with FunctionCatalog {
  private var catalogName = "graft"

  // ------------------------------------------------ FunctionCatalog
  // published so the optimizer can BIND the bucket transform a
  // bucketed CoW table's scan reports — the function identity is what
  // proves two scans co-partitioned (storage-partitioned joins).

  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name.equalsIgnoreCase("bucket")) GraftBucketUnbound
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty[String], "bucket"))

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = catalogName = name

  override def name(): String = catalogName

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    GraftProcedures.byName.getOrElse(ident.name.toLowerCase,
      throw new IllegalArgumentException(s"unknown procedure " +
        s"${ident.name}; known: ${GraftProcedures.byName.keys.toSeq.sorted.mkString(", ")}"))

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    GraftProcedures.byName.keys.toArray.sorted
      .map(n => Identifier.of(Array.empty[String], n))

  // ------------------------------------------------- TableCatalog
  // `graft.`/path/to/table``: the backquoted identifier IS the table's
  // filesystem path, Delta-style; [[CowDsv2Table]] gives it the full
  // DSv2 read/write/row-level-operation surface (SELECT, INSERT INTO,
  // MERGE INTO, UPDATE, DELETE FROM, VERSION AS OF).

  private def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name()).mkString("/")

  override def loadTable(ident: Identifier): Table = {
    val p = pathOf(ident)
    if (CowTable.latestManifest(p).isEmpty)
      throw new NoSuchTableException(Seq(catalogName, p))
    new CowDsv2Table(p)
  }

  /** `VERSION AS OF n` time travel — versions are manifest versions. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val p = pathOf(ident)
    val v = try version.toInt catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"cow table versions are integers, got '$version'")
    }
    new CowDsv2Table(p, Some(v))
  }

  /** `TIMESTAMP AS OF t` time travel — Spark hands the statement's
    * (foldable) timestamp as MICROseconds since epoch; resolution is
    * [[CowTable.snapshotAsOf]]'s at-or-before rule over manifest commit
    * times (metadata-only; pre-history instants fail loudly). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val p = pathOf(ident)
    val m = CowTable.snapshotAsOf(p, Math.floorDiv(timestamp, 1000L))
    new CowDsv2Table(p, Some(m.version))
  }

  override def tableExists(ident: Identifier): Boolean =
    CowTable.latestManifest(pathOf(ident)).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array.empty

  /** CTAS / CREATE TABLE: an empty v0 snapshot with the given schema —
    * the subsequent append write lands the query's rows as v1. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(partitions.isEmpty, "CREATE TABLE with partition transforms " +
      "is not supported here — use CowTable.initPartitioned")
    val p = pathOf(ident)
    require(CowTable.latestManifest(p).isEmpty, s"cow table $p already exists")
    CowTable.commitEntries(SparkSession.active, p, 0, Nil, schema)
    new CowDsv2Table(p)
  }

  /** `ALTER TABLE graft.`/path` RENAME COLUMN a TO b` / `DROP COLUMN` /
    * `ALTER COLUMN c TYPE bigint` — translated onto
    * [[CowTable.alterTable]]'s stable-column-id evolution (ONE
    * metadata-only commit per statement; widenings restricted to the
    * parquet reader's native promotions). Nested fields and other
    * change kinds are refused loudly. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val p = pathOf(ident)
    def top(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"ALTER TABLE $what on nested field " +
          s"${fieldNames.mkString(".")} is not supported")
      fieldNames(0)
    }
    var renames = Map.empty[String, String]
    var drops = Seq.empty[String]
    var widens = Map.empty[String, DataType]
    var adds = Seq.empty[(String, DataType)]
    changes.foreach {
      case rc: TableChange.RenameColumn =>
        renames += top(rc.fieldNames(), "RENAME COLUMN") -> rc.newName()
      case dc: TableChange.DeleteColumn =>
        drops :+= top(dc.fieldNames(), "DROP COLUMN")
      case ut: TableChange.UpdateColumnType =>
        widens += top(ut.fieldNames(), "ALTER COLUMN TYPE") -> ut.newDataType()
      // ADD COLUMN — also what `MERGE WITH SCHEMA EVOLUTION` emits for
      // source-only columns ([[MergeIntoTable.schemaChanges]] produces
      // exactly addColumn/updateColumnType). Appended, nullable-only:
      // old files cannot be backfilled, their rows NULL-extend at scan.
      case ac: TableChange.AddColumn =>
        require(ac.position() == null,
          "ADD COLUMN with an explicit position is not supported on a " +
            "cow table — new columns append")
        require(ac.isNullable,
          "ADD COLUMN on a cow table must be nullable — existing files' " +
            "rows NULL-extend at read time")
        adds :+= top(ac.fieldNames(), "ADD COLUMN") -> ac.dataType()
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change on a cow table: $other")
    }
    CowTable.alterTable(SparkSession.active, p, renames, drops, widens, adds)
    new CowDsv2Table(p)
  }

  override def dropTable(ident: Identifier): Boolean = false

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "cow tables are path-identified; rename is a filesystem move")
}

object GraftProcedures {

  private def in(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()

  private def inD(n: String, dt: DataType,
      default: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(default).build()

  private val summarySchema = StructType(Seq(
    StructField("version", IntegerType), StructField("n_files", LongType),
    StructField("n_dvs", LongType)))

  /** One-row CALL result: committed version + manifest-level counts
    * (metadata only — a CALL never re-scans the table it just wrote). */
  private def summary(m: CowTable.Manifest): JIterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def rows(): Array[InternalRow] = Array(new GenericInternalRow(
        Array[Any](m.version, m.nData, m.dvs.size.toLong)))
      override def readSchema(): StructType = summarySchema
      override def description(): String = "graft_cow_call_summary"
    }
    Collections.singletonList(scan).iterator()
  }

  private def str(r: InternalRow, i: Int): String =
    r.getUTF8String(i).toString

  /** An UnboundProcedure whose bind is shape-independent (named/typed
    * parameters + Spark's own coercion do the work). */
  private def proc(procName: String, desc: String,
      params: Seq[ProcedureParameter])(
      run: (SparkSession, InternalRow) => CowTable.Manifest): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false // writes
          override def call(input: InternalRow): JIterator[Scan] =
            summary(run(SparkSession.active, input))
        }
    }

  /** MERGE INTO: source rows replace matched keys' non-key columns,
    * optional delete condition and insert-on-unmatched, optional schema
    * evolution — [[CowTable.mergeInto]] semantics exactly. */
  val cowMerge: UnboundProcedure = proc("cow_merge",
    "MERGE a source view/table into a graft CoW table on a key list",
    Seq(in("table", StringType), in("source", StringType),
      in("keys", StringType), inD("delete_cond", StringType, "NULL"),
      inD("insert", BooleanType, "true"),
      inD("evolve", BooleanType, "false"))) { (spark, r) =>
    CowTable.mergeInto(spark, str(r, 0), spark.table(str(r, 1)),
      str(r, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      if (r.isNullAt(3)) None else Some(expr(str(r, 3))),
      insert = r.getBoolean(4), evolveSchema = r.getBoolean(5))
  }

  /** Merge-on-read DELETE (writes a deletion vector, rewrites nothing). */
  val cowDelete: UnboundProcedure = proc("cow_delete",
    "Merge-on-read DELETE FROM a graft CoW table (deletion vectors)",
    Seq(in("table", StringType), in("cond", StringType))) { (spark, r) =>
    CowTable.deleteWhere(spark, str(r, 0), expr(str(r, 1)))
  }

  /** Small-file compaction; pass z_cols for Z-order re-clustering. */
  val cowCompact: UnboundProcedure = proc("cow_compact",
    "Compact a graft CoW table's small files (optional Z-order columns)",
    Seq(in("table", StringType), in("target_bytes", LongType),
      inD("z_cols", StringType, "NULL"),
      inD("small_threshold", LongType, "NULL"))) { (spark, r) =>
    val small = if (r.isNullAt(3)) None else Some(r.getLong(3))
    if (r.isNullAt(2))
      CowTable.compactTable(spark, str(r, 0), r.getLong(1), small)
    else
      CowTable.compactTableZorder(spark, str(r, 0), r.getLong(1),
        str(r, 2).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
        smallThreshold = small)
  }

  /** Drop files/manifests unreachable from the newest kept versions. */
  val cowVacuum: UnboundProcedure = proc("cow_vacuum",
    "Delete files unreachable from the newest keep_versions snapshots",
    Seq(in("table", StringType),
      inD("keep_versions", IntegerType, "1"))) { (spark, r) =>
    CowTable.vacuum(spark, str(r, 0), r.getInt(1))
    CowTable.latestManifest(str(r, 0)).getOrElse(
      throw new IllegalArgumentException(s"no manifest after vacuum"))
  }

  /** Timestamp retention: expire snapshots older than a window, the
    * latest and every registered feed cursor's window always kept
    * ([[CowTable.expireSnapshots]]). */
  val cowExpire: UnboundProcedure = proc("cow_expire",
    "Expire snapshots whose commit is older than older_than_ms " +
      "(latest + registered feed-cursor windows survive; cursors not " +
      "refreshed within max_cursor_age_ms age out of the blocking set " +
      "— CowTable.expiryBlockers lists who blocks before you drop)",
    Seq(in("table", StringType), in("older_than_ms", LongType),
      inD("max_cursor_age_ms", LongType, "NULL"))) {
    (spark, r) =>
    CowTable.expireSnapshots(spark, str(r, 0), r.getLong(1),
      maxCursorAgeMs = if (r.isNullAt(2)) Long.MaxValue else r.getLong(2))
    CowTable.latestManifest(str(r, 0)).getOrElse(
      throw new IllegalArgumentException(s"no manifest after expire"))
  }

  /** One-call maintenance policy — what a table babysitter cron runs:
    * (1) SELECTIVE deletion-vector materialization
    * ([[CowTable.rewriteDeletes]] with `dead_threshold` — only
    * dead-heavy files rewrite, light files keep bytes and consolidate
    * their DVs), then (2) small-file compaction when `target_bytes` is
    * given (Z-order re-clustering when `z_cols` is too), then
    * (3) vacuum when `keep_versions` is given. Each step is the same
    * commit the standalone procedure makes; the summary reports the
    * final manifest. */
  val cowMaintain: UnboundProcedure = proc("cow_maintain",
    "Maintain a graft CoW table: selective DV materialization, " +
      "optional compaction (optionally Z-ordered), optional vacuum",
    Seq(in("table", StringType),
      inD("dead_threshold", DoubleType, "0.3"),
      inD("target_bytes", LongType, "NULL"),
      inD("z_cols", StringType, "NULL"),
      inD("keep_versions", IntegerType, "NULL"))) { (spark, r) =>
    val t = str(r, 0)
    CowTable.rewriteDeletes(spark, t, r.getDouble(1))
    if (!r.isNullAt(2)) {
      if (r.isNullAt(3)) CowTable.compactTable(spark, t, r.getLong(2))
      else CowTable.compactTableZorder(spark, t, r.getLong(2),
        str(r, 3).split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    }
    // bloom-index hygiene: past a handful of per-commit sidecars,
    // fold the live rows back into one (dead rels age out via vacuum)
    if (CowTable.latestManifest(t).exists(_.bloomRels.size > 4))
      CowTable.consolidateBlooms(spark, t)
    if (!r.isNullAt(4)) CowTable.vacuum(spark, t, r.getInt(4))
    CowTable.latestManifest(t).getOrElse(
      throw new IllegalArgumentException(s"cow table $t does not exist"))
  }

  /** Declare per-file bloom point-lookup indexes
    * ([[CowTable.declareBloom]]): backfills the current snapshot's
    * sketches and makes every later commit sidecar its own files. */
  val cowDeclareBloom: UnboundProcedure = proc("cow_declare_bloom",
    "Declare bloom point-lookup indexes on a graft CoW table's columns" +
      " (comma-separated); backfills the current snapshot",
    Seq(in("table", StringType), in("cols", StringType),
      inD("fpp", DoubleType, "0.01"),
      inD("items_per_file", LongType, "1048576"))) { (spark, r) =>
    CowTable.declareBloom(spark, str(r, 0),
      str(r, 1).split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      r.getDouble(2), r.getLong(3))
  }

  /** Fork a staging branch off the parent's current snapshot (the
    * WRITE of write-audit-publish); returns the BRANCH's v0 summary.
    * Write to it via any committer or `graft.`parent/branches/name``,
    * audit it, then cow_publish_branch or cow_drop_branch. */
  val cowCreateBranch: UnboundProcedure = proc("cow_create_branch",
    "Fork a write-audit-publish staging branch off a graft CoW table",
    Seq(in("table", StringType), in("name", StringType))) { (spark, r) =>
    val bp = CowTable.createBranch(spark, str(r, 0), str(r, 1))
    CowTable.latestManifest(bp).get
  }

  /** Atomically adopt the branch head as the parent's next version
    * (the PUBLISH); fast-forward-only — refuses if the parent advanced
    * past the branch base. */
  val cowPublishBranch: UnboundProcedure = proc("cow_publish_branch",
    "Atomically publish a staged branch onto its graft CoW parent",
    Seq(in("table", StringType), in("name", StringType))) { (spark, r) =>
    CowTable.publishBranch(spark, str(r, 0), str(r, 1))
  }

  /** Discard a staged branch (the REJECT); the parent is untouched. */
  val cowDropBranch: UnboundProcedure = proc("cow_drop_branch",
    "Discard a staged branch of a graft CoW table",
    Seq(in("table", StringType), in("name", StringType))) { (spark, r) =>
    CowTable.dropBranch(spark, str(r, 0), str(r, 1))
    CowTable.latestManifest(str(r, 0)).get
  }

  val byName: Map[String, UnboundProcedure] = Map(
    "cow_merge" -> cowMerge, "cow_delete" -> cowDelete,
    "cow_compact" -> cowCompact, "cow_vacuum" -> cowVacuum,
    "cow_maintain" -> cowMaintain, "cow_expire" -> cowExpire,
    "cow_declare_bloom" -> cowDeclareBloom,
    "cow_create_branch" -> cowCreateBranch,
    "cow_publish_branch" -> cowPublishBranch,
    "cow_drop_branch" -> cowDropBranch)
}
