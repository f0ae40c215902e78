package org.apache.spark.sql.graftbridge

import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, FilePartition, FileScanRDD, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-RANGED parquet scanning — the mechanism behind row-group-level
  * deletion-vector skipping. Spark's own scans split files into
  * [start, length) ranges only at uniform maxSplitBytes boundaries;
  * this bridge builds a `FileScanRDD` over EXPLICIT ranges, so a caller
  * that knows which row groups are live (parquet-mr admits a row group
  * into a read iff its byte MIDPOINT falls inside the range) can scan a
  * file while provably never decompressing its dead row groups.
  *
  * The reader is `ParquetFileFormat.buildReaderWithPartitionValues` —
  * the exact function `FileSourceScanExec` uses — with
  * `_tmp_metadata_row_index` appended to the required schema, so the
  * parquet reader emits each row's FILE-GLOBAL row index (computed from
  * footer offsets, correct for any byte range); deletion-vector
  * anti-joins keep working on a partial read. The file path rides as a
  * partition column. Row-shaped output is forced via
  * `OPTION_RETURNING_BATCH=false` (the vectorized reader still runs —
  * rows come off its batches). */
object ScanBridge {

  /** One byte range of one parquet file. `fileSize` is the full
    * physical size (footer range filtering needs it). */
  case class FileRange(path: String, start: Long, length: Long,
      fileSize: Long)

  val RowIndexColumn: String = "__ri"
  val FilePathColumn: String = "__fp"

  /** Scan the given ranges under `dataSchema`; output columns are
    * `dataSchema` ++ (__ri: file-global row index, __fp: file path). */
  def rangedParquetScan(spark: SparkSession, dataSchema: StructType,
      ranges: Seq[FileRange]): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val riTmp = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    val requiredSchema =
      StructType(dataSchema.fields :+ StructField(riTmp, LongType))
    val partitionSchema =
      StructType(Seq(StructField(FilePathColumn, StringType)))
    val fmt = new ParquetFileFormat
    val readFunc = fmt.buildReaderWithPartitionValues(
      classic, dataSchema, partitionSchema, requiredSchema, Nil,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      classic.sessionState.newHadoopConfWithOptions(Map.empty))
    val pfiles = ranges.map { r =>
      PartitionedFile(
        new GenericInternalRow(Array[Any](UTF8String.fromString(r.path))),
        SparkPath.fromPathString(r.path), r.start, r.length,
        Array.empty[String], 0L, r.fileSize)
    }
    val partitions = pfiles.zipWithIndex.map { case (pf, i) =>
      FilePartition(i, Array(pf))
    }
    val fullSchema = StructType(requiredSchema.fields ++
      partitionSchema.fields)
    val rdd = new FileScanRDD(classic, readFunc, partitions, fullSchema)
    classic.internalCreateDataFrame(rdd, fullSchema)
      .withColumnRenamed(riTmp, RowIndexColumn)
  }

  /** Like [[wholeFileReader]], but emitting `required`'s columns PLUS
    * the file-global row index as a trailing long column — the reader a
    * DSv2 partition scan needs to apply positional deletion vectors on
    * executors. `dataSchema` is the table schema (files written before a
    * schema evolution NULL-extend by name); `required` is the pruned
    * column set actually read. */
  def fileReaderWithRowIndex(spark: SparkSession, dataSchema: StructType,
      required: StructType):
      (String, Long) => Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val riTmp = ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    val requiredSchema =
      StructType(required.fields :+ StructField(riTmp, LongType))
    val fmt = new ParquetFileFormat
    val readFunc = fmt.buildReaderWithPartitionValues(
      classic, dataSchema, StructType(Nil), requiredSchema, Nil,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      classic.sessionState.newHadoopConfWithOptions(Map.empty))
    (path: String, size: Long) =>
      readFunc(PartitionedFile(org.apache.spark.sql.catalyst.InternalRow.empty,
        SparkPath.fromPathString(path), 0L, size, Array.empty[String], 0L,
        size))
  }

  /** A SERIALIZABLE whole-file parquet reader under a fixed schema —
    * built on the driver (the same `buildReaderWithPartitionValues`
    * closure `FileScanRDD` ships to executors), invoked executor-side
    * with (path, fileSize). The building block for DSv2 partition
    * readers over staged parquet (e.g. the change-feed streaming
    * source), without reimplementing type conversion. */
  def wholeFileReader(spark: SparkSession, schema: StructType):
      (String, Long) => Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fmt = new ParquetFileFormat
    val readFunc = fmt.buildReaderWithPartitionValues(
      classic, schema, StructType(Nil), schema, Nil,
      Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
      classic.sessionState.newHadoopConfWithOptions(Map.empty))
    (path: String, size: Long) =>
      readFunc(PartitionedFile(org.apache.spark.sql.catalyst.InternalRow.empty,
        SparkPath.fromPathString(path), 0L, size, Array.empty[String], 0L,
        size))
  }
}
