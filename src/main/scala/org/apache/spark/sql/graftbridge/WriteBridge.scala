package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Executor-side parquet WRITING from `InternalRow`s — the write twin of
  * [[ScanBridge]]. DSv2 `DataWriter`s need to turn InternalRows into
  * parquet bytes on executors; instead of hand-rolling a parquet writer
  * (and its type conversion), this bridges to the exact machinery
  * Spark's own `FileFormatWriter` uses: `ParquetFileFormat.prepareWrite`
  * builds a serializable `OutputWriterFactory` on the driver (the job
  * Configuration it customizes — write support class, schema, codec —
  * rides along as a `SerializableConfiguration`), and each executor task
  * opens an `OutputWriter` at an explicit final path under a fabricated
  * `TaskAttemptContext`. No output committer is involved: callers commit
  * files by listing their paths in a table manifest (the CoW discipline),
  * so the writer's path IS the final path. */
object WriteBridge {

  /** Row sink over Spark's internal `OutputWriter` — the neutral type
    * callers outside the sql package program against. */
  final class ParquetRowWriter private[graftbridge](w: OutputWriter) {
    def write(r: org.apache.spark.sql.catalyst.InternalRow): Unit = w.write(r)
    def close(): Unit = w.close()
  }

  /** Serializable handle: build once on the driver, `open` per task. */
  case class ParquetWriterHandle(factory: OutputWriterFactory,
      conf: SerializableConfiguration, schema: StructType)
      extends Serializable {
    def open(path: String, partitionId: Int,
        attemptNumber: Int): ParquetRowWriter = {
      val attempt = new TaskAttemptID("graft-write", 0, TaskType.MAP,
        partitionId, attemptNumber)
      val ctx = new TaskAttemptContextImpl(new Configuration(conf.value), attempt)
      new ParquetRowWriter(factory.newInstance(path, schema, ctx))
    }
  }

  /** Driver-side: the parquet writer factory for `schema`, with the
    * session's hadoop/SQL conf applied (compression codec, parquet
    * timestamp semantics, …) — byte-compatible with `df.write.parquet`. */
  def parquetWriter(spark: SparkSession, schema: StructType): ParquetWriterHandle = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = Job.getInstance(classic.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(classic, job,
      Map.empty[String, String], schema)
    ParquetWriterHandle(factory,
      new SerializableConfiguration(job.getConfiguration), schema)
  }
}
