package graft.sources

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.types._

/** Avro container-file source/sink on the PUBLIC Avro core +
  * avro-mapred APIs (the `spark-avro` connector module is not on this
  * build's classpath, so the wire format most Kafka pipelines land in
  * gets a first-class reader/writer here instead of a gap).
  *
  * Reference analog: sources/sinks are delegated user code in the
  * reference (`README.md:60-67,79-84` — JSON-lines temp files + a blob
  * store); this engine's source surface is Spark's, and Avro joins
  * parquet/json/csv/orc/text/jdbc in `SourcesSpec`.
  *
  * Scale shape: the READ path goes through `AvroKeyInputFormat`
  * (Hadoop `FileInputFormat`), so container files SPLIT at sync-marker
  * boundaries — a 10 GB Avro file fans out across tasks like parquet
  * row groups do, no single-task file tail. Records convert to rows
  * task-side, one at a time (the record reader REUSES its datum, so
  * conversion happens before the iterator advances — never buffer raw
  * `AvroKey`s). The WRITE path streams each partition through one
  * `DataFileWriter` (Avro is a row format: no footer stats, no column
  * pruning — that is parquet's job; this is the interchange format).
  *
  * Type surface (by design a practical subset, refused loudly beyond
  * it): boolean/int/long/float/double/string/binary, DATE (logical
  * `date` on int days), TIMESTAMP (logical `timestamp-micros` on
  * long), and one-level arrays of those. Nullability maps to
  * `union(null, T)` both ways. Maps, enums, fixed and NESTED records
  * are out of scope — flatten upstream.
  */
object AvroIO {

  // ------------------------------------------------- schema conversion

  private def avroPrimitive(dt: DataType): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType =>
      Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType => LogicalTypes.timestampMicros()
      .addToSchema(Schema.create(Schema.Type.LONG))
    case other => throw new UnsupportedOperationException(
      s"AvroIO: unsupported Spark type ${other.catalogString} — " +
        "supported: boolean/int-family/long/float/double/string/binary/" +
        "date/timestamp and one-level arrays of those")
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(
      Schema.create(Schema.Type.NULL), s))

  /** Spark schema → Avro record schema (field order preserved). */
  def toAvroSchema(st: StructType, name: String = "graft_row"): Schema = {
    val fields = st.fields.map { f =>
      val base = f.dataType match {
        case ArrayType(et, containsNull) =>
          val el = avroPrimitive(et)
          Schema.createArray(if (containsNull) nullable(el) else el)
        case dt => avroPrimitive(dt)
      }
      new Schema.Field(f.name,
        if (f.nullable) nullable(base) else base, null,
        if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false,
      fields.toSeq.asJava)
  }

  private def denull(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"AvroIO: only union(null, T) unions are supported, got $s")
      (nonNull.head, true)
    } else (s, false)

  private def sparkPrimitive(s: Schema): DataType = {
    val logical = Option(s.getLogicalType).map(_.getName)
    (s.getType, logical) match {
      case (Schema.Type.INT, Some("date")) => DateType
      case (Schema.Type.LONG, Some("timestamp-micros")) => TimestampType
      case (Schema.Type.LONG, Some("timestamp-millis")) => TimestampType
      case (Schema.Type.BOOLEAN, _) => BooleanType
      case (Schema.Type.INT, _) => IntegerType
      case (Schema.Type.LONG, _) => LongType
      case (Schema.Type.FLOAT, _) => FloatType
      case (Schema.Type.DOUBLE, _) => DoubleType
      case (Schema.Type.STRING, _) => StringType
      case (Schema.Type.BYTES, _) => BinaryType
      case (t, _) => throw new UnsupportedOperationException(
        s"AvroIO: unsupported Avro type $t (schema $s)")
    }
  }

  /** Avro record schema → Spark schema. */
  def toSparkSchema(avro: Schema): StructType = {
    require(avro.getType == Schema.Type.RECORD,
      s"AvroIO: top-level Avro schema must be a record, got $avro")
    StructType(avro.getFields.asScala.map { f =>
      val (s, isNull) = denull(f.schema())
      val dt = s.getType match {
        case Schema.Type.ARRAY =>
          val (el, elNull) = denull(s.getElementType)
          ArrayType(sparkPrimitive(el), containsNull = elNull)
        case _ => sparkPrimitive(s)
      }
      StructField(f.name(), dt, nullable = isNull)
    }.toSeq)
  }

  // ------------------------------------------------------------- write

  private def toAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (d: java.sql.Date, DateType) => DateTimeUtils.fromJavaDate(d)
    case (t: java.sql.Timestamp, TimestampType) =>
      DateTimeUtils.fromJavaTimestamp(t)
    case (i: java.time.Instant, TimestampType) =>
      DateTimeUtils.instantToMicros(i)
    case (d: java.time.LocalDate, DateType) =>
      DateTimeUtils.localDateToDays(d)
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
      seq.map(toAvroValue(_, et)).asJava
    case (b: Byte, _) => b.toInt
    case (sh: Short, _) => sh.toInt
    case (other, _) => other
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (empty partitions write nothing). The writer streams — per-task
    * memory is one row plus the encoder buffer regardless of partition
    * size. */
  def write(df: DataFrame, dir: String): Unit = {
    val st = df.schema
    val schemaJson = toAvroSchema(st).toString
    Files.createDirectories(Paths.get(dir))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val out = Paths.get(dir, f"part-$pid%05d.avro").toFile
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.create(schema, out)
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < st.fields.length) {
            rec.put(i, toAvroValue(r.get(i), st.fields(i).dataType))
            i += 1
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  // -------------------------------------------------------------- read

  private def toSparkValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (cs: CharSequence, StringType) => cs.toString
    case (bb: ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (days: java.lang.Integer, DateType) =>
      DateTimeUtils.toJavaDate(days.intValue())
    case (us: java.lang.Long, TimestampType) =>
      DateTimeUtils.toJavaTimestamp(us.longValue())
    case (arr: java.util.Collection[_], ArrayType(et, _)) =>
      arr.asScala.map(toSparkValue(_, et)).toSeq
    case (other, _) => other
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row = {
    val vals = new Array[Any](st.fields.length)
    var i = 0
    while (i < st.fields.length) {
      vals(i) = toSparkValue(rec.get(st.fields(i).name), st.fields(i).dataType)
      i += 1
    }
    Row.fromSeq(vals.toSeq)
  }

  /** The schema of the Avro files under `dir` — ONE container header
    * read on the driver (metadata-sized, like a parquet footer). */
  def schemaOf(dir: String): StructType = {
    val first = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".avro")).toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        s"AvroIO.read: no .avro files under $dir"))
    val r = new DataFileReader[GenericRecord](new java.io.File(first),
      new GenericDatumReader[GenericRecord]())
    try toSparkSchema(r.getSchema) finally r.close()
  }

  /** Read every Avro container file under `dir` as a DataFrame. Splits
    * come from `AvroKeyInputFormat` (sync-marker aligned), so large
    * files parallelize across tasks; rows convert record-at-a-time
    * task-side (the record reader reuses its datum — conversion must
    * not lag the iterator, and doesn't). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val st = schemaOf(dir)
    val schemaJson = st.json
    val rdd = spark.sparkContext.newAPIHadoopFile(
      s"$dir/*.avro",
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
      .mapPartitions { it =>
        val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        it.map { case (k, _) => recordToRow(k.datum(), schema) }
      }
    spark.createDataFrame(rdd, st)
  }
}
