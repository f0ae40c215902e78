package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-gate entries for source formats that have no SQL-native
  * DuckDB twin (the spec-level round-trips in `SourcesSpec` stay the
  * detailed coverage; these prove the format end-to-end under the
  * oracle compare). */
object SourceGates {

  /** Events → Avro container files → read back → aggregate. The oracle
    * recomputes the aggregate straight from the parquet events table,
    * so any loss/corruption in the Avro round-trip (timestamps, values,
    * nulls) breaks the hash match. */
  def srcAvro(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files
      .createTempDirectory("graft_avro_gate").toString
    AvroIO.write(Tables.events(s, dir), out)
    AvroIO.read(s, out)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        sum(col("value").cast("decimal(12,2)")).cast("double")
          .as("sum_value"))
  }

  val srcAvroSql: String =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
      |  MIN(ts) AS min_ts, MAX(ts) AS max_ts,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_avro" -> srcAvro)

  val oracles: Map[String, String] = Map(
    "src_avro" -> srcAvroSql)
}
