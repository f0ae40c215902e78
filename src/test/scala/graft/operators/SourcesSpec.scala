package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

/** Source/sink coverage: CSV/JSON/ORC round-trips and partitioned writes
  * with partition pruning — the reference's "sources are user code"
  * surface (SURVEY §2.2 row 1) replaced by Spark's readers/writers. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("csv / json / orc round-trips preserve the data") {
    import spark.implicits._
    val src = Tables.nation(spark, TestSpark.sf0001)
    val expected = src.orderBy("n_nationkey").collect().toSeq

    val csvDir = tmp("graft_csv")
    src.write.mode("overwrite").option("header", "true").csv(csvDir)
    val csvBack = spark.read.option("header", "true")
      .schema(src.schema).csv(csvDir)
    assert(csvBack.orderBy("n_nationkey").collect().toSeq == expected)

    val jsonDir = tmp("graft_json")
    src.write.mode("overwrite").json(jsonDir)
    val jsonBack = spark.read.schema(src.schema).json(jsonDir)
    assert(jsonBack.orderBy("n_nationkey").collect().toSeq == expected)

    val orcDir = tmp("graft_orc")
    src.write.mode("overwrite").orc(orcDir)
    assert(spark.read.orc(orcDir).orderBy("n_nationkey").collect().toSeq
      == expected)
  }

  test("avro round-trips scalars, timestamps, and float arrays; splits per container") {
    import graft.sources.AvroIO
    // scalars + strings
    val nation = Tables.nation(spark, TestSpark.sf0001)
    val nd = tmp("graft_avro_nation")
    AvroIO.write(nation, nd)
    val nBack = AvroIO.read(spark, nd)
    assert(nBack.schema.map(f => (f.name, f.dataType)) ==
      nation.schema.map(f => (f.name, f.dataType)))
    assert(nBack.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
    // timestamps survive micro-exactly
    val events = Tables.events(spark, TestSpark.sf0001)
      .orderBy("event_id").limit(500)
    val ed = tmp("graft_avro_events")
    AvroIO.write(events.repartition(4), ed)
    val eBack = AvroIO.read(spark, ed)
    assert(eBack.orderBy("event_id").collect().toSeq ==
      events.orderBy("event_id").collect().toSeq)
    // one input split per container file minimum (the scale path:
    // sync-marker splitting via AvroKeyInputFormat, not one-task-per-dir)
    assert(eBack.rdd.getNumPartitions >= 4,
      s"expected >=4 splits, got ${eBack.rdd.getNumPartitions}")
    // array<float> embeddings
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
      .orderBy("vec_id").limit(200)
    val vd = tmp("graft_avro_emb")
    AvroIO.write(emb, vd)
    val vBack = AvroIO.read(spark, vd)
    assert(vBack.orderBy("vec_id").collect().toSeq ==
      emb.orderBy("vec_id").collect().toSeq)
    // the refusal surface is loud, not silent
    intercept[UnsupportedOperationException] {
      AvroIO.toAvroSchema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("m",
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))))
    }
  }

  test("text source round-trips raw lines (one column, one row per line)") {
    import spark.implicits._
    val dir = tmp("graft_text")
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"text").filter(!$"text".contains("\n"))
    docs.write.mode("overwrite").text(dir)
    val back = spark.read.text(dir)
    assert(back.schema.fieldNames.toSeq == Seq("value"))
    assert(back.as[String].collect().sorted.toSeq ==
      docs.as[String].collect().sorted.toSeq)
    // wholetext mode: one row per file
    val whole = spark.read.option("wholetext", "true").text(dir)
    assert(whole.count() == back.inputFiles.length.toLong)
  }

  test("partitioned write + filtered read prunes partitions at plan time") {
    val dir = tmp("graft_part")
    Tables.lineitem(spark, TestSpark.sf0001)
      .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
    val filtered = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    val all = spark.read.parquet(dir).count()
    val r = filtered.count()
    assert(r > 0 && r < all)
  }

  test("schema evolution: mergeSchema unifies old+new batches, old rows read NULL, pushdown survives") {
    import spark.implicits._
    val dir = tmp("graft_evolve")
    // batch 1: original schema (id, v); batch 2 adds a quality column —
    // the daily-ingest reality of a long-lived 100 TB table
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9), (4L, "d", 0.2)).toDF("id", "v", "q")
      .write.mode("append").parquet(dir)

    // without mergeSchema, parquet infers from one footer and may drop q;
    // with it, the union schema appears and old rows are NULL-extended
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "q", "v"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.9)), (4L, "d", Some(0.2))))

    // filter pushdown must still reach the scan on BOTH column vintages
    val plan = merged.filter($"id" > 2 && $"q" > 0.5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(id,2") && plan.contains("GreaterThan(q,0.5"),
      s"pushdown lost under mergeSchema:\n$plan")
    // and a filter on the NEW column simply drops the NULL-extended old
    // rows (no tri-valued surprises)
    assert(merged.filter($"q" > 0.5).count() == 1L)
  }

  test("jdbc source/sink round-trips through embedded Derby with pushdown") {
    import spark.implicits._
    // Derby ships in /opt/spark/jars (Spark's Hive-metastore engine), so
    // the jdbc contract is testable fully offline: write a table through
    // the jdbc sink, read it back through the jdbc source, and check
    // that a filter reaches the source as a pushed predicate.
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val src = Tables.nation(spark, TestSpark.sf0001)
    val expected = src.orderBy("n_nationkey").collect().toSeq
    src.write.mode("overwrite").jdbc(url, "NATION_RT", new java.util.Properties)
    val back = spark.read.jdbc(url, "NATION_RT", new java.util.Properties)
    assert(back.orderBy("n_nationkey").collect().toSeq == expected)
    // numeric predicates push down to the JDBC source (string pushdown
    // varies by dialect); the scan node records them
    val filtered = back.filter($"n_nationkey" >= 10)
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("n_nationkey"),
      scan)
    assert(filtered.count() ==
      expected.count(_.getAs[Number]("n_nationkey").longValue >= 10))
    // partitioned parallel read: the same table split into 4 ranges
    val parts = spark.read.jdbc(url, "NATION_RT", "n_nationkey",
      0L, 25L, 4, new java.util.Properties)
    assert(parts.rdd.getNumPartitions == 4)
    assert(parts.orderBy("n_nationkey").collect().toSeq == expected)
  }

  test("json-lines pair files (reference intermediate format) round-trip") {
    import spark.implicits._
    // the reference's [key, value] JSON-lines lines as a Spark dataset
    val dir = tmp("graft_jsonl")
    val pairs = Seq(("key1", 1L), ("key2", 2L)).toDF("key", "value")
    pairs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(pairs.schema).json(dir)
    assert(back.orderBy("key").as[(String, Long)].collect().toSeq ==
      Seq(("key1", 1L), ("key2", 2L)))
  }
}
