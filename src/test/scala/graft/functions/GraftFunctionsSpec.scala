package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("vec_dot is callable from SQL after register()") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(got == 11.0)
  }

  test("tokens / ngram_shingles / simhash64 are callable from SQL") {
    GraftFunctions.register(spark)
    val toks = spark.sql("SELECT tokens('A  b c') AS t")
      .head().getSeq[String](0)
    assert(toks == Seq("a", "b", "c"))
    val sh = spark.sql("SELECT ngram_shingles('a b c d', 3) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val shDefault = spark.sql("SELECT ngram_shingles('a b c d') AS s")
      .head().getSeq[String](0)
    assert(shDefault == sh)
    // simhash64 in SQL agrees with the Column API
    val viaSql = spark.sql("SELECT simhash64('alpha beta gamma') AS h")
      .head().getLong(0)
    import spark.implicits._
    val viaCol = Seq("alpha beta gamma").toDF("text")
      .select(SimHashFunctions.simhash64($"text")).head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("sign_pack is callable from SQL; rejects non-literal shape args") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT sign_pack(array(1.0F, -1.0F, 2.0F, -3.0F), 0, 4) AS w")
      .head().getLong(0)
    assert(got == 5L) // bits 0 and 2
    import spark.implicits._
    val viaCol = Seq(Array(1.0f, -1.0f, 2.0f, -3.0f)).toDF("v")
      .select(VectorFunctions.sign_pack($"v", 0, 4)).head().getLong(0)
    assert(got == viaCol)
    val e = intercept[Exception] {
      spark.sql("SELECT sign_pack(array(1.0F), cast(rand() AS INT), 4)")
        .collect()
    }
    assert(e.getMessage.contains("foldable"), e.getMessage)
  }

  test("bloom sketch + sharded membership runs end-to-end from pure SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    (1 to 500).map(i => s"sq-$i").toDF("v").createOrReplaceTempView("bloom_t")
    // sk.sk joined as a per-row column — the literal-form function's
    // foldable check rejects it at analysis (the SHARD form below is
    // the column-sketch surface); spark.sql analyzes eagerly
    val e = intercept[Exception] {
      spark.sql(
        """WITH sk AS (SELECT bloom_sketch(v, 500) AS sk FROM bloom_t)
          |SELECT count(*) AS n FROM bloom_t, sk
          |WHERE NOT bloom_might_contain(sk.sk, v)""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"), e.getMessage)
    // sharded construction: group sketches, join, per-shard membership
    val n = spark.sql(
      """WITH sk AS (SELECT pmod(xxhash64(v), 4L) AS shard,
        |    bloom_sketch(v, 250) AS sk FROM bloom_t GROUP BY 1)
        |SELECT count(*) AS n
        |FROM bloom_t t JOIN sk ON pmod(xxhash64(t.v), 4L) = sk.shard
        |WHERE bloom_might_contain_shard(sk.shard, sk.sk, t.v)""".stripMargin)
      .head().getLong(0)
    assert(n == 500L) // zero false negatives through the SQL surface
    // non-foldable / non-numeric expected_items gets a typed error naming
    // the function and argument, not an opaque NPE/ClassCastException
    val e2 = intercept[Exception] {
      spark.sql("SELECT bloom_sketch(v, xxhash64(v)) FROM bloom_t").collect()
    }
    assert(e2.getMessage.contains("expected_items"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("SELECT bloom_sketch(v, 'many') FROM bloom_t").collect()
    }
    assert(e3.getMessage.contains("expected_items"), e3.getMessage)
  }

  test("GraftExtensions injects the function builders") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // builders must be applied into a session's registry to take effect;
    // validate the injection list is non-empty and builders construct
    val fns = GraftFunctions.functions
    assert(fns.nonEmpty)
    val expr = fns.head._2(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(2.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    assert(expr.eval(null) == 2.0)
  }

  test("GraftExtensions injects the as-of planner strategy declaratively") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val strategies = org.apache.spark.sql.graftbridge.ExtensionsBridge
      .plannerStrategies(ext, spark)
    assert(strategies.contains(graft.plans.AsofJoinStrategy),
      s"strategies were $strategies")
  }
}
