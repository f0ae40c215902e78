package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketchOf(data: Seq[String], n: Long, fpp: Double = 0.01,
      parts: Int = 4): Array[Byte] =
    data.toDF("v").repartition(parts)
      .agg(BloomFunctions.bloom_sketch($"v", n, fpp).as("sk"))
      .head().getAs[Array[Byte]]("sk")

  test("no false negatives: every inserted value is found") {
    val data = (1 to 2000).map(i => s"doc-$i")
    val sk = sketchOf(data, 2000)
    val misses = data.toDF("v")
      .filter(!BloomFunctions.bloom_might_contain(lit(sk), $"v"))
      .count()
    assert(misses == 0L)
  }

  test("false-positive rate near the sized fpp") {
    val inserted = (1 to 5000).map(i => s"in-$i")
    val sk = sketchOf(inserted, 5000, fpp = 0.01)
    val probes = (1 to 20000).map(i => s"out-$i")
    val fps = probes.toDF("v")
      .filter(BloomFunctions.bloom_might_contain(lit(sk), $"v"))
      .count()
    val rate = fps.toDouble / probes.size
    assert(rate <= 0.03, s"fpr $rate vs sized 0.01") // 3x envelope
  }

  test("sketch bytes are partitioning-invariant (OR-merge determinism)") {
    val data = (1 to 3000).map(i => s"x-$i")
    val a = sketchOf(data, 3000, parts = 1)
    val b = sketchOf(data, 3000, parts = 7)
    val c = sketchOf(data, 3000, parts = 32)
    assert(java.util.Arrays.equals(a, b) && java.util.Arrays.equals(b, c))
  }

  test("stored shard sketches OR-merge to the whole-corpus sketch") {
    val shard1 = (1 to 1000).map(i => s"s-$i")
    val shard2 = (800 to 1800).map(i => s"s-$i")
    val n = 2000L
    val merged = BloomKernel.merged(
      sketchOf(shard1, n), sketchOf(shard2, n))
    val whole = sketchOf(shard1 ++ shard2, n)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("might_contain agrees between codegen and interpreted paths") {
    val data = (1 to 500).map(i => s"cg-$i")
    val sk = sketchOf(data, 500)
    val probe = ((1 to 500) ++ (5000 to 5500)).map(i => s"cg-$i").toDF("v")
    def run(): Seq[(String, Boolean)] = probe
      .select($"v", BloomFunctions.bloom_might_contain(lit(sk), $"v").as("m"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq.sorted
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = run()
      assert(withCodegen == interpreted)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // and the codegen result is itself correct on the inserted half
    assert(withCodegen.filter(_._1.length <= 6).forall(_._2))
  }

  test("non-foldable sketch argument is rejected at analysis") {
    val e = intercept[Exception] {
      Seq(("a", Array[Byte](1, 2))).toDF("v", "sk")
        .select(BloomFunctions.bloom_might_contain($"sk", $"v")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("foldable"), e.getMessage)
  }

  test("legacy or foreign sketch bytes are rejected, not misread") {
    // round-1 layout had no tag: first int = numBits (positive multiple
    // of 64) and NO trailing content hash. Under the current probe
    // sequence those bits would yield silent false negatives — dedup's
    // unsafe direction — so both entry points must refuse them.
    val sk = sketchOf(Seq("a", "b"), 100)
    val tag = java.nio.ByteBuffer.wrap(sk, 0, 4).getInt
    assert(tag == BloomKernel.FormatTag)
    // forge a legacy sketch: strip the tag and the trailing hash
    val legacy = sk.slice(4, sk.length - 8)
    val e1 = intercept[IllegalArgumentException] { BloomKernel.deserialize(legacy) }
    assert(e1.getMessage.contains("legacy"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] { BloomKernel.storedContentHash(legacy) }
    assert(e2.getMessage.contains("legacy"), e2.getMessage)
    // a future/foreign version tag is named in the error, not misread
    val foreign = sk.clone()
    java.nio.ByteBuffer.wrap(foreign, 0, 4).putInt(0xB100F000 | 99)
    val e3 = intercept[IllegalArgumentException] { BloomKernel.deserialize(foreign) }
    assert(e3.getMessage.contains("format mismatch"), e3.getMessage)
    // and tagged bytes round-trip
    val rt = BloomKernel.serialize(BloomKernel.deserialize(sk))
    assert(java.util.Arrays.equals(rt, sk))
  }

  test("shape mismatch fails loudly on merge") {
    val a = sketchOf(Seq("a"), 100)
    val b = sketchOf(Seq("b"), 10000)
    val e = intercept[Exception] { BloomKernel.merged(a, b) }
    assert(e.getMessage.contains("shape mismatch"), e.getMessage)
  }

  test("broadcast membership matches literal membership, byte for byte") {
    val data = (1 to 2000).map(i => s"bc-$i")
    val sk = sketchOf(data, 2000)
    val bc = spark.sparkContext.broadcast(sk)
    val probe = ((1 to 2000) ++ (9000 to 9999)).map(i => s"bc-$i").toDF("v")
    def results(c: org.apache.spark.sql.Column): Seq[(String, Boolean)] =
      probe.select($"v", c.as("m")).collect()
        .map(r => (r.getString(0), r.getBoolean(1))).toSeq.sorted
    assert(results(BloomFunctions.bloom_might_contain_bc(bc, $"v")) ==
      results(BloomFunctions.bloom_might_contain(lit(sk), $"v")))
  }

  test("broadcast form keeps the sketch bytes out of the plan") {
    // sized for 5M items at 1% fpp ⇒ ~6 MB sketch: embedded as a literal
    // this would ride every serialized task; the broadcast form must leave
    // only a handle in the plan
    val n = 5_000_000L
    val bits = BloomKernel.optimalNumBits(n, 0.01)
    assert(bits / 8 > (5 << 20), s"test premise: sketch ${bits / 8}B not multi-MB")
    val big = BloomKernel.serialize(
      new BloomState(bits, BloomKernel.optimalNumHashes(n, bits)))
    val bc = spark.sparkContext.broadcast(big)
    val df = (1 to 10).map(i => s"p-$i").toDF("v")
      .filter(BloomFunctions.bloom_might_contain_bc(bc, $"v"))
    val maxLiteral = df.queryExecution.optimizedPlan.collect {
      case p => p.expressions.flatMap(_.collect {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            b: Array[Byte], _) => b.length
      })
    }.flatten
    assert(maxLiteral.forall(_ < 1024),
      s"binary literal of ${maxLiteral.maxOption.getOrElse(0)}B in plan")
    df.collect() // and it still executes
    bc.destroy()
  }

  test("sharded sketches: no false negatives, per-shard membership exact") {
    import org.apache.spark.sql.functions.{broadcast, pmod, xxhash64}
    val shards = 8
    val data = (1 to 4000).map(i => s"sh-$i")
    val df = data.toDF("v").repartition(5)
    val sketches = graft.operators.Dedup.shardedBloomSketches(
      df, $"v", shards, 2L * 4000 / shards, 0.01)
    assert(sketches.count() == shards)
    // every inserted value must be found through its shard's sketch
    val probe = df.withColumn("shard", pmod(xxhash64($"v"), lit(shards.toLong)))
      .join(broadcast(sketches), Seq("shard"))
    val misses = probe.filter(!BloomFunctions
      .bloom_might_contain_shard($"shard", $"sk", $"v")).count()
    assert(misses == 0L)
    // and per-shard sketch bytes are partitioning-invariant
    val again = graft.operators.Dedup.shardedBloomSketches(
      data.toDF("v").repartition(13), $"v", shards, 2L * 4000 / shards, 0.01)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val first = sketches.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("sk")).toMap
    assert(first.keySet == again.keySet)
    assert(first.forall { case (k, b) => java.util.Arrays.equals(b, again(k)) })
  }

  test("shard cache invalidates on a changed sketch for the same shard id") {
    import org.apache.spark.sql.functions.col
    // two GENERATIONS of shard 0 in one query (appended sketch tables):
    // each row must be tested against ITS OWN sketch bytes, not the
    // first-seen generation cached per shard id
    val genA = sketchOf((1 to 50).map(i => s"genA-$i"), 100)
    val genB = sketchOf((1 to 50).map(i => s"genB-$i"), 100)
    val rows = Seq(
      (0L, genA, "genA-7", true), (0L, genB, "genB-7", true),
      (0L, genA, "genB-7", false), (0L, genB, "genA-7", false))
    val df = spark.createDataFrame(rows).toDF("shard", "sk", "v", "expected")
      .coalesce(1) // one task ⇒ one expression instance ⇒ shared cache
    val wrong = df.filter(BloomFunctions
      .bloom_might_contain_shard(col("shard"), col("sk"), col("v"))
      =!= col("expected")).count()
    assert(wrong == 0L, "stale cached sketch served for a changed shard")
  }

  test("sharded admit: docs in sketch-less shards are admitted, not dropped") {
    import spark.implicits._
    // 3-doc corpus covers at most 3 of 16 shards; every batch doc whose
    // shard has no sketch row is provably new and must appear in the
    // admit output (an inner sketch join would silently drop it)
    val dir = java.nio.file.Files.createTempDirectory("shardadmit").toString
    val docs = (1 to 3).map(i => (i.toLong, s"corpus doc $i")) ++
      (10 to 60 by 10).map(i => (i.toLong, s"novel doc $i")) // doc_id%10==0 ⇒ batch
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val admitted = graft.operators.Dedup.ddBloomAdmitSharded(spark, dir)
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert((10 to 60 by 10).map(_.toLong).toSet.subsetOf(admitted),
      s"novel docs dropped: admitted only $admitted")
  }

  test("sharded-dedup gate query: exact counts + envelope booleans") {
    val row = graft.operators.Dedup
      .ddBloomSharded(spark, graft.TestSpark.sf0001).head()
    assert(row.getLong(0) == 500L, "n_incoming")
    assert(row.getLong(1) == 50L, "n_truly_new")
    assert(row.getBoolean(2), "no_false_negatives")
    assert(row.getBoolean(3), "fpr_ok")
  }

  test("incremental-dedup gate query: exact counts + envelope booleans") {
    val row = graft.operators.Dedup
      .ddBloomIncremental(spark, TestSpark.sf0001).head()
    assert(row.getLong(0) == 500L, "n_incoming")
    assert(row.getLong(1) == 50L, "n_truly_new")
    assert(row.getBoolean(2), "no_false_negatives")
    assert(row.getBoolean(3), "fpr_ok")
  }
}
