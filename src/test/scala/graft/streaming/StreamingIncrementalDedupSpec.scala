package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** Streaming INCREMENTAL near-dedup — the production ingest loop
  * composed from the batch operator: each micro-batch's bands join the
  * band table accumulated from every earlier batch
  * (Dedup.minhashIncrementalAgainstBands), then the batch appends its
  * own bands and docs. State lives in ordinary parquet tables, not the
  * state store, so it survives restarts and is shared across queries —
  * the foreachBatch pattern for sinks/state Structured Streaming has no
  * native operator for. */
class StreamingIncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("later micro-batches flag near-dups against the accumulated band table") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"w$i").mkString(" ") + " tail"
    val bandDir = java.nio.file.Files.createTempDirectory("inc_bands").toString
    val docsDir = java.nio.file.Files.createTempDirectory("inc_docs").toString
    // seed both stores empty, with the production schemas
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.docBands(emptyDocs).withColumnRenamed("doc_id", "corpus_doc")
      .write.mode("overwrite").parquet(bandDir)
    emptyDocs.write.mode("overwrite").parquet(docsDir)

    val flagged = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pairs = Dedup.minhashIncrementalAgainstBands(batch,
          spark.read.parquet(bandDir), spark.read.parquet(docsDir),
          Dedup.MinhashThreshold, adaptiveCap = true)
        pairs.collect().foreach(r => flagged.add((r.getLong(0), r.getLong(1))))
        Dedup.docBands(batch).withColumnRenamed("doc_id", "corpus_doc")
          .write.mode("append").parquet(bandDir)
        batch.write.mode("append").parquet(docsDir)
      }
      .start()
    try {
      // batch 1 seeds the corpus — nothing to flag yet
      input.addData(Seq((1L, base),
        (2L, (1 to 30).map(i => s"x$i").mkString(" "))))
      q.processAllAvailable()
      // batch 2: doc 10 near-dups doc 1 from batch 1; doc 20 is novel
      input.addData(Seq((10L, nearDup),
        (20L, (1 to 30).map(i => s"y$i").mkString(" "))))
      q.processAllAvailable()
      // batch 3: doc 30 near-dups doc 10 from batch 2 (state keeps growing)
      input.addData(Seq((30L, nearDup + " more")))
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val got = flagged.asScala.toSet
    assert(got.contains((10L, 1L)), s"batch-2 near-dup missed: $got")
    assert(got.contains((30L, 10L)), s"batch-3 near-dup missed: $got")
    assert(!got.exists(_._1 == 20L), s"novel doc falsely flagged: $got")
    // and batch-1 docs were never flagged (empty corpus at that point)
    assert(!got.exists(p => p._1 == 1L || p._1 == 2L), got.toString)
  }

  test("adaptive cap in the loop: mega-bucket truncated, normals exact, no cache leak") {
    import spark.implicits._
    // corpus batch: 120 distinct "normal" docs + 60 identical boilerplate
    // copies (a planted cross-batch mega bucket); probe batch: one
    // near-dup per normal doc + one more boilerplate copy. The p99 of
    // observed fan-outs is 1 (the 120 normals), so the boilerplate doc
    // is truncated to the floor (16) while every normal pair survives —
    // and because the cap rides inside the plan as a broadcast scalar,
    // the loop leaves no cached RDD behind per micro-batch.
    def normal(i: Int): String = (1 to 30).map(w => s"n${i}w$w").mkString(" ")
    def nearDup(i: Int): String = (1 to 29).map(w => s"n${i}w$w").mkString(" ") + " tail"
    val boiler = (1 to 30).map(w => s"boilW$w").mkString(" ")
    val bandDir = java.nio.file.Files.createTempDirectory("cap_bands").toString
    val docsDir = java.nio.file.Files.createTempDirectory("cap_docs").toString
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.docBands(emptyDocs).withColumnRenamed("doc_id", "corpus_doc")
      .write.mode("overwrite").parquet(bandDir)
    emptyDocs.write.mode("overwrite").parquet(docsDir)

    val flagged = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val input = MemoryStream[(Long, String)](spark)
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pairs = Dedup.minhashIncrementalAgainstBands(batch,
          spark.read.parquet(bandDir), spark.read.parquet(docsDir),
          Dedup.MinhashThreshold, adaptiveCap = true)
        pairs.collect().foreach(r => flagged.add((r.getLong(0), r.getLong(1))))
        Dedup.docBands(batch).withColumnRenamed("doc_id", "corpus_doc")
          .write.mode("append").parquet(bandDir)
        batch.write.mode("append").parquet(docsDir)
      }
      .start()
    try {
      input.addData((1 to 120).map(i => (i.toLong, normal(i))) ++
        (200 to 259).map(i => (i.toLong, boiler)))
      q.processAllAvailable()
      input.addData((1 to 120).map(i => (1000L + i, nearDup(i))) :+
        (2000L, boiler))
      q.processAllAvailable()
    } finally q.stop()

    import scala.jdk.CollectionConverters._
    val got = flagged.asScala.toSet
    // every normal near-dup pair survives the cap exactly
    (1 to 120).foreach(i => assert(got.contains((1000L + i, i.toLong)),
      s"normal pair $i missing"))
    // the boilerplate doc is flagged but truncated to the floor of 16
    // smallest corpus ids — not all 60 copies
    val boilerPairs = got.filter(_._1 == 2000L)
    assert(boilerPairs.map(_._2) == (200L to 215L).toSet, boilerPairs.toString)
    // and nothing new was left cached by the adaptive path
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- cachedBefore
    assert(leaked.isEmpty, s"leaked cached RDDs: $leaked")
  }
}
