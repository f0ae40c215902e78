package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concurrent-writer reconciliation: writers that touch DISJOINT files
  * lose the version race, rebase against the new head, and land —
  * serialized versions, snapshot equal to the sequential application —
  * while genuinely overlapping writers still fail loudly. Races are
  * replayed DETERMINISTICALLY through [[CowTable.preCommitHook]] (a
  * competing commit lands inside the loser's commit window), plus one
  * real two-thread race. */
class CowConcurrencySpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_cow_conc/" +
      java.util.UUID.randomUUID().toString.take(8)

  /** ids 0..99 split into two files: [0,50) and [50,100). */
  private def fixture(): String = {
    val t = freshTable()
    val df = (0L until 100L).map(i => (i, s"n$i", i * 1.0))
      .toDF("id", "name", "v")
      .withColumn("__f", (col("id") / 50L).cast("int") + 1)
    CowTable.initFiled(df, t, "__f", 2)
    t
  }

  private def src(ids: Seq[Int], tag: String) =
    ids.map(i => (i.toLong, s"$tag$i", i * 10.0)).toDF("id", "name", "v")

  /** One-shot hook: the FIRST commit attempt first lands `competing`. */
  private def raceOnce(competing: () => Unit): Unit = {
    CowTable.preCommitHook = { () =>
      CowTable.preCommitHook = () => ()
      competing()
    }
  }

  test("disjoint merges race, rebase, and both land sequentially") {
    val t = fixture()
    // loser updates 60..64 + inserts 200..204 (file 2); the competing
    // winner updates 10..14 (file 1) from the same base version
    raceOnce(() => CowTable.mergeInto(spark, t,
      src(10 to 14, "w"), Seq("id")))
    try {
      val m2 = CowTable.mergeInto(spark, t,
        src((60 to 64) ++ (200 to 204), "l"), Seq("id"))
      assert(m2.version == 2, s"rebased commit must land at v2: $m2")
    } finally CowTable.preCommitHook = () => ()
    val got = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 105)
    (10 to 14).foreach(i => assert(got(i.toLong) == s"w$i"))
    (60 to 64).foreach(i => assert(got(i.toLong) == s"l$i"))
    (200 to 204).foreach(i => assert(got(i.toLong) == s"l$i"))
    assert(got(0L) == "n0" && got(99L) == "n99")
    // both versions are intact snapshots (time travel sane)
    assert(CowTable.readVersion(spark, t, 1).count() == 100)
  }

  test("overlapping merges still fail loudly") {
    val t = fixture()
    raceOnce(() => CowTable.mergeInto(spark, t,
      src(10 to 14, "w"), Seq("id")))
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        // same file 1: keys 20..24 live in [0,50) too
        CowTable.mergeInto(spark, t, src(20 to 24, "l"), Seq("id"))
      }
      assert(e.getMessage.contains("rewrites"), e.getMessage)
    } finally CowTable.preCommitHook = () => ()
    // the winner's merge survived untouched
    val got = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(10L) == "w10" && got(20L) == "n20")
  }

  test("a concurrent insert of the same source keys is a conflict") {
    val t = fixture()
    // both writers insert key 300 — disjoint FILES (insert-only), but
    // a rebase would silently duplicate the key
    raceOnce(() => CowTable.mergeInto(spark, t,
      src(300 to 300, "w"), Seq("id")))
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        CowTable.mergeInto(spark, t, src(300 to 300, "l"), Seq("id"))
      }
      assert(e.getMessage.contains("source keys"), e.getMessage)
    } finally CowTable.preCommitHook = () => ()
    assert(CowTable.read(spark, t).filter($"id" === 300L).count() == 1)
  }

  test("disjoint deletes race, rebase, and both land") {
    val t = fixture()
    raceOnce(() => CowTable.deleteWhere(spark, t, $"id" < 10L))
    try {
      val m2 = CowTable.deleteWhere(spark, t, $"id" >= 90L)
      assert(m2.version == 2, s"rebased delete must land at v2: $m2")
    } finally CowTable.preCommitHook = () => ()
    val ids = CowTable.read(spark, t).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(ids.toSeq == (10L until 90L).toSeq)
  }

  test("overlapping deletes on one file still fail loudly") {
    val t = fixture()
    raceOnce(() => CowTable.deleteWhere(spark, t, $"id" < 10L))
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        CowTable.deleteWhere(spark, t, $"id" >= 20L && $"id" < 30L)
      }
      assert(e.getMessage.contains("delete"), e.getMessage)
    } finally CowTable.preCommitHook = () => ()
    assert(CowTable.read(spark, t).count() == 90)
  }

  test("two real threads merging disjoint ranges both land") {
    val t = fixture()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CountDownLatch(1)
    def runner(ids: Seq[Int], tag: String) = new Thread(() => {
      try {
        gate.await()
        CowTable.mergeInto(spark, t, src(ids, tag), Seq("id"))
      } catch { case e: Throwable => errs.add(e) }
    })
    val a = runner(0 to 4, "a")
    val b = runner(95 to 99, "b")
    a.start(); b.start(); gate.countDown()
    a.join(120000); b.join(120000)
    assert(errs.isEmpty, s"a merge failed: ${errs.peek()}")
    val m = CowTable.latestManifest(t).get
    assert(m.version == 2, s"both merges must commit: $m")
    val got = CowTable.read(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    (0 to 4).foreach(i => assert(got(i.toLong) == s"a$i"))
    (95 to 99).foreach(i => assert(got(i.toLong) == s"b$i"))
    assert(got.size == 100)
  }
}
