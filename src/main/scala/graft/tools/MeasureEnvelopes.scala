package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Advanced, Dedup}

/** One-off measurement harness for the envelope gate forms: prints the
  * measured simhash precision/recall vs exact trigram Jaccard and the
  * sketch errors behind q27/q33, per scale factor — the numbers the
  * shipped envelope bounds are derived from. */
object MeasureEnvelopes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = Tables.documents(spark, dir)
      val pairs = Dedup.simhashPairs(docs, maxHamming = 3)
      val sh = docs.select($"doc_id", Dedup.shingles($"text").as("sh"))
      val withJ = pairs
        .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
        .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
        .select(
          (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
            (size($"sh_a") + size($"sh_b") - size(array_intersect($"sh_a", $"sh_b"))))
            .as("j"))
      val (minJ, nPairs) = withJ.agg(coalesce(min($"j"), lit(1.0)), count(lit(1)))
        .as[(Double, Long)].first()
      println(s"[$sf] simhash pairs=$nPairs min_jaccard=$minJ")
      // split by the shorter side's token count: is low jaccard a
      // short-doc artifact?
      val toks = docs.select($"doc_id",
        size(graft.functions.ShingleFunctions.tokens($"text")).as("nt"))
      val withJT = pairs
        .join(sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
        .join(sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
        .join(toks.select($"doc_id".as("doc_a"), $"nt".as("nt_a")), "doc_a")
        .join(toks.select($"doc_id".as("doc_b"), $"nt".as("nt_b")), "doc_b")
        .select(least($"nt_a", $"nt_b").as("mint"),
          (size(array_intersect($"sh_a", $"sh_b")).cast("double") /
            (size($"sh_a") + size($"sh_b") - size(array_intersect($"sh_a", $"sh_b"))))
            .as("j"))
      for (cut <- Seq(0, 10, 20, 50)) {
        val r = withJT.filter($"mint" >= cut)
          .agg(count(lit(1)), coalesce(min($"j"), lit(1.0)),
            coalesce(avg(($"j" >= 0.5).cast("int")), lit(1.0)))
          .as[(Long, Double, Double)].first()
        println(f"[$sf]   pairs minTokens>=$cut: n=${r._1} minJ=${r._2}%.3f fracJ05=${r._3}%.3f")
      }
      // unigram (token SET) jaccard — the orderless similarity simhash
      // actually fingerprints
      val uni = docs.select($"doc_id",
        array_distinct(graft.functions.ShingleFunctions.tokens(lower($"text")))
          .as("u"))
      val withU = pairs
        .join(uni.select($"doc_id".as("doc_a"), $"u".as("u_a")), "doc_a")
        .join(uni.select($"doc_id".as("doc_b"), $"u".as("u_b")), "doc_b")
        .select(
          (size(array_intersect($"u_a", $"u_b")).cast("double") /
            (size($"u_a") + size($"u_b") - size(array_intersect($"u_a", $"u_b"))))
            .as("ju"))
      val ur = withU.agg(count(lit(1)), coalesce(min($"ju"), lit(1.0)),
          coalesce(avg(($"ju" >= 0.5).cast("int")), lit(1.0)),
          coalesce(avg(($"ju" >= 0.8).cast("int")), lit(1.0)))
        .as[(Long, Double, Double, Double)].first()
      println(f"[$sf]   UNIGRAM: n=${ur._1} minJu=${ur._2}%.3f fracJu05=${ur._3}%.3f fracJu08=${ur._4}%.3f")
      // unigram recall ground truth within the block cap
      val uniBlock = uni.filter($"doc_id" < Dedup.JaccardBlockCap)
      val uTruth = uniBlock.select($"doc_id".as("doc_a"), $"u".as("u_a"))
        .join(uniBlock.select($"doc_id".as("doc_b"), $"u".as("u_b")), $"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          (size(array_intersect($"u_a", $"u_b")).cast("double") /
            (size($"u_a") + size($"u_b") - size(array_intersect($"u_a", $"u_b"))))
            .as("ju"))
      for (thr <- Seq(0.8, 0.9, 0.95)) {
        val t = uTruth.filter($"ju" >= thr).select($"doc_a", $"doc_b")
        val nTrue = t.count()
        val nRec = t.join(pairs, Seq("doc_a", "doc_b"), "left_semi").count()
        println(s"[$sf]   UNIGRAM truth ju>=$thr: true=$nTrue recovered=$nRec")
      }
      val truth = Dedup.ddNgramJaccard(spark, dir).cache()
      for (thr <- Seq(0.8, 0.9, 0.95, 0.99)) {
        val t = truth.filter($"jaccard" >= thr).select($"doc_a", $"doc_b")
        val nTrue = t.count()
        val nRec = t.join(pairs, Seq("doc_a", "doc_b"), "left_semi").count()
        println(s"[$sf]   jaccard>=$thr: true=$nTrue recovered=$nRec")
      }
      truth.unpersist()

      val q27 = Tables.lineitem(spark, dir).groupBy($"l_returnflag").agg(
        approx_count_distinct($"l_orderkey", 0.02).as("a_o"),
        approx_count_distinct($"l_partkey", 0.02).as("a_p"),
        countDistinct($"l_orderkey").as("e_o"),
        countDistinct($"l_partkey").as("e_p"),
        graft.functions.ThetaSketchFunctions.theta_distinct($"l_orderkey").as("t_o"),
        graft.functions.ThetaSketchFunctions.theta_distinct($"l_partkey").as("t_p"))
      q27.collect().foreach { r =>
        def err(a: Long, e: Long) = math.abs(a - e).toDouble / e
        println(f"[$sf]   q27/q33 ${r.getString(0)}: hll_o=${err(r.getLong(1), r.getLong(3))}%.4f" +
          f" hll_p=${err(r.getLong(2), r.getLong(4))}%.4f" +
          f" theta_o=${err(r.getLong(5), r.getLong(3))}%.4f" +
          f" theta_p=${err(r.getLong(6), r.getLong(4))}%.4f")
      }
    }
    spark.stop()
  }
}
