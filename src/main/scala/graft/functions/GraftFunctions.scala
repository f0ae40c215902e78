package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's custom expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works alongside the Column
  * API.
  *
  * Two entry points:
  *  - `register(spark)` — imperative, for an existing session;
  *  - `GraftExtensions` — declarative, for
  *    `spark.sql.extensions=graft.functions.GraftExtensions` at session
  *    build (the deployment shape for a shared cluster).
  */
object GraftFunctions {

  /** Foldable integer literal or a typed error naming the function and
    * argument (the friendly-error contract the bloom_sketch args set). */
  private def foldableInt(fn: String, arg: String, e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable numeric literal")
    e.eval(null) match {
      case d: org.apache.spark.sql.types.Decimal => d.toInt
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a numeric literal, got $other")
    }
  }

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "tokens" -> (exprs => Tokens(exprs(0))),
    // optional 2nd arg: shingle width as a foldable int literal (default 3)
    "ngram_shingles" -> (exprs => NGramShingles(exprs(0),
      if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
      else 3)),
    "simhash64" -> (exprs => SimHash64(exprs(0))),
    // optional 2nd arg: shingle width as a foldable int literal (default 3)
    "minhash_signature" -> (exprs => MinHashSignature(exprs(0),
      if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
      else 3)),
    // optional 2nd arg: sketch size k as a foldable int literal
    "theta_distinct" -> (exprs => ThetaDistinct(exprs(0),
      if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
      else 256)),
    // kll_quantile(col, q[, k]): q and k as foldable literals (a SQL
    // `0.5` literal arrives as Decimal, not a java.lang.Number)
    "kll_quantile" -> (exprs => KllQuantile(exprs(0),
      exprs(1).eval(null) match {
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
        case n: Number => n.doubleValue
      },
      if (exprs.length > 2) exprs(2).eval(null).asInstanceOf[Number].intValue
      else 200)),
    // optional 2nd arg: counter budget k as a foldable int literal
    "heavy_hitters" -> (exprs => HeavyHitters(exprs(0),
      if (exprs.length > 1) exprs(1).eval(null).asInstanceOf[Number].intValue
      else 64)),
    // bloom_sketch(col, expected_items[, fpp]) — mergeable sketch bytes
    "bloom_sketch" -> (exprs => BloomSketchBytes(exprs(0),
      {
        if (!exprs(1).foldable) throw new IllegalArgumentException(
          "bloom_sketch: expected_items must be a foldable numeric literal")
        exprs(1).eval(null) match {
          case d: org.apache.spark.sql.types.Decimal => d.toLong
          case n: Number => n.longValue
          case other => throw new IllegalArgumentException(
            s"bloom_sketch: expected_items must be a numeric literal, got $other")
        }
      },
      if (exprs.length > 2) {
        if (!exprs(2).foldable) throw new IllegalArgumentException(
          "bloom_sketch: fpp must be a foldable numeric literal")
        exprs(2).eval(null) match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue
          case other => throw new IllegalArgumentException(
            s"bloom_sketch: fpp must be a numeric literal, got $other")
        }
      } else 0.01)),
    "bloom_might_contain" -> (exprs =>
      BloomMightContain(exprs(0), exprs(1))),
    // cms_sketch(col[, depth[, width]]) — mergeable count-min bytes
    "cms_sketch" -> (exprs => CmsSketchBytes(exprs(0),
      if (exprs.length > 1) foldableInt("cms_sketch", "depth", exprs(1))
      else 4,
      if (exprs.length > 2) foldableInt("cms_sketch", "width", exprs(2))
      else 1024)),
    "bloom_might_contain_shard" -> (exprs =>
      BloomMightContainShard(exprs(0), exprs(1), exprs(2))),
    // sign_pack(vec, offset, width): 1-bit quantization words for the
    // Hamming ANN tier, from SQL
    "sign_pack" -> (exprs => SignPack(exprs(0),
      foldableInt("sign_pack", "offset", exprs(1)),
      foldableInt("sign_pack", "width", exprs(2)))),
    // ams_sketch(col[, depth[, width]]) — mergeable join-size sketch
    "ams_sketch" -> (exprs => AmsSketchBytes(exprs(0),
      if (exprs.length > 1) foldableInt("ams_sketch", "depth", exprs(1))
      else 5,
      if (exprs.length > 2) foldableInt("ams_sketch", "width", exprs(2))
      else 1024)),
  )

  def register(spark: SparkSession): Unit = {
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    // table-valued surface (FROM asof_join(...)) + the strategy it plans to
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      graft.plans.AsofSqlFunction.name, graft.plans.AsofSqlFunction.build,
      "built-in")
    // FROM cow_read('/path'[, version]) — lakehouse snapshots in SQL
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      graft.plans.CowSqlFunction.name, graft.plans.CowSqlFunction.build,
      "built-in")
    graft.plans.AsofJoinApi.enable(spark)
  }

  private[functions] def inject(extensions: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, builder) =>
      extensions.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(s"graft.functions.$name", name),
        builder))
    }
    extensions.injectTableFunction(graft.plans.AsofSqlFunction.description)
    extensions.injectTableFunction(graft.plans.CowSqlFunction.description)
  }
}

/** `spark.sql.extensions` entry point: custom functions AND the as-of
  * join planner strategy, so a cluster configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions` gets the full
  * surface declaratively (no imperative enable() call needed). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(extensions)
    extensions.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    extensions.injectOptimizerRule(_ => graft.plans.MvRewriteRule)
  }
}
