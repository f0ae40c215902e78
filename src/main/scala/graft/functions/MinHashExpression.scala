package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature kernel: tokenize → shingle → hash → 64 running
  * mins, one JVM loop per row.
  *
  * Why an expression and not explode + 64 min-aggregates (the previous
  * formulation): the "aggregation" is row-local — every shingle of a doc
  * lives in the same row — so routing it through explode (~90× row
  * blowup), a HashAggregate with 64 partial-min states, and a shuffle
  * just to regroup by doc_id pays pure overhead. Here the whole
  * signature materializes scan-side inside whole-stage codegen; banding
  * reads the array directly and NOTHING shuffles until the bucket join.
  *
  * Bit-identical to the aggregate formulation (pinned by spec):
  * shingle hash = Spark's xxhash64(shingle) (XXH64 over UTF8 bytes,
  * seed 42); family member j re-hashes h ⊕ salt(j) with xxhash64's
  * long path; min is SIGNED (matching the `min` aggregate on LongType).
  * Salts come from the same fixed LCG, so signatures are stable across
  * jobs, engines, and cluster layouts.
  */
object MinHashKernel {
  val NumHashes = 64

  val salts: Array[Long] = {
    var x = 0x9E3779B97F4A7C15L
    Array.fill(NumHashes) {
      x = x * 6364136223846793005L + 1442695040888963407L; x
    }
  }

  def signature(text: UTF8String, n: Int): ArrayData = {
    val sh = ShingleKernel.shingles(text, n)
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val h0 = XXH64.hashUTF8String(sh.getUTF8String(i), 42L)
      var j = 0
      while (j < NumHashes) {
        val hj = XXH64.hashLong(h0 ^ salts(j), 42L)
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-long MinHash signature of a document as a native expression. */
case class MinHashSignature(child: Expression, n: Int = 3)
    extends UnaryExpression {

  // Null in => null out (nullSafeEval): lets constraint inference
  // simplify isnotnull(f(x)) to isnotnull(x) instead of re-evaluating f.
  override def nullIntolerant: Boolean = true


  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_signature needs a string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    MinHashKernel.signature(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.signature($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashFunctions {
  def minhash_signature(text: Column, n: Int = 3): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(text), n))
}
