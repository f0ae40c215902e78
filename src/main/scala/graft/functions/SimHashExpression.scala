package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash kernel: the whole tokenize → per-token xxhash64 → 64-bit
  * vote → sign-pack fold in one JVM loop per row.
  *
  * Replaces the `aggregate`/`zip_with` higher-order-function
  * formulation, which is CodegenFallback — interpreted, with a fresh
  * 64-element vote array (and 64 boxed longs) allocated per TOKEN per
  * row. Here the vote array lives once per row on the stack-adjacent
  * heap and every token costs one hash + one 64-iteration bit loop,
  * invoked directly from the generated stage.
  *
  * Bit-for-bit identical to the HOF formulation (pinned by spec):
  * tokens are the lowercased non-empty whitespace splits (TokenKernel
  * semantics), the per-token hash is Spark's `xxhash64(token)` (XXH64,
  * seed 42), bit i votes +1 when hash bit i is set else −1, and simhash
  * bit i is set when the vote sum is strictly positive.
  */
object SimHashKernel {
  def simhash64(text: UTF8String): Long = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val votes = new Array[Int](64)
    var ti = 0
    while (ti < toks.length) {
      if (toks(ti).nonEmpty) {
        val h = XXH64.hashUTF8String(UTF8String.fromString(toks(ti)), 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      ti += 1
    }
    var sim = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sim |= 1L << i
      i += 1
    }
    sim
  }
}

/** 64-bit SimHash of a document as a native expression; codegen emits a
  * direct static call into SimHashKernel. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // Null in ⇒ null out (nullSafeEval), so constraint inference may
  // rewrite isnotnull(simhash64(x)) to isnotnull(x) — without this the
  // inferred join-key constraint re-evaluates the kernel in a Filter
  // below the Project that computes it (docs/PLANS_r2.md dd_simhash_pairs).
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs a string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    SimHashKernel.simhash64(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashKernel.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashFunctions {
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
}
