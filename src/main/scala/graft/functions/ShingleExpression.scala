package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shingle kernel shared by the interpreted and generated paths: the
  * whole tokenize→slide→dedup loop in one JVM method over UTF8String,
  * no Row/encoder round-trip (which is the hidden cost of a Scala UDF —
  * Catalyst converts UTF8String→String→Array[String]→ArrayData per row;
  * here only the unavoidable String conversion for the regex remains). */
object ShingleKernel {
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    val out: Array[AnyRef] =
      if (toks.length >= n)
        toks.sliding(n).map(_.mkString(" ")).toArray.distinct
          .map(UTF8String.fromString(_): AnyRef)
      else Array(UTF8String.fromString(toks.mkString(" ")): AnyRef)
    new GenericArrayData(out)
  }
}

/** Distinct n-gram word shingles as a native expression. Codegen emits a
  * direct static call into ShingleKernel — stays inside the generated
  * stage with zero per-row closure/encoder overhead. */
case class NGramShingles(child: Expression, n: Int = 3)
    extends UnaryExpression {

  // Null in => null out (nullSafeEval): lets constraint inference
  // simplify isnotnull(f(x)) to isnotnull(x) instead of re-evaluating f.
  override def nullIntolerant: Boolean = true


  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"ngram_shingles needs a string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    ShingleKernel.shingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramShingles =
    copy(child = newChild)
}

object PositionalShingleKernel {
  import org.apache.spark.sql.catalyst.InternalRow

  /** ALL positional n-gram shingles (0-based token position, duplicates
    * kept — unlike [[ShingleKernel]] there is no distinct and no
    * short-doc fallback: a doc with fewer than n tokens has no n-gram,
    * exactly like the SQL `range(len - n + 1)` formulation). */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val sb = new java.lang.StringBuilder
      val rows = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i < rows.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        rows(i) = InternalRow(i, UTF8String.fromString(sb.toString))
        i += 1
      }
      new GenericArrayData(rows)
    }
  }
}

/** Positional shingles as a native codegen'd expression:
  * array<struct<pos:int, gram:string>> — the input to cross-document
  * duplicate-span detection, where the POSITION of a repeated n-gram
  * matters (coverage masks), so the distinct-set NGramShingles form
  * doesn't fit. */
case class PositionalShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("pos",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("gram", StringType,
        nullable = false))), containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"positional_shingles needs a string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    PositionalShingleKernel.shingles(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PositionalShingleKernel.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): PositionalShingles =
    copy(child = newChild)
}

object TokenKernel {
  /** Non-empty whitespace tokens of the lowercased text — the exact
    * semantics of `filter(split(lower(text), "\\s+"), _ != "")`, one JVM
    * loop, order preserved, duplicates preserved. */
  def tokens(text: UTF8String): ArrayData =
    new GenericArrayData(text.toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
      .map(UTF8String.fromString(_): AnyRef))
}

case class Tokens(child: Expression) extends UnaryExpression {

  // Null in => null out (nullSafeEval): lets constraint inference
  // simplify isnotnull(f(x)) to isnotnull(x) instead of re-evaluating f.
  override def nullIntolerant: Boolean = true

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"tokens needs a string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    TokenKernel.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenKernel.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object ShingleFunctions {
  def ngram_shingles(text: Column, n: Int = 3): Column =
    ColumnBridge.column(NGramShingles(ColumnBridge.expression(text), n))

  def tokens(text: Column): Column =
    ColumnBridge.column(Tokens(ColumnBridge.expression(text)))

  def positional_shingles(text: Column, n: Int): Column =
    ColumnBridge.column(PositionalShingles(ColumnBridge.expression(text), n))
}
