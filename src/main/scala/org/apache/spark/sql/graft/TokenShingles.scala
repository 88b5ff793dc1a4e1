package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** n-token shingles in one pass: token array → array of space-joined
  * n-grams, optionally deduplicated preserving first-occurrence order.
  *
  * Semantically identical to the HOF chain
  * `array_distinct(transform(sequence(0, size-n), i -> concat_ws(' ',
  * slice(toks, i+1, n))))` but evaluated as a single tight loop instead
  * of dozens of interpreted lambda invocations per document — shingle
  * generation dominated the MinHash pipeline's runtime before this.
  * Participates in whole-stage codegen via a static call per row, so the
  * tokenize → shingle → hash chain stays inside one codegen span.
  */
case class TokenShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override def nullSafeEval(input: Any): Any =
    TokenShingles.shingleTokens(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenShingles.shingleTokens($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

object TokenShingles {
  private val space = UTF8String.fromString(" ")

  /** The shingle loop — static so generated Java can call it directly. */
  def shingleTokens(toks: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](m - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        if (j > 0) parts(2 * j - 1) = space
        parts(2 * j) = toks.getUTF8String(i + j)
        j += 1
      }
      val shingle = UTF8String.concat(parts: _*)
      if (!distinct || seen.add(shingle)) out.add(shingle)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def shingles(toks: Column, n: Int, distinct: Boolean): Column =
    ExpressionUtils.column(TokenShingles(ExpressionUtils.expression(toks), n, distinct))
}
