package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Sliding-window span hashes in one pass: token array → array of w-token
  * window keys, where each token is hashed with the portable polynomial
  * hash (fold of `h*31 + code mod 1e9+7` over its ASCII codes — identical
  * to `PortableHash.asciiPolyHash`) and each window key is the same fold
  * over its w token hashes. Oracle-replayable arithmetic end to end.
  *
  * Semantically identical to the HOF chain
  * `transform(sequence(0, size-w), i -> aggregate(slice(th, i+1, w), 0L,
  * (a, x) -> (a*31 + x) % M))` over `th = transform(toks, poly)`, but a
  * tight two-loop pass instead of per-element interpreted lambdas —
  * the nested-HOF spelling made q131 the slowest query in the catalog
  * (~28-70 s at sf0.1); this evaluates the identical values in
  * milliseconds and keeps the tokenize → window-hash chain inside one
  * whole-stage-codegen span via a static call.
  */
case class WindowHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 1, s"window size must be >= 1, got $w")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashes.windowHashes(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.WindowHashes.windowHashes($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  private val Mod = 1000000007L

  /** The two-loop pass — static so generated Java can call it directly. */
  def windowHashes(toks: ArrayData, w: Int): ArrayData = {
    val m = toks.numElements()
    if (m < w) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val bytes = toks.getUTF8String(i).getBytes
      var h = 0L
      var j = 0
      while (j < bytes.length) {
        h = (h * 31 + (bytes(j) & 0xff)) % Mod
        j += 1
      }
      th(i) = h
      i += 1
    }
    val out = new Array[Long](m - w + 1)
    i = 0
    while (i <= m - w) {
      var h = 0L
      var j = 0
      while (j < w) {
        h = (h * 31 + th(i + j)) % Mod
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def windowHashes(toks: Column, w: Int): Column =
    ExpressionUtils.column(WindowHashes(ExpressionUtils.expression(toks), w))
}
