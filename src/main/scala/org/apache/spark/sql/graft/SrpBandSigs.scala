package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** All sign-random-projection band signatures of a float-array embedding
  * in ONE pass: element b of the result is the [[planesPerBand]]-bit
  * signature of band b (bit j set iff dot(emb, plane[b·ppb + j]) ≥ 0).
  *
  * Why native: the column formulation (Similarity.bucketId — a sum of
  * `when(DotF32(emb, litArray) >= 0, 1L<<j)` terms) explodes into a
  * ~200-plane × 64-literal expression tree per band array; at that size
  * whole-stage codegen degrades and evaluation was measured at ~13 ms
  * per ROW (28 s of CPU for 2 000 rows at sf0.1, twice per self-join).
  * This expression evaluates the same math as primitive loops over a
  * pre-flattened Float matrix — the tree is one node, the work is
  * numPlanes × dim multiply-adds.
  *
  * Bit-exact twin of the bucketId formulation (spec-enforced), including
  * its degenerate-input behavior: a NULL array, a NULL element, or a
  * dimension mismatch makes every DotF32 null, every `when` fall through
  * to 0, and every band signature 0 — so this expression returns an
  * all-zero array (never NULL) on those inputs and is `nullable = false`.
  * Plane components are truncated to Float at construction exactly like
  * bucketId's `lit(x.toFloat)` literals; accumulation is index-order in
  * double — DotF32's contract (VectorExpressions.scala:41-54).
  */
case class SrpBandSigs(child: Expression, planes: Seq[Seq[Double]], planesPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  private val numBands = planes.length / planesPerBand

  @transient private lazy val planesF: Array[Array[Float]] =
    planes.map(_.map(_.toFloat).toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "srp_band_sigs"

  private def zeros: GenericArrayData = new GenericArrayData(new Array[Long](numBands))

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return zeros
    val x = raw.asInstanceOf[ArrayData]
    val dim = planesF(0).length
    val n = x.numElements()
    if (n != dim) return zeros
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return zeros
      i += 1
    }
    val emb = new Array[Double](n)
    i = 0
    while (i < n) { emb(i) = x.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var sig = 0L
      var j = 0
      while (j < planesPerBand) {
        val p = planesF(b * planesPerBand + j)
        var s = 0.0
        var k = 0
        while (k < n) { s += emb(k) * p(k).toDouble; k += 1 }
        if (s >= 0) sig |= 1L << j
        j += 1
      }
      out(b) = sig
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBandSigs {
  def sigs(emb: Column, planes: Array[Array[Double]], planesPerBand: Int): Column =
    ExpressionUtils.column(
      SrpBandSigs(ExpressionUtils.expression(emb), planes.map(_.toSeq).toSeq, planesPerBand))
}
