package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, IntegerType}

/** argmin-over-centroids of the IVF assignment in ONE pass: the index c
  * minimizing |centroid_c|² − 2·emb·centroid_c (|emb|² is argmin-
  * invariant), ties to the first index.
  *
  * Why native: the column formulation (IvfIndex.clusterCol — an
  * array_position(array_min) over an array of k `normSq − 2·DotF32`
  * scores) builds a k-wide expression tree with k array literals; at
  * the occupancy-scaled k (k = ⌈n/targetCell⌉, 125 at the 8× corpus,
  * thousands at real scale) that tree dominates the assignment scan.
  * This expression is one node evaluating k × dim multiply-adds in
  * primitive loops over a pre-flattened Float matrix.
  *
  * Bit-exact twin of clusterCol (spec-enforced, and the q34/q41/q99/
  * q108 DuckDB oracles replay it): centroid components go through the
  * same double→float cast as clusterCol's lit(x.toFloat); normSq stays
  * the DOUBLE sum over the ORIGINAL doubles (clusterCol's lit(normSq));
  * each dot accumulates double(emb_f)·double(c_f) in index order —
  * DotF32's contract; the score comparison is strict `<` scanning c
  * ascending == array_position's first-min. A NULL array, NULL element,
  * or dimension mismatch nulls every DotF32, hence every score, hence
  * array_min → NULL out.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  @transient private lazy val centroidsF: Array[Array[Float]] =
    centroids.map(_.map(_.toFloat).toArray).toArray

  @transient private lazy val normSq: Array[Double] =
    centroids.map(c => c.map(x => x * x).sum).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return null
    val x = raw.asInstanceOf[ArrayData]
    val dim = centroidsF(0).length
    val n = x.numElements()
    if (n != dim) return null
    val emb = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      emb(i) = x.getFloat(i).toDouble
      i += 1
    }
    var best = 0
    var bestScore = Double.NaN
    var c = 0
    while (c < centroidsF.length) {
      val ctr = centroidsF(c)
      var s = 0.0
      var k = 0
      while (k < n) { s += emb(k) * ctr(k).toDouble; k += 1 }
      val score = normSq(c) - 2.0 * s
      // array_min orders NaN above every double: a later non-NaN score
      // must displace a NaN best (first-index tie-break otherwise).
      if (c == 0 || score < bestScore || (bestScore.isNaN && !score.isNaN)) {
        best = c; bestScore = score
      }
      c += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {
  def nearest(emb: Column, centroids: Array[Array[Double]]): Column =
    ExpressionUtils.column(
      NearestCentroid(ExpressionUtils.expression(emb), centroids.map(_.toSeq).toSeq))
}
