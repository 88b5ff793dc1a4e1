package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, StructField, StructType}

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

/** [[NearestCentroid]] with the centroid matrix read from a COLUMN
  * (array<array<float>>, paired with an array<int> of the centroids'
  * global ids) instead of baked-in literals — the building block for
  * hierarchical (coarse-then-fine) assignment, where each row scans
  * only the fine centroids of its routed coarse cell(s) and the matrix
  * therefore differs per row. Returns struct(score, id) of the local
  * argmin — the score so a MULTI-probe caller can take the min across
  * probed coarse cells with an ordinary min(struct), whose (score, id)
  * lexicographic order reproduces the flat argmin's smallest-id
  * tie-break. Same score formula, index-order double accumulation, and
  * first-index ties as the literal form; NULL emb/element/ragged or a
  * NULL/empty/misaligned matrix yields NULL.
  *
  * `norms` carries |c|² per matrix row, computed by the CALLER over the
  * ORIGINAL double centroids — exactly [[NearestCentroid]]'s normSq.
  * (An earlier form summed the float-cast matrix components instead,
  * which was last-ulp off the literal expression's scores; with
  * caller-supplied double norms the two are bit-equal whenever the
  * same float matrix is fed, which is what lets exhaustive-routing
  * hierarchical assignment replace the flat argmin inside
  * bit-deterministic training.)
  */
case class NearestCentroidDyn(emb: Expression, matrix: Expression, ids: Expression,
    norms: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(emb, matrix, ids, norms)
  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid_dyn"

  override def eval(input: InternalRow): Any = {
    val rawE = emb.eval(input)
    val rawM = matrix.eval(input)
    val rawI = ids.eval(input)
    val rawN = norms.eval(input)
    if (rawE == null || rawM == null || rawI == null || rawN == null) return null
    val x = rawE.asInstanceOf[ArrayData]
    val m = rawM.asInstanceOf[ArrayData]
    val idArr = rawI.asInstanceOf[ArrayData]
    val nsqArr = rawN.asInstanceOf[ArrayData]
    val k = m.numElements()
    if (k == 0 || k != idArr.numElements() || k != nsqArr.numElements()) return null
    val n = x.numElements()
    val e = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      e(i) = x.getFloat(i).toDouble
      i += 1
    }
    var best = -1
    var bestScore = Double.NaN
    var c = 0
    while (c < k) {
      if (m.isNullAt(c) || idArr.isNullAt(c) || nsqArr.isNullAt(c)) return null
      val ctr = m.getArray(c)
      if (ctr.numElements() != n) return null
      var s = 0.0
      var j = 0
      while (j < n) {
        if (ctr.isNullAt(j)) return null
        s += e(j) * ctr.getFloat(j).toDouble
        j += 1
      }
      val score = nsqArr.getDouble(c) - 2.0 * s
      if (c == 0 || score < bestScore || (bestScore.isNaN && !score.isNaN)) {
        best = c; bestScore = score
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestScore, idArr.getInt(best)))
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(emb = newChildren(0), matrix = newChildren(1), ids = newChildren(2),
      norms = newChildren(3))
}

object NearestCentroidDyn {
  def nearest(emb: Column, matrix: Column, ids: Column, norms: Column): Column =
    ExpressionUtils.column(NearestCentroidDyn(
      ExpressionUtils.expression(emb), ExpressionUtils.expression(matrix),
      ExpressionUtils.expression(ids), ExpressionUtils.expression(norms)))
}
