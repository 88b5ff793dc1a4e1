package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Lookup-table ADC — the documented-but-previously-not-taken PQ
  * optimization (PqIndex.scala's "precompute each query's M×ksub
  * distance table" note): with `lut[m][j] = ‖q_m − codebook_m[j]‖²`
  * precomputed once per query (driver-side over the bounded query
  * batch), the per-candidate-row ADC distance collapses from
  * M·(d/M) = d multiply-adds PLUS the per-row array churn of the HOF
  * formulation (zip_with allocates a d/M-element array per subspace
  * per row) to M array reads and M-1 additions — no allocation at all.
  *
  * Bit-parity contract with PqIndex.adcDist (spec-enforced): each LUT
  * cell is accumulated component-by-component in index order over the
  * same float-cast inputs (query floats, codebook doubles→floats), and
  * this expression sums cells in subspace order — the exact fold order
  * of adcDist's `subDists.foldLeft(0.0)(_ + _)`. The caller applies
  * the same final round(…, 6).
  *
  * NULL codes / NULL cell / out-of-range code → NULL out (the
  * NearestCentroidDyn degenerate-input convention).
  */
case class AdcLookup(codes: Expression, lut: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(codes, lut)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "adc_lookup"

  override def eval(input: InternalRow): Any = {
    val rawC = codes.eval(input)
    val rawL = lut.eval(input)
    if (rawC == null || rawL == null) return null
    val c = rawC.asInstanceOf[ArrayData]
    val l = rawL.asInstanceOf[ArrayData]
    val m = c.numElements()
    if (m == 0 || m != l.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < m) {
      if (c.isNullAt(i) || l.isNullAt(i)) return null
      val row = l.getArray(i)
      val j = c.getInt(i)
      if (j < 0 || j >= row.numElements() || row.isNullAt(j)) return null
      s += row.getDouble(j)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(codes = newChildren(0), lut = newChildren(1))
}

object AdcLookup {
  def adc(codes: Column, lut: Column): Column =
    ExpressionUtils.column(AdcLookup(
      ExpressionUtils.expression(codes), ExpressionUtils.expression(lut)))
}
