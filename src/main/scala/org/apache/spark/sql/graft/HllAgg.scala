package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** HyperLogLog register sketch (Flajolet et al. 2007) — the
  * industry-standard distinct-count sketch next to the bottom-k KMV the
  * engine already carries ([[KmvAgg]], q45): m = 2^p FIXED-SIZE byte
  * registers per group, register idx = h mod m updated to
  * max(rho(h div m)) where rho is the leading-zero rank of the
  * remaining hash bits in their W-bit window. KMV state is k longs and
  * exact below k; HLL state is m BYTES regardless of cardinality and
  * merges by ELEMENTWISE MAX — the property that makes it the sketch
  * warehouses persist per partition/day and roll up later (register max
  * is associative, commutative, idempotent — re-merging a shard is
  * harmless, which KMV's re-trim also gives but at 8× the bytes per
  * bucket).
  *
  * Scale shape: partial state per group per map task is m bytes; the
  * shuffle carries registers, never values. At 100 TB with millions of
  * groups, p=9 → 512 B/group — the reason HLL is the default
  * approx-distinct in BigQuery/Snowflake/Spark itself
  * (`approx_count_distinct` is HLL++). This implementation exists
  * beside Spark's because the engine's oracle discipline needs a
  * DETERMINISTIC, cross-engine-replayable sketch: the input is the
  * portable polynomial hash (~30 uniform-ish bits, W = 21-bit rho
  * window at p = 9), every register transition is integer arithmetic,
  * and DuckDB recomputes the exact registers in SQL (q167). Production
  * at 100 TB swaps in a 64-bit digest — wider window, same operator.
  *
  * Estimation is the caller's affair ([[HllAgg.estimateCol]]): the raw
  * HLL estimate αm·m²/Σ 2^(−M_j), all dyadic arithmetic, hence exact
  * and fold-order-independent in IEEE doubles — bit-equal across
  * engines with no transcendental in sight (the small-range
  * linear-counting correction needs ln(); production adds it below
  * 2.5m, the catalog entry reports the raw estimate next to the exact
  * count instead, keeping the oracle transcendental-free).
  *
  * Output: array<int> of all m register values (0 = never touched).
  */
case class HllAgg(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, "hll sketch needs 4 <= p <= 16")

  private def m: Int = 1 << p

  /** rho window width: the portable hash is < 2³¹−1, so after the
    * div-m index split the quotient fits in (31 − p) bits minus the
    * modulus slack — 21 bits at p = 9 (⌈(2³¹−1)/512⌉ < 2²¹).
    */
  private def w: Int = 30 - p

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val h = child.eval(input)
    if (h != null) {
      val hv = h.asInstanceOf[Long]
      if (hv < 0) return buf // hash contract is nonnegative; ignore like NULL
      val idx = (hv % m).toInt
      val q = hv / m
      val rho = if (q == 0L) w + 1 else w - (63 - java.lang.Long.numberOfLeadingZeros(q))
      if (rho > buf(idx)) buf(idx) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Any](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

object HllAgg {
  import org.apache.spark.sql.functions._

  def hll(hash: Column, p: Int): Column =
    ExpressionUtils.column(
      HllAgg(ExpressionUtils.expression(hash), p).toAggregateExpression())

  /** The raw HLL estimate from a register array: αm·m²/Σ_j 2^(−M_j) —
    * every term a dyadic rational (lsb 2^(−w−1), span ≤ m), so the sum
    * is EXACT in doubles and fold-order-independent; both engines can
    * use a plain SUM. αm = 0.7213/(1 + 1.079/m), the standard constant.
    */
  def estimateCol(registers: Column, p: Int): Column = {
    val m = 1 << p
    val md = m.toDouble
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(md))
    val ssum = aggregate(registers, lit(0.0),
      (acc, r) => acc + lit(1.0) / call_function("shiftleft", lit(1L), r).cast("double"))
    alpha * lit(md) * lit(md) / ssum
  }
}
