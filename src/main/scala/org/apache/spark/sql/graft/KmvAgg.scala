package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch: keeps the k SMALLEST
  * DISTINCT hash values per group (the bottom-k sketch of the theta /
  * KMV estimator family, Bar-Yossef et al. 2002). With hashes uniform on
  * [0, D), the k-th minimum v_k estimates the distinct count as
  * (k − 1) · D / v_k; fewer than k distinct hashes means the set IS the
  * distinct count. Error ~ 1/√k (~6 % at k=256).
  *
  * Scale shape: the partial state is a bounded k-element sorted set per
  * group per map task, so approximate distinct over 100 TB shuffles
  * O(groups × k × partitions) longs — never the values themselves (the
  * exact `count(distinct)` shuffles every distinct value). Sketches
  * MERGE losslessly (union of bottom-k sets re-trimmed to k), so they
  * can also be stored per partition/day and unioned later.
  *
  * Set semantics (duplicate hashes count once) are what make the
  * estimator valid — a bounded heap of non-distinct values is NOT a KMV
  * sketch. Deterministic given a deterministic hash: use the portable
  * polynomial hash and the DuckDB oracle replays the sketch exactly
  * (q45).
  *
  * Output: array<bigint> of the ≤ k minima, ascending — `element_at(a,
  * k)` is v_k, `size(a) < k` signals the exact regime.
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 0, "kmv sketch needs k > 0")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val h = child.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long], b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    b2.forEach(h => insert(b1, h))
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    var i = 0
    buf.forEach { h => out(i) = h.longValue(); i += 1 } // ascending (TreeSet order)
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

object KmvAgg {
  def kmv(hash: Column, k: Int): Column =
    ExpressionUtils.column(
      KmvAgg(ExpressionUtils.expression(hash), k).toAggregateExpression())
}
