package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a single custom aggregate: one pass over the
  * shingle hashes, a primitive long[] buffer of per-permutation minima —
  * the classic sketch-style TypedImperativeAggregate (same execution
  * shape as HLL/percentile sketches in ObjectHashAggregateExec).
  *
  * Equivalent to `numHashes` separate min() aggregates but with one
  * buffer row instead of a 128-column-wide aggregation, which keeps the
  * shuffled partial state compact and sidesteps codegen-width limits.
  * Partial aggregation (map-side combine) applies as usual: partials are
  * merged with elementwise min.
  *
  * The permutation family MUST match graft.functions.PortableHash
  * (h31 = pmod(h, p); perm_k = (a_k*h31 + b_k) mod p, p = 2^31-1) so the
  * declarative and imperative formulations are interchangeable.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val P = 2147483647L // 2^31 - 1

  @transient private lazy val coeffs: Array[(Long, Long)] =
    Array.tabulate(numHashes) { k =>
      val a = ((k.toLong * 2654435761L + 1013904223L) % (P - 1) + 1) | 1L
      val b = (k.toLong * 1103515245L + 12345L) % P
      (a, b)
    }

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      val h31 = ((h % P) + P) % P // pmod, matches Spark's pmod(h, p)
      var k = 0
      while (k < numHashes) {
        val (a, b) = coeffs(k)
        val perm = (a * h31 + b) % P
        if (perm < buf(k)) buf(k) = perm
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) { if (b2(k) < b1(k)) b1(k) = b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Column builder: `minhash_agg(hashCol)` → array<long> signature. */
  def minhash(h: Column, numHashes: Int): Column =
    ExpressionUtils.column(MinHashAgg(ExpressionUtils.expression(h), numHashes).toAggregateExpression())
}
