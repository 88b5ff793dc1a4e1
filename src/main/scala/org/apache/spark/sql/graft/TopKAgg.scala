package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Top-k (score desc, id asc) per group as a custom aggregate.
  *
  * The window formulation (`row_number over (partition by g order by s)`
  * then `filter rnk <= k`) must shuffle EVERY candidate row to the
  * group's reducer before discarding all but k — at kNN-join scale that
  * is the entire similarity matrix. As a TypedImperativeAggregate the
  * partial state is a bounded k-element heap per group per map task, so
  * the shuffle carries O(groups × k × partitions-touched) rows instead of
  * O(candidates). Same results, ordering ties broken by id ascending.
  *
  * Output: array<struct<score:double, id:bigint>> sorted score desc,
  * id asc — posexplode for (rank, neighbor) rows.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with BinaryLike[Expression] {

  override def left: Expression = score
  override def right: Expression = id

  /** Min-heap under the keep-order: the head is the WORST kept entry
    * (lowest score; among equal scores, highest id), evicted first.
    */
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val worst = buf.head
      if (s > worst._1 || (s == worst._1 && i < worst._2)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)], b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => insert(b1, s, i) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKAgg =
    copy(score = newLeft, id = newRight)
}

object TopKAgg {
  def topk(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k).toAggregateExpression())
}
