package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties: lowest id) per group.
  *
  * Why not `Window.partitionBy(g).orderBy(score).row_number <= k`? The
  * window formulation SORTS EVERY ROW of every group (an external sort of
  * the full 100 TB input) before discarding all but k. This aggregate is
  * algebraic-style: each map task keeps a k-element heap per group, the
  * shuffle carries at most k pairs per (task, group), and merge is a heap
  * union — the classic scalable top-k. Same results, verified against the
  * window/row_number oracle in the gate.
  *
  * Buffer serialization is a flat (count, pairs…) byte image — the
  * TypedImperativeAggregate contract for shuffle-safe custom state.
  */
final case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  // analysis-time type validation: without it a string score passes
  // analysis and dies mid-job with ClassCastException in update(); Decimal
  // is excluded too (spark's Decimal is not a java.lang.Number)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def plainNumeric(t: DataType): Boolean = t match {
      case _: DecimalType => false
      case _: NumericType => true
      case _ => false
    }
    if (plainNumeric(score.dataType) && plainNumeric(id.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_by_score expects non-decimal numeric (score, id), got " +
          s"${score.dataType.catalogString} and ${id.dataType.catalogString}")
  }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.offer(s.asInstanceOf[Number].doubleValue(), i.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = { b.absorb(other); b }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })

  override def serialize(b: TopKBuffer): Array[Byte] = b.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Min-heap on "worst of the kept": root is the entry that leaves first.
  * Order: higher score is better; on equal score, lower id is better.
  */
final class TopKBuffer(k: Int) {
  import scala.collection.mutable
  // ordering for the heap: root = WORST kept entry (so better-than-root replaces it)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }
  private val heap = mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  def offer(score: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head
      if (score > ws || (score == ws && id < wi)) { heap.dequeue(); heap.enqueue((score, id)) }
    }

  def absorb(other: TopKBuffer): Unit = other.heap.foreach { case (s, i) => offer(s, i) }

  /** best-first: score desc, id asc. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, i) => (-s, i) }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush(); bos.toByteArray
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val n = in.readInt()
    (0 until n).foreach(_ => b.offer(in.readDouble(), in.readLong()))
    b
  }
}

object TopK {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.Bridge

  /** Column API: `topK(score, id, k)` → array<struct<score,id>> best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKByScore(Bridge.childExpr(score), Bridge.childExpr(id), k)
      .toAggregateExpression())
}
