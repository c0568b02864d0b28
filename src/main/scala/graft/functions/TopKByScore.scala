package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Fused top-k aggregate: keeps the k best (score, payload) pairs per
  * group in a bounded heap, ordered by (score DESC, payload ASC) — the
  * same total order as the rank-then-filter window pattern, but with
  * map-side partial aggregation: each map partition ships at most k
  * pairs per group instead of every candidate row crossing the shuffle
  * and being sorted. For kNN over n² candidate pairs that turns a
  * full-candidate shuffle+sort into a k-row-per-group merge — the
  * difference between quadratic and linear shuffle volume at scale.
  *
  * Output: ARRAY<STRUCT<score DOUBLE, payload BIGINT>> sorted best-first.
  *
  * Deployment note: runs under ObjectHashAggregateExec, whose DEFAULT
  * sort-based fallback threshold (128 distinct keys/partition — sized
  * for unbounded collect_list-style buffers) defeats the point of a
  * bounded top-k buffer by sorting the full candidate stream. Sessions
  * should raise spark.sql.objectHashAggregate.sortBased.fallbackThreshold
  * (graft.GraftSession.tuned does) — see that scaladoc for the sizing
  * argument.
  */
case class TopKByScore(
    scoreExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // min-heap: head = current worst (lowest score; among equal scores the
  // largest payload), so eviction keeps (score DESC, payload ASC) winners
  private val heapOrd: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, p) => (-s, p) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](heapOrd)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val p = payloadExpr.eval(input)
    if (s != null && p != null) {
      buf.enqueue((s.asInstanceOf[Double], p.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e => a.enqueue(e); if (a.size > k) a.dequeue() }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, p) => (-s, p) }
    new GenericArrayData(sorted.map { case (s, p) =>
      new GenericInternalRow(Array[Any](s, p))
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def children: Seq[Expression] = Seq(scoreExpr, payloadExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = children(0), payloadExpr = children(1))
}

object TopKByScore {
  /** topk(score, payload, k): array of the k best pairs, best first. */
  def topk(score: Column, payload: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(payload), k)
        .toAggregateExpression())
}
