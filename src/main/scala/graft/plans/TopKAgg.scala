package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `graft_topk(score, id, k)` — a bounded top-k-per-group AGGREGATE.
  *
  * Why (SURVEY §4.3 escape hatch): Spark has no native top-k aggregate, so
  * "top k rows per group" is universally written as `row_number() OVER
  * (PARTITION BY g ORDER BY s DESC) <= k`. Spark ≥3.5 does bound that
  * plan's shuffle (InferWindowGroupLimit inserts a Partial
  * WindowGroupLimit below the exchange — verified on this build), but the
  * limit operator requires SORTED input: every map partition still fully
  * sorts ALL its rows before limiting, and the reduce side sorts again.
  * As an aggregate, top-k is mergeable with no sort anywhere: each map
  * task keeps a k-bounded heap per group (O(log k) per row), the shuffle
  * moves at most k × partitions rows per group, and the only ordering
  * work is the final k-element emission sort. At 100 TB the map-side full
  * sort is the cost that remains in the window plan; TopKScaleCheck
  * measures the gap widening with scale (1.0× at sf0.1 → 1.4× at 10×).
  *
  * Rank order: higher score first, ties by smaller id; NaN scores rank
  * last (the repo-wide contract, same as KnnJoinExec). Null score or id
  * contributes nothing. Result: `array<struct<score:double, id:bigint>>`
  * sorted best-first — callers `posexplode` it back to rows (arrays never
  * reach a declared query's final schema, per DriverSchemaSpec).
  *
  * Planning: TypedImperativeAggregate lowers to ObjectHashAggregateExec
  * with a genuine partial/final split — TopKAggSpec asserts the
  * `partial_graft_topk` stage exists and the plan contains no Sort before
  * the exchange.
  */
final class TopKBuffer(val k: Int) {
  /** Worst-kept-entry-first heap: O(log k) eviction at the bound. */
  val heap: scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(TopKBuffer.worstFirst)

  def offer(score: Double, id: Long): Unit =
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val w = heap.head
      if (TopKBuffer.rankCompare(score, id, w._1, w._2) < 0) {
        heap.dequeue()
        heap.enqueue((score, id))
      }
    }
}

object TopKBuffer {
  /** < 0 iff (s1, i1) ranks strictly before (s2, i2): higher score first,
    * ties by smaller id, NaN after every real score. */
  def rankCompare(s1: Double, i1: Long, s2: Double, i2: Long): Int = {
    val n1 = s1.isNaN
    val n2 = s2.isNaN
    val c =
      if (n1 && n2) 0
      else if (n1) 1
      else if (n2) -1
      else java.lang.Double.compare(s2, s1)
    if (c != 0) c else java.lang.Long.compare(i1, i2)
  }

  /** PriorityQueue dequeues its maximum; "maximum" here = worst-ranked. */
  val worstFirst: Ordering[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) =>
      rankCompare(a._1, a._2, b._1, b._2)

  /** Entries sorted best-first (the emission order). */
  def sortedEntries(b: TopKBuffer): Array[(Double, Long)] =
    b.heap.toArray.sortWith { (x, y) =>
      rankCompare(x._1, x._2, y._1, y._2) < 0
    }

  /** Shuffle/state-store serde — shared verbatim by the batch aggregate
    * (TopKBy) and the streaming speed-layer twin (StreamingOps.topKStream):
    * the lambda parity claim is literal code sharing, not two
    * implementations agreeing by luck. */
  def toBytes(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.k)
    out.writeInt(b.heap.size)
    b.heap.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new TopKBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { b.offer(in.readDouble(), in.readLong()); n -= 1 }
    b
  }
}

case class TopKBy(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBy =
    copy(score = newChildren(0), id = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be DOUBLE, got ${score.dataType.simpleString}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be BIGINT, got ${id.dataType.simpleString}")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"graft_topk k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    new StructType()
      .add("score", DoubleType, nullable = false)
      .add("id", LongType, nullable = false),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    if (s != null) {
      val i = id.eval(input)
      if (i != null) b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.heap.foreach { case (s, i) => b.offer(s, i) }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(TopKBuffer.sortedEntries(b).map {
      case (s, i) => InternalRow(s, i)
    })

  override def serialize(b: TopKBuffer): Array[Byte] = TopKBuffer.toBytes(b)

  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "graft_topk"
}

object TopKBy {
  /** Builder for function-registry registration: k must fold to an integral
    * constant — a bare literal (`graft_topk(score, id, 5)`), a foldable
    * expression (`2 + 3`), or a BIGINT literal that fits an Int all work;
    * anything non-foldable (a column, a rand() call) is rejected, since k
    * bounds per-heap state and must be known at plan time. */
  def fromExprs(exprs: Seq[Expression]): TopKBy = {
    require(exprs.length == 3,
      s"graft_topk takes (score, id, k), got ${exprs.length} args")
    val k = exprs(2) match {
      case e if e.foldable =>
        e.eval() match {
          case i: Int                     => i
          case l: Long if l.isValidInt    => l.toInt
          case s: Short                   => s.toInt
          case b: Byte                    => b.toInt
          case other =>
            throw new IllegalArgumentException(
              s"graft_topk k must fold to an integer, got $other")
        }
      case other =>
        throw new IllegalArgumentException(
          s"graft_topk k must be a constant (foldable) integer, got $other")
    }
    require(k > 0, s"graft_topk k must be positive, got $k")
    TopKBy(exprs(0), exprs(1), k)
  }
}
