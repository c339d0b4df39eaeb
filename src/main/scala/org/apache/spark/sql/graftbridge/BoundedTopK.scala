package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer ordered by (score DESC, id ASC) — the ordering of
  * every ANN final rank (`row_number() OVER (ORDER BY score DESC, id)`).
  * Internally a min-heap whose head is the WORST kept entry, so insert is
  * O(log k) and the buffer never holds more than k entries.
  */
final class TopKBuffer(val k: Int) {
  // Worst-first comparator: lower score first; on ties, HIGHER id first
  // (a higher id loses the tie under ASC id ranking, so it is "worse").
  private val heap = new java.util.PriorityQueue[TopKBuffer.Entry](
    math.max(1, k),
    (a: TopKBuffer.Entry, b: TopKBuffer.Entry) =>
      if (a.score != b.score) java.lang.Double.compare(a.score, b.score)
      else java.lang.Long.compare(b.id, a.id))

  def size: Int = heap.size

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) {
      heap.offer(new TopKBuffer.Entry(score, id))
    } else {
      val worst = heap.peek()
      if (score > worst.score || (score == worst.score && id < worst.id)) {
        heap.poll()
        heap.offer(new TopKBuffer.Entry(score, id))
      }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); add(e.score, e.id) }
  }

  /** Entries best-first: score DESC, id ASC — rank i is element i+1. */
  def sortedBestFirst: Array[TopKBuffer.Entry] = {
    val arr = heap.toArray(new Array[TopKBuffer.Entry](heap.size))
    java.util.Arrays.sort(arr, (a: TopKBuffer.Entry, b: TopKBuffer.Entry) =>
      if (a.score != b.score) java.lang.Double.compare(b.score, a.score)
      else java.lang.Long.compare(a.id, b.id))
    arr
  }
}

object TopKBuffer {
  final class Entry(val score: Double, val id: Long)
}

/** Bounded top-k aggregate: `bounded_topk(score, id, k)` returns the k
  * (score, id) pairs with the highest score (ties to the lowest id) as
  * `array<struct<score double, id bigint>>` sorted best-first.
  *
  * The point versus `row_number() OVER (PARTITION BY g ORDER BY score
  * DESC)` + filter: a rank window must SHUFFLE EVERY INPUT ROW into its
  * group's partition before it can rank, so top-k-per-query over a scored
  * corpus moves the whole corpus through one exchange. This aggregate's
  * partial (map-side) buffers are already capped at k entries, so the
  * exchange carries at most mapPartitions × groups × k entries no matter
  * how many rows were scored — the two-phase local/global top-k that
  * survives a 10⁹-row corpus.
  */
case class BoundedTopK(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with TernaryLike[Expression] with ExpectsInputTypes {

  private lazy val k: Int = third.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"bounded_topk k must be an int literal, got $other")
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType, IntegerType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = first.eval(input)
    val id = second.eval(input)
    if (s != null && id != null) buffer.add(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { e =>
      InternalRow(e.score, e.id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buffer.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    val entries = buffer.sortedBestFirst
    out.writeInt(entries.length)
    entries.foreach { e => out.writeDouble(e.score); out.writeLong(e.id) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new TopKBuffer(in.readInt())
    var n = in.readInt()
    while (n > 0) { buf.add(in.readDouble(), in.readLong()); n -= 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BoundedTopK =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BoundedTopK {
  def apply(score: Expression, id: Expression, k: Int): BoundedTopK =
    BoundedTopK(score, id, Literal(k))
}
