package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Bounded top-k entry: score + a long tiebreaker + an opaque payload. */
private[graft] final class TopKEntry(val score: Double, val tie: Long, val payload: Any)

/** Bounded-heap buffer keeping the k best entries seen so far. */
private[graft] final class TopKBuffer(k: Int, ascending: Boolean) {
  // `better(a, b)` — should a rank above b in the final result?
  @inline def better(s1: Double, t1: Long, s2: Double, t2: Long): Boolean =
    if (s1 != s2) { if (ascending) s1 < s2 else s1 > s2 } else t1 < t2

  // heap with the WORST retained entry at the root, so inserts are O(log k)
  private val heap = new java.util.PriorityQueue[TopKEntry](
    math.max(k, 1),
    (a: TopKEntry, b: TopKEntry) =>
      if (better(a.score, a.tie, b.score, b.tie)) 1
      else if (better(b.score, b.tie, a.score, a.tie)) -1
      else 0)

  def insert(score: Double, tie: Long, payload: => Any): Unit = {
    if (heap.size() < k) heap.add(new TopKEntry(score, tie, payload))
    else {
      val worst = heap.peek()
      if (better(score, tie, worst.score, worst.tie)) {
        heap.poll()
        heap.add(new TopKEntry(score, tie, payload))
      }
    }
  }

  def size: Int = heap.size()
  def iterator: java.util.Iterator[TopKEntry] = heap.iterator()

  /** Entries best-first. */
  def sorted: Array[TopKEntry] = {
    val arr = heap.toArray(new Array[TopKEntry](heap.size()))
    java.util.Arrays.sort(arr, (a: TopKEntry, b: TopKEntry) =>
      if (better(a.score, a.tie, b.score, b.tie)) -1
      else if (better(b.score, b.tie, a.score, a.tie)) 1
      else 0)
    arr
  }
}

/** `top_k(score, tie, payload)` — collects the k best (score, payload)
  * pairs per group into `array<struct<score double, payload P>>`,
  * best-first. Deterministic: ties broken by the long `tie` column
  * (ascending), so results are stable across partitionings.
  *
  * This is the scale-critical primitive behind ANN search
  * (reference: per-segment topk reduce, internal/core/src/segcore/reduce/
  * Reduce.cpp + querynodev2/segments/result.go:43): as a
  * TypedImperativeAggregate it gets Spark's partial aggregation, so each
  * map task ships at most k rows per group to the shuffle instead of its
  * whole scored partition — a per-query window (`row_number() <= k`)
  * would funnel the entire 100 TB scored scan through nq reducers.
  */
case class TopKAgg(
    score: Expression,
    tie: Expression,
    payload: Expression,
    k: Int,
    ascending: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, tie, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k"

  private lazy val resultElementType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("payload", payload.dataType, payload.nullable)))

  override def dataType: DataType = ArrayType(resultElementType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"top_k score must be double, got ${score.dataType.sql}")
    else if (tie.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"top_k tiebreak must be bigint, got ${tie.dataType.sql}")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"top_k k must be positive, got $k")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k, ascending)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val t = tie.eval(input)
    if (s != null && t != null) {
      // payload copied lazily — only when the entry is actually retained
      buffer.insert(
        s.asInstanceOf[Double],
        t.asInstanceOf[Long],
        InternalRow.copyValue(payload.eval(input)))
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.iterator
    while (it.hasNext) {
      val e = it.next()
      buffer.insert(e.score, e.tie, e.payload)
    }
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val arr = buffer.sorted
    val rows = new Array[Any](arr.length)
    var i = 0
    while (i < arr.length) {
      rows(i) = new GenericInternalRow(Array[Any](arr(i).score, arr(i).payload))
      i += 1
    }
    new GenericArrayData(rows)
  }

  @transient private lazy val serProj =
    UnsafeProjection.create(Array[DataType](DoubleType, LongType, payload.dataType))

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    val it = buffer.iterator
    val scratch = new GenericInternalRow(3)
    while (it.hasNext) {
      val e = it.next()
      scratch.update(0, e.score)
      scratch.update(1, e.tie)
      scratch.update(2, e.payload)
      val row = serProj(scratch)
      out.writeInt(row.getSizeInBytes)
      row.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buffer = new TopKBuffer(k, ascending)
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val row = new UnsafeRow(3)
      row.pointTo(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + in.position(), len)
      in.position(in.position() + len)
      buffer.insert(
        row.getDouble(0), row.getLong(1),
        InternalRow.copyValue(row.get(2, payload.dataType)))
      i += 1
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), tie = newChildren(1), payload = newChildren(2))
}

object TopKFunctions {
  /** Column API: `top_k(score, tie, payload, k, ascending)`. */
  def top_k(score: Column, tie: Column, payload: Column, k: Int, ascending: Boolean): Column =
    ExpressionUtils.column(
      TopKAgg(
        ExpressionUtils.expression(score),
        ExpressionUtils.expression(tie),
        ExpressionUtils.expression(payload),
        k, ascending).toAggregateExpression())

  /** Deterministic long tiebreaker for an id column of any type:
    * integral ids order naturally (ascending id — the reference's tie
    * rule); other PK types (the reference supports VarChar PKs) hash via
    * `xxhash64`, which is deterministic across partitionings but not
    * lexicographic. Never `cast("long")` on strings — that throws under
    * ANSI mode (Spark 4 default) and yields null otherwise, silently
    * dropping tied rows from the heap.
    */
  def tieFor(idValue: Column, idType: DataType): Column = idType match {
    case ByteType | ShortType | IntegerType | LongType => idValue.cast(LongType)
    case _ => org.apache.spark.sql.functions.xxhash64(idValue)
  }
}
