package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftFunctions.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, Expression, InterpretedOrdering, NullsFirst, NullsLast, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-heap exact top-k aggregate — the map-side partial top-k of
  * [[graft.ops.TopK.topKPerGroup]].
  *
  * Why an aggregate and not a window: ANY window formulation of "top k per
  * group" (plain or salted two-phase) must first shuffle EVERY input row to
  * its (group[, salt]) partition and sort it there. This aggregate is a
  * [[TypedImperativeAggregate]], so Spark runs it with partial aggregation:
  * each map task keeps at most k rows per group in a bounded heap, and the
  * one exchange carries ≤ k · maps rows per group — shuffle volume bounded
  * by SURVIVORS, not input, and no per-task sort of the input at all
  * (round-6 verdict task: "phase-1 shuffle volume bounded by survivors").
  *
  * Input: a struct whose FIRST `numOrderFields` fields are the sort key
  * (direction per field in `ascending`, SQL default null ordering — asc ⇒
  * nulls first, desc ⇒ nulls last, matching `Column.asc`/`.desc`) and whose
  * remaining fields are payload. Result: the k smallest structs under that
  * ordering, as an array sorted best-first (element i has rank i + 1).
  * Comparison uses Catalyst's own [[InterpretedOrdering]], so null/NaN/
  * nested-type semantics are bit-identical to a window's Sort.
  */
final case class BoundedTopKAgg(
    child: Expression,
    k: Int,
    ascending: Seq[Boolean],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedTopKAgg.Buffer] with UnaryLike[Expression] {
  require(k > 0, s"k must be positive: $k")
  require(ascending.nonEmpty, "at least one order field")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** Rank ordering over the leading order fields — SQL sort semantics. */
  @transient private lazy val ordering: InterpretedOrdering = {
    val fields = structType.fields
    require(ascending.length <= fields.length, "more directions than struct fields")
    val sortOrders = ascending.zipWithIndex.map { case (asc, i) =>
      val br = BoundReference(i, fields(i).dataType, fields(i).nullable)
      if (asc) SortOrder(br, Ascending, NullsFirst, Seq.empty)
      else SortOrder(br, Descending, NullsLast, Seq.empty)
    }
    new InterpretedOrdering(sortOrders)
  }

  @transient private lazy val rowProjection: UnsafeProjection =
    UnsafeProjection.create(structType)

  override def createAggregationBuffer(): BoundedTopKAgg.Buffer =
    new BoundedTopKAgg.Buffer(k, ordering)

  override def update(buffer: BoundedTopKAgg.Buffer, input: InternalRow): BoundedTopKAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[InternalRow], copyNeeded = true)
    buffer
  }

  override def merge(buffer: BoundedTopKAgg.Buffer, other: BoundedTopKAgg.Buffer): BoundedTopKAgg.Buffer = {
    other.foreach(r => buffer.insert(r, copyNeeded = false)) // deserialized rows are already private copies
    buffer
  }

  override def eval(buffer: BoundedTopKAgg.Buffer): Any =
    new GenericArrayData(buffer.sortedBestFirst().asInstanceOf[Array[Any]])

  override def serialize(buffer: BoundedTopKAgg.Buffer): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    val writeBuffer = new Array[Byte](4096) // for off-heap-backed rows
    buffer.foreach { r =>
      val unsafe = rowProjection(r) // projection output is reused; bytes copied below
      dos.writeInt(unsafe.getSizeInBytes)
      unsafe.writeToStream(out, writeBuffer)
    }
    dos.writeInt(-1)
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopKAgg.Buffer = {
    val buf = new BoundedTopKAgg.Buffer(k, ordering)
    val bb = ByteBuffer.wrap(bytes)
    val nFields = structType.length
    var size = bb.getInt
    while (size >= 0) {
      val rowBytes = new Array[Byte](size)
      bb.get(rowBytes)
      val row = new UnsafeRow(nFields)
      row.pointTo(rowBytes, size)
      buf.insert(row, copyNeeded = false)
      size = bb.getInt
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_top_k"
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedTopKAgg =
    copy(child = newChild)
}

object BoundedTopKAgg {

  /** Bounded max-heap keyed by the rank ordering: head = current worst kept
    * row; a candidate enters only by beating it. O(log k) per insert,
    * O(k) memory — never proportional to group size.
    */
  final class Buffer(k: Int, ordering: InterpretedOrdering) {
    private val heap = new java.util.PriorityQueue[InternalRow](
      math.min(k, 1024), (a: InternalRow, b: InternalRow) => ordering.compare(b, a))

    def insert(r: InternalRow, copyNeeded: Boolean): Unit =
      if (heap.size < k) heap.add(if (copyNeeded) r.copy() else r)
      else if (ordering.compare(r, heap.peek()) < 0) {
        heap.poll()
        heap.add(if (copyNeeded) r.copy() else r)
      }

    def foreach(f: InternalRow => Unit): Unit = heap.forEach(r => f(r))

    def sortedBestFirst(): Array[InternalRow] = {
      val arr = heap.toArray(new Array[InternalRow](heap.size))
      java.util.Arrays.sort(arr, (a: InternalRow, b: InternalRow) => ordering.compare(a, b))
      arr
    }
  }

  /** Column face: `bounded_top_k(struct, k, directions)` as an aggregate. */
  def topK(input: Column, k: Int, ascending: Seq[Boolean]): Column =
    column(BoundedTopKAgg(expression(input), k, ascending).toAggregateExpression())
}
