package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded-state per-group TOP-K aggregate — the 100 TB replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY o DESC) <= k`.
  *
  * The window form SHUFFLES AND SORTS EVERY ROW of the table to keep k
  * of them per group; this aggregate keeps a k-element min-heap per
  * group in the partial (map-side) stage, so the exchange carries at
  * most k rows per (partition × group) and the final merge unions
  * heaps — state O(k), shuffle O(k·groups), never O(rows). The same
  * shape DataFusion/Trino expose as `max_by(x, o, k)` / topN
  * accumulators.
  *
  * Input is a STRUCT column; rows are ranked by the struct's natural
  * (lexicographic, nulls-first) ordering and the LARGEST k survive,
  * returned sorted descending. Make the struct's trailing field(s) a
  * unique id for deterministic boundary ties — `struct(score, id)` —
  * exactly like any ORDER BY needs a tiebreak. NULL structs are
  * skipped (rank fields inside the struct may be null; they order
  * nulls-first, i.e. lose).
  *
  * reference scope note: the reference engine has no such accumulator —
  * this is part of the beyond-reference pipeline suite (SURVEY §2.3
  * sorts/limits row covers the global TakeOrderedAndProject; this is
  * the grouped form).
  */
case class BoundedTopK(
    child: Expression,
    k: Int,
    smallest: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k >= 1, s"k=$k")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  /** ranking order: with `smallest`, the SMALLEST k survive (bottom-k;
    * strings and other non-negatable fields can't be flipped by the
    * caller, so the flag lives here) and the output sorts ascending */
  @transient private lazy val structOrdering: Ordering[InternalRow] = {
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    val base = new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(a, b)
    }
    if (smallest) base.reverse else base
  }
  // PriorityQueue keeps the MAX on top under the given ordering; we need
  // cheap access to the SMALLEST kept row (the eviction candidate), so
  // reverse: head == current minimum of the kept k
  @transient private lazy val minFirst: Ordering[InternalRow] =
    structOrdering.reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](minFirst)

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[InternalRow].copy())
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow])
      : mutable.PriorityQueue[InternalRow] = {
    other.foreach(r => add(buf, r))
    buf
  }

  private def add(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(row)
    else if (structOrdering.compare(row, buf.head) > 0) {
      buf.dequeue(); buf.enqueue(row)
    }
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    val sortedDesc = buf.toArray.sorted(structOrdering).reverse
    new GenericArrayData(sortedDesc.map(r => r: Any))
  }

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(structType)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val u = proj(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    val nFields = structType.length
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(nFields)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String =
    if (smallest) "bounded_bottom_k" else "bounded_top_k"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Re-aggregation form of [[BoundedTopK]] for the incremental cache's
  * merge stage: input rows carry ARRAYS of ranked structs (stored top-k
  * state and/or single-element unit rows), and the union's largest k
  * survive — heap-union, the top-k state's merge operation. Same
  * ordering, bound, and output shape as the base aggregate, so the
  * state schema is a fixed point under merging. */
case class BoundedTopKMerge(
    child: Expression,
    k: Int,
    smallest: Boolean = false,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]] {

  require(k >= 1, s"k=$k")

  private def elemType: StructType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  @transient private lazy val structOrdering: Ordering[InternalRow] = {
    val ord = TypeUtils.getInterpretedOrdering(elemType)
    val base = new Ordering[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int =
        ord.compare(a, b)
    }
    if (smallest) base.reverse else base
  }
  @transient private lazy val minFirst: Ordering[InternalRow] =
    structOrdering.reverse

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](minFirst)

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val nf = elemType.length
      var i = 0
      while (i < arr.numElements()) {
        add(buf, arr.getStruct(i, nf).copy())
        i += 1
      }
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow])
      : mutable.PriorityQueue[InternalRow] = {
    other.foreach(r => add(buf, r))
    buf
  }

  private def add(buf: mutable.PriorityQueue[InternalRow],
      row: InternalRow): Unit = {
    if (buf.size < k) buf.enqueue(row)
    else if (structOrdering.compare(row, buf.head) > 0) {
      buf.dequeue(); buf.enqueue(row)
    }
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any = {
    val sortedDesc = buf.toArray.sorted(structOrdering).reverse
    new GenericArrayData(sortedDesc.map(r => r: Any))
  }

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val proj = UnsafeProjection.create(elemType)
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { r =>
      val u = proj(r)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    val nFields = elemType.length
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(nFields)
      row.pointTo(arr, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String =
    if (smallest) "bounded_bottom_k_merge" else "bounded_top_k_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopKMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopKMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
