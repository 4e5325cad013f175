package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{
  Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MISRA–GRIES heavy hitters — bounded-state frequent-items summary, the
  * 100 TB replacement for `GROUP BY item ORDER BY count(*) DESC LIMIT m`
  * when the item domain (tokens, URLs, user ids) is too wide for an
  * exact count's vocabulary-sized hash-aggregate state.
  *
  * The summary keeps at most k counters. An incoming item increments its
  * counter (or claims a free one); when k+1 counters would exist, the
  * (k+1)-th largest counter value is subtracted from ALL counters and
  * non-positive ones are dropped — the "mergeable summaries" formulation
  * (Agarwal et al., PODS 2012), whose merge (sum counter maps, then the
  * same subtract-and-drop) keeps the total subtraction across ANY merge
  * tree bounded by n/(k+1). Guarantees, with cnt the surviving counter
  * and err the buffer's accumulated subtraction:
  *
  *   cnt ≤ true_count ≤ cnt + err,   err ≤ n/(k+1)
  *
  * so every item with true_count > n/(k+1) is PRESENT in the summary.
  *
  * Scale shape: partial (map-side) state is k counters per group
  * regardless of item cardinality, the exchange carries ≤ k rows per
  * (partition × group), and the final merge is counter-map addition —
  * state O(k), shuffle O(k·groups), never O(distinct items). The same
  * composition as the Count-Min pass (Sketches.cmsTopTokenEstimates):
  * sketch to find candidates cheaply, exact pass restricted to them.
  *
  * Output: array of struct(item, cnt, ub) — lower/upper count bounds —
  * sorted (cnt desc, item asc); NULL items are ignored. reference scope
  * note: no analog in the reference engine — beyond-reference pipeline
  * suite (SURVEY §2.3 aggregations row).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries.Buf] {

  require(k >= 1, s"k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (MisraGries.atomic(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an atomic input type, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): MisraGries.Buf = new MisraGries.Buf

  override def update(buf: MisraGries.Buf, input: InternalRow): MisraGries.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val key = v match {
        case s: UTF8String => s.clone() // eval may return re-used memory
        case x => x
      }
      buf.m.update(key, buf.m.getOrElse(key, 0L) + 1L)
      if (buf.m.size > k) MisraGries.shrink(buf, k)
    }
    buf
  }

  override def merge(buf: MisraGries.Buf, other: MisraGries.Buf): MisraGries.Buf =
    MisraGries.mergeInto(buf, other, k)

  override def eval(buf: MisraGries.Buf): Any = MisraGries.evalSorted(buf, child.dataType)

  override def serialize(buf: MisraGries.Buf): Array[Byte] =
    MisraGries.write(buf, child.dataType)

  override def deserialize(bytes: Array[Byte]): MisraGries.Buf =
    MisraGries.read(bytes, child.dataType)

  override def dataType: DataType = MisraGries.outputType(child.dataType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGries {

  /** counter map + accumulated subtraction (the summary's error bound) */
  final class Buf {
    val m: mutable.HashMap[Any, Long] = mutable.HashMap.empty
    var err: Long = 0L
  }

  /** orderable scalar — no nested types as counter keys */
  private[functions] def atomic(dt: DataType): Boolean = dt match {
    case _: StructType | _: ArrayType | _: MapType | _: BinaryType => false
    case other => org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(other)
  }

  def outputType(itemType: DataType): DataType = ArrayType(StructType(Seq(
    StructField("item", itemType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  /** subtract the (k+1)-th largest counter from all, drop non-positive;
    * leaves ≤ k counters (only values strictly above the pivot survive) */
  private[functions] def shrink(buf: Buf, k: Int): Unit = {
    if (buf.m.size <= k) return
    // (k+1)-th largest counter; on the update path size == k+1, where
    // that is simply the min — no sort in the per-row hot path
    val pivot =
      if (buf.m.size == k + 1) buf.m.values.min
      else {
        val vals = buf.m.values.toArray
        java.util.Arrays.sort(vals)
        vals(vals.length - 1 - k)
      }
    buf.err += pivot
    buf.m.filterInPlace((_, c) => c > pivot)
    buf.m.mapValuesInPlace((_, c) => c - pivot)
  }

  private[functions] def mergeInto(buf: Buf, other: Buf, k: Int): Buf = {
    other.m.foreach { case (key, c) =>
      buf.m.update(key, buf.m.getOrElse(key, 0L) + c)
    }
    buf.err += other.err
    if (buf.m.size > k) shrink(buf, k)
    buf
  }

  private[functions] def evalSorted(buf: Buf, itemType: DataType): GenericArrayData = {
    val itemOrd = TypeUtils.getInterpretedOrdering(itemType)
    val rows = buf.m.toArray
      .sortWith { case ((ia, ca), (ib, cb)) =>
        if (ca != cb) ca > cb else itemOrd.compare(ia, ib) < 0
      }
      .map { case (item, cnt) =>
        new GenericInternalRow(Array[Any](item, cnt, cnt + buf.err)): Any
      }
    new GenericArrayData(rows)
  }

  private def entryType(itemType: DataType): StructType = StructType(Seq(
    StructField("item", itemType), StructField("cnt", LongType)))

  private[functions] def write(buf: Buf, itemType: DataType): Array[Byte] = {
    val proj = UnsafeProjection.create(entryType(itemType))
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.err)
    out.writeInt(buf.m.size)
    val row = new GenericInternalRow(2)
    buf.m.foreach { case (item, cnt) =>
      row.update(0, item); row.update(1, cnt)
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      u.writeToStream(out, new Array[Byte](4096))
    }
    out.flush()
    bos.toByteArray
  }

  private[functions] def read(bytes: Array[Byte], itemType: DataType): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new Buf
    buf.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(2)
      row.pointTo(arr, len)
      buf.m.update(row.get(0, itemType), row.getLong(1))
      i += 1
    }
    buf
  }
}

/** Re-aggregation form of [[MisraGries]] for summary-over-summary passes
  * (incl. the incremental cache's merge stage): input rows carry stored
  * summary ARRAYS — struct(item, cnt, ub) with a uniform per-array
  * (ub − cnt) error — and merging is counter-map addition plus error
  * addition plus the same subtract-and-drop, the mergeable-summaries
  * operation. Same k, bounds contract, and output shape as the base
  * aggregate, so the state schema is a fixed point under merging. */
case class MisraGriesMerge(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries.Buf] {

  require(k >= 1, s"k=$k")

  private def itemType: DataType = child.dataType
    .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType].head.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 3 &&
        s(1).dataType == LongType && s(2).dataType == LongType &&
        MisraGries.atomic(s.head.dataType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<item,cnt,ub>>, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): MisraGries.Buf = new MisraGries.Buf

  override def update(buf: MisraGries.Buf, input: InternalRow): MisraGries.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val inc = new MisraGries.Buf
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 3)
        val item = row.get(0, itemType) match {
          case s: UTF8String => s.clone()
          case x => x
        }
        val cnt = row.getLong(1)
        if (i == 0) inc.err = row.getLong(2) - cnt // uniform per summary
        inc.m.update(item, inc.m.getOrElse(item, 0L) + cnt)
        i += 1
      }
      MisraGries.mergeInto(buf, inc, k)
    }
    buf
  }

  override def merge(buf: MisraGries.Buf, other: MisraGries.Buf): MisraGries.Buf =
    MisraGries.mergeInto(buf, other, k)

  override def eval(buf: MisraGries.Buf): Any = MisraGries.evalSorted(buf, itemType)

  override def serialize(buf: MisraGries.Buf): Array[Byte] =
    MisraGries.write(buf, itemType)

  override def deserialize(bytes: Array[Byte]): MisraGries.Buf =
    MisraGries.read(bytes, itemType)

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
