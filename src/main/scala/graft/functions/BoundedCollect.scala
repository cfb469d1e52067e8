package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge.{toColumn, toExpression}
import org.apache.spark.sql.types._

/** Bounded "keep the `max` elements with the SMALLEST long key"
  * collection aggregate — the memory-safe replacement for
  * `collect_list` under the dedup bucket builders.
  *
  * `collect_list` materializes the ENTIRE group in one aggregation
  * buffer before any downstream cap can truncate it; for the degenerate
  * hot buckets the caps exist to guard (thousands to millions of docs
  * colliding on one band key), a single group's array had to fit
  * executor memory. This aggregate enforces the cap INSIDE the
  * aggregation buffer: the buffer never holds more than 2·max elements
  * (compacted back to `max` by a sort whenever it fills — amortized
  * O(log max) per row), partial buffers ship at most `max` elements,
  * and the merge is bounded the same way. A pathological bucket now
  * costs O(max) memory instead of O(bucket).
  *
  * Semantics: exactly `array_sort(collect_list(e))` truncated to its
  * `max` smallest elements by key, where the key is the element itself
  * (LONG child) or the tuple of its LEADING LONG FIELDS compared
  * lexicographically (STRUCT child — the key prefix ends at the first
  * non-LONG field) — i.e. the same retained set as the pair
  * generators' sort-by-doc_id + truncate cap
  * ([[VectorFunctions.CappedPairs]] etc.), computed without ever
  * materializing the uncapped bucket. Output order is ascending by
  * key. The long-prefix key is assumed unique and non-null within a
  * group (true for every dedup bucket: a doc posts at most once per
  * band key, and priority-tagged callers put the unique doc_id right
  * after the tag); with fully-duplicate keys the retained payloads
  * among ties are arrival-order-dependent.
  */
case class BoundedMinCollect(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinCollect.Buf]
  with UnaryLike[Expression] {
  require(max >= 1, "bounded_min_collect needs max >= 1")

  // runs post-analysis (the Column API hands us unresolved attributes,
  // so the constructor cannot look at child.dataType)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case s: StructType if s.nonEmpty && s.head.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "bounded_min_collect needs a LONG or struct<long, ...> child, " +
            s"got $other")
    }

  override def dataType: DataType =
    ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_min_collect"

  @transient private lazy val copyOf: Any => Any = child.dataType match {
    case _: StructType => a => a.asInstanceOf[InternalRow].copy()
    case _ => identity
  }
  @transient private lazy val cmp: java.util.Comparator[Any] =
    child.dataType match {
      case LongType =>
        (a: Any, b: Any) =>
          java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long])
      case s: StructType =>
        // lexicographic over the leading run of LONG fields, so a
        // (pri, doc_id, …) key breaks pri ties deterministically by
        // doc_id instead of by arrival order
        val keyLen = s.fields.iterator.takeWhile(_.dataType == LongType).size
        (a: Any, b: Any) => {
          val ra = a.asInstanceOf[InternalRow]
          val rb = b.asInstanceOf[InternalRow]
          var i = 0
          var c = 0
          while (c == 0 && i < keyLen) {
            c = java.lang.Long.compare(ra.getLong(i), rb.getLong(i))
            i += 1
          }
          c
        }
    }
  @transient private lazy val proj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))
  @transient private lazy val wrapper = new GenericInternalRow(1)

  override def createAggregationBuffer(): BoundedMinCollect.Buf =
    new BoundedMinCollect.Buf

  /** Sort by key and truncate to the `max` smallest. */
  private def compact(buf: BoundedMinCollect.Buf): Unit =
    if (buf.elems.size > max) {
      val arr = buf.elems.toArray
      java.util.Arrays.sort(arr, cmp)
      buf.elems.clear()
      var i = 0
      while (i < max) { buf.elems.add(arr(i)); i += 1 }
    }

  override def update(
      buf: BoundedMinCollect.Buf, input: InternalRow): BoundedMinCollect.Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf.elems.add(copyOf(v))
      if (buf.elems.size > 2 * max) compact(buf)
    }
    buf
  }

  override def merge(
      buf: BoundedMinCollect.Buf,
      other: BoundedMinCollect.Buf): BoundedMinCollect.Buf = {
    buf.elems.addAll(other.elems)
    if (buf.elems.size > 2 * max) compact(buf)
    buf
  }

  override def eval(buf: BoundedMinCollect.Buf): Any = {
    compact(buf)
    val arr = buf.elems.toArray
    java.util.Arrays.sort(arr, cmp)
    new GenericArrayData(arr)
  }

  override def serialize(buf: BoundedMinCollect.Buf): Array[Byte] = {
    compact(buf) // partial buffers ship at most `max` elements
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.elems.size)
    val it = buf.elems.iterator()
    while (it.hasNext) {
      wrapper.update(0, it.next())
      val ur = proj(wrapper)
      out.writeInt(ur.getSizeInBytes)
      ur.writeToStream(out, null)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinCollect.Buf = {
    val buf = new BoundedMinCollect.Buf
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val ur = new UnsafeRow(1)
      ur.pointTo(rowBytes, len)
      // the UnsafeRow view is backed by this element's private byte
      // array, so retaining it without a copy is safe
      buf.elems.add(ur.get(0, child.dataType))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedMinCollect =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedMinCollect =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BoundedMinCollect {
  /** Mutable aggregation buffer: a plain growable list, compacted back
    * to the `max` smallest whenever it exceeds 2·max. */
  final class Buf {
    val elems = new java.util.ArrayList[Any]()
  }

  /** Column-level API. */
  def bounded_min_collect(e: Column, max: Int): Column =
    toColumn(BoundedMinCollect(toExpression(e), max).toAggregateExpression())
}
