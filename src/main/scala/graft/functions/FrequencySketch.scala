package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.bridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a Spark aggregate — the
  * bounded-memory half of a two-pass exact heavy-hitters pipeline
  * (see [[graft.operators.HeavyHitters]]).
  *
  * The summary keeps at most `capacity` counters. Guarantee (Misra &
  * Gries '82; mergeability per Agarwal et al., "Mergeable Summaries",
  * PODS'12): every counter undercounts its item by at most
  * N/(capacity+1) over N processed items, and any item with true
  * frequency above that bound IS present in the summary — merges
  * (sum counters, then subtract the (capacity+1)-largest value and
  * drop non-positive) preserve the bound. So the sketch never misses
  * a sufficiently-frequent item; an exact second pass over just the
  * surviving candidates turns "approximate" into "provably exact
  * top-k" whenever the k-th frequency clears the bound.
  *
  * Memory is O(capacity) per aggregation buffer at every stage —
  * partial, shuffle, merge — regardless of vocabulary size. That is
  * the 100 TB contract: token frequency over a corpus whose
  * vocabulary would OOM a plain groupBy fits in a few KB per task.
  */
case class MisraGriesSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesSketch.Buf]
  with UnaryLike[Expression] {
  require(capacity >= 1, "misra_gries needs capacity >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"misra_gries needs a STRING child, got $other")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): MisraGriesSketch.Buf =
    new MisraGriesSketch.Buf

  override def update(
      buf: MisraGriesSketch.Buf, input: InternalRow): MisraGriesSketch.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      // presence via containsKey, NOT get-against-null: the map's
      // value type is a primitive Long, so `get` unboxes a missing
      // key's null to 0L and a null comparison is vacuous — that
      // exact bug once made every miss take the "seen" branch,
      // skipping the capacity gate and decrement step entirely, so
      // per-partition state grew with the partition's vocabulary
      // (exact counting: right answers on a test box, OOM at corpus
      // scale — the O(capacity) contract above is the whole point)
      if (buf.counts.containsKey(s)) buf.counts.put(s, buf.counts.get(s) + 1L)
      else if (buf.counts.size < capacity) buf.counts.put(s, 1L)
      else {
        // decrement step: one "vote" of every counter is spent against
        // the unmatched item; zeroed counters free their slot
        val it = buf.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: MisraGriesSketch.Buf,
      other: MisraGriesSketch.Buf): MisraGriesSketch.Buf = {
    other.counts.forEach { (k, v) =>
      // same containsKey discipline as update() (primitive-Long map)
      buf.counts.put(k,
        if (buf.counts.containsKey(k)) buf.counts.get(k) + v else v)
    }
    if (buf.counts.size > capacity) {
      // shrink: subtract the (capacity+1)-th largest counter from all,
      // drop non-positive — the mergeable-summaries reduction
      val vals = new Array[Long](buf.counts.size)
      var i = 0
      buf.counts.forEach { (_, v) => vals(i) = v; i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1)
      val it = buf.counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: MisraGriesSketch.Buf): Any = {
    val arr = new Array[(String, Long)](buf.counts.size)
    var i = 0
    buf.counts.forEach { (k, v) => arr(i) = (k, v); i += 1 }
    // deterministic presentation: estimated count desc, item asc
    val sorted = arr.sortBy { case (k, v) => (-v, k) }
    new GenericArrayData(sorted.map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), v): Any
    })
  }

  override def serialize(buf: MisraGriesSketch.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.counts.size)
    // length-prefixed raw UTF-8, not writeUTF: a hostile "token" over
    // 64 KB would make writeUTF throw and fail the task
    buf.counts.forEach { (k, v) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(v)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesSketch.Buf = {
    val buf = new MisraGriesSketch.Buf
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counts.put(new String(kb, "UTF-8"), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MisraGriesSketch {
  /** Mutable aggregation buffer: item → surviving counter. */
  final class Buf {
    val counts = new java.util.HashMap[String, Long]()
  }

  def misra_gries(e: Column, capacity: Int): Column =
    toColumn(MisraGriesSketch(toExpression(e), capacity)
      .toAggregateExpression())
}
