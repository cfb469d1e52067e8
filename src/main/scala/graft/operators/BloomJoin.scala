package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge.{toColumn, toExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pre-filtering: the runtime row-level filter a
  * 100 TB fact-dim join wants. A shuffled (or even broadcast) join of a
  * selective dim against a huge fact first pays the FULL fact scan and,
  * for a shuffle join, the full fact shuffle — even though most fact
  * rows match nothing. Building a Bloom filter over the dim keys (one
  * skinny distributed aggregate; the filter itself is KB–MB and
  * driver-safe by construction, like an IVF centroid model) and
  * applying `might_contain` INSIDE the fact scan stage drops
  * non-matching rows before they are shuffled: false positives are
  * eliminated by the exact join that follows, false negatives are
  * impossible, so the result is exactly the plain join at a fraction
  * of the shuffled bytes. This is the hand-rolled form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` injection, exposed as an
  * explicit operator so a pipeline can build the filter ONCE and reuse
  * it across many fact scans.
  */
object BloomJoin {

  /** `might_contain(key)` against a broadcast Bloom filter — evaluated
    * inside the scan stage (a custom Catalyst expression, no UDF
    * boxing). Null keys are not contained (the exact join would drop
    * them anyway). */
  case class BloomMightContain(child: Expression,
      filter: Broadcast[BloomFilter]) extends UnaryExpression {
    override def dataType: DataType = BooleanType

    override def nullSafeEval(v: Any): Any =
      java.lang.Boolean.valueOf(
        filter.value.mightContainLong(v.asInstanceOf[Long]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
        : ExprCode = {
      val expr = ctx.addReferenceObj("bloomContain", this,
        classOf[BloomMightContain].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = $expr.mightContain((long) $v);")
    }

    /** Codegen entry point (reference-object call). */
    def mightContain(v: Long): Boolean = filter.value.mightContainLong(v)

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def bloom_might_contain(key: Column,
      filter: Broadcast[BloomFilter]): Column =
    toColumn(BloomMightContain(toExpression(key), filter))

  /** Build a Bloom filter over `dim`'s (long) join keys. Exactly one
    * skinny job: a distributed BloomFilter aggregate over the key
    * column merged on the driver — the same bounded-model shape as
    * sampled IVF centroids. `expectedItems` sizes the filter; pass the
    * dim's known/estimated cardinality at scale (a count() here would
    * be a second job, and overestimating only costs filter bits). */
  def buildKeyFilter(dim: DataFrame, key: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): BloomFilter =
    // stat.bloomFilter NPEs on an empty input (the underlying aggregate
    // yields null); an empty dim means a reject-everything filter —
    // exactly what a fresh (nothing-inserted) BloomFilter is. The
    // isEmpty probe is a limit-1 job: it early-exits on the first dim
    // row, so the common case costs one task.
    if (dim.select(key).isEmpty) BloomFilter.create(64L, fpp)
    else dim.stat.bloomFilter(key, math.max(expectedItems, 64L), fpp)

  /** Equi-join `fact ⋈ dim` with the fact side pre-filtered by a Bloom
    * filter of the dim keys inside the scan stage. Result ≡ the plain
    * inner join (no false negatives; false positives die in the exact
    * join) — only the shuffled/joined fact volume changes. */
  def prefilteredEquiJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val bf = buildKeyFilter(dim, dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    fact.filter(bloom_might_contain(fact(factKey), bc))
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
