package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg
import graft.sources.Tables

class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = {
    Tables.register(spark, TestSpark.sfDir)
    spark.table("documents")
  }

  test("merged state equals a cold recompute, epoch after epoch") {
    val dir = s"/tmp/graft-aggstate-spec-${java.util.UUID.randomUUID()}"
    // epoch 0: two thirds of the corpus
    val e0 = docs.filter(col("doc_id") % 3 =!= 0)
    val e1 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
    val e2 = docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 =!= 0)
    IncrementalAgg.writeState(e0, dir)
    // fold epoch 1, persist, fold epoch 2 on top of the merged state
    IncrementalAgg.mergeIncrement(spark, dir, e1)
      .write.mode("overwrite").parquet(s"$dir-2")
    val merged = IncrementalAgg.mergeIncrement(spark, s"$dir-2", e2)
    val cold = IncrementalAgg.docStats(docs)
    assert(merged.exceptAll(cold).count() === 0L &&
      cold.exceptAll(merged).count() === 0L)
  }

  test("sketch state: merged estimate equals the cold sketch, and " +
      "cross-epoch duplicates are absorbed") {
    val dir = s"/tmp/graft-aggstate-spec-${java.util.UUID.randomUUID()}"
    val hist = docs.filter(col("doc_id") % 3 =!= 0)
    val inc = docs.filter(col("doc_id") % 3 === 0)
    IncrementalAgg.writeDistinctState(hist, dir)
    def estimates(df: org.apache.spark.sql.DataFrame) = df
      .select(col("source"),
        hll_sketch_estimate(col("fp_sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = estimates(
      IncrementalAgg.mergeDistinctIncrement(spark, dir, inc))
    val cold = estimates(IncrementalAgg.distinctState(docs))
    assert(merged === cold)
    // replaying an epoch that is entirely historical must not move
    // the estimate — union absorbs duplicates, counts would not
    val replay = estimates(IncrementalAgg.mergeDistinctIncrement(
      spark, dir, hist.limit(50)))
    val histOnly = estimates(IncrementalAgg.distinctState(hist))
    replay.foreach { case (src, est) => assert(est === histOnly(src)) }
  }

  test("the merge never rescans historical documents") {
    val dir = s"/tmp/graft-aggstate-spec-${java.util.UUID.randomUUID()}"
    IncrementalAgg.writeState(docs.filter(col("doc_id") % 2 === 0), dir)
    val plan = IncrementalAgg.mergeIncrement(spark, dir,
        docs.filter(col("doc_id") % 2 =!= 0))
      .queryExecution.executedPlan.toString
    // exactly one scan of the documents table (the increment); the
    // historical side enters via the state parquet only
    assert("documents\\.parquet".r.findAllIn(plan).size === 1, plan)
  }

  test("histogram state: two-epoch merge equals the cold histogram, " +
      "and quantile estimates bound the exact rank value") {
    val dir = s"/tmp/graft-aggstate-spec-${java.util.UUID.randomUUID()}"
    val e0 = docs.filter(col("doc_id") % 3 =!= 0)
    val e1 = docs.filter(col("doc_id") % 3 === 0)
    IncrementalAgg.writeHistState(e0, dir)
    val merged = IncrementalAgg.mergeHistIncrement(spark, dir, e1)
    val cold = IncrementalAgg.histState(docs)
    assert(merged.exceptAll(cold).count() === 0L &&
      cold.exceptAll(merged).count() === 0L)
    // the p-quantile estimate's bin must contain the exact rank value:
    // bin_upper − width ≤ exact < bin_upper, for every source and p
    val est = IncrementalAgg.histQuantiles(merged, 16, Seq(5000, 9500))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3))).toMap
    import graft.functions.TextFunctions
    val exact = docs
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    exact.foreach { case (src, vs) =>
      val (p50u, p95u) = est(src)
      def rank(pbp: Long) = vs(((pbp * vs.size + 9999) / 10000 - 1).toInt)
      assert(rank(5000) >= p50u - 16 && rank(5000) < p50u, src)
      assert(rank(9500) >= p95u - 16 && rank(9500) < p95u, src)
    }
  }

  test("histogram quantile guards reject bad bins and probabilities") {
    intercept[IllegalArgumentException] {
      IncrementalAgg.histState(docs, binWidth = 0)
    }
    intercept[IllegalArgumentException] {
      IncrementalAgg.histQuantiles(IncrementalAgg.histState(docs), 16,
        Seq(0))
    }
  }
}
