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
}
