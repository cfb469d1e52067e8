package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing
import graft.sources.Tables

class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = {
    Tables.register(spark, TestSpark.sfDir)
    spark.table("documents")
  }

  test("manifest tiles each shard's token stream contiguously") {
    val m = Packing.packManifest(docs, seqLen = 128, nShards = 8)
    // re-derive each doc's start offset two ways: from the manifest's
    // (start_seq, offset_in_seq) and from the running sum of the
    // stream-ordered token counts — they must agree for every row
    val withStart = m.withColumn("start_off",
      col("start_seq") * 128 + col("offset_in_seq"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard")
      .orderBy(col("start_off"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bad = withStart
      .withColumn("prev_sum",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("prev_sum") =!= col("start_off"))
      .count()
    assert(bad === 0L)
  }

  test("span arithmetic: end_seq and offset bounds hold for every doc") {
    val m = Packing.packManifest(docs, seqLen = 128, nShards = 8)
    val bad = m.filter(
      col("offset_in_seq") < 0 || col("offset_in_seq") >= 128 ||
      col("start_seq") > col("end_seq") ||
      col("end_seq") =!=
        expr("(start_seq * 128 + offset_in_seq + n_tokens - 1) div 128"))
      .count()
    assert(bad === 0L)
  }

  test("manifest is invariant to input partitioning") {
    val a = Packing.packManifest(docs, seqLen = 64, nShards = 4)
    val b = Packing.packManifest(docs.repartition(7), seqLen = 64, nShards = 4)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("sequence index covers every sequence number with no gaps") {
    val m = Packing.packManifest(docs, seqLen = 128, nShards = 8)
    val idx = Packing.sequenceIndex(m).cache()
    try {
      // the stream is contiguous, so shard s must contain sequences
      // 0..max(end_seq) with >= 1 doc each
      val perShard = idx.groupBy("shard")
        .agg(count(lit(1)).as("n_seqs"), max(col("seq")).as("max_seq"),
          min(col("seq")).as("min_seq"), min(col("n_docs")).as("min_docs"))
        .collect()
      assert(perShard.nonEmpty)
      perShard.foreach { r =>
        assert(r.getAs[Long]("min_seq") === 0L)
        assert(r.getAs[Long]("n_seqs") === r.getAs[Long]("max_seq") + 1)
        assert(r.getAs[Long]("min_docs") >= 1L)
      }
    } finally idx.unpersist()
  }

  test("total token mass is conserved shard by shard") {
    val m = Packing.packManifest(docs, seqLen = 128, nShards = 8).cache()
    try {
      val streamTotals = m.groupBy("shard")
        .agg(sum("n_tokens").as("total"),
          max(col("start_seq") * 128 + col("offset_in_seq")
            + col("n_tokens")).as("max_end_off"))
        .filter(col("total") =!= col("max_end_off")).count()
      assert(streamTotals === 0L)
    } finally m.unpersist()
  }

  test("argument guards reject degenerate parameters") {
    intercept[IllegalArgumentException](
      Packing.packManifest(docs, seqLen = 0, nShards = 8))
    intercept[IllegalArgumentException](
      Packing.packManifest(docs, seqLen = 128, nShards = 0))
  }
}
