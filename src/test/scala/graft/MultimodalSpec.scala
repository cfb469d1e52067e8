package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world content", "imgsrc"),
    (2L, "other longer content with many more bytes in it", "audsrc"))
    .toDF("doc_id", "text", "source")

  test("asMedia produces binary payload + typed media_type") {
    val m = Multimodal.asMedia(docs)
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("payload") === "binary")
    val r = m.orderBy("doc_id").collect()
    assert(new String(r(0).getAs[Array[Byte]]("payload"), "UTF-8")
      === "hello world content")
    assert(r(0).getString(1) === "media/imgsrc")
  }

  test("stub decode is deterministic and partition-mapped (no shuffle)") {
    val m = Multimodal.asMedia(docs)
    val d1 = Multimodal.decodeMeta(spark, m).orderBy("doc_id").collect()
    val d2 = Multimodal.decodeMeta(spark, m).orderBy("doc_id").collect()
    assert(d1.toSeq === d2.toSeq)
    assert(d1.forall(r => r.width >= 64 && r.height >= 64 &&
      r.channels >= 1 && r.channels <= 4))
    val plan = Multimodal.decodeMeta(spark, m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("feature extraction emits fixed-size float vectors") {
    val f = Multimodal.extractFeatures(spark, Multimodal.asMedia(docs))
      .collect()
    assert(f.forall(_.feature.length === 8))
    assert(f.forall(_.feature.forall(v => v >= -1f && v <= 1f)))
  }

  test("frame sampling emits every k-th fixed-size chunk") {
    val big = Seq((1L, "x" * 2048, "vid")).toDF("doc_id", "text", "source")
    val frames = Multimodal.sampleFrames(spark, Multimodal.asMedia(big),
      frameSize = 256, everyK = 2).collect()
    // 2048/256 = 8 frames, every 2nd → 4
    assert(frames.length === 4)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 2, 4, 6))
    assert(frames.forall(_.frame_bytes.length === 256))
  }

  test("extracted features compose with the ANN similarity operators") {
    // multimodal → similarity: stubbed feature vectors feed directly
    // into the cosine top-k path (schema compatibility is the contract)
    Tables.register(spark, TestSpark.sfDir)
    val media = Multimodal.asMedia(
      spark.table("documents").limit(50))
    val feats = Multimodal.extractFeatures(spark, media)
      .toDF("vec_id", "embedding")
    val q = feats.filter(col("vec_id") === feats.first().getLong(0))
    val nn = graft.operators.Similarity.bruteForceTopK(feats, q, k = 5)
      .collect()
    assert(nn.length === 5)
    assert(nn.forall(r => r.getDouble(2) <= 1.0 + 1e-9))
  }

  test("pipeline stats aggregates per media type") {
    val r = Multimodal.pipelineStats(spark, docs).collect()
    assert(r.length === 2)
    assert(r.map(_.getLong(1)).sum === 2)
  }
}
