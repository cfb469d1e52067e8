package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityModel
import graft.sources.Tables

class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = {
    Tables.register(spark, TestSpark.sfDir)
    spark.table("documents")
  }

  // the distillation seed: learn the hand-written composite rule
  private def seed =
    graft.functions.TextFunctions.qualityScore(col("text")) >= 0.72

  private lazy val model = QualityModel.train(docs, col("text"), seed, col("doc_id"))

  test("trained filter distills the hand rule well above chance") {
    val scored = QualityModel.scoreAll(docs, col("text"), model)
      .withColumn("label", seed)
    val n = scored.count().toDouble
    val correct = scored.filter(col("pred") === col("label")).count()
    val pos = docs.filter(seed).count().toDouble
    val majority = math.max(pos, n - pos) / n
    val acc = correct / n
    // must beat always-guess-majority by a real margin
    assert(acc >= math.min(0.95, majority + 0.1),
      s"accuracy $acc vs majority baseline $majority")
  }

  test("score is the plain dot product of the captured model") {
    val cols = QualityModel.score(col("text"), model).as("z") +:
      QualityModel.features(col("text")).map(_._2)
    val row = docs.select(cols: _*).limit(20).collect()
    row.foreach { r =>
      val feats = (1 until r.length).map(r.getDouble)
      val manual = model.weights.zip(feats)
        .foldLeft(model.intercept) { case (acc, (w, f)) => acc + w * f }
      assert(r.getDouble(0) === manual)
    }
  }

  test("corpus scoring is a shuffle-free scan-stage projection") {
    val plan = QualityModel.scoreAll(docs, col("text"), model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("model shape is guarded") {
    intercept[IllegalArgumentException](
      QualityModel.Model(0.0, Seq(1.0, 2.0)))
  }
}
