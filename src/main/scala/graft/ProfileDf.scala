package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Dev tool: gram document-frequency distribution of a corpus — sizes
  * the ngramJaccard stop-gram/prefix-ordering design. Not part of the
  * driver contract. */
object ProfileDf {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session()
    val docs = sources.Tables.load(spark, sfDir, "documents")
    val base = docs.select(col("doc_id"),
      char_ngram_set(normalize_text(col("text")), 8).as("gs"))
      .filter(col("gs").isNotNull)
    val df = base.select(explode(col("gs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
    val bands = df.select(
      when(col("df") === 1, "df=1").when(col("df") <= 4, "df=2-4")
        .when(col("df") <= 16, "df=5-16").when(col("df") <= 64, "17-64")
        .when(col("df") <= 1024, "65-1024").otherwise(">1024").as("band"))
      .groupBy("band").count().orderBy("band").collect()
    bands.foreach(r => println(s"[df] ${r.getString(0)}: ${r.getLong(1)}"))
    println("[df] pair mass by band (sum df*(df-1)/2):")
    df.select(
      when(col("df") <= 4, "df=2-4").when(col("df") <= 16, "df=5-16")
        .when(col("df") <= 64, "17-64").when(col("df") <= 1024, "65-1024")
        .otherwise(">1024").as("band"),
      (col("df") * (col("df") - 1) / 2).as("pm"))
      .filter(col("pm") > 0)
      .groupBy("band").agg(sum("pm").as("pairs")).orderBy("band")
      .collect()
      .foreach(r => println(s"[df] ${r.getString(0)}: ${r.get(1)}"))
    spark.stop()
  }
}
