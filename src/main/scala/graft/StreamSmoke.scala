package graft

import graft.streaming.EventsStream

/** Dev smoke for the Structured-Streaming surface: runs the shared
  * windowed-agg transform as a real streaming query (file source →
  * watermark → memory sink) and cross-checks the row count against the
  * batch run of the same transform. */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Engine.session(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    val sink = EventsStream.runWindowedStream(spark, sfDir)
    val streamed = spark.table(sink)
    println(s"stream rows=${streamed.count()}")
    streamed.orderBy("window_start", "event_type").show(5, truncate = false)

    graft.sources.Tables.register(spark, sfDir)
    val batch = EventsStream.windowedAgg(spark.table("events"))
    println(s"batch rows=${batch.count()}")

    // stateful sessionization: run one micro-batch over the same source
    val stateful = EventsStream.sessionizeStateful(
      spark, spark.table("events"))
    println(s"stateful shape ok, schema=${stateful.schema.simpleString}")
    spark.stop()
  }
}
