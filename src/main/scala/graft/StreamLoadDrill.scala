package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sustained-throughput drill for the streaming operators — the
  * counterpart of [[ServiceLoadDrill]] for the unbounded surface. The
  * streaming twins are oracle-certified for CORRECTNESS (batch ≡
  * stream through the gate); this measures what a single box SUSTAINS:
  * events/sec through the real production transforms
  * ([[graft.streaming.EventsStream.windowedAgg]] — watermarked
  * tumbling aggregate — and
  * [[graft.streaming.EventsStream.sessionizeStateful]] — event-time
  * session state via flatMapGroupsWithState), fed by Spark's rate
  * source and sunk to noop, so generation and sink cost ~nothing and
  * the number is the operator's.
  *
  * For each requested rate: run, discard a warm-up window, then sample
  * `StreamingQueryProgress` over the measurement window and report
  * mean input/processed rows-per-second, trigger-execution p95, and
  * final state-store row count. processedRPS ≥ inputRPS ⇒ the rate is
  * sustained; processedRPS materially below inputRPS ⇒ past the knee
  * (the rate source keeps wall-clock schedule, so catch-up batches
  * grow). Dev tooling, not part of the library.
  *
  * Usage: StreamLoadDrill <window|session> <rate1,rate2,...>
  *        [measureSec] [warmSec] [users] [hdfs|rocksdb] [rowsPerBatch]
  * A non-zero rowsPerBatch switches the source to `rate-micro-batch`
  * (fixed-size, admission-controlled batches — required for big-state
  * wall tests; see rateEvents); `rate` then only names the throughput
  * target the `sustained` flag compares against.
  * The optional provider argument selects the state-store backend:
  * the default HDFSBackedStateStoreProvider keeps every state row on
  * the executor HEAP (the scale wall for big session universes — at
  * 100 TB the session count dwarfs executor memory), while `rocksdb`
  * selects Spark's RocksDB provider, whose state lives off-heap/on-disk
  * and bounds memory regardless of session count.
  * Emits one JSON line per rate. */
object StreamLoadDrill {

  /** Rate-source rows shaped as the events schema the transforms
    * expect: monotonically increasing event_id, wall-clock event time
    * (so the watermark advances naturally), `users`-bounded user_id,
    * 5 event types, deterministic value. */
  private def rateEvents(spark: SparkSession, rate: Long,
      users: Long, rowsPerBatch: Long): DataFrame =
    (if (rowsPerBatch > 0)
      // bounded batches: the wall-clock `rate` source admits unbounded
      // catch-up (a lagging batch makes the NEXT batch bigger —
      // runaway under a backend whose commit cost grows with batch
      // size), so big-state wall tests use rate-micro-batch, the
      // admission-controlled variant
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch.toString)
        .option("numPartitions", "32")
        .load()
    else
      spark.readStream.format("rate")
        .option("rowsPerSecond", rate.toString)
        .option("numPartitions", "32")
        .load())
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        (col("value") % users).as("user_id"),
        concat(lit("type_"), (col("value") % 5).cast("string"))
          .as("event_type"),
        ((col("value") % 1000L) / lit(100.0)).as("value"))

  def main(args: Array[String]): Unit = {
    val shape = args(0)
    val rates = args(1).split(",").map(_.trim.toLong)
    val measureSec = if (args.length > 2) args(2).toInt else 30
    val warmSec = if (args.length > 3) args(3).toInt else 15
    val users = if (args.length > 4) args(4).toLong else 100000L
    val provider = if (args.length > 5) args(5) else "hdfs"
    val rowsPerBatch = if (args.length > 6) args(6).toLong else 0L

    val spark = Engine.session()
    // recentProgress retains only the last N updates (default 100) —
    // at sub-second batches a 30 s window would silently average only
    // the TAIL (an early degradation evicted = a run that looks
    // healthy); retain enough for the longest measurement window
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "2000")
    if (provider == "rocksdb") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      // changelog checkpointing is the large-state production setting:
      // per-commit cost is the DELTA, not a full SST snapshot upload —
      // without it a 100 M-row fill re-ships ~the whole store every
      // batch and commit time dwarfs compute
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb." +
        "changelogCheckpointing.enabled", "true")
    }
    import java.nio.file.Files

    for (rate <- rates) {
      val src = rateEvents(spark, rate, users, rowsPerBatch)
      val (df, mode) = shape match {
        case "window" =>
          (graft.streaming.EventsStream.windowedAgg(src), "update")
        case "session" =>
          (graft.streaming.EventsStream.sessionizeStateful(spark, src)
            .toDF(), "append")
        case other => sys.error(s"unknown shape $other")
      }
      val ckpt = Files.createTempDirectory(s"stream_drill_$shape")
        .toString
      val q = df.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt).start()

      Thread.sleep(warmSec * 1000L)
      val warmBatch =
        Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
      Thread.sleep(measureSec * 1000L)

      val progs = q.recentProgress.filter(_.batchId > warmBatch)
        .filter(_.numInputRows > 0)
      // stop() interrupts the stream thread; progress is already held
      q.stop()

      if (progs.isEmpty) {
        println(s"""{"drill":"stream_load","shape":"$shape",""" +
          s""""rate":$rate,"error":"no progress sampled"}""")
      } else {
        val inRps = progs.map(_.inputRowsPerSecond).sum / progs.length
        val procRps =
          progs.map(_.processedRowsPerSecond).sum / progs.length
        // durationMs is a java.util.Map — get() on a progress sample
        // missing the key returns null and auto-unboxing NPEs, killing
        // the drill AFTER the measurement window; drop such samples.
        val trig = progs.flatMap(p =>
          Option(p.durationMs.get("triggerExecution")).map(_.toLong))
          .sorted
        val p95 = if (trig.isEmpty) -1L else trig(math.min(trig.length - 1,
          math.ceil(0.95 * trig.length).toInt - 1).max(0))
        val stateRows = progs.last.stateOperators.headOption
          .map(_.numRowsTotal).getOrElse(-1L)
        val rows = progs.map(_.numInputRows).sum
        // big-state fills degrade GRADUALLY (state grows every batch);
        // a windowed mean hides the trend, so emit a trail — every
        // ~20th batch's (batchId, trigger ms, state rows) — that shows
        // WHERE commit time starts growing
        val stride = math.max(1, progs.length / 30)
        val trail = progs.zipWithIndex
          .filter { case (_, k) => k % stride == 0 }
          .map { case (p, _) =>
            val t = Option(p.durationMs.get("triggerExecution"))
              .map(_.toLong).getOrElse(-1L)
            val sr = p.stateOperators.headOption
              .map(_.numRowsTotal).getOrElse(-1L)
            s"""[${p.batchId},$t,$sr]"""
          }.mkString("[", ",", "]")
        println(s"""{"drill":"stream_load_trail","shape":"$shape",""" +
          s""""rate":$rate,"trail_batch_ms_state":$trail}""")
        println(
          f"""{"drill":"stream_load","shape":"$shape",""" +
            f""""provider":"$provider","users":$users,"rate":$rate,""" +
            f""""batches":${progs.length},"rows":$rows,""" +
            // sustained = keeps up with the OFFERED load; measured
            // input_rps overshoots the requested rate while catch-up
            // batches drain the warm-up backlog, so comparing against
            // it would mislabel a keeping-up run
            f""""input_rps":$inRps%.0f,"processed_rps":$procRps%.0f,""" +
            f""""sustained":${procRps >= rate},""" +
            f""""trigger_p95_ms":$p95,"state_rows":$stateRows}""")
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
