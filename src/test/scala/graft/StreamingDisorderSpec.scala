package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventsStream

/** Out-of-order / late-event semantics, pinned against the DECLARED
  * contract (README "Streaming semantics"): a watermark of D means
  *   - disorder tolerance: any event with ts >= watermark is processed
  *     exactly as if it had arrived in order (lossless disorder);
  *   - lateness cutoff: any event with ts < watermark MAY be dropped,
  *     and in these aggregations IS dropped — it never updates a
  *     finalized window, never extends or resurrects a session, and
  *     never duplicates an already-emitted append-mode row.
  * The existing StreamingSpec pins the drop side for tumbling windows;
  * this spec pins the KEEP side (an out-of-order event inside the
  * tolerance must land) and both sides for session windows, where the
  * interesting late behavior is session MERGING: a bridging event
  * inside the tolerance must fuse two provisional sessions into one.
  */
class StreamingDisorderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("disorder within the watermark is lossless: an out-of-order " +
      "event older than max(ts) but newer than the watermark lands in " +
      "its (not yet finalized) window") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val agg = EventsStream.windowedAgg(in.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("spec_disorder_keep").start()
    try {
      // batch 1: events at minute 5 and 50 → watermark = 50 − 10 = 40,
      // window [0,1h) still open (60 > 40)
      in.addData((1L, ts(5), 7L, "click", 1.0, ""),
        (2L, ts(50), 7L, "click", 1.0, ""))
      q.processAllAvailable()
      // batch 2: minute 45 — OUT OF ORDER (< max seen 50) but inside
      // the tolerance (>= watermark 40): the declared contract says
      // this is indistinguishable from in-order arrival
      in.addData((3L, ts(45), 7L, "click", 1.0, ""))
      q.processAllAvailable()
      // batch 3: advance far past the watermark → [0,1h) finalizes
      in.addData((4L, ts(200), 7L, "click", 1.0, ""))
      q.processAllAvailable()
      val w0 = spark.table("spec_disorder_keep")
        .filter(col("window_start") === ts(0)).collect()
      assert(w0.length === 1, "window [0,1h) must emit exactly once")
      assert(w0(0).getLong(2) === 3L,
        "the in-tolerance disordered event must be counted (3 events)")
    } finally q.stop()
  }

  test("session windows: a late bridging event inside the tolerance " +
      "MERGES two provisional sessions; one beyond it is dropped and " +
      "cannot extend a closed session") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long)]
    // 30-minute gap sessions, 30-minute disorder tolerance
    val sessions = in.toDF().toDF("event_id", "ts", "user_id")
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("spec_disorder_sessions").start()
    try {
      // batch 1: user 8 at minutes 0 and 40 — two provisional sessions
      // [0,30) and [40,70); watermark = 40 − 30 = 10
      in.addData((1L, ts(0), 8L), (2L, ts(40), 8L))
      q.processAllAvailable()
      // batch 2: minute 20 — late (< max 40) but >= watermark 10:
      // bridges the 0↔40 gap (20−0 and 40−20 both < 30), so the two
      // provisional sessions must fuse into one [0, 70)
      in.addData((3L, ts(20), 8L))
      q.processAllAvailable()
      // batch 3: minute 500 pushes the watermark to 470 → the fused
      // session (end 70) finalizes and emits
      in.addData((4L, ts(500), 8L))
      q.processAllAvailable()
      val emitted = spark.table("spec_disorder_sessions")
        .filter(col("user_id") === 8L).collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(emitted.toSeq === Seq((ts(0), ts(70), 3L)),
        s"bridged session must emit once as [0,70)x3, got ${emitted.toSeq}")
      // batch 4: minute 60 — BEYOND the watermark (470): must be
      // dropped; it can neither resurrect the closed [0,70) session
      // nor emit a session of its own
      in.addData((5L, ts(60), 8L))
      q.processAllAvailable()
      // batch 5: close out everything that could still be in state
      in.addData((6L, ts(1000), 8L))
      q.processAllAvailable()
      val after = spark.table("spec_disorder_sessions")
        .filter(col("user_id") === 8L)
        .filter(col("session_start") < ts(400)).collect()
        .map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(after.toSeq === Seq((ts(0), ts(70), 3L)),
        s"too-late event must leave the closed session untouched and " +
          s"emit nothing, got ${after.toSeq}")
    } finally q.stop()
  }

  test("disorder-corpus equivalence: the windowed aggregate over a " +
      "shuffled-arrival replay equals the in-order replay on every " +
      "window the watermark finalized in both") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic disorder: 60 events over 3 hours, arrival order
    // scrambled by a fixed permutation whose displacement stays under
    // the 10-minute tolerance (xxhash-free: i*7 mod small window)
    val base = (0 until 60).map { i =>
      (i.toLong, ts(i * 3L), (i % 5).toLong, "click", 1.0, "")
    }
    // bounded-displacement shuffle: swap within blocks of 3 (≤ 6 min
    // displacement < 10 min watermark) — every event stays inside the
    // declared tolerance relative to the running max
    val disordered = base.grouped(3).flatMap(_.reverse).toSeq

    def run(events: Seq[(Long, Timestamp, Long, String, Double, String)],
        sink: String): Map[(Timestamp, String), (Long, Double)] = {
      val in = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
      val agg = EventsStream.windowedAgg(in.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props"))
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName(sink).start()
      try {
        // replay one event per micro-batch burst of 5 — forces many
        // watermark advances mid-stream
        events.grouped(5).foreach { g => in.addData(g); q.processAllAvailable() }
        // flush: advance event time far past everything
        in.addData((9999L, ts(100000), 0L, "click", 0.0, ""))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(sink).filter(col("window_start") < ts(5000)).collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
    }

    val inOrder = run(base, "spec_replay_inorder")
    val shuffled = run(disordered, "spec_replay_disordered")
    assert(inOrder === shuffled,
      "bounded-disorder replay diverged from the in-order replay")
    assert(inOrder.nonEmpty)
  }
}
