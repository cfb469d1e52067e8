package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming surface over the `events` table (extension
  * territory per SURVEY.md §1.1 — the reference has no streaming at all).
  *
  * The transforms are written once against a DataFrame and used in BOTH
  * modes: batch (Verify/oracle — `window()` and the sessionization SQL
  * work identically on static data) and streaming (ScalaTest drives
  * them through a file/memory-sink streaming query with a watermark).
  * That one-code-path design is the point: at scale the same pipeline
  * definition serves backfill (batch over 100 TB of history) and the
  * live stream.
  */
object EventsStream {

  /** Tumbling-window aggregation per event type: 1-hour windows, count +
    * exact micro-scaled value sum. In streaming mode the 10-minute
    * watermark bounds state; in batch mode it is a no-op. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 1e6).cast("long")) / 1e6).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Batch sessionization (gap-based): a session breaks after `gapMin`
    * minutes of per-user inactivity. Classic lag + cumulative-sum window
    * construction — runs distributed (partition by user, order by ts)
    * and is SQL-expressible for the DuckDB oracle. */
  def sessionizeBatch(events: DataFrame, gapMin: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    // exact integer µs arithmetic — deterministic across engines (a
    // float-seconds comparison could flip at an exact gap boundary)
    val newSession =
      (unix_micros(col("ts")) -
        unix_micros(lag("ts", 1).over(byUser)) > gapMin * 60L * 1000000L)
        .cast("int")
    events
      .withColumn("new_s", coalesce(newSession, lit(0)))
      .withColumn("session_idx",
        sum("new_s").over(byUser.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("session_start"),
        max("ts").as("session_end"))
      .orderBy("user_id", "session_idx")
  }

  /** Sliding-window rates: 1-hour windows sliding every 15 minutes —
    * each event lands in 4 windows. Works in both batch and streaming
    * (same code path as [[windowedAgg]]). */
  def slidingRates(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))

  /** Stream-stream inner join: purchases joined to the same user's
    * signups within the watermark bound — the canonical funnel join.
    * In batch mode the watermark/condition degrade to a plain
    * range-predicate join. */
  def purchaseAfterSignup(events: DataFrame): DataFrame = {
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value"))
      .withWatermark("purchase_ts", "1 hour")
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("purchase_ts") >= col("signup_ts") &&
        col("purchase_ts") <= col("signup_ts") + expr("INTERVAL 2 HOURS"))
  }

  // --- Streaming-only stateful sessionization ---------------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionUpdate(user_id: Long, n_events: Long, closed: Boolean)

  /** Custom state: per-user event-counting session that closes after a
    * 30-minute *event-time* gap — the `flatMapGroupsWithState` shape for
    * state Spark's windowing can't express. Event-time timeouts are the
    * scalable/terminating choice: they advance with the watermark (data),
    * while processing-time timeouts force the engine to keep scheduling
    * wall-clock batches forever (an AvailableNow backfill never ends). */
  def sessionizeStateful(spark: SparkSession, events: DataFrame)
      : Dataset[SessionUpdate] = {
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.n, closed = true))
          } else {
            val events = batch.toSeq
            val maxTs = events.map(_.ts.getTime).max
            val prev = state.getOption.getOrElse(SessionState(0L, 0L))
            val s = SessionState(prev.n + events.size,
              math.max(prev.maxTs, maxTs))
            state.update(s)
            // clamp to the watermark: a group fed only late events would
            // otherwise compute a timeout below the watermark, which
            // setTimeoutTimestamp rejects, killing the whole query
            state.setTimeoutTimestamp(math.max(s.maxTs + 30L * 60000L,
              state.getCurrentWatermarkMs() + 1L))
            Iterator.single(SessionUpdate(userId, s.n, closed = false))
          }
      }
  }

  case class SessionState(n: Long, maxTs: Long)

  // --- Streaming running per-user profile (mapGroupsWithState) ----------

  case class UserProfile(user_id: Long, n_events: Long,
      spend_micros: Long, last_seen_ms: Long)

  /** Continuously-maintained per-user profile — the streaming-upsert
    * shape (`mapGroupsWithState`: exactly one output row per updated
    * key per trigger, vs flatMap's zero-or-many). Value sums are exact
    * integer micros so the final state equals the batch aggregate
    * regardless of batch boundaries — the merge is associative, which
    * is what makes the stream ≡ backfill. */
  def userProfileStream(spark: SparkSession, events: DataFrame)
      : Dataset[UserProfile] = {
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserProfile, UserProfile](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event],
         state: GroupState[UserProfile]) =>
          val events = batch.toSeq
          val prev = state.getOption
            .getOrElse(UserProfile(userId, 0L, 0L, 0L))
          val next = UserProfile(
            userId,
            prev.n_events + events.size,
            // HALF_UP on the shortest-repr decimal — the same rounding as
            // SQL round() in both Spark and DuckDB (math.round is
            // floor(x+0.5), which differs for negatives landing on .5)
            prev.spend_micros + events.map(e =>
              BigDecimal(e.value * 1e6)
                .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue).sum,
            math.max(prev.last_seen_ms, events.map(_.ts.getTime).max))
          state.update(next)
          next
      }
  }

  /** Batch twin of [[userProfileStream]]'s final state — same exact
    * integer-micros arithmetic, SQL-expressible for the oracle. */
  def userProfileBatch(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 1e6).cast("long")).as("spend_micros"),
        max(col("ts")).as("last_seen"))
      .orderBy("user_id")

  /** Streaming read of the events table (file source). `ts` is normalized
    * exactly like the batch path ([[graft.sources.Tables]]): nano longs
    * divide to micros, TIMESTAMP_NTZ casts to session-tz TIMESTAMP. The
    * physical type is sniffed from a one-footer batch read (streaming
    * sources need an explicit schema up front). */
  def readEventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.types._
    val tsType =
      spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val raw = StreamSource.table(spark, sfDir, "events", schema)
    tsType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  case class Transition(prev_type: String, next_type: String)

  /** Streaming first-order Markov transitions: per-user LAST EVENT
    * TYPE as `mapGroupsWithState`-style state (one string per user —
    * bounded by the user population, not the event volume), each
    * arriving event emitting its (prev → next) edge. Within a
    * micro-batch the group's rows sort by (ts, event_id) — the batch
    * operator's exact order — and the state seeds the next batch, so
    * the emitted edge multiset equals the batch lag() derivation
    * under any batch slicing of an ordered source. The aggregation
    * into the transition matrix happens at epoch close over the sink
    * (the stream_heavy_hitters discipline): chaining a second
    * stateful aggregate behind flatMapGroupsWithState is the
    * restricted shape. */
  def transitionsStream(spark: SparkSession, events: DataFrame)
      : Dataset[Transition] = {
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[String, Transition](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, batch: Iterator[Event], state: GroupState[String]) =>
          val sorted = batch.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Transition]
          var prev = state.getOption
          sorted.foreach { e =>
            prev.foreach(p => out += Transition(p, e.event_type))
            prev = Some(e.event_type)
          }
          prev.foreach(state.update)
          out.result().iterator
      }
  }

  /** Drive [[transitionsStream]] to completion; returns the sink. */
  def runTransitionsStream(spark: SparkSession, sfDir: String,
      sinkName: String = "events_transitions_stream"): String = {
    StreamSource.runToFileSink(spark,
      transitionsStream(spark, readEventsStream(spark, sfDir)), sinkName)
  }

  /** Drive [[windowedAgg]] as a real streaming query over the parquet
    * events dir, synchronously to completion (memory sink). Used by the
    * streaming spec; returns the sink table name. */
  def runWindowedStream(spark: SparkSession, sfDir: String,
      sinkName: String = "events_windowed"): String =
    StreamSource.runToFileSink(spark,
      windowedAgg(readEventsStream(spark, sfDir)), sinkName)

  /** Streaming OHLC bars: the batch derivation's EXACT expressions
    * (open/close as struct-min/max argmax over (ts, event_id, v) —
    * tie-free because event_id is unique; exact micro longs) grouped
    * under an hourly event-time window with a watermark. min/max of
    * structs are ordinary mergeable aggregates, so the bar is
    * incrementally maintained in window state and emitted once when
    * the watermark closes the hour — the same append-mode discipline
    * as [[windowedAgg]], sharing the batch `events_ohlc` oracle. */
  def ohlcAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(struct(col("ts"), col("event_id"),
          round(col("value") * 1e6).cast("long").as("v")))
          .getField("v").as("open_micros"),
        max(struct(col("ts"), col("event_id"),
          round(col("value") * 1e6).cast("long").as("v")))
          .getField("v").as("close_micros"),
        min(round(col("value") * 1e6).cast("long")).as("low_micros"),
        max(round(col("value") * 1e6).cast("long")).as("high_micros"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("open_micros"), col("close_micros"),
        col("low_micros"), col("high_micros"))

  def runOhlcStream(spark: SparkSession, sfDir: String,
      sinkName: String = "events_ohlc_stream"): String =
    StreamSource.runToFileSink(spark,
      ohlcAgg(readEventsStream(spark, sfDir)), sinkName)
}
