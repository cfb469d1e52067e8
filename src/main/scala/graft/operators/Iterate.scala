package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization policy for iterative operators (pageRank, label
  * propagation, BFS, connected components): every round's state frame
  * must be eagerly materialized so the logical plan stays constant-size
  * instead of doubling per iteration.
  *
  * Default: eager `localCheckpoint` — blocks live in executor storage,
  * zero extra I/O, the right local/single-job trade. Its documented
  * weakness at cluster scale: blocks are NOT recomputable (lineage is
  * truncated), so losing an executor mid-iteration fails the job.
  *
  * Opt-in reliable mode for long iterative jobs on real clusters: set
  * a checkpoint dir (`spark.sparkContext.setCheckpointDir(...)`) and
  * `spark.graft.reliableCheckpoint=true`; every
  * `spark.graft.reliableCheckpoint.interval`-th round (default 5) is
  * then a RELIABLE checkpoint (written to the checkpoint dir, survives
  * executor loss), with `localCheckpoint` still covering the rounds in
  * between — the classic cadence trade: bounded recomputation window
  * at a bounded I/O tax, instead of per-round HDFS writes.
  *
  * Both variants go through `Dataset.checkpoint`'s plan replacement,
  * which preserves the child plan's output partitioning and ordering —
  * the loop-body joins keep their zero-exchange shape either way
  * (results are bit-identical; only fault-tolerance differs).
  */
object Iterate {

  private[graft] val ReliableKey = "spark.graft.reliableCheckpoint"
  private[graft] val IntervalKey = "spark.graft.reliableCheckpoint.interval"

  /** Eagerly materialize round `round`'s state frame under the
    * session's checkpoint policy. `round` counts from 0; pass 0 for
    * one-shot (non-loop) materializations, which makes them reliable
    * whenever the mode is on.
    *
    * `big` picks the local block storage level, and the hint comes
    * from the SAME driver-known bound that picks an operator's
    * regime (e.g. pageRank/BFS choose their pinned layout when the
    * state frame crossed the broadcast threshold — that bound says
    * "big" here too):
    *
    *  - `big = false` (default): localCheckpoint's own
    *    MEMORY_AND_DISK — DESERIALIZED row objects, zero-copy
    *    re-reads, the fastest level while the frame fits storage
    *    (measured: serialized storage cost sf0.1 graph_pagerank
    *    4.0 → 6.5 s, re-paying deserialization on every loop round).
    *  - `big = true`: MEMORY_AND_DISK_SER — compact binary rows.
    *    Deserialized storage re-wraps each UnsafeRow as a JVM object
    *    (~3–4× the raw bytes); at the sf30 rehearsal the 352 M-row
    *    pinned edge frame (~8.4 GB of row bytes) OOM'd the
    *    MemoryStore unroll (DeserializedValuesHolder.storeValue)
    *    at a 64 GB heap, while serialized blocks store ~1× and
    *    spill compactly (pinned pageRank 283 → 241 s, BFS
    *    264 → 183 s at sf30). The deserialize-per-read tax is the
    *    right trade exactly when fitting is the risk. */
  def materialize(df: DataFrame, round: Int = 0,
      big: Boolean = false): DataFrame = {
    val s = df.sparkSession
    val reliable =
      s.conf.get(ReliableKey, "false").toBoolean &&
        s.sparkContext.getCheckpointDir.isDefined &&
        round % math.max(1, s.conf.get(IntervalKey, "5").toInt) == 0
    if (reliable) df.checkpoint(true)
    else if (big) df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else df.localCheckpoint(true)
  }

  /** Chained-style [[materialize]]: `df.materialized()` reads like the
    * raw `.localCheckpoint(true)` it replaces at the one-shot
    * materialization sites (round-invariant loop preps, verified-pair
    * outputs, shared sub-frames feeding multiple consumers), so every
    * such site honors the opt-in reliable-checkpoint policy instead of
    * hard-coding the non-recomputable local variant — on preemptible
    * executors a lost local block fails the job; the reliable mode
    * survives it at the documented I/O tax. */
  implicit class MaterializeOps(private val df: DataFrame) {
    def materialized(round: Int = 0, big: Boolean = false): DataFrame =
      materialize(df, round, big)
  }

  /** Run a BROADCAST-REGIME loop statically: AQE off AND
    * `spark.sql.shuffle.partitions` set to the partition count AQE's
    * coalescing would have chosen anyway — ⌈stateBytes / advisory
    * partition size⌉, clamped to [1, current setting] — for the
    * duration of `body`, restoring both confs after.
    *
    * Motivation (measured, r15/r16): with every loop join explicitly
    * broadcast-hinted, AQE's only contribution inside a bounded-state
    * loop is per-exchange stage-materialization barriers — one extra
    * job + driver round-trip per round exchange (~0.3 s/round at
    * sf0.1, ~⅓ of the iterative family's wall). Planning the loop
    * statically at the SESSION'S shuffle partition count was measured
    * 2× WORSE (r15: every N-row exchange ran all 32 reduce tasks and
    * their 32×32 block fetches); the fix is to derive the static
    * count from the SAME driver-known state bound that picked the
    * broadcast regime, which is exactly the number AQE's advisory
    * coalescing computes at runtime — scale-adaptive (grows with the
    * state, never with the box), identical result, no per-round
    * re-planning jobs.
    *
    * Broadcast regime only: the pinned regime needs [[pinnedLayout]]
    * (AQE off for layout capture, partition count = the layout's own),
    * and an UNBOUNDED state frame must keep AQE's runtime sizing. */
  def staticBoundedLoop[T](s: org.apache.spark.sql.SparkSession,
      stateBytes: BigInt)(body: => T): T = {
    val advisory = BigInt(s.sessionState.conf.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
    val cur = s.sessionState.conf.numShufflePartitions
    val k = ((stateBytes.max(BigInt(1)) + advisory - 1) / advisory)
      .min(BigInt(cur)).max(BigInt(1)).toInt
    staticWidth(s, k)(body)
  }

  /** [[staticBoundedLoop]]'s core: AQE off and
    * `spark.sql.shuffle.partitions` = `k` (clamped to [1, current
    * setting]) for the duration of `body`, both confs restored after —
    * for callers whose driver-known bound is NOT a byte size (e.g. a
    * candidate-pair mass bounding a CPU-dense exchange, where byte-
    * based coalescing under-parallelizes by the CPU-per-byte ratio). */
  private[graft] def staticWidth[T](s: org.apache.spark.sql.SparkSession,
      width: Int)(body: => T): T = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val spKey = "spark.sql.shuffle.partitions"
    val cur = s.sessionState.conf.numShufflePartitions
    val k = math.max(1, math.min(width, cur))
    val savedAqe =
      if (s.conf.getAll.contains(aqeKey)) Some(s.conf.get(aqeKey)) else None
    val savedSp =
      if (s.conf.getAll.contains(spKey)) Some(s.conf.get(spKey)) else None
    s.conf.set(aqeKey, "false")
    s.conf.set(spKey, k.toString)
    try body finally {
      savedAqe match {
        case Some(v) => s.conf.set(aqeKey, v)
        case None    => s.conf.unset(aqeKey)
      }
      savedSp match {
        case Some(v) => s.conf.set(spKey, v)
        case None    => s.conf.unset(spKey)
      }
    }
  }

  /** Run `body` with AQE disabled, restoring the session conf after.
    *
    * The iterative operators pin their physical layouts deliberately:
    * the big round-invariant frame is hash-partitioned + sorted on the
    * loop-join key ONCE, and every round's state frame comes out of an
    * aggregate already partitioned on it — checkpointing preserves
    * both, so the per-round joins need zero exchanges. AQE breaks
    * exactly this: `AdaptiveSparkPlanExec` reports
    * `UnknownPartitioning` at checkpoint-capture time (and its
    * coalescing varies partition counts round to round), so every
    * checkpointed frame would re-shuffle every round. Static planning
    * inside a fixed-layout loop is the standard iterative-graph trade
    * (AQE's wins — skew joins, dynamic coalescing — target one-shot
    * queries, not a loop whose layout is already chosen). */
  def pinnedLayout[T](s: org.apache.spark.sql.SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    // restore exactly: set back if the caller had set it, UNSET if it
    // was riding the default (never convert an unset default into an
    // explicit setting — same discipline as Graph.bfsHops)
    val saved = if (s.conf.getAll.contains(key)) Some(s.conf.get(key)) else None
    s.conf.set(key, "false")
    try body finally saved match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }
}
