package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch CDC changelog application — fold a day's insert/update/delete
  * stream into the previous snapshot to produce the next one (the
  * batch twin of the streaming upsert in
  * `streaming/EventsStream.scala`'s profile sink, and the core of
  * every incremental ingest loop).
  *
  * Semantics: per key, the changelog row with the HIGHEST sequence
  * number wins ("last writer wins"); a winning `D` removes the key, a
  * winning `I`/`U` upserts the payload (both are upserts — replaying
  * an insert over an existing key is a legal CDC stream). Keys the
  * changelog never touches pass through unchanged.
  *
  * Scale shape: one window over the changelog partitioned by key (the
  * changelog is the SMALL side — a day's delta, not the corpus) and
  * one key-partitioned full-outer join against the snapshot. Nothing
  * is collected; the snapshot is never scanned twice. At 100 TB the
  * join co-locates for free when the snapshot is stored bucketed by
  * key (`sources/Layout.scala`), leaving the delta shuffle only.
  */
object Cdc {

  /** @param base     previous snapshot, one row per `keyCol`
    * @param log      changelog with `keyCol`, `seqCol` (total order
    *                 within a key), `opCol` in {I, U, D}, and the
    *                 payload columns (same names as in `base`)
    * @param keyCol   the snapshot key
    * @param seqCol   the changelog ordering column
    * @param opCol    the operation column
    * @return the next snapshot: base schema + `src` ("base" for rows
    *         carried through, "cdc" for rows written by the changelog)
    */
  def applyChangelog(base: DataFrame, log: DataFrame, keyCol: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    require(payload.forall(log.columns.contains),
      s"changelog must carry the snapshot payload columns $payload")
    // ties on (key, seq) would make "last writer" ambiguous — break
    // deterministically by op precedence D > U > I (not string order,
    // which would rank U first) so replays are idempotent
    val opRank = when(col(opCol) === "D", 3)
      .when(col(opCol) === "U", 2).otherwise(1)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, opRank.desc)
    val latest = log
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .select(col(keyCol) +: col(opCol).as("__graft_op") +:
        payload.map(c => col(c).as(s"__graft_$c")): _*)
    base.join(latest, Seq(keyCol), "full_outer")
      .filter(col("__graft_op").isNull || col("__graft_op") =!= "D")
      .select(col(keyCol) +:
        payload.map(c => when(col("__graft_op").isNotNull,
          col(s"__graft_$c")).otherwise(col(c)).as(c)) :+
        when(col("__graft_op").isNotNull, lit("cdc"))
          .otherwise(lit("base")).as("src"): _*)
  }
}
