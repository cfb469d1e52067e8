package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — classify every key across two versions of a
  * table as added / removed / changed (unchanged keys are omitted:
  * at 100 TB the interesting output is the delta, not a copy of the
  * corpus). The audit step after every [[Cdc]] fold, layout rewrite
  * or backfill: "what did this run actually change?"
  *
  * Scale shape: one key-partitioned full-outer join; payload equality
  * is a null-safe conjunction evaluated in the join's output stage
  * (codegen, no hashing detour). When both versions are stored
  * bucketed by key the join is exchange-free.
  */
object Diff {

  /** @return (key, status, payload-before as struct, payload-after as
    *         struct) rows for every non-identical key; `before` is
    *         null for added keys, `after` null for removed ones. */
  def byKey(v0: DataFrame, v1: DataFrame, keyCol: String): DataFrame = {
    val payload = v0.columns.filterNot(_ == keyCol).toSeq
    require(v1.columns.filterNot(_ == keyCol).toSeq == payload,
      "both versions must share the payload schema")
    val left = v0.select(col(keyCol) +: lit(true).as("__graft_l") +:
      payload.map(c => col(c).as(s"__graft_l_$c")): _*)
    val right = v1.select(col(keyCol) +: lit(true).as("__graft_r") +:
      payload.map(c => col(c).as(s"__graft_r_$c")): _*)
    val same = payload
      .map(c => col(s"__graft_l_$c") <=> col(s"__graft_r_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    left.join(right, Seq(keyCol), "full_outer")
      .withColumn("status",
        when(col("__graft_l").isNull, "added")
          .when(col("__graft_r").isNull, "removed")
          .when(!same, "changed"))
      .filter(col("status").isNotNull)
      .select(col(keyCol), col("status"),
        when(col("__graft_l").isNotNull,
          struct(payload.map(c => col(s"__graft_l_$c").as(c)): _*))
          .as("before"),
        when(col("__graft_r").isNotNull,
          struct(payload.map(c => col(s"__graft_r_$c").as(c)): _*))
          .as("after"))
  }
}
