package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial radius join on a planar integer grid.
  *
  * Finds all (left, right) pairs within Euclidean distance `radius`,
  * coordinates in integer micro-units — the proximity-join family
  * member next to the as-of (time), interval-overlap (1-D range) and
  * similarity (set/vector) joins (SURVEY.md §2.7 extended surface).
  *
  * Scale design — the definitional form is a cross join with a
  * distance predicate (nested loop, O(n·m)); this is the standard
  * uniform-grid decomposition:
  *  - cell side = `radius`, so every qualifying pair lies in the same
  *    or an adjacent cell (3×3 neighborhood) — no candidate is missed
  *    by construction;
  *  - the build side lands in exactly ONE cell; the probe side
  *    duplicates ×9 onto its neighborhood, making the candidate step a
  *    plain hash EQUI-join on (cellx, celly) — one shuffle, no nested
  *    loop anywhere, each true pair produced exactly once (the build
  *    row's unique cell meets exactly one probe copy);
  *  - the exact predicate (dx² + dy² ≤ r², all BIGINT — coordinates are
  *    micro-units so squares fit comfortably) runs in the join's output
  *    projection;
  *  - per-cell occupancy bounds the worst-case fan-out: skew is a
  *    density property the cell size controls, not a key-distribution
  *    accident. At 100 TB, radius (= cell size) is the knob: the
  *    shuffle carries each row 1× (build) / 9× (probe) regardless of
  *    corpus size.
  */
object Geo {

  /** @param left  probe side with (`keyL`, `xCol`, `yCol`)
    * @param right build side with (`keyR`, `xCol`, `yCol`)
    * @return keyL, keyR, dist2 — every pair with dx²+dy² ≤ radius²
    * @note coordinates must be NON-NEGATIVE integers: cell assignment
    *       uses `DIV`, which truncates toward zero — floor only on
    *       non-negatives (shift into the positive quadrant first). */
  def gridRadiusJoin(left: DataFrame, right: DataFrame,
      xCol: String, yCol: String, radius: Long): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    // the 3×3 neighborhood as a literal-array explode: a narrow
    // Generate inside codegen, not a 9-row join
    val offsets = Seq(-1L, 0L, 1L)
      .flatMap(dx => Seq(-1L, 0L, 1L).map(dy =>
        s"struct(${dx}L AS ox, ${dy}L AS oy)"))
      .mkString("array(", ", ", ")")
    val probe = left
      .withColumn("_lx", col(xCol).cast("long"))
      .withColumn("_ly", col(yCol).cast("long"))
      .withColumn("_o", explode(expr(offsets)))
      .withColumn("_cx", expr(s"(_lx DIV ${radius}L) + _o.ox"))
      .withColumn("_cy", expr(s"(_ly DIV ${radius}L) + _o.oy"))
      .drop(xCol, yCol, "_o")
    val build = right
      .withColumn("_rx", col(xCol).cast("long"))
      .withColumn("_ry", col(yCol).cast("long"))
      .withColumn("_cx", expr(s"_rx DIV ${radius}L"))
      .withColumn("_cy", expr(s"_ry DIV ${radius}L"))
      .drop(xCol, yCol)
    probe.join(build, Seq("_cx", "_cy"))
      .withColumn("dist2",
        expr("(_lx - _rx) * (_lx - _rx) + (_ly - _ry) * (_ly - _ry)"))
      .filter(col("dist2") <= lit(radius * radius))
      .drop("_cx", "_cy", "_lx", "_ly", "_rx", "_ry")
  }
}
