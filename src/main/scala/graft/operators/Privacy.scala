package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release pipelines — k-anonymity and
  * l-diversity over declared quasi-identifier columns (Sweeney 2002;
  * Machanavajjhala et al. 2007), plus the enforcement step that
  * suppresses rows whose equivalence class is too small to release.
  * Complements the content-side PII redaction
  * (`functions/PiiFunctions.scala`): that scrubs values, this audits
  * STRUCTURE — how re-identifiable a row is from the columns you
  * meant to keep.
  *
  * All metrics are exact integer counts over one groupBy of the
  * quasi-identifier tuple — engine-reproducible, and at 100 TB the
  * single hash shuffle carries only (class, counts) rows after the
  * map-side combine. Suppression is a broadcast-size join only when
  * the violating-class list is small; expressed as a plain join so
  * Catalyst/AQE picks the strategy from runtime sizes.
  */
object Privacy {

  /** Per-equivalence-class audit: class size `n`, distinct sensitive
    * values `n_sensitive`, and the k/l verdicts. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasi-identifier columns required")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(sensitive).as("n_sensitive"))
      .withColumn("k_ok", col("n") >= k)
      .withColumn("l_ok", col("n_sensitive") >= l)
  }

  /** The enforcement twin: drop every row whose quasi-identifier
    * class has fewer than `k` members, so the released table is
    * k-anonymous by construction. */
  def suppressSmallClasses(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    val small = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") < k)
      .select(quasiCols.map(col): _*)
    df.join(small, quasiCols, "left_anti")
  }
}
