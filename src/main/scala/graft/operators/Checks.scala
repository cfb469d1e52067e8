package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking — the expectation
  * gate every production pipeline runs before publishing a table
  * (the Deequ/Great-Expectations shape, re-expressed Spark-first).
  *
  * Checks are DATA, not code: a `Seq[Check]` declared next to the
  * table definition, compiled into as few passes as the check mix
  * allows — every row-level check (null, range, custom predicate)
  * folds into ONE shared aggregate over one scan (conditional sums,
  * map-side combined); key-uniqueness adds one distinct-count
  * aggregate; referential integrity adds one anti-join per foreign
  * key. All metrics are exact BIGINT violation counts, so the report
  * is engine-reproducible and a driver oracle can re-derive it
  * check for check.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Column must be non-null on every row. */
  case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }

  /** Column must fall in [lo, hi] (inclusive); nulls count as
    * violations (use [[NotNull]] alongside when nulls are legal). */
  case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col,$lo,$hi)"
  }

  /** The column set must be a key: no two rows share a value tuple. */
  case class Unique(cols: Seq[String]) extends Check {
    def name = s"unique(${cols.mkString(",")})"
  }

  /** Every non-null value must appear in the reference column —
    * referential integrity across tables. */
  case class ForeignKey(col: String, ref: DataFrame, refCol: String)
      extends Check {
    def name = s"foreign_key($col)"
  }

  /** Arbitrary row predicate that must hold; violation = NOT p
    * (null predicate counts as a violation — unknown is not a pass). */
  case class Satisfies(label: String, predicate: Column) extends Check {
    def name = s"satisfies($label)"
  }

  /** Run the checks; one row per check:
    * (check, n_rows, violations, passed). */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    val spark = df.sparkSession
    import spark.implicits._

    val rowLevel = rowLevelChecks(df, checks)
    val total = count(lit(1)).as("n_rows")
    val rowReport: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else Some(rowLevelReport(df, checks).drop("passed"))

    val uniqueReports = checks.collect { case c @ Unique(cols) =>
      df.agg(total,
          countDistinct(struct(cols.map(df(_)): _*)).as("n_distinct"))
        .select(lit(c.name).as("check"), col("n_rows"),
          (col("n_rows") - col("n_distinct")).as("violations"))
    }

    val fkReports = checks.collect { case c @ ForeignKey(col0, ref, refCol) =>
      val orphans = df.select(df(col0).as("__graft_fk"))
        .filter(col("__graft_fk").isNotNull)
        .join(ref.select(ref(refCol).as("__graft_fk")).distinct(),
          Seq("__graft_fk"), "left_anti")
        .agg(count(lit(1)).as("violations"))
      df.agg(total).crossJoin(orphans)
        .select(lit(c.name).as("check"), col("n_rows"),
          col("violations"))
    }

    (rowReport.toSeq ++ uniqueReports ++ fkReports)
      .reduce(_.unionByName(_))
      .withColumn("passed", col("violations") === 0L)
  }

  /** Just the row-level checks (not-null / range / predicate) as one
    * shared conditional-sum aggregate — the STREAMABLE subset: a
    * global aggregate Structured Streaming maintains incrementally in
    * complete mode, where key-uniqueness and referential integrity
    * would need unbounded distinct state. Same output shape as
    * [[run]]. */
  def rowLevelReport(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val rowLevel = rowLevelChecks(df, checks)
    require(rowLevel.nonEmpty, "no row-level checks declared")
    // positional aliases internally — check names hold dots and
    // parens, which col(...) would parse as nested-field paths
    val agg = df.agg(count(lit(1)).as("n_rows"),
      rowLevel.zipWithIndex.map {
        case ((_, v), i) => sum(v).as(s"__graft_c$i")
      }: _*)
    val n = col("n_rows")
    agg.select(explode(array(rowLevel.zipWithIndex.map {
      case ((name, _), i) =>
        struct(lit(name).as("check"), n.as("n_rows"),
          col(s"__graft_c$i").as("violations"))
    }: _*)).as("r"))
      .select(col("r.check"), col("r.n_rows"), col("r.violations"))
      .withColumn("passed", col("violations") === 0L)
  }

  /** (name, per-row violation indicator) for every row-level check:
    * one scan, conditional sums share the single aggregate (map-side
    * combined, |checks|+1 longs of state). */
  private def rowLevelChecks(df: DataFrame, checks: Seq[Check])
      : Seq[(String, Column)] = checks.collect {
    case c @ NotNull(col) =>
      c.name -> when(df(col).isNull, 1L).otherwise(0L)
    case c @ InRange(col, lo, hi) =>
      c.name -> when(df(col).isNull ||
        df(col) < lo || df(col) > hi, 1L).otherwise(0L)
    case c @ Satisfies(_, p) =>
      c.name -> when(coalesce(p, lit(false)), 0L).otherwise(1L)
  }
}
