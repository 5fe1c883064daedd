package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (Deequ-style): express
  * checks as data, evaluate them in ONE wide aggregation pass over the
  * table (plus one anti-join per referential-integrity check), and emit
  * a violation report the pipeline can gate on — the distributed
  * generalization of the reference's per-file precheck rules
  * (SURVEY.md §2.7) to table-level invariants.
  *
  * All column checks fold into a single Aggregate over one scan:
  * violation counts are `sum(when(...))`/`count distinct` columns of
  * the same row, then unpivoted. Cost at 100 TB = one scan + one
  * 1-row aggregate, regardless of how many checks ride along.
  */
object DataQuality {

  sealed trait Check { def name: String; def column: String }
  /** column must be non-null */
  final case class NotNull(column: String) extends Check {
    val name = "not_null" }
  /** column must be unique across the table */
  final case class Unique(column: String) extends Check {
    val name = "unique" }
  /** column must fall in [lo, hi] (inclusive), nulls ignored */
  final case class Bounds(column: String, lo: Double, hi: Double)
      extends Check { val name = "bounds" }
  /** every non-null value must exist in parent(parentCol) */
  final case class RefIntegrity(column: String, parent: DataFrame,
      parentCol: String) extends Check { val name = "ref_integrity" }

  /** @return one row per check: (check, column, n_violations, passed) */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggChecks = checks.filter(!_.isInstanceOf[RefIntegrity])
    val aggCols: Seq[Column] = aggChecks.zipWithIndex.map {
      case (NotNull(c), i) =>
        coalesce(sum(when(col(c).isNull, 1L)), lit(0L)).as(s"__m$i")
      case (Unique(c), i) =>
        (count(col(c)) - countDistinct(col(c))).as(s"__m$i")
      case (Bounds(c, lo, hi), i) =>
        coalesce(sum(when(col(c) < lo || col(c) > hi, 1L)), lit(0L))
          .as(s"__m$i")
      case (c, _) => throw new IllegalArgumentException(c.toString)
    }
    // a RefIntegrity-only (or empty) check list has no agg columns —
    // stack(0, ) is malformed, so start the union from an empty frame
    val aggReport = if (aggChecks.isEmpty) {
      df.sparkSession.emptyDataFrame
        .select(lit("").as("check"), lit("").as("column"),
          lit(0L).as("n_violations"))
        .limit(0)
    } else {
      val stackExpr = aggChecks.zipWithIndex.map { case (c, i) =>
        s"'${c.name}', '${c.column}', __m$i" }
        .mkString(s"stack(${aggChecks.size}, ", ", ", ")")
      df.agg(aggCols.head, aggCols.tail: _*)
        .select(expr(s"$stackExpr as (check, column, n_violations)"))
    }
    val riReports = checks.collect { case RefIntegrity(c, parent, pc) =>
      df.select(col(c)).filter(col(c).isNotNull)
        .join(parent.select(col(pc).as(c)), Seq(c), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit("ref_integrity").as("check"), lit(c).as("column"),
          col("n_violations"))
    }
    riReports.foldLeft(aggReport)(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
  }
}
