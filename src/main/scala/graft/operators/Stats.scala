package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grouped statistical model fits in exact integer/decimal arithmetic.
  *
  * Everything that crosses the oracle boundary is computed from integer
  * sums (n, Σx, Σy, Σx², Σxy) held in DECIMAL(38,0), combined with the
  * closed-form least-squares formulas under truncating integer
  * division — bit-identical at any parallelism or accumulation order,
  * on any engine. One map-side-combining shuffle per fit; the moment
  * sums are the classic monoid, so 100 TB costs the same as a SUM.
  */
object Stats {

  /** Sign-stable truncating integer division: both Spark's `div` and
    * a portable SQL translation truncate |num|/|den| toward zero and
    * re-apply the sign, so negative slopes match across engines
    * regardless of each engine's native floor/trunc choice. */
  private def sdiv(num: String, den: String): String =
    s"""CASE WHEN ($num) < 0 AND ($den) > 0 OR ($num) > 0 AND ($den) < 0
          THEN -(abs($num) div abs($den))
          ELSE abs($num) div abs($den) END"""

  /** Per-group simple linear regression y = a + b·x over integral
    * columns. Emits n, slope and intercept in parts-per-million
    * (slope_ppm = ⌊10⁶·b⌋ sign-toward-zero, intercept from the fitted
    * slope — the exact arithmetic both engines reproduce). */
  def linearFit(df: DataFrame, groupCol: String, xCol: String,
      yCol: String): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    df.select(col(groupCol),
        col(xCol).cast("long").as("__x"), col(yCol).cast("long").as("__y"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(expr(s"CAST(__x AS $d38)")).as("sx"),
        sum(expr(s"CAST(__y AS $d38)")).as("sy"),
        sum(expr(s"CAST(__x AS $d38) * CAST(__x AS $d38)")).as("sxx"),
        sum(expr(s"CAST(__x AS $d38) * CAST(__y AS $d38)")).as("sxy"))
      .withColumn("slope_ppm",
        // constant-x group: variance term is 0 — emit NULL explicitly
        // (DuckDB's integer // would abort on the division, Spark's div
        // would return NULL; make both engines take the same branch)
        when(expr("n * sxx - sx * sx") === 0, lit(null))
          .otherwise(expr(
            sdiv("(n * sxy - sx * sy) * 1000000", "n * sxx - sx * sx")))
          .cast("long"))
      .withColumn("intercept_ppm",
        when(col("slope_ppm").isNull, lit(null))
          .otherwise(expr(sdiv("sy * 1000000 - slope_ppm * sx", "n")))
          .cast("long"))
      .select(col(groupCol), col("n"),
        col("sx").cast("long").as("sum_x"), col("sy").cast("long").as("sum_y"),
        col("slope_ppm"), col("intercept_ppm"))
  }

  /** Median imputation: fill NULL `valueCol` with the group's exact
    * PERCENTILE_DISC median (computed over non-nulls). The medians
    * table is |groups| rows broadcast back — the data shuffles zero
    * times beyond the one grouped-percentile pass. Emits the original
    * columns with `<valueCol>_filled` plus a was_null flag. */
  def imputeMedian(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val med = Quantiles.percentilesDisc(df, groupCol, valueCol,
      Seq(("__med", 1, 2)))
    df.join(broadcast(med), Seq(groupCol))
      .withColumn(s"${valueCol}_filled",
        coalesce(col(valueCol), col("__med")))
      .withColumn("was_null", col(valueCol).isNull)
      .drop("__med")
  }

  /** Exact mode (most frequent value) per group with a deterministic
    * tie-break (smallest value wins). Two map-side-combining shuffles:
    * (group, value) counts, then a per-group top-1 window over the
    * already-collapsed count table — the data itself crosses the wire
    * once; the window input is |distinct pairs|, not |rows|. */
  def modePerGroup(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n_mode"))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("n_mode").desc, col(valueCol).asc)
    counts.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col(groupCol), col(valueCol).as("mode_value"), col("n_mode"))
  }

  /** Exact 3-sigma-style outlier flags without any floating point:
    * flags rows where n²·(x − μ)² > k²·n·Σ(x−μ)², i.e. |x−μ| > k·σ,
    * cross-multiplied into pure integer arithmetic:
    * (n·x − Σx)² · n  >  k² · n² · (Σx²·n − Σx²)/n … algebraically
    * (n·x − Σx)²  >  k² · (n·Σx² − (Σx)²). Emits per-group totals and
    * the flagged rows. Two passes over the group (sums, then flag), the
    * second a broadcast of |groups| rows — data shuffles once. */
  def sigmaOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame = {
    val d38 = "DECIMAL(38,0)"
    val sums = df
      .select(col(groupCol), col(valueCol).cast("long").as("__v"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("__n"),
        sum(expr(s"CAST(__v AS $d38)")).as("__sv"),
        sum(expr(s"CAST(__v AS $d38) * CAST(__v AS $d38)")).as("__svv"))
    df.select(col(groupCol), col(idCol), col(valueCol).cast("long").as("__v"))
      .join(broadcast(sums), Seq(groupCol))
      .filter(expr(
        s"""(CAST(__n AS $d38) * __v - __sv) * (CAST(__n AS $d38) * __v - __sv)
            > ${k.toLong * k} * (CAST(__n AS $d38) * __svv - __sv * __sv)"""))
      .select(col(groupCol), col(idCol), col("__v").as(valueCol),
        col("__n").as("n_group"))
  }
}
