package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed percentiles with PERCENTILE_DISC semantics: the
  * value at 1-indexed rank ⌈p·n⌉ of the sorted group (the first value
  * whose cumulative distribution ≥ p — SQL:2003 / Postgres / DuckDB
  * discrete percentile).
  *
  * The rank is computed in INTEGER arithmetic, p = num/den:
  * ⌈n·num/den⌉ = (n·num + den − 1) div den — no floating-point rank,
  * so results are bit-identical on any engine at any parallelism.
  *
  * Plan shape: one shuffle on the group key, one in-partition sort
  * (window), one partial-aggregable group-by. At 100 TB this is the
  * same cost as any grouped sort; for fixed small groups Spark's AQE
  * coalesces the post-shuffle partitions.
  */
object Quantiles {

  /** @param ps (outputName, numerator, denominator) per percentile */
  def percentilesDisc(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Int, Int)]): DataFrame = {
    // SQL semantics: NULL values are ignored — they sort last (outside
    // the 1..__n non-null rank range, __n counting only non-nulls) so
    // they can never be selected; an all-null group yields NULL.
    val w = Window.partitionBy(col(groupCol)).orderBy(asc_nulls_last(valueCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n",
        count(col(valueCol)).over(Window.partitionBy(col(groupCol))))
    val aggs = ps.map { case (name, num, den) =>
      // true integral division (Column `/` on longs is double division,
      // which rounds for huge counts): ⌈n·num/den⌉ = (n·num+den−1) div den
      val rank = expr(s"(__n * $num + ${den - 1}) div $den")
      max(when(col("__rn") === rank, col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** PERCENTILE_CONT (linear interpolation between the two adjacent
    * sorted values at position p·(n−1), Postgres/DuckDB semantics).
    *
    * Engine-portable exactness holds when p is DYADIC (k/2^m — 0.25,
    * 0.5, 0.75…) and values are modest integers-in-doubles: every
    * intermediate (p·(n−1), the fraction, both products, the sum) is
    * then exactly representable, so any algebraically equivalent
    * interpolation formula yields bit-identical doubles. For arbitrary
    * p use [[percentilesDisc]], whose integer rank arithmetic is exact
    * unconditionally.
    *
    * Same plan shape as disc: both windows share one hash partitioning
    * on the group key — a single shuffle at any scale. */
  def percentilesCont(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    // NULLs sort last and __n counts only non-nulls (SQL semantics —
    // see percentilesDisc): 0-based non-null ranks are 0..__n−1 and
    // p·(__n−1) can never land on a null row.
    val w = Window.partitionBy(col(groupCol)).orderBy(asc_nulls_last(valueCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w).cast("long") - 1)
      .withColumn("__n",
        count(col(valueCol)).over(Window.partitionBy(col(groupCol))))
    val aggs = ps.flatMap { case (name, p) =>
      val pos = lit(p) * (col("__n") - 1).cast("double")
      Seq(
        max(when(col("__rn") === floor(pos).cast("long"), col(valueCol)))
          .as(s"__lo_$name"),
        max(when(col("__rn") === ceil(pos).cast("long"), col(valueCol)))
          .as(s"__hi_$name"))
    }
    val g = ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).as("__gn"), aggs: _*)
    val outs = ps.map { case (name, p) =>
      val pos = lit(p) * (col("__gn") - 1).cast("double")
      val frac = pos - floor(pos)
      (col(s"__lo_$name") * (lit(1.0) - frac) + col(s"__hi_$name") * frac)
        .as(name)
    }
    g.select(col(groupCol) +: outs: _*)
  }

  /** Median absolute deviation (robust dispersion): MAD =
    * median(|x − median(x)|), both medians PERCENTILE_DISC-exact on
    * integral values. Two grouped-percentile passes; the per-group
    * medians broadcast back so the data shuffles only on the group key
    * (same cost class as one grouped sort, twice). */
  def medianAbsoluteDeviation(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val med = percentilesDisc(df, groupCol, valueCol, Seq(("__med", 1, 2)))
    val dev = df.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(col(valueCol) - col("__med")).as("__dev"))
    percentilesDisc(dev, groupCol, "__dev", Seq(("mad", 1, 2)))
  }

  /** Winsorization: clamp `valueCol` into the [lo, hi] PERCENTILE_DISC
    * band of its group, emitted as `<valueCol>_w`. Bounds are one extra
    * column-pruned pass ([[percentilesDisc]] — one shuffle) producing
    * |groups| rows, broadcast back onto the data — the data itself is
    * never re-shuffled. lo/hi are exact integer fractions (num, den),
    * so the clamp bounds are engine-portable. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      lo: (Int, Int), hi: (Int, Int)): DataFrame = {
    val bounds = percentilesDisc(df, groupCol, valueCol,
      Seq(("__lo", lo._1, lo._2), ("__hi", hi._1, hi._2)))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        when(col(valueCol) < col("__lo"), col("__lo"))
          .when(col(valueCol) > col("__hi"), col("__hi"))
          .otherwise(col(valueCol)))
      .drop("__lo", "__hi")
  }
}
