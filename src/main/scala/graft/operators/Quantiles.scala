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
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    val ranked = df.select(col(groupCol), col(valueCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(groupCol))))
    val aggs = ps.map { case (name, num, den) =>
      val rank = (col("__n") * num + (den - 1)) / den  // integer div on longs
      max(when(col("__rn") === rank.cast("long"), col(valueCol))).as(name)
    }
    ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }
}
