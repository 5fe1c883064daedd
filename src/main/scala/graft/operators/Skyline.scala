package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated on
  * (maximize `maxCol`, minimize `minCol`). Dominance requires ≥/≤ on
  * both axes and strict on at least one; rows equal on both axes are
  * mutually non-dominating and all survive.
  *
  * The naive formulation is an all-pairs NOT EXISTS (the oracle). This
  * implementation exploits the 2-D structure: collapse to the best
  * (minimum) `minCol` per `maxCol` value — one map-side-combining
  * aggregation over the corpus — then sweep that tiny per-value table
  * with a running min over strictly-greater `maxCol` (a window over
  * |distinct maxCol| rows), and semi-join the surviving (maxCol,
  * minCol) pairs back. The corpus is scanned twice and shuffled once
  * (the groupBy); the quadratic part never touches the data.
  */
object Skyline {

  def pareto2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val best = df.groupBy(col(maxCol)).agg(min(col(minCol)).as("__best"))
    val sweep = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = best
      .withColumn("__minAbove", min(col("__best")).over(sweep))
      // survive if no strictly-larger maxCol achieves ≤ our best minCol
      .filter(col("__minAbove").isNull || col("__best") < col("__minAbove"))
      .select(col(maxCol), col("__best").as(minCol))
    df.join(broadcast(frontier), Seq(maxCol, minCol), "left_semi")
  }
}
