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
  * aggregation over the corpus — then sweep that per-value table with
  * a running min over strictly-greater `maxCol`, and semi-join the
  * surviving (maxCol, minCol) pairs back. The corpus is scanned twice
  * and shuffled once (the groupBy); the quadratic part never touches
  * the data.
  *
  * The sweep itself is decomposed the same way as
  * [[Intervals.denseIds]]: a single global-ordered window would put
  * every distinct `maxCol` value in one partition (fine for bounded
  * domains, a straggler when the metric has 10⁹ distinct values), so
  * rows sweep WITHIN their `maxCol div bucketSize` bucket in parallel
  * and buckets are stitched with a prefix-min over the |buckets|-row
  * per-bucket summary — the only globally-ordered window runs on that
  * tiny seam table.
  */
object Skyline {

  def pareto2d(df: DataFrame, maxCol: String, minCol: String,
      bucketSize: Long = 1L << 20): DataFrame = {
    val best = df.groupBy(col(maxCol)).agg(min(col(minCol)).as("__best"))
      .withColumn("__b", expr(s"$maxCol div ${bucketSize}L"))
    // running min over strictly-greater maxCol INSIDE the bucket
    val local = Window.partitionBy(col("__b")).orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // prefix min over strictly-greater BUCKETS (the seam table)
    val seam = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val above = best.groupBy(col("__b")).agg(min(col("__best")).as("__bmin"))
      .withColumn("__above", min(col("__bmin")).over(seam))
      .select(col("__b"), col("__above"))
    val frontier = best
      .withColumn("__local", min(col("__best")).over(local))
      .join(broadcast(above), Seq("__b"))
      // least() skips NULLs (first row of first bucket has neither)
      .withColumn("__minAbove", least(col("__local"), col("__above")))
      // survive if no strictly-larger maxCol achieves ≤ our best minCol
      .filter(col("__minAbove").isNull || col("__best") < col("__minAbove"))
      .select(col(maxCol), col("__best").as(minCol))
    df.join(broadcast(frontier), Seq(maxCol, minCol), "left_semi")
  }
}
