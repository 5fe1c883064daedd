package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: merge overlapping/adjacent intervals per key.
  *
  * Classic two-window formulation — a running max of interval ends
  * marks island starts, a running sum of start-flags numbers the
  * islands, then one group-by collapses each island. Both windows and
  * the final aggregation share a single hash partitioning on the key,
  * so the whole operator costs one shuffle at any scale; per-key state
  * is a sort, never a materialized pairwise comparison.
  */
object Intervals {

  /** @param df       rows with one interval [startCol, endCol) per row
    * @return one row per merged island:
    *         (key, island, island_start, island_end, n_rows)
    *
    * Ties on (start, end) are interchangeable: whichever sorts first
    * opens the island and the rest fall in — min/max/count over the
    * island are order-independent, so output is deterministic. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    df.select(col(keyCol), col(startCol), col(endCol))
      .withColumn("__new", newIsland)
      .withColumn("island", sum(col("__new"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
  }
}
