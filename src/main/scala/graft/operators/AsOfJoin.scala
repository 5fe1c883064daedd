package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the same
  * key and the greatest right-time ≤ left-time (optionally within a
  * tolerance). Spark has no native operator; per the preference order
  * this is COMPOSED from built-ins — equi-join on key, match predicate,
  * per-left-row window top-1 — so Catalyst plans the equi part as a
  * normal (broadcastable) hash join.
  *
  * Left-outer semantics: every left row survives; rows with no
  * qualifying right match carry nulls.
  *
  * Scale path: one shuffle on the key (or broadcast when the right
  * side is dimension-sized); the window partitions on the left row id
  * so group size = matches per row. For dense series, pre-bucket both
  * sides by (key, time bucket) to bound the candidate set.
  */
object AsOfJoin {

  /** @param leftId a UNIQUE left row id (required for exact windowing —
    *               never a generated nondeterministic id, so retries
    *               and oracle comparisons stay stable)
    * @param direction "backward" (greatest right-time ≤ left-time, the
    *               default) or "forward" (smallest right-time ≥
    *               left-time — next-event lookup) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftId: String, leftTime: String, rightTime: String,
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val fwd = direction == "forward"
    // avoid name collisions: suffix non-key right columns present on the left
    val renamedRight = right.columns.foldLeft(right) { (d, c) =>
      if (!keys.contains(c) && left.columns.contains(c))
        d.withColumnRenamed(c, c + "_r")
      else d
    }
    val rt = if (left.columns.contains(rightTime)) rightTime + "_r" else rightTime
    val rightCols = renamedRight.columns.filterNot(keys.contains)

    val inWindow =
      if (fwd) col(rt) >= col(leftTime) else col(rt) <= col(leftTime)
    val gap = if (fwd) col(rt) - col(leftTime) else col(leftTime) - col(rt)
    val matchable =
      inWindow && tolerance.map(t => gap <= t).getOrElse(lit(true))
    val joined = left.join(renamedRight, keys, "left")
      .withColumn("__ok", coalesce(matchable, lit(false)))
    // best candidate first: qualifying matches before non-qualifying,
    // then nearest right time on the chosen side; exactly one row per
    // left row survives
    val w = Window.partitionBy(col(leftId))
      .orderBy(col("__ok").desc,
        if (fwd) col(rt).asc_nulls_last else col(rt).desc_nulls_last)
    val picked = joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    // null out right columns when the survivor isn't a qualifying match
    val nulledRight = rightCols.foldLeft(picked) { (d, c) =>
      d.withColumn(c, when(col("__ok"), col(c)))
    }
    nulledRight.drop("__rn", "__ok")
  }
}
