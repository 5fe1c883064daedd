package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match fact rows whose point value falls in
  * [start, end] of an interval table. Spark has no native range-join
  * operator, and the naive formulation is a cartesian product with a
  * theta filter — O(|facts|·|intervals|).
  *
  * This implementation bucketizes both sides on a fixed width W: an
  * interval joins only the buckets it overlaps (explode over its 1 +
  * span/W covered buckets), a point joins exactly one bucket, and the
  * exact theta predicate runs after the bucket equi-join. Cost becomes
  * Σ_bucket (points × intervals) per colliding bucket — an equi-join
  * Catalyst can shuffle-partition (or broadcast when the exploded
  * interval side is small), instead of a cartesian. Pick W close to
  * the typical interval span: each interval then lands in 1-2 buckets.
  */
object RangeJoin {

  /** Join `points` (valueCol: timestamp) to `intervals`
    * ([startCol, endCol] timestamps, inclusive), keyed by bucketized
    * time. `widthMicros` is the bucket width. Returns
    * points × matching intervals with all columns from both inputs. */
  def intervalJoin(points: DataFrame, valueCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      widthMicros: Long): DataFrame = {
    // integer `div`, not double `/`: a double quotient that rounds up
    // across an integer boundary would misbucket a row and silently
    // drop a match
    def bucketOf(c: String): Column =
      expr(s"unix_micros(cast($c as timestamp)) div ${widthMicros}L")
    val iv = intervals.withColumn("bucket",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    val pt = points.withColumn("bucket", bucketOf(valueCol))
    pt.join(iv, Seq("bucket"))
      .filter(col(valueCol) >= col(startCol) && col(valueCol) <= col(endCol))
      .drop("bucket")
  }
}
