package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 build: turn an event/change log
  * into validity-interval rows (valid_from, valid_to, is_current) per
  * key. One shuffle on the key + one in-partition sort — the lead()
  * window never crosses keys, so the plan is a single exchange at any
  * scale. Ordering is made total with a tiebreak column so results are
  * deterministic under duplicate timestamps.
  */
object Scd2 {

  val OpenEnd = "9999-01-01 00:00:00"

  def build(df: DataFrame, keyCol: String, tsCol: String, tiebreakCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreakCol))
    val nextTs = lead(col(tsCol), 1).over(w)
    df.select((keyCol +: tiebreakCol +: attrCols).map(col) :+ col(tsCol): _*)
      .withColumn("valid_from", date_format(col(tsCol), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("valid_to",
        coalesce(date_format(nextTs, "yyyy-MM-dd HH:mm:ss"), lit(OpenEnd)))
      .withColumn("is_current",
        when(col("valid_to") === OpenEnd, 1L).otherwise(0L))
      .drop(tsCol)
  }
}
