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

  /** Incremental SCD2 maintenance: apply one time-ordered change batch
    * to a catalog-resident dimension. The batch's own intervals come
    * from [[build]]; existing OPEN rows of touched keys are closed to
    * the key's first new timestamp via the catalog's key-pruned MERGE
    * (only files containing touched keys rewrite), then the new
    * intervals append O(batch). Equivalent to a full [[build]] over
    * the concatenated history whenever batches partition time per key
    * (each batch's events strictly after the previous batch's for that
    * key) — the steady-state nightly-dimension-load contract. */
  def mergeBatch(cat: graft.catalog.TableCatalog, table: String,
      batch: DataFrame, keyCol: String, tsCol: String, tiebreakCol: String,
      attrCols: Seq[String]): Unit = {
    val iv = build(batch, keyCol, tsCol, tiebreakCol, attrCols)
    if (cat.version(table).isDefined) {
      val firstNew = iv.groupBy(col(keyCol))
        .agg(min(col("valid_from")).as("__new_from"))
      val closed = cat.read(table)
        .filter(col("is_current") === 1L)
        .join(firstNew, Seq(keyCol))
        .withColumn("valid_to", col("__new_from"))
        .withColumn("is_current", lit(0L))
        .drop("__new_from")
      // merge on (key, tiebreak): same-timestamp ties make valid_from
      // non-unique, the tiebreak column identifies the exact row
      cat.merge(table, closed, Seq(keyCol, tiebreakCol))
    }
    cat.append(table, iv)
  }
}
