package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Change-data-capture apply: collapse an ordered change log
  * (key, sequence, op ∈ {I,U,D}, payload…) into the final snapshot —
  * last writer wins per key, a trailing delete removes the key.
  *
  * This is the set-oriented generalization of the reference's
  * IS_NEW/IS_VALID flag machine (SURVEY §1.1.6): instead of mutating
  * flags per batch, the whole history collapses in one window pass —
  * a single shuffle on the key, no iteration, no driver state. At
  * 100 TB the changelog is partitioned by key range and each partition
  * collapses independently; combined with [[graft.catalog.TableCatalog#merge]]
  * it yields incremental snapshot maintenance.
  */
object Cdc {

  /** Collapse `changes` to the live snapshot. `seqCol` must totally
    * order changes within a key; same-seq ties break by the op column
    * ASCENDING, so 'D' (< 'I' < 'U' lexicographically) wins over an
    * insert/update at the same sequence — a tied delete removes the
    * key, the conservative choice. */
  def applyChanges(changes: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).asc)
    changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .filter(col(opCol) =!= "D")
      .drop("rn")
  }
}
