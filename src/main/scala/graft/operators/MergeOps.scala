package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-upsert semantics over immutable storage: WHEN MATCHED UPDATE
  * all columns / WHEN NOT MATCHED INSERT, re-expressed relationally as
  * source ∪ (target ⟕anti source) — no row-at-a-time driver loop, scales
  * as one shuffle (or broadcast anti-join when the source is small).
  *
  * reference: SF_Notebooks/Rater8_Reviews.ipynb (run_merge /
  * upload_to_snowflake_merge — temp table + MERGE INTO on keys).
  */
object MergeOps {

  /** Upsert `source` into `target` on `keys`; source rows win. */
  def upsert(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge keys required")
    val kept = target.join(source.select(keys.map(col): _*).distinct(), keys, "left_anti")
    source.unionByName(kept.select(source.columns.map(col): _*))
  }

  /** Merge with a small source: broadcast the key side of the anti join
    * so the large target never shuffles. */
  def upsertBroadcast(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge keys required")
    val kept = target.join(broadcast(source.select(keys.map(col): _*).distinct()),
      keys, "left_anti")
    source.unionByName(kept.select(source.columns.map(col): _*))
  }
}
