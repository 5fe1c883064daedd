package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Record linkage: fuzzy self-join on string similarity with blocking.
  *
  * The naive fuzzy join is O(n²) comparisons — unusable at corpus
  * scale. Blocking restricts candidate pairs to rows sharing a cheap
  * deterministic key (here: caller-chosen block columns, e.g. brand,
  * zip, soundex), which turns the comparison into a per-block
  * self-equi-join: one shuffle on the block key, quadratic only within
  * blocks. Skewed blocks are the operator's hazard; pair it with
  * [[Salting]] diagnostics when block sizes are unbounded.
  *
  * Extends the engine's dedup family ([[Dedup]]) with the classic
  * edit-distance matcher used for entity resolution in data cleaning.
  */
object Linkage {

  /** All pairs (id_a < id_b) within the same block whose edit distance
    * is ≤ `maxDist`. Output: block cols, id_a, id_b, dist. */
  def fuzzySelfJoin(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    val a = df.select(
      blockCols.map(col) :+ col(idCol).as("id_a") :+ col(textCol).as("t_a"): _*)
    val b = df.select(
      blockCols.map(col) :+ col(idCol).as("id_b") :+ col(textCol).as("t_b"): _*)
    a.join(b, blockCols)
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(blockCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("dist"): _*)
  }
}
