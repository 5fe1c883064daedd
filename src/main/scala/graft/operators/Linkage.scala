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
    * is ≤ `maxDist`. Output: block cols, id_a, id_b, dist.
    *
    * The expensive DP kernel runs once per distinct *(block, value)*
    * pair, never per row pair: real datasets repeat values (names,
    * addresses, normalized strings), so the comparison space collapses
    * from Σ|block|² row pairs to Σ|distinct-in-block|² — the result
    * then rebuilds via two equi-joins on (block, value), which Catalyst
    * broadcasts/shuffles like any join. A length-band filter rejects
    * candidate value pairs before the kernel (|len a − len b| > k ⇒
    * dist > k).
    *
    * `maxBlockDistinct` caps the per-block distinct-value count: blocks
    * above the cap are excluded from matching entirely (quadratic cost
    * bound — one runaway block, e.g. a catch-all "UNKNOWN" zip, would
    * otherwise dominate the whole job). Documented recall trade; pick
    * blocking keys so real blocks stay under it. */
  def fuzzySelfJoin(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxDist: Int,
      maxBlockDistinct: Int = Int.MaxValue): DataFrame = {
    val bc = blockCols.map(col)
    val allNames = df.select(bc :+ col(textCol).as("t_a"): _*).distinct()
    val names =
      if (maxBlockDistinct == Int.MaxValue) allNames
      else {
        val small = allNames.groupBy(bc: _*).agg(count(lit(1)).as("__bsz"))
          .filter(col("__bsz") <= maxBlockDistinct).drop("__bsz")
        allNames.join(small, blockCols, "left_semi")
      }
    val namesB = names.withColumnRenamed("t_a", "t_b")
    val pairDist = names.join(namesB, blockCols)
      .filter(abs(length(col("t_a")) - length(col("t_b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")).cast("long"))
      .filter(col("dist") <= maxDist)
    val a = df.select(
      bc :+ col(idCol).as("id_a") :+ col(textCol).as("t_a"): _*)
    val b = df.select(
      bc :+ col(idCol).as("id_b") :+ col(textCol).as("t_b"): _*)
    a.join(pairDist, blockCols :+ "t_a")
      .join(b, blockCols :+ "t_b")
      .filter(col("id_a") < col("id_b"))
      .select(bc :+ col("id_a") :+ col("id_b") :+ col("dist"): _*)
  }
}
