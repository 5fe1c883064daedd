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

  /** Token-set similarity self-join at Jaccard ≥ num/den via the
    * PREFIX-FILTER principle (PPJoin family): two sets with Jaccard ≥ t
    * must share a token within the first |A| − ⌈t·|A|⌉ + 1 of their
    * tokens when both are ordered rare-first — so candidates are pairs
    * sharing any PREFIX token, not any token. Against plain
    * token-blocking this shrinks candidate generation by the frequency
    * of the common tokens (the "the"-block never forms); against
    * LSH ([[Dedup.lshCandidates]]) it is exact — zero false negatives —
    * at the cost of frequency-ordered prefixes (one extra broadcast of
    * the token-frequency table).
    *
    * Plan: token explode → global freq count (combine shuffle) →
    * rare-first rank broadcast back → prefix filter scan-locally →
    * candidate equi-join on prefix token → exact Jaccard verify on
    * candidates ([[Dedup.pairJaccardTerms]]). Output: id_a, id_b,
    * inter, size_a, size_b (id_a < id_b). */
  def setSimilarityJoin(df: DataFrame, idCol: String, textCol: String,
      thresholdNum: Int, thresholdDen: Int): DataFrame = {
    val terms = df.select(col(idCol).as("id"),
      explode(array_distinct(graft.functions.TextFunctions.tokens(
        lower(col(textCol))))).as("term"))
    val freq = terms.groupBy(col("term")).agg(count(lit(1)).as("__f"))
    // rare-first total order (freq, then term) — identical everywhere
    val ranked = terms.join(broadcast(freq), Seq("term"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("__f").asc, col("term").asc)
    val withPos = ranked
      .withColumn("__pos", row_number().over(w))
      .withColumn("__n", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("id"))))
    // prefix length = n − ⌈t·n⌉ + 1 = n − ((n·num + den − 1) div den) + 1
    val prefix = withPos.filter(
      col("__pos") <=
        col("__n") - expr(s"(__n * $thresholdNum + ${thresholdDen - 1}) div $thresholdDen") + 1)
      .select(col("id"), col("term"))
    val cand = prefix.select(col("term"), col("id").as("id_a"))
      .join(prefix.select(col("term"), col("id").as("id_b")), Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    Dedup.pairJaccardTerms(terms, cand)
      .filter(col("inter") * thresholdDen >=
        (col("size_a") + col("size_b") - col("inter")) * thresholdNum)
  }
}
