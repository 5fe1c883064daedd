package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application.
  *
  * Words are symbol SEQUENCES encoded as `'(sym)(sym)…'` strings: each
  * symbol individually wrapped, so applying a merge is one codegen'd
  * `replace` — left-to-right and non-overlapping in every engine, which
  * is exactly BPE's greedy single-pass merge semantics and what makes a
  * DuckDB oracle able to replay training bit-for-bit.
  *
  * Scale shape: training iterates over the |vocab|-sized word-frequency
  * frame (the corpus is scanned once to build it); each of the k
  * iterations is one tiny pair-count aggregation plus one narrow map,
  * with a localCheckpoint lineage cut — the kmeans/PageRank driver-loop
  * pattern. Encoding applies the k learned merges as k chained scalar
  * `replace`s inside the scan stage: corpus-sized but shuffle-free.
  *
  * reference context: the reference ships no tokenizer trainer; this is
  * part of the LLM-pipeline surface (token counting q62 / merge-step
  * counting q197 are the one-shot relatives).
  */
object Bpe {

  /** `'abc'` → `'(a)(b)(c)'`. */
  def wrap(c: Column): Column = regexp_replace(c, "(.)", "($1)")

  /** Symbols in a wrapped string = occurrences of '('. */
  def symbolCount(colName: String): Column =
    expr(s"length($colName) - length(replace($colName, '(', ''))")

  /** One learned merge: (step, lhs, rhs, merged, weighted pair count). */
  final case class Merge(step: Int, lhs: String, rhs: String,
      merged: String, cnt: Long)

  /** Train k merges over a (word, freq) vocabulary: per iteration,
    * count adjacent symbol pairs weighted by word frequency, take the
    * argmax (cnt DESC, pair ASC tie-break), apply it to every word. */
  def trainMerges(spark: SparkSession, words: DataFrame, k: Int,
      wordCol: String = "w", freqCol: String = "f"): Seq[Merge] = {
    var vocab = words.select(wrap(col(wordCol)).as("s"),
      col(freqCol).as("f")).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    for (step <- 1 to k) {
      val top = vocab
        .select(col("f"),
          split(expr("substring(s, 2, length(s) - 2)"), "\\)\\(").as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("f"), explode(expr(
          "transform(sequence(1, size(a) - 1), " +
            "i -> struct(element_at(a, i) AS x, element_at(a, i + 1) AS y))"))
          .as("p"))
        .groupBy(col("p.x").as("x"), col("p.y").as("y"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("x"), col("y"))
        .limit(1).collect()(0)
      val (a, b) = (top.getString(0), top.getString(1))
      merges += Merge(step, a, b, a + b, top.getLong(2))
      vocab = vocab.withColumn("s",
        expr(s"replace(s, '($a)($b)', '($a$b)')")).localCheckpoint(true)
    }
    merges.toSeq
  }

  /** Apply learned merges (in training order) to a wrapped-string
    * column — k chained scan-local `replace`s, no shuffle. */
  def applyMerges(df: DataFrame, colName: String,
      merges: Seq[Merge]): DataFrame =
    merges.foldLeft(df) { (d, m) =>
      d.withColumn(colName,
        expr(s"replace($colName, '(${m.lhs})(${m.rhs})', '(${m.merged})')"))
    }
}
