package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.config._

/** REFINED-layer transforms: pure (DataFrame, spec) => DataFrame
  * functions compiled to built-in Catalyst expressions (all codegen'd —
  * no UDFs), so predicate pushdown / column pruning / WSCG apply.
  *
  * Semantics follow the reference's refined notebook
  * (reference: SF_Notebooks/RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py).
  */
object RefinedOps {

  /** Case-/punctuation-insensitive column-name normalization:
    * lowercase, then strip non-alphanumerics — in that order, like the
    * reference's `re.sub('[^a-z0-9]', '', name.lower())`. (The reverse
    * order is not idempotent: lowercasing can introduce combining marks,
    * e.g. 'İ' → "i̇", which a later pass would strip differently.)
    * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:399-404 */
  def normName(s: String): String =
    s.toLowerCase.filter(_.isLetterOrDigit)

  /** Resolve a config-declared column name against actual DataFrame
    * columns via normName. First match wins (stable in column order). */
  def resolve(columns: Seq[String], configName: String): Option[String] = {
    val want = normName(configName)
    columns.find(c => normName(c) == want)
  }

  /** Chained conditional regex rewrite: for each rule, rows whose value
    * contains `match_substring` (when present) get
    * regexp_replace(search→replace); rules compose as a when-chain over
    * the running value, exactly one pass over the data.
    * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:412-473 */
  def regexReplaceRules(df: DataFrame, specs: Seq[RegexReplaceSpec]): DataFrame =
    specs.foldLeft(df) { (d, spec) =>
      resolve(d.columns.toSeq, spec.column) match {
        case None => d
        case Some(c) =>
          val rewritten = spec.rules.foldLeft(col(c)) { (acc, r) =>
            val applied = regexp_replace(acc, r.search, r.replace)
            r.matchSubstring match {
              case Some(sub) => when(acc.contains(sub), applied).otherwise(acc)
              case None => applied
            }
          }
          d.withColumn(c, rewritten)
      }
    }

  /** split_by → select parts by part_order (out-of-range → "") → optional
    * trim of each part → join_with. "Last, First" → "First Last".
    * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:478-541 */
  def splitReorder(df: DataFrame, specs: Seq[ReformatSpec]): DataFrame =
    specs.foldLeft(df) { (d, spec) =>
      resolve(d.columns.toSeq, spec.column) match {
        case None => d
        case Some(c) =>
          val parts = split(col(c), java.util.regex.Pattern.quote(spec.splitBy))
          val picked = spec.partOrder.map { i =>
            // try_element_at: out-of-range part → "" (ANSI mode throws on element_at)
            val p = coalesce(try_element_at(parts, lit(i + 1)), lit("")) // 1-based
            if (spec.trimParts) trim(p) else p
          }
          d.withColumn(c, concat_ws(spec.joinWith, picked: _*))
      }
    }

  /** Strip every character in `chars` from the column (character class,
    * not substring). reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:544-590 */
  def columnStrip(df: DataFrame, specs: Seq[StripSpec]): DataFrame =
    specs.foldLeft(df) { (d, spec) =>
      resolve(d.columns.toSeq, spec.column) match {
        case None => d
        case Some(c) =>
          // escape only regex-class metacharacters — a blanket backslash
          // would turn digits into octal escapes
          val cls = "[" + spec.chars.flatMap(ch =>
            if ("\\^]-[&".contains(ch)) "\\" + ch else ch.toString) + "]"
          d.withColumn(c, regexp_replace(col(c), cls, ""))
      }
    }

  /** Uppercase every column name, dropping the given flag columns —
    * the REFINED projection — and sanitize separators (space, '/', '.')
    * to '_' so names stay parquet/SQL-friendly (the reference's Rater8
    * sanitization applied uniformly).
    * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:599-604;
    * Rater8_Reviews.ipynb upload_to_snowflake_merge. */
  def uppercaseProject(df: DataFrame, drop: Set[String] = Set("IS_NEW")): DataFrame = {
    val dropNorm = drop.map(normName)
    val cols = df.columns.toSeq
      .filterNot(c => dropNorm.contains(normName(c)))
      .map(c => col(c).as(c.replaceAll("[ /.]", "_").toUpperCase))
    df.select(cols: _*)
  }

  /** RAW-stage metadata columns for file ingests.
    * reference: RAW_ADLS_TO_RAW_SNOWFLAKE.py:1224-1231 */
  def withRawMetadata(df: DataFrame, parentRunId: String, markNew: Boolean,
      fileName: Column = input_file_name()): DataFrame = {
    val base = df
      .withColumn("file_name", fileName)
      .withColumn("file_load_time", current_timestamp())
      .withColumn("PARENT_RUN_ID", lit(parentRunId))
    if (markNew) base.withColumn("IS_NEW", lit(1)) else base
  }

  /** REFINED-stage metadata: IS_VALID=1 + run id.
    * reference: RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:679-683 */
  def withRefinedMetadata(df: DataFrame, runId: String): DataFrame =
    df.withColumn("IS_VALID", lit(1))
      .withColumn("REFINED_PARENT_RUN_ID", lit(runId))

  /** Full REFINED transform chain for one ingest spec. */
  def refinedTransform(df: DataFrame, t: TargetSpec): DataFrame = {
    val a = regexReplaceRules(df, t.regexReplace)
    val b = splitReorder(a, t.reformat)
    val c = columnStrip(b, t.columnStrip)
    uppercaseProject(c)
  }
}
