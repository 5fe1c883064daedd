package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass data profiling: per-column null count, exact distinct
  * count, and min/max, over any DataFrame. One wide aggregate (Spark
  * plans multi-distinct aggregates via expand, still a single scan of
  * the data) followed by a driver-free inline() unpivot into one row
  * per column — the standard first step of any 100 TB data-quality
  * audit.
  *
  * Min/max are rendered engine-portably: integral columns as plain
  * digits, floating columns via DECIMAL(18,2) (fixed-point — avoids
  * scientific-notation divergence between engines), strings as-is.
  */
object Profiler {

  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    val cols = if (columns.nonEmpty) columns else df.schema.fieldNames.toSeq

    def render(c: String) = df.schema(c).dataType match {
      case _: DoubleType | _: FloatType | _: DecimalType =>
        (x: org.apache.spark.sql.Column) => x.cast(DecimalType(18, 2)).cast("string")
      case _ => (x: org.apache.spark.sql.Column) => x.cast("string")
    }

    val aggs = cols.flatMap { c =>
      val r = render(c)
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        r(min(col(c))).as(s"__min_$c"),
        r(max(col(c))).as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_repr"),
        col(s"__max_$c").as("max_repr"))
    }
    one.select(inline(array(structs: _*)))
  }

  /** Heavy-hitter skew report: the top `topN` keys by frequency with
    * their permille share of all rows (integer-exact). This is the
    * diagnostic that decides when a join/agg needs [[Salting]] — a key
    * holding tens of permille of a 100 TB table is a straggler task
    * waiting to happen. Two aggregates, one shuffle on the key. */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    // total = Σ per-key counts — derived from `counts` (whose shuffle
    // the reused-exchange rule computes once), never a second scan of
    // the raw input
    val total = counts.agg(sum(col("n")).as("__total"))
    // distributed TakeOrdered first; the global rank window then only
    // ever sees topN rows, not one row per key (billions at scale)
    val top = counts.orderBy(col("n").desc +: keyCols.map(col): _*).limit(topN)
    val w = Window.orderBy(col("n").desc +: keyCols.map(col): _*)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(total))
      .withColumn("share_permille",
        floor(col("n") * 1000L / col("__total")).cast("long"))
      .drop("__total")
  }
}
