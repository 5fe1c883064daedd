package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k (KMV) distinct-count sketches with exact, engine-portable
  * arithmetic.
  *
  * The sketch of a set is its k smallest DISTINCT 60-bit hash values
  * (md5 prefix). It is a commutative monoid — merge = union-then-trim —
  * so sketches of partitions/groups combine associatively, and the
  * distinct-count estimate is the classic KMV (k−1)·space/kth. Both the
  * sketch and the estimate are deterministic integers: unlike HLL
  * (q45's ±5%-bound gate), this sketch hash-matches an oracle exactly.
  *
  * The aggregation buffer is capped at k entries and dedupes on
  * insert, so map-side partial aggregation sends at most k values per
  * group per partition into the shuffle — the bounded-state shape that
  * makes sketching worthwhile at 100 TB (same discipline as
  * [[TopK.BoundedTopK]]).
  */
object Sketches {

  /** Keep the k smallest distinct longs. Buffer sorted ascending. */
  final class BottomKDistinct(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.size >= k && a >= b.last) b
      else if (b.contains(a)) b
      else ((b :+ a).sorted).take(k)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.take(k)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** 60-bit hash: first 15 hex digits of md5 of the value's string
    * form — portable to any engine that has md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Per-group sketches plus a merged '__all' row proving the monoid:
    * (group, kth_hash, n_sketch, est_distinct). Estimate is the KMV
    * (k−1)·2³⁰ div (kth»30 + 1) — exact integer arithmetic,
    * overflow-safe (kth < 2⁶⁰); groups with fewer than k distinct
    * values report their exact size. */
  def bottomKSketch(spark: SparkSession, df: DataFrame, groupCol: String,
      valueCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val hashed = df.select(col(groupCol).cast("string").as("g"),
      hash60(col(valueCol)).as("h")).as[(String, Long)]
    val sketches = hashed.groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKDistinct(k).toColumn.name("sk"))
      .toDF("g", "sk")
    val merged = sketches
      .select(explode(col("sk")).as("h"))
      .as[Long].groupByKey(_ => "__all").mapValues(identity)
      .agg(new BottomKDistinct(k).toColumn.name("sk"))
      .toDF("g", "sk")
    sketches.unionByName(merged)
      .withColumn("kth_hash",
        element_at(col("sk"), least(lit(k), size(col("sk")))))
      .withColumn("n_sketch", size(col("sk")).cast("long"))
      .withColumn("est_distinct",
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(
            s"(${k - 1}L * 1073741824L) div ((kth_hash div 1073741824L) + 1L)")))
      .select(col("g").as(groupCol), col("kth_hash"), col("n_sketch"),
        col("est_distinct"))
  }
}
