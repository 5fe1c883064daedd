package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins/aggregations on hot keys.
  *
  * At 100 TB a handful of hot join keys (one practice, one NULL-ish
  * MBI, one ubiquitous token) can pin a single reducer. Salting spreads
  * a hot key across `factor` sub-keys: the skewed (large) side gets a
  * random-ish-but-deterministic salt derived from stable row columns,
  * the small side is replicated `factor`× — the join result is
  * IDENTICAL to the unsalted join (verified against a plain-join
  * oracle) but the shuffle distributes.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers
  * sort-merge cases automatically; explicit salting remains the tool
  * for skewed aggregations and broadcast-ineligible lookups.
  */
object Salting {

  /** Deterministic salt in [0, factor): stable hash of `saltSource`
    * columns (pmod of xxhash64 — no RNG, reproducible across retries,
    * which matters for task re-execution correctness). */
  def saltColumn(factor: Int, saltSource: Column*): Column =
    pmod(xxhash64(saltSource: _*), lit(factor.toLong)).cast("int")

  /** Equi-join `large ⋈ small` on `keys`, salted `factor` ways.
    * Result is row-identical to `large.join(small, keys, joinType)`. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      factor: Int, joinType: String = "inner",
      saltSource: Seq[String] = Nil): DataFrame = {
    val src = if (saltSource.nonEmpty) saltSource else large.columns.toSeq
    val saltedLarge = large.withColumn("__salt",
      saltColumn(factor, src.map(large(_)): _*))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedLarge.join(replicatedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Skew-safe global aggregation: partial-aggregate per (key, salt),
    * then final-aggregate per key. For algebraic aggregates (sum/count/
    * min/max) the two-phase result equals the single-phase one. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      factor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      saltColumn(factor, df.columns.map(df(_)).toSeq: _*))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
