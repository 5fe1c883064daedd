package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands: merge overlapping/adjacent intervals per key.
  *
  * Classic two-window formulation — a running max of interval ends
  * marks island starts, a running sum of start-flags numbers the
  * islands, then one group-by collapses each island. Both windows and
  * the final aggregation share a single hash partitioning on the key,
  * so the whole operator costs one shuffle at any scale; per-key state
  * is a sort, never a materialized pairwise comparison.
  */
object Intervals {

  /** @param df       rows with one interval [startCol, endCol) per row
    * @return one row per merged island:
    *         (key, island, island_start, island_end, n_rows)
    *
    * Ties on (start, end) are interchangeable: whichever sorts first
    * opens the island and the rest fall in — min/max/count over the
    * island are order-independent, so output is deterministic. */
  /** Dense sequential ids 0..n−1 in (keyCol, idCol) order, without a
    * single-partition global sort — the relational zipWithIndex.
    * Same bucketed decomposition as [[sequenceGaps]]: rows sort WITHIN
    * their `keyCol div bucketSize` bucket (parallel windows), bucket
    * offsets come from a cumulative sum over the |buckets|-row count
    * summary, and seq_id = offset + local rank − 1. Deterministic under
    * duplicate keys via the unique idCol tie-break. */
  def denseIds(df: DataFrame, keyCol: String, idCol: String,
      bucketSize: Long = 1L << 20): DataFrame = {
    val bucketed = df.withColumn("__b", expr(s"$keyCol div ${bucketSize}L"))
    val local = Window.partitionBy(col("__b"))
      .orderBy(col(keyCol), col(idCol))
    val counts = bucketed.groupBy(col("__b"))
      .agg(count(lit(1)).as("__n"))
    val offs = counts // |buckets| rows — the tiny seam table
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__b"), col("__off"))
    bucketed
      .withColumn("__rk", row_number().over(local).cast("long"))
      .join(broadcast(offs), Seq("__b"))
      .withColumn("seq_id", col("__off") + col("__rk") - 1L)
      .drop("__b", "__rk", "__off")
  }

  /** Dense sequential ids 0..n−1 in lexicographic `orderCols` order for
    * ARBITRARY (non-numeric) sort keys, without a single-partition
    * global sort: range-partition on the keys (disjoint, ordered
    * ranges), rank locally within each partition, then add
    * per-partition offsets from the |partitions|-row count summary
    * (broadcast). `orderCols` must end in a unique tie-break column so
    * the total order — and therefore every seq_id — is independent of
    * where the sampled range boundaries happen to fall.
    *
    * The counts branch and the ranking branch both consume `parted`;
    * their offsets agree because Spark reuses the identical range
    * exchange (spark.sql.exchange.reuse, on by default) — one sampling
    * pass feeds both. Even with reuse disabled the boundaries still
    * agree in practice (RangePartitioner's reservoir sampling is
    * seeded per input partition, so two plans over the same source
    * sample identically), but reuse is the by-construction guarantee;
    * callers that disable it should localCheckpoint `df` first. */
  def denseIdsOrdered(df: DataFrame, orderCols: Seq[String],
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(n, orderCols.map(col): _*)
      .withColumn("__p", spark_partition_id())
    val local = Window.partitionBy(col("__p"))
      .orderBy(orderCols.map(col): _*)
    val counts = parted.groupBy(col("__p")).agg(count(lit(1)).as("__n"))
    val offs = counts // |partitions| rows — the tiny seam table
      .withColumn("__off", coalesce(sum(col("__n")).over(
        Window.orderBy(col("__p"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__p"), col("__off"))
    parted
      .withColumn("__rk", row_number().over(local).cast("long"))
      .join(broadcast(offs), Seq("__p"))
      .withColumn("seq_id", col("__off") + col("__rk") - 1L)
      .drop("__p", "__rk", "__off")
  }

  /** Missing ranges in an integer key sequence, without a global sort.
    *
    * A single `lag` over all keys needs one totally-ordered partition —
    * fine at test scale, a straggler at 10¹⁰ keys. Instead: bucket keys
    * by `key div bucketSize` so the lag window partitions (in-bucket
    * gaps parallelize perfectly), then close the seams with a second
    * window over the per-bucket (min, max) summary — |buckets| rows, a
    * driver-trivial table. Exactly the local-work + tiny-boundary-fix
    * decomposition used for merge-sort joins.
    *
    * @return (gap_start, gap_end, gap_len) for every maximal missing
    *         run strictly inside [min(key), max(key)] */
  def sequenceGaps(df: DataFrame, keyCol: String,
      bucketSize: Long = 1L << 20): DataFrame = {
    val keys = df.select(col(keyCol).cast("long").as("__k")).distinct()
      .withColumn("__b", expr(s"__k div $bucketSize"))
    val inBucket = Window.partitionBy(col("__b")).orderBy(col("__k"))
    val local = keys
      .withColumn("__prev", lag(col("__k"), 1).over(inBucket))
      .filter(col("__k") - col("__prev") > 1L)
      .select((col("__prev") + 1L).as("gap_start"),
        (col("__k") - 1L).as("gap_end"))
    val summary = keys.groupBy(col("__b"))
      .agg(min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
    val seam = Window.orderBy(col("__b")) // |buckets| rows only
    val boundary = summary
      .withColumn("__prevHi", lag(col("__hi"), 1).over(seam))
      .filter(col("__lo") - col("__prevHi") > 1L)
      .select((col("__prevHi") + 1L).as("gap_start"),
        (col("__lo") - 1L).as("gap_end"))
    local.unionByName(boundary)
      .withColumn("gap_len", col("gap_end") - col("gap_start") + 1L)
  }

  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
    val prevMaxEnd = max(col(endCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevMaxEnd.isNull || col(startCol) > prevMaxEnd, 1L)
      .otherwise(0L)
    df.select(col(keyCol), col(startCol), col(endCol))
      .withColumn("__new", newIsland)
      .withColumn("island", sum(col("__new"))
        .over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_rows"))
  }
}
