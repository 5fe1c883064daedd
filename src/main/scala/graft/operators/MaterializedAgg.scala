package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a grouped-aggregate materialized view:
  * the view stores partial states (count + sums per key); a refresh
  * folds a new delta batch in by re-aggregating view ∪ delta-aggregate.
  *
  * COUNT and SUM are commutative monoids, so `refresh(refresh(∅, b1),
  * b2) == aggregate(b1 ∪ b2)` exactly — with DECIMAL sums the equality
  * is bit-exact at any batch split or parallelism. Cost per refresh is
  * O(|delta| + |view|) with a single shuffle on the group key — never
  * a re-scan of the base table, which is the point at 100 TB (AVG and
  * friends derive from the stored count/sum pair at read time).
  */
object MaterializedAgg {

  /** Aggregate one delta batch to the view's shape. */
  def aggregate(delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c)).as(s"sum_$c")): _*)

  /** Fold an aggregated delta into the current view (None = empty). */
  def refresh(current: Option[DataFrame], delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val deltaAgg = aggregate(delta, keys, sumCols)
    current match {
      case None => deltaAgg
      case Some(view) =>
        view.unionByName(deltaAgg)
          .groupBy(keys.map(col): _*)
          .agg(sum(col("n")).as("n"),
            sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
    }
  }

  /** The delta rows of a two-table append-only equi-join view:
    *
    *   Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB
    *
    * (A, B are the pre-batch states). Feed the result to [[refresh]]
    * to maintain an aggregate over the join without ever re-running
    * A ⋈ B: each refresh costs two delta-sized joins against the base
    * tables plus one delta×delta join — at 100 TB the bases are only
    * probed on the delta's keys (a broadcast or DPP-pruned probe when
    * the delta is small), never re-joined wholesale. */
  def joinDelta(baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame, keys: Seq[String]): DataFrame =
    deltaA.join(baseB, keys)
      .unionByName(baseA.join(deltaB, keys))
      .unionByName(deltaA.join(deltaB, keys))
}
