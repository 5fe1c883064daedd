package graft.connector

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Plan-evidence helper for specs and oracle queries: the number of
  * InputPartitions the graft scan actually scheduled — i.e. the files
  * NOT skipped at planning time (or 1 for a metadata-answered
  * aggregate). Descends through adaptive wrappers and query stages,
  * which present as leaves to the standard collectors. */
object GraftPlanInspect {
  private def findScan(p: SparkPlan): Option[BatchScanExec] = p match {
    case b: BatchScanExec => Some(b)
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case q: QueryStageExec => findScan(q.plan)
    case other => other.children.iterator.flatMap(findScan(_)).nextOption()
  }

  /** Counts the graft scan's SCHEDULED file slices in an
    * ALREADY-EXECUTED `df` — `partitions()` reflects runtime
    * (join-pushed) filtering, where `inputPartitions` would report the
    * pre-filter plan. Slices, not tasks: bin-packing coalesces small
    * files into shared tasks, and the skipping evidence these counts
    * exist for is "how many FILES were scheduled". −1 = no graft scan
    * found. Callers that collected `df` use this directly so evidence
    * never re-executes the query (the q196 lesson). */
  def scanPartitionsOf(df: DataFrame): Int =
    findScan(df.queryExecution.executedPlan)
      .map(_.partitions.map(_.map {
        case g: GraftSlicesHolder => g.slices.size
        case _ => 1
      }.sum).sum).getOrElse(-1)

  /** The number of scan TASKS (bin-packed partitions) — the
    * scheduling-granularity evidence, distinct from the per-file
    * counts above. */
  def scanTasksOf(df: DataFrame): Int =
    findScan(df.queryExecution.executedPlan)
      .map(_.partitions.map(_.length).sum).getOrElse(-1)

  /** Total SCHEDULED slice bytes of the executed `df`'s graft scan —
    * the row-group-skipping evidence: a pruned scan schedules fewer
    * bytes than the file's physical size. −1 = no graft scan, or a
    * scan containing unknown-size whole-file slices (length sentinel
    * Long.MaxValue — summing those would overflow to garbage). */
  def scanSliceBytesOf(df: DataFrame): Long =
    findScan(df.queryExecution.executedPlan).map { scan =>
      val slices = scan.partitions.toSeq.flatMap(_.toSeq.flatMap {
        case g: GraftSlicesHolder => g.slices
        case _ => Nil
      })
      if (slices.exists(_.length == Long.MaxValue)) -1L
      else slices.map(_.length).sum
    }.getOrElse(-1L)

  /** Executes `df` (finalizing any adaptive plan), then counts. */
  def scanPartitions(df: DataFrame): Int = {
    df.collect()
    scanPartitionsOf(df)
  }

  /** True iff the already-executed `df`'s graft scan carries runtime
    * filters (the DPP-style join-key pushdown was injected). */
  def hasRuntimeFiltersOf(df: DataFrame): Boolean =
    findScan(df.queryExecution.executedPlan)
      .exists(_.runtimeFilters.nonEmpty)

  /** Storage-partitioned-join evidence: the executed plan contains at
    * least one join whose subtree has NEITHER a shuffle NOR a
    * broadcast exchange — the co-partitioned scans satisfied the
    * join's distribution directly (Spark's SPJ). */
  def joinExchangeFree(df: DataFrame): Boolean = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val joins = walk(df.queryExecution.executedPlan).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    joins.nonEmpty && joins.forall { j =>
      walk(j).drop(1).forall {
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike =>
          false
        case _: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike =>
          false
        case _ => true
      }
    }
  }

  /** Sum of the EXECUTED parquet scans' `numFiles` metrics — the
    * partition-pruning evidence for hive-layout catalog reads
    * (`inputFiles` reflects the relation listing, not pruning). The
    * df must have been executed already. */
  def parquetFilesScannedOf(df: DataFrame): Long = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics.get("numFiles").map(_.value).getOrElse(0L)
    }.sum
  }
}
