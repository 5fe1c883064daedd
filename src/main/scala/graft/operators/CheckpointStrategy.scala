package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for iterative operators ([[Graph.pageRank]],
  * [[Corpus.connectedComponents]]).
  *
  * Each iteration of a fixed-point loop grows the logical plan; without
  * a cut the optimizer re-analyzes an ever-deeper tree and recovery
  * replays every pass. The two cut mechanics trade speed for fault
  * tolerance:
  *
  *  - [[CheckpointStrategy.Local]] pins executor storage blocks —
  *    fastest, but blocks die with their executor, so a lost executor
  *    kills the job past the cut point. Right for local mode and short
  *    loops.
  *  - [[CheckpointStrategy.Dfs]] writes to reliable (distributed)
  *    storage via the SparkContext checkpoint dir — survives executor
  *    loss; the right choice for long iterative jobs on a 1000-executor
  *    cluster where some executor loss per hour is the expected case.
  */
sealed trait CheckpointStrategy {
  /** Materialize `df` and cut its lineage. `eager = false` defers the
    * materialization to the first downstream action. */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame
}

object CheckpointStrategy {

  /** Executor-block checkpoint (`Dataset.localCheckpoint`). */
  case object Local extends CheckpointStrategy {
    def cut(df: DataFrame, eager: Boolean): DataFrame =
      df.localCheckpoint(eager)
  }

  /** Reliable checkpoint (`Dataset.checkpoint`) into `dir`. Sets the
    * SparkContext checkpoint dir if it isn't already `dir` (global,
    * like the mechanism itself). */
  final case class Dfs(dir: String) extends CheckpointStrategy {
    def cut(df: DataFrame, eager: Boolean): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint(eager)
    }
  }
}
