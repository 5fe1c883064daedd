package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.config.TargetSpec
import graft.operators.RefinedOps

/** Streaming-native incremental RAW→REFINED: the honest Spark
  * equivalent of the reference's `IS_NEW` flag machine (SURVEY §2.9).
  *
  * The batch pipeline reproduces the reference faithfully (flag
  * columns + copy-on-write clears). This variant replaces the flags
  * with a checkpointed file-source stream: each RAW file is consumed
  * exactly once — across restarts — with no table rewrites at all,
  * which is the right trade at 100 TB (the flag-clear rewrite cost
  * disappears; the checkpoint tracks progress instead).
  */
object IncrementalRefined {

  /** Start the continuous RAW→REFINED stream. RAW is an append-only
    * directory of parquet files (`rawDir` may be a glob, e.g. a
    * catalog table's `v_*` version dirs); REFINED accumulates
    * transformed appends. Exactly-once is the checkpoint's
    * responsibility. `pathGlobFilter` restricts to matching file names
    * within the dir. */
  def start(spark: SparkSession, rawDir: String, refinedDir: String,
      checkpointDir: String, target: TargetSpec, rawSchema: StructType,
      runId: String, pathGlobFilter: Option[String] = None): StreamingQuery = {
    val reader = spark.readStream.schema(rawSchema)
    val withGlob = pathGlobFilter.fold(reader)(g => reader.option("pathGlobFilter", g))
    val raw = withGlob.parquet(rawDir)
    val refined = RefinedOps.withRefinedMetadata(
      RefinedOps.refinedTransform(raw, target), runId)
    refined.writeStream
      .format("parquet")
      .option("path", refinedDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()) // drain what's there, then stop
      .start()
  }

  /** Run one incremental drain to completion (Trigger.AvailableNow):
    * processes only files not yet recorded in the checkpoint. */
  def drainOnce(spark: SparkSession, rawDir: String, refinedDir: String,
      checkpointDir: String, target: TargetSpec, rawSchema: StructType,
      runId: String, pathGlobFilter: Option[String] = None): Unit = {
    val q = start(spark, rawDir, refinedDir, checkpointDir, target, rawSchema,
      runId, pathGlobFilter)
    try q.awaitTermination() finally if (q.isActive) q.stop()
  }
}
