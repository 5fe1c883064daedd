package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.config._
import graft.streaming.IncrementalRefined

class IncrementalStreamSpec extends SparkTestBase {
  import spark.implicits._

  private val target = TargetSpec(
    rawTable = None, loadMode = "append", refinedTable = None,
    regexReplace = Seq(RegexReplaceSpec("status", Seq(
      RegexRule(None, "ok", "GOOD")))),
    reformat = Nil, columnStrip = Nil,
    curatedTable = None, curatedMapping = Nil, curatedLookup = None,
    sourceFilter = Nil, sync = None)

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("status", StringType)))

  test("checkpointed stream consumes each RAW file exactly once across restarts") {
    val rawDir = tempDir("raw")
    val refinedDir = tempDir("refined")
    val ckpt = tempDir("ckpt")

    Seq((1L, "ok"), (2L, "bad")).toDF("id", "status")
      .coalesce(1).write.mode("append").parquet(rawDir)
    IncrementalRefined.drainOnce(spark, rawDir, refinedDir, ckpt, target, schema, "r1")

    val first = spark.read.parquet(refinedDir)
    assert(first.count() == 2)
    // refined transform applied + metadata attached
    assert(first.columns.toSet == Set("ID", "STATUS", "IS_VALID", "REFINED_PARENT_RUN_ID"))
    assert(first.filter(col("STATUS") === "GOOD").count() == 1)

    // second batch of files: only the new rows flow (exactly-once)
    Seq((3L, "ok")).toDF("id", "status")
      .coalesce(1).write.mode("append").parquet(rawDir)
    IncrementalRefined.drainOnce(spark, rawDir, refinedDir, ckpt, target, schema, "r2")
    val second = spark.read.parquet(refinedDir)
    assert(second.count() == 3) // not 5 — first files not reprocessed

    // drain with no new input is a no-op
    IncrementalRefined.drainOnce(spark, rawDir, refinedDir, ckpt, target, schema, "r3")
    assert(spark.read.parquet(refinedDir).count() == 3)
  }
}
