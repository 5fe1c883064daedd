package graft

import org.apache.spark.sql.functions._
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.Keyed

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("first-seen dedup suppresses replays across micro-batches") {
    val dir = tempDir("sdedup")
    // batch 1: keys 1,2 (2 twice within the batch)
    Seq(Keyed(1L, "a", 100L), Keyed(2L, "b", 110L), Keyed(2L, "b-dup", 120L))
      .toDF().coalesce(1).write.mode("append").parquet(dir)
    val out1 = StreamingDedup.runToCompletion(spark, dir, "sd_t1", stateTtlMs = 0)
    assert(out1.count() == 2)
    assert(out1.filter(col("key") === 2L).select("payload").as[String].head() == "b")

    // new files: replay of 1 and 2, plus new key 3 — a fresh run over
    // all files still emits each key exactly once
    Seq(Keyed(1L, "a-replay", 200L), Keyed(3L, "c", 210L))
      .toDF().coalesce(1).write.mode("append").parquet(dir)
    val out2 = StreamingDedup.runToCompletion(spark, dir, "sd_t2", stateTtlMs = 0)
    assert(out2.count() == 3)
    assert(out2.select("key").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // key 1 kept its first payload, not the replay
    assert(out2.filter(col("key") === 1L).select("payload").as[String].head() == "a")
  }
}
