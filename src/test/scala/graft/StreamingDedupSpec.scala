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

  test("upsertLatest is idempotent and tolerates out-of-order batches") {
    import graft.catalog.TableCatalog
    import graft.streaming.StreamMaterialize.upsertLatest
    val cat = new TableCatalog(spark, tempDir("smat"))
    val t = "d.s.latest"
    val b1 = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "x"))
      .toDF("k", "seq", "v")
    upsertLatest(cat, t, b1, "k", Seq("seq"))
    def state() = cat.read(t).select("k", "seq", "v")
      .as[(Long, Long, String)].collect().toSet
    val s1 = state()
    assert(s1 == Set((1L, 20L, "b"), (2L, 5L, "x")))
    // replay the same batch — state unchanged (idempotent)
    upsertLatest(cat, t, b1, "k", Seq("seq"))
    assert(state() == s1)
    // late batch with older rows — cannot regress state
    upsertLatest(cat, t, Seq((1L, 15L, "late"), (3L, 1L, "new"))
      .toDF("k", "seq", "v"), "k", Seq("seq"))
    assert(state() == s1 + ((3L, 1L, "new")))
  }

  test("streaming==batch parity holds on BOTH ts physical generations") {
    // The driver has shipped events.parquet with ts as TIMESTAMP(NANOS)
    // (→ LongType under nanosAsLong) and as TIMESTAMP(MICROS,
    // isAdjustedToUTC=false) (→ TimestampNTZType). Regenerate the
    // sf0.001 events in both SURFACED types and assert the streaming
    // hourly agg equals the batch one on each — so a future testdata
    // regeneration cannot silently break the streaming family again
    // (the r4 failure mode). Caveat: Spark cannot WRITE
    // TIMESTAMP(NANOS), so the "legacy_nanos" fixture is a plain INT64
    // nanos column — it exercises the LongType normalization branch
    // (identical to what nanosAsLong surfaces), not the parquet
    // annotation itself.
    import org.apache.spark.sql.types.TimestampNTZType
    val base = Queries.events(spark, "/root/testdata/sf0.001")
      .filter(col("user_id") < 30) // small slice keeps the stream fast
    def writeSingleFile(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
      val stage = dir + "/_stage"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(dir, "events.parquet"))
    }
    val gens = Seq(
      "ntz_micros" -> base.withColumn("ts", col("ts").cast(TimestampNTZType)),
      "legacy_nanos" -> base.withColumn("ts", expr("unix_micros(ts) * 1000")))
    val results = gens.map { case (gen, df) =>
      val dir = tempDir(s"events_gen_$gen")
      writeSingleFile(df, dir)
      // read-back sanity: each generation surfaces as its own raw type
      val rawType = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      if (gen == "ntz_micros") assert(rawType == TimestampNTZType, gen)
      else assert(rawType == org.apache.spark.sql.types.LongType, gen)
      val streamed = graft.streaming.EventStream
        .runHourlyToCompletion(spark, dir, queryName = s"gen_hourly_$gen")
      val batch = graft.streaming.EventStream.hourlyAgg(Queries.events(spark, dir))
      assert(streamed.count() == batch.count(), gen)
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty, gen)
      streamed.collect().map(_.toSeq).toSet
    }
    // cross-generation: nanos floor-div to micros reproduces the micros
    // values exactly, so both generations yield identical results
    assert(results(0) == results(1))
  }

  test("streaming session_window == batch gap sessionization (sf0.001)") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.EventStream
      .runSessionsToCompletion(spark, dir, "sd_sessions")
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().toSet
    // batch twin with session_window boundary semantics (>= gap splits)
    val e = Queries.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val batch = e
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") >= 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("sid",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .collect().toSet
    assert(streamed == batch)
  }
}
