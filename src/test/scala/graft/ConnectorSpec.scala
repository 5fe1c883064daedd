package graft

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.catalog.TableCatalog

/** DataSource V2 connector: pushdown-driven file skipping, physical
  * column pruning, in-reader DV masking, metadata-answered aggregates,
  * and manifest-version micro-batch streaming. */
class ConnectorSpec extends SparkTestBase {
  import spark.implicits._

  private def graftRead(root: String, fq: String): DataFrame =
    spark.read.format("graft").option("root", root).option("table", fq).load()

  /** InputPartitions of the (single) graft scan in the executed plan. */
  private def scanPartitions(df: DataFrame): Int = {
    val n = graft.connector.GraftPlanInspect.scanPartitions(df)
    assert(n >= 0, "no BatchScanExec in plan")
    n
  }

  private def freshTable(prefix: String): (TableCatalog, String, String) = {
    val root = tempDir(prefix)
    (new TableCatalog(spark, root), root, "T.S.C")
  }

  test("batch read round-trips a multi-append table") {
    val (cat, root, t) = freshTable("conn_rt")
    val a = (1L to 500L).map(i => (i, s"s$i", i * 1.5)).toDF("k", "s", "x")
    val b = (501L to 900L).map(i => (i, s"s$i", i * 1.5)).toDF("k", "s", "x")
    cat.overwrite(t, a.repartition(3)); cat.append(t, b.repartition(2))
    val got = graftRead(root, t)
    assert(got.schema.fieldNames.sorted.toSeq == Seq("k", "s", "x"))
    assert(got.count() == 900)
    assert(got.agg(sum("k"), sum("x")).as[(Long, Double)].head() ==
      ((1L to 900L).sum, (1L to 900L).map(_ * 1.5).sum))
  }

  test("range filter skips files via _STATS; results stay exact") {
    val (cat, root, t) = freshTable("conn_skip")
    // three appends with disjoint key ranges → 3+ files with tight stats
    Seq(1L to 300L, 301L to 600L, 601L to 900L).foreach { r =>
      cat.append(t, r.map(i => (i, i * 2.0)).toDF("k", "x").coalesce(1))
    }
    val all = graftRead(root, t)
    val total = scanPartitions(all)
    assert(total >= 3)
    val filtered = graftRead(root, t).filter(col("k") <= 150L)
    assert(scanPartitions(filtered) < total)
    assert(filtered.count() == 150)
    // conjunction: middle range only
    val mid = graftRead(root, t).filter(col("k") > 350L && col("k") < 400L)
    assert(scanPartitions(mid) == 1)
    assert(mid.agg(sum("k")).as[Long].head() == (351L to 399L).sum)
  }

  test("bloom sidecar skips files on equality where stats overlap") {
    val (cat, root, t) = freshTable("conn_bloom")
    // interleaved keys → stats ranges all overlap, only blooms help
    Seq(0, 1, 2).foreach { m =>
      cat.append(t, (1L to 900L).filter(_ % 3 == m)
        .map(i => (i, s"name_$i")).toDF("k", "s").coalesce(1))
    }
    cat.buildBloomIndex(t, "s")
    val probe = graftRead(root, t).filter(col("s") === "name_42")
    assert(scanPartitions(probe) == 1) // only the m=0 file can hold it
    assert(probe.select("k").as[Long].head() == 42L)
  }

  test("deletion vectors mask rows inside the reader — no join in plan") {
    val (cat, root, t) = freshTable("conn_dv")
    cat.overwrite(t, (1L to 1000L).map(i => (i, i % 7)).toDF("k", "f")
      .repartition(4))
    cat.deleteWhereDV(t, col("f") === 3L)
    val got = graftRead(root, t)
    assert(got.count() == (1L to 1000L).count(_ % 7 != 3))
    assert(got.filter(col("f") === 3L).count() == 0)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"DV read must not join:\n$plan")
  }

  test("COUNT/MIN/MAX answer from metadata: single synthetic partition") {
    val (cat, root, t) = freshTable("conn_agg")
    Seq(1L to 400L, 401L to 900L).foreach { r =>
      cat.append(t, r.map(i => (i, i * 1.5)).toDF("k", "x").coalesce(1))
    }
    val agg = graftRead(root, t).agg(
      count(lit(1)).as("n"), min("k").as("mn"), max("x").as("mx"))
    assert(scanPartitions(agg) == 1) // metadata row, zero data files
    assert(agg.as[(Long, Long, Double)].head() == ((900L, 1L, 1350.0)))
    // with outstanding DVs the pushdown must deactivate, result exact
    cat.deleteWhereDV(t, col("k") === 1L)
    val agg2 = graftRead(root, t).agg(count(lit(1)), min("k"))
      .as[(Long, Long)].head()
    assert(agg2 == ((899L, 2L)))
  }

  test("column pruning reaches the reader (projected schema only)") {
    val (cat, root, t) = freshTable("conn_prune")
    cat.overwrite(t, (1L to 100L).map(i => (i, s"s$i", i * 1.0, s"p$i"))
      .toDF("k", "s", "x", "p").coalesce(1))
    val two = graftRead(root, t).select("k", "x")
    assert(two.schema.fieldNames.toSeq == Seq("k", "x"))
    assert(two.agg(sum("x")).as[Double].head() == (1 to 100).map(_ * 1.0).sum)
  }

  test("float-array (embedding) columns round-trip") {
    val (cat, root, t) = freshTable("conn_arr")
    val src = (1L to 50L).map(i =>
      (i, Array(i.toFloat, i * 0.5f, -i.toFloat))).toDF("id", "vec")
    cat.overwrite(t, src.coalesce(1))
    val got = graftRead(root, t).orderBy("id")
      .as[(Long, Array[Float])].collect()
    assert(got.length == 50)
    assert(got(9)._2.toSeq == Seq(10f, 5f, -10f))
  }

  test("streaming: version offsets deliver appends exactly once across restarts") {
    val (cat, root, t) = freshTable("conn_stream")
    cat.overwrite(t, (1L to 100L).map(i => (i, s"v$i")).toDF("k", "s")
      .coalesce(1))
    val ckpt = tempDir("conn_ckpt")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", t).load()
        .writeStream.format("parquet")
        .option("path", s"$root/sink")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); ()
    }
    drain()
    assert(spark.read.parquet(s"$root/sink").count() == 100)
    cat.append(t, (101L to 150L).map(i => (i, s"v$i")).toDF("k", "s")
      .coalesce(1))
    cat.append(t, (151L to 160L).map(i => (i, s"v$i")).toDF("k", "s")
      .coalesce(1))
    drain() // same checkpoint: only the two new commits' files
    val sunk = spark.read.parquet(s"$root/sink")
    assert(sunk.count() == 160) // exactly-once: no re-delivery of v0 rows
    assert(sunk.agg(sum("k")).as[Long].head() == (1L to 160L).sum)
  }

  test("streaming: non-append change fails the stream loudly") {
    val (cat, root, t) = freshTable("conn_stream_ow")
    cat.overwrite(t, (1L to 50L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val ckpt = tempDir("conn_ckpt_ow")
    def drain(): Unit = {
      val q = spark.readStream.format("graft")
        .option("root", root).option("table", t).load()
        .writeStream.format("parquet")
        .option("path", s"$root/sink")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); ()
    }
    drain()
    cat.overwrite(t, (1L to 10L).map(i => (i, i)).toDF("k", "v").coalesce(1))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => String.valueOf(x.getMessage) +: msgs(x.getCause))
    assert(msgs(err).exists(_.contains("non-append change")))
  }

  test("initial streaming snapshot applies current DV masks") {
    val (cat, root, t) = freshTable("conn_stream_dv")
    cat.overwrite(t, (1L to 100L).map(i => (i, i % 5)).toDF("k", "f")
      .coalesce(1))
    cat.deleteWhereDV(t, col("f") === 0L)
    val ckpt = tempDir("conn_ckpt_dv")
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", t).load()
      .writeStream.format("parquet")
      .option("path", s"$root/sink")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(s"$root/sink").count() ==
      (1L to 100L).count(_ % 5 != 0))
  }

  test("runtime filtering: broadcast dim key set prunes fact files") {
    val (cat, root, t) = freshTable("conn_rtf")
    Seq(1L to 300L, 301L to 600L, 601L to 900L).foreach { r =>
      cat.append(t, r.map(i => (i, i * 2.0)).toDF("k", "x").coalesce(1))
    }
    // selective dim predicate → keys all within the first file's range
    val dim = spark.range(1, 901).toDF("dk").filter(col("dk") % 100 === 0 &&
      col("dk") <= 300)
    val fact = graftRead(root, t)
    val joined = fact.join(broadcast(dim), fact("k") === dim("dk"))
    assert(joined.collect().length == 3) // 100, 200, 300
    assert(graft.connector.GraftPlanInspect.hasRuntimeFiltersOf(joined),
      "optimizer did not inject a runtime filter")
    assert(graft.connector.GraftPlanInspect.scanPartitionsOf(joined) == 1,
      "runtime key set should prune to the single covering file")
  }

  test("DSv2 write: append/overwrite adopt staged files through the commit protocol") {
    val (cat, root, t) = freshTable("conn_write")
    def writeG(df: DataFrame, mode: String): Unit =
      df.write.format("graft").option("root", root).option("table", t)
        .mode(mode).save()
    writeG((1L to 400L).map(i => (i, s"s$i", i * 1.5)).toDF("k", "s", "x")
      .repartition(3), "append") // creates the table
    assert(cat.version(t).contains(0))
    assert(cat.read(t).count() == 400)
    val before = cat.dataFilePaths(t).toSet
    writeG((401L to 500L).map(i => (i, s"s$i", i * 1.5)).toDF("k", "s", "x")
      .coalesce(1), "append")
    assert(cat.version(t).contains(1))
    // zero-copy append: v0's files carried by reference, one added
    val after = cat.dataFilePaths(t).toSet
    assert(before.subsetOf(after) && after.size == before.size + 1)
    val got = graftRead(root, t)
    assert(got.count() == 500)
    assert(got.agg(sum("k")).as[Long].head() == (1L to 500L).sum)
    // stats harvested at the staged commit → metadata agg pushdown works
    val agg = graftRead(root, t).agg(count(lit(1)), min("k"), max("x"))
    assert(scanPartitions(agg) == 1)
    assert(agg.as[(Long, Long, Double)].head() == ((500L, 1L, 750.0)))
    // overwrite restarts the chain; a new schema is legal
    writeG((1L to 10L).map(i => (i, i * 3L)).toDF("a", "b").coalesce(1),
      "overwrite")
    assert(cat.read(t).columns.sorted.toSeq == Seq("a", "b"))
    assert(cat.read(t).count() == 10)
    // append with a drifted schema fails loudly
    val err = intercept[Exception] {
      writeG((1L to 5L).map(i => (i, s"z$i")).toDF("k", "zz"), "append")
    }
    assert(err.getMessage.contains("does not match table schema"))
  }

  test("DSv2 write round-trips timestamps, dates and float arrays") {
    val (cat, root, t) = freshTable("conn_write_types")
    val src = (1L to 30L).map { i =>
      (i, java.sql.Timestamp.valueOf(s"2026-01-${(i % 28) + 1} 12:00:00"),
        java.sql.Date.valueOf(s"2026-02-${(i % 28) + 1}"),
        Array(i.toFloat, -i.toFloat))
    }.toDF("id", "ts", "d", "vec")
    src.write.format("graft").option("root", root).option("table", t)
      .mode("append").save()
    // back through BOTH readers: Spark's parquet scan and the connector
    val viaCatalog = cat.read(t).orderBy("id").collect()
    val viaConnector = graftRead(root, t).orderBy("id").collect()
    val expect = src.orderBy("id").collect()
    assert(viaCatalog.map(_.toString).toSeq == expect.map(_.toString).toSeq)
    assert(viaConnector.map(_.toString).toSeq == expect.map(_.toString).toSeq)
  }

  test("streaming sink: epochs commit exactly once, replay skips via epoch tag") {
    val (cat, root, t) = freshTable("conn_sink")
    val src = tempDir("conn_sink_src")
    (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "x")
      .coalesce(1).write.parquet(s"$src/b0")
    val ckpt = tempDir("conn_sink_ckpt")
    def drain(): Unit = {
      val q = spark.readStream
        .schema("k LONG, x DOUBLE").parquet(s"$src/*")
        .writeStream.format("graft")
        .option("root", root).option("table", t)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000); ()
    }
    drain()
    assert(cat.count(t) == 100)
    (101L to 150L).map(i => (i, i * 2.0)).toDF("k", "x")
      .coalesce(1).write.parquet(s"$src/b1")
    drain()
    assert(cat.count(t) == 150)
    assert(cat.read(t).agg(sum("k")).as[Long].head() == (1L to 150L).sum)
    drain() // nothing new: no empty version committed
    assert(cat.count(t) == 150)
    // idempotent replay: re-committing an already-tagged epoch is a no-op
    val sw = new graft.connector.GraftStreamingWrite(root, t,
      new org.apache.spark.sql.types.StructType(), "q-replay")
    val staged = new org.apache.hadoop.fs.Path(s"$root/_staging/stream-q-replay/7/f.parquet")
    (151L to 160L).map(i => (i, i * 2.0)).toDF("k", "x").coalesce(1)
      .write.parquet(s"$root/tmp_epoch")
    val fs = staged.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/tmp_epoch"))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.mkdirs(staged.getParent); fs.rename(part, staged)
    val msg = Array[org.apache.spark.sql.connector.write.WriterCommitMessage](
      graft.connector.GraftCommitMessage(Seq(staged.toString)))
    sw.commit(7L, msg)
    assert(cat.count(t) == 160)
    sw.commit(7L, msg) // replay of epoch 7: tag found, skipped
    assert(cat.count(t) == 160)
  }

  test("reader-level parquet filter engages when no DV is outstanding") {
    val (cat, root, t) = freshTable("conn_rgfilter")
    cat.overwrite(t, (1L to 2000L).map(i => (i, s"s${i % 10}", i * 1.0))
      .toDF("k", "s", "x").repartition(2))
    val sel = graftRead(root, t)
      .filter(col("k") > 100L && col("k") <= 110L && col("s") === "s5")
    val got = sel.collect()
    assert(got.map(_.getLong(0)).sorted.toSeq ==
      (101L to 110L).filter(_ % 10 == 5).toSeq)
    // with a DV outstanding the same query stays exact (filter off,
    // mask on — the row-index contract)
    cat.deleteWhereDV(t, col("k") === 105L)
    val got2 = graftRead(root, t)
      .filter(col("k") > 100L && col("k") <= 110L).collect()
    assert(got2.map(_.getLong(0)).sorted.toSeq ==
      (101L to 110L).filterNot(_ == 105L).toSeq)
  }

  test("streaming batches skip files via stats when filters are pushed") {
    val (cat, root, t) = freshTable("conn_stream_skip")
    Seq(1L to 300L, 301L to 600L, 601L to 900L).foreach { r =>
      cat.append(t, r.map(i => (i, i * 2.0)).toDF("k", "x").coalesce(1))
    }
    import org.apache.spark.sql.sources.LessThanOrEqual
    val stream = new graft.connector.GraftMicroBatchStream(root, t,
      org.apache.spark.sql.types.StructType.fromDDL("k LONG, x DOUBLE"),
      Array(LessThanOrEqual("k", 300L)), -1)
    val parts = stream.planInputPartitions(
      graft.connector.GraftOffset(-1),
      graft.connector.GraftOffset(cat.version(t).get))
    assert(parts.length == 1) // two of three appended files eliminated
  }

  test("timestamp-range predicates skip files (catalog writes micros, not INT96)") {
    val (cat, root, t) = freshTable("conn_ts_skip")
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2026-03-01 $h%02d:00:00")
    // three time-disjoint commits
    Seq(0 until 8, 8 until 16, 16 until 24).foreach { hrs =>
      cat.append(t, hrs.map(h => (h.toLong, ts(h))).toDF("k", "ts")
        .coalesce(1))
    }
    // catalog path: readBetween on the timestamp column
    val rb = cat.readBetween(t, "ts", ts(2), ts(5))
    assert(rb.inputFiles.length == 1)
    assert(rb.count() == 4)
    // connector path: pushed ts range plans one of three files
    val probe = graftRead(root, t).filter(col("ts") >= ts(9) &&
      col("ts") <= ts(12))
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(9L, 10L, 11L, 12L))
    assert(graft.connector.GraftPlanInspect.scanPartitionsOf(probe) == 1)
  }

  test("limit pushdown keeps results correct") {
    val (cat, root, t) = freshTable("conn_limit")
    cat.overwrite(t, (1L to 1000L).map(i => (i, i)).toDF("k", "v")
      .repartition(4))
    assert(graftRead(root, t).limit(7).collect().length == 7)
  }
}
