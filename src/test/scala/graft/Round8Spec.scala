package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.TableCatalog

/** Round-8 hardening and engine-surface growth: timestamp partition
  * columns, empty-input DSv2 commits, content-versioned bloom
  * sidecars, streaming admission control, OCC rebase for commuting
  * commits, DV-aware columnar reads, scan partition sizing, O(1)-plan
  * partitioned reads, target file size on write, CDF surfaces, and
  * SQL schema evolution. */
class Round8Spec extends SparkTestBase {
  import spark.implicits._

  private def graftRead(root: String, fq: String): DataFrame =
    spark.read.format("graft").option("root", root).option("table", fq).load()

  // ---- ADVICE nits ---------------------------------------------------------

  test("timestamp partition columns read back typed through the connector") {
    val root = tempDir("r8_tspart")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.TSPART"
    val df = Seq(
      (1L, "2024-03-01 10:30:00", "a"),
      (2L, "2024-03-01 10:30:00", "b"),
      (3L, "2024-06-15 23:59:59", "c"))
      .toDF("id", "ts_s", "payload")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    cat.overwritePartitioned(t, df, Seq("ts"))
    // catalog path (partition discovery)
    val viaCat = cat.read(t)
    assert(viaCat.count() == 3)
    // connector path: castValue must type the path-encoded timestamp
    val rd = graftRead(root, t)
    assert(rd.schema("ts").dataType.typeName == "timestamp")
    val rows = rd.select("id", "ts").orderBy("id")
      .as[(Long, java.sql.Timestamp)].collect()
    assert(rows(0)._2 == java.sql.Timestamp.valueOf("2024-03-01 10:30:00"))
    assert(rows(2)._2 == java.sql.Timestamp.valueOf("2024-06-15 23:59:59"))
    // partition pruning on the timestamp column stays exact
    val pruned = rd.filter(col("ts") ===
      java.sql.Timestamp.valueOf("2024-06-15 23:59:59"))
    assert(pruned.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("DSv2 partitioned write round-trips a timestamp partition column") {
    val root = tempDir("r8_tsdsv2")
    val t = "D.S.TSDSV2"
    val df = Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-02-02 12:00:00"))
      .toDF("id", "ts_s").withColumn("ts", col("ts_s").cast("timestamp"))
      .drop("ts_s")
    df.write.format("graft").option("root", root).option("table", t)
      .option("partitions", "ts").mode("overwrite").save()
    val back = graftRead(root, t)
    assert(back.schema("ts").dataType.typeName == "timestamp")
    assert(back.select("ts").as[java.sql.Timestamp].collect().toSet ==
      Set(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("2024-02-02 12:00:00")))
  }

  test("empty DSv2 append commits a version carrying the chain") {
    val root = tempDir("r8_emptyappend")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.EMPTYAPP"
    cat.overwrite(t, (1L to 10L).toDF("k"))
    val v0 = cat.version(t).get
    (1L to 0L).toDF("k") // zero rows
      .write.format("graft").option("root", root).option("table", t)
      .mode("append").save()
    assert(cat.version(t).get == v0 + 1, "empty append must still commit")
    assert(cat.read(t).count() == 10)
  }

  test("empty DSv2 overwrite and CTAS-shaped create land schema-only v0") {
    val root = tempDir("r8_emptyover")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.EMPTYOVER"
    cat.overwrite(t, (1L to 10L).toDF("k"))
    (1L to 0L).toDF("k")
      .write.format("graft").option("root", root).option("table", t)
      .mode("overwrite").save()
    assert(cat.read(t).count() == 0)
    assert(cat.read(t).schema.fieldNames.toSeq == Seq("k"))
    // brand-new table from empty input (empty CTAS shape)
    val t2 = "D.S.EMPTYNEW"
    Seq.empty[(Long, String)].toDF("id", "name")
      .write.format("graft").option("root", root).option("table", t2)
      .mode("append").save()
    assert(cat.read(t2).count() == 0)
    assert(cat.read(t2).schema.fieldNames.toSeq == Seq("id", "name"))
    // empty overwrite of a PARTITIONED table is now expressible
    val t3 = "D.S.EMPTYPART"
    cat.overwritePartitioned(t3,
      Seq((1L, "x")).toDF("id", "p"), Seq("p"))
    Seq.empty[(Long, String)].toDF("id", "p")
      .write.format("graft").option("root", root).option("table", t3)
      .option("partitions", "p").mode("overwrite").save()
    assert(cat.read(t3).count() == 0)
    assert(cat.read(t3).schema.fieldNames.toSet == Set("id", "p"))
  }

  test("bloom rebuild lands a fresh sidecar generation (cache-safe)") {
    val root = tempDir("r8_bloomgen")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.BLOOMGEN"
    cat.overwrite(t, (1L to 1000L).map(i => (i, s"u$i")).toDF("k", "u")
      .repartition(2))
    assert(cat.buildBloomIndex(t, "k") > 0)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bloomNames: Seq[String] = {
      val it = fs.listFiles(new Path(root), true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val n = it.next().getPath.getName
        if (n.startsWith("_BLOOMS")) buf += n
      }
      buf.toSeq
    }
    val gen1 = bloomNames
    assert(gen1.nonEmpty && gen1.forall(_.matches("_BLOOMS\\.\\d+")))
    // a second column rebuild REWRITES the sidecar of the same version
    // dir: must land at a NEW name so the (path,mtime,len) parse cache
    // can never serve the old bits
    assert(cat.buildBloomIndex(t, "u") > 0)
    val gen2 = bloomNames
    assert(gen2.nonEmpty && gen2.intersect(gen1).isEmpty,
      s"expected a fresh bloom generation, got $gen2 vs $gen1")
    // both columns probe correctly through the new generation
    assert(cat.readPoint(t, "k", 512L).count() == 1)
    assert(cat.readPoint(t, "u", "u717").count() == 1)
  }

  // ---- streaming admission control ----------------------------------------

  test("maxFilesPerTrigger drains a 6-commit backlog in bounded batches") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir("r8_admit")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.ADMIT"
    (0 until 6).foreach { i =>
      val df = ((i * 100L + 1) to (i * 100L + 100)).toDF("k").coalesce(1)
      if (i == 0) cat.overwrite(t, df) else cat.append(t, df)
    }
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", t)
      .option("maxFilesPerTrigger", "2").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.add(df.count()); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = { val b = Seq.newBuilder[Long]
      val it = sizes.iterator(); while (it.hasNext) b += it.next(); b.result() }
    val nonEmpty = got.filter(_ > 0)
    assert(nonEmpty.size >= 3,
      s"expected >= 3 bounded batches over 6 single-file commits, got $got")
    assert(nonEmpty.sum == 600, s"exactly-once total, got $got")
    assert(nonEmpty.forall(_ <= 200),
      s"each batch capped at 2 files = 200 rows, got $got")
  }

  test("maxBytesPerTrigger caps per-batch bytes at commit granularity") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir("r8_admitbytes")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.ADMITB"
    (0 until 4).foreach { i =>
      val df = ((i * 100L + 1) to (i * 100L + 100)).toDF("k").coalesce(1)
      if (i == 0) cat.overwrite(t, df) else cat.append(t, df)
    }
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", t)
      .option("maxBytesPerTrigger", "1").load() // smaller than any file:
      // oversized-first-commit rule ships exactly one commit per batch
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.add(df.count()); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = { val b = Seq.newBuilder[Long]
      val it = sizes.iterator(); while (it.hasNext) b += it.next(); b.result() }
    val nonEmpty = got.filter(_ > 0)
    assert(nonEmpty.size == 4, s"one commit per batch expected, got $got")
    assert(nonEmpty.sum == 400)
  }

  test("uncapped stream still plans the whole backlog as one batch") {
    import org.apache.spark.sql.streaming.Trigger
    val root = tempDir("r8_uncapped")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.UNCAP"
    (0 until 3).foreach { i =>
      val df = ((i * 10L + 1) to (i * 10L + 10)).toDF("k").coalesce(1)
      if (i == 0) cat.overwrite(t, df) else cat.append(t, df)
    }
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", t).load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes.add(df.count()); ()
      }
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = { val b = Seq.newBuilder[Long]
      val it = sizes.iterator(); while (it.hasNext) b += it.next(); b.result() }
    assert(got.filter(_ > 0) == Seq(30L))
  }

  // ---- OCC conflict RESOLUTION (rebase for commuting commits) -------------

  test("rebase helper commits on an advanced head when inputs are untouched") {
    val root = tempDir("r8_rebase_ok")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.REBOK"
    cat.overwrite(t, (1L to 100L).toDF("k").repartition(2))
    val v0 = cat.version(t).get
    val readFiles = cat.dataFilePaths(t).map(new Path(_))
    // a winner lands a blind append AFTER our snapshot was read
    cat.append(t, (101L to 110L).toDF("k"))
    // our commit based on v0 now conflicts — but the winner only ADDED
    // files, so the rebase validates and commits on top
    var committedAt = -1
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    cat.commitRebase(t, v0, readFiles, Nil, (dir, head) => {
      committedAt = head
      // a marker commit carrying head's files (what compact would do):
      // new rows + a hand-rolled manifest referencing the head chain
      (200L to 205L).toDF("k").coalesce(1).write
        .mode("overwrite").parquet(dir.toString)
      val carried = cat.dataFilePaths(t) // head IS live inside the claim
      val out = fs.create(new Path(dir, "_MANIFEST"), true)
      try out.write(carried.mkString("\n").getBytes("UTF-8"))
      finally out.close()
    })
    assert(committedAt == v0 + 1, "rebase must re-run against the winner")
    assert(cat.read(t).count() == 116) // 100 + 10 + 6: nothing lost
  }

  test("rebase helper aborts when the winner rewrote the read set") {
    val root = tempDir("r8_rebase_abort")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.REBNO"
    cat.overwrite(t, (1L to 100L).map(i => (i, 0L)).toDF("k", "flag")
      .repartition(2))
    val v0 = cat.version(t).get
    val readFiles = cat.dataFilePaths(t).map(new Path(_))
    // the winner REWRITES every file (copy-on-write update touches all)
    cat.updateWhere(t, Map("flag" -> lit(1L)), col("k") > 0)
    val ex = intercept[java.util.ConcurrentModificationException] {
      cat.commitRebase(t, v0, readFiles, Nil, (dir, head) => ())
    }
    assert(ex.getMessage.contains("rewrote"))
  }

  test("rebase helper aborts when a new DV masks the read set") {
    val root = tempDir("r8_rebase_dv")
    val cat = new TableCatalog(spark, root)
    val t = "D.S.REBDV"
    cat.overwrite(t, (1L to 100L).toDF("k").repartition(2))
    val v0 = cat.version(t).get
    val readFiles = cat.dataFilePaths(t).map(new Path(_))
    cat.deleteWhereDV(t, col("k") % 10 === 0) // winner masks our files
    val ex = intercept[java.util.ConcurrentModificationException] {
      cat.commitRebase(t, v0, readFiles, Nil, (dir, head) => ())
    }
    assert(ex.getMessage.contains("masked"))
  }

  test("compaction lands across a concurrent append burst, no lost rows") {
    val root = tempDir("r8_compact_race")
    val t = "D.S.CRACE"
    new TableCatalog(spark, root).overwrite(t,
      (1L to 1000L).toDF("k").repartition(8)) // 8 small files
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try {
        barrier.await()
        val c = new TableCatalog(spark, root)
        (1 to 3).foreach { i => c.append(t, Seq(1000L + i).toDF("k")) }
      } catch { case e: Throwable => errs.add(e) }
    })
    appender.start()
    val compactor = new Thread(() => {
      try {
        barrier.await()
        new TableCatalog(spark, root).compact(t, targetFileBytes = 64L << 20)
      } catch { case e: Throwable => errs.add(e) }
    })
    compactor.start()
    appender.join(120000); compactor.join(120000)
    assert(errs.isEmpty,
      s"racing maintenance must not fail: ${errs.toArray.mkString("; ")}")
    val cat = new TableCatalog(spark, root)
    assert(cat.read(t).count() == 1003, "appends and compaction all landed")
    // compaction really happened: the 8 original small files are gone
    // (compacted output + up to 3 append files remain)
    assert(cat.dataFilePaths(t).size <= 4,
      s"expected compacted layout, got ${cat.dataFilePaths(t).size} files")
  }

  test("DV mutations land across concurrent appends (MoR + append race)") {
    val root = tempDir("r8_dv_race")
    val t = "D.S.DVRACE"
    new TableCatalog(spark, root).overwrite(t,
      (1L to 1000L).toDF("k").repartition(4))
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val appender = new Thread(() => {
      try {
        barrier.await()
        val c = new TableCatalog(spark, root)
        (1 to 3).foreach { i => c.append(t, Seq(2000L + i).toDF("k")) }
      } catch { case e: Throwable => errs.add(e) }
    })
    val deleter = new Thread(() => {
      try {
        barrier.await()
        new TableCatalog(spark, root)
          .deleteWhereDV(t, col("k") % 10 === 0) // masks 100 of 1..1000
      } catch { case e: Throwable => errs.add(e) }
    })
    appender.start(); deleter.start()
    appender.join(120000); deleter.join(120000)
    assert(errs.isEmpty,
      s"racing MoR delete must not fail: ${errs.toArray.mkString("; ")}")
    val cat = new TableCatalog(spark, root)
    // 1000 - 100 masked + 3 appended (appends aren't divisible by 10
    // anyway, and the delete read snapshot semantics never covers them)
    assert(cat.read(t).count() == 903)
  }
}
