package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.TableCatalog

/** Round-9 surfaces: column mapping (RENAME/DROP COLUMN without data
  * rewrites), version-scoped schema actions, and the maintenance-
  * rebase DV-carriage fix. */
class Round9Spec extends SparkTestBase {
  import spark.implicits._

  private def freshCat(prefix: String): (TableCatalog, String) = {
    val root = tempDir(prefix)
    (new TableCatalog(spark, root), root)
  }

  // ---- column mapping -----------------------------------------------------

  test("RENAME COLUMN is metadata-only: old files read under the new name") {
    val (cat, _) = freshCat("g9_ren")
    cat.overwrite("d.s.t", (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "x"))
    val filesBefore = cat.dataFilePaths("d.s.t")
    cat.alterRenameColumn("d.s.t", "x", "price")
    // zero data rewritten
    assert(cat.dataFilePaths("d.s.t") == filesBefore)
    val df = cat.read("d.s.t")
    assert(df.columns.toSeq == Seq("k", "price"))
    assert(df.agg(sum("price")).as[Double].head() == (1L to 100L).map(_ * 2.0).sum)
    // appends under the LOGICAL name land in the physical column
    cat.append("d.s.t", Seq((101L, 999.0)).toDF("k", "price"))
    assert(cat.read("d.s.t").filter($"k" === 101L)
      .select("price").as[Double].head() == 999.0)
    // old name is gone
    intercept[Exception] { cat.read("d.s.t").select("x").collect() }
  }

  test("DROP + re-ADD same name does not resurrect old data") {
    val (cat, _) = freshCat("g9_drop")
    cat.overwrite("d.s.t", (1L to 50L).map(i => (i, s"secret$i")).toDF("k", "c"))
    cat.alterDropColumns("d.s.t", Seq("c"))
    assert(cat.read("d.s.t").columns.toSeq == Seq("k"))
    // re-add the SAME logical name: a fresh physical column backs it
    cat.alterAddColumns("d.s.t", StructType(Seq(StructField("c", StringType))))
    val df = cat.read("d.s.t")
    assert(df.columns.toSeq == Seq("k", "c"))
    // old bytes must NOT resurrect — every pre-existing row reads null
    assert(df.filter($"c".isNotNull).count() == 0)
    // new appends carry the new column
    cat.append("d.s.t", Seq((51L, "fresh")).toDF("k", "c"))
    assert(cat.read("d.s.t").filter($"c".isNotNull).as[(Long, String)]
      .collect().toSeq == Seq((51L, "fresh")))
    // compaction physically retires the dropped bytes
    cat.compact("d.s.t", targetFileBytes = 1L << 20)
    val physical = spark.read.parquet(cat.dataFilePaths("d.s.t"): _*)
    assert(!physical.columns.contains("c") ||
      physical.filter(col(physical.columns.filter(_ != "k").head).isNotNull)
        .count() <= 1) // only the fresh row's physical column survives
  }

  test("time travel sees the schema of its day (version-scoped actions)") {
    val (cat, _) = freshCat("g9_tt")
    cat.overwrite("d.s.t", Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v0
    cat.append("d.s.t", Seq((3L, "c")).toDF("k", "v"))               // v1
    cat.alterRenameColumn("d.s.t", "v", "name")                      // v2
    assert(cat.readVersion("d.s.t", 1).columns.toSeq == Seq("k", "v"))
    assert(cat.readVersion("d.s.t", 2).columns.toSeq == Seq("k", "name"))
    assert(cat.read("d.s.t").columns.toSeq == Seq("k", "name"))
  }

  test("connector scan + DSv2 write honor the mapping (incl. skipping)") {
    val (cat, root) = freshCat("g9_conn")
    cat.overwrite("d.s.t",
      (1L to 1000L).map(i => (i, i * 10L)).toDF("k", "amount").repartition(4))
    cat.alterRenameColumn("d.s.t", "amount", "cents")
    val df = spark.read.format("graft")
      .option("root", root).option("table", "d.s.t").load()
    assert(df.columns.toSeq == Seq("k", "cents"))
    assert(df.agg(sum("cents")).as[Long].head() == (1L to 1000L).map(_ * 10L).sum)
    // file skipping still engages through the rename: a narrow range
    // on the RENAMED column must not schedule every file
    val pruned = spark.read.format("graft")
      .option("root", root).option("table", "d.s.t").load()
      .filter($"k" >= 1L && $"k" <= 5L)
    val rows = pruned.collect()
    assert(rows.length == 5)
    assert(graft.connector.GraftPlanInspect.scanPartitionsOf(pruned) <
      cat.dataFilePaths("d.s.t").length)
    // DSv2 append under logical names stages physical files
    Seq((2000L, 42L)).toDF("k", "cents").write.format("graft")
      .option("root", root).option("table", "d.s.t").mode("append").save()
    assert(cat.read("d.s.t").filter($"k" === 2000L)
      .select("cents").as[Long].head() == 42L)
  }

  test("SQL ALTER RENAME / DROP / re-ADD through the catalog") {
    val root = tempDir("g9_sql")
    spark.conf.set("spark.sql.catalog.g9sql", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.g9sql.root", root)
    Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("id", "tag", "score")
      .createOrReplaceTempView("g9_src")
    spark.sql("CREATE TABLE g9sql.d.s.t AS SELECT * FROM g9_src")
    spark.sql("ALTER TABLE g9sql.d.s.t RENAME COLUMN score TO rating")
    assert(spark.sql("SELECT sum(rating) FROM g9sql.d.s.t")
      .as[Double].head() == 30.0)
    spark.sql("ALTER TABLE g9sql.d.s.t DROP COLUMN tag")
    assert(spark.table("g9sql.d.s.t").columns.toSeq == Seq("id", "rating"))
    // re-add the dropped name; old values must not come back
    spark.sql("ALTER TABLE g9sql.d.s.t ADD COLUMNS (tag STRING)")
    assert(spark.sql("SELECT count(*) FROM g9sql.d.s.t WHERE tag IS NOT NULL")
      .as[Long].head() == 0)
    spark.sql("INSERT INTO g9sql.d.s.t SELECT 3L, 30.0, 'z'")
    assert(spark.sql("SELECT tag FROM g9sql.d.s.t WHERE id = 3")
      .as[String].head() == "z")
    // renaming a second time chains correctly
    spark.sql("ALTER TABLE g9sql.d.s.t RENAME COLUMN rating TO stars")
    assert(spark.sql("SELECT sum(stars) FROM g9sql.d.s.t")
      .as[Double].head() == 60.0)
  }

  test("row mutators work through the mapping; overwrite resets it") {
    val (cat, _) = freshCat("g9_mut")
    cat.overwrite("d.s.t",
      (1L to 200L).map(i => (i, i % 10, 0L)).toDF("k", "g", "flag")
        .repartition(3))
    cat.alterRenameColumn("d.s.t", "flag", "state")
    cat.updateWhere("d.s.t", Map("state" -> lit(7L)), $"g" === 3)
    assert(cat.read("d.s.t").filter($"state" === 7L).count() == 20)
    cat.deleteWhereDV("d.s.t", $"g" === 4)
    assert(cat.read("d.s.t").count() == 180)
    cat.updateWhereDV("d.s.t", Map("state" -> lit(9L)), $"g" === 5)
    assert(cat.read("d.s.t").filter($"state" === 9L).count() == 20)
    cat.merge("d.s.t", Seq((1L, 1L, 99L)).toDF("k", "g", "state"), Seq("k"))
    assert(cat.read("d.s.t").filter($"k" === 1L)
      .select("state").as[Long].head() == 99L)
    // an overwrite starts a fresh chain under the caller's names: the
    // mapping no longer applies (but old versions keep theirs)
    cat.overwrite("d.s.t", Seq((1L, "fresh")).toDF("k", "flag"))
    assert(cat.read("d.s.t").columns.toSeq == Seq("k", "flag"))
  }

  test("rename of partition / bucket-source columns is rejected") {
    val (cat, _) = freshCat("g9_guard")
    cat.overwritePartitioned("d.s.p",
      Seq((1L, "a"), (2L, "b")).toDF("k", "part"), Seq("part"))
    intercept[IllegalArgumentException] {
      cat.alterRenameColumn("d.s.p", "part", "part2")
    }
    intercept[IllegalArgumentException] {
      cat.alterDropColumns("d.s.p", Seq("part"))
    }
    cat.overwriteBucketed("d.s.b",
      (1L to 50L).map(i => (i, i * 2)).toDF("k", "v"), "k", 4)
    intercept[IllegalArgumentException] {
      cat.alterRenameColumn("d.s.b", "k", "key")
    }
  }

  test("shallow clone carries the mapping (rebased to its v0)") {
    val (cat, _) = freshCat("g9_clone")
    cat.overwrite("d.s.src", Seq((1L, 5.0)).toDF("k", "x"))
    cat.alterRenameColumn("d.s.src", "x", "y")
    cat.cloneTable("d.s.src", "d.s.dst")
    assert(cat.read("d.s.dst").columns.toSeq == Seq("k", "y"))
    assert(cat.read("d.s.dst").select("y").as[Double].head() == 5.0)
    // clone and source evolve independently
    cat.alterRenameColumn("d.s.dst", "y", "z")
    assert(cat.read("d.s.src").columns.toSeq == Seq("k", "y"))
    assert(cat.read("d.s.dst").columns.toSeq == Seq("k", "z"))
  }

  // ---- O(delta) flat-chain commit metadata --------------------------------

  test("flat append manifests are O(appended files), not O(live files)") {
    val (cat, root) = freshCat("g9_odelta")
    val t = "d.s.big"
    cat.overwrite(t, Seq((0L, "seed")).toDF("k", "v"))
    (1 to 40).foreach(i => cat.append(t, Seq((i.toLong, s"r$i")).toDF("k", "v")))
    // the table now holds 41 files; the LAST commit's manifest must
    // reference ONE prior version dir, not relist 40 file paths
    val v = cat.version(t).get
    val mf = new java.io.File(s"$root/d/s/big/v_${"%06d".format(v)}/_MANIFEST")
    assert(mf.exists)
    val lines = scala.io.Source.fromFile(mf).getLines().toSeq
    assert(lines.length == 1,
      s"manifest should be one dir reference, got ${lines.length} lines")
    assert(lines.head.endsWith(f"v_${v - 1}%06d"))
    // resolution still sees every row
    assert(cat.read(t).count() == 41)
    assert(cat.dataFilePaths(t).length == 41)
    // a COW update tombstones only the touched file
    cat.updateWhere(t, Map("v" -> lit("hit")), $"k" === 7L)
    val v2 = cat.version(t).get
    val tomb = new java.io.File(s"$root/d/s/big/v_${"%06d".format(v2)}/_TOMBSTONES")
    assert(tomb.exists)
    assert(scala.io.Source.fromFile(tomb).getLines().count(_.nonEmpty) == 1)
    assert(cat.read(t).count() == 41)
    assert(cat.read(t).filter($"v" === "hit").count() == 1)
    // DV delete + a metadata (ALTER) commit keep the chain resolvable
    cat.deleteWhereDV(t, $"k" === 3L)
    cat.alterAddColumns(t, StructType(Seq(StructField("note", StringType))))
    assert(cat.read(t).count() == 40)
    // time travel + changes still track through the reference chain
    assert(cat.readVersion(t, v).count() == 41)
    val changes = cat.readChanges(t, v, cat.version(t).get)
    assert(changes.filter($"_change_type" === "delete").count() >= 1)
  }

  test("link dirs of a dir-reference chain survive prune and vacuum") {
    val (cat, _) = freshCat("g9_links")
    val t = "d.s.lnk"
    cat.overwrite(t, Seq((1L, "a")).toDF("k", "v"))     // v0: data
    cat.alterAddColumns(t,                               // v1: METADATA only
      StructType(Seq(StructField("extra", StringType))))
    cat.append(t, Seq((2L, "b")).toDF("k", "v"))         // v2 refs v1 refs v0
    cat.append(t, Seq((3L, "c")).toDF("k", "v"))         // v3
    cat.append(t, Seq((4L, "d")).toDF("k", "v"))         // v4 — prune ran
    // v1 holds no data files but is a chain LINK — it must survive
    // the commit-time pruner and vacuum or v2+ resolution breaks
    assert(cat.readVersion(t, 4).count() == 4)
    cat.vacuum(t, keepVersions = 2)
    assert(cat.read(t).count() == 4)
    assert(cat.read(t).columns.contains("extra"))
  }

  // ---- CDC files: the change feed survives rewrites -----------------------

  test("change feed survives COW update/delete/merge/compact via CDC files") {
    val (cat, root) = freshCat("g9_cdc")
    val t = "d.s.cdc"
    val base = (1L to 120L).map(i => (i, i % 7, i * 1.0)).toDF("k", "g", "x")
    cat.overwrite(t, base.repartition(3))                     // v0 creation
    cat.updateWhere(t, Map("x" -> lit(-1.0)), $"g" === 3)     // v1 COW update
    cat.deleteWhere(t, $"k" % 10 === 0)                       // v2 COW delete
    cat.merge(t, Seq((5L, 5L, 555.0), (500L, 0L, 500.0))
      .toDF("k", "g", "x"), Seq("k"))                         // v3 COW merge
    cat.compact(t, targetFileBytes = 1L << 20)                // v4 rewrite
    val vEnd = cat.version(t).get

    // changes since the creation snapshot: every later commit is
    // CDC-recorded, so the feed depends on NO retired version dirs
    // (the feed horizon is vacuum retention, Delta's model)
    val cdf = spark.read.format("graft")
      .option("root", root).option("table", t)
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load()
    // no skipChangeCommits, no exception — and compaction contributes
    // ZERO change rows
    val byVersion = cdf.groupBy("_commit_version").count()
      .as[(Int, Long)].collect().toMap
    assert(!byVersion.contains(vEnd), "compaction must emit no changes")
    // update emits pre-image deletes + post-image inserts in pairs
    assert(cdf.filter($"_commit_version" === 1 &&
      $"_change_type" === "delete").count() ==
      cdf.filter($"_commit_version" === 1 &&
        $"_change_type" === "insert").count())
    // creation snapshot + feed reconstructs the live table exactly
    val ins = cdf.filter($"_change_type" === "insert").select("k", "g", "x")
    val del = cdf.filter($"_change_type" === "delete").select("k", "g", "x")
    val state = base.unionByName(ins).exceptAll(del)
    val live = cat.read(t).select("k", "g", "x")
    assert(state.exceptAll(live).count() == 0)
    assert(live.exceptAll(state).count() == 0)

    // STREAMING change feed across the same history
    import org.apache.spark.sql.streaming.Trigger
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format("graft")
      .option("root", root).option("table", t)
      .option("readChangeFeed", "true").option("startingVersion", "1").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("k", "_change_type").as[(Long, String)]
          .collect().foreach(got.add); ()
      }
      .option("checkpointLocation", s"$root/ckpt_cdc")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(180000)
    val streamed = { val b = Seq.newBuilder[(Long, String)]
      val it = got.iterator(); while (it.hasNext) b += it.next(); b.result() }
    val batchRows = cdf.select("k", "_change_type").as[(Long, String)]
      .collect().toSeq
    assert(streamed.sorted == batchRows.sorted,
      "streaming CDF must deliver the same change rows as the batch feed")
  }

  test("overwrite (world-replacing) still severs the feed loudly") {
    val (cat, root) = freshCat("g9_cdc2")
    val t = "d.s.sever"
    cat.overwrite(t, Seq((1L, "a")).toDF("k", "v"))
    cat.append(t, Seq((2L, "b")).toDF("k", "v"))
    cat.overwrite(t, Seq((9L, "z")).toDF("k", "v")) // no CDC possible
    val cdf = spark.read.format("graft")
      .option("root", root).option("table", t)
      .option("readChangeFeed", "true").load()
    val ex = intercept[Exception] { cdf.collect() }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("rewrote file(s)")))
  }

  // ---- maintenance rebase: concurrent DV carriage (ADVICE high) ----------

  test("compact rebasing over a concurrent append+delete keeps the mask") {
    val (cat, root) = freshCat("g9_rebase")
    val t = "d.s.rb"
    cat.overwrite(t, (1L to 300L).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(6)) // enough files that compact has work
    val v0 = cat.version(t).get

    // simulate a compaction that computed against v0 while a racer
    // appended AND DV-deleted rows from its OWN appended file: the
    // rebase must carry both the delta data AND the delta's new DV
    // sidecar, or the deleted rows resurrect
    val racer = new TableCatalog(spark, root)
    racer.append(t, Seq((1000L, "late"), (1001L, "gone")).toDF("k", "v"))
    racer.deleteWhereDV(t, $"k" === 1001L)
    assert(racer.read(t).count() == 301)

    // now run the v0-pinned compaction via the package-private rebase
    // path exactly the way compact does: conflict → rebase → carry
    assert(cat.version(t).get != v0)
    cat.compactFrom(t, v0) // helper: compaction pinned at snapshot v0
    val after = cat.read(t)
    assert(after.count() == 301, "rebased compaction lost or resurrected rows")
    assert(after.filter($"k" === 1001L).count() == 0,
      "concurrent DV delete resurrected by the compaction rebase")
    assert(after.filter($"k" === 1000L).count() == 1,
      "concurrent append dropped by the compaction rebase")
  }
}
