package graft

import org.apache.spark.sql.functions._

/** V2 catalog plugin: SQL DDL/DML surface over the graft catalog. */
class SqlCatalogSpec extends SparkTestBase {
  import spark.implicits._

  test("CTAS, INSERT INTO, SELECT, time travel, rename, drop") {
    val root = tempDir("gcat_sql")
    spark.conf.set("spark.sql.catalog.gc_spec", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_spec.root", root)
    (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "x")
      .createOrReplaceTempView("src100")

    spark.sql("CREATE TABLE gc_spec.d.s.t AS SELECT * FROM src100")
    assert(spark.sql("SELECT count(*) FROM gc_spec.d.s.t")
      .as[Long].head() == 100)

    spark.sql("INSERT INTO gc_spec.d.s.t SELECT k + 100, x FROM src100")
    assert(spark.sql("SELECT count(*), sum(k) FROM gc_spec.d.s.t")
      .as[(Long, Long)].head() == ((200L, (1L to 100L).sum + (101L to 200L).sum)))

    // time travel reads v0 (the CTAS snapshot)
    assert(spark.sql("SELECT count(*) FROM gc_spec.d.s.t VERSION AS OF 0")
      .as[Long].head() == 100)

    // pushdown rides along: metadata-only aggregate through SQL
    val agg = spark.sql("SELECT count(*), min(k), max(k) FROM gc_spec.d.s.t")
    assert(graft.connector.GraftPlanInspect.scanPartitions(agg) == 1)

    spark.sql("ALTER TABLE gc_spec.d.s.t RENAME TO d.s.t2")
    assert(spark.sql("SELECT count(*) FROM gc_spec.d.s.t2")
      .as[Long].head() == 200)
    intercept[Exception] { spark.sql("SELECT * FROM gc_spec.d.s.t").collect() }

    assert(spark.sql("SHOW TABLES IN gc_spec.d.s").collect()
      .map(_.getString(1)).toSeq == Seq("t2"))
    spark.sql("DROP TABLE gc_spec.d.s.t2")
    intercept[Exception] { spark.sql("SELECT * FROM gc_spec.d.s.t2").collect() }
  }

  test("SQL DELETE routes into merge-on-read deletion vectors") {
    val root = tempDir("gcat_del")
    spark.conf.set("spark.sql.catalog.gc_del", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_del.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.del", (1L to 1000L).map(i => (i, s"g${i % 4}"))
      .toDF("k", "grp").repartition(3))
    val filesBefore = cat.dataFilePaths("d.s.del")
    spark.sql("DELETE FROM gc_del.d.s.del WHERE grp = 'g1' AND k <= 500")
    // merge-on-read: not one data file rewritten
    assert(cat.dataFilePaths("d.s.del") == filesBefore)
    val expect = (1L to 1000L).count(i => !(i % 4 == 1 && i <= 500))
    assert(spark.sql("SELECT count(*) FROM gc_del.d.s.del")
      .as[Long].head() == expect)
    // prior version still time-travels complete
    assert(spark.sql("SELECT count(*) FROM gc_del.d.s.del VERSION AS OF 0")
      .as[Long].head() == 1000)
    // untranslatable predicate: falls through to the ROW-LEVEL delete
    // path (scan row ids, commit DV) — still exact, still no rewrite
    val files1 = cat.dataFilePaths("d.s.del")
    spark.sql("DELETE FROM gc_del.d.s.del WHERE k % 7 = 0")
    assert(cat.dataFilePaths("d.s.del") == files1)
    val expect2 = (1L to 1000L).count(i =>
      !(i % 4 == 1 && i <= 500) && i % 7 != 0)
    assert(spark.sql("SELECT count(*) FROM gc_del.d.s.del")
      .as[Long].head() == expect2)
  }

  test("SQL UPDATE commits as one merge-on-read delta (DV + replacement rows)") {
    val root = tempDir("gcat_upd")
    spark.conf.set("spark.sql.catalog.gc_upd", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_upd.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.u", (1L to 1000L).map(i => (i, i % 10, i * 1.0))
      .toDF("k", "g", "x").repartition(3))
    val filesBefore = cat.dataFilePaths("d.s.u").toSet
    val vBefore = cat.version("d.s.u").get
    spark.sql("UPDATE gc_upd.d.s.u SET x = x + 1000 WHERE g = 3")
    assert(cat.version("d.s.u").contains(vBefore + 1)) // ONE commit
    // merge-on-read: prior files carried untouched, delta files added
    val filesAfter = cat.dataFilePaths("d.s.u").toSet
    assert(filesBefore.subsetOf(filesAfter))
    assert(spark.sql("SELECT count(*) FROM gc_upd.d.s.u").as[Long].head() == 1000)
    val (nUpd, sumUpd) = spark.sql(
      "SELECT count(*), sum(x) FROM gc_upd.d.s.u WHERE g = 3")
      .as[(Long, Double)].head()
    assert(nUpd == 100)
    assert(sumUpd == (1L to 1000L).filter(_ % 10 == 3).map(_ * 1.0 + 1000).sum)
    // pre-update snapshot intact
    assert(spark.sql(
      s"SELECT sum(x) FROM gc_upd.d.s.u VERSION AS OF $vBefore WHERE g = 3")
      .as[Double].head() == (1L to 1000L).filter(_ % 10 == 3).map(_ * 1.0).sum)
  }

  test("SQL UPDATE over a DV-carrying table reads through the masks") {
    val root = tempDir("gcat_upd_dv")
    spark.conf.set("spark.sql.catalog.gc_ud", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_ud.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.ud", (1L to 600L).map(i => (i, i % 6, i * 1.0))
      .toDF("k", "g", "x").repartition(2))
    cat.deleteWhereDV("d.s.ud", col("g") === 0L) // masks 100 rows
    // row-level UPDATE must neither resurrect masked rows nor mis-address
    // survivors (the reader's _gpos counts PHYSICAL rows, masked included)
    spark.sql("UPDATE gc_ud.d.s.ud SET x = -x WHERE g = 2")
    assert(spark.sql("SELECT count(*) FROM gc_ud.d.s.ud").as[Long].head() ==
      (1L to 600L).count(_ % 6 != 0))
    assert(spark.sql("SELECT sum(x) FROM gc_ud.d.s.ud WHERE g = 2")
      .as[Double].head() == -(1L to 600L).filter(_ % 6 == 2).map(_ * 1.0).sum)
    assert(spark.sql("SELECT count(*) FROM gc_ud.d.s.ud WHERE g = 0")
      .as[Long].head() == 0) // no resurrection
    // untouched group byte-identical
    assert(spark.sql("SELECT sum(x) FROM gc_ud.d.s.ud WHERE g = 3")
      .as[Double].head() == (1L to 600L).filter(_ % 6 == 3).map(_ * 1.0).sum)
  }

  test("MERGE INTO upserts through the delta writer") {
    val root = tempDir("gcat_merge")
    spark.conf.set("spark.sql.catalog.gc_mrg", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_mrg.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.m", (1L to 100L).map(i => (i, i * 1.0))
      .toDF("k", "x").coalesce(1))
    (51L to 150L).map(i => (i, -1.0)).toDF("k", "x")
      .createOrReplaceTempView("mrg_src")
    spark.sql("""MERGE INTO gc_mrg.d.s.m t USING mrg_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET x = s.x
      WHEN NOT MATCHED THEN INSERT (k, x) VALUES (s.k, s.x)""")
    assert(spark.sql("SELECT count(*) FROM gc_mrg.d.s.m").as[Long].head() == 150)
    assert(spark.sql("SELECT sum(x) FROM gc_mrg.d.s.m").as[Double].head() ==
      (1L to 50L).map(_ * 1.0).sum + 100 * -1.0)
    // matched rows replaced exactly once, unmatched target untouched
    assert(spark.sql("SELECT count(*) FROM gc_mrg.d.s.m WHERE x = -1.0")
      .as[Long].head() == 100)
  }

  test("INSERT INTO ... REPLACE WHERE is one atomic delete+insert commit") {
    val root = tempDir("gcat_rw")
    spark.conf.set("spark.sql.catalog.gc_rw", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_rw.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.rw", (1L to 1000L).map(i => (i, i % 4, i * 1.0))
      .toDF("k", "g", "x").repartition(3))
    val filesBefore = cat.dataFilePaths("d.s.rw").toSet
    val vBefore = cat.version("d.s.rw").get
    (1L to 50L).map(i => (i * 10000L, 1L, -1.0)).toDF("k", "g", "x")
      .createOrReplaceTempView("rw_src")
    spark.sql(
      "INSERT INTO gc_rw.d.s.rw REPLACE WHERE g = 1 SELECT * FROM rw_src")
    // exactly ONE commit; prior files carried (no rewrite), new added
    assert(cat.version("d.s.rw").contains(vBefore + 1))
    val filesAfter = cat.dataFilePaths("d.s.rw").toSet
    assert(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size)
    val got = spark.sql("SELECT count(*), sum(x) FROM gc_rw.d.s.rw WHERE g = 1")
      .as[(Long, Double)].head()
    assert(got == ((50L, -50.0))) // old g=1 rows replaced wholesale
    assert(spark.sql("SELECT count(*) FROM gc_rw.d.s.rw").as[Long].head() ==
      (1L to 1000L).count(_ % 4 != 1) + 50)
    // time travel still sees the pre-replace snapshot
    assert(spark.sql(
      s"SELECT count(*) FROM gc_rw.d.s.rw VERSION AS OF $vBefore")
      .as[Long].head() == 1000)
  }

  test("TIMESTAMP AS OF resolves the newest version committed before the instant") {
    val root = tempDir("gcat_tt")
    spark.conf.set("spark.sql.catalog.gc_tt", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_tt.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.tt", (1L to 100L).map(i => (i, i)).toDF("k", "v")
      .coalesce(1))
    Thread.sleep(1200)
    val between = java.sql.Timestamp.from(java.time.Instant.now())
    Thread.sleep(1200)
    cat.append("d.s.tt", (101L to 150L).map(i => (i, i)).toDF("k", "v")
      .coalesce(1))
    assert(spark.sql(
      s"SELECT count(*) FROM gc_tt.d.s.tt TIMESTAMP AS OF '$between'")
      .as[Long].head() == 100)
    assert(spark.sql("SELECT count(*) FROM gc_tt.d.s.tt")
      .as[Long].head() == 150)
    // an instant before the table existed fails loudly
    val err = intercept[Exception] {
      spark.sql(
        "SELECT * FROM gc_tt.d.s.tt TIMESTAMP AS OF '2000-01-01'").collect()
    }
    assert(err.getMessage.contains("no retained version"))
  }

  test("reported statistics make small graft tables auto-broadcast") {
    val root = tempDir("gcat_stats")
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.big", (1L to 20000L).map(i => (i, i % 50, s"pad$i"))
      .toDF("k", "dk", "pad").repartition(4))
    cat.overwrite("d.s.dim", (0L until 50L).map(i => (i, s"name$i"))
      .toDF("dk2", "nm").coalesce(1))
    def rd(t: String) = spark.read.format("graft")
      .option("root", root).option("table", t).load()
    // no broadcast() hint anywhere: the planner must see the dim's
    // true size from estimateStatistics and choose BHJ on its own
    val joined = rd("d.s.big").join(rd("d.s.dim"), col("dk") === col("dk2"))
    assert(joined.count() == 20000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected auto-broadcast from reported stats:\n$plan")
  }

  test("CALL system procedures drive the maintenance loop from SQL") {
    val root = tempDir("gcat_proc")
    spark.conf.set("spark.sql.catalog.gc_pr", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_pr.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    (0 until 10).foreach { i =>
      cat.append("d.s.p", ((i * 50L + 1) to (i * 50L + 50))
        .map(k => (k, s"nm$k")).toDF("k", "nm").coalesce(1))
    }
    cat.deleteWhereDV("d.s.p", col("k") % 5 === 0L)
    val h = spark.sql("CALL gc_pr.system.health('d.s.p')").collect()(0)
    assert(h.getInt(0) >= 10 && h.getLong(3) == 100) // files, dv_rows
    val acts = spark.sql("CALL gc_pr.system.optimize('d.s.p')")
      .collect().map(_.getString(0))
    assert(acts.contains("compact"))
    assert(cat.count("d.s.p") == 400)
    assert(spark.sql("CALL gc_pr.system.optimize('d.s.p')")
      .collect().map(_.getString(0)).forall(_ != "compact")) // healthy now
    val indexed = spark.sql("CALL gc_pr.system.build_bloom('d.s.p', 'nm')")
      .collect()(0).getInt(0)
    assert(indexed >= 1)
    // the bloom built via SQL actually skips: point read opens < all
    val probe = cat.readPoint("d.s.p", "nm", "nm123")
    assert(probe.count() == 1)
    spark.sql("CALL gc_pr.system.zorder('d.s.p', 'k')").collect()
    assert(cat.count("d.s.p") == 400)
    val removed = spark.sql("CALL gc_pr.system.vacuum('d.s.p', 1)")
      .collect().map(_.getString(0))
    assert(removed.nonEmpty) // old versions swept or noop row
    intercept[Exception] {
      spark.sql("CALL gc_pr.system.nope('d.s.p')").collect()
    }
  }

  test("rename with outstanding DVs is refused; post-compact rename keeps chains readable") {
    val root = tempDir("gcat_mv")
    spark.conf.set("spark.sql.catalog.gc_mv", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gc_mv.root", root)
    val cat = new graft.catalog.TableCatalog(spark, root)
    cat.overwrite("d.s.m", (1L to 500L).map(i => (i, i % 9)).toDF("k", "f")
      .repartition(2))
    cat.append("d.s.m", (501L to 600L).map(i => (i, i % 9)).toDF("k", "f")
      .coalesce(1)) // chained version: manifest carries v0 by abs path
    cat.deleteWhereDV("d.s.m", col("f") === 4L)
    val err = intercept[Exception] {
      spark.sql("ALTER TABLE gc_mv.d.s.m RENAME TO d.s.m2")
    }
    assert(err.getMessage.contains("deletion vectors"))
    cat.compact("d.s.m") // materializes masks; rename is now legal
    spark.sql("ALTER TABLE gc_mv.d.s.m RENAME TO d.s.m2")
    val expect = (1L to 600L).count(_ % 9 != 4)
    assert(spark.sql("SELECT count(*) FROM gc_mv.d.s.m2")
      .as[Long].head() == expect)
    // append at the NEW name chains onto the retargeted manifests
    cat.append("d.s.m2", Seq((1000L, 0L)).toDF("k", "f"))
    assert(spark.sql("SELECT count(*) FROM gc_mv.d.s.m2")
      .as[Long].head() == expect + 1)
  }
}
