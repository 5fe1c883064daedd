package graft

import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog

/** Round-6 catalog mechanics: merge-on-read deletion vectors, MoR
  * update, and manifest min/max data skipping. */
class Round6OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def sf = "/root/testdata/sf0.001"

  test("deleteWhereDV masks rows without rewriting any data file") {
    val cat = new TableCatalog(spark, tempDir("dv"))
    val t = "d.s.dv"
    val df = (1 to 1000).map(i => (i.toLong, i % 7, s"v$i"))
      .toDF("id", "bucket", "v").repartition(4)
    cat.overwrite(t, df)
    val before = cat.dataFilePaths(t)
    assert(before.size >= 2)
    cat.deleteWhereDV(t, col("bucket") === 3)
    // THE merge-on-read contract: identical data-file set post-delete
    assert(cat.dataFilePaths(t) == before)
    assert(cat.deletionVectorRows(t) == (1 to 1000).count(_ % 7 == 3))
    assert(cat.read(t).filter(col("bucket") === 3).count() == 0)
    assert(cat.count(t) == (1 to 1000).count(_ % 7 != 3))
    // time travel: v0 still sees every row
    assert(cat.readVersion(t, 0).count() == 1000)
  }

  test("DV deletes stack across versions and re-delete is a no-op") {
    val cat = new TableCatalog(spark, tempDir("dv"))
    val t = "d.s.dv2"
    cat.overwrite(t, (1 to 100).map(i => (i.toLong, i % 5))
      .toDF("id", "b").repartition(3))
    cat.deleteWhereDV(t, col("b") === 0)
    val v1 = cat.version(t).get
    cat.deleteWhereDV(t, col("b") === 1)
    assert(cat.count(t) == (1 to 100).count(i => i % 5 >= 2))
    // masked rows are excluded from the probe: same predicate again
    // matches nothing and commits no new version
    val v2 = cat.version(t).get
    cat.deleteWhereDV(t, col("b") === 1)
    assert(cat.version(t).contains(v2))
    assert(v2 == v1 + 1)
    // intermediate version sees only its own masks
    assert(cat.readVersion(t, v1).count() == (1 to 100).count(_ % 5 != 0))
  }

  test("compact materializes DVs and vacuum retires masked bytes") {
    val work = tempDir("dv")
    val cat = new TableCatalog(spark, work)
    val t = "d.s.dv3"
    cat.overwrite(t, (1 to 500).map(i => (i.toLong, i % 4))
      .toDF("id", "b").repartition(4))
    cat.deleteWhereDV(t, col("b") === 2)
    cat.compact(t)
    assert(cat.deletionVectorRows(t) == 0)
    assert(cat.count(t) == (1 to 500).count(_ % 4 != 2))
    cat.vacuum(t, keepVersions = 1)
    // every pre-compaction version dir (data + DV sidecars) is gone
    val dirs = new java.io.File(s"$work/d/s/dv3").listFiles()
      .filter(_.isDirectory).map(_.getName)
      .filter(_.matches("v_\\d{6}")).toSet
    assert(dirs == Set(f"v_${cat.version(t).get}%06d"))
    assert(cat.count(t) == (1 to 500).count(_ % 4 != 2))
  }

  test("single-file table with outstanding DVs still compacts") {
    val cat = new TableCatalog(spark, tempDir("dv"))
    val t = "d.s.dv4"
    cat.overwrite(t, (1 to 50).map(i => (i.toLong, i % 2))
      .toDF("id", "b").coalesce(1))
    cat.deleteWhereDV(t, col("b") === 0)
    assert(cat.deletionVectorRows(t) > 0)
    cat.compact(t)
    assert(cat.deletionVectorRows(t) == 0)
    assert(cat.count(t) == 25)
  }

  test("COW update/merge over a DV'd table read through the masks") {
    val cat = new TableCatalog(spark, tempDir("dv"))
    val t = "d.s.dv5"
    cat.overwrite(t, (1 to 100).map(i => (i.toLong, "keep"))
      .toDF("id", "v").repartition(3))
    cat.deleteWhereDV(t, col("id") <= 10)
    // COW update rewrites files; masked rows must NOT resurrect
    cat.updateWhere(t, Map("v" -> lit("upd")), col("id") % 2 === 0)
    assert(cat.count(t) == 90)
    assert(cat.read(t).filter(col("id") <= 10).count() == 0)
    assert(cat.read(t).filter(col("v") === "upd").count() ==
      (11 to 100).count(_ % 2 == 0))
    // merge through masks: source hits both masked and live ids
    cat.deleteWhereDV(t, col("id") === 99)
    cat.merge(t, Seq((99L, "res"), (50L, "m")).toDF("id", "v"), Seq("id"))
    val got = cat.read(t).as[(Long, String)].collect().toMap
    assert(got(99L) == "res") // re-inserted by merge (as a NEW row)
    assert(got(50L) == "m")
    assert(cat.count(t) == 90) // 89 survivors + merged-back 99
  }

  test("updateWhereDV preserves every data file and appends the delta") {
    val cat = new TableCatalog(spark, tempDir("mor"))
    val t = "d.s.mor"
    cat.overwrite(t, (1 to 300).map(i => (i.toLong, i % 3, 0))
      .toDF("id", "b", "flag").repartition(3))
    val before = cat.dataFilePaths(t)
    cat.updateWhereDV(t, Map("flag" -> lit(1)), col("b") === 1)
    val after = cat.dataFilePaths(t)
    assert(before.toSet.subsetOf(after.toSet))
    assert(after.size > before.size)
    assert(cat.count(t) == 300)
    assert(cat.read(t).filter(col("flag") === 1).count() ==
      (1 to 300).count(_ % 3 == 1))
    // no-match update commits nothing
    val v = cat.version(t).get
    cat.updateWhereDV(t, Map("flag" -> lit(9)), col("b") === 99)
    assert(cat.version(t).contains(v))
  }

  test("readBetween skips non-overlapping files via manifest stats") {
    val cat = new TableCatalog(spark, tempDir("skip"))
    val t = "d.s.skip"
    val df = (1 to 10000).map(i => (i.toLong, i % 13, i * 1.5))
      .toDF("id", "b", "x")
    cat.overwrite(t, df.repartitionByRange(8, col("id"))
      .sortWithinPartitions(col("id")))
    val all = cat.dataFilePaths(t).size
    assert(all >= 4)
    val pruned = cat.readBetween(t, "id", 100L, 600L)
    // the skipping evidence: a tight range opens a strict subset
    assert(pruned.inputFiles.length < all)
    assert(pruned.count() == 501)
    assert(pruned.agg(sum(col("id"))).head().getLong(0) ==
      (100L to 600L).sum)
    // double column skipping too
    val pd = cat.readBetween(t, "x", 150.0, 900.0)
    assert(pd.inputFiles.length < all)
    assert(pd.count() == df.filter(col("x").between(150.0, 900.0)).count())
    // out-of-range probe reads zero files but keeps the schema
    val none = cat.readBetween(t, "id", -500L, -1L)
    assert(none.count() == 0)
    assert(none.columns.toSeq == Seq("id", "b", "x"))
  }

  test("readBetween respects DV masks and appended chains") {
    val cat = new TableCatalog(spark, tempDir("skip"))
    val t = "d.s.skip2"
    cat.overwrite(t, (1 to 1000).map(i => (i.toLong, i % 10))
      .toDF("id", "b").repartitionByRange(4, col("id")))
    cat.append(t, (1001 to 1200).map(i => (i.toLong, i % 10)).toDF("id", "b"))
    cat.deleteWhereDV(t, col("id") === 500)
    val r = cat.readBetween(t, "id", 400L, 1100L)
    assert(r.count() == (400L to 1100L).size - 1) // DV'd row masked
    // files without stats would still be read: stats exist here, so the
    // low range skips the appended files
    val lo = cat.readBetween(t, "id", 1L, 50L)
    assert(lo.inputFiles.length < cat.dataFilePaths(t).size)
  }

  test("PngCodec round-trips geometry and raster through javax.imageio") {
    import graft.operators.Multimodal.PngCodec
    for (id <- Seq(0L, 1L, 7L, 123L, 4999L)) {
      val m = PngCodec.decode(id, PngCodec.encode(id))
      assert(m.width == PngCodec.widthOf(id))
      assert(m.height == PngCodec.heightOf(id))
      assert(m.channels == 3)
      assert(m.format == "png")
      val expected = (for (y <- 0 until m.height; x <- 0 until m.width)
        yield PngCodec.pixel(id, x, y).toLong).sum
      assert(m.pixel_sum == expected) // raster decoded, not just IHDR
    }
  }

  test("hdrBucket is monotone, total, and inverted by hdrLowerBound") {
    import graft.operators.Sketches._
    val probes = (0L to 200L) ++
      Seq(255L, 256L, 1023L, 1024L, 1L << 40, (1L << 40) + 12345L,
        Long.MaxValue - 1, Long.MaxValue)
    probes.sliding(2).foreach { case Seq(a, b) =>
      assert(hdrBucket(a) <= hdrBucket(b), s"monotone at $a,$b")
    case _ => ()
    }
    for (v <- probes) {
      val i = hdrBucket(v)
      assert(i >= 0 && i < HdrBuckets, s"range at $v")
      val lb = hdrLowerBound(i)
      assert(lb <= v, s"lb at $v")
      // relative error bound: bucket width ≤ lb / 16 above the exact zone
      if (i >= 32) assert(v - lb < lb.toDouble / 16 + 1, s"width at $v")
      assert(hdrBucket(lb) == i, s"inverse at $v")
    }
    intercept[IllegalArgumentException](hdrBucket(-1L))
  }

  test("LogHist quantiles match exact percentile bucket on a known set") {
    import graft.operators.Sketches._
    // 1..1000: p50 target rank 500 → value 500 lands in its bucket
    val h = Array.ofDim[Long](HdrBuckets)
    (1L to 1000L).foreach(v => h(hdrBucket(v)) += 1)
    val Seq(p50, p95, p99) = hdrQuantiles(h, Seq(50, 95, 99))
    assert(p50 == hdrLowerBound(hdrBucket(500L)))
    assert(p95 == hdrLowerBound(hdrBucket(950L)))
    assert(p99 == hdrLowerBound(hdrBucket(990L)))
    // the monoid: splitting the stream and merging gives the same array
    val a = Array.ofDim[Long](HdrBuckets)
    val b = Array.ofDim[Long](HdrBuckets)
    (1L to 500L).foreach(v => a(hdrBucket(v)) += 1)
    (501L to 1000L).foreach(v => b(hdrBucket(v)) += 1)
    val merged = new LogHistMerge().reduce(a, b)
    assert(merged.toSeq == h.toSeq)
  }

  test("fastCount is metadata-only correct across chains, DVs, partitions") {
    val work = tempDir("fc")
    val cat = new TableCatalog(spark, work)
    val t = "d.s.fc"
    cat.overwrite(t, (1 to 400).map(i => (i.toLong, i % 9))
      .toDF("id", "b").repartition(3))
    cat.append(t, (401 to 450).map(i => (i.toLong, i % 9)).toDF("id", "b"))
    assert(cat.fastCount(t).contains(450L))
    cat.deleteWhereDV(t, col("b") === 4)
    assert(cat.fastCount(t).contains(cat.count(t)))
    // a chain file without harvested stats disables the fast path
    val statsFiles = new java.io.File(s"$work/d/s/fc").listFiles()
      .filter(_.isDirectory).flatMap(_.listFiles())
      .filter(_.getName == "_STATS")
    assert(statsFiles.nonEmpty)
    statsFiles.foreach(f => assert(f.delete()))
    assert(cat.fastCount(t).isEmpty)
    // partitioned tables fast-count too (stats harvest recurses)
    val tp = "d.s.fcp"
    cat.overwritePartitioned(tp, (1 to 300).map(i => (i.toLong, i % 5))
      .toDF("id", "p"), Seq("p"))
    assert(cat.fastCount(tp).contains(300L))
  }

  test("Bpe merge application is greedy left-to-right non-overlapping") {
    import graft.operators.Bpe
    val df = Seq("aaaa", "abab", "xaay").toDF("w")
      .withColumn("s", Bpe.wrap(col("w")))
    val m = Seq(Bpe.Merge(1, "a", "a", "aa", 0L))
    val got = Bpe.applyMerges(df, "s", m)
      .select(col("w"), col("s"), Bpe.symbolCount("s").as("n"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2)))
      .toMap
    assert(got("aaaa") == ("(aa)(aa)", 2)) // two disjoint merges
    assert(got("abab") == ("(a)(b)(a)(b)", 4)) // no (a,a) pair
    assert(got("xaay") == ("(x)(aa)(y)", 3))
  }

  test("bloom index skips files on point lookup and builds incrementally") {
    val cat = new TableCatalog(spark, tempDir("bloom"))
    val t = "d.s.bl"
    val df = (1 to 4000).map(i => (i.toLong, s"key_$i")).toDF("id", "k")
    cat.overwrite(t, df.filter(col("id") <= 2000).repartition(4))
    assert(cat.buildBloomIndex(t, "k") == 4)
    cat.append(t, df.filter(col("id") > 2000).repartition(4))
    assert(cat.buildBloomIndex(t, "k") == 4) // only the appended files
    assert(cat.buildBloomIndex(t, "k") == 0) // idempotent
    val probe = cat.readPoint(t, "k", "key_1234")
    assert(probe.count() == 1)
    assert(probe.inputFiles.length < 8) // pre-planning file skipping
    // absent key: the blooms answer "nowhere" (a stray 1%-FPR file
    // passing is possible but a single probe hitting one is ~8%·1 file)
    val miss = cat.readPoint(t, "k", "key_99999")
    assert(miss.count() == 0)
    assert(miss.inputFiles.length <= 1)
    // DV masks still apply on the point-lookup path
    cat.deleteWhereDV(t, col("k") === "key_1234")
    assert(cat.readPoint(t, "k", "key_1234").count() == 0)
  }

  test("readChanges equals the snapshot diff, reading only changed files") {
    val cat = new TableCatalog(spark, tempDir("cdf"))
    val t = "d.s.cdf"
    val df = (1 to 600).map(i => (i.toLong, s"n$i", i * 1.0))
      .toDF("key", "name", "bal")
    cat.overwrite(t, df.filter(col("key") <= 500)
      .repartitionByRange(5, col("key")))
    val v0 = cat.version(t).get
    val v0Files = cat.dataFilePaths(t).map(_.split('/').last).toSet
    cat.append(t, df.filter(col("key") > 500))       // file-level inserts
    cat.deleteWhereDV(t, col("key") <= 20)           // MoR deletes
    cat.updateWhere(t, Map("bal" -> lit(-5.0)), col("key") === 333) // COW
    val v1 = cat.version(t).get
    val changes = cat.readChanges(t, v0, v1).cache()
    try {
      val oldSnap = cat.readVersion(t, v0)
      val newSnap = cat.readVersion(t, v1)
      val ins = changes.filter(col("_change_type") === "insert")
        .drop("_change_type")
      val del = changes.filter(col("_change_type") === "delete")
        .drop("_change_type")
      // content equality against the full-snapshot EXCEPT ALL diff:
      // a COW rewrite's carried rows must net out entirely
      assert(ins.exceptAll(newSnap.exceptAll(oldSnap)).count() == 0)
      assert(newSnap.exceptAll(oldSnap).exceptAll(ins).count() == 0)
      assert(del.exceptAll(oldSnap.exceptAll(newSnap)).count() == 0)
      assert(oldSnap.exceptAll(newSnap).exceptAll(del).count() == 0)
      // the diff never opened v0's untouched bulk
      val readNames = changes.inputFiles.map(_.split('/').last).toSet
      assert((v0Files -- readNames).nonEmpty)
    } finally changes.unpersist()
    // empty window → empty feed with the right schema
    val none = cat.readChanges(t, v1, v1)
    assert(none.columns.contains("_change_type") && none.count() == 0)
  }

  test("shallow clone is zero-copy, isolated both ways, time-travelable") {
    val cat = new TableCatalog(spark, tempDir("clone"))
    val (src, dst, dv0) = ("d.s.src", "d.s.dst", "d.s.dst0")
    cat.overwrite(src, (1 to 400).map(i => (i.toLong, i % 9))
      .toDF("id", "b").repartition(4))
    cat.deleteWhereDV(src, col("b") === 0)
    val vAfterDelete = cat.version(src).get
    cat.append(src, Seq((1001L, 1), (1002L, 2)).toDF("id", "b"))
    // time-travel clone of the pre-append version
    cat.cloneTable(src, dv0, Some(vAfterDelete))
    assert(cat.count(dv0) == (1 to 400).count(_ % 9 != 0))
    // live clone
    cat.cloneTable(src, dst)
    assert(cat.count(dst) == (1 to 400).count(_ % 9 != 0) + 2)
    // zero-copy: every referenced path lives under the source tree,
    // and the clone's own version dir holds no parquet
    assert(cat.dataFilePaths(dst).forall(_.contains("/src/")))
    // metadata rides along: fastCount works off referenced _STATS
    assert(cat.fastCount(dst).contains(cat.count(dst)))
    // divergence: COW on source, MoR delete on clone — no crosstalk
    cat.updateWhere(src, Map("b" -> lit(99)), col("id") <= 10)
    cat.deleteWhereDV(dst, col("id") > 390)
    assert(cat.read(dst).filter(col("b") === 99).count() == 0)
    assert(cat.read(src).filter(col("id") > 390 && col("id") <= 400).count() > 0)
    // clone over an existing table refuses
    intercept[IllegalArgumentException] { cat.cloneTable(src, dst) }
  }

  test("semanticDedup flags τ-neighbors within a cluster, keeps lowest id") {
    import graft.operators.Corpus
    val df = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)),   // seeds → 2 clusters
      (5L, Seq(1.0, 0.01)),                        // ≈id0 → dup
      (6L, Seq(-1.0, -0.02)),                      // anti-parallel: dot<0
      (7L, Seq(0.0, 2.0)))                         // ∥ id1, cos=1 → dup
      .toDF("id", "vec")
    val r = Corpus.semanticDedup(df, "id", "vec",
        k = 2, iters = 1, tauSqNum = 81, tauSqDen = 100) // τ = 0.9
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(!r(0) && !r(1)) // cluster canonicals survive
    assert(r(5))           // cos(0,5) ≈ 0.99995 ≥ 0.9, same cluster
    assert(!r(6))          // negative dot never dedups
    assert(r(7))           // exact colinearity with a lower id
  }

  test("round-6 queries return plausible rows at sf0.001") {
    for (q <- Seq("q212_deletion_vectors", "q213_mor_update",
        "q214_minmax_skipping", "q215_image_decode", "q216_bpe_train_loop",
        "q217_quantile_sketch", "q218_stream_dedup_sessions",
        "q219_stream_chained_windows", "q220_bpe_encode",
        "q221_metadata_count", "q222_bloom_point_lookup",
        "q223_incremental_cdf", "q225_shallow_clone",
        "q226_bigram_surprise")) {
      val df = QueriesRound6.all(q)(spark, sf)
      assert(df.count() > 0, q)
      // every evidence flag must be true or the query self-reports red
      val flags = df.schema.fields.filter(_.dataType ==
        org.apache.spark.sql.types.BooleanType).map(_.name)
      for (f <- flags)
        assert(df.filter(!col(f)).count() == 0, s"$q: $f is false")
    }
  }
}
