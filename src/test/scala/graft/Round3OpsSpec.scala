package graft

import org.apache.spark.sql.functions._
import graft.operators.{BloomJoin, Cdc, Corpus, TimeSeries}

/** Round-3 operators: bloom-pruned semi join, version diff (CDF),
  * inverted-index search, hourly gap fill. */
class Round3OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom semiJoin == exact semi join; prefilter reduces pre-shuffle rows") {
    val fact = (1L to 2000L).map(i => (i % 500, i)).toDF("k", "v")
    val dim = (0L until 500L by 50L).toDF("k") // 10 of 500 keys
    val exact = fact.join(dim, Seq("k"), "left_semi")
      .orderBy("k", "v").collect().toSeq
    val got = BloomJoin.semiJoin(fact, "k", dim, "k",
        expectedItems = 64, fpp = 0.01)
      .orderBy("k", "v").collect().toSeq
    assert(got == exact)
    // the bloom prefilter alone (false positives allowed) must still
    // drop the vast majority of non-matching fact rows pre-shuffle
    val pre = BloomJoin.prefilter(fact, "k", dim, "k",
      expectedItems = 64, fpp = 0.01).count()
    val trueMatches = exact.size.toLong
    assert(pre >= trueMatches)
    assert(pre <= trueMatches + (fact.count() * 0.05).toLong,
      s"prefilter kept $pre rows for $trueMatches true matches")
  }

  test("versionDiff emits insert/update/delete and applying it reproduces `after`") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "x")
    val after = Seq((1L, "a", 10.0), // unchanged — absent from feed
      (2L, "B", 20.0), // update (payload change)
      (4L, null.asInstanceOf[String], 41.0), // update with null col
      (5L, "e", 50.0)) // insert;  3 deleted
      .toDF("k", "s", "x")
    val feed = Cdc.versionDiff(before, after, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3))).toSet
    assert(feed == Set(
      (2L, "B", 20.0, "update"),
      (4L, null, 41.0, "update"),
      (5L, "e", 50.0, "insert"),
      (3L, "c", 30.0, "delete")))
    // round trip: before minus deleted/updated keys, plus feed upserts
    val upserts = feed.filter(_._4 != "delete").map(t => (t._1, t._2, t._3)).toSeq
    val deadKeys = feed.map(_._1)
    val rebuilt = before.as[(Long, String, Double)].collect()
      .filterNot(r => deadKeys.contains(r._1)) ++ upserts
    assert(rebuilt.toSet == after.as[(Long, String, Double)].collect().toSet)
  }

  test("versionDiff round-trips on random snapshots: before + feed == after") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 3) {
      val before = (0L until 60L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"s${rnd.nextInt(3)}", rnd.nextInt(5).toDouble))
      val after = (0L until 60L).filter(_ => rnd.nextBoolean())
        .map(k => (k, s"s${rnd.nextInt(3)}", rnd.nextInt(5).toDouble))
      val feed = Cdc.versionDiff(before.toDF("k", "s", "x"),
          after.toDF("k", "s", "x"), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3)))
      // rebuild after from before + feed
      val touched = feed.map(_._1).toSet
      val rebuilt = before.filterNot(r => touched.contains(r._1)) ++
        feed.filter(_._4 != "delete").map(t => (t._1, t._2, t._3))
      assert(rebuilt.toSet == after.toSet, s"round $round")
      // feed types are consistent with key presence
      val bk = before.map(_._1).toSet
      val ak = after.map(_._1).toSet
      feed.foreach { case (k, _, _, t) =>
        val expected =
          if (!bk.contains(k)) "insert" else if (!ak.contains(k)) "delete"
          else "update"
        assert(t == expected, s"key $k: $t != $expected")
      }
    }
  }

  test("bloom semiJoin equals plain semi join on random key sets") {
    val rnd = new scala.util.Random(23)
    for (round <- 1 to 3) {
      val fact = Seq.fill(800)((rnd.nextInt(300).toLong, rnd.nextInt(1000).toLong))
        .toDF("k", "v")
      val dim = Seq.fill(40)(rnd.nextInt(300).toLong).distinct.toDF("k")
      val want = fact.join(dim, Seq("k"), "left_semi")
        .as[(Long, Long)].collect().sorted.toSeq
      val got = BloomJoin.semiJoin(fact, "k", dim, "k",
          expectedItems = 64, fpp = 0.05)
        .as[(Long, Long)].collect().sorted.toSeq
      assert(got == want, s"round $round")
    }
  }

  test("inverted-index conjunctive search matches per-doc contains-all") {
    val docs = Seq(
      (1L, "spark merge vector fast"),
      (2L, "spark merge slow"),
      (3L, "vector spark merge merge spark"),
      (4L, "nothing relevant here"),
      (5L, "Spark MERGE Vector mixed case")).toDF("doc_id", "text")
    val got = Corpus.searchAll(docs, "doc_id", "text",
      Seq("spark", "merge", "vector")).as[Long].collect().toSet
    assert(got == Set(1L, 3L, 5L))
  }

  test("quantizeInt8: codes bounded by ±127, max component hits ±127, zero vector → zeros") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(3.0f))).toDF("id", "v")
    val got = df.select(col("id"), Similarity.quantizeInt8(col("v")).as("q"))
      .orderBy("id").as[(Long, Seq[Long])].collect()
    assert(got(0)._2 == Seq(64L, -127L, 32L)) // scale 127/1.0; round(.5*127)=64 HALF_UP
    assert(got(1)._2 == Seq(0L, 0L, 0L))
    assert(got(2)._2 == Seq(127L))
    got.foreach { case (_, q) => q.foreach(c => assert(math.abs(c) <= 127)) }
  }

  test("winsorize clamps into the exact percentile_disc band") {
    import graft.operators.Quantiles
    val df = (1 to 100).map(i => ("g", i.toLong)).toDF("grp", "v")
    val w = Quantiles.winsorize(df, "grp", "v", (1, 20), (19, 20))
      .select("v", "v_w").as[(Long, Long)].collect().toMap
    // p05 of 1..100 (disc, ceil(0.05*100)=rank 5) = 5; p95 = rank 95 = 95
    assert(w(1L) == 5L && w(4L) == 5L && w(5L) == 5L)
    assert(w(50L) == 50L)
    assert(w(95L) == 95L && w(96L) == 95L && w(100L) == 95L)
  }

  test("hashStratifiedSample is deterministic and rate-monotone") {
    import graft.operators.Corpus
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val s30 = Corpus.hashStratifiedSample(df, "id", "lang",
      Map("en" -> 30), defaultPct = 100)
    val s60 = Corpus.hashStratifiedSample(df, "id", "lang",
      Map("en" -> 60), defaultPct = 100)
    val en30 = s30.filter($"lang" === "en").as[(Long, String)].collect().map(_._1).toSet
    val en60 = s60.filter($"lang" === "en").as[(Long, String)].collect().map(_._1).toSet
    assert(en30.subsetOf(en60), "raising the rate must only add rows")
    // fr untouched at 100%
    assert(s30.filter($"lang" === "fr").count() == 500)
    // repeat run identical (no RNG state)
    val again = Corpus.hashStratifiedSample(df, "id", "lang",
      Map("en" -> 30), defaultPct = 100)
      .filter($"lang" === "en").as[(Long, String)].collect().map(_._1).toSet
    assert(again == en30)
  }

  test("fixed-width render/parse round-trips and rejects field overflow") {
    import graft.sources.FixedWidthReader
    import graft.sources.FixedWidthReader.FieldSpec
    val layout = Seq(FieldSpec("id", 1, 6, "bigint"), FieldSpec("name", 7, 10))
    val df = Seq((42L, "alpha"), (7L, "beta")).toDF("id", "name")
    val lines = FixedWidthReader.render(df, layout)
    assert(lines.as[String].collect().forall(_.length == 16))
    val back = FixedWidthReader.parse(lines, "value", layout)
      .as[(Long, String)].collect().toSet
    assert(back == Set((42L, "alpha"), (7L, "beta")))
    val overflow = Seq((1L, "this-name-is-way-too-long")).toDF("id", "name")
    val ex = intercept[Exception] {
      FixedWidthReader.render(overflow, layout).collect()
    }
    assert(ex.getMessage.contains("fixed-width overflow") ||
      Option(ex.getCause).exists(_.getMessage.contains("fixed-width overflow")))
  }

  test("gapFillHourly fills missing hours with n=0 and carries last type forward") {
    val e = Seq(
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:10:00"), "a"),
      (7L, java.sql.Timestamp.valueOf("2024-01-01 00:40:00"), "b"),
      // gap: hours 01,02
      (7L, java.sql.Timestamp.valueOf("2024-01-01 03:05:00"), "c"),
      (8L, java.sql.Timestamp.valueOf("2024-01-02 10:00:00"), "z"))
      .toDF("user_id", "ts", "event_type")
    val rows = TimeSeries.gapFillHourly(e, "user_id", "ts", "event_type")
      .orderBy("user_id", "hour")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (7L, "2024-01-01 00:00", 2L, "b"), // max(a,b) in hour 0
      (7L, "2024-01-01 01:00", 0L, "b"), // forward fill
      (7L, "2024-01-01 02:00", 0L, "b"),
      (7L, "2024-01-01 03:00", 1L, "c"),
      (8L, "2024-01-02 10:00", 1L, "z")))
  }
}
