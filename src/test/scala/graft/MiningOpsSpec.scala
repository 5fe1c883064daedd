package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Intervals, Stats, TopK}

/** Round-3 mining operators: bounded top-k aggregator, exact linear
  * fit, integer sigma outliers, interval islands. */
class MiningOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("BoundedTopK == window row_number formulation (seeded random)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(5000)((rnd.nextInt(7).toString, rnd.nextInt(1000).toLong,
      rnd.nextLong().abs % 100000))
      .zipWithIndex.map { case ((g, ord, _), i) => (g, ord, i.toLong) }
    val df = rows.toDF("g", "ord", "id")
    val got = TopK.topKPerGroup(spark, df, "g", "ord", "id", k = 4)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val w = Window.partitionBy($"g").orderBy($"ord".desc, $"id")
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 4).select("g", "rank", "id", "ord")
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("BoundedTopK handles groups smaller than k and duplicate ord ties") {
    val df = Seq(("a", 5L, 1L), ("a", 5L, 2L), ("b", 1L, 3L)).toDF("g", "ord", "id")
    val got = TopK.topKPerGroup(spark, df, "g", "ord", "id", k = 10)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // ties broken by ascending id; small groups emit all rows
    assert(got == Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 3L)))
  }

  test("BoundedTopK and BottomKDistinct plan with map-side partial aggregation") {
    import graft.operators.Sketches
    val df = (1L to 100L).map(i => (i % 5, i, i * 3)).toDF("g", "ord", "id")
    val topkPlan = TopK.topKPerGroup(spark, df.selectExpr("cast(g as string) g",
        "ord", "id"), "g", "ord", "id", 3)
      .queryExecution.executedPlan.toString
    // typed Aggregators run as ObjectHashAggregate with a partial_
    // stage before the exchange — the bounded buffer IS the map-side
    // combine; without it every row would cross the shuffle
    assert(topkPlan.contains("ObjectHashAggregate"), topkPlan)
    assert(topkPlan.contains("partial_"), topkPlan)
    val skPlan = Sketches.bottomKSketch(spark,
        df.selectExpr("cast(g as string) g", "id"), "g", "id", 4)
      .queryExecution.executedPlan.toString
    assert(skPlan.contains("ObjectHashAggregate"), skPlan)
    assert(skPlan.contains("partial_"), skPlan)
  }

  test("linearFit recovers an exact affine relation") {
    // y = 3x + 5 exactly → slope_ppm 3_000_000, intercept_ppm 5_000_000
    val df = (1L to 100L).map(x => ("g", x, 3 * x + 5)).toDF("grp", "x", "y")
    val r = Stats.linearFit(df, "grp", "x", "y").collect().head
    assert(r.getAs[Long]("slope_ppm") == 3000000L)
    assert(r.getAs[Long]("intercept_ppm") == 5000000L)
    assert(r.getAs[Long]("n") == 100L)
  }

  test("linearFit negative slope is sign-stable") {
    val df = (1L to 50L).map(x => ("g", x, 1000 - 2 * x)).toDF("grp", "x", "y")
    val r = Stats.linearFit(df, "grp", "x", "y").collect().head
    assert(r.getAs[Long]("slope_ppm") == -2000000L)
    assert(r.getAs[Long]("intercept_ppm") == 1000000000L)
  }

  test("sigmaOutliers flags exactly the planted spike") {
    // 99 values at 100, one at 10_000: only the spike exceeds 3σ
    val vals = Seq.fill(99)(100L) :+ 10000L
    val df = vals.zipWithIndex.map { case (v, i) => ("g", i.toLong, v) }
      .toDF("grp", "id", "v")
    val got = Stats.sigmaOutliers(df, "grp", "v", "id", k = 3)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(99L))
  }

  test("modePerGroup picks the most frequent value, smallest on ties") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "y"), ("b", "q"), ("b", "p"))
      .toDF("g", "v")
    val got = Stats.modePerGroup(df, "g", "v").orderBy("g").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // b ties 1-1 → lexicographically smallest ("p") wins
    assert(got == Seq(("a", "y", 2L), ("b", "p", 1L)))
  }

  test("DataQuality.report counts violations per declared check") {
    import graft.operators.DataQuality._
    val child = Seq((1L, java.lang.Double.valueOf(5.0)),
      (2L, java.lang.Double.valueOf(50.0)),
      (2L, null.asInstanceOf[java.lang.Double]),
      (9L, java.lang.Double.valueOf(-1.0))).toDF("k", "x")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = report(child, Seq(
        NotNull("x"), Unique("k"), Bounds("x", 0.0, 10.0),
        RefIntegrity("k", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == Set(
      ("not_null", "x", 1L, false),      // one null x
      ("unique", "k", 1L, false),        // k=2 twice
      ("bounds", "x", 2L, false),        // 50.0 and -1.0 out of band
      ("ref_integrity", "k", 1L, false)  // k=9 has no parent
    ))
  }

  test("DataQuality.report handles RefIntegrity-only and empty check lists") {
    import graft.operators.DataQuality._
    val child = Seq((1L, 1.0), (9L, 2.0)).toDF("k", "x")
    val parent = Seq(1L, 2L).toDF("pk")
    val ri = report(child, Seq(RefIntegrity("k", parent, "pk")))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
    assert(ri.toSeq == Seq(("ref_integrity", 1L, false)))
    assert(report(child, Seq.empty).count() == 0L)
  }

  test("sequenceGaps bucketed == global-lag reference, incl. seam gaps") {
    // keys chosen so gaps fall inside buckets AND across bucket seams
    val keys = Seq(1L, 2L, 5L, 9L, 10L, 35L, 36L, 40L, 90L)
    val df = keys.toDF("k")
    val got = Intervals.sequenceGaps(df, "k", bucketSize = 10L)
      .orderBy("gap_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val sorted = keys.sorted
    val want = sorted.zip(sorted.tail).collect {
      case (a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1) }
    assert(got == want)
  }

  test("bottomKSketch: per-group sketches + merged row match a driver fold") {
    import graft.operators.Sketches
    val df = (1L to 300L).map(i => (if (i % 3 == 0) "a" else "b", i))
      .toDF("g", "v")
    val got = Sketches.bottomKSketch(spark, df, "g", "v", k = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver reference: same hash, same bottom-k, same estimate
    def h60(v: Long): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(v.toString)
          .substring(0, 15), 16)
    def sketch(vs: Seq[Long]): Seq[Long] =
      vs.map(h60).distinct.sorted.take(8)
    def est(sk: Seq[Long]): Long =
      if (sk.size < 8) sk.size
      else (7L * 1073741824L) / ((sk.last / 1073741824L) + 1L)
    val aVs = (1L to 300L).filter(_ % 3 == 0)
    val bVs = (1L to 300L).filterNot(_ % 3 == 0)
    val aSk = sketch(aVs); val bSk = sketch(bVs)
    val allSk = (aSk ++ bSk).distinct.sorted.take(8)
    assert(got("a") == ((aSk.last, 8L, est(aSk))))
    assert(got("b") == ((bSk.last, 8L, est(bSk))))
    assert(got("__all") == ((allSk.last, 8L, est(allSk))))
    // merged sketch of the union == sketch of merged data (monoid law)
    assert(allSk == sketch(aVs ++ bVs))
  }

  test("rollingDistinctDaily == brute-force window count") {
    import graft.operators.TimeSeries
    val ts = (d: Int) => new java.sql.Timestamp(
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00").getTime)
    val rows = Seq((1L, 1), (1L, 2), (2L, 2), (3L, 9), (1L, 9), (1L, 15))
      .map { case (u, d) => (u, ts(d)) }
    val got = TimeSeries.rollingDistinctDaily(
        rows.toDF("user_id", "ts"), "user_id", "ts", 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    // brute force per active day: distinct users with activity in [d-6, d]
    val byDay = rows.map { case (u, t) => (u, t.toLocalDateTime.toLocalDate) }
    val activeDays = byDay.map(_._2).distinct
    val want = activeDays.map { d =>
      d.toString -> byDay.filter { case (_, ad) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(7)) }.map(_._1).distinct.size.toLong
    }.toMap
    assert(got == want)
  }

  test("setSimilarityJoin prefix filter is lossless vs naive all-pairs") {
    import graft.operators.{Dedup, Linkage}
    val rnd = new scala.util.Random(23)
    val vocab = ('a' to 'p').map(_.toString)
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("id", "text")
    val got = Linkage.setSimilarityJoin(docs, "id", "text", 60, 100)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // naive: exact Jaccard on every sharing pair (non-sharing pairs
    // have jaccard 0 and can never pass)
    val terms = Dedup.shingleTerms(docs, "id", "text", 1)
      .withColumnRenamed("term", "t").select($"id", $"t").distinct()
    val allPairs = terms.select($"id".as("id_a"), $"t")
      .join(terms.select($"id".as("id_b"), $"t"), Seq("t"))
      .filter($"id_a" < $"id_b").select("id_a", "id_b").distinct()
    val want = Dedup.pairJaccardTerms(
        docs.select($"id",
          org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.array_distinct(
              graft.functions.TextFunctions.tokens(
                org.apache.spark.sql.functions.lower($"text")))).as("term")),
        allPairs)
      .filter($"inter" * 100 >= ($"size_a" + $"size_b" - $"inter") * 60)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("imputeMedian fills nulls with the group's exact median") {
    val df = Seq(("g", Some(1L)), ("g", Some(5L)), ("g", Some(9L)),
      ("g", None), ("h", Some(4L)), ("h", None)).map {
        case (g, v) => (g, v.map(Long.box).orNull) }
      .toDF("grp", "v")
    val got = Stats.imputeMedian(df, "grp", "v")
      .select("grp", "v_filled", "was_null").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(t => (t._2, t._3)).toSeq).toMap
    // g: median of {1,5,9} = 5 → null filled with 5
    assert(got("g") == Seq(("g", 1L, false), ("g", 5L, false),
      ("g", 5L, true), ("g", 9L, false)))
    assert(got("h") == Seq(("h", 4L, false), ("h", 4L, true)))
  }

  test("denseIds bucketed == global ROW_NUMBER, duplicate keys across buckets") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(2000)(i => (rnd.nextInt(40).toLong, i.toLong))
    val df = rows.toDF("k", "id")
    val got = Intervals.denseIds(df, "k", "id", bucketSize = 8L)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("seq_id"))).toSeq
    val want = rows.sortBy(t => (t._1, t._2)).zipWithIndex
      .map { case ((k, id), i) => (k, id, i.toLong) }
    assert(got == want)
  }

  test("timeWeightedAvg matches a driver-side integration") {
    import graft.operators.TimeSeries
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val rows = Seq((1L, 0L, 100L), (2L, 10L, 200L), (3L, 40L, -50L),
      (4L, 100L, 7L), (5L, 0L, 42L)) // id 5 = lone sample, other key
      .map { case (id, t, v) => (if (id == 5L) "b" else "a", id, ts(t), v) }
    val got = TimeSeries.timeWeightedAvg(
        rows.toDF("k", "id", "ts", "v"), "k", "ts", "id", "v")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // a: 100·10s + 200·30s + (−50)·60s over 100s = (1000+6000−3000)/100 = 40
    assert(got("a") == ((3L, 40L)))
    assert(!got.contains("b")) // single sample → no interval
  }

  test("mergeIntervals merges overlapping and touching, splits gapped") {
    val df = Seq(
      ("k", 1L, 5L), ("k", 4L, 8L),   // overlap → island 1
      ("k", 8L, 10L),                 // touching (start == prev end) → merges
      ("k", 15L, 20L),                // gap → island 2
      ("z", 0L, 1L))                  // separate key
      .toDF("key", "s", "e")
    val got = Intervals.mergeIntervals(df, "key", "s", "e")
      .orderBy("key", "island")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("k", 1L, 1L, 10L, 3L),
      ("k", 2L, 15L, 20L, 1L),
      ("z", 1L, 0L, 1L, 1L)))
  }
}
