package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Graph, Skyline}

/** Round-3 graph/corpus/skyline operators. */
class GraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("pageRank: fixed-point ranks match a driver-side reference fold") {
    // small directed graph with a sink (4) and a cycle (1→2→3→1)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // reference: same integer arithmetic, naively on the driver
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L))
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size
    val base = (15L * Graph.Scale) / (100L * n)
    var r = nodes.map(_ -> Graph.Scale / n).toMap
    for (_ <- 1 to 3) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v -> (base + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == r)
    // ranks are conserved-ish: cycle members outrank the pure sink feeders
    assert(got(4L) > got(2L) || got(1L) > 0) // sanity: all positive
    assert(got.values.forall(_ > 0))
  }

  test("Dfs checkpoint strategy matches Local on pageRank and components") {
    import graft.operators.CheckpointStrategy
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 4L))
      .toDF("src", "dst")
    val dfs = CheckpointStrategy.Dfs(graft.Scratch.dir("graft_ckpt"))
    val local = Graph.pageRank(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDfs = Graph.pageRank(edges, iters = 3, ckpt = dfs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDfs == local)
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val ccLocal = Corpus.connectedComponents(nodes, und)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ccDfs = Corpus.connectedComponents(nodes, und, ckpt = dfs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDfs == ccLocal)
    assert(ccDfs == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("bfsHops: minimal depths, undirected, depth-bounded, multi-seed") {
    import graft.operators.CheckpointStrategy
    // path 1-2-3-4-5-6, shortcut 1-4, island 100-101
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (100L, 101L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut beats the long path to 4 (dist 1, not 3); 5 at 2 via 4;
    // 6 is 3 hops away → cut by the bound; the island is unreachable
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L))

    // two seeds: every node takes the nearer one; Dfs strategy agrees
    val two = Graph.bfsHops(edges, Seq(1L, 6L).toDF("node"), maxHops = 2,
        ckpt = CheckpointStrategy.Dfs(graft.Scratch.dir("graft_bfs")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two == Map(1L -> 0L, 6L -> 0L, 2L -> 1L, 4L -> 1L, 5L -> 1L,
      3L -> 2L))
  }

  test("temporalReachability: time-decreasing paths are inadmissible") {
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")
    // 1→2 fires on day 5; 2→3 fired on day 3 (BEFORE arrival at 2 —
    // statically reachable, temporally not); 2→4 fires day 7 (ok);
    // 1→3 also directly on day 9 (later but admissible)
    val edges = Seq(
      (1L, 2L, ts("2020-01-05")), (2L, 3L, ts("2020-01-03")),
      (2L, 4L, ts("2020-01-07")), (1L, 3L, ts("2020-01-09")))
      .toDF("src", "dst", "t")
    val got = Graph.temporalReachability(edges, Seq(1L).toDF("node"),
        "2020-01-01", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getTimestamp(1).toString).toMap
    assert(got(1L).startsWith("2020-01-01"))
    assert(got(2L).startsWith("2020-01-05"))
    assert(got(4L).startsWith("2020-01-07"))
    // 3 is reached ONLY via the late direct edge, never through 2
    assert(got(3L).startsWith("2020-01-09"))
  }

  test("minPlusPaths: cheap long route beats expensive direct edge") {
    // 1→3 direct costs 10; 1→2→3 costs 2+3=5; bound excludes 4 at 3 hops
    val edges = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L),
      (3L, 4L, 1L)).toDF("src", "dst", "w")
    // rounds=2: 3 is cheaper via 1→2→3 (5); 4 only via the expensive
    // direct-then-hop 1→3→4 (11) — the cheap 3-hop route needs round 3
    val got = Graph.minPlusPaths(edges, Seq(1L).toDF("node"), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 11L))
    val three = Graph.minPlusPaths(edges, Seq(1L).toDF("node"), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(three(4L) == 6L) // 1→2→3→4 now admissible
    // tighter bound: within 1 hop the expensive direct edge is best
    val one = Graph.minPlusPaths(edges, Seq(1L).toDF("node"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 2L, 3L -> 10L))
  }

  test("personalizedPageRank: exact integer fold, island stays at zero") {
    // chain 1-2-3-4 plus an island 10-11; seed at 1
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (10L, 11L), (11L, 10L))
    val r = Graph.personalizedPageRank(e.toDF("src", "dst"),
        Seq(1L).toDF("node"), iters = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap

    // driver-side reference: same integer arithmetic, naive fold
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val seedBase = (15L * Graph.Scale) / 100L // |S| = 1
    var ref = nodes.map(v => v -> (if (v == 1L) Graph.Scale else 0L)).toMap
    for (_ <- 1 to 3) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => ref(s) / out(s) }.sum).toMap
      ref = nodes.map(v => v ->
        ((if (v == 1L) seedBase else 0L) +
          85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(r == ref)
    // the island never receives teleport or walk mass; near side > far
    assert(r(10L) == 0L && r(11L) == 0L)
    assert(r(1L) + r(2L) > r(3L) + r(4L))
  }

  test("dedupBlocks removes corpus-repeated spans and rebuilds text") {
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg hh"),     // blocks: [aa bb cc dd] [ee ff gg hh]
      (2L, "aa bb cc dd xx yy"),           // [aa bb cc dd] repeated → removed
      (3L, "zz ww")).toDF("id", "text")
    val got = Corpus.dedupBlocks(df, "id", "text", block = 4, maxOccurrences = 2L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (1L, "ee ff gg hh", 1L, 1L),
      (2L, "xx yy", 1L, 1L),
      (3L, "zz ww", 1L, 0L)))
  }

  test("dedupBlocks survives empty and all-hot documents") {
    val df = Seq((1L, "p q p q"), (2L, "p q"), (3L, "p q"), (4L, ""))
      .toDF("id", "text")
    // block=2: "p q" occurs 4× (twice in doc 1) → all hot
    val got = Corpus.dedupBlocks(df, "id", "text", block = 2, maxOccurrences = 3L)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, "", 0L, 2L), (2L, "", 0L, 1L), (3L, "", 0L, 1L)))
    // doc 4 has zero blocks → zero rows from the explode → absent
  }

  test("salted triangle wedge join: identical result, hub keys skew-split") {
    // planted hub 50 as MIDDLE vertex (canonical a < b < c): spokes
    // (i, 50) and (50, i+50) plus closers (i, i+50) → 40 hub triangles;
    // one cold off-hub triangle (middle vertex degree 2)
    val hubEdges = (1 to 40).flatMap(i =>
      Seq((i.toLong, 50L), (50L, i + 50L), (i.toLong, i + 50L))) ++
      Seq((100L, 101L), (100L, 102L), (101L, 102L))
    val edges = hubEdges.toDF("id_a", "id_b")
    val plain = Corpus.triangles(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(plain.size == 41)
    val salted = Corpus.triangles(edges, saltFactor = 4, hubMinDegree = 10L)
    val got = salted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == plain)
    // the hot path is actually taken: the salted plan carries the salt key
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
    // and the hub's wedge build no longer shares one shuffle key: the
    // left side's 40 hub rows spread over > 1 (b, salt) sub-keys
    val salts = edges.select(col("id_a").as("a"), col("id_b").as("b"))
      .filter(col("b") === 50L)
      .select(graft.operators.Salting.saltColumn(4, col("a")).as("s"))
      .distinct().count()
    assert(salts > 1, s"expected hub rows across >1 salt buckets, got $salts")
  }

  test("dedupBlocks treats null text like empty text (no phantom blocks)") {
    // size(NULL) = -1: a `= 0` guard would send null text down the
    // sequence(1, …) branch and fabricate blocks — null docs must be
    // absent from the output exactly like empty docs
    val df = Seq((1L, "aa bb"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("id", "text")
    val got = Corpus.dedupBlocks(df, "id", "text", block = 2,
        maxOccurrences = 99L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "aa bb")))
  }

  test("incrementalNearDupes == batch nearDuplicates restricted to new×old") {
    import graft.operators.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val old = docs.filter($"doc_id" < 80)
    val fresh = docs.filter($"doc_id" >= 80)
    val idx = Dedup.minhashBands(old, "doc_id", "text", 2, 4)
      .withColumnRenamed("doc_id", "id")
    val terms = Dedup.shingleTerms(old, "doc_id", "text", 2)
    val got = Dedup.incrementalNearDupes(fresh, "doc_id", "text", idx, terms,
        2, 4, 2, 100)
      .select("id_new", "id_old").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: batch near-dups over the whole corpus, keep only
    // pairs that straddle the old/new split
    val all = Dedup.nearDuplicates(docs, "doc_id", "text", 2, 4, 2, 100)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = all.collect {
      case (a, b) if a < 80 && b >= 80 => (b, a)
      case (a, b) if a >= 80 && b < 80 => (a, b)
    }
    assert(got == want && got.nonEmpty)
  }

  test("debounce keeps burst heads; timer resets within a burst") {
    import graft.operators.TimeSeries
    val ts = (s: Long) => new java.sql.Timestamp(s * 1000L)
    val df = Seq(
      (1L, 1L, "a", ts(0)), (2L, 1L, "a", ts(100)), (3L, 1L, "a", ts(200)),
      (4L, 1L, "a", ts(900)),  // 700s gap from #3 → new burst
      (5L, 1L, "b", ts(905)),  // type change → kept
      (6L, 2L, "a", ts(0)))    // other key
      .toDF("event_id", "user_id", "event_type", "ts")
    val kept = TimeSeries.debounce(df, "user_id", "ts", "event_id",
        "event_type", gapSeconds = 600L)
      .select("event_id").as[Long].collect().toSet
    // #2,#3 are within 600s of their immediate predecessor → dropped
    assert(kept == Set(1L, 4L, 5L, 6L))
  }

  test("importanceSample keeps weight-0 never, weight-1e6 always") {
    import graft.operators.Corpus
    val df = (1L to 500L).toDF("id")
      .withColumn("w", when($"id" <= 250, 0L).otherwise(1000000L))
    val kept = Corpus.importanceSample(df, "id", "w")
      .select("id").as[Long].collect().toSet
    assert(kept == (251L to 500L).toSet)
  }

  test("pareto2d == quadratic NOT EXISTS reference") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(400)(i => (i.toLong, rnd.nextInt(30).toLong,
      rnd.nextInt(1000).toLong))
    val df = pts.toDF("id", "size", "price")
    val want = pts.filter { case (_, s, p) =>
      !pts.exists { case (_, s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p) }
    }.map(_._1).toSet
    // one bucket (degenerate), many buckets (seam stitching), and a
    // bucket size that isolates every distinct value on its own seam
    for (bs <- Seq(1L << 20, 7L, 1L)) {
      val got = Skyline.pareto2d(df, "size", "price", bucketSize = bs)
        .select("id").as[Long].collect().toSet
      assert(got == want && got.nonEmpty, s"bucketSize=$bs")
    }
  }
}
