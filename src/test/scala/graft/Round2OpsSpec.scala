package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Clustering, Linkage, Profiler, Quantiles}

/** Unit specs for the round-2 operator additions. The DuckDB oracle
  * (q62-q74) is the exactness gate; these cover edge semantics the
  * oracle data doesn't reach. */
class Round2OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("kmeans assigns every vector, seeds are their own clusters at iter 1") {
    // two tight groups around (0,0) and (10,10); seeds 0 and 1 fall one
    // in each group → k-means must separate them exactly
    val vecs = Seq(
      (0L, Array(0.1f, 0.0f)), (1L, Array(10.0f, 10.1f)),
      (2L, Array(0.0f, 0.2f)), (3L, Array(9.9f, 10.0f)),
      (4L, Array(0.2f, 0.1f)), (5L, Array(10.1f, 9.9f))
    ).toDF("vec_id", "embedding")
    val out = Clustering.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L))
    assert(out(0L) == 0L && out(2L) == 0L && out(4L) == 0L)
    assert(out(1L) == 1L && out(3L) == 1L && out(5L) == 1L)
  }

  test("fuzzySelfJoin honors blocks, threshold, and id ordering") {
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitten", "b1"), (3L, "kitten", "b2"),
      (4L, "xyzzyq", "b1"), (5L, "kitten", "b1")
    ).toDF("id", "name", "blk")
    val out = Linkage.fuzzySelfJoin(df, "id", "name", Seq("blk"), maxDist = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    // within b1: (1,2) dist 1, (1,5) dist 0, (2,5) dist 1; never cross-block,
    // never (4,_) (dist 5), always id_a < id_b
    assert(out == Set((1L, 2L, 1L), (1L, 5L, 0L), (2L, 5L, 1L)))
  }

  test("fuzzySelfJoin block cap excludes runaway blocks entirely") {
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitten", "b1"), (3L, "mitten", "b1"),
      (4L, "alpha", "b2"), (5L, "alpa", "b2")
    ).toDF("id", "name", "blk")
    // b1 has 3 distinct values > cap 2 → dropped; b2 (2 distinct) kept
    val out = Linkage.fuzzySelfJoin(df, "id", "name", Seq("blk"),
        maxDist = 2, maxBlockDistinct = 2)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(out == Set((4L, 5L, 1L)))
    // default cap keeps everything
    val full = Linkage.fuzzySelfJoin(df, "id", "name", Seq("blk"), maxDist = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(full.contains((1L, 2L)) && full.contains((4L, 5L)))
  }

  test("cdc applyChanges: last writer wins, trailing delete removes key") {
    val changes = Seq(
      (1L, 1L, "I", "a"), (1L, 2L, "U", "b"),            // key 1 → b
      (2L, 1L, "I", "x"), (2L, 9L, "D", "gone"),         // key 2 deleted
      (3L, 5L, "U", "only"),                              // key 3 → only
      (4L, 7L, "U", "upd"), (4L, 7L, "D", "tie")          // same-seq tie → D wins
    ).toDF("key", "seq", "op", "v")
    val out = Cdc.applyChanges(changes, Seq("key"), "seq", "op")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "b", 3L -> "only"))
  }

  test("heavyHitters ranks by count then key, exact permille") {
    val df = (Seq.fill(70)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c"))
      .toDF("k")
    val out = Profiler.heavyHitters(df, Seq("k"), 2)
      .select("k", "n", "rank", "share_permille")
      .as[(String, Long, Long, Long)].collect().toList.sortBy(_._3)
    assert(out == List(("a", 70L, 1L, 700L), ("b", 20L, 2L, 200L)))
  }

  test("fuzzySelfJoin equals the naive quadratic reference on random data") {
    val rnd = new scala.util.Random(42)
    val vocab = Seq("alpha", "alpa", "alphq", "beta", "betta", "gamma",
      "gamm", "delta", "dleta", "zzzzzzz")
    for (round <- 1 to 3) {
      val rows = Seq.tabulate(60)(i =>
        (i.toLong, vocab(rnd.nextInt(vocab.size)), s"b${rnd.nextInt(3)}"))
      val df = rows.toDF("id", "name", "blk")
      val got = Linkage.fuzzySelfJoin(df, "id", "name", Seq("blk"), maxDist = 2)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
      def lev(a: String, b: String): Int = {
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      val want = (for {
        (ia, na, ba) <- rows; (ib, nb, bb) <- rows
        if ba == bb && ia < ib
        d = lev(na, nb) if d <= 2
      } yield (ia, ib, d.toLong)).toSet
      assert(got == want, s"round $round mismatch")
    }
  }

  test("cdc applyChanges equals a driver-side last-writer fold") {
    val rnd = new scala.util.Random(7)
    val changes = Seq.tabulate(300)(i =>
      (rnd.nextInt(20).toLong, i.toLong,
        if (rnd.nextInt(5) == 0) "D" else "U", s"v$i"))
    val got = Cdc.applyChanges(changes.toDF("key", "seq", "op", "v"),
        Seq("key"), "seq", "op")
      .select("key", "v").as[(Long, String)].collect().toMap
    val want = changes.groupBy(_._1).flatMap { case (k, cs) =>
      val last = cs.maxBy(_._2)
      if (last._3 == "D") None else Some(k -> last._4)
    }
    assert(got == want)
  }

  test("percentiles ignore NULL values; all-null group yields NULL") {
    val df = Seq(("g", Option(10)), ("g", Option.empty[Int]), ("g", Option(20)),
      ("g", Option(30)), ("h", Option.empty[Int])).toDF("grp", "v")
    val disc = Quantiles.percentilesDisc(df, "grp", "v", Seq(("p50", 1, 2)))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    // g: non-null {10,20,30}, rank ceil(0.5*3)=2 → 20; h: all null → NULL
    assert(disc == Map("g" -> Some(20), "h" -> None))
    val cont = Quantiles.percentilesCont(df, "grp", "v", Seq(("p50", 0.5)))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(cont == Map("g" -> Some(20.0), "h" -> None))
  }

  test("percentilesDisc picks the ceil(p*n) ranked value per group") {
    // group g: values 10,20,30,40 → p50 = rank ceil(0.5*4)=2 → 20;
    // p90 = rank ceil(3.6)=4 → 40
    val df = Seq(("g", 10), ("g", 20), ("g", 30), ("g", 40))
      .toDF("grp", "v")
    val out = Quantiles.percentilesDisc(df, "grp", "v",
        Seq(("p50", 1, 2), ("p90", 9, 10)))
      .select("grp", "p50", "p90").collect().head
    assert(out.get(1) == 20 && out.get(2) == 40)
  }
}
