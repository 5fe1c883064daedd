package graft

import org.apache.spark.sql.functions._
import graft.operators.{Intervals, Similarity}

class Round5OpsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("denseIdsOrdered: dense 0..n-1 ids matching the global sort order") {
    val df = Seq(("b", 2L), ("a", 1L), ("c", 3L), ("a", 4L), ("b", 5L))
      .toDF("k", "id")
    for (parts <- Seq(1, 2, 4)) {
      val got = Intervals.denseIdsOrdered(df, Seq("k", "id"), parts)
        .orderBy("seq_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      // expected order: (a,1) (a,4) (b,2) (b,5) (c,3) with ids 0..4
      assert(got.toSeq == Seq(("a", 1L, 0L), ("a", 4L, 1L), ("b", 2L, 2L),
        ("b", 5L, 3L), ("c", 3L, 4L)), s"parts=$parts")
    }
  }

  test("denseIdsOrdered: seeded-random data matches the window formulation") {
    val rnd = new scala.util.Random(20260813L)
    val rows = (0L until 500L).map { id =>
      (("k" * (1 + rnd.nextInt(3))) + rnd.nextInt(40), id)
    }
    val df = rows.toDF("k", "id")
    import org.apache.spark.sql.expressions.Window
    val want = df.withColumn("seq_id",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long") - 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (parts <- Seq(3, 7)) {
      val got = Intervals.denseIdsOrdered(df, Seq("k", "id"), parts)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("l2Exact: zero on self, symmetric, equals the quantized reference") {
    // reference quantization — identical to ArrayQuantDot's
    // sign·Math.round(|x·1e7|) (see ArrayOps Scaladoc)
    def q(x: Float): Long = {
      val y = x.toDouble * 1e7
      if (y >= 0) Math.round(y) else -Math.round(-y)
    }
    val rnd = new scala.util.Random(42L)
    val vecs = (0L until 30L).map(i =>
      (i, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val byId = vecs.toMap
    val df = vecs.toDF("id", "v")
    val got = df.select(col("id").as("ia"), col("v").as("a"))
      .crossJoin(df.select(col("id").as("ib"), col("v").as("b")))
      .select(col("ia"), col("ib"),
        Similarity.l2Exact(col("a"), col("b")).as("d2"),
        Similarity.l2Exact(col("b"), col("a")).as("d2r"))
      .collect()
    assert(got.length == 900)
    got.foreach { r =>
      val (ia, ib) = (r.getLong(0), r.getLong(1))
      val want = byId(ia).zip(byId(ib))
        .map { case (x, y) => val d = q(x) - q(y); d * d }.sum
      assert(r.getLong(2) == want && r.getLong(3) == want, s"($ia,$ib)")
      if (ia == ib) assert(r.getLong(2) == 0L, s"self-distance $ia")
    }
  }

  test("pqTopK: ADC finds the planted nearest neighbor; exact plan shape") {
    // codebook = the 4 axis-ish directions; corpus vectors sit exactly
    // on codewords, so ADC distance to the matching query is 0
    def vec(i: Int, d: Int = 8): Array[Float] =
      Array.tabulate(d)(j => if (j == i) 1.0f else 0.0f)
    val cb = Seq((0L, vec(0) ++ vec(0)), (1L, vec(1) ++ vec(1)),
      (2L, vec(2) ++ vec(2)), (3L, vec(3) ++ vec(3)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((10L, vec(0) ++ vec(0)), (11L, vec(1) ++ vec(1)),
      (12L, vec(2) ++ vec(3))).toDF("vec_id", "embedding")
    val queries = Seq((20L, vec(0) ++ vec(0))).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(corpus, queries, cb,
      "vec_id", "embedding", m = 2, subDim = 8, numCodes = 4, k = 2)
    val rows = top.orderBy("rank").collect()
    assert(rows(0).getAs[Long]("neighbor_id") == 10L)
    assert(rows(0).getAs[Long]("adc_d2") == 0L) // sits on its codewords
    assert(rows(1).getAs[Long]("adc_d2") > 0L)
    // house ANN rule: bounded partial aggregation, never a rank window
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("pq codes compress: corpus floats never reach the scoring join") {
    // the scored side's schema is (neighbor_id, codes) — m longs, not
    // m*subDim floats: the compression contract of the PQ index
    val e = Queries.table(spark, sf, "embeddings")
    val top = Similarity.pqTopK(
      e.filter(col("vec_id") >= 20), e.filter(col("vec_id") < 2),
      e.filter(col("vec_id") < 4), "vec_id", "embedding",
      m = 8, subDim = 8, numCodes = 4, k = 2)
    assert(top.count() == 4) // 2 queries × k=2
    val plan = top.queryExecution.executedPlan.toString
    // exactly one corpus-side scan feeds encoding; scoring reuses codes
    assert(plan.contains("partial_"), plan)
  }

  test("ivfPqTopK restricts candidates to the query's cell") {
    def vec(i: Int, d: Int = 8): Array[Float] =
      Array.tabulate(d)(j => if (j == i) 1.0f else 0.0f)
    // two cells (axis 0 / axis 1); codebook = the 4 axis codewords
    val centroids = Seq((0L, vec(0) ++ vec(0)), (1L, vec(1) ++ vec(1)))
      .toDF("vec_id", "embedding")
    val cb = Seq((0L, vec(0) ++ vec(0)), (1L, vec(1) ++ vec(1)),
      (2L, vec(2) ++ vec(2)), (3L, vec(3) ++ vec(3)))
      .toDF("vec_id", "embedding")
    // 10 lands in cell 0; 11 (the global NN of a cell-1 query's
    // opposite) lands in cell 1
    val corpus = Seq((10L, vec(0) ++ vec(0)), (11L, vec(1) ++ vec(1)))
      .toDF("vec_id", "embedding")
    val queries = Seq((20L, vec(1) ++ vec(1))).toDF("vec_id", "embedding")
    val top = Similarity.ivfPqTopK(
      Similarity.assignCentroids(corpus, centroids, "vec_id", "embedding"),
      Similarity.assignCentroids(queries, centroids, "vec_id", "embedding"),
      cb, "vec_id", "embedding", m = 2, subDim = 8, numCodes = 4, k = 2)
    val rows = top.collect()
    // only the same-cell candidate surfaces — cell pruning is real
    assert(rows.map(_.getAs[Long]("neighbor_id")).toSet == Set(11L))
    assert(rows.head.getAs[Long]("adc_d2") == 0L)
  }

  test("repeatedSpans: planted cross-doc span located; adjacent windows merge") {
    val repeated = (1 to 9).map(i => s"tok$i").mkString(" ") // 9 tokens
    val docs = Seq(
      (1L, s"alpha beta $repeated gamma delta"),
      (2L, s"$repeated something else entirely here now"),
      (3L, "completely unrelated text with no repeats at all ok")
    ).toDF("doc_id", "text")
    val out = graft.operators.Corpus
      .repeatedSpans(docs, "doc_id", "text", window = 8, minOcc = 2L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("island_start"),
        r.getAs[Long]("island_end"), r.getAs[Long]("n_windows")))
    // doc 1: 9-token repeat starts at token 2 → windows at 2 and 3
    // merge into [2, 10]; doc 2: repeat at 0 → windows at 0 and 1
    // merge into [0, 8]
    assert(out.toSet == Set((1L, 2L, 10L, 2L), (2L, 0L, 8L, 2L)))
  }

  test("q207 index layout: a cell probe prunes partitions at the scan") {
    val e = Queries.table(spark, sf, "embeddings")
    val centroids = e.filter(col("vec_id") < 8)
    val work = tempDir("ivfidx")
    Similarity.assignCentroids(e.filter(col("vec_id") >= 20), centroids,
        "vec_id", "embedding")
      .write.partitionBy("centroid_id").mode("overwrite").parquet(work)
    val all = spark.read.parquet(work)
    val probe = all.filter(col("centroid_id") === 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("centroid_id"),
      plan)
    // (inputFiles reports the unpruned base relation, so file-count
    // is not a pruning signal — the PartitionFilters entry above is)
    assert(probe.count() > 0 && probe.count() < all.count())
  }

  test("q196 bloom gate: runtime filter verifiably injected") {
    val out = SparkEntry.queries("q196_bloom_runtime_join")(spark, sf)
    assert(out.collect().forall(_.getAs[Boolean]("bloom_pruned")))
  }

  test("q198 dropDuplicatesWithinWatermark: exact keys, exactly once each") {
    val rows = graft.streaming.EventStream
      .runDedupWithinWatermark(spark, sf, queryName = "t_ddw")
      .collect()
    // every key emitted exactly once — a regressed dedup that re-emits
    // shows up here, not just a dropped key
    assert(rows.forall(_.getAs[Long]("n_emitted") == 1L))
    val got = rows.map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Queries.events(spark, sf)
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q199: every full batch draws its docs from 8 distinct sources") {
    // with 20 BALANCED sources (sf0.001 is 20×25) every rank level has
    // ≥ 8 active sources, so the round-robin guarantee holds for all
    // full batches; on skewed corpora the guarantee degrades at the
    // tail once < 8 sources remain active (documented at the query)
    val out = SparkEntry.queries("q199_inbatch_negatives")(spark, sf)
    val full = out.groupBy("batch_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("source")).as("ns"))
      .filter(col("n") === 8)
    assert(full.count() > 0)
    val bad = full.filter(col("ns") < 8).count()
    assert(bad == 0, s"$bad full batches contain a same-source pair")
  }

  test("q204 group sample: bounded top-k partials, never a rank window") {
    val df = SparkEntry.queries("q204_group_sample")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Window"), plan)
    // exactly k rows per group, ranks 1..5, priority non-increasing
    val bySource = df.collect().groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length == 5))
    bySource.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
      val hs = sorted.map(_.getAs[Long]("h"))
      assert(hs.zip(hs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q211: the CI collation is load-bearing — binary equality loses rows") {
    val ci = SparkEntry.queries("q211_collated_join")(spark, sf)
      .agg(sum(col("n"))).head.getLong(0)
    // same join under BINARY equality: odd customers (Initcap'd
    // segment) no longer match the lowercase dim
    Queries.table(spark, sf, "customer")
      .withColumn("seg_mixed",
        when(col("c_custkey") % 2 === 0, lower(col("c_mktsegment")))
          .otherwise(initcap(lower(col("c_mktsegment")))))
      .createOrReplaceTempView("cust_v211b")
    val bin = spark.sql("""
      WITH dim AS (SELECT DISTINCT lower(c_mktsegment) AS seg
                   FROM cust_v211b)
      SELECT COUNT(*) AS n FROM cust_v211b c
      JOIN dim d ON c.seg_mixed = d.seg""").head.getLong(0)
    val total = Queries.table(spark, sf, "customer").count()
    assert(ci == total, s"CI join must match every customer, got $ci/$total")
    assert(bin < ci, s"binary equality should lose the Initcap'd half: $bin")
  }

  test("q195 temperature quotas: small sources get relatively more") {
    val out = SparkEntry.queries("q195_temperature_mixture")(spark, sf)
    val d = Queries.table(spark, sf, "documents")
      .select(col("source"),
        graft.functions.TextFunctions.tokenCount(col("text"))
          .cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("tot"))
    val q = out.groupBy("source").agg(first("quota").as("quota"))
      .join(d, "source")
      .select(col("source"), col("quota"), col("tot")).collect()
    // quota ∝ sqrt(tot): the quota/tot ratio must strictly favor the
    // smallest source over the largest
    val bySize = q.sortBy(_.getAs[Long]("tot"))
    val small = bySize.head
    val large = bySize.last
    assert(small.getAs[Long]("quota") * large.getAs[Long]("tot") >
      large.getAs[Long]("quota") * small.getAs[Long]("tot"))
  }
}
