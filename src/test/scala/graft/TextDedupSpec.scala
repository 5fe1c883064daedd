package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.{Dedup, Multimodal, Similarity}

class TextDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE  QUICK   brown fox jumps over the lazy dog"), // exact dup modulo case/ws
    (3L, "the quick brown fox leaps over the lazy dog"), // near dup
    (4L, "completely different content about spark engines and data"),
    (5L, "dog lazy the over jumps fox brown quick the") // bag dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups case/whitespace variants") {
    val d = Dedup.exactDuplicates(docs, "doc_id", "text")
    val dup = d.filter(col("n_docs") > 1).collect()
    assert(dup.length == 1)
    assert(dup.head.getAs[Long]("keeper_id") == 1L)
    assert(dup.head.getAs[Long]("n_docs") == 2L)
    assert(Dedup.dropExactDuplicates(docs, "doc_id", "text").count() == 4)
  }

  test("bag fingerprint catches token-shuffled duplicates") {
    val fp = docs.select(col("doc_id"), TextFunctions.bagFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(5L)) // shuffled bag identical
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(4L))
  }

  test("minhash LSH surfaces the near-dup pair; jaccard verifies") {
    val nd = Dedup.nearDuplicates(docs, "doc_id", "text",
      shingleN = 2, bands = 8, thresholdNum = 5, thresholdDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 2L))) // exact dup
    assert(nd.contains((1L, 3L)) || nd.contains((2L, 3L))) // near dup via one-word edit
    assert(!nd.exists { case (a, b) => a == 4L || b == 4L }) // unrelated doc clean
  }

  test("simhash: identical docs share signature; near dup is close in hamming") {
    val sig = Dedup.simhashBits(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sig(1L).length == 64 && sig(1L).matches("[01]{64}"))
    assert(sig(1L) == sig(2L)) // same token set
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(sig(1L), sig(3L)) < hamming(sig(1L), sig(4L)))
  }

  test("langId picks marker-richest language deterministically") {
    val df = Seq("the cat sat", "le chat la nuit", "der die das", "xyz").toDF("text")
    val out = df.select(TextFunctions.langId(col("text"), Seq(
      "en" -> Seq("the"), "fr" -> Seq("le", "la"), "de" -> Seq("der", "die")))
      .as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "fr", "de", "und"))
  }

  test("quality gate passes normal prose, rejects degenerate text") {
    val df = Seq(
      (1L, "the engine reads the data and the filter keeps the good rows always"),
      (2L, "a a a a a a a a a a a a"), // stopword spam > 600 per-mille
      (3L, "ok") // too short
    ).toDF("id", "text")
    val (nt, ns, ml) = TextFunctions.qualitySignals(col("text"), Seq("the", "a"))
    val out = df.select(col("id"), TextFunctions.qualityGate(nt, ns, ml).as("q"))
      .as[(Long, Boolean)].collect().toMap
    assert(out(1L) && !out(2L) && !out(3L))
  }

  test("brute-force and IVF ANN agree on obvious nearest neighbor") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.1f)),
      (10L, Array(0.95f, 0.05f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = vecs.filter(col("vec_id") < 10)
    val queries = vecs.filter(col("vec_id") === 10)
    val bf = Similarity.bruteForceTopKExact(corpus, queries, "vec_id", "embedding", 1)
      .collect().head
    assert(bf.getAs[Long]("neighbor_id") == 0L || bf.getAs[Long]("neighbor_id") == 1L)
    val fast = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 1)
      .collect().head
    assert(fast.getAs[Long]("neighbor_id") == bf.getAs[Long]("neighbor_id"))
  }

  test("ANN top-k runs as partial (map-side) aggregation, not a rank window") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (10L, Array(0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val corpus = vecs.filter(col("vec_id") < 10)
    val queries = vecs.filter(col("vec_id") === 10)
    for (df <- Seq(
        Similarity.bruteForceTopKExact(corpus, queries, "vec_id", "embedding", 2),
        Similarity.int8TopK(corpus, queries, "vec_id", "embedding", 2, 2),
        Similarity.ivfTopK(
          Similarity.assignCentroids(corpus, queries, "vec_id", "embedding"),
          Similarity.assignCentroids(queries, queries, "vec_id", "embedding"),
          "vec_id", "embedding", 2))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("partial_"), plan)
      assert(!plan.contains("Window"), plan)
    }
  }

  test("banded cosine near-dup: auto width scales with corpus; collisions dedupe") {
    // bucket count per band = 2^width grows with the corpus size
    assert(Similarity.autoBandWidth(100) == 8)
    assert(Similarity.autoBandWidth(1L << 14) == 11)
    assert(Similarity.autoBandWidth(1L << 20) == 16)
    assert(Similarity.autoBandWidth(1L << 40) == 16) // signature cap
    val vecs = Seq(
      (0L, Array(1.0f, 0.2f, 0.1f, 0.9f)),
      (1L, Array(1.0f, 0.2f, 0.1f, 0.9f)), // dup of 0
      (2L, Array(-1.0f, 0.5f, -0.3f, 0.2f)),
      (3L, Array(-1.0f, 0.5f, -0.3f, 0.2f)), // dup of 2
      (4L, Array(0.0f, -1.0f, 0.8f, -0.5f))).toDF("vec_id", "embedding")
    // identical vectors collide in EVERY band — output must still be
    // one row per pair (candidate dedup across bands)
    val nd = Similarity.cosineNearDupes(vecs, "vec_id", "embedding",
      threshold = 0.999, planes = 32, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nd.toSet == Set((0L, 1L), (2L, 3L)) && nd.length == 2)
    // auto-sized path (planes = 0) agrees, exact-arithmetic variant
    val auto = Similarity.cosineNearDupesExact(vecs, "vec_id", "embedding",
      threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == Set((0L, 1L), (2L, 3L)))
  }

  test("minhashBands spreads only under-partitioned inputs") {
    val par = spark.sparkContext.defaultParallelism
    // well-partitioned input keeps its layout (no blanket shuffle)
    val wide = Dedup.minhashBands(docs.repartition(par), "doc_id", "text", 2, 4)
    assert(wide.rdd.getNumPartitions == par)
    // single-row-group input is spread across the cluster
    val narrow = Dedup.minhashBands(docs.coalesce(1), "doc_id", "text", 2, 4)
    assert(narrow.rdd.getNumPartitions == par)
    // identical signatures either way
    val a = wide.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val b = narrow.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("multimodal: binary roundtrip + partition-batched decode") {
    val d = Seq((7L, "hello world")).toDF("doc_id", "text")
    val meta = Multimodal.decodeMeta(Multimodal.attachBinary(d, "doc_id", "text"))
      .collect().head
    assert(meta.byte_len == 11L)
    assert(meta.width == 11 + 16 && meta.channels == 3)
    assert(meta.format == "fake/bgr") // odd length
    val frames = Multimodal.sampleFrames(
      Multimodal.attachBinary(Seq((1L, "x" * 1000)).toDF("doc_id", "text"), "doc_id", "text"),
      stride = 256)
    assert(frames.count() == 4) // offsets 0,256,512,768
  }

  test("streaming hourly agg equals batch computation") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.streaming.EventStream.runHourlyToCompletion(spark, dir,
      queryName = "test_stream_hourly")
    val batch = Queries.all("q21_hourly_agg")(spark, dir)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
