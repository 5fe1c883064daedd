package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, RangeJoin}

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("connected components: min-label per component, singletons kept") {
    // two components {1,2,3} (chain) + {7,9}, singleton 5
    val nodes = Seq(1L, 2L, 3L, 5L, 7L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (3L, 2L), (9L, 7L)).toDF("id_a", "id_b")
    val cc = Corpus.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components: long chain converges past one hop") {
    val n = 12
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val cc = Corpus.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.values.toSet == Set(1L))
  }

  test("decontaminate flags train docs sharing 3-gram shingles with eval") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),     // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "epsilon zeta eta theta"),     // clean
      (3L, "xx")                          // too short for any shingle
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Corpus.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(1L) == ((2L, true)))
    assert(out(2L) == ((0L, false)))
    assert(out(3L) == ((0L, false)))
  }

  test("quota sample keeps at most N per stratum, deterministically") {
    val df = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "en" else "fr", "web"))
      .toDF("doc_id", "lang", "source")
    val kept = Corpus.quotaSample(df, Seq("lang", "source"), "doc_id", quota = 3)
    assert(kept.count() == 6)
    assert(kept.groupBy("lang").count().collect().forall(_.getLong(1) == 3))
    val again = Corpus.quotaSample(df, Seq("lang", "source"), "doc_id", quota = 3)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted.sameElements(
      again.select("doc_id").collect().map(_.getLong(0)).sorted))
  }

  test("tfidf ranks distinctive terms above common ones") {
    val df = Seq(
      (1L, "spark spark spark common"),
      (2L, "duck duck common"),
      (3L, "flink common")
    ).toDF("doc_id", "text")
    val top = Corpus.tfidfTopTerms(df, "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top == Map(1L -> "spark", 2L -> "duck", 3L -> "flink"))
  }

  test("chunking covers all tokens with the configured overlap") {
    val df = Seq((1L, (1 to 35).map(i => s"t$i").mkString(" ")), (2L, ""))
      .toDF("doc_id", "text")
    val ch = Corpus.chunk(df, "doc_id", "text", width = 20, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
    val doc1 = ch.filter(_._1 == 1L).sortBy(_._2)
    assert(doc1.map(_._2).sameElements(Array(1L, 11L, 21L, 31L)))
    assert(doc1.map(_._3).sameElements(Array(20L, 20L, 15L, 5L)))
    assert(doc1.head._4.startsWith("t1 t2 ") && doc1.last._4 == "t31 t32 t33 t34 t35")
    val doc2 = ch.filter(_._1 == 2L)
    assert(doc2.length == 1 && doc2.head._3 == 0L && doc2.head._4 == "")
  }

  test("pii scrub redacts and counts email/ssn/number patterns") {
    val df = Seq((1L, "mail a.b+c@ex-ample.org and 123-45-6789 plus 123456789 end"))
      .toDF("doc_id", "text")
    val r = Corpus.scrubPii(df, "doc_id", "text").collect().head
    assert(r.getString(1) == "mail <EMAIL> and <SSN> plus <NUM> end")
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 1L)))
  }

  test("word freq: deterministic count-desc, token-asc top-k") {
    val df = Seq((1L, "b b b a a c"), (2L, "a c")).toDF("doc_id", "text")
    val top = Corpus.wordFreq(df, "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(top.sortBy(_._3).sameElements(Array(("a", 3L, 1), ("b", 3L, 2))))
  }

  test("pruneNearDuplicates keeps one canonical doc per cluster") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // dup of 1
      (3L, "an entirely different document about spark engines"),
      (4L, "the quick brown fox jumps over the lazy dog today") // near dup of 1
    ).toDF("doc_id", "text")
    val kept = Corpus.pruneNearDuplicates(docs, "doc_id", "text",
        shingleN = 2, bands = 4)
      .select("doc_id").as[Long].collect().toSet
    // cluster {1,2,4} keeps min id 1; singleton 3 survives
    assert(kept == Set(1L, 3L))
  }

  test("hash split: deterministic, growth-stable, roughly proportioned") {
    val full = Corpus.hashSplit((1L to 1000L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // stable under corpus growth: a doc's split is a pure function of id
    val subset = Corpus.hashSplit((1L to 100L).toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(subset.forall { case (id, sp) => full(id) == sp })
    // proportions near 80/10/10 (hash is uniform-ish)
    val train = full.values.count(_ == "train")
    val valN = full.values.count(_ == "val")
    assert(train > 700 && train < 880, s"train=$train")
    assert(valN > 50 && valN < 160, s"val=$valN")
  }

  test("packSequences: bins follow the running token budget per group") {
    val docs = Seq(
      ("en", 1L, Seq.fill(300)("w").mkString(" ")), // 300 tokens
      ("en", 2L, Seq.fill(300)("w").mkString(" ")),
      ("en", 3L, Seq.fill(100)("w").mkString(" ")),
      ("fr", 9L, Seq.fill(600)("w").mkString(" "))
    ).toDF("lang", "doc_id", "text")
    val packed = Corpus.packSequences(docs, Seq("lang"), "doc_id", "text", 512)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(packed(("en", 1L)) == ((300L, 0L, 0L)))   // starts bin 0
    assert(packed(("en", 2L)) == ((300L, 300L, 0L))) // straddles into bin 1
    assert(packed(("en", 3L)) == ((100L, 600L, 1L))) // starts in bin 1
    assert(packed(("fr", 9L)) == ((600L, 0L, 0L)))   // groups are independent
  }

  test("interval join matches the naive theta join") {
    val iv = Seq(
      (10L, "2024-01-01 00:00:00", "2024-01-03 00:00:00"),
      (20L, "2024-01-02 12:00:00", "2024-01-05 00:00:00"))
      .toDF("iv_id", "s", "e")
      .select(col("iv_id"), col("s").cast("timestamp").as("s"),
        col("e").cast("timestamp").as("e"))
    val pts = (0 until 120).map(h => (h.toLong, f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:30:00"))
      .toDF("pt_id", "ts").select(col("pt_id"), col("ts").cast("timestamp").as("ts"))
    val banded = RangeJoin.intervalJoin(pts, "ts", iv, "s", "e",
        widthMicros = 2L * 86400L * 1000000L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(iv)
      .filter(col("ts") >= col("s") && col("ts") <= col("e"))
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == naive && naive.nonEmpty)
  }

  test("cdcChunks: boundaries re-synchronize after a front insertion") {
    import graft.operators.Corpus
    // deterministic 4k-char text from an md5 chain
    val base = (0 until 128).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"cdc:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString).mkString
    val edited = "XYZQ" + base
    val df = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Corpus.cdcChunks(df, "doc_id", "text", w = 8, mod = 64)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toList }
    // total length conserved
    assert(chunks(1L).sum == base.length && chunks(2L).sum == edited.length)
    assert(chunks(1L).length > 5) // the text actually chunked
    // content-defined: boundaries at content offsets past the edit are
    // unchanged — the two chunk streams share all but the head chunks
    val common = chunks(1L).reverse.zip(chunks(2L).reverse)
      .takeWhile { case (a, b) => a == b }.length
    assert(common >= chunks(1L).length - 2,
      s"suffix only $common of ${chunks(1L)} vs ${chunks(2L)}")
  }
}
