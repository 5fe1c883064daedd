package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Corpus, Dedup}

/** Round-4 behaviors: bitmap-word exact distinct, null-safe join,
  * positional phrase search, containment dedup asymmetry,
  * sorted-neighborhood pair generation, trailing-anomaly flag. Each
  * registered query is driven at sf0.001 and checked against a naive
  * reformulation of the same semantics. */
class Round4OpsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q161 bitmap-word distinct == COUNT(DISTINCT) per day") {
    val got = SparkEntry.queries("q161_bitmap_distinct")(spark, sf)
      .orderBy("d").collect().map(r => (r.getString(0), r.getLong(1)))
    val want = Queries.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy("d").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("q165 null-safe join keeps NULL==NULL rows a plain equi join drops") {
    val out = SparkEntry.queries("q165_nullsafe_join")(spark, sf)
    val nullRow = out.filter(col("k").isNull).collect()
    assert(nullRow.length == 1, "exactly one NULL-key group must survive")
    val expectedNullCount = Queries.events(spark, sf)
      .filter(col("event_id") % 10 === 0).count()
    assert(nullRow.head.getLong(1) == expectedNullCount)
    // a plain equi join on the same key drops every NULL-key row
    val keyed = Queries.events(spark, sf).select(
      when(col("event_id") % 10 === 0, lit(null))
        .otherwise(col("user_id")).cast("long").as("k"),
      col("event_id"))
    val plain = keyed.join(keyed.select(col("k").as("dk")).distinct(),
      col("k") === col("dk"))
    assert(plain.filter(col("k").isNull).count() == 0)
  }

  test("phraseSearch counts only ADJACENT occurrences, including repeats") {
    val docs = Seq(
      (1L, "alpha beta gamma"), // one occurrence
      (2L, "alpha beta alpha beta"), // two occurrences
      (3L, "alpha gamma beta"), // both terms, not adjacent
      (4L, "beta alpha"), // reversed order
      (5L, "")).toDF("id", "text")
    val got = Corpus.phraseSearch(docs, "id", "text", Seq("alpha", "beta"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L))
    // three-term phrase: the fold chains a join per extra term
    val tri = Corpus.phraseSearch(docs, "id", "text",
        Seq("alpha", "beta", "gamma"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(tri == Map(1L -> 1L))
  }

  test("containment keeps a sub-document pair symmetric Jaccard rejects") {
    // b is a strict substring of a: containment (inter / min-size) is
    // 100%, symmetric Jaccard (inter / union) is far lower
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy sleeping dog tonight"),
      (2L, "quick brown fox")).toDF("id", "text")
    val terms = Dedup.charNgramTerms(docs, "id", "text", 3)
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val scored = Dedup.pairJaccardTerms(terms, pairs).collect().head
    val inter = scored.getAs[Long]("inter")
    val sa = scored.getAs[Long]("size_a")
    val sb = scored.getAs[Long]("size_b")
    assert(inter * 100 >= math.min(sa, sb) * 70, "containment accepts")
    assert(inter * 10 < (sa + sb - inter) * 7, "Jaccard@0.7 rejects")
  }

  test("q167 sorted-neighborhood emits each rank-window pair exactly once") {
    val got = SparkEntry.queries("q167_sorted_neighborhood")(spark, sf)
      .select("id_a", "id_b", "gap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length, "no duplicate pairs")
    // naive single-window formulation over the same table
    val ranked = Queries.table(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"))
      .withColumn("seq", row_number().over(
        Window.orderBy(col("n_chars"), col("doc_id"))).cast("long") - 1L)
    val want = ranked.alias("a").join(ranked.alias("b"),
        col("b.seq") > col("a.seq") && col("b.seq") <= col("a.seq") + 2L)
      .select(col("a.doc_id"), col("b.doc_id"),
        (col("b.seq") - col("a.seq")).as("gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSet == want.toSet && got.length == want.length)
  }

  test("q162 spike flag fires only above 1.5x the trailing-7-day mean") {
    val rows = SparkEntry.queries("q162_trailing_anomaly")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cents = r.getAs[Long]("cents")
      val sumPrev = r.getAs[Long]("sum_prev")
      val nPrev = r.getAs[Long]("n_prev")
      val spike = r.getAs[Boolean]("spike")
      val expected = nPrev > 0 && cents * 10 * nPrev > sumPrev * 15
      assert(spike == expected, s"row $r")
    }
    // first day of every series has no history → never a spike
    assert(rows.filter(_.getAs[Long]("n_prev") == 0)
      .forall(!_.getAs[Boolean]("spike")))
  }
}
