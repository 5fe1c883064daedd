package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("picks latest right row at-or-before left time, per key") {
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 11:00:00"), 101.0),
      ("A", ts("2024-01-01 12:00:00"), 102.0),
      ("B", ts("2024-01-01 10:30:00"), 50.0)).toDF("sym", "qt", "px")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 11:30:00")), // → 11:00 quote
      (2L, "A", ts("2024-01-01 11:00:00")), // boundary: equal time matches
      (3L, "A", ts("2024-01-01 09:00:00")), // before all → nulls
      (4L, "B", ts("2024-01-01 23:00:00")), // → 10:30
      (5L, "C", ts("2024-01-01 10:00:00"))) // no key match → nulls
      .toDF("tid", "sym", "tt")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tid", "tt", "qt")
      .select("tid", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(101.0), 2L -> Some(101.0), 3L -> None,
      4L -> Some(50.0), 5L -> None))
  }

  test("tolerance bounds the lookback window") {
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0)).toDF("sym", "qt", "px")
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:30:00")),
      (2L, "A", ts("2024-01-01 13:00:00"))).toDF("tid", "sym", "tt")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tid", "tt", "qt",
        tolerance = Some(expr("INTERVAL 1 HOUR")))
      .select("tid", "px").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(1L -> Some(1.0), 2L -> None)) // 3h gap exceeds tolerance
  }

  test("every left row survives exactly once (left-outer cardinality)") {
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 1.0),
      ("A", ts("2024-01-01 09:00:00"), 2.0)).toDF("sym", "qt", "px")
    val trades = (1L to 10L).map(i => (i, "A", ts("2024-01-01 12:00:00")))
      .toDF("tid", "sym", "tt")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "tid", "tt", "qt")
    assert(out.count() == 10)
    assert(out.select("tid").distinct().count() == 10)
  }
}
