package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Queries.{events, table}

/** Round-5 queries. Same contract as [[Queries]]: every entry is
  * oracle-gated in [[OraclesRound5]] unless noted.
  */
object QueriesRound5 {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- left-outer stream-stream interval join, FLUSHED prefix:
    //      purchases with no click within 30 min emit null-padded once
    //      both watermarks pass their horizon. The two-phase fixture
    //      (EventStream.runLeftOuterFlush) pushes the final watermark
    //      past every real purchase, so the drained sink equals the
    //      batch left join — which is exactly what the oracle runs. ----
    "q194_stream_left_outer" -> ((s, dir) =>
      graft.streaming.EventStream.runLeftOuterFlush(s, dir)))
}

/** DuckDB oracles for [[QueriesRound5.all]]. */
object OraclesRound5 {
  val all: Map[String, String] = Map(

    // the flushed-prefix contract: stream result == batch left join
    "q194_stream_left_outer" ->
      """SELECT a.event_id AS purchase_id, b.event_id AS click_id,
           a.user_id,
           epoch_us(a.ts) AS purchase_us, epoch_us(b.ts) AS click_us
         FROM events a LEFT JOIN events b
           ON a.user_id = b.user_id
          AND b.event_type = 'click'
          AND b.ts > a.ts
          AND b.ts <= a.ts + INTERVAL 30 MINUTE
         WHERE a.event_type = 'purchase' AND a.user_id < 50""")
}
