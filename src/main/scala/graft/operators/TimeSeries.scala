package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular event stream onto a
  * fixed hourly grid per key (gap fill), forward-filling the last
  * observed attribute across empty hours.
  *
  * Shape at scale: one aggregation shuffle on (key, hour), a per-key
  * spine explode whose width is the key's own active span (never the
  * global min/max — a key active for a day generates 24 rows even in a
  * year-long table), and one window shuffle on the key. No driver
  * state, no iteration; the same grid feeds
  * [[graft.streaming.EventStream]]'s windowed aggregations in the
  * streaming path.
  */
object TimeSeries {

  /** Exact rolling-N-day distinct keys per day — the classic "7-day
    * active users" metric, which window frames cannot express (no
    * COUNT(DISTINCT) over RANGE). Decomposition: collapse to distinct
    * (key, day) — the explode then fans each out to the ≤ N report
    * days it contributes to — a BOUNDED ×N expansion of the already
    * collapsed pairs, not of raw events — and one count-distinct per
    * report day finishes. Report days are restricted to days with ≥ 1
    * event (the spine of real dashboards). Three combine shuffles, no
    * quadratic step, exact at any scale. */
  def rollingDistinctDaily(df: DataFrame, keyCol: String, tsCol: String,
      days: Int): DataFrame = {
    val ud = df.select(col(keyCol), to_date(col(tsCol)).as("__d")).distinct()
    val active = ud.select(col("__d").as("d")).distinct()
    ud.select(col(keyCol),
        explode(sequence(col("__d"), date_add(col("__d"), days - 1))).as("d"))
      .join(active, Seq("d"), "left_semi")
      .groupBy(col("d"))
      .agg(countDistinct(col(keyCol)).as(s"n_${days}d"))
  }

  /** Time-weighted average per key over irregularly sampled values:
    * each sample holds until the next one, so its weight is the
    * inter-sample duration — TWA = Σ(v·Δt) div Σ(Δt), computed in
    * DECIMAL(38,0) products and truncating division (engine-exact).
    * One window shuffle on the key (the lead) feeding one combine
    * aggregation; keys with a single sample have no interval and drop
    * out. */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("__dt",
        unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol)))
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"),
        sum(expr(s"CAST($valueCol AS DECIMAL(38,0)) * CAST(__dt AS DECIMAL(38,0))"))
          .as("__wsum"),
        sum(expr("CAST(__dt AS DECIMAL(38,0))")).as("__tsum"))
      // sign-stable truncation: Δt > 0 always, but Σ(v·Δt) can be
      // negative and engines disagree on negative integer division
      .withColumn("twa", expr(
        """CASE WHEN __wsum < 0 THEN -(abs(__wsum) div __tsum)
           ELSE __wsum div __tsum END""").cast("long"))
      .drop("__wsum", "__tsum")
  }

  /** Debounce: collapse bursts of same-type events per key to their
    * first event. An event survives iff it starts a burst — no
    * predecessor, a type change, or a silence gap > `gapSeconds` from
    * the IMMEDIATELY preceding event (timer resets on every event,
    * true debounce semantics — a long burst of sub-gap events emits
    * once, however long it lasts). One window shuffle on the key;
    * deterministic under ts ties via the id tie-break. */
  def debounce(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
      typeCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    df.withColumn("__pt", lag(col(typeCol), 1).over(w))
      .withColumn("__pts", lag(col(tsCol), 1).over(w))
      .filter(col("__pt").isNull || col("__pt") =!= col(typeCol) ||
        unix_micros(col(tsCol)) - unix_micros(col("__pts")) >
          gapSeconds * 1000000L)
      .drop("__pt", "__pts")
  }

  /** Hourly spine per key from its first to last event hour; `n` = 0 on
    * gap hours; `fill_type` = last non-null hourly MAX(`typeCol`)
    * carried forward (MAX, not arg-last, keeps the fill deterministic
    * under same-hour ties). `hour` is formatted `yyyy-MM-dd HH:00` so
    * it crosses engine boundaries exactly. */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String,
      typeCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"), max(col(typeCol)).as("htype"))
    val spine = hourly.groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col(keyCol),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(hourly, Seq(keyCol, "hour"), "left")
      .withColumn("fill_type", last(col("htype"), ignoreNulls = true).over(w))
      .select(col(keyCol),
        date_format(col("hour"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("fill_type"))
  }
}
