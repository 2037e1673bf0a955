package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic windows + sessionization over the `events` stream table —
  * the time-series operator family the reference lacks (SURVEY.md §2.1).
  * Batch forms here (oracle-checkable); the Structured Streaming forms
  * live in graft.streaming (same dataflow over readStream).
  *
  * All window specs tie-break on `event_id` so results are deterministic
  * under parallel execution; all epoch math is integer microseconds
  * (`unix_micros`) so the DuckDB oracle computes identical values.
  */
object Events {

  private val byUser = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** Ranking + analytic functions per user: row_number, rank by value,
    * lag/lead. One exchange on user_id; at scale user_id is high-cardinality
    * so partitions balance (skewed hot users would need AQE/salting).
    */
  def userWindows(events: DataFrame): DataFrame =
    events.select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        row_number().over(byUser).as("rn"),
        rank().over(Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))).as("value_rank"),
        lag(col("value"), 1).over(byUser).as("prev_value"),
        lead(col("event_type"), 1).over(byUser).as("next_type"),
        sum(col("value").cast("decimal(18,2)"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_value"))
      .orderBy(col("user_id"), col("event_id"))

  /** Sessionization via Spark's native `session_window` (merging gap
    * windows inside the aggregation operator — the built-in twin of the
    * lag/cumsum formulation in [[sessionize]]; window end = last event +
    * gap by definition).
    */
  def sessionWindowAgg(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Gap-based sessionization (30-minute inactivity gap): the classic
    * lag → new-session flag → running-sum session id, then per-session
    * aggregates. Two window passes + one groupBy, all partitioned by
    * user_id — a single exchange reused across all three (Catalyst reuses
    * the hash partitioning).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapMicros = gapMinutes * 60L * 1000000L
    val withGap = events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_us").isNull || (col("us") - col("prev_us")) > gapMicros)
          .cast("long"))
    withGap
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((max(col("us")) - min(col("us"))) / lit(1000000L)).cast("double")
          .as("duration_sec"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** Window frames + distribution functions per user: moving sum over a
    * ROWS frame, first/last value over a running frame, ntile quartiles.
    * Decimal-exact moving sums; frame bounds identical on both engines.
    */
  def userFrames(events: DataFrame): DataFrame = {
    val frame3 = byUser.rowsBetween(-3, 0)
    val running = byUser.rowsBetween(Window.unboundedPreceding, 0)
    events.select(
        col("event_id"), col("user_id"), col("value"),
        sum(col("value").cast("decimal(18,2)")).over(frame3)
          .cast("double").as("moving_sum4"),
        count(lit(1)).over(frame3).as("moving_n"),
        first(col("event_type")).over(running).as("first_type"),
        last(col("event_type")).over(running).as("latest_type"),
        ntile(4).over(byUser).as("quartile"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Distribution functions + a time-RANGE frame per user (the window
    * shapes [[userFrames]] doesn't cover): percent_rank / cume_dist over
    * the value ordering (peer semantics — ties receive identical values,
    * so no tie-break column is needed for determinism), and a trailing
    * 10-minute RANGE frame over event time (frame membership by value
    * distance on the integer-µs order key, not row position; same
    * single exchange on user_id as every other per-user window).
    */
  def userDistributions(events: DataFrame): DataFrame = {
    val byValue = Window.partitionBy(col("user_id")).orderBy(col("value"))
    val timeRange = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-600L * 1000000L, 0)
    events
      .withColumn("us", unix_micros(col("ts")))
      .select(
        col("event_id"), col("user_id"), col("value"),
        percent_rank().over(byValue).as("pct_rank"),
        cume_dist().over(byValue).as("cume"),
        sum(col("value").cast("decimal(18,2)")).over(timeRange)
          .cast("double").as("range_sum_10min"),
        count(lit(1)).over(timeRange).as("range_n_10min"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Sliding-window aggregation: 1-hour windows every 30 minutes, so each
    * event lands in exactly length/slide = 2 windows. Spark's `window`
    * generates the per-event window replicas inside the scan stage; the
    * aggregation shuffles (window, type) — 2x the tumbling shuffle volume,
    * same plan shape.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** Tumbling-window aggregation (hourly): batch twin of the streaming
    * windowed count. date_trunc keeps the group key computable inside the
    * scan's codegen stage; one low-cardinality shuffle.
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
}
