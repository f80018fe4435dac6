package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Event-stream analytics in batch form (the same plans run under
  * Structured Streaming — see graft.streaming.EventPipeline):
  * sessionization via time-gap windows, and per-user running aggregates.
  */
object StreamQueries extends QueryProvider {

  private val SessionGapSec = 1800L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Sessionization: a >30-min gap starts a new session (lag + cumsum —
    // the batch equivalent of session windows / flatMapGroupsWithState)
    "events_sessionize" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("epoch"), col("value"))
      val byUser = Window.partitionBy("user_id").orderBy(col("epoch"), col("event_id"))
      val sessions = e
        .withColumn("prev_epoch", lag(col("epoch"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_epoch").isNull || col("epoch") - col("prev_epoch") > SessionGapSec, 1L)
            .otherwise(0L))
        .withColumn("session_idx", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      sessions.groupBy(col("user_id"), col("session_idx"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("epoch")).as("start_epoch"),
          max(col("epoch")).as("end_epoch"),
          round(sum(col("value")), 2).as("session_value"))
    }),
    // As-of join (custom operator, graft.operators.AsOfJoin): each event
    // gets the user's latest purchase at-or-before it
    "events_asof_purchase" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("epoch"))
      val purchases = Tables.events(s, dir)
        .where(col("event_type") === "purchase")
        .groupBy(col("user_id"), unix_timestamp(col("ts")).as("p_epoch"))
        .agg(max(col("event_id")).as("p_event_id")) // unique per (key, t)
      graft.operators.AsOfJoin.join(
        e, purchases, key = "user_id",
        leftTime = "epoch", rightTime = "p_epoch",
        payload = Seq("p_epoch", "p_event_id"))
    }),
    // Range join (custom operator, graft.operators.RangeJoin): ordered
    // pairs of same-user events within one hour, via window-width time
    // bins — an equi-join, never a nested-loop cross product
    "events_pairs_1h" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id").as("key"), col("event_id").as("id"),
          // cast: the driver's parquet carries a TZ-naive timestamp some
          // rounds (TIMESTAMP_NTZ), which unix_micros rejects; under the
          // session's UTC zone NTZ->LTZ is epoch-identity vs the oracle
          unix_micros(col("ts").cast("timestamp_ltz")).as("us"))
      graft.operators.RangeJoin.pairs(e, e, windowUs = 3600L * 1000000L)
        .select(col("key").as("user_id"), col("id_a").as("event_a"),
          col("id_b").as("event_b"), col("gap_us"))
    }),
    // Per-user running event count + rank of users by activity. Top-50
    // via TakeOrdered first (orderBy+limit — no full-aggregate sort on
    // one partition), then rank the 50 survivors: identical rows and
    // ranks, since taking the top N of a total order and ranking them ≡
    // ranking everything and keeping rank ≤ N (user_id breaks all ties).
    // The bm25_topk pattern; constant partition key marks the rank
    // window's input as bounded.
    "events_user_activity" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val agg = e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("total_value"))
      agg.orderBy(col("n_events").desc, col("user_id").asc).limit(50)
        // constant-valued partition key (pmod ≡ 0; a foldable lit(0) gets
        // optimized away) — marks the ≤50-row rank input as bounded
        .withColumn("activity_rank",
          row_number().over(Window.partitionBy(pmod(col("user_id"), lit(1)))
            .orderBy(col("n_events").desc, col("user_id").asc)))
    })
  )

  def oracles: Map[String, String] = Map(
    "events_sessionize" ->
      s"""WITH e AS (
         |  -- floor(): Spark's unix_timestamp truncates sub-second parts;
         |  -- a bare CAST in DuckDB would round-to-nearest instead
         |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch, value
         |  FROM events),
         |l AS (
         |  SELECT *, lag(epoch) OVER (PARTITION BY user_id ORDER BY epoch, event_id) AS prev_epoch
         |  FROM e),
         |n AS (
         |  SELECT *, CASE WHEN prev_epoch IS NULL OR epoch - prev_epoch > $SessionGapSec
         |                 THEN 1 ELSE 0 END AS new_session
         |  FROM l),
         |ss AS (
         |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY epoch, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |  FROM n)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       count(*) AS n_events,
         |       min(epoch) AS start_epoch, max(epoch) AS end_epoch,
         |       round(sum(value), 2) AS session_value
         |FROM ss GROUP BY user_id, session_idx""".stripMargin,
    "events_pairs_1h" ->
      """SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
        |       CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id AND a.ts < b.ts
        | AND b.ts <= a.ts + INTERVAL 1 HOUR""".stripMargin,
    "events_asof_purchase" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch
        |  FROM events),
        |p AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS p_epoch,
        |         max(event_id) AS p_event_id
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, CAST(floor(epoch(ts)) AS BIGINT))
        |SELECT e.user_id, e.event_id, e.epoch,
        |       p.p_epoch AS asof_p_epoch, p.p_event_id AS asof_p_event_id
        |FROM e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.epoch >= p.p_epoch""".stripMargin,
    "events_user_activity" ->
      """SELECT user_id, n_events, total_value, CAST(rank AS INT) AS activity_rank
        |FROM (
        |  SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value,
        |         row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS rank
        |  FROM events GROUP BY user_id)
        |WHERE rank <= 50""".stripMargin
  )
}
