package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** General relational pipeline operators over the TPC-H-ish star schema —
  * the "payload" side of a 100 TB training-data pipeline: wide
  * aggregations, star joins (small dims broadcast), per-group top-k
  * windows, event-time bucketing.
  *
  * Scale notes: every join here either broadcasts a dimension table
  * (nation/region/customer at realistic scale are << the fact tables) or
  * shuffles on the natural key AQE can re-plan; aggregates are partial
  * (map-side combine) by construction.
  */
object RelationalQueries extends QueryProvider {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Wide partial aggregation over the biggest fact table (TPC-H Q1 shape)
    // Money sums run in DECIMAL (sf1 sweep finding: at 6M rows the
    // double sum's accumulation order — nondeterministic across Spark's
    // partial aggregation, sequential in DuckDB — moved sum_charge's
    // group (N,F) across a half-cent boundary: ...588.3450 rounding .34
    // vs .35). The per-row product stays double (row-local, identical
    // IEEE ops in both engines); casting it to DECIMAL(30,10) is a
    // deterministic per-row rounding, and the decimal SUM is exactly
    // associative — order-free at any scale, which is the only property
    // that survives 1000 executors. Averages divide the exact decimal
    // sum (as double) by the count. TPC-H itself specs these columns
    // DECIMAL(15,2).
    "q1_lineitem_agg" -> ((s, dir) => {
      def dsum(c: Column) = sum(c.cast("decimal(30,10)"))
      val li = Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(dsum(col("l_quantity")), 2).cast("double").as("sum_qty"),
          round(dsum(col("l_extendedprice")), 2).cast("double").as("sum_base_price"),
          round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .cast("double").as("sum_disc_price"),
          round(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))), 2).cast("double").as("sum_charge"),
          round(dsum(col("l_quantity")).cast("double") / count(lit(1)), 4).as("avg_qty"),
          round(dsum(col("l_extendedprice")).cast("double") / count(lit(1)), 4).as("avg_price"),
          round(dsum(col("l_discount")).cast("double") / count(lit(1)), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    // Star join: fact ⋈ orders ⋈ customer ⋈ broadcast(nation ⋈ region)
    "q_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      val r = Tables.load(s, dir, "region")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          // exact decimal sum — same order-free discipline as q1
          round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(30,10)")), 2).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    // Per-group top-k via ranking window (T1's batch form on a non-vector table)
    "q_top_orders_by_priority" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select(
          col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"), col("rank"))
    }),
    // Event-time bucketing (batch form of the streaming windowed agg)
    "q_events_hourly" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      e.groupBy(
          col("event_type"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
        .agg(
          count(lit(1)).as("n"),
          // sums of 2-decimal data land on the 0.01 grid — maximally far
          // from round()'s half-boundaries, so cross-engine summation-order
          // noise can't flip the rounded digit. avg = sum/n does NOT have
          // that property (it can sit exactly on a half-boundary), so it's
          // intentionally not an output column here; derive it downstream.
          round(sum(col("value")), 2).as("sum_value"),
          round(min(col("value")), 2).as("min_value"),
          round(max(col("value")), 2).as("max_value"))
    }),
    // Join + agg + window: top-5 customers by spend within market segment.
    // The window ORDERS BY the spend aggregate, so it sums in DECIMAL
    // (exact, order-free — the r10 money-sum discipline): the sf1 sweep
    // caught upsampled customer clones with IDENTICAL order sets whose
    // double sums differed by partial-aggregation-order ulps between
    // Spark and DuckDB, scrambling the rank tie-break (11/25 rows).
    "q_top_customers_by_segment" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val spend = o.join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(30,10)")).as("spend_exact"),
          count(lit(1)).as("n_orders"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("spend_exact").desc, col("c_custkey").asc)
      spend.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5)
        .select(
          col("c_mktsegment"), col("c_custkey"),
          round(col("spend_exact"), 2).cast("double").as("spend"),
          col("n_orders"), col("rank"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(round(sum(CAST(l_quantity AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_qty,
        |       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_base_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,10))), 2) AS DOUBLE) AS sum_charge,
        |       round(CAST(sum(CAST(l_quantity AS DECIMAL(30,10))) AS DOUBLE) / count(*), 4) AS avg_qty,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,10))) AS DOUBLE) / count(*), 4) AS avg_price,
        |       round(CAST(sum(CAST(l_discount AS DECIMAL(30,10))) AS DOUBLE) / count(*), 4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,10))), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_top_orders_by_priority" ->
      """SELECT o_orderpriority, o_orderkey,
        |       round(o_totalprice, 2) AS totalprice, CAST(rank AS INT) AS rank
        |FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
        |  FROM orders)
        |WHERE rank <= 3""".stripMargin,
    "q_events_hourly" ->
      """SELECT event_type,
        |       CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
        |       count(*) AS n,
        |       round(sum(value), 2) AS sum_value,
        |       round(min(value), 2) AS min_value,
        |       round(max(value), 2) AS max_value
        |FROM events
        |GROUP BY event_type, date_trunc('hour', ts)""".stripMargin,
    "q_top_customers_by_segment" ->
      """SELECT c_mktsegment, c_custkey, CAST(round(spend_exact, 2) AS DOUBLE) AS spend, n_orders, CAST(rank AS INT) AS rank
        |FROM (
        |  SELECT c_mktsegment, c_custkey, spend_exact, n_orders,
        |         row_number() OVER (PARTITION BY c_mktsegment
        |                            ORDER BY spend_exact DESC, c_custkey ASC) AS rank
        |  FROM (
        |    SELECT c_mktsegment, c_custkey,
        |           sum(CAST(o_totalprice AS DECIMAL(30,10))) AS spend_exact, count(*) AS n_orders
        |    FROM orders JOIN customer ON o_custkey = c_custkey
        |    GROUP BY c_mktsegment, c_custkey))
        |WHERE rank <= 5""".stripMargin
  )
}
