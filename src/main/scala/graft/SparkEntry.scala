package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Metric
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries and their DuckDB oracle SQL live in per-domain
  * [[graft.queries.QueryProvider]]s; this object is the aggregation point
  * the driver introspects.
  *
  * Parity conventions (see SURVEY.md §7.3 "float32 vs float64 drift"):
  *  - all float math is double-precision on both sides, folded
  *    left-to-right (`aggregate` here, `list_reduce` in DuckDB);
  *  - every floating-point output column is `round(x, 4)` (money: 2);
  *  - every ordering tie-breaks on an id column so ranks are deterministic.
  */
object SparkEntry {

  private val providers: Seq[QueryProvider] =
    Seq(VectorQueries, RelationalQueries, TextQueries, IndexQueries,
      DedupQueries, StreamQueries, AnnQueries, MultimodalQueries,
      RetrievalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("knn_flat_l2")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    providers.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    providers.flatMap(_.oracles).toMap
}
