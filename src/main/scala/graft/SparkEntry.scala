package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Metric, Tables}
import graft.functions.VectorFunctions._
import graft.index.FlatIndex

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 re-expressed
  * as a Spark plan over the driver testdata tables; [[oracleSql]] holds the
  * DuckDB-equivalent SQL the driver hash-compares against.
  *
  * Parity conventions (see SURVEY.md §7.3 "float32 vs float64 drift"):
  *  - all float math is double-precision on both sides, folded
  *    left-to-right (`aggregate` here, `list_reduce` in DuckDB);
  *  - every floating-point output column is `round(x, 4)`;
  *  - every ordering tie-breaks on an id column so ranks are deterministic.
  */
object SparkEntry {

  private val QueryIds = 8 // embeddings rows with vec_id < 8 act as the query batch
  private val K = 10

  /** (corpus, queries) in canonical shape from the embeddings table. */
  private def vecTables(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val v = Tables.vectors(s, dir)
    val corpus = v.select(col("id"), col("vec"))
    val queries = v.where(col("id") < QueryIds)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    (corpus, queries)
  }

  private def knnQuery(metric: Metric)(s: SparkSession, dir: String): DataFrame = {
    val (corpus, queries) = vecTables(s, dir)
    FlatIndex.knn(corpus, queries, K, metric)
      .select(
        col("query_id"), col("neighbor_id"),
        round(col("distance"), 4).as("distance"), col("rank"))
  }

  /** DuckDB SQL for exact kNN under `distExpr` (a SQL expression over
    * double-lists qv/ev), mirroring the Spark plan above. */
  private def knnOracle(distExpr: String): String =
    s"""WITH q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $QueryIds),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
       |d AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id, $distExpr AS dist
       |  FROM q CROSS JOIN v),
       |r AS (
       |  SELECT query_id, neighbor_id, dist,
       |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
       |  FROM d)
       |SELECT query_id, neighbor_id, round(dist, 4) AS distance, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= $K""".stripMargin

  // Left-to-right double folds, matching VectorFunctions exactly.
  private val sqlDot =
    "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*ev[i]), (a,b) -> a+b)"
  private val sqlL2Sq =
    "list_reduce(list_transform(range(1, len(qv)+1), i -> (qv[i]-ev[i])*(qv[i]-ev[i])), (a,b) -> a+b)"
  private val sqlL2 = s"sqrt($sqlL2Sq)"
  private val sqlNormQ =
    "sqrt(list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]), (a,b) -> a+b))"
  private val sqlNormE =
    "sqrt(list_reduce(list_transform(range(1, len(ev)+1), i -> ev[i]*ev[i]), (a,b) -> a+b))"
  private val sqlCosine =
    s"""CASE WHEN $sqlNormQ = 0 OR $sqlNormE = 0 THEN 1.0
       | ELSE 1.0 - least(1.0, greatest(-1.0, ($sqlDot) / (($sqlNormQ) * ($sqlNormE)))) END""".stripMargin.replaceAll("\n", " ")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnQuery(Metric.L2)(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 + T1: exact flat kNN per metric (flat.go:74-114)
    "knn_flat_l2" -> knnQuery(Metric.L2),
    "knn_flat_cosine" -> knnQuery(Metric.Cosine),
    "knn_flat_dot" -> knnQuery(Metric.Dot),
    // P3: range search as exact filter (search.go:165-189)
    "range_search_l2" -> ((s, dir) => {
      val (corpus, queries) = vecTables(s, dir)
      FlatIndex.rangeSearch(corpus, queries, threshold = 1.25, Metric.L2, maxResults = 50)
        .select(
          col("query_id"), col("neighbor_id"),
          round(col("distance"), 4).as("distance"), col("rank"))
    }),
    // F4: materialized norms (flat.go:47-53)
    "vector_norms" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      v.select(col("id"), round(norm(col("vec")), 4).as("norm"))
    }),
    // A1: per-label centroid (vector.go:111-131), long format (label, pos, value)
    "centroid_by_label" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      v.select(col("label"), posexplode(col("vec")).as(Seq("pos", "x")))
        .groupBy(col("label"), col("pos"))
        .agg(round(avg(col("x")), 4).as("value"))
        .select(col("label"), col("pos").cast("int").as("pos"), col("value"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "knn_flat_l2" -> knnOracle(sqlL2),
    "knn_flat_cosine" -> knnOracle(sqlCosine),
    "knn_flat_dot" -> knnOracle(s"-($sqlDot)"),
    "range_search_l2" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < $QueryIds),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
         |d AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id, $sqlL2Sq AS dist2
         |  FROM q CROSS JOIN v),
         |r AS (
         |  SELECT query_id, neighbor_id, dist2,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist2, neighbor_id) AS rank
         |  FROM d WHERE dist2 <= 1.25 * 1.25)
         |SELECT query_id, neighbor_id, round(sqrt(dist2), 4) AS distance, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= 50""".stripMargin,
    "vector_norms" ->
      """SELECT vec_id AS id,
        |       round(sqrt(list_reduce(list_transform(CAST(embedding AS DOUBLE[]), x -> x*x), (a,b) -> a+b)), 4) AS norm
        |FROM embeddings""".stripMargin,
    "centroid_by_label" ->
      """SELECT label, pos, round(avg(x), 4) AS value FROM (
        |  SELECT label, CAST(generate_subscripts(ev, 1) - 1 AS INT) AS pos, unnest(ev) AS x
        |  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings))
        |GROUP BY label, pos""".stripMargin
  )
}
