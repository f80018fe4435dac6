package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Metric, Tables}
import graft.functions.VectorFunctions._
import graft.index.FlatIndex

/** Vector-search operators from SURVEY.md §2 over the embeddings table:
  * exact flat kNN per metric (J1+T1), range search (P3), norms (F4),
  * per-label centroids (A1), recall join (J5), payload join (J4).
  */
object VectorQueries extends QueryProvider {

  val QueryIds = 8 // embeddings rows with vec_id < 8 act as the query batch
  val K = 10
  /** NDCG@K discount table 1/log2(i+1) and its prefix sums — computed
    * ONCE here and spliced as double literals into both the Spark plan
    * and the DuckDB oracle (eval_rank_metrics), so the two engines share
    * bit-identical constants instead of each calling libm. */
  val NdcgDisc: Seq[Double] =
    (1 to K).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
  val NdcgCum: Seq[Double] = NdcgDisc.scanLeft(0.0)(_ + _).tail
  /** knn_class_topk exemplars per (query, label). */
  val PerClassK = 2
  /** knn_graph: node cap (keeps the oracle's all-pairs re-derivation
    * tractable) and per-node degree. */
  val KnnGraphCap = 256
  val KnnGraphK = 5

  /** (corpus, queries) in canonical shape from the embeddings table. */
  def vecTables(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
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

  // ---- DuckDB oracle fragments (left-to-right double folds, matching
  // VectorFunctions exactly); shared with other providers. ----

  /** Generic squared-L2 between two list columns named `a` and `b`. */
  def sqlL2SqG(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> ($a[i]-$b[i])*($a[i]-$b[i])), (x,y) -> x+y)"

  /** Generic Manhattan/L1 between two list columns named `a` and `b`. */
  def sqlL1G(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> abs($a[i]-$b[i])), (x,y) -> x+y)"

  /** Generic dot / norm / cosine-similarity fragments over list columns. */
  def sqlDotG(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i]), (x,y) -> x+y)"
  def sqlNormG(a: String): String =
    s"sqrt(${sqlDotG(a, a)})"
  def sqlCosineSimG(a: String, b: String): String =
    s"""CASE WHEN ${sqlNormG(a)} = 0 OR ${sqlNormG(b)} = 0 THEN 0.0
       | ELSE least(1.0, greatest(-1.0, (${sqlDotG(a, b)}) / ((${sqlNormG(a)}) * (${sqlNormG(b)})))) END""".stripMargin.replaceAll("\n", " ")

  val sqlDot =
    "list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*ev[i]), (a,b) -> a+b)"
  val sqlL2Sq =
    "list_reduce(list_transform(range(1, len(qv)+1), i -> (qv[i]-ev[i])*(qv[i]-ev[i])), (a,b) -> a+b)"
  val sqlL2 = s"sqrt($sqlL2Sq)"
  val sqlL1 =
    "list_reduce(list_transform(range(1, len(qv)+1), i -> abs(qv[i]-ev[i])), (a,b) -> a+b)"
  val sqlNormQ =
    "sqrt(list_reduce(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i]), (a,b) -> a+b))"
  val sqlNormE =
    "sqrt(list_reduce(list_transform(range(1, len(ev)+1), i -> ev[i]*ev[i]), (a,b) -> a+b))"
  val sqlCosine =
    s"""CASE WHEN $sqlNormQ = 0 OR $sqlNormE = 0 THEN 1.0
       | ELSE 1.0 - least(1.0, greatest(-1.0, ($sqlDot) / (($sqlNormQ) * ($sqlNormE)))) END""".stripMargin.replaceAll("\n", " ")

  /** CTEs q (query batch) and v (corpus) over the embeddings view. */
  val sqlVecCtes: String =
    s"""q AS (
       |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
       |  FROM embeddings WHERE vec_id < $QueryIds),
       |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings)""".stripMargin

  /** Full kNN oracle for `distExpr`, keeping rank ≤ k. */
  def knnOracleSql(distExpr: String, k: Int = K): String =
    s"""WITH $sqlVecCtes,
       |d AS (
       |  SELECT q.query_id, v.vec_id AS neighbor_id, $distExpr AS dist
       |  FROM q CROSS JOIN v),
       |r AS (
       |  SELECT query_id, neighbor_id, dist,
       |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
       |  FROM d)
       |SELECT query_id, neighbor_id, round(dist, 4) AS distance, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= $k""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 + T1: exact flat kNN per metric (flat.go:74-114)
    "knn_flat_l2" -> knnQuery(Metric.L2),
    "knn_flat_cosine" -> knnQuery(Metric.Cosine),
    "knn_flat_dot" -> knnQuery(Metric.Dot),
    // the roadmap metric (docs/roadmap.md:89) the reference never shipped
    "knn_flat_manhattan" -> knnQuery(Metric.Manhattan),
    // Hard-negative mining for embedding-model training: per query, the
    // nearest corpus vectors with a DIFFERENT label. The label test
    // references BOTH sides, so this is a predicated kNN join —
    // knn_flat_filtered's static-pushdown shape can't express it. Plan:
    // broadcast the (qvec, qlabel) batch, filter label ≠ qlabel BEFORE
    // ranking (mismatched rows never reach the top-k buffers), then the
    // usual rank-key kernel. Self-matches are excluded by construction
    // (same label). Corpus side streams once, never shuffles wide rows.
    "knn_hard_negatives" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      val queries = v.where(col("id") < QueryIds)
        .select(col("id").as("query_id"), col("vec").as("qvec"),
          col("label").as("qlabel"))
      val distances = v.crossJoin(broadcast(queries))
        .where(col("label") =!= col("qlabel"))
        .select(col("query_id"), col("id").as("neighbor_id"),
          Metric.L2.rankKey(col("qvec"), col("vec")).as("rank_key"))
      FlatIndex.topK(distances, K, Metric.L2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("distance"), 4).as("distance"), col("rank"))
    }),
    // Class-balanced retrieval (few-shot exemplar selection): the
    // PerClassK nearest corpus rows from EVERY label, per query — the
    // rank window partitions by (query_id, label), so Spark plans the
    // same WindowGroupLimit partial top-k sample_stratified relies on:
    // each partition keeps ≤ PerClassK candidates per (query, label)
    // before the shuffle.
    "knn_class_topk" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      val queries = v.where(col("id") < QueryIds)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      val distances = v.crossJoin(broadcast(queries))
        .select(col("query_id"), col("label"), col("id").as("neighbor_id"),
          Metric.L2.rankKey(col("qvec"), col("vec")).as("rank_key"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id", "label")
        .orderBy(col("rank_key"), col("neighbor_id"))
      distances.withColumn("rank", row_number().over(w))
        .where(col("rank") <= PerClassK)
        .select(col("query_id"), col("label"), col("neighbor_id"),
          round(Metric.L2.finishRank(col("rank_key")), 4).as("distance"),
          col("rank").cast("int").as("rank"))
    }),
    // IR evaluation metrics — the measurement layer every retrieval
    // deployment needs next to the kernels: per query over the top-K
    // cosine neighbors (self excluded before ranking), relevance = label
    // match, emit precision@K and MRR (exact rationals) and NDCG@K.
    // NDCG's log2 discounts are INJECTED DOUBLE LITERALS generated once
    // in Scala and spliced into both the plan and the oracle SQL — the
    // two engines never run libm independently, so a 1-ulp log2 drift
    // can't flip a 4-dp rounding (the same shared-constant discipline as
    // the mixture thresholds); DCG folds in rank order, IDCG indexes a
    // cumulative-discount literal by n_rel. Shuffle ∝ nq·K metric rows.
    "eval_rank_metrics" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      val queries = v.where(col("id") < QueryIds)
        .select(col("id").as("query_id"), col("vec").as("qvec"),
          col("label").as("qlabel"))
      val nn = v.crossJoin(broadcast(queries))
        .where(col("id") =!= col("query_id"))
        .select(col("query_id"), col("id").as("neighbor_id"),
          when(col("label") === col("qlabel"), 1).otherwise(0).as("rel"),
          Metric.Cosine.rankKey(col("qvec"), col("vec")).as("rank_key"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("query_id").orderBy(col("rank_key"), col("neighbor_id"))))
        .where(col("rank") <= K)
      val discArr = array(NdcgDisc.map(lit): _*)
      val cumArr = array((0.0 +: NdcgCum).map(lit): _*) // index 1 = n_rel 0
      nn.groupBy("query_id").agg(
          sum(col("rel")).as("n_rel"),
          min(when(col("rel") === 1, col("rank"))).as("first_rel"),
          aggregate(
            array_sort(collect_list(struct(col("rank"),
              (col("rel") * element_at(discArr, col("rank"))).as("d")))),
            lit(0.0), (a, x) => a + x.getField("d")).as("dcg"))
        .select(col("query_id"), col("n_rel"),
          round(col("n_rel").cast("double") / K, 4).as("prec"),
          round(when(col("first_rel").isNull, 0.0)
            .otherwise(lit(1.0) / col("first_rel")), 4).as("mrr"),
          round(when(col("n_rel") === 0, 0.0)
            .otherwise(col("dcg") / element_at(cumArr, (col("n_rel") + 1).cast("int"))), 4)
            .as("ndcg"))
    }),
    // kNN classification (majority vote) — the canonical CONSUMER of a
    // kNN kernel: predict each query's label as the most common label
    // among its K nearest labeled exemplars. Self-matches are excluded
    // BEFORE ranking (the predicated-kNN-join discipline above — the
    // query's own row would always vote once for the true label and
    // bias every prediction). Vote ties break to the smaller label so
    // the prediction is deterministic. Plan: the usual broadcast
    // query-batch scan, then two nq·K-row aggregations — the corpus
    // never shuffles; at 100 TB the candidate stage swaps for any ANN
    // kind (same voting tail).
    "knn_classify" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      val queries = v.where(col("id") < QueryIds)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      val distances = v.crossJoin(broadcast(queries))
        .where(col("id") =!= col("query_id"))
        .select(col("query_id"), col("label"), col("id").as("neighbor_id"),
          Metric.L2.rankKey(col("qvec"), col("vec")).as("rank_key"))
      val nn = distances
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("query_id").orderBy(col("rank_key"), col("neighbor_id"))))
        .where(col("rank") <= K)
      val votes = nn.groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("votes"))
      votes
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("query_id").orderBy(col("votes").desc, col("label"))))
        .where(col("rn") === 1)
        .select(col("query_id"), col("label").as("pred_label"),
          col("votes").cast("int").as("votes"))
    }),
    // Corpus kNN GRAPH (the building block under semantic dedup /
    // graph-based clustering): every capped node's k nearest OTHER
    // nodes. Self-pairs are excluded BEFORE ranking (a predicated kNN
    // join, like knn_hard_negatives — rank 1 must be the true nearest
    // neighbor, not the node itself). The capped node set broadcasts as
    // the query batch while the same rows stream as the corpus — the
    // exact-graph shape; at 100 TB the graph goes through the LSH/IVF
    // bucketed kinds instead (near_dup_embedding's gating), this row
    // pins the exact contract they approximate.
    "knn_graph" -> ((s, dir) => {
      val v = Tables.vectors(s, dir).where(col("id") < KnnGraphCap)
      val queries = v.select(col("id").as("query_id"), col("vec").as("qvec"))
      val distances = v.crossJoin(broadcast(queries))
        .where(col("id") =!= col("query_id"))
        .select(col("query_id"), col("id").as("neighbor_id"),
          Metric.L2.rankKey(col("qvec"), col("vec")).as("rank_key"))
      FlatIndex.topK(distances, KnnGraphK, Metric.L2)
        .select(col("query_id"), col("neighbor_id"),
          round(col("distance"), 4).as("distance"), col("rank"))
    }),
    // Mutual-kNN edges from the graph above: (a, b) kept iff each is in
    // the other's top-k — the symmetric edge set graph-clustering
    // pipelines (and kNN-graph dedup) actually consume, since one-way
    // edges into a hub node over-connect components. Self-join of the
    // tiny graph result on the swapped key pair; canonical a < b.
    "knn_graph_mutual" -> ((s, dir) => {
      val g = queries("knn_graph")(s, dir)
        .select(col("query_id"), col("neighbor_id"), col("distance"))
      g.alias("f")
        .join(g.alias("r"),
          col("f.query_id") === col("r.neighbor_id") &&
            col("f.neighbor_id") === col("r.query_id"))
        .where(col("f.query_id") < col("f.neighbor_id"))
        .select(col("f.query_id").as("id_a"), col("f.neighbor_id").as("id_b"),
          col("f.distance"))
    }),
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
    }),
    // J5: recall join — overlap@k of cosine vs l2 neighbor lists
    "recall_cosine_vs_l2" -> ((s, dir) => {
      val (corpus, queries) = vecTables(s, dir)
      val l2 = FlatIndex.knn(corpus, queries, K, Metric.L2)
        .select(col("query_id"), col("neighbor_id"))
      val cos = FlatIndex.knn(corpus, queries, K, Metric.Cosine)
        .select(col("query_id"), col("neighbor_id"))
      val overlap = l2.join(cos, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n"))
      queries.select(col("query_id"))
        .join(overlap, Seq("query_id"), "left")
        .select(
          col("query_id"),
          round(coalesce(col("n"), lit(0L)) / lit(K.toDouble), 4).as("recall"))
    }),
    // F13 + F14: matrix·vector projection and pairwise distance matrix
    // (simd.go:105-115, simd.go:119-136) over a bounded id prefix
    // PCA pre-index transform (operators.Pca): the eigendecomposition
    // is not SQL-expressible, so the gate is the literal-oracle
    // invariants style. Contraction is the strong per-row check —
    // orthonormal components make ‖P(x−μ)‖ ≤ ‖x−μ‖ for EVERY row, which
    // fails for any non-orthonormal matrix; centering gates the mean.
    "pca_project_invariants" -> ((s, dir) => {
      val (corpus, _) = vecTables(s, dir)
      val model = graft.operators.Pca.train(corpus, k = 16)
      val cn = graft.functions.VectorFunctions.norm(
        graft.functions.VectorFunctions.vecSub(col("vec"), typedlit(model.mean)))
      val projected = corpus.select(col("id"),
        graft.operators.Pca.projectCol(col("vec"), model).as("pv"), cn.as("cn"))
      val contraction = projected.agg(
        count(lit(1)).as("n_rows"),
        sum(when(graft.functions.VectorFunctions.norm(col("pv")) > col("cn") + 1e-9, 1)
          .otherwise(0)).as("n_contraction_violations"))
      val centering = projected
        .select(posexplode(col("pv")).as(Seq("c", "y")))
        .groupBy("c").agg(avg(col("y")).as("m"))
        .agg(sum(when(abs(col("m")) > 1e-6, 1).otherwise(0))
          .as("n_centering_violations"))
      contraction.crossJoin(centering)
    }),
    "pairwise_matvec" -> ((s, dir) => {
      val v = Tables.vectors(s, dir).where(col("id") < 20)
        .select(col("id"), col("vec"))
      val pairs = graft.index.FlatIndex.pairwiseDistances(v, Metric.L2)
      // 2-row projection matrix: all-ones and alternating ±1
      val mat: Seq[Seq[Double]] = Seq(
        Seq.fill(64)(1.0),
        (0 until 64).map(i => if (i % 2 == 0) 1.0 else -1.0))
      val proj = v.select(col("id").as("id_a"),
        graft.functions.VectorFunctions.matVec(mat, col("vec")).as("mv"))
      pairs.join(proj, Seq("id_a"))
        .select(col("id_a"), col("id_b"),
          round(col("distance"), 4).as("distance"),
          round(col("mv")(0), 4).as("proj_sum"),
          round(col("mv")(1), 4).as("proj_alt"))
    }),
    // Predicate-filtered kNN: restrict the corpus by a metadata predicate
    // BEFORE the kernel — the "filtered vector search" every vector store
    // exposes. The filter is a plain scan predicate, so it reaches the
    // parquet reader (PushedFilters) and the kNN kernel only ever sees the
    // qualifying rows; at 100 TB the selectivity multiplies straight
    // through the scan, unlike post-filtering a top-k (which under-fills k).
    "knn_flat_filtered" -> ((s, dir) => {
      val v = Tables.vectors(s, dir)
      val corpus = v.where(col("label") <= 4).select(col("id"), col("vec"))
      val queries = v.where(col("id") < QueryIds)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      FlatIndex.knn(corpus, queries, K, Metric.Cosine)
        .select(
          col("query_id"), col("neighbor_id"),
          round(col("distance"), 4).as("distance"), col("rank"))
    }),
    // J4 + F17: payload join — kNN neighbors back to document records
    "knn_payload_join" -> ((s, dir) => {
      val (corpus, queries) = vecTables(s, dir)
      val docs = Tables.load(s, dir, "documents")
      FlatIndex.knn(corpus, queries, 5, Metric.Cosine)
        .join(docs, col("neighbor_id") === col("doc_id"))
        .select(
          col("query_id"), col("neighbor_id"), col("rank"),
          round(similarity(col("distance")), 4).as("similarity"),
          col("lang"), col("source"))
    })
  )

  def oracles: Map[String, String] = Map(
    "pca_project_invariants" ->
      s"""SELECT (SELECT count(*) FROM embeddings) AS n_rows,
         |       CAST(0 AS BIGINT) AS n_contraction_violations,
         |       CAST(0 AS BIGINT) AS n_centering_violations""".stripMargin,
    "knn_flat_l2" -> knnOracleSql(sqlL2),
    "knn_hard_negatives" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < $QueryIds),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label FROM embeddings),
         |d AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id, $sqlL2 AS dist
         |  FROM q CROSS JOIN v WHERE v.label <> q.ql),
         |r AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM d)
         |SELECT query_id, neighbor_id, round(dist, 4) AS distance, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $K""".stripMargin,
    "knn_class_topk" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < $QueryIds),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label FROM embeddings),
         |d AS (
         |  SELECT q.query_id, v.label, v.vec_id AS neighbor_id, $sqlL2 AS dist
         |  FROM q CROSS JOIN v),
         |r AS (
         |  SELECT query_id, label, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id, label
         |                            ORDER BY dist, neighbor_id) AS rank
         |  FROM d)
         |SELECT query_id, label, neighbor_id, round(dist, 4) AS distance, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $PerClassK""".stripMargin,
    "eval_rank_metrics" -> {
      val discList = NdcgDisc.mkString(", ")
      val cumList = NdcgCum.mkString(", ")
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS ql
         |  FROM embeddings WHERE vec_id < $QueryIds),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label FROM embeddings),
         |d AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id,
         |         CASE WHEN v.label = q.ql THEN 1 ELSE 0 END AS rel,
         |         $sqlCosine AS dist
         |  FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id),
         |t AS (SELECT query_id, neighbor_id, rel, rank FROM (
         |        SELECT query_id, neighbor_id, rel,
         |               row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |        FROM d) WHERE rank <= $K),
         |a AS (SELECT query_id, sum(rel) AS n_rel,
         |             min(CASE WHEN rel = 1 THEN rank END) AS first_rel,
         |             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |               list(rel * (CAST([$discList] AS DOUBLE[]))[rank] ORDER BY rank)),
         |               (x, y) -> x + y) AS dcg
         |      FROM t GROUP BY query_id)
         |SELECT query_id, CAST(n_rel AS BIGINT) AS n_rel,
         |       round(CAST(n_rel AS DOUBLE) / $K, 4) AS prec,
         |       round(CASE WHEN first_rel IS NULL THEN 0.0
         |                  ELSE 1.0 / first_rel END, 4) AS mrr,
         |       round(CASE WHEN n_rel = 0 THEN 0.0
         |                  ELSE dcg / (CAST([$cumList] AS DOUBLE[]))[CAST(n_rel AS BIGINT)]
         |             END, 4) AS ndcg
         |FROM a""".stripMargin
    },
    "knn_classify" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < $QueryIds),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label FROM embeddings),
         |d AS (
         |  SELECT q.query_id, v.label, v.vec_id AS neighbor_id, $sqlL2 AS dist
         |  FROM q CROSS JOIN v WHERE v.vec_id <> q.query_id),
         |nn AS (
         |  SELECT query_id, label FROM (
         |    SELECT query_id, label,
         |           row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |    FROM d) WHERE rank <= $K),
         |vt AS (SELECT query_id, label, count(*) AS votes FROM nn GROUP BY query_id, label),
         |r AS (
         |  SELECT query_id, label, votes,
         |         row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS rn
         |  FROM vt)
         |SELECT query_id, label AS pred_label, CAST(votes AS INT) AS votes
         |FROM r WHERE rn = 1""".stripMargin,
    "knn_flat_cosine" -> knnOracleSql(sqlCosine),
    "knn_flat_dot" -> knnOracleSql(s"-($sqlDot)"),
    "knn_flat_manhattan" -> knnOracleSql(sqlL1),
    "knn_flat_filtered" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < $QueryIds),
         |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
         |      FROM embeddings WHERE label <= 4),
         |d AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id, $sqlCosine AS dist
         |  FROM q CROSS JOIN v),
         |r AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM d)
         |SELECT query_id, neighbor_id, round(dist, 4) AS distance, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $K""".stripMargin,
    "knn_graph" ->
      s"""WITH n AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS ev0
         |           FROM embeddings WHERE vec_id < $KnnGraphCap),
         |p AS (SELECT a.id AS query_id, b.id AS neighbor_id, a.ev0 AS qv, b.ev0 AS ev
         |      FROM n a JOIN n b ON a.id <> b.id),
         |d AS (SELECT query_id, neighbor_id, sqrt($sqlL2Sq) AS dist FROM p),
         |r AS (SELECT query_id, neighbor_id, dist,
         |             row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |      FROM d)
         |SELECT query_id, neighbor_id, round(dist, 4) AS distance, CAST(rank AS INT) AS rank
         |FROM r WHERE rank <= $KnnGraphK""".stripMargin,
    "knn_graph_mutual" ->
      s"""WITH n AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS ev0
         |           FROM embeddings WHERE vec_id < $KnnGraphCap),
         |p AS (SELECT a.id AS query_id, b.id AS neighbor_id, a.ev0 AS qv, b.ev0 AS ev
         |      FROM n a JOIN n b ON a.id <> b.id),
         |d AS (SELECT query_id, neighbor_id, sqrt($sqlL2Sq) AS dist FROM p),
         |r AS (SELECT query_id, neighbor_id, dist,
         |             row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |      FROM d),
         |g AS (SELECT query_id, neighbor_id, dist FROM r WHERE rank <= $KnnGraphK)
         |SELECT f.query_id AS id_a, f.neighbor_id AS id_b, round(f.dist, 4) AS distance
         |FROM g f JOIN g b ON f.query_id = b.neighbor_id AND f.neighbor_id = b.query_id
         |WHERE f.query_id < f.neighbor_id""".stripMargin,
    "range_search_l2" ->
      s"""WITH $sqlVecCtes,
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
        |GROUP BY label, pos""".stripMargin,
    "recall_cosine_vs_l2" ->
      s"""WITH $sqlVecCtes,
         |d AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id, $sqlL2Sq AS dl2, $sqlCosine AS dcos
         |  FROM q CROSS JOIN v),
         |rl AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY dl2, neighbor_id) AS rk FROM d),
         |rc AS (SELECT query_id, neighbor_id,
         |       row_number() OVER (PARTITION BY query_id ORDER BY dcos, neighbor_id) AS rk FROM d),
         |ov AS (
         |  SELECT rl.query_id, count(*) AS n
         |  FROM (SELECT * FROM rl WHERE rk <= $K) rl
         |  JOIN (SELECT * FROM rc WHERE rk <= $K) rc
         |    ON rl.query_id = rc.query_id AND rl.neighbor_id = rc.neighbor_id
         |  GROUP BY rl.query_id)
         |SELECT q.query_id, round(coalesce(ov.n, 0) / ${K.toDouble}, 4) AS recall
         |FROM q LEFT JOIN ov ON q.query_id = ov.query_id""".stripMargin,
    "pairwise_matvec" ->
      s"""WITH v AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS ev
         |           FROM embeddings WHERE vec_id < 20),
         |mv AS (SELECT id,
         |  list_reduce(list_transform(range(1, len(ev)+1), i -> ev[i]), (x,y) -> x+y) AS proj_sum,
         |  list_reduce(list_transform(range(1, len(ev)+1),
         |    i -> CASE WHEN (i-1) % 2 = 0 THEN ev[i] ELSE -ev[i] END), (x,y) -> x+y) AS proj_alt
         |  FROM v)
         |SELECT a.id AS id_a, b.id AS id_b,
         |       round(sqrt(${sqlL2SqG("a.ev", "b.ev")}), 4) AS distance,
         |       round(mv.proj_sum, 4) AS proj_sum, round(mv.proj_alt, 4) AS proj_alt
         |FROM v a CROSS JOIN v b JOIN mv ON mv.id = a.id""".stripMargin,
    "knn_payload_join" ->
      s"""WITH $sqlVecCtes,
         |d AS (
         |  SELECT q.query_id, v.vec_id AS neighbor_id, $sqlCosine AS dist
         |  FROM q CROSS JOIN v),
         |r AS (
         |  SELECT query_id, neighbor_id, dist,
         |         row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
         |  FROM d)
         |SELECT r.query_id, r.neighbor_id, CAST(r.rank AS INT) AS rank,
         |       round(1.0 - r.dist, 4) AS similarity, doc.lang, doc.source
         |FROM r JOIN documents doc ON r.neighbor_id = doc.doc_id
         |WHERE r.rank <= 5""".stripMargin
  )
}
