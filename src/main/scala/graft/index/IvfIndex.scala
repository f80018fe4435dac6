package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Metric

/** IVF (inverted-file) index: vectors clustered to nlist centroids; a
  * query scans only its nprobe nearest clusters (reference:
  * pkg/index/ivf/ivf.go).
  *
  * Spark layout: the index table is the vector table + a `cluster_id`
  * column, written partitioned by `cluster_id`; the centroid matrix is a
  * small driver-side artifact. Search is:
  *   1. probe ranking — per query, top-nprobe centroids by distance
  *      (tiny: queries × nlist, all in one projection over the centroid
  *      literal);
  *   2. probe join — `codes ⋈ broadcast(probes)` on cluster_id: with the
  *      table partitioned by cluster_id this is a partition-pruned scan
  *      (SURVEY.md J3); nothing about the big side ever shuffles;
  *   3. exact distances within the probed lists + per-query top-k.
  */
final case class IvfModel(centroids: Seq[Seq[Double]], metric: Metric) {
  def nlist: Int = centroids.size
}

object IvfIndex {

  /** Train on the vector table (production: MLlib k-means). */
  def train(vectors: DataFrame, nlist: Int, metric: Metric, seed: Long = 42L): IvfModel =
    IvfModel(Centroids.kMeans(vectors, nlist, seed), metric)

  /** Deterministic trainer (id-bucket means) — same machinery,
    * oracle-reproducible. */
  def trainDeterministic(vectors: DataFrame, nlist: Int, metric: Metric): IvfModel =
    IvfModel(Centroids.bucketMeans(vectors, nlist), metric)

  /** Add-side: tag each vector with its nearest centroid (J2). Pure
    * projection — streaming-safe, appendable (ivf.go:93-112 semantics:
    * new vectors use the trained centroids until an explicit re-train). */
  def assign(vectors: DataFrame, model: IvfModel): DataFrame =
    vectors.withColumn("cluster_id", Centroids.nearest(col("vec"), model.centroids))

  /** Per-query probe set: top-nprobe clusters by centroid distance.
    * Output (query_id, qvec, cluster_id). nprobe is clamped to nlist
    * (ivf.go:127-129). */
  def probes(queries: DataFrame, model: IvfModel, nprobe: Int): DataFrame = {
    val np = math.min(math.max(nprobe, 1), model.nlist)
    val spark = queries.sparkSession
    import spark.implicits._
    // centroids as a small broadcast DataFrame — a typedlit matrix would
    // put nlist×dim literal nodes in the plan (40k+ at nlist=316/dim=128),
    // bloating analysis/codegen
    val cdf = model.centroids.zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("cluster_id", "cvec")
    val w = Window.partitionBy("query_id").orderBy(col("cdist2"), col("cluster_id"))
    queries
      .crossJoin(broadcast(cdf))
      .withColumn("cdist2", graft.functions.VectorFunctions.l2Sq(col("qvec"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= np)
      .select(col("query_id"), col("qvec"), col("cluster_id"))
  }

  /** Search the assigned table (`cluster_id` column present). */
  def search(assigned: DataFrame, model: IvfModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val p = probes(queries, model, nprobe)
    val candidates = assigned.join(broadcast(p), Seq("cluster_id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        model.metric.rankKey(col("qvec"), col("vec")).as("rank_key"))
    FlatIndex.topK(candidates, k, model.metric)
  }

  /** One-shot convenience: assign + search. */
  def knn(vectors: DataFrame, model: IvfModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    search(assign(vectors, model), model, queries, k, nprobe)
}
