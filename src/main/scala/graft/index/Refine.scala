package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric

/** Exact re-ranking (refine) stage over any ANN candidate set — the
  * standard recall-recovery composition (faiss `IndexRefineFlat` shape;
  * the reference stops at raw ADC results, search.go:92-131, so this is
  * a beyond-reference operator): an approximate index overfetches
  * k' ≥ k candidates cheaply, then the true metric is recomputed on just
  * those candidates and the top-k re-selected.
  *
  * 100 TB shape: the candidate set is nq·k' (id, query_id) pairs — tiny —
  * so BOTH joins broadcast the small side. The corpus is scanned exactly
  * once with a broadcast hash join doing the candidate lookup; it is
  * never shuffled, and only nq·k' rows survive the scan. Cost is one
  * corpus scan + nq·k' exact distances, independent of corpus width
  * blow-ups (the PQ/SQ8 codes tables stay the serving path; this stage
  * touches the raw vectors only for the survivors).
  */
object Refine {

  /** Re-rank `candidates` (any frame with query_id, neighbor_id — e.g.
    * the output of `PqIndex.knn` / `IvfPqIndex.knn` / `Sq8Index.knn` at
    * k'=overfetch) against the raw `corpus` (id, vec) under `metric`,
    * returning the standard (query_id, neighbor_id, distance, rank)
    * top-k frame with EXACT distances. */
  def rerank(candidates: DataFrame, corpus: DataFrame, queries: DataFrame,
      k: Int, metric: Metric): DataFrame = {
    val cand = candidates.select(col("query_id"), col("neighbor_id"))
    val scored = corpus
      .join(broadcast(cand), corpus("id") === cand("neighbor_id"))
      .join(broadcast(queries), "query_id")
      .select(
        col("query_id"),
        col("neighbor_id"),
        metric.rankKey(col("qvec"), col("vec")).as("rank_key"))
    FlatIndex.topK(scored, k, metric)
  }
}
