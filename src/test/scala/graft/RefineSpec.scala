package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.queries.VectorQueries

/** Exact re-rank (refine) invariants: exact distances on the candidate
  * set, recall never drops vs the raw ADC result, k rows per query, and
  * the broadcast-join plan shape (corpus never shuffled).
  */
class RefineSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private val K = 10
  private val Kprime = 30

  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  private def recallVsFlat(approx: org.apache.spark.sql.DataFrame,
      flat: org.apache.spark.sql.DataFrame): Double = {
    val hits = approx.select(col("query_id"), col("neighbor_id"))
      .join(flat.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .count()
    hits.toDouble / flat.count()
  }

  test("reranked distances are exact (match flat distances) and k rows per query") {
    val (corpus, queries) = vecs
    val model = PqIndex.trainDeterministic(corpus, 8, 16, Metric.L2)
    val cands = PqIndex.knn(PqIndex.encode(corpus, model), model, queries, Kprime)
    val rr = Refine.rerank(cands, corpus, queries, K, Metric.L2).cache()

    // k rows per query, ranks dense 1..k
    val perQuery = rr.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx"), min("rank").as("mn"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getLong(1) == K && r.getInt(3) == 1 && r.getInt(2) == K)
    }

    // every reranked distance equals the exact flat distance for that pair
    val exact = FlatIndex.distanceJoin(corpus, queries, Metric.L2)
      .select(col("query_id"), col("neighbor_id"),
        Metric.L2.finishRank(col("rank_key")).as("exact_d"))
    val mism = rr.join(exact, Seq("query_id", "neighbor_id"))
      .where(abs(col("distance") - col("exact_d")) > 1e-9)
      .count()
    assert(mism == 0, s"$mism reranked rows with non-exact distances")
    rr.unpersist()
  }

  test("refine recall ≥ raw ADC recall for PQ and IVFPQ, and beats it here") {
    val (corpus, queries) = vecs
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2).cache()

    val pq = PqIndex.trainDeterministic(corpus, 8, 16, Metric.L2)
    val codes = PqIndex.encode(corpus, pq).cache()
    val rawPq = recallVsFlat(PqIndex.knn(codes, pq, queries, K), flat)
    val rerPq = recallVsFlat(
      Refine.rerank(PqIndex.knn(codes, pq, queries, Kprime), corpus, queries, K, Metric.L2),
      flat)
    assert(rerPq >= rawPq, s"PQ rerank recall $rerPq < raw $rawPq")
    assert(rerPq > rawPq + 0.05,
      s"expected a material recall lift on this data, got $rawPq -> $rerPq")

    val ivfpq = IvfPqIndex.trainDeterministic(corpus, 16, 8, 16, Metric.L2)
    val rawIp = recallVsFlat(IvfPqIndex.knn(corpus, ivfpq, queries, K, 4), flat)
    val rerIp = recallVsFlat(
      Refine.rerank(IvfPqIndex.knn(corpus, ivfpq, queries, Kprime, 4),
        corpus, queries, K, Metric.L2),
      flat)
    assert(rerIp >= rawIp, s"IVFPQ rerank recall $rerIp < raw $rawIp")
    codes.unpersist(); flat.unpersist()
  }

  test("rerank at k' = corpus size reproduces flat kNN exactly") {
    val (corpus, queries) = vecs
    val n = corpus.count().toInt
    val pq = PqIndex.trainDeterministic(corpus, 8, 16, Metric.L2)
    val cands = PqIndex.knn(PqIndex.encode(corpus, pq), pq, queries, n)
    val rr = Refine.rerank(cands, corpus, queries, K, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    assert(rr.except(flat).count() == 0 && flat.except(rr).count() == 0)
  }

  test("plan: both refine joins broadcast the small side — corpus is never shuffled") {
    val (corpus, queries) = vecs
    val pq = PqIndex.trainDeterministic(corpus, 8, 16, Metric.L2)
    val cands = PqIndex.knn(PqIndex.encode(corpus, pq), pq, queries, Kprime)
    val plan = Refine.rerank(cands, corpus, queries, K, Metric.L2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"refine must not shuffle the corpus:\n$plan")
  }
}
