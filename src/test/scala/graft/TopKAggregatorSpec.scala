package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.FlatIndex
import graft.queries.VectorQueries

/** The partial-aggregation top-k must agree exactly with the window
  * formulation (same (distance, id) ordering contract). */
class TopKAggregatorSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("aggregator top-k ≡ window top-k on real data") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val win = FlatIndex.knn(corpus, queries, 10, Metric.L2)
    val agg = FlatIndex.knnAgg(corpus, queries, 10, Metric.L2)
    assert(win.exceptAll(agg).count() == 0 && agg.exceptAll(win).count() == 0)
  }

  test("blocked kernel ≡ window top-k on real data (l2 and cosine)") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    for (m <- Seq(Metric.L2, Metric.Cosine)) {
      val win = FlatIndex.knn(corpus, queries, 10, m)
      val blocked = FlatIndex.knnBlocked(corpus, queries, 10, m)
      assert(win.exceptAll(blocked).count() == 0 && blocked.exceptAll(win).count() == 0,
        s"mismatch for metric ${m.name}")
    }
  }

  test("blocked table-ADC ≡ expression ADC for PQ") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = graft.index.PqIndex.trainDeterministic(corpus, 8, 16, Metric.L2)
    val codes = graft.index.PqIndex.encode(corpus, model)
    val expr = graft.index.PqIndex.knn(codes, model, queries, 10)
    val blocked = graft.index.PqIndex.knnBlocked(codes, model, queries, 10)
    assert(expr.exceptAll(blocked).count() == 0 && blocked.exceptAll(expr).count() == 0)
  }

  test("aggregator handles fewer candidates than k") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val agg = FlatIndex.knnAgg(corpus.limit(3), queries.limit(2), 10, Metric.L2)
    assert(agg.count() == 6) // 2 queries × 3 candidates
    assert(agg.groupBy("query_id").agg(max(col("rank")).as("m"))
      .where(col("m") =!= 3).count() == 0)
  }
}
