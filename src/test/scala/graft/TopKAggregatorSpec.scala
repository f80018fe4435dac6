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

  test("aggregator handles fewer candidates than k") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val agg = FlatIndex.knnAgg(corpus.limit(3), queries.limit(2), 10, Metric.L2)
    assert(agg.count() == 6) // 2 queries × 3 candidates
    assert(agg.groupBy("query_id").agg(max(col("rank")).as("m"))
      .where(col("m") =!= 3).count() == 0)
  }
}
