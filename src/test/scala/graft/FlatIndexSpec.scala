package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.queries.VectorQueries

/** Result-validity invariants (testutils/helpers.go:193-212) and
  * oracle-recall properties of the index family on driver testdata.
  */
class FlatIndexSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  test("flat kNN result invariants: finite, non-negative, ascending, dense ranks") {
    val (corpus, queries) = vecs
    val res = FlatIndex.knn(corpus, queries, 10, Metric.L2).cache()
    assert(res.where(col("distance").isNaN || col("distance") < 0).count() == 0)
    // ascending by rank within each query
    val bad = res.alias("a").join(res.alias("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rank") + 1 === col("b.rank") &&
        col("a.distance") > col("b.distance"))
    assert(bad.count() == 0)
    // dense 1..k ranks per query
    val counts = res.groupBy("query_id").agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
    assert(counts.where(col("n") =!= 10 || col("mx") =!= 10).count() == 0)
    res.unpersist()
  }

  test("self-match: each query's rank-1 neighbor is itself at distance 0") {
    val (corpus, queries) = vecs
    val r1 = FlatIndex.knn(corpus, queries, 10, Metric.L2).where(col("rank") === 1)
    assert(r1.where(col("query_id") =!= col("neighbor_id") || col("distance") > 1e-9).count() == 0)
  }

  test("k clamp: k > n returns n results (flat.go:82-84)") {
    val (corpus, queries) = vecs
    val n = corpus.count()
    val res = FlatIndex.knn(corpus, queries.limit(1), (n + 100).toInt, Metric.L2)
    assert(res.count() == n)
  }

  test("IVF with nprobe = nlist equals flat search (exhaustive probe)") {
    val (corpus, queries) = vecs
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val ivf = IvfIndex.knn(corpus, model, queries, 10, nprobe = 8)
      .select("query_id", "neighbor_id", "rank")
    val flat = FlatIndex.knn(corpus, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    assert(ivf.exceptAll(flat).count() == 0 && flat.exceptAll(ivf).count() == 0)
  }

  test("MLlib-trained IVF recall@10 vs flat oracle is reasonable at nprobe=4/16") {
    val (corpus, queries) = vecs
    val model = IvfIndex.train(corpus, 16, Metric.L2)
    val ivf = IvfIndex.knn(corpus, model, queries, 10, nprobe = 4)
      .select("query_id", "neighbor_id")
    val flat = FlatIndex.knn(corpus, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id")
    val hits = ivf.join(flat, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / flat.count()
    assert(recall >= 0.3, s"recall $recall unexpectedly low") // ref IVF@nprobe10/316: 0.26
  }

  test("PQ ADC distances approximate true distances (compression tradeoff)") {
    val (corpus, queries) = vecs
    val model = PqIndex.trainDeterministic(corpus, 8, 16, Metric.L2)
    val codes = PqIndex.encode(corpus, model)
    // every code entry within [0, ksub)
    val flat = codes.select(explode(col("code")).as("c"))
    assert(flat.where(col("c") < 0 || col("c") >= 16).count() == 0)
    val pq = PqIndex.knn(codes, model, queries, 10)
      .select("query_id", "neighbor_id")
    val truth = FlatIndex.knn(corpus, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id")
    val recall = pq.join(truth, Seq("query_id", "neighbor_id")).count().toDouble / truth.count()
    assert(recall >= 0.15, s"PQ recall $recall below reference-class floor") // ref PQ: 0.197
  }

  test("range search returns exactly the pairs within threshold") {
    val (corpus, queries) = vecs
    val res = FlatIndex.rangeSearch(corpus, queries, 1.2, Metric.L2)
    assert(res.where(col("distance") > 1.2).count() == 0)
    // cross-check count against a direct filter
    val direct = corpus.crossJoin(broadcast(queries))
      .where(graft.functions.VectorFunctions.l2(col("qvec"), col("vec")) <= 1.2)
    assert(res.count() == direct.count())
  }
}
