package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.queries.VectorQueries

/** Sharded HNSW (hnsw.go re-expressed): deterministic build, reference
  * search semantics per shard, cross-shard merge through BoundedTopK.
  */
class HnswIndexSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  test("level assignment is deterministic, non-negative, capped at 16") {
    val ls = (0L until 2000L).map(HnswIndex.levelOf(_, 16))
    assert(ls.forall(l => l >= 0 && l <= 16))
    assert(ls == (0L until 2000L).map(HnswIndex.levelOf(_, 16)))
    // the geometric draw should put the bulk of nodes at level 0
    assert(ls.count(_ == 0) > ls.length / 2)
  }

  test("build is deterministic: two builds produce identical graphs") {
    val (corpus, _) = vecs
    def snap() = HnswIndex.build(corpus, 4, Metric.L2)
      .select(col("shard"), col("id"), col("level"), col("edges"))
      .collect().map(_.toString).sorted.toSeq
    assert(snap() == snap())
  }

  test("knn result invariants: dense ranks, ascending distance, self-match") {
    val (corpus, queries) = vecs
    val graph = HnswIndex.build(corpus, 4, Metric.L2).cache()
    val res = HnswIndex.knnBlocked(graph, queries, 10, Metric.L2).cache()
    val counts = res.groupBy("query_id").agg(count(lit(1)).as("n"), max(col("rank")).as("mx"))
    assert(counts.where(col("n") =!= 10 || col("mx") =!= 10).count() == 0)
    val bad = res.alias("a").join(res.alias("b"),
      col("a.query_id") === col("b.query_id") &&
        col("a.rank") + 1 === col("b.rank") &&
        col("a.distance") > col("b.distance"))
    assert(bad.count() == 0)
    // each query is its own rank-1 neighbor (queries are corpus members)
    val r1 = res.where(col("rank") === 1)
    assert(r1.where(col("query_id") =!= col("neighbor_id") || col("distance") > 1e-9).count() == 0)
    res.unpersist(); graph.unpersist()
  }

  test("single shard, n < 2M, ef >= n: exhaustive — exactly equals flat search") {
    // With 30 nodes, layer-0 degree can never exceed 29 < 2M = 32, so no
    // pruning occurs, the graph stays connected, and ef-search with
    // ef >= n can never terminate early — the search is provably
    // exhaustive and must reproduce the brute-force ranking exactly.
    val (corpus, queries) = vecs
    val small = corpus.where(col("id") < 30)
    val graph = HnswIndex.build(small, 1, Metric.L2)
    val hnsw = HnswIndex.knnBlocked(graph, queries, 10, Metric.L2, efSearch = 200)
      .select("query_id", "neighbor_id", "rank")
    val flat = FlatIndex.knn(small, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    assert(hnsw.exceptAll(flat).count() == 0 && flat.exceptAll(hnsw).count() == 0)
  }

  test("exhaustive shard config equals flat search under cosine too") {
    // The metric threads through every graph comparison (build-side
    // neighbor selection, descent, ef-search) — the exhaustive-shard
    // argument is metric-independent, so cosine must also equal brute
    // force (mirrors the knn_hnsw_exact_cosine driver row).
    val (corpus, queries) = vecs
    val shards = math.max(1, (corpus.count() / 8).toInt)
    val graph = HnswIndex.build(corpus, shards, Metric.Cosine)
    val hnsw = HnswIndex.knnBlocked(graph, queries, 10, Metric.Cosine, efSearch = 200)
      .select("query_id", "neighbor_id", "rank")
    val flat = FlatIndex.knn(corpus, queries, 10, Metric.Cosine)
      .select("query_id", "neighbor_id", "rank")
    assert(hnsw.exceptAll(flat).count() == 0 && flat.exceptAll(hnsw).count() == 0)
  }

  test("sharded recall@10 vs flat oracle >= 0.95 at ef=200") {
    val (corpus, queries) = vecs
    val graph = HnswIndex.build(corpus, 4, Metric.L2).cache()
    val hnsw = HnswIndex.knnBlocked(graph, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id")
    val flat = FlatIndex.knn(corpus, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id")
    val nq = queries.count().toDouble
    val hits = hnsw.intersect(flat).count().toDouble
    assert(hits / (nq * 10) >= 0.95, s"recall ${hits / (nq * 10)}")
    graph.unpersist()
  }

  test("k <= 0 clamps to all rows ranked (flat.go:82-84 semantics)") {
    val (corpus, queries) = vecs
    val graph = HnswIndex.build(corpus, 4, Metric.L2)
    val n = corpus.count()
    val res = HnswIndex.knnBlocked(graph, queries.limit(1), 0, Metric.L2)
    assert(res.count() == n)
  }

  test("search works on a graph re-read from parquet (fromRows reload path)") {
    val (corpus, queries) = vecs
    val dir = java.nio.file.Files.createTempDirectory("hnsw_rt").toString
    HnswIndex.build(corpus, 4, Metric.L2).write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val a = HnswIndex.knnBlocked(reloaded, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    val b = HnswIndex.knnBlocked(HnswIndex.build(corpus, 4, Metric.L2), queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
