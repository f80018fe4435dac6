package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.queries.VectorQueries

/** Routed sharded HNSW (VERDICT r7 #1): shard placement by k-means
  * region + balance split, query fan-out bounded to the top-R regions.
  * Exhaustive-configuration equality, recall-vs-R monotonicity, the
  * probed-region containment property, balance bounds, and the scan
  * pruning that makes O(R) per-query cost real.
  */
class RoutedHnswSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)
  private val K = 10

  private lazy val model =
    RoutedHnswIndex.train(vecs._1, nlist = 4, Metric.L2, targetShardRows = 64)
  private lazy val graph = {
    val g = RoutedHnswIndex.build(vecs._1, model).cache(); g.count(); g
  }

  test("model: balance split covers every region, offsets partition the shard space") {
    assert(model.nlist == 4)
    assert(model.subShards.forall(_ >= 1))
    assert(model.numShards == model.subShards.sum)
    val all = (0 until model.nlist).flatMap(model.shardsOfRegion)
    assert(all == (0 until model.numShards), s"shard ids not contiguous: $all")
  }

  test("build: every row lands in its vector's region, no shard exceeds ~2x target") {
    val (corpus, _) = vecs
    val n = corpus.count()
    assert(graph.count() == n)
    // shard → region containment: each node's shard must belong to the
    // region its vector is nearest to
    val regionOf = corpus
      .select(col("id"), Centroids.nearest(col("vec"), model.centroids, model.metric).as("c"))
    val offsets = model.offsets
    val bad = graph.select(col("shard"), col("id")).join(regionOf, "id")
      .collect().count { r =>
        val shard = r.getInt(1); val c = r.getInt(2)
        !(shard >= offsets(c) && shard < offsets(c) + model.subShards(c))
      }
    assert(bad == 0, s"$bad nodes sharded outside their k-means region")
    // balance: the id-hash split keeps physical shards near target size
    val sizes = graph.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.sum == n)
    assert(sizes.max <= 2 * 64, s"shard of ${sizes.max} rows blows the 64-row target")
  }

  test("exhaustive configuration (R = nlist, ef >= shard size) equals brute force") {
    val (corpus, queries) = vecs
    val routed = RoutedHnswIndex.knn(graph, model, queries, K,
      probeRegions = model.nlist, efSearch = 256)
      .select(col("query_id"), col("neighbor_id"), round(col("distance"), 9).as("d"), col("rank"))
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2)
      .select(col("query_id"), col("neighbor_id"), round(col("distance"), 9).as("d"), col("rank"))
    assert(routed.exceptAll(flat).count() == 0 && flat.exceptAll(routed).count() == 0)
  }

  test("every routed neighbor comes from a probed region; recall grows with R " +
      "and the R dial is monotone to exact") {
    val (corpus, queries) = vecs
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2)
      .select("query_id", "neighbor_id")
    val regionOf = corpus
      .select(col("id"), Centroids.nearest(col("vec"), model.centroids, model.metric).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qs = queries.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val recalls = Seq(1, 2, 4).map { r =>
      val res = RoutedHnswIndex.knn(graph, model, queries, K, probeRegions = r,
        efSearch = 256)
      // containment: a neighbor outside the query's top-r regions can
      // only mean the routing gate leaked
      val probedRegions = qs.map { case (qid, q) =>
        qid -> RoutedHnswIndex.probeShards(q, model, r)
          .map(s => model.offsets.lastIndexWhere(_ <= s)).toSet
      }.toMap
      res.collect().foreach { row =>
        val qid = row.getLong(0); val nid = row.getLong(1)
        assert(probedRegions(qid).contains(regionOf(nid)),
          s"query $qid neighbor $nid from unprobed region ${regionOf(nid)} at R=$r")
      }
      val hits = res.select("query_id", "neighbor_id").intersect(flat).count()
      hits.toDouble / flat.count()
    }
    assert(recalls(0) <= recalls(1) + 1e-9 && recalls(1) <= recalls(2) + 1e-9,
      s"recall not monotone in R: $recalls")
    assert(recalls(2) >= 0.999, s"full-probe recall ${recalls(2)} below exact")
    assert(recalls(0) >= 0.2, s"R=1 recall ${recalls(0)} implausibly low")
  }

  test("probe pruning reaches the scan: unprobed shards are filtered before the shuffle") {
    val (_, queries) = vecs
    val one = queries.limit(1)
    val df = RoutedHnswIndex.knn(graph, model, one, K, probeRegions = 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("shard"), s"expected a shard filter in:\n$plan")
    // the single query probes exactly one region's sub-shards
    val q = one.collect().head.getSeq[Double](1).toArray
    val probed = RoutedHnswIndex.probeShards(q, model, 1)
    assert(probed.length < model.numShards,
      "R=1 must not touch the whole shard space")
  }

  test("routed results are deterministic for a fixed model") {
    val (_, queries) = vecs
    val a = RoutedHnswIndex.knn(graph, model, queries, K, probeRegions = 2).collect()
    val b = RoutedHnswIndex.knn(graph, model, queries, K, probeRegions = 2).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("k <= 0 clamps to the engine-wide brute-force path") {
    val (corpus, queries) = vecs
    val all = RoutedHnswIndex.knn(graph, model, queries, 0, probeRegions = 2)
    assert(all.count() == corpus.count() * queries.count())
  }

  test("save -> open -> facade search round trip equals the direct routed knn") {
    val (_, queries) = vecs
    val dir = java.nio.file.Files.createTempDirectory("graft-routed").toString
    graft.io.IndexIO.saveRoutedHnsw(spark, dir, model, graph)

    val meta = graft.io.IndexIO.readMeta(dir)
    assert(meta("index_type") == "hnsw_routed")
    assert(meta("nlist") == model.nlist.toString)
    assert(meta("num_shards") == model.numShards.toString)

    // loaded model is value-identical (routing is fully reproducible)
    val (loaded, _) = graft.io.IndexIO.loadRoutedHnsw(spark, dir)
    assert(loaded.centroids == model.centroids &&
      loaded.subShards == model.subShards && loaded.metric == model.metric)

    val searcher = graft.query.Searcher.open(spark, dir)
      .withK(K).withNprobe(2).withEfSearch(HnswIndex.EfSearch)
    val got = searcher.search(queries)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toString).sorted
    val want = RoutedHnswIndex.knn(graph, model, queries, K, probeRegions = 2)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toString).sorted
    assert(got.sameElements(want))
    searcher.close()
  }
}
