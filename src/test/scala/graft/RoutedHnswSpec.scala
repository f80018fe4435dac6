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

  test("replication: closure regions always lead with the nearest, count <= maxReplicas, " +
      "eps=0 degenerates to single assignment") {
    val (corpus, _) = vecs
    val regions = corpus.select(col("id"), col("vec"),
      RoutedHnswIndex.regionsExpr(model, eps = 0.3, maxReplicas = 3).as("rs"))
    val nearest = corpus.select(col("id"),
      Centroids.nearest(col("vec"), model.centroids, model.metric).as("c"))
    val joined = regions.join(nearest, "id").collect()
    joined.foreach { r =>
      val rs = r.getSeq[Int](2)
      assert(rs.nonEmpty && rs.length <= 3, s"replica count ${rs.length} out of [1,3]")
      assert(rs.head == r.getInt(3),
        s"id ${r.getLong(0)}: closure head ${rs.head} != nearest region ${r.getInt(3)}")
      assert(rs.distinct.length == rs.length, "duplicate region in closure set")
    }
    // replication actually fires at this eps on random vectors
    assert(joined.exists(_.getSeq[Int](2).length > 1),
      "eps=0.3 produced no boundary replicas — the closure rule is dead")
    // eps=0 keeps only exact ties → same row set as the plain build
    val g0 = RoutedHnswIndex.buildReplicated(corpus, model, eps = 0.0, maxReplicas = 3)
    assert(g0.select("shard", "id").exceptAll(graph.select("shard", "id")).count() == 0 &&
      graph.select("shard", "id").exceptAll(g0.select("shard", "id")).count() == 0,
      "eps=0 replicated build differs from single assignment")
  }

  test("replicated graph, exhaustive configuration: equals brute force — exactly K " +
      "distinct rows per query (the dedup contract)") {
    val (corpus, queries) = vecs
    val rep = RoutedHnswIndex.buildReplicated(corpus, model, eps = 0.4, maxReplicas = 3)
    val routed = RoutedHnswIndex.knn(rep, model, queries, K,
      probeRegions = model.nlist, efSearch = 256)
      .select(col("query_id"), col("neighbor_id"), round(col("distance"), 9).as("d"), col("rank"))
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2)
      .select(col("query_id"), col("neighbor_id"), round(col("distance"), 9).as("d"), col("rank"))
    assert(routed.exceptAll(flat).count() == 0 && flat.exceptAll(routed).count() == 0,
      "replicated exhaustive != brute force (duplicate leak or dedup over-drop)")
  }

  test("replication lifts recall at fixed R on clustered data (candidate superset " +
      "under exhaustive per-shard walks)") {
    val n = 512
    val all = graft.core.VectorGen.clustered(spark, n + 32, 16, 8, spread = 0.6, seed = 11L)
    val corpus = all.where(col("id") < n).cache()
    val queries = all.where(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache()
    val m = RoutedHnswIndex.train(corpus, nlist = 8, Metric.L2, targetShardRows = 128)
    val plain = RoutedHnswIndex.build(corpus, m)
    val rep = RoutedHnswIndex.buildReplicated(corpus, m, eps = 0.5, maxReplicas = 2)
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2).select("query_id", "neighbor_id")
    val denom = flat.count().toDouble
    def recall(g: org.apache.spark.sql.DataFrame, r: Int): Double =
      RoutedHnswIndex.knn(g, m, queries, K, probeRegions = r, efSearch = 256)
        .select("query_id", "neighbor_id").intersect(flat).count() / denom
    Seq(1, 2).foreach { r =>
      val (rp, rr) = (recall(plain, r), recall(rep, r))
      assert(rr >= rp - 1e-9,
        s"R=$r: replicated recall $rr below single-assignment $rp")
    }
    // at R=1 the boundary mass is exactly what replication recovers —
    // demand a real lift, not just parity
    assert(recall(rep, 1) > recall(plain, 1),
      "eps=0.5 replication produced zero recall lift at R=1 on clustered data")
    corpus.unpersist(); queries.unpersist()
  }

  test("in-process routed serving on a replicated graph equals the distributed knn") {
    val (corpus, queries) = vecs
    val rep = RoutedHnswIndex.buildReplicated(corpus, model, eps = 0.4, maxReplicas = 3)
    val server = new graft.query.LocalRoutedHnswServer(rep, model)
    val want = RoutedHnswIndex.knn(rep, model, queries, K, probeRegions = 2, efSearch = 256)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(t => (t._2, t._3)).sortBy(_._2).toSeq }
    queries.collect().take(5).foreach { r =>
      val qid = r.getLong(0)
      val got = server.search(r.getSeq[Double](1).toArray, K, probeRegions = 2,
        efSearch = 256).map(t => (t._1, t._3)).toSeq
      assert(got == want(qid), s"replicated serving mismatch for query $qid")
    }
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

  test("distributed routed server: single-query and warm-batch paths equal the " +
      "cold batch knn and the in-process server, incl. on a replicated graph") {
    val (corpus, queries) = vecs
    Seq(
      graph,
      RoutedHnswIndex.buildReplicated(corpus, model, eps = 0.4, maxReplicas = 3)
    ).foreach { g =>
      val server = new graft.query.RoutedHnswServer(g, model).warm()
      val local = new graft.query.LocalRoutedHnswServer(g, model)
      val cold = RoutedHnswIndex.knn(g, model, queries, K, probeRegions = 2,
        efSearch = 256)
      // warm batch ≡ cold batch, row-exact
      val warm = server.searchBatch(queries, K, probeRegions = 2, efSearch = 256)
      assert(warm.exceptAll(cold).count() == 0 && cold.exceptAll(warm).count() == 0,
        "warm-batch routed serving differs from the cold batch knn")
      // single-query ≡ both, per query
      val want = cold.collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).toSeq }
      queries.collect().take(5).foreach { r =>
        val qid = r.getLong(0); val q = r.getSeq[Double](1).toArray
        val dist = server.search(q, K, probeRegions = 2, efSearch = 256)
          .map(t => (t._1, t._3)).toSeq
        val loc = local.search(q, K, probeRegions = 2, efSearch = 256)
          .map(t => (t._1, t._3)).toSeq
        assert(dist == want(qid), s"query $qid: distributed server != batch knn")
        assert(dist == loc, s"query $qid: distributed server != local server")
      }
      server.unpersist()
    }
  }

  test("bridged clustered data: the R dial strictly climbs (r8 flat-dial regression)") {
    // clusteredBridged puts a quarter of the points on the segments
    // between ring-adjacent cluster centers, so a router probing more
    // regions MUST recover strictly more true neighbors — the property
    // the bench's hnsw_routed_c_r* rows exist to measure, asserted here
    // strictly (the r8 1M artifact's plain-clustered rows were exactly
    // flat in R, which this generator + assert combination forbids).
    val n = 1536
    val all = graft.core.VectorGen.clusteredBridged(
      spark, n + 48, 16, 8, spread = 0.3, bridgeFrac = 0.25, seed = 23L)
    val corpus = all.where(col("id") < n).cache()
    val queries = all.where(col("id") >= n)
      .select(col("id").as("query_id"), col("vec").as("qvec")).cache()
    val m = RoutedHnswIndex.train(corpus, nlist = 8, Metric.L2, targetShardRows = 256)
    val g = RoutedHnswIndex.build(corpus, m)
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2).select("query_id", "neighbor_id")
    val denom = flat.count().toDouble
    val recalls = Seq(1, 2, 4).map { r =>
      RoutedHnswIndex.knn(g, m, queries, K, probeRegions = r, efSearch = 256)
        .select("query_id", "neighbor_id").intersect(flat).count() / denom
    }
    assert(recalls(0) < recalls(1) && recalls(1) < recalls(2),
      s"R dial not strictly increasing on bridged clusters: $recalls")
    corpus.unpersist(); queries.unpersist()
  }

  test("deriveTargetShardRows: clamped, heap-monotone, and below default at small heaps") {
    val d = RoutedHnswIndex.deriveTargetShardRows(128, m = 16,
      cores = 32, heapBytes = 4L << 30)
    assert(d >= 1000L && d <= RoutedHnswIndex.DefaultTargetShardRows)
    // 4 GB over 32 cores cannot host 250k-row graphs at 128d
    assert(d < RoutedHnswIndex.DefaultTargetShardRows,
      s"4 GB/32-core derivation returned the unclamped default ($d)")
    val big = RoutedHnswIndex.deriveTargetShardRows(128, m = 16,
      cores = 32, heapBytes = 512L << 30)
    assert(big >= d, "derived shard rows not monotone in heap")
    assert(RoutedHnswIndex.deriveTargetShardRows(128, m = 16,
      cores = 32, heapBytes = 1L << 20) == 1000L, "tiny heap must clamp to the floor")
  }
}
