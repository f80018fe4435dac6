package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Metric, Validation}
import graft.index._
import graft.io.IndexIO
import graft.queries.VectorQueries

/** Incremental index maintenance on the persisted IVF kind: append new
  * vectors under the FROZEN trained model (the reference's add-after-
  * train staleness semantics — ivf.go:93-112: new vectors are assigned
  * with the existing centroids until an explicit re-train), remove ids
  * (P7 anti-join), re-save, re-open — search reflects both edits.
  */
class MaintenanceSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("IVF append (frozen model) + remove + re-open round-trip") {
    import spark.implicits._
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val path = Files.createTempDirectory("graft_maint").toString
    IndexIO.saveIvf(spark, path, model, IvfIndex.assign(corpus, model))

    // -- append: new vectors assigned with the frozen centroids --
    val (loaded, codes) = IndexIO.loadIvf(spark, path)
    assert(loaded.centroids == model.centroids, "re-open must not re-train")
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val fresh = corpus.limit(20)
      .select((col("id") + maxId + 1).as("id"), col("vec"))
    val appended = codes.unionByName(IvfIndex.assign(fresh, loaded))

    // -- remove: a slice of the original ids, via the P7 anti-join --
    val removed = corpus.limit(10).select(col("id"))
    val maintained = Validation.removeIds(appended, removed)

    val path2 = Files.createTempDirectory("graft_maint2").toString
    IndexIO.saveIvf(spark, path2, loaded, maintained)
    val (model2, codes2) = IndexIO.loadIvf(spark, path2)
    assert(model2.centroids == model.centroids)

    val total = corpus.count() + 20 - 10
    assert(codes2.count() == total, s"expected $total rows after append+remove")

    // removed ids can never surface; appended ids are searchable
    val res = IvfIndex.searchBlocked(codes2, model2, queries, 10, nprobe = 8).cache()
    val removedIds = removed.as[Long].collect().toSet
    assert(res.where(col("neighbor_id").isin(removedIds.toSeq: _*)).count() == 0,
      "removed ids surfaced in search results")
    // an exact-duplicate query of an appended vector must find it at rank 1
    val probe = fresh.limit(1).select(col("id"), col("vec")).first()
    val qdf = Seq((probe.getLong(0), probe.getSeq[Double](1))).toDF("query_id", "qvec")
    val hit = IvfIndex.searchBlocked(codes2, model2, qdf, 1, nprobe = 1).first()
    assert(hit.getLong(1) == probe.getLong(0) && hit.getDouble(2) == 0.0,
      s"appended vector not served back: $hit")
    res.unpersist()
  }

  test("HNSW add rebuilds only affected shards, bit-identical to a full build") {
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    // fresh ids land on a strict subset of shards; base keeps the rest
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val base = corpus.where(col("id") % 4 =!= 1 || col("id") <= maxId / 2)
    val fresh = corpus.where(col("id") % 4 === 1 && col("id") > maxId / 2)
    assert(fresh.count() > 0)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("id"), col("level"), col("edges"))
      .collect().map(_.toString).sorted.toSeq
    val incremental = HnswIndex.add(
      HnswIndex.build(base, 4, Metric.L2), fresh, 4, Metric.L2)
    val full = HnswIndex.build(corpus, 4, Metric.L2)
    assert(snap(incremental) == snap(full))
  }

  test("addToHnsw: same arithmetic stamp → touched-shard add; stale stamp → " +
      "full rebuild with current arithmetic; sidecar re-stamped either way") {
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val base = corpus.where(col("id") % 4 =!= 1 || col("id") <= maxId / 2)
    val fresh = corpus.where(col("id") % 4 === 1 && col("id") > maxId / 2)
    assert(fresh.count() > 0)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("id"), col("level"), col("edges"))
      .collect().map(_.toString).sorted.toSeq
    val fullSnap = snap(HnswIndex.build(corpus, 4, Metric.L2))

    // current stamp: the guarded path IS HnswIndex.add — bit-identical
    val path1 = Files.createTempDirectory("graft_hnsw_arith1").toString
    IndexIO.saveHnsw(spark, path1, HnswIndex.build(base, 4, Metric.L2), Metric.L2)
    assert(IndexIO.readMeta(path1)("graph_arithmetic") ==
      HnswIndex.ArithmeticVersion.toString)
    IndexIO.addToHnsw(spark, path1, fresh)
    assert(snap(IndexIO.loadHnsw(spark, path1)._2) == fullSnap)

    // stale stamp (a pre-walkKeyScalar engine's sidecar): must NOT run
    // the touched-shard path — full rebuild with current arithmetic,
    // i.e. still ≡ build(old ∪ new), and the sidecar is re-stamped
    val path2 = Files.createTempDirectory("graft_hnsw_arith2").toString
    IndexIO.saveHnsw(spark, path2, HnswIndex.build(base, 4, Metric.L2), Metric.L2)
    val meta2 = IndexIO.readMeta(path2)
    IndexIO.writeMeta(path2, meta2 + ("graph_arithmetic" -> "1"))
    IndexIO.addToHnsw(spark, path2, fresh)
    assert(snap(IndexIO.loadHnsw(spark, path2)._2) == fullSnap)
    assert(IndexIO.readMeta(path2)("graph_arithmetic") ==
      HnswIndex.ArithmeticVersion.toString, "sidecar not re-stamped")
  }

  test("OPQ append (frozen rotation+codebooks) + re-open: appended vector served back") {
    import spark.implicits._
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = OpqIndex.train(corpus, 8, nbits = 4, Metric.L2)
    val path = Files.createTempDirectory("graft_opq_maint").toString
    IndexIO.saveOpq(spark, path, model, OpqIndex.encode(corpus, model))

    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val fresh = corpus.limit(5).select((col("id") + maxId + 1).as("id"), col("vec"))
    graft.streaming.EventPipeline.appendBatchToOpq(model, path)(fresh, 0L)

    val (loaded, codes) = IndexIO.loadOpq(spark, path)
    assert(loaded == model, "append must not alter the frozen model")
    assert(codes.count() == corpus.count() + 5)
    // the appended row duplicates an original vector (same vec, new id):
    // identical codes → identical ADC distance → the original's lower id
    // wins rank 1, so the appended id must appear in the top-2 tie pair
    val probe = fresh.limit(1).first()
    val qdf = Seq((probe.getLong(0), probe.getSeq[Double](1))).toDF("query_id", "qvec")
    val top2 = OpqIndex.knnBlocked(codes, loaded, qdf, 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(top2.contains(probe.getLong(0)),
      s"appended vector not served back in the duplicate tie pair: $top2")
  }

  test("BQ append (frozen thresholds) + re-open: appended vector in the duplicate tie pair") {
    import spark.implicits._
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = BqIndex.train(corpus, Metric.L2)
    val path = Files.createTempDirectory("graft_bq_maint").toString
    IndexIO.saveBq(spark, path, model, BqIndex.encode(corpus, model))

    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val fresh = corpus.limit(5).select((col("id") + maxId + 1).as("id"), col("vec"))
    graft.streaming.EventPipeline.appendBatchToBq(model, path)(fresh, 0L)

    val (loaded, codes) = IndexIO.loadBq(spark, path)
    assert(loaded == model)
    assert(codes.count() == corpus.count() + 5)
    val probe = fresh.limit(1).first()
    val qdf = Seq((probe.getLong(0), probe.getSeq[Double](1))).toDF("query_id", "qvec")
    val top2 = BqIndex.knnBlocked(codes, loaded, qdf, 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(top2.contains(probe.getLong(0)),
      s"appended vector not served back in the duplicate tie pair: $top2")
  }

  test("routed-HNSW append rebuilds only the routed shards, search serves the new rows") {
    import spark.implicits._
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val base = corpus.where(col("id") <= maxId - 10)
    val fresh = corpus.where(col("id") > maxId - 10)
    val model = RoutedHnswIndex.train(base, nlist = 4, Metric.L2, targetShardRows = 64)
    val path = Files.createTempDirectory("graft_routed_maint").toString
    IndexIO.saveRoutedHnsw(spark, path, model, RoutedHnswIndex.build(base, model))

    graft.streaming.EventPipeline.appendBatchToRoutedHnsw(model, path)(fresh, 0L)

    val (loaded, graph) = IndexIO.loadRoutedHnsw(spark, path)
    assert(loaded == model)
    assert(graph.count() == corpus.count())
    // incremental result is bit-identical to a full routed build (shard
    // graphs depend only on their own rows + deterministic levels)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("id"), col("level"), col("edges"))
      .collect().map(_.toString).sorted.toSeq
    assert(snap(graph) == snap(RoutedHnswIndex.build(corpus, model)))
    // appended vectors are served back through the routed query path
    val probe = fresh.limit(1).first()
    val qdf = Seq((probe.getLong(0), probe.getSeq[Double](1))).toDF("query_id", "qvec")
    val hit = RoutedHnswIndex.knn(graph, loaded, qdf, 1, probeRegions = 1).first()
    assert(hit.getLong(1) == probe.getLong(0),
      s"appended vector not found by routed search: $hit")
  }

  test("routed-HNSW rebalance: drift detected, changed regions rebuilt bit-identical " +
      "to a from-scratch build, untouched regions byte-moved, no-op when balanced") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    // "yesterday": train + split on the first half, then the graph indexes
    // the FULL corpus under the frozen model (the post-append state)
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val base = corpus.where(col("id") <= maxId / 2)
    val target = 32L
    val cents = Centroids.kMeans(base, 4, metric = Metric.L2)
    val baseSizes = base
      .select(Centroids.nearest(col("vec"), cents, Metric.L2).as("c"))
      .groupBy("c").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val frozenSub = (0 until 4).map(c =>
      math.max(1L, (baseSizes.getOrElse(c, 0L) + target - 1) / target).toInt)
    val frozen = RoutedHnswModel(cents, frozenSub, Metric.L2)
    val grown = RoutedHnswIndex.build(corpus, frozen).cache(); grown.count()

    // drift is real: doubling the corpus must move at least one region's split
    val report = RoutedHnswIndex.driftReport(grown, frozen, target).collect()
    assert(report.length == 4 && report.map(_.getLong(1)).sum == corpus.count())
    assert(report.exists(_.getString(4) == "resplit"), "doubling the corpus produced no drift")
    report.foreach { r =>
      assert(r.getInt(2) == frozenSub(r.getInt(0)), "sub_frozen must echo the model")
      val want = math.max(1L, (r.getLong(1) + target - 1) / target).toInt
      assert(r.getInt(3) == want, s"sub_required ${r.getInt(3)} != ceil(n/target) $want")
    }

    val (nm, rebal) = RoutedHnswIndex.rebalance(grown, frozen, target)
    assert(nm.centroids == frozen.centroids, "rebalance must not retrain centroids")
    assert(nm.subShards != frozen.subShards, "rebalance must refresh the splits")
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("id"), col("level"), col("edges"))
      .collect().map(_.toString).sorted.toSeq
    assert(snap(rebal) == snap(RoutedHnswIndex.build(corpus, nm)),
      "rebalanced graph differs from a from-scratch build under the new model")
    // the refreshed index serves exactly like the fresh one
    val a = RoutedHnswIndex.knn(rebal, nm, queries, 5, probeRegions = 2)
      .collect().map(_.toString).sorted
    val b = RoutedHnswIndex.knn(RoutedHnswIndex.build(corpus, nm), nm, queries, 5,
      probeRegions = 2).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // a balanced graph is a no-op (same model instance, graph untouched)
    val (nm2, same) = RoutedHnswIndex.rebalance(rebal, nm, target)
    assert((nm2 eq nm) && (same eq rebal), "balanced rebalance must be a no-op")

    // replicated graphs rebalance through the same path: region identity
    // comes from the stored shard (closure assignment), and the result
    // equals a from-scratch replicated build under the refreshed model
    val rep = RoutedHnswIndex.buildReplicated(corpus, frozen, eps = 0.4, maxReplicas = 2)
    val (nmR, rebalR) = RoutedHnswIndex.rebalance(rep, frozen, target)
    assert(snap(rebalR) == snap(RoutedHnswIndex.buildReplicated(corpus, nmR,
      eps = 0.4, maxReplicas = 2)),
      "replicated rebalance differs from a fresh replicated build")
    grown.unpersist()
  }

  test("PLAID append under the frozen quantizer equals a from-scratch rebuild " +
      "on the union, and appended docs surface as candidates") {
    val d = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val old = d.where(col("doc_id") % 2 === 0)
    val fresh = d.where(col("doc_id") % 2 =!= 0)
    // train on the OLD corpus only — the frozen-model staleness rule
    val model = PlaidIndex.train(old, 24, 2)
    val appended = PlaidIndex.build(old, model)
      .unionByName(PlaidIndex.append(fresh, model))
    val rebuilt = PlaidIndex.build(d, model)
    assert(appended.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(appended).count() == 0,
      "append(new) ∪ build(old) must be row-identical to build(old ∪ new)")
    // an appended (odd-id) doc must be reachable as a candidate
    val q = d.where(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))
    val cands = PlaidIndex.candidates(appended, q, model, 20)
    assert(cands.where(col("id") % 2 =!= 0).count() > 0,
      "appended docs must surface through the posting probe")
    // the persisted streaming path lands the same rows inside the
    // centroid-partitioned layout
    val path = Files.createTempDirectory("graft_plaid_app").toString
    IndexIO.savePlaid(spark, path, PlaidIndex.build(old, model), model)
    graft.streaming.EventPipeline.appendBatchToPlaid(model, path)(fresh, 0L)
    val (loaded, _) = IndexIO.loadPlaid(spark, path)
    assert(loaded.exceptAll(rebuilt).count() == 0 &&
      rebuilt.exceptAll(loaded).count() == 0,
      "streamed append must be row-identical to the from-scratch build")
  }

  test("HNSW remove drops nodes and dangling edges; search skips them") {
    import spark.implicits._
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val graph = HnswIndex.build(corpus, 4, Metric.L2)
    // remove every current max-level node too, forcing the entry-point
    // fallback recompute (hnsw.go:226-238 semantics via fromRows)
    val topLevel = graph.agg(max(col("level"))).first().getInt(0)
    val topIds = graph.where(col("level") === topLevel)
      .select("id").as[Long].collect().toSeq
    val removedIds = (topIds ++ Seq(0L, 1L, 2L)).distinct
    val pruned = HnswIndex.remove(graph, removedIds)
    assert(pruned.where(col("id").isin(removedIds: _*)).count() == 0)
    val dangling = pruned.select(explode(flatten(col("edges"))).as("dst"))
      .where(col("dst").isin(removedIds: _*))
    assert(dangling.count() == 0, "edges still point at removed nodes")
    val res = HnswIndex.knnBlocked(pruned, queries, 10, Metric.L2).cache()
    assert(res.where(col("neighbor_id").isin(removedIds: _*)).count() == 0)
    assert(res.groupBy("query_id").count().where(col("count") =!= 10).count() == 0)
    res.unpersist()
  }

  test("HnswServer.searchBatch is result-identical to knnBlocked") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val graph = HnswIndex.build(corpus, 4, Metric.L2).cache()
    val server = new graft.query.HnswServer(graph, Metric.L2).warm()
    val warm = server.searchBatch(queries, 10)
      .select(col("query_id"), col("neighbor_id"), col("distance"), col("rank"))
    val cold = HnswIndex.knnBlocked(graph, queries, 10, Metric.L2)
      .select(col("query_id"), col("neighbor_id"), col("distance"), col("rank"))
    assert(warm.exceptAll(cold).count() == 0 && cold.exceptAll(warm).count() == 0)
    server.unpersist(); graph.unpersist()
  }

  test("HnswServer single-query serving is rank-identical to knnBlocked") {
    import spark.implicits._
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val graph = HnswIndex.build(corpus, 4, Metric.L2).cache()
    val server = new graft.query.HnswServer(graph, Metric.L2).warm()
    val expected = HnswIndex.knnBlocked(graph, queries, 10, Metric.L2)
      .select(col("query_id"), col("neighbor_id"), col("distance"), col("rank"))
      .collect().groupBy(_.getLong(0))
    queries.collect().foreach { q =>
      val qid = q.getLong(0)
      val got = server.search(q.getSeq[Double](1).toArray, 10)
      val exp = expected(qid).sortBy(_.getInt(3))
        .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
      assert(got.toSeq == exp, s"query $qid served mismatch")
    }
    server.unpersist(); graph.unpersist()
  }
}
