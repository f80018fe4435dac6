package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.query._
import graft.queries.VectorQueries

/** The in-process serving mode must be result-IDENTICAL to the
  * distributed ServingRdd siblings for every kind it covers — the two
  * paths share the packers and the scalar kernels; these specs pin that
  * the collected-blocks scan and the common-pool parallel merge change
  * nothing (same (rank_key, id) total order end to end).
  */
class LocalServeSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)
  private val K = 10

  private def queriesArr = vecs._2.collect()
    .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

  test("LocalFlatServer ≡ FlatIndex.knnBlocked across all four metrics") {
    val (corpus, queries) = vecs
    for (m <- Seq(Metric.L2, Metric.Cosine, Metric.Dot, Metric.Manhattan)) {
      val local = new LocalFlatServer(corpus, m)
      val batch = FlatIndex.knnBlocked(corpus, queries, K, m)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3))))
        .groupBy(_._1)
      queriesArr.foreach { case (qid, q) =>
        val served = local.search(q, K).toSeq
        val expected = batch(qid).map(_._2).sortBy(_._3).toSeq
        assert(served == expected, s"metric ${m.name} query $qid")
      }
    }
  }

  test("LocalIvfServer ≡ IvfServer") {
    val (corpus, _) = vecs
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val assigned = IvfIndex.assign(corpus, model)
    val dist = new IvfServer(assigned, model).warm()
    val local = new LocalIvfServer(assigned, model)
    queriesArr.foreach { case (qid, q) =>
      assert(local.search(q, K, nprobe = 3).toSeq == dist.search(q, K, nprobe = 3).toSeq,
        s"query $qid")
    }
    dist.unpersist()
  }

  test("LocalLshServer ≡ LshServer at both hamming radii") {
    val (corpus, _) = vecs
    val planes = 8
    val indexed = LshIndex.index(corpus, planes)
    val dist = new LshServer(indexed, planes, Metric.L2).warm()
    val local = new LocalLshServer(indexed, planes, Metric.L2)
    for (h <- Seq(0, 1); (qid, q) <- queriesArr)
      assert(local.search(q, K, h).toSeq == dist.search(q, K, h).toSeq,
        s"query $qid hamming $h")
    dist.unpersist()
  }

  test("LocalPqServer ≡ PqServer") {
    val (corpus, _) = vecs
    val model = PqIndex.trainDeterministic(corpus, m = 4, ksub = 16, Metric.L2)
    val codes = PqIndex.encode(corpus, model)
    val dist = new PqServer(codes, model).warm()
    val local = new LocalPqServer(codes, model)
    queriesArr.foreach { case (qid, q) =>
      assert(local.search(q, K).toSeq == dist.search(q, K).toSeq, s"query $qid")
    }
    dist.unpersist()
  }

  test("LocalSq8Server ≡ Sq8Server") {
    val (corpus, _) = vecs
    val model = Sq8Index.train(corpus, Metric.L2)
    val codes = Sq8Index.encode(corpus, model)
    val dist = new Sq8Server(codes, model).warm()
    val local = new LocalSq8Server(codes, model)
    queriesArr.foreach { case (qid, q) =>
      assert(local.search(q, K).toSeq == dist.search(q, K).toSeq, s"query $qid")
    }
    dist.unpersist()
  }

  test("searchBatch ≡ search per query for every scan kind (flat/ivf/pq/sq8/bq)") {
    val (corpus, _) = vecs
    val qs = queriesArr.map(_._2)
    locally {
      val flat = new LocalFlatServer(corpus, Metric.L2)
      val out = flat.searchBatch(qs, K)
      qs.indices.foreach(i => assert(out(i).toSeq == flat.search(qs(i), K).toSeq))
    }
    locally {
      val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
      val ivf = new LocalIvfServer(IvfIndex.assign(corpus, model), model)
      val out = ivf.searchBatch(qs, K, nprobe = 3)
      qs.indices.foreach(i => assert(out(i).toSeq == ivf.search(qs(i), K, nprobe = 3).toSeq))
    }
    locally {
      val model = PqIndex.trainDeterministic(corpus, m = 4, ksub = 16, Metric.L2)
      val pq = new LocalPqServer(PqIndex.encode(corpus, model), model)
      val out = pq.searchBatch(qs, K)
      qs.indices.foreach(i => assert(out(i).toSeq == pq.search(qs(i), K).toSeq))
    }
    locally {
      val model = Sq8Index.train(corpus, Metric.L2)
      val sq8 = new LocalSq8Server(Sq8Index.encode(corpus, model), model)
      val out = sq8.searchBatch(qs, K)
      qs.indices.foreach(i => assert(out(i).toSeq == sq8.search(qs(i), K).toSeq))
    }
    locally {
      val model = BqIndex.train(corpus, Metric.L2)
      val bq = new LocalBqServer(BqIndex.encode(corpus, model), model)
      val out = bq.searchBatch(qs, K)
      qs.indices.foreach(i => assert(out(i).toSeq == bq.search(qs(i), K).toSeq))
    }
    locally {
      val planes = 8
      val lsh = new LocalLshServer(LshIndex.index(corpus, planes), planes, Metric.L2)
      for (h <- Seq(0, 1)) {
        val out = lsh.searchBatch(qs, K, h)
        qs.indices.foreach(i => assert(out(i).toSeq == lsh.search(qs(i), K, h).toSeq))
      }
    }
    locally {
      val model = OpqIndex.train(corpus, 4, nbits = 4, Metric.L2)
      val opq = new LocalOpqServer(OpqIndex.encode(corpus, model), model)
      val out = opq.searchBatch(qs, K)
      qs.indices.foreach(i => assert(out(i).toSeq == opq.search(qs(i), K).toSeq))
    }
    locally {
      val model = IvfPqIndex.trainDeterministic(corpus, nlist = 8, m = 4,
        ksub = 16, Metric.L2)
      val ivfpq = new LocalIvfPqServer(IvfPqIndex.encode(corpus, model), model)
      val out = ivfpq.searchBatch(qs, K, nprobe = 3)
      qs.indices.foreach(i =>
        assert(out(i).toSeq == ivfpq.search(qs(i), K, nprobe = 3).toSeq))
    }
    locally {
      val ivfModel = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
      val sq8Model = Sq8Index.train(corpus, Metric.L2)
      val codes = Sq8Index.encode(corpus, sq8Model)
        .join(IvfIndex.assign(corpus, ivfModel)
          .select(org.apache.spark.sql.functions.col("id"),
            org.apache.spark.sql.functions.col("cluster_id")), "id")
      val comp = new LocalIvfSq8Server(codes, sq8Model, ivfModel)
      val out = comp.searchBatch(qs, K, nprobe = 3)
      qs.indices.foreach(i =>
        assert(out(i).toSeq == comp.search(qs(i), K, nprobe = 3).toSeq))
    }
  }

  test("Searcher.localServer() ≡ Searcher.search() for every buildable kind " +
      "(adapter + option mapping, end to end through the facade)") {
    val (corpus, queries) = vecs
    val qArr = queriesArr
    for (t <- Seq("flat", "ivf", "pq", "sq8", "ivfpq", "opq", "bq", "lsh",
        "hnsw", "hnsw_routed")) {
      val s = IndexBuilder()
        .withIndexType(t)
        .withIndexOption("nlist", 8).withIndexOption("M", 4)
        .withIndexOption("shards", 8)
        .build(corpus).withK(K).withNprobe(4)
      val batch = s.search(queries)
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3))))
        .groupBy(_._1)
      val local = s.localServer()
      qArr.foreach { case (qid, q) =>
        val served = local.search(q, K).toSeq
        val expected = batch(qid).map(_._2).sortBy(_._3).toSeq
        assert(served == expected, s"kind $t query $qid")
      }
      // the facade's batch entry point — per query ≡ the single path
      val batchOut = local.searchBatch(qArr.map(_._2), K)
      qArr.indices.foreach { i =>
        assert(batchOut(i).toSeq == local.search(qArr(i)._2, K).toSeq,
          s"kind $t batch query ${qArr(i)._1}")
      }
    }
  }

  test("LocalHnswServer ≡ HnswServer (same walks, same merge order)") {
    val (corpus, _) = vecs
    val shards = 8
    val graph = HnswIndex.build(corpus, shards, Metric.L2)
    val dist = new HnswServer(graph, Metric.L2, shards).warm()
    val local = new LocalHnswServer(graph, Metric.L2, shards)
    queriesArr.foreach { case (qid, q) =>
      assert(local.search(q, K, efSearch = 50).toSeq ==
        dist.search(q, K, efSearch = 50).toSeq, s"query $qid")
    }
    dist.unpersist()
  }

  test("LocalHnswServer.searchBatch ≡ search per query (single-merge fusion)") {
    val (corpus, _) = vecs
    val shards = 8
    val graph = HnswIndex.build(corpus, shards, Metric.L2)
    val local = new LocalHnswServer(graph, Metric.L2, shards)
    val out = local.searchBatch(queriesArr.map(_._2), K, efSearch = 50)
    queriesArr.indices.foreach { i =>
      assert(out(i).toSeq ==
        local.search(queriesArr(i)._2, K, efSearch = 50).toSeq,
        s"query ${queriesArr(i)._1}")
    }
  }

  test("LocalRoutedHnswServer.searchBatch ≡ search per query, incl. replicated") {
    val (corpus, _) = vecs
    val model = graft.index.RoutedHnswIndex.train(
      corpus, 8, Metric.L2, targetShardRows = 256)
    Seq(
      graft.index.RoutedHnswIndex.build(corpus, model) -> model,
      {
        val (m2, g2) = graft.index.RoutedHnswIndex.buildReplicatedBalanced(
          corpus, model, eps = 0.4, maxReplicas = 2, targetShardRows = 256)
        g2 -> m2
      }
    ).foreach { case (graph, m) =>
      val local = new LocalRoutedHnswServer(graph, m)
      Seq(1, 3).foreach { r =>
        val out = local.searchBatch(queriesArr.map(_._2), K,
          probeRegions = r, efSearch = 50)
        queriesArr.indices.foreach { i =>
          assert(out(i).toSeq ==
            local.search(queriesArr(i)._2, K, probeRegions = r, efSearch = 50).toSeq,
            s"R=$r query ${queriesArr(i)._1}")
        }
      }
    }
  }

  test("LocalBqServer ≡ BqServer") {
    val (corpus, _) = vecs
    val model = BqIndex.train(corpus, Metric.L2)
    val codes = BqIndex.encode(corpus, model)
    val dist = new BqServer(codes, model).warm()
    val local = new LocalBqServer(codes, model)
    queriesArr.foreach { case (qid, q) =>
      assert(local.search(q, K).toSeq == dist.search(q, K).toSeq, s"query $qid")
    }
    dist.unpersist()
  }

  test("LocalPlaidServer ≡ the distributed late-interaction pipeline " +
      "(first-stage candidates AND the exact-rerank row)") {
    import org.apache.spark.sql.functions.col
    val d = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val model = PlaidIndex.train(d, 24, 2)
    val post = PlaidIndex.build(d, model).cache()
    val local = new LocalPlaidServer(d, post, model)
    val texts = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the query ROW's output — query_id, id, maxsim, n_qtok, rank at the
    // row's own constants (CascadeN = 20 first-stage pool, rank ≤ 10)
    val expected = graft.queries.RetrievalQueries
      .queries("maxsim_first_stage")(spark, TestSession.Sf0001)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._4).toSeq).toMap
    // distributed first stage for candidate-set parity
    val qframe = d.where(col("doc_id") < 40)
      .select(col("doc_id").as("query_id"), col("text"))
    val distCands = PlaidIndex.candidates(post, qframe, model, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    expected.foreach { case (qid, rows) =>
      val got = local.search(qid, texts(qid), 20, 10).toSeq
        .map { case (id, ms, nq, rk) => (id, ms, nq, rk) }
      assert(got == rows, s"full-pipeline divergence for query $qid")
      assert(local.candidates(qid, texts(qid), 20).toSet == distCands(qid),
        s"first-stage candidate set divergence for query $qid")
    }
    assert(expected.nonEmpty)
    // the distributed resident server closes the chain: PlaidServer ≡
    // LocalPlaidServer ≡ the maxsim_first_stage row
    val dist = new PlaidServer(d, post, model).warm()
    expected.foreach { case (qid, rows) =>
      assert(dist.search(qid, texts(qid), 20, 10).toSeq == rows,
        s"resident-server divergence for query $qid")
    }
    dist.unpersist()
    post.unpersist()
  }
}
