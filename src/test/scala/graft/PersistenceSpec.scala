package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.io.IndexIO
import graft.query.{Searcher, FlatKind}
import graft.stats.IndexStats
import graft.queries.VectorQueries

/** Parquet round-trip tests mirroring serialize_test.go: save → load →
  * identical search results; version compat; stats.
  */
class PersistenceSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private def tmp() = Files.createTempDirectory("graft_idx").toString

  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  test("flat index round-trip preserves search results") {
    val (corpus, queries) = vecs
    val path = tmp()
    IndexIO.saveFlat(spark, path, corpus, Metric.Cosine)
    val (loaded, metric) = IndexIO.loadFlat(spark, path)
    assert(metric == Metric.Cosine)
    val before = FlatIndex.knn(corpus, queries, 10, Metric.Cosine)
    val after = FlatIndex.knn(loaded, queries, 10, Metric.Cosine)
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
  }

  test("manhattan metric round-trips through save → Searcher.open (roadmap slot)") {
    val (corpus, queries) = vecs
    val path = tmp()
    IndexIO.saveFlat(spark, path, corpus, Metric.Manhattan)
    val s = Searcher.open(spark, path).withK(10)
    val direct = FlatIndex.knnBlocked(corpus, queries, 10, Metric.Manhattan)
    val viaFacade = s.search(queries)
    assert(viaFacade.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaFacade).count() == 0)
    s.close()
  }

  test("ivf index round-trip: centroids, codes, and search results survive") {
    val (corpus, queries) = vecs
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val assigned = IvfIndex.assign(corpus, model)
    val path = tmp()
    IndexIO.saveIvf(spark, path, model, assigned)
    val (loaded, codes) = IndexIO.loadIvf(spark, path)
    assert(loaded.centroids == model.centroids)
    val before = IvfIndex.search(assigned, model, queries, 10, 4)
    val after = IvfIndex.search(codes, loaded, queries, 10, 4)
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
  }

  test("ivfpq round-trip via Searcher.open facade") {
    val (corpus, queries) = vecs
    val model = IvfPqIndex.trainDeterministic(corpus, 8, 8, 16, Metric.L2)
    val codes = IvfPqIndex.encode(corpus, model)
    val path = tmp()
    IndexIO.saveIvfPq(spark, path, model, codes)
    val s = Searcher.open(spark, path).withK(10).withNprobe(4)
    val after = s.search(queries)
    val before = IvfPqIndex.search(codes, model, queries, 10, 4)
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
  }

  test("opq round-trip via Searcher.open: rotation, codebooks, and ranks survive") {
    val (corpus, queries) = vecs
    val model = OpqIndex.train(corpus, 8, nbits = 4, Metric.L2)
    val codes = OpqIndex.encode(corpus, model)
    val path = tmp()
    IndexIO.saveOpq(spark, path, model, codes)
    assert(IndexIO.readMeta(path)("index_type") == "opq")
    val (loaded, _) = IndexIO.loadOpq(spark, path)
    assert(loaded == model, "OPQ model not value-identical after round trip")
    val s = Searcher.open(spark, path).withK(10)
    val after = s.search(queries).select("query_id", "neighbor_id", "rank")
    val before = OpqIndex.knnBlocked(codes, model, queries, 10)
      .select("query_id", "neighbor_id", "rank")
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
    s.close()
  }

  test("lsh round-trip via Searcher.open is rank-identical to knnBlocked") {
    val (corpus, queries) = vecs
    val planes = 8
    val indexed = LshIndex.index(corpus, planes)
    val path = tmp()
    IndexIO.saveLsh(spark, path, indexed, planes, Metric.L2)
    val meta = IndexIO.readMeta(path)
    assert(meta("index_type") == "lsh" && meta("planes") == "8")
    val s = Searcher.open(spark, path).withK(10) // efSearch default ≥ 1 → multi-probe
    val after = s.search(queries)
    val before = LshIndex.knnBlocked(indexed, queries, 10, planes, Metric.L2, hamming = 1)
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
    // efSearch = 0 narrows to the single-bucket probe
    val narrow = Searcher.open(spark, path).withK(10).withEfSearch(0).search(queries)
    val single = LshIndex.knnBlocked(indexed, queries, 10, planes, Metric.L2, hamming = 0)
    assert(single.exceptAll(narrow).count() == 0 && narrow.exceptAll(single).count() == 0)
  }

  test("hnsw round-trip via Searcher.open is rank-identical to knnBlocked") {
    val (corpus, queries) = vecs
    val graph = HnswIndex.build(corpus, 4, Metric.L2)
    val path = tmp()
    IndexIO.saveHnsw(spark, path, graph, Metric.L2)
    val meta = IndexIO.readMeta(path)
    assert(meta("index_type") == "hnsw" && meta("num_shards") == "4"
      && meta("m") == "16" && meta("ef_construction") == "200")
    val s = Searcher.open(spark, path).withK(10).withEfSearch(200)
    val after = s.search(queries)
    val before = HnswIndex.knnBlocked(graph, queries, 10, Metric.L2, efSearch = 200)
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
  }

  test("plaid round-trip: quantizer and centroid-partitioned postings survive; " +
      "candidates identical before/after persistence") {
    val d = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val model = PlaidIndex.train(d, 24, 2)
    val post = PlaidIndex.build(d, model)
    val path = tmp()
    IndexIO.savePlaid(spark, path, post, model)
    val (loaded, loadedModel) = IndexIO.loadPlaid(spark, path)
    assert(loadedModel == model, "frozen quantizer must ride the sidecar unchanged")
    assert(loaded.exceptAll(post).count() == 0 && post.exceptAll(loaded).count() == 0,
      "posting rows must survive the centroid-partitioned layout")
    val q = d.where(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))
    val before = PlaidIndex.candidates(post, q, model, 20)
    val after = PlaidIndex.candidates(loaded, q, loadedModel, 20)
    assert(before.exceptAll(after).count() == 0 && after.exceptAll(before).count() == 0)
  }

  test("version compatibility rule (version.go:27-37)") {
    IndexIO.checkCompatible("1.0.0")
    intercept[IllegalArgumentException](IndexIO.checkCompatible("2.0.0"))
    intercept[IllegalArgumentException](IndexIO.checkCompatible("1.1.0"))
    intercept[IllegalArgumentException](IndexIO.checkCompatible("bogus"))
  }

  test("stats report rows, dim, type, bytes; list sizes reflect skew") {
    val (corpus, _) = vecs
    val path = tmp()
    IndexIO.saveFlat(spark, path, corpus, Metric.L2)
    val st = IndexStats.forPath(spark, path).first()
    assert(st.getAs[Long]("total_vectors") == corpus.count())
    assert(st.getAs[String]("index_type") == "flat")
    assert(st.getAs[Long]("storage_bytes") > 0)

    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val sizes = IndexStats.listSizes(IvfIndex.assign(corpus, model))
    assert(sizes.agg(sum(col("list_size"))).first().getLong(0) == corpus.count())
  }

  test("facade range search on quantized kinds filters by distance") {
    val (corpus, queries) = vecs
    val s = Searcher(FlatKind(corpus, Metric.L2))
    val r = s.rangeSearch(queries, threshold = 1.2, maxResults = 20)
    assert(r.where(col("distance") > 1.2).count() == 0)
  }
}
