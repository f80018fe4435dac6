package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.io.IndexIO
import graft.queries.VectorQueries

/** Index merge lifecycle: two separately persisted same-config indexes
  * combine into one whose searches equal the union-built index; model
  * mismatches and id collisions are rejected.
  */
class MergeSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private def tmp() = Files.createTempDirectory("graft_merge").toString
  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  test("ivf merge under a shared frozen model equals assigning the union") {
    val (corpus, queries) = vecs
    val mid = corpus.agg(max(col("id"))).first().getLong(0) / 2
    val (a, b) = (corpus.where(col("id") <= mid), corpus.where(col("id") > mid))
    val model = IvfIndex.trainDeterministic(a, 8, Metric.L2)
    val (pa, pb, pm) = (tmp(), tmp(), tmp())
    IndexIO.saveIvf(spark, pa, model, IvfIndex.assign(a, model))
    IndexIO.saveIvf(spark, pb, model, IvfIndex.assign(b, model))
    IndexIO.merge(spark, pa, pb, pm)
    val (loaded, codes) = IndexIO.loadIvf(spark, pm)
    assert(loaded == model)
    assert(codes.count() == corpus.count())
    val merged = IvfIndex.searchBlocked(codes, loaded, queries, 10, 4)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toString).sorted
    val full = IvfIndex.searchBlocked(IvfIndex.assign(corpus, model), model, queries, 10, 4)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toString).sorted
    assert(merged.sameElements(full))
  }

  test("hnsw merge rebuilds shard graphs bit-identical to a full build") {
    val (corpus, _) = vecs
    val mid = corpus.agg(max(col("id"))).first().getLong(0) / 2
    val (pa, pb, pm) = (tmp(), tmp(), tmp())
    IndexIO.saveHnsw(spark, pa,
      HnswIndex.build(corpus.where(col("id") <= mid), 4, Metric.L2), Metric.L2)
    IndexIO.saveHnsw(spark, pb,
      HnswIndex.build(corpus.where(col("id") > mid), 4, Metric.L2), Metric.L2)
    IndexIO.merge(spark, pa, pb, pm)
    val (_, merged) = IndexIO.loadHnsw(spark, pm)
    val full = HnswIndex.build(corpus, 4, Metric.L2)
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select("shard", "id", "level", "edges").collect().map(_.toString).sorted.toSeq
    assert(snap(merged) == snap(full))
  }

  test("bq merge unions codes under the shared thresholds") {
    val (corpus, queries) = vecs
    val mid = corpus.agg(max(col("id"))).first().getLong(0) / 2
    val model = BqIndex.train(corpus, Metric.L2)
    val (pa, pb, pm) = (tmp(), tmp(), tmp())
    IndexIO.saveBq(spark, pa, model, BqIndex.encode(corpus.where(col("id") <= mid), model))
    IndexIO.saveBq(spark, pb, model, BqIndex.encode(corpus.where(col("id") > mid), model))
    IndexIO.merge(spark, pa, pb, pm)
    val (loaded, codes) = IndexIO.loadBq(spark, pm)
    val merged = BqIndex.knnBlocked(codes, loaded, queries, 10)
      .collect().map(_.toString).sorted
    val full = BqIndex.knnBlocked(BqIndex.encode(corpus, model), model, queries, 10)
      .collect().map(_.toString).sorted
    assert(merged.sameElements(full))
  }

  test("merge rejects id collisions and model/config mismatches") {
    val (corpus, _) = vecs
    val (pa, pb, pc) = (tmp(), tmp(), tmp())
    IndexIO.saveFlat(spark, pa, corpus, Metric.L2)
    IndexIO.saveFlat(spark, pb, corpus.limit(5), Metric.L2) // overlapping ids
    val e1 = intercept[IllegalArgumentException](
      IndexIO.merge(spark, pa, pb, tmp()))
    assert(e1.getMessage.contains("ids present in both"))
    IndexIO.saveFlat(spark, pc, corpus.limit(5)
      .select((col("id") + 100000).as("id"), col("vec")), Metric.Cosine)
    val e2 = intercept[IllegalArgumentException](
      IndexIO.merge(spark, pa, pc, tmp()))
    assert(e2.getMessage.contains("config mismatch"))
    // kind mismatch
    val pd = tmp()
    val bq = BqIndex.train(corpus, Metric.L2)
    IndexIO.saveBq(spark, pd, bq, BqIndex.encode(corpus.limit(5)
      .select((col("id") + 100000).as("id"), col("vec")), bq))
    val e3 = intercept[IllegalArgumentException](
      IndexIO.merge(spark, pa, pd, tmp()))
    assert(e3.getMessage.contains("kind mismatch"))
  }
}
