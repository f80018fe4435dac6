package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.queries.VectorQueries

/** OPQ×IVFPQ composite: identity-rotation degeneration to plain IVFPQ,
  * structural kNN soundness, blocked ≡ plan parity, and recall sanity
  * on anisotropic data.
  */
class OpqIvfPqSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private val K = 10
  private val Nlist = 8
  private val Nprobe = 4
  private val M = 8

  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  private def aniso = {
    val (corpus, queries) = vecs
    val scale = (x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =>
      x / (lit(1.0) + i.cast("double") / lit(4.0))
    (corpus.select(col("id"), transform(col("vec"), scale).as("vec")),
      queries.select(col("query_id"), transform(col("qvec"), scale).as("qvec")))
  }

  test("opqIters=0 degenerates to plain IVFPQ bit-identically") {
    val (corpus, queries) = vecs
    val composite = OpqIvfPqIndex.train(corpus, Nlist, M, nbits = 4, Metric.L2,
      opqIters = 0)
    val plain = IvfPqIndex.train(corpus, Nlist, M, nbits = 4, Metric.L2)
    val a = OpqIvfPqIndex.knn(corpus, composite, queries, K, Nprobe)
      .collect().map(_.toString).sorted
    val b = IvfPqIndex.knn(corpus, plain, queries, K, Nprobe)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b),
      "identity-rotation composite must reproduce plain IVFPQ exactly")
  }

  test("knn structure: K rows per query, distinct known neighbors, " +
    "non-negative distances; blocked == plan") {
    val (corpus, queries) = aniso
    val model = OpqIvfPqIndex.train(corpus, Nlist, M, nbits = 4, Metric.L2)
    val codes = OpqIvfPqIndex.encode(corpus, model).cache()
    val res = OpqIvfPqIndex.search(codes, model, queries, K, Nprobe).cache()
    val perQ = res.groupBy("query_id").agg(
      count(lit(1)).as("n"), countDistinct("neighbor_id").as("nd"),
      min("distance").as("mn")).collect()
    assert(perQ.nonEmpty)
    perQ.foreach { r =>
      assert(r.getLong(1) == K && r.getLong(2) == K && r.getDouble(3) >= 0.0)
    }
    val blocked = OpqIvfPqIndex.searchBlocked(codes, model, queries, K, Nprobe)
      .select("query_id", "neighbor_id", "rank").collect().map(_.toString).sorted
    val plan = res.select("query_id", "neighbor_id", "rank")
      .collect().map(_.toString).sorted
    assert(blocked.sameElements(plan))
    res.unpersist(); codes.unpersist()
  }

  test("composite recall does not regress vs plain IVFPQ on anisotropic data") {
    val (corpus, queries) = aniso
    val flat = FlatIndex.knn(corpus, queries, K, Metric.L2).cache()
    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = approx.select("query_id", "neighbor_id")
        .join(flat.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
        .count()
      hits.toDouble / flat.count()
    }
    val plain = IvfPqIndex.train(corpus, Nlist, M, nbits = 4, Metric.L2)
    val comp = OpqIvfPqIndex.train(corpus, Nlist, M, nbits = 4, Metric.L2)
    val rPlain = recall(IvfPqIndex.knn(corpus, plain, queries, K, Nprobe))
    val rComp = recall(OpqIvfPqIndex.knn(corpus, comp, queries, K, Nprobe))
    // the rotation must not hurt; a material gain is data-dependent
    // (asserted at the OPQ level where the flat-PQ comparison is clean)
    assert(rComp >= rPlain - 0.05,
      s"composite recall $rComp regressed vs plain IVFPQ $rPlain")
    flat.unpersist()
  }
}
