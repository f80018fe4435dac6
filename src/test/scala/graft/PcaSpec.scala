package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.FlatIndex
import graft.operators.{Mmr, Pca}
import graft.queries.VectorQueries

/** PCA invariants: orthonormal components, non-increasing explained
  * variance summing to total variance at full rank, distance
  * preservation at k = dim, reconstruction error shrinking with k,
  * sign-canonical determinism, and composition with the kNN machinery.
  */
class PcaSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  test("components are orthonormal; explained variance non-increasing and >= 0") {
    val (corpus, _) = vecs
    val model = Pca.train(corpus, k = 16)
    for (i <- model.components.indices; j <- model.components.indices) {
      val want = if (i == j) 1.0 else 0.0
      val got = dot(model.components(i), model.components(j))
      assert(math.abs(got - want) < 1e-9, s"<c$i, c$j> = $got")
    }
    model.explainedVar.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b - 1e-12)
      case _ =>
    }
    assert(model.explainedVar.forall(_ >= -1e-12))
  }

  test("full-rank projection preserves pairwise distances; explained variance " +
    "sums to total variance") {
    val (corpus, _) = vecs
    val dim = corpus.select(size(col("vec"))).first().getInt(0)
    val model = Pca.train(corpus, k = dim)
    val proj = Pca.project(corpus, model)
    val before = FlatIndex.pairwiseDistances(corpus.limit(40), Metric.L2)
      .withColumnRenamed("distance", "d0")
    val after = FlatIndex.pairwiseDistances(proj.limit(40), Metric.L2)
      .withColumnRenamed("distance", "d1")
    val drift = before.join(after, Seq("id_a", "id_b"))
      .where(abs(col("d0") - col("d1")) > 1e-6).count()
    assert(drift == 0, s"$drift pairs drifted under a full-rank rotation")
    // Σ eigenvalues == total variance of the (centered) sample
    val x = corpus.orderBy("id").collect().map(_.getSeq[Double](1).toArray)
    val mean = Array.tabulate(dim)(i => x.map(_(i)).sum / x.length)
    val total = x.map(v => v.indices.map(i => math.pow(v(i) - mean(i), 2)).sum)
      .sum / x.length
    assert(math.abs(model.explainedVar.sum - total) < 1e-6 * math.max(1.0, total))
  }

  test("reconstruction error shrinks as k grows") {
    val (corpus, _) = vecs
    def recon(k: Int): Double = {
      val m = Pca.train(corpus, k)
      val x = corpus.orderBy("id").collect().map(_.getSeq[Double](1).toArray)
      x.map { v =>
        val c = v.indices.map(i => v(i) - m.mean(i))
        val y = m.components.map(dot(_, c))
        // residual = ||c||^2 - ||y||^2 (orthonormal rows)
        c.map(t => t * t).sum - y.map(t => t * t).sum
      }.sum / x.length
    }
    val e4 = recon(4); val e16 = recon(16)
    assert(e16 < e4, s"error must shrink with k: k=4 -> $e4, k=16 -> $e16")
    assert(e4 >= -1e-9 && e16 >= -1e-9)
  }

  test("training is deterministic including component signs") {
    val (corpus, _) = vecs
    val a = Pca.train(corpus, k = 8)
    val b = Pca.train(corpus, k = 8)
    assert(a == b)
    // canonical sign: largest-|weight| coordinate is positive
    a.components.foreach { c =>
      val best = c.indices.maxBy(i => math.abs(c(i)))
      assert(c(best) > 0.0)
    }
  }

  test("reduce-then-index composition: kNN in the reduced space is sound and " +
    "overlaps exact kNN") {
    val (corpus, queries) = vecs
    val model = Pca.train(corpus, k = 16)
    val redCorpus = Pca.project(corpus, model)
    val redQueries = queries
      .select(col("query_id").as("id"), col("qvec").as("vec"))
    val rq = Pca.project(redQueries, model)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val red = FlatIndex.knn(redCorpus, rq, 10, Metric.L2).cache()
    assert(red.groupBy("query_id").count().where(col("count") =!= 10).count() == 0)
    val exact = FlatIndex.knn(corpus, queries, 10, Metric.L2)
    val overlap = red.select("query_id", "neighbor_id")
      .join(exact.select("query_id", "neighbor_id"), Seq("query_id", "neighbor_id"))
      .count().toDouble / exact.count()
    // uniform random data is PCA's worst case (isotropic — 16/64 dims keep
    // ~25% of variance); the floor detects collapse, not quality
    assert(overlap > 0.1, s"16-of-64-dim PCA recall vs exact collapsed to $overlap")
    red.unpersist()
  }
}
