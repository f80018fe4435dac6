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

  test("knn_hard_negatives: every neighbor's label differs from the query's, " +
      "K dense ranks per query, and each distance ≥ the unrestricted flat kNN's") {
    val dir = TestSession.Sf0001
    val out = VectorQueries.queries("knn_hard_negatives")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val labels = graft.core.Tables.vectors(spark, dir)
      .select("id", "label").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val k = VectorQueries.K
    out.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == k && rows.map(_._4).sorted.toSeq == (1 to k))
      rows.foreach { case (_, nid, _, _) =>
        assert(labels(nid) != labels(qid), s"same-label neighbor $nid for query $qid")
      }
    }
    // removing same-label candidates can only push distances up, rank by rank
    val flat = VectorQueries.queries("knn_flat_l2")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getInt(3)), r.getDouble(2))).toMap
    out.foreach { case (qid, _, d, rk) =>
      assert(d >= flat((qid, rk)) - 1e-9, s"hard-negative rank $rk closer than flat for $qid")
    }
  }

  test("knn_class_topk: exactly PerClassK dense-ranked rows per (query, label), " +
      "covering every label, each list ascending") {
    val dir = TestSession.Sf0001
    val out = VectorQueries.queries("knn_class_topk")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getDouble(3), r.getInt(4))))
    val nLabels = graft.core.Tables.vectors(spark, dir)
      .select("label").distinct().count()
    val groups = out.groupBy(_._1)
    val nq = out.map(_._1._1).distinct.length
    assert(groups.size.toLong == nq * nLabels, "every (query, label) pair present")
    groups.foreach { case ((qid, lbl), rows) =>
      val rs = rows.map(_._2).sortBy(_._3)
      assert(rs.map(_._3).toSeq == (1 to VectorQueries.PerClassK), s"ranks for ($qid,$lbl)")
      rs.sliding(2).foreach {
        case Array(a, b) => assert(a._2 <= b._2 + 1e-12)
        case _ =>
      }
    }
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
