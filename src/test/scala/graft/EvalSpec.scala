package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic recheck of the evaluation/consumer rows: kNN classification
  * (knn_classify) against a literal driver-side majority vote, and the
  * recall row (eval_recall_ivf) against a driver-side set intersection
  * of the two kernels' outputs.
  */
class EvalSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private val K = 10

  test("knn_classify: prediction equals a literal brute-force majority " +
    "vote (self excluded, votes desc / label asc tie-break)") {
    val rows = graft.queries.VectorQueries.queries("knn_classify")(
      spark, TestSession.Sf0001).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val v = graft.core.Tables.vectors(spark, TestSession.Sf0001)
      .select("id", "vec", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    val queries = v.filter(_._1 < graft.queries.VectorQueries.QueryIds)
    assert(rows.size == queries.length)
    queries.foreach { case (qid, qv, _) =>
      val nn = v.filter(_._1 != qid)
        .map { case (id, ev, l) =>
          val d = qv.zip(ev).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, id, l)
        }
        .sortBy(t => (t._1, t._2)).take(K)
      val (lbl, votes) = nn.groupBy(_._3).view.mapValues(_.length)
        .toSeq.sortBy { case (l, n) => (-n, l) }.head
      assert(rows(qid) == (lbl, votes),
        s"query $qid: engine ${rows(qid)} vs recomputed ($lbl, $votes)")
    }
  }

  test("eval_rank_metrics: precision/MRR/NDCG replay from a literal " +
    "brute-force cosine ranking with label relevance") {
    val K = 10
    val rows = graft.queries.VectorQueries.queries("eval_rank_metrics")(
      spark, TestSession.Sf0001).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val v = graft.core.Tables.vectors(spark, TestSession.Sf0001)
      .select("id", "vec", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cosDist(a: Array[Double], b: Array[Double]): Double = {
      var da = 0.0; var db = 0.0; var d = 0.0; var i = 0
      while (i < a.length) { da += a(i)*a(i); db += b(i)*b(i); d += a(i)*b(i); i += 1 }
      val na = math.sqrt(da); val nb = math.sqrt(db)
      if (na == 0 || nb == 0) 1.0 else 1.0 - math.min(1.0, math.max(-1.0, d / (na * nb)))
    }
    val disc = graft.queries.VectorQueries.NdcgDisc
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    v.filter(_._1 < graft.queries.VectorQueries.QueryIds).foreach { case (qid, qv, ql) =>
      val top = v.filter(_._1 != qid)
        .map { case (id, ev, l) => (cosDist(qv, ev), id, l) }
        .sortBy(t => (t._1, t._2)).take(K)
      val rels = top.map(t => if (t._3 == ql) 1 else 0)
      val nRel = rels.sum
      val mrr = rels.indexOf(1) match { case -1 => 0.0; case i => 1.0 / (i + 1) }
      val dcg = rels.zipWithIndex.map { case (r, i) => r * disc(i) }.sum
      val idcg = disc.take(nRel).sum
      val ndcg = if (nRel == 0) 0.0 else dcg / idcg
      val (gn, gp, gm, gd) = rows(qid)
      assert(gn == nRel && gp == r4(nRel.toDouble / K) && gm == r4(mrr),
        s"query $qid: counts/mrr")
      assert(math.abs(gd - ndcg) < 5e-4, s"query $qid: ndcg $gd vs $ndcg")
      assert(gd >= 0.0 && gd <= 1.0)
    }
  }

  test("eval_recall_ivf: n_hits equals the driver-side intersection of the " +
    "two kernels' neighbor sets; recall in [0,1]; flat self-recall is 1.0") {
    import org.apache.spark.sql.functions._
    val dir = TestSession.Sf0001
    val res = graft.queries.IndexQueries.queries("eval_recall_ivf")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val (corpus, queries) = graft.queries.VectorQueries.vecTables(spark, dir)
    val model = graft.index.IvfIndex.trainDeterministic(corpus, 16, graft.core.Metric.L2)
    val truth = graft.index.FlatIndex.knn(corpus, queries, K, graft.core.Metric.L2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val pred = graft.index.IvfIndex.knn(corpus, model, queries, K, 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    res.foreach { case (qid, (nHits, recall)) =>
      val expect = pred.getOrElse(qid, Set.empty).intersect(
        truth.getOrElse(qid, Set.empty)).size.toLong
      assert(nHits == expect, s"query $qid: n_hits $nHits vs $expect")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - nHits.toDouble / K) < 1e-9)
    }
    // the degenerate case the row's join must not break on: pred ≡ truth
    val flat = graft.index.FlatIndex.knn(corpus, queries, K, graft.core.Metric.L2)
      .select("query_id", "neighbor_id")
    val selfHits = flat.join(flat, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n")).collect()
    selfHits.foreach(r => assert(r.getLong(1) == K))
  }
}
