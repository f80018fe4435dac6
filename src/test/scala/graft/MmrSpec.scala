package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.FlatIndex
import graft.operators.Mmr
import graft.queries.VectorQueries

/** MMR diversified retrieval: structural soundness, the greedy argmax
  * property rechecked step by step from the output, the diversity
  * effect vs plain top-k, and determinism.
  */
class MmrSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private val N = 20
  private val K = 10
  private val Lambda = 0.7

  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  test("k picks per query, distinct, drawn from the top-N pool, dense pick_order") {
    val (corpus, queries) = vecs
    val res = Mmr.diversify(corpus, queries, N, K, Lambda).cache()
    val perQ = res.groupBy("query_id").agg(
      count(lit(1)).as("n"), countDistinct("neighbor_id").as("nd"),
      min("pick_order").as("mn"), max("pick_order").as("mx")).collect()
    assert(perQ.length == queries.count())
    perQ.foreach { r =>
      assert(r.getLong(1) == K && r.getLong(2) == K &&
        r.getInt(3) == 1 && r.getInt(4) == K)
    }
    res.unpersist()
  }

  test("greedy property: each pick is the (score, smaller-id) argmax over " +
    "the remaining pool — rechecked from the raw vectors") {
    val (corpus, queries) = vecs
    val res = Mmr.diversify(corpus, queries, N, K, Lambda)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap
    val vecsById = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    queries.collect().foreach { qr =>
      val qid = qr.getLong(0)
      val qv = qr.getSeq[Double](1).toArray
      // rebuild the pool exactly: top-N by (sim desc, id asc)
      val pool = vecsById.toSeq
        .map { case (id, v) => (id, v, Mmr.cosSim(qv, v)) }
        .sortBy { case (id, _, s) => (-s, id) }
        .take(N)
      val picked = res(qid)
      val chosen = scala.collection.mutable.ArrayBuffer[Long]()
      picked.foreach { pick =>
        // argmax over the remaining pool at this step
        var bestId = -1L
        var bestScore = Double.NegativeInfinity
        pool.foreach { case (id, v, rel) =>
          if (!chosen.contains(id)) {
            val pen = if (chosen.isEmpty) 0.0
              else chosen.map(c => Mmr.cosSim(v, vecsById(c))).max
            val score = Lambda * rel - (1.0 - Lambda) * pen
            if (score > bestScore || (score == bestScore && id < bestId)) {
              bestScore = score; bestId = id
            }
          }
        }
        assert(pick == bestId,
          s"query $qid step ${chosen.size}: picked $pick, argmax is $bestId")
        chosen += pick
      }
    }
  }

  test("diversity: mean pairwise similarity of the MMR set never exceeds " +
    "plain top-k's") {
    val (corpus, queries) = vecs
    val vecsById = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def meanPairSim(ids: Seq[Long]): Double = {
      val pairs = for {
        i <- ids.indices; j <- ids.indices if i < j
      } yield Mmr.cosSim(vecsById(ids(i)), vecsById(ids(j)))
      pairs.sum / pairs.length
    }
    val mmr = Mmr.diversify(corpus, queries, N, K, Lambda)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val plain = FlatIndex.knn(corpus, queries, K, Metric.Cosine)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    val (mmrAvg, plainAvg) = mmr.keys.foldLeft((0.0, 0.0)) { case ((a, b), q) =>
      (a + meanPairSim(mmr(q)), b + meanPairSim(plain(q)))
    }
    assert(mmrAvg <= plainAvg + 1e-12,
      s"MMR did not diversify: mmr avg $mmrAvg vs top-k avg $plainAvg")
  }

  test("deterministic across evaluations") {
    val (corpus, queries) = vecs
    val a = Mmr.diversify(corpus, queries, N, K, Lambda)
      .collect().map(_.toString).sorted
    val b = Mmr.diversify(corpus, queries, N, K, Lambda)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
