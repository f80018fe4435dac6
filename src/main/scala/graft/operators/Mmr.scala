package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** MMR — Maximal Marginal Relevance diversified retrieval (Carbonell &
  * Goldstein, SIGIR'98; the standard RAG-retrieval diversifier). From a
  * per-query candidate pool (top-N by cosine similarity), greedily pick
  * k items maximizing `λ·sim(q,c) − (1−λ)·max_{s∈picked} sim(c,s)` —
  * relevance traded against redundancy, so near-duplicate hits don't
  * crowd the result list.
  *
  * Plan shape: candidate selection is the verified broadcast top-N
  * machinery; the greedy stage then touches only nq·N rows — per-query
  * local work of O(N·k) sims inside one `flatMapGroups`, embarrassingly
  * parallel by query and independent of corpus size (the 100 TB cost
  * lives in the candidate scan, which is the existing kNN path).
  *
  * Determinism/parity: every similarity is the engine-wide clamped
  * cosine (left-to-right dot folds — the same arithmetic as the
  * `sqlCosineSimG` oracle fragment), ties break on smaller id, and the
  * output carries NO floats — (query_id, neighbor_id, pick_order) —
  * so the DuckDB recursive-CTE oracle hash-matches exactly.
  */
object Mmr {

  /** Scalar clamped cosine similarity — the exact mirror of
    * `VectorQueries.sqlCosineSimG` (left-to-right folds, zero-norm → 0,
    * clamp to [-1, 1]). */
  private[graft] def cosSim(a: Array[Double], b: Array[Double]): Double = {
    var da = 0.0; var db = 0.0; var dab = 0.0
    var i = 0
    while (i < a.length) {
      da += a(i) * a(i); db += b(i) * b(i); dab += a(i) * b(i); i += 1
    }
    val na = math.sqrt(da); val nb = math.sqrt(db)
    if (na == 0.0 || nb == 0.0) 0.0
    else math.min(1.0, math.max(-1.0, dab / (na * nb)))
  }

  /** Local greedy selection over one query's candidate pool, sorted by
    * id on entry for order-independence. `cands` = (id, vec, rel). */
  private[graft] def selectLocal(cands: Array[(Long, Array[Double], Double)],
      k: Int, lambda: Double): Array[Long] = {
    val n = cands.length
    val picked = new Array[Int](math.min(k, n))
    val isPicked = new Array[Boolean](n)
    // max sim of each candidate to the picked set so far, updated per pick
    val maxSim = new Array[Double](n)
    var np = 0
    while (np < picked.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < n) {
        if (!isPicked(c)) {
          val penalty = if (np == 0) 0.0 else maxSim(c)
          val score = lambda * cands(c)._3 - (1.0 - lambda) * penalty
          // ties on score go to the smaller id (ascending scan order)
          if (score > bestScore) { bestScore = score; best = c }
        }
        c += 1
      }
      isPicked(best) = true
      picked(np) = best
      val bv = cands(best)._2
      c = 0
      while (c < n) {
        if (!isPicked(c)) {
          val s = cosSim(cands(c)._2, bv)
          if (s > maxSim(c)) maxSim(c) = s
        }
        c += 1
      }
      np += 1
    }
    picked.map(cands(_)._1)
  }

  /** Diversified top-k: per query, pool the top-`n` corpus rows by
    * clamped cosine similarity (desc, id asc), then MMR-select `k`.
    * Returns (query_id, neighbor_id, pick_order) — pick_order 1-based. */
  def diversify(corpus: DataFrame, queries: DataFrame, n: Int, k: Int,
      lambda: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val d = VectorFunctions.dot(col("qvec"), col("vec"))
    val na = VectorFunctions.norm(col("qvec"))
    val nb = VectorFunctions.norm(col("vec"))
    val sim = when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(least(lit(1.0), greatest(lit(-1.0), d / (na * nb))))
    val w = Window.partitionBy("query_id").orderBy(col("rel").desc, col("id").asc)
    val cands = corpus.crossJoin(broadcast(queries))
      .select(col("query_id").cast("long"), col("id").cast("long"),
        col("vec"), sim.as("rel"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= n)
      .select(col("query_id"), col("id"), col("vec"), col("rel"))
    cands.as[(Long, Long, Seq[Double], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val pool = it.toArray.sortBy(_._2)
          .map(t => (t._2, t._3.toArray, t._4))
        selectLocal(pool, k, lambda).iterator.zipWithIndex
          .map { case (id, i) => (qid, id, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "pick_order")
  }
}
