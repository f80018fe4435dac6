package graft.query

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

import graft.index.{BoundedTopK, PqIndex, PqModel}

/** Online single-query serving over a PQ codes table — completes the
  * serving matrix to every persistable kind, like the reference facade
  * serves all of its index types in-process (pkg/search/search.go:92-112).
  *
  * Same engineering as [[IvfServer]]: the codes are packed ONCE into
  * [[ServeBlocks.ServePartitions]] cached primitive [[CodeBlock]]s
  * (~n·M ints — the PQ kinds' whole appeal is that serving-resident
  * state is codes, not vectors); per query the M×Ksub ADC distance
  * table (pq.go:144-155's loop-invariant hoist) is computed on the
  * driver and ships in the task closure, so the scan is M int-indexed
  * lookups per row; ONE single-stage RDD job per query, driver merge.
  *
  * Result order/tie-break matches [[PqIndex.knnBlocked]] exactly:
  * ascending (rank_key, id); distances bit-identical (same per-subspace
  * fold in [[PqIndex.adcTable]]).
  */
// deliberately NOT Serializable — per-query closures capture only locals
final class PqServer(codes: DataFrame, model: PqModel) extends ServingRdd {

  private val rdd: RDD[CodeBlock] = ServeBlocks.packCodes(codes, None)

  /** Materialize the serving blocks (call once before timing queries). */
  def warm(): this.type = { rdd.count(); this }

  /** One query → top-k (id, distance, rank), driver-merged. */
  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    // flat table, entry mi·ksub + code — one load per subspace, no row-
    // object pointer chase in the scan (VERDICT r5 #2)
    val tab = PqIndex.adcTable(q, model)
    val ksub = model.ksub
    val partials = rdd.mapPartitions { it =>
      val merge = new BoundedTopK(k)
      while (it.hasNext) {
        val blk = it.next()
        val m = blk.m
        val n = blk.ids.length
        var r = 0
        while (r < n) {
          val off = r * m
          var d = 0.0
          var mi = 0
          while (mi < m) { d += tab(mi * ksub + blk.codes(off + mi)); mi += 1 }
          merge.insert(blk.ids(r), d)
          r += 1
        }
      }
      merge.drainIterator
    }.collect()
    val top = new BoundedTopK(k)
    partials.foreach { case (id, d) => top.insert(id, d) }
    // ADC reports √ of the summed squared subspace distances (pq.go:158-168)
    top.ranked.map { case (id, d, r) => (id, math.sqrt(d), r) }
  }

  protected def servingRdd: org.apache.spark.rdd.RDD[_] = rdd
}
