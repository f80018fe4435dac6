package graft.query

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

import graft.core.Metric
import graft.index.{BoundedTopK, IvfIndex, IvfModel, Sq8Model}

/** Online single-query serving for the IVF×SQ8 composite kind
  * (`knn_ivfsq8_det`'s layout: coarse cluster assignment on the ORIGINAL
  * vectors, SQ8 codes as the stored payload) — VERDICT r7 #7: plain
  * [[Sq8Server]] is a flat-class exhaustive scan, cost ∝ n (149.9 ms p50
  * at 1M); routing it through the IVF probe mask bounds the per-query
  * resident scan to the probed clusters' rows, the same nprobe/n
  * fraction [[IvfServer]] enjoys, while keeping the 1 B/element resident
  * state.
  *
  * Mechanics are the [[IvfServer]] + [[Sq8Server]] composition: codes
  * pack once into cluster-tagged [[ByteBlock]]s; per query the probe
  * ranking runs on the driver (nlist rank keys), a boolean mask ships in
  * the task closure, and the one single-stage RDD job dequantizes inline
  * only the masked rows. Result order/tie-break matches the composite
  * batch plan exactly: ascending (rank_key, id) over dequantized
  * candidates in probed clusters.
  */
// deliberately NOT Serializable — per-query closures capture only locals
final class IvfSq8Server(codes: DataFrame, sq8: Sq8Model, ivf: IvfModel)
    extends ServingRdd {

  require(sq8.metric == Metric.L2 && ivf.metric == Metric.L2,
    s"IvfSq8Server serves the l2 kind; got ${sq8.metric.name}/${ivf.metric.name}")

  private val cents = ivf.centroids.map(_.toArray).toArray

  private val rdd: RDD[ByteBlock] = ServeBlocks.packBytes(codes, Some("cluster_id"))

  /** Materialize the serving blocks (call once before timing queries). */
  def warm(): this.type = { rdd.count(); this }

  /** One query → top-k (id, distance, rank), driver-merged. */
  def search(q: Array[Double], k: Int, nprobe: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    val np = math.min(math.max(nprobe, 1), ivf.nlist)
    val mask = new Array[Boolean](ivf.nlist)
    IvfIndex.probeSet(q, cents, Metric.L2, np).foreach(mask(_) = true)
    val mins = sq8.minsArray
    val scales = sq8.scalesArray
    // per-task squared-difference table + the family-wide 4-acc serving
    // fold (Sq8Index.tableKey) — see LocalIvfSq8Server, result-identical
    val partials = rdd.mapPartitions { it =>
      val tab = graft.index.Sq8Index.sqTable(q, mins, scales)
      val merge = new BoundedTopK(k)
      while (it.hasNext) {
        val blk = it.next()
        val dim = blk.dim
        val n = blk.ids.length
        var r = 0
        while (r < n) {
          if (mask(blk.tags(r).toInt))
            merge.insert(blk.ids(r),
              graft.index.Sq8Index.tableKey(tab, blk.codes, r * dim, dim))
          r += 1
        }
      }
      merge.drainIterator
    }.collect()
    val top = new BoundedTopK(k)
    partials.foreach { case (id, d) => top.insert(id, d) }
    top.ranked.map { case (id, d, r) => (id, math.sqrt(d), r) }
  }

  protected def servingRdd: org.apache.spark.rdd.RDD[_] = rdd
}
