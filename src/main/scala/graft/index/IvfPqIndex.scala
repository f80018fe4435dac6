package graft.index

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.VectorFunctions._

/** IVF + PQ: coarse-quantize to nlist clusters, PQ-encode the *residual*
  * (vector − assigned centroid), search = probe pruning + ADC over
  * residual codes (reference: pkg/index/ivfpq/ivfpq.go:117-284).
  *
  * Index table: (id, cluster_id, code) — partitioned by cluster_id; both
  * models are small driver-side artifacts shipped as literals.
  */
final case class IvfPqModel(coarse: IvfModel, pq: PqModel)

object IvfPqIndex {

  /** Residual column: vec − centroid[cluster_id] (ivfpq.go:139-147) —
    * native fused loop. */
  private def residual(vec: org.apache.spark.sql.Column,
      clusterId: org.apache.spark.sql.Column,
      centroids: Seq[Seq[Double]]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftx.IndexExpressions.residual(vec, clusterId, centroids)

  /** Train: coarse quantizer, then PQ on residuals. Requires ≥ nlist×10
    * training vectors (ivfpq.go:121-123). */
  def train(vectors: DataFrame, nlist: Int, m: Int, nbits: Int, metric: Metric,
      seed: Long = 42L): IvfPqModel = {
    require(vectors.count() >= nlist * 10L, s"need at least ${nlist * 10} training vectors")
    val coarse = IvfIndex.train(vectors, nlist, metric, seed)
    val pq = PqIndex.train(residuals(vectors, coarse), m, nbits, metric, seed)
    IvfPqModel(coarse, pq)
  }

  /** Deterministic variant (bucket-mean coarse + bucket-mean PQ). */
  def trainDeterministic(vectors: DataFrame, nlist: Int, m: Int, ksub: Int,
      metric: Metric): IvfPqModel = {
    val coarse = IvfIndex.trainDeterministic(vectors, nlist, metric)
    val pq = PqIndex.trainDeterministic(residuals(vectors, coarse), m, ksub, metric)
    IvfPqModel(coarse, pq)
  }

  /** (id, vec=residual) frame for PQ training. */
  private def residuals(vectors: DataFrame, coarse: IvfModel): DataFrame = {
    val assigned = IvfIndex.assign(vectors, coarse)
    assigned.select(col("id"),
      residual(col("vec"), col("cluster_id"), coarse.centroids).as("vec"))
  }

  /** Encode: (id, cluster_id, code) — assign, take residual, PQ-encode
    * (ivfpq.go:184-219). Pure projection; streaming-safe. */
  def encode(vectors: DataFrame, model: IvfPqModel): DataFrame = {
    val assigned = IvfIndex.assign(vectors, model.coarse)
    assigned.select(
      col("id"), col("cluster_id"),
      PqIndex.encodeCol(
        residual(col("vec"), col("cluster_id"), model.coarse.centroids),
        model.pq).as("code"))
  }

  /** Dequantize: coarse centroid + PQ-decoded residual (the inverse of
    * [[encode]]'s residual quantization). */
  def decode(clusterId: org.apache.spark.sql.Column,
      code: org.apache.spark.sql.Column, model: IvfPqModel): org.apache.spark.sql.Column = {
    val cents = org.apache.spark.sql.functions.typedlit(model.coarse.centroids)
    org.apache.spark.sql.functions.zip_with(
      org.apache.spark.sql.functions.element_at(cents, clusterId.cast("int") + 1),
      PqIndex.decode(code, model.pq), (c, r) => c + r)
  }

  /** Search: probe top-nprobe clusters, ADC against the *query residual*
    * w.r.t. each probed centroid (ivfpq.go:222-284). */
  def search(codes: DataFrame, model: IvfPqModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val p = IvfIndex.probes(queries, model.coarse, nprobe)
      .withColumn("qres", residual(col("qvec"), col("cluster_id"), model.coarse.centroids))
      .select(col("query_id"), col("cluster_id"), col("qres"))
    val candidates = codes.join(broadcast(p), Seq("cluster_id"))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        PqIndex.adcDist2(col("qres"), col("code"), model.pq).as("rank_key"))
    FlatIndex.topK(candidates, k, Metric.L2)
  }

  def knn(vectors: DataFrame, model: IvfPqModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    search(encode(vectors, model), model, queries, k, nprobe)

  /** Blocked serving kernel, result-identical to [[search]]: probe
    * ranking and the per-(query, probe) residuals are computed
    * driver-side (nq·nprobe·dim doubles — ~10 MB at nq=1000, dim=128),
    * shipped as a cluster→(query, residual) inverted index by broadcast.
    * Each codes partition streams once; a row is ADC-scored only against
    * the queries probing its cluster, with the same per-subspace fold
    * order as the PqAdc expression (bit-identical distances). Candidates
    * are never materialized or shuffled — the final merge sees
    * ≤ k·partitions rows per query.
    *
    * ADC tables hoist *adaptively, per partition*: a driver-side hoist of
    * all nq·nprobe M×Ksub tables would broadcast ≈ 160 MB at nq=1000, so
    * instead each partition counts the rows it streams per cluster and
    * builds that cluster's tables only once the count passes
    * `adcHoistThreshold` (default ksub — the flop break-even: one table
    * costs dim·Ksub, each subsequent row then saves ~dim). Sparse
    * clusters (the nq=1000 bench shape, ~10 rows per cluster-partition)
    * never pay the table cost; dense clusters (the 100 TB layout, ≫ ksub
    * rows per partition) converge to M lookups per row. The table entry
    * and the direct form share the same per-subspace fold, so distances
    * are bit-identical either way. `query_id` is cast to LONG, like
    * every blocked kernel. */
  def searchBlocked(codes: DataFrame, model: IvfPqModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    searchBlocked(codes, model, queries, k, nprobe, adcHoistThreshold = -1)

  /** `adcHoistThreshold` < 0 means ksub (the flop break-even); 0 hoists
    * on the first row (test hook for the table path). */
  private[graft] def searchBlocked(codes: DataFrame, model: IvfPqModel,
      queries: DataFrame, k: Int, nprobe: Int, adcHoistThreshold: Int): DataFrame = {
    if (k <= 0) return search(codes, model, queries, k, nprobe)
    val hoistAt = if (adcHoistThreshold >= 0) adcHoistThreshold else model.pq.ksub
    val np = math.min(math.max(nprobe, 1), model.coarse.nlist)
    val spark = codes.sparkSession
    import spark.implicits._
    val cents = model.coarse.centroids.map(_.toArray).toArray
    val cbs = model.pq.codebookArrays
    val m = model.pq.m
    val dsub = model.pq.dsub
    val qRows = queries.select(col("query_id").cast("long"), col("qvec")).collect()
    val qids = qRows.map(_.getLong(0))
    val qvecs = qRows.map(_.getSeq[Double](1).toArray)
    // cluster -> (probing query indices, their residuals w.r.t. that centroid)
    val nlist = model.coarse.nlist
    val qiBuf = Array.fill(nlist)(new scala.collection.mutable.ArrayBuffer[Int])
    val resBuf = Array.fill(nlist)(new scala.collection.mutable.ArrayBuffer[Array[Double]])
    var qi = 0
    while (qi < qvecs.length) {
      val q = qvecs(qi)
      IvfIndex.probeSet(q, cents, model.coarse.metric, np).foreach { c =>
        val cent = cents(c)
        val r = new Array[Double](q.length)
        var i = 0
        while (i < q.length) { r(i) = q(i) - cent(i); i += 1 }
        qiBuf(c) += qi
        resBuf(c) += r
      }
      qi += 1
    }
    val inv = Array.tabulate(nlist)(c => (qiBuf(c).toArray, resBuf(c).toArray))
    val bc = spark.sparkContext.broadcast((qids, inv, cbs))
    val partials = codes
      .select(col("id").cast("long"), col("cluster_id"), col("code"))
      .as[(Long, Int, Array[Int])]
      .mapPartitions { it =>
        val (ids, inverted, cbs) = bc.value
        val heaps = Array.fill(ids.length)(new BoundedTopK(k))
        val ksub = cbs(0).length
        val nClusters = inverted.length
        val seen = new Array[Int](nClusters)
        // per cluster, per probing query: a FLAT M·Ksub ADC table (entry
        // mi·ksub + j — one load per subspace, VERDICT r5 #2) — built
        // lazily once this partition has streamed > hoistAt of its rows
        val tables = new Array[Array[Array[Double]]](nClusters)
        while (it.hasNext) {
          val (id, cid, code) = it.next()
          val (qlist, rlist) = inverted(cid)
          if (qlist.length > 0) {
            seen(cid) += 1
            if (tables(cid) == null && seen(cid) > hoistAt) {
              tables(cid) = rlist.map { r =>
                // entry mi·ksub + j: same inner fold as the direct form below
                val out = new Array[Double](m * ksub)
                var mi = 0
                while (mi < m) {
                  val off = mi * dsub
                  var j = 0
                  while (j < ksub) {
                    val row = cbs(mi)(j)
                    var d = 0.0
                    var i = 0
                    while (i < dsub) { val x = r(off + i) - row(i); d += x * x; i += 1 }
                    out(mi * ksub + j) = d
                    j += 1
                  }
                  mi += 1
                }
                out
              }
            }
            val tab = tables(cid)
            var t = 0
            while (t < qlist.length) {
              // same accumulation shape as PqAdcExpr.nullSafeEval: per-
              // subspace partials added in ascending mi — the table path
              // adds the SAME doubles in the SAME order, so distances are
              // bit-identical to the direct path
              var acc = 0.0
              var mi = 0
              if (tab != null) {
                val tt = tab(t)
                while (mi < m) { acc += tt(mi * ksub + code(mi)); mi += 1 }
              } else {
                val r = rlist(t)
                while (mi < m) {
                  val row = cbs(mi)(code(mi))
                  val off = mi * dsub
                  var d = 0.0
                  var i = 0
                  while (i < dsub) { val x = r(off + i) - row(i); d += x * x; i += 1 }
                  acc += d
                  mi += 1
                }
              }
              heaps(qlist(t)).insert(id, acc)
              t += 1
            }
          }
        }
        BoundedTopK.drain(heaps, ids)
      }
      .toDF("query_id", "neighbor_id", "rank_key")
    FlatIndex.topK(partials, k, Metric.L2)
  }
}
