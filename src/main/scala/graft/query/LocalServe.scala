package graft.query

import java.util.stream.IntStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.core.Metric
import graft.index.{BoundedTopK, BqIndex, BqModel, IvfIndex, IvfModel, IvfPqModel, LshIndex, OpqIndex, OpqModel, PqIndex, PqModel, RoutedHnswIndex, RoutedHnswModel, Sq8Model}

/** Kind-erased in-process serving handle — what [[Searcher.localServer]]
  * returns: one query in, (id, distance, rank) out, with the facade's
  * options (nprobe/efSearch) already applied. */
trait LocalServer {
  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)]
  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Double, Int)]]
}

/** Pairs a kind's single-query and batch entry points behind the
  * kind-erased facade handle. */
private[graft] final case class LocalServerAdapter(
    single: (Array[Double], Int) => Array[(Long, Double, Int)],
    batched: (Array[Array[Double]], Int) => Array[Array[(Long, Double, Int)]])
    extends LocalServer {
  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)] = single(q, k)
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Double, Int)]] =
    batched(qs, k)
}

/** In-process single-query serving: the SAME packed blocks the
  * distributed servers scan, collected to the driver ONCE, scanned with
  * the SAME scalar kernels — zero Spark jobs per query.
  *
  * This is the reference's deployment shape: its facade serves queries
  * against heap-resident structures in-process (pkg/search/search.go —
  * no scheduler in the hot path), which is why its single-query
  * latencies are micro-to-milliseconds while every Spark job pays a
  * ~10-20 ms scheduling floor (the floorProbe rows prove the floor is
  * dispatch, not scan). The split is deliberate:
  *
  *  - `ServingRdd` servers (IvfServer, PqServer, …) are the CLUSTER
  *    path — resident state sharded across executors; the only shape
  *    that exists at 100 TB.
  *  - `Local*Server`s are the SINGLE-HEAP path for state that fits the
  *    driver (the reference's only mode): flat doubles are n·dim·8 B,
  *    SQ8 n·dim B, PQ n·M ints, BQ n·dim/8 B — at the reference's own
  *    protocol (100k × 128d) that is 102 MB worst case and the scan
  *    costs micro/milliseconds.
  *
  * Blocks scan on the JVM common pool (one task per block — same
  * granularity as ServePartitions); the per-block bounded heaps merge
  * under the same (rank_key, id) total order as the distributed merge,
  * so every Local server is result-IDENTICAL to its ServingRdd sibling
  * (spec-asserted in LocalServeSpec).
  */
private[graft] object LocalServe {

  /** Collect packed blocks through the existing packer, then release the
    * temporary RDD — the driver copy is the only resident state. */
  def collect[B](packed: org.apache.spark.rdd.RDD[B])(
      implicit ct: scala.reflect.ClassTag[B]): Array[B] = {
    val blocks = packed.collect()
    packed.unpersist()
    blocks
  }

  /** Batch-throughput twin of [[scan]]: QUERIES fan across the common
    * pool and each query's blocks scan sequentially on its worker into
    * one bounded heap — no per-query fork fan-out, no per-block partial
    * arrays (at in-process kernel speeds the fork overhead of a
    * per-query 32-task fan-out rivals the scans themselves). Merging
    * every block into one heap is order-invariant, so per query the
    * result is identical to [[scan]]'s two-level merge. `mk` runs once
    * per query for per-query precomputation (probe masks, ADC tables,
    * packed query codes) shared across that query's blocks. */
  def batch[B](qs: Array[Array[Double]], blocks: Array[B], k: Int)(
      mk: Array[Double] => (B, BoundedTopK) => Unit): Array[BoundedTopK] = {
    val out = new Array[BoundedTopK](qs.length)
    IntStream.range(0, qs.length).parallel().forEach { qi =>
      val merge = new BoundedTopK(k)
      val perBlock = mk(qs(qi))
      var b = 0
      while (b < blocks.length) { perBlock(blocks(b), merge); b += 1 }
      out(qi) = merge
    }
    out
  }

  /** Parallel per-block scan → merged (id, rank_key) candidates.
    * `distinct` dedups the cross-block merge — required when one id can
    * live in several blocks (the replicated routed graph,
    * [[graft.index.RoutedHnswIndex.buildReplicated]]); within a block an
    * id appears once, so the per-block heaps never need it. */
  def scan[B](blocks: Array[B], k: Int, distinct: Boolean = false)(
      perBlock: (B, BoundedTopK) => Unit): BoundedTopK = {
    val partials = new Array[Array[(Long, Double)]](blocks.length)
    IntStream.range(0, blocks.length).parallel().forEach { bi =>
      val merge = new BoundedTopK(k)
      perBlock(blocks(bi), merge)
      partials(bi) = merge.drainIterator.toArray
    }
    val top = new BoundedTopK(k)
    if (distinct) partials.foreach(_.foreach { case (id, d) => top.insertDistinct(id, d) })
    else partials.foreach(_.foreach { case (id, d) => top.insert(id, d) })
    top
  }
}

/** In-process exhaustive scan — the reference's flat kind served the
  * reference's way. Result-identical to FlatIndex.knnBlocked's order. */
final class LocalFlatServer(vectors: DataFrame, metric: Metric) {
  private val blocks: Array[ServeBlock] =
    LocalServe.collect(ServeBlocks.pack(vectors.withColumn("tag0", lit(0L)), "tag0"))

  private def scanBlock(q: Array[Double])(blk: ServeBlock, merge: BoundedTopK): Unit = {
    val dim = blk.dim
    var r = 0
    while (r < blk.ids.length) {
      merge.insert(blk.ids(r), metric.rankKeyScalar(q, blk.data, r * dim, dim))
      r += 1
    }
  }

  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(scanBlock(q))
      .ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => scanBlock(q))
      .map(_.ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) })
  }
}

/** In-process IVF: driver probe ranking + mask-pruned local scan.
  * Result-identical to [[IvfServer.search]]. */
final class LocalIvfServer(assigned: DataFrame, model: IvfModel) {
  private val metric = model.metric
  private val cents = model.centroids.map(_.toArray).toArray
  private val blocks: Array[ServeBlock] =
    LocalServe.collect(ServeBlocks.pack(assigned, "cluster_id"))

  /** Per-query probe mask + masked-scan closure (precomputation shared
    * across the query's blocks). */
  private def maskedScan(q: Array[Double], nprobe: Int): (ServeBlock, BoundedTopK) => Unit = {
    val np = math.min(math.max(nprobe, 1), model.nlist)
    val mask = new Array[Boolean](model.nlist)
    IvfIndex.probeSet(q, cents, metric, np).foreach(mask(_) = true)
    (blk, merge) => {
      val dim = blk.dim
      var r = 0
      while (r < blk.ids.length) {
        if (mask(blk.tags(r).toInt))
          merge.insert(blk.ids(r), metric.rankKeyScalar(q, blk.data, r * dim, dim))
        r += 1
      }
    }
  }

  def search(q: Array[Double], k: Int, nprobe: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(maskedScan(q, nprobe))
      .ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int,
      nprobe: Int): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => maskedScan(q, nprobe))
      .map(_.ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) })
  }
}

/** In-process sign-LSH: bucket + Hamming-1 probes, binary-searched per
  * row. Result-identical to [[LshServer.search]]. */
final class LocalLshServer(indexed: DataFrame, planes: Int, metric: Metric) {
  private val blocks: Array[ServeBlock] =
    LocalServe.collect(ServeBlocks.pack(indexed, "bucket"))

  /** Per-query bucket-probe set + filtered-scan closure. */
  private def probeScan(q: Array[Double], hamming: Int): (ServeBlock, BoundedTopK) => Unit = {
    require(hamming >= 0 && hamming <= 1, s"hamming radius must be 0 or 1, got $hamming")
    val qb = LshIndex.bucketScalar(q, planes)
    val probes: Array[Long] =
      if (hamming == 0) Array(qb)
      else (qb +: Array.tabulate(planes)(p => qb ^ (1L << p))).sorted
    (blk, merge) => {
      val dim = blk.dim
      var r = 0
      while (r < blk.ids.length) {
        if (java.util.Arrays.binarySearch(probes, blk.tags(r)) >= 0)
          merge.insert(blk.ids(r), metric.rankKeyScalar(q, blk.data, r * dim, dim))
        r += 1
      }
    }
  }

  def search(q: Array[Double], k: Int, hamming: Int = 1): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(probeScan(q, hamming))
      .ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int,
      hamming: Int = 1): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => probeScan(q, hamming))
      .map(_.ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) })
  }
}

/** In-process PQ ADC: driver distance table, M int lookups per row.
  * Result-identical to [[PqServer.search]]. */
final class LocalPqServer(codes: DataFrame, model: PqModel) {
  private val blocks: Array[CodeBlock] =
    LocalServe.collect(ServeBlocks.packCodes(codes, None))

  /** Per-query ADC table + scan closure. */
  private def adcScan(q: Array[Double]): (CodeBlock, BoundedTopK) => Unit = {
    val tab = PqIndex.adcTable(q, model)
    val ksub = model.ksub
    (blk, merge) => {
      val m = blk.m
      var r = 0
      while (r < blk.ids.length) {
        val off = r * m
        var d = 0.0
        var mi = 0
        while (mi < m) { d += tab(mi * ksub + blk.codes(off + mi)); mi += 1 }
        merge.insert(blk.ids(r), d)
        r += 1
      }
    }
  }

  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(adcScan(q))
      .ranked.map { case (id, d, r) => (id, math.sqrt(d), r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => adcScan(q))
      .map(_.ranked.map { case (id, d, r) => (id, math.sqrt(d), r) })
  }
}

/** In-process SQ8: per-query squared-difference table
  * ([[graft.index.Sq8Index.sqTable]] — the A8 ADC discipline applied to
  * SQ8), one byte load + one table add per component, scanned with the
  * four-row-pipelined canonical fold
  * ([[graft.index.Sq8Index.tableScanAll]] — per-row values bit-identical
  * to the inline dequantize scan). Result-identical to
  * [[Sq8Server.search]]. */
final class LocalSq8Server(codes: DataFrame, model: Sq8Model) {
  require(model.metric == Metric.L2,
    s"LocalSq8Server serves the l2 kind; got ${model.metric.name}")
  private val blocks: Array[ByteBlock] =
    LocalServe.collect(ServeBlocks.packBytes(codes))

  private def tableScan(q: Array[Double]): (ByteBlock, BoundedTopK) => Unit = {
    val tab = graft.index.Sq8Index.sqTable(q, model.minsArray, model.scalesArray)
    (blk, merge) =>
      graft.index.Sq8Index.tableScanAll(tab, blk.ids, blk.codes, blk.dim, merge)
  }

  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(tableScan(q))
      .ranked.map { case (id, d, r) => (id, math.sqrt(d), r) }
  }

  /** Batch throughput: QUERY-GROUP-BLOCKED row-outer kernel — groups of
    * four queries fan across the common pool (250-way parallel at the
    * bench batch, vs the r10 row-outer form's 8 blocks); within a group
    * each row dequantizes ONCE into a register-resident value and feeds
    * four independent canonical fold chains (all loads L1: the query
    * rows + the dequant model; the code stream is sequential). Each
    * (query, row) value is EXACTLY [[search]]'s arithmetic — dequant
    * then subtract-square in i order — and bounded-top-k merges are
    * insert-order-invariant, so per query the result ≡ [[search]]
    * row-for-row. The r11 query-outer table scan benched gather-
    * throughput-bound (the 256 KB table thrashes L2 across 32 threads);
    * this shape keeps the serial-chain bound broken across QUERIES
    * instead, with no table at all. */
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    val mins = model.minsArray
    val scales = model.scalesArray
    val nq = qs.length
    val out = new Array[Array[(Long, Double, Int)]](nq)
    val G = 8 // query-block width: dequant amortizes over G chains
    val nGroups = (nq + G - 1) / G
    java.util.stream.IntStream.range(0, nGroups).parallel().forEach { gi =>
      val q0 = gi * G
      if (nq - q0 >= G) {
        val heaps = Array.fill(G)(new BoundedTopK(k))
        var bi = 0
        while (bi < blocks.length) {
          val blk = blocks(bi)
          val dim = blk.dim
          val codes = blk.codes
          val recon = new Array[Double](dim)
          val n = blk.ids.length
          var r = 0
          while (r < n) {
            val off = r * dim
            var i = 0
            while (i < dim) {
              recon(i) = mins(i) + (codes(off + i).toInt + 128).toDouble * scales(i)
              i += 1
            }
            val id = blk.ids(r)
            var j = 0
            while (j < G) {
              val q = qs(q0 + j)
              val h = heaps(j)
              // EXACT early termination: L2 terms are non-negative, so a
              // partial sum already strictly above the heap's k-th key
              // can only grow — the row would be rejected; skipping the
              // insert changes nothing. Checked every 32 elements so the
              // canonical fold (and every surviving value) is untouched.
              val bound =
                if (h.size < k) Double.PositiveInfinity else h.dists(k - 1)
              var d = 0.0
              var skip = false
              i = 0
              while (!skip && i < dim) {
                val stop = math.min(i + 32, dim)
                while (i < stop) { val t = q(i) - recon(i); d += t * t; i += 1 }
                skip = d > bound
              }
              if (!skip) h.insert(id, d)
              j += 1
            }
            r += 1
          }
          bi += 1
        }
        var j = 0
        while (j < G) {
          out(q0 + j) = heaps(j).ranked.map { case (id, d, rk) => (id, math.sqrt(d), rk) }
          j += 1
        }
      } else {
        // tail group (< 4 queries): the single-query table scan, whose
        // per-row values are identical to the interleaved form's
        var t = q0
        while (t < nq) {
          val merge = new BoundedTopK(k)
          val scan = tableScan(qs(t))
          var bi = 0
          while (bi < blocks.length) { scan(blocks(bi), merge); bi += 1 }
          out(t) = merge.ranked.map { case (id, d, rk) => (id, math.sqrt(d), rk) }
          t += 1
        }
      }
    }
    out
  }
}

/** In-process OPQ: driver-side query rotation (one dim² matVec,
  * microseconds) in front of the PQ scan — same layering as
  * [[OpqServer]], result-identical to it. */
final class LocalOpqServer(codes: DataFrame, model: OpqModel) {
  private val rot = model.rotation.map(_.toArray).toArray
  private val inner = new LocalPqServer(codes, model.pq)
  def search(q: Array[Double], k: Int): Array[(Long, Double, Int)] =
    inner.search(OpqIndex.rotateLocal(rot, q), k)
  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Double, Int)]] =
    inner.searchBatch(qs.map(OpqIndex.rotateLocal(rot, _)), k)
}

/** In-process IVFPQ: driver probe ranking + hoisted per-cluster residual
  * ADC tables + tag-masked code scan. Result-identical to
  * [[IvfPqServer.search]]. */
final class LocalIvfPqServer(codes: DataFrame, model: IvfPqModel) {
  private val cents = model.coarse.centroids.map(_.toArray).toArray
  private val blocks: Array[CodeBlock] =
    LocalServe.collect(ServeBlocks.packCodes(codes, Some("cluster_id")))

  /** Per-query probe set + hoisted residual ADC tables + masked-scan
    * closure. */
  private def residualScan(q: Array[Double], nprobe: Int): (CodeBlock, BoundedTopK) => Unit = {
    val np = math.min(math.max(nprobe, 1), model.coarse.nlist)
    val tables = new Array[Array[Double]](model.coarse.nlist)
    val ksub = model.pq.ksub
    IvfIndex.probeSet(q, cents, model.coarse.metric, np).foreach { c =>
      val cent = cents(c)
      val r = new Array[Double](q.length)
      var i = 0
      while (i < q.length) { r(i) = q(i) - cent(i); i += 1 }
      tables(c) = PqIndex.adcTable(r, model.pq)
    }
    (blk, merge) => {
      val m = blk.m
      var r = 0
      while (r < blk.ids.length) {
        val tab = tables(blk.tags(r).toInt)
        if (tab != null) {
          val off = r * m
          var d = 0.0
          var mi = 0
          while (mi < m) { d += tab(mi * ksub + blk.codes(off + mi)); mi += 1 }
          merge.insert(blk.ids(r), d)
        }
        r += 1
      }
    }
  }

  def search(q: Array[Double], k: Int, nprobe: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(residualScan(q, nprobe))
      .ranked.map { case (id, d, r) => (id, math.sqrt(d), r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int,
      nprobe: Int): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => residualScan(q, nprobe))
      .map(_.ranked.map { case (id, d, r) => (id, math.sqrt(d), r) })
  }
}

/** In-process IVF×SQ8 composite: probe mask over byte-packed codes.
  * Result-identical to [[IvfSq8Server.search]]. */
final class LocalIvfSq8Server(codes: DataFrame, sq8: Sq8Model, ivf: IvfModel) {
  require(sq8.metric == Metric.L2 && ivf.metric == Metric.L2,
    s"LocalIvfSq8Server serves the l2 kind; got ${sq8.metric.name}/${ivf.metric.name}")
  private val cents = ivf.centroids.map(_.toArray).toArray
  private val blocks: Array[ByteBlock] =
    LocalServe.collect(ServeBlocks.packBytes(codes, Some("cluster_id")))

  /** Per-query probe mask + masked table-scan closure — the same
    * [[graft.index.Sq8Index.sqTable]] kernel as [[LocalSq8Server]]
    * (bit-identical terms and fold, so parity with the inline form
    * holds); the 32k-entry table amortizes as long as the probed rows
    * exceed ~256 (nprobe·n/nlist at any realistic config). */
  private def maskedDequantScan(q: Array[Double],
      nprobe: Int): (ByteBlock, BoundedTopK) => Unit = {
    val np = math.min(math.max(nprobe, 1), ivf.nlist)
    val mask = new Array[Boolean](ivf.nlist)
    IvfIndex.probeSet(q, cents, Metric.L2, np).foreach(mask(_) = true)
    val tab = graft.index.Sq8Index.sqTable(q, sq8.minsArray, sq8.scalesArray)
    (blk, merge) => {
      val dim = blk.dim
      var r = 0
      while (r < blk.ids.length) {
        if (mask(blk.tags(r).toInt))
          merge.insert(blk.ids(r),
            graft.index.Sq8Index.tableKey(tab, blk.codes, r * dim, dim))
        r += 1
      }
    }
  }

  def search(q: Array[Double], k: Int, nprobe: Int): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(maskedDequantScan(q, nprobe))
      .ranked.map { case (id, d, r) => (id, math.sqrt(d), r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int,
      nprobe: Int): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => maskedDequantScan(q, nprobe))
      .map(_.ranked.map { case (id, d, r) => (id, math.sqrt(d), r) })
  }
}

/** In-process routed sharded HNSW — the engine's 100 TB ANN shape served
  * the reference's way: region probe on the driver, then ONLY the probed
  * regions' graphs walk. Result-identical to [[graft.index
  * .RoutedHnswIndex.knn]] (same probe order, same walks, same merge). */
final class LocalRoutedHnswServer(graph: DataFrame, model: RoutedHnswModel) {
  import graft.index.{CompiledHnsw, HnswIndex}

  // indexed by physical shard id; empty shards stay null
  private val graphs: Array[CompiledHnsw] = {
    val arr = new Array[CompiledHnsw](model.numShards)
    HnswIndex.shardGrouped(graph, model.numShards).collect()
      .groupBy(_._1).foreach { case (s, rs) =>
        arr(s) = CompiledHnsw.fromTuples(
          rs.map(t => (t._2, t._3, t._4, t._5)), model.metric)
      }
    arr
  }

  def search(q: Array[Double], k: Int, probeRegions: Int,
      efSearch: Int = graft.index.HnswIndex.EfSearch): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    val ef = math.max(efSearch, k)
    val probed = RoutedHnswIndex.probeShards(q, model, probeRegions)
      .map(graphs(_)).filter(_ != null)
    // distinct merge: the graph may be a replicated build, where one id
    // lives in several probed regions' shards
    LocalServe.scan(probed, k, distinct = true) { (g, merge) =>
      g.knnInto(q, k, ef, merge)
    }.ranked.map { case (id, d, r) => (id, model.metric.finishRankScalar(d), r) }
  }

  /** Batch throughput path — queries fan across the common pool, each
    * query routes (driver-side probe ranking) and walks ONLY its probed
    * regions' graphs sequentially into one distinct-merging bounded
    * top-k. This is the engine's honest high-QPS serving shape: per
    * query O(R · log shard_size) work, constant in corpus size — see
    * [[graft.index.RoutedHnswIndex]]. Result-identical per query to
    * [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int, probeRegions: Int,
      efSearch: Int = graft.index.HnswIndex.EfSearch): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    val ef = math.max(efSearch, k)
    val out = new Array[Array[(Long, Double, Int)]](qs.length)
    java.util.stream.IntStream.range(0, qs.length).parallel().forEach { qi =>
      val merge = new graft.index.BoundedTopK(k)
      val probed = RoutedHnswIndex.probeShards(qs(qi), model, probeRegions)
      var s = 0
      while (s < probed.length) {
        val g = graphs(probed(s))
        if (g != null) g.knnInto(qs(qi), k, ef, merge, distinct = true)
        s += 1
      }
      out(qi) = merge.ranked.map { case (id, d, r) =>
        (id, model.metric.finishRankScalar(d), r)
      }
    }
    out
  }
}

/** In-process sharded HNSW — the reference's flagship serving shape:
  * its search IS an in-memory graph walk (pkg/index/hnsw/hnsw.go), which
  * is where its sub-ms serving rows come from. All shard graphs build
  * driver-side ONCE (same [[graft.index.CompiledHnsw]] structures the
  * executors hold); per query every shard's logarithmic walk runs on
  * the common pool and merges under the same (rank_key, id) order as
  * [[HnswServer]] — result-identical. 32 graph walks of a 3k-node shard
  * are microseconds each; the distributed sibling pays the job-dispatch
  * floor on exactly the same walks. */
final class LocalHnswServer private (preGraphs: Array[graft.index.CompiledHnsw],
    graph: DataFrame, metric: Metric, numShards: Int) {
  import graft.index.{BoundedTopK, CompiledHnsw, HnswIndex}

  def this(graph: DataFrame, metric: Metric, numShards: Int = -1) =
    this(null, graph, metric, numShards)

  private val graphs: Array[CompiledHnsw] =
    if (preGraphs != null) preGraphs
    else {
      val nShards =
        if (numShards > 0) numShards
        else graph.agg(org.apache.spark.sql.functions.max(col("shard"))).head.getInt(0) + 1
      HnswIndex.shardGrouped(graph, nShards).collect()
        .groupBy(_._1).values
        .map(rs =>
          CompiledHnsw.fromTuples(rs.map(t => (t._2, t._3, t._4, t._5)), metric))
        .toArray
    }

  def search(q: Array[Double], k: Int,
      efSearch: Int = graft.index.HnswIndex.EfSearch): Array[(Long, Double, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    val ef = math.max(efSearch, k)
    LocalServe.scan(graphs, k) { (g, merge) =>
      g.knnInto(q, k, ef, merge)
    }.ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) }
  }

  /** Batch throughput path: queries fan across the common pool; each
    * query walks every shard SEQUENTIALLY on its worker into one bounded
    * merge — no per-query fork fan-out, no per-shard partial arrays.
    * With compiled walks in the microseconds, per-query fork overhead
    * (32 subtask submissions) would otherwise rival the walks
    * themselves. Merging all shards into one [[BoundedTopK]] is
    * order-invariant, so results are identical to [[search]]'s
    * two-level merge row-for-row. */
  def searchBatch(qs: Array[Array[Double]], k: Int,
      efSearch: Int = graft.index.HnswIndex.EfSearch): Array[Array[(Long, Double, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    val ef = math.max(efSearch, k)
    val out = new Array[Array[(Long, Double, Int)]](qs.length)
    java.util.stream.IntStream.range(0, qs.length).parallel().forEach { qi =>
      val merge = new BoundedTopK(k)
      var g = 0
      while (g < graphs.length) {
        graphs(g).knnInto(qs(qi), k, ef, merge)
        g += 1
      }
      out(qi) = merge.ranked.map { case (id, d, r) => (id, metric.finishRankScalar(d), r) }
    }
    out
  }
}

object LocalHnswServer {
  /** Serve graphs already compiled in this process — the direct handoff
    * from [[graft.index.HnswIndex.buildParallelCompiled]] (build arrays
    * ARE the serving arrays; no DataFrame interchange, no re-collect). */
  private[graft] def fromCompiled(gs: Array[graft.index.CompiledHnsw],
      metric: Metric): LocalHnswServer =
    new LocalHnswServer(gs, null, metric, gs.length)
}

/** In-process BQ: XOR + popcount over packed sign words — at dim/8 bytes
  * per row the whole index is megabytes; the scan is the cheapest of any
  * kind. Result-identical to [[BqServer.search]]. */
final class LocalBqServer(codes: DataFrame, model: BqModel) {
  private val blocks: Array[WordBlock] =
    LocalServe.collect(ServeBlocks.packWords(codes))

  /** Per-query sign packing + XOR/popcount scan closure. */
  private def hammingScan(q: Array[Double]): (WordBlock, BoundedTopK) => Unit = {
    val qc = BqIndex.packLocal(q, model.thresholdArray)
    val nw = qc.length
    (blk, merge) => {
      require(blk.nWords == nw,
        s"serving block has ${blk.nWords} words, query packs to $nw")
      var r = 0
      while (r < blk.ids.length) {
        val off = r * nw
        var d = 0L
        var w = 0
        while (w < nw) { d += java.lang.Long.bitCount(blk.words(off + w) ^ qc(w)); w += 1 }
        merge.insert(blk.ids(r), d.toDouble)
        r += 1
      }
    }
  }

  def search(q: Array[Double], k: Int): Array[(Long, Long, Int)] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.scan(blocks, k)(hammingScan(q))
      .ranked.map { case (id, d, r) => (id, d.toLong, r) }
  }

  /** Query-parallel batch throughput; per query ≡ [[search]]. */
  def searchBatch(qs: Array[Array[Double]], k: Int): Array[Array[(Long, Long, Int)]] = {
    require(k > 0, s"serving requires k > 0, got $k")
    LocalServe.batch(qs, blocks, k)(q => hammingScan(q))
      .map(_.ranked.map { case (id, d, r) => (id, d.toLong, r) })
  }
}
