package graft.index

import graft.core.Metric

/** Compiled, query-time-only HNSW shard graph in CSR form.
  *
  * [[LocalHnsw]] is the BUILD structure (hnsw.go insert/prune mirrored on
  * a long-keyed node map — mutation needs the map). Query-time it pays a
  * hash lookup per distance evaluation and allocates a fresh visited set
  * + two heaps per walk (~36 KB); at the bench batch shape (1000 queries
  * × 32 shards) that is ~1.2 MB of garbage PER QUERY, and the parallel
  * batch row measured GC-bound at <10% parallel efficiency. This class
  * is the same graph frozen for search:
  *
  *  - nodes sorted ascending by id; a node's POSITION replaces its id in
  *    every hot loop, so the engine-wide (rank_key, id) tie-break is
  *    exactly (rank_key, position) — no order change anywhere;
  *  - vectors packed in one flat double array (position * dim offsets —
  *    the [[Metric.rankKeyScalar]] block form, no per-node object);
  *  - per-layer adjacency in CSR (int positions, not long ids);
  *  - all per-walk state lives in a per-thread [[HnswScratch]] reused
  *    across queries: an epoch-stamped visited array (O(1) clear) and
  *    two primitive heaps. Steady-state search allocates only the
  *    returned top-k.
  *
  * Results are bit-identical to [[LocalHnsw.knn]] (CompiledHnswSpec
  * fuzzes the parity): same greedy descent (hnsw.go:156-173), same
  * ef-bounded layer-0 expansion (hnsw.go:343-394), same (rank_key, id)
  * orderings, same edge iteration order (CSR preserves list order).
  */
private[graft] final class CompiledHnsw(
    val ids: Array[Long], // ascending; position -> id
    val vecs: Array[Double], // position * dim, packed
    val dim: Int,
    metric: Metric,
    layerOff: Array[Array[Int]], // per layer: n+1 CSR offsets
    layerAdj: Array[Array[Int]], // per layer: neighbor positions
    entryPos: Int,
    maxLevel: Int)
    extends Serializable {

  val n: Int = ids.length

  @inline private def key(q: Array[Double], pos: Int): Double =
    metric.walkKeyScalar(q, vecs, pos * dim, dim)

  /** Greedy hill-descent (hnsw.go:156-173 / 295-312): at each layer from
    * `fromLayer` down to (excl.) `downTo`, follow strictly-improving
    * edges to a local minimum. Identical scan order to
    * [[LocalHnsw.descend]] — edges in stored order, running best. */
  private def descend(q: Array[Double], from: Int, fromLayer: Int, downTo: Int,
      s: HnswScratch): Int = {
    var curr = from
    var currDist = key(q, curr)
    var ev = 1L
    var lc = fromLayer
    while (lc > downTo) {
      val off = layerOff(lc)
      val adj = layerAdj(lc)
      var changed = true
      while (changed) {
        changed = false
        var e = off(curr)
        val end = off(curr + 1)
        while (e < end) {
          val nb = adj(e)
          val d = key(q, nb)
          ev += 1
          if (d < currDist) { currDist = d; curr = nb; changed = true }
          e += 1
        }
      }
      lc -= 1
    }
    CompiledHnsw.addEvals(ev)
    curr
  }

  /** ef-bounded best-first expansion at one layer (hnsw.go:343-394),
    * mirroring [[LocalHnsw.searchLayer]] comparison-for-comparison; the
    * ef best survivors are left in `s.results` (worst at the root). */
  private def searchLayer(q: Array[Double], entry: Int, ef: Int, layer: Int,
      s: HnswScratch): Unit = {
    val off = layerOff(layer)
    val adj = layerAdj(layer)
    val stamp = s.stamp
    val ep = s.epoch
    val frontier = s.frontier
    val results = s.results
    val d0 = key(q, entry)
    var ev = 1L
    frontier.add(d0, entry); results.add(d0, entry); stamp(entry) = ep
    var done = false
    while (!done && frontier.size > 0) {
      val cd = frontier.peekDist
      val ci = frontier.peekPos
      // nearest frontier entry beyond the worst keeper: done (position
      // order IS id order — nodes are sorted ascending by id)
      if (cd > results.peekDist || (cd == results.peekDist && ci > results.peekPos)) {
        done = true
      } else {
        frontier.poll()
        var e = off(ci)
        val end = off(ci + 1)
        while (e < end) {
          val nb = adj(e)
          if (stamp(nb) != ep) {
            stamp(nb) = ep
            val d = key(q, nb)
            ev += 1
            if (results.size < ef || d < results.peekDist ||
                (d == results.peekDist && nb < results.peekPos)) {
              frontier.add(d, nb); results.add(d, nb)
              if (results.size > ef) results.poll()
            }
          }
          e += 1
        }
      }
    }
    CompiledHnsw.addEvals(ev)
  }

  /** Search this shard's graph (hnsw.go:141-186): greedy descent through
    * layers > 0, then layer-0 ef-search; top-k ascending (rankKey, id).
    * Result-identical to [[LocalHnsw.knn]]. */
  def knn(q: Array[Double], k: Int, efSearch: Int): Array[(Long, Double)] = {
    if (n == 0) return Array.empty
    val s = CompiledHnsw.scratch()
    s.begin(n)
    val curr = descend(q, entryPos, maxLevel, 0, s)
    searchLayer(q, curr, efSearch, 0, s)
    val res = s.results
    val take = math.min(k, res.size)
    while (res.size > take) res.poll() // shed beyond-k survivors, worst-first
    val out = new Array[(Long, Double)](take)
    var i = take - 1
    while (i >= 0) {
      out(i) = (ids(res.peekPos), res.peekDist)
      res.poll()
      i -= 1
    }
    out
  }

  /** [[knn]] fused into a caller-held merge — the batch hot path: no
    * per-call tuple array, winners stream straight into the bounded
    * top-k. `distinct` routes through insertDistinct (replicated
    * builds, where one id lives in several probed shards). */
  def knnInto(q: Array[Double], k: Int, efSearch: Int, merge: BoundedTopK,
      distinct: Boolean = false): Unit = {
    if (n == 0) return
    val s = CompiledHnsw.scratch()
    s.begin(n)
    val curr = descend(q, entryPos, maxLevel, 0, s)
    searchLayer(q, curr, efSearch, 0, s)
    val res = s.results
    val take = math.min(k, res.size)
    while (res.size > take) res.poll()
    while (res.size > 0) {
      if (distinct) merge.insertDistinct(ids(res.peekPos), res.peekDist)
      else merge.insert(ids(res.peekPos), res.peekDist)
      res.poll()
    }
  }
}

private[graft] object CompiledHnsw {

  /** One scratch per thread per JVM, grown to the largest graph the
    * thread has walked (stamp = n ints; at the 1M routed shape ~124 KB
    * per thread). The epoch stamp makes cross-graph reuse safe: every
    * walk begins with a fresh epoch, so stale stamps — same-position
    * entries from ANOTHER graph included — never match. [[clearScratch]]
    * releases the calling thread's scratch (for long-lived executors
    * that served a much larger graph than they will again — ADVICE r10
    * #4). */
  private val tl: ThreadLocal[HnswScratch] =
    ThreadLocal.withInitial(() => new HnswScratch)

  private[index] def scratch(): HnswScratch = tl.get()

  /** Release the calling thread's walk scratch (it re-creates lazily). */
  def clearScratch(): Unit = tl.remove()

  /** JVM-wide distance-evaluation counter: threads flush once per walk
    * phase (a striped [[java.util.concurrent.atomic.LongAdder]] add every
    * few thousand evals — no hot-path cost). A process-global adder
    * rather than a sum over live per-thread scratches: pool threads die
    * and their scratches get collected between bench phases, and a
    * weak-ref sum silently loses their contribution (the r11 ef-sweep
    * rows read NEGATIVE deltas before this was an adder). */
  private val evalAdder = new java.util.concurrent.atomic.LongAdder

  private[index] def addEvals(ev: Long): Unit = evalAdder.add(ev)

  /** Monotone total of distance evaluations across all threads since JVM
    * start — a DIAGNOSTIC readout for the bench's evals-per-query rows:
    * take a snapshot before and after a (joined) batch and divide the
    * delta by the query count. Exact once the batch's worker threads
    * have joined, which every batch entry point guarantees before
    * returning. */
  def evalsSnapshot(): Long = evalAdder.sum()

  /** Compile straight from stored (id, vec, level, edges) rows — the
    * query-path loader. Skips the [[LocalHnsw]] node-map intermediate
    * (`fromTuples` allocates a Node + LongMap entry + per-layer
    * LongArrayLists per row, all garbage the moment compile() finishes;
    * on the per-job rebuild paths that intermediate dominated the
    * rebuild's allocation). Structure-identical to
    * `LocalHnsw.fromTuples(rows, metric).compile()`: same ascending-id
    * positions, same entry point (min-id node of the max level — the
    * build-time entry), same stored edge order. */
  def fromTuples(rows: Iterable[(Long, Seq[Double], Int, Seq[Seq[Long]])],
      metric: Metric): CompiledHnsw = {
    val arr = rows.toArray.sortBy(_._1)
    val n = arr.length
    if (n == 0)
      return new CompiledHnsw(Array.emptyLongArray, Array.emptyDoubleArray, 0,
        metric, Array(Array(0)), Array(Array.emptyIntArray), 0, 0)
    val dim = arr(0)._2.length
    val ids = new Array[Long](n)
    val vecs = new Array[Double](n * dim)
    var entry = 0
    var top = -1
    var i = 0
    while (i < n) {
      val (id, v, level, _) = arr(i)
      ids(i) = id
      val it = v.iterator
      var j = i * dim
      while (it.hasNext) { vecs(j) = it.next(); j += 1 }
      // ascending-id scan: the FIRST node at a strictly-higher level
      // wins, which is exactly "min id of the max level"
      if (level > top) { top = level; entry = i }
      i += 1
    }
    val maxLevel = math.max(top, 0)
    val posOf = new scala.collection.mutable.LongMap[Int](n * 2)
    i = 0
    while (i < n) { posOf(ids(i)) = i; i += 1 }
    val nLayers = maxLevel + 1
    val layerOff = new Array[Array[Int]](nLayers)
    val layerAdj = new Array[Array[Int]](nLayers)
    var l = 0
    while (l < nLayers) {
      val off = new Array[Int](n + 1)
      i = 0
      while (i < n) {
        val es = arr(i)._4
        off(i + 1) = off(i) + (if (l < es.length) es(l).length else 0)
        i += 1
      }
      val adj = new Array[Int](off(n))
      i = 0
      while (i < n) {
        val es = arr(i)._4
        if (l < es.length) {
          var w = off(i)
          es(l).foreach { nb =>
            val p = posOf.getOrElse(nb, -1)
            require(p >= 0, s"dangling edge $nb at layer $l")
            adj(w) = p
            w += 1
          }
        }
        i += 1
      }
      layerOff(l) = off
      layerAdj(l) = adj
      l += 1
    }
    new CompiledHnsw(ids, vecs, dim, metric, layerOff, layerAdj, entry, maxLevel)
  }
}

/** Reusable per-thread search state: epoch-stamped visited array and the
  * two walk heaps. Never shared across threads; a walk runs start-to-
  * finish on one thread with no internal joins, so per-thread reuse is
  * re-entrancy-safe even on the ForkJoin common pool. */
private[graft] final class HnswScratch {
  var stamp: Array[Int] = new Array[Int](0)
  var epoch = 0
  val frontier = new PosDistHeap(maxHeap = false)
  val results = new PosDistHeap(maxHeap = true)

  def begin(n: Int): Unit = {
    if (stamp.length < n) { stamp = new Array[Int](n); epoch = 0 }
    epoch += 1
    if (epoch == Int.MaxValue) { java.util.Arrays.fill(stamp, 0); epoch = 1 }
    frontier.clear()
    results.clear()
  }
}

/** [[DistHeap]] over (dist, position) with O(1) clear — position order
  * is id order in a [[CompiledHnsw]], so the lexicographic (dist, pos)
  * comparisons here are exactly the engine-wide (dist, id). */
private[graft] final class PosDistHeap(maxHeap: Boolean) {
  private var ds = new Array[Double](64)
  private var ps = new Array[Int](64)
  var size = 0

  @inline private def before(d1: Double, p1: Int, d2: Double, p2: Int): Boolean =
    if (maxHeap) d1 > d2 || (d1 == d2 && p1 > p2)
    else d1 < d2 || (d1 == d2 && p1 < p2)

  def peekDist: Double = ds(0)
  def peekPos: Int = ps(0)
  def clear(): Unit = size = 0

  def add(d: Double, pos: Int): Unit = {
    if (size == ds.length) {
      ds = java.util.Arrays.copyOf(ds, size * 2)
      ps = java.util.Arrays.copyOf(ps, size * 2)
    }
    var i = size
    size += 1
    while (i > 0 && before(d, pos, ds((i - 1) / 2), ps((i - 1) / 2))) {
      val p = (i - 1) / 2
      ds(i) = ds(p); ps(i) = ps(p); i = p
    }
    ds(i) = d; ps(i) = pos
  }

  def poll(): Unit = {
    size -= 1
    val d = ds(size)
    val pos = ps(size)
    var i = 0
    var done = false
    while (!done) {
      var c = 2 * i + 1
      if (c >= size) done = true
      else {
        if (c + 1 < size && before(ds(c + 1), ps(c + 1), ds(c), ps(c))) c += 1
        if (before(ds(c), ps(c), d, pos)) { ds(i) = ds(c); ps(i) = ps(c); i = c }
        else done = true
      }
    }
    ds(i) = d; ps(i) = pos
  }
}
