package graft.index

import graft.core.Metric

/** Position-interned, flat-packed HNSW build kernel — the build-side
  * counterpart of [[CompiledHnsw]] (VERDICT r10 measured the query-side
  * CSR compile at 2× identical-recall throughput; the build walks pay
  * the same per-eval overheads this removes).
  *
  * [[LocalHnsw]] keys every distance evaluation through a long→Node hash
  * map and a per-node vector object; at efConstruction=200 an insert runs
  * thousands of evaluations, so the map lookup + pointer chase dominate
  * build profiles. Here the graph lives in primitive arrays for the whole
  * build:
  *
  *  - vectors packed flat at `pos·dim` (positions are insertion order);
  *  - layer-0 adjacency in one fixed-stride int array
  *    (`[count | ≤2M+1 neighbor positions]` per node — 2M forward cap
  *    plus one transient back-edge slot before prune trims);
  *  - upper-layer adjacency per multi-level node (a few % of nodes) in
  *    one small int array with the same `[count | …]` layout per layer;
  *  - walk state in an epoch-stamped visited array + two [[PosDistHeap]]s
  *    reused across inserts (steady-state insert allocates nothing).
  *
  * Bit-identity with [[LocalHnsw]] (HnswBuilderSpec fuzzes graph-level
  * equality): insertion MUST be ascending by id — then position order is
  * id order, so every (dist, pos) comparison here is exactly LocalHnsw's
  * engine-wide (dist, id) tie-break; edge lists hold the same nodes in
  * the same order (insertion order, prune rewrites ascending (dist, id));
  * and [[Metric.walkKeyScalar]]'s offset form computes the same value
  * sequence as its two-array form. Same input → the same graph, byte for
  * byte, as `LocalHnsw.insert` over the same rows.
  *
  * Semantics per the reference: greedy descent (hnsw.go:156-173 /
  * 295-312), ef-bounded layer expansion (hnsw.go:343-394), M-nearest
  * neighbor selection (2M at layer 0, hnsw.go:314-341), bidirectional
  * edges with prune-to-M back-pressure (hnsw.go:414-431).
  */
private[graft] final class HnswBuilder(m: Int, efConstruction: Int,
    metric: Metric, capacity: Int) {
  require(capacity > 0, s"capacity must be > 0, got $capacity")

  private val s0 = 2 * m + 2 // layer-0 stride: count + 2M forward + 1 transient
  private val su = m + 2 // upper-layer stride: count + M forward + 1 transient

  require(capacity.toLong * s0 <= Int.MaxValue,
    s"HnswBuilder: capacity $capacity overflows the layer-0 adjacency array")

  private val ids = new Array[Long](capacity)
  private var vecs: Array[Double] = null
  private var dim = -1
  private val levels = new Array[Int](capacity)
  private val adj0 = new Array[Int](capacity * s0)
  private val upper = new Array[Array[Int]](capacity)
  // per-edge distance cache, parallel to the adjacency slots: every edge
  // is created WITH its walk key already evaluated (forward edges from
  // the searchLayer survivors, back edges from the same pair), and every
  // metric's walk key is bit-symmetric (L2/Manhattan: (a−b)² / |a−b|
  // under exact IEEE negation; Dot/Cosine: commutative products), so
  // prune can select the M nearest from STORED keys — zero distance
  // evaluations — and still match LocalHnsw.prune's re-evaluated
  // selection bit-for-bit (HnswBuilderSpec's prune-heavy case pins it).
  private val dst0 = new Array[Double](capacity * s0)
  private val upperD = new Array[Array[Double]](capacity)
  private var n = 0
  private var entryPos = -1
  private var maxLevel = 0

  // per-builder walk scratch (builders are single-threaded by contract)
  private val stamp = new Array[Int](capacity)
  private var epoch = 0
  private val frontier = new PosDistHeap(maxHeap = false)
  private val results = new PosDistHeap(maxHeap = true)
  private val keep = new BoundedTopK(math.max(2 * m, 1))
  // searchLayer survivors drained ascending (dist, pos) per insert
  private var candBuf = new Array[Int](math.max(efConstruction, 16))
  private var candDist = new Array[Double](math.max(efConstruction, 16))

  @inline private def key(q: Array[Double], pos: Int): Double =
    metric.walkKeyScalar(q, vecs, pos * dim, dim)

  @inline private def adjOff(pos: Int, layer: Int): (Array[Int], Int) =
    if (layer == 0) (adj0, pos * s0) else (upper(pos), (layer - 1) * su)

  @inline private def dstOf(pos: Int, layer: Int): Array[Double] =
    if (layer == 0) dst0 else upperD(pos)

  /** Greedy hill-descent from `from` at `fromLayer` down to (excl.)
    * `downTo` — comparison-for-comparison [[LocalHnsw.descend]]. */
  private def descend(q: Array[Double], from: Int, fromLayer: Int, downTo: Int): Int = {
    var curr = from
    var currDist = key(q, curr)
    var lc = fromLayer
    while (lc > downTo) {
      var changed = true
      while (changed) {
        changed = false
        if (lc <= levels(curr)) {
          val (a, off) = adjOff(curr, lc)
          val cnt = a(off)
          var e = 1
          while (e <= cnt) {
            val nb = a(off + e)
            val d = key(q, nb)
            if (d < currDist) { currDist = d; curr = nb; changed = true }
            e += 1
          }
        }
      }
      lc -= 1
    }
    curr
  }

  /** ef-bounded best-first expansion at one layer; leaves the ef best
    * survivors in `results` (worst at the root) and drains them into
    * `candBuf` ascending (dist, pos). Returns the survivor count.
    * Mirrors [[LocalHnsw.searchLayer]] comparison-for-comparison —
    * (dist, pos) ≡ (dist, id) under ascending-id insertion. */
  private def searchLayer(q: Array[Double], entry: Int, ef: Int, layer: Int): Int = {
    epoch += 1
    if (epoch == Int.MaxValue) { java.util.Arrays.fill(stamp, 0); epoch = 1 }
    frontier.clear()
    results.clear()
    val d0 = key(q, entry)
    frontier.add(d0, entry); results.add(d0, entry); stamp(entry) = epoch
    var done = false
    while (!done && frontier.size > 0) {
      val cd = frontier.peekDist
      val ci = frontier.peekPos
      if (cd > results.peekDist || (cd == results.peekDist && ci > results.peekPos)) {
        done = true
      } else {
        frontier.poll()
        if (layer <= levels(ci)) {
          val (a, off) = adjOff(ci, layer)
          val cnt = a(off)
          var e = 1
          while (e <= cnt) {
            val nb = a(off + e)
            if (stamp(nb) != epoch) {
              stamp(nb) = epoch
              val d = key(q, nb)
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
    }
    val cnt = results.size
    if (candBuf.length < cnt) {
      candBuf = new Array[Int](cnt)
      candDist = new Array[Double](cnt)
    }
    var i = cnt - 1
    while (i >= 0) {
      candBuf(i) = results.peekPos
      candDist(i) = results.peekDist
      results.poll()
      i -= 1
    }
    cnt
  }

  /** Keep the mMax nearest of a node's layer edges — [[LocalHnsw.prune]]
    * through the same (dist, id) [[BoundedTopK]] selection, over the
    * STORED per-edge keys (bit-equal to re-evaluation by symmetry — see
    * the cache's field note), so prune costs zero distance evaluations. */
  private def prune(pos: Int, layer: Int, mMax: Int): Unit = {
    val (a, off) = adjOff(pos, layer)
    val ds = dstOf(pos, layer)
    val cnt = a(off)
    keep.size = 0
    // BoundedTopK is fixed at 2m capacity; layer caps are m or 2m ≤ that,
    // so emulate the bound by manual trim: insert all, then keep mMax.
    // (dist, pos) order ≡ (dist, id); LocalHnsw keeps the mMax nearest.
    var e = 1
    while (e <= cnt) {
      keep.insert(a(off + e).toLong, ds(off + e))
      e += 1
    }
    val take = math.min(mMax, keep.size)
    a(off) = take
    var r = 0
    while (r < take) {
      a(off + 1 + r) = keep.ids(r).toInt
      ds(off + 1 + r) = keep.dists(r)
      r += 1
    }
  }

  /** Insert `(id, vec)` — ids MUST arrive strictly ascending (the build
    * paths sort first; this is what makes position order ≡ id order). */
  def insert(id: Long, vec: Array[Double]): Unit = {
    require(n == 0 || id > ids(n - 1),
      s"HnswBuilder requires strictly ascending ids; got $id after ${ids(n - 1)}")
    require(n < capacity, s"HnswBuilder capacity $capacity exceeded")
    if (dim < 0) {
      dim = vec.length
      require(capacity.toLong * dim <= Int.MaxValue,
        s"HnswBuilder: capacity $capacity × dim $dim overflows the packed vector array")
      vecs = new Array[Double](capacity * dim)
    }
    require(vec.length == dim, s"ragged vector for id=$id: ${vec.length} != $dim")
    val pos = n
    val level = HnswIndex.levelOf(id, m)
    ids(pos) = id
    System.arraycopy(vec, 0, vecs, pos * dim, dim)
    levels(pos) = level
    if (level > 0) {
      upper(pos) = new Array[Int](level * su)
      upperD(pos) = new Array[Double](level * su)
    }
    n += 1
    if (pos == 0) { entryPos = 0; maxLevel = level; return }
    var curr = descend(vec, entryPos, maxLevel, level)
    var lc = math.min(level, maxLevel)
    while (lc >= 0) {
      val cnt = searchLayer(vec, curr, efConstruction, lc)
      val mMax = if (lc == 0) m * 2 else m
      val take = math.min(mMax, cnt)
      val (na, noff) = adjOff(pos, lc)
      val nds = dstOf(pos, lc)
      var t = 0
      while (t < take) {
        val nbPos = candBuf(t)
        val nbDist = candDist(t)
        // forward edge in candidate order (ascending (dist, id))
        na(noff) += 1
        na(noff + na(noff)) = nbPos
        nds(noff + na(noff)) = nbDist
        if (lc <= levels(nbPos)) {
          val (ba, boff) = adjOff(nbPos, lc)
          val bds = dstOf(nbPos, lc)
          ba(boff) += 1
          ba(boff + ba(boff)) = pos
          bds(boff + ba(boff)) = nbDist
          if (ba(boff) > mMax) prune(nbPos, lc, mMax)
        }
        t += 1
      }
      if (cnt > 0) curr = candBuf(0)
      lc -= 1
    }
    if (level > maxLevel) { maxLevel = level; entryPos = pos }
  }

  /** (id, vec, level, edges-per-level) rows for the graph table — the
    * same shape [[LocalHnsw.nodeRows]] emits (edges as ids). */
  def nodeRows: Iterator[(Long, Array[Double], Int, Array[Array[Long]])] =
    (0 until n).iterator.map { pos =>
      val vec = java.util.Arrays.copyOfRange(vecs, pos * dim, (pos + 1) * dim)
      val level = levels(pos)
      val edges = Array.tabulate(level + 1) { l =>
        val (a, off) = adjOff(pos, l)
        val cnt = a(off)
        Array.tabulate(cnt)(e => ids(a(off + 1 + e)))
      }
      (ids(pos), vec, level, edges)
    }
}
