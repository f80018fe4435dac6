package graft.index

import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import graft.core.Metric

/** Concurrent single-graph HNSW build over the flat-packed layout of
  * [[HnswBuilder]] — the build-throughput answer for the ONE-big-graph
  * serving shape (the apples-to-apples bench row built 100k rows
  * sequentially in ~2 min while the reference's own single graph builds
  * in 18 s; graph builds are embarrassingly parallel ACROSS shards, but a
  * single graph admits no partition parallelism, so parallelism has to
  * come from concurrent inserts).
  *
  * Standard lock-based concurrent insertion as published for HNSW
  * (Malkov & Yashunin, TPAMI 2018 §4; the design every in-memory HNSW
  * library ships): positions and levels are fixed up front from the
  * sorted id array, the entry point is pre-pinned to the first max-level
  * node (the same node the sequential build ends with), and worker
  * threads claim nodes in ascending-position order from a shared counter.
  * Each insert searches the live graph and links under per-node striped
  * locks:
  *
  *  - edge-list READS (descend / searchLayer expansion) are LOCK-FREE:
  *    the count is read with acquire semantics (paired with the
  *    writer's release-store, so a count of k guarantees ≥ k published
  *    entries behind it), and the entries with plain loads. A read can
  *    race a concurrent prune's in-place rewrite and see a mix of old
  *    and new neighbors — harmless by construction: every slot ever
  *    written (and the zero default) is a valid node position, the
  *    visited stamp dedupes, and edge selection is already declared
  *    interleaving-dependent. The first cut of this builder locked
  *    reads hnswlib-style and got 2.6× on 32 threads — every walk
  *    expansion bounced hub nodes' monitors across cores; lock-free
  *    reads are where the scaling lives.
  *  - edge APPENDS take the target's stripe, dedupe by scan (concurrent
  *    inserts can discover each other from both sides — the sequential
  *    build's ascending-id order makes that impossible, here it is
  *    routine), prune to the layer cap before releasing, and publish
  *    the new count with a release-store;
  *  - distance evaluations stay outside every lock; per-thread scratch
  *    (visited stamps, heaps, candidate buffers) is identical to the
  *    sequential kernel's.
  *
  * NOT deterministic: which nodes an insert's search can see depends on
  * thread interleaving, so edge selections — and therefore query recall
  * in the third decimal — vary run to run. Every degree cap, the level
  * function, the entry rule, and the (dist, pos) ≡ (dist, id) tie-break
  * inside each search are the sequential kernel's; only the insertion
  * interleaving differs. The deterministic sharded [[HnswIndex.build]]
  * remains the production path (task retries must not change a shard's
  * graph); this builder runs DRIVER-LOCAL only, where a retry re-runs
  * the whole build and determinism buys nothing.
  */
private[graft] final class HnswParallelBuilder(m: Int, efConstruction: Int,
    metric: Metric, ids: Array[Long], vecsPacked: Array[Double], val dim: Int,
    threads: Int) {
  require(ids.length > 0, "empty build")
  require(dim > 0 && vecsPacked.length == ids.length.toLong * dim,
    s"packed vectors: ${vecsPacked.length} doubles != ${ids.length} × $dim")
  require(threads >= 1, s"threads must be >= 1, got $threads")

  private val n = ids.length
  private val s0 = 2 * m + 2 // layer-0 stride: count + 2M forward + 1 transient
  private val su = m + 2 // upper-layer stride: count + M forward + 1 transient

  require(n.toLong * s0 <= Int.MaxValue,
    s"HnswParallelBuilder: n=$n overflows the adjacency arrays")

  private val vecs = vecsPacked
  private val levels = new Array[Int](n)
  private val adj0 = new Array[Int](n * s0)
  private val dst0 = new Array[Double](n * s0)
  private val upper = new Array[Array[Int]](n)
  private val upperD = new Array[Array[Double]](n)
  private var entryPos = -1
  private var maxLevel = 0

  // Striped per-node monitors. Only ever ONE stripe held at a time
  // (append/prune touch a single node's lists; reads copy one list), so
  // stripe collisions cost contention, never deadlock.
  private val StripeMask = 2047
  private val stripes = Array.fill(StripeMask + 1)(new Object)
  @inline private def stripe(pos: Int): Object = stripes(pos & StripeMask)

  @inline private def key(q: Array[Double], pos: Int): Double =
    metric.walkKeyScalar(q, vecs, pos * dim, dim)

  @inline private def adjOff(pos: Int, layer: Int): (Array[Int], Int) =
    if (layer == 0) (adj0, pos * s0) else (upper(pos), (layer - 1) * su)

  @inline private def dstOf(pos: Int, layer: Int): Array[Double] =
    if (layer == 0) dst0 else upperD(pos)

  @inline private def capOf(layer: Int): Int = if (layer == 0) 2 * m else m

  // Count publication uses the static fence pair (releaseFence before
  // the writer's count store / acquireFence after the reader's count
  // load) rather than an arrayElementVarHandle: scalac 2.13 has no
  // signature-polymorphic support for VarHandle, so vh.getAcquire(...)
  // .asInstanceOf[Int] compiles to an Object-returning call that BOXES
  // an Integer per edge-list read — millions per second on the walk
  // path (measured: the boxed variant built SLOWER than fully locked
  // reads). Fences are compiler barriers only on x86/TSO and keep the
  // loads primitive.
  @inline private def acquireFence(): Unit = java.lang.invoke.VarHandle.acquireFence()
  @inline private def releaseFence(): Unit = java.lang.invoke.VarHandle.releaseFence()

  /** Per-worker walk scratch — the sequential kernel's fields, one set
    * per thread. `edgeBuf` receives locked edge-list snapshots. */
  private final class Scratch {
    val stamp = new Array[Int](n)
    var epoch = 0
    val frontier = new PosDistHeap(maxHeap = false)
    val results = new PosDistHeap(maxHeap = true)
    val keep = new BoundedTopK(math.max(2 * m, 1))
    var candBuf = new Array[Int](math.max(efConstruction, 16))
    var candDist = new Array[Double](math.max(efConstruction, 16))
    val edgeBuf = new Array[Int](math.max(s0, su))
    val q = new Array[Double](dim)
  }

  /** Snapshot `pos`'s layer edge list into `sc.edgeBuf`; returns count.
    * Lock-free: acquire-read of the count, plain entry loads (racy by
    * design — see the class note). */
  @inline private def copyEdges(pos: Int, layer: Int, sc: Scratch): Int = {
    val (a, off) = adjOff(pos, layer)
    val raw = a(off)
    acquireFence() // entries behind this count were released before it
    val cnt = math.min(raw, capOf(layer)) // defensive clamp vs mid-append counts
    System.arraycopy(a, off + 1, sc.edgeBuf, 0, cnt)
    cnt
  }

  private def descend(q: Array[Double], from: Int, fromLayer: Int, downTo: Int,
      sc: Scratch): Int = {
    var curr = from
    var currDist = key(q, curr)
    var lc = fromLayer
    while (lc > downTo) {
      var changed = true
      while (changed) {
        changed = false
        if (lc <= levels(curr)) {
          val cnt = copyEdges(curr, lc, sc)
          var e = 0
          while (e < cnt) {
            val nb = sc.edgeBuf(e)
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

  /** ef-bounded best-first expansion; survivors land in `sc.candBuf`
    * ascending (dist, pos). Same walk as the sequential kernel with
    * locked edge snapshots. */
  private def searchLayer(q: Array[Double], entry: Int, ef: Int, layer: Int,
      sc: Scratch): Int = {
    sc.epoch += 1
    if (sc.epoch == Int.MaxValue) { java.util.Arrays.fill(sc.stamp, 0); sc.epoch = 1 }
    val stamp = sc.stamp
    val ep = sc.epoch
    val frontier = sc.frontier
    val results = sc.results
    frontier.clear(); results.clear()
    val d0 = key(q, entry)
    frontier.add(d0, entry); results.add(d0, entry); stamp(entry) = ep
    var done = false
    while (!done && frontier.size > 0) {
      val cd = frontier.peekDist
      val ci = frontier.peekPos
      if (cd > results.peekDist || (cd == results.peekDist && ci > results.peekPos)) {
        done = true
      } else {
        frontier.poll()
        if (layer <= levels(ci)) {
          val cnt = copyEdges(ci, layer, sc)
          var e = 0
          while (e < cnt) {
            val nb = sc.edgeBuf(e)
            if (stamp(nb) != ep) {
              stamp(nb) = ep
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
    if (sc.candBuf.length < cnt) {
      sc.candBuf = new Array[Int](cnt)
      sc.candDist = new Array[Double](cnt)
    }
    var i = cnt - 1
    while (i >= 0) {
      sc.candBuf(i) = results.peekPos
      sc.candDist(i) = results.peekDist
      results.poll()
      i -= 1
    }
    cnt
  }

  /** Keep the `mMax` nearest stored edges — MUST hold `stripe(pos)`. */
  private def pruneLocked(pos: Int, layer: Int, mMax: Int, sc: Scratch): Unit = {
    val (a, off) = adjOff(pos, layer)
    val ds = dstOf(pos, layer)
    val cnt = a(off)
    val keep = sc.keep
    keep.size = 0
    var e = 1
    while (e <= cnt) {
      keep.insert(a(off + e).toLong, ds(off + e))
      e += 1
    }
    val take = math.min(mMax, keep.size)
    var r = 0
    while (r < take) {
      a(off + 1 + r) = keep.ids(r).toInt
      ds(off + 1 + r) = keep.dists(r)
      r += 1
    }
    releaseFence() // publish entries before the count
    a(off) = take
  }

  /** Append edge `target → nb` (stored key `d`) under the target's
    * stripe: dedupe by scan, then prune back to the layer cap. */
  private def appendEdge(target: Int, layer: Int, nb: Int, d: Double,
      mMax: Int, sc: Scratch): Unit =
    stripe(target).synchronized {
      val (a, off) = adjOff(target, layer)
      val ds = dstOf(target, layer)
      var cnt = a(off)
      var e = 1
      while (e <= cnt) {
        if (a(off + e) == nb) return
        e += 1
      }
      if (cnt > mMax) { // defensive: should be unreachable (prune-on-append)
        pruneLocked(target, layer, mMax, sc); cnt = a(off)
      }
      a(off + cnt + 1) = nb
      ds(off + cnt + 1) = d
      releaseFence() // publish the entry before the count
      a(off) = cnt + 1
      if (cnt + 1 > mMax) pruneLocked(target, layer, mMax, sc)
    }

  private def insert(pos: Int, sc: Scratch): Unit = {
    val q = sc.q
    System.arraycopy(vecs, pos * dim, q, 0, dim)
    val level = levels(pos)
    var curr =
      if (pos == entryPos) pos
      else descend(q, entryPos, maxLevel, level, sc)
    var lc = math.min(level, maxLevel)
    while (lc >= 0) {
      val cnt = searchLayer(q, curr, efConstruction, lc, sc)
      val mMax = capOf(lc)
      var taken = 0
      var t = 0
      while (t < cnt && taken < mMax) {
        val nbPos = sc.candBuf(t)
        // self can surface here: a concurrent insert may already have
        // linked back to `pos`, making it reachable from its own search
        if (nbPos != pos) {
          val nbDist = sc.candDist(t)
          appendEdge(pos, lc, nbPos, nbDist, mMax, sc)
          if (lc <= levels(nbPos)) appendEdge(nbPos, lc, pos, nbDist, mMax, sc)
          taken += 1
        }
        t += 1
      }
      // next layer's entry: the nearest non-self survivor
      var c = 0
      var found = false
      while (c < cnt && !found) {
        if (sc.candBuf(c) != pos) { curr = sc.candBuf(c); found = true }
        c += 1
      }
      lc -= 1
    }
  }

  /** Run the build: pin levels and the entry, fan inserts across
    * `threads` workers claiming positions in ascending order. */
  def run(): Unit = {
    var pos = 0
    while (pos < n) {
      require(pos == 0 || ids(pos) > ids(pos - 1),
        s"HnswParallelBuilder requires strictly ascending ids at $pos")
      val level = HnswIndex.levelOf(ids(pos), m)
      levels(pos) = level
      if (level > 0) {
        upper(pos) = new Array[Int](level * su)
        upperD(pos) = new Array[Double](level * su)
      }
      if (level > maxLevel || entryPos < 0) { maxLevel = level; entryPos = pos }
      pos += 1
    }
    // entry rule ≡ sequential: FIRST (lowest id) node of the max level
    var p = 0
    var e = -1
    while (p < n && e < 0) { if (levels(p) == maxLevel) e = p; p += 1 }
    entryPos = e

    val counter = new AtomicInteger(0)
    val failure = new AtomicReference[Throwable](null)
    val workers = Array.tabulate(math.min(threads, n)) { wi =>
      val t = new Thread(() => {
        val sc = new Scratch
        try {
          var i = counter.getAndIncrement()
          while (i < n && failure.get() == null) {
            insert(i, sc)
            i = counter.getAndIncrement()
          }
        } catch {
          case th: Throwable => failure.compareAndSet(null, th)
        }
      }, s"hnsw-par-build-$wi")
      t.setDaemon(true)
      t.start()
      t
    }
    workers.foreach(_.join())
    if (failure.get() != null) throw failure.get()
  }

  /** Freeze straight to the query-time CSR form — zero-copy for the
    * packed vectors and ids (the build arrays ARE the serving arrays),
    * one pass for the adjacency. The in-process serving handoff: build
    * rows → walkable graph with no DataFrame interchange, the same
    * in-memory-to-in-memory shape as the reference's build row
    * (hnsw.go:97-139 builds a struct its own Search walks directly).
    * Structure-identical to `CompiledHnsw.fromTuples(nodeRows…)`:
    * ascending-id positions, min-id-of-max-level entry, stored edge
    * order. Call AFTER [[run]] only. */
  def toCompiled: CompiledHnsw = {
    val nLayers = maxLevel + 1
    val layerOff = new Array[Array[Int]](nLayers)
    val layerAdj = new Array[Array[Int]](nLayers)
    var l = 0
    while (l < nLayers) {
      val off = new Array[Int](n + 1)
      var i = 0
      while (i < n) {
        val cnt = if (l <= levels(i)) { val (a, o) = adjOff(i, l); a(o) } else 0
        off(i + 1) = off(i) + cnt
        i += 1
      }
      val adj = new Array[Int](off(n))
      i = 0
      while (i < n) {
        if (l <= levels(i)) {
          val (a, o) = adjOff(i, l)
          val cnt = a(o)
          var e = 0
          while (e < cnt) { adj(off(i) + e) = a(o + 1 + e); e += 1 }
        }
        i += 1
      }
      layerOff(l) = off
      layerAdj(l) = adj
      l += 1
    }
    new CompiledHnsw(ids, vecs, dim, metric, layerOff, layerAdj, entryPos, maxLevel)
  }

  /** (id, vec, level, edges-per-level) rows — [[HnswBuilder.nodeRows]]'s
    * shape, so the graph frame, IO, and serving layers are shared. */
  def nodeRows: Iterator[(Long, Array[Double], Int, Array[Array[Long]])] =
    (0 until n).iterator.map { pos =>
      val vec = java.util.Arrays.copyOfRange(vecs, pos * dim, (pos + 1) * dim)
      val level = levels(pos)
      val edges = Array.tabulate(level + 1) { l =>
        val (a, off) = adjOff(pos, l)
        val cnt = a(off)
        Array.tabulate(cnt)(e2 => ids(a(off + 1 + e2)))
      }
      (ids(pos), vec, level, edges)
    }
}

private[graft] object HnswParallelBuilder {
  /** Row-array convenience: packs and hands the rows' storage back (each
    * row slot nulls out once copied — peak residency one packed copy). */
  def fromRows(m: Int, efConstruction: Int, metric: Metric, ids: Array[Long],
      vecRows: Array[Array[Double]], threads: Int): HnswParallelBuilder = {
    require(ids.length == vecRows.length, "ids/vectors length mismatch")
    require(ids.length > 0, "empty build")
    val dim = vecRows(0).length
    require(ids.length.toLong * dim <= Int.MaxValue,
      s"n=${ids.length} × dim=$dim overflows the packed vector array")
    val packed = new Array[Double](ids.length * dim)
    var i = 0
    while (i < ids.length) {
      val v = vecRows(i)
      require(v.length == dim, s"ragged vector for id=${ids(i)}")
      System.arraycopy(v, 0, packed, i * dim, dim)
      vecRows(i) = null
      i += 1
    }
    new HnswParallelBuilder(m, efConstruction, metric, ids, packed, dim, threads)
  }
}
