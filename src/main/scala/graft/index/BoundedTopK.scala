package graft.index

/** Bounded top-k buffer for blocked (mapPartitions) kernels: insertion-
  * sorted primitive arrays ordered ascending by (dist, id) — the engine's
  * deterministic tie-break (flat.go:106-108 refined, SURVEY.md §7.3).
  *
  * A candidate is accepted iff the buffer has room or it beats the
  * current k-th entry; inserts are O(k) shifts on primitive arrays (no
  * boxing, no allocation after construction). Shared by every blocked
  * kernel (flat / PQ-ADC / IVF / IVFPQ / LSH) and the serving merge so
  * the tie-break semantics can't drift between paths.
  */
private[graft] final class BoundedTopK(k: Int) {
  // k == 0 would make insert() read dists(-1); callers clamp k <= 0 to the
  // "all rows" path before constructing (flat.go:82-84), so fail loudly here
  require(k > 0, s"BoundedTopK requires k > 0, got $k")
  val dists = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  def insert(id: Long, d: Double): Unit = {
    val sz = size
    if (sz < k || d < dists(sz - 1) || (d == dists(sz - 1) && id < ids(sz - 1))) {
      var pos = if (sz < k) sz else k - 1
      while (pos > 0 && (dists(pos - 1) > d ||
          (dists(pos - 1) == d && ids(pos - 1) > id))) {
        dists(pos) = dists(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
      }
      dists(pos) = d; ids(pos) = id
      if (sz < k) size = sz + 1
    }
  }

  /** [[insert]] that skips an id already buffered — the replicated-graph
    * merge path ([[RoutedHnswIndex]] closure assignment): the same vector
    * can surface from several probed regions with an identical,
    * deterministic rank key, and the duplicate must not occupy a second
    * slot (displacing a real candidate). O(size) primitive scan — same
    * cost class as the O(k) shift insert. */
  def insertDistinct(id: Long, d: Double): Unit = {
    var i = 0
    val sz = size
    while (i < sz) { if (ids(i) == id) return; i += 1 }
    insert(id, d)
  }

  /** This buffer's (id, dist) entries, ascending. */
  def drainIterator: Iterator[(Long, Double)] =
    (0 until size).iterator.map(r => (ids(r), dists(r)))

  /** (id, dist, rank) with rank 1..size. */
  def ranked: Array[(Long, Double, Int)] =
    Array.tabulate(size)(r => (ids(r), dists(r), r + 1))
}

private[graft] object BoundedTopK {
  /** Flatten one partition's per-query heaps into the partial-result rows
    * every blocked kernel emits: (query_id, neighbor_id, rank_key). */
  def drain(heaps: Array[BoundedTopK], qids: Array[Long]): Iterator[(Long, Long, Double)] =
    heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
      (0 until h.size).iterator.map(r => (qids(qi), h.ids(r), h.dists(r)))
    }
}
