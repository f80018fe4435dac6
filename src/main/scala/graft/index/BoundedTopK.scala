package graft.index

/** Bounded top-k buffer for blocked (mapPartitions) kernels: insertion-
  * sorted primitive arrays ordered ascending by (dist, id) — the engine's
  * deterministic tie-break (flat.go:106-108 refined, SURVEY.md §7.3).
  *
  * A candidate is accepted iff the buffer has room or it beats the
  * current k-th entry; inserts are O(k) shifts on primitive arrays (no
  * boxing, no allocation after construction). Shared by every blocked
  * kernel (flat / PQ-ADC / IVF / IVFPQ) so the tie-break semantics can't
  * drift between paths.
  */
private[index] final class BoundedTopK(k: Int) {
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
}
