package graft.core

import org.apache.spark.sql.Column
import graft.functions.VectorFunctions._

/** The reference's metric enum `"l2" | "cosine" | "dot"`
  * (pkg/metric/metric.go:12-16) as a sealed ADT. Each metric provides
  *  - `distance`: the user-facing distance expression, and
  *  - `rankKey`: a monotone-equivalent cheaper comparator used for top-k
  *    ranking (sqrt deferred, SURVEY.md §4).
  *
  * Adding a metric = adding one case here — the reference's `Metric`
  * interface extension point (metric.go:19-22, SURVEY.md §2.10).
  */
sealed trait Metric extends Serializable {
  def name: String
  def distance(a: Column, b: Column): Column
  /** Monotone in `distance`; safe to rank/threshold-compare by. */
  def rankKey(a: Column, b: Column): Column = distance(a, b)
  /** Recover the reported distance from the rank key. */
  def finishRank(rk: Column): Column = rk
  /** Scalar form of [[rankKey]] for blocked (mapPartitions) kernels —
    * must match the column expression bit-for-bit (same fold order). */
  def rankKeyScalar(a: Array[Double], b: Array[Double]): Double
  /** [[rankKeyScalar]] against a row packed at `off` in a flat block —
    * the serving-cache layout (one primitive array per partition, no
    * per-row object). Identical fold order to the two-array form. */
  def rankKeyScalar(q: Array[Double], data: Array[Double], off: Int, dim: Int): Double
  /** Scalar form of [[finishRank]] for driver-merged serving. */
  def finishRankScalar(rk: Double): Double = rk
}

object Metric {
  private def dotS(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  private def dotOff(q: Array[Double], data: Array[Double], off: Int, dim: Int): Double = {
    val n = math.min(q.length, dim)
    var acc = 0.0; var i = 0
    while (i < n) { acc += q(i) * data(off + i); i += 1 }
    acc
  }

  case object L2 extends Metric {
    val name = "l2"
    def distance(a: Column, b: Column): Column = l2(a, b)
    override def rankKey(a: Column, b: Column): Column = l2Sq(a, b)
    override def finishRank(rk: Column): Column =
      org.apache.spark.sql.functions.sqrt(rk)
    def rankKeyScalar(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { val t = a(i) - b(i); acc += t * t; i += 1 }
      acc
    }
    def rankKeyScalar(q: Array[Double], data: Array[Double], off: Int, dim: Int): Double = {
      val n = math.min(q.length, dim)
      var acc = 0.0; var i = 0
      while (i < n) { val t = q(i) - data(off + i); acc += t * t; i += 1 }
      acc
    }
    override def finishRankScalar(rk: Double): Double = math.sqrt(rk)
  }
  case object Cosine extends Metric {
    val name = "cosine"
    def distance(a: Column, b: Column): Column = cosineDistance(a, b)
    def rankKeyScalar(a: Array[Double], b: Array[Double]): Double = {
      val na = math.sqrt(dotS(a, a))
      val nb = math.sqrt(dotS(b, b))
      if (na == 0.0 || nb == 0.0) 1.0
      else 1.0 - math.min(1.0, math.max(-1.0, dotS(a, b) / (na * nb)))
    }
    def rankKeyScalar(q: Array[Double], data: Array[Double], off: Int, dim: Int): Double = {
      var nb2 = 0.0
      var i = 0
      while (i < dim) { val x = data(off + i); nb2 += x * x; i += 1 }
      val na = math.sqrt(dotS(q, q))
      val nb = math.sqrt(nb2)
      if (na == 0.0 || nb == 0.0) 1.0
      else 1.0 - math.min(1.0, math.max(-1.0, dotOff(q, data, off, dim) / (na * nb)))
    }
  }
  case object Dot extends Metric {
    val name = "dot"
    def distance(a: Column, b: Column): Column = innerProductDistance(a, b)
    def rankKeyScalar(a: Array[Double], b: Array[Double]): Double = -dotS(a, b)
    def rankKeyScalar(q: Array[Double], data: Array[Double], off: Int, dim: Int): Double =
      -dotOff(q, data, off, dim)
  }
  /** Manhattan/L1 — the first metric extension on the reference roadmap
    * (docs/roadmap.md:89, never shipped there); it drops into the ADT
    * exactly as metric.go:19-22's interface intends. The roadmap's other
    * two (Hamming, Jaccard) are set/bit-domain measures and already
    * exist where they belong — Hamming over SimHash fingerprints
    * (simhash_near_pairs) and token-set Jaccard in the near-dup verify
    * (TextFunctions.jaccard) — not over float vectors. */
  case object Manhattan extends Metric {
    val name = "manhattan"
    def distance(a: Column, b: Column): Column = l1(a, b)
    def rankKeyScalar(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += math.abs(a(i) - b(i)); i += 1 }
      acc
    }
    def rankKeyScalar(q: Array[Double], data: Array[Double], off: Int, dim: Int): Double = {
      val n = math.min(q.length, dim)
      var acc = 0.0; var i = 0
      while (i < n) { acc += math.abs(q(i) - data(off + i)); i += 1 }
      acc
    }
  }

  val all: Seq[Metric] = Seq(L2, Cosine, Dot, Manhattan)

  /** Factory semantics of metric.go:25-36 — unknown names error. */
  def apply(name: String): Metric =
    all.find(_.name == name.toLowerCase).getOrElse {
      throw new IllegalArgumentException(
        s"unknown metric '$name' (expected one of ${all.map(_.name).mkString(", ")})")
    }
}
