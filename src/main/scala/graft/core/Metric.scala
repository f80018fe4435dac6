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
sealed trait Metric {
  def name: String
  def distance(a: Column, b: Column): Column
  /** Monotone in `distance`; safe to rank/threshold-compare by. */
  def rankKey(a: Column, b: Column): Column = distance(a, b)
  /** Recover the reported distance from the rank key. */
  def finishRank(rk: Column): Column = rk
}

object Metric {
  case object L2 extends Metric {
    val name = "l2"
    def distance(a: Column, b: Column): Column = l2(a, b)
    override def rankKey(a: Column, b: Column): Column = l2Sq(a, b)
    override def finishRank(rk: Column): Column =
      org.apache.spark.sql.functions.sqrt(rk)
  }
  case object Cosine extends Metric {
    val name = "cosine"
    def distance(a: Column, b: Column): Column = cosineDistance(a, b)
  }
  case object Dot extends Metric {
    val name = "dot"
    def distance(a: Column, b: Column): Column = innerProductDistance(a, b)
  }

  val all: Seq[Metric] = Seq(L2, Cosine, Dot)

  /** Factory semantics of metric.go:25-36 — unknown names error. */
  def apply(name: String): Metric =
    all.find(_.name == name.toLowerCase).getOrElse {
      throw new IllegalArgumentException(
        s"unknown metric '$name' (expected one of ${all.map(_.name).mkString(", ")})")
    }
}
