package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k-by-distance aggregator (SURVEY.md T1 at scale).
  *
  * The window formulation (`row_number over (partition by query_id)`)
  * shuffles EVERY (query, candidate) distance row — n·q rows — before
  * discarding all but k per query. This aggregator keeps a bounded
  * buffer of the k best candidates per (query, partition) on the map
  * side, so the shuffle carries at most k·partitions rows per query:
  * at 100 TB that is the difference between shuffling terabytes and
  * shuffling kilobytes.
  *
  * Ordering matches the engine contract: ascending (distance,
  * neighbor_id) — the deterministic refinement of the reference's
  * unstable sort (flat.go:106-108).
  */
final case class ScoredId(id: Long, dist: Double)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, mutable.ArrayBuffer[ScoredId], Seq[ScoredId]] {

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.dist < b.dist || (a.dist == b.dist && a.id < b.id)

  override def zero: mutable.ArrayBuffer[ScoredId] = mutable.ArrayBuffer.empty

  override def reduce(buf: mutable.ArrayBuffer[ScoredId], a: ScoredId): mutable.ArrayBuffer[ScoredId] = {
    if (buf.size < k) { buf += a; if (buf.size == k) sortTrim(buf) }
    else if (lt(a, buf.last)) { buf(k - 1) = a; sortTrim(buf) }
    buf
  }

  override def merge(x: mutable.ArrayBuffer[ScoredId], y: mutable.ArrayBuffer[ScoredId]): mutable.ArrayBuffer[ScoredId] = {
    x ++= y
    sortTrim(x)
    if (x.size > k) x.takeInPlace(k)
    x
  }

  private def sortTrim(b: mutable.ArrayBuffer[ScoredId]): Unit =
    b.sortInPlaceWith(lt)

  override def finish(buf: mutable.ArrayBuffer[ScoredId]): Seq[ScoredId] =
    buf.sortWith(lt).take(k).toSeq

  override def bufferEncoder: Encoder[mutable.ArrayBuffer[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object TopKAggregator {
  /** Column form: `topk(k)(neighbor_id, rank_key)` → ARRAY<STRUCT<id,
    * dist>> sorted ascending. */
  def topk(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    (id, dist) => fn(id, dist)
  }
}
