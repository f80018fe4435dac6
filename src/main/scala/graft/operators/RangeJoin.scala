package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed time-range join — the scale-correct form of
  * `a.key = b.key AND b.t ∈ (a.t, a.t + window]`.
  *
  * Written naively, that predicate is a non-equi join: Catalyst's only
  * physical strategy is BroadcastNestedLoopJoin — O(|A|·|B|) per key and
  * a driver-killer the moment neither side broadcasts. The standard
  * scale shape bins time into window-width buckets: a right row lives in
  * exactly one bin, a candidate left row in exactly two (its own and the
  * next — any match within `window` must land there, and the two bins
  * are distinct so no pair can match twice). The join becomes a pure
  * equi-join on (key, bin) — shuffle volume 2|A| + |B| rows, hash/merge
  * joinable, AQE-skew-splittable — followed by the exact range filter.
  *
  * Inputs are normalized frames with columns (key, id, us): the join
  * key, a row id, and an integer (microsecond) timestamp. `div` keeps
  * the binning in exact integer arithmetic — epoch-µs values exceed
  * double's 2^53 integer range within this century's timestamps when
  * multiplied, and a float bin boundary would mis-bucket edge rows.
  */
object RangeJoin {

  /** Ordered pairs (a, b), same key, `us_b ∈ (us_a, us_a + windowUs]` →
    * (key, id_a, id_b, gap_us). */
  def pairs(left: DataFrame, right: DataFrame, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    val a = left.select(col("key"), col("id").as("id_a"), col("us").as("us_a"),
      explode(array(expr(s"us div ${windowUs}L"), expr(s"us div ${windowUs}L") + 1L)).as("bin"))
    val b = right.select(col("key"), col("id").as("id_b"), col("us").as("us_b"),
      expr(s"us div ${windowUs}L").as("bin"))
    a.join(b, Seq("key", "bin"))
      .where(col("us_b") > col("us_a") && col("us_b") <= col("us_a") + windowUs)
      .select(col("key"), col("id_a"), col("id_b"),
        (col("us_b") - col("us_a")).as("gap_us"))
  }
}
