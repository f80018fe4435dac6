package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark lacks natively (SURVEY.md §2.4 notes
  * the reference has none either; this is part of the beyond-reference
  * pipeline surface). For each left row, attach the latest right row
  * whose time is ≤ the left row's time, per key (inclusive, matching
  * DuckDB's `ASOF JOIN ... ON l.t >= r.t` semantics).
  *
  * Implementation is the scalable union-and-carry formulation rather
  * than a join: tag both sides, union, and carry the last right-side
  * payload forward over a (key, time) window. One shuffle on the key,
  * zero join amplification — at 100 TB this beats any range-join
  * rewrite, which explodes to |L|·|R| comparisons per key before
  * pruning. Right side must be unique per (key, time); pre-aggregate
  * if it isn't (ties would otherwise be nondeterministic in any
  * engine's asof).
  */
object AsOfJoin {

  /** @param left      (key, t, …leftCols)
    * @param right     (key, t, …payloadCols) — unique per (key, t)
    * @param key       join key column name (same name both sides)
    * @param leftTime  left time column name
    * @param rightTime right time column name
    * @param payload   right-side column names to carry
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val marker = "__graft_side"
    val t = "__graft_t"
    val pcol = "__graft_p"
    // the payload travels as ONE struct so all carried fields come from the
    // SAME right row — per-column last(ignoreNulls) could stitch fields
    // from different rows when a payload column is NULL (VERDICT r2 #9)
    val r = right.select(
      col(key), col(rightTime).as(t), lit(0).as(marker),
      struct(payload.map(col): _*).as(pcol))
    val pType = r.schema(pcol).dataType
    val l = left
      .withColumn(marker, lit(1))
      .withColumn(t, col(leftTime))
      .withColumn(pcol, lit(null).cast(pType))
    val rAligned = lCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val u = l.unionByName(rAligned.select(l.columns.map(col).toSeq: _*))
    // right rows (marker 0) sort before left rows at equal t → inclusive ≤
    val w = Window.partitionBy(col(key)).orderBy(col(t), col(marker))
      .rowsBetween(Window.unboundedPreceding, 0)
    u.withColumn(pcol, last(col(pcol), ignoreNulls = true).over(w))
      .where(col(marker) === 1)
      .select((lCols.map(col) ++
        payload.map(c => col(s"$pcol.$c").as(s"asof_$c"))): _*)
  }
}
