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
    val l = left
      .withColumn(marker, lit(1))
      .withColumn(t, col(leftTime))
    val r = right.select(
      (Seq(col(key), col(rightTime).as(t), lit(0).as(marker)) ++
        payload.map(c => col(c).as(s"__graft_p_$c"))): _*)
    // align schemas for unionByName
    val lAligned = payload.foldLeft(l)((df, c) =>
      df.withColumn(s"__graft_p_$c", lit(null).cast(r.schema(s"__graft_p_$c").dataType)))
    val rAligned = lCols.filterNot(_ == key).foldLeft(r)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val u = lAligned.unionByName(rAligned.select(lAligned.columns.map(col).toSeq: _*))
    // right rows (marker 0) sort before left rows at equal t → inclusive ≤
    val w = Window.partitionBy(col(key)).orderBy(col(t), col(marker))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payload.foldLeft(u)((df, c) =>
      df.withColumn(s"__graft_asof_$c",
        last(col(s"__graft_p_$c"), ignoreNulls = true).over(w)))
    carried
      .where(col(marker) === 1)
      .select((lCols.map(col) ++ payload.map(c => col(s"__graft_asof_$c").as(s"asof_$c"))): _*)
  }
}
