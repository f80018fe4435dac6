package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.normSq

/** Ingest/query validation guards (SURVEY.md P1/P2/P7).
  *
  * The reference fails fast per vector (vector.go:37-44, flat.go:43-53);
  * in a batch engine the same contract is a validation pass: `require*`
  * throws on the first violating row (fail-fast job), `filter*` drops
  * violations for pipelines that prefer quarantine semantics.
  */
object Validation {

  /** P1: dimension guard — all vectors must have exactly `dim`
    * components and no null elements. */
  def requireDim(vectors: DataFrame, dim: Int, vecCol: String = "vec"): DataFrame = {
    val bad = vectors
      .where(size(col(vecCol)) =!= dim || exists(col(vecCol), _.isNull))
      .limit(1).collect()
    require(bad.isEmpty, {
      val row = bad.head
      s"vector with wrong dimension (expected $dim): $row"
    })
    vectors
  }

  def filterDim(vectors: DataFrame, dim: Int, vecCol: String = "vec"): DataFrame =
    vectors.where(size(col(vecCol)) === dim && !exists(col(vecCol), _.isNull))

  /** P2: zero-norm guard for the cosine metric (flat.go:48-53,
    * flat.go:86-92 — cosine is undefined on the zero vector). */
  def requireNonZero(vectors: DataFrame, vecCol: String = "vec"): DataFrame = {
    val bad = vectors.where(normSq(col(vecCol)) === 0.0).limit(1).collect()
    require(bad.isEmpty, s"zero vector not allowed under cosine metric: ${bad.headOption}")
    vectors
  }

  def filterNonZero(vectors: DataFrame, vecCol: String = "vec"): DataFrame =
    vectors.where(normSq(col(vecCol)) =!= 0.0)

  /** P7: id removal as an anti-join (the reference supports Remove only
    * for HNSW, hnsw.go:203-242; here it works uniformly on any index
    * table — with a transactional table format this is a DELETE). */
  def removeIds(table: DataFrame, removed: DataFrame,
      idCol: String = "id"): DataFrame =
    table.join(removed.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
}
