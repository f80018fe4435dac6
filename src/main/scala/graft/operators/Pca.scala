package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.index.Centroids

/** PCA dimensionality reduction — the standard pre-index transform of
  * an embedding pipeline (project 768-d model outputs to the 64–128
  * dims the index actually needs; compose with any index kind
  * downstream). Beyond the reference, which has no transform stage.
  *
  * Training: covariance of the capped deterministic sample accumulated
  * driver-locally (dim² doubles — the [[graft.index.OpqIndex]]
  * discipline: launching treeAggregate jobs over in-memory-sized
  * samples is pure scheduler overhead), then a symmetric
  * eigendecomposition (bundled breeze/LAPACK). Eigenvectors are
  * sign-ambiguous, so each component is CANONICALIZED — the
  * largest-|weight| coordinate is made positive (first index wins ties)
  * — which makes training fully deterministic.
  *
  * Projection is one codegen'd center-and-matVec (the k×dim component
  * matrix rides as a single typedLit), a pure no-shuffle projection at
  * any corpus size. Components have orthonormal rows, so the projection
  * is a CONTRACTION: ‖P(x−μ)‖ ≤ ‖x−μ‖ always — the property the
  * driver-verified invariants row gates on real data.
  */
final case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]],
    explainedVar: Seq[Double]) {
  require(components.nonEmpty && components.forall(_.size == mean.size),
    "components must be k rows of dim weights")
  def dimIn: Int = mean.size
  def dimOut: Int = components.size
}

object Pca {

  /** Fit top-`k` principal components on the capped smallest-id sample. */
  def train(vectors: DataFrame, k: Int,
      sampleCap: Int = Centroids.DefaultTrainCap): PcaModel = {
    val dim = vectors.select(size(col("vec"))).first().getInt(0)
    require(k >= 1 && k <= dim, s"components k=$k must be in [1, $dim]")
    val cap = math.min(sampleCap.toLong, Centroids.LocalTrainBudget / dim).toInt
    val ts = Centroids.trainingSample(vectors, math.max(1, cap), "id", "vec")
    val x = ts.localData
    ts.unpersist()
    require(x.nonEmpty, "cannot fit PCA on an empty vector table")
    val n = x.length
    val mean = new Array[Double](dim)
    x.foreach { v => var i = 0; while (i < dim) { mean(i) += v(i); i += 1 } }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    val cov = breeze.linalg.DenseMatrix.zeros[Double](dim, dim)
    x.foreach { v =>
      var a = 0
      while (a < dim) {
        val da = v(a) - mean(a)
        if (da != 0.0) {
          var b = 0
          while (b < dim) { cov(a, b) += da * (v(b) - mean(b)); b += 1 }
        }
        a += 1
      }
    }
    cov :/= n.toDouble
    val es = breeze.linalg.eigSym(cov)
    // eigSym returns ascending eigenvalues; take the top k descending
    val order = (0 until dim).sortBy(j => -es.eigenvalues(j)).take(k)
    val comps = order.map { j =>
      val v = Array.tabulate(dim)(r => es.eigenvectors(r, j))
      // canonical sign: the largest-|weight| coordinate positive
      var best = 0
      var r = 1
      while (r < dim) {
        if (math.abs(v(r)) > math.abs(v(best))) best = r
        r += 1
      }
      (if (v(best) < 0.0) v.map(-_) else v).toVector
    }
    PcaModel(mean.toVector, comps.toVector,
      order.map(es.eigenvalues(_)).toVector)
  }

  /** Center-and-project as a codegen'd Column (array<double> of dimOut). */
  def projectCol(vec: Column, model: PcaModel): Column =
    VectorFunctions.matVec(model.components,
      VectorFunctions.vecSub(vec, typedLit(model.mean)))

  /** (id, vec) frame in the reduced space — drop-in input for any index
    * kind's train/encode/search. */
  def project(vectors: DataFrame, model: PcaModel): DataFrame =
    vectors.select(col("id"), projectCol(col("vec"), model).as("vec"))
}
