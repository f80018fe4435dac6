package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.VectorFunctions._

/** Product quantization: split dim into M subspaces of dsub, quantize each
  * subvector to one of Ksub codebook entries; a vector compresses to M
  * small ints (reference: pkg/index/pq/pq.go).
  *
  * The codebook (M × Ksub × dsub doubles ≤ 16×256×dsub — a few MB max)
  * travels as a foldable literal inside projections: encode and ADC are
  * pure maps, no shuffle, no UDF, codegen-friendly. PQ's 100 TB win is
  * IO: the codes table is ~32× smaller than the raw vectors, so a probe
  * scan reads megabytes where flat reads gigabytes.
  */
final case class PqModel(codebooks: Seq[Seq[Seq[Double]]], metric: Metric) {
  def m: Int = codebooks.size
  def ksub: Int = codebooks.head.size
  def dsub: Int = codebooks.head.head.size
  def dim: Int = m * dsub
}

object PqIndex {

  /** Config guards of pq.go:42-47. */
  def validate(dim: Int, m: Int, nbits: Int): Unit = {
    require(m > 0 && dim % m == 0, s"dimension $dim must be divisible by M=$m")
    require(nbits >= 1 && nbits <= 16, s"nbits must be in [1,16], got $nbits")
  }

  /** Production trainer: M independent k-means fits over subvector slices
    * (SURVEY.md A2 — "fit M independent KMeans models on slice()"). */
  def train(vectors: DataFrame, m: Int, nbits: Int, metric: Metric,
      seed: Long = 42L): PqModel = {
    val dim = vectors.select(size(col("vec"))).first().getInt(0)
    validate(dim, m, nbits)
    val ksub = 1 << nbits
    val dsub = dim / m
    val codebooks = (0 until m).map { mi =>
      val sub = vectors.select(col("id"), slice(col("vec"), mi * dsub + 1, dsub).as("vec"))
      Centroids.kMeans(sub, ksub, seed + mi)
    }
    PqModel(codebooks.toVector, metric)
  }

  /** Deterministic trainer: codebook[m][j] = mean subvector over ids with
    * id % ksub == j — oracle-reproducible. */
  def trainDeterministic(vectors: DataFrame, m: Int, ksub: Int, metric: Metric): PqModel = {
    val dim = vectors.select(size(col("vec"))).first().getInt(0)
    require(dim % m == 0, s"dimension $dim must be divisible by M=$m")
    val dsub = dim / m
    val codebooks = (0 until m).map { mi =>
      val sub = vectors.select(col("id"),
        slice(col("vec"), mi * dsub + 1, dsub).as("vec"))
      Centroids.bucketMeans(sub, ksub)
    }
    PqModel(codebooks.toVector, metric)
  }

  /** Encode expression: ARRAY<INT> of per-subspace argmin codebook ids
    * (pq.go:245-270 semantics; ties toward the lower code). Native
    * codegen'd loop — see [[org.apache.spark.sql.graftx.IndexExpressions]]. */
  def encodeCol(vec: Column, model: PqModel): Column =
    org.apache.spark.sql.graftx.IndexExpressions.pqEncode(vec, model.codebooks)

  /** (id, code) compressed table. */
  def encode(vectors: DataFrame, model: PqModel): DataFrame =
    vectors.select(col("id"), encodeCol(col("vec"), model).as("code"))

  /** ADC squared distance (pq.go:158-168 / ivfpq.go:533-539): Σ_m
    * ‖q_sub(m) − codebook[m][code[m]]‖²; sqrt deferred to the final
    * projection (SURVEY.md §4). */
  def adcDist2(qvec: Column, code: Column, model: PqModel): Column =
    org.apache.spark.sql.graftx.IndexExpressions.pqAdc(qvec, code, model.codebooks)

  /** Batch ADC kNN over the codes table. */
  def knn(codes: DataFrame, model: PqModel, queries: DataFrame, k: Int): DataFrame = {
    val candidates = codes.crossJoin(broadcast(queries))
      .select(
        col("query_id"),
        col("id").as("neighbor_id"),
        adcDist2(col("qvec"), col("code"), model).as("rank_key"))
    FlatIndex.topK(candidates, k, Metric.L2) // ADC reports √ of the summed squares
  }
}
