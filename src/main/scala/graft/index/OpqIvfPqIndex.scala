package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.VectorFunctions

/** OPQ × IVFPQ composite — the faiss best-practice serving stack
  * (`OPQM,D_IVFx_PQy` index-factory string): the OPQ rotation balances
  * subspace variance, THEN the coarse quantizer partitions the rotated
  * space and residual PQ codes quantize within each cell. Rotation is
  * isometric, so rotated-space L2 IS original-space L2 and everything
  * downstream is the verified [[IvfPqIndex]] machinery unchanged —
  * this file is pure composition, no new kernels.
  *
  * 100 TB shape: identical to IVFPQ (the scale kind) plus one codegen'd
  * matVec projection at encode/search time; probe pruning, ADC hoisting,
  * and the blocked serving kernel all compose untouched.
  */
final case class OpqIvfPqModel(rotation: Seq[Seq[Double]], ivfpq: IvfPqModel) {
  require(rotation.nonEmpty && rotation.forall(_.size == rotation.size),
    "rotation must be square")
  def dim: Int = rotation.size
}

object OpqIvfPqIndex {

  private def rotateCol(rotation: Seq[Seq[Double]], vec: Column): Column =
    VectorFunctions.matVec(rotation, vec)

  private def rotateCorpus(vectors: DataFrame, rotation: Seq[Seq[Double]]): DataFrame =
    vectors.select(col("id"), rotateCol(rotation, col("vec")).as("vec"))

  private def rotateQueries(queries: DataFrame, rotation: Seq[Seq[Double]]): DataFrame =
    queries.select(col("query_id"), rotateCol(rotation, col("qvec")).as("qvec"))

  /** Train: OPQ rotation on the raw corpus (its throwaway flat-PQ
    * codebooks only steer the alternation), then the full IVFPQ residual
    * pipeline on the rotated corpus. opqIters=0 degenerates to plain
    * IVFPQ under an identity rotation (spec-pinned). */
  def train(vectors: DataFrame, nlist: Int, m: Int, nbits: Int, metric: Metric,
      opqIters: Int = 6): OpqIvfPqModel = {
    val rotation = OpqIndex.train(vectors, m, nbits, metric, opqIters).rotation
    OpqIvfPqModel(rotation,
      IvfPqIndex.train(rotateCorpus(vectors, rotation), nlist, m, nbits, metric))
  }

  /** (id, cluster_id, code) table — IVFPQ encode of the rotated corpus. */
  def encode(vectors: DataFrame, model: OpqIvfPqModel): DataFrame =
    IvfPqIndex.encode(rotateCorpus(vectors, model.rotation), model.ivfpq)

  /** Probe-pruned residual ADC search in the rotated space. */
  def search(codes: DataFrame, model: OpqIvfPqModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    IvfPqIndex.search(codes, model.ivfpq,
      rotateQueries(queries, model.rotation), k, nprobe)

  def knn(vectors: DataFrame, model: OpqIvfPqModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    search(encode(vectors, model), model, queries, k, nprobe)

  /** Blocked serving kernel — [[IvfPqIndex.searchBlocked]] semantics. */
  def searchBlocked(codes: DataFrame, model: OpqIvfPqModel, queries: DataFrame,
      k: Int, nprobe: Int): DataFrame =
    IvfPqIndex.searchBlocked(codes, model.ivfpq,
      rotateQueries(queries, model.rotation), k, nprobe)
}
