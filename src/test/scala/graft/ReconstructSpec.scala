package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index._
import graft.query.IndexBuilder
import graft.queries.VectorQueries

/** `Searcher.reconstruct()` — the GetVectors counterpart: exact for the
  * vector-holding kinds, a bounded-error dequantization for the
  * compressed kinds, undefined (throws) for sign-bit BQ.
  */
class ReconstructSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark
  private def vecs = VectorQueries.vecTables(spark, TestSession.Sf0001)

  private def corpusMap = vecs._1.collect()
    .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def l2(a: Array[Double], b: Array[Double]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  test("vector-holding kinds reconstruct exactly; quantized kinds within bound; " +
      "bq refuses") {
    val (corpus, _) = vecs
    val truth = corpusMap
    for (t <- Seq("flat", "ivf", "lsh", "hnsw", "hnsw_routed")) {
      val rec = IndexBuilder().withIndexType(t)
        .withIndexOption("nlist", 8).withIndexOption("shards", 8)
        .build(corpus).reconstruct()
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      assert(rec.keySet == truth.keySet, s"$t id coverage")
      rec.foreach { case (id, v) =>
        assert(v.sameElements(truth(id)), s"$t must return stored vectors verbatim ($id)")
      }
    }
    // SQ8: per-dim error bounded by scale/2
    val sq8Model = Sq8Index.train(corpus, Metric.L2)
    val sq8Rec = IndexBuilder().withIndexType("sq8").build(corpus).reconstruct()
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    sq8Rec.foreach { case (id, v) =>
      v.zip(truth(id)).zipWithIndex.foreach { case ((r, x), d) =>
        assert(math.abs(r - x) <= sq8Model.scales(d) / 2 + 1e-9, s"sq8 id $id dim $d")
      }
    }
    // PQ (det codebook): reconstruction is each subspace's selected
    // centroid — recompute one row by hand
    val pqModel = PqIndex.trainDeterministic(corpus, m = 4, ksub = 16, Metric.L2)
    val codes = PqIndex.encode(corpus, pqModel)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    val pqRec = graft.query.Searcher(graft.query.PqKind(pqModel, PqIndex.encode(corpus, pqModel)))
      .reconstruct()
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    pqRec.foreach { case (id, v) =>
      val expected = codes(id).zipWithIndex.flatMap { case (j, mi) =>
        pqModel.codebooks(mi)(j)
      }
      assert(v.sameElements(expected), s"pq decode mismatch for $id")
    }
    // OPQ: orthonormal rotation → original-space error == rotated-space
    // PQ error (isometry)
    val opqModel = OpqIndex.train(corpus, m = 4, nbits = 4, Metric.L2, opqIters = 2)
    val opqSearcher = graft.query.Searcher(
      graft.query.OpqKind(opqModel, OpqIndex.encode(corpus, opqModel)))
    val rot = opqModel.rotation.map(_.toArray).toArray
    val opqRec = opqSearcher.reconstruct()
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val rotRec = OpqIndex.encode(corpus, opqModel)
      .select(col("id"), PqIndex.decode(col("code"), opqModel.pq).as("rv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    opqRec.foreach { case (id, v) =>
      val x = truth(id)
      val rx = OpqIndex.rotateLocal(rot, x)
      assert(math.abs(l2(v, x) - l2(rotRec(id), rx)) < 1e-9, s"opq isometry $id")
    }
    // IVFPQ: centroid + residual decode
    val ivfpqModel = IvfPqIndex.trainDeterministic(corpus, nlist = 8, m = 4,
      ksub = 16, Metric.L2)
    val ivfpqCodes = IvfPqIndex.encode(corpus, ivfpqModel)
    val ivfpqRec = graft.query.Searcher(graft.query.IvfPqKind(ivfpqModel, ivfpqCodes))
      .reconstruct()
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val parts = ivfpqCodes.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toArray)).toSeq
    parts.foreach { case (id, c, code) =>
      val cent = ivfpqModel.coarse.centroids(c)
      val res = code.zipWithIndex.flatMap { case (j, mi) => ivfpqModel.pq.codebooks(mi)(j) }
      val expected = cent.zip(res).map { case (a, b) => a + b }.toArray
      assert(ivfpqRec(id).zip(expected).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"ivfpq decode mismatch for $id")
    }
    // BQ refuses — a sign bit has no magnitude
    val bqModel = BqIndex.train(corpus, Metric.L2)
    intercept[UnsupportedOperationException] {
      graft.query.Searcher(
        graft.query.BqKind(bqModel, BqIndex.encode(corpus, bqModel))).reconstruct()
    }
  }
}
