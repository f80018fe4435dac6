package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.{Centroids, DriverPar, OpqIndex, PqIndex}

/** The parallel-assignment trainers (round 12, guide §1.2 "per-task
  * work") must be BIT-identical to the sequential loops they replaced:
  * oracle-checked queries call `IvfIndex.train`/`PqIndex.train`/
  * `OpqIndex.train` directly, so any float that moves is a correctness
  * regression, not noise. The parallel phase is the pure per-row argmin
  * (results land by row slot); the accumulation stays sequential in
  * ascending row order. This spec trains every affected kind at width 1
  * and width 8 and asserts exact equality — `==` on the model Seqs, not
  * a tolerance.
  */
class TrainerParitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  private val dim = 16
  private val n = 3000

  private def fixture = {
    import spark.implicits._
    (0 until n).map(r =>
        (r.toLong, Seq.tabulate(dim)(i => math.sin(r * 13 + i * 5) + (r % 7) * 0.25)))
      .toDF("id", "vec")
  }

  private def atWidth[A](w: Int)(body: => A): A = {
    DriverPar.overrideWidth = Some(w)
    try body finally DriverPar.overrideWidth = None
  }

  test("k-means: width-8 assignment ≡ width-1, bit for bit") {
    val df = fixture.cache()
    val seq = atWidth(1)(Centroids.kMeans(df, 32, metric = Metric.L2, sampleCap = n))
    val par = atWidth(8)(Centroids.kMeans(df, 32, metric = Metric.L2, sampleCap = n))
    assert(seq == par)
    df.unpersist()
  }

  test("k-means, non-L2 metric: width-8 ≡ width-1") {
    val df = fixture.cache()
    val seq = atWidth(1)(Centroids.kMeans(df, 16, metric = Metric.Cosine, sampleCap = n))
    val par = atWidth(8)(Centroids.kMeans(df, 16, metric = Metric.Cosine, sampleCap = n))
    assert(seq == par)
    df.unpersist()
  }

  test("PQ: width-8 joint-subspace Lloyd's ≡ width-1, bit for bit") {
    val df = fixture.cache()
    val seq = atWidth(1)(PqIndex.train(df, m = 4, nbits = 6, Metric.L2, sampleCap = n))
    val par = atWidth(8)(PqIndex.train(df, m = 4, nbits = 6, Metric.L2, sampleCap = n))
    assert(seq.codebooks == par.codebooks)
    df.unpersist()
  }

  test("OPQ: width-8 alternation (rotate/reconstruct/Procrustes) ≡ width-1") {
    val df = fixture.cache()
    val seq = atWidth(1)(OpqIndex.train(df, m = 4, nbits = 6, Metric.L2, sampleCap = n))
    val par = atWidth(8)(OpqIndex.train(df, m = 4, nbits = 6, Metric.L2, sampleCap = n))
    assert(seq.rotation == par.rotation)
    assert(seq.pq.codebooks == par.pq.codebooks)
    df.unpersist()
  }
}
