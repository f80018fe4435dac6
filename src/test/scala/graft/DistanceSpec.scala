package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.functions.VectorFunctions._

/** The scalar-function contract, replicating the reference's hand-vector
  * expectations (internal/math/distance_test.go; constants are the spec —
  * see FIXTURES.md §1b). Epsilons: 1e-6 (1e-5 for the √56 case).
  */
class DistanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  private def eval(a: Seq[Double], b: Seq[Double],
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column): Double =
    Seq((a, b)).toDF("a", "b").select(f(col("a"), col("b")).as("r"))
      .first().getDouble(0)

  test("L2: identical vectors → 0") {
    assert(math.abs(eval(Seq(1, 2, 3), Seq(1, 2, 3), l2)) < 1e-6)
  }
  test("L2: unit distance") {
    assert(math.abs(eval(Seq(0, 0), Seq(1, 0), l2) - 1.0) < 1e-6)
  }
  test("L2: 3-4-5 triangle") {
    assert(math.abs(eval(Seq(0, 0), Seq(3, 4), l2) - 5.0) < 1e-6)
  }
  test("L2: negatives → √56") {
    assert(math.abs(eval(Seq(1, -2, 3), Seq(-1, 2, -3), l2) - math.sqrt(56.0)) < 1e-5)
  }
  test("manhattan: hand values; column, scalar and rankKeyScalar agree") {
    assert(math.abs(eval(Seq(1, 2, 3), Seq(1, 2, 3), l1)) < 1e-12)
    assert(math.abs(eval(Seq(0, 0), Seq(3, 4), l1) - 7.0) < 1e-12)
    assert(math.abs(eval(Seq(1, -2, 3), Seq(-1, 2, -3), l1) - 12.0) < 1e-12)
    val (a, b) = (Array(0.25, -1.5, 2.0), Array(1.0, 0.5, -0.75))
    val viaCol = eval(a.toSeq, b.toSeq, l1)
    assert(Metric.Manhattan.rankKeyScalar(a, b) == viaCol)
    assert(Metric.Manhattan.rankKeyScalar(a, b ++ Array(9.9), 0, 3) == viaCol)
    assert(Metric("manhattan") == Metric.Manhattan)
  }

  test("dot: orthogonal → 0") {
    assert(math.abs(eval(Seq(1, 0), Seq(0, 1), dot)) < 1e-6)
  }
  test("dot: parallel → 14") {
    assert(math.abs(eval(Seq(1, 2, 3), Seq(1, 2, 3), dot) - 14.0) < 1e-6)
  }
  test("dot: opposite unit → −1") {
    assert(math.abs(eval(Seq(1, 0), Seq(-1, 0), dot) + 1.0) < 1e-6)
  }
  test("cosine distance: identical → 0") {
    assert(math.abs(eval(Seq(1, 2, 3), Seq(1, 2, 3), cosineDistance)) < 1e-6)
  }
  test("cosine distance: orthogonal → 1") {
    assert(math.abs(eval(Seq(1, 0), Seq(0, 1), cosineDistance) - 1.0) < 1e-6)
  }
  test("cosine distance: opposite → 2") {
    assert(math.abs(eval(Seq(1, 0), Seq(-1, 0), cosineDistance) - 2.0) < 1e-6)
  }
  test("cosine distance: zero vector → 1.0 (distance.go:55-71)") {
    assert(math.abs(eval(Seq(0, 0), Seq(1, 2), cosineDistance) - 1.0) < 1e-6)
  }
  test("inner-product distance is negative dot (metric.go:60-62)") {
    assert(math.abs(eval(Seq(1, 2), Seq(3, 4), innerProductDistance) + 11.0) < 1e-6)
  }
  test("norm trick: ‖a−b‖² = ‖a‖²+‖b‖²−2⟨a,b⟩") {
    val direct = eval(Seq(1, 2, 3), Seq(4, 5, 6), l2Sq)
    val tricked = eval(Seq(1, 2, 3), Seq(4, 5, 6),
      (a, b) => l2SqFromNorms(dot(a, b), normSq(a), normSq(b)))
    assert(math.abs(direct - tricked) < 1e-9)
  }
  test("unknown metric name errors (metric.go:25-36)") {
    // "manhattan" graduated from this test's unknown example to a real
    // metric in round 6 — the roadmap extension landed in the ADT slot
    intercept[IllegalArgumentException](Metric("chebyshev"))
    assert(Metric("L2") == Metric.L2) // case-insensitive
  }

  test("native LSH bucket matches the HOF formulation and the scalar twin") {
    import org.apache.spark.sql.functions._
    // the r3 interpreted-HOF formulation, kept here as the independent
    // oracle for the native expression's arithmetic and fold order
    def planeComponent(p: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      ((p * 2654435761L + i * 40503L) % 1000003L).cast("double") / 1000003.0 - 0.5
    def hofBucket(vec: org.apache.spark.sql.Column, planes: Int) =
      aggregate(sequence(lit(0), lit(planes - 1)), lit(0L), (acc, p) =>
        acc + when(
          aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x * planeComponent(p, i)), lit(0.0), (a, v) => a + v) > 0.0,
          call_function("shiftleft", lit(1L), p)).otherwise(0L))
    val vecs = (0 until 50).map(r =>
      (r.toLong, Seq.tabulate(17)(i => math.sin(r * 31 + i * 7).toDouble)))
    val df = vecs.toDF("id", "vec").cache()
    for (planes <- Seq(1, 6, 8, 62)) {
      val rows = df.select(col("id"),
          graft.index.LshIndex.bucket(col("vec"), planes).as("nat"),
          hofBucket(col("vec"), planes).as("hof"))
        .collect()
      rows.foreach { r =>
        assert(r.getLong(1) == r.getLong(2),
          s"planes=$planes id=${r.getLong(0)}: native ${r.getLong(1)} != hof ${r.getLong(2)}")
      }
      val byId = vecs.toMap
      rows.foreach { r =>
        val sc = graft.index.LshIndex.bucketScalar(byId(r.getLong(0)).toArray, planes)
        assert(r.getLong(1) == sc)
      }
    }
    df.unpersist()
  }
}
