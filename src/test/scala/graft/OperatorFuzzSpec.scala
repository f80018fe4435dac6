package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, RangeJoin}

/** Property-based fuzz for the two custom join operators (VERDICT r4
  * stretch #9): random event sets checked against the literal O(n²)
  * definition of each operator's contract, cementing the bin-edge
  * semantics (strict lower / inclusive upper, negative timestamps,
  * cross-zero bins) and the as-of tie rules (inclusive ≤, payload
  * fields travel together, no-prior-row → nulls).
  *
  * Deterministic: fixed ScalaCheck seed, single worker — same cases
  * every run.
  */
class OperatorFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private def runProp(p: Prop, tests: Int = 25): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(tests)
        .withMaxDiscardRatio(10)
        .withWorkers(1)
        .withInitialSeed(Seed(20260812L)),
      p)
    assert(res.passed, s"property failed: ${res.status}")
  }

  /** (key, us) event lists — keys collide on purpose, timestamps span
    * negative values and zero so bin boundaries on both sides of the
    * origin get exercised. */
  private val eventsGen: Gen[List[(Int, Long)]] =
    Gen.choose(0, 40).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.choose(0, 3)
        us <- Gen.choose(-25L, 60L)
      } yield (k, us))
    }

  test("RangeJoin.pairs ≡ the O(n²) definition on random event sets") {
    import spark.implicits._
    val prop = Prop.forAll(eventsGen, eventsGen, Gen.oneOf(1L, 3L, 7L, 16L)) {
      (ls, rs, w) =>
        val left = ls.zipWithIndex.map { case ((k, us), i) => (k, i.toLong, us) }
        val right = rs.zipWithIndex.map { case ((k, us), i) => (k, 1000L + i, us) }
        val got = RangeJoin
          .pairs(left.toDF("key", "id", "us"), right.toDF("key", "id", "us"), w)
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
          .toSet
        val want = (for {
          (lk, lid, lus) <- left
          (rk, rid, rus) <- right
          if lk == rk && rus > lus && rus <= lus + w
        } yield (lk, lid, rid, rus - lus)).toSet
        got == want
    }
    runProp(prop)
  }

  test("AsOfJoin.join ≡ the O(n²) definition, nullable payload fields intact") {
    import spark.implicits._
    // right side: unique per (key, t) — the operator's contract; every
    // third payload string is NULL so the struct-carry (fields must come
    // from the SAME right row) is exercised
    val rightGen: Gen[List[(Int, Long, Long, String)]] =
      eventsGen.map { evs =>
        evs.distinct.zipWithIndex.map { case ((k, t), i) =>
          (k, t, i.toLong, if (i % 3 == 0) null else s"s$i")
        }
      }
    val prop = Prop.forAll(eventsGen, rightGen) { (ls, right) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) => (k, t, 100L + i) }
      val res = AsOfJoin.join(
        left.toDF("key", "lt", "lid"),
        right.toDF("key", "rt", "v", "s"),
        "key", "lt", "rt", Seq("v", "s"))
      val got = res.collect().map { r =>
        (r.getInt(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          Option(r.getString(4)))
      }.toSet
      val want = left.map { case (k, lt, lid) =>
        val prior = right.filter(r => r._1 == k && r._2 <= lt)
        if (prior.isEmpty) (k, lt, lid, None, None)
        else {
          val best = prior.maxBy(_._2) // unique per (key, t) → well-defined
          (k, lt, lid, Some(best._3), Option(best._4))
        }
      }.toSet
      got == want
    }
    runProp(prop)
  }
}
