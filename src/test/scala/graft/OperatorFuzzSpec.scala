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

  // ---- text-pipeline primitives ----

  private val Mod = graft.functions.TextFunctions.Mod

  /** Scala reimplementation of the tokenHash/fingerprint recurrence. */
  private def refTokenHash(t: String): Long =
    t.foldLeft(0L)((a, c) => (a * 31L + c.toLong) % Mod)

  private val textGen: Gen[String] =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "ab", "ba", "abc", "x"))
        .map(_.mkString(" ")))

  test("ngramHashes ≡ the literal sliding-window fold on random token lists") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val prop = Prop.forAll(Gen.listOfN(6, textGen), Gen.oneOf(2, 3, 5)) { (texts, n) =>
      val got = texts.toDF("text")
        .select(graft.functions.TextFunctions
          .ngramHashes(graft.functions.TextFunctions.toks(col("text")), n).as("g"))
        .as[Seq[Long]].collect().toList
      val want = texts.map { txt =>
        val toks = txt.split(" ", -1).toList
        toks.sliding(n).filter(_.length == n)
          .map(_.foldLeft(0L)((a, t) => (a * 31L + refTokenHash(t)) % Mod))
          .toList
      }
      got.map(_.toList) == want
    }
    runProp(prop)
  }

  test("ConnectedComponents.label ≡ union-find on random graphs (chains, cliques, isolates)") {
    import spark.implicits._
    val graphGen: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(1, 30)
      ne <- Gen.choose(0, 40)
      edges <- Gen.listOfN(ne, for {
        a <- Gen.choose(0L, n - 1L)
        b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (n, edges.filter(e => e._1 != e._2))
    val prop = Prop.forAll(graphGen) { case (n, edges) =>
      val nodes = (0L until n.toLong).toDF("id")
      val edgesDf = edges.toDF("id_a", "id_b")
      // reference union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      // default routing (driver-local union-find under the edge budget)
      val local = graft.operators.ConnectedComponents.label(nodes, edgesDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // forced distributed propagation (budget 0 ⇒ always the join loop)
      val dist = graft.operators.ConnectedComponents
        .label(nodes, edgesDf, localEdgeBudget = -1L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      local == want && dist == want
    }
    runProp(prop, tests = 8)
  }

  test("ConnectedComponents: distributed path throws on non-convergence instead of " +
      "returning wrong labels (ADVICE r5)") {
    import spark.implicits._
    // a 12-node chain has diameter 11 — maxIter=3 cannot converge
    val nodes = (0L until 12L).toDF("id")
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      graft.operators.ConnectedComponents
        .label(nodes, chain, maxIter = 3, localEdgeBudget = -1L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the same graph labels fine
    val ok = graft.operators.ConnectedComponents
      .label(nodes, chain, maxIter = 15, localEdgeBudget = -1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == (0L until 12L).map(_ -> 0L).toMap)
  }

  test("ConnectedComponents: 2000-node chain (diameter 1999) converges inside the " +
      "default 25-round guard — the O(log n) star property, impossible under " +
      "min-label propagation") {
    import spark.implicits._
    val n = 2000L
    val nodes = (0L until n).toDF("id")
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.operators.ConnectedComponents
      .label(nodes, chain, localEdgeBudget = -1L) // force the distributed path
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 0L))
  }

  test("ConnectedComponents: edge endpoints absent from nodes are conduits, not output " +
      "rows — both paths return exactly the node set (ADVICE r5)") {
    import spark.implicits._
    // 99 is not in nodes but links 0—99—5: 0 and 5 must share a component,
    // and no row for 99 may appear, on BOTH paths
    val nodes = Seq(0L, 1L, 5L).toDF("id")
    val edges = Seq((0L, 99L), (99L, 5L)).toDF("id_a", "id_b")
    for (budget <- Seq(Long.MaxValue, -1L)) {
      val got = graft.operators.ConnectedComponents
        .label(nodes, edges, localEdgeBudget = budget)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet == Set(0L, 1L, 5L), s"budget=$budget row set")
      assert(got(0L) == got(5L), s"budget=$budget conduit reachability")
      assert(got(1L) == 1L, s"budget=$budget isolated node keeps own id")
    }
  }

  test("maxRun ≡ max groupBy-count on random token lists (incl. empty-string tokens)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tokenListGen: Gen[List[String]] =
      Gen.choose(0, 15).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "ab", "")))
    val prop = Prop.forAll(Gen.listOfN(8, tokenListGen)) { lists =>
      val got = lists.toDF("tk")
        .select(graft.functions.TextFunctions.maxRun(col("tk")).as("m"))
        .as[Int].collect().toList
      val want = lists.map(l =>
        if (l.isEmpty) 0 else l.groupBy(identity).values.map(_.length).max)
      got == want
    }
    runProp(prop)
  }

  /** (doc_id, text) corpora from a 6-word vocabulary — band collisions
    * on purpose so the drop path dominates. */
  private val corpusGen: Gen[List[(Long, String)]] =
    Gen.choose(2, 14).flatMap(n =>
      Gen.listOfN(n, textGen).map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) }))

  test("IncrementalNearDup.keepers ≡ 'no smaller doc shares a band' over collected band rows") {
    import spark.implicits._
    val prop = Prop.forAll(corpusGen) { docs =>
      val df = docs.toDF("doc_id", "text")
      val bands = graft.streaming.IncrementalNearDup.bandRows(df)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      val kept = graft.streaming.IncrementalNearDup.keepers(df)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val want = docs.map(_._1).filter { id =>
        val mine = bands.filter(_._1 == id).map(b => (b._2, b._3)).toSet
        !bands.exists(b => b._1 < id && mine((b._2, b._3)))
      }.toSet
      kept == want
    }
    runProp(prop, tests = 10)
  }

  test("IncrementalNearDup.step over random batch splits ≡ batch keepers") {
    import spark.implicits._
    val gen = for {
      docs <- corpusGen
      cut <- Gen.choose(0, docs.length)
    } yield (docs, cut)
    val prop = Prop.forAll(gen) { case (docs, cut) =>
      val df = docs.toDF("doc_id", "text")
      val expected = graft.streaming.IncrementalNearDup.keepers(df)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val bandDir = java.nio.file.Files
        .createTempDirectory("fuzz_ndup").resolve("bands").toString
      val streamed = List(docs.take(cut), docs.drop(cut))
        .filter(_.nonEmpty)
        .flatMap { batch =>
          graft.streaming.IncrementalNearDup
            .step(spark, batch.toDF("doc_id", "text"), bandDir)
            .select("doc_id").collect().map(_.getLong(0))
        }.toSet
      streamed == expected
    }
    runProp(prop, tests = 8)
  }
}
