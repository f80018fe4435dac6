package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CorpusGen
import graft.index.PlaidIndex
import graft.query.{LocalPlaidServer, PlaidServer}

/** The PLAID selectivity floor (VERDICT r9 #2): on the sf corpora's
  * ~31-token vocabulary every doc quantizes into ~all centroids, so the
  * posting probe prunes nothing and its value was unexercised. This spec
  * builds the clustered-vocab world (vocab ≫ C, topic-pooled token
  * draws — [[CorpusGen.plaidWorld]]) and pins the property the kind
  * exists for: the probe touches a SMALL fraction of the index while the
  * two-stage result stays close to the full-probe pipeline.
  */
class PlaidSelectivitySpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  // small world: vocab 1024 ≫ C 64, 400 docs × 24 token slots, ~10%
  // stray draws, nprobe 1 (each query token probes exactly its own
  // centroid — the selective regime)
  private lazy val world =
    CorpusGen.plaidWorld(spark, nDocs = 400, vocabSize = 1024, c = 64,
      tokensPerDoc = 24, nprobe = 1)
  private lazy val post = {
    val p = PlaidIndex.build(world.docs, world.model).cache()
    p.count()
    p
  }

  test("clustered-vocab world is the selective regime: docs cover few " +
      "centroids, probe scan fraction ≪ 1, full probe scans everything") {
    val cover = post.groupBy("doc_id").agg(count(lit(1)).as("nc"))
      .agg(avg(col("nc"))).first().getDouble(0)
    assert(cover < 16.0,
      s"mean centroids per doc $cover — expected ≪ C=64 (topic pools broken?)")
    val queries = world.docs.where(col("doc_id") < 20)
      .select(col("doc_id").as("query_id"), col("text"))
    val stats = PlaidIndex.probeStats(post, queries, world.model)
      .agg(avg(col("scan_frac")), avg(col("cand_frac")), max(col("scan_frac")))
      .first()
    val (meanScan, meanCand, maxScan) =
      (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    assert(meanScan > 0.0 && meanScan < 0.3,
      s"mean scan_frac $meanScan — the probe must touch a small index fraction")
    assert(meanCand < 0.5,
      s"mean cand_frac $meanCand — candidates must be a corpus subset")
    assert(maxScan < 0.5, s"max scan_frac $maxScan")
    // sanity ceiling: probing EVERY centroid must scan the whole index
    val full = PlaidIndex.probeStats(post, queries,
      world.model.copy(nprobe = world.model.cents.length))
      .agg(min(col("scan_frac"))).first().getDouble(0)
    assert(full == 1.0, s"full-probe scan_frac $full must be exactly 1")
  }

  test("pruned two-stage recall vs the full-probe pipeline ≥ 0.8 at " +
      "nprobe=1, the nprobe dial is monotone, and the probe-pruned " +
      "distributed server stays result-identical") {
    val fullLocal = new LocalPlaidServer(world.docs, post,
      world.model.copy(nprobe = world.model.cents.length))
    val dist = new PlaidServer(world.docs, post, world.model).warm()
    val qs = world.docs.where(col("doc_id") < 20)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def recallAt(nprobe: Int, checkDist: Boolean): Double = {
      val local = new LocalPlaidServer(world.docs, post,
        world.model.copy(nprobe = nprobe))
      var hits = 0
      var total = 0
      qs.foreach { case (id, text) =>
        val pruned = local.search(id, text, topN = 50, k = 10)
        val full = fullLocal.search(id, text, topN = 50, k = 10)
        if (checkDist) {
          // the distributed inverted-posting path must equal the local
          // one row-for-row (the LocalServeSpec contract, under pruning)
          val distRes = dist.search(id, text, topN = 50, k = 10)
          assert(distRes.toSeq == pruned.toSeq,
            s"distributed ≠ local pruned result for query $id")
        }
        val fullIds = full.map(_._1).toSet
        hits += pruned.count { case (pid, _, _, _) => fullIds.contains(pid) }
        total += full.length
      }
      hits.toDouble / total
    }
    val r1 = recallAt(1, checkDist = true)
    val r2 = recallAt(2, checkDist = false)
    dist.unpersist()
    assert(r1 >= 0.8, s"pruned-vs-full-probe recall $r1 at nprobe=1")
    assert(r2 >= r1, s"nprobe recall dial must be monotone: np2 $r2 < np1 $r1")
    assert(r2 >= 0.85, s"nprobe=2 recall $r2 — the dial must recover " +
      "the boundary misses nprobe=1 loses")
  }

  test("defaultC clamp edges and scaling rule (VERDICT r11 next #2: the " +
      "2·√tokens default, justified by the committed 1M C-frontier " +
      "artifact BENCH_LOCAL_r12_1m_plaid.json)") {
    // floor clamp: tiny corpora never drop under 16 centroids
    assert(PlaidIndex.defaultC(0L) == 16)
    assert(PlaidIndex.defaultC(1L) == 16)
    assert(PlaidIndex.defaultC(63L) == 16) // 2·√63 ≈ 15.8 → floor wins
    // just past the floor: the rule takes over
    assert(PlaidIndex.defaultC(100L) == 20)
    // the 1M-protocol point the artifact measures (100k docs × 48 tokens):
    // 2 · ⌊√4.8M⌋ = 2 · 2190
    assert(PlaidIndex.defaultC(4800000L) == 4380)
    // ceiling clamp: petabyte-shaped corpora cap at 2^18 centroids
    assert(PlaidIndex.defaultC(1000000000000L) == (1 << 18))
    assert(PlaidIndex.defaultC(Long.MaxValue / 4) == (1 << 18))
    // monotone non-decreasing across the decades
    val ladder = Seq(0L, 64L, 1000L, 100000L, 4800000L, 100000000L,
      100000000000L, 1000000000000L).map(PlaidIndex.defaultC(_))
    assert(ladder == ladder.sorted, s"defaultC not monotone: $ladder")
    // the serving pair
    assert(PlaidIndex.DefaultNprobe == 10)
  }

  test("TopIdxParity: graft_top_idx ≡ the posexplode + rank-window top-n " +
      "it replaced in probedCents — (value DESC, index ASC) under " +
      "Double.compare, ties to the lower index, fuzzed") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260819L)
    val arrays: Seq[Seq[Double]] = (0 until 200).map { i =>
      val len = 1 + rnd.nextInt(40)
      // duplicate-heavy values so ties actually occur
      Seq.fill(len)(math.floor(rnd.nextDouble() * 8) / 8.0)
    }
    for (n <- Seq(1, 3, 10)) {
      val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }
        .toDF("id", "arr")
      val got = df.select(col("id"),
          explode(org.apache.spark.sql.graftx.IndexExpressions
            .topIdx(col("arr"), n)).as("ci"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      // reference: the exact window form probedCents used
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("id").orderBy(col("csim").desc, col("ci"))
      val exp = df.select(col("id"), posexplode(col("arr")).as(Seq("ci", "csim")))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= n)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == exp, s"top-$n index sets differ")
    }
  }
}
