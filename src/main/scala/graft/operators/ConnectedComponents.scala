package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering step that turns
  * verified near-duplicate PAIRS into duplicate GROUPS (pick one keeper
  * per component, drop the rest).
  *
  * Two paths under one contract (the Centroids.lloydLocal pattern —
  * bounded driver-local fast path, distributed general path above it):
  *
  *  - edge sets under [[LocalEdgeBudget]] collect to the driver and run
  *    union-find (the NODE table is never collected — only edge-touched
  *    nodes get a broadcast label map, everything else keeps its own id
  *    via a left join). Near-dup edge sets are bounded by the candidate
  *    join's selectivity, so this is the common case even when the
  *    corpus is not collectable.
  *  - larger edge sets run the two-phase large-star/small-star edge
  *    rewrite (Kiveris et al., "Connected Components in MapReduce and
  *    Beyond") — O(log n) rounds on ANY graph shape, each round grouped
  *    min-aggregations and equi-joins only. (r5 shipped min-label
  *    propagation here; its diameter(G)-round convergence tripped the
  *    maxIter guard on an adversarial 2000-node chain that the star
  *    alternation closes in ~12 rounds — OperatorFuzzSpec holds both
  *    the union-find equivalence fuzz and the deep-chain case.)
  */
/** Min-rooted path-compressing union-find over Long ids — the driver-
  * local core shared by [[ConnectedComponents.labelLocal]] and the
  * streaming [[graft.streaming.IncrementalComponents]]: comp(x) = the
  * minimum id reachable from x, which is the cross-checked contract
  * between the batch and incremental dedup-clustering paths. NOT
  * thread-safe — a caller that mutates from one thread while reading
  * from another must synchronize externally. */
private[graft] final class MinUnionFind {
  private val parent = new java.util.HashMap[Long, Long]()

  def find(x: Long): Long = {
    var r = x
    while (parent.getOrDefault(r, r) != r) r = parent.get(r)
    // path compression
    var c = x
    while (parent.getOrDefault(c, c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
    r
  }

  def union(a: Long, b: Long): Unit = {
    val (ra, rb) = (find(a), find(b))
    if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
  }

  /** (id, root) for every edge-touched id — the broadcast label map. */
  def snapshot: Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    parent.keySet.asScala.toSeq.map(id => (id, find(id)))
  }
}

object ConnectedComponents {

  /** Driver-local pairs budget: 2²² edges ≈ 64 MB of longs. */
  val LocalEdgeBudget: Long = 1L << 22

  /** Label every node with the minimum node id reachable from it.
    *
    * @param nodes single-column frame `(id LONG)` — every node to label,
    *              including isolated ones (they keep their own id)
    * @param edges undirected edge list `(id_a, id_b)`; orientation and
    *              duplicates are irrelevant
    * @return `(id, comp)` with `comp` = min reachable id
    */
  def label(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25,
      localEdgeBudget: Long = LocalEdgeBudget): DataFrame = {
    val e = edges.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    // Size-and-fetch in ONE pass: collect at most budget+1 edges — the
    // branch decision (count ≤ budget ⇔ capped fetch comes back under
    // budget) is unchanged, but the common bounded case no longer pays
    // cache+count+collect. The old shape computed the verified-pair plan
    // into the block cache first, and the cached materialization loses
    // AQE's runtime join planning — measured 13.9 s vs 3.0 s for the
    // SAME 215k-edge plan at sf0.1 (r12 probe; guide §2.4/§5 "caching is
    // only worth it when a DataFrame is reused").
    val fetch = math.max(0L, math.min(localEdgeBudget, Int.MaxValue - 2L)).toInt + 1
    // primitive-tuple collect (ADVICE r12): the probe fetches up to
    // budget+1 rows either way; decoding to (Long, Long) keeps the
    // over-budget probe at ~16 B/edge on the driver heap instead of
    // boxed GenericRow objects
    val spark0 = e.sparkSession
    import spark0.implicits._
    val capped = e.as[(Long, Long)].limit(fetch).collect()
    // branch on limit saturation, not the raw budget (ADVICE r12): with
    // a budget at or above the Int clamp, `capped.length <= budget` can
    // hold on a TRUNCATED fetch — `< fetch` cannot
    if (capped.length < fetch) labelLocal(nodes, capped)
    else {
      val cached = e.cache()
      val result = labelDistributed(nodes, cached, maxIter)
      cached.unpersist()
      result
    }
  }

  /** Driver union-find over the collected edge list; nodes stay
    * distributed and pick up their label through a broadcast left join
    * (missing ⇒ isolated ⇒ own id). */
  private[operators] def labelLocal(nodes: DataFrame,
      edges: Array[(Long, Long)]): DataFrame = {
    val uf = new MinUnionFind
    edges.foreach { case (a, b) => uf.union(a, b) }
    val spark = nodes.sparkSession
    import spark.implicits._
    val compDf = uf.snapshot.toDF("id", "c")
    nodes.select(col("id"))
      .join(broadcast(compDf), Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("comp"))
  }

  /** Two-phase large-star/small-star alternation (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", 2014) — the path
    * for edge sets too large to collect. Replaces r5's min-label
    * propagation: propagation needs diameter(G) rounds, which made an
    * adversarial chain hit the maxIter guard; the star alternation
    * converges in O(log n) rounds on ANY graph shape, each round two
    * grouped min-aggregations and two equi-joins over the (rewritten)
    * edge set — no cross products, no driver-side graph.
    *
    *  - large-star: per node u over ALL neighbors N(u),
    *    m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
    *  - small-star: per node u over smaller neighbors N⁻(u),
    *    m = min(N⁻(u) ∪ {u}); emit (v, m) for v ∈ N⁻(u) ∪ {u}, v ≠ m.
    *
    * Both phases preserve connectivity; the fixpoint is a star forest
    * whose centers are the component minima, so the final label of a
    * node is min(itself, its min neighbor). Every emitted edge already
    * has its smaller endpoint first, so the canonical (a < b) distinct
    * edge set doubles as the fixpoint detector (count + edge-hash sum —
    * one scalar agg per round). Rounds are localCheckpoint'ed eagerly:
    * the rewritten set feeds the next round's two self-referencing
    * plans, and plain cache() would double the LOGICAL plan per round
    * (analysis hit 2 GB of plan string by round 12 under r5's
    * propagation loop; checkpoints pin each round as a constant-size
    * LogicalRDD, superseded ones released by the ContextCleaner).
    *
    * Contract parity with [[labelLocal]] (ADVICE r5): edge endpoints
    * absent from `nodes` act as conduits (they participate in the
    * rewrite) but are dropped from the OUTPUT by the final semi-join —
    * both paths return exactly one row per node. Exiting at `maxIter`
    * without a fixpoint throws instead of returning wrong labels
    * (ADVICE r5) — at O(log n) rounds the default guard covers any
    * physically storable graph. */
  private[operators] def labelDistributed(nodes: DataFrame, edges: DataFrame,
      maxIter: Int): DataFrame = {
    // canonical undirected edge set: (a < b), distinct, no self-loops
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    var e = canon(edges.select(col("id_a").as("x"), col("id_b").as("y")))
      .localCheckpoint(true)
    // fixpoint signature: (row count, sum of a collision-resistant edge
    // hash) — equal signatures on canonical distinct sets ⇔ equal sets
    def signature(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)"))).head()
      (r.getLong(0), Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var prevSig = signature(e)
    var iter = 0
    var converged = prevSig._1 == 0L // no edges ⇒ already a (trivial) fixpoint
    while (!converged && iter < maxIter) {
      // large-star over all neighbors
      val adj = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val lsMins = adj.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val ls = canon(adj.join(lsMins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("x"), col("m").as("y")))
        .localCheckpoint(true)
      // small-star over smaller neighbors (orientation big → small)
      val o = ls.select(col("b").as("u"), col("a").as("v"))
      val ssMins = o.groupBy("u").agg(min("v").as("m"))
      val ss = o.join(ssMins, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("x"), col("m").as("y"))
        .union(ssMins.select(col("u").as("x"), col("m").as("y")))
      val next = canon(ss).localCheckpoint(true)
      val nextSig = signature(next)
      val prev = e
      e = next
      // signature equality is a fast heuristic; confirm with an EXACT
      // set check before ending the loop (runs once at the candidate
      // fixpoint, not per round) — a hash-sum collision across two
      // different successive edge sets must not end the alternation
      // early with silently wrong labels. Counts are equal here, and
      // both frames are canonical distinct sets, so one-sided exceptAll
      // emptiness ⇔ set equality.
      converged = nextSig == prevSig && next.exceptAll(prev).isEmpty
      prevSig = nextSig
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents.labelDistributed did not converge in $maxIter " +
          "large-star/small-star rounds — labels would be wrong. The " +
          "alternation needs O(log n) rounds, so raise maxIter only for " +
          "astronomically large graphs; otherwise suspect the edge input.")
    // star forest ⇒ label = min(self, min neighbor); isolated ⇒ self
    val adj = e.select(col("a").as("id"), col("b").as("v"))
      .union(e.select(col("b").as("id"), col("a").as("v")))
    val lbl = adj.groupBy("id").agg(min("v").as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("comp"))
    nodes.select(col("id"))
      .join(lbl, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
      .localCheckpoint(true)
  }
}
