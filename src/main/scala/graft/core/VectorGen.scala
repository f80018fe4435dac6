package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vector generators (SURVEY.md S1–S3). All deterministic — no RNG
  * stream — so results reproduce across runs and cluster sizes (the
  * reference's Go `math/rand` stream can't be reproduced on the JVM;
  * FIXTURES.md §1a).
  */
object VectorGen {

  /** n pseudo-random vectors in [0,1)^dim with sequential ids (the
    * GenerateRandom analog, vector.go:23-34): xxhash64-mixed components,
    * seeded. */
  def random(spark: SparkSession, n: Long, dim: Int, seed: Long): DataFrame =
    spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(xxhash64(col("id"), i, lit(seed)), lit(1000003L))
          .cast("double") / 1000003.0).as("vec"))

  /** Deterministic pattern vectors: component j of vector i = i·dim + j
    * (GenerateTestVectors, testutils/helpers.go:84-98). */
  def pattern(spark: SparkSession, n: Long, dim: Int): DataFrame =
    spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => (col("id") * dim + j).cast("double")).as("vec"))

  /** The dim orthogonal unit basis vectors e_0..e_{dim-1}
    * (GenerateOrthogonalVectors, testutils/helpers.go:101-116). */
  def orthogonal(spark: SparkSession, dim: Int): DataFrame =
    spark.range(dim).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => when(j === col("id"), 1.0).otherwise(0.0)).as("vec"))

  /** n vectors in k deterministic clusters: vector i sits at cluster
    * `i % k`'s center (xxhash-uniform in [0,1)^dim) plus ±spread/2
    * per-component noise. Real embedding corpora are clustered — this is
    * the regime where region-routed indexes ([[graft.index.RoutedHnswIndex]],
    * IVF probes) hold high recall at small probe fractions, unlike the
    * structureless [[random]] where neighbor identity is spread across
    * all regions. Deterministic like every generator here. */
  def clustered(spark: SparkSession, n: Long, dim: Int, k: Int,
      spread: Double, seed: Long): DataFrame = {
    val c = (col("id") % k).cast("long")
    spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        pmod(xxhash64(c, i, lit(seed)), lit(1000003L)).cast("double") / 1000003.0 +
          (pmod(xxhash64(col("id"), i, lit(seed + 1)), lit(1000003L)).cast("double")
            / 1000003.0 - 0.5) * spread).as("vec"))
  }

  /** [[clustered]] plus BRIDGE MASS: a `bridgeFrac` share of each
    * cluster's points slide a deterministic fraction t ∈ [0, 0.5) along
    * the segment toward the next cluster's center (ring order, cluster c
    * bridges toward (c+1) % k), before the same ±spread/2 noise.
    *
    * Why this exists (VERDICT r8 #2): [[clustered]]'s centers are
    * xxhash-uniform in [0,1)^dim, so at 128d the inter-center distance
    * (≈√(dim/6) ≈ 4.6) dwarfs the intra-cluster noise radius even at
    * spread 1 — clusters are DISJOINT, every point's true neighbors live
    * in its own cluster, and a region router's recall is exactly flat in
    * the probe count R once one probe covers the home region (the 1M
    * bench artifact measured recall(R=2) ≡ recall(R=4) to 4 decimals).
    * Per-dim uniform noise cannot fix that: moving a point closer to a
    * foreign center than its own needs an ~8σ cross-term at any usable
    * spread. Bridge points fix it structurally — a point at t has true
    * neighbors at nearby t on BOTH sides of the region boundary that
    * k-means draws across the segment, so recall strictly climbs with R
    * and boundary replication ([[graft.index.RoutedHnswIndex
    * .buildReplicated]]) has real cross-boundary neighbors to recover —
    * the SPANN regime the routed rows exist to measure. */
  /** FROZEN parameter set for a clustered/bridged bench world, plus its
    * in-artifact fingerprint (VERDICT r10 wrong #1: the bridged-world
    * generator protocol drifted mid-round, leaving bench rows whose
    * meaning depended on an unversioned config — `hnsw_clustered_recall`
    * read 0.8043 in the artifact but 0.5953 at committed HEAD). Every
    * clustered bench row now derives its data from ONE of these specs and
    * publishes `fingerprint` beside it, so any future generator or
    * parameter drift is detectable inside the artifact itself. */
  final case class ClusteredWorldSpec(k: Int, spread: Double, bridgeFrac: Double,
      seed: Long) {
    def generate(spark: SparkSession, n: Long, dim: Int): DataFrame =
      clusteredBridged(spark, n, dim, k, spread, bridgeFrac, seed)

    /** Deterministic world fingerprint: a 48-bit hash (exact as a Double,
      * the bench map's value type) of the parameters AND a probe of the
      * generated data itself (row 0's components) — parameters alone
      * would miss a change to the generator's arithmetic. */
    def fingerprint(spark: SparkSession, n: Long, dim: Int): Double = {
      val probe = generate(spark, n, dim)
        .where(col("id") === 0L).select(col("vec")).head.getSeq[Double](0)
      var h = 0xcbf29ce484222325L // FNV-1a over params then probe bits
      def mix(x: Long): Unit = { h ^= x; h *= 0x100000001b3L }
      mix(k.toLong); mix(java.lang.Double.doubleToLongBits(spread))
      mix(java.lang.Double.doubleToLongBits(bridgeFrac)); mix(seed)
      mix(n); mix(dim.toLong)
      probe.foreach(v => mix(java.lang.Double.doubleToLongBits(v)))
      (h >>> 16).toDouble
    }
  }

  object ClusteredWorldSpec {
    /** The bench's clustered regime, frozen as of r10's final protocol
      * (64 bridged clusters, spread 0.3, bridge share 0.25, seed 23). */
    val Bench: ClusteredWorldSpec =
      ClusteredWorldSpec(k = 64, spread = 0.3, bridgeFrac = 0.25, seed = 23L)
  }

  def clusteredBridged(spark: SparkSession, n: Long, dim: Int, k: Int,
      spread: Double, bridgeFrac: Double, seed: Long): DataFrame = {
    require(bridgeFrac >= 0.0 && bridgeFrac <= 1.0,
      s"bridgeFrac must be in [0,1], got $bridgeFrac")
    val c = (col("id") % k).cast("long")
    val partner = ((col("id") % k + 1L) % k).cast("long")
    val u = pmod(xxhash64(col("id"), lit(seed + 2)), lit(1000003L))
      .cast("double") / 1000003.0
    // u < bridgeFrac selects the bridge share; their t spreads uniformly
    // over [0, 0.5) (t = 0.5 would alias the midpoint from both sides)
    val t = when(u < bridgeFrac, u / lit(bridgeFrac) * 0.5).otherwise(0.0)
    def center(cc: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      pmod(xxhash64(cc, i, lit(seed)), lit(1000003L)).cast("double") / 1000003.0
    spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)), i =>
        (lit(1.0) - t) * center(c, i) + t * center(partner, i) +
          (pmod(xxhash64(col("id"), i, lit(seed + 1)), lit(1000003L)).cast("double")
            / 1000003.0 - 0.5) * spread).as("vec"))
  }
}
