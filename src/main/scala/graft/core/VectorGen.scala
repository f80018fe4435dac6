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
}
