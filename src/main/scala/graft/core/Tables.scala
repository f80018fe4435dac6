package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Embeddings normalized to the engine's canonical vector-table shape
    * `(id LONG, vec ARRAY<DOUBLE>, label INT)`.
    *
    * Distances are computed in double precision end-to-end (the reference
    * computes in float32 — `internal/math/distance.go` — but our oracle
    * (DuckDB) and Catalyst both promote to double; computing in double on
    * both sides is what makes hash-parity achievable).
    */
  def vectors(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings").select(
      col("vec_id").as("id"),
      transform(col("embedding"), _.cast(DoubleType)).as("vec"),
      col("label"))
}
