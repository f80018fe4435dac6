package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.functions.timestamp_micros

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Events with `ts` normalized to a microsecond TIMESTAMP.
    *
    * The driver's events.parquet stores TIMESTAMP(NANOS), which Spark 4
    * only reads as LongType under `spark.sql.legacy.parquet.nanosAsLong`
    * (set in GraftSession/Verify/Bench). ns→µs truncation here matches
    * DuckDB's ns→µs truncation on read, so event-time buckets agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val e = load(spark, dir, "events")
    e.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        e.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => e
    }
  }

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
