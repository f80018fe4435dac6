package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.functions.TextFunctions._

/** Incremental MinHash/LSH near-dedup of a document stream against an
  * accumulating band-key table — the shape a 100 TB crawl pipeline
  * needs: each new slice of the corpus dedups against *everything
  * ingested so far* without re-reading the corpus.
  *
  * Keeper rule: a document is KEPT iff no earlier document shares any
  * of its LSH band keys — "earlier" meaning any prior micro-batch, or
  * a smaller `doc_id` inside the same batch. Band rows of *every*
  * document (kept and dropped) accumulate, so chains collapse onto the
  * first-seen member of each near-dup cluster. When the stream arrives
  * in `doc_id` order the result is EXACTLY the batch [[keepers]] rule
  * (no smaller doc_id shares a band), independent of how the stream is
  * split into batches — the property StreamingSpec asserts and the
  * `near_dup_keepers` DuckDB oracle hash-verifies.
  *
  * Scale: per batch this is one narrow (doc_id, band, key) self-agg and
  * one left-semi equi-join against the band table — both key-partitioned
  * shuffles, no pairwise comparisons. The band table grows ∝ corpus ×
  * [[graft.functions.TextFunctions.Bands]] rows; at cluster scale it
  * would be written bucketed by `key` so the semi-join co-locates
  * without a full shuffle of the accumulated side.
  *
  * Reference near-dup semantics: minhash banding as in the batch
  * operator ([[graft.queries.DedupQueries]] `near_dup_minhash`).
  */
object IncrementalNearDup {

  /** Narrow (doc_id, band, key) rows — the only columns that ever
    * enter a shuffle here. */
  def bandRows(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), minhashSig(col("text")).as("sig"))
      .select(col("doc_id"),
        explode(sequence(lit(0), lit(Bands - 1))).as("band"), col("sig"))
      .select(col("doc_id"), col("band"), bandKey(col("sig"), col("band")).as("key"))

  /** Batch form of the keeper rule: kept iff no smaller doc_id shares a
    * band key. One groupBy(min) + one anti-join — no self-join of docs. */
  def keepers(docs: DataFrame): DataFrame = {
    val bands = bandRows(docs)
    val minPerKey = bands.groupBy("band", "key").agg(min("doc_id").as("min_id"))
    val dropped = bands.join(minPerKey, Seq("band", "key"))
      .where(col("min_id") < col("doc_id"))
      .select("doc_id").distinct()
    docs.join(dropped, Seq("doc_id"), "left_anti")
  }

  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("key", LongType)))

  // existence via the path's own Hadoop FileSystem, NOT java.io.File, so
  // hdfs://, s3a://, and file: URI paths read prior state correctly
  private def priorBands(spark: SparkSession, bandPath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(bandPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(bandSchema).parquet(bandPath)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bandSchema)
  }

  /** One micro-batch step: returns the batch's kept documents and
    * appends ALL the batch's band rows to the accumulating table. */
  def step(spark: SparkSession, batch: DataFrame, bandPath: String): DataFrame = {
    val bands = bandRows(batch).cache()
    try {
      val dupPrior = bands
        .join(priorBands(spark, bandPath), Seq("band", "key"), "left_semi")
        .select("doc_id")
      val minPerKey = bands.groupBy("band", "key").agg(min("doc_id").as("min_id"))
      val dupBatch = bands.join(minPerKey, Seq("band", "key"))
        .where(col("min_id") < col("doc_id"))
        .select("doc_id")
      val dropped = dupPrior.union(dupBatch).distinct()
      val kept = batch.join(dropped, Seq("doc_id"), "left_anti")
        .localCheckpoint(true) // materialize BEFORE the band append below
      bands.select("doc_id", "band", "key")
        .write.mode("append").parquet(bandPath)
      kept
    } finally bands.unpersist()
  }

  /** Streaming driver: foreachBatch step, kept docs appended to
    * `outPath`. Checkpointing is the caller's `writeStream` default. */
  def stream(docs: DataFrame, bandPath: String, outPath: String): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        step(b.sparkSession, b, bandPath)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
}
