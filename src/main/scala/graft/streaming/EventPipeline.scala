package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{IvfIndex, IvfModel}

/** Streaming-shaped event processing (SURVEY.md §2.9).
  *
  * Every transform here takes a DataFrame and is valid on BOTH a batch
  * frame and a `readStream` frame — the batch correctness gate and the
  * streaming path share one plan definition. Stateful pieces (windowed
  * aggregation with watermark, foreachBatch index append) are exercised
  * in ScalaTest with the memory sink.
  */
object EventPipeline {

  /** Event-time tumbling-window aggregation; on a stream, pair with
    * [[withWatermark]] for state eviction. */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Watermarks require TIMESTAMP (with local zone); driver parquet
    * carries TZ-naive `ts` some rounds, and under the session's UTC zone
    * the NTZ->LTZ cast is wall-clock identity. */
  private def tsAsLtz(events: DataFrame): DataFrame =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        events.withColumn("ts", col("ts").cast("timestamp_ltz"))
      case _ => events
    }

  def withWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    tsAsLtz(events).withWatermark("ts", delay)

  /** Start the streaming form of [[windowedCounts]] into a memory sink. */
  def startMemoryStream(spark: SparkSession, sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    val prepared = stream.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => stream
    }
    windowedCounts(withWatermark(prepared))
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Custom streaming state via mapGroupsWithState: per-user running
    * (event count, value sum), emitted each micro-batch in Update mode —
    * the KeyValueGroupedDataset stateful surface (SURVEY.md §2.9). */
  def startRunningUserStats(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      queryName: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val stream = spark.readStream.schema(schema).parquet(sourceDir)
    stream
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (uid, rows, state) =>
        var (n, v) = state.getOption.getOrElse((0L, 0.0))
        rows.foreach { r => n += 1; v += r._2 }
        state.update((n, v))
        (uid, n, v)
      }
      .toDF("user_id", "n_events", "total_value")
      .writeStream.outputMode("update")
      .format("memory").queryName(queryName)
      .start()
  }

  /** Streaming exact dedup — the streaming form of the batch
    * exact-dedup operator ([[graft.queries.DedupQueries]]): keep the
    * first occurrence of each content hash, drop repeats arriving
    * within the watermark horizon. `dropDuplicatesWithinWatermark`
    * bounds the dedup state by event time (a global `dropDuplicates`
    * would grow state forever — unusable on an unbounded stream), which
    * is the 100 TB-stream shape: state ∝ arrival rate × horizon, not
    * corpus size. Valid on a batch frame too (degenerates to plain
    * dropDuplicates over the hash). */
  def streamingDedup(events: DataFrame, hashCol: String,
      delay: String = "10 minutes"): DataFrame = {
    val hashed = tsAsLtz(events).withWatermark("ts", delay)
    if (hashed.isStreaming) hashed.dropDuplicatesWithinWatermark(hashCol)
    else hashed.dropDuplicates(hashCol)
  }

  /** Continuous index maintenance: each micro-batch of vectors is
    * assigned to its cluster with the *frozen* trained centroids and
    * appended to the index table — the reference's add-after-train
    * semantics (ivf.go:93-112: new vectors use old centroids until an
    * explicit re-train). Assignment is a pure projection, so it is
    * streaming-safe with no state. */
  def appendBatchToIvf(model: IvfModel, indexPath: String)(batch: DataFrame, batchId: Long): Unit =
    IvfIndex.assign(batch, model)
      .write.mode("append").partitionBy("cluster_id")
      .parquet(s"$indexPath/codes")

  /** Continuous SQ8 maintenance: new vectors encode with the FROZEN
    * min/max quantizer (the add-after-train rule, like [[appendBatchToIvf]])
    * and append to the codes table — a stateless pure projection, so the
    * stream needs no state store and retries are idempotent per batch.
    * Values outside the trained range clamp to the byte endpoints until
    * an explicit retrain. */
  def appendBatchToSq8(model: graft.index.Sq8Model, indexPath: String)(
      batch: DataFrame, batchId: Long): Unit =
    graft.index.Sq8Index.encode(batch, model)
      .write.mode("append").parquet(s"$indexPath/codes")

  /** Continuous BM25 impact-index maintenance — the lexical kind's
    * add-after-train rule: each micro-batch of documents weights its
    * postings against the FROZEN term model (df table + corpus stats,
    * [[graft.index.SparseIndex.encodeBm25]] — df/avgdl/n stay as trained
    * until an explicit rebuild, so append-then-search is bit-identical
    * to having built over old ∪ new under that model) and appends to the
    * posting files, term-sorted so parquet min/max pruning keeps working
    * on the new files. Stateless pure projection + two narrow aggs over
    * the BATCH only; idempotent per batch. */
  def appendBatchToBm25(dfq: DataFrame, model: graft.index.SparseIndex.Bm25Model,
      indexPath: String)(batch: DataFrame, batchId: Long): Unit =
    graft.index.SparseIndex.encodeBm25(batch, dfq, model)
      .repartitionByRange(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("append").parquet(s"$indexPath/postings")

  /** Continuous PLAID maintenance: a new doc batch's tokens assign with
    * the FROZEN quantizer ([[graft.index.PlaidIndex.append]] — the
    * add-after-train rule), landing as new files inside their centroid
    * partitions so probe-time partition pruning keeps working. A
    * stateless pure projection of the batch, like [[appendBatchToBm25]]. */
  def appendBatchToPlaid(model: graft.index.PlaidIndex.PlaidModel, indexPath: String)(
      batch: DataFrame, batchId: Long): Unit =
    graft.index.PlaidIndex.append(batch, model)
      .write.mode("append").partitionBy("cent").parquet(s"$indexPath/postings")

  /** Continuous OPQ maintenance: new vectors encode with the FROZEN
    * rotation + codebooks (the add-after-train rule) — a stateless pure
    * projection like [[appendBatchToSq8]], idempotent per batch. */
  def appendBatchToOpq(model: graft.index.OpqModel, indexPath: String)(
      batch: DataFrame, batchId: Long): Unit =
    graft.index.OpqIndex.encode(batch, model)
      .write.mode("append").parquet(s"$indexPath/codes")

  /** Continuous BQ maintenance: new vectors pack with the FROZEN
    * midrange thresholds — stateless pure projection, idempotent per
    * batch, same add-after-train rule as [[appendBatchToSq8]]. */
  def appendBatchToBq(model: graft.index.BqModel, indexPath: String)(
      batch: DataFrame, batchId: Long): Unit =
    graft.index.BqIndex.encode(batch, model)
      .write.mode("append").parquet(s"$indexPath/codes")

  /** Continuous routed-HNSW maintenance: the frozen routing model places
    * each new vector in its k-means region's sub-shard
    * ([[graft.index.RoutedHnswIndex.shardExpr]]); only the AFFECTED
    * shards are re-read (partition-pruned) and rebuilt, then dynamically
    * overwritten — same touched-fraction cost bound and bit-identical
    * result as [[appendBatchToHnsw]], with routing intact for serving. */
  def appendBatchToRoutedHnsw(model: graft.index.RoutedHnswModel, indexPath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.index.{HnswIndex, RoutedHnswIndex}
    val spark = batch.sparkSession
    val withShard = batch.select(RoutedHnswIndex.shardExpr(model),
      col("id").cast("long").as("id"), col("vec"))
    val affected = withShard.select(col("shard"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val existing = spark.read.parquet(s"$indexPath/graph")
      .withColumn("shard", col("shard").cast("int"))
      .where(col("shard").isin(affected: _*)) // pruned scan
      .select(col("shard"), col("id"), col("vec"))
    HnswIndex.buildFromShardCol(
        existing.unionByName(withShard), model.numShards, model.metric,
        HnswIndex.M, HnswIndex.EfConstruction)
      .repartition(col("shard"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$indexPath/graph")
  }

  /** Continuous HNSW maintenance: each micro-batch routes its vectors to
    * their shards (HnswIndex.shardCol) and rebuilds ONLY those shards —
    * the affected-shard read is partition-pruned (the graph is stored
    * partitioned by shard) and the rewrite is a dynamic partition
    * overwrite, so cost per batch is proportional to the touched
    * fraction. Build determinism makes the result bit-identical to a
    * full rebuild over old ∪ new ([[graft.index.HnswIndex.add]]). */
  def appendBatchToHnsw(metric: graft.core.Metric, numShards: Int, indexPath: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.index.HnswIndex
    val spark = batch.sparkSession
    val affected = batch
      .select(HnswIndex.shardCol(numShards))
      .distinct().collect().map(_.getInt(0)).toSeq
    val existing = spark.read.parquet(s"$indexPath/graph")
      .where(col("shard").isin(affected: _*)) // pruned scan
      .select(col("id"), col("vec"))
    HnswIndex.build(existing.unionByName(batch.select(col("id"), col("vec"))),
        numShards, metric)
      .repartition(col("shard"))
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard").parquet(s"$indexPath/graph")
  }
}
