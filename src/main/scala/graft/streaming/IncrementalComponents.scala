package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions._

/** Incremental connected-components dedup CLUSTERING of a document
  * stream — closes the streaming dedup story end-to-end (VERDICT r5
  * next #8): [[IncrementalNearDup]] keeps the keeper SET streaming, but
  * clusters (`dedup_components`) were batch-only; this maintains the
  * duplicate-component labeling across micro-batches.
  *
  * Per micro-batch:
  *  1. the batch's LSH band rows equi-join the accumulated band table
  *     (plus themselves) → candidate pairs touching ≥ 1 new doc — the
  *     ONLY pair source, so per-batch work is ∝ band collisions, never
  *     pairwise over the corpus;
  *  2. candidates verify by exact token Jaccard (the tokens of the two
  *     sides load via equi-joins against the accumulated token table —
  *     wide token arrays ride only on the verified-candidate rows,
  *     mirroring the batch `verifiedPairs` discipline);
  *  3. verified edges feed a driver union-find held across batches —
  *     union-find is naturally incremental, and the edge set of a
  *     near-dup graph is bounded by candidate-join selectivity (the
  *     same [[graft.operators.ConnectedComponents.LocalEdgeBudget]]
  *     rationale; the budget guard throws past it, where the documented
  *     fallback is a periodic batch
  *     [[graft.operators.ConnectedComponents.label]] over the
  *     accumulated edge log).
  *
  * Every pair of the batch rule surfaces exactly once: a collision
  * (a, b) with a seen before b is discovered in b's batch (prior-band
  * join), same-batch collisions in that batch's self-join — so after
  * draining the stream, [[labels]] equals the batch
  * `ConnectedComponents.label(nodes, verifiedPairs)` for ANY micro-batch
  * split (StreamingSpec asserts it).
  */
final class IncrementalComponents(
    jaccardThreshold: Double = 0.6,
    edgeBudget: Long = graft.operators.ConnectedComponents.LocalEdgeBudget) {

  // shared min-rooted union-find core (same class labelLocal uses, so the
  // batch and incremental comp contracts cannot drift); uf is mutated by
  // the streaming thread in step() and snapshotted by labels() from any
  // thread — all access goes through this lock
  private val uf = new graft.operators.MinUnionFind
  private val ufLock = new Object
  private var edgeCount = 0L

  private val tokSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("ts", ArrayType(StringType))))
  private val bandSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("band", IntegerType),
    StructField("key", LongType)))

  // existence via the path's own Hadoop FileSystem, NOT java.io.File — an
  // hdfs://, s3a://, or file: URI path must read prior state, not silently
  // start empty while appends keep landing remotely
  private def prior(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** One micro-batch step: discovers and verifies the batch's new dup
    * pairs, folds them into the union-find, appends the batch's band and
    * token rows to the accumulating tables. */
  def step(spark: SparkSession, batch: DataFrame, bandPath: String,
      tokPath: String): Unit = {
    val bands = IncrementalNearDup.bandRows(batch).cache()
    val toksB = batch
      .select(col("doc_id"), array_distinct(toks(col("text"))).as("ts")).cache()
    try {
      val allBands = prior(spark, bandPath, bandSchema)
        .union(bands.select("doc_id", "band", "key"))
      // candidates touching >= 1 batch doc; normalized (id_a < id_b) so a
      // pair never verifies twice within the batch
      val cand = bands.alias("n")
        .join(allBands.alias("o"),
          col("n.band") === col("o.band") && col("n.key") === col("o.key") &&
            col("n.doc_id") =!= col("o.doc_id"))
        .select(least(col("n.doc_id"), col("o.doc_id")).as("id_a"),
          greatest(col("n.doc_id"), col("o.doc_id")).as("id_b"))
        .distinct()
      val allToks = prior(spark, tokPath, tokSchema).union(toksB)
      val edges = cand
        .join(allToks.select(col("doc_id").as("id_a"), col("ts").as("ta")), Seq("id_a"))
        .join(allToks.select(col("doc_id").as("id_b"), col("ts").as("tb")), Seq("id_b"))
        .where(jaccard(col("ta"), col("tb")) >= jaccardThreshold)
        .select(col("id_a"), col("id_b"))
        .collect()
      ufLock.synchronized {
        edgeCount += edges.length
        if (edgeCount > edgeBudget)
          throw new IllegalStateException(
            s"IncrementalComponents exceeded the $edgeBudget-edge driver budget; " +
              "switch to periodic batch ConnectedComponents.label over the " +
              "accumulated edge log at this scale")
        edges.foreach(r => uf.union(r.getLong(1), r.getLong(0)))
      }
      bands.select("doc_id", "band", "key").write.mode("append").parquet(bandPath)
      toksB.write.mode("append").parquet(tokPath)
    } finally { bands.unpersist(); toksB.unpersist() }
  }

  /** (id, comp) for every node in `nodes` under the edges seen so far —
    * same broadcast-label-map shape as
    * [[graft.operators.ConnectedComponents.labelLocal]]: nodes stay
    * distributed, only edge-touched ids ride the broadcast. */
  def labels(nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    val compRows = ufLock.synchronized(uf.snapshot)
    val compDf = compRows.toDF("id", "c")
    nodes.select(col("id"))
      .join(broadcast(compDf), Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("comp"))
  }

  private var lastBatch = -1L

  /** Streaming driver: foreachBatch [[step]]. Label queries run on the
    * driver state at any time via [[labels]] (snapshot under the lock).
    *
    * Replay semantics: foreachBatch is at-least-once, so a batch that
    * fails mid-commit can re-fire with the same batchId — the guard
    * below skips it, keeping the band/token appends and the edge-budget
    * count exactly-once WITHIN a driver's lifetime. The union-find is
    * in-memory and the band/token tables are on disk: they live and die
    * together, so after a driver RESTART start from fresh side-table
    * paths and a fresh checkpoint (or rebuild via a batch
    * `ConnectedComponents.label` over re-derived pairs) — resuming the
    * checkpoint against surviving side tables with an empty union-find
    * would under-merge silently. */
  def stream(docs: DataFrame, bandPath: String, tokPath: String): StreamingQuery =
    docs.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) =>
        if (id > lastBatch) {
          step(b.sparkSession, b, bandPath, tokPath)
          lastBatch = id
        }
      }
      .start()
}
