package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Metric, Tables}
import graft.index.{FlatIndex, HnswIndex, IvfIndex}
import graft.queries.VectorQueries
import graft.streaming.EventPipeline

/** Structured-streaming behavior: the batch-defined plans run as streams
  * (memory sink), and foreachBatch index maintenance appends correctly.
  */
class StreamingSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("windowed event aggregation runs as a structured stream (memory sink)") {
    val batchSchema = Tables.load(spark, TestSession.Sf0001, "events").schema
    // FileStreamSource requires a directory of files, not a single file
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(TestSession.Sf0001, "events.parquet"),
      dir.resolve("part-0.parquet"))
    val q = EventPipeline.startMemoryStream(
      spark, dir.toString, batchSchema, "stream_counts")
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT sum(n) FROM stream_counts").first().getLong(0)
      // watermark append-mode emits only closed windows; all windows close
      // once the (finite) input is exhausted except those inside the delay
      assert(streamed > 0)
      val batchTotal = Tables.events(spark, TestSession.Sf0001).count()
      assert(streamed <= batchTotal)
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-user stats across micro-batches") {
    val batchSchema = Tables.load(spark, TestSession.Sf0001, "events").schema
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(TestSession.Sf0001, "events.parquet"),
      dir.resolve("part-0.parquet"))
    val q = EventPipeline.startRunningUserStats(
      spark, dir.toString, batchSchema, "stream_user_stats")
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM stream_user_stats GROUP BY user_id")
      val batch = Tables.load(spark, TestSession.Sf0001, "events")
        .groupBy(org.apache.spark.sql.functions.col("user_id"))
        .count().withColumnRenamed("count", "n")
      assert(streamed.exceptAll(batch).count() == 0 &&
        batch.exceptAll(streamed).count() == 0)
    } finally q.stop()
  }

  test("streaming dedup drops repeated hashes within the watermark, keeps state bounded") {
    // source: every event file duplicated — the streamed dedup must emit
    // each content hash exactly once
    val raw = Tables.events(spark, TestSession.Sf0001)
    val tsCol = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => timestamp_micros(expr("ts div 1000"))
      case _ => col("ts")
    }
    val events = raw.select(col("event_id"), tsCol.as("ts"),
      sha2(concat_ws("|", col("user_id"), col("event_type")), 256).as("h"))
    val staging = java.nio.file.Files.createTempDirectory("graft_dedup_src")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream")
    events.write.mode("overwrite").parquet(staging.toString)
    java.nio.file.Files.list(staging).forEach { p =>
      if (p.toString.endsWith(".parquet")) {
        java.nio.file.Files.copy(p, dir.resolve(p.getFileName))
        java.nio.file.Files.copy(p, dir.resolve("dup_" + p.getFileName))
      }
    }
    val stream = spark.readStream.schema(events.schema).parquet(dir.toString)
    val q = EventPipeline.streamingDedup(stream, "h", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT count(*) FROM stream_dedup").first().getLong(0)
      val distinctHashes = events.select("h").distinct().count()
      assert(streamed == distinctHashes,
        s"streamed $streamed rows, expected $distinctHashes distinct hashes")
    } finally q.stop()
    // batch degenerate form: plain dropDuplicates over the hash
    val batchDedup = EventPipeline.streamingDedup(events.unionAll(events), "h")
    assert(batchDedup.count() == events.select("h").distinct().count())
  }

  test("incremental near-dup over a split stream equals the batch keeper rule") {
    import graft.streaming.IncrementalNearDup
    val docs = Tables.load(spark, TestSession.Sf0001, "documents")
      .where(col("doc_id") < 300)
      .select(col("doc_id"), col("text"))
    val expected = IncrementalNearDup.keepers(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty && expected.size < 300,
      "test corpus should contain at least one near-dup to exercise the drop path")

    // stream the same corpus in doc_id order, split into two files
    val srcDir = java.nio.file.Files.createTempDirectory("graft_ndup_src")
    val bandDir = java.nio.file.Files.createTempDirectory("graft_ndup_bands").resolve("t")
    val outDir = java.nio.file.Files.createTempDirectory("graft_ndup_out").resolve("t")
    docs.where(col("doc_id") < 150).coalesce(1)
      .write.parquet(srcDir.resolve("a").toString)
    docs.where(col("doc_id") >= 150).coalesce(1)
      .write.parquet(srcDir.resolve("b").toString)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1) // force ≥ 2 micro-batches
      .parquet(srcDir.toString + "/*")
    val q = IncrementalNearDup.stream(stream, bandDir.toString, outDir.toString)
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(outDir.toString)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamed == expected,
        s"stream kept ${streamed.size} docs, batch rule kept ${expected.size}; " +
          s"diff=${(streamed diff expected) ++ (expected diff streamed)}")
    } finally q.stop()
  }

  test("streaming decontamination over a split stream equals the batch 8-gram overlap") {
    import graft.streaming.StreamingDecontamination
    val d = Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val evalDocs = d.where(col("doc_id") < 20) // the batch queries' EvalCap
    val corpus = d.where(col("doc_id") >= 20 && col("doc_id") < 300)
    val eval = StreamingDecontamination.evalSide(evalDocs)
    // batch truth: the same screen run once over the whole corpus slice —
    // identical semantics to the oracle-verified contamination_8gram
    val expected = StreamingDecontamination.screenBatch(corpus, eval)
      .collect().map(_.toString).sorted.toSeq
    assert(expected.nonEmpty, "test slice should contain contamination")

    val srcDir = java.nio.file.Files.createTempDirectory("graft_decon_src")
    val outDir = java.nio.file.Files.createTempDirectory("graft_decon_out").resolve("t")
    val ckDir = java.nio.file.Files.createTempDirectory("graft_decon_ck").resolve("t")
    corpus.where(col("doc_id") < 150).coalesce(1)
      .write.parquet(srcDir.resolve("a").toString)
    corpus.where(col("doc_id") >= 150).coalesce(1)
      .write.parquet(srcDir.resolve("b").toString)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1) // force >= 2 micro-batches
      .parquet(srcDir.toString + "/*")
    val q = StreamingDecontamination.stream(stream, eval,
      outDir.toString, ckDir.toString)
    try {
      q.processAllAvailable()
      val streamed = spark.read.parquet(outDir.toString)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == expected,
        s"stream flagged ${streamed.size} overlap rows, batch ${expected.size}")
    } finally { q.stop(); eval.grams.unpersist() }
  }

  test("incremental connected components over a split stream equals batch labeling " +
      "(stream ≡ batch for any micro-batch split)") {
    import graft.streaming.{IncrementalComponents, IncrementalNearDup}
    val docs = Tables.load(spark, TestSession.Sf0001, "documents")
      .where(col("doc_id") < 300)
      .select(col("doc_id"), col("text"))
    // batch ground truth: same candidate/verify rule as the streaming
    // operator, labeled by the batch ConnectedComponents operator
    val bands = IncrementalNearDup.bandRows(docs)
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    val toksD = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.array_distinct(
        graft.functions.TextFunctions.toks(col("text"))).as("ts"))
    val pairs = cand
      .join(toksD.select(col("doc_id").as("id_a"), col("ts").as("ta")), Seq("id_a"))
      .join(toksD.select(col("doc_id").as("id_b"), col("ts").as("tb")), Seq("id_b"))
      .where(graft.functions.TextFunctions.jaccard(col("ta"), col("tb")) >= 0.6)
      .select("id_a", "id_b")
    val expected = graft.operators.ConnectedComponents
      .label(docs.select(col("doc_id").as("id")), pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.values.toSet.size < expected.size,
      "test corpus should contain at least one multi-doc component")

    val srcDir = java.nio.file.Files.createTempDirectory("graft_cc_src")
    val bandDir = java.nio.file.Files.createTempDirectory("graft_cc_bands").resolve("t")
    val tokDir = java.nio.file.Files.createTempDirectory("graft_cc_toks").resolve("t")
    docs.where(col("doc_id") < 100).coalesce(1)
      .write.parquet(srcDir.resolve("a").toString)
    docs.where(col("doc_id") >= 100 && col("doc_id") < 200).coalesce(1)
      .write.parquet(srcDir.resolve("b").toString)
    docs.where(col("doc_id") >= 200).coalesce(1)
      .write.parquet(srcDir.resolve("c").toString)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1) // force ≥ 3 micro-batches
      .parquet(srcDir.toString + "/*")
    val inc = new IncrementalComponents()
    val q = inc.stream(stream, bandDir.toString, tokDir.toString)
    try {
      q.processAllAvailable()
      val streamed = inc.labels(docs.select(col("doc_id").as("id")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == expected,
        s"stream labels diverge on ${streamed.toSet diff expected.toSet}")
    } finally q.stop()
  }

  test("streaming mixture sampling under a static plan equals the batch sample " +
      "(stateless stream-static join, any micro-batch split)") {
    import graft.streaming.StreamingMixture
    val dir = TestSession.Sf0001
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "source", "text")
    val plan = graft.queries.TextQueries.queries("mixture_plan")(spark, dir)
    val expected = graft.queries.TextQueries.queries("mixture_sample")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(expected.nonEmpty, "plan should accept some docs")

    val srcDir = java.nio.file.Files.createTempDirectory("graft_mix_src")
    docs.where(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(srcDir.resolve("a").toString)
    docs.where(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(srcDir.resolve("b").toString)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1) // force ≥ 2 micro-batches
      .parquet(srcDir.toString + "/*")
    val q = StreamingMixture.sample(stream, plan)
      .writeStream.format("memory").queryName("mix_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("mix_stream")
        .collect().map(_.getLong(0)).toSet
      assert(streamed == expected,
        s"stream kept ${streamed.size}, batch kept ${expected.size}; " +
          s"diff=${(streamed diff expected) ++ (expected diff streamed)}")
    } finally q.stop()
  }

  test("foreachBatch appends assigned vectors to an IVF index table") {
    val (corpus, queries) = graft.queries.VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    // simulate two micro-batches
    val b1 = corpus.where(col("id") % 2 === 0)
    val b2 = corpus.where(col("id") % 2 === 1)
    EventPipeline.appendBatchToIvf(model, dir)(b1, 0L)
    EventPipeline.appendBatchToIvf(model, dir)(b2, 1L)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == corpus.count())
    // the incrementally-built table answers searches identically to batch
    val inc = IvfIndex.search(codes, model, queries, 10, 8)
      .select("query_id", "neighbor_id", "rank")
    val batch = FlatIndex.knn(corpus, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    assert(inc.exceptAll(batch).count() == 0)
  }

  test("foreachBatch SQ8 maintenance: frozen-model incremental encode equals batch encode") {
    import graft.index.Sq8Index
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = Sq8Index.train(corpus, graft.core.Metric.L2)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sq8").toString
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    val b1 = corpus.where(col("id") <= maxId / 2)
    val b2 = corpus.where(col("id") > maxId / 2)
    EventPipeline.appendBatchToSq8(model, dir)(b1, 0L)
    EventPipeline.appendBatchToSq8(model, dir)(b2, 1L)
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.count() == corpus.count())
    val inc = Sq8Index.knnBlocked(codes, model, queries, 10)
      .select("query_id", "neighbor_id", "rank")
    val batch = Sq8Index.knnBlocked(Sq8Index.encode(corpus, model), model, queries, 10)
      .select("query_id", "neighbor_id", "rank")
    assert(inc.exceptAll(batch).count() == 0 && batch.exceptAll(inc).count() == 0)
  }

  test("foreachBatch HNSW maintenance rebuilds only touched shards, equals full build") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_hnsw").toString
    // initial index: even ids; two micro-batches: odd ids split in half
    val init = corpus.where(col("id") % 2 === 0)
    val maxId = corpus.agg(max(col("id"))).first().getLong(0)
    graft.io.IndexIO.saveHnsw(spark, dir, HnswIndex.build(init, 4, Metric.L2), Metric.L2)
    val b1 = corpus.where(col("id") % 2 === 1 && col("id") <= maxId / 2)
    val b2 = corpus.where(col("id") % 2 === 1 && col("id") > maxId / 2)
    EventPipeline.appendBatchToHnsw(Metric.L2, 4, dir)(b1, 0L)
    EventPipeline.appendBatchToHnsw(Metric.L2, 4, dir)(b2, 1L)
    val maintained = spark.read.parquet(s"$dir/graph")
      .withColumn("shard", col("shard").cast("int"))
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("shard"), col("id"), col("level"), col("edges"))
      .collect().map(_.toString).sorted.toSeq
    assert(snap(maintained) == snap(HnswIndex.build(corpus, 4, Metric.L2)))
    val inc = HnswIndex.knnBlocked(maintained, queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    val full = HnswIndex.knnBlocked(HnswIndex.build(corpus, 4, Metric.L2), queries, 10, Metric.L2)
      .select("query_id", "neighbor_id", "rank")
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
  }
}
