package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Metric
import graft.index.{FlatIndex, IvfIndex}
import graft.queries.VectorQueries

/** Physical-plan assertions: the scale properties claimed in the
  * scaladocs must be visible in the executed plans.
  */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("flat kNN is a broadcast join — the corpus side never shuffles before distances") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val plan = planOf(FlatIndex.knn(corpus, queries, 10, Metric.L2))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join in:\n$plan")
    // the only Exchange should come after the distance projection (top-k),
    // i.e. the scan side feeds the join directly
    val beforeJoin = plan.substring(plan.indexOf("BroadcastNestedLoopJoin"))
    assert(beforeJoin.contains("Scan"), "corpus scan should feed the join directly")
  }

  test("IVF search broadcasts the probe set (no shuffle of the index table)") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = IvfIndex.trainDeterministic(corpus, 8, Metric.L2)
    val assigned = IvfIndex.assign(corpus, model)
    val plan = planOf(IvfIndex.search(assigned, model, queries, 10, 4))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected probe broadcast in:\n$plan")
  }

  test("vocab_topk plans as partial-agg wordcount with TakeOrdered (no global sort)") {
    val plan = planOf(
      graft.queries.TextQueries.queries("vocab_topk")(spark, TestSession.Sf0001))
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"expected map-side partial aggregation in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-k (not a global Sort + Limit) in:\n$plan")
  }

  test("incremental near-dup dropped-set is equi-join only (never a nested-loop join)") {
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") < 200)
      .select("doc_id", "text")
    val plan = planOf(graft.streaming.IncrementalNearDup.keepers(docs))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"keeper rule must stay an equi-join:\n$plan")
  }

  /** The part of the executed adaptive plan that actually ran: AQE's
    * exchange-stage reuse only materializes in the final plan, so scan
    * counting on the static/initial plan would overcount. Call after an
    * action has run the df. */
  private def finalPlanOf(df: org.apache.spark.sql.DataFrame): String = {
    val s = df.queryExecution.executedPlan.toString
    val cut = s.indexOf("== Initial Plan ==")
    if (cut >= 0) s.substring(0, cut) else s
  }

  test("dup_span_stats reads the corpus text exactly once — one tokenize pass, " +
      "grouped gram doc-count joined back by equi-join, no gram-keyed window") {
    val df = graft.queries.TextQueries.queries("dup_span_stats")(spark, TestSession.Sf0001)
    df.collect()
    val plan = finalPlanOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"no non-equi join shapes:\n$plan")
    val textScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("text"))
    assert(textScans == 1, s"expected exactly one text-reading scan, got $textScans:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"both gram-join sides must replay the one (doc,gram) exchange:\n$plan")
    // VERDICT r7 #3: a count-over(partition by gram) window sorts every
    // hot boilerplate gram's rows in one task and can't be skew-split;
    // the dup marking must be the grouped count + join instead
    val windows = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"dup marking must not be a gram-keyed window:\n$plan")
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.exists(_.condition.exists(_.references.exists(_.name == "gram"))),
      "expected the per-gram doc-count to join back on gram")
  }

  test("span_dedup_excise: no gram-keyed window (grouped doc-count + equi-join, " +
      "the dup_span_stats de-skew rule) and no non-equi join shapes") {
    val df = graft.queries.TextQueries.queries("span_dedup_excise")(
      spark, TestSession.Sf0001)
    df.collect()
    val plan = finalPlanOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"no non-equi join shapes:\n$plan")
    val windows = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"dup marking and rebuild must be grouped aggs, never windows:\n$plan")
    // coverage must reach the token stream as an equi anti-join on
    // (doc_id, pos) — the surviving-token filter never re-tokenizes
    assert(plan.contains("LeftAnti"), s"expected the covered-position anti-join:\n$plan")
  }

  test("dsir_topk reads the corpus text exactly once — the feature models and " +
      "totals all re-aggregate the shared (doc,lang,bucket) exchange") {
    val df = graft.queries.RetrievalQueries.queries("dsir_topk")(spark, TestSession.Sf0001)
    df.collect()
    val plan = finalPlanOf(df)
    val textScans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("text"))
    assert(textScans == 1,
      s"expected exactly one text-reading scan (VERDICT r7 #2), got $textScans:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"expected the (doc,lang,bucket) exchange to be reused by the model frames:\n$plan")
  }

  test("lm_quality_buckets: LM model joins stay broadcast and every window is " +
      "partitioned (no all-to-one exchange)") {
    val plan = planOf(
      graft.queries.TextQueries.queries("lm_quality_buckets")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"model lookups must be broadcast hash joins:\n$plan")
    // the lag window keys on doc_id, the ntile window on lang — an
    // unpartitioned window would plan Exchange SinglePartition
    assert(!plan.contains("SinglePartition"),
      s"unpartitioned window moves the corpus to one partition:\n$plan")
  }

  test("parquet scan prunes columns: 2-column projection reads 2 columns") {
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "lang")
    val plan = planOf(docs)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"expected pruned ReadSchema in:\n$plan")
  }

  test("HNSW shard-partitioned graph read is partition-pruned by shard filter") {
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val dir = java.nio.file.Files.createTempDirectory("hnsw_prune").toString
    graft.io.IndexIO.saveHnsw(spark,
      dir, graft.index.HnswIndex.build(corpus, 4, Metric.L2), Metric.L2)
    val filtered = spark.read.parquet(s"$dir/graph")
      .where(org.apache.spark.sql.functions.col("shard").isin(1, 2))
    val plan = planOf(filtered)
    // the scan must carry a shard partition filter (directory-level prune,
    // not a post-scan row filter)
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"expected shard partition filters in:\n$plan")
    assert(!plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").trim.isEmpty,
      s"PartitionFilters list is empty in:\n$plan")
  }

  test("IndexBuilder (search.go:220-319): default type is hnsw; each kind searches") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val q1 = queries.limit(2)
    // default build lands on the hnsw kind and self-matches at rank 1
    val s = graft.query.IndexBuilder().withIndexOption("shards", 2).build(corpus)
    val r1 = s.withK(1).search(q1)
    assert(r1.where(org.apache.spark.sql.functions
      .col("query_id") =!= org.apache.spark.sql.functions.col("neighbor_id")).count() == 0)
    // every named kind builds and returns k results per query
    Seq("flat", "ivf", "pq", "ivfpq", "lsh").foreach { t =>
      val st = graft.query.IndexBuilder().withIndexType(t)
        .withIndexOption("nlist", 8).withIndexOption("M", 8).withIndexOption("nbits", 4)
        .build(corpus)
      assert(st.withK(3).search(q1).count() > 0, s"no results for $t")
    }
    intercept[IllegalArgumentException] {
      graft.query.IndexBuilder().withIndexType("nope").build(corpus)
    }
  }

  test("range join is a binned equi-join — no nested-loop in the plan") {
    val e = graft.core.Tables.events(spark, TestSession.Sf0001)
      .select(org.apache.spark.sql.functions.col("user_id").as("key"),
        org.apache.spark.sql.functions.col("event_id").as("id"),
        org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts").cast("timestamp_ltz")).as("us"))
    val plan = planOf(graft.operators.RangeJoin.pairs(e, e, 3600L * 1000000L))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"expected an equi join in:\n$plan")
  }

  test("native distance expressions appear in the plan (not interpreted HOFs)") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val plan = planOf(FlatIndex.distanceJoin(corpus, queries, Metric.L2))
    assert(plan.contains("graft_l2sq"), s"expected graft_l2sq in:\n$plan")
  }

  test("minhash band self-join shuffles narrow rows — token arrays join back after distinct") {
    val df = SparkEntry.queries("near_dup_minhash")(spark, TestSession.Sf0001)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val bandJoins = joins.filter(_.condition.exists(_.references.exists(_.name == "band")))
    assert(bandJoins.nonEmpty, "expected the band-key candidate self-join")
    bandJoins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name)
      assert(!carried.exists(_.startsWith("ts")),
        s"band join must not carry token arrays, got: ${carried.mkString(", ")}")
    }
  }

  test("near_dup_embedding self-join is bucket-gated — no unbounded cross join") {
    val df = SparkEntry.queries("near_dup_embedding")(spark, TestSession.Sf0001)
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"embedding near-dup must not cross-join the corpus with itself:\n$plan")
    // the candidate join must be an equi-join keyed on the LSH bucket
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.exists(_.condition.exists(_.references.exists(_.name == "bucket"))),
      "expected the sign-LSH bucket equi-join to gate the cosine verify")
  }

  test("float32 drift vs the reference stays within accumulated epsilon (doc'd divergence)") {
    // The reference computes distances in float32 (internal/math/distance.go);
    // this engine is float64 end-to-end (SURVEY §7.3). The divergence bound a
    // gofaiss user inherits on import: relative error ~ dim * 2^-24.
    val (corpus, _) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val vecs = corpus.limit(50).collect().map(_.getSeq[Double](1).toArray)
    val eps = vecs(0).length * math.pow(2, -24) * 4 // accumulation headroom
    for (a <- vecs.take(10); b <- vecs.take(10)) {
      val d64 = Metric.L2.rankKeyScalar(a, b)
      val d32 = {
        var acc = 0.0f; var i = 0
        while (i < a.length) { val t = a(i).toFloat - b(i).toFloat; acc += t * t; i += 1 }
        acc.toDouble
      }
      if (d64 > 0) assert(math.abs(d64 - d32) / d64 < eps,
        s"float32 drift ${math.abs(d64 - d32) / d64} exceeds $eps")
    }
  }

  test("sample_stratified rank-limit becomes WindowGroupLimit (partial top-n before the shuffle)") {
    val plan = planOf(
      graft.queries.TextQueries.queries("sample_stratified")(spark, TestSession.Sf0001))
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rn<=20 filter to push a WindowGroupLimit below the lang shuffle:\n$plan")
  }

  test("tfidf_top3: partial tf agg, rank-limit WindowGroupLimit, no cartesian join") {
    val df = graft.queries.TextQueries.queries("tfidf_top3")(spark, TestSession.Sf0001)
    val plan = planOf(df)
    assert(plan.contains("WindowGroupLimit"),
      s"expected the rnk<=3 filter to push a WindowGroupLimit below the doc shuffle:\n$plan")
    assert(plan.contains("HashAggregate"),
      s"expected hash aggregation for tf/df counts:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"tf⋈df must stay an equi-join:\n$plan")
  }

  test("knn_hard_negatives: broadcast predicated join (label test never becomes " +
      "a shuffle or nested loop); knn_class_topk rank-limit plans WindowGroupLimit") {
    val hn = planOf(graft.queries.VectorQueries.queries("knn_hard_negatives")(
      spark, TestSession.Sf0001))
    assert(hn.contains("BroadcastNestedLoopJoin") || hn.contains("BroadcastHashJoin"),
      s"query batch must broadcast:\n$hn")
    assert(!hn.contains("SortMergeJoin") && !hn.contains("CartesianProduct"),
      s"corpus must not shuffle for the predicated join:\n$hn")
    val ct = planOf(graft.queries.VectorQueries.queries("knn_class_topk")(
      spark, TestSession.Sf0001))
    assert(ct.contains("WindowGroupLimit"),
      s"per-(query,label) rank filter must prune partially before the shuffle:\n$ct")
  }

  test("knn_flat_filtered pushes the label predicate into the parquet scan") {
    val plan = planOf(
      graft.queries.VectorQueries.queries("knn_flat_filtered")(spark, TestSession.Sf0001))
    assert(plan.contains("LessThanOrEqual(label,4)") || plan.contains("label <= 4"),
      s"expected the label filter in PushedFilters / scan predicates:\n$plan")
  }

  test("line_dedup: salted two-stage line count (no unsalted hot-key agg), drop is an " +
      "anti equi-join") {
    val plan = planOf(
      graft.queries.DedupQueries.queries("line_dedup")(spark, TestSession.Sf0001))
    // stage-1 grouping keys must include the salt next to the line
    assert(plan.contains("salt"),
      s"expected the line-count aggregation keyed on (line, salt):\n$plan")
    assert(plan.contains("LeftAnti"),
      s"expected the over-threshold line drop as a left-anti join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"line drop must stay an equi-join:\n$plan")
  }

  test("knn_sparse_dot: posting-list equi-join with broadcast query postings, " +
      "per-query top-k is a WindowGroupLimit partial rank, no cartesian") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("knn_sparse_dot")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"query postings must broadcast into the posting-list join:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"per-query rank<=k must push a WindowGroupLimit:\n$plan")
    // the 1-row corpus-stats scalar rides a broadcast nested-loop cross
    // join by design (the bm25 discipline); a CartesianProduct — a
    // non-broadcast product over real rows — must never appear
    assert(!plan.contains("CartesianProduct"),
      s"sparse dot must stay an equi-join over terms:\n$plan")
  }

  test("cascade_rerank: dense stage touches lexical candidates only — candidates " +
      "and queries broadcast into the embeddings scan, no cartesian") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("cascade_rerank")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate ids must broadcast into the embeddings scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the dense stage must never cross-join the corpus:\n$plan")
  }

  test("maxsim_rerank: token interaction touches lexical candidates only — " +
      "candidate pairs broadcast into the token joins, no cartesian") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("maxsim_rerank")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"the candidate frame must broadcast into the token-pair joins:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the interaction stage must never cross-join token streams:\n$plan")
  }

  test("maxsim_first_stage: the corpus token table never cross-joins the " +
      "query batch — queries reach docs only through the centroid posting " +
      "equi-join; the only nested-loop builds broadcast the C-row centroid frame") {
    import org.apache.spark.sql.functions.col
    import graft.index.PlaidIndex
    val d = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val model = PlaidIndex.train(d, 24, 2)
    val q = d.where(col("doc_id") < 8)
      .select(col("doc_id").as("query_id"), col("text"))
    val plan = planOf(
      PlaidIndex.candidates(PlaidIndex.build(d, model), q, model, 20))
    assert(!plan.contains("CartesianProduct"),
      s"no unbroadcast cross-join anywhere in the first stage:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"posting/candidate joins must be broadcast equi-joins:\n$plan")
    // the centroid-expansion cross-joins (vocab × cents in the
    // assignment, qtokens × cents in the routing table — the latter
    // consumed twice: probe selection and interaction scoring) are the
    // ONLY nested-loop joins, and every one builds the model-sized
    // centroid frame. One more would mean queries×corpus leaked out of
    // the posting-list path.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 4, s"expected only centroid expansions, got $bnlj:\n$plan")
    // the full row never cross-joins anything unbroadcast either
    val full = planOf(
      graft.queries.RetrievalQueries.queries("maxsim_first_stage")(spark, TestSession.Sf0001))
    assert(!full.contains("CartesianProduct"), s"exact stage cross-join:\n$full")
  }

  test("bm25_phrase: both clauses stay equi-joins — phrase table and stats " +
      "broadcast, no cartesian anywhere") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("bm25_phrase")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase/df/len frames must broadcast into the scans:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no corpus cross-join in either clause:\n$plan")
  }

  test("phrase_search: positional joins are hash equi-joins with the phrase " +
      "table broadcast — no cartesian, no sort-merge of posting streams") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("phrase_search")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"the phrase table must broadcast into the posting scan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"positional matching must stay equi-joins:\n$plan")
  }

  test("knn_doc_pooled: pooling is a per-row projection (no shuffle before " +
      "the kNN window) and the query batch broadcasts") {
    val df = graft.queries.RetrievalQueries.queries("knn_doc_pooled")(
      spark, TestSession.Sf0001)
    df.collect()
    val plan = finalPlanOf(df)
    assert(!plan.contains("CartesianProduct"),
      s"pooled kNN must use the broadcast batch scan:\n$plan")
    // exactly one aggregation-free corpus path into the distance
    // projection: pooling must not introduce a groupBy over tokens
    assert(!plan.linesIterator.exists(l =>
        l.contains("HashAggregate") && l.contains("tok")),
      s"pooling must be the per-row fold, not an explode+groupBy:\n$plan")
  }

  test("knn_truncated_rerank: full-dim pass touches candidates only (broadcast " +
      "candidate lookups, no corpus-x-corpus product)") {
    val plan = planOf(
      graft.queries.IndexQueries.queries("knn_truncated_rerank")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"rerank candidates must broadcast into the corpus scan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"the exact pass must never cross-join the corpus:\n$plan")
  }

  test("mixture_sample: corpus joins the per-source plan by broadcast — the big side " +
      "is never sort-merge-joined or shuffled for the accept test") {
    val plan = planOf(graft.queries.TextQueries.queries("mixture_sample")(
      spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast plan join in:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"mixture sample must not shuffle-join the corpus:\n$plan")
  }

  test("mixture_temperature: the corpus aggregates once during construction; the " +
      "returned plan is a driver literal (no second corpus subtree)") {
    val df = graft.queries.TextQueries.queries("mixture_temperature")(
      spark, TestSession.Sf0001)
    val plan = finalPlanOf(df)
    assert(!plan.contains("Scan parquet"),
      s"normalizers must not re-aggregate the corpus (dsir multi-scan trap):\n$plan")
    assert(plan.contains("LocalTableScan"), s"expected a literal plan frame:\n$plan")
  }

  test("quality_quantile_filter: CDF windows run over the aggregated histogram " +
      "only (never corpus rows), and the corpus joins the CDF by broadcast") {
    val df = graft.queries.TextQueries.queries("quality_quantile_filter")(
      spark, TestSession.Sf0001)
    df.collect()
    val plan = finalPlanOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"the CDF must broadcast to the corpus side:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"unpartitioned window moves data to one partition:\n$plan")
    // the window's subtree must contain the histogram aggregate before it
    // reaches a scan — a window fed raw corpus rows would sort a whole
    // source in one task (the AQE wrapper hides WindowExec from collect,
    // so walk the printed final plan: Window … HashAggregate … Scan)
    val lines = plan.linesIterator.toVector
    val wi = lines.indexWhere(_.contains("Window"))
    assert(wi >= 0, s"expected a CDF window in the plan:\n$plan")
    val si = lines.indexWhere(_.contains("Scan parquet"), wi)
    assert(si > wi, s"expected a scan below the window:\n$plan")
    assert(lines.slice(wi, si).exists(_.contains("HashAggregate")),
      s"window over un-aggregated corpus rows:\n$plan")
  }

  test("pii_scrub stays a pure per-row projection (no shuffle, no join)") {
    val plan = planOf(
      graft.queries.TextQueries.queries("pii_scrub")(spark, TestSession.Sf0001))
    assert(!plan.contains("Exchange"),
      s"pii_scrub must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"pii_scrub must not join:\n$plan")
  }

  test("unigram_logprob scores as a pure projection once the vocab model is built") {
    val df = graft.queries.TextQueries.queries("unigram_logprob")(spark, TestSession.Sf0001)
    val plan = planOf(df)
    // the count map ships as a literal — scoring itself never joins or shuffles
    assert(!plan.contains("Join"), s"scoring must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"scoring must not shuffle:\n$plan")
  }

  test("pack_sequences: prefix sum runs over the narrow counts relation; token explode " +
      "joins back by equi-join only") {
    val plan = planOf(
      graft.queries.TextQueries.queries("pack_sequences")(spark, TestSession.Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"offset join must stay an equi-join:\n$plan")
    assert(plan.contains("Window"), s"expected the prefix-sum window:\n$plan")
  }

  test("curation_pipeline: every window is partitioned (no all-to-one-partition " +
      "exchange in the plan)") {
    val plan = planOf(
      graft.queries.TextQueries.queries("curation_pipeline")(spark, TestSession.Sf0001))
    // all three windows key on lang or text_md5 — an unpartitioned window
    // would plan an Exchange SinglePartition and serialize the corpus
    assert(!plan.contains("SinglePartition"),
      s"unpartitioned window moves the corpus to one partition:\n$plan")
  }

  test("bm25_topk joins through broadcasts; top-N is TakeOrdered, not a global sort") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("bm25_topk")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected the df/stats frames to broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must not cross-join the corpus:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrdered top-N before the rank window:\n$plan")
  }

  test("bm25_batch: query-table form keeps the broadcast plan — no corpus " +
      "cross-join, per-query rank pushes a WindowGroupLimit") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("bm25_batch")(spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected the term/df/stats frames to broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"batched bm25 must not cross-join the corpus:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"expected the per-query rank<=N to push a WindowGroupLimit:\n$plan")
  }

  test("semdedup pair compare is gated by a cluster_id equi-join (never all-pairs)") {
    val plan = planOf(
      graft.queries.DedupQueries.queries("semdedup_prune")(spark, TestSession.Sf0001))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"within-cluster pairs must come from an equi-join:\n$plan")
  }

  test("hybrid_rrf fuses two already-ranked lists — no corpus-x-corpus nested loop " +
      "beyond the broadcast query batch") {
    val plan = planOf(
      graft.queries.RetrievalQueries.queries("hybrid_rrf")(spark, TestSession.Sf0001))
    assert(!plan.contains("CartesianProduct"),
      s"fusion must not cartesian-join:\n$plan")
  }

  test("training_shard_plan: prefix-sum windows are hash-range partitioned — " +
      "no all-to-one-partition exchange (the pack_sequences anti-pattern fixed)") {
    val plan = planOf(
      graft.queries.TextQueries.queries("training_shard_plan")(spark, TestSession.Sf0001))
    assert(!plan.contains("SinglePartition"),
      s"corpus-wide cumsum must not serialize to one partition:\n$plan")
    assert(plan.contains("Window"), s"expected the range-local prefix-sum window:\n$plan")
  }

  test("mmr_diversify: one broadcast candidate join, no corpus-x-corpus product, " +
      "pool ranking is a partial WindowGroupLimit") {
    val plan = planOf(graft.queries.RetrievalQueries.queries("mmr_diversify")(
      spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"query batch must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian product:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-N pool cut should be a partial group limit:\n$plan")
  }

  test("knn_bq: codes scan joins the broadcast encoded queries — never a sort-merge " +
      "join, and the Hamming fold stays in the projection") {
    val plan = planOf(graft.queries.IndexQueries.queries("knn_bq")(
      spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"encoded query batch must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"codes table must not shuffle:\n$plan")
  }

  test("opq encode/search plans: the rotation is a projection — no extra shuffle vs " +
      "plain PQ, and the rerank stage stays broadcast-only") {
    val (corpus, queries) = VectorQueries.vecTables(spark, TestSession.Sf0001)
    val model = graft.index.OpqIndex.train(corpus, 8, nbits = 4, Metric.L2)
    val encPlan = planOf(graft.index.OpqIndex.encode(corpus, model))
    assert(!encPlan.contains("Exchange"),
      s"rotation+encode must be a pure projection:\n$encPlan")
    val rr = graft.index.Refine.rerank(
      graft.index.OpqIndex.knn(graft.index.OpqIndex.encode(corpus, model),
        model, queries, 30),
      corpus, queries, 10, Metric.L2)
    val rrPlan = planOf(rr)
    assert(!rrPlan.contains("SortMergeJoin"),
      s"refine joins must broadcast, not shuffle the corpus:\n$rrPlan")
  }

  test("pmi_topk: pair generation is pure expression (no positional self-join), " +
      "model joins broadcast, and the top-k is TakeOrdered (no global sort)") {
    val plan = planOf(graft.queries.TextQueries.queries("pmi_topk")(
      spark, TestSession.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"unigram/total lookups must join by broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"pair counts must never shuffle-join:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"ranked head must be TakeOrdered, not a global sort:\n$plan")
  }
}
