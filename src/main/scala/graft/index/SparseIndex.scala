package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.toks

/** Persisted learned-sparse / impact index — the SPLADE-family serving
  * artifact living next to the dense kinds (beyond the reference, which
  * stops at dense vectors): each document is a sparse tf·idf vector over
  * its own vocabulary, stored as POSTING LISTS — one (term, doc_id, w)
  * row per nonzero weight — and searched by sparse dot product computed
  * as a posting-list equi-join.
  *
  * The weighting and fold order match the `knn_sparse_dot` driver row
  * exactly, so the served (save→load→search) path shares its DuckDB
  * oracle — the blocked-variant reuse discipline.
  *
  * 100 TB shape: build is two map-side-combined aggregations (per-doc
  * tf, per-term df) — the corpus never shuffles wider than its distinct
  * (doc, term) pairs, and ultra-common terms (df > [[MaxDfFrac]]·n,
  * carrying ~zero idf weight but the LONGEST posting lists) are
  * impact-pruned at build time, bounding every future query's worst
  * case. The saved postings are range-partitioned and sorted by term,
  * so a query's term predicate prunes parquet row groups via min/max
  * stats before any IO; a search then shuffles Σ posting-list length of
  * the query's terms — never the corpus.
  *
  * Not wired into [[graft.query.Searcher]]'s sealed dense-vector kinds
  * deliberately: a sparse query is a (query_id, term, weight) frame,
  * not a qvec column, so forcing it through the dense facade would
  * trade type safety for a fake uniformity.
  */
object SparseIndex {

  /** Impact-prune threshold: terms present in more than this fraction
    * of the corpus are dropped at build time (near-zero idf, maximal
    * posting-list length — all cost, no signal). */
  val MaxDfFrac = 0.9

  /** The only driver-side state an impact index needs: the corpus size
    * the idf weights were computed against. */
  final case class SparseModel(nDocs: Long)

  /** Build the impact index over (doc_id, text): whitespace tokens,
    * tf·idf weights with idf = ln((n+1)/(df+1)), impact-pruned.
    * Returns (postings (term, doc_id, w), model). */
  def build(docs: DataFrame): (DataFrame, SparseModel) = {
    val tk = docs.select(col("doc_id"), toks(col("text")).as("tk"))
    val nDocs = tk.count()
    val post = tk.select(col("doc_id"), explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val idf = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
      .where(col("df") <= lit(nDocs.toDouble) * MaxDfFrac)
      .select(col("term"),
        log((lit(nDocs.toDouble) + lit(1.0)) / (col("df") + lit(1.0))).as("idf"))
    val postings = post.join(idf, "term")
      .select(col("term"), col("doc_id"), (col("tf") * col("idf")).as("w"))
    (postings, SparseModel(nDocs))
  }

  /** Build a BM25 IMPACT index: every BM25 term contribution is
    * doc-side-only (idf(df) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))), so
    * precomputing it as the posting weight turns query-time scoring into
    * a pure term-membership join — [[search]] with unit query weights
    * returns exact BM25 scores. This is the impact-ordered-index shape
    * production lexical serving uses: all per-doc arithmetic paid once
    * at build, queries touch posting lists only. No impact prune here —
    * the Lucene-form idf (log(x+1)) keeps every weight positive and
    * BM25's tf saturation already bounds hot-term contributions.
    * Contribution expressions mirror the `bm25_batch` driver row
    * term-for-term, so served scores are bit-identical to it. */
  def buildBm25(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75): (DataFrame, SparseModel) = {
    val (dfq, model) = buildBm25Model(docs, k1, b)
    (encodeBm25(docs, dfq, model), SparseModel(model.nDocs))
  }

  /** The frozen BM25 term model: corpus stats plus the per-term df table
    * — everything [[encodeBm25]] needs to weight a NEW batch of docs
    * without rescanning the corpus (the sparse kind's add-after-train
    * artifact, like SQ8's min/max or IVF's centroids). */
  final case class Bm25Model(nDocs: Long, avgdl: Double, k1: Double, b: Double)

  def buildBm25Model(docs: DataFrame, k1: Double = 1.2, b: Double = 0.75): (DataFrame, Bm25Model) = {
    val tk = docs.select(col("doc_id"), toks(col("text")).as("tk"))
    // one corpus pass for BOTH stats (was a count() pass then an agg
    // pass — each re-tokenized the corpus); nDocs and avgdl are the
    // same count and the same integer sum divided the same way
    val statsRow = tk.select(size(col("tk")).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).cast("double").as("tot")).first()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getDouble(1) / nDocs
    val dfq = tk.select(col("doc_id"), explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    (dfq, Bm25Model(nDocs, avgdl, k1, b))
  }

  /** Weight a doc batch's postings under a FROZEN [[Bm25Model]] — the
    * add-after-train rule: df/avgdl/n stay as trained until an explicit
    * rebuild, so append-then-search is bit-identical to having encoded
    * the batch at build time. Terms unseen at train time take df = 0
    * (maximal idf — the formula's natural out-of-vocabulary limit).
    * Per-doc length dl is batch-local (a doc property, not corpus
    * state). [[buildBm25]] routes through here, so the build and append
    * paths cannot drift. */
  def encodeBm25(docs: DataFrame, dfq: DataFrame, model: Bm25Model): DataFrame = {
    val tk = docs.select(col("doc_id"), toks(col("text")).as("tk"))
    val lens = tk.select(col("doc_id"), size(col("tk")).as("dl"))
    val tf = tk.select(col("doc_id"), explode(col("tk")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = lit(model.nDocs.toDouble)
    tf
      .join(broadcast(dfq), Seq("term"), "left")
      .join(lens, "doc_id")
      .select(col("term"), col("doc_id"),
        (log((n - coalesce(col("df"), lit(0.0)) + lit(0.5)) /
            (coalesce(col("df"), lit(0.0)) + lit(0.5)) + lit(1.0)) *
          (col("tf").cast("double") * lit(model.k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(model.k1) * (lit(1.0) - lit(model.b) +
              lit(model.b) * col("dl").cast("double") / lit(model.avgdl)))).as("w"))
  }

  /** A document batch's own sparse weights as a query table
    * (query_id, term, wq) — the query-by-example form every driver row
    * uses; a real search string would arrive pre-weighted in the same
    * shape. */
  def asQueries(postings: DataFrame, queryPred: org.apache.spark.sql.Column): DataFrame =
    postings.where(queryPred)
      .select(col("doc_id").as("query_id"), col("term"), col("w").as("wq"))

  /** Top-k sparse-dot search: posting-list equi-join against the
    * BROADCAST query weights, per-pair contributions folded in term
    * order (cross-engine sum identity), per-query rank-limit (the
    * WindowGroupLimit partial-rank shape). Output:
    * (query_id, doc_id, score, n_terms, rank). */
  def search(postings: DataFrame, queryWeights: DataFrame, k: Int): DataFrame = {
    val scored = postings.join(broadcast(queryWeights), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("term"),
            (col("w") * col("wq")).as("p")))),
          lit(0.0), (a, x) => a + x.getField("p")).as("score"),
        count(lit(1)).cast("int").as("n_terms"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .where(col("rank") <= k)
  }
}
