package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.index.SparseIndex

/** The persisted impact index: build invariants (impact prune, positive
  * weights), search ≡ a literal driver-side sparse dot, persistence
  * round-trip identity, and the term-predicate pushdown the saved layout
  * exists for.
  */
class SparseIndexSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private val K = 10
  private val NQueries = 5

  private def docs =
    graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))

  test("build: impact prune holds (no surviving term exceeds MaxDfFrac of " +
      "the corpus) and every posting weight is positive") {
    val (postings, model) = SparseIndex.build(docs)
    val dfs = postings.groupBy("term").agg(countDistinct("doc_id").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(dfs.nonEmpty)
    dfs.foreach { case (t, d) =>
      assert(d <= model.nDocs * SparseIndex.MaxDfFrac,
        s"term '$t' df=$d survived past MaxDfFrac of n=${model.nDocs}")
    }
    assert(postings.where(col("w") <= 0.0).isEmpty,
      "ln((n+1)/(df+1)) idf with df<=0.9n keeps every weight positive")
  }

  test("search matches a literal driver-side sparse dot product exactly " +
      "(same term-ordered fold)") {
    val (postings, _) = SparseIndex.build(docs)
    val rows = postings.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byDoc = rows.groupBy(_._2).map { case (d, rs) =>
      d -> rs.map(r => r._1 -> r._3).toMap
    }
    val got = SparseIndex.search(
        postings, SparseIndex.asQueries(postings, col("doc_id") < NQueries), K)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3), r.getInt(4)))
    assert(got.nonEmpty)
    (0L until NQueries).foreach { q =>
      val qw = byDoc(q)
      val scores = byDoc.toSeq.flatMap { case (d, dw) =>
        val shared = qw.keySet.intersect(dw.keySet).toSeq.sorted
        if (shared.isEmpty) None
        else Some((d, shared.foldLeft(0.0)((a, t) => a + dw(t) * qw(t)), shared.size))
      }
      val expect = scores.sortBy { case (d, sc, _) => (-sc, d) }.take(K)
      val mine = got.filter(_._1 == q).sortBy(_._5)
      assert(mine.map(_._2).sameElements(expect.map(_._1)),
        s"query $q neighbor ids diverge from the literal dot product")
      mine.zip(expect).foreach { case ((_, _, s, n, _), (_, es, en)) =>
        assert(s == es, s"query $q: fold $s != literal $es")
        assert(n == en)
      }
    }
  }

  test("save -> load round trip: served search is row-identical to the " +
      "in-memory search") {
    val (postings, model) = SparseIndex.build(docs)
    val mem = SparseIndex.search(
        postings, SparseIndex.asQueries(postings, col("doc_id") < NQueries), K)
      .collect().map(_.toSeq).sortBy(_.toString)
    val path = java.nio.file.Files.createTempDirectory("graft_sparse_spec").toString
    graft.io.IndexIO.saveSparse(spark, path, postings, model)
    val (loaded, lmodel) = graft.io.IndexIO.loadSparse(spark, path)
    assert(lmodel == model)
    val served = SparseIndex.search(
        loaded, SparseIndex.asQueries(loaded, col("doc_id") < NQueries), K)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(served.sameElements(mem),
      "persistence must not change weights, fold order, or ranking")
  }

  test("BM25 impact index: served batch search is row-identical to the " +
      "bm25_batch driver row (doc-side contributions precompute exactly)") {
    val a = graft.queries.RetrievalQueries.queries("bm25_impact_served")(
      spark, TestSession.Sf0001).collect().map(_.toSeq).sortBy(_.toString)
    val b = graft.queries.RetrievalQueries.queries("bm25_batch")(
      spark, TestSession.Sf0001).collect().map(_.toSeq).sortBy(_.toString)
    assert(a.nonEmpty && a.sameElements(b),
      "precomputed impact weights must reproduce bm25_batch bit-for-bit")
  }

  test("BM25 streaming append under the frozen term model: save initial + " +
      "appendBatchToBm25(rest) is row-identical to encoding everything " +
      "under that model, and the served search covers the appended docs") {
    import org.apache.spark.sql.functions._
    val d = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    val cut = 250L
    val initial = d.where(col("doc_id") < cut)
    val later = d.where(col("doc_id") >= cut)
    // model frozen at initial-corpus build time (add-after-train)
    val (dfq, model) = SparseIndex.buildBm25Model(initial)
    val path = java.nio.file.Files.createTempDirectory("graft_bm25_app").toString
    graft.io.IndexIO.saveBm25(spark, path,
      SparseIndex.encodeBm25(initial, dfq, model), dfq, model)
    graft.streaming.EventPipeline.appendBatchToBm25(dfq, model, path)(later, 0L)
    val (loaded, ldfq, lmodel) = graft.io.IndexIO.loadBm25(spark, path)
    assert(lmodel == model && ldfq.count() == dfq.count())
    val expect = SparseIndex.encodeBm25(d, dfq, model)
      .collect().map(_.toSeq).sortBy(_.toString)
    val got = loaded.collect().map(_.toSeq).sortBy(_.toString)
    assert(got.length == expect.length && got.sameElements(expect),
      "append under the frozen model must equal encoding old ∪ new at once")
    // unseen-at-train terms (df = 0) got the maximal idf, not a crash/null
    val newTerms = SparseIndex.encodeBm25(later, dfq, model)
      .join(dfq, Seq("term"), "left_anti")
    assert(newTerms.where(col("w").isNull || col("w") <= 0).count() == 0)
    // served search finds appended docs
    import spark.implicits._
    val probe = later.select(col("doc_id"), explode(
      graft.functions.TextFunctions.toks(col("text"))).as("term"))
      .where(col("doc_id") === cut).limit(3)
      .select(lit(0L).as("query_id"), col("term"), lit(1.0).as("wq"))
    val hits = SparseIndex.search(loaded, probe, 10)
    assert(hits.where(col("doc_id") >= cut).count() > 0,
      "appended docs must be searchable through the persisted index")
  }

  test("saved postings push a term predicate into the parquet scan — the " +
      "pruning the range-partitioned, term-sorted layout exists for") {
    val (postings, model) = SparseIndex.build(docs)
    val path = java.nio.file.Files.createTempDirectory("graft_sparse_push").toString
    graft.io.IndexIO.saveSparse(spark, path, postings, model)
    val (loaded, _) = graft.io.IndexIO.loadSparse(spark, path)
    val plan = loaded.where(col("term") === "data")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(term,data)"),
      s"term predicate must reach the parquet scan:\n$plan")
  }
}
