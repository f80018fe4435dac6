package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.queries.TextQueries

/** Semantic checks for the corpus-vocabulary queries: the bigram
  * window shape itself, plus cross-query count invariants on sf0.001
  * (the oracle hash-match at sf0.01 is the driver's gate; these pin
  * the windowing semantics locally).
  */
class TextQueriesSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  test("bigrams: adjacent pairs, 1-token doc yields empty array") {
    import spark.implicits._
    val got = Seq("a b c d", "solo", "x y")
      .toDF("text")
      .select(TextFunctions.bigrams(TextFunctions.toks(col("text"))).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b", "b c", "c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq("x y"))
  }

  test("vocab_topk ordering is (freq desc, token asc) and freqs sum to token occurrences") {
    val top = TextQueries.queries("vocab_topk")(spark, TestSession.Sf0001).collect()
    assert(top.nonEmpty && top.length <= 100)
    val pairs = top.map(r => (r.getLong(top.head.fieldIndex("freq")), r.getString(top.head.fieldIndex("token"))))
    pairs.sliding(2).foreach {
      case Array((f1, t1), (f2, t2)) =>
        assert(f1 > f2 || (f1 == f2 && t1 < t2), s"order violated at ($f1,$t1) vs ($f2,$t2)")
      case _ =>
    }
    // each reported freq equals a direct count of that token in the corpus
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    val all = docs
      .select(explode(TextFunctions.toks(lower(col("text")))).as("token"))
      .groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pairs.foreach { case (f, t) => assert(all(t) == f, s"token $t freq $f vs recount ${all(t)}") }
  }

  test("bigram_topk total mass bounded by sum(n_tokens - 1)") {
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    val maxGrams = docs
      .select((size(TextFunctions.toks(col("text"))) - 1).as("g"))
      .agg(sum(when(col("g") > 0, col("g")).otherwise(0))).first().getLong(0)
    val top = TextQueries.queries("bigram_topk")(spark, TestSession.Sf0001)
    val mass = top.agg(sum("freq")).first().getLong(0)
    assert(mass > 0 && mass <= maxGrams)
  }
}
