package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Content-defined chunking: tiling invariants, the expected-length
  * statistic, and the property the operator exists for — boundaries are
  * content-local, so an edit reshapes only the chunks it touches while
  * every later chunk fingerprint survives (fixed-grid chunking loses
  * all of them).
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSession.spark

  private def chunksOf(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    val df = texts.toDF("doc_id", "text")
      .select(col("doc_id").as("media_id"), col("text"),
        Multimodal.charCodes(col("text")).as("codes"))
      .select(col("media_id"), col("text"),
        Multimodal.cdcBoundsFromCodes(col("codes")).as("bounds"))
    df.select(col("media_id"), col("bounds")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toVector).toMap
  }

  test("media_cdc_chunks tiles each payload exactly: offsets are dense, " +
    "lengths sum to the payload, fingerprints match the substring hash") {
    val rows = graft.queries.MultimodalQueries.queries("media_cdc_chunks")(
      spark, TestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val Mod = 1000000007L
    def fp(s: String): Long = s.foldLeft(0L)((a, c) => (a * 31L + c.toInt) % Mod)
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.toSeq, s"doc $id: dense chunk_idx")
      var off = 0L
      sorted.foreach { case (_, _, o, l, f) =>
        assert(o == off, s"doc $id: chunk at $o expected offset $off")
        assert(l > 0)
        assert(f == fp(docs(id).substring(o.toInt, (o + l).toInt)),
          s"doc $id: fingerprint at $o")
        off = o + l
      }
      assert(off == docs(id).length, s"doc $id: chunks must cover the payload")
    }
    // expected-length statistic: mean chunk length tracks the divisor
    val mean = rows.map(_._4).sum.toDouble / rows.length
    assert(mean > Multimodal.CdcDivisor * 0.5 && mean < Multimodal.CdcDivisor * 2.0,
      s"mean chunk length $mean should be in the divisor's regime")
  }

  test("content-defined property: an insertion reshapes only local chunks — " +
    "boundaries past the edit realign exactly (a fixed grid loses them all)") {
    val base = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .where(col("n_chars") > 200).select("text").head().getString(0)
    val edited = "inserted preamble " + base
    val shift = "inserted preamble ".length
    val m = chunksOf(Seq(1L -> base, 2L -> edited))
    val (b1, b2) = (m(1L), m(2L))
    // every base boundary at position >= window realigns in the edited
    // payload at (pos + shift): the rolling hash sees the same trailing
    // window, so the cut decision is identical
    val w = Multimodal.CdcWindow
    val expect = b1.filter(p => p >= w && p < b1.last).map(_ + shift).toSet
    val got = b2.toSet
    val missing = expect -- got
    assert(missing.isEmpty,
      s"boundaries must be content-local; lost after shift: $missing")
    // and the realigned boundaries dominate: only the first chunk(s)
    // near the edit may differ
    val interior = b2.filter(p => p > shift + w && p < b2.last)
    assert(interior.forall(p => b1.contains(p - shift)),
      "no spurious interior boundaries appear past the edit window")
  }
}
