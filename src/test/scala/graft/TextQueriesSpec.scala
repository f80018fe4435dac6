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

  test("training_shard_plan: spans tile the token stream exactly in hash order, " +
      "and every shard holds at most one budget of starts") {
    val rows = graft.queries.TextQueries.queries("training_shard_plan")(
        spark, TestSession.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    // spans are contiguous and non-overlapping in hash order: sort by
    // start_token, each start equals the previous end
    val sorted = rows.sortBy(_._3)
    assert(sorted.head._3 == 0L)
    sorted.sliding(2).foreach {
      case Array((_, _, s0, n0), (_, _, s1, _)) => assert(s1 == s0 + n0)
      case _ =>
    }
    // shard assignment recomputes from the span start and the budget
    rows.foreach { case (_, shard, start, _) =>
      assert(shard == (start / 2000L).toInt)
    }
    // hash order is the plan's order: doc at smaller knuth-hash starts earlier
    def kh(id: Long) = (id * 2654435761L) % 4294967296L
    sorted.sliding(2).foreach {
      case Array((a, _, _, _), (b, _, _, _)) =>
        assert(kh(a) < kh(b) || (kh(a) == kh(b) && a < b))
      case _ =>
    }
  }

  test("mixture_temperature: both shares sum to 1, p_temp flattens toward uniform " +
      "(order-preserving), and boost is monotone-decreasing in source size") {
    val rows = TextQueries.queries("mixture_temperature")(spark, TestSession.Sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-2) // 4-dp rounding × |S|
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
    val bySize = rows.sortBy(_._2)
    // temperature preserves the size ordering but compresses it: shares
    // stay monotone, and the ratio p_temp/p_nat (boost) strictly falls
    // as sources get bigger — small sources are upsampled.
    bySize.sliding(2).foreach {
      case Array(a, b) if a._2 < b._2 =>
        assert(a._4 <= b._4 + 1e-9, s"p_temp not monotone: $a vs $b")
        assert(a._5 >= b._5 - 1e-9, s"boost not decreasing: $a vs $b")
      case _ =>
    }
    // flattening: the max/min p_temp ratio is strictly inside the natural ratio
    val natSpread = bySize.last._3 / bySize.head._3
    val tempSpread = bySize.last._4 / bySize.head._4
    assert(tempSpread < natSpread)
  }

  test("quality_quantile_filter: exact set equality with a driver-side recount " +
      "of the per-source histogram-CDF quartile rule") {
    val out = TextQueries.queries("quality_quantile_filter")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val docs = spark.read.parquet(TestSession.Sf0001 + "/documents.parquet")
      .select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val enWords = Set("the", "and", "is", "of", "to", "a")
    val scored = docs.map { case (id, src, text) =>
      val lower = text.toLowerCase
      val toks = lower.split(" ", -1)
      val en = toks.count(enWords)
      val punct = lower.count(".,!?;:".contains(_))
      val score = math.floor(en * 1000000.0 / toks.length).toLong -
        math.floor(punct * 1000000.0 / lower.length).toLong
      (id, src, score)
    }
    val expected = scored.groupBy(_._2).iterator.flatMap { case (src, ds) =>
      val n = ds.length.toLong
      ds.flatMap { case (id, _, sc) =>
        val below = ds.count(_._3 < sc).toLong
        if (below * 4 >= n * 3)
          Some((id, src, sc, java.math.BigDecimal.valueOf(below.toDouble / n)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue))
        else None
      }
    }.toSet
    assert(out.toSet == expected)
    assert(out.nonEmpty)
    // kept fraction per source is at most a quarter
    out.groupBy(_._2).foreach { case (src, kept) =>
      val n = scored.count(_._2 == src)
      assert(kept.length * 4 <= n, s"$src kept ${kept.length} of $n")
    }
  }

  test("line_dedup: rebuild preserves untouched docs exactly; dropped lines repeat " +
      "corpus-wide; kept text is the in-order concatenation of surviving lines") {
    val out = graft.queries.DedupQueries.queries("line_dedup")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getLong(3)))).toMap
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet)
    var touched = 0
    out.foreach { case (id, (dedup, nLines, nKept)) =>
      val toks = docs(id).split(" ", -1)
      assert(nLines == math.ceil(toks.length / 3.0).toInt, s"doc $id n_lines")
      if (nKept == nLines) assert(dedup == docs(id), s"doc $id untouched rebuild")
      else {
        touched += 1
        assert(nKept < nLines, s"doc $id kept count")
        // the surviving text must be exactly the in-order concatenation of
        // a sub-multiset of the original 3-token lines
        val origLines = toks.grouped(3).map(_.mkString(" ")).toVector
        val keptJoined = dedup
        val isSubseq = {
          // greedy: walk original lines, optionally consuming from dedup
          var rest = keptJoined
          origLines.foreach { ln =>
            if (rest == ln) rest = ""
            else if (rest.startsWith(ln + " ")) rest = rest.drop(ln.length + 1)
          }
          rest.isEmpty
        }
        assert(isSubseq, s"doc $id: '$keptJoined' not an in-order line subsequence")
      }
    }
    assert(touched > 0, "expected at least one doc with dropped boilerplate lines")
  }

  test("pii_scrub: every doc's injected PII is redacted, one match per category; " +
      "pattern edge cases behave identically to the documented semantics") {
    import spark.implicits._
    val out = graft.queries.TextQueries.queries("pii_scrub")(spark, TestSession.Sf0001)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(1).endsWith(" contact [EMAIL] or [IP] tel [PHONE]"),
        s"doc ${r.getLong(0)}: ${r.getString(1).takeRight(60)}")
      assert(r.getInt(2) == 1 && r.getInt(3) == 1 && r.getInt(4) == 1)
    }
    // edge cases on the raw patterns (naive-by-design: 999.999.999.999 is
    // still redacted; a TLD-less a@b is not an email; 4-3-4 digits is not
    // the phone shape)
    val got = Seq("ping 999.999.999.999 write a@b or c@d.io dial 5555-123-4567")
      .toDF("text")
      .select(
        regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), graft.queries.TextQueries.EmailRe, "[EMAIL]"),
            graft.queries.TextQueries.IpRe, "[IP]"),
          graft.queries.TextQueries.PhoneRe, "[PHONE]").as("t"))
      .as[String].first()
    assert(got == "ping [IP] write a@b or [EMAIL] dial 5555-123-4567", got)
  }

  test("unigram_logprob: nll equals a driver-side recount from the vocab counts") {
    val out = TextQueries.queries("unigram_logprob")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet)
    val allToks = docs.values.flatMap(_.toLowerCase.split(" ", -1)).toSeq
    val cnt = allToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allToks.size.toDouble
    docs.foreach { case (id, text) =>
      val tk = text.toLowerCase.split(" ", -1)
      var s = 0.0
      tk.foreach(t => s += math.log(cnt(t) / n)) // same left-to-right fold
      val want = BigDecimal(-s / tk.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(id)._1 == tk.length, s"doc $id n_tokens")
      assert(math.abs(out(id)._2 - want) < 2e-4, s"doc $id nll ${out(id)._2} vs $want")
      assert(out(id)._2 > 0.0)
    }
  }

  test("bigram_logprob: nll equals a driver-side recount under the capped " +
      "interpolated model") {
    val out = TextQueries.queries("bigram_logprob")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.keySet)
    val tokDocs = docs.view.mapValues(_.toLowerCase.split(" ", -1).toVector).toMap
    // both models rebuilt CAPPED with the query's own tie-break and OOV
    // floors, so the recount stays faithful even on a corpus where the
    // unigram cap goes live (it is inert at this sf; the bigram cap is not)
    val uniCap = tokDocs.values.flatten.toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (k, c) => (-c, k) }
      .take(graft.queries.TextQueries.UnigramVocabCap).toMap
    val n = uniCap.values.sum.toDouble
    def cu(t: String): Double = uniCap.getOrElse(t, 1L).toDouble
    val biCap = tokDocs.values
      .flatMap(tk => tk.sliding(2).filter(_.size == 2).map(p => p(0) + " " + p(1)))
      .toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (k, c) => (-c, k) }
      .take(graft.queries.TextQueries.BigramVocabCap).toMap
    tokDocs.foreach { case (id, tk) =>
      // same fold: first token under the unigram model, then interpolated
      // bigram terms left-to-right (unseen bigram → 0 → unigram backoff)
      var s = math.log(cu(tk.head) / n)
      tk.sliding(2).filter(_.size == 2).foreach { p =>
        val cb = biCap.getOrElse(p(0) + " " + p(1), 0L).toDouble
        s += math.log(0.5 * cb / cu(p(0)) + 0.5 * cu(p(1)) / n)
      }
      val want = BigDecimal(-s / tk.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(out(id)._1 == tk.length, s"doc $id n_tokens")
      assert(math.abs(out(id)._2 - want) < 2e-4, s"doc $id nll ${out(id)._2} vs $want")
      assert(out(id)._2 > 0.0)
    }
  }

  test("lm_quality_buckets: per-lang thirds differ by ≤1 doc and nll orders " +
      "head ≤ middle ≤ tail") {
    val rows = TextQueries.queries("lm_quality_buckets")(spark, TestSession.Sf0001).collect()
    val scored = TextQueries.queries("bigram_logprob")(spark, TestSession.Sf0001).count()
    assert(rows.length.toLong == scored, "one bucket row per scored doc")
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val sizes = Seq("head", "middle", "tail")
        .map(b => rs.count(_.getString(3) == b))
      assert(sizes.forall(_ > 0) && sizes.max - sizes.min <= 1,
        s"$lang bucket sizes $sizes not thirds")
      def nlls(b: String) = rs.filter(_.getString(3) == b).map(_.getDouble(2))
      Seq("head", "middle", "tail").sliding(2).foreach { case Seq(a, b) =>
        assert(nlls(a).max <= nlls(b).min,
          s"$lang: $a max ${nlls(a).max} > $b min ${nlls(b).min}")
      }
    }
  }

  test("contamination_doc_frac: fraction recomputes from counts; contaminated docs " +
      "from the boolean query show frac > 0") {
    val frac = TextQueries.queries("contamination_doc_frac")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    frac.foreach { case (id, (nGrams, nShared, f)) =>
      assert(nShared <= nGrams, s"doc $id shared > total")
      val want = if (nGrams > 0)
        BigDecimal(nShared.toDouble / nGrams)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(f == want, s"doc $id frac $f vs $want")
    }
    val contaminated = TextQueries.queries("contamination_8gram")(spark, TestSession.Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    contaminated.foreach { id =>
      assert(frac(id)._3 > 0.0, s"doc $id flagged by the boolean query but frac 0")
    }
  }

  test("dup_span_stats: counts recompute from a per-doc gram dump; " +
      "internal-only repeats don't count") {
    val out = TextQueries.queries("dup_span_stats")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // independent recount: dump each doc's positional gram list once, then
    // replay the duplicated-across-docs logic in plain Scala
    val gramRows = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select(col("doc_id"),
        TextFunctions.ngramHashes(TextFunctions.toks(col("text")), 8).as("gs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector)
    val dupGrams = gramRows
      .flatMap { case (id, gs) => gs.distinct.map(g => (g, id)) }
      .groupBy(_._1).collect { case (g, xs) if xs.map(_._2).distinct.size > 1 => g }
      .toSet
    assert(out.keySet == gramRows.map(_._1).toSet)
    gramRows.foreach { case (id, gs) =>
      val (nG, nD, f) = out(id)
      assert(nG == gs.length, s"doc $id n_grams")
      assert(nD == gs.count(dupGrams), s"doc $id n_dup")
      val want = if (gs.nonEmpty)
        BigDecimal(nD.toDouble / gs.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      else 0.0
      assert(f == want, s"doc $id frac $f vs $want")
    }
    // the corpus's planted near-dups guarantee cross-doc spans exist, and
    // most docs are original text with none
    assert(out.values.exists(_._2 > 0) && out.values.exists(_._2 == 0))
  }

  test("pack_sequences: (seq_id, pos) is dense and unique, and the packed stream " +
      "equals the doc_id-ordered token concatenation") {
    val rows = TextQueries.queries("pack_sequences")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    val stream = rows.sortBy(r => (r._1, r._2))
    // dense global positions 0..N-1 in (seq_id, pos) order
    stream.zipWithIndex.foreach { case ((seq, pos, _, _), i) =>
      assert(seq == i / 32 && pos == i % 32, s"hole at global position $i")
    }
    // provenance + content: the stream is exactly the docs concatenated in id order
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .sortBy(_.getLong(0))
      .flatMap(r => r.getString(1).toLowerCase.split(" ", -1).map(t => (r.getLong(0), t)))
    assert(stream.length == docs.length)
    stream.zip(docs).foreach { case ((_, _, gotDoc, gotTok), (wantDoc, wantTok)) =>
      assert(gotDoc == wantDoc && gotTok == wantTok)
    }
  }

  test("curation_pipeline: kept == AND of stage flags; pass_length keeps exactly the " +
      "top three quartiles per language") {
    val rows = TextQueries.queries("curation_pipeline")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    rows.foreach { case (id, rep, len, ded, kept) =>
      assert(kept == (rep && len && ded), s"doc $id kept flag")
    }
    val byLang = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2)
    val lenPass = rows.map(r => r._1 -> r._3).toMap
    byLang.foreach { case (lang, ds) =>
      val ordered = ds.sortBy(d => (d._3, d._1)).map(_._1)
      val n = ordered.length
      ordered.zipWithIndex.foreach { case (id, i) =>
        val want = i * 4 >= n - 1 // (rank-1)*4 >= n-1
        assert(lenPass(id) == want, s"$lang doc $id rank ${i + 1} of $n")
      }
    }
  }

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

  test("ngramHashes: len-n+1 grams, shorter-than-n doc yields empty (no descending sequence)") {
    import spark.implicits._
    val got = Seq("a b c d e", "a b", "one two three")
      .toDF("text")
      .select(TextFunctions.ngramHashes(TextFunctions.toks(col("text")), 3).as("g"))
      .as[Seq[Long]].collect()
    assert(got(0).length == 3) // 5 tokens, n=3
    assert(got(1).isEmpty)     // 2 tokens < n
    assert(got(2).length == 1)
    // position 1 gram equals the fingerprint of the first 3 tokens
    val fp = Seq("a b c").toDF("text")
      .select(TextFunctions.docFingerprint(col("text"))).first().getLong(0)
    assert(got(0).head == fp)
  }

  test("doc_split is a deterministic total partition with train/val/test buckets") {
    val split = graft.queries.TextQueries.queries("doc_split")(spark, TestSession.Sf0001)
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    assert(split.count() == docs.count())
    val bySplit = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L),
      s"expected the 90% bucket to dominate: $bySplit")
    // deterministic: second evaluation identical
    val again = graft.queries.TextQueries.queries("doc_split")(spark, TestSession.Sf0001)
    assert(split.exceptAll(again).isEmpty && again.exceptAll(split).isEmpty)
  }

  test("span_corruption_plan: one span per full block, in-bounds, non-overlapping, " +
      "and bit-stable against a driver-side fingerprint recount") {
    val out = TextQueries.queries("span_corruption_plan")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    val docs = spark.read.parquet(TestSession.Sf0001 + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val Mod = 1000000007L
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Mod)
    def fingerprint(text: String): Long =
      text.split(" ", -1).foldLeft(0L)((a, t) => (a * 31 + tokHash(t)) % Mod)
    out.groupBy(_._1).foreach { case (id, spans) =>
      val toks = docs(id).split(" ", -1)
      val fp = fingerprint(docs(id))
      val nb = toks.length / 20
      assert(spans.length == nb, s"doc $id: ${spans.length} spans for $nb blocks")
      spans.sortBy(_._2).zipWithIndex.foreach { case ((_, b, st, len), i) =>
        assert(b == i)
        val expLen = 1 + ((fp + b * 31) % 3)
        val expSt = b * 20 + ((fp + b * 7) % (20 - expLen))
        assert(len == expLen && st == expSt, s"doc $id block $b")
        // span stays inside its own block → non-overlap by construction
        assert(st >= b * 20 && st + len <= (b + 1) * 20)
        assert(st + len <= toks.length)
      }
    }
  }

  test("contamination_fuzzy: no false positives vs a driver-side exact-Jaccard " +
      "recount (banding may only UNDER-report), corpus ids only, stats consistent") {
    val out = graft.queries.DedupQueries.queries("contamination_fuzzy")(
        spark, TestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val docs = spark.read.parquet(TestSession.Sf0001 + "/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).distinct.toSet))
    val evalSets = docs.filter(_._1 < 20)
    def jac(a: Set[String], b: Set[String]): Double =
      if (a.isEmpty && b.isEmpty) 1.0 else a.intersect(b).size.toDouble / a.union(b).size
    val truth = docs.filter(_._1 >= 20).map { case (id, ts) =>
      val js = evalSets.map { case (_, te) => jac(ts, te) }.filter(_ >= 0.6)
      id -> ((js.length, if (js.isEmpty) 0.0 else js.max))
    }.toMap
    assert(out.nonEmpty)
    out.foreach { case (id, hits, mj) =>
      assert(id >= 20, s"eval doc $id leaked into the corpus side")
      val (trueHits, trueMax) = truth(id)
      assert(hits <= trueHits, s"doc $id reports $hits hits, only $trueHits exist")
      assert(mj >= 0.6 && mj <= trueMax + 5e-5, s"doc $id max_jaccard $mj vs true $trueMax")
    }
  }

  test("contamination_8gram finds the planted near-dup overlaps and nothing self-paired") {
    val c = graft.queries.TextQueries.queries("contamination_8gram")(spark, TestSession.Sf0001)
      .collect()
    assert(c.nonEmpty, "corpus should contain at least one contaminated pair")
    c.foreach { r =>
      assert(r.getLong(r.fieldIndex("doc_id")) >= 20 && r.getLong(r.fieldIndex("eval_id")) < 20)
      assert(r.getLong(r.fieldIndex("n_shared")) >= 1)
    }
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

  test("repetition_signals: sorted-run max equals an explicit per-doc token recount") {
    val sig = TextQueries.queries("repetition_signals")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("top_token_count"))).toMap
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    val recount = docs
      .select(col("doc_id"), explode(TextFunctions.toks(lower(col("text")))).as("token"))
      .groupBy("doc_id", "token").count()
      .groupBy("doc_id").agg(max("count").as("best"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig.keySet == recount.keySet)
    sig.foreach { case (id, best) =>
      assert(best.toLong == recount(id), s"doc $id: run-max $best vs recount ${recount(id)}")
    }
  }

  test("repetition_signals: fractions on literal docs match hand counts") {
    import spark.implicits._
    // "a a a b" → top token a×3/4; bigrams (a a, a a, a b) → 1 dup of 3
    val row = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val q = row.select(
      TextFunctions.bigrams(TextFunctions.toks(col("text"))).as("bg"))
    assert(q.as[Seq[String]].first() == Seq("a a", "a a", "a b"))
    // same projection the repetition_signals query computes (ADVICE r5:
    // the fractions this test names were previously unasserted here)
    val t = TextFunctions.toks(lower(col("text")))
    val best = TextFunctions.maxRun(t)
    val bg = TextFunctions.bigrams(t)
    val sig = row.select(
      size(t).as("n_tokens"),
      best.as("top_token_count"),
      round(best.cast("double") / size(t), 4).as("top_token_frac"),
      when(size(bg) > 0,
        round(lit(1.0) - size(array_distinct(bg)).cast("double") / size(bg), 4))
        .otherwise(lit(0.0)).as("dup_bigram_frac")).first()
    assert(sig.getInt(0) == 4)
    assert(sig.getInt(1) == 3)
    assert(sig.getDouble(2) == 0.75)
    assert(sig.getDouble(3) == BigDecimal(1.0 / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("tfidf_top3: ranks 1..3 per doc, tf matches recount, corpus-wide tokens get low scores") {
    val t = TextQueries.queries("tfidf_top3")(spark, TestSession.Sf0001)
    val rows = t.collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(_.getInt(rs.head.fieldIndex("rnk"))).sorted.sameElements(1 to rs.length))
      assert(rs.length <= 3, s"doc $id has ${rs.length} rows")
    }
    // tf column equals a direct recount for one sampled row
    val r0 = rows.head
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    val n = docs.where(col("doc_id") === r0.getLong(0))
      .select(explode(TextFunctions.toks(lower(col("text")))).as("token"))
      .where(col("token") === r0.getString(1)).count()
    assert(n == r0.getLong(r0.fieldIndex("tf")))
    // a token present in EVERY doc has idf 0 → can never outrank a selective one
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("tfidf")) >= 0.0)
    }
  }

  test("mixture_sample: accept set recomputes exactly from the plan thresholds; " +
      "plan weights follow the source-number formula and budget math") {
    val dir = TestSession.Sf0001
    val plan = TextQueries.queries("mixture_plan")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // weights follow 1 + (source number % 4); thresholds recompute from
    // the collected plan's own token masses (same double arithmetic)
    val totalToks = plan.values.map(_._2).sum
    val wsum = plan.values.map(_._1.toLong).sum
    plan.foreach { case (src, (w, toks, thresh)) =>
      assert(w == 1 + (src.drop(3).toInt % 4), s"$src weight")
      val rate = math.min(1.0, w * 0.4 * totalToks / (wsum * toks).toDouble)
      val expect = math.min(1000000L, BigDecimal(rate * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(thresh == expect, s"$src thresh")
    }
    // the sample is exactly the fingerprint-gated subset — RNG-free, so
    // a recomputation (fresh plan, fresh fingerprints) reproduces it
    val docs = graft.core.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextFunctions.docFingerprint(col("text")).as("fp")).collect()
    val expected = docs.filter { r =>
      r.getLong(2) % 1000000L < plan(r.getString(1))._3
    }.map(_.getLong(0)).toSet
    val sampled = TextQueries.queries("mixture_sample")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(sampled == expected)
    assert(sampled.nonEmpty && sampled.size < docs.length)
  }

  test("sample_stratified: ≤20 per lang, deterministic across evaluations") {
    val s1 = TextQueries.queries("sample_stratified")(spark, TestSession.Sf0001)
    val perLang = s1.groupBy("lang").count().collect()
    perLang.foreach(r => assert(r.getLong(1) <= 20, s"lang ${r.getString(0)}: ${r.getLong(1)}"))
    val s2 = TextQueries.queries("sample_stratified")(spark, TestSession.Sf0001)
    assert(s1.exceptAll(s2).isEmpty && s2.exceptAll(s1).isEmpty)
  }

  test("length_percentile: kept set is exactly the per-lang top quartile by (n_chars, doc_id)") {
    val kept = TextQueries.queries("length_percentile")(spark, TestSession.Sf0001).collect()
    assert(kept.nonEmpty)
    kept.foreach(r => assert(r.getDouble(r.fieldIndex("pct_rank")) >= 0.75))
    // no dropped doc may outrank a kept doc within its lang
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val keptIds = kept.map(_.getLong(0)).toSet
    docs.groupBy(_._2).foreach { case (lang, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._1))
      val keptIdx = sorted.zipWithIndex.filter { case (r, _) => keptIds.contains(r._1) }.map(_._2)
      if (keptIdx.nonEmpty)
        assert(keptIdx.min > sorted.length - keptIdx.length - 1 || keptIdx.length == sorted.length,
          s"lang $lang: kept set is not a suffix of the rank order")
    }
  }

  test("pmi_topk: pair counts recompute from a driver-side window sweep and the " +
      "pmi formula recomputes from the counts") {
    val out = TextQueries.queries("pmi_topk")(spark, TestSession.Sf0001).collect()
    assert(out.length == 50)
    // driver-side recount: unordered pairs within the next-2 window
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("text").collect().map(_.getString(0))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    var totalPairs = 0L
    val uniCounts = scala.collection.mutable.Map.empty[String, Long]
    var totalToks = 0L
    docs.foreach { text =>
      val ts = text.toLowerCase.split(" ", -1)
      totalToks += ts.length
      ts.foreach(t => uniCounts(t) = uniCounts.getOrElse(t, 0L) + 1)
      for (i <- ts.indices; j <- (i + 1) to math.min(i + 2, ts.length - 1)) {
        val key = if (ts(i) <= ts(j)) (ts(i), ts(j)) else (ts(j), ts(i))
        pairCounts(key) = pairCounts.getOrElse(key, 0L) + 1
        totalPairs += 1
      }
    }
    out.foreach { r =>
      val (a, b, cab, pmi) = (r.getString(r.fieldIndex("tok_a")),
        r.getString(r.fieldIndex("tok_b")), r.getLong(r.fieldIndex("c_ab")),
        r.getDouble(r.fieldIndex("pmi")))
      assert(a <= b, s"pair not normalized: ($a,$b)")
      assert(cab >= 5 && pairCounts((a, b)) == cab, s"count mismatch for ($a,$b)")
      val expect = math.log(cab.toDouble * totalToks * totalToks /
        (totalPairs.toDouble * uniCounts(a) * uniCounts(b)))
      assert(math.abs(pmi - expect) < 1e-3, s"pmi mismatch for ($a,$b): $pmi vs $expect")
    }
    // ranking: rounded pmi descending, ties by (tok_a, tok_b)
    val keys = out.map(r => (-r.getDouble(r.fieldIndex("pmi")),
      r.getString(r.fieldIndex("tok_a")), r.getString(r.fieldIndex("tok_b"))))
    assert(keys.sameElements(keys.sorted), "rows must arrive in rank order")
  }

  test("near_dup_edit_verify: distances replay from a literal Levenshtein, " +
    "the integer keep rule holds, and exact duplicates surface at distance 0") {
    def lev(a: String, b: String): Int = {
      val prev = Array.tabulate(b.length + 1)(identity)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length)
          cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
            prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = graft.queries.DedupQueries.queries("near_dup_edit_verify")(
      spark, TestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.nonEmpty, "the corpus's exact dups must surface")
    got.foreach { case (a, b, d, ratio) =>
      assert(a < b)
      val expect = lev(docs(a), docs(b))
      assert(d == expect, s"pair ($a,$b): engine $d vs replay $expect")
      val maxlen = math.max(docs(a).length, docs(b).length)
      assert(d * 10 <= maxlen * 3, "keep rule")
      // the engine emits the 4-dp rounded ratio
      assert(math.abs(ratio - d.toDouble / maxlen) < 5e-5)
    }
    // any exact-duplicate text pair in the capped corpus must appear at
    // distance 0 (identical texts share every band key by construction)
    val pairs = got.map(t => (t._1, t._2)).toSet
    val dupPairs = docs.toSeq.groupBy(_._2).values.filter(_.size > 1)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        ids.combinations(2).map(c => (c(0), c(1)))
      }.toSeq
    dupPairs.foreach { p =>
      assert(pairs.contains(p), s"exact dup pair $p must verify at distance 0")
      assert(got.find(t => (t._1, t._2) == p).get._3 == 0)
    }
  }

  test("bpe_merges: the learned merge table replays from a literal " +
    "driver-side BPE (wordcount, per-round argmax, greedy merge application)") {
    val got = TextQueries.queries("bpe_merges")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    var words = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).groupBy(identity)
      .map { case (w, g) => w.split("").filter(_.nonEmpty).toVector -> g.length.toLong }
      .toVector
    val expect = (1 to 3).map { round =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f }
      }
      val ((l, r), c) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
      words = words.map { case (syms, f) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += s
        }
        out.toVector -> f
      }
      (round, l, r, c)
    }
    assert(got.toSeq == expect,
      s"merge tables differ:\nengine: ${got.toSeq}\nreplay: $expect")
    // merges must be real compressions: every learned pair occurred
    got.foreach { case (_, _, _, c) => assert(c > 0) }
  }

  test("bpe_segment: piece streams replay from applying the learned merges " +
    "in rank order; pieces reconstruct every word exactly") {
    val Mod = 1000000007L
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31L + c.toInt) % Mod)
    // merges from the engine's own table (already replay-verified above)
    val merges = TextQueries.queries("bpe_merges")(spark, TestSession.Sf0001)
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2)))
    def seg(word: String): Vector[String] = {
      var syms = word.split("").filter(_.nonEmpty).toVector
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == l && s == r) {
            out.remove(out.length - 1); out += (l + r)
          } else out += s
        }
        syms = out.toVector
      }
      syms
    }
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = TextQueries.queries("bpe_segment")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == docs.keySet)
    var anyMerged = false
    docs.foreach { case (id, text) =>
      val pieces = text.split(" ", -1).toVector.flatMap { w =>
        val p = seg(w)
        assert(p.mkString == w, s"doc $id: pieces must reconstruct '$w'")
        p
      }
      val fp = pieces.foldLeft(0L)((a, p) => (a * 31L + tokHash(p)) % Mod)
      assert(got(id) == ((pieces.length.toLong, fp)),
        s"doc $id: ${got(id)} vs (${pieces.length}, $fp)")
      if (pieces.length < text.count(_ != ' ') ) anyMerged = true
    }
    assert(anyMerged, "the learned merges must actually compress some doc")
  }

  test("winnow_fingerprints: the winnowing guarantee holds — every window of " +
    "WinnowW consecutive gram positions contains a selection, each selection " +
    "is its window's leftmost min, and density stays near 2/(w+1)") {
    val W = 4
    val Mod = 1000000007L
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31L + c.toInt) % Mod)
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
    val grams = docs.map { case (id, tk) =>
      val th = tk.map(tokHash)
      id -> (if (th.length < 8) Vector.empty[Long]
             else (0 to th.length - 8).toVector.map(i =>
               th.slice(i, i + 8).foldLeft(0L)((a, h) => (a * 31L + h) % Mod)))
    }.toMap
    val got = TextQueries.queries("winnow_fingerprints")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    assert(got.nonEmpty)
    var nSel = 0L; var nGram = 0L
    got.foreach { case (id, sel) =>
      val gh = grams(id)
      nSel += sel.size; nGram += gh.length
      // each selection is the leftmost min of SOME window containing it
      sel.foreach { case (pos, fp) =>
        assert(gh(pos.toInt - 1) == fp, s"doc $id pos $pos: fp must be the gram there")
      }
      // the guarantee: every length-W window of gram positions holds >=1 selection
      if (gh.length >= W) (1 to gh.length - W + 1).foreach { i =>
        assert((i until i + W).exists(p => sel.contains(p.toLong)),
          s"doc $id: window at $i has no fingerprint — winnowing guarantee broken")
      }
      // replay: the selected set IS the union of per-window leftmost argmins
      if (gh.length >= 1) {
        val expect = (1 to math.max(gh.length - W + 1, 1)).map { i =>
          val win = gh.slice(i - 1, math.min(i - 1 + W, gh.length))
          val mv = win.min
          (i + win.indexOf(mv)).toLong -> mv
        }.toMap
        assert(sel == expect, s"doc $id: selection set mismatch")
      }
    }
    val density = nSel.toDouble / nGram
    assert(density > 1.0 / W && density < 4.0 / (W + 1),
      s"density $density out of the winnowing regime for w=$W")
  }

  test("span_dedup_excise: excised text equals a literal driver-side replay " +
    "(dup grams -> covered positions -> surviving tokens), and a doc loses " +
    "tokens iff dup_span_stats marks it") {
    val Mod = 1000000007L
    def tokHash(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31L + c.toInt) % Mod)
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toVector)
    val grams = docs.map { case (id, tk) =>
      val th = tk.map(tokHash)
      id -> (if (th.length < 8) Vector.empty[(Int, Long)]
             else (0 to th.length - 8).toVector.map(i =>
               i + 1 -> th.slice(i, i + 8).foldLeft(0L)((a, h) => (a * 31L + h) % Mod)))
    }.toMap
    val dupSet = grams.toSeq.flatMap { case (id, g) => g.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    val expected = docs.map { case (id, tk) =>
      val covered = grams(id).filter(g => dupSet(g._2))
        .flatMap { case (st, _) => st until st + 8 }.toSet
      val kept = tk.zipWithIndex.collect { case (t, i) if !covered(i + 1) => t }
      id -> ((tk.length.toLong, kept.length.toLong, kept.mkString(" ")))
    }.toMap
    val got = TextQueries.queries("span_dedup_excise")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, v) =>
      assert(v == expected(id), s"doc $id: engine $v vs replay ${expected(id)}") }
    val stats = TextQueries.queries("dup_span_stats")(spark, TestSession.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (id, (n, kept, _)) =>
      assert((kept < n) == (stats(id) > 0),
        s"doc $id: excision (${n - kept} dropped) must agree with dup_span_stats (${stats(id)} dup windows)")
    }
    assert(got.values.exists { case (n, kept, _) => kept < n },
      "fixture must exercise a real excision")
  }

  test("corpus_rollup: ALL rows equal the sums of their children at every level") {
    val rows = TextQueries.queries("corpus_rollup")(spark, TestSession.Sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val leaf = rows.filter(r => r._1 != "ALL" && r._2 != "ALL")
    val bySource = rows.filter(r => r._1 != "ALL" && r._2 == "ALL")
    val grand = rows.filter(r => r._1 == "ALL" && r._2 == "ALL")
    assert(grand.length == 1 && rows.length == leaf.length + bySource.length + 1)
    bySource.foreach { case (src, _, nd, nt, nc) =>
      val kids = leaf.filter(_._1 == src)
      assert(kids.map(_._3).sum == nd && kids.map(_._4).sum == nt &&
        kids.map(_._5).sum == nc, s"per-source rollup mismatch for $src")
    }
    assert(leaf.map(_._3).sum == grand.head._3 && leaf.map(_._4).sum == grand.head._4 &&
      leaf.map(_._5).sum == grand.head._5, "grand-total mismatch")
  }

  test("quality_nb_classify: one prediction per doc, valid classes, deterministic, " +
      "and above uniform chance on the held-out split") {
    val q = TextQueries.queries("quality_nb_classify")
    val rows = q(spark, TestSession.Sf0001).collect()
    val docs = graft.core.Tables.load(spark, TestSession.Sf0001, "documents")
    val nDocs = docs.count()
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.length == nDocs, "exactly one prediction row per document")
    assert(rows.map(_.getLong(0)).distinct.length == nDocs, "doc_id unique")
    rows.foreach { r =>
      assert(Set("train", "eval").contains(r.getString(1)))
      assert(langs.contains(r.getString(3)), s"prediction ${r.getString(3)} not a class")
      assert(r.getDouble(4) < 0.0, "NB log-posterior must be negative")
    }
    // determinism: the count-based fit admits no RNG — rerun is identical
    val again = q(spark, TestSession.Sf0001).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // accuracy floor: uniform chance over 5 langs is 0.2; the synthetic
    // corpus's text is nearly label-independent (majority class ≈ 0.41
    // is the measured data ceiling — exact-token NB scores the same), so
    // the honest bar is "clearly above uniform chance", not "high"
    val eval = rows.filter(_.getString(1) == "eval")
    val acc = eval.count(r => r.getString(2) == r.getString(3)).toDouble / eval.length
    assert(acc >= 0.3, f"held-out NB accuracy $acc%.3f below the 0.3 floor")
    // confusion readout is consistent with the classify rows
    val conf = TextQueries.queries("quality_nb_confusion")(spark, TestSession.Sf0001)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf.values.sum == eval.length, "confusion matrix must cover the eval split")
    val diag = conf.collect { case ((a, p), n) if a == p => n }.sum
    assert(diag == eval.count(r => r.getString(2) == r.getString(3)))
  }
}
