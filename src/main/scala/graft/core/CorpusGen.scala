package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.{CentroidSimsKernel, TextHashKernel}
import org.apache.spark.unsafe.types.UTF8String

import graft.index.PlaidIndex
import graft.index.PlaidIndex.PlaidModel

/** Deterministic synthetic corpora for the regimes the driver testdata
  * cannot exercise. The sf documents tables carry a ~31-token vocabulary,
  * so ANY token/centroid bucketing puts every doc in ~every bucket and a
  * posting probe prunes nothing (VERDICT r9 missing #1) — the selectivity
  * story of the multi-vector kind needs vocab ≫ C with topic-clustered
  * token usage, the shape real corpora have (a doc draws most tokens from
  * its topic's vocabulary slice, so it quantizes into FEW centroids).
  *
  * Construction (all RNG-free, xxhash64-keyed like Bench.pseudo):
  *  1. vocabulary of V synthetic tokens; the C smallest token hashes
  *     seed the frozen PLAID quantizer (exactly [[PlaidIndex.train]]'s
  *     rule over any corpus whose distinct tokens are the vocabulary);
  *  2. every token is assigned its argmax-similarity centroid with the
  *     SAME kernel the engine assigns with ([[CentroidSimsKernel]],
  *     ties to the lowest index) — the tokens of one centroid form one
  *     "topic pool";
  *  3. doc d belongs to topic (d % C) and draws `tokensPerDoc` slots:
  *     1-in-`strayDenom` slots pick uniformly from the whole vocabulary
  *     (the cross-topic bleed real text has), the rest pick uniformly
  *     from the home pool. A doc therefore covers its home centroid plus
  *     a handful of stray centroids — the few-centroids-per-doc regime
  *     where the posting probe's pruning is the whole game.
  *
  * Docs are built with pure Column expressions over `spark.range` (pool
  * tables ride as array literals, picks are xxhash64 mod pool size), so
  * generation is distributed and reproducible at any nDocs.
  */
object CorpusGen {

  final case class PlaidWorld(docs: DataFrame, model: PlaidModel,
      vocabSize: Int, c: Int, pools: Array[Array[String]]) {
    /** In-artifact world fingerprint (same discipline as
      * [[VectorGen.ClusteredWorldSpec.fingerprint]]): a 48-bit hash of
      * the world parameters and a probe of doc 0's generated text, so a
      * generator or config drift shows up next to every row derived from
      * this world. */
    def fingerprint: Double = {
      val text0 = docs.where(col("doc_id") === 0L).select(col("text")).head.getString(0)
      var h = 0xcbf29ce484222325L
      def mix(x: Long): Unit = { h ^= x; h *= 0x100000001b3L }
      mix(vocabSize.toLong); mix(c.toLong); mix(model.nprobe.toLong)
      text0.foreach(ch => mix(ch.toLong))
      (h >>> 16).toDouble
    }
  }

  /** Build the clustered-vocab world: (docs(doc_id, text), frozen model).
    * Every parameter deterministic; `salt` varies the doc draws only. */
  def plaidWorld(spark: SparkSession, nDocs: Long, vocabSize: Int, c: Int,
      tokensPerDoc: Int, nprobe: Int, strayDenom: Int = 10,
      salt: Long = 0L): PlaidWorld = {
    require(vocabSize > c, s"selectivity regime needs vocab ($vocabSize) > C ($c)")
    val vocab = Array.tabulate(vocabSize)(i => f"w$i%05d")
    val hashes = vocab.map(t => TextHashKernel.tokenHash(UTF8String.fromString(t)))
    val cents = hashes.distinct.sorted.take(c).toVector
    val primes = PlaidIndex.Primes.toArray
    val centVecs = cents.toArray.map(h => primes.map(p => ((h % p) + 1).toDouble))
    val centNorms = centVecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s = s + v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    // token → argmax-sim centroid, strict `>` (ties to the lowest index —
    // PlaidIndex.assign's array_position-of-max rule)
    val pools = Array.fill(c)(scala.collection.mutable.ArrayBuffer.empty[String])
    var vi = 0
    while (vi < vocab.length) {
      val sims = CentroidSimsKernel.raw(hashes(vi), primes, centVecs, centNorms)
      var best = 0
      var ci = 1
      while (ci < sims.length) { if (sims(ci) > sims(best)) best = ci; ci += 1 }
      pools(best) += vocab(vi)
      vi += 1
    }
    // a centroid whose pool came up empty (its seed token tied away)
    // falls back to the full vocabulary so element_at stays total
    val safePools: Array[Array[String]] =
      pools.map(p => if (p.isEmpty) vocab else p.toArray)
    val poolLit = typedLit(safePools.map(_.toSeq).toSeq)
    val sizeLit = typedLit(safePools.map(_.length.toLong).toSeq)
    val vocabLit = typedLit(vocab.toSeq)
    val home = (col("doc_id") % c).cast("int")
    val tokens = transform(sequence(lit(0), lit(tokensPerDoc - 1)), slot => {
      val stray = pmod(xxhash64(col("doc_id"), slot, lit(salt + 11L)),
        lit(strayDenom.toLong)) === 0L
      val gpick = element_at(vocabLit,
        (pmod(xxhash64(col("doc_id"), slot, lit(salt + 13L)),
          lit(vocabSize.toLong)) + 1L).cast("int"))
      val psize = element_at(sizeLit, home + 1)
      val ppick = element_at(element_at(poolLit, home + 1),
        (pmod(xxhash64(col("doc_id"), slot, lit(salt + 17L)), psize) + 1L).cast("int"))
      when(stray, gpick).otherwise(ppick)
    })
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"), concat_ws(" ", tokens).as("text"))
    PlaidWorld(docs, PlaidModel(cents, nprobe), vocabSize, c, safePools)
  }
}
