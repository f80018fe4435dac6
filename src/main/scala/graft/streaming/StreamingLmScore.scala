package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.queries.TextQueries

/** Streaming LM scoring — the serving shape of the batch
  * `bigram_logprob` query: the capped unigram/bigram count tables are
  * trained OFFLINE over a corpus snapshot (`TextQueries.bigramModels`)
  * and held static; each micro-batch of documents is scored by the SAME
  * projection+fold the batch query runs.
  *
  * Scoring is per-doc PURE — a doc's (n_tokens, nll) depends only on
  * its own token array and the static model — so stream ≡ batch for
  * any micro-batch split and a replayed batch emits byte-identical
  * rows (idempotent under a file sink). Expressed with foreachBatch
  * because the per-doc fold is a non-time aggregation Structured
  * Streaming cannot run incrementally — and doesn't need to: all of a
  * doc's tokens live in its own row, so no cross-batch state exists.
  * State ∝ 0 regardless of rate; the model ships to executors once per
  * batch via the broadcast joins inside `scoreWithModels` (at serving
  * scale: persist the model tables and `cache()` them so the broadcast
  * is built once).
  */
object StreamingLmScore {

  /** foreachBatch body: score `batch` under the static model and append
    * to `outDir/scores` — pair with
    * `docsStream.writeStream.foreachBatch(appendScored(uni, bi, n, dir) _)`.
    * The spec drives it exactly like the IVF/HNSW maintenance bodies. */
  def appendScored(uni: DataFrame, bi: DataFrame, n: Double, outDir: String)(
      batch: DataFrame, batchId: Long): Unit =
    TextQueries.scoreWithModels(batch, uni, bi, n)
      .write.mode("append").parquet(s"$outDir/scores")
}
