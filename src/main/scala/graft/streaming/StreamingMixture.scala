package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming domain-mixture sampling — the production serving shape of
  * the batch `mixture_sample` query: the per-source acceptance plan is
  * computed OFFLINE over a corpus snapshot (batch `mixture_plan`) and
  * held static; the document stream is filtered by a stream-static
  * broadcast equi-join plus a pure integer fingerprint test.
  *
  * The operator is completely STATELESS — no watermark, no state store;
  * state ∝ 0 regardless of stream rate or corpus size, because the
  * accept decision for a doc depends only on (source, content). The
  * fingerprint gate is deterministic, so a replayed/retried micro-batch
  * emits byte-identical rows and an idempotent (e.g. file) sink
  * deduplicates for free — the same retry-safety argument as the batch
  * form, carried to streaming.
  */
object StreamingMixture {

  /** Filter `docs` (batch OR streaming frame with doc_id/source/text) by
    * a precomputed (source, thresh) plan. Identical logic to the batch
    * `mixture_sample` accept test — the spec asserts stream ≡ batch for
    * any micro-batch split. */
  def sample(docs: DataFrame, plan: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
        TextFunctions.docFingerprint(col("text")).as("fp"))
      .join(broadcast(plan.select("source", "thresh")), Seq("source"))
      .where(col("fp") % lit(1000000L) < col("thresh"))
      .select("doc_id", "source")
}
