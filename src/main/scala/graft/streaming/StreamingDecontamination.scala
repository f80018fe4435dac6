package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions._

/** Streaming benchmark decontamination — the ingest-time form of the
  * batch `contamination_8gram`/`contamination_bloom` queries: a document
  * stream is screened against a STATIC eval set as it arrives, so
  * contaminated training documents are flagged before they ever land in
  * the corpus (the 100 TB crawl-pipeline shape; screening at ingest
  * costs one pass instead of a later full-corpus sweep).
  *
  * The eval side is frozen once at stream start: its distinct 8-gram
  * hashes aggregate into a native bloom sketch (a fixed few-hundred-KB
  * byte literal regardless of stream length) AND a broadcastable exact
  * gram table. Each micro-batch explodes its docs' rolling 8-grams,
  * drops non-members with the codegen'd `might_contain` BEFORE the join
  * (no false negatives), and exactly confirms the survivors against the
  * eval gram table — per-doc results are bit-identical to the batch
  * operators run over the same documents, which is what StreamingSpec
  * asserts. Stateless (stream-static inner join + per-batch agg via
  * foreachBatch): no watermark, no state store, idempotent per batch.
  */
object StreamingDecontamination {

  /** The frozen eval side: exact distinct gram table (eval_id, gram)
    * plus its bloom bytes. `n` is 8 (the batch operators' ContamN). */
  final case class EvalSide(grams: DataFrame, bloom: Array[Byte], n: Int)

  /** Build the static screen from eval documents (doc_id, text). */
  def evalSide(evalDocs: DataFrame, n: Int = 8): EvalSide = {
    val grams = gramRows(evalDocs, n).withColumnRenamed("doc_id", "eval_id")
      .cache()
    val bloom = grams
      .agg(org.apache.spark.sql.graftx.SketchExpressions
        .bloomFilterAgg(col("gram"), 100000L, 1000000L).as("bf"))
      .first().getAs[Array[Byte]](0)
    EvalSide(grams, bloom, n)
  }

  /** Distinct rolling-n-gram hash rows (doc_id, gram) — the exact gram
    * recipe of the batch contamination queries (token hash + rolling
    * window + per-doc distinct). */
  def gramRows(docs: DataFrame, n: Int): DataFrame = docs
    .select(col("doc_id"),
      transform(toks(col("text")), t => tokenHash(t)).as("th"))
    .select(col("doc_id"),
      explode(array_distinct(ngramWindow(col("th"), n))).as("gram"))

  /** Per-batch screen: (doc_id, eval_id, n_shared) overlap counts for
    * the batch's contaminated docs — empty when the batch is clean. */
  def screenBatch(batch: DataFrame, eval: EvalSide): DataFrame =
    gramRows(batch, eval.n)
      .where(org.apache.spark.sql.graftx.SketchExpressions
        .mightContain(eval.bloom, col("gram")))
      .join(broadcast(eval.grams), Seq("gram"))
      .groupBy("doc_id", "eval_id")
      .agg(count(lit(1)).as("n_shared"))

  /** Run the stream: each micro-batch of (doc_id, text) documents is
    * screened and its overlap rows appended to `outDir`. */
  def stream(docs: DataFrame, eval: EvalSide, outDir: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        screenBatch(batch, eval)
          .write.mode("append").parquet(outDir)
      }
      .start()
}
