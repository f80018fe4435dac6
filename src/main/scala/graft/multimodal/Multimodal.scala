package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns with typed
  * metadata, plus feature extraction shaped for a 100 TB pipeline.
  *
  * The container has no image/audio codecs, so the *decode* step is a
  * clearly-marked deterministic fake (byte-level features) — the
  * Spark-side plumbing (schema, pure-projection extraction, partitioned
  * batch shape, frame-index arithmetic) is real and tested. Swapping in a
  * real decoder means replacing [[byteHistogram]]'s interpretation, not
  * the pipeline.
  */
object Multimodal {

  /** Canonical media schema: (media_id LONG, kind STRING, bytes BINARY,
    * meta MAP<STRING,STRING>). Built here from documents.text so the
    * whole path is reproducible in the oracle. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      col("text").cast("binary").as("bytes"),
      map(lit("source"), col("source"), lit("lang"), col("lang")).as("meta"))

  /** STUB DECODER — deterministic fake standing in for image/audio
    * decode: a 16-bin histogram over the low nibbles of the payload's
    * hex encoding. Real decoders plug in at exactly this signature
    * (bytes → fixed-length feature vector). */
  def byteHistogram(bytes: Column): Column = {
    val nibbles = transform(
      filter(split(lower(hex(bytes)), ""), c => c =!= ""),
      c => when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48))
    transform(sequence(lit(0), lit(15)), b =>
      size(filter(nibbles, n => n === b)))
  }

  /** Frame sampling arithmetic: given n_frames and a target of `take`
    * frames, the deterministic stride plan (frame indices to decode).
    * Pure integer arithmetic — identical in any engine. */
  def frameSamplePlan(nFrames: Column, take: Int): Column =
    transform(sequence(lit(0), lit(take - 1)),
      j => floor((j * nFrames) / lit(take)).cast("long"))
}
