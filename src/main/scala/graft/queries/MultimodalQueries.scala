package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal-column pipeline over the media table derived from
  * documents: binary payloads + metadata, stub feature extraction
  * (byte-nibble histogram), frame-sampling arithmetic.
  */
object MultimodalQueries extends QueryProvider {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload features (stub decode): (media_id, bin, count)
    "media_byte_histogram" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      media
        .select(col("media_id"), Multimodal.byteHistogram(col("bytes")).as("hist"))
        .select(col("media_id"), posexplode(col("hist")).as(Seq("bin", "n")))
        .select(col("media_id"), col("bin").cast("int").as("bin"), col("n"))
    }),
    // Media metadata passthrough + payload size (schema plumbing check)
    "media_catalog" -> ((s, dir) => {
      val media = Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents"))
      media.select(
        col("media_id"), col("kind"),
        length(col("bytes")).as("n_bytes"),
        col("meta")("source").as("source"),
        col("meta")("lang").as("lang"))
    }),
    // Frame-sample plan: stride indices for a fake per-doc frame count
    "media_frame_sample" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("media_id"),
          (col("n_chars") % 240 + 10).as("n_frames"))
      d.select(col("media_id"), col("n_frames"),
          posexplode(Multimodal.frameSamplePlan(col("n_frames"), 4)).as(Seq("j", "frame_idx")))
        .select(col("media_id"), col("n_frames"),
          col("j").cast("int").as("j"), col("frame_idx"))
    })
  )

  def oracles: Map[String, String] = Map(
    "media_byte_histogram" ->
      """WITH nib AS (
        |  SELECT doc_id AS media_id,
        |         list_transform(string_split(lower(hex(CAST(text AS BLOB))), ''),
        |           c -> CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87 ELSE ascii(c) - 48 END) AS ns
        |  FROM documents),
        |h AS (
        |  SELECT media_id, b.b AS bin,
        |         len(list_filter(ns, n -> n = b.b)) AS n
        |  FROM nib, range(0, 16) AS b(b))
        |SELECT media_id, CAST(bin AS INT) AS bin, CAST(n AS INT) AS n FROM h""".stripMargin,
    "media_catalog" ->
      """SELECT doc_id AS media_id, 'text/plain' AS kind,
        |       CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
        |       source, lang
        |FROM documents""".stripMargin,
    "media_frame_sample" ->
      """WITH d AS (SELECT doc_id AS media_id, n_chars % 240 + 10 AS n_frames FROM documents)
        |SELECT media_id, n_frames, CAST(j.j AS INT) AS j,
        |       (j.j * n_frames) // 4 AS frame_idx
        |FROM d, range(0, 4) AS j(j)""".stripMargin
  )
}
