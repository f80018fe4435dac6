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
    // Chunked-decode work plan: each payload split into fixed 64-byte
    // chunks with (offset, length, content fingerprint) — the unit of
    // work a distributed blob decoder fans out over (chunk → decode →
    // reassemble by (media_id, chunk_idx)). Pure projection + explode:
    // rows ∝ total payload bytes / 64, never a shuffle. The fingerprint
    // is the stub decode (same plug point as byteHistogram); payloads
    // here are ASCII text so char offsets ≡ byte offsets on both engines.
    "media_chunk_plan" -> ((s, dir) => {
      val Chunk = 64
      val d = Tables.load(s, dir, "documents").where(length(col("text")) > 0)
      val nb = length(col("text"))
      val len = (i: org.apache.spark.sql.Column) => least(lit(Chunk), nb - i * Chunk)
      val plan = transform(
        sequence(lit(0), ceil(nb.cast("double") / Chunk).cast("int") - 1),
        i => struct(
          i.cast("int").as("chunk_idx"),
          (i * Chunk).cast("long").as("off"),
          len(i).cast("long").as("len"),
          graft.functions.TextFunctions
            .tokenHash(col("text").substr(i * Chunk + 1, len(i))).as("chunk_fp")))
      d.select(col("doc_id").as("media_id"), explode(plan).as("c"))
        .select(col("media_id"), col("c.chunk_idx"), col("c.off"),
          col("c.len"), col("c.chunk_fp"))
    }),
    // Content-defined chunking (the rsync/LBFS/FastCDC family): chunk
    // boundaries cut where a rolling hash of the trailing bytes hits
    // 0 mod divisor, so they track CONTENT, not offsets — an edit
    // reshapes only the chunks it touches while every later chunk
    // fingerprint survives byte-identical (asserted in spec). This is
    // the chunking blob-dedup stores need, where media_chunk_plan's
    // fixed-64-byte grid would re-fingerprint an entire payload after
    // one inserted byte. Same plan shape: pure projection + explode,
    // rows ∝ payload bytes / divisor, never a shuffle; fingerprints are
    // the stub-decode plug point.
    "media_cdc_chunks" -> ((s, dir) => {
      // three explicit projection stages (codes → bounds → chunks): each
      // HOF lambda must read a bound ATTRIBUTE — inlining the char-split
      // into the boundary filter re-evaluates it per position
      // (interpreted lambdas), turning the op O(n²) per payload
      val d = Tables.load(s, dir, "documents").where(length(col("text")) > 0)
        .select(col("doc_id").as("media_id"), col("text"),
          Multimodal.charCodes(col("text")).as("codes"))
        .select(col("media_id"), col("text"),
          Multimodal.cdcBoundsFromCodes(col("codes")).as("bounds"))
      val bounds = col("bounds")
      val chunks = transform(sequence(lit(1), size(bounds) - 1), j =>
        struct(
          (j - 1).cast("int").as("chunk_idx"),
          element_at(bounds, j).cast("long").as("off"),
          (element_at(bounds, j + 1) - element_at(bounds, j)).cast("long").as("len"),
          graft.functions.TextFunctions.tokenHash(
            col("text").substr(element_at(bounds, j) + 1,
              element_at(bounds, j + 1) - element_at(bounds, j))).as("chunk_fp")))
      d.select(col("media_id"), explode(chunks).as("c"))
        .select(col("media_id"), col("c.chunk_idx"), col("c.off"),
          col("c.len"), col("c.chunk_fp"))
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
    "media_chunk_plan" -> {
      import graft.functions.TextFunctions.sqlTokenHash
      val chunk = "substring(text, CAST(i*64+1 AS BIGINT), CAST(least(64, nb - i*64) AS BIGINT))"
      s"""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS nb
         |           FROM documents WHERE length(text) > 0),
         |c AS (SELECT media_id, text, nb,
         |             unnest(range(0, CAST(ceil(nb / 64.0) AS BIGINT))) AS i
         |      FROM d)
         |SELECT media_id,
         |       CAST(i AS INT) AS chunk_idx,
         |       CAST(i * 64 AS BIGINT) AS off,
         |       CAST(least(64, nb - i * 64) AS BIGINT) AS len,
         |       ${sqlTokenHash(chunk)} AS chunk_fp
         |FROM c""".stripMargin
    },
    "media_cdc_chunks" -> {
      import graft.functions.TextFunctions.{Mod, sqlTokenHash}
      val w = graft.multimodal.Multimodal.CdcWindow
      val div = graft.multimodal.Multimodal.CdcDivisor
      // rolling hash of chars i-(w-1)..i (1-based, inclusive slice)
      val roll = s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
        | list_transform(ch[i - ${w - 1} : i], c -> CAST(ascii(c) AS BIGINT))),
        | (a, b) -> (a * 31 + b) % $Mod)""".stripMargin.replaceAll("\n\\s*", " ")
      val sub = "substring(text, CAST(bounds[j] + 1 AS BIGINT), CAST(bounds[j+1] - bounds[j] AS BIGINT))"
      s"""WITH d AS (SELECT doc_id AS media_id, text, string_split(text, '') AS ch,
         |                  length(text) AS n
         |           FROM documents WHERE length(text) > 0),
         |b AS (SELECT media_id, text,
         |             list_sort(list_distinct([CAST(0 AS BIGINT)] ||
         |               CASE WHEN n < $w THEN CAST([] AS BIGINT[])
         |                    ELSE list_filter(range($w, n + 1), i -> ($roll) % $div = 0) END ||
         |               [CAST(n AS BIGINT)])) AS bounds
         |      FROM d),
         |c AS (SELECT media_id, text, bounds, unnest(range(1, len(bounds))) AS j FROM b)
         |SELECT media_id, CAST(j - 1 AS INT) AS chunk_idx,
         |       CAST(bounds[j] AS BIGINT) AS off,
         |       CAST(bounds[j+1] - bounds[j] AS BIGINT) AS len,
         |       ${sqlTokenHash(sub)} AS chunk_fp
         |FROM c""".stripMargin
    },
    "media_frame_sample" ->
      """WITH d AS (SELECT doc_id AS media_id, n_chars % 240 + 10 AS n_frames FROM documents)
        |SELECT media_id, n_frames, CAST(j.j AS INT) AS j,
        |       (j.j * n_frames) // 4 AS frame_idx
        |FROM d, range(0, 4) AS j(j)""".stripMargin
  )
}
