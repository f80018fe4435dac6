package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: token statistics / quality scoring, n-gram-free
  * language ID (stopword-hit heuristic), and deterministic document
  * fingerprinting (rolling polynomial hash).
  *
  * Everything is integer or single-pass string arithmetic so the DuckDB
  * oracle matches bit-for-bit; all ops are per-row projections — no
  * shuffle, embarrassingly parallel at any scale.
  */
object TextQueries extends QueryProvider {

  import graft.functions.TextFunctions.{toks, docFingerprint}

  private def hits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(lit(_)): _*)))

  private val enWords = Seq("the", "and", "is", "of", "to", "a")
  private val deWords = Seq("der", "die", "und", "ist", "von", "zu")
  private val frWords = Seq("le", "la", "et", "est", "les", "une")

  private def sqlHits(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting + quality scoring (length / distinct ratio)
    "text_stats" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val t = toks(col("text"))
      d.select(
        col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_distinct"),
        round(size(array_distinct(t)).cast("double") / size(t), 4).as("ttr"),
        round((length(col("text")) - (size(t) - 1)).cast("double") / size(t), 4)
          .as("avg_token_len"))
    }),
    // Language-ID heuristic: argmax of stopword hits, deterministic tie order en>de>fr
    "lang_id" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val t = toks(lower(col("text")))
      val en = hits(t, enWords)
      val de = hits(t, deWords)
      val fr = hits(t, frWords)
      d.select(
        col("doc_id"),
        en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"),
        when(en >= de && en >= fr, "en")
          .when(de >= fr, "de")
          .otherwise("fr").as("lang_pred"),
        col("lang").as("lang_actual"))
    }),
    // Deterministic rolling-hash fingerprint (exact integer parity)
    "doc_fingerprint" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      d.select(col("doc_id"), docFingerprint(col("text")).as("fingerprint"))
    })
  )

  def oracles: Map[String, String] = Map(
    "text_stats" ->
      """SELECT doc_id,
        |       CAST(length(text) AS INT) AS n_chars_m,
        |       CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |       round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |             / len(string_split(text, ' ')), 4) AS ttr,
        |       round(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |             / len(string_split(text, ' ')), 4) AS avg_token_len
        |FROM documents""".stripMargin,
    "lang_id" ->
      s"""SELECT doc_id,
         |       CAST(${sqlHits(enWords)} AS INT) AS en_hits,
         |       CAST(${sqlHits(deWords)} AS INT) AS de_hits,
         |       CAST(${sqlHits(frWords)} AS INT) AS fr_hits,
         |       CASE WHEN ${sqlHits(enWords)} >= ${sqlHits(deWords)}
         |              AND ${sqlHits(enWords)} >= ${sqlHits(frWords)} THEN 'en'
         |            WHEN ${sqlHits(deWords)} >= ${sqlHits(frWords)} THEN 'de'
         |            ELSE 'fr' END AS lang_pred,
         |       lang AS lang_actual
         |FROM (SELECT doc_id, lower(text) AS text, lang FROM documents)""".stripMargin,
    "doc_fingerprint" -> {
      import graft.functions.TextFunctions.{sqlTokenHash, Mod}
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(string_split(text, ' '), t -> ${sqlTokenHash("t")})),
         |    (a, b) -> (a * 31 + b) % $Mod) AS fingerprint
         |FROM documents""".stripMargin
    }
  )
}
