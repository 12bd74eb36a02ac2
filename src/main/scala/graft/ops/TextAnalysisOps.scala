package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis operator family over `documents` — language ID, quality
  * scoring, token counting, and content fingerprinting. All pure columnar
  * expressions (split/HOF/regexp/md5): one narrow scan per query, no
  * shuffle except the final ORDER BY, trivially 100 TB-safe. Every formula
  * is mirrored in DuckDB SQL, integer-ratio arithmetic keeps the doubles
  * bit-identical across engines, and md5 is the shared hash.
  */
object TextAnalysisOps {

  /** Tiny function-word list: enough signal for a synthetic-corpus heuristic. */
  private val Stopwords = Seq("a", "an", "the", "of", "to", "in", "and", "is", "on", "for")

  private def documents(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def toks: Column = tokens(col("text"))

  private def stopwordCount(t: Column): Column =
    size(filter(t, w => w.isin(Stopwords.map(x => x: Any): _*)))

  /** Language ID, n-gram/function-word heuristic: the stopword ratio of a
    * document is a cheap, surprisingly strong English detector. Emits the
    * ratio (exact int ratio) and the decision.
    */
  private def taLangid(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"),
        (stopwordCount(col("w")).cast("double") /
          greatest(size(col("w")), lit(1)).cast("double")).as("stopword_ratio"))
      .withColumn("lang_pred", when(col("stopword_ratio") >= 0.03, "en").otherwise("und"))
      .select(col("doc_id"), col("stopword_ratio"), col("lang_pred"))
      .orderBy(col("doc_id"))

  /** Quality score: mean word length, type-token ratio, stopword ratio, and
    * a length prior, combined with fixed weights. Every term is a ratio of
    * ints → the double is engine-exact.
    */
  private def taQuality(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"), col("n_chars"), toks.as("w"))
      .select(col("doc_id"),
        size(col("w")).as("n_words"),
        (size(array_distinct(col("w"))).cast("double") /
          greatest(size(col("w")), lit(1)).cast("double")).as("ttr"),
        (stopwordCount(col("w")).cast("double") /
          greatest(size(col("w")), lit(1)).cast("double")).as("stop_ratio"))
      .withColumn("quality",
        round(col("ttr") * 0.5 + col("stop_ratio") * 0.3 +
          when(col("n_words") >= 30, 0.2).otherwise(0.0), 6))
      .select(col("doc_id"), col("n_words"), round(col("ttr"), 6).as("ttr"),
        round(col("stop_ratio"), 6).as("stop_ratio"), col("quality"))
      .orderBy(col("doc_id"))

  /** Token counting two ways: whitespace words and a BPE-ish sub-token
    * regex (letter runs / digit runs / single other-symbols) — the standard
    * cheap proxy for LLM token budgets.
    */
  private def taTokenCount(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        size(toks).as("ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
          .as("bpeish_tokens"))
      .orderBy(col("doc_id"))

  /** Document fingerprints: whole-content md5 over normalized text, plus a
    * winnowing-style shingle fingerprint (lexicographic min of the trigram
    * md5s) that survives local edits — both reproducible in any engine.
    */
  private def taFingerprint(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("doc_id"),
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")).as("content_fp"),
        array_min(transform(trigrams(toks), t => md5(t))).as("min_shingle_fp"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_langid" -> (taLangid _),
    "ta_quality_score" -> (taQuality _),
    "ta_token_count" -> (taTokenCount _),
    "ta_fingerprint" -> (taFingerprint _)
  )

  private val duckToks =
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
  private val duckStop =
    Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    "ta_langid" ->
      s"""SELECT doc_id, stopword_ratio,
         |  CASE WHEN stopword_ratio >= 0.03 THEN 'en' ELSE 'und' END AS lang_pred
         |FROM (
         |  SELECT doc_id,
         |    len(list_filter(w, x -> list_contains($duckStop, x)))::DOUBLE /
         |      greatest(len(w), 1)::DOUBLE AS stopword_ratio
         |  FROM (SELECT doc_id, $duckToks w FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "ta_quality_score" ->
      s"""SELECT doc_id, n_words, round(ttr, 6) AS ttr, round(stop_ratio, 6) AS stop_ratio,
         |  round(ttr * 0.5 + stop_ratio * 0.3 +
         |    CASE WHEN n_words >= 30 THEN 0.2 ELSE 0.0 END, 6) AS quality
         |FROM (
         |  SELECT doc_id, len(w) AS n_words,
         |    len(list_distinct(w))::DOUBLE / greatest(len(w), 1)::DOUBLE AS ttr,
         |    len(list_filter(w, x -> list_contains($duckStop, x)))::DOUBLE /
         |      greatest(len(w), 1)::DOUBLE AS stop_ratio
         |  FROM (SELECT doc_id, $duckToks w FROM documents))
         |ORDER BY doc_id""".stripMargin,
    "ta_token_count" ->
      s"""SELECT doc_id, CAST(len($duckToks) AS INTEGER) AS ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS INTEGER)
         |    AS bpeish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS content_fp,
         |  list_min(list_transform(t, x -> md5(x))) AS min_shingle_fp
         |FROM (
         |  SELECT doc_id, text,
         |    CASE WHEN len(w) < 3 THEN []
         |         ELSE list_distinct(list_transform(range(1, len(w)-1),
         |                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         |    END AS t
         |  FROM (SELECT doc_id, text, $duckToks w FROM documents))
         |ORDER BY doc_id""".stripMargin
  )
}
