package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators over the `documents` table — the training-data
  * pipeline extensions mandated by the north star (SURVEY.md §2.3 X4):
  * token counting, per-language corpus stats, quality scoring, document
  * fingerprinting. All arithmetic is integer (counts) or a single final
  * double division, so the DuckDB oracle matches exactly.
  *
  * Scale notes: every query here is a single scan + map-side work; the only
  * shuffles are tiny groupBys on low-cardinality keys (lang). Token
  * operations stay inside Catalyst higher-order functions — no UDFs — so
  * they whole-stage-codegen and scale linearly with input bytes.
  */
object TextQueries {

  private def words(c: org.apache.spark.sql.Column) = split(c, " ")

  /** Whitespace token counting + distinct-token (vocabulary) counting. */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(words(col("text"))).as("n_tokens"),
        size(array_distinct(words(col("text")))).as("n_distinct"),
        length(col("text")).as("n_chars_calc"))
      .orderBy(col("doc_id"))

  /** Corpus stats by language: doc count, char-length min/max/mean, distinct
    * sources. */
  def langStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))

  /** Per-document quality signals: stopword ratio, mean token length, vowel
    * density — the length/punct/stopword heuristics of corpus filtering,
    * emitted as exact integers plus e4-scaled ratios. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val ws = words(col("text"))
    val nTokens = size(ws)
    val nStop = size(filter(ws, w => w === "the" || w === "a"))
    val sumTokLen = aggregate(transform(ws, w => length(w)), lit(0), (acc, x) => acc + x)
    val nVowels = length(col("text")) - length(regexp_replace(col("text"), "[aeiou]", ""))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        nStop.as("n_stop"),
        round(nStop.cast("double") * 10000 / nTokens).cast("long").as("stop_ratio_e4"),
        round(sumTokLen.cast("double") * 10000 / nTokens).cast("long").as("avg_tok_len_e4"),
        nVowels.as("n_vowels"))
      .orderBy(col("doc_id"))
  }

  /** Document fingerprint: SHA-256 over case/whitespace-normalized text (the
    * content-hash dedup key of the reference, T4 —
    * /root/reference/helper/multiple_document_upload.py:15-18 — applied to
    * normalized text instead of raw file bytes). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        substring(sha2(regexp_replace(lower(col("text")), "\\s+", " "), 256), 1, 16).as("fp"))
      .orderBy(col("doc_id"))

  /** Sketch-based corpus profiling — the 100 TB form of X4's stats:
    * approx_count_distinct is a HyperLogLog++ (fixed-size sketch, one pass,
    * mergeable across partitions) and percentile_approx a KLL-style
    * quantile sketch. Approximate ⇒ no SQL oracle (driver rows-only);
    * TextSketchSpec pins them within tolerance of exact answers. */
  def sketchStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"), col("n_chars"))
    toks.groupBy(col("lang"))
      .agg(
        approx_count_distinct(col("tok"), 0.02).as("approx_vocab"),
        percentile_approx(col("n_chars"), lit(0.5), lit(1000)).as("p50_chars"),
        percentile_approx(col("n_chars"), lit(0.95), lit(1000)).as("p95_chars"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sketch_stats" -> (sketchStats _),
    "token_count" -> (tokenCount _),
    "lang_stats" -> (langStats _),
    "quality_score" -> (qualityScore _),
    "fingerprint" -> (fingerprint _)
  )

  val oracles: Map[String, String] = Map(
    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |  CAST(length(text) AS INT) AS n_chars_calc
        |FROM documents ORDER BY doc_id""".stripMargin,
    "lang_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
        |  CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "quality_score" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_tokens,
        |  CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) AS INT) AS n_stop,
        |  CAST(round(CAST(len(list_filter(ws, w -> w = 'the' OR w = 'a')) AS DOUBLE) * 10000 / len(ws)) AS BIGINT) AS stop_ratio_e4,
        |  CAST(round(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) * 10000 / len(ws)) AS BIGINT) AS avg_tok_len_e4,
        |  CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS INT) AS n_vowels
        |FROM t ORDER BY doc_id""".stripMargin,
    "fingerprint" ->
      """SELECT doc_id,
        |  substring(sha256(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 16) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
