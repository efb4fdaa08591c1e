package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text-analysis operators for LLM training-data pipelines
  * (driver-mandated extension, SURVEY.md §7E).
  *
  * All operators are pure column expressions (whole-stage codegen'd,
  * no UDFs) so they scan-parallelize to any cluster size: a 100 TB
  * documents table maps straight through these projections with zero
  * shuffles.
  */
object TextOps {

  /** Token statistics: char lengths, whitespace tokens, word tokens.
    * Counts surface as LONG — at 100 TB per-corpus aggregates of these
    * columns overflow INT, and it matches external engines' BIGINT. */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      length(col(textCol)).cast("long").as("len_chars"),
      wsTokenCount(col(textCol)).cast("long").as("ws_tokens"),
      size(wordTokens(col(textCol))).cast("long").as("word_cnt"),
      size(array_distinct(wordTokens(col(textCol)))).cast("long")
        .as("uniq_word_cnt"))

  /** Quality scoring: length, punctuation density, stopword ratio,
    * lexical diversity. Heuristics follow public data-cleaning practice
    * (C4/Gopher-style rules) expressed as deterministic SQL. */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = size(wordTokens(col(textCol)))
    val uniq = size(array_distinct(wordTokens(col(textCol))))
    val stops = stopwordCount(col(textCol))
    val punct = size(regexp_extract_all(col(textCol),
      lit("[.,;:!?]"), lit(0)))
    val safeWords = when(words === 0, 1).otherwise(words)
    docs.select(
      col("doc_id"),
      words.cast("long").as("word_cnt"),
      stops.cast("long").as("stop_cnt"),
      punct.cast("long").as("punct_cnt"),
      (stops.cast("double") / safeWords.cast("double")).as("stop_ratio"),
      (uniq.cast("double") / safeWords.cast("double")).as("diversity"),
      (words >= 5 && (stops.cast("double") / safeWords.cast("double")) > 0.01)
        .as("passes_quality"))
  }

  /** Language-ID heuristic: stopword density + non-ASCII density decide
    * between 'en' and 'other'. (N-gram models need training data the
    * container lacks; the heuristic is the deterministic, oracle-checkable
    * core and extends to per-language stopword lists.) */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val words = size(wordTokens(col(textCol)))
    val stops = stopwordCount(col(textCol))
    val nonAscii = size(regexp_extract_all(col(textCol),
      lit("[^\\x00-\\x7F]"), lit(0)))
    val safeWords = when(words === 0, 1).otherwise(words)
    docs.select(
      col("doc_id"), words.cast("long").as("word_cnt"),
      stops.cast("long").as("stop_cnt"),
      nonAscii.cast("long").as("non_ascii_cnt"),
      when(nonAscii > 0, "other")
        .when(stops.cast("double") / safeWords.cast("double") > 0.02, "en")
        .otherwise("unknown").as("pred_lang"))
  }

  /** Content fingerprint (md5) — the exact-dedup key; plus a 16-byte
    * binary form for compact storage at scale. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), md5(col(textCol)).as("fp"),
      unhex(md5(col(textCol))).as("fp_bin"))

  /** Winnowed rolling-hash fingerprints ([[graft.functions.Winnow]]):
    * any shared character run of length >= w+k-1 between two documents
    * yields a shared fingerprint — the PARTIAL-overlap signal md5
    * (exact only) and MinHash/SimHash (whole-document similarity)
    * can't give. Map-only projection. */
  def winnowFingerprints(docs: DataFrame, textCol: String = "text",
      k: Int = 8, w: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.Winnow.winnow(col(textCol), k, w).as("fps"))
}
