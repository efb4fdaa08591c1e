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
      passesQualityCol(col(textCol)).as("passes_quality"))
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
      predLangCol(col(textCol)).as("pred_lang"))
  }

  /** BPE-style pre-tokenizer count: the GPT-2 pre-tokenization
    * pattern family (contractions, letter runs, digit runs, punct
    * runs, whitespace) restricted to RE2-compatible syntax (no
    * lookahead) so external engines can evaluate the IDENTICAL
    * pattern. This is the practical "how many tokens will the BPE
    * merge step see" estimator a corpus-budgeting pipeline runs at
    * scale — a pure projection, one regex pass per row. */
  val bpePretokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePretokenPattern), lit(0)))

  /** Per-document BPE-ish token budget next to the exact char/word
    * counts ([[tokenStats]] keeps its original narrower schema). */
  def tokenBudget(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      length(col(textCol)).cast("long").as("len_chars"),
      bpeTokenCount(col(textCol)).cast("long").as("bpe_tokens"),
      when(length(col(textCol)) === 0, 0.0)
        .otherwise(length(col(textCol)).cast("double") /
          greatest(bpeTokenCount(col(textCol)), lit(1)).cast("double"))
        .as("chars_per_token"))

  /** The quality-gate predicate shared by [[qualityScore]] and
    * [[cleanCorpus]]. */
  private[operators] def passesQualityCol(textCol: Column): Column = {
    val words = size(wordTokens(textCol))
    val safeWords = when(words === 0, 1).otherwise(words)
    words >= 5 &&
      (stopwordCount(textCol).cast("double") /
        safeWords.cast("double")) > 0.01
  }

  /** The language prediction shared by [[langId]] and [[cleanCorpus]]. */
  private[operators] def predLangCol(textCol: Column): Column = {
    val words = size(wordTokens(textCol))
    val safeWords = when(words === 0, 1).otherwise(words)
    val nonAscii = size(regexp_extract_all(textCol,
      lit("[^\\x00-\\x7F]"), lit(0)))
    when(nonAscii > 0, "other")
      .when(stopwordCount(textCol).cast("double") /
        safeWords.cast("double") > 0.02, "en")
      .otherwise("unknown")
  }

  /** End-to-end corpus cleaning — the composed pipeline a training-data
    * job actually runs: quality gate → language filter → exact dedup
    * keeping the smallest doc_id per identical text. Plan shape: the
    * gates are pure filters fused into the scan (no shuffle, no join —
    * the predicates re-derive the same expressions the per-doc scoring
    * operators project), so the whole pipeline costs exactly ONE
    * shuffle: the dedup's 16-byte-fingerprint exchange. */
  def cleanCorpus(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", keepLang: String = "en"): DataFrame =
    Dedup.exactDedup(
      docs.filter(passesQualityCol(col(textCol)) &&
        predLangCol(col(textCol)) === keepLang),
      textCol, idCol)

  /** Content fingerprint (md5) — the exact-dedup key; plus a 16-byte
    * binary form for compact storage at scale. */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), md5(col(textCol)).as("fp"),
      unhex(md5(col(textCol))).as("fp_bin"))

  /** Benchmark decontamination: flag documents sharing any word
    * `k`-shingle with an evaluation/benchmark set, with the overlap
    * count as evidence (the standard pre-training hygiene step — eval
    * questions leaking into the corpus inflate downstream scores).
    *
    * Scale shape: the benchmark's distinct shingle set is small (eval
    * suites are MBs, corpora are TBs) → broadcast it; the corpus side
    * is an explode + broadcast-hash semi-ish join + one groupBy on
    * doc_id, so the 100 TB side never shuffles its text — only
    * (doc_id, matched-shingle) pairs reach the aggregation. */
  def contaminationFlags(docs: DataFrame, bench: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      k: Int = 3): DataFrame = {
    val dSh = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.wordShingles(col(textCol), k)).as("sh"))
    val bSh = bench
      .select(explode(Dedup.wordShingles(col(textCol), k)).as("sh"))
      .distinct()
    dSh.join(broadcast(bSh), Seq("sh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
  }

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
