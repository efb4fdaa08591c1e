package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary learning and encoding —
  * the subword tokenizer step of a training-data pipeline (public
  * algorithm: Sennrich, Haddow & Birch 2016, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL).
  *
  * Scale shape:
  *  - [[learn]] first collapses the corpus to a WORD-FREQUENCY table
  *    (one shuffle over the corpus — the only data-proportional step;
  *    the table is bounded by the language's vocabulary, not corpus
  *    size). Each merge iteration then runs two bounded jobs on that
  *    small table: an adjacent-pair partial-aggregated count and a
  *    map-side merge application. 100 TB of text and 10 GB of text
  *    learn on the same ~1M-row table after the first shuffle.
  *  - [[bpeTokens]] (encode) is a map-only native Catalyst expression
  *    over the corpus — the learned merge ranks ride the expression
  *    (serialized once per task, not per row), so the hot path is one
  *    codegen'd projection with zero shuffles.
  *
  * Determinism (what makes the planted oracle exact): ties on pair
  * count break to the lexicographically smallest (left, right) pair,
  * and encoding greedily applies the LOWEST-rank merge first, leftmost
  * occurrence first — both total orders, so the merge sequence and
  * every encoding are unique for a given corpus.
  */
object Bpe {

  /** End-of-word sentinel appended as its own symbol (Sennrich's
    * `</w>`): lets the tokenizer distinguish "est" mid-word from
    * "est" word-finally, and makes detokenization lossless. */
  val EndOfWord = "</w>"

  /** Lowercased whitespace word-frequency table: `word, cnt`. The one
    * corpus-wide shuffle (partial-aggregated groupBy). */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Learn `numMerges` BPE merge rules from the corpus. Returns the
    * ranked merge list, best first. */
  def learn(docs: DataFrame, numMerges: Int,
      textCol: String = "text"): Seq[(String, String)] =
    learnFromCounts(wordCounts(docs, textCol), numMerges)

  /** Learn from a precomputed `word, cnt` table (the shape a 100 TB
    * pipeline snapshots anyway). Iterations mutate only the bounded
    * vocab table; lineage is cut with an eager localCheckpoint every
    * few rounds so a deep merge sequence doesn't stack plans.
    *
    * Honest cost model: each merge is ONE sequential round trip (a
    * pair-count aggregate + a map over the vocab table) — inherent to
    * BPE, whose merges are defined recursively. A production 32k-merge
    * vocabulary is therefore 32k SMALL jobs on a ~1M-row table, not
    * 32k corpus passes; pipelines that find even that too slow learn
    * on a word-table snapshot of a corpus SAMPLE (statistically
    * equivalent for frequent pairs) and this API accepts exactly that:
    * pass `wordCounts(sample)` here, then [[bpeTokens]] — which is
    * corpus-scale and map-only — encodes everything. */
  def learnFromCounts(words: DataFrame, numMerges: Int): Seq[(String, String)] = {
    val mergeOne = udf((syms: Seq[String], a: String, b: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    })
    // word -> its symbol sequence: one CODEPOINT per symbol (surrogate
    // pairs stay whole, matching the encoder) plus the end-of-word
    // sentinel; UDF is fine here — this runs on the bounded vocab
    // table, not the corpus
    val charSplit = udf((w: String) => {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        out += w.substring(i, i + n); i += n
      }
      out += EndOfWord
      out.toSeq
    })
    var vocab = words.select(
      charSplit(col("word")).as("syms"),
      col("cnt").cast("long").as("cnt"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    var it = 0
    while (it < numMerges && !exhausted) {
      val best = vocab
        .filter(size(col("syms")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"),
          col("cnt"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(desc("total"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += ((a, b))
        vocab = vocab.select(
          mergeOne(col("syms"), lit(a), lit(b)).as("syms"), col("cnt"))
        if ((it + 1) % 8 == 0) vocab = vocab.localCheckpoint(true)
        it += 1
      }
    }
    merges.toSeq
  }

  /** Map-only BPE encode of a text column with a learned merge list:
    * lowercase, whitespace-split, then per word greedily apply the
    * lowest-rank merge (leftmost first) until none applies. Returns
    * `array<string>` of subword tokens. Native expression — stays in
    * whole-stage codegen ([[graft.functions.BpeEncode]]). */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    graft.functions.BpeEncode.bpeEncode(lower(text), merges)

  /** Encode + per-document token count/ids in one projection — the
    * corpus-wide tokenization pass. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text"): DataFrame =
    docs.withColumn("bpe_tokens", bpeTokens(col(textCol), merges))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))

  /** Persist a learned merge table (`rank, left, right` parquet) so
    * the tokenizer learned once is reusable across jobs/sessions —
    * the vocab artifact every training pipeline ships alongside its
    * data. Round-trips exactly through [[loadMerges]]. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[(String, String)], path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a merge table saved by [[saveMerges]], rank order restored. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
}
