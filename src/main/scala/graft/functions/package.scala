package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column-level helpers shared across operators and queries.
  *
  * Money/measure arithmetic goes through exact DECIMAL accumulation and is
  * only converted back to DOUBLE at the end: double summation order varies
  * with partitioning, so a distributed double-sum is nondeterministic at
  * scale, while decimal sums are exact and reproducible on any cluster
  * size — and bitwise-comparable against an external oracle.
  */
package object functions {

  /** Exact 2-dp decimal view of a double measure (for sums). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-dp decimal view (for products like price*(1-discount)). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Deterministic double result of an exact decimal sum. */
  def dsum2(c: Column): Column = sum(dec2(c)).cast("double")
  def dsum4(c: Column): Column = sum(dec4(c)).cast("double")

  /** 12-dp decimal view and sum — for unit-scale quantities (model
    * residuals, weights) where 2/4 dp would bend the math but double
    * summation would be partition-order dependent. */
  def dec12(c: Column): Column = c.cast(DecimalType(30, 12))
  def dsum12(c: Column): Column = sum(dec12(c)).cast("double")

  /** Deterministic average: exact decimal sum cast to double, then one
    * double division — bitwise-reproducible (unlike a double sum). */
  def davg2(c: Column): Column =
    sum(dec2(c)).cast("double") / count(c)

  /** Dot product of two numeric-array embeddings, accumulated in
    * double. Native one-pass kernel ([[VectorSim]]) — sequential fold,
    * deterministic regardless of partitioning. */
  def dotProduct(a: Column, b: Column): Column = VectorSim.dot(a, b)

  /** L2 norm squared of a float-array embedding, in double. */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity between two embeddings; 0.0 for zero vectors.
    * Native one-pass kernel ([[VectorSim]]) — the lambda form cost
    * three interpreted (CodegenFallback) array traversals per row. */
  def cosineSimilarity(a: Column, b: Column): Column =
    VectorSim.cosine(a, b)

  /** Integer-quantized embedding (×1000, rounded): dot products and
    * norms over longs are EXACT, so similarity scores are bitwise
    * reproducible on any partitioning/engine — the property float sums
    * lack. Quantization error at 3 decimals is far below any useful
    * near-dup threshold. */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * 1000).cast("long"))

  /** Cosine similarity over quantized vectors (deterministic). Native
    * one-pass kernel with exact long accumulation ([[VectorSim]]). */
  def quantizedCosine(a: Column, b: Column): Column =
    VectorSim.quantizedCosine(a, b)

  /** Whitespace token count (cheap, codegen'd). */
  def wsTokenCount(text: Column): Column =
    size(split(text, " "))

  /** Word tokens: alphanumeric runs after lowercasing (BPE-ish
    * pre-tokenizer). Lowercasing first means "The cat" tokenizes to
    * `the, cat`, so capitalized English scores like lowercase English. */
  def wordTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Count of English stopword occurrences (language/quality signal).
    * Pattern kept RE2-compatible so the DuckDB oracle can share it;
    * applied to lowercased text so capitalized forms count. */
  val stopwordPattern = "\\b(the|a|an|of|to|and|in|is|it|that|for)\\b"

  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(stopwordPattern), lit(0)))

  /** Character k-shingles of a string as a distinct array. */
  def shingles(text: Column, k: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(text) - (k - 1), lit(1))),
      i => text.substr(i, lit(k))))
}
