package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Distributed BPE learn + encode against the hand-computed reference
  * sequence for the classic Sennrich corpus
  * {low:5, lower:2, newest:6, widest:3}. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def corpus = Seq(
    (1L, ("low " * 5).trim),
    (2L, ("lower " * 2).trim),
    (3L, ("newest " * 6).trim),
    (4L, ("widest " * 3).trim)).toDF("doc_id", "text")

  // reference merge sequence (count desc, lexicographic tie-break),
  // verified by hand + an independent single-node implementation
  private val expected = Seq(
    ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"), ("low", "</w>"),
    ("d", "est</w>"))

  test("learn reproduces the reference merge sequence deterministically") {
    assert(Bpe.learn(corpus, 10) == expected)
    // stable under repartitioning — the tie-break is a total order
    assert(Bpe.learn(corpus.repartition(7), 10) == expected)
  }

  test("learn stops early when no pair remains") {
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val m = Bpe.learn(tiny, 100)
    // a+b, ab+</w>: after that the word is one symbol
    assert(m == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encode applies lowest-rank merges greedily, leftmost first") {
    val merges = Bpe.learn(corpus, 10)
    val got = Bpe.encode(
      Seq((1L, "lowest newer wider low")).toDF("doc_id", "text"), merges)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(got == Seq(
      "low", "est</w>",                      // lowest
      "n", "ew", "e", "r", "</w>",           // newer
      "w", "i", "d", "e", "r", "</w>",       // wider
      "low</w>"))                            // low
  }

  test("encode handles empty text, extra whitespace, and codepoints") {
    val merges = Seq(("a", "b"))
    def enc(s: String) = Bpe.encode(
      Seq((1L, s)).toDF("doc_id", "text"), merges)
      .select("bpe_tokens").head().getSeq[String](0)
    assert(enc("") == Seq.empty)
    assert(enc("  ab   AB  ") == Seq("ab", "</w>", "ab", "</w>"))
    // supplementary codepoint stays one symbol (no surrogate split)
    assert(enc("a😀b") ==
      Seq("a", "😀", "b", "</w>"))
  }

  test("merge table round-trips through save/load, rank order intact") {
    val merges = Bpe.learn(corpus, 10)
    val path = s"${java.nio.file.Files.createTempDirectory("bpe").toString}/m"
    Bpe.saveMerges(spark, merges, path)
    assert(Bpe.loadMerges(spark, path) == merges)
    // loaded table encodes identically
    val probe = Seq((1L, "lowest")).toDF("doc_id", "text")
    assert(Bpe.encode(probe, Bpe.loadMerges(spark, path))
      .select("bpe_tokens").head().getSeq[String](0) ==
      Seq("low", "est</w>"))
  }

  test("encode runs map-only over the real documents table") {
    val docs = graft.Engine.table(spark, "/root/testdata/sf0.001",
      "documents").limit(200)
    val merges = Bpe.learn(docs, 16)
    assert(merges.size == 16)
    val enc = Bpe.encode(docs, merges)
    // no exchange in the encode projection (scale: pure map)
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"encode must be map-only, got:\n$plan")
    val n = enc.agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(n > 0)
    // round-trip sanity: detokenizing reproduces the normalized text
    val rt = enc.select(col("text"), concat_ws("", col("bpe_tokens")))
      .head()
    val norm = rt.getString(0).toLowerCase.split("\\s+")
      .filter(_.nonEmpty).map(_ + "</w>").mkString("")
    assert(rt.getString(1) == norm)
  }
}
