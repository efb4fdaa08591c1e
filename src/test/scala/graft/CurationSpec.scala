package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextOps}

/** Round-4 curation operators: repetition stats, BM25 retrieval,
  * vocabulary-coverage scoring, sequence packing, mixture sampling.
  * Conformance vs DuckDB is covered by CurationQueries; these tests pin
  * the semantics on crafted inputs and the scale-critical invariants
  * (partitioning-independence of the two-phase prefix sum). */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  // ---------------------------------------------------- repetition stats

  test("repetitionStats: looping text scores high, varied text low") {
    val docs = Seq(
      (1L, "spam spam spam spam spam"), // one bigram repeated 4x
      (2L, "one two three four five"),  // all bigrams distinct
      (3L, "x"),                        // no bigrams
      (4L, "")                          // no tokens
    ).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs).collect()
      .map(x => x.getLong(0) -> x).toMap

    assert(r(1L).getLong(2) == 4 && r(1L).getLong(3) == 4) // n_bigrams, top
    assert(r(1L).getDouble(5) == 1.0 && r(1L).getDouble(6) == 1.0)
    assert(r(2L).getLong(2) == 4 && r(2L).getLong(3) == 1)
    assert(r(2L).getDouble(6) == 0.0) // nothing duplicated
    assert(r(3L).getLong(2) == 0 && r(3L).getDouble(5) == 0.0)
    assert(r(4L).getLong(1) == 0 && r(4L).getLong(2) == 0)
    assert(r.size == 4) // bigram-less docs are kept, not dropped
  }

  test("repetitionStats: partial repetition fractions are exact") {
    // tokens: a b a b c -> bigrams: "a b","b a","a b","b c"
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(docs).collect()(0)
    assert(r.getLong(2) == 4)          // n_bigrams
    assert(r.getLong(3) == 2)          // top: "a b" twice
    assert(r.getLong(4) == 2)          // dup mass: the two "a b"
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.5)
  }

  // --------------------------------------------------------------- BM25

  test("bm25TopK: term-dense short doc outranks diluted long doc") {
    val docs = Seq(
      (1L, "needle needle needle"),
      (2L, "needle " + Seq.fill(200)("straw").mkString(" ")),
      (3L, "straw straw straw straw"),
      (4L, "hay bale")
    ).toDF("doc_id", "text")
    val top = TextOps.bm25TopK(docs, Seq("needle"), k = 2).collect()
    assert(top.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(top(0).getDouble(2) > top(1).getDouble(2))
  }

  test("bm25TopK: multi-term match beats single-term match") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha delta epsilon"),
      (3L, "zeta eta theta")
    ).toDF("doc_id", "text")
    val top = TextOps.bm25TopK(docs, Seq("alpha", "beta"), k = 3).collect()
    assert(top(0).getLong(0) == 1L)      // matches both terms
    assert(top(0).getLong(1) == 2L)      // n_terms
    assert(top.length == 2)              // doc 3 matches nothing
  }

  // ------------------------------------------------------ vocab coverage

  test("commonTokenRatio: ratio is in-vocab fraction; empty doc is 0") {
    // corpus vocab top-2 = {a, b} (a:4, b:3, c:1, d:1)
    val docs = Seq(
      (1L, "a a b c"), (2L, "a a b b d"), (3L, "")
    ).toDF("doc_id", "text")
    val r = TextOps.commonTokenRatio(docs, topN = 2).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(2) == 3 && r(1L).getDouble(3) == 0.75)
    assert(r(2L).getLong(2) == 4 && r(2L).getDouble(3) == 0.8)
    assert(r(3L).getLong(1) == 0 && r(3L).getDouble(3) == 0.0)
  }

  test("commonTokenRatio: precomputed vocab skips the eager corpus job " +
      "and pins the score definition") {
    val docs = Seq((1L, "a a b c"), (2L, "x y")).toDF("doc_id", "text")
    val r = TextOps.commonTokenRatio(docs, topN = 999,
        vocab = Some(Seq("a", "b")))
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) == 0.75 && r(2L) == 0.0, r.toString)
  }

  test("TokenSetCount: structurally identical expressions are equal " +
      "(Seq field, not Array) so CSE/exchange reuse can fire") {
    import org.apache.spark.sql.graft.Bridge
    val c = Bridge.expression(split(col("text"), " "))
    val a = graft.functions.TokenSetCount(c, Seq("a", "b"))
    val b = graft.functions.TokenSetCount(c, Seq("a", "b"))
    assert(a == b, "value equality")
    assert(a.canonicalized == b.canonicalized, "canonicalization")
    assert(a.semanticEquals(b), "semantic equality")
  }

  // ----------------------------------------------------- sequence packing

  test("packSequences: offsets are the exclusive prefix sum in id order") {
    val docs = (1L to 50L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("w")
      .mkString(" "))).toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, seqLen = 10, buckets = 4)
      .orderBy("doc_id").collect()
    var expected = 0L
    out.foreach { r =>
      assert(r.getLong(2) == expected,
        s"doc ${r.getLong(0)}: offset ${r.getLong(2)} != $expected")
      assert(r.getLong(3) == r.getLong(2) / 10)
      assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 10)
      expected += r.getLong(1)
    }
  }

  test("packSequences: result is independent of input partitioning") {
    val docs = (1L to 200L).map(i =>
      (i, Seq.fill((i % 13 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val a = TextOps.packSequences(docs.repartition(17), seqLen = 64)
      .orderBy("doc_id").collect().map(_.toString)
    val b = TextOps.packSequences(docs.coalesce(1), seqLen = 64,
        buckets = 3)
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("packSequences: sparse non-contiguous ids still pack densely") {
    val docs = Seq((5L, "a b c"), (1000L, "d e"), (70000L, "f"))
      .toDF("doc_id", "text")
    val out = TextOps.packSequences(docs, seqLen = 4, buckets = 8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(0L, 3L, 5L))
    assert(out.map(_.getLong(3)).toSeq == Seq(0L, 0L, 1L))
  }

  test("packSequences: non-integral or null ids fail fast, not NPE") {
    val strIds = Seq(("a", "x y"), ("b", "z")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      TextOps.packSequences(strIds, seqLen = 4)
    }
    assert(e1.getMessage.contains("integral id column"))

    val nullIds = Seq((java.lang.Long.valueOf(1L), "x"),
      (null.asInstanceOf[java.lang.Long], "y")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      TextOps.packSequences(nullIds, seqLen = 4)
    }
    assert(e2.getMessage.contains("nulls"))
  }

  // ------------------------------------------------------- quality gate

  test("qualityPercentileGate: the cut is per-domain — the same " +
      "diversity survives in one domain and not another") {
    // A diversities [.25, .5, .75, 1.0] -> p50 thr .625 (interpolated)
    // B diversities [.25, .5]           -> p50 thr .375
    val docs = Seq(
      (1L, "A", "a a a a"), (2L, "A", "a a b b"),
      (3L, "A", "a a b c"), (4L, "A", "a b c d"),
      (5L, "B", "a a a a"), (6L, "B", "a a b b")
    ).toDF("doc_id", "source", "text")
    val kept = TextOps.qualityPercentileGate(docs, p = 0.5)
      .collect().map(_.getLong(0)).toSet
    // diversity .5 is cut in A (thr .625) but kept in B (thr .375)
    assert(kept == Set(3L, 4L, 6L), s"got $kept")
  }

  // ---------------------------------------------------------- span dedup

  test("dedupSpans: repeated span kept at first occurrence only") {
    val docs = Seq(
      (1L, "a b c d"), // spans: "a b", "c d"
      (2L, "a b x y"), // "a b" seen in doc 1 -> dropped; "x y" first here
      (3L, "x y")      // "x y" seen in doc 2 -> doc empties
    ).toDF("doc_id", "text")
    val r = TextOps.dedupSpans(docs, spanTokens = 2)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 2 && r(0).getLong(2) == 2)
    assert(r(0).getString(3) == "a b c d")
    assert(r(1).getString(3) == "x y")
    assert(r(2).getLong(2) == 0 && r(2).getString(3) == "")
  }

  test("dedupSpans: surviving spans reassemble in document order") {
    val docs = Seq(
      (1L, "dup li cense"),       // spans(3): "dup li cense"
      (2L, "keep one two dup li cense keep three four")
    ).toDF("doc_id", "text")
    // doc 2 spans: "keep one two", "dup li cense"(dropped), "keep three four"
    val r = TextOps.dedupSpans(docs, spanTokens = 3)
      .orderBy("doc_id").collect()
    assert(r(1).getString(3) == "keep one two keep three four")
    assert(r(1).getLong(1) == 3 && r(1).getLong(2) == 2)
  }

  // --------------------------------------------------------- export shuffle

  test("shuffledOrder: deterministic permutation, partitioning-proof") {
    val docs = (1L to 100L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val a = Sampling.shuffledOrder(docs.repartition(13))
      .collect().map(_.getLong(0))
    val b = Sampling.shuffledOrder(docs.coalesce(1))
      .collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)          // same permutation any layout
    assert(a.sorted.toSeq == (1L to 100L)) // it IS a permutation
    assert(a.toSeq != (1L to 100L))     // and not the identity
    val c = Sampling.shuffledOrder(docs, salt = "epoch2")
      .collect().map(_.getLong(0))
    assert(c.toSeq != a.toSeq)          // fresh salt, fresh permutation
  }

  // ----------------------------------------------------- mixture sampling

  test("mixtureSample: weight 1 keeps all, weight 0 keeps none, " +
      "default applies to unlisted strata") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val out = Sampling.mixtureSample(docs, "source",
        Map("src0" -> 1.0, "src1" -> 0.0), defaultFrac = 0.5)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("src0") == 100)
    assert(!out.contains("src1"))
    val kept2 = out.getOrElse("src2", 0L)
    assert(kept2 > 25 && kept2 < 75, s"src2 kept $kept2 of 100 at 0.5")
  }

  test("mixtureSample: per-stratum samples are independent — changing " +
      "one weight never changes another stratum's rows") {
    val docs = (1L to 300L).map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    def keptIds(w: Map[String, Double]): Set[Long] =
      Sampling.mixtureSample(docs, "source", w, defaultFrac = 0.2)
        .filter(col("source") === "src2")
        .collect().map(_.getLong(0)).toSet
    assert(keptIds(Map("src0" -> 1.0)) == keptIds(Map("src0" -> 0.1)))
  }
}
