package graft

import org.apache.spark.sql.functions._
import graft.functions.SimHash64
import graft.operators.TextOps

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat. it is a cat!"),
    (1L, "zzz qqq xyz"),
    (2L, ""))
    .toDF("doc_id", "text")

  test("native kernels reject mistyped input at analysis time") {
    import graft.functions.{Winnow, SimHash64, MinHashSig, WordShingles,
      HyperplaneLSH}
    val ids = spark.range(3).toDF("id") // bigint column
    def analysisFails(mk: => org.apache.spark.sql.DataFrame,
        frag: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        mk.queryExecution.analyzed
      }
      assert(e.getMessage.toLowerCase.contains(frag),
        s"message should name the expected type: ${e.getMessage}")
    }
    analysisFails(ids.select(Winnow.winnow(col("id"))), "string")
    analysisFails(ids.select(SimHash64.simhash64(col("id"))),
      "array<string>")
    analysisFails(ids.select(MinHashSig.minhashSig(col("id"), 16)),
      "array<string>")
    analysisFails(ids.select(WordShingles.wordShingles(col("id"), 3)),
      "array<string>")
    analysisFails(ids.select(
      HyperplaneLSH.hyperplaneLsh(col("id"), 8, 16, 42L)), "array<float>")
  }

  test("tokenStats counts chars / ws tokens / words / uniques") {
    val r = TextOps.tokenStats(docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 36)            // len_chars
    assert(r(0).getLong(2) == 10)            // ws tokens
    assert(r(0).getLong(3) == 10)            // word tokens
    assert(r(0).getLong(4) == 8)             // unique: the,cat,sat,on,mat,it,is,a
    assert(r(2).getLong(3) == 0)             // empty text -> 0 words
  }

  test("qualityScore: stopword-rich text passes, junk fails") {
    val r = TextOps.qualityScore(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Boolean]("passes_quality"))
    assert(!r(1).getAs[Boolean]("passes_quality"))
    assert(r(0).getAs[Long]("punct_cnt") == 2)
    assert(r(0).getAs[Double]("stop_ratio") > 0.3)
  }

  test("langId: english detected via stopwords, junk unknown") {
    val r = TextOps.langId(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[String]("pred_lang") == "en")
    assert(r(1).getAs[String]("pred_lang") == "unknown")
  }

  test("langId: non-ascii text routed to other") {
    val zh = Seq((0L, "这是一个中文文档 的 测试")).toDF("doc_id", "text")
    assert(TextOps.langId(zh).head().getAs[String]("pred_lang") == "other")
  }

  test("winnow: shared chunk guarantees a shared fingerprint; disjoint texts share none") {
    import spark.implicits._
    val chunk = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"AAAA unrelated prefix text $chunk and some suffix here"),
      (2L, s"completely different opening. $chunk ZZZZ tail content"),
      (3L, "nothing in common with the others at all, plain filler"))
      .toDF("doc_id", "text")
    val fps = graft.operators.TextOps.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toSet).toMap
    // winnowing guarantee: a shared run of >= w+k-1 chars (here ~50)
    // must produce at least one common fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty, "shared chunk must be detected")
    assert((fps(1L) & fps(3L)).isEmpty && (fps(2L) & fps(3L)).isEmpty,
      "disjoint documents must not collide")
    // determinism
    val again = graft.operators.TextOps.winnowFingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(fps == again)
  }

  test("partialOverlapPairs finds the copy-paste pair only") {
    import spark.implicits._
    val chunk = "copied boilerplate segment that appears in two documents verbatim"
    // doc 3 shares no 8-char run with the others (k=8 grams are the
    // fingerprint unit, so any shared common word would count — as it
    // should for real boilerplate detection)
    val docs = Seq(
      (1L, s"first original content. $chunk end one"),
      (2L, s"second with other words. $chunk end two"),
      (3L, "zyx wvu tsr qpo nml kji hgf edc ba9 87 65 43 21 0z yx wv"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.partialOverlapPairs(docs, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("partialOverlapPairs: corpus-wide boilerplate is capped out by maxDf") {
    import spark.implicits._
    val boiler = "standard legal disclaimer attached to every document in the corpus"
    val docs = (1L to 8L).map(i =>
      (i, s"unique${i}a unique${i}b unique${i}c $boiler")).toDF("doc_id", "text")
    // the boilerplate's INTERIOR winnow minima are identical across all
    // 8 docs (df=8 > maxDf → dropped); only a handful of
    // boundary-context fingerprints survive, so the all-pairs clique
    // (28 pairs) collapses and minShared=2 removes the rest entirely
    assert(graft.operators.Dedup.partialOverlapPairs(docs,
      minShared = 2, maxDf = 4).count() == 0,
      "boilerplate-only overlap must be capped out")
    val uncapped = graft.operators.Dedup.partialOverlapPairs(docs,
      minShared = 2, maxDf = 100).count()
    assert(uncapped == 28, s"without the cap the full clique appears: $uncapped")
  }

  test("fingerprint is md5 and stable") {
    val fp = TextOps.fingerprint(docs).filter($"doc_id" === 0)
      .select("fp").head().getString(0)
    assert(fp == java.security.MessageDigest.getInstance("MD5")
      .digest("the cat sat on the mat. it is a cat!".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  test("SimHash64: deterministic, order-insensitive-ish, discriminative") {
    val df = Seq(
      (0L, Seq("alpha", "beta", "gamma", "delta")),
      (1L, Seq("alpha", "beta", "gamma", "delta")),
      (2L, Seq("alpha", "beta", "gamma", "epsilon")),
      (3L, Seq("nothing", "shared", "with", "others", "at", "all")))
      .toDF("id", "toks")
      .select(col("id"), SimHash64.simhash64(col("toks")).as("h"))
    val h = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(0L) == h(1L), "same tokens must produce same simhash")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0L), h(2L)) < ham(h(0L), h(3L)),
      "near tokens should be closer than unrelated tokens")
  }

  test("SimHash64 survives codegen and interpreted paths identically") {
    val df = Seq(Tuple1(Seq("a", "b", "c"))).toDF("toks")
    val viaExpr = df.select(SimHash64.simhash64(col("toks"))).head().getLong(0)
    val direct = {
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.unsafe.types.UTF8String
      SimHash64.simhash(ArrayData.toArrayData(
        Array("a", "b", "c").map(UTF8String.fromString)))
    }
    assert(viaExpr == direct)
  }

  test("KgramFingerprints: rolling equals direct, boundaries distinct, " +
      "equal windows collide across docs") {
    import graft.functions.KgramFingerprints.kgramFingerprints
    def fps(toks: Seq[String], k: Int): Seq[Seq[Byte]] =
      Seq(Tuple1(toks)).toDF("w")
        .select(kgramFingerprints(col("w"), k).as("g")).head()
        .getSeq[Array[Byte]](0).map(_.toSeq)
    // identical k-windows (any doc, any offset) fingerprint identically
    val a = fps(Seq("x", "a", "b", "c", "y"), 3)
    val b = fps(Seq("p", "q", "a", "b", "c"), 3)
    assert(a(1) == b(2), "same window must collide at any offset")
    // the ROLLED fingerprint equals the directly-initialized one: every
    // window of one doc must equal the FIRST window (never rolled) of
    // the doc starting there
    val doc = Seq("t0", "t1", "t2", "t3", "t4", "t5")
    val rolled = fps(doc, 3)
    doc.indices.dropRight(2).foreach { i =>
      assert(rolled(i) == fps(doc.drop(i), 3).head,
        s"rolled window $i diverges from direct initialization")
    }
    // token boundaries matter: ["ab","c"] vs ["a","bc"] (same joined
    // text) must NOT collide
    assert(fps(Seq("ab", "c"), 2).head != fps(Seq("a", "bc"), 2).head)
    // n < k yields empty; 16-byte keys
    assert(fps(Seq("a"), 2).isEmpty && a.head.size == 16)
  }

  test("DropByIndexJoin equals the array_contains filter form") {
    import graft.functions.DropByIndexJoin.dropByIndexJoin
    val df = Seq(
      (Seq("a", "b", "c", "d", "e"), Seq(0, 2, 4)),
      (Seq("a", "b"), Seq.empty[Int]),
      (Seq("a", "b"), Seq(0, 1)),
      (Seq.empty[String], Seq.empty[Int]),
      // duplicate + out-of-range removal indices are harmless
      (Seq("a", "b", "c"), Seq(1, 1, 7))).toDF("w", "rm")
    val both = df.select(
      dropByIndexJoin(col("w"), col("rm")).as("kernel"),
      array_join(filter(col("w"), (_, i) =>
        not(array_contains(col("rm"), i))), " ").as("lambda")).collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel='${r.getString(0)}' lambda='${r.getString(1)}'"))
  }

  test("NormalizeText: NFC composition, ROOT lowercase, ws collapse") {
    import graft.functions.NormalizeText.normText
    def norm(s: String): String =
      Seq(Tuple1(s)).toDF("t").select(normText(col("t"))).head.getString(0)
    // decomposed e + combining acute composes to the single codepoint
    val decomposed = "e\u0301cole"     // e + U+0301 combining acute
    val composed = "\u00e9cole"        // single precomposed codepoint
    assert(decomposed != composed && norm(decomposed) == composed)
    assert(norm(decomposed) == norm("ÉCOLE"),
      "NFC + lowercase must unify all forms of ÉCOLE")
    // whitespace runs collapse; leading/trailing trimmed
    assert(norm("  a \t\n b\r\n  ") == "a b")
    assert(norm("") == "" && norm("   ") == "")
    // lowercase is locale-independent (dotted capital I folds to i,
    // never the Turkish dotless ı)
    assert(norm("TITLE") == "title")
    // sql registration evaluates identically
    val viaSql = spark.sql(
      s"SELECT norm_text('  ÉCOLE  du\t monde ')").head.getString(0)
    assert(viaSql == "école du monde")
  }

  test("inverted-index maintenance: indexed BM25 equals the scan path " +
      "over the live corpus through insert/delete/update and compaction") {
    import spark.implicits._
    val docs = Engine.table(spark, sf, "documents")
    val base = docs.filter(col("doc_id") % 10 =!= 0) // hold some out
    val dir = tmpDir("invmaint")
    graft.operators.TextOps.buildInvertedIndex(base, dir)
    val terms = Seq("join", "scan", "filter")
    // CDC batch: insert the held-out docs, delete doc_id % 7 == 1,
    // update doc 3 to fresh text (delete + insert pair)
    val inserts = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text")).withColumn("change", lit("insert"))
    val deletes = base.filter(col("doc_id") % 7 === 1)
      .select(col("doc_id"), col("text")).withColumn("change", lit("delete"))
    val updDel = base.filter(col("doc_id") === 3)
      .select(col("doc_id"), col("text")).withColumn("change", lit("delete"))
    val updIns = Seq((3L, "join join scan filter join"))
      .toDF("doc_id", "text").withColumn("change", lit("insert"))
    graft.operators.TextOps.invertedIndexUpsert(spark, dir,
      inserts.unionByName(deletes).unionByName(updDel).unionByName(updIns))
    // crash-retry: rewind the commit point (as if the maintainer died
    // after writing the batch dirs but before the counter) and
    // re-deliver the same batch — the overwrite-idempotent layout must
    // converge to the same index, not double every posting and doc
    // length (BM25 scores below would shift if it did)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_maint/seq"), "0".getBytes("UTF-8"))
    graft.operators.TextOps.invertedIndexUpsert(spark, dir,
      inserts.unionByName(deletes).unionByName(updDel).unionByName(updIns))
    // the live corpus the index should now represent: base minus the
    // deletes minus the updated doc, plus ALL inserts (inserts that
    // also match the delete predicate were never deleted — they were
    // not in base; their insert survives its own batch tombstone)
    val live = docs
      .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 =!= 1 &&
        col("doc_id") =!= 3)
      .select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text")))
      .unionByName(Seq((3L, "join join scan filter join"))
        .toDF("doc_id", "text"))
    val expected = graft.operators.TextOps.bm25TopK(live, terms, k = 10)
    assertSameRows(graft.operators.TextOps.bm25TopKIndexed(
      spark, dir, terms, k = 10), expected)
    graft.operators.TextOps.invertedIndexCompact(spark, dir)
    assertSameRows(graft.operators.TextOps.bm25TopKIndexed(
      spark, dir, terms, k = 10), expected)
  }

  test("dedupSubstrings: shifted duplicate spans are removed at ANY " +
      "alignment (the case fixed-window dedupSpans provably misses); " +
      "first occurrence survives intact; sub-k docs untouched") {
    import spark.implicits._
    import graft.operators.TextOps
    val boiler = (1 to 10).map(i => s"b$i").mkString(" ") // 10 tokens
    def uniq(d: Int, n: Int) = (1 to n).map(i => s"u${d}_$i").mkString(" ")
    val docs = Seq(
      // doc 1: boilerplate at offset 0 — the corpus-FIRST occurrence
      (1L, s"$boiler ${uniq(1, 12)}"),
      // doc 2: the SAME boilerplate shifted by 3 tokens
      (2L, s"${uniq(2, 3)} $boiler ${uniq(2, 9).replace("u2_", "v2_")}"),
      // doc 3: shifted by 7 — a different alignment again
      (3L, s"${uniq(3, 7)} $boiler"),
      // doc 4: no duplication, shorter than k
      (4L, "w x y z"),
      // doc 5: internal self-repeat of an 8-token run
      (5L, {
        val run = (1 to 8).map(i => s"r$i").mkString(" ")
        s"$run ${uniq(5, 4)} $run"
      })).toDF("doc_id", "text")
    val out = TextOps.dedupSubstrings(docs, k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // doc 1 keeps everything (it IS the first occurrence)
    assert(out(1L)._2 == 0, s"first occurrence lost tokens: ${out(1L)}")
    assert(out(1L)._3.startsWith(boiler))
    // docs 2 and 3: exactly the 10 boilerplate tokens removed, the
    // unique remainder intact and in order
    assert(out(2L)._2 == 10, s"doc 2: ${out(2L)}")
    assert(!out(2L)._3.contains("b1") && out(2L)._3.contains("u2_3"))
    assert(out(3L)._2 == 10, s"doc 3: ${out(3L)}")
    assert(out(3L)._3 == uniq(3, 7))
    // doc 4: under k tokens, untouched
    assert(out(4L) == ((4L, 0L, "w x y z")))
    // doc 5: the second copy of the internal 8-token run removed
    assert(out(5L)._2 == 8, s"doc 5: ${out(5L)}")
    // CONTRAST: fixed non-overlapping 10-token windows MISS the
    // shifted copies (doc 2's boilerplate straddles two windows whose
    // contents match nothing in doc 1)
    val spans = TextOps.dedupSpans(docs, spanTokens = 10)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1) - r.getLong(2))).toMap // n_spans - n_kept = dropped
    assert(spans(2L) == 0L,
      "fixed windows unexpectedly caught the shifted copy — fixture broken")
    // plan discipline: first-occurrence selection is a partial agg,
    // never a window ranking over the fingerprint
    val plan = TextOps.dedupSubstrings(docs, k = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "dedupSubstrings must not rank fingerprints with a window function")
    // NULL text: 0 tokens / 0 removed / empty clean text — never the
    // size(null) = -1 artifact of the engine's ansi=false
    val dirty = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val sub = TextOps.dedupSubstrings(dirty, k = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(sub(2L) == ((0L, 0L, "")), s"null text: ${sub(2L)}")
    val sp = TextOps.dedupSpans(dirty, spanTokens = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(sp(2L) == ((0L, 0L, "")), s"null text spans: ${sp(2L)}")
  }

  test("dedupSubstrings: a mostly-duplicate LONG doc is linear, not a " +
      "straggler, and reduces to exactly its first period") {
    import spark.implicits._
    import graft.operators.TextOps
    // 25k tokens of which 99% are removals: a 250-token block repeated
    // 100 times. This is the operator's target input and the worst case
    // of both replaced forms — the O(n·k) md5-of-slice fingerprint HOF
    // and the O(n·|rm|) array_contains reassembly (|rm| ≈ n makes the
    // latter ~6e8 interpreted probes for THIS ONE ROW). The fused
    // kernels are O(n); the generous wall bound separates the regimes
    // by an order of magnitude without being load-flaky.
    val block = (1 to 250).map(i => s"blk$i").mkString(" ")
    val longDoc = Array.fill(100)(block).mkString(" ") // 25k tokens
    val docs = ((1L, longDoc) +: (2L to 40L).map(d =>
      d -> (1 to 50).map(i => s"d${d}_$i").mkString(" "))).toDF("doc_id", "text")
    val t0 = System.nanoTime()
    val out = TextOps.dedupSubstrings(docs, k = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val sec = (System.nanoTime() - t0) / 1e9
    // every window at start >= 250 duplicates the window one period
    // earlier, so positions 250..24999 are covered: the clean text is
    // exactly the first block
    assert(out(1L)._1 == 25000L && out(1L)._2 == 24750L, s"${out(1L)._2}")
    assert(out(1L)._3 == block, "clean text must be exactly one period")
    (2L to 40L).foreach(d => assert(out(d)._2 == 0L, s"doc $d lost tokens"))
    assert(sec < 30.0, f"mostly-duplicate long doc straggled: $sec%.1fs")
  }

  test("ngramLmScore: closed-form NLL on a hand-computed bigram LM") {
    import spark.implicits._
    val train = Seq((100L, "a b a b")).toDF("doc_id", "text")
    // LM: c12(a b)=2, c12(b a)=1, c1(a)=2, c1(b)=1, V=2
    val score = Seq(
      (0L, "a b"),   // seen: pq=floor(1e9*3/4)=750000000 -> nll 477
      (1L, "b b"),   // oov:  pq=floor(1e9*1/3)=333333333 -> nll 1660
      (2L, "a"),     // <2 tokens: all zeros
      (3L, "a b a b a b"))  // fluent: 3*(a b)@477 + 2*(b a)@?
      .toDF("doc_id", "text")
    val out = TextOps.ngramLmScore(score, train)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(0L) == ((1L, 0L, 477L)), out(0L).toString)
    assert(out(1L) == ((1L, 1L, 1660L)), out(1L).toString)
    assert(out(2L) == ((0L, 0L, 0L)), out(2L).toString)
    // (b a): pq=floor(1e9*2/3)=666666666, k=29,
    // mant=floor(666666666*1024/2^29)-1024=247, l2q=29943, nll=636
    assert(out(3L) == ((5L, 0L, 3L * 477L + 2L * 636L)), out(3L).toString)
    // the quality-filter property: garbage scores higher per-bigram NLL
    assert(out(1L)._3 > out(0L)._3)
  }
}
