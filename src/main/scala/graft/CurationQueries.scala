package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity, TextOps}

/** Round-4 corpus-curation conformance queries: repetition filtering,
  * BM25 keyword retrieval, vocabulary-coverage quality scoring,
  * sequence-packing layout, and domain-mixture resampling — the steps
  * between a deduplicated corpus and a training-ready token stream,
  * each oracle-checked against DuckDB.
  */
object CurationQueries {

  /** Shared DuckDB tokenization (mirrors [[graft.functions.wordTokens]]). */
  private val duckTok =
    """SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
       FROM documents"""

  /** Gopher-style repetition stats ([[TextOps.repetitionStats]]):
    * per-doc top-bigram and duplicated-bigram fractions. The oracle
    * recomputes the bigram multiset with list_transform/unnest. */
  val q_repetition_stats = QuerySpec(
    "q_repetition_stats", Seq("E-text"),
    (s, d) => TextOps.repetitionStats(Engine.table(s, d, "documents"))
      .orderBy("doc_id"),
    Some(s"""WITH tok AS ($duckTok),
             bg AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                      unnest(CASE WHEN len(w) >= 2
                        THEN list_transform(range(1, len(w)),
                               i -> w[i] || ' ' || w[i+1])
                        ELSE [CAST(NULL AS VARCHAR)] END) AS bg
                    FROM tok),
             c AS (SELECT doc_id, n_tokens, bg,
                     CAST(COUNT(*) AS BIGINT) AS cnt
                   FROM bg GROUP BY 1, 2, 3),
             a AS (SELECT doc_id, n_tokens,
                     CAST(SUM(CASE WHEN bg IS NOT NULL THEN cnt
                              ELSE 0 END) AS BIGINT) AS n_bigrams,
                     CAST(MAX(CASE WHEN bg IS NOT NULL THEN cnt
                              ELSE 0 END) AS BIGINT) AS top_cnt,
                     CAST(SUM(CASE WHEN bg IS NOT NULL AND cnt > 1 THEN cnt
                              ELSE 0 END) AS BIGINT) AS dup_cnt
                   FROM c GROUP BY 1, 2)
             SELECT doc_id, n_tokens, n_bigrams, top_cnt, dup_cnt,
               CASE WHEN n_bigrams = 0 THEN 0.0
                    ELSE CAST(top_cnt AS DOUBLE) /
                         CAST(n_bigrams AS DOUBLE) END AS top_bigram_frac,
               CASE WHEN n_bigrams = 0 THEN 0.0
                    ELSE CAST(dup_cnt AS DOUBLE) /
                         CAST(n_bigrams AS DOUBLE) END AS dup_bigram_frac
             FROM a ORDER BY doc_id"""))

  /** CCNet-style LM quality scoring ([[TextOps.ngramLmScore]]): an
    * add-one bigram LM trained on the even-doc_id half of the corpus
    * scores every document's negative log-likelihood. All arithmetic is
    * integer-exact (1e-9-units probabilities by BIGINT division,
    * Mitchell piecewise-linear log2 in 1/1024 units), so the oracle
    * replays the identical construction bit-for-bit — no floating `ln`
    * on either side. */
  val q_lm_score = QuerySpec(
    "q_lm_score", Seq("E-text", "A1", "J3"),
    (s, d) => {
      val docs = Engine.table(s, d, "documents")
      TextOps.ngramLmScore(docs, docs.filter(col("doc_id") % 2 === 0))
        .orderBy("doc_id")
    },
    Some(s"""WITH tok AS ($duckTok),
             tr AS (SELECT w FROM tok WHERE doc_id % 2 = 0),
             tb AS (SELECT unnest(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i+1])) AS bg
                    FROM tr WHERE len(w) >= 2),
             c12 AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12
                     FROM tb GROUP BY 1),
             c1 AS (SELECT split_part(bg, ' ', 1) AS w1,
                      CAST(SUM(c12) AS BIGINT) AS c1
                    FROM c12 GROUP BY 1),
             v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
                   FROM (SELECT unnest(w) AS t FROM tr)),
             db AS (SELECT doc_id, bg, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM (SELECT doc_id,
                            unnest(list_transform(range(1, len(w)),
                              i -> w[i] || ' ' || w[i+1])) AS bg
                          FROM tok WHERE len(w) >= 2)
                    GROUP BY 1, 2),
             pq AS (SELECT doc_id, tf, c12.c12,
                      greatest((1000000000 * (COALESCE(c12.c12, 0) + 1))
                               // (COALESCE(c1.c1, 0) + v.v), 1) AS pq
                    FROM db LEFT JOIN c12 USING (bg)
                            LEFT JOIN c1
                              ON split_part(db.bg, ' ', 1) = c1.w1, v),
             lg AS (SELECT doc_id, tf, c12,
                      (length(bin(pq)) - 1) * 1024
                      + CAST(floor(pq * 1024.0 /
                          power(2, length(bin(pq)) - 1)) AS BIGINT)
                      - 1024 AS l2q
                    FROM pq),
             sc AS (SELECT doc_id,
                      CAST(SUM(tf) AS BIGINT) AS n_bigrams,
                      CAST(SUM(CASE WHEN c12 IS NULL THEN tf ELSE 0 END)
                        AS BIGINT) AS oov_bigrams,
                      CAST(SUM(tf * (30579 - l2q)) AS BIGINT) AS nll_q1024
                    FROM lg GROUP BY 1)
             SELECT t.doc_id,
                    COALESCE(n_bigrams, 0) AS n_bigrams,
                    COALESCE(oov_bigrams, 0) AS oov_bigrams,
                    COALESCE(nll_q1024, 0) AS nll_q1024
             FROM tok t LEFT JOIN sc USING (doc_id) ORDER BY doc_id"""))

  private val bm25Terms = Seq("join", "scan", "filter")
  private val bm25K1 = 1.2
  private val bm25B = 0.75

  /** BM25 top-10 ([[TextOps.bm25TopK]]) for a fixed 3-term query. The
    * oracle evaluates the IDENTICAL log-free formula (constants
    * interpolated from the same Scala doubles, so both engines parse
    * the same literals) with the same fixed-order score addition. */
  private lazy val bm25OracleSql: String = bm25OracleSqlOver(duckTok)

  /** The BM25 oracle parameterized over the tokenized-corpus CTE, so
    * the index-maintenance query can aim the SAME scoring SQL at a
    * reconstructed live corpus. */
  private def bm25OracleSqlOver(tok: String, limit: Int = 10): String = {
      val inList = bm25Terms.map("'" + _ + "'").mkString(", ")
      val scoreSum = bm25Terms.map(t =>
        s"COALESCE(MAX(CASE WHEN token = '$t' THEN s END), 0.0)")
        .mkString(" +\n               ")
      s"""WITH base AS ($tok),
          dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM base),
          st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
          tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                 FROM (SELECT doc_id, unnest(w) AS token FROM base) x
                 WHERE token IN ($inList)
                 GROUP BY 1, 2),
          dft AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
                  FROM tf GROUP BY 1),
          s AS (SELECT tf.doc_id, tf.token,
                  (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
                  (CAST(df AS DOUBLE) + 0.5) *
                  (CAST(tf AS DOUBLE) * ${bm25K1 + 1.0}) /
                  (CAST(tf AS DOUBLE) + $bm25K1 * (${1.0 - bm25B} +
                    $bm25B * CAST(dl AS DOUBLE) /
                    (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS s
                FROM tf JOIN dl USING (doc_id)
                        JOIN dft USING (token), st)
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
               $scoreSum AS score
          FROM s GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT $limit"""
  }

  val q_bm25_topk = QuerySpec(
    "q_bm25_topk", Seq("E-text", "A12"),
    (s, d) => TextOps.bm25TopK(Engine.table(s, d, "documents"),
      bm25Terms, k = 10, k1 = bm25K1, b = bm25B),
    Some(bm25OracleSql))

  /** Hybrid retrieval via Reciprocal Rank Fusion
    * ([[Similarity.rrfFuse]]): a BM25 keyword top-20 and an
    * embedding-cosine top-20 (query = vec 0, ids linked doc_id=vec_id)
    * fused with the standard 1/(60+rank) recipe — the RAG-era hybrid
    * search every retrieval stack ships. Both legs are the
    * already-oracle-gated rankings (q_bm25_topk / q_embed_topk_
    * bruteforce); ranks are integers and RRF scores integer-quantized,
    * so the fused list is engine-exact. Each leg's rank comes from a
    * row_number over its own 20-row result — driver-sized, not a
    * corpus-wide sort. */
  val q_hybrid_rrf = QuerySpec(
    "q_hybrid_rrf", Seq("E-sim", "E-text", "A12", "U1"),
    (s, d) => {
      val docs = Engine.table(s, d, "documents")
      val emb = Engine.table(s, d, "embeddings")
      val r1 = TextOps.bm25TopK(docs, bm25Terms, k = 20,
          k1 = bm25K1, b = bm25B)
        .select(col("doc_id").as("id"), row_number().over(
          Window.orderBy(desc("score"), asc("doc_id"))).as("rank"))
      val r2 = TextQueries.embedTopKBruteforce(emb, 20)
        .select(col("vec_id").as("id"), row_number().over(
          Window.orderBy(desc("cos"), asc("vec_id"))).as("rank"))
      Similarity.rrfFuse(Seq(r1, r2), kConst = 60)
        .orderBy(desc("rrf_q"), asc("id"))
        .limit(10)
    },
    Some(s"""WITH r1 AS (SELECT doc_id AS id, row_number() OVER
                           (ORDER BY score DESC, doc_id) AS rank
                         FROM (${bm25OracleSqlOver(duckTok, 20)})),
             cs AS (SELECT * FROM (${TextQueries.duckEmbedTopKSql(20)})),
             r2 AS (SELECT vec_id AS id, row_number() OVER
                      (ORDER BY cos DESC, vec_id) AS rank FROM cs),
             u AS (SELECT id, 1000000000 // (60 + CAST(rank AS BIGINT)) AS rrf_q
                   FROM r1
                   UNION ALL
                   SELECT id, 1000000000 // (60 + CAST(rank AS BIGINT))
                   FROM r2)
             SELECT CAST(id AS BIGINT) AS id,
                    CAST(SUM(rrf_q) AS BIGINT) AS rrf_q,
                    CAST(COUNT(*) AS BIGINT) AS n_runs
             FROM u GROUP BY id ORDER BY rrf_q DESC, id LIMIT 10"""))

  /** Cache key for the persisted inverted index (same /tmp-persists-
    * across-rounds convention and versioning rule as the ANN index —
    * bump the suffix if the index layout or tokenizer changes). */
  private def invIndexDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_invidx_v1_" +
      d.replaceAll("[^A-Za-z0-9]", "_")

  /** Same BM25 query answered FROM the persisted inverted index
    * ([[TextOps.bm25TopKIndexed]]): reads only the query terms' shard
    * partitions, never the corpus — and must hash-match the SAME
    * oracle as the scan path (two paths, one truth). */
  val q_bm25_indexed = QuerySpec(
    "q_bm25_indexed", Seq("E-text", "A12", "S2"),
    (s, d) => {
      val dir = invIndexDir(d)
      if (!graft.operators.Similarity.isBuilt(dir, "invidx"))
        TextOps.buildInvertedIndex(Engine.table(s, d, "documents"), dir)
      TextOps.bm25TopKIndexed(s, dir, bm25Terms, k = 10,
        k1 = bm25K1, b = bm25B)
    },
    Some(bm25OracleSql))

  /** Updated text planted by the maintenance batch for doc 3. */
  private val maintUpdText = "join join scan filter join"

  /** Inverted-index CDC maintenance lifecycle, oracle-gated: build on
    * a subset, apply one insert/delete/update batch, query MAINTAINED
    * (tombstone-resolved), compact, query again — both phases must
    * equal DuckDB running the same BM25 over the reconstructed live
    * corpus. The index twin of q_embed_ivf_upsert. */
  val q_bm25_index_maint = QuerySpec(
    "q_bm25_index_maint", Seq("E-text", "A12", "S2"),
    (s, d) => {
      val docs = Engine.table(s, d, "documents")
      val dir = java.nio.file.Files
        .createTempDirectory("graft_invmaint").toString
      // 8 shards: this corpus has a ~31-token vocabulary, so 64
      // shards are mostly empty directories — the lifecycle (build,
      // upsert, two probes, compact) is bound by per-shard file ops.
      // Shard count scales with VOCABULARY, not corpus rows.
      TextOps.buildInvertedIndex(
        docs.filter(col("doc_id") % 10 =!= 0), dir, shards = 8)
      import s.implicits._
      val inserts = docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
        .withColumn("change", lit("insert"))
      val deletes = docs
        .filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 7 === 1)
        .select(col("doc_id"), col("text"))
        .withColumn("change", lit("delete"))
      val upd = docs.filter(col("doc_id") === 3)
        .select(col("doc_id"), col("text"))
        .withColumn("change", lit("delete"))
        .unionByName(Seq((3L, maintUpdText)).toDF("doc_id", "text")
          .withColumn("change", lit("insert")))
      TextOps.invertedIndexUpsert(s, dir,
        inserts.unionByName(deletes).unionByName(upd), shards = 8)
      val maintained = TextOps.bm25TopKIndexed(s, dir, bm25Terms,
          k = 10, k1 = bm25K1, b = bm25B, shards = 8)
        .withColumn("phase", lit("maintained")).collect()
      TextOps.invertedIndexCompact(s, dir)
      val compactedDf = TextOps.bm25TopKIndexed(s, dir, bm25Terms,
          k = 10, k1 = bm25K1, b = bm25B, shards = 8)
        .withColumn("phase", lit("compacted"))
      // both phases are k-row results: collect them and DELETE the
      // per-run temp index before returning (a lazy frame would still
      // read the dir) — Engine.collectAndClean, the lifecycle-query
      // contract; 85 dead index trees had accumulated over 12 rounds.
      Engine.collectAndClean(
        s.createDataFrame(
            s.sparkContext.parallelize(maintained.toSeq, 1),
            compactedDf.schema)
          .unionByName(compactedDf)
          .orderBy("phase", "doc_id"), dir)
    },
    Some {
      val liveTok =
        s"""SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
            FROM (SELECT doc_id, text FROM documents
                  WHERE NOT (doc_id % 10 <> 0 AND doc_id % 7 = 1)
                    AND doc_id <> 3
                  UNION ALL SELECT 3, '$maintUpdText') live"""
      s"""WITH one AS (${bm25OracleSqlOver(liveTok)})
          SELECT doc_id, n_terms, score, 'compacted' AS phase FROM one
          UNION ALL
          SELECT doc_id, n_terms, score, 'maintained' AS phase FROM one
          ORDER BY phase, doc_id"""
    })

  /** Vocabulary-coverage quality score ([[TextOps.commonTokenRatio]]):
    * fraction of each doc's tokens inside the corpus top-100 vocab. */
  val q_common_token_ratio = QuerySpec(
    "q_common_token_ratio", Seq("E-text"),
    (s, d) => TextOps.commonTokenRatio(
        Engine.table(s, d, "documents"), topN = 100)
      .orderBy("doc_id"),
    Some(s"""WITH tok AS ($duckTok),
             v AS (SELECT token FROM (
                     SELECT token, CAST(COUNT(*) AS BIGINT) AS tf
                     FROM (SELECT unnest(w) AS token FROM tok) x
                     GROUP BY 1 ORDER BY tf DESC, token LIMIT 100) y),
             t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                     unnest(CASE WHEN len(w) = 0
                       THEN [CAST(NULL AS VARCHAR)] ELSE w END) AS token
                   FROM tok),
             a AS (SELECT t.doc_id, t.n_tokens,
                     CAST(SUM(CASE WHEN v.token IS NOT NULL THEN 1
                              ELSE 0 END) AS BIGINT) AS n_common
                   FROM t LEFT JOIN v ON t.token = v.token
                   GROUP BY 1, 2)
             SELECT doc_id, n_tokens, n_common,
               CASE WHEN n_tokens = 0 THEN 0.0
                    ELSE CAST(n_common AS DOUBLE) /
                         CAST(n_tokens AS DOUBLE) END AS common_ratio
             FROM a ORDER BY doc_id"""))

  /** Sequence-packing layout ([[TextOps.packSequences]]): global token
    * offsets + first/last 64-token training sequence per doc. The
    * oracle's single global window cumsum must equal the engine's
    * two-phase distributed prefix sum exactly. */
  val q_pack_sequences = QuerySpec(
    "q_pack_sequences", Seq("E-text", "W4"),
    (s, d) => TextOps.packSequences(
        Engine.table(s, d, "documents"), seqLen = 64)
      .orderBy("doc_id"),
    Some("""WITH t AS (SELECT doc_id,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                  FROM documents),
            o AS (SELECT doc_id, n_tokens,
                    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS BIGINT) AS tok_offset
                  FROM t)
            SELECT doc_id, n_tokens, tok_offset,
              CAST(floor(tok_offset / 64) AS BIGINT) AS first_seq,
              CAST(floor((tok_offset + greatest(n_tokens, 1) - 1) / 64)
                AS BIGINT) AS last_seq
            FROM o ORDER BY doc_id"""))

  /** Domain-mixture resampling ([[Sampling.mixtureSample]]): keep all
    * of src0, half of src1, a quarter of src2, 10% of everything else
    * — the oracle draws the IDENTICAL sample from the same salted
    * hash. */
  val q_mixture_sample = QuerySpec(
    "q_mixture_sample", Seq("P12"),
    (s, d) => Sampling.mixtureSample(Engine.table(s, d, "documents"),
        "source", Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultFrac = 0.1)
      .select("doc_id", "source")
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, source FROM documents
             WHERE substring(md5(doc_id::VARCHAR || 'graft'), 1, 8) <
               CASE source
                 WHEN 'src0' THEN '${Sampling.hexThreshold(1.0)}'
                 WHEN 'src1' THEN '${Sampling.hexThreshold(0.5)}'
                 WHEN 'src2' THEN '${Sampling.hexThreshold(0.25)}'
                 ELSE '${Sampling.hexThreshold(0.1)}' END
             ORDER BY doc_id"""))

  private val boiler =
    "terms of service apply to this mirror site read carefully"

  /** C4-style global span dedup ([[TextOps.dedupSpans]]): both engines
    * plant an identical 10-token boilerplate prefix on every 5th doc;
    * the dedup must strip it from all but the first occurrence (and
    * any organically repeated span with it). Clean text compared by
    * md5. */
  val q_dedup_spans = QuerySpec(
    "q_dedup_spans", Seq("E-dedup", "E-text", "W6"),
    (s, d) => {
      val planted = Engine.table(s, d, "documents")
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(lit(boiler + " "), col("text")))
            .otherwise(col("text")))
      TextOps.dedupSpans(planted, spanTokens = 10)
        .select(col("doc_id"), col("n_spans"), col("n_kept"),
          md5(col("clean_text")).as("fp"))
        .orderBy("doc_id")
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN '$boiler ' || text
                      ELSE text END AS text
               FROM documents),
             w AS (SELECT doc_id, string_split(text, ' ') AS w,
                     len(string_split(text, ' ')) AS n
                   FROM planted),
             x AS (SELECT doc_id, w,
                     unnest(range(0, 1 + CAST(ceil(
                       greatest(n - 10, 0) / 10.0) AS BIGINT))) AS chunk_id
                   FROM w),
             sp AS (SELECT doc_id, chunk_id,
                      array_to_string(w[(chunk_id*10+1):(chunk_id*10+10)],
                        ' ') AS chunk_text
                    FROM x),
             r AS (SELECT doc_id, chunk_id, chunk_text,
                     row_number() OVER (PARTITION BY md5(chunk_text)
                       ORDER BY doc_id, chunk_id) AS rn
                   FROM sp),
             k AS (SELECT doc_id,
                     string_agg(chunk_text, ' ' ORDER BY chunk_id) AS clean
                   FROM r WHERE rn = 1 GROUP BY doc_id),
             a AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
                     CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_kept
                   FROM r GROUP BY doc_id)
             SELECT a.doc_id, n_spans, n_kept,
                    md5(COALESCE(k.clean, '')) AS fp
             FROM a LEFT JOIN k USING (doc_id) ORDER BY a.doc_id"""))

  /** EXACT substring dedup at arbitrary alignment
    * ([[TextOps.dedupSubstrings]], the Lee et al. 2022 ExactSubstr
    * operator): the same 10-token boilerplate is INSERTED at a
    * per-doc offset (after doc_id%3+1 tokens) on every 5th doc —
    * shifted alignments that fixed-window span dedup provably misses
    * (see TextOpsSpec) — and the operator must strip every occurrence
    * except the corpus-first, along with any organically repeated
    * ≥8-token span. The oracle replays the identical seed-coverage
    * construction (sliding 8-gram md5s, row_number first-occurrence,
    * coverage expansion) in DuckDB; clean text compared by md5. */
  val q_dedup_substring = QuerySpec(
    "q_dedup_substring", Seq("E-dedup", "E-text", "U5"),
    (s, d) => {
      val w = split(col("text"), " ")
      val m = (col("doc_id") % 3 + 1).cast("int")
      val planted = Engine.table(s, d, "documents")
        .withColumn("text",
          when(col("doc_id") % 5 === 0,
            concat_ws(" ",
              concat(slice(w, lit(1), m), split(lit(boiler), " "),
                slice(w, m + 1, greatest(size(w) - m, lit(0))))))
            .otherwise(col("text")))
      TextOps.dedupSubstrings(planted, k = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_removed"),
          md5(col("clean_text")).as("fp"))
        .orderBy("doc_id")
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 5 = 0 THEN array_to_string(
                     w[1:m] || string_split('$boiler', ' ') ||
                     w[(m+1):len(w)], ' ')
                   ELSE array_to_string(w, ' ') END AS text
               FROM (SELECT doc_id, string_split(text, ' ') AS w,
                            CAST(doc_id % 3 + 1 AS BIGINT) AS m
                     FROM documents)),
             tok AS (SELECT doc_id, string_split(text, ' ') AS w
                     FROM planted),
             win AS (SELECT doc_id, i AS start,
                       md5(array_to_string(w[(i+1):(i+8)], ' ')) AS g
                     FROM tok, LATERAL unnest(
                       range(0, greatest(len(w) - 7, 0))) t(i)),
             r AS (SELECT doc_id, start,
                     row_number() OVER (PARTITION BY g
                       ORDER BY doc_id, start) AS rn
                   FROM win),
             rp AS (SELECT DISTINCT doc_id, pos FROM (
                      SELECT doc_id,
                             unnest(range(start, start + 8)) AS pos
                      FROM r WHERE rn > 1)),
             pos AS (SELECT doc_id, i AS pos, w[CAST(i+1 AS BIGINT)] AS tok
                     FROM tok, LATERAL unnest(range(0, len(w))) t(i)),
             kept AS (SELECT p.doc_id, p.pos, p.tok FROM pos p
                      LEFT JOIN rp ON p.doc_id = rp.doc_id
                                  AND p.pos = rp.pos
                      WHERE rp.pos IS NULL),
             k AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nk,
                     string_agg(tok, ' ' ORDER BY pos) AS clean
                   FROM kept GROUP BY doc_id)
             SELECT t.doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                    CAST(len(w) - COALESCE(nk, 0) AS BIGINT) AS n_removed,
                    md5(COALESCE(clean, '')) AS fp
             FROM tok t LEFT JOIN k USING (doc_id)
             ORDER BY t.doc_id"""))

  /** Per-domain quality floor ([[TextOps.qualityPercentileGate]]):
    * keep docs at/above their own source's 25th-percentile lexical
    * diversity. The oracle recomputes the identical exact-percentile
    * cut with quantile_cont. */
  val q_quality_gate = QuerySpec(
    "q_quality_gate", Seq("E-text", "A11"),
    (s, d) => TextOps.qualityPercentileGate(
        Engine.table(s, d, "documents"), p = 0.25)
      .orderBy("doc_id"),
    Some("""WITH sc AS (SELECT doc_id, source,
                 uq::DOUBLE / greatest(wc, 1)::DOUBLE AS diversity
               FROM (SELECT doc_id, source,
                       len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                         AS wc,
                       len(list_distinct(regexp_extract_all(lower(text),
                         '[a-z0-9]+'))) AS uq
                     FROM documents) x),
            t AS (SELECT source, quantile_cont(diversity, 0.25) AS thr
                  FROM sc GROUP BY source)
            SELECT doc_id, source, diversity
            FROM sc JOIN t USING (source)
            WHERE diversity >= thr ORDER BY doc_id"""))

  /** Deterministic global shuffle ([[Sampling.shuffledOrder]]): the
    * reproducible pseudo-random export permutation — identical row
    * order in any engine with md5. */
  val q_shuffle_export = QuerySpec(
    "q_shuffle_export", Seq("P12", "O1"),
    (s, d) => Sampling.shuffledOrder(Engine.table(s, d, "documents"))
      .select("shuffle_rank", "doc_id", "source"),
    Some("""SELECT md5(doc_id::VARCHAR || 'graft') AS shuffle_rank,
                   doc_id, source
            FROM documents ORDER BY shuffle_rank"""))

  /** Per-domain quota cap ([[Sampling.sourceCap]]): no source may
    * contribute more than 10 documents, keeping its longest (n_chars
    * DESC, doc_id tiebreak). Runs on the bounded-heap TopKPerGroup
    * operator — never a window sort of a hot domain's full row set.
    * The oracle is the equivalent ranked-window SQL. */
  val q_source_cap = QuerySpec(
    "q_source_cap", Seq("P12", "A12"),
    (s, d) => Sampling.sourceCap(Engine.table(s, d, "documents"),
        "source", 10, Seq(col("n_chars").desc, col("doc_id").asc))
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id"),
    Some("""SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                     row_number() OVER (PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) WHERE rn <= 10
            ORDER BY doc_id"""))

  /** Temperature-flattened language mixture at alpha = 1/2
    * ([[Sampling.temperatureMixture]]): stratum keep-counts
    * m_s = floor(sqrt(n_s * n_min)) — exact in both engines because
    * IEEE sqrt is correctly rounded — with survivors chosen by salted
    * md5 rank. On this corpus the dominant language is damped (en
    * keeps ~sqrt(218*64) of 218 docs at sf0.01) while the smallest is
    * kept whole. */
  val q_temperature_mixture = QuerySpec(
    "q_temperature_mixture", Seq("P12", "A12"),
    (s, d) => Sampling.temperatureMixture(
        Engine.table(s, d, "documents"), "lang")
      .select("doc_id", "lang")
      .orderBy("doc_id"),
    Some("""WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                       FROM documents GROUP BY lang),
              m AS (SELECT lang,
                      CAST(floor(sqrt(CAST(n AS DOUBLE) *
                        CAST((SELECT MIN(n) FROM c) AS DOUBLE)))
                        AS BIGINT) AS q FROM c),
              r AS (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY md5(doc_id::VARCHAR || 'graft'),
                                 doc_id) AS rn
                    FROM documents)
            SELECT r.doc_id, r.lang FROM r JOIN m USING (lang)
            WHERE rn <= q ORDER BY doc_id"""))

  /** The classic BPE reference corpus (Sennrich 2016's worked example):
    * planted, SF-independent, so the oracle is the closed-form merge
    * sequence — the same convention as the multimodal decode queries. */
  private def bpeCorpus(s: SparkSession) = {
    import s.implicits._
    Seq((1L, ("low " * 5).trim), (2L, ("lower " * 2).trim),
      (3L, ("newest " * 6).trim), (4L, ("widest " * 3).trim))
      .toDF("doc_id", "text")
  }

  /** Distributed BPE vocabulary learning ([[graft.operators.Bpe]]):
    * ten merge rounds on the planted reference corpus; each round is a
    * bounded pair-count aggregate on the word-frequency table. Oracle =
    * the hand-derived merge sequence (deterministic because ties break
    * to the lexicographically smallest pair). */
  val q_bpe_learn = QuerySpec(
    "q_bpe_learn", Seq("E-text"),
    (s, d) => {
      import s.implicits._
      graft.operators.Bpe.learn(bpeCorpus(s), 10).zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "left", "right").orderBy("rank")
    },
    Some("""SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), 'e', 's'), (2, 'es', 't'),
              (3, 'est', '</w>'), (4, 'l', 'o'), (5, 'lo', 'w'),
              (6, 'e', 'w'), (7, 'ew', 'est</w>'),
              (8, 'n', 'ewest</w>'), (9, 'low', '</w>'),
              (10, 'd', 'est</w>'))
            AS t(rank, "left", "right") ORDER BY rank"""))

  /** Map-only BPE encode with the learned merges
    * ([[graft.functions.BpeEncode]] — native codegen expression, zero
    * shuffles over the corpus): unseen words segment into learned
    * subwords. Oracle = closed-form greedy-merge tokenizations. */
  val q_bpe_encode = QuerySpec(
    "q_bpe_encode", Seq("E-text", "X1"),
    (s, d) => {
      import s.implicits._
      val merges = graft.operators.Bpe.learn(bpeCorpus(s), 10)
      val probe = Seq((1L, "lowest"), (2L, "newer"), (3L, "wider"),
        (4L, "low"), (5L, "newest newest")).toDF("doc_id", "text")
      graft.operators.Bpe.encode(probe, merges)
        .select(col("doc_id"),
          concat_ws(" ", col("bpe_tokens")).as("bpe"),
          col("n_bpe_tokens"))
        .orderBy("doc_id")
    },
    Some("""SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), 'low est</w>', 2),
              (2, 'n ew e r </w>', 5),
              (3, 'w i d e r </w>', 6),
              (4, 'low</w>', 1),
              (5, 'newest</w> newest</w>', 2))
            AS t(doc_id, bpe, n_bpe_tokens) ORDER BY doc_id"""))

  /** Model-scored quality filtering
    * ([[graft.operators.TextClassifier]]): train a hashed-BOW logistic
    * classifier by distributed full-batch GD on a planted weak label
    * (document contains the token `spark`), score the corpus, output
    * the decisions. The label rule is linearly separable in feature
    * space and training runs in exact decimal arithmetic, so the
    * learned decisions converge to the rule exactly — which is what
    * lets DuckDB check a TRAINED model with plain SQL. */
  val q_quality_classifier = QuerySpec(
    "q_quality_classifier", Seq("E-text", "A1", "X1"),
    (s, d) => {
      import graft.operators.TextClassifier
      val docs = Engine.table(s, d, "documents")
      val feats = TextClassifier.hashedFeatures(docs, "text", 4096)
        .withColumn("y",
          array_contains(split(col("text"), "\\s+"), "spark")
            .cast("double"))
      // Adagrad wins here despite needing ~25 vs Newton's ~3
      // iterations: each first-order job touches n rows, Newton's
      // touches n*|actives|^2 pair cells (measured 4.4s vs 7.0s at
      // sf0.1) — see the trainLogisticNewton scaladoc for the rule
      val w = TextClassifier.trainLogistic(feats, "doc_id", "fx", "y",
        iters = 48, lr = 2.0)
      TextClassifier.scoreLogistic(feats, "fx", w, Seq("doc_id"))
        .select(col("doc_id"), col("pred"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             list_contains(str_split_regex(text, '\s+'), 'spark') AS pred
      FROM documents ORDER BY doc_id"""))

  val all: Seq[QuerySpec] = Seq(
    q_repetition_stats, q_lm_score, q_bm25_topk, q_hybrid_rrf,
    q_common_token_ratio,
    q_pack_sequences, q_mixture_sample, q_dedup_spans, q_dedup_substring,
    q_shuffle_export,
    q_quality_gate, q_source_cap, q_temperature_mixture,
    q_bpe_learn, q_bpe_encode, q_quality_classifier, q_bm25_indexed,
    q_bm25_index_maint)
}
