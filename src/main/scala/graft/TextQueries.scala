package graft

import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.{Dedup, MediaCodec, Multimodal, Similarity, TextOps}

/** LLM-data-pipeline conformance queries (SURVEY.md §7E): text analysis,
  * deduplication, similarity search, multimodal plumbing.
  *
  * Oracle notes: similarity scores go through integer quantization
  * ([[graft.functions.quantizedCosine]]) or int-count ratios so both
  * engines produce bitwise-identical doubles. Hash-family-specific
  * operators (MinHash signatures, SimHash fingerprints, LSH buckets)
  * either get a brute-force oracle over the same threshold (where recall
  * is effectively 1) or a rows-only check plus ScalaTest verification.
  */
object TextQueries {

  /** Shared DuckDB fragment: word-bigram shingle set per document. */
  private val duckShingles =
    """SELECT doc_id, source, list_distinct(list_transform(
         range(1, greatest(len(w)-1, 1)+1),
         i -> concat_ws(' ', w[i], w[i+1]))) AS sh
       FROM (SELECT doc_id, source, string_split(text, ' ') AS w
             FROM documents)"""

  /** Brute-force Jaccard pairs in POSTING-LIST form: unnest the
    * shingle sets, self-join on the shingle, count common shingles per
    * pair, and derive jaccard = common / (|A| + |B| − common). EXACTLY
    * the same truth set as the per-pair
    * `list_intersect/list_distinct(list_concat)` form (a pair with
    * zero common shingles has jaccard 0 and can never pass a positive
    * threshold; the arithmetic divides the same integers, so the
    * doubles are bit-identical — cross-checked equal at sf0.01), but
    * Σ df(g)² join rows instead of n²/2 list intersections: the sf0.1
    * oracle sweep runs this in seconds where the all-pairs form was
    * infeasible (12.5M list intersections). `pairCond` further
    * restricts which (a, b) pairs are considered (blocking). */
  private def duckJaccardCtes(pairCond: String = ""): String =
    s"""sh_t AS ($duckShingles),
        n_t AS (SELECT doc_id, len(sh) AS n FROM sh_t),
        u_t AS (SELECT doc_id, source, unnest(sh) AS g FROM sh_t),
        jp AS (
          SELECT c.id_a, c.id_b,
                 c.common::DOUBLE /
                 (na.n + nb.n - c.common)::DOUBLE AS jaccard
          FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       COUNT(*) AS common
                FROM u_t a JOIN u_t b
                  ON a.g = b.g AND a.doc_id < b.doc_id $pairCond
                GROUP BY 1, 2) c
          JOIN n_t na ON c.id_a = na.doc_id
          JOIN n_t nb ON c.id_b = nb.doc_id)"""

  // -------------------------------------------------------- text analysis

  val q_text_token_stats = QuerySpec(
    "q_text_token_stats", Seq("E-text"),
    (s, d) => TextOps.tokenStats(Engine.table(s, d, "documents"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, length(text) AS len_chars,
                   len(string_split(text, ' ')) AS ws_tokens,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word_cnt,
                   len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
                     AS uniq_word_cnt
            FROM documents ORDER BY doc_id"""))

  /** BPE-ish pre-tokenizer budget — IDENTICAL RE2-compatible pattern
    * evaluated by both engines; chars_per_token via integer-derived
    * division so the doubles agree bitwise. */
  private val duckBpePattern =
    graft.operators.TextOps.bpePretokenPattern.replace("'", "''")

  val q_text_token_budget = QuerySpec(
    "q_text_token_budget", Seq("E-text"),
    (s, d) => TextOps.tokenBudget(Engine.table(s, d, "documents"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, length(text) AS len_chars,
                    len(regexp_extract_all(text, '$duckBpePattern'))
                      AS bpe_tokens,
                    CASE WHEN length(text) = 0 THEN 0.0
                         ELSE length(text)::DOUBLE /
                              greatest(len(regexp_extract_all(text,
                                '$duckBpePattern')), 1)::DOUBLE
                    END AS chars_per_token
             FROM documents ORDER BY doc_id"""))

  val q_text_quality = QuerySpec(
    "q_text_quality", Seq("E-text"),
    (s, d) => TextOps.qualityScore(Engine.table(s, d, "documents"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, word_cnt, stop_cnt, punct_cnt,
                    stop_cnt::DOUBLE / sw::DOUBLE AS stop_ratio,
                    uniq_cnt::DOUBLE / sw::DOUBLE AS diversity,
                    (word_cnt >= 5 AND stop_cnt::DOUBLE / sw::DOUBLE > 0.01)
                      AS passes_quality
             FROM (SELECT doc_id,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word_cnt,
                     len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
                       AS uniq_cnt,
                     len(regexp_extract_all(lower(text),
                       '\\b(the|a|an|of|to|and|in|is|it|that|for)\\b'))
                       AS stop_cnt,
                     len(regexp_extract_all(text, '[.,;:!?]')) AS punct_cnt,
                     greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 1)
                       AS sw
                   FROM documents) x
             ORDER BY doc_id"""))

  val q_text_langid = QuerySpec(
    "q_text_langid", Seq("E-text"),
    (s, d) => TextOps.langId(Engine.table(s, d, "documents"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id, word_cnt, stop_cnt, non_ascii_cnt,
                   CASE WHEN non_ascii_cnt > 0 THEN 'other'
                        WHEN stop_cnt::DOUBLE / greatest(word_cnt,1)::DOUBLE
                             > 0.02 THEN 'en'
                        ELSE 'unknown' END AS pred_lang
            FROM (SELECT doc_id,
                    len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word_cnt,
                    len(regexp_extract_all(lower(text),
                      '\b(the|a|an|of|to|and|in|is|it|that|for)\b'))
                      AS stop_cnt,
                    len(regexp_extract_all(text, '[^\x00-\x7F]'))
                      AS non_ascii_cnt
                  FROM documents) x
            ORDER BY doc_id"""))

  /** The composed cleaning pipeline (quality gate → lang filter →
    * exact dedup keep-first) — one oracle-checked query proving the
    * stage composition, not just each stage alone. */
  val q_corpus_clean = QuerySpec(
    "q_corpus_clean", Seq("E-text", "E-dedup"),
    (s, d) => TextOps.cleanCorpus(Engine.table(s, d, "documents"))
      .select("doc_id", "source", "n_chars").orderBy("doc_id"),
    Some("""WITH f AS (
              SELECT doc_id, source, n_chars, text,
                len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS wc,
                len(regexp_extract_all(lower(text),
                  '\b(the|a|an|of|to|and|in|is|it|that|for)\b')) AS sc,
                len(regexp_extract_all(text, '[^\x00-\x7F]')) AS na
              FROM documents),
            k AS (
              SELECT doc_id, source, n_chars, text FROM f
              WHERE wc >= 5
                AND sc::DOUBLE / greatest(wc,1)::DOUBLE > 0.01
                AND na = 0
                AND sc::DOUBLE / greatest(wc,1)::DOUBLE > 0.02)
            SELECT doc_id, source, n_chars FROM (
              SELECT doc_id, source, n_chars,
                row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY doc_id) AS rn
              FROM k) t
            WHERE rn = 1 ORDER BY doc_id"""))

  /** Decontamination: docs sharing any word 3-shingle with the held-out
    * "benchmark" slice (doc_id % 97 == 0) are flagged with their
    * overlap count. */
  val q_decontaminate = QuerySpec(
    "q_decontaminate", Seq("E-text", "E-dedup", "J4"),
    (s, d) => {
      val all = Engine.table(s, d, "documents")
      TextOps.contaminationFlags(
        all.filter(col("doc_id") % 97 =!= 0),
        all.filter(col("doc_id") % 97 === 0))
        .orderBy("doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                       FROM documents),
              sh AS (SELECT doc_id,
                       list_distinct(list_transform(
                         range(1, greatest(len(w)-2, 1)+1),
                         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS sh
                     FROM w),
              b AS (SELECT DISTINCT unnest(sh) AS s FROM sh
                    WHERE doc_id % 97 = 0),
              d AS (SELECT doc_id, unnest(sh) AS s FROM sh
                    WHERE doc_id % 97 <> 0)
            SELECT d.doc_id, COUNT(*) AS n_overlap
            FROM d JOIN b ON d.s = b.s
            GROUP BY d.doc_id ORDER BY doc_id"""))

  val q_text_fingerprint = QuerySpec(
    "q_text_fingerprint", Seq("E-text"),
    (s, d) => TextOps.fingerprint(Engine.table(s, d, "documents"))
      .select("doc_id", "fp").orderBy("doc_id"),
    Some("""SELECT doc_id, md5(text) AS fp FROM documents
            ORDER BY doc_id"""))

  /** Canonical normalization pass ([[graft.functions.NormalizeText]]:
    * NFC + ROOT-locale lowercase + whitespace-run collapse + trim) —
    * map-only over the corpus; checked by md5 of the normalized text
    * so the oracle proves byte-identical output without hauling it.
    * The DuckDB side composes its own nfc_normalize/lower/
    * regexp_replace — two independent implementations of the same
    * public spec agreeing bit-for-bit. */
  val q_text_normalize = QuerySpec(
    "q_text_normalize", Seq("E-text", "F12"),
    (s, d) => Engine.table(s, d, "documents")
      .select(col("doc_id"),
        md5(graft.functions.NormalizeText.normText(col("text")))
          .as("norm_fp"),
        length(graft.functions.NormalizeText.normText(col("text")))
          .cast("long").as("norm_len"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   md5(trim(regexp_replace(lower(nfc_normalize(text)),
                     '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS norm_fp,
                   CAST(length(trim(regexp_replace(
                     lower(nfc_normalize(text)),
                     '[ \t\n\x0b\f\r]+', ' ', 'g'))) AS BIGINT)
                     AS norm_len
            FROM documents ORDER BY doc_id"""))

  // ---------------------------------------------------------------- dedup

  val q_dedup_exact = QuerySpec(
    "q_dedup_exact", Seq("E-dedup"),
    (s, d) => Dedup.exactDupGroups(Engine.table(s, d, "documents"))
      .orderBy("fp"),
    Some("""SELECT md5(text) AS fp, COUNT(*) AS n_copies,
                   MIN(doc_id) AS keep_id
            FROM documents GROUP BY 1 ORDER BY fp"""))

  /** MinHash+LSH near-dup pairs at j>=0.8; with 16 bands × 3 rows the
    * candidate-recall at the threshold is 1-(1-0.8^3)^16 ≈ 1-2e-5 (so
    * the exact brute-force oracle matches), while a random pair at
    * j≈0.05 has only ~0.2% candidate probability — r=3 keeps the
    * false-candidate volume ~10× below r=2. */
  val q_dedup_minhash_lsh = QuerySpec(
    "q_dedup_minhash_lsh", Seq("E-dedup"),
    (s, d) => Dedup.minHashLshPairs(Engine.table(s, d, "documents"),
        numHashes = 48, bands = 16, threshold = 0.8)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH ${duckJaccardCtes()}
             SELECT id_a, id_b, jaccard FROM jp
             WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""))

  /** Blocked n-gram Jaccard (exact within a blocking key). */
  val q_dedup_ngram_block = QuerySpec(
    "q_dedup_ngram_block", Seq("E-dedup"),
    (s, d) => Dedup.ngramJaccardPairs(Engine.table(s, d, "documents"),
        blockCol = "source", threshold = 0.5)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH ${duckJaccardCtes("AND a.source = b.source")}
             SELECT id_a, id_b, jaccard FROM jp
             WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""))

  /** Fuzzy record-linkage dedup ([[Dedup.fuzzyNearDupPairs]]):
    * classical entity-resolution blocking + exact Levenshtein verify
    * over an entity table with planted typo variants — one substitution
    * inside the name body and one character deletion, both invariant to
    * the last-3-chars blocking key. Blocking is part of the operator's
    * semantics (recall is scoped to bucket-mates by design), so the
    * oracle replays the IDENTICAL blocked join + edit distance in
    * DuckDB — including the genuine same-suffix near-miss pairs the
    * original key space happens to contain. */
  val q_dedup_fuzzy = QuerySpec(
    "q_dedup_fuzzy", Seq("E-dedup", "J1", "U5"),
    (s, d) => {
      val cust = Engine.table(s, d, "customer")
        .select(col("c_custkey").cast("long").as("rid"),
          col("c_name").as("name"))
      val subst = cust.filter(col("rid") < 50)
        .select((col("rid") + 500000).as("rid"),
          concat(substring(col("name"), 1, 3), lit("X"),
            substring(col("name"), 5, 1000)).as("name"))
      val del = cust.filter(col("rid") >= 50 && col("rid") < 100)
        .select((col("rid") + 600000).as("rid"),
          concat(substring(col("name"), 1, 10),
            substring(col("name"), 12, 1000)).as("name"))
      // explicit opt-out of the finite DefaultMaxBlock: this oracle
      // pins the UNCAPPED all-pairs-within-block semantics (the
      // customer-name suffix keys keep occupancy bounded here); the
      // capped default's semantics are pinned by q_dedup_fuzzy_capped
      Dedup.fuzzyNearDupPairs(cust.unionByName(subst).unionByName(del),
          "rid", "name", maxDist = 1, maxBlock = Int.MaxValue)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS rid,
                            c_name AS name FROM customer),
            subst AS (SELECT rid + 500000 AS rid,
                        substr(name, 1, 3) || 'X' || substr(name, 5) AS name
                      FROM base WHERE rid < 50),
            del AS (SELECT rid + 600000 AS rid,
                      substr(name, 1, 10) || substr(name, 12) AS name
                    FROM base WHERE rid >= 50 AND rid < 100),
            recs AS (SELECT * FROM base UNION ALL SELECT * FROM subst
                     UNION ALL SELECT * FROM del)
            SELECT DISTINCT a.rid AS id_a, b.rid AS id_b
            FROM recs a JOIN recs b ON right(a.name, 3) = right(b.name, 3)
            WHERE a.rid < b.rid AND levenshtein(a.name, b.name) <= 1
            ORDER BY id_a, id_b"""))

  /** The hot-block occupancy cap as oracle-gated semantics
    * ([[Dedup.fuzzyNearDupPairs]] with `maxBlock`): a junk-key flood —
    * 200 records all named alike, the empty-default hazard every real
    * entity table grows — lands in one block; with the cap at 50 that
    * block is excluded from pairing entirely while every
    * normal-occupancy block still pairs, and DuckDB replays the
    * identical size-filtered blocked join. */
  val q_dedup_fuzzy_capped = QuerySpec(
    "q_dedup_fuzzy_capped", Seq("E-dedup", "J1", "A8"),
    (s, d) => {
      val cust = Engine.table(s, d, "customer")
        .select(col("c_custkey").cast("long").as("rid"),
          col("c_name").as("name"))
      val flood = cust.filter(col("rid") < 200)
        .select((col("rid") + 700000).as("rid"),
          lit("placeholder-entity-xyz").as("name"))
      Dedup.fuzzyNearDupPairs(cust.unionByName(flood), "rid", "name",
          maxDist = 1, maxBlock = 50)
        .orderBy("id_a", "id_b")
    },
    Some("""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS rid,
                            c_name AS name FROM customer),
            flood AS (SELECT rid + 700000 AS rid,
                        'placeholder-entity-xyz' AS name
                      FROM base WHERE rid < 200),
            recs AS (SELECT rid, name, right(name, 3) AS blk FROM
                       (SELECT * FROM base UNION ALL SELECT * FROM flood)),
            ok AS (SELECT blk FROM recs GROUP BY blk
                   HAVING COUNT(*) <= 50),
            kept AS (SELECT recs.* FROM recs JOIN ok USING (blk))
            SELECT DISTINCT a.rid AS id_a, b.rid AS id_b
            FROM kept a JOIN kept b ON a.blk = b.blk
            WHERE a.rid < b.rid AND levenshtein(a.name, b.name) <= 1
            ORDER BY id_a, id_b"""))

  /** The DEFAULT-argument cap semantics ([[Dedup.DefaultMaxBlock]]):
    * same construction as [[q_dedup_fuzzy_capped]] but the flood is
    * 300 clones and the Spark side passes NO maxBlock — what a caller
    * gets out of the box must be the finite-cap behavior, oracle-
    * replayed with the literal DefaultMaxBlock threshold (the SQL is
    * built from the constant, so the two can never drift). At
    * sf0.001 the flood (150 rows) sits UNDER the cap and pairs
    * all-ways; at sf0.01+ it exceeds the cap and is excluded — both
    * regimes replay identically in DuckDB. */
  val q_dedup_fuzzy_default = QuerySpec(
    "q_dedup_fuzzy_default", Seq("E-dedup", "J1", "A8"),
    (s, d) => {
      val cust = Engine.table(s, d, "customer")
        .select(col("c_custkey").cast("long").as("rid"),
          col("c_name").as("name"))
      val flood = cust.filter(col("rid") < 300)
        .select((col("rid") + 700000).as("rid"),
          lit("placeholder-entity-xyz").as("name"))
      Dedup.fuzzyNearDupPairs(cust.unionByName(flood), "rid", "name",
          maxDist = 1)
        .orderBy("id_a", "id_b")
    },
    Some(s"""WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS rid,
                            c_name AS name FROM customer),
            flood AS (SELECT rid + 700000 AS rid,
                        'placeholder-entity-xyz' AS name
                      FROM base WHERE rid < 300),
            recs AS (SELECT rid, name, right(name, 3) AS blk FROM
                       (SELECT * FROM base UNION ALL SELECT * FROM flood)),
            ok AS (SELECT blk FROM recs GROUP BY blk
                   HAVING COUNT(*) <= ${Dedup.DefaultMaxBlock}),
            kept AS (SELECT recs.* FROM recs JOIN ok USING (blk))
            SELECT DISTINCT a.rid AS id_a, b.rid AS id_b
            FROM kept a JOIN kept b ON a.blk = b.blk
            WHERE a.rid < b.rid AND levenshtein(a.name, b.name) <= 1
            ORDER BY id_a, id_b"""))

  /** Incremental ingestion dedup ([[Dedup.dedupAgainstCorpus]]): the
    * doc_id%10==0 slice arrives as a "new batch" against the rest as
    * corpus; survivors = batch minus exact corpus copies, minus
    * near-dups (MinHash-banded, j>=0.8 where 16-band candidate recall
    * is ~1-1e-7 — see q_dedup_minhash_lsh), self-deduped keep-first.
    * The oracle recomputes all three cuts brute-force. */
  val q_dedup_incremental = QuerySpec(
    "q_dedup_incremental", Seq("E-dedup", "J6"),
    (s, d) => {
      val all = Engine.table(s, d, "documents")
      Dedup.dedupAgainstCorpus(
          all.filter(col("doc_id") % 10 =!= 0),
          all.filter(col("doc_id") % 10 === 0),
          threshold = 0.8)
        .select("doc_id", "source").orderBy("doc_id")
    },
    Some(s"""WITH sh_t AS ($duckShingles),
             n_t AS (SELECT doc_id, len(sh) AS n FROM sh_t),
             u_t AS (SELECT doc_id, unnest(sh) AS g FROM sh_t),
             b AS (SELECT doc_id, source, md5(text) AS fp FROM documents
                   WHERE doc_id % 10 = 0),
             cfp AS (SELECT DISTINCT md5(text) AS fp FROM documents
                     WHERE doc_id % 10 <> 0),
             near AS (SELECT DISTINCT c.nid AS doc_id
                      FROM (SELECT a.doc_id AS nid, o.doc_id AS oid,
                                   COUNT(*) AS common
                            FROM u_t a JOIN u_t o ON a.g = o.g
                             AND a.doc_id % 10 = 0 AND o.doc_id % 10 <> 0
                            GROUP BY 1, 2) c
                      JOIN n_t na ON c.nid = na.doc_id
                      JOIN n_t no ON c.oid = no.doc_id
                      WHERE c.common::DOUBLE /
                            (na.n + no.n - c.common)::DOUBLE >= 0.8),
             firsts AS (SELECT doc_id FROM (
                 SELECT doc_id, row_number() OVER (PARTITION BY fp
                   ORDER BY doc_id) AS rn FROM b) x WHERE rn = 1)
             SELECT doc_id, source FROM b
             WHERE doc_id IN (SELECT doc_id FROM firsts)
               AND doc_id NOT IN (SELECT doc_id FROM near)
               AND fp NOT IN (SELECT fp FROM cfp)
             ORDER BY doc_id"""))

  /** SimHash-blocked near-dups WITH exact verification
    * ([[Dedup.simHashNearDupPairs]]): the banded 64-bit fingerprint
    * generates candidates, exact shingle Jaccard >= 0.8 verifies — so
    * the output is the engine-independent true-pair set (same as the
    * MinHash query's), which DuckDB recomputes brute-force. Blocker
    * recall: a Hamming <= 3 pair always shares a clean 16-bit band
    * (pigeonhole over 4 bands); jaccard >= 0.8 pairs sit at Hamming
    * 0-3. Raw fingerprint pairs (hash-family-specific) stay covered by
    * ScalaTest on [[Dedup.simHashPairs]]. */
  val q_dedup_simhash = QuerySpec(
    "q_dedup_simhash", Seq("E-dedup"),
    (s, d) => Dedup.simHashNearDupPairs(Engine.table(s, d, "documents"),
        maxHamming = 8, threshold = 0.8)
      .orderBy("id_a", "id_b"),
    Some(s"""WITH ${duckJaccardCtes()}
             SELECT id_a, id_b, jaccard FROM jp
             WHERE jaccard >= 0.8 ORDER BY id_a, id_b"""))

  /** Partial-overlap pairs via winnowed rolling-hash fingerprints,
    * with a PLANTED ground truth that makes the output
    * engine-independent (the trick that cracked the other ANN/dedup
    * oracles): raw fingerprint pairs over the raw small-vocab testdata
    * are hash-family-specific ("pairs sharing an 11-char run" is
    * nearly ALL pairs there), so instead each document is rewritten to
    * a doc-unique 70-char string (id + two INDEPENDENT md5s of the
    * doc: md5(id||text) and md5(text||id) — no cross-doc 11-char
    * runs), and docs with doc_id < 40 get a twin at doc_id + 500000
    * sharing the VERBATIM 32-char md5(id||text) hex run.
    * The winnowing guarantee (Schleimer 2003: any shared run of
    * length >= w+k-1 chars yields a shared fingerprint per window
    * inside it) forces >= ceil(22/4) = 6 >= minShared shared
    * fingerprints per planted pair, while unrelated rewritten docs
    * would need three independent >= 8-hex-char substring collisions
    * between independent hashes that winnowing also selects on both
    * sides ((~4096/16^8)^3 ~ 1e-18 per pair) to produce a false pair —
    * so the planted twins are EXACTLY the answer, stated by the
    * oracle without any engine-side math. An earlier construction used
    * reverse(md5) as the second half; that is palindromic around the
    * separator, so two docs whose md5s share a 5-hex SUFFIX share an
    * 11-char run ("...3cc89|T|98cc3...") — at sf0.1 two such pairs
    * exist and crossed minShared=3. Independent hashes kill that
    * failure mode (suffix agreement no longer mirrors across the
    * boundary). The raw-corpus semantics (incl. the load-bearing
    * maxDf stop-fingerprint cap) stay pinned in TextOpsSpec. */
  /** The planted corpus described above, shared with
    * [[graft.ScaleProbe]] so the probe measures EXACTLY the shipped
    * construction (a drifted copy would silently measure a different
    * pipeline than the one the oracle checks). */
  private[graft] def winnowPlantedCorpus(
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def fp = md5(concat(col("doc_id").cast("string"), col("text")))
    def fp2 = md5(concat(col("text"), col("doc_id").cast("string")))
    val base = src.select(col("doc_id"),
      concat(lit("D"), col("doc_id").cast("string"), lit("H"), fp,
        lit("T"), fp2).as("text"))
    val planted = src.filter(col("doc_id") < 40)
      .select((col("doc_id") + 500000).as("doc_id"),
        concat(lit("P"), col("doc_id").cast("string"), lit("Z"), fp)
          .as("text"))
    base.unionByName(planted)
  }

  val q_dedup_winnow = QuerySpec(
    "q_dedup_winnow", Seq("E-dedup", "E-text"),
    (s, d) => {
      val src = Engine.table(s, d, "documents")
      Dedup.partialOverlapPairs(winnowPlantedCorpus(src), minShared = 3)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .orderBy("id_a", "id_b")
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS id_a,
                   CAST(doc_id + 500000 AS BIGINT) AS id_b
            FROM documents WHERE doc_id < 40 ORDER BY id_a, id_b"""))

  /** Embedding-cosine near-dups via hyperplane LSH (approximate).
    *
    * The synthetic embeddings have no genuine near-dup pairs (max
    * pairwise cosine ≈ 0.46 at sf0.01), so the raw table would always
    * return 0 rows — proving nothing. Plant deterministic near-dups
    * derived from the same testdata: vec_id < 50 reappears as
    * vec_id+100000 with a small constant offset per component (cosine
    * ≈ 0.999), and the operator must surface those pairs. */
  val q_dedup_embedding = QuerySpec(
    "q_dedup_embedding", Seq("E-dedup"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      val planted = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.005f)).as("embedding"),
          col("label"))
      // the id PAIRS are engine-independent (planted dups are the only
      // cosine >= 0.9 pairs: background max ~0.46), so DuckDB can state
      // the expected set exactly; the cosine VALUE stays out of the
      // output (float-offset arithmetic differs across engines)
      Dedup.embeddingNearDupPairs(emb.unionByName(planted), threshold = 0.9)
        .select(col("id_a").cast("long"), col("id_b").cast("long"))
        .orderBy("id_a", "id_b")
    },
    Some("""SELECT CAST(vec_id AS BIGINT) AS id_a,
                   CAST(vec_id + 100000 AS BIGINT) AS id_b
            FROM embeddings WHERE vec_id < 50 ORDER BY id_a, id_b"""))

  /** Incremental embedding dedup ([[Dedup.embeddingDedupAgainstCorpus]],
    * ingestion-time SemDeDup): a batch of 50 planted near-dups of
    * corpus vectors plus 50 genuinely novel vectors (reversed
    * embeddings — cosine vs any corpus vector stays at background
    * level) arrives against the full embeddings corpus; exactly the
    * novels must survive. */
  val q_dedup_embed_incremental = QuerySpec(
    "q_dedup_embed_incremental", Seq("E-dedup", "E-sim", "J6"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      val dups = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.005f)).as("embedding"),
          col("label"))
      val novel = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
        .select((col("vec_id") + 300000).as("vec_id"),
          reverse(col("embedding")).as("embedding"), col("label"))
      Dedup.embeddingDedupAgainstCorpus(emb, dups.unionByName(novel),
          threshold = 0.9)
        .select(col("vec_id").cast("long")).orderBy("vec_id")
    },
    Some("""SELECT CAST(vec_id + 300000 AS BIGINT) AS vec_id
            FROM embeddings WHERE vec_id >= 100 AND vec_id < 150
            ORDER BY vec_id"""))

  // ----------------------------------------------------------- similarity

  /** Shared quantized-cosine brute-force top-`k` leg against query
    * vector 0 — the Spark side of q_embed_topk_bruteforce, reused by
    * the hybrid-RRF fusion query (same one-source-of-truth contract as
    * the parameterized BM25 oracle in [[CurationQueries]]). */
  private[graft] def embedTopKBruteforce(
      emb: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        quantizedCosine(col("embedding"), col("qv")).as("cos"))
      .orderBy(desc("cos"), asc("vec_id"))
      .limit(k)
  }

  /** Its DuckDB oracle, parameterized by limit. */
  private[graft] def duckEmbedTopKSql(limit: Int): String =
    s"""WITH qz AS (SELECT vec_id,
             list_transform(embedding,
               x -> round(x::DOUBLE * 1000)::BIGINT) AS q
           FROM embeddings)
        SELECT e.vec_id,
               CASE WHEN sqrt(na::DOUBLE)*sqrt(nb::DOUBLE) = 0 THEN 0.0
                    ELSE dot::DOUBLE /
                         (sqrt(na::DOUBLE)*sqrt(nb::DOUBLE)) END AS cos
        FROM (SELECT e.vec_id,
                list_sum(list_transform(range(1, len(e.q)+1),
                  i -> e.q[i] * q0.q[i]))::BIGINT AS dot,
                list_sum(list_transform(e.q, x -> x*x))::BIGINT AS na,
                list_sum(list_transform(q0.q, x -> x*x))::BIGINT AS nb
              FROM qz e, (SELECT q FROM qz WHERE vec_id=0) q0
              WHERE e.vec_id <> 0) e
        ORDER BY cos DESC, vec_id LIMIT $limit"""

  /** Brute-force cosine top-k vs the vec_id=0 query vector, on quantized
    * vectors so scores are bitwise identical to the oracle. */
  val q_embed_topk_bruteforce = QuerySpec(
    "q_embed_topk_bruteforce", Seq("E-sim"),
    (s, d) => embedTopKBruteforce(Engine.table(s, d, "embeddings"), 10),
    Some(duckEmbedTopKSql(10)))

  /** Planted ANN ground truth: for every query id q in 0..9, ten
    * near-duplicates of vector q planted at ids 200000 + q*100 + i
    * (i = 1..10), each component offset by i*0.001f — cosine ~0.9999
    * vs a ~0.46 background maximum. On random synthetic embeddings the
    * true top-k is a near-tie lottery no ANN index can pin down; the
    * planted structure makes the true top-k of query q EXACTLY
    * {q} ∪ its planted ids in offset order, so the DuckDB oracle can
    * state the expected id set without recomputing any engine-side
    * math, and the index's recall on it must be 1.0 — which is also
    * the regime ANN indexes are FOR (clustered data). */
  private def plantedAnnCorpus(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val planted = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"), col("label"))
      .withColumn("i", explode(sequence(lit(1), lit(10))))
      .select((lit(200000) + col("vec_id") * 100 + col("i")).as("vec_id"),
        transform(col("embedding"),
          x => x + (col("i") * lit(0.001f)).cast("float")).as("embedding"),
        col("label"))
    emb.unionByName(planted)
  }

  /** Bump the version suffix whenever [[plantedAnnCorpus]] or the index
    * build parameters change: /tmp persists across driver rounds, and a
    * stale index built from an older planting scheme would silently
    * break the exact oracles. */
  private def annIndexDir(d: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_annplant_v1_" +
      d.replaceAll("[^A-Za-z0-9]", "_")

  /** Query vector 0's embedding as doubles, or None when the corpus
    * has no vec_id 0 — the zero-row-split case every ANN query must
    * tolerate (a probe against data that never arrived returns no
    * neighbors, it doesn't crash the pipeline). `take(1)`, never
    * `head()`: head throws on empty. */
  private def queryVec0(emb: org.apache.spark.sql.DataFrame)
      : Option[Seq[Double]] =
    emb.filter(col("vec_id") === 0).take(1).headOption.flatMap { row =>
      // a null embedding on the query row is dirty data, not a query
      Option(row.getSeq[Float](row.fieldIndex("embedding")))
        .map(_.map(_.toDouble).toSeq)
    }

  /** Shared DuckDB fragment: expected top-10 ids for query vector 0
    * over the planted corpus — itself plus planted copies 1..9 (the
    * 10th planted copy ranks 11th). */
  private val duckTop10Q0 =
    """SELECT CAST(0 AS BIGINT) AS vec_id
       UNION ALL SELECT CAST(200000 + i AS BIGINT) FROM range(1, 10) t(i)"""

  /** LSH kNN self-join over the 50-pair planted corpus (construction
    * of q_dedup_embedding): each planted near-dup must list its
    * original as a neighbor. Output = the original ids whose planted
    * twin found them — deterministically all 50 (fixed hyperplane
    * seeds; 4-probe miss probability ~3e-4 per pair). */
  val q_embed_knn_lsh = QuerySpec(
    "q_embed_knn_lsh", Seq("E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      val planted = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.005f)).as("embedding"),
          col("label"))
      val pairs = Similarity.lshKnnJoin(emb.unionByName(planted),
        k = 5, probes = 4)
      val found = pairs
        .filter(col("id_a") >= 100000 &&
          col("id_b") === col("id_a") - 100000)
        .select((col("id_a") - 100000).cast("long").as("vec_id"))
      emb.filter(col("vec_id") < 50)
        .select(col("vec_id").cast("long").as("vec_id"))
        .join(found, Seq("vec_id"), "left_semi")
        .orderBy("vec_id")
    },
    Some("""SELECT CAST(vec_id AS BIGINT) AS vec_id
            FROM embeddings WHERE vec_id < 50 ORDER BY vec_id"""))

  /** IVF-style pruned top-k (approximate scale path) over the planted
    * corpus: k-means-trained index persisted per scale factor (built
    * on first use, probe-only afterwards and across bench runs); the
    * probe must surface the planted true top-10 exactly. */
  val q_embed_ivf_topk = QuerySpec(
    "q_embed_ivf_topk", Seq("E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      queryVec0(emb) match {
        case None => emb.select(col("vec_id").cast("long")).limit(0)
        case Some(q) =>
          val dir = annIndexDir(d)
          if (!Similarity.isBuilt(dir))
            Similarity.ivfBuildIndexKMeans(plantedAnnCorpus(emb), dir)
          Similarity.ivfProbe(s, dir, q, k = 10)
            .select(col("vec_id").cast("long")).orderBy("vec_id")
      }
    },
    Some(s"""SELECT vec_id FROM ($duckTop10Q0) ORDER BY vec_id"""))

  /** Incremental IVF maintenance end-to-end ([[Similarity.ivfUpsert]] /
    * [[Similarity.ivfCompact]]): build a fresh index over the planted
    * corpus, apply a CDC batch that deletes half the planted copies,
    * updates two others onto the exact query point, and inserts two
    * new exact-match vectors, then probe top-8 — exactly the LIVE
    * set's deterministic head (5 exact matches + the 3 surviving
    * planted copies; the nearest non-planted vector ranked 12th
    * before maintenance, so no interloper can enter). A second probe
    * after compaction must answer identically. */
  val q_embed_ivf_upsert = QuerySpec(
    "q_embed_ivf_upsert", Seq("E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      val row0 = emb.filter(col("vec_id") === 0).take(1).headOption
        .flatMap(row => // null embedding = dirty data, same as absent
          Option(row.getSeq[Float](row.fieldIndex("embedding"))))
      if (row0.isEmpty) {
        // zero-row corpus: no query vector, no index — empty lifecycle
        emb.select(col("vec_id").cast("long"),
          lit("none").as("phase")).limit(0)
      } else {
      val qArr = row0.get
      val q = qArr.map(_.toDouble).toSeq
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ivf_up").toString
      // planes=6 (64 buckets): at this corpus size the lifecycle is
      // file-count bound (build + 2 probes + compact each touch every
      // occupied bucket file); nprobe=256 >= buckets keeps both probes
      // exhaustive-exact, so results are identical to the planes=8 run
      Similarity.ivfBuildIndex(plantedAnnCorpus(emb), dir, planes = 6)
      import s.implicits._
      // delete planted copies 1,3,5,7,9; update copies 2,4 onto the
      // query point; insert two exact matches with fresh ids
      val dels = Seq(1, 3, 5, 7, 9)
        .map(i => (200000L + i, qArr, "delete"))
      val upds = Seq(2, 4).flatMap(i => Seq(
        (200000L + i, qArr, "delete"), (200000L + i, qArr, "insert")))
      val ins = Seq((300001L, qArr, "insert"), (300002L, qArr, "insert"))
      Similarity.ivfUpsert(s, dir,
        (dels ++ upds ++ ins).toDF("vec_id", "embedding", "change"))
      val live = Similarity.ivfProbe(s, dir, q, k = 8, nprobe = 256)
        .select(col("vec_id").cast("long").as("vec_id"))
        .withColumn("phase", lit("maintained")).collect()
      Similarity.ivfCompact(s, dir)
      val compacted = Similarity.ivfProbe(s, dir, q, k = 8, nprobe = 256)
        .select(col("vec_id").cast("long").as("vec_id"))
        .withColumn("phase", lit("compacted"))
      Engine.collectAndClean(
        compacted.sparkSession.createDataFrame(
            compacted.sparkSession.sparkContext.parallelize(live.toSeq, 1),
            compacted.schema)
          .unionByName(compacted)
          .orderBy("phase", "vec_id"), dir)
      }
    },
    Some("""WITH ids AS (
              SELECT CAST(0 AS BIGINT) AS vec_id        -- the query itself
              UNION ALL SELECT 200002 UNION ALL SELECT 200004  -- updated
              UNION ALL SELECT 300001 UNION ALL SELECT 300002  -- inserted
              UNION ALL SELECT 200006 UNION ALL SELECT 200008  -- survivors
              UNION ALL SELECT 200010)
            SELECT 'compacted' AS phase, vec_id FROM ids
            UNION ALL
            SELECT 'maintained', vec_id FROM ids
            ORDER BY phase, vec_id"""))

  /** Batched IVF probe: top-5 for a 10-query batch in one distributed
    * plan (no per-query driver round-trip) against the same persisted
    * index as q_embed_ivf_topk. Expected per-query result: the query
    * vector itself plus its 4 nearest planted copies. */
  val q_embed_ivf_batch = QuerySpec(
    "q_embed_ivf_batch", Seq("E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      val dir = annIndexDir(d)
      if (!Similarity.isBuilt(dir))
        Similarity.ivfBuildIndexKMeans(plantedAnnCorpus(emb), dir)
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfProbeBatch(s, dir, queries, k = 5)
        .select(col("qid").cast("long"), col("vec_id").cast("long"))
        .orderBy("qid", "vec_id")
    },
    Some("""WITH q AS (SELECT CAST(vec_id AS BIGINT) AS qid
                       FROM embeddings WHERE vec_id < 10),
            e AS (SELECT qid, qid AS vec_id FROM q
                  UNION ALL
                  SELECT qid, 200000 + qid*100 + i FROM q, range(1, 5) t(i))
            SELECT qid, CAST(vec_id AS BIGINT) AS vec_id
            FROM e ORDER BY qid, vec_id"""))

  /** Product-quantization two-stage search over the planted corpus:
    * 8-byte codes scanned by ADC, overfetched candidates re-ranked by
    * exact cosine; the rerank must recover the planted true top-10. */
  val q_embed_pq_topk = QuerySpec(
    "q_embed_pq_topk", Seq("E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      queryVec0(emb) match {
        case None => emb.select(col("vec_id").cast("long")).limit(0)
        case Some(q) =>
          val all = plantedAnnCorpus(emb)
          val cb = Similarity.pqTrain(emb)
          val codes = Similarity.pqEncodeTable(all, cb)
          Similarity.pqTopKRerank(all, codes, cb, q, k = 10)
            .select(col("vec_id").cast("long")).orderBy("vec_id")
      }
    },
    Some(s"""SELECT vec_id FROM ($duckTop10Q0) ORDER BY vec_id"""))

  /** IVF-PQ probe: partition-pruned buckets × 8-byte ADC codes, then
    * exact rerank of the overfetched candidates — the FAISS-style
    * composition over the same persisted k-means index as
    * q_embed_ivf_topk. */
  val q_embed_ivfpq_topk = QuerySpec(
    "q_embed_ivfpq_topk", Seq("E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      queryVec0(emb) match {
        case None => emb.select(col("vec_id").cast("long")).limit(0)
        case Some(q) =>
          val dir = annIndexDir(d)
          if (!Similarity.isBuilt(dir))
            Similarity.ivfBuildIndexKMeans(plantedAnnCorpus(emb), dir)
          val cb = Similarity.pqTrain(emb)
          if (!Similarity.isBuilt(dir, "codes"))
            Similarity.ivfPqBuild(s, dir, cb)
          Similarity.ivfPqProbe(s, dir, cb, q, k = 10)
            .select(col("vec_id").cast("long")).orderBy("vec_id")
      }
    },
    Some(s"""SELECT vec_id FROM ($duckTop10Q0) ORDER BY vec_id"""))

  /** SemDeDup semantic dedup: planted near-identical vectors (same
    * construction as q_dedup_embedding) must be dropped, originals
    * kept. The SURVIVOR SET is engine-independent — semanticDedup
    * keeps the min id of each dup pair, planted ids are all
    * originals+100000, and no original pair clears the 0.99 cosine
    * threshold (background max ~0.46) — so the oracle states it
    * exactly: every original id, no planted id. Soft top-2 cluster
    * assignment makes the catch deterministic even when a planted
    * pair straddles a k-means cell boundary (which a hard-assignment
    * run hit at sf0.1). */
  val q_dedup_semantic = QuerySpec(
    "q_dedup_semantic", Seq("E-dedup", "E-sim"),
    (s, d) => {
      val emb = Engine.table(s, d, "embeddings")
      val planted = emb.filter(col("vec_id") < 50)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), x => x + lit(0.005f)).as("embedding"),
          col("label"))
      Dedup.semanticDedup(emb.unionByName(planted),
          nClusters = 16, threshold = 0.99)
        .select(col("vec_id").cast("long")).orderBy("vec_id")
    },
    Some("""SELECT CAST(vec_id AS BIGINT) AS vec_id
            FROM embeddings ORDER BY vec_id"""))

  // ----------------------------------------------------------- multimodal

  /** Binary media plumbing: payload bytes → per-partition stub decode →
    * fixed-width features. feature_l1 (histogram mass) == payload byte
    * count, which the oracle checks independently. */
  val q_multimodal_features = QuerySpec(
    "q_multimodal_features", Seq("E-mm"),
    (s, d) => {
      val media = Multimodal.asMediaTable(
        Engine.table(s, d, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("n_bytes").cast("long").as("n_bytes"),
          aggregate(col("feature"), lit(0.0),
            (acc, x) => acc + x.cast("double")).cast("long").as("feature_l1"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
                   octet_length(encode(text)) AS n_bytes,
                   octet_length(encode(text))::BIGINT AS feature_l1
            FROM documents ORDER BY media_id"""))

  /** Video-style frame sampling plumbing: payload treated as
    * fixed-width frames, every 4th frame emitted as its own row (the
    * row-multiplying half of multimodal processing). Restricted to
    * ASCII payloads (`length == octet_length`) so the sampled frames
    * can round-trip to strings for engine-neutral oracle comparison —
    * byte framing itself is encoding-agnostic. */
  val q_multimodal_frames = QuerySpec(
    "q_multimodal_frames", Seq("E-mm", "X3"),
    (s, d) => {
      val ascii = Engine.table(s, d, "documents")
        .filter(length(col("text")) === octet_length(col("text")))
      val media = Multimodal.asMediaTable(ascii, "doc_id", "text")
      Multimodal.sampleFrames(media, frameBytes = 64, everyNth = 4)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          decode(col("frame"), "UTF-8").as("frame"))
        .orderBy("media_id", "frame_idx")
    },
    Some("""WITH d AS (
              SELECT doc_id, text FROM documents
              WHERE length(text) = octet_length(CAST(text AS BLOB))),
            n AS (
              SELECT doc_id, text,
                     CAST(floor(length(text)/64) AS BIGINT) AS nf FROM d),
            idx AS (SELECT i FROM range(0, 100000) t(i) WHERE i % 4 = 0)
            SELECT doc_id AS media_id, i AS frame_idx,
                   substring(text, CAST(i*64+1 AS BIGINT),
                             CAST(64 AS BIGINT)) AS frame
            FROM n JOIN idx ON i < nf
            ORDER BY media_id, frame_idx"""))

  /** REAL image decode end-to-end: plant one uncompressed 24-bit BMP
    * per document (gradient channels derived from doc_id), run it
    * through the production feature path, and check the decoded
    * dimensions and exact per-channel pixel sums against closed-form
    * oracle arithmetic. feature(0) = 1 proves every row took the real
    * codec path, not the stub fallback. */
  val q_multimodal_decode_bmp = QuerySpec(
    "q_multimodal_decode_bmp", Seq("E-mm"),
    (s, d) => {
      val mkBmp = udf { id: Long =>
        val w = (2 + id % 7).toInt
        val h = (1 + id % 5).toInt
        MediaCodec.encodeBmp24(w, h, (x, y) => (
          (id % 200).toInt + x,
          ((id * 3) % 200).toInt + y,
          ((id * 7) % 250).toInt))
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        lit("image/bmp").as("media_type"),
        mkBmp(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("long").as("kind"),
          element_at(col("feature"), 2).cast("long").as("width"),
          element_at(col("feature"), 3).cast("long").as("height"),
          element_at(col("feature"), 4).cast("long").as("sum_r"),
          element_at(col("feature"), 5).cast("long").as("sum_g"),
          element_at(col("feature"), 6).cast("long").as("sum_b"))
        .orderBy("media_id")
    },
    Some("""WITH g AS (SELECT doc_id,
                 2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
               FROM documents)
            SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS kind,
                   CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(h * (w * (doc_id % 200) + w*(w-1)/2) AS BIGINT)
                     AS sum_r,
                   CAST(w * (h * ((doc_id*3) % 200) + h*(h-1)/2) AS BIGINT)
                     AS sum_g,
                   CAST(w * h * ((doc_id*7) % 250) AS BIGINT) AS sum_b
            FROM g ORDER BY media_id"""))

  /** REAL compressed-image decode end-to-end: plant one
    * deflate-compressed truecolor PNG per document (gradient channels
    * derived from doc_id — same closed forms as the BMP fixture, so
    * the oracle arithmetic is shared), decode through the production
    * feature path (zlib inflate + filter reconstruction + CRC
    * verification), and check dims + exact channel sums. */
  val q_multimodal_decode_png = QuerySpec(
    "q_multimodal_decode_png", Seq("E-mm"),
    (s, d) => {
      val mkPng = udf { id: Long =>
        val w = (2 + id % 7).toInt
        val h = (1 + id % 5).toInt
        MediaCodec.encodePng(w, h, (x, y) => (
          (id % 200).toInt + x,
          ((id * 3) % 200).toInt + y,
          ((id * 7) % 250).toInt))
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        lit("image/png").as("media_type"),
        mkPng(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("long").as("kind"),
          element_at(col("feature"), 2).cast("long").as("width"),
          element_at(col("feature"), 3).cast("long").as("height"),
          element_at(col("feature"), 4).cast("long").as("sum_r"),
          element_at(col("feature"), 5).cast("long").as("sum_g"),
          element_at(col("feature"), 6).cast("long").as("sum_b"))
        .orderBy("media_id")
    },
    Some("""WITH g AS (SELECT doc_id,
                 2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h
               FROM documents)
            SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS kind,
                   CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(h * (w * (doc_id % 200) + w*(w-1)/2) AS BIGINT)
                     AS sum_r,
                   CAST(w * (h * ((doc_id*3) % 200) + h*(h-1)/2) AS BIGINT)
                     AS sum_g,
                   CAST(w * h * ((doc_id*7) % 250) AS BIGINT) AS sum_b
            FROM g ORDER BY media_id"""))

  /** REAL JPEG decode end-to-end through the JDK ImageIO path: plant
    * one uniform GRAYSCALE JPEG per document (quality 1.0). Uniform
    * gray is the provably-lossless corner of the lossy codec — the
    * YCbCr roundtrip is the identity for r=g=b and a constant block's
    * DC-only DCT quantizes losslessly — so dims AND exact channel sums
    * are closed-form oracle arithmetic, same strength as the BMP/PNG
    * decode oracles. feature(0) = 1 proves the real codec path. */
  val q_multimodal_decode_jpeg = QuerySpec(
    "q_multimodal_decode_jpeg", Seq("E-mm"),
    (s, d) => {
      val mkJpg = udf { id: Long =>
        val w = (2 + id % 7).toInt
        val h = (1 + id % 5).toInt
        val v = ((id * 11) % 256).toInt
        MediaCodec.encodeJpeg(w, h, (_, _) => (v, v, v))
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        lit("image/jpeg").as("media_type"),
        mkJpg(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("long").as("kind"),
          element_at(col("feature"), 2).cast("long").as("width"),
          element_at(col("feature"), 3).cast("long").as("height"),
          element_at(col("feature"), 4).cast("long").as("sum_r"),
          element_at(col("feature"), 5).cast("long").as("sum_g"),
          element_at(col("feature"), 6).cast("long").as("sum_b"))
        .orderBy("media_id")
    },
    Some("""WITH g AS (SELECT doc_id,
                 2 + doc_id % 7 AS w, 1 + doc_id % 5 AS h,
                 (doc_id * 11) % 256 AS v
               FROM documents)
            SELECT doc_id AS media_id, CAST(1 AS BIGINT) AS kind,
                   CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
                   CAST(w * h * v AS BIGINT) AS sum_r,
                   CAST(w * h * v AS BIGINT) AS sum_g,
                   CAST(w * h * v AS BIGINT) AS sum_b
            FROM g ORDER BY media_id"""))

  /** REAL video decode end-to-end — the last lake-mandate modality
    * (reference docs/数据湖.md:4 "二进制(图像、音频、视频)"): plant one
    * strict MJPEG/AVI per document (2-5 uniform-grayscale quality-1.0
    * JPEG frames — the provably lossless corner, see
    * [[q_multimodal_decode_jpeg]]), demux through the production RIFF
    * parser ([[MediaCodec.aviMjpegFrames]]), decode every frame
    * through the production JPEG path, and check frame count,
    * geometry, and exact cross-frame channel sums against closed-form
    * oracle arithmetic. n_decoded == n_frames proves no frame fell
    * out of the real codec path. */
  val q_multimodal_decode_video = QuerySpec(
    "q_multimodal_decode_video", Seq("E-mm"),
    (s, d) => {
      val mkAvi = udf { id: Long =>
        val w = (2 + id % 7).toInt
        val h = (1 + id % 5).toInt
        val f = (2 + id % 4).toInt
        MediaCodec.encodeAviMjpeg(w, h, (0 until f).map { i =>
          val v = ((id * 11 + i * 31) % 256).toInt
          MediaCodec.encodeJpeg(w, h, (_, _) => (v, v, v))
        })
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        lit("video/avi").as("media_type"),
        mkAvi(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.videoSummary(media)
        .select(col("media_id"),
          col("n_frames").cast("long").as("n_frames"),
          col("n_decoded").cast("long").as("n_decoded"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("sum_r"), col("sum_g"), col("sum_b"))
        .orderBy("media_id")
    },
    Some("""WITH g AS (SELECT doc_id, 2 + doc_id % 7 AS w,
                 1 + doc_id % 5 AS h, 2 + doc_id % 4 AS f
               FROM documents),
            fr AS (SELECT doc_id, w, h, f,
                     (doc_id * 11 + i * 31) % 256 AS v
                   FROM g, LATERAL unnest(range(0, f)) t(i))
            SELECT doc_id AS media_id,
                   CAST(f AS BIGINT) AS n_frames,
                   CAST(f AS BIGINT) AS n_decoded,
                   CAST(w AS BIGINT) AS width,
                   CAST(h AS BIGINT) AS height,
                   CAST(SUM(w * h * v) AS BIGINT) AS sum_r,
                   CAST(SUM(w * h * v) AS BIGINT) AS sum_g,
                   CAST(SUM(w * h * v) AS BIGINT) AS sum_b
            FROM fr GROUP BY doc_id, f, w, h ORDER BY media_id"""))

  /** REAL audio decode end-to-end: plant one PCM-16 WAV square wave
    * per document (amplitude/rate/length derived from doc_id), decode
    * through the production feature path, and check format fields and
    * the exact absolute-amplitude sum. feature(0) = 2 proves the real
    * codec path. */
  val q_multimodal_decode_wav = QuerySpec(
    "q_multimodal_decode_wav", Seq("E-mm"),
    (s, d) => {
      val mkWav = udf { id: Long =>
        val amp = (100 * (1 + id % 50)).toShort
        val n = (64 + (id % 8) * 16).toInt
        val rate = (8000 + (id % 4) * 4000).toInt
        val samples = Array.tabulate[Short](n)(i =>
          if (i % 2 == 0) amp else (-amp).toShort)
        MediaCodec.encodeWavPcm16(rate, 1, samples)
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        lit("audio/wav").as("media_type"),
        mkWav(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.extractFeatures(media)
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("long").as("kind"),
          element_at(col("feature"), 2).cast("long").as("sample_rate"),
          element_at(col("feature"), 3).cast("long").as("channels"),
          element_at(col("feature"), 4).cast("long").as("n_frames"),
          element_at(col("feature"), 5).cast("long").as("sum_abs"),
          element_at(col("feature"), 6).cast("long").as("max_abs"))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id, CAST(2 AS BIGINT) AS kind,
                   CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
                   CAST(1 AS BIGINT) AS channels,
                   CAST(64 + (doc_id % 8) * 16 AS BIGINT) AS n_frames,
                   CAST((100 * (1 + doc_id % 50)) *
                        (64 + (doc_id % 8) * 16) AS BIGINT) AS sum_abs,
                   CAST(100 * (1 + doc_id % 50) AS BIGINT) AS max_abs
            FROM documents ORDER BY media_id"""))

  /** Audio SIGNAL features ([[Multimodal.audioToneFeatures]]): per
    * document a planted mono square wave — half-period H = 1+id%8,
    * amplitude 500+(id%5)*250, n = 320+(id%7)*32 samples at 8 kHz —
    * and the operator recovers (a) the zero-crossing count, integer
    * exact, closed form (n-1)//H, and (b) the DOMINANT TONE via a
    * Goertzel probe bank over all eight candidate fundamentals
    * (DTMF-style detection; the fundamental beats any odd harmonic
    * pickup by ≥9× in power and leakage by ≥80×, so the argmax is the
    * planted index). Raw double powers never leave the executor —
    * only integer outputs surface, so DuckDB states both columns in
    * closed form. */
  val q_multimodal_audio_features = QuerySpec(
    "q_multimodal_audio_features", Seq("E-mm"),
    (s, d) => {
      val mkWav = udf { id: Long =>
        val h = (1 + id % 8).toInt
        val amp = (500 + (id % 5) * 250).toShort
        val n = (320 + (id % 7) * 32).toInt
        val samples = Array.tabulate[Short](n)(i =>
          if ((i / h) % 2 == 0) amp else (-amp).toShort)
        MediaCodec.encodeWavPcm16(8000, 1, samples)
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        mkWav(col("doc_id")).as("payload"))
      Multimodal.audioToneFeatures(media,
          (1 to 8).map(h => 8000.0 / (2 * h)))
        .orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id,
                   CAST((320 + (doc_id % 7) * 32 - 1)
                        // (1 + doc_id % 8) AS BIGINT) AS zcr,
                   CAST(doc_id % 8 AS BIGINT) AS dominant
            FROM documents ORDER BY media_id"""))

  /** Perceptual near-dup IMAGE dedup end-to-end across ALL THREE
    * containers: plant one real image per document whose CONTENT is
    * keyed by `doc_id % 25` — each class is a grayscale gradient with
    * a class-specific x-frequency, carried as an uncompressed BMP
    * (id%3=0), a zlib-compressed PNG with a uniform +3 brightness
    * shift (id%3=1), or a LOSSY quality-1.0 JPEG (id%3=2). Different
    * bytes, different containers, same picture; byte equality never
    * fires. The dHash is container-independent: integer-exact for the
    * lossless pair and for the brightness shift, and stable through
    * the JPEG roundtrip because the fixture is grayscale (no chroma
    * error) with x-steps of ≥17 gray levels (≥51 in r+g+b luma) at
    * every sample comparison — orders of magnitude above quality-1.0
    * reconstruction error. Survivor set closed-form: the min doc_id
    * of each class. Decode is map-only; the dedup is one exchange on
    * the 8-byte hash — the exact-dedup cost class at any corpus
    * size. */
  val q_multimodal_phash_dedup = QuerySpec(
    "q_multimodal_phash_dedup", Seq("E-mm", "E-dedup", "U5"),
    (s, d) => {
      val mkImg = udf { id: Long =>
        val cls = (id % 25).toInt
        val w = 9 + cls % 5
        val h = 8 + cls % 4
        val shift = if (id % 3 == 1) 3 else 0
        // class-distinct x-step (17 + 2*cls: no two classes share a
        // gradient); mod-199 wraps keep every adjacent-sample luma
        // difference at least 17 gray levels from zero
        val px = (x: Int, y: Int) => {
          val g = (cls * 53 + x * (17 + 2 * cls) + y * 18) % 199 + shift
          (g, g, g)
        }
        (id % 3) match {
          case 0 => MediaCodec.encodeBmp24(w, h, px)
          case 1 => MediaCodec.encodePng(w, h, px)
          case _ => MediaCodec.encodeJpeg(w, h, px)
        }
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        when(col("doc_id") % 3 === 0, "image/bmp")
          .when(col("doc_id") % 3 === 1, "image/png")
          .otherwise("image/jpeg").as("media_type"),
        mkImg(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.imageDedup(media)
        .select(col("media_id")).orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id FROM documents d
            WHERE doc_id = (SELECT min(doc_id) FROM documents d2
                            WHERE d2.doc_id % 25 = d.doc_id % 25)
            ORDER BY media_id"""))

  /** Gain-invariant AUDIO dedup end-to-end, the WAV twin of
    * [[q_multimodal_phash_dedup]]: one PCM-16 waveform per document
    * keyed by `doc_id % 25` (class-specific period/phase/length), odd
    * ids carrying an exact ×3 gain (different bytes, same sound
    * shape; no clipping, so the envelope hash's integer
    * gain-invariance holds by proof —
    * [[graft.operators.MediaCodec.wavEnvelopeHash64]]). Survivor set
    * closed-form: the min doc_id per class. */
  val q_multimodal_audio_dedup = QuerySpec(
    "q_multimodal_audio_dedup", Seq("E-mm", "E-dedup", "U5"),
    (s, d) => {
      val mkWav = udf { id: Long =>
        val cls = (id % 25).toInt
        val gain = if (id % 2 == 1) 3 else 1
        val n = 130 + (cls % 7) * 13
        val samples = Array.tabulate[Short](n) { i =>
          val base = ((i * (3 + cls % 5) + cls * 17) % 351) - 175
          (base * gain).toShort
        }
        MediaCodec.encodeWavPcm16(8000 + (cls % 3) * 4000, 1, samples)
      }
      val media = Engine.table(s, d, "documents").select(
        col("doc_id").cast("long").as("media_id"),
        lit("audio/wav").as("media_type"),
        mkWav(col("doc_id")).as("payload"),
        map().cast("map<string,string>").as("meta"))
      Multimodal.audioDedup(media)
        .select(col("media_id")).orderBy("media_id")
    },
    Some("""SELECT doc_id AS media_id FROM documents d
            WHERE doc_id = (SELECT min(doc_id) FROM documents d2
                            WHERE d2.doc_id % 25 = d.doc_id % 25)
            ORDER BY media_id"""))

  val all: Seq[QuerySpec] = Seq(
    q_text_token_stats, q_text_token_budget, q_text_quality,
    q_text_langid, q_text_fingerprint, q_text_normalize,
    q_corpus_clean, q_decontaminate,
    q_dedup_exact, q_dedup_minhash_lsh, q_dedup_ngram_block,
    q_dedup_fuzzy, q_dedup_fuzzy_capped, q_dedup_fuzzy_default,
    q_dedup_incremental, q_dedup_embed_incremental, q_dedup_simhash,
    q_dedup_winnow,
    q_dedup_embedding, q_embed_topk_bruteforce, q_embed_knn_lsh,
    q_embed_ivf_topk, q_embed_ivf_batch, q_embed_ivf_upsert,
    q_embed_pq_topk,
    q_embed_ivfpq_topk, q_dedup_semantic, q_multimodal_features,
    q_multimodal_frames, q_multimodal_decode_bmp,
    q_multimodal_decode_png, q_multimodal_decode_jpeg,
    q_multimodal_decode_video, q_multimodal_decode_wav,
    q_multimodal_audio_features,
    q_multimodal_phash_dedup, q_multimodal_audio_dedup)
}
