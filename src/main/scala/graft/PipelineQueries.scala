package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling, TextOps, Warehouse}

/** Round-4 pipeline conformance queries: dedup clustering (connected
  * components), bucketed co-located joins, deterministic sampling /
  * dataset splits, document chunking, PII scrubbing, and vocabulary
  * building — the curation steps a training-data pipeline runs between
  * raw corpus and tokenizer, each oracle-checked against DuckDB.
  */
object PipelineQueries {

  /** DuckDB word-bigram shingle set (mirrors [[Dedup.wordShingles]]). */
  private val duckBigrams =
    """SELECT doc_id, list_distinct(list_transform(
         range(1, greatest(len(w)-1, 1)+1),
         i -> concat_ws(' ', w[i], w[i+1]))) AS sh
       FROM (SELECT doc_id, string_split(text, ' ') AS w
             FROM documents)"""

  /** Brute-force jaccard >= 0.8 pairs in posting-list form (see
    * TextQueries.duckJaccardCtes for the equivalence argument) — the
    * all-pairs list_intersect form was infeasible in DuckDB at the
    * sf0.1 oracle sweep. */
  private val duckPairCtes =
    s"""sh_t AS ($duckBigrams),
        n_t AS (SELECT doc_id, len(sh) AS n FROM sh_t),
        u_t AS (SELECT doc_id, unnest(sh) AS g FROM sh_t),
        p AS (
          SELECT c.id_a, c.id_b
          FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       COUNT(*) AS common
                FROM u_t a JOIN u_t b
                  ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2) c
          JOIN n_t na ON c.id_a = na.doc_id
          JOIN n_t nb ON c.id_b = nb.doc_id
          WHERE c.common::DOUBLE /
                (na.n + nb.n - c.common)::DOUBLE >= 0.8)"""

  /** Near-dup pairs → connected components → (id, cluster_id). The
    * Spark side chains [[Dedup.minHashLshPairs]] (recall ≈ 1 at j>=0.8
    * with 16 bands × 3 rows — the math is pinned at
    * [[TextQueries.q_dedup_minhash_lsh]]) into
    * [[Dedup.connectedComponents]]; the oracle computes brute-force
    * Jaccard pairs and closes them transitively with a recursive CTE.
    * cluster_id = min doc_id of the component on both sides. */
  val q_dedup_cluster = QuerySpec(
    "q_dedup_cluster", Seq("E-dedup"),
    (s, d) => Dedup.connectedComponents(
        Dedup.minHashLshPairs(Engine.table(s, d, "documents"),
          numHashes = 48, bands = 16, threshold = 0.8))
      .orderBy("id"),
    Some(s"""WITH RECURSIVE
             $duckPairCtes,
             e AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION ALL SELECT id_b, id_a FROM p),
             reach AS (
               SELECT src AS id, src AS r FROM e
               UNION
               SELECT e.src AS id, reach.r
               FROM e JOIN reach ON reach.id = e.dst)
             SELECT id, CAST(MIN(r) AS BIGINT) AS cluster_id
             FROM reach GROUP BY id ORDER BY id"""))

  /** Cluster-aware dedup end-to-end: drop every non-canonical member
    * of each near-dup cluster, keep everything else. Proves the
    * pairs → components → anti-join composition, not just each stage. */
  val q_dedup_cluster_keep = QuerySpec(
    "q_dedup_cluster_keep", Seq("E-dedup"),
    (s, d) => {
      val docs = Engine.table(s, d, "documents")
      Dedup.keepCanonicalPerCluster(docs,
          Dedup.minHashLshPairs(docs, numHashes = 48, bands = 16,
            threshold = 0.8))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },
    Some(s"""WITH RECURSIVE
             $duckPairCtes,
             e AS (SELECT id_a AS src, id_b AS dst FROM p
                   UNION ALL SELECT id_b, id_a FROM p),
             reach AS (
               SELECT src AS id, src AS r FROM e
               UNION
               SELECT e.src AS id, reach.r
               FROM e JOIN reach ON reach.id = e.dst),
             drop_ids AS (
               SELECT id FROM reach GROUP BY id
               HAVING id <> MIN(r))
             SELECT doc_id, source, n_chars FROM documents
             WHERE doc_id NOT IN (SELECT id FROM drop_ids)
             ORDER BY doc_id"""))

  /** Bucketed co-located join: both sides written bucketed+sorted on
    * the join key ([[Warehouse.writeBucketed]]), joined with ZERO
    * exchanges (asserted in PlanShapeSpec) — the pre-paid-shuffle
    * layout for a nightly 100 TB fact-dim join. Tables build once per
    * scale dir (first use), probe-only afterwards, mirroring how a
    * warehouse amortizes the layout cost across every downstream
    * query. The oracle joins the raw parquet — results must be
    * identical; only the plan differs. */
  val q_bucketed_join = QuerySpec(
    "q_bucketed_join", Seq("J1", "S4"),
    (s, d) => {
      Engine.registerAll(s, d)
      s.sql("CREATE DATABASE IF NOT EXISTS dws")
      val suf = d.replaceAll("[^A-Za-z0-9]", "_")
      val li = s"dws.bj_lineitem_$suf"
      val ord = s"dws.bj_orders_$suf"
      if (!s.catalog.tableExists(li))
        Warehouse.writeBucketed(Engine.table(s, d, "lineitem")
          .select("l_orderkey", "l_quantity"), li, "l_orderkey", 8)
      if (!s.catalog.tableExists(ord))
        Warehouse.writeBucketed(Engine.table(s, d, "orders")
          .select("o_orderkey", "o_orderpriority"), ord, "o_orderkey", 8)
      s.table(li)
        .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          graft.functions.dsum2(col("l_quantity")).as("qty"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                     AS qty
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Deterministic stratified sample: 5 docs per source, chosen by
    * salted md5 rank ([[Sampling.stratifiedSample]]) on the
    * bounded-heap TopKPerGroup operator — reproducible on any cluster
    * size, and the oracle draws the IDENTICAL sample. */
  val q_sample_stratified = QuerySpec(
    "q_sample_stratified", Seq("P12", "A12"),
    (s, d) => Sampling.stratifiedSample(
        Engine.table(s, d, "documents"), Seq("source"), k = 5)
      .select("source", "doc_id")
      .orderBy("source", "doc_id"),
    Some("""SELECT source, doc_id FROM (
              SELECT source, doc_id,
                     row_number() OVER (PARTITION BY source
                       ORDER BY md5(doc_id::VARCHAR || 'graft')) AS rn
              FROM documents) x
            WHERE rn <= 5 ORDER BY source, doc_id"""))

  /** Weighted sampling without replacement ([[Sampling.weightedSample]],
    * Efraimidis-Spirakis exponential race on the salted content hash):
    * 8 docs per source ∝ n_chars. The oracle recomputes the race key
    * -ln((h52+1)/2^52)/w from the same md5 prefix — h52 is 52 bits, so
    * the uniform draw is EXACT in both engines, and the ln/div are
    * ~1-ulp while adjacent order-statistic gaps are ~1/n, so selection
    * is engine-stable. Per-stratum selection runs on the TopKPerGroup
    * bounded heap (no window sort — a hot stratum never funnels into
    * one task). */
  val q_weighted_sample = QuerySpec(
    "q_weighted_sample", Seq("P12", "A12"),
    (s, d) => Sampling.weightedSample(
        Engine.table(s, d, "documents"), k = 8,
        weightCol = col("n_chars"), strataCols = Seq("source"))
      .select("source", "doc_id", "n_chars")
      .orderBy("source", "doc_id"),
    Some("""SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     row_number() OVER (PARTITION BY source ORDER BY
                       -ln((CAST(('0x' || substr(
                           md5(doc_id::VARCHAR || 'graft'), 1, 13))
                           AS BIGINT) + 1) / 4503599627370496.0)
                       / n_chars) AS rn
              FROM documents WHERE n_chars > 0) x
            WHERE rn <= 8 ORDER BY source, doc_id"""))

  /** Train/val/test split assignment ([[Sampling.assignSplit]]): pure
    * projection, disjoint-and-exhaustive by construction, identical
    * row sets in any engine with md5. Checked as per-split count +
    * id-sum (an order-free set digest). */
  val q_split_assign = QuerySpec(
    "q_split_assign", Seq("P12"),
    (s, d) => Sampling.assignSplit(
        Engine.table(s, d, "documents"), trainFrac = 0.8, valFrac = 0.1)
      .groupBy("split")
      .agg(count(lit(1)).as("n"),
        sum(col("doc_id")).as("sum_id"))
      .orderBy("split"),
    Some(s"""SELECT split, COUNT(*) AS n,
                    CAST(SUM(doc_id) AS BIGINT) AS sum_id FROM (
               SELECT doc_id,
                 CASE WHEN substring(md5(doc_id::VARCHAR || 'graft'), 1, 4)
                        < '${Sampling.hex4(0.8)}' THEN 'train'
                      WHEN substring(md5(doc_id::VARCHAR || 'graft'), 1, 4)
                        < '${Sampling.hex4(0.9)}' THEN 'val'
                      ELSE 'test' END AS split
               FROM documents) x
             GROUP BY split ORDER BY split"""))

  /** Token-window chunking ([[TextOps.chunkDocuments]]): 64-token
    * chunks, 16-token overlap (stride 48). Chunk content checked by
    * md5 fingerprint so the oracle proves byte-identical chunk text
    * without hauling it through the diff. */
  val q_chunk_docs = QuerySpec(
    "q_chunk_docs", Seq("E-text", "X3"),
    (s, d) => TextOps.chunkDocuments(
        Engine.table(s, d, "documents"), chunkTokens = 64, overlap = 16)
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        col("n_tokens"), md5(col("chunk_text")).as("fp"))
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w,
                              len(string_split(text, ' ')) AS n
                       FROM documents),
                 x AS (SELECT doc_id, w,
                              unnest(range(0, 1 + CAST(ceil(
                                greatest(n - 64, 0) / 48.0) AS BIGINT)))
                                AS chunk_id
                       FROM w)
            SELECT doc_id, chunk_id,
                   CAST(len(w[(chunk_id*48+1):(chunk_id*48+64)]) AS BIGINT)
                     AS n_tokens,
                   md5(array_to_string(
                     w[(chunk_id*48+1):(chunk_id*48+64)], ' ')) AS fp
            FROM x ORDER BY doc_id, chunk_id"""))

  /** PII scrubbing ([[TextOps.scrubPii]]): the synthetic corpus is
    * PII-free, so both engines plant identical URL/email/long-number
    * strings on every 7th doc, then the redaction (and its evidence
    * counts) must agree — clean text compared by md5. */
  val q_pii_scrub = QuerySpec(
    "q_pii_scrub", Seq("E-text"),
    (s, d) => {
      val planted = Engine.table(s, d, "documents")
        .withColumn("text",
          when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" see https://ex.com/p/"),
              col("doc_id"), lit(" or u"), col("doc_id"),
              lit("@ex.org id 12345678")))
          .otherwise(col("text")))
      TextOps.scrubPii(planted)
        .select(col("doc_id"), col("n_urls"), col("n_emails"),
          col("n_long_nums"), md5(col("clean_text")).as("fp"))
        .orderBy("doc_id")
    },
    Some(s"""WITH planted AS (
               SELECT doc_id,
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' see https://ex.com/p/' ||
                           doc_id::VARCHAR || ' or u' ||
                           doc_id::VARCHAR || '@ex.org id 12345678'
                      ELSE text END AS text
               FROM documents),
             s1 AS (SELECT doc_id, text AS t0,
                      regexp_replace(text,
                        '${TextOps.urlPattern}', '<URL>', 'g') AS t1
                    FROM planted),
             s2 AS (SELECT doc_id, t0, t1,
                      regexp_replace(t1,
                        '${TextOps.emailPattern}', '<EMAIL>', 'g') AS t2
                    FROM s1)
             SELECT doc_id,
               CAST(len(regexp_extract_all(t0,
                 '${TextOps.urlPattern}')) AS BIGINT) AS n_urls,
               CAST(len(regexp_extract_all(t1,
                 '${TextOps.emailPattern}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(t2,
                 '${TextOps.longNumPattern}')) AS BIGINT) AS n_long_nums,
               md5(regexp_replace(t2,
                 '${TextOps.longNumPattern}', '<NUM>', 'g')) AS fp
             FROM s2 ORDER BY doc_id"""))

  /** Vocabulary build ([[TextOps.vocabulary]]): top-50 tokens by
    * term frequency with document frequency — partial-agg before the
    * shuffle, TakeOrdered for the cut. */
  val q_vocab_topk = QuerySpec(
    "q_vocab_topk", Seq("E-text", "A12", "A3"),
    (s, d) => TextOps.vocabulary(
      Engine.table(s, d, "documents"), topN = 50),
    Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
            FROM (SELECT doc_id,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                      AS token
                  FROM documents) x
            GROUP BY token ORDER BY tf DESC, token LIMIT 50"""))

  /** Z-order layout ([[graft.operators.Layout.writeZOrdered]]): events
    * rewritten clustered on (user_id, event_id % 4096), then a 2-D box
    * query against the clustered copy — results must equal the oracle's
    * box query on the raw table (the layout changes WHICH FILES a scan
    * visits, never the answer; the file-skipping win itself is measured
    * in PipelineSpec). Built once per scale dir, like the IVF index. */
  val q_zorder_box = QuerySpec(
    "q_zorder_box", Seq("S2", "P4"),
    (s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      // completion-marker guard, not dir-exists: the dir exists from
      // the first task commit, so a crashed build would otherwise be
      // mistaken for a complete one and silently skip files
      if (!graft.operators.Similarity.isBuilt(dir, "zorder")) {
        graft.operators.Layout.writeZOrdered(
          Engine.table(s, d, "events")
            .withColumn("y", pmod(col("event_id"), lit(4096))),
          dir, "user_id", "y", nFiles = 16)
        graft.operators.Similarity.markBuilt(dir, "zorder")
      }
      s.read.parquet(dir)
        .filter(col("user_id").between(100, 160) &&
          col("y").between(1000, 1300))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS sum_id
            FROM events
            WHERE user_id BETWEEN 100 AND 160
              AND (event_id % 4096) BETWEEN 1000 AND 1300
            GROUP BY event_type ORDER BY event_type"""))

  /** File-level inverted index ([[graft.operators.Layout.buildFileIndex]]
    * — the Druid 倒排/bitmap capability, docs/olap.md:35, at Spark's
    * file granularity): events rewritten range-clustered on user_id,
    * indexed, then an IN-predicate scan resolves its file set through
    * the index and reads only those paths. Results must equal the
    * oracle's plain scan (the index changes WHICH FILES are read,
    * never the answer; the pruning itself is asserted in
    * PipelineSpec). Built once per scale dir, like the IVF index. */
  val q_index_point = QuerySpec(
    "q_index_point", Seq("S2", "P6"),
    (s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_fileidx_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      if (!graft.operators.Similarity.isBuilt(dir, "fileidx")) {
        Engine.table(s, d, "events")
          .repartitionByRange(16, col("user_id"))
          .write.mode("overwrite").parquet(s"$dir/data")
        graft.operators.Layout.buildFileIndex(s, s"$dir/data", "user_id",
          s"$dir/idx")
        graft.operators.Similarity.markBuilt(dir, "fileidx")
      }
      graft.operators.Layout.indexedScan(s, s"$dir/data", s"$dir/idx",
          "user_id", Seq(5, 42, 97))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS sum_id
            FROM events WHERE user_id IN (5, 42, 97)
            GROUP BY event_type ORDER BY event_type"""))

  /** File-level min/max data-skipping ([[graft.operators.Layout
    * .buildFileStats]] — the Delta/Iceberg stats-table idea): a range
    * predicate on the clustering column resolves its file set through
    * the stats table (envelope intersection) and reads only those
    * paths. Shares the semantics check with a plain DuckDB range scan;
    * the pruning is asserted in PipelineSpec. */
  val q_index_range = QuerySpec(
    "q_index_range", Seq("S2", "P4"),
    (s, d) => {
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_filestats_" +
        d.replaceAll("[^A-Za-z0-9]", "_")
      if (!graft.operators.Similarity.isBuilt(dir, "filestats")) {
        Engine.table(s, d, "events")
          .repartitionByRange(16, col("user_id"))
          .write.mode("overwrite").parquet(s"$dir/data")
        graft.operators.Layout.buildFileStats(s, s"$dir/data", "user_id",
          s"$dir/stats")
        graft.operators.Similarity.markBuilt(dir, "filestats")
      }
      graft.operators.Layout.statsRangeScan(s, s"$dir/data", s"$dir/stats",
          "user_id", 100L, 160L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("sum_id"))
        .orderBy("event_type")
    },
    Some("""SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS sum_id
            FROM events WHERE user_id BETWEEN 100 AND 160
            GROUP BY event_type ORDER BY event_type"""))

  /** tf-idf distinctive terms ([[TextOps.distinctiveTerms]]): top-3
    * tokens per doc by tf*N/df (log-free idf — same ranking,
    * bitwise-reproducible score). */
  val q_tfidf_terms = QuerySpec(
    "q_tfidf_terms", Seq("E-text", "W6"),
    (s, d) => TextOps.distinctiveTerms(
        Engine.table(s, d, "documents").filter(col("doc_id") < 100), k = 3)
      .orderBy("doc_id", "token"),
    Some("""WITH t AS (SELECT doc_id,
                  unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                    AS token
                FROM documents WHERE doc_id < 100),
             tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                    FROM t GROUP BY 1, 2),
             idf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
                     FROM tf GROUP BY 1),
             n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
                   FROM documents WHERE doc_id < 100)
            SELECT doc_id, token, tf, df, score FROM (
              SELECT tf.doc_id, tf.token, tf.tf, idf.df,
                     (tf.tf * n.n_docs)::DOUBLE / idf.df::DOUBLE AS score,
                     row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY (tf.tf * n.n_docs)::DOUBLE /
                                idf.df::DOUBLE DESC, tf.token) AS rn
              FROM tf JOIN idf USING (token), n) x
            WHERE rn <= 3 ORDER BY doc_id, token"""))

  val all: Seq[QuerySpec] = Seq(
    q_dedup_cluster, q_dedup_cluster_keep, q_bucketed_join,
    q_sample_stratified, q_weighted_sample, q_split_assign,
    q_chunk_docs, q_pii_scrub,
    q_vocab_topk, q_zorder_box, q_index_point, q_index_range,
    q_tfidf_terms)
}
