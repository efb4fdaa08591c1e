package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Link-graph centrality conformance queries.
  *
  * The graph is planted ([[Graph.plantedLinkGraph]]): node ids are
  * customer keys, out-degrees cycle through (1,2,4,5) so their lcm is
  * 20 and the damping constant 0.85/20 = 0.0425 terminates — the
  * preconditions of [[Graph.pageRankExact]]'s bit-reproducible
  * arithmetic hold by construction, and the DuckDB oracle runs the
  * SAME three power-iteration rounds as three chained CTEs over the
  * same planted edges. Hash equality of (id, pr) across engines is
  * the proof the distributed join/aggregate recurrence is exact.
  */
object GraphQueries {

  /** Planted-graph damped PageRank, 3 exact iterations. */
  val q_link_pagerank = QuerySpec(
    "q_link_pagerank", Seq("J1", "J3", "A1", "A6", "X3"),
    (s, d) => {
      val edges = Graph.plantedLinkGraph(Engine.table(s, d, "customer"))
      Graph.pageRankExact(edges, iterations = 3)
        .orderBy("id")
    },
    Some("""WITH params AS (SELECT count(*) AS n FROM customer),
      e AS (
        SELECT c_custkey AS src,
               1 + (c_custkey*31 + t.j*97) % p.n AS dst
        FROM customer, params p, generate_series(1,5) AS t(j)
        WHERE t.j <= CASE c_custkey%4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                      WHEN 2 THEN 4 ELSE 5 END),
      nodes AS (SELECT DISTINCT src AS id FROM e
                UNION SELECT DISTINCT dst FROM e),
      d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      w AS (SELECT e.src, e.dst, CAST(20 // d.deg AS BIGINT) AS w
            FROM e JOIN d USING (src)),
      r0 AS (SELECT id, CAST(1.00 AS DECIMAL(18,2)) AS pr FROM nodes),
      r1 AS (SELECT nd.id, 0.15 + 0.0425 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT w.dst AS id, SUM(r0.pr * w.w) AS m
               FROM w JOIN r0 ON w.src = r0.id GROUP BY w.dst) c USING (id)),
      r2 AS (SELECT nd.id, 0.15 + 0.0425 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT w.dst AS id, SUM(r1.pr * w.w) AS m
               FROM w JOIN r1 ON w.src = r1.id GROUP BY w.dst) c USING (id)),
      r3 AS (SELECT nd.id, 0.15 + 0.0425 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT w.dst AS id, SUM(r2.pr * w.w) AS m
               FROM w JOIN r2 ON w.src = r2.id GROUP BY w.dst) c USING (id))
      SELECT id, CAST(pr AS DOUBLE) AS pr FROM r3 ORDER BY id"""))

  /** Centrality-gated curation: the planted link graph over document
    * ids, PageRank as the per-document quality weight, and a keep
    * decision at a fixed rank threshold — the CommonCrawl-style
    * "crawl-graph rank decides what enters the corpus" gate, joined
    * back onto the documents table. Inner join: rank nodes that are
    * not document ids (the one dst-only node) drop out. */
  val q_centrality_gate = QuerySpec(
    "q_centrality_gate", Seq("J1", "A1", "A6", "P3", "X3"),
    (s, d) => {
      val docs = Engine.table(s, d, "documents")
      val edges = Graph.plantedLinkGraph(docs, "doc_id")
      Graph.pageRankExact(edges, iterations = 3)
        .join(docs, col("id") === col("doc_id"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("pr"), (col("pr") >= 0.8).as("keep"))
        .orderBy("doc_id")
    },
    Some("""WITH params AS (SELECT count(*) AS n FROM documents),
      e AS (
        SELECT doc_id AS src,
               1 + (doc_id*31 + t.j*97) % p.n AS dst
        FROM documents, params p, generate_series(1,5) AS t(j)
        WHERE t.j <= CASE doc_id%4 WHEN 0 THEN 1 WHEN 1 THEN 2
                                   WHEN 2 THEN 4 ELSE 5 END),
      nodes AS (SELECT DISTINCT src AS id FROM e
                UNION SELECT DISTINCT dst FROM e),
      d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
      w AS (SELECT e.src, e.dst, CAST(20 // d.deg AS BIGINT) AS w
            FROM e JOIN d USING (src)),
      r0 AS (SELECT id, CAST(1.00 AS DECIMAL(18,2)) AS pr FROM nodes),
      r1 AS (SELECT nd.id, 0.15 + 0.0425 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT w.dst AS id, SUM(r0.pr * w.w) AS m
               FROM w JOIN r0 ON w.src = r0.id GROUP BY w.dst) c USING (id)),
      r2 AS (SELECT nd.id, 0.15 + 0.0425 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT w.dst AS id, SUM(r1.pr * w.w) AS m
               FROM w JOIN r1 ON w.src = r1.id GROUP BY w.dst) c USING (id)),
      r3 AS (SELECT nd.id, 0.15 + 0.0425 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT w.dst AS id, SUM(r2.pr * w.w) AS m
               FROM w JOIN r2 ON w.src = r2.id GROUP BY w.dst) c USING (id))
      SELECT doc_id, source, n_chars, CAST(pr AS DOUBLE) AS pr,
             CAST(pr AS DOUBLE) >= 0.8 AS keep
      FROM r3 JOIN documents ON r3.id = documents.doc_id
      ORDER BY doc_id"""))

  /** TextRank-family keyword extraction (Mihalcea & Tarau 2004) via
    * bit-exact truncated Katz centrality
    * ([[Graph.katzCentralityExact]]): the corpus token co-occurrence
    * graph (adjacent word pairs, undirected, BINARY adjacency — Katz's
    * classical form, which also keeps scores bounded by vocabulary
    * degree rather than corpus size), 3 exact decimal rounds at
    * α = 0.01, top 20 tokens. The oracle replays the identical chained
    * rounds in DuckDB decimal — hash equality proves the distributed
    * join/aggregate recurrence exact, as with q_link_pagerank. */
  val q_textrank_keywords = QuerySpec(
    "q_textrank_keywords", Seq("X3", "J1", "J3", "A1", "A6", "O5"),
    (s, d) => {
      val docs = Engine.table(s, d, "documents")
      val toks = docs.select(graft.functions.wordTokens(col("text"))
        .as("__w")).filter(size(col("__w")) >= 2)
      val bg = toks.select(explode(
        zip_with(slice(col("__w"), lit(1), size(col("__w")) - 1),
          slice(col("__w"), lit(2), size(col("__w")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
      val pairs = bg.select(
          substring_index(col("bg"), " ", 1).as("src"),
          substring_index(col("bg"), " ", -1).as("dst"))
        .filter(col("src") =!= col("dst"))
      val e = pairs
        .unionByName(pairs.select(col("dst").as("src"),
          col("src").as("dst")))
        .distinct()
        .withColumn("w", lit(1L))
      Graph.katzCentralityExact(e, iterations = 3, alpha = (1, 100))
        .orderBy(desc("pr"), asc("id"))
        .limit(20)
        .select(col("id").as("token"), col("pr").cast("double").as("score"))
    },
    Some("""WITH tok AS (SELECT regexp_extract_all(lower(text),
                           '[a-z0-9]+') AS w FROM documents),
      bg AS (SELECT unnest(list_transform(range(1, len(w)),
               i -> w[i] || ' ' || w[i+1])) AS bg
             FROM tok WHERE len(w) >= 2),
      p0 AS (SELECT split_part(bg, ' ', 1) AS src,
                    split_part(bg, ' ', 2) AS dst
             FROM bg WHERE split_part(bg, ' ', 1) <> split_part(bg, ' ', 2)),
      e AS (SELECT DISTINCT src, dst FROM
              (SELECT src, dst FROM p0
               UNION ALL SELECT dst, src FROM p0)),
      nodes AS (SELECT DISTINCT src AS id FROM e
                UNION SELECT DISTINCT dst FROM e),
      r0 AS (SELECT id, CAST(1.00 AS DECIMAL(18,2)) AS pr FROM nodes),
      r1 AS (SELECT nd.id, 1 + 0.01 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT e.dst AS id, SUM(r0.pr) AS m
               FROM e JOIN r0 ON e.src = r0.id GROUP BY e.dst) c USING (id)),
      r2 AS (SELECT nd.id, 1 + 0.01 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT e.dst AS id, SUM(r1.pr) AS m
               FROM e JOIN r1 ON e.src = r1.id GROUP BY e.dst) c USING (id)),
      r3 AS (SELECT nd.id, 1 + 0.01 * COALESCE(c.m, 0) AS pr
             FROM nodes nd LEFT JOIN (
               SELECT e.dst AS id, SUM(r2.pr) AS m
               FROM e JOIN r2 ON e.src = r2.id GROUP BY e.dst) c USING (id))
      SELECT id AS token, CAST(pr AS DOUBLE) AS score
      FROM r3 ORDER BY pr DESC, id LIMIT 20"""))

  def all: Seq[QuerySpec] =
    Seq(q_link_pagerank, q_centrality_gate, q_textrank_keywords)
}
