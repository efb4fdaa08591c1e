package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup operators on planted fixtures: exact copies, near-duplicates
  * with known overlap, and unrelated text. */
class DedupSpec extends SparkSuite {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today"
  private val near = // one word changed
    "the quick brown fox jumps over the lazy cat near the river bank today"
  private val other =
    "spark executes distributed dataframe plans with catalyst and tungsten"

  private lazy val docs = Seq(
    (0L, base, "s0"), (1L, base, "s0"),       // exact dup pair
    (2L, near, "s0"),                          // near dup of 0/1
    (3L, other, "s0"), (4L, "completely unrelated words here", "s1"))
    .toDF("doc_id", "text", "source")

  test("exactDedup keeps min-id row per identical text") {
    val kept = Dedup.exactDedup(docs).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(0L, 2L, 3L, 4L)))
  }

  test("exactDupGroups reports copy counts") {
    val g = Dedup.exactDupGroups(docs)
      .filter(col("n_copies") > 1).collect()
    assert(g.length == 1 && g(0).getAs[Long]("n_copies") == 2
      && g(0).getAs[Long]("keep_id") == 0)
  }

  test("minHashLshPairs finds exact and near dups, not unrelated") {
    val pairs = Dedup.minHashLshPairs(docs, numHashes = 32, bands = 16,
        threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)), "exact pair missed")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      "near pair missed")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "unrelated doc matched")
  }

  test("dedupAgainstCorpus: batch survivors exclude exact copies, " +
      "near-dups of the corpus, and batch-internal twins") {
    val corpus = Seq((0L, base, "s0"), (3L, other, "s0"))
      .toDF("doc_id", "text", "source")
    val batch = Seq(
      (10L, base, "s1"),   // exact copy of corpus 0 -> dropped
      (11L, near, "s1"),   // near-dup of corpus 0 (bigram j = 11/15) -> dropped
      (12L, "a fresh unrelated document about streaming windows", "s1"),
      (13L, "a fresh unrelated document about streaming windows", "s1"),
      (14L, "entirely new content with no corpus overlap at all", "s1"))
      .toDF("doc_id", "text", "source")
    val kept = Dedup.dedupAgainstCorpus(corpus, batch, threshold = 0.7)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 12 survives its twin 13 (keep-first); 14 is novel
    assert(kept.sameElements(Array(12L, 14L)), kept.mkString(","))
  }

  test("crossCorpusNearDupPairs reports batch->corpus pairs only") {
    val corpus = Seq((0L, base, "s0"), (3L, other, "s0"))
      .toDF("doc_id", "text", "source")
    val batch = Seq((10L, near, "s1"), (11L, "nothing shared", "s1"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.crossCorpusNearDupPairs(corpus, batch,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((10L, 0L)), pairs.toString)
  }

  test("minhash jaccard estimates true jaccard on the near pair") {
    val j = Dedup.minHashLshPairs(docs, threshold = 0.1)
      .filter(col("id_a") === 0 && col("id_b") === 2)
      .select("jaccard").head().getDouble(0)
    // bigram sets of base/near differ in 2 of 13 shingles: j = 11/15
    assert(j > 0.6 && j < 0.85, s"jaccard $j out of expected band")
  }

  test("simHashPairs: identical texts at hamming 0, near at small hamming") {
    val pairs = Dedup.simHashPairs(docs, maxHamming = 16).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Number]("hamming").longValue()))
      .toMap
    assert(pairs((0L, 1L)) == 0, "exact dup must hash identically")
    assert(pairs.get((0L, 2L)).exists(_ <= 16), "near dup outside hamming 16")
  }

  test("ngramJaccardPairs respects blocking") {
    val pairs = Dedup.ngramJaccardPairs(docs, blockCol = "source",
        threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs((0L, 1L)) && pairs((0L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "cross-block pair emitted")
  }

  test("embeddingNearDupPairs finds planted near-identical vectors") {
    val vecs = Seq(
      (0L, Array.tabulate(64)(i => math.sin(i).toFloat)),
      (1L, Array.tabulate(64)(i => math.sin(i).toFloat * 1.001f)), // ~same dir
      (2L, Array.tabulate(64)(i => math.cos(i * 3 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDupPairs(vecs, threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(pairs.contains((0L, 1L)), "scaled copy not found")
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("minhash LSH on real documents matches planted near-dups") {
    val real = Engine.table(spark, sf, "documents")
    val pairs = Dedup.minHashLshPairs(real, numHashes = 32, bands = 16,
      threshold = 0.8).count()
    assert(pairs > 0, "sf0.001 documents contain planted near-dups")
  }
}
