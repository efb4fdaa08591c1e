package graft

import graft.operators.Bpe

/** The driver-local BPE merge loop must produce the IDENTICAL merge
  * sequence as the distributed per-round fallback — same counts
  * (overlapping adjacencies included), same tie-break (count desc,
  * then lexicographically smallest pair), same greedy non-overlapping
  * merge application. Differential-tested on random corpora by forcing
  * the path switch via `spark.graft.bpe.localVocabMax`. */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private def corpusDF(words: Seq[String]) =
    words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  private def learnWith(localMax: Int, docs: org.apache.spark.sql.DataFrame,
      n: Int): Seq[(String, String)] =
    withSQLConf("spark.graft.bpe.localVocabMax" -> localMax.toString) {
      Bpe.learn(docs, n)
    }

  test("local == distributed on the Sennrich reference corpus") {
    val docs = corpusDF(Seq(("low " * 5).trim, ("lower " * 2).trim,
      ("newest " * 6).trim, ("widest " * 3).trim))
    val local = learnWith(1000000, docs, 10)
    val dist = learnWith(0, docs, 10) // vocab > 0 forces the fallback
    assert(local == dist)
    assert(local.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")))
  }

  test("local == distributed on random corpora (overlaps, ties, unicode)") {
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { trial =>
      val alphabet = Seq("a", "b", "c", "é", "😀") // é, 😀
      val words = (1 to 30).map { _ =>
        (1 to (1 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val docs = corpusDF(Seq.fill(3)(words(rnd.nextInt(words.length)))
        ++ words)
      val n = 12
      val local = learnWith(1000000, docs, n)
      val dist = learnWith(0, docs, n)
      assert(local == dist, s"trial $trial: $local vs $dist")
    }
  }

  test("exhaustion: fewer possible merges than requested") {
    val docs = corpusDF(Seq("ab", "ab", "cd"))
    val local = learnWith(1000000, docs, 50)
    val dist = learnWith(0, docs, 50)
    assert(local == dist)
    assert(local.nonEmpty && local.length < 50)
  }
}
