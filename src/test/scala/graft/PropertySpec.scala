package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational}

/** Property-based algebraic laws (SURVEY §5.2): randomized inputs
  * against the operator library. Spark jobs are expensive per check, so
  * each property runs a reduced number of sized cases. */
class PropertySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(8).withMaxSize(40), p)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen: Gen[List[(Long, String, Long)]] =
    Gen.listOf(for {
      k <- Gen.chooseNum(0L, 6L) // few keys → collisions guaranteed
      s <- Gen.oneOf("a", "b", "c")
      v <- Gen.chooseNum(-100L, 100L)
    } yield (k, s, v))

  test("salted aggregation equals plain aggregation on random data") {
    check(forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "s", "v")
        val plain = df.groupBy("k").agg(sum("v").as("t")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val salted = Relational.saltedSumAgg(df, Seq("k"), col("v"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        plain == salted
      }
    })
  }

  test("union-all row counts are additive; union-distinct bounded") {
    check(forAll(rowsGen, rowsGen) { (ra, rb) =>
      val a = ra.toDF("k", "s", "v")
      val b = rb.toDF("k", "s", "v")
      val all = a.union(b).count()
      val dis = a.union(b).distinct().count()
      all == ra.size + rb.size && dis <= all &&
        dis >= math.max(a.distinct().count(), b.distinct().count())
    })
  }

  test("dedupKeepFirst emits one row per key, the minimal one") {
    check(forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "s", "v")
        val out = Relational.dedupKeepFirst(df, Seq("k"),
          Seq(col("v"), col("s"))).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        val expect = rows.groupBy(_._1).map { case (_, g) =>
          g.minBy(t => (t._3, t._2)) }.toSet
        out.toSet == expect && out.length == expect.size
      }
    })
  }

  test("minhash similarity estimate concentrates around true jaccard") {
    val docGen = for {
      n <- Gen.chooseNum(8, 20)
      ws <- Gen.listOfN(n, Gen.oneOf(
        "alpha beta", "beta gamma", "gamma delta", "delta eps",
        "eps zeta", "zeta eta", "eta theta", "theta iota"))
    } yield ws.distinct
    check(forAll(docGen, docGen) { (sa, sb) =>
      (sa.isEmpty || sb.isEmpty) || {
        val est = Seq((sa, sb)).toDF("a", "b")
          .select(
            Dedup.minHashSignature(col("a"), 128).as("ma"),
            Dedup.minHashSignature(col("b"), 128).as("mb"))
          .select(aggregate(
            zip_with(col("ma"), col("mb"), (x, y) =>
              when(x === y, 1).otherwise(0)),
            lit(0), (acc, x) => acc + x).cast("double") / 128.0)
          .head().getDouble(0)
        val truth = sa.toSet.intersect(sb.toSet).size.toDouble /
          sa.toSet.union(sb.toSet).size
        math.abs(est - truth) < 0.3 // 128 hashes → sd ~= 0.044
      }
    })
  }
}
