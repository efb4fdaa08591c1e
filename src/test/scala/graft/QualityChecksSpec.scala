package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityChecks
import graft.operators.QualityChecks._

/** [[graft.operators.QualityChecks]] — rule metrics, threshold gating,
  * the zero-extra-scan observed variant, and degenerate inputs. */
class QualityChecksSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = Seq(
    (1L, "a@x.com", 10.0, "A"),
    (2L, "b@y.org", 25.0, "A"),
    (3L, null.asInstanceOf[String], 50.0, "B"),
    (3L, "not-an-email", 99.0, null.asInstanceOf[String]))
    .toDF("id", "email", "score", "grp")

  test("run: metrics and threshold gating") {
    val dim = Seq("A").toDF("g")
    val got = QualityChecks.run(t, Seq(
        Completeness("c_email", "email", 0.7),
        Uniqueness("u_id", Seq("id"), 1.0),
        Bounds("b_score", "score", 0.0, 50.0, 0.75),
        Pattern("p_email", "email", "^[^@]+@[^@]+\\.[a-z]+$", 0.6),
        ForeignKey("fk_grp", "grp", dim, "g", 0.5)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      ("b_score", 0.75, true), // 3 of 4 in range
      ("c_email", 0.75, true), // 3 of 4 non-null
      ("fk_grp", 0.5, true), // 2 of 4 rows hit the dim
      ("p_email", 2.0 / 3.0, true), // of 3 non-null, 2 match
      ("u_id", 0.75, false))) // id 3 duplicated
  }

  test("observed checks ride an existing job with no extra scan") {
    val (df, obs) = QualityChecks.observedChecks(t, Seq(
      Completeness("c_email", "email", 0.7),
      Bounds("b_score", "score", 0.0, 50.0, 0.8)))
    df.write.mode("overwrite").parquet(tmpDir("qcobs") + "/out")
    val got = QualityChecks.evaluate(spark, obs, Seq(
        Completeness("c_email", "email", 0.7),
        Bounds("b_score", "score", 0.0, 50.0, 0.8)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(("b_score", 0.75, false), ("c_email", 0.75, true)))
  }

  test("empty table: every ratio rule passes vacuously") {
    val empty = Seq.empty[(Long, String)].toDF("id", "email")
    val got = QualityChecks.run(empty, Seq(
        Completeness("c", "email", 1.0),
        Uniqueness("u", Seq("id"), 1.0)))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(3)))
    assert(got.forall { case (_, m, p) => m == 1.0 && p })
  }

  test("observedChecks rejects rules needing their own pass") {
    intercept[IllegalArgumentException] {
      QualityChecks.observedChecks(t, Seq(Uniqueness("u", Seq("id"), 1.0)))
    }
    intercept[IllegalArgumentException] {
      QualityChecks.observedChecks(t,
        Seq(ForeignKey("f", "grp", t, "grp", 1.0)))
    }
  }
}
