package graft

import org.apache.spark.sql.functions._
import graft.operators.TextClassifier

/** [[graft.operators.TextClassifier]] — hashed-feature logistic
  * regression: separability on a planted rule, bit-determinism of
  * training under different partitionings, and scoring mechanics. */
class TextClassifierSpec extends SparkSuite {

  private def planted(sfDir: String) =
    TextClassifier.hashedFeatures(
        Engine.table(spark, sfDir, "documents"), "text", 4096)
      .withColumn("y",
        array_contains(split(col("text"), "\\s+"), "spark").cast("double"))

  test("learns a planted separable rule to perfect train accuracy") {
    val feats = planted(sf)
    val w = TextClassifier.trainLogistic(feats, "doc_id", "fx", "y",
      iters = 48, lr = 2.0)
    val wrong = TextClassifier.scoreLogistic(feats, "fx", w, Seq("doc_id"))
      .join(feats.select("doc_id", "y"), "doc_id")
      .filter(col("pred") =!= (col("y") === 1.0))
      .count()
    assert(wrong == 0, s"$wrong misclassified")
  }

  test("Newton training separates the planted rule in few iterations " +
      "and is bit-deterministic under different partitionings") {
    val feats = planted(sf)
    val w = TextClassifier.trainLogisticNewton(feats, "doc_id", "fx", "y")
    val wrong = TextClassifier.scoreLogistic(feats, "fx", w, Seq("doc_id"))
      .join(feats.select("doc_id", "y"), "doc_id")
      .filter(col("pred") =!= (col("y") === 1.0))
      .count()
    assert(wrong == 0, s"$wrong misclassified")
    val w2 = TextClassifier.trainLogisticNewton(
      feats.repartition(5), "doc_id", "fx", "y")
    assert(w == w2, "Newton weights must not depend on layout")
  }

  test("Newton refuses wide feature spaces instead of exploding pairs") {
    import spark.implicits._
    val many = (0 until 600).map(i => (i.toLong, Seq(i, -1)))
      .toDF("doc_id", "fx").withColumn("y", lit(0.0))
    intercept[IllegalArgumentException] {
      TextClassifier.trainLogisticNewton(many, "doc_id", "fx", "y",
        maxActive = 512)
    }
  }

  test("training is bit-deterministic under different partitionings") {
    val feats = planted(sf)
    val w1 = TextClassifier.trainLogistic(
      feats.repartition(7), "doc_id", "fx", "y", iters = 8, lr = 2.0)
    val w2 = TextClassifier.trainLogistic(
      feats.repartition(2, col("doc_id")), "doc_id", "fx", "y",
      iters = 8, lr = 2.0)
    assert(w1 == w2, "weights must be identical regardless of layout")
  }

  test("scoring: bias-only model, unknown buckets ignored") {
    import spark.implicits._
    val docs = Seq((1L, Seq(5, TextClassifier.BiasBucket)),
        (2L, Seq(9, TextClassifier.BiasBucket)))
      .toDF("doc_id", "fx")
    // bias +2, bucket 5 weight -3: doc 1 margin -1, doc 2 margin +2
    val w = Map(TextClassifier.BiasBucket -> 2.0, 5 -> -3.0)
    val got = TextClassifier.scoreLogistic(docs, "fx", w, Seq("doc_id"))
      .orderBy("doc_id").collect()
    assert(got(0).getDouble(1) == -1.0 && !got(0).getBoolean(3))
    assert(got(1).getDouble(1) == 2.0 && got(1).getBoolean(3))
  }

  test("hashedFeatures: distinct presence buckets plus the bias bucket") {
    import spark.implicits._
    val df = Seq((1L, "a b a  c")).toDF("doc_id", "text")
    val fx = TextClassifier.hashedFeatures(df, "text", 4096)
      .select("fx").head().getSeq[Int](0)
    assert(fx.contains(TextClassifier.BiasBucket))
    assert(fx.length == 4) // a, b, c + bias (duplicate 'a' collapsed)
  }
}
