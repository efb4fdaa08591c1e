package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Decimal

import graft.functions.DecSum128

/** [[graft.functions.DecimalSum128]] /
  * [[graft.plans.DecimalSum128Rewrite]]: the 128-bit decimal-sum fast
  * path must be RESULT-IDENTICAL to Spark's builtin decimal Sum —
  * bitwise, after the cast to double the queries apply — across
  * magnitudes, signs, nulls, empty groups, and both codegen modes. */
class DecSum128Spec extends SparkSuite {

  import spark.implicits._

  private def withRule[T](on: Boolean)(f: => T): T =
    withSQLConf("spark.graft.decimalSum128.enabled" -> on.toString)(f)

  /** Grouped decimal sum of `v` cast to `decType`, collected with the
    * rewrite on vs off. */
  private def bothWays(df: DataFrame, decType: String)
      : (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    def run(on: Boolean) = withRule(on) {
      df.groupBy("g")
        .agg(sum(col("v").cast(decType)).cast("double").as("s"))
        .orderBy("g").collect().toSeq
    }
    (run(true), run(false))
  }

  test("parity with builtin Sum: mixed magnitudes, signs, nulls") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      val v: java.lang.Double =
        if (i % 37 == 0) null
        else (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(12))
      (i % 7, v)
    }
    val df = rows.toDF("g", "v")
    for (dec <- Seq("decimal(18,2)", "decimal(18,4)", "decimal(18,6)",
        "decimal(9,2)", "decimal(12,0)")) {
      val (fast, builtin) = bothWays(df, dec)
      assert(fast == builtin, s"mismatch for $dec")
    }
  }

  test("parity past 2^63 in the accumulator (hi word exercised)") {
    // unscaled 9e17 per row at scale 2; 60 rows -> 5.4e19 > 2^63
    val df = (1 to 60).map(i => (1, 9.0e15 + i)).toDF("g", "v")
    val (fast, builtin) = bothWays(df, "decimal(18,2)")
    assert(fast == builtin)
    assert(fast.head.getDouble(1) > 5.3e17) // sanity: the sum is huge
  }

  test("empty group and all-null group evaluate to NULL") {
    val df = Seq((1, null: java.lang.Double), (1, null: java.lang.Double))
      .toDF("g", "v")
    withRule(true) {
      val r = df.groupBy("g")
        .agg(sum(col("v").cast("decimal(18,2)")).as("s")).collect()
      assert(r.length == 1 && r.head.isNullAt(1))
      val empty = df.filter(col("g") === 99)
        .agg(sum(col("v").cast("decimal(18,2)")).as("s")).collect()
      assert(empty.head.isNullAt(0))
    }
  }

  test("parity in interpreted (non-codegen) mode") {
    val df = (1 to 500).map(i => (i % 3, i * 1.37 - 300)).toDF("g", "v")
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
        "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val (fast, builtin) = bothWays(df, "decimal(18,4)")
      assert(fast == builtin)
    }
  }

  test("plan carries decimal_sum128 when enabled, builtin sum when not") {
    // build the frame INSIDE each conf state: optimizedPlan is
    // lazy-cached per QueryExecution
    def agg = (1 to 10).map(i => (1, i.toDouble)).toDF("g", "v")
      .groupBy("g").agg(sum(col("v").cast("decimal(18,2)")))
    withRule(true) {
      assert(agg.queryExecution.optimizedPlan.toString
        .contains("decimal_sum128"))
    }
    withRule(false) {
      assert(!agg.queryExecution.optimizedPlan.toString
        .contains("decimal_sum128"))
    }
  }

  test("rule leaves DISTINCT sums to the builtin; wide goes 192-bit") {
    val df = (1 to 10).map(i => (1, i.toDouble)).toDF("g", "v")
    withRule(true) {
      val distinctPlan = df.groupBy("g")
        .agg(sum_distinct(col("v").cast("decimal(18,2)")))
        .queryExecution.optimizedPlan.toString
      assert(!distinctPlan.contains("decimal_sum128"))
      assert(!distinctPlan.contains("decimal_sum192"))
      // dec12 = DecimalType(30,12): unscaled beyond one long ->
      // three-word accumulator
      val widePlan = df.groupBy("g")
        .agg(sum(col("v").cast("decimal(30,12)")))
        .queryExecution.optimizedPlan.toString
      assert(widePlan.contains("decimal_sum192"))
    }
  }

  test("parity with builtin Sum on WIDE decimals (p > 18)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      val v: java.lang.Double =
        if (i % 23 == 0) null
        else (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(14))
      (i % 5, v)
    }
    val df = rows.toDF("g", "v")
    for (dec <- Seq("decimal(22,4)", "decimal(30,12)", "decimal(38,6)",
        "decimal(19,0)")) {
      val (fast, builtin) = bothWays(df, dec)
      assert(fast == builtin, s"mismatch for $dec")
    }
  }

  test("wide parity past 2^64 and past 2^128 in the accumulator") {
    // decimal(30,12): unscaled per row ~9e27 needs >1 word itself;
    // 4000 rows -> ~3.6e31, exercising the mid/hi words
    val df = (1 to 4000).map(i => (1, 9.0e15 + i)).toDF("g", "v")
    val (fast, builtin) = bothWays(df, "decimal(30,12)")
    assert(fast == builtin)
    assert(fast.head.getDouble(1) > 3.5e19)
  }

  test("toDecimal192: words, signs, overflow") {
    import graft.functions.DecSum128._
    val mask = (BigInt(1) << 64) - 1
    def words(v: BigInt): (Long, Long, Long) =
      ((v >> 128).toLong, ((v >> 64) & mask).toLong, (v & mask).toLong)
    // 2^100 + 3 (~1.3e30, within decimal(38)) round-trips exactly
    val pos = (BigInt(1) << 100) + 3
    val (ph, pm, pl) = words(pos)
    assert(toDecimal192(ph, pm, pl, 38, 0).toBigDecimal.toBigInt == pos)
    // negative two's complement across all three words
    val neg = -((BigInt(1) << 100) + 5)
    val (nh, nm, nl) = words(neg)
    assert(toDecimal192(nh, nm, nl, 38, 0).toBigDecimal.toBigInt == neg)
    // precision overflow nulls: 2^100 has 31 digits > 20
    assert(toDecimal192(ph, pm, pl, 20, 2) == null)
    // long-fits fast path agrees with the 128 finisher
    assert(toDecimal192(0L, 0L, 77L, 28, 4) ==
      DecSum128.toDecimal(0L, 77L, 28, 4))
  }

  test("toDecimal: overflow boundary and 128-bit reconstruction") {
    // |v| = 10^p - 1 fits; 10^p nulls (both signs)
    val p9 = 1000000000L // 10^9
    assert(DecSum128.toDecimal(0L, p9 - 1, 9, 2) != null)
    assert(DecSum128.toDecimal(0L, p9, 9, 2) == null)
    assert(DecSum128.toDecimal(-1L, -p9 + 1, 9, 2) != null)
    assert(DecSum128.toDecimal(-1L, -p9, 9, 2) == null)
    // a value needing the hi word: 2^64 + 5 at scale 0, precision 28
    val d = DecSum128.toDecimal(1L, 5L, 28, 0)
    assert(d.toBigDecimal.toBigInt ==
      (BigInt(1) << 64) + 5)
    // negative 128-bit: -(2^64) - 7  ==  hi = -2, lo = -7
    val neg = DecSum128.toDecimal(-2L, -7L, 28, 0)
    assert(neg.toBigDecimal.toBigInt == -((BigInt(1) << 64) + 7))
    // fast path == slow path where they overlap
    val viaFast = DecSum128.toDecimal(0L, 123456789L, 28, 4)
    val viaSlow = Decimal(
      new java.math.BigDecimal(java.math.BigInteger.valueOf(123456789L), 4),
      28, 4)
    assert(viaFast == viaSlow)
  }
}
