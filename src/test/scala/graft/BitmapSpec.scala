package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bitmap64
import graft.functions.Bitmap64._

/** [[graft.functions.Bitmap64]] — model-checked against
  * java.util.BitSet / scala Set, then the Spark aggregate + scalar
  * surface, including the parquet segment-materialization roundtrip
  * that the Kylin-style rollup depends on. */
class Bitmap64ModelSpec extends AnyFunSuite {

  private def build(ids: Iterable[Long]): Bitmap64 = {
    val bm = new Bitmap64
    ids.foreach(bm.add)
    bm
  }

  test("add/contains/cardinality vs Set model across container kinds") {
    val rnd = new scala.util.Random(42)
    // sparse chunk (array container), dense chunk (bitmap container),
    // chunk boundaries, negatives, and far-apart 64-bit keys
    val ids = (Seq.fill(500)(rnd.nextInt(5000).toLong) ++ // sparse low
      Seq.fill(9000)(65536L + rnd.nextInt(60000)) ++ // dense chunk 1
      Seq(0L, 65535L, 65536L, 131071L, -1L, -65536L, -65537L,
        Long.MaxValue, Long.MinValue, 1L << 40, (1L << 40) + 1) ++
      Seq.fill(300)(rnd.nextLong())).distinct
    val model = ids.toSet
    val bm = build(ids)
    assert(bm.cardinality == model.size)
    model.foreach(id => assert(bm.contains(id), s"missing $id"))
    assert(!bm.contains(4999999L) || model.contains(4999999L))
    // serialized probes agree with the builder
    val bytes = bm.serialize()
    assert(Bitmap64.serializedCardinality(bytes) == model.size.toLong)
    (model.take(200) ++ Seq(7L, -7L, 1L << 33)).foreach { id =>
      assert(Bitmap64.serializedContains(bytes, id) == model.contains(id))
    }
  }

  test("serialization is canonical: build order and merge path don't matter") {
    val a = (0L until 5000L) ++ Seq(1L << 20, -42L)
    val direct = build(a).serialize()
    val shuffled = build(new scala.util.Random(7).shuffle(a)).serialize()
    assert(java.util.Arrays.equals(direct, shuffled))
    // merged halves == direct
    val left = build(a.take(2000))
    left.orInPlace(build(a.drop(2000)))
    assert(java.util.Arrays.equals(direct, left.serialize()))
    // deserialize → reserialize roundtrip
    assert(java.util.Arrays.equals(direct,
      Bitmap64.deserialize(direct).serialize()))
  }

  test("and/or/andNot vs Set model, including empty results") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(6000)(rnd.nextInt(200000).toLong).distinct
    val ys = Seq.fill(6000)(rnd.nextInt(200000).toLong + 100000L).distinct
    val (sx, sy) = (xs.toSet, ys.toSet)
    val (bx, by) = (build(xs), build(ys))
    def check(op: Int, expect: Set[Long]): Unit = {
      val got = Bitmap64.combine(bx, by, op)
      assert(got.cardinality == expect.size, s"op=$op")
      expect.take(100).foreach(id => assert(got.contains(id)))
      // canonical: combine result serializes identically to a direct build
      assert(java.util.Arrays.equals(got.serialize(),
        build(expect).serialize()), s"op=$op not canonical")
    }
    check(Bitmap64.OpAnd, sx intersect sy)
    check(Bitmap64.OpOr, sx union sy)
    check(Bitmap64.OpAndNot, sx diff sy)
    // disjoint AND → empty bitmap, zero chunks
    val none = Bitmap64.combine(build(Seq(1L)), build(Seq(2L << 20)),
      Bitmap64.OpAnd)
    assert(none.cardinality == 0L)
    assert(none.serialize().length == 4)
  }
}

class BitmapSparkSpec extends SparkSuite {

  test("bitmap_build partial aggregation: exact distinct per group, " +
      "nulls skipped, shuffle carries bitmaps not ids") {
    import spark.implicits._
    val df = (0 until 20000).map(i => (i % 7, (i % 997).toLong))
      .toDF("g", "id")
      .union(Seq((0, null.asInstanceOf[java.lang.Long]))
        .toDF("g", "id").select($"g", $"id".cast("long")))
      .repartition(8)
    val got = df.groupBy("g")
      .agg(bitmapCard(bitmapBuild(col("id"))).as("n"))
    val expect = df.filter($"id".isNotNull).groupBy("g")
      .agg(countDistinct($"id").as("n"))
    assertSameRows(got, expect)
    // partial+final: an ObjectHashAggregate pair around the exchange
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("bitmap_merge rollup over a materialized parquet segment table " +
      "== count(distinct) from raw (the Kylin segment pattern)") {
    import spark.implicits._
    val raw = (0 until 50000)
      .map(i => (s"d${i % 5}", s"t${i % 3}", (i * 37 % 4211).toLong))
      .toDF("day", "tag", "uid")
    val segDir = tmpDir("bm_seg")
    raw.groupBy("day", "tag").agg(bitmapBuild($"uid").as("bm"))
      .write.mode("overwrite").parquet(segDir) // binary column persists
    val rolled = spark.read.parquet(segDir)
      .groupBy("tag").agg(bitmapCard(bitmapMerge($"bm")).as("users"))
    val direct = raw.groupBy("tag").agg(countDistinct($"uid").as("users"))
    assertSameRows(rolled, direct)
  }

  test("audience combination and membership probe match row-level SQL") {
    import spark.implicits._
    val ev = (0 until 3000).map { i =>
      (i % 211L, Seq("a", "b", "c")(i % 3))
    }.toDF("uid", "tag")
    val bms = ev.groupBy().agg(
      bitmapBuild(when($"tag" === "a", $"uid")).as("a"),
      bitmapBuild(when($"tag" === "b", $"uid")).as("b"),
      bitmapBuild(when($"tag" === "c", $"uid")).as("c"))
    val row = bms.select(
      bitmapCard(bitmapAndNot(bitmapAnd($"a", $"b"), $"c")).as("n"),
      bitmapContains(bitmapOr($"a", $"b"), lit(5L)).as("has5"),
      bitmapContains($"a", lit(100000L)).as("hasBig")).head()
    val expect = ev.groupBy("uid").agg(
      max($"tag" === "a").as("ha"), max($"tag" === "b").as("hb"),
      max($"tag" === "c").as("hc"))
      .filter($"ha" && $"hb" && !$"hc").count()
    assert(row.getLong(0) == expect)
    assert(row.getBoolean(1)) // uid 5 exists and 211-cycle hits a or b
    assert(!row.getBoolean(2))
  }

  test("SQL surface: bitmap family registered via GraftExtensions") {
    Engine.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT event_type,
           bitmap_cardinality(bitmap_build(user_id)) AS uv
         FROM events GROUP BY event_type""")
    val direct = spark.sql(
      """SELECT event_type, COUNT(DISTINCT user_id) AS uv
         FROM events GROUP BY event_type""")
    assertSameRows(viaSql, direct)
    // scalar combinators + contains through pure SQL
    val row = spark.sql(
      """SELECT bitmap_cardinality(bitmap_andnot(c.bm, p.bm)) AS n,
                bitmap_contains(bitmap_or(c.bm, p.bm), 0L) AS has0
         FROM (SELECT bitmap_build(user_id) bm FROM events
               WHERE event_type = 'click') c,
              (SELECT bitmap_build(user_id) bm FROM events
               WHERE event_type = 'purchase') p""").head()
    val expect = spark.sql(
      """SELECT COUNT(*) FROM (
           SELECT DISTINCT user_id FROM events WHERE event_type='click'
           EXCEPT
           SELECT DISTINCT user_id FROM events WHERE event_type='purchase')
      """).head().getLong(0)
    assert(row.getLong(0) == expect)
    assert(row.getBoolean(1) == spark.sql(
      """SELECT COUNT(*) > 0 FROM events
         WHERE user_id = 0 AND event_type IN ('click','purchase')""")
      .head().getBoolean(0))
    // arity is checked at registration
    intercept[Exception] {
      spark.sql("SELECT bitmap_cardinality(bitmap_build(1L, 2L))").collect()
    }
  }

  test("type checks reject non-integral build input and non-binary ops") {
    import spark.implicits._
    val df = Seq(("x", 1.5)).toDF("s", "d")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy().agg(bitmapBuild($"d")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(bitmapCard($"s")).collect()
    }
  }
}
