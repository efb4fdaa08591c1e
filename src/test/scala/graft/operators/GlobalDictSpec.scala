package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSuite

/** Global dictionary contract (Kylin append-dict, reference
  * docs/olap.md:24): dense, stable, deterministic. The oracle query
  * (q_global_dict_bitmap) proves end-to-end exactness; these pin the
  * id-assignment contract directly. */
class GlobalDictSpec extends SparkSuite {
  import spark.implicits._

  test("build: dense 0..n-1 ids in value order, nulls dropped") {
    val dict = GlobalDict.build(
      Seq("b", "a", "c", "a", null).toDF("v"), "v")
      .orderBy("dict_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(dict.toSeq == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("build is deterministic across repartitionings") {
    val vals = (0 until 5000).map(i => f"v_${(i * 7919) % 5000}%05d")
    val a = GlobalDict.build(vals.toDF("v").repartition(17), "v")
    val b = GlobalDict.build(vals.reverse.toDF("v").repartition(3), "v")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.count() == 5000)
  }

  test("extend: existing ids untouched, new values appended densely") {
    val d0 = GlobalDict.build(Seq("m", "d").toDF("v"), "v")
    val d1 = GlobalDict.extend(d0, Seq("a", "m", "z").toDF("v"), "v")
    val out = d1.orderBy("dict_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // d:0, m:1 from the first load survive; a,z append as 2,3 in order
    assert(out.toSeq == Seq(("d", 0L), ("m", 1L), ("a", 2L), ("z", 3L)))
  }

  test("extend on an empty dict behaves like build") {
    val empty = GlobalDict.build(Seq.empty[String].toDF("v"), "v")
    val d = GlobalDict.extend(empty, Seq("x", "w").toDF("v"), "v")
      .orderBy("dict_id").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(d.toSeq == Seq(("w", 0L), ("x", 1L)))
  }

  test("encode joins ids; bitmap over ids gives exact distinct") {
    import graft.functions.Bitmap64._
    val docs = Seq(("x", 1), ("y", 1), ("x", 2), ("z", 2), ("x", 2))
      .toDF("term", "grp")
    val dict = GlobalDict.build(docs.select("term"), "term")
    val out = GlobalDict.encode(docs, dict, "term")
      .groupBy("grp")
      .agg(bitmapCard(bitmapBuild(col("dict_id"))).as("nd"))
      .orderBy("grp").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq == Seq((1, 2L), (2, 2L)))
  }
}
