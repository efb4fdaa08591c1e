package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** S6 lake-format sources the batch oracle can't check directly:
  * binaryFile (opaque media bytes, docs/数据湖.md:4) and headerless
  * schema-inference reads (schema-on-read for the raw zone,
  * docs/数据湖.md:32). CSV/JSON roundtrips have oracle entries in
  * ExtQueries. */
class SourcesSpec extends SparkSuite {

  test("binaryFile source reads exact bytes + file metadata") {
    val dir = tmpDir("binsrc")
    val payload = "graft-binary-é中".getBytes("UTF-8")
    Files.write(Paths.get(s"$dir/a.bin"), payload)
    Files.write(Paths.get(s"$dir/b.bin"), Array[Byte](0, 1, 2, -1))
    val df = spark.read.format("binaryFile").load(dir)
    assert(df.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val got = df.select("path", "content").collect()
      .map(r => r.getString(0).split('/').last -> r.getAs[Array[Byte]](1))
      .toMap
    assert(got("a.bin").sameElements(payload))
    assert(got("b.bin").sameElements(Array[Byte](0, 1, 2, -1)))
  }

  test("csv schema inference reads the raw zone without a declared schema") {
    val dir = tmpDir("csvinfer")
    Engine.table(spark, sf, "region")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val inferred = spark.read
      .option("header", "true").option("inferSchema", "true").csv(dir)
    assert(inferred.schema("r_regionkey").dataType.typeName == "integer" ||
      inferred.schema("r_regionkey").dataType.typeName == "long")
    assert(inferred.count() ==
      Engine.table(spark, sf, "region").count())
  }

  test("json lines roundtrip preserves values under an explicit schema") {
    val dir = tmpDir("jsonrt")
    val src = Engine.table(spark, sf, "supplier")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
