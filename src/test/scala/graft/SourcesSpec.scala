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

  test("Engine.table normalizes both known events.ts encodings") {
    import org.apache.spark.sql.types._
    // encoding A: a REAL TIMESTAMP(NANOS) parquet column (what older
    // pyarrow generations wrote; Spark surfaces it as Long under
    // nanosAsLong) — Engine.table must convert to a microsecond
    // timestamp. Spark can't WRITE nanos, so the fixture is built with
    // parquet-mr directly, annotation included.
    val dirA = tmpDir("tsnanos")
    val nanos = 1700000000L * 1000000000L + 123456000L
    writeNanosEventsFixture(s"$dirA/events.parquet", nanos)
    val a = Engine.table(spark, dirA, "events")
    assert(a.schema("ts").dataType == TimestampType,
      s"nanos-Long encoding resolved as ${a.schema("ts").dataType}")
    assert(a.select(unix_timestamp(col("ts"))).head().getLong(0) ==
      1700000000L)

    // ambiguous encoding: PLAIN INT64 ts with no logical annotation —
    // the epoch unit is unknowable, so Engine.table must FAIL FAST
    // with a named drift error instead of guessing nanos and silently
    // shifting every timestamp 1000x
    val dirC = tmpDir("tsplain")
    spark.range(1).select(
        col("id").as("event_id"), lit(nanos).as("ts"),
        lit(7L).as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.parquet(s"$dirC/events.parquet")
    val err = intercept[IllegalStateException] {
      Engine.table(spark, dirC, "events")
    }
    assert(err.getMessage.contains("logical type"), err.getMessage)

    // encoding B: native timestamp (current generations) — passes
    // through untouched; the real testdata IS this encoding
    val b = Engine.table(spark, sf, "events")
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(b.schema("ts").dataType))

    // both encodings satisfy the suite-wide schema contract
    Engine.assertSchemas(spark, sf)
  }

  test("assertSchemas names the drifted column, not a downstream error") {
    // plant a testdata dir whose events.ts is a STRING — the named
    // per-column diff must surface table, column, and both types
    val dir = tmpDir("tsdrift")
    Engine.tableNames.filterNot(_ == "events").foreach { t =>
      Engine.table(spark, sf, t).write.parquet(s"$dir/$t.parquet")
    }
    Engine.table(spark, sf, "events")
      .withColumn("ts", col("ts").cast("string"))
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Engine.assertSchemas(spark, dir)
    }
    assert(e.getMessage.contains("events.ts"), e.getMessage)
    assert(e.getMessage.contains("string"), e.getMessage)
    assert(e.getMessage.contains("timestamp"), e.getMessage)
  }

  /** One-row events.parquet whose ts column carries an explicit
    * TIMESTAMP(NANOS) logical annotation — Spark cannot write nanos,
    * so the fixture goes through parquet-mr directly (the same layout
    * the old pyarrow generations produced). */
  private def writeNanosEventsFixture(path: String, tsNanos: Long): Unit = {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.hadoop.util.HadoopOutputFile
    import org.apache.parquet.schema.MessageTypeParser
    val schema = MessageTypeParser.parseMessageType(
      """message spark_schema {
           required int64 event_id;
           required int64 ts (TIMESTAMP(NANOS,true));
           required int64 user_id;
           required binary event_type (UTF8);
           required double value;
           required binary props (UTF8);
         }""")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter.builder(
        HadoopOutputFile.fromPath(
          new org.apache.hadoop.fs.Path(s"$path/part-00000.parquet"),
          conf))
      .withConf(conf).build()
    val g = new SimpleGroupFactory(schema).newGroup()
    g.append("event_id", 1L).append("ts", tsNanos).append("user_id", 7L)
      .append("event_type", "click").append("value", 1.0)
      .append("props", "{}")
    writer.write(g)
    writer.close()
  }
}
