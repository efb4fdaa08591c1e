package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Full-catalog degenerate-input sweep: every `SparkEntry.queries`
  * entry runs against a ZERO-ROW twin of the testdata (same schemas,
  * no rows) and must produce a valid — usually empty — result, never
  * throw. At 100 TB some source split, incremental batch, or
  * partition WILL be empty (a new tenant, a quiet hour, a filter that
  * matches nothing), and an operator that `head()`s or divides by a
  * zero count takes the whole pipeline down. [[EdgeCaseSpec]] checks
  * hand-picked operators on empty frames; this sweep closes the gap
  * catalog-wide, index/lifecycle queries included.
  *
  * Runs the ENTIRE catalog by default: on empty inputs each query is
  * planning-cost only, so the full sweep is one cheap pass.
  */
class EmptyCatalogSpec extends SparkSuite {

  /** Zero-row twin of the sf0.001 testdata: every table written as an
    * empty parquet with the NORMALIZED schema [[Engine.table]] serves
    * (so e.g. events.ts is a true TIMESTAMP, exactly what queries see
    * after Engine's type normalization on real data). */
  private lazy val emptyDir: String = {
    val dir = tmpDir("graft_empty_sf")
    Engine.tableNames.foreach { t =>
      val schema = Engine.table(spark, sf, t).schema
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  /** One-row twin: the FIRST row of each normalized table. The other
    * degenerate boundary a 100 TB split hits — one-row partitions,
    * variance-of-one stats, groups of size 1 everywhere. */
  private lazy val oneRowDir: String = {
    val dir = tmpDir("graft_onerow_sf")
    Engine.tableNames.foreach { t =>
      Engine.table(spark, sf, t).limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(dir: String, what: String): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val failures = names.flatMap { n =>
      try {
        SparkEntry.queries(n)(spark, dir).collect()
        None
      } catch {
        case e: Throwable =>
          Some(s"$n: ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" | ")}")
      }
    }
    assert(failures.isEmpty,
      s"${failures.length}/${names.length} catalog queries throw on " +
        s"$what input:\n  ${failures.mkString("\n  ")}")
  }

  /** Null-dirty twin: every NON-KEY column nulled on a deterministic
    * third of rows (keyed on the table's lead id column + the column
    * name, so the pattern is stable across runs). Key/id columns stay
    * non-null — operators with a documented non-null-id contract
    * (e.g. packSequences) fail FAST on null ids by design, and dirty
    * real-world data loses values and payloads far more often than
    * primary keys. */
  private lazy val nulledDir: String = {
    val dir = tmpDir("graft_nulled_sf")
    Engine.tableNames.foreach { t =>
      val df = Engine.table(spark, sf, t)
      val key = df.columns.head
      val keepNonNull = (c: String) =>
        c.endsWith("key") || c.endsWith("_id") || c == "l_linenumber"
      val dirty = df.columns.map { c =>
        if (keepNonNull(c)) col(c)
        else when(
          pmod(xxhash64(col(key).cast("string"), lit(c)), lit(3)) === 0,
          lit(null).cast(df.schema(c).dataType)).otherwise(col(c)).as(c)
      }
      df.select(dirty: _*).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every catalog query tolerates a zero-row corpus") {
    sweep(emptyDir, "empty")
  }

  test("every catalog query tolerates a single-row corpus") {
    sweep(oneRowDir, "single-row")
  }

  test("every catalog query tolerates a null-dirty corpus") {
    sweep(nulledDir, "null-dirty")
  }
}
