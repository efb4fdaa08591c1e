package graft

import org.apache.spark.sql.Row

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

  test("every catalog query tolerates a zero-row corpus") {
    sweep(emptyDir, "empty")
  }

  test("every catalog query tolerates a single-row corpus") {
    sweep(oneRowDir, "single-row")
  }
}
