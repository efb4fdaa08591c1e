package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real inventory lives in [[Queries]] / [[TextQueries]]; this object
  * just exposes it in the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference's signature conditional-aggregate rollup
    * (reference docs/HiveSQL.md:6-22). */
  def entry(spark: SparkSession): DataFrame =
    Queries.q_conditional_rollup.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.run).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for ops whose hash family is
    * engine-specific (rows-only check + ScalaTest instead). */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
