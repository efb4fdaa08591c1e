package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan
  * pruning (SURVEY.md §2.1 storage adjunct).
  *
  * Partitioning prunes on ONE column hierarchy; a Z-order (Morton)
  * layout clusters files on TWO dimensions at once, so parquet
  * min/max footer stats let a 2-D box predicate skip most files —
  * the Delta/Iceberg `OPTIMIZE ZORDER BY` capability, built from
  * plain Spark: interleave the key bits, range-partition on the
  * interleaved value, sort within partitions, write.
  *
  * At 100 TB: the rewrite is one range-exchange of the table (the
  * same cost as any repartition), paid once; every later box query
  * reads ~O(perimeter) files instead of O(table). */
object Layout {

  /** Morton interleave of two non-negative integer columns, `bits`
    * bits each (values are masked to `bits`, so out-of-domain inputs
    * degrade to coarser clustering instead of corrupting order).
    * Pure bit arithmetic — codegen'd, no UDF. */
  def zValue(x: Column, y: Column, bits: Int = 20): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      val xb = shiftleft(
        shiftrightunsigned(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b)
      val yb = shiftleft(
        shiftrightunsigned(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite `df` as `nFiles` parquet files clustered by the Z-order
    * of (colX, colY). Range partitioning puts contiguous z-ranges in
    * the same file; the within-partition sort tightens each file's
    * min/max envelope on BOTH columns. */
  def writeZOrdered(df: DataFrame, path: String, colX: String,
      colY: String, nFiles: Int, bits: Int = 20): Unit =
    df.withColumn("__z", zValue(col(colX), col(colY), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
