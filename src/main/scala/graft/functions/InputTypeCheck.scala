package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.types.DataType

/** Analysis-time input typing for the native kernels. Spark's own
  * `ExpectsInputTypes`/`AbstractDataType` machinery is `private[sql]`,
  * so this implements the same contract directly on
  * `checkInputDataTypes()`: a mistyped child (e.g. `winnow` over a
  * bigint column) fails analysis with a readable message instead of
  * surfacing as an executor-side ClassCastException. */
private[functions] trait InputTypeCheck { self: UnaryExpression =>

  /** Human-readable expected type, e.g. "array<string>". */
  protected def expectedInputType: String

  protected def acceptsInputType(dt: DataType): Boolean

  override def checkInputDataTypes(): TypeCheckResult =
    if (acceptsInputType(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires $expectedInputType input, " +
        s"got ${child.dataType.catalogString}")
}
