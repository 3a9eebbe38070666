package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** now_nanos() — monotonic per-row timestamp (System.nanoTime), evaluated
  * at execution time in the task that computes the row (unlike
  * current_timestamp(), which is query-constant). Used by the encode
  * pipeline to derive REAL per-task wall times from first-row/last-row
  * spans — the round-1 manifest recorded a driver-side elapsed constant
  * per partition, which made per-partition throughput fiction.
  */
case class NowNanos() extends LeafExpression with Nondeterministic {
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "now_nanos"

  override protected def initializeInternal(partitionIndex: Int): Unit = {}
  override protected def evalInternal(input: InternalRow): Any =
    System.nanoTime()

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(
      code = code"final long ${ev.value} = System.nanoTime();",
      isNull = FalseLiteral)
}
