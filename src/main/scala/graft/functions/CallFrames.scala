package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** call_frames(doc_id) — a custom Catalyst `Generator` that flattens a
  * recursive call-frame tree into rows, the Spark-native form of the
  * reference's recursive VM-trace / call-frame flatteners
  * (crates/freeze/src/datasets/vm_traces.rs:81-134,
  * geth_traces.rs:76-114): one pass carries the path ("trace_address")
  * and the failed-subtree flag down the recursion, so excluded-failed
  * filtering (traces.rs:201-230 semantics) is a plain post-filter.
  *
  * The tree is a deterministic pure function of doc_id (this sandbox has
  * no trace data), replayable in ANSI SQL with a recursive CTE — which is
  * exactly how the DuckDB oracle checks it:
  *  - root node_id = 1, depth 0, path "0";
  *  - a node v at depth d < 3 has (doc*7 + v*11) % 4 children;
  *  - child i of v has node_id v*4 + i + 1, path = parent.path + "/" + i;
  *  - v itself fails iff (doc*13 + v*17) % 23 == 0; failed_subtree =
  *    own failure OR any ancestor's.
  *
  * Output: (node_id BIGINT, depth BIGINT, path STRING,
  * failed_subtree BIGINT 0/1). Generators are inherently CodegenFallback
  * in Spark's Generate operator — no per-row lambda interpretation here,
  * the recursion is one JVM kernel call per input row.
  */
case class CallFrames(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "call_frames"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral doc id, got ${dt.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("node_id", LongType, nullable = false),
    StructField("depth", LongType, nullable = false),
    StructField("path", StringType, nullable = false),
    StructField("failed_subtree", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val doc = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    def walk(nodeId: Long, depth: Long, path: String, ancestorFailed: Boolean): Unit = {
      val failed = ancestorFailed || (doc * 13 + nodeId * 17) % 23 == 0
      out += InternalRow(nodeId, depth, UTF8String.fromString(path),
        if (failed) 1L else 0L)
      if (depth < 3) {
        val nChildren = ((doc * 7 + nodeId * 11) % 4).toInt
        var i = 0
        while (i < nChildren) {
          walk(nodeId * 4 + i + 1, depth + 1, path + "/" + i, failed)
          i += 1
        }
      }
    }
    walk(1L, 0L, "0", ancestorFailed = false)
    out
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
