package graft.functions

import graft.codec._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

/** Catalyst expression surface for the codec kernels (SURVEY.md §2.8: the
  * reference's scalar transform extension point → custom `Expression`s;
  * cryo's per-column series building is crates/cryo_to_df/src/lib.rs:103-131).
  *
  * All expressions implement `doGenCode` by delegating to the JVM kernels,
  * so they stay inside whole-stage codegen spans (no UDF boxing, no
  * CodegenFallback on the hot encode/decode path).
  */

/** encode_tokens(tokens array<int>, codec string) -> binary blob.
  * The codec argument must be foldable (a literal); the codec object is
  * resolved once at plan time.
  */
case class EncodeTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "encode_tokens"

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!TokenExprs.isIntArray(left.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<int> tokens, got ${left.dataType.sql}")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("codec name must be a string literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val codec: Codec =
    Codecs.byName(right.eval(InternalRow.empty).toString)

  override def nullSafeEval(tokens: Any, codecName: Any): Any =
    codec.encode(tokens.asInstanceOf[ArrayData].toIntArray())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codec", codec, classOf[Codec].getName)
    nullSafeCodeGen(ctx, ev, (arr, _) =>
      s"${ev.value} = $ref.encode($arr.toIntArray());")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** encode_auto(tokens array<int>) -> binary blob with the cost-selected
  * codec's tag in byte 0 (the per-column codec auto-selector of
  * BASELINE.json's north_star).
  */
case class EncodeAuto(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "encode_auto"

  override def checkInputDataTypes(): TypeCheckResult =
    TokenExprs.requireIntArray(prettyName, child.dataType)

  override def nullSafeEval(tokens: Any): Any =
    CodecSelector.encodeAuto(tokens.asInstanceOf[ArrayData].toIntArray())

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("selector", CodecSelector,
      "graft.codec.CodecSelector$")
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = $ref.encodeAuto($arr.toIntArray());")
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** decode_tokens(blob binary) -> array<int> — bit-identical inverse of
  * encode_tokens/encode_auto for any codec tag (self-describing blobs).
  */
case class DecodeTokens(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decode_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    TokenExprs.requireBinary(prettyName, child.dataType)

  override def nullSafeEval(blob: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Codecs.decode(blob.asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codecs", Codecs, "graft.codec.Codecs$")
    nullSafeCodeGen(ctx, ev, blob =>
      s"""${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($ref.decode($blob));""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** codec_of(blob binary) -> string — the codec tag name of an encoded blob
  * (lineage column; reference analog: per-run report codec field,
  * crates/freeze/src/types/reports.rs:9-23).
  */
case class CodecOf(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "codec_of"

  override def checkInputDataTypes(): TypeCheckResult =
    TokenExprs.requireBinary(prettyName, child.dataType)

  override def nullSafeEval(blob: Any): Any =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      Codecs.codecNameOf(blob.asInstanceOf[Array[Byte]]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codecs", Codecs, "graft.codec.Codecs$")
    nullSafeCodeGen(ctx, ev, blob =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String
         |  .fromString($ref.codecNameOf($blob));""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** token_stats(tokens array<int>) -> struct with the selector's inputs
  * (cardinality, run count, range, sortedness — BASELINE.json north_star).
  * Not on the hot path; CodegenFallback is fine here.
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    TokenExprs.requireIntArray(prettyName, child.dataType)

  override def dataType: DataType = TokenStats.schema

  override def nullSafeEval(tokens: Any): Any = {
    val xs = tokens.asInstanceOf[ArrayData].toIntArray()
    val st = ColumnStats.of(xs)
    val chosen = CodecSelector.choose(xs, st)
    InternalRow(st.n, st.min, st.max, st.nRuns, st.nDistinct,
      st.distinctCapped, st.sorted,
      org.apache.spark.unsafe.types.UTF8String.fromString(chosen.name))
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("min", LongType, nullable = false),
    StructField("max", LongType, nullable = false),
    StructField("n_runs", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("distinct_capped", BooleanType, nullable = false),
    StructField("sorted", BooleanType, nullable = false),
    StructField("codec", StringType, nullable = false)
  ))
}

private[functions] object TokenExprs {
  def isIntArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }
  def requireIntArray(name: String, dt: DataType): TypeCheckResult =
    if (isIntArray(dt)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<int> tokens, got ${dt.sql}")
  def requireBinary(name: String, dt: DataType): TypeCheckResult =
    if (dt == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects a binary blob, got ${dt.sql}")
}
