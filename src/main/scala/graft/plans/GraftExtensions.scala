package graft.plans

import graft.codec.Codecs
import graft.functions.{DecodeTokens, EncodeAuto, EncodeTokens, CodecOf}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

/** Catalyst optimizer rules for the codec expression algebra — the
  * `SparkSessionExtensions` extension point (the one plan-level surface
  * the engine needs; operator semantics themselves stay on Catalyst
  * built-ins, SURVEY §4).
  *
  * Laws exploited (both scalacheck-tested in CodecProps):
  *  - decode ∘ encode = identity  ⇒ `decode_tokens(encode_*(x))` → `x`
  *    (a user composing a decoding view over an encoding pipeline pays
  *    nothing; guarded on exact type equality so plan schema/nullability
  *    never changes);
  *  - codec choice of a literal-codec encode is static ⇒
  *    `codec_of(encode_tokens(x, 'name'))` folds to `'name'` at plan time
  *    (drops the entire encode for lineage-only projections).
  */
object CodecRoundtripElimination extends Rule[LogicalPlan] {

  private val decodedType = ArrayType(IntegerType, containsNull = false)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // decode(encode_auto(x)) -> x ; decode(encode_tokens(x, c)) -> x
      case DecodeTokens(EncodeAuto(x)) if x.dataType == decodedType => x
      case DecodeTokens(EncodeTokens(x, _)) if x.dataType == decodedType => x
      // codec_of(encode_tokens(x, 'lit')) -> 'lit' (validated name); only
      // when x is non-nullable — codec_of(null) must stay null
      case CodecOf(EncodeTokens(x, c @ Literal(_, StringType)))
          if c.foldable &&
            scala.util.Try(Codecs.byName(c.eval(InternalRow.empty).toString)).isSuccess =>
        // unknown codec names are left for execution-time error reporting.
        // Null semantics preserved: codec_of(encode_tokens(null, _)) is
        // null, so a nullable input folds to a null-guarded literal.
        val name = Literal.create(c.eval(InternalRow.empty).toString, StringType)
        if (x.nullable)
          org.apache.spark.sql.catalyst.expressions.If(
            org.apache.spark.sql.catalyst.expressions.IsNull(x),
            Literal.create(null, StringType), name)
        else name
    }
}

/** `SparkSessionExtensions` installer:
  * {{{
  * SparkSession.builder()
  *   .withExtensions(graft.plans.GraftExtensions.install)
  *   // or spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.install(ext)
}

object GraftExtensions {
  def install(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => CodecRoundtripElimination)
}
