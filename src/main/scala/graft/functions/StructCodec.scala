package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-directed binary decode — the reference's only runtime schema
  * extension point re-expressed Spark-first: a signature string is parsed
  * at plan time into a typed field layout, and a binary column is decoded
  * into a named struct whose schema Catalyst sees statically (the analog
  * of event-signature log decoding,
  * crates/freeze/src/types/decoders/log_decoder.rs:20-171, which parses a
  * signature and builds typed named columns from raw log bytes).
  *
  * Signature DSL: comma-separated `name:kind` with kinds
  *  - `u8` | `u32` | `u64` — big-endian fixed-width unsigned ints,
  *    surfaced as BIGINT (u64 must fit a signed i64, else null — the
  *    reference's u64-overflow posture for narrowed types);
  *  - `bytesN` — N raw bytes, surfaced as BINARY;
  *  - `str` — u32 big-endian length prefix + UTF-8 bytes, as STRING.
  *
  * Malformed input (truncated blob, trailing bytes, oversized length
  * prefix) decodes to null rather than throwing — per-row corruption must
  * not kill a 100 TB job; count nulls downstream.
  */
object StructSchema {
  sealed trait Kind { def width(payload: Int): Int }
  case object U8 extends Kind { def width(p: Int) = 1 }
  case object U32 extends Kind { def width(p: Int) = 4 }
  case object U64 extends Kind { def width(p: Int) = 8 }
  final case class FixedBytes(n: Int) extends Kind { def width(p: Int) = n }
  case object Str extends Kind { def width(p: Int) = 4 + p }

  final case class Field(name: String, kind: Kind)

  private val BytesRe = "bytes([0-9]+)".r

  def parse(sig: String): Seq[Field] =
    sig.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
      val Array(name, kind) = part.split(":", 2).map(_.trim)
      require(name.nonEmpty, s"empty field name in '$sig'")
      val k = kind match {
        case "u8" => U8
        case "u32" => U32
        case "u64" => U64
        case "str" => Str
        case BytesRe(n) => FixedBytes(n.toInt)
        case other => throw new IllegalArgumentException(
          s"unknown field kind '$other' in signature '$sig'")
      }
      Field(name, k)
    }

  def sparkType(k: Kind): DataType = k match {
    case U8 | U32 | U64 => LongType
    case FixedBytes(_) => BinaryType
    case Str => StringType
  }

  def schemaOf(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.name, sparkType(f.kind), nullable = true)))
}

/** Plan-time-parsed decoder kernel, shared by eval and generated code. */
final class StructDecoder(val fields: Seq[StructSchema.Field]) extends Serializable {
  import StructSchema._

  /** Returns a populated InternalRow, or null if the blob is malformed. */
  def decode(blob: Array[Byte]): InternalRow = {
    val out = new Array[Any](fields.length)
    var off = 0
    var i = 0
    while (i < fields.length) {
      fields(i).kind match {
        case U8 =>
          if (off + 1 > blob.length) return null
          out(i) = java.lang.Long.valueOf(blob(off) & 0xffL)
          off += 1
        case U32 =>
          if (off + 4 > blob.length) return null
          out(i) = java.lang.Long.valueOf(readU32(blob, off))
          off += 4
        case U64 =>
          if (off + 8 > blob.length) return null
          val v = readU64(blob, off)
          out(i) = if (v < 0) null else java.lang.Long.valueOf(v)
          off += 8
        case FixedBytes(n) =>
          if (off + n > blob.length) return null
          out(i) = java.util.Arrays.copyOfRange(blob, off, off + n)
          off += n
        case Str =>
          if (off + 4 > blob.length) return null
          val len = readU32(blob, off)
          if (len > Int.MaxValue || off + 4 + len > blob.length) return null
          out(i) = UTF8String.fromBytes(blob, off + 4, len.toInt)
          off += 4 + len.toInt
      }
      i += 1
    }
    if (off != blob.length) return null // trailing garbage = malformed
    new GenericInternalRow(out)
  }

  private def readU32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def readU64(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }
}

/** decode_struct(blob binary, 'name:kind,...') -> struct — see
  * [[StructSchema]] for the DSL. The signature must be foldable; the
  * struct schema is resolved at plan time.
  */
case class DecodeStruct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "decode_struct"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName expects a binary blob")
    else if (right.dataType != StringType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("signature must be a string literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val decoder: StructDecoder =
    new StructDecoder(StructSchema.parse(right.eval(InternalRow.empty).toString))

  override def dataType: DataType = StructSchema.schemaOf(decoder.fields)

  override def nullSafeEval(blob: Any, sig: Any): Any =
    decoder.decode(blob.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("decoder", decoder,
      classOf[StructDecoder].getName)
    val childGen = left.genCode(ctx)
    val rowCls = "org.apache.spark.sql.catalyst.InternalRow"
    // hand-rolled (not nullSafeCodeGen): a non-null blob can still decode
    // to null (malformed input), so the result's null bit is data-driven
    ev.copy(code = childGen.code + code"""
        boolean ${ev.isNull} = true;
        $rowCls ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = ($rowCls) $ref.decode(${childGen.value});
          ${ev.isNull} = (${ev.value} == null);
        }""")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** encode_struct('name:kind,...', v1, v2, ...) -> binary — the inverse
  * layout writer (test-harness / blob-construction side; not a hot path,
  * so interpreted eval is fine).
  */
case class EncodeStruct(children: Seq[Expression])
    extends Expression with CodegenFallback {

  override def prettyName: String = "encode_struct"
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  @transient private lazy val fields: Seq[StructSchema.Field] =
    StructSchema.parse(children.head.eval(InternalRow.empty).toString)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty || children.head.dataType != StringType || !children.head.foldable)
      return TypeCheckResult.TypeCheckFailure("first arg must be a signature string literal")
    val sig = StructSchema.parse(children.head.eval(InternalRow.empty).toString)
    if (children.length - 1 != sig.length)
      return TypeCheckResult.TypeCheckFailure(
        s"signature has ${sig.length} fields but ${children.length - 1} values given")
    sig.zip(children.tail).foldLeft(TypeCheckResult.TypeCheckSuccess: TypeCheckResult) {
      case (ok @ TypeCheckResult.TypeCheckSuccess, (f, e)) =>
        (f.kind, e.dataType) match {
          case (StructSchema.Str, StringType) => ok
          case (StructSchema.FixedBytes(_), BinaryType) => ok
          case (StructSchema.U8 | StructSchema.U32 | StructSchema.U64,
                LongType | IntegerType | ShortType | ByteType) => ok
          case (k, dt) => TypeCheckResult.TypeCheckFailure(
            s"field ${f.name}:$k cannot encode ${dt.sql}")
        }
      case (fail, _) => fail
    }
  }

  override def eval(input: InternalRow): Any = {
    import StructSchema._
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < fields.length) {
      val v = children(i + 1).eval(input)
      if (v == null) return null
      fields(i).kind match {
        case U8 => out.write((asLong(v) & 0xff).toInt)
        case U32 => writeBE(out, asLong(v), 4)
        case U64 => writeBE(out, asLong(v), 8)
        case FixedBytes(n) =>
          val b = v.asInstanceOf[Array[Byte]]
          require(b.length == n, s"bytes$n field got ${b.length} bytes")
          out.write(b)
        case Str =>
          val b = v.asInstanceOf[UTF8String].getBytes
          writeBE(out, b.length.toLong, 4)
          out.write(b)
      }
      i += 1
    }
    out.toByteArray
  }

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case s: java.lang.Short => s.toLong
    case b: java.lang.Byte => b.toLong
  }

  private def writeBE(out: java.io.ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { out.write(((v >>> (i * 8)) & 0xff).toInt); i -= 1 }
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]) =
    copy(children = cs)
}
