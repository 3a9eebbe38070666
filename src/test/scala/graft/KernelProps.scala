package graft

import graft.functions.{ChecksumKernels, StructDecoder, StructSchema, EncodeStruct}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** Property laws for the round-2 native kernels: the checksum/fingerprint
  * arithmetic vs an independent BigInt reference, and the schema-directed
  * struct codec's encode∘decode identity over random signatures/values.
  */
object KernelProps extends Properties("kernels") {

  private val Mod = BigInt(1000000007L)

  property("token_checksum ≡ BigInt reference") =
    Prop.forAll(Gen.containerOf[Array, Int](Gen.chooseNum(Int.MinValue, Int.MaxValue))) { xs =>
      val expect = xs.zipWithIndex
        .map { case (x, i) => BigInt(i + 1) * BigInt(x) }
        .foldLeft(BigInt(0))(_ + _).mod(Mod) // BigInt.mod is non-negative
      val got = ChecksumKernels.tokenChecksum(new GenericArrayData(xs))
      // java % can be negative for negative sums; compare congruence
      (BigInt(got) - expect).mod(Mod) == BigInt(0)
    }

  property("tokens_sum ≡ BigInt reference (no overflow for realistic rows)") =
    Prop.forAll(Gen.containerOf[Array, Int](Gen.chooseNum(Int.MinValue, Int.MaxValue))) { xs =>
      ChecksumKernels.tokensSum(new GenericArrayData(xs)) ==
        xs.foldLeft(0L)((a, b) => a + b)
    }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.chooseNum(1, 127).map(_.toChar)).map(_.mkString)
  private val anyText: Gen[String] = Gen.oneOf(
    asciiText,
    Gen.listOf(Gen.oneOf(Gen.chooseNum(1, 127).map(_.toChar),
      Gen.oneOf('é', 'ß', '日', '本', '→'))).map(_.mkString))

  property("char_fingerprint ≡ BigInt code-point reference") =
    Prop.forAll(anyText) { s =>
      var expect = BigInt(0)
      var pos = 1
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        expect += BigInt(pos) * BigInt(cp)
        pos += 1
        i += Character.charCount(cp)
      }
      ChecksumKernels.charFingerprint(UTF8String.fromString(s)) ==
        (expect.mod(Mod)).toLong
    }

  // ---- struct codec: random signature + matching values → identity ----

  private sealed trait FieldVal { def kind: String; def lit: Literal }
  private case class IntF(kind: String, v: Long) extends FieldVal {
    def lit = Literal(v)
  }
  private case class BytesF(n: Int, bs: Array[Byte]) extends FieldVal {
    def kind = s"bytes$n"; def lit = Literal(bs)
  }
  private case class StrF(s: String) extends FieldVal {
    def kind = "str"; def lit = Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType)
  }

  private val fieldGen: Gen[FieldVal] = Gen.oneOf(
    Gen.chooseNum(0L, 255L).map(IntF("u8", _)),
    Gen.chooseNum(0L, 0xffffffffL).map(IntF("u32", _)),
    Gen.chooseNum(0L, Long.MaxValue).map(IntF("u64", _)),
    Gen.chooseNum(1, 8).flatMap(n =>
      Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127).map(_.toByte))
        .map(BytesF(n, _))),
    asciiText.map(StrF))

  property("encode_struct ∘ decode_struct identity over random signatures") =
    Prop.forAll(Gen.nonEmptyListOf(fieldGen)) { fields =>
      val sig = fields.zipWithIndex
        .map { case (f, i) => s"f$i:${f.kind}" }.mkString(",")
      val blob = EncodeStruct(Literal(UTF8String.fromString(sig),
          org.apache.spark.sql.types.StringType) +: fields.map(_.lit))
        .eval(InternalRow.empty).asInstanceOf[Array[Byte]]
      val row = new StructDecoder(StructSchema.parse(sig)).decode(blob)
      row != null && fields.zipWithIndex.forall { case (f, i) =>
        f match {
          case IntF(_, v) => row.getLong(i) == v
          case BytesF(n, bs) => java.util.Arrays.equals(row.getBinary(i), bs)
          case StrF(s) => row.getUTF8String(i).toString == s
        }
      }
    }

  property("decode_struct never throws on arbitrary bytes (null posture)") =
    Prop.forAll(Gen.containerOf[Array, Byte](Gen.chooseNum(-128, 127).map(_.toByte))) { bs =>
      val dec = new StructDecoder(StructSchema.parse("a:u32,b:str,c:u8"))
      val r = dec.decode(bs) // must return a row or null, never throw
      r == null || r.numFields == 3
    }
}
