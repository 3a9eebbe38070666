package graft

import graft.functions.Keccak
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Chain-type scalar functions (SURVEY.md §2.7 F3/F4): keccak256 against
  * published test vectors, and the U256 multi-representation fan-out.
  */
class ChainSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("keccak256 matches published test vectors") {
    assert(hex(Keccak.hash256(Array.empty[Byte])) ==
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hex(Keccak.hash256("abc".getBytes("UTF-8"))) ==
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(hex(Keccak.hash256(
      "The quick brown fox jumps over the lazy dog".getBytes("UTF-8"))) ==
      "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15")
    // multi-block input (> 136-byte rate)
    val big = Array.fill[Byte](1000)('a'.toByte)
    assert(Keccak.hash256(big).length == 32)
  }

  test("u256 fan-out representations agree on known values") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  u256_to_string(unhex('00000000000000000000000000000000000000000000000000000000000000ff')) AS s1,
        |  u256_to_u64(unhex('0000000000000000000000000000000000000000000000000de0b6b3a7640000')) AS u1,
        |  u256_to_f64(unhex('0000000000000000000000000000000000000000000000000de0b6b3a7640000')) AS f1,
        |  u256_to_u64(unhex('ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff')) AS u_overflow,
        |  u256_to_string(unhex('ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff')) AS s_max
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "255")
    assert(r.getLong(1) == 1000000000000000000L) // 1 ether in wei
    assert(r.getDouble(2) == 1.0e18)
    assert(r.isNullAt(3)) // overflow -> null
    assert(r.getString(4) ==
      "115792089237316195423570985008687907853269984665640564039457584007913129639935")
  }

  test("u256 f32/u32 variants and d128 declared-but-errors parity") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  u256_to_f32(unhex('0000000000000000000000000000000000000000000000000de0b6b3a7640000')) AS f32,
        |  u256_to_u32(unhex('00000000000000000000000000000000000000000000000000000000ffffffff')) AS u32_max,
        |  u256_to_u32(unhex('0000000000000000000000000000000000000000000000000000000100000000')) AS u32_over,
        |  u256_to_f32(unhex('ffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffffff')) AS f32_max
        |""".stripMargin).collect()(0)
    assert(r.getFloat(0) == 1.0e18f)
    assert(r.getLong(1) == 0xffffffffL) // full unsigned 32-bit range
    assert(r.isNullAt(2))               // 2^32 -> overflow -> null
    // 2^256-1 exceeds f32 range → +Inf (Rust's parse::<f32>() agrees)
    assert(r.getFloat(3).isPosInfinity)
    // d128 parity with the reference: declared, fails at analysis with the
    // reference's message (creation.rs:90-93 "DECIMAL128 not implemented")
    val e = intercept[Exception] {
      spark.sql("SELECT u256_to_d128(unhex('00ff'))").collect()
    }
    assert(e.getMessage.contains("DECIMAL128 not implemented"), e.getMessage)
  }

  test("K/M/B count literals parse like the reference CLI (blocks.rs:325-363)") {
    import graft.util.Parse
    assert(Parse.count("12345") == 12345L)
    assert(Parse.count("400k") == 400000L)
    assert(Parse.count("400K") == 400000L)
    assert(Parse.count("1.5M") == 1500000L)
    assert(Parse.count("2B") == 2000000000L)
    assert(Parse.count("1_000_000") == 1000000L)
    intercept[Exception](Parse.count("1.5"))   // bare fraction is ambiguous
    intercept[Exception](Parse.count("12x"))
    intercept[Exception](Parse.count(""))
    intercept[Exception](Parse.count("-5"))    // negative bare int fails fast
    intercept[Exception](Parse.count("-2K"))   // ... same as the suffixed path
  }

  test("keccak256 through a Spark plan (hex roundtrip, wei formatting)") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(10)
      .selectExpr(
        "doc_id",
        "concat('0x', lower(hex(keccak256(CAST(text AS BINARY))))) AS khex",
        "u256_to_f64(keccak256(CAST(text AS BINARY))) / 1e18 AS as_ether")
    val rows = df.collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getString(1).matches("0x[0-9a-f]{64}")))
    // expression agrees with the JVM kernel, keyed by doc_id
    val byId = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id").isin(byId.keys.toSeq: _*))
      .select("doc_id", "text").collect().foreach { r =>
        val expect = "0x" + hex(Keccak.hash256(r.getString(1).getBytes("UTF-8")))
        assert(byId(r.getLong(0)) == expect)
      }
  }
}
