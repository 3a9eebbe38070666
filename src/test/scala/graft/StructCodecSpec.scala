package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-directed struct codec: roundtrip identity, malformed-input
  * null posture, plan-time schema, type checking, u64 narrowing.
  */
class StructCodecSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private val sig = "id:u64,n:u32,flag:u8,tag:bytes4,head:str"

  private def registered = {
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  test("decode ∘ encode is identity across kinds, incl. empty string") {
    val df = registered.range(0, 200)
      .selectExpr("id AS doc_id",
        s"""decode_struct(
           |  encode_struct('$sig', id * 7, id % 4096, id % 256,
           |                unhex(lpad(hex(id % 100), 8, '0')),
           |                CASE WHEN id % 7 = 0 THEN '' ELSE concat('doc-', id) END),
           |  '$sig') AS ev""".stripMargin)
      .selectExpr("doc_id", "ev.id", "ev.n", "ev.flag", "hex(ev.tag) AS tag", "ev.head")
    val rows = df.collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == d * 7)
      assert(r.getLong(2) == d % 4096)
      assert(r.getLong(3) == d % 256)
      assert(java.lang.Long.parseLong(r.getString(4), 16) == d % 100)
      assert(r.getString(5) == (if (d % 7 == 0) "" else s"doc-$d"))
    }
  }

  test("struct schema is visible to Catalyst at plan time") {
    val df = registered.range(0, 1)
      .selectExpr(s"decode_struct(encode_struct('a:u32,b:str', id, 'x'), 'a:u32,b:str') AS ev")
    assert(df.schema("ev").dataType.sql == "STRUCT<a: BIGINT, b: STRING>")
  }

  test("malformed blobs decode to null (truncated, trailing, bad length prefix)") {
    val cases = registered.sql(
      """SELECT
        |  decode_struct(unhex('0000'), 'a:u32') AS truncated,
        |  decode_struct(unhex('0000000105'), 'a:u32') AS trailing,
        |  decode_struct(unhex('ffffffff'), 'a:str') AS bad_len,
        |  decode_struct(unhex('00000001'), 'a:u32') AS ok
        |""".stripMargin).collect()(0)
    assert(cases.isNullAt(0) && cases.isNullAt(1) && cases.isNullAt(2))
    assert(cases.getStruct(3).getLong(0) == 1L)
  }

  test("u64 beyond i64 range decodes to null; u8/u32 bounds exact") {
    val r = registered.sql(
      """SELECT
        |  decode_struct(unhex('ffffffffffffffff'), 'v:u64') AS over,
        |  decode_struct(unhex('7fffffffffffffff'), 'v:u64') AS max,
        |  decode_struct(unhex('ff'), 'v:u8') AS b,
        |  decode_struct(unhex('ffffffff'), 'v:u32') AS w
        |""".stripMargin).collect()(0)
    assert(r.getStruct(0).isNullAt(0))
    assert(r.getStruct(1).getLong(0) == Long.MaxValue)
    assert(r.getStruct(2).getLong(0) == 255L)
    assert(r.getStruct(3).getLong(0) == 0xffffffffL)
  }

  test("arity/type mismatches fail analysis, not execution") {
    intercept[Exception] {
      registered.sql("SELECT encode_struct('a:u32,b:str', 1)").collect()
    }
    intercept[Exception] {
      registered.sql("SELECT encode_struct('a:u32', 'not-a-number')").collect()
    }
    intercept[Exception] {
      registered.sql("SELECT decode_struct(unhex('00'), 'a:wat')").collect()
    }
  }
}
