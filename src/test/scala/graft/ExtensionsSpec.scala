package graft

import graft.plans.CodecRoundtripElimination
import graft.sources.Tokens
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions optimizer rule: codec roundtrip elimination
  * must remove decode∘encode chains from the plan (identity law) and fold
  * literal-codec lineage lookups, without changing any result values.
  * Installed per session (opt-in) — the driver's Verify runs WITHOUT it,
  * so correctness oracles always exercise the real codec path.
  */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  private val dir = "/root/testdata/sf0.001"

  private def query() = {
    graft.functions.GraftFunctions.register(spark)
    Tokens.fromDocuments(spark, dir).select(
      col("doc_id"),
      expr("token_checksum(decode_tokens(encode_auto(tokens)))").as("cks"),
      expr("codec_of(encode_tokens(tokens, 'rle'))").as("codec"))
  }

  test("roundtrip elimination: plan rewritten, values identical, opt-in only") {
    val baseline = query()
    val basePlan = baseline.queryExecution.optimizedPlan.toString
    assert(basePlan.contains("decode_tokens") && basePlan.contains("encode_auto"))
    val baseRows = baseline.orderBy("doc_id").collect()

    spark.experimental.extraOptimizations = Seq(CodecRoundtripElimination)
    try {
      val opt = query()
      val plan = opt.queryExecution.optimizedPlan.toString
      // decode∘encode chain gone; codec_of(encode_tokens(., 'rle')) folded
      // so no encode work remains at all
      assert(!plan.contains("decode_tokens"), plan)
      assert(!plan.contains("encode_auto"), plan)
      assert(!plan.contains("encode_tokens"), plan)
      assert(plan.contains("rle"), plan)
      val rows = opt.orderBy("doc_id").collect()
      assert(rows.sameElements(baseRows))
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }

  test("fold preserves null semantics: nullable input becomes a null-guarded literal") {
    spark.experimental.extraOptimizations = Seq(CodecRoundtripElimination)
    try {
      graft.functions.GraftFunctions.register(spark)
      // nullable tokens (when() introduces null): the encode is still
      // eliminated, but codec_of(null) must stay null
      val df = Tokens.fromDocuments(spark, dir)
        .withColumn("maybe",
          when(col("doc_id") % 2 === 0, col("tokens")))
        .select(col("doc_id"), expr("codec_of(encode_tokens(maybe, 'plain'))").as("c"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(!plan.contains("encode_tokens"), plan)
      assert(df.filter(col("doc_id") % 2 =!= 0 && col("c").isNotNull).count() == 0)
      assert(df.filter(col("doc_id") % 2 === 0 && col("c") =!= "plain").count() == 0)
      assert(df.filter(col("c") === "plain").count() > 0)
    } finally {
      spark.experimental.extraOptimizations = Nil
    }
  }
}
