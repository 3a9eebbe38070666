package graft

import graft.sinks.{Export, ManifestSink}
import graft.pipeline.EncodePipeline
import graft.sources.Tokens
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multi-format write∘read identity over the encoded table (reference
  * roundtrip invariant, crates/python/python_tests/test_output_formats.py:
  * 9-41: freeze to each format, read back, frame_equal vs collect).
  */
class ExportSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  test("parquet/csv/json exports roundtrip the encoded table bit-identically") {
    val sink = java.nio.file.Files.createTempDirectory("graft-export-src").toString
    val tokens = Tokens.synthetic(spark, 200)
    EncodePipeline.run(spark, tokens,
      EncodePipeline.Config(outDir = sink, targetBinTokens = 8192))
    val encoded = ManifestSink.readCommitted(spark, sink)
      .select("doc_id", "source", "n_tok", "codec", "blob")

    // column-set selection at the export boundary (schemas.rs algebra on
    // the writer path): explicit list, include-append, exclude
    val selDir = java.nio.file.Files.createTempDirectory("graft-export-sel").toString
    Export.write(encoded, selDir, "parquet", "snappy",
      graft.ops.ColumnSelect.Spec(
        include = Some(Seq("codec")), exclude = Some(Seq("n_tok"))),
      defaults = Seq("doc_id", "source", "n_tok"))
    assert(spark.read.parquet(selDir).columns.toSeq == Seq("doc_id", "source", "codec"))

    for (format <- Export.Formats) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-export-$format").toString
      Export.write(encoded, dir, format)
      val back = Export.read(spark, dir, format, encoded.schema)
      assert(back.count() == 200, format)
      // full-row equality incl. the binary blob, via anti-join both ways
      assert(back.exceptAll(encoded).count() == 0, s"$format extra rows")
      assert(encoded.exceptAll(back).count() == 0, s"$format missing rows")
      // and the blobs still decode to the original tokens
      graft.functions.GraftFunctions.register(spark)
      val bad = back.withColumn("decoded", expr("decode_tokens(blob)"))
        .join(tokens.select(col("doc_id"), col("tokens")), "doc_id")
        .filter(not(col("decoded") <=> col("tokens")))
      assert(bad.count() == 0, s"$format decode mismatch")
    }
  }
}
