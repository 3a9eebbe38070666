package graft

import graft.pipeline.EncodePipeline
import graft.sinks.ManifestSink
import graft.sources.Tokens
import graft.streaming.StreamingEncode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-stream").toString

  test("streaming encode: micro-batches land in the manifest sink exactly once") {
    val in = freshDir(); val out = freshDir()
    val tokens = Tokens.synthetic(spark, 300)
    // several input files -> several micro-batches under maxFilesPerTrigger
    tokens.repartition(8).write.mode("overwrite").parquet(in)
    val cfg = EncodePipeline.Config(outDir = out, targetBinTokens = 4096, saltBuckets = 2)
    val q = StreamingEncode.encodeStream(spark, in, cfg).start()
    q.awaitTermination()
    val read = ManifestSink.readCommitted(spark, out)
    assert(read.count() == 300)
    assert(read.select("doc_id").distinct().count() == 300)
    assert(EncodePipeline.verifyRoundtrip(spark, tokens, out) == 0)
    // restart the stream over the same input: commit protocol makes the
    // replay a no-op (no duplicates)
    val q2 = StreamingEncode.encodeStream(spark, in, cfg).start()
    q2.awaitTermination()
    assert(ManifestSink.readCommitted(spark, out).count() == 300)
  }

  test("watermarked windowed aggregation over events matches batch result") {
    val q = StreamingEncode.eventCounts(spark, "/root/testdata/sf0.001")
      .writeStream.outputMode("complete")
      .format("memory").queryName("ev_counts")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT event_type, sum(n) AS n FROM ev_counts GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("stateful streaming dedup drops replayed doc_ids") {
    val in = freshDir()
    val tokens = Tokens.synthetic(spark, 100).cache()
    tokens.write.mode("overwrite").parquet(in)
    tokens.write.mode("append").parquet(in) // duplicate every row
    val q = StreamingEncode.dedupStream(spark, in)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    q.processAllAvailable()
    q.stop()
    assert(spark.sql("SELECT count(*) FROM dedup_out").collect()(0).getLong(0) == 100)
  }
}
