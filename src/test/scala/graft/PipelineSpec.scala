package graft

import graft.pipeline.EncodePipeline
import graft.sinks.ManifestSink
import graft.sources.Tokens
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** E2E pipeline tests (SURVEY.md §5 plan #4): roundtrip equality via join on
  * doc_id, resumability (partial commit → rerun → no duplicates, skips
  * recorded — mirrors crates/freeze/src/freeze.rs:96-99), lineage/metrics
  * rows present, compression beats the raw-bytes baseline, and bit-identical
  * output across input parallelism levels.
  */
class PipelineSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.get
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-sink").toString

  private val cfgBase = EncodePipeline.Config(outDir = "", targetBinTokens = 4096,
    saltBuckets = 4)

  test("full run: roundtrip bit-identity, lineage, compression") {
    val out = freshDir()
    val tokens = Tokens.synthetic(spark, 800)
    val s = EncodePipeline.run(spark, tokens, cfgBase.copy(outDir = out))
    assert(s.committed > 0 && s.skipped == 0 && s.committed == s.planned)
    assert(s.nDocs == 800)
    // north-rule per-row invariant
    assert(EncodePipeline.verifyRoundtrip(spark, tokens, out) == 0)
    // lineage + metrics table
    val mf = ManifestSink.committedManifest(spark, out)
    assert(mf.count() == s.committed)
    val sums = mf.agg(sum("n_docs"), sum("raw_bytes"), sum("encoded_bytes")).collect()(0)
    assert(sums.getLong(0) == 800)
    assert(sums.getLong(2) < sums.getLong(1), "encoded must beat raw int32 bytes")
    // run report published atomically
    assert(ManifestSink.readCommitSummaries(out).nonEmpty)
  }

  test("resume: bounded runs commit incrementally with zero duplicates") {
    val out = freshDir()
    val tokens = Tokens.synthetic(spark, 500)
    val cfg = cfgBase.copy(outDir = out, maxPartitionsPerRun = 3,
      targetBinTokens = 16384, saltBuckets = 2)
    val first = EncodePipeline.run(spark, tokens, cfg)
    assert(first.committed == 3 && first.planned > 3)
    val rest = EncodePipeline.runAll(spark, tokens, cfg)
    assert(rest.map(_.committed).sum == first.planned - 3)
    // skip accounting mirrors freeze.rs n_skipped
    assert(rest.last.skipped + rest.last.committed == first.planned)
    // no duplicates, full coverage
    val read = ManifestSink.readCommitted(spark, out)
    assert(read.count() == 500)
    assert(read.select("doc_id").distinct().count() == 500)
    assert(EncodePipeline.verifyRoundtrip(spark, tokens, out) == 0)
    // a full rerun is a no-op: everything skipped
    val again = EncodePipeline.run(spark, tokens, cfg.copy(maxPartitionsPerRun = Int.MaxValue))
    assert(again.committed == 0 && again.skipped == again.planned)
    assert(ManifestSink.readCommitted(spark, out).count() == 500)
  }

  test("orphans from uncommitted runs stay invisible") {
    val out = freshDir()
    val tokens = Tokens.synthetic(spark, 200)
    EncodePipeline.run(spark, tokens, cfgBase.copy(outDir = out))
    val before = ManifestSink.readCommitted(spark, out).count()
    // simulate a crashed run: data + manifest written, no commit marker
    graft.functions.GraftFunctions.register(spark)
    tokens
      .join(EncodePipeline.plan(tokens, cfgBase.copy(outDir = out))
        .select("doc_id", "salt", "bin", "part_key"), Seq("doc_id"))
      .limit(50)
      .withColumn("blob", expr("encode_auto(tokens)"))
      .withColumn("codec", expr("codec_of(blob)"))
      .withColumn("run_id", lit("run-99999-deadbeef"))
      .drop("tokens")
      .select("part_key", "run_id", "doc_id", "source", "salt", "bin", "n_tok", "codec", "blob")
      .write.mode("append").partitionBy("source")
      .parquet(ManifestSink.dataDir(out))
    assert(ManifestSink.readCommitted(spark, out).count() == before)
  }

  test("encoded bytes are identical across input parallelism levels") {
    val out4 = freshDir(); val out1 = freshDir()
    val t4 = Tokens.synthetic(spark, 300, numPartitions = 8)
    val t1 = Tokens.synthetic(spark, 300, numPartitions = 1)
    EncodePipeline.run(spark, t4, cfgBase.copy(outDir = out4))
    EncodePipeline.run(spark, t1, cfgBase.copy(outDir = out1))
    def fingerprint(dir: String): Array[org.apache.spark.sql.Row] =
      ManifestSink.readCommitted(spark, dir)
        .select(col("doc_id"), col("part_key"), xxhash64(col("blob")).as("h"))
        .orderBy("doc_id").collect()
    assert(fingerprint(out4).sameElements(fingerprint(out1)))
  }

  test("skew: giant hot-source arrays spread over salted bins") {
    val tokens = Tokens.synthetic(spark, 1000)
    val planned = EncodePipeline.plan(tokens, cfgBase.copy(outDir = "unused"))
    val web = planned.filter($"source" === "web")
    // hot source splits across multiple salt buckets
    assert(web.select("salt").distinct().count() == 4)
    // bins respect the target: no bin (except single-doc giants) exceeds
    // target + one max doc
    val maxDoc = tokens.agg(max("n_tok")).collect()(0).getInt(0).toLong
    val over = planned.groupBy("part_key")
      .agg(sum($"n_tok".cast("long")).as("tok"))
      .filter($"tok" > 4096L + maxDoc)
      .count()
    assert(over == 0)
  }
}
