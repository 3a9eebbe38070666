package graft.pipeline

import graft.functions.GraftFunctions
import graft.sinks.ManifestSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The full encode job (BASELINE.json north_star): stats → codec
  * auto-selection → salted repartition + size-based bin-packing → encode →
  * checkpointed sink with per-partition lineage + metrics.
  *
  * Mirrors the reference's pipeline stages (SURVEY.md §3.1): partition plan
  * (crates/cli/src/parse/partitions.rs), skip-existing
  * (crates/freeze/src/freeze.rs:96-109), per-run report
  * (crates/freeze/src/types/reports.rs) — all as declarative DataFrame ops,
  * no RDDs.
  *
  * Scale design notes (100 TB / 1000 executors):
  *  - the only wide exchanges are one window (per source×salt, bounded key
  *    cardinality = |sources| × saltBuckets) and one repartition by
  *    part_key; encode itself is embarrassingly parallel map work inside
  *    whole-stage codegen;
  *  - hot sources with giant arrays are split across saltBuckets before the
  *    window, so no single task sorts a whole hot source;
  *  - bin-packing bounds tokens (≈ bytes) per output file, so file sizes
  *    stay uniform regardless of skew;
  *  - resume/commit are metadata-only operations against a manifest dataset
  *    that Spark writes distributed (no driver-side collect of partitions).
  */
object EncodePipeline {

  final case class Config(
      outDir: String,
      targetBinTokens: Long = 1L << 20,  // ≈4 MB raw int32 per encode bin
      saltBuckets: Int = 16,
      maxPartitionsPerRun: Int = Int.MaxValue, // bound a run (resume testing / backfill waves)
      partPrefix: String = "", // scopes part_keys (e.g. streaming batch id) so
                               // different input slices can't collide on
                               // positional bin keys
      parquetCodec: String = "zstd") // file-level codec on top of the per-row
                                     // blobs: the lightweight codecs expose
                                     // cross-row structure zstd exploits
                                     // (0.71 B/tok vs 1.42 for zstd on raw)

  final case class RunSummary(
      runId: String,
      planned: Long,
      skipped: Long,
      committed: Long,
      nDocs: Long,
      nTokens: Long,
      rawBytes: Long,
      encodedBytes: Long,
      wallMs: Long)

  /** Partition planning: salt hot sources, then size-based bin-packing of
    * sequences by running token count within (source, salt), ordered by
    * doc_id (deterministic across parallelism levels — the window order is
    * total because doc_id is unique).
    */
  def plan(tokens: DataFrame, cfg: Config): DataFrame = {
    val w = Window.partitionBy("source", "salt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keyParts =
      (if (cfg.partPrefix.nonEmpty) Seq(lit(cfg.partPrefix)) else Seq.empty) ++
        Seq(col("source"), col("salt"), col("bin"))
    // Metadata only: the heavy token arrays must NOT flow through the
    // window shuffle — at 100 TB that would move the whole corpus an extra
    // time just to assign bin numbers. (Window group size is bounded by
    // |sources| × saltBuckets; size saltBuckets so a group's *metadata*
    // fits one task.)
    tokens
      .select("doc_id", "source", "n_tok")
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(cfg.saltBuckets)).cast("int"))
      .withColumn("bin",
        floor((sum(col("n_tok").cast("long")).over(w) - col("n_tok")) / lit(cfg.targetBinTokens)))
      .withColumn("part_key", concat_ws("/", keyParts: _*))
  }

  /** Execute one run: encode + commit all not-yet-committed partitions
    * (bounded by cfg.maxPartitionsPerRun). Returns the run summary.
    */
  def run(spark: SparkSession, tokens: DataFrame, cfg: Config): RunSummary = {
    GraftFunctions.register(spark)
    val t0 = System.nanoTime()
    val runId = f"run-${ManifestSink.committedRunIds(cfg.outDir).size}%05d-${java.util.UUID.randomUUID.toString.take(8)}"

    val committedKeys = ManifestSink.committedManifest(spark, cfg.outDir)
      .select("part_key").distinct()

    // Per-doc partition assignments (slim metadata) are persisted so the
    // plan/skip/limit accounting and the key join never re-derive the
    // input; the heavy arrays are read exactly once per run, in the encode
    // pass (the reference's plan-then-collect shape, freeze.rs:26-125).
    val plannedParts = plan(tokens, cfg).persist(StorageLevel.MEMORY_AND_DISK)
    val plannedKeys = plannedParts.select("part_key").distinct()
    val nPlanned = plannedKeys.count()
    // resume: skip already-committed partitions (freeze.rs:96-109 analog)
    var todoKeys = plannedKeys.join(broadcast(committedKeys), Seq("part_key"), "left_anti")
    val nTodo = todoKeys.count()
    val nSkipped = nPlanned - nTodo // previously committed (≠ deferred below)
    if (cfg.maxPartitionsPerRun != Int.MaxValue) {
      todoKeys = todoKeys.orderBy("part_key").limit(cfg.maxPartitionsPerRun)
    }

    // Shuffle economics (100 TB view): the raw arrays cross exactly ONE
    // exchange (the doc_id join against the slim key table); encoding runs
    // map-side in the same stage, so the repartition-by-partition-key that
    // controls file layout moves only the compressed blobs (~2.5-5× less).
    val docTodo = plannedParts
      .join(broadcast(todoKeys), Seq("part_key"), "left_semi")
      .select("doc_id", "salt", "bin", "part_key")
    // SHUFFLE_HASH on the slim side: a sort-merge join would SORT the heavy
    // array side (observed 4× pipeline regression when the planner flipped
    // to SMJ); hashing the per-partition metadata keeps the arrays
    // sort-free through their single exchange.
    val encoded = tokens
      .join(docTodo.hint("SHUFFLE_HASH"), Seq("doc_id"))
      .withColumn("blob", expr("encode_auto(tokens)"))
      .withColumn("codec", expr("codec_of(blob)"))
      .withColumn("run_id", lit(runId))
      .drop("tokens")
      .repartition(col("part_key"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    try {
      encoded
        .select("part_key", "run_id", "doc_id", "source", "salt", "bin",
          "n_tok", "codec", "blob")
        .write.mode("append").partitionBy("source")
        .option("compression", cfg.parquetCodec)
        .parquet(ManifestSink.dataDir(cfg.outDir))

      // per-partition lineage + metrics rows (reports.rs / summaries.rs
      // analog); majority codec per partition recorded alongside sizes.
      val manifest = encoded.groupBy("part_key", "source", "salt", "bin", "run_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("n_tokens"),
          (sum(col("n_tok").cast("long")) * 4).as("raw_bytes"),
          sum(length(col("blob")).cast("long")).as("encoded_bytes"),
          max_by(col("codec"), length(col("blob"))).as("codec"),
          lit((System.nanoTime() - t0) / 1000000).as("wall_ms"))
        .persist(StorageLevel.MEMORY_AND_DISK)

      manifest
        .select(ManifestSink.ManifestSchemaCols.map(col): _*)
        .write.mode("append").partitionBy("run_id")
        .parquet(ManifestSink.manifestDir(cfg.outDir))

      val totals = manifest.agg(
        count(lit(1)), coalesce(sum("n_docs"), lit(0L)),
        coalesce(sum("n_tokens"), lit(0L)), coalesce(sum("raw_bytes"), lit(0L)),
        coalesce(sum("encoded_bytes"), lit(0L))).collect()(0)
      val nParts = totals.getLong(0)
      val wallMs = (System.nanoTime() - t0) / 1000000
      val summary = RunSummary(runId, nPlanned, nSkipped, nParts,
        totals.getLong(1), totals.getLong(2), totals.getLong(3),
        totals.getLong(4), wallMs)

      // atomic publish — everything above is invisible until this succeeds
      ManifestSink.commitRun(cfg.outDir, runId, summaryJson(summary))
      summary
    } finally {
      encoded.unpersist()
      plannedParts.unpersist()
    }
  }

  /** Run to completion (multiple bounded runs if maxPartitionsPerRun set). */
  def runAll(spark: SparkSession, tokens: DataFrame, cfg: Config): Seq[RunSummary] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[RunSummary]
    var done = false
    while (!done) {
      val s = run(spark, tokens, cfg)
      out += s
      done = s.committed == 0 || s.skipped + s.committed >= s.planned
    }
    out.toSeq
  }

  /** Snapshot read of committed encoded rows with decoded token arrays. */
  def readDecoded(spark: SparkSession, outDir: String): DataFrame = {
    GraftFunctions.register(spark)
    ManifestSink.readCommitted(spark, outDir)
      .withColumn("tokens", expr("decode_tokens(blob)"))
  }

  /** Roundtrip verification: per-row token-array equality against the
    * original (north-rule invariant). Returns the number of violating rows
    * (0 = bit-identical everywhere).
    */
  def verifyRoundtrip(spark: SparkSession, original: DataFrame, outDir: String): Long = {
    val decoded = readDecoded(spark, outDir).select(col("doc_id"), col("tokens").as("decoded"))
    original.select("doc_id", "tokens")
      .join(decoded, Seq("doc_id"), "full_outer")
      .filter(not(col("tokens") <=> col("decoded")))
      .count()
  }

  private def summaryJson(s: RunSummary): String =
    s"""{"run_id":"${s.runId}","planned":${s.planned},"skipped":${s.skipped},
       |"committed":${s.committed},"n_docs":${s.nDocs},"n_tokens":${s.nTokens},
       |"raw_bytes":${s.rawBytes},"encoded_bytes":${s.encodedBytes},
       |"wall_ms":${s.wallMs}}""".stripMargin.replace("\n", "")
}
