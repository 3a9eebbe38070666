package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[Queries]] (token/codec operators) and
  * [[Ops]] (training-data pipeline operators); the flagship `entry` runs the
  * full encode pipeline on sf0.001.
  */
object SparkEntry {

  /** Flagship: the full encode pipeline — salted bin-packing partition plan
    * → codec auto-select → encode → checkpointed manifest sink — on the
    * sf0.001 token table, returning the per-partition lineage + metrics
    * rows; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val tokens = graft.sources.Tokens.fromDocuments(spark, "/root/testdata/sf0.001")
    val out = java.nio.file.Files.createTempDirectory("graft-entry").toString
    graft.pipeline.EncodePipeline.run(spark, tokens,
      graft.pipeline.EncodePipeline.Config(outDir = out, targetBinTokens = 1L << 16))
    graft.sinks.ManifestSink.committedManifest(spark, out)
  }

  private def merged: Map[String, Queries.Q] = Queries.all ++ OpsQueries.all

  /** One entry per implemented operator from SURVEY.md §2 + the
    * training-data pipeline ops (dedup / similarity / text / multimodal).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for engine-internal/approximate ops
    * (encoded sizes, LSH candidates, fake media decode) → rows-only check;
    * those are verified against exact baselines in the ScalaTest suites.
    */
  def oracleSql: Map[String, String] =
    merged.collect { case (k, Queries.Q(_, Some(o))) => k -> o }
}
