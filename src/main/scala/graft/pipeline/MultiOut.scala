package graft.pipeline

import graft.functions.GraftFunctions
import graft.sinks.Export
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** J4 user-facing multi-output scan sharing — the reference's
  * `cluster_datatypes` groups scalar datasets that share one RPC scan so
  * the fetch happens once (crates/freeze/src/types/datatypes/meta.rs:23-39);
  * the pipeline already does that shape internally (one encoded cache →
  * data + manifest), and this runner exposes it to users: one cached pass
  * over an input scan fans into N sinks, each a named transform of the
  * SAME InMemoryRelation.
  *
  * Scale notes (100 TB): the cache is MEMORY_AND_DISK — at corpus scale
  * this is a deliberate trade (one disk-backed materialization vs N full
  * input scans); transforms that reduce early (aggregates, projections)
  * read the cached columnar batches, and every output write is a normal
  * distributed write. The single `count()` materializes the cache exactly
  * once so no output pays the build cost alone (and partially-built-cache
  * races between outputs can't double-scan the input).
  */
object MultiOut {

  /** One fan-out output: a name (becomes the subdirectory under the root)
    * and a transform applied to the shared cached input.
    */
  final case class Output(
      name: String,
      transform: DataFrame => DataFrame,
      format: String = "parquet")

  final case class Committed(name: String, dir: String, rows: Long)

  /** Cache the input once, write every output, unpersist. Output dirs are
    * `root/<name>`; returns per-output row counts for accounting.
    */
  def run(spark: SparkSession, input: DataFrame, root: String,
      outputs: Seq[Output], compression: String = "zstd"): Seq[Committed] = {
    require(outputs.nonEmpty, "at least one output required")
    val names = outputs.map(_.name)
    require(names.distinct == names, s"duplicate output names: $names")
    names.foreach(n => graft.util.PathSegment.validate(n, "output name"))
    GraftFunctions.register(spark)
    val cached = input.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cached.count() // materialize the shared scan exactly once
      outputs.map { o =>
        val df = o.transform(cached)
        val dir = s"$root/${o.name}"
        val rows = df.persist(StorageLevel.MEMORY_AND_DISK).count()
        try Export.write(df, dir, o.format, compression)
        finally df.unpersist()
        Committed(o.name, dir, rows)
      }
    } finally cached.unpersist()
  }

  /** The canonical fan-out a training-data pipeline wants from one corpus
    * scan: encoded blobs, per-source stats, and the token vocabulary —
    * three sinks, one pass over the (heavy) token arrays.
    */
  def standard(spark: SparkSession, tokens: DataFrame, root: String): Seq[Committed] =
    run(spark, tokens, root, Seq(
      Output("encoded", df => df
        .select(col("doc_id"), col("source"), col("n_tok"),
          expr("encode_auto(tokens)").as("blob"))
        .withColumn("codec", expr("codec_of(blob)"))),
      Output("stats", df => df
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("n_tokens"),
          min("n_tok").as("min_tok"), max("n_tok").as("max_tok"))),
      Output("vocab", df => df
        .select(explode(col("tokens")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n")))))
}
