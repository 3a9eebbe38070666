package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Brute-force cosine top-k as the correctness baseline;
  * random-hyperplane LSH with OR-amplification (L independent tables of
  * `planes` sign bits each) as the scale path — candidate sets shrink by
  * ~2^planes per table while recall amplifies as 1-(1-p^planes)^L.
  *
  * All math is done in double precision via codegen'd higher-order
  * functions (zip_with / aggregate) — no UDFs.
  */
object Ann {

  /** sum(x*y) over two array<double> columns (native codegen'd kernel). */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Adds `unit`: the L2-normalized double vector (cosine = dot of units). */
  def normalized(embeds: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(embeds.sparkSession)
    embeds.withColumn("unit",
      call_function("vec_normalize", col("embedding").cast("array<double>")))
  }

  /** Per-table sign-bit buckets from deterministic pseudo-random
    * hyperplanes (splitmix64-derived weights - a pure function of
    * (table, plane, dim), identical across executors). Backed by the
    * native [[graft.functions.HyperplaneBuckets]] expression: an equivalent
    * higher-order-function formulation pays interpreted-lambda overhead per
    * (table x plane x dim) evaluation, ~2048 expression evals per row.
    */
  def bucketsExpr(planes: Int, tables: Int): Column =
    call_function("hyperplane_buckets", col("unit"), lit(planes), lit(tables))

  /** Exploded (table_id, bucket) rows per vector — the LSH index shape the
    * candidate joins shuffle on (never the vectors themselves beyond the
    * final candidate scoring).
    */
  def lshIndex(embedsWithUnit: DataFrame, planes: Int, tables: Int): DataFrame = {
    graft.functions.GraftFunctions.register(embedsWithUnit.sparkSession)
    embedsWithUnit
      .withColumn("buckets", bucketsExpr(planes, tables))
      .select(col("*"), posexplode(col("buckets")).as(Seq("table_id", "bucket")))
      .drop("buckets")
  }

  /** Brute-force cosine top-k: probes (small, broadcast) × corpus, ranked
    * per probe. O(|probes| × |corpus|) with no shuffle on the corpus side
    * beyond the final per-probe top-k window.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val c = normalized(corpus).select(col("vec_id").as("nbr_id"), col("unit").as("nbr_unit"))
    val p = normalized(probes).select(col("vec_id").as("probe_id"), col("unit").as("probe_unit"))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("nbr_id"))
    p.join(c, col("probe_id") =!= col("nbr_id")) // broadcast(p) chosen by Catalyst/AQE
      .withColumn("cosine", dot(col("probe_unit"), col("nbr_unit")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("nbr_id"))
  }

  /** LSH top-k: candidates = corpus vectors sharing any table bucket with
    * the probe (OR-amplified), deduped, then exact cosine + per-probe top-k.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      planes: Int = 8, tables: Int = 4): DataFrame = {
    val cIdx = lshIndex(normalized(corpus), planes, tables)
      .select(col("vec_id").as("nbr_id"), col("table_id"), col("bucket"))
    val pIdx = lshIndex(normalized(probes), planes, tables)
      .select(col("vec_id").as("probe_id"), col("table_id"), col("bucket"))
    val candidates = pIdx.join(cIdx, Seq("table_id", "bucket"))
      .filter(col("probe_id") =!= col("nbr_id"))
      .select("probe_id", "nbr_id")
      .distinct()
    val c = normalized(corpus).select(col("vec_id").as("nbr_id"), col("unit").as("nbr_unit"))
    val p = normalized(probes).select(col("vec_id").as("probe_id"), col("unit").as("probe_unit"))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("nbr_id"))
    candidates
      .join(p, "probe_id")
      .join(c, "nbr_id")
      .withColumn("cosine", dot(col("probe_unit"), col("nbr_unit")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("rank").cast("long").as("rank"), col("nbr_id"))
  }
}
