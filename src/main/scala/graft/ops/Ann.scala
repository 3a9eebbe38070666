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

  /** sum(x*y) over two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Adds `unit`: the L2-normalized double vector (cosine = dot of units). */
  def normalized(embeds: DataFrame): DataFrame = {
    val asDouble = col("embedding").cast("array<double>")
    embeds.withColumn("unit",
      zip_with(asDouble, array_repeat(norm(asDouble), size(col("embedding"))),
        (x, n) => x / n))
  }

  /** Per-table sign-bit buckets from deterministic pseudo-random
    * hyperplanes: plane (t, p), dim d weight = xxhash64-derived uniform in
    * [-0.5, 0.5). Pure function of (tables, planes, dim) — identical across
    * executors, no runtime randomness.
    */
  def bucketsExpr(planes: Int, tables: Int): Column = expr(
    s"""transform(sequence(0, ${tables - 1}), t ->
       |  aggregate(transform(sequence(0, ${planes - 1}), p ->
       |    CASE WHEN aggregate(
       |      zip_with(unit, transform(sequence(0, size(unit) - 1),
       |        d -> CAST(xxhash64((t * 64 + p) * 4096 + d) % 1000000 AS DOUBLE) / 1000000.0 - 0.5),
       |      (x, w) -> x * w), 0.0D, (a, v) -> a + v) > 0
       |    THEN shiftleft(1L, p) ELSE 0L END), 0L, (a, b) -> a | b))""".stripMargin)

  /** Exploded (table_id, bucket) rows per vector — the LSH index shape the
    * candidate joins shuffle on (never the vectors themselves beyond the
    * final candidate scoring).
    */
  def lshIndex(embedsWithUnit: DataFrame, planes: Int, tables: Int): DataFrame =
    embedsWithUnit
      .withColumn("buckets", bucketsExpr(planes, tables))
      .select(col("*"), posexplode(col("buckets")).as(Seq("table_id", "bucket")))
      .drop("buckets")

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
