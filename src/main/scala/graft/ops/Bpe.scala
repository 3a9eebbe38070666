package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Distributed BPE tokenizer training — the corpus-scale merge-learning
  * loop (Sennrich et al., ACL'16 §3.2) over the engine's token tables:
  * each round counts every adjacent token pair across the corpus, picks
  * the most frequent under the (count DESC, lhs ASC, rhs ASC) total
  * order, and rewrites the corpus with the native [[graft.functions.BpeMerge]]
  * kernel. This is the operator a training pipeline runs BEFORE any of
  * the token tables exist (reference scope note: cryo has no tokenizer —
  * builder-mandate surface, like the dedup family).
  *
  * Scale shape, per round:
  *   - pair extraction is row-local (posexplode of a slice + element_at —
  *     all codegen'd; the array never crosses an exchange),
  *   - the only shuffle is the slim (lhs, rhs) count aggregation with
  *     map-side combine — pair cardinality, not corpus size,
  *   - the argmax plans as TakeOrderedAndProject (no global sort),
  *   - the merge rewrite is one codegen'd pass per row.
  * Rounds recompute the merged corpus from the source scan through the
  * stacked merge kernels (Catalyst collapses them into one projection) —
  * but only up to [[Bpe.CheckpointEvery]] deep: recomputing through r
  * stacked kernels makes round r cost r kernel passes (Θ(k²) total) and
  * re-analyzes an ever-growing plan, so every CheckpointEvery rounds the
  * corpus is materialized through the engine's iterative-loop barrier
  * (`Dedup.statsBarrier` + `freeCheckpoint`, the CC-loop pattern — a
  * localCheckpoint re-wrap that also stops Spark 4's originStats
  * carry-through). Result-invisible (same rows), spec-pinned by the
  * merged ≡ applyMerges equality in BpeSpec past the boundary.
  */
object Bpe {

  /** First fresh symbol id: 2^31, one above the int32 token domain, so
    * learned ids can never collide with input tokens.
    */
  val NewIdBase: Long = 1L << 31

  /** Materialize the merged corpus every this-many learned merges (see
    * the object scaladoc). Bounded kernel-stack depth between barriers;
    * the gate's 6-round run never crosses it, so gate plans are
    * barrier-free.
    */
  val CheckpointEvery: Int = 8

  /** One learned merge: replace adjacent (lhs, rhs) with new_id. Field
    * names are the gate query's output columns ("left"/"right" are SQL
    * keywords — lhs/rhs keeps the oracle quoting-free).
    */
  final case class Merge(merge_rank: Long, lhs: Long, rhs: Long,
      pair_count: Long, new_id: Long)

  /** Adjacent-pair frequency table of a (doc_id, tokens array<bigint>)
    * corpus: `(lhs, rhs, pair_count)`. Row-local expansion; the single
    * shuffle is the pair-count aggregation.
    */
  def pairCounts(corpus: DataFrame): DataFrame =
    corpus
      .filter(size(col("tokens")) >= 2)
      .select(
        posexplode(slice(col("tokens"), lit(1), size(col("tokens")) - 1))
          .as(Seq("j", "lhs")),
        col("tokens"))
      .select(col("lhs"),
        element_at(col("tokens"), col("j") + 2).as("rhs"))
      .groupBy("lhs", "rhs")
      .agg(count(lit(1)).as("pair_count"))

  /** Learn up to `nMerges` merges over `tokens` (needs `doc_id` and a
    * non-nullable-element `tokens` array column; int32 arrays are widened
    * to bigint once up front). Returns the merge table in learned order
    * and the fully merged corpus (doc_id, tokens array<bigint>). Stops
    * early if the corpus runs out of adjacent pairs. Deterministic: the
    * argmax order is total, so reruns learn the identical table.
    */
  def learnMerges(tokens: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    require(nMerges >= 1 && nMerges <= 4096,
      s"nMerges must be in [1, 4096]: $nMerges")
    graft.functions.GraftFunctions.register(tokens.sparkSession)
    var corpus = tokens.select(col("doc_id"),
      col("tokens").cast(ArrayType(LongType, containsNull = false)).as("tokens"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    var priorCp: DataFrame = null
    while (r < nMerges && !exhausted) {
      val top = pairCounts(corpus)
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(r.toLong, top(0).getLong(0), top(0).getLong(1),
          top(0).getLong(2), NewIdBase + r)
        merges += m
        corpus = applyMerge(corpus, m)
        r += 1
        if (r % CheckpointEvery == 0 && r < nMerges) {
          // bound the kernel-stack depth (Θ(k²) otherwise); free the
          // barrier this one supersedes — never the latest, which the
          // returned (still-lazy) corpus plan references
          val (wrapped, cp) = Dedup.statsBarrier(corpus)
          if (priorCp != null) Dedup.freeCheckpoint(priorCp)
          priorCp = cp
          corpus = wrapped
        }
      }
    }
    (merges.toSeq, corpus)
  }

  /** Rewrite the corpus under one merge (the native greedy kernel). */
  def applyMerge(corpus: DataFrame, m: Merge): DataFrame =
    corpus.withColumn("tokens",
      call_function("bpe_merge", col("tokens"),
        lit(m.lhs), lit(m.rhs), lit(m.new_id)))

  /** Apply an already-learned merge table in learned order — the
    * "tokenize with a trained BPE" path. One projection; Catalyst folds
    * the k kernels into a single codegen stage.
    */
  def applyMerges(tokens: DataFrame, merges: Seq[Merge]): DataFrame = {
    graft.functions.GraftFunctions.register(tokens.sparkSession)
    val base = tokens.select(col("doc_id"),
      col("tokens").cast(ArrayType(LongType, containsNull = false)).as("tokens"))
    merges.sortBy(_.merge_rank).foldLeft(base)(applyMerge)
  }
}
