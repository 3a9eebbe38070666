package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chop construction of fixed-length
  * pretraining blocks: within each shard, document token streams are
  * concatenated in doc_id order and chopped into blocks of exactly `cap`
  * tokens (the final block per shard may be short). No padding, no
  * discarded tokens; every non-final block is provably full.
  *
  * Sharding keeps the operator scale-honest: a single global concatenation
  * would serialize on one partition, so streams are concatenated per
  * `doc_id % nShards` shard and shards pack independently (at 100 TB,
  * shards ≈ executor-count × small constant; each block still mixes many
  * documents). The offset window runs over a SLIM projection (shard,
  * doc_id, n_tok) — the heavy token arrays never enter a sort. The offsets
  * rejoin the arrays via SHUFFLE_HASH (same rationale as the pipeline's
  * doc-key join: SMJ would sort the array side), then each doc row-locally
  * explodes into the block pieces it spans, and one slim aggregation of
  * (shard, block, len, checksum-contribution) rows forms the blocks.
  *
  * Output: (shard, pack_id, n_docs, pack_fill, pack_sum) where pack_sum is
  * the position-weighted checksum of the block's ACTUAL content — weight =
  * 1-based position INSIDE the block, spanning document boundaries — so an
  * external replay over the exploded token stream verifies that every
  * token landed in the right block at the right offset.
  */
object Packing {

  def packTokens(tokens: DataFrame, cap: Int, nShards: Int): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    require(nShards > 0, s"nShards must be positive: $nShards")
    graft.functions.GraftFunctions.register(tokens.sparkSession)
    val M = graft.sources.Tokens.ChecksumMod

    // per-doc start offset in its shard's concatenated stream, computed on
    // slim rows only (the window sorts (shard, doc_id, n_tok) triples)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = tokens
      .select(pmod(col("doc_id"), lit(nShards.toLong)).as("shard"),
        col("doc_id"), col("n_tok").cast("long").as("len"))
      .filter(col("len") > 0)
      .withColumn("start_off", coalesce(sum("len").over(w), lit(0L)))
      .select("doc_id", "shard", "start_off")

    tokens.select(col("doc_id"), col("n_tok").cast("long").as("len"), col("tokens"))
      .join(offsets.hint("SHUFFLE_HASH"), Seq("doc_id"))
      // the blocks this doc touches: floor(start/cap) .. floor((end-1)/cap)
      .select(col("shard"), col("start_off"), col("len"), col("tokens"),
        explode(expr(s"sequence(start_off div $cap, (start_off + len - 1) div $cap)"))
          .as("pack_id"))
      // the slice of this doc inside this block, and its block-local
      // 0-based start position q; per-token weight = q + j + 1
      .withColumn("lo", greatest(lit(0L), col("pack_id") * cap - col("start_off")))
      .withColumn("hi", least(col("len"), (col("pack_id") + 1) * cap - col("start_off")))
      .withColumn("q", col("start_off") + col("lo") - col("pack_id") * cap)
      .withColumn("piece", expr("slice(tokens, CAST(lo AS INT) + 1, CAST(hi - lo AS INT))"))
      // reduce the raw slice sum mod M BEFORE multiplying by q: the raw sum
      // reaches cap * 2^31, so q * rawSum overflows i64 once cap > 65536
      // (64k/128k-context packing); q * (M-1) stays safe to q ≈ 2^33
      .withColumn("contrib",
        expr(s"pmod(q * pmod(tokens_sum(piece), $M) + token_checksum(piece), $M)"))
      .groupBy("shard", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("hi") - col("lo")).as("pack_fill"),
        expr(s"pmod(sum(contrib), $M)").as("pack_sum"))
  }
}
