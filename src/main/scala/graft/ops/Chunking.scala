package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking of token sequences — the training-data step
  * that splits documents longer than the model context into overlapping
  * windows (stride = maxTokens - overlap), so no training sample exceeds
  * the context and boundaries keep `overlap` tokens of continuity.
  *
  * Pure row-local explode (no shuffle, no state): each input row emits
  * its windows from `sequence` + `slice` inside whole-stage codegen, so
  * the operator scales as a map over the corpus. Window count per doc is
  * 1 when 0 < n_tok ≤ maxTokens, else ceil((n_tok - maxTokens) / stride)
  * + 1 — the last window ends exactly at the sequence end (it may be
  * shorter than maxTokens but is never empty, and no extra window starts
  * inside the previous window's tail). Empty documents (n_tok = 0) emit
  * no windows at all — same rule as [[Packing]], and the same row the
  * oracle's inner join against the token stream drops.
  *
  * Output: (doc_id, source, chunk_id, chunk_start, chunk_len, chunk_sum)
  * where chunk_sum is the position-weighted checksum of the window's
  * ACTUAL tokens (the native token_checksum kernel over the slice) — so
  * an external replay verifies window content, not just geometry.
  */
object Chunking {

  def chunkTokens(tokens: DataFrame, maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens): $overlap vs $maxTokens")
    graft.functions.GraftFunctions.register(tokens.sparkSession)
    val stride = maxTokens - overlap
    tokens
      .filter(col("n_tok") > 0)
      .withColumn("n_chunks",
        when(col("n_tok") <= maxTokens, lit(1L)).otherwise(
          ceil((col("n_tok").cast("long") - maxTokens) / lit(stride.toDouble))
            .cast("long") + 1L))
      .select(col("doc_id"), col("source"), col("n_tok"), col("tokens"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("chunk_id"))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .withColumn("chunk_len",
        least(lit(maxTokens.toLong), col("n_tok").cast("long") - col("chunk_start")))
      .withColumn("chunk_sum", expr(
        "token_checksum(slice(tokens, CAST(chunk_start AS INT) + 1, CAST(chunk_len AS INT)))"))
      .select("doc_id", "source", "chunk_id", "chunk_start", "chunk_len", "chunk_sum")
  }
}
