package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: quality scoring,
  * token counting, language-ID heuristic, document fingerprinting. All
  * single-pass, shuffle-free per-row expressions (portable enough for the
  * DuckDB oracle to replay value-exactly).
  */
object TextOps {

  /** Quality stats: word/char counts, average word length (×10, integer),
    * stopword density (per 1000 words). Space-counting via length-replace
    * keeps the arithmetic portable across engines.
    */
  def quality(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long").as("n_words"))
      .withColumn("avg_word_len_x10",
        expr("CAST(floor(10.0 * (n_chars - n_words + 1) / n_words) AS BIGINT)"))

  /** Stopword-based language-ID heuristic: density of a tiny English
    * function-word set; `pred` = 'en' over a threshold. (The corpus being
    * synthetic word soup, this measures plumbing, not linguistics.)
    */
  def langid(docs: DataFrame): DataFrame = {
    def occurrences(word: String) =
      ((length(col("padded")) - length(regexp_replace(col("padded"), s" $word ", "")))
        / (word.length + 2))
    docs
      .withColumn("padded", concat(lit(" "), col("text"), lit(" ")))
      .withColumn("n_stop",
        (occurrences("the") + occurrences("a") + occurrences("data")).cast("long"))
      .withColumn("n_words",
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1).cast("long"))
      .select(col("doc_id"), col("lang"), col("n_stop"),
        expr("CASE WHEN n_stop * 1000 / n_words >= 30 THEN 'en_like' ELSE 'other' END").as("pred"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation count
    * (letter runs / digit runs / single punctuation).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
        .cast("long").as("n_ws_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))
        .cast("long").as("n_bpe_tokens"))

  /** Position-weighted rolling fingerprint over character codes:
    * sum(i * ascii(text[i])) % p — an order-sensitive content hash that both
    * engines can compute identically. Computed by the native
    * [[graft.functions.CharFingerprint]] kernel (the SQL-lambda mirror is
    * [[fingerprintSql]]; equivalence asserted in OpsSpec — the lambda form
    * was the last interpreted-HOF hot path in the round-1 bench).
    */
  def fingerprint(docs: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col("doc_id"),
      expr("char_fingerprint(text)").as("fingerprint"))
  }

  /** SQL-lambda mirror of the fingerprint kernel (equivalence-test form). */
  val fingerprintSql: String =
    """aggregate(
      |  transform(sequence(1, length(text)),
      |    i -> CAST(i AS BIGINT) * ascii(substring(text, i, 1))),
      |  0L, (a, b) -> a + b) % 1000000007""".stripMargin
}
