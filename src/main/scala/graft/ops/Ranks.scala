package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global row-numbering without a global window. `Window.orderBy()` with no
  * partition spec moves the whole input to ONE task (Spark warns
  * "No Partition Defined") — tolerable for a 100-row top-k, hostile for a
  * 10⁶-row vocabulary, and the warning noise masks real regressions in gate
  * logs. This is the standard two-phase rank instead:
  *
  *  1. range-repartition on the sort order — partition i's rows all sort
  *     before partition i+1's (ascending physical partition ids), ties never
  *     split across a boundary (the range partitioner routes by binary
  *     search on boundary keys, so equal keys share a partition); the
  *     partition count is pinned explicitly so a cache-eviction recompute
  *     reproduces the identical pid space (AQE never re-coalesces a
  *     user-counted repartition);
  *  2. a PARTITIONED window numbers rows within each partition id (this is
  *     the second — and last — data exchange: the window's
  *     ClusteredDistribution(pid) requirement re-hashes the range output,
  *     which Catalyst cannot know is already pid-clustered);
  *  3. the ranked frame is scanned ONCE for per-partition counts (≤ the
  *     pinned partition count — bounded by configuration, never by data),
  *     whose exclusive prefix offsets fold on the DRIVER and broadcast
  *     back as a tiny lookup; `rank = offset + local`.
  *
  * Cost: the two-exchange chain runs twice (once for the counts pass,
  * once when the returned frame is consumed) over the slim input, plus
  * one config-bounded driver fold. The counts pass rides a SHORT-LIVED
  * persist released immediately after the collect — an op-internal cache
  * the caller could never unpersist would strand one entry per call for
  * the session's lifetime (review-caught; the recompute is bit-identical
  * because the partition count is pinned and the order total). The first
  * cut computed offsets via a DataFrame self-join, which referenced the
  * ranked subtree three times with NO exchange reuse — six shuffles of
  * the input (also review-caught; OpsSpec asserts the single-reference
  * shape).
  */
object Ranks {

  /** Adds `rankName`: the 1-based global row number of each row under
    * `order` (a TOTAL order for deterministic results, same contract as
    * `row_number` itself). Long-typed.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rankName: String): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one sort column")
    val Seq(pid, lr, off) = Seq("__rk_pid", "__rk_lr", "__rk_off")
    Seq(pid, lr, off, rankName).foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    val spark = df.sparkSession
    val nParts = spark.sessionState.conf.numShufflePartitions
    val local = df.repartitionByRange(nParts, order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn(lr,
        row_number().over(Window.partitionBy(pid).orderBy(order: _*)))
      .persist()
    // counts pass; the cache is released right after (opportunistically
    // served to a prompt consumer, never stranded) — a later recompute is
    // bit-identical: pinned partition count, deterministic range
    // boundaries, total order
    val counts =
      try local.groupBy(pid).agg(count(lit(1)).as("__rk_c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      finally local.unpersist(false)
    var acc = 0L
    val offs = counts.map { case (p, c) => val o = (p, acc); acc += c; o }.toSeq
    import spark.implicits._
    val offsets = offs.toDF(pid, off)
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(rankName, (col(off) + col(lr)).cast("long"))
      .drop(pid, lr, off)
  }
}
