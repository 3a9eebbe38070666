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
  *     search on boundary keys, so equal keys share a partition);
  *  2. a PARTITIONED window numbers rows within each partition id;
  *  3. per-partition counts (one row per partition — bounded by the cluster
  *     partition count, a config, never by data) roll into exclusive
  *     cumulative offsets via a broadcast non-equi self-join (sum of counts
  *     of strictly-lower partition ids; no window anywhere — a
  *     constant-key partitioned window gets its foldable key optimized
  *     away and degenerates right back into the global window), broadcast
  *     back, and `rank = offset + local`.
  *
  * All offset-side work is over ≤ shuffle-partition-count rows — bounded by
  * configuration, never by data. The branches read the same range exchange
  * (ReusedExchange), so the heavy subtree below it computes once.
  */
object Ranks {

  /** Adds `rankName`: the 1-based global row number of each row under
    * `order` (a TOTAL order for deterministic results, same contract as
    * `row_number` itself). Long-typed.
    */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rankName: String): DataFrame = {
    require(order.nonEmpty, "globalRowNumber needs at least one sort column")
    val Seq(pid, lr, cnt, off) =
      Seq("__rk_pid", "__rk_lr", "__rk_c", "__rk_off")
    Seq(pid, lr, cnt, off, rankName).foreach(c =>
      require(!df.columns.contains(c), s"input already has a $c column"))
    val local = df.repartitionByRange(order: _*)
      .withColumn(pid, spark_partition_id())
      .withColumn(lr,
        row_number().over(Window.partitionBy(pid).orderBy(order: _*)))
    // exclusive prefix-sum of per-partition counts, as a broadcast
    // non-equi self-join over the config-bounded counts table
    val counts = local.groupBy(pid).agg(count(lit(1)).as(cnt))
    val lower = counts.select(col(pid).as(pid + "2"), col(cnt).as(cnt + "2"))
    val offsets = counts
      .join(broadcast(lower), col(pid + "2") < col(pid), "left")
      .groupBy(pid).agg(coalesce(sum(cnt + "2"), lit(0L)).as(off))
    local.join(broadcast(offsets), Seq(pid))
      .withColumn(rankName, (col(off) + col(lr)).cast("long"))
      .drop(pid, lr, off)
  }
}
