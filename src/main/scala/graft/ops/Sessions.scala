package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — split each user's event stream where the gap
  * between consecutive events exceeds `gapUs`, the canonical funnel /
  * engagement primitive (and the batch twin of a streaming session
  * window).
  *
  * Determinism: the per-user order is the (ts, event_id) TOTAL order —
  * equal timestamps tie-break on event_id, so the lag → flag → running-sum
  * chain replays identically in SQL. Session ids are 0-based per user in
  * that order and append-stable: events appended later in time can only
  * open or extend LATER sessions, never renumber earlier ones.
  *
  * Scale shape: the whole operator rides ONE hash exchange on user_id and
  * ONE sort on (ts, event_id) — the gap lag, the new-session flag's
  * running sum, and the final per-session rollup all reuse them (hash
  * partitioning by user_id satisfies the (user_id, session_idx) clustered
  * requirement, so the groupBy adds no exchange; spec-asserted). Window
  * partitions are per-user event counts, never the corpus, and nothing is
  * globally sorted.
  */
object Sessions {

  /** Per-session rollup: `(user_id, session_idx, n_events, span_us,
    * min_event_id, max_event_id, event_sum)` — the count, wall-clock span
    * and id bounds/sum pin each session's exact membership to replayable
    * BIGINTs. Requires `user_id`, `ts` (timestamp) and unique `event_id`
    * columns; timestamps are folded to epoch microseconds up front so all
    * gap arithmetic is integral. Parquet TIMESTAMP_NTZ is accepted via an
    * explicit cast whose wall-clock interpretation is the session time
    * zone — run with `spark.sql.session.timeZone = UTC` (the engine's
    * standing convention; Verify and the oracle's tz-free `epoch_us` both
    * assume it).
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs >= 1, s"gapUs must be positive: $gapUs")
    val order = Window.partitionBy("user_id").orderBy("t", "event_id")
    val flagged = events
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"))
      .withColumn("prev", lag("t", 1).over(order))
      .withColumn("is_new",
        (col("prev").isNull || col("t") - col("prev") > gapUs).cast("long"))
    flagged
      .withColumn("session_idx", sum("is_new").over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max("t") - min("t")).as("span_us"),
        min("event_id").as("min_event_id"),
        max("event_id").as("max_event_id"),
        sum("event_id").as("event_sum"))
  }
}
