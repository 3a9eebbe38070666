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
  /** Ordered-funnel progression per user: how deep into the stage list
    * `stages` (e.g. signup → view → purchase) each user's event stream
    * gets, requiring STRICTLY increasing timestamps between consecutive
    * stages (a same-instant later stage does not advance — the strict
    * rule replays identically in SQL, where a `>=` would double-count
    * same-timestamp batches). Earliest-completion semantics: stage i's
    * completion time is the MINIMUM event time of type stages(i) that is
    * later than stage i−1's completion — the canonical product-analytics
    * funnel fold.
    *
    * Output (only users who complete ≥ 1 stage): `(user_id,
    * stages_completed, first_us, last_us)` — all BIGINT (epoch
    * microseconds under the session-UTC convention of [[sessionize]]).
    *
    * Scale shape: k − 1 equi-joins on user_id over SLIM per-stage
    * aggregates ((user_id, t) pairs — one row per user per stage, never
    * event-grain), each fed by the stage-filtered slim (user_id,
    * event_type, t) projection, which is materialized ONCE through an
    * eager localCheckpoint; k is a small constant (the funnel
    * definition), so this is a fixed pipeline of bounded shuffles that
    * all hash on the same key. No windows, nothing event-grain ever
    * crosses a join. The checkpoint matters because the per-depth output
    * unions every frontier and frontier i's plan nests frontier i−1's —
    * without it the SOURCE was scanned k(k+1)/2 times (6 parquet scans at
    * k = 3, the r5 plan audit's one documented soft spot); now the one
    * source scan happens inside the checkpoint job and the k(k+1)/2 plan
    * references read the checkpointed blocks. The blocks (funnel-relevant
    * events only, three slim columns) stay live for the session — the
    * price of returning a lazily-consumable frame.
    */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages.size <= 16,
      s"stages must be 1..16 ordered stage names: $stages")
    require(stages.distinct.size == stages.size,
      s"stages must be distinct (a repeated stage is ambiguous): $stages")
    // null user_id rows are EXCLUDED up front: a null user can't satisfy
    // the chain's equi-joins past stage 1, and Spark's groupBy would
    // still keep a null depth-1 group where SQL's joins drop it — the
    // explicit filter makes the op and its SQL spec agree instead of
    // diverging silently on dirty input
    // one source scan: only funnel-relevant event types survive (the
    // frontier filters below are subsets of this isin), three slim
    // columns, materialized eagerly so the k(k+1)/2 downstream plan
    // references never re-touch the source
    val base = events.filter(col("user_id").isNotNull)
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"),
        col("event_type"), unix_micros(col("ts").cast("timestamp")).as("t"))
      .localCheckpoint(true)
    // frontier i = users who completed stages 0..i, with every completion
    // time t0..ti carried along; users drop out of the chain at their
    // first missed (or not-later) stage
    val first = base.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("t").as("t0"))
    val frontiers = stages.indices.tail.scanLeft(first) {
      case (prev, i) =>
        base.filter(col("event_type") === stages(i))
          .join(prev, Seq("user_id"))
          .filter(col("t") > col(s"t${i - 1}"))
          .groupBy((col("user_id") +: (0 until i).map(j => col(s"t$j"))): _*)
          .agg(min("t").as(s"t$i"))
    }
    // stages_completed for a user = the deepest frontier containing them;
    // assemble by unioning (user, depth, first, last) and keeping max depth
    val perDepth = frontiers.zipWithIndex.map { case (f, i) =>
      f.select(col("user_id"), lit((i + 1).toLong).as("stages_completed"),
        col("t0").as("first_us"), col(s"t$i").as("last_us"))
    }
    perDepth.reduce(_ unionAll _)
      .groupBy("user_id")
      .agg(max(struct(col("stages_completed"), col("first_us"), col("last_us"))).as("w"))
      .select(col("user_id"), col("w.stages_completed").as("stages_completed"),
        col("w.first_us").as("first_us"), col("w.last_us").as("last_us"))
  }

  /** Hour-over-hour retention: for each UTC hour bucket with activity,
    * the number of distinct active users and how many of them are active
    * again in the NEXT hour — the cohort-retention primitive. Output
    * `(hour_us, n_users, n_retained)`, all BIGINT (hour_us = bucket start
    * in epoch microseconds). Scale shape: ONE distinct (user, hour)
    * shuffle — the slim frame materializes through an eager
    * localCheckpoint and its three plan references (shifted self-join
    * side, semi-join side, per-hour rollup) read the blocks; the r5
    * version re-scanned the event source and re-ran the distinct shuffle
    * per reference (plan-audited: 3 source scans), because the three
    * references hash on three different keys and no exchange reuse can
    * fire. Never event-grain past the distinct.
    */
  def retention(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    // integral `div` (never a double divide — a quotient one ulp under a
    // bucket boundary would truncate into the wrong hour)
    val active = events
      .select(col("user_id"),
        expr(s"(unix_micros(cast(ts AS timestamp)) div ${hourUs}L) * ${hourUs}L")
          .as("hour_us"))
      .distinct()
      .localCheckpoint(true)
    val next = active.select(col("user_id"),
      (col("hour_us") - hourUs).as("hour_us"))
    active.join(next, Seq("user_id", "hour_us"), "left_semi")
      .groupBy("hour_us").agg(count(lit(1)).as("n_retained"))
      .join(active.groupBy("hour_us").agg(count(lit(1)).as("n_users")),
        Seq("hour_us"), "right")
      .select(col("hour_us"), col("n_users"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"))
  }

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
