package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over the CDC/event firehose: tumbling-
  * window rate metrics and gap-based sessionization — the Structured
  * Streaming state toolkit (watermarks, windowed aggregation,
  * `flatMapGroupsWithState`) applied to the ops-monitoring queries a
  * production ingest deployment runs beside the merge pipeline.
  *
  * Every streaming operator here has a BATCH twin with the identical output
  * shape: the batch twins are DuckDB-oracled (q_windowed_rates,
  * q_sessionize), and StreamMetricsSpec asserts the streaming outputs equal
  * the batch twins on the same data once the watermark closes the windows —
  * a three-way oracle chain (DuckDB ↔ Spark batch ↔ streaming state).
  *
  * Reference anchor: the reference pipeline reports per-crawl rollups after
  * batch loads (modules/constants.py reporting queries); this is the
  * streaming-native evolution of that monitoring surface.
  */
object StreamMetrics {

  /** One event on the wire (the `events` table shape, typed). */
  final case class TimedEvent(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  /** Closed tumbling window: start second, type, count, exact cents. */
  final case class RateOut(
      win_start: Long,
      event_type: String,
      n_events: Long,
      cents: Long)

  /** Closed session: a maximal run of one user's events with no gap above
    * the threshold. Bounds in epoch MICROseconds (oracle hygiene: no
    * timestamp columns in outputs). */
  final case class SessionOut(
      user_id: Long,
      session_start_us: Long,
      session_end_us: Long,
      n_events: Long,
      cents: Long)

  val WindowSec = 600L          // 10-minute tumbling windows
  val DefaultGapUs = 30L * 60 * 1000000 // 30-minute session gap

  // ------------------------------------------------------------- batch twins

  /** Tumbling-window per-type rates over a batch `events` frame — the
    * DuckDB-oracled twin of [[windowedRatesStream]]. One hash aggregation;
    * `window()` is an ordinary Catalyst projection in batch, so this scales
    * exactly like any groupBy (no shuffle beyond the one aggregation). */
  def windowedRatesBatch(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), s"$WindowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("cents"))

  /** Gap-based sessionization over a batch frame (gaps-and-islands): a new
    * session starts where the per-user gap exceeds `gapUs`. Window-function
    * shape — one shuffle on user_id, then linear per-partition work; at
    * 100 TB the partition key is the user, so skew salting applies as in
    * the merge path if one user dominates. */
  def sessionizeBatch(events: DataFrame, gapUs: Long = DefaultGapUs): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    events
      // parquet µs timestamps load as TIMESTAMP_NTZ; session tz is pinned
      // UTC, so the cast to ltz TIMESTAMP (what unix_micros wants) is exact
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("us"),
        floor(col("value") * 100).cast("long").as("c"))
      .withColumn("new_sess",
        when(col("us") - lag(col("us"), 1).over(byUser) > gapUs, 1L)
          .when(lag(col("us"), 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("us")).as("session_start_us"),
        max(col("us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        sum(col("c")).as("cents"))
      .drop("sess_no")
  }

  // ------------------------------------------------------------- streaming

  /** Streaming tumbling-window rates: event-time aggregation with a
    * watermark — Append mode emits each window exactly once, after the
    * watermark passes its end. Output shape == [[windowedRatesBatch]]. */
  def windowedRatesStream(
      events: Dataset[TimedEvent],
      watermarkDelay: String = "30 minutes"
  ): DataFrame =
    events.toDF()
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), s"$WindowSec seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("cents"))

  /** The open-session state carried between micro-batches. */
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, cents: Long)

  /** Streaming sessionization via `flatMapGroupsWithState`: per-user custom
    * state with an EVENT-TIME timeout — a session closes either when a
    * later event arrives beyond the gap, or when the watermark passes
    * lastEvent + gap (the timeout path, so quiet users' sessions still
    * close without further input). Late rows below the watermark are
    * dropped by the engine before the function runs. Output shape ==
    * [[sessionizeBatch]].
    *
    * In-batch events are sorted by time before folding (iterator order is
    * not time order); an out-of-order event LATER batches deliver inside
    * the allowed lateness extends the open session but never rewinds its
    * start — the standard streaming-sessionization approximation. */
  def sessionizeStream(
      events: Dataset[TimedEvent],
      gapUs: Long = DefaultGapUs,
      watermarkDelay: String = "30 minutes"
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          def out(s: SessionState) =
            SessionOut(user, s.startUs, s.lastUs, s.n, s.cents)
          if (state.hasTimedOut) {
            val closed = out(state.get)
            state.remove()
            Iterator.single(closed)
          } else {
            // sort at the SAME microsecond precision the fold uses — a
            // millisecond-precision sort key lets same-ms events fold out
            // of time order and diverge from the batch twin
            def usOf(e: TimedEvent): Long =
              e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
            val sorted = it.toIndexedSeq.sortBy(e => (usOf(e), e.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val us = usOf(e)
              val c = math.floor(e.value * 100).toLong
              open match {
                case Some(s) if us - s.lastUs > gapUs =>
                  closed += out(s)
                  open = Some(SessionState(us, us, 1L, c))
                case Some(s) =>
                  open = Some(SessionState(s.startUs, math.max(s.lastUs, us),
                    s.n + 1, s.cents + c))
                case None =>
                  open = Some(SessionState(us, us, 1L, c))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapUs / 1000)
            }
            closed.result().iterator
          }
      }
  }
}
