package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.streaming.StreamMetrics._

/** The stateful streaming surface against its DuckDB-oracled batch twins:
  * watermarked windowed aggregation and flatMapGroupsWithState
  * sessionization must emit, once the watermark closes them, exactly the
  * rows the batch operators compute on the same data. */
class StreamMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def tsOf(minutes: Double): java.sql.Timestamp =
    new java.sql.Timestamp((minutes * 60000).toLong) // epoch-relative, UTC

  // user 1: two sessions (gap 40 min > 30); user 2: one session
  private val baseEvents = Seq(
    TimedEvent(0L, tsOf(1), 1L, "purchase", 10.50),
    TimedEvent(1L, tsOf(5), 1L, "view", 1.25),
    TimedEvent(2L, tsOf(45), 1L, "purchase", 3.75), // 40-min gap → new session
    TimedEvent(3L, tsOf(47), 1L, "view", 2.00),
    TimedEvent(4L, tsOf(2), 2L, "signup", 0.99),
    TimedEvent(5L, tsOf(12), 2L, "purchase", 20.00)
  )
  // far-future sentinel: advances the watermark past everything above
  private val sentinel = TimedEvent(99L, tsOf(100000), 999L, "view", 0.0)

  private def collectStream[T](makeQuery: MemoryStream[TimedEvent] => org.apache.spark.sql.DataFrame,
      batches: Seq[Seq[TimedEvent]], name: String): Seq[org.apache.spark.sql.Row] = {
    val input = MemoryStream[TimedEvent](spark, numPartitions = 1)
    val q = makeQuery(input).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).collect().toSeq
    } finally { q.stop(); () }
  }

  test("windowed rates: append-mode stream equals the batch twin once watermark closes windows") {
    val rows = collectStream(
      in => windowedRatesStream(in.toDS(), watermarkDelay = "30 minutes"),
      Seq(baseEvents, Seq(sentinel)), "rates_out")
    val streamed = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val batch = windowedRatesBatch(baseEvents.toDF())
      .as[(Long, String, Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream $streamed != batch $batch")
    // sanity against hand-computed windows: minutes 1,5 → window 0;
    // 12 → window 600s; 45,47 → window 2400s
    assert(batch.contains((0L, "purchase", 1L, 1050L)))
    assert(batch.contains((2400L, "view", 1L, 200L)))
  }

  test("sessionize: flatMapGroupsWithState emits exactly the batch gaps-and-islands sessions") {
    val rows = collectStream(
      in => sessionizeStream(in.toDS(), watermarkDelay = "30 minutes").toDF(),
      // split mid-session across micro-batches: state must carry over
      Seq(baseEvents.take(2), baseEvents.drop(2), Seq(sentinel)), "sess_out")
    val streamed = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val batch = sessionizeBatch(baseEvents.toDF())
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    // hand-check one session: user 1's first = [1 min, 5 min], 2 events,
    // 1050 + 125 cents
    assert(batch.contains((1L, 60000000L, 300000000L, 2L, 1175L)))
    assert(batch.size == 3, "two sessions for user 1 + one for user 2")
  }

  test("a session split across the gap closes via event-time TIMEOUT, not only via a later event") {
    // user 3 sends one burst then goes quiet; only the sentinel's watermark
    // advance fires the timeout that closes the session
    val burst = Seq(
      TimedEvent(10L, tsOf(1), 3L, "view", 1.00),
      TimedEvent(11L, tsOf(3), 3L, "view", 1.00))
    val rows = collectStream(
      in => sessionizeStream(in.toDS(), watermarkDelay = "5 minutes").toDF(),
      Seq(burst, Seq(sentinel)), "timeout_out")
    val streamed = rows.map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(streamed.contains((3L, 2L)), s"timed-out session missing: $streamed")
  }

  test("late data below the watermark is dropped, on-time late data still lands") {
    val early = Seq(TimedEvent(20L, tsOf(1), 4L, "view", 1.00))
    val advance = Seq(TimedEvent(21L, tsOf(5000), 5L, "view", 1.00))
    // minute 2 is now far below the watermark (5000 - 30): must be dropped
    val tooLate = Seq(TimedEvent(22L, tsOf(2), 4L, "purchase", 99.99))
    val rows = collectStream(
      in => windowedRatesStream(in.toDS(), watermarkDelay = "30 minutes"),
      Seq(early, advance, tooLate, Seq(sentinel)), "late_out")
    val streamed = rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed.contains((0L, "view", 1L)), "on-time window must close")
    assert(!streamed.exists(_._2 == "purchase"),
      s"late event below watermark must be dropped: $streamed")
  }
}
