package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamMetrics

/** Event-time windowing operators (batch twins of the streaming surface in
  * [[graft.streaming.StreamMetrics]]): tumbling-window rates and
  * gaps-and-islands sessionization, DuckDB-oracled. The streaming versions
  * are asserted equal to these on the same data in StreamMetricsSpec, so
  * the oracle chain covers the stateful streaming path too. */
object WindowQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling event-time windows (10 min) per event type: count + exact
    // integer cents (floor-cents trick — double SUM is order-dependent)
    "q_windowed_rates" -> ((s, dir) =>
      StreamMetrics.windowedRatesBatch(events(s, dir))),

    // per-user session assignment by 30-minute inactivity gap
    // (gaps-and-islands): one shuffle on user_id, then window functions
    "q_sessionize" -> ((s, dir) =>
      StreamMetrics.sessionizeBatch(events(s, dir)))
  )

  val oracleSql: Map[String, String] = Map(
    "q_windowed_rates" ->
      """SELECT cast(epoch_us(ts) // 600000000 * 600 AS BIGINT) AS win_start,
        |       event_type,
        |       count(*) AS n_events,
        |       cast(sum(cast(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events
        |GROUP BY 1, 2""".stripMargin,

    "q_sessionize" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         cast(floor(value * 100) AS BIGINT) AS c,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
        |                   > 1800000000
        |                OR lag(epoch_us(ts))
        |                     OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
        |           THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |n AS (
        |  SELECT user_id, us, c,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY us
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
        |  FROM t)
        |SELECT user_id,
        |       min(us) AS session_start_us,
        |       max(us) AS session_end_us,
        |       count(*) AS n_events,
        |       cast(sum(c) AS BIGINT) AS cents
        |FROM n
        |GROUP BY user_id, sess_no""".stripMargin
  )
}
