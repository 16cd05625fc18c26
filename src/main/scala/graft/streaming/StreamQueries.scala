package graft.streaming

import graft.QueryPack
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checkable entry points for the streaming pack.
  *
  *  - `stream_tumbling` runs a REAL Structured Streaming query (file
  *    source → watermark → windowed agg → memory sink, AvailableNow) and
  *    must produce exactly the batch answer — the batch/stream equivalence
  *    the whole pack is built on.
  *  - `stream_sessionize_fmgws` runs the custom flatMapGroupsWithState
  *    sessionizer in batch mode; the oracle is the same gaps-and-islands
  *    SQL that checks `evt_sessions`, so the state machine is held to the
  *    declarative operator's semantics.
  */
object StreamQueries extends QueryPack {

  def streamTumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val streamed = EventStreams.tumblingCounts(EventStreams.fileSource(spark, dir))
    EventStreams.runToMemory(spark, streamed, s"stream_tumbling_${System.nanoTime()}")
      .orderBy($"w_start", $"event_type")
  }

  def sessionizeFmgws(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"value").as[EventStreams.Ev]
    EventStreams.sessionize(evs)
      .toDF()
      .orderBy($"user_id", $"session_start")
  }

  /** The funnel state machine in batch mode; same oracle as `evt_funnel`,
    * so flatMapGroupsWithState is held to the relational query's semantics.
    */
  def funnelFmgws(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val evs = Tables.events(spark, dir)
      .select($"user_id", $"ts", $"event_type").as[EventStreams.FEv]
    EventStreams.funnelStateful(evs)
      .toDF()
      .orderBy($"user_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_tumbling" -> (streamTumbling _),
    "stream_sessionize_fmgws" -> (sessionizeFmgws _),
    "stream_funnel_fmgws" -> (funnelFmgws _))

  override def oracle: Map[String, String] = Map(
    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '10 minutes', ts) AS w_start,
        |  time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS w_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2, 3 ORDER BY w_start, event_type""".stripMargin,
    // LITERALLY the relational funnel's oracle — one definition, two gated
    // faces (state machine here, chained aggregations in Events)
    "stream_funnel_fmgws" -> graft.operators.Events.oracle("evt_funnel"),
    "stream_sessionize_fmgws" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '30 minutes'
        |         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL '30 minutes' AS session_end,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)
}
