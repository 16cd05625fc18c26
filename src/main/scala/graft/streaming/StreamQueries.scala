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

  /** Sliding-window twin of `evt_sliding`: real incremental execution over
    * the file source, same window expression, same oracle.
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val streamed = EventStreams.slidingCounts(EventStreams.fileSource(spark, dir))
    EventStreams.runToMemory(spark, streamed, s"stream_sliding_${System.nanoTime()}")
      .orderBy($"w_start")
  }

  /** Gap-fill twin of `evt_gapfill`. The event-volume-proportional work —
    * reducing the stream to per-window counts — runs as a REAL streaming
    * aggregation; the zero-fill spine join is a read-time post-pass over
    * the bounded sink (a spine needs corpus min/max, which a stream only
    * has once bounded — dashboards gap-fill the sink table the same way).
    * Bounds derive from the sink's window starts: flooring to 10 minutes
    * never crosses an hour boundary, so date_trunc('hour', min w_start) =
    * date_trunc('hour', min ts), and the hour-aligned spine's last slot ≤
    * max w_start reproduces the batch spine exactly.
    */
  def streamGapfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = EventStreams.runToMemory(spark,
      EventStreams.windowOnlyCounts(EventStreams.fileSource(spark, dir)),
      s"stream_gapfill_${System.nanoTime()}")
    val spine = counts
      .agg(min(date_trunc("hour", $"w_start")).as("lo"), max($"w_start").as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 10 minutes)")).as("w_start"))
    broadcast(spine).join(counts, Seq("w_start"), "left_outer")
      .select($"w_start", coalesce($"n", lit(0L)).as("n"))
      .orderBy($"w_start")
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
    "stream_sliding" -> (streamSliding _),
    "stream_gapfill" -> (streamGapfill _),
    "stream_sessionize_fmgws" -> (sessionizeFmgws _),
    "stream_funnel_fmgws" -> (funnelFmgws _))

  override def oracle: Map[String, String] = Map(
    // LITERALLY the batch twins' oracles — one definition per semantics,
    // checked against both execution modes
    "stream_sliding" -> graft.operators.Events.oracle("evt_sliding"),
    "stream_gapfill" -> graft.operators.Events.oracle("evt_gapfill"),
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
