package graft

import graft.core.Tables
import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Checkpoint RECOVERY, not just exactly-once re-runs: each stateful twin
  * processes half the events, terminates, gets the other half, restarts
  * from the SAME checkpoint directory (aggregation / session / funnel state
  * restored from the state store), and must end up equal to the batch twin
  * over the full corpus. A third restart feeds one far-future sentinel
  * event so the watermark passes every real window/session and Append mode
  * flushes them to the file sink (a stream never finalizes its last window
  * without later event time).
  *
  * This is the recovery half of the streaming contract the
  * AvailableNow-to-completion gate rows don't exercise — in production the
  * restart boundary falls MID-stream, with sessions open and windows
  * unfinalized across it, which is exactly where the halves split here.
  */
/** Narrow (v1) and widened (v2) state records for the schema-evolution
  * restart test — the shape of the FunnelState 3→5-field growth
  * (EventStreams.scala "STATE-SCHEMA NOTE"), reduced to its essence.
  * Top-level so the Product encoders carry no outer pointer.
  */
case class RestartStateV1(n: Long)
case class RestartStateV2(n: Long, last: Option[Long])

class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  /** Write `df` as one parquet file named `name` directly under `srcDir`
    * (the file source sees each appearance as a new input file).
    */
  private def addFile(df: DataFrame, srcDir: String, name: String): Unit = {
    val stage = Files.createTempDirectory("graft_restart_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val listing = Files.list(stage)
    val part = try {
      listing.filter(p => p.toString.endsWith(".parquet")).findFirst().get
    } finally listing.close()
    Files.createDirectories(Paths.get(srcDir))
    Files.move(part, Paths.get(srcDir, name), StandardCopyOption.REPLACE_EXISTING)
  }

  /** Feed half1 | restart with half2 | restart with a watermark-flushing
    * sentinel, each pass a fresh query on the SAME checkpoint + file sink;
    * returns the sink contents.
    */
  private def restartRun(tag: String)(shape: DataFrame => DataFrame): DataFrame = {
    val root = Files.createTempDirectory(s"graft_restart_$tag").toString
    val src = s"$root/src"; val cp = s"$root/cp"; val out = s"$root/out"
    val ev = Tables.events(spark, sfDir)
    val (minTs, maxTs) = {
      val r = ev.agg(min($"ts"), max($"ts")).head()
      (r.getTimestamp(0), r.getTimestamp(1))
    }
    val mid = new java.sql.Timestamp((minTs.getTime + maxTs.getTime) / 2)
    val half1 = ev.filter($"ts" <= lit(mid))
    val half2 = ev.filter($"ts" > lit(mid))
    assert(half1.count() > 0 && half2.count() > 0, "both halves must carry events")
    // schema-preserving sentinel: one event far past everything, so every
    // real window/session finalizes; its own window/session stays open and
    // never reaches the sink (negative user id doubles as a filter key)
    val sentinel = ev.limit(1)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("sentinel"))
      .withColumn("ts", lit(new java.sql.Timestamp(maxTs.getTime + 100L * 3600 * 1000)))
    def runPass(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = shape(stream).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    addFile(half1, src, "half1.parquet"); runPass()
    addFile(half2, src, "half2.parquet"); runPass() // state restored mid-stream
    addFile(sentinel, src, "sentinel.parquet"); runPass() // flush via watermark
    spark.read.parquet(out)
  }

  test("tumbling counts survive a mid-stream checkpoint restart == batch") {
    val sunk = restartRun("tumbling")(EventStreams.tumblingCounts)
    val got = sunk.filter($"event_type" =!= "sentinel")
      .orderBy($"w_start", $"event_type").collect().map(_.toString)
    val want = EventStreams.tumblingCounts(Tables.events(spark, sfDir))
      .orderBy($"w_start", $"event_type").collect().map(_.toString)
    assert(got.sameElements(want),
      s"restart diverged: got=${got.length} want=${want.length} rows")
  }

  test("fMGWS sessionizer survives a mid-stream checkpoint restart == batch") {
    // the mid split lands inside at least one user's session: its state is
    // written by run 1 and must be CONTINUED (not restarted) by run 2
    val sunk = restartRun("sessionize") { df =>
      EventStreams.sessionize(
        df.withWatermark("ts", "1 hour")
          .select($"user_id", $"ts", $"value").as[EventStreams.Ev]).toDF()
    }
    val got = sunk.filter($"user_id" >= 0)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start").collect().map(_.toString)
    val want = graft.streaming.StreamQueries.sessionizeFmgws(spark, sfDir)
      .select($"user_id", $"session_start", $"n_events", $"sum_value")
      .orderBy($"user_id", $"session_start").collect().map(_.toString)
    assert(got.sameElements(want),
      s"restart diverged: got=${got.length} want=${want.length} sessions")
  }

  test("fMGWS funnel survives a mid-stream checkpoint restart == batch") {
    val sunk = restartRun("funnel") { df =>
      EventStreams.funnelStateful(
        df.select($"user_id", $"ts", $"event_type").as[EventStreams.FEv]).toDF()
    }
    // monotone set-once state: each emission has a distinct steps_completed,
    // so the max-steps row is each user's final funnel (same reduction as
    // StreamingSpec's live-stream funnel test)
    val got = sunk.filter($"user_id" >= 0)
      .groupBy($"user_id")
      .agg(max_by(struct($"t_view", $"t_click", $"t_purchase", $"steps_completed"),
        $"steps_completed").as("b"))
      .select($"user_id", $"b.t_view", $"b.t_click", $"b.t_purchase", $"b.steps_completed")
      .orderBy($"user_id").collect().map(_.toString)
    val want = graft.streaming.StreamQueries.funnelFmgws(spark, sfDir)
      .orderBy($"user_id").collect().map(_.toString)
    assert(got.sameElements(want),
      s"restart diverged: got=${got.length} want=${want.length} users")
  }

  test("a WIDENED state class cannot resume an old checkpoint — the failure is loud") {
    // The operational rule the FunnelState STATE-SCHEMA NOTE documents,
    // exercised: growing a stateful query's state record (FunnelState went
    // 3 → 5 fields in round 5) is a checkpoint-breaking change. Spark's
    // state-store schema check must REFUSE the resume with a schema
    // incompatibility — not deserialize garbage, not silently reset state.
    // A deployment upgrading across such a change starts a new checkpoint
    // location (and backfills via the batch twin); this test pins that the
    // failure mode is a loud, nameable error, not corruption.
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val root = Files.createTempDirectory("graft_restart_schema").toString
    val src = s"$root/src"; val cp = s"$root/cp"; val out = s"$root/out"
    val ev = Tables.events(spark, sfDir)
    val half = ev.limit(200)

    def runPass[S <: Product : org.apache.spark.sql.Encoder](
        init: S, step: S => S, nOf: S => Long): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = stream.select($"user_id").as[Long]
        .groupByKey(identity)
        .flatMapGroupsWithState[S, (Long, Long)](
          OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
          (user: Long, events: Iterator[Long], state:
              org.apache.spark.sql.streaming.GroupState[S]) =>
            var s = state.getOption.getOrElse(init)
            events.foreach(_ => s = step(s))
            state.update(s)
            Iterator.single((user, nOf(s)))
        }.toDF("user_id", "n")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    addFile(half, src, "h1.parquet")
    runPass[RestartStateV1](RestartStateV1(0), s => RestartStateV1(s.n + 1), _.n)
    addFile(half, src, "h2.parquet")
    val ex = intercept[Exception] {
      runPass[RestartStateV2](RestartStateV2(0, None),
        s => RestartStateV2(s.n + 1, Some(1L)), _.n)
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ").toLowerCase
    assert(chain.contains("schema") && chain.contains("state"),
      s"expected a state-schema incompatibility refusal, got: $chain")
  }
}
