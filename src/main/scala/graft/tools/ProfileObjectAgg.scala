package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.core.Session
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ObjectHashAggregate fallback-boundary measurement (round 8): the
  * round-7 SortAggregate sweep ADJUDICATED the engine's remaining
  * object-buffer aggregations (bounded-heap top-k, percentile sketches)
  * as scale-safe — "their sort-based fallback beyond the in-memory key
  * threshold is the memory-safety contract" — but with an argument, not
  * a number. This prices the argument: the same aggregation shapes as
  * `agg_topk_per_key` / `agg_percentiles_sketch`, run at 250k–1M GROUPS
  * (the gate queries group by 3-key enums; the fallback only engages
  * past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` =
  * 128 distinct keys per partition), reporting wall time, throughput,
  * and actual spill bytes from task metrics. A flat rows/s across group
  * counts + zero-or-bounded spill = no cliff; a super-linear time or
  * unbounded spill = the threshold needs engine attention.
  *
  * A primitive-buffer HashAggregate (sum/count over the same data) runs
  * as a control at each size: it prices the shuffle + scan that both
  * paths share, so the object-path premium is visible in isolation.
  *
  * Usage: `runMain graft.tools.ProfileObjectAgg [groups...]`
  * (default 250000 500000 1000000; rows = 8 × groups).
  */
object ProfileObjectAgg {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(250000, 500000, 1000000)
    val rowsPerGroup = 8

    val spark = Session.local(32, "profile-object-agg")
    spark.conf.set("graft.sums.exact", "false")
    import spark.implicits._

    // spill accounting straight from task metrics — the only honest
    // source: timing alone can't distinguish "slower because sorting"
    // from "slower because spilling to /tmp"
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    def timedWithSpill(f: => Unit): (Double, Long, Long) = {
      f // warm: codegen + shuffle-file setup out of the measurement
      memSpill.set(0); diskSpill.set(0)
      val t0 = System.nanoTime(); f
      ((System.nanoTime() - t0) / 1e9, memSpill.get, diskSpill.get)
    }

    for (g <- sizes) {
      val rows = g.toLong * rowsPerGroup
      // deterministic synthetic: group key cycles so every group gets
      // exactly rowsPerGroup members; the value is a cheap integer mix —
      // id*2654435761 mod 1e6 — spread enough to exercise heap/sketch
      // ordering without a row-level RNG
      val df: DataFrame = spark.range(rows)
        .select(($"id" % g).as("k"), $"id".as("rid"),
          (($"id" * 2654435761L) % 1000000L).cast("double").as("v"))

      val topk = org.apache.spark.sql.functions.udaf(new graft.functions.TopKAgg(3))
      val (tTop, msTop, dsTop) = timedWithSpill {
        df.groupBy($"k").agg(topk($"v", $"rid").as("top"))
          .write.format("noop").mode("overwrite").save()
      }
      val (tPct, msPct, dsPct) = timedWithSpill {
        // deployment accuracy (10000), not the gate's exactness-forcing 1e6
        df.groupBy($"k").agg(
            expr("percentile_approx(v, 0.5, 10000)").as("p50"),
            expr("percentile_approx(v, 0.95, 10000)").as("p95"))
          .write.format("noop").mode("overwrite").save()
      }
      val (tCtl, msCtl, dsCtl) = timedWithSpill {
        df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
          .write.format("noop").mode("overwrite").save()
      }
      def mb(x: Long): String = f"${x / 1048576.0}%.0fMB"
      println(f"OBJAGG groups=$g%8d rows=$rows%9d " +
        f"topk=$tTop%6.2fs(${rows / tTop / 1e6}%5.1fM rows/s, spill mem=${mb(msTop)} disk=${mb(dsTop)}) " +
        f"pctl=$tPct%6.2fs(spill mem=${mb(msPct)} disk=${mb(dsPct)}) " +
        f"control=$tCtl%6.2fs(spill mem=${mb(msCtl)} disk=${mb(dsCtl)})")
    }
    spark.stop()
  }
}
