package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for tests and ad-hoc runs.
  *
  * Scale posture (100 TB design point): AQE on so shuffle partition counts,
  * skew splits and join strategies re-plan at runtime; on a real cluster
  * `shuffle.partitions` would be sized to ~2-3× total cores with AQE
  * coalescing down — locally we pin it to the core count so tiny SF runs
  * don't pay 200-partition scheduling overhead.
  */
object Session {
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
