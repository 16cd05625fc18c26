package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the driver-generated test tables (TESTDATA.md / FIXTURES.md).
  *
  * The reference engine has no catalog at all — datasets are directories of
  * files and schemas live in job code (SURVEY.md §1, JobConf.setOutputKeyClass).
  * Here the "catalog" is simply parquet-on-path with embedded schemas; every
  * loader is a plain `spark.read.parquet` so Catalyst sees a declarative scan
  * it can prune/push down into (FileSourceScanExec handles split planning —
  * the FileInputFormat.getSplits role, SURVEY §2.1).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Sessions set `spark.sql.legacy.parquet.nanosAsLong=true`
    * (see Verify/Bench/Session builders); here the long is converted to a
    * proper TimestampType via integer division (ns epoch > 2^53, so a
    * double-typed division would silently lose precision — `div` keeps it
    * integral). Sub-microsecond parts are zero in the driver's data.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // defensive: make the read work on ANY session, not just graft-built
    // ones (the conf is runtime-settable and required for NANOS parquet)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` text matches the
    * DuckDB oracle text closely.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
