package graft

import graft.core.Session
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (sf0.001 data). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = Session.local(cores = 8, appName = "graft-test")
  val sfDir = "/root/testdata/sf0.001"

  /** Physical plan text after execution (AQE-final). */
  def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles
    df.queryExecution.executedPlan.toString
  }
}
