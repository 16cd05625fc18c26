package graft.operators

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

object Joins extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracle: Map[String, String] = Map()
}
