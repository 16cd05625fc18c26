package graft.functions

import graft.QueryPack
import org.apache.spark.sql.{DataFrame, SparkSession}

object SimilarityOps extends QueryPack {
  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  override def oracle: Map[String, String] = Map()
}
