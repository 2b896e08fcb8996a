package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

object SimilarityOps {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
