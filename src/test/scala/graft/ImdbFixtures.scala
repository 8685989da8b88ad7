package graft

import org.apache.spark.sql.SparkSession
import graft.imdb.{ImdbDemo, ImdbReader}

/** Test alias for the main-scope demo tables (graft.imdb.ImdbDemo). */
object ImdbFixtures {
  def tables(spark: SparkSession): ImdbReader.ImdbTables = ImdbDemo.tables(spark)
}
