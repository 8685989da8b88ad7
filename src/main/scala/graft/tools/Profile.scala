package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables}
import graft.dedup.Dedup

/** Ad-hoc stage profiler for the dedup hot path (dev tool, not part of
  * the driver contract). Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }

    val docs = Tables.documents(spark, dir)
    time("warmup count")(docs.count())
    time("tokenize only") {
      docs.select(graft.text.TextStats.tokens(col("text")).as("t"))
        .agg(sum(size(col("t")))).first().get(0)
    }
    time("shingles compute") {
      Dedup.withShingles(docs, "doc_id", "text")
        .agg(sum(size(col("sh")))).first().get(0)
    }
    time("hashed shingle rows") {
      Dedup.hashedShingleRows(docs, "doc_id", "text").count()
    }
    time("inv self-join pair count") {
      val inv = Dedup.hashedShingleRows(docs, "doc_id", "text")
      inv.as("a").join(inv.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc")).count()
    }
    time("full jaccardPairs") {
      Dedup.jaccardPairs(docs, "doc_id", "text").count()
    }
    time("minhash signatures") {
      Dedup.minHashSignatures(docs, "doc_id", "text").count()
    }
    time("minhash candidates") {
      Dedup.minHashCandidatePairs(docs, "doc_id", "text").count()
    }
    spark.stop()
  }
}
