package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected catalog queries (dev
  * tool). Usage: runMain graft.tools.Explain <sfDir> [name ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q05_join_broadcast", "q13_trends",
        "q07_topk", "dd02_jaccard_pairs", "sim01_brute_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.queries.Catalog.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
