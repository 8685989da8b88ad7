package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("JSON lines round-trip preserves values under an explicit schema") {
    val dir = tmpDir("graft_json_") + "/out"
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -0.25)).toDF("id", "name", "score")
    Sources.writeJsonLines(df, dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val back = Sources.readJsonLines(spark, dir, schema)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq === Seq((1L, "alpha", 1.5), (2L, "beta", -0.25)))
  }

  test("malformed JSON rows degrade to NULLs (PERMISSIVE), not job failure") {
    val dir = tmpDir("graft_json_bad_")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.json"),
      "{\"id\": 1, \"name\": \"ok\"}\n{not json at all\n".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val rows = Sources.readJsonLines(spark, dir, schema).collect()
    assert(rows.length === 2)
    assert(rows.count(_.isNullAt(0)) === 1) // corrupt row → NULL fields
  }

  test("ORC round-trip preserves values and types") {
    val dir = tmpDir("graft_orc_") + "/out"
    val df = Tables.part(spark, Sf0001).limit(100)
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.schema === df.schema)
    assert(back.count() === 100)
    val a = df.agg(round(sum($"p_retailprice"), 2)).first().getDouble(0)
    val b = back.agg(round(sum($"p_retailprice"), 2)).first().getDouble(0)
    assert(a === b)
  }

  test("binaryFile source ingests opaque blobs with path metadata (multimodal intake)") {
    // the ingestion path for image/audio/video corpora: files → rows of
    // (path, modificationTime, length, content) with a pathGlobFilter,
    // no decode on the scan — decoding happens downstream (multimodal.*)
    val dir = tmpDir("graft_bin_")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.jpg"),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.jpg"),
      Array[Byte](0xFF.toByte, 0xD8.toByte))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/skip.txt"),
      "not an image".getBytes)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.jpg").load(dir)
    val rows = bin.select($"path", $"length", $"content").collect()
    assert(rows.length === 2, "glob filter must exclude the .txt")
    val byName = rows.map(r => r.getString(0).split('/').last ->
      ((r.getLong(1), r.getAs[Array[Byte]](2)))).toMap
    assert(byName("a.jpg")._1 === 4L)
    assert(byName("a.jpg")._2.take(2).toSeq === Seq(0xFF.toByte, 0xD8.toByte))
    assert(byName("b.jpg")._1 === 2L)
  }

  test("CSV reader honors quoting, escaped delimiters, and explicit schema") {
    val dir = tmpDir("graft_csv_")
    val p = java.nio.file.Paths.get(s"$dir/in.csv")
    java.nio.file.Files.write(p,
      "id,name,note\n1,\"Smith, Jo\",\"says \"\"hi\"\"\"\n2,plain,\n".getBytes)
    val df = spark.read
      .option("header", "true")
      // RFC-4180 doubles quotes inside quoted fields; Spark's DEFAULT
      // escape is backslash, so standard CSVs need escape = quote
      .option("escape", "\"")
      .schema("id INT, name STRING, note STRING")
      .csv(s"$dir/in.csv")
    val rows = df.collect().map(r => (r.getInt(0), r.getString(1), Option(r.getString(2))))
    assert(rows.toSet === Set(
      (1, "Smith, Jo", Some("says \"hi\"")),
      (2, "plain", None)))
  }

  test("parquet schema evolution: mergeSchema unions columns, old files read NULLs") {
    // The long-lived-dataset reality at 100 TB: writers add columns over
    // time, readers must see the union without rewriting old files.
    val dir = tmpDir("graft_evolve_") + "/out"
    Seq((1L, "a")).toDF("k", "s").write.parquet(s"$dir/batch=1")
    Seq((2L, "b", 2.5)).toDF("k", "s", "score").write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("batch", "k", "s", "score"))
    val rows = merged.select($"k", $"score").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(rows === Set((1L, None), (2L, Some(2.5))))
  }

  test("partitioned parquet write prunes non-matching partitions at scan time") {
    val dir = tmpDir("graft_part_") + "/out"
    val orders = Tables.orders(spark, Sf0001)
      .withColumn("order_year", year($"o_orderdate"))
    Sources.writePartitionedParquet(orders, dir, Seq("order_year"))
    val back = Sources.readPartitionedParquet(spark, dir)
      .filter($"order_year" === 1995)
    // the year predicate must become a PartitionFilter (directory-level
    // pruning), not a row-level data filter over all partitions
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("order_year"),
      s"expected partition pruning in plan:\n$plan")
    val expected = orders.filter($"order_year" === 1995).count()
    assert(back.count() === expected && expected > 0)
  }
}
