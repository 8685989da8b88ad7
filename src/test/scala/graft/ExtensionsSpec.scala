package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftExtensions

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot is callable from SQL after registration and matches the Column API") {
    GraftExtensions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("v_vecs")
    val sqlVals = spark.sql("SELECT graft_dot(a, b) AS d FROM v_vecs")
      .collect().map(_.getDouble(0)).toSeq
    assert(sqlVals === Seq(32.0, 0.0))
    val colVals = df.select(graft.functions.VectorExprs.dot($"a", $"b"))
      .collect().map(_.getDouble(0)).toSeq
    assert(sqlVals === colVals)
  }

  test("graft_md5h48 equals the conv/substring/md5 formula on real text, incl. codegen") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val docs = Tables.documents(spark, Sf0001)
        .select(explode(graft.text.TextStats.tokens($"text")).as("t"))
      val mismatches = docs.select(
          graft.dedup.Dedup.md5Hash48($"t").as("native"),
          expr("CAST(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT)").as("composed"))
        .filter($"native" =!= $"composed").count()
      assert(mismatches == 0)
      // SQL registration path too
      docs.createOrReplaceTempView("v_toks")
      val viaSql = spark.sql(
        "SELECT count(*) FROM v_toks WHERE graft_md5h48(t) != CAST(conv(substring(md5(t), 1, 12), 16, 10) AS BIGINT)")
        .first().getLong(0)
      assert(viaSql == 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("graft_md5h48 is null-safe and rejects non-string input") {
    GraftExtensions.register(spark)
    val r = Seq(Some("x"), None).toDF("s")
      .select(graft.dedup.Dedup.md5Hash48($"s").as("h")).collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("n").select(graft.dedup.Dedup.md5Hash48($"n")).collect()
    }
  }

  test("graft_dot compiles under forced codegen (fallback disabled)") {
    GraftExtensions.register(spark)
    // with fallback off, a broken doGenCode would throw instead of
    // silently degrading to interpreted evaluation
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val emb = Tables.embeddings(spark, Sf0001).limit(100)
      emb.createOrReplaceTempView("v_emb")
      val total = spark.sql("SELECT sum(graft_dot(embedding, embedding)) FROM v_emb")
        .first().getDouble(0)
      assert(total > 0.0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("sortedIntersectCount equals size(array_intersect) on sorted real shingle sets, incl. codegen") {
    // the dd18 verify-tail contract (r19 optimization round): on
    // ascending-sorted arrays the merge-scan count is value-identical
    // to array_intersect's hash-set size — checked over every candidate
    // doc pair of the real sf0.001 corpus, under forced codegen
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val sets = graft.dedup.Dedup
        .hashedShingleRows(Tables.documents(spark, Sf0001), "doc_id", "text", 3)
        .groupBy($"doc").agg(sort_array(collect_list($"s")).as("ts"))
        .limit(200).localCheckpoint()
      val pairs = sets.toDF("a", "ts_a").crossJoin(sets.toDF("b", "ts_b"))
        .filter($"a" < $"b")
      val mismatches = pairs.select(
          graft.functions.ArrayFns.sortedIntersectCount($"ts_a", $"ts_b").as("merge"),
          size(array_intersect($"ts_a", $"ts_b")).cast("long").as("builtin"))
        .filter($"merge" =!= $"builtin").count()
      assert(mismatches == 0)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("sortedIntersectCount: duplicates collapse, null arrays, type rejection") {
    val df = Seq(
      (Some(Array(1L, 2L, 2L, 3L)), Some(Array(2L, 2L, 3L, 9L))), // dup runs → {2,3} = 2
      (Some(Array.empty[Long]), Some(Array(1L))),
      (None, Some(Array(1L)))).toDF("a", "b")
    val r = df.select(graft.functions.ArrayFns.sortedIntersectCount($"a", $"b").as("c"))
      .collect()
    assert(r(0).getLong(0) == 2L && r(1).getLong(0) == 0L && r(2).isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq((Array(1.0), Array(2.0))).toDF("a", "b")
        .select(graft.functions.ArrayFns.sortedIntersectCount($"a", $"b")).collect()
    }
  }
}
