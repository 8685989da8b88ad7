package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 eighth wave: prefix filtering loses NOTHING (equality with
  * the full-index exact join) while indexing strictly fewer postings.
  */
class Extended12Spec extends SparkSpec {

  private def shingles = Tables.documents(spark, Sf0001)
    .select(col("doc_id"), graft.text.TextStats.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
      .as("t3"))
    .select(col("doc_id"), graft.dedup.Dedup.md5Hash48(col("t3")).as("tok"))
    .distinct()

  test("dd18 equals the full-inverted-index exact Jaccard join") {
    val sh = shingles.localCheckpoint()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val full = sh.as("a").join(sh.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard", round(col("inter") /
        (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
    val pf = queries.Catalog.queries("dd18_prefix_filter")(spark, Sf0001)
    assert(full.count() > 0)
    assert(pf.exceptAll(full).count() == 0 && full.exceptAll(pf).count() == 0,
      "prefix filtering must be lossless at the threshold")
  }

  test("dd18's prefix index posts strictly fewer entries than the full index") {
    val sh = shingles.localCheckpoint()
    val fullPostings = sh.count()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val freq = sh.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))
    val prefixPostings = sh.join(broadcast(freq), "tok")
      .withColumn("pos", row_number().over(wd))
      .join(sizes, "doc_id")
      .filter(col("pos") <= col("sz") - ceil(col("sz") * 0.5) + 1)
      .count()
    assert(prefixPostings < fullPostings,
      s"prefix $prefixPostings should be < full $fullPostings")
    // at t=0.5 the prefix is about half of each set (+1)
    assert(prefixPostings <= fullPostings / 2 + sizes.count())
  }
}
