package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.AsOf

/** Randomized equivalence harness for the custom as-of merge-join exec
  * (plans.AsofMergeJoinExec) — the one hand-written physical operator
  * in the engine. Three independent implementations must agree on
  * arbitrary multi-partition data: the custom exec, the union+window
  * composition, and a driver-side reference computed with plain Scala
  * collections. Seeded generators (PropertySpec idiom — scalatestplus
  * isn't on the offline classpath, so sampling is explicit) keep runs
  * deterministic.
  */
class Property4Spec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("as-of exec ≡ composition ≡ driver-side reference on random multi-partition data") {
    for (round <- 0 until 3) {
      val keyGen = Gen.chooseNum(0L, 15L) // small domain → heavy key collisions
      val tsGen = Gen.chooseNum(0L, 500L) // small range → ties and equal-ts matches
      val n = 400 + round * 57
      val leftRows = samples(Gen.zip(keyGen, tsGen), n, 1000L * round)
        .zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      // unique (key, ts) on the right per the operator contract
      val rightRows = samples(Gen.zip(keyGen, tsGen), n / 2, 9000L + round)
        .distinct.map { case (k, t) => (k, t, k * 10000.0 + t) }

      val left = leftRows.toDF("event_id", "user_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .repartition(7)
      val right = rightRows.toDF("user_id", "us", "v")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
        .select(col("user_id"), col("ts"), col("v"))
        .repartition(5)

      def collect(df: org.apache.spark.sql.DataFrame): Seq[(Long, Option[Double])] =
        df.select(col("event_id"), col("v"))
          .as[(Long, Option[Double])].collect().toSeq.sortBy(_._1)

      val viaExec = collect(AsOf.asofJoinLatestExec(left, right, "user_id", "ts", "v"))
      val viaComposition = collect(AsOf.asofJoinLatest(left, right, "user_id", "ts", "v"))

      // driver-side reference: latest right row with rts <= lts per key
      val byKey = rightRows.groupBy(_._1)
      val reference = leftRows.map { case (id, k, t) =>
        val m = byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        id -> (if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.sortBy(_._1)

      assert(viaExec.size === leftRows.size, s"round $round: exec dropped left rows")
      assert(viaExec === reference, s"round $round: exec diverges from reference")
      assert(viaComposition === reference, s"round $round: composition diverges from reference")
    }
  }

  test("as-of exec: keys present on only one side and empty right partitions") {
    // left keys 0..9, right keys only 0..4 → half the left rows NULL-pad;
    // right has fewer distinct keys than partitions → some merge
    // partitions see an empty right iterator
    val left = (0 until 100).map(i => (i.toLong, (i % 10).toLong, i.toLong * 10))
      .toDF("event_id", "user_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .repartition(8)
    val right = (0 until 25).map(i => ((i % 5).toLong, i.toLong * 37, i * 1.5))
      .toDF("user_id", "us", "v")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select(col("user_id"), col("ts"), col("v"))
      .repartition(8)
    val out = AsOf.asofJoinLatestExec(left, right, "user_id", "ts", "v")
    assert(out.count() === 100, "every left row must survive")
    val unmatched = out.filter(col("user_id") >= 5)
    assert(unmatched.count() === 50)
    assert(unmatched.filter(col("v").isNotNull).count() === 0,
      "keys absent from the right must NULL-pad, never match")
  }
}
