package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests from SURVEY.md §5: bucketing totality, one-hot row
  * sums, top-K ⊆ sorted prefix. ScalaCheck generators drive the
  * inputs (seeded — deterministic across runs); each property batches
  * all samples through one Spark evaluation to keep runtime sane.
  * (scalatestplus-scalacheck isn't on the offline classpath, so
  * sampling is explicit rather than via forAll.)
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def bucketExpr = when($"q" < 10, 0).when($"q" <= 25, 1)
    .when($"q" <= 40, 2).otherwise(3)

  test("bucketing is total over doubles (incl. boundaries, negatives, extremes)") {
    val gen = Gen.chooseNum(-1e9, 1e9,
      0.0, 9.999999, 10.0, 25.0, 25.000001, 40.0, Double.MinPositiveValue)
    val qs = samples(gen, 300)
    assert(qs.nonEmpty)
    val buckets = qs.toDF("q").select(bucketExpr.as("b")).collect().map(_.getInt(0))
    assert(buckets.length === qs.length)
    assert(buckets.forall(b => b >= 0 && b <= 3))
    // spot-check monotonicity: bucket of sorted inputs is non-decreasing
    val sortedBuckets = qs.sorted.toDF("q").select(bucketExpr.as("b"))
      .collect().map(_.getInt(0))
    assert(sortedBuckets.toSeq === sortedBuckets.sorted.toSeq)
  }

  test("one-hot columns sum to exactly 1 per row over a closed domain") {
    val statuses = Seq("F", "O", "P")
    val ss = samples(Gen.oneOf(statuses), 200)
    val sums = ss.toDF("s")
      .select(statuses.map(v => ($"s" === v).cast("int").as(s"is_$v")): _*)
      .select(statuses.map(v => col(s"is_$v")).reduce(_ + _).as("t"))
      .collect().map(_.getInt(0))
    assert(sums.length === ss.length)
    assert(sums.forall(_ == 1))
  }

  test("top-K via orderBy+limit equals the sorted prefix (many random lists)") {
    (0 until 5).foreach { round =>
      val xs = samples(Gen.chooseNum(Int.MinValue, Int.MaxValue), 80 + round * 17)
      val k = 10
      val got = xs.toDF("x").orderBy($"x".desc).limit(k)
        .collect().map(_.getInt(0)).toSeq
      assert(got === xs.sorted.reverse.take(k))
    }
  }
}
