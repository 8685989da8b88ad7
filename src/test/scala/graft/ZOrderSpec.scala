package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference per-bit Morton interleave (the formula the q69 DuckDB
    * oracle generates) to check the magic-constant kernel against.
    */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, k) =>
      acc | (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
    }

  test("z_order2 known values and corner cases") {
    val cases = Seq(
      (0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L), (1L, 1L, 3L),
      (3L, 0L, 5L),                      // x bits land on even positions
      (0xFFFFL, 0xFFFFL, 0xFFFFFFFFL),   // full 16-bit range packs to 32 bits
      (0x10000L, 0L, 0L))                // bit 16 is masked off
    val got = cases.toDF("x", "y", "expect")
      .select(ZOrder.zOrder2($"x", $"y").as("z"), $"expect")
      .as[(Long, Long)].collect()
    got.foreach { case (z, e) => assert(z === e) }
  }

  test("codegen kernel matches the per-bit reference formula on random inputs") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = xs.toDF("x", "y").select($"x", $"y", ZOrder.zOrder2($"x", $"y").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z === mortonRef(x, y)) }
  }

  test("z-sorted layout keeps 2-D boxes in few partitions (locality)") {
    // 32×32 grid, 16 range partitions: any aligned 8×8 box should touch
    // far fewer partitions under z-order than the worst case (all 16
    // under a y-only query against an x-sorted layout).
    val grid = (0 until 32).flatMap(x => (0 until 32).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val clustered = ZOrder.clusterByZ(grid, $"x", $"y", numPartitions = 16)
      .withColumn("pid", spark_partition_id())
    val parts = clustered
      .filter($"x" >= 8 && $"x" < 16 && $"y" >= 8 && $"y" < 16)
      .select("pid").distinct().count()
    assert(parts <= 4, s"8x8 box touched $parts of 16 partitions")
  }

  test("graft_zorder2 is callable from SQL after extension registration") {
    graft.plans.GraftExtensions.register(spark)
    val z = spark.sql("SELECT graft_zorder2(3, 1) AS z").as[Long].head()
    assert(z === 7L) // x=3 → bits 0,2; y=1 → bit 1
  }
}
