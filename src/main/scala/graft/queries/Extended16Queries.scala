package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-7 twelfth wave: grid-partitioned spatial radius join — the
  * standard distributed spatial shape (GeoSpark/Sedona's partition-
  * and-prune): assign points to r-sized grid cells, explode ONE side
  * into its 3×3 cell neighborhood, equi-join on cell, and filter by
  * exact distance. Candidates are bounded by local density × 9 cells
  * instead of n² — the same Σ bucket² containment argument as every
  * LSH join in the engine, in coordinate space.
  */
object Extended16Queries {

  /** All point pairs within Euclidean distance 0.02 in the 2-d
    * projection of the embedding table (dims 1-2). A pair can match
    * in exactly one cell (the probe's own), so the neighborhood
    * explode introduces no duplicates to dedup away.
    */
  private def q100SpatialJoin(s: SparkSession, dir: String): DataFrame = {
    val r = 0.02
    // shape/finite guards (r11): under ANSI, element_at on a
    // zero-length embedding THROWS (INVALID_ARRAY_INDEX) and a ±Inf
    // coordinate overflows the cell-index floor-to-long — one corrupt
    // vector must not abort the whole spatial join. Screened rows are
    // simply unindexable, same contract as the ANN fits. Mirrored in
    // the oracle (len + isfinite).
    val pts = Tables.embeddings(s, dir)
      .filter(size(col("embedding")) >= 2)
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"))
      .filter(!isnan(col("x")) && abs(col("x")) < lit(Double.PositiveInfinity)
        && !isnan(col("y")) && abs(col("y")) < lit(Double.PositiveInfinity))
      .withColumn("cx", floor(col("x") / r).cast("long"))
      .withColumn("cy", floor(col("y") / r).cast("long"))
      .localCheckpoint()
    val probe = pts.select(col("vec_id").as("id_a"), col("x").as("xa"),
        col("y").as("ya"),
        explode(expr("flatten(transform(sequence(-1, 1), dx -> " +
          "transform(sequence(-1, 1), dy -> struct(cx + dx AS cx, cy + dy AS cy))))"))
          .as("cell"))
      .select(col("id_a"), col("xa"), col("ya"),
        col("cell.cx").as("cx"), col("cell.cy").as("cy"))
    probe.join(pts.select(col("vec_id").as("id_b"), col("x").as("xb"),
        col("y").as("yb"), col("cx"), col("cy")), Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", sqrt(pow(col("xa") - col("xb"), 2) +
        pow(col("ya") - col("yb"), 2)))
      .filter(col("dist") <= r)
      .select(col("id_a"), col("id_b"), round(col("dist"), 6).as("dist"))
      .orderBy(col("id_a"), col("id_b"))
  }

  private val q100Sql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(sqrt(pow(a.embedding[1]::DOUBLE - b.embedding[1]::DOUBLE, 2)
      |           + pow(a.embedding[2]::DOUBLE - b.embedding[2]::DOUBLE, 2)), 6)
      |    AS dist
      |FROM (SELECT * FROM embeddings
      |      WHERE len(embedding) >= 2
      |        AND isfinite(embedding[1]::DOUBLE) AND isfinite(embedding[2]::DOUBLE)) a
      |JOIN (SELECT * FROM embeddings
      |      WHERE len(embedding) >= 2
      |        AND isfinite(embedding[1]::DOUBLE) AND isfinite(embedding[2]::DOUBLE)) b
      |  ON a.vec_id < b.vec_id
      |WHERE sqrt(pow(a.embedding[1]::DOUBLE - b.embedding[1]::DOUBLE, 2)
      |         + pow(a.embedding[2]::DOUBLE - b.embedding[2]::DOUBLE, 2)) <= 0.02
      |ORDER BY id_a, id_b""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q100_spatial_join", q100SpatialJoin, Some(q100Sql)),
  )
}
