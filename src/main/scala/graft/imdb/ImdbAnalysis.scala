package graft.imdb

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** The reference's profiling + trends analyses
  * (scripts/data_analysis.py) as data-returning operators (the
  * reference prints; an engine returns frames).
  */
object ImdbAnalysis {

  case class BasicStats(
      rowCount: Long,
      columnCount: Int,
      nullContainingRows: Long,
      fullyNullRows: Long,
      nullsPerColumn: DataFrame,
      describe: DataFrame)

  /** Per-table profile — data_analysis.py:8-41: total rows, rows with
    * any / only NULLs, per-column NULL(+NaN) counts, describe().
    * `isnan` is applied through an explicit double cast: the reference
    * leans on PySpark's implicit string→double coercion inside
    * isnan(c); Scala makes the same cast visible.
    */
  def basicStats(df: DataFrame): BasicStats = {
    val total = df.count()
    val nullRows = total - df.na.drop().count()
    val fullyNullRows = total - df.na.drop("all").count()
    // The reference's isnan(c) on every column leaned on PySpark 3.5's
    // lenient string→double coercion (malformed → NULL → isnan false).
    // Spark 4 is ANSI by default (malformed cast throws), so the NaN
    // check is applied only where NaN can exist: float/double columns.
    // Identical results, no try_cast in the hot path.
    // Two PySpark-isms in the reference's one-liner, made explicit:
    // (1) when(cond, c) passes the column NAME, which PySpark wraps as
    //     a literal — so NULL rows yield a non-NULL value and DO get
    //     counted (passing col(c) would return NULL and count nothing);
    // (2) isnan(c) on strings leaned on lenient string→double coercion,
    //     which ANSI-mode Spark 4 rejects — NaN can only exist in
    //     float/double columns, so the check is confined to those.
    val nullsPerColumn = df.select(df.columns.map { c =>
      val floating = df.schema(c).dataType == DoubleType || df.schema(c).dataType == FloatType
      val pred = if (floating) col(c).isNull || isnan(col(c)) else col(c).isNull
      count(when(pred, lit(c))).as(c)
    }.toSeq: _*)
    BasicStats(total, df.columns.length, nullRows, fullyNullRows,
      nullsPerColumn, df.describe())
  }

  /** Genre-trends aggregation — data_analysis.py:44-116 and SURVEY.md
    * §3.2, the flagship "minimum slice" query. Structure preserved
    * 1:1, including the filter on `isAdult` *after* a select that
    * projects it away (legal via Catalyst's ResolveMissingReferences)
    * and the rlike numeric guard on an already-int column.
    */
  def trendsDataFrame(titleBasics: DataFrame, titleRatings: DataFrame): DataFrame = {
    val titlesCleaned = titleBasics
      .select("tconst", "titleType", "primaryTitle", "genres", "startYear")
      .filter(col("startYear").isNotNull && col("genres").isNotNull &&
        col("primaryTitle").isNotNull)
      .filter(col("isAdult") === 0 &&
        col("titleType").isin(ImdbPipeline.TitleTypes: _*))
      .filter(col("startYear") >= 2000 && col("startYear") =!= 2025)

    val ratingsCleaned = titleRatings
      .select("tconst", "averageRating", "numVotes")
      .filter(col("averageRating").cast("float").isNotNull &&
        col("numVotes").cast("int").isNotNull)

    titlesCleaned
      .join(ratingsCleaned, Seq("tconst"), "inner")
      .withColumn("genre", explode(split(col("genres"), ",")))
      .withColumn("startYear", col("startYear").cast("int"))
      .withColumn("averageRating", col("averageRating").cast("float"))
      .withColumn("numVotes", col("numVotes").cast("int"))
      .filter(col("averageRating").isNotNull && col("numVotes").isNotNull &&
        col("genre").isNotNull && col("genre") =!= "Adult")
      .withColumn("numVotes",
        when(col("numVotes").rlike("^[0-9]+$"), col("numVotes").cast("int")))
      .na.drop(Seq("numVotes"))
      .groupBy(col("genre"), col("startYear"))
      .agg(avg(col("averageRating")).as("avgRating"),
        sum(col("numVotes")).as("totalVotes"))
  }

  /** Per-group distribution counts (A9, analysis.ipynb cells 24-30). */
  def distribution(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col(groupCol))
}
