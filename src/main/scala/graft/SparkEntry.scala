package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The trends query — SURVEY.md §3.2/§7.2's "minimum end-to-end slice":
    * scan, filter, two joins, explode(split), year cast, grouped
    * mean+sum, sort.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.RelationalQueries.q13Trends(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Catalog.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = graft.queries.Catalog.oracleSql
}
