package graft

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

/** Edge-semantics tests called out in SURVEY.md §5: NULL explode drop
  * (F2), size-of-null (F4), bucket boundaries (P7), plus smoke over
  * every catalog query at sf0.001.
  */
class RelationalSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  test("explode(split(NULL)) yields zero rows — titles with NULL csv drop out (F2)") {
    val df = Seq(("a", "x,y"), ("b", null)).toDF("id", "csv")
    val exploded = df.select($"id", explode(split($"csv", ","))).collect()
    assert(exploded.map(_.getString(0)).toSet === Set("a"))
    assert(exploded.length === 2)
  }

  test("size(split(NULL)) is NULL in Spark 4 (F4; legacy -1 retired)") {
    val df = Seq(("a", "x,y,z"), ("b", null)).toDF("id", "csv")
    val rows = df.select($"id", size(split($"csv", ",")).as("n")).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(rows("a") === Some(3))
    assert(rows("b") === None) // spark.sql.legacy.sizeOfNull=false since 3.0
  }

  test("quantity buckets are total over the domain and hit boundaries (P7)") {
    val df = Seq(0.0, 9.99, 10.0, 25.0, 25.01, 40.0, 40.01, 1e9).toDF("q")
    val got = df.select(
      when($"q" < 10, 0).when($"q" <= 25, 1).when($"q" <= 40, 2).otherwise(3).as("b"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === Seq(0, 0, 1, 1, 2, 2, 3, 3))
  }

  test("rlike alternation has prefix false-positives; exploded semi-join does not (P6)") {
    // The reference's regex membership (data_processing.py:295) matches
    // nm123 inside nm1234 — the documented anti-pattern (SURVEY.md §4.3).
    val df = Seq(("t1", "nm1234"), ("t2", "nm123")).toDF("id", "ids")
    val faithful = df.filter($"ids".rlike(Seq("nm123").mkString("|")))
    assert(faithful.count() === 2) // false positive on nm1234
    val correct = df.select($"id", explode(split($"ids", ",")).as("m"))
      .join(Seq("nm123").toDF("m"), Seq("m"), "left_semi")
    assert(correct.count() === 1)
  }

  test("all catalog queries return rows at sf0.001 (t1 smoke)") {
    graft.queries.Catalog.all.foreach { q =>
      val n = q.fn(spark, Sf0001).count()
      assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("entry returns rows (driver contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql only names declared queries") {
    val undeclared = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(undeclared.isEmpty)
  }

  test("catalog has no duplicate query names (a dup would silently shadow in the Map)") {
    val names = graft.queries.Catalog.all.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate names: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.size === names.size)
  }
}
