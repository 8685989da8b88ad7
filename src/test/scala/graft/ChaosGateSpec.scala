package graft

/** The ChaosSmoke sweep as a machine gate (VERDICT r10 #3): every
  * catalog query must survive — not necessarily match, but never
  * throw — on a corpus shard carrying the malformed rows a 100 TB
  * crawl is guaranteed to contain (empty/whitespace/NULL text,
  * sub-shingle docs, zero-magnitude and NaN-element embeddings, NULL
  * event fields, the probed engine-divergence texts). Under Spark 4's
  * default ANSI mode a stray 0/0 or bad cast is an EXCEPTION, so one
  * unguarded ratio would abort a whole corpus job at scale; through
  * round 10 this guarantee lived in a tool the builder remembered to
  * run — inside `sbt test` it cannot silently rot (reverting one
  * nullif guard turns this suite red, verified when the gate landed).
  *
  * Runs the full catalog once, so this is the suite's heavyweight
  * tail — but the claim is catalog-wide by construction and any
  * subset would reopen the hole the gate exists to close.
  */
class ChaosGateSpec extends SparkSpec {

  test("all catalog queries survive the degenerate-data shard (no throw)") {
    // Per-run temp dir (ADVICE r11): a fixed /tmp path let two
    // concurrent `sbt test` runs on one host overwrite each other's
    // shard mid-sweep. Best-effort recursive cleanup after the sweep.
    val dir = java.nio.file.Files.createTempDirectory("graft_chaos_gate").toString
    try {
      graft.tools.ChaosSmoke.build(spark, Sf0001, dir)
      val failures = graft.tools.ChaosSmoke.sweep(spark, dir)
      assert(failures.isEmpty,
        s"${failures.size} of ${SparkEntry.queries.size} queries threw on degenerate data:\n" +
          failures.map { case (n, e) => s"  $n -> $e" }.mkString("\n"))
    } finally {
      try SparkSpec.deleteRecursively(dir)
      catch { case _: Throwable => () }
    }
  }
}
