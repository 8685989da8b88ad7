package graft

/** Mechanical catalog-freeze pin (r17, the round's prose→mechanism
  * theme applied to the freeze order itself): the catalog has been
  * frozen at 215 keys since r15, additions by judge authorization
  * only — previously enforced by discipline alone. This spec asserts
  * the LIVE key set equals the checked-in `CATALOG.txt` manifest and
  * names exactly what drifted, so an accidental add/drop/rename fails
  * the suite with an attributed message instead of surfacing as a
  * human noticing a count change in the driver artifact. Deliberate
  * (authorized) changes regenerate the manifest via
  * `runMain graft.tools.CatalogManifest` and commit the diff.
  *
  * Extends SparkSpec: `Catalog.oracleSql` is a cached lazy val whose
  * IMDb/ML entries GENERATE their SQL and need an active SparkSession
  * — forcing it session-less would cache a degraded map for the whole
  * test JVM (and misreport those keys as no-oracle here).
  */
class CatalogSpec extends SparkSpec {

  test("catalog key set is frozen: live keys equal the CATALOG.txt manifest") {
    val src = scala.io.Source.fromFile(graft.tools.CatalogManifest.ManifestPath, "UTF-8")
    val manifest = try src.getLines().filter(_.nonEmpty).toSet finally src.close()
    val live = graft.queries.Catalog.queries.keySet
    val added = (live -- manifest).toSeq.sorted
    val removed = (manifest -- live).toSeq.sorted
    assert(added.isEmpty && removed.isEmpty,
      s"catalog drift vs frozen manifest (judge-authorized changes must " +
      s"regenerate CATALOG.txt via graft.tools.CatalogManifest): " +
      s"added=${added.mkString("[", ", ", "]")} removed=${removed.mkString("[", ", ", "]")}")
    assert(manifest.size == 215, s"frozen catalog is 215 keys, manifest has ${manifest.size}")
  }

  test("every oracle key exists in the catalog, and the no-oracle set is exactly the contractual five") {
    assert(spark.sparkContext.isLocal) // force the session BEFORE oracleSql
    val live = graft.queries.Catalog.queries.keySet
    val oracle = graft.queries.Catalog.oracleSql.keySet
    val dangling = (oracle -- live).toSeq.sorted
    assert(dangling.isEmpty, s"oracleSql keys with no query: $dangling")
    // the 5 contractual no-oracle keys (driver records rows-only
    // checks for them; each has hash-green same-family twins)
    val noOracle = (live -- oracle).toSeq.sorted
    assert(noOracle === Seq("ml03_gbt_eval", "ml04_importances", "ml05_pca",
      "q38_sketches", "q61_hll_sketch"),
      s"the no-oracle set is contractual — it changed to: $noOracle")
  }

  test("the flagship entry and Bench headline names are catalog members") {
    val live = graft.queries.Catalog.queries.keySet
    val missing = Bench.headline.filterNot(live)
    assert(missing.isEmpty, s"headline names not in catalog: $missing")
  }
}
