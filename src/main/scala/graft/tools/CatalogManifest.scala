package graft.tools

/** Regenerates `CATALOG.txt`, the frozen catalog manifest (one query
  * key per line, sorted).
  *
  * The catalog has been FROZEN at 215 keys since round 15 by judge
  * order, with additions only by explicit authorization — but until
  * round 17 the freeze was discipline-only: nothing mechanical
  * noticed an accidental add, drop, or rename (the driver's
  * correctness gate reports per-key results, so a SILENT key-set
  * drift surfaces only as a human noticing a count change).
  * `CatalogSpec` asserts the live key set equals this manifest and
  * prints attributed added/removed names on mismatch.
  *
  * To change the catalog (authorized changes only): run
  * `sbt "runMain graft.tools.CatalogManifest"` and commit the diff —
  * the regeneration is deliberate by construction, the exact property
  * the freeze order wants.
  */
object CatalogManifest {
  val ManifestPath = "CATALOG.txt"

  def main(args: Array[String]): Unit = {
    val names = graft.queries.Catalog.queries.keySet.toSeq.sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(ManifestPath),
      (names.mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"[manifest] wrote ${names.size} keys to $ManifestPath")
  }
}
