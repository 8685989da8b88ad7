package graft.queries

/** Filled in incrementally. */
object DedupQueries {
  val all: Seq[Q] = Seq()
}
