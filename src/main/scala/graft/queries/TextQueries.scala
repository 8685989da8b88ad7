package graft.queries

/** Filled in incrementally. */
object TextQueries {
  val all: Seq[Q] = Seq()
}
