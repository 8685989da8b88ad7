package graft.queries

/** Filled in incrementally. */
object MlQueries {
  val all: Seq[Q] = Seq()
}
