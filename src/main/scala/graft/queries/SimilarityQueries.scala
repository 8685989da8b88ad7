package graft.queries

/** Filled in incrementally. */
object SimilarityQueries {
  val all: Seq[Q] = Seq()
}
