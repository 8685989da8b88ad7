package graft.queries

/** Shared DuckDB-oracle fragments for the embedding family — the
  * oracle-side mirror of the engine's degenerate-vector contracts,
  * introduced by the r12 chaos-parity drive (SCALE.md): running the
  * full oracle battery against the degenerate shard showed every
  * vector oracle either THREW (DuckDB's list_* functions error on
  * length-mismatched or NULL-element lists the engine screens) or
  * silently diverged (DuckDB orders NaN cosines ABOVE every number,
  * the engine folds them to inert NULL). These fragments encode the
  * engine contracts exactly, and are no-ops on clean data — the
  * clean-data hash parity the driver gate checks is unchanged.
  *
  * Mirror-level caveat (shared with every generated oracle here): the
  * corpus dim is burnt in as the testdata fixture constant 64, where
  * the engine elects it from the data (`VectorExprs.dominantDim`).
  */
object OracleVec {

  /** Screened embeddings relation (parenthesized, alias it): vectors
    * right-shaped at the fixture dim with every element non-NULL and
    * finite — `VectorExprs.isShapedVec` in SQL. `x * 0` is 0 for any
    * finite x and NaN for NaN/±Inf (the isFiniteVec trick); a NULL
    * element makes the lambda NULL, which list_filter drops, so the
    * length compare catches all three corruption classes at once.
    * Zero-magnitude vectors are NOT screened — they are shaped and
    * finite; the engine keeps them and folds their cosines to NULL
    * ([[cos]]).
    */
  val EmbScreened: String =
    "(SELECT vec_id, label, embedding, embedding::DOUBLE[] AS v FROM embeddings " +
      "WHERE len(embedding) = 64 " +
      "AND len(list_filter(embedding, x -> NOT isnan(x * 0))) = 64)"

  /** Engine cosine contract (`VectorExprs.cosineWithNorms`): NULL —
    * not NaN, which DuckDB orders ABOVE every number in a DESC rank —
    * when either side has zero magnitude. The non-degenerate branch
    * stays `list_cosine_similarity`, preserving the bit-for-bit float
    * parity the clean-data gate relies on. Rankings over this must
    * drop NULLs pre-rank (`WHERE … IS NOT NULL`), mirroring the Ann
    * tails' drop contract.
    */
  def cos(a: String, b: String): String =
    s"CASE WHEN list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0 " +
      s"THEN NULL ELSE list_cosine_similarity($a, $b) END"

  /** Finiteness-only screen for the PAIRWISE cosine family (sim01,
    * dd05, ml17, q87 — the dim-free exact baselines): any length is
    * admissible, because the engine's contract there is pairwise —
    * `cosineWithNorms` scores any SAME-length finite pair, so two
    * identically-truncated vectors legitimately pair with each other
    * (the data defines their space) while never pairing with the
    * full-width corpus. Length agreement is enforced per pair by
    * [[cosPair]], not here. NULL rows, NULL elements, and NaN/±Inf
    * elements screen out exactly as in [[EmbScreened]].
    */
  val EmbFinite: String =
    "(SELECT vec_id, label, embedding, embedding::DOUBLE[] AS v FROM embeddings " +
      "WHERE embedding IS NOT NULL " +
      "AND len(list_filter(embedding, x -> NOT isnan(x * 0))) = len(embedding))"

  /** [[cos]] plus the per-pair length guard — the exact SQL of
    * `cosineWithNorms`' contract: NULL (dropped pre-rank) for a
    * length-mismatched or zero-magnitude pair.
    */
  def cosPair(a: String, b: String): String =
    s"CASE WHEN len($a) != len($b) " +
      s"OR list_dot_product($a, $a) = 0 OR list_dot_product($b, $b) = 0 " +
      s"THEN NULL ELSE list_cosine_similarity($a, $b) END"
}
