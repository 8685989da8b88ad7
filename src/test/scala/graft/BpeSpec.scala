package graft

import graft.text.BpeTrainer

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("greedy left-to-right merging inside a run: aaaa -> [aa][aa], not [aa][a][a]") {
    val d = docs("aaaa aaaa")
    val m = BpeTrainer.train(d, "text", numMerges = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // word 'aaaa' ×2: pairs (a,a) ×3 per word → count 6; after the merge
    // the repr must be [aa][aa] (greedy), giving (aa,aa) count 2 — a
    // separator scheme that loses the overlap would see (aa,a) instead
    assert(m.toSeq === Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)))
  }

  test("boundary guard: merged symbol 'ab' never matches inside 'aab' as [aa][b]") {
    val d = docs(Seq.fill(5)("ab").mkString(" ") + " " + Seq.fill(3)("aab").mkString(" "))
    val m = BpeTrainer.train(d, "text", numMerges = 2)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // pairs: (a,b) 5+3=8, (a,a) 3 → merge1 (a,b,8). 'aab' = [a][ab]
    // afterwards (NOT [aa][b]), so merge2 must be (a,ab,3)
    assert(m.toSeq === Seq((1, "a", "b", 8L), (2, "a", "ab", 3L)))
  }

  test("count ties break lexicographically on (lhs, rhs)") {
    val d = docs("xy xy zw zw")
    val m = BpeTrainer.train(d, "text", numMerges = 1).collect()(0)
    assert((m.getString(1), m.getString(2), m.getLong(3)) === (("x", "y", 2L)))
  }

  test("applyMerges replays training merges to the same segmentation") {
    val d = docs("banana bandana banana")
    val merges = BpeTrainer.train(d, "text", numMerges = 4)
      .orderBy("merge_rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val pieces = BpeTrainer.applyMerges(Seq("banana").toDF("word"), "word", merges)
      .select("pieces").as[Seq[String]].collect()(0)
    // whatever the learned merges, the pieces must reassemble the word
    // and contain no separator residue
    assert(pieces.mkString === "banana")
    assert(pieces.forall(p => !p.contains(BpeTrainer.Sep)))
    // 4 merges on this corpus must compress banana below 6 characters
    assert(pieces.size < 6)
  }

  test("applyOracleSql keeps the train oracle's concat operators intact") {
    // regression pin: a stripMargin over the interpolated train-oracle
    // prefix would eat the leading pipe of line-initial `||` operators
    val sql = BpeTrainer.applyOracleSql(8)
    assert(sql.contains("|| '··' AS repr"))
    assert(!sql.contains("\n| "))         // no orphaned margin pipes
    assert(sql.contains("FROM v8"))       // pieces read the final table
    assert(sql.contains("ORDER BY d.doc_id"))
  }

  test("words outside [a-z0-9]+ are excluded from training") {
    val d = docs("café café café aa aa")
    val m = BpeTrainer.train(d, "text", numMerges = 1).collect()
    assert(m.length === 1)
    assert((m(0).getString(1), m(0).getString(2)) === (("a", "a")))
  }

  test("single-character words yield no pairs and cannot produce merges") {
    val d = docs("a b c a b c")
    assert(BpeTrainer.train(d, "text", numMerges = 3).count() === 0)
  }
}
