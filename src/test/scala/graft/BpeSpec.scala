package graft

import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import TestSession._
  import operators.Bpe

  // the classic Sennrich corpus
  private val words = Seq[(String, Long)](
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3))

  test("training fuses the most frequent pair each round, ties broken lexicographically") {
    val merges = Bpe.train(words, 4)
    // round 1: "es" (newest 6 + widest 3 = 9) beats everything else;
    // round 2: "est" (9); round 3: "lo" (low 5 + lower 2 = 7)
    assert(merges(0).left == "e" && merges(0).right == "s" && merges(0).cnt == 9)
    assert(merges(1).left == "es" && merges(1).right == "t" && merges(1).cnt == 9)
    assert(merges(2).left == "l" && merges(2).right == "o" && merges(2).cnt == 7)
    assert(merges(3).left == "lo" && merges(3).right == "w" && merges(3).cnt == 7)
  }

  test("encode applies merges in rank order; tokens reconstruct the word") {
    val merges = Bpe.train(words, 6)
    val corpus = Seq("low", "lower", "newest", "widest", "lowest", "wines")
    corpus.foreach { w =>
      val toks = Bpe.encodeWord(w, merges)
      assert(toks.mkString("") == w, s"tokens of '$w' must concatenate back")
      assert(toks.forall(_.nonEmpty))
    }
    // "lowest" composes from learned subwords of BOTH families
    assert(Bpe.encodeWord("lowest", merges).toSeq == Seq("low", "est"))
  }

  test("overlapping identical pairs merge left-to-right non-overlapping") {
    // "aaa" with merge (a,a): first occurrence fuses, scan continues AFTER
    // the replacement → [aa, a], never [a, aa] and never a triple fuse
    assert(Bpe.applyMerge(Bpe.initState("aaa"), "a", "a") == " aa a ")
    val merges = Bpe.train(Seq(("aaaa", 10L)), 1)
    assert(merges.head.left == "a" && merges.head.right == "a")
    // pair count is per-adjacency (multiplicity counts, classic BPE): 3×10
    assert(merges.head.cnt == 30)
    // pinned quirk of the delimiter-consuming scan (identical in DuckDB's
    // replace — oracle-verified): on a run of one symbol, occurrences
    // 1,3,5,… fuse, so "aaaaa" → [aa, a, aa] rather than classic greedy
    // [aa, aa, a]; the token MULTISET matches and the word reconstructs
    assert(Bpe.encodeWord("aaaaa", merges).toSeq == Seq("aa", "a", "aa"))
    assert(Bpe.encodeWord("aaaaa", merges).mkString("") == "aaaaa")
  }

  test("training stops early when a single-symbol dictionary has no pairs") {
    val merges = Bpe.train(Seq(("ab", 1L)), 10)
    assert(merges.length == 1) // "ab" fuses in one step; then no pairs remain
    assert(merges.head.left == "a" && merges.head.right == "b")
  }

  test("corpus training is deterministic and encode is consistent with it") {
    val m1 = Bpe.trainFromCorpus(spark, sf, 8, 100)
    val m2 = Bpe.trainFromCorpus(spark, sf, 8, 100)
    assert(m1 == m2)
    assert(m1.length == 8)
    val enc = Bpe.encodeCorpus(spark, sf, m1)
    val row = enc.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getAs[Long]("n_tokens") > 0)
    assert(row.getAs[Long]("n_distinct") <= row.getAs[Long]("n_tokens"))
  }

  test("encode plan is map-only: no shuffle before the per-doc projection") {
    val merges = Bpe.trainFromCorpus(spark, sf, 4, 50)
    val plan = Bpe.encodeCorpus(spark, sf, merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
  }
}
