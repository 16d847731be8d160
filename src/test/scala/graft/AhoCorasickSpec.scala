package graft

import org.scalatest.funsuite.AnyFunSuite

class AhoCorasickSpec extends AnyFunSuite {
  import functions.AhoCorasick

  private def brute(text: String, patterns: Seq[String]): (Long, Int, Int) = {
    val occ = patterns.map { p =>
      (0 to text.length - p.length).filter(i => text.startsWith(p, i))
    }
    val n = occ.map(_.length.toLong).sum
    val hit = occ.count(_.nonEmpty)
    val first = occ.flatten.sorted.headOption.getOrElse(-1)
    (n, hit, first)
  }

  test("classic he/she/his/hers: overlapping outputs via fail links") {
    val pats = Seq("he", "she", "his", "hers")
    val ac = new AhoCorasick(pats)
    // "ushers" contains she(1), he(2), hers(2) -> 3 matches, first at 1
    assert(ac.stats("ushers") == ((3L, 3, 1)))
    assert(ac.stats("ushers") == brute("ushers", pats))
    assert(ac.stats("his history") == brute("his history", pats))
    assert(ac.stats("xyz") == ((0L, 0, -1)))
  }

  test("nested and self-overlapping patterns match brute force on random text") {
    val pats = Seq("aa", "aaa", "ab", "ba", "a")
    val ac = new AhoCorasick(pats)
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val t = Seq.fill(rng.nextInt(30))("ab".charAt(rng.nextInt(2))).mkString
      assert(ac.stats(t) == brute(t, pats), s"text '$t'")
    }
  }

  test("pattern sharing a prefix with another does not double-build trie nodes") {
    val pats = Seq("scan", "can", "an", "join", "in", "data")
    val ac = new AhoCorasick(pats)
    // "scan" contains scan(0), can(1), an(2) -> 3 matches, first 0
    assert(ac.stats("scan") == ((3L, 3, 0)))
    assert(ac.stats("join in") == ((3L, 2, 0))) // join@0, in@2, in@5
  }
}
