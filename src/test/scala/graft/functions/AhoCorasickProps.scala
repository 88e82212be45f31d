package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The automaton must agree with naive per-pattern `contains` on every
  * input — including overlapping patterns, patterns that are prefixes or
  * suffixes of each other, and repeated occurrences (counted once). */
class AhoCorasickProps extends AnyFunSuite {

  private def naive(text: String, patterns: Seq[String]): Int =
    patterns.count(text.contains)

  test("hand cases: overlap, prefix/suffix nesting, repeats, misses") {
    val pats = Seq("he", "she", "his", "hers", "s")
    val ac = AhoCorasick.build(pats)
    for (t <- Seq("ushers", "she sells seashells", "hhh", "", "hishers", "xyz"))
      assert(ac.countDistinct(t) === naive(t, pats), s"text '$t'")
  }

  test("a pattern equal to another's interior substring is still found") {
    val pats = Seq("abcde", "bcd")
    val ac = AhoCorasick.build(pats)
    assert(ac.countDistinct("abcde") === 2)
    assert(ac.countDistinct("zbcdz") === 1)
  }

  test("property: equals naive contains-count on random small-alphabet " +
      "inputs (dense overlap regime)") {
    val rng = new scala.util.Random(11)
    for (round <- 1 to 50) {
      val pats = (1 to (1 + rng.nextInt(8))).map(_ =>
        (1 to (1 + rng.nextInt(4))).map(_ => ('a' + rng.nextInt(2)).toChar).mkString)
        .distinct
      val ac = AhoCorasick.build(pats)
      for (_ <- 1 to 20) {
        val t = (0 until rng.nextInt(30)).map(_ => ('a' + rng.nextInt(2)).toChar).mkString
        assert(ac.countDistinct(t) === naive(t, pats),
          s"round $round patterns=$pats text='$t'")
      }
    }
  }

  test("duplicate pattern ids count once per distinct pattern entry") {
    // two IDENTICAL patterns: both ids light up (same trie node carries
    // both) — countDistinct counts pattern IDs, so a dedup'd input list is
    // the caller's contract; blocklistFilter's phrase lists are distinct
    val ac = AhoCorasick.build(Seq("ab", "ab"))
    assert(ac.countDistinct("ab") === 2)
  }
}
