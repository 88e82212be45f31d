package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property check of the one-pass repetition kernel against an independent
 * reference built directly on java split("\\s+", -1) — the spec both the
 * Catalyst fold and the DuckDB oracle implement. Generator is heavy in
 * repeated tokens, every \s variant, and non-ASCII, to exercise the
 * phantom-empty-token and multiplicity paths.
 */
object TextRepetitionProps extends Properties("TextRepetition") {

  private val token: Gen[String] =
    Gen.frequency(
      5 -> Gen.oneOf("a", "b", "ab", "the", "中文", "é"),
      2 -> Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(5).mkString))
  private val ws: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'))
      .map(_.take(3).mkString)
  private val text: Gen[String] = for {
    lead <- Gen.oneOf(Gen.const(""), ws)
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(math.max(toks.size - 1, 0), ws)
    tail <- Gen.oneOf(Gen.const(""), ws)
  } yield lead + (if (toks.isEmpty) ""
    else toks.head + seps.zip(toks.tail).map { case (s, t) => s + t }.mkString) + tail

  private def refCounts(s: String): (Int, Int, Int, Int) = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    val trimmed = s.substring(b, e)
    if (trimmed.isEmpty) (0, 0, 0, 0)
    else {
      val toks = trimmed.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
      val words = toks.groupBy(identity).map(_._2.length)
      val bigrams = toks.sliding(2).collect { case Array(a, b2) => a + " " + b2 }.toSeq
      val top2 = if (bigrams.isEmpty) 0 else bigrams.groupBy(identity).map(_._2.length).max
      (toks.length, words.size, words.max, top2)
    }
  }

  property("kernel counts == java-split reference") = Prop.forAll(text) { s =>
    val row = TextRepetition.count(s)
    val got = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
    val want = refCounts(s)
    Prop(got == want) :| s"text=${s.map(c => f"\\u${c.toInt}%04x").mkString} got=$got want=$want"
  }
}
