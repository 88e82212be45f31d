package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property check of the fused word-gram digest kernel against an
 * independent naive formulation: split on single spaces with Spark's
 * `split(str, " ")` limit -1 semantics (trailing empties KEPT), join each
 * n-window with a space, md5-hex it, distinct in first-occurrence order.
 * The kernel's bug classes are all in what it does differently — feeding
 * word bytes + separator into the digest without building the gram string
 * (boundary placement), the words.length < n early-out, and the
 * LinkedHashSet ordering — so the oracle builds every gram string
 * explicitly. Generator is heavy in repeated words (dedup), empty words
 * from doubled/leading/trailing spaces (the limit -1 edge), and
 * multi-byte characters (UTF-8 length vs char length).
 */
object WordGramMd5sProps extends Properties("WordGramMd5s") {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private def reference(text: String, n: Int): Seq[String] = {
    val words = text.split(" ", -1)
    if (words.length < n) Seq.empty
    else (0 to words.length - n)
      .map(i => md5hex(words.slice(i, i + n).mkString(" ")))
      .distinct
  }

  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf("the", "fox", "répète", "日本語", "a", ""),
    Gen.stringOfN(3, Gen.alphaNumChar))

  private val texts: Gen[String] = for {
    k <- Gen.choose(0, 12)
    ws <- Gen.listOfN(k, word)
  } yield ws.mkString(" ")

  property("kernel == naive split/join/md5/distinct") =
    Prop.forAll(texts, Gen.choose(1, 5)) { (text, n) =>
      val kernel = TextHashes.wordGramMd5s(text, n).map(_.toString).toSeq
      kernel == reference(text, n)
    }
}
