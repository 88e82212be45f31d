package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.unsafe.types.UTF8String

/**
 * Property check of the one-pass winnowing kernel against an independent
 * direct-from-the-paper formulation: hash every k-gram, take min over
 * every explicit w-window slice, distinct + sort. The kernel's bug classes
 * are all in what it does DIFFERENTLY from that naive shape — the
 * monotonic deque (eviction off-by-ones), raw-digest comparison standing
 * in for hex-string comparison (signedness), UTF-8 char-boundary walking
 * standing in for code-point substring, and the short-doc single-window
 * branch — so the oracle here shares none of those mechanisms. Generator
 * is heavy in repeated substrings (deque ties), multi-byte chars, and
 * lengths straddling the n_grams < w boundary.
 */
object WinnowFpsProps extends Properties("WinnowFps") {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Naive reference: code-point k-grams, hex-string min per w-window. */
  private def reference(text: String, k: Int, w: Int): Seq[String] = {
    val cps = text.codePoints().toArray
    val nGrams = cps.length - k + 1
    if (nGrams <= 0) Seq.empty
    else {
      val hs = (0 until nGrams).map(i =>
        md5hex(new String(cps, i, k)))
      val wins =
        if (nGrams < w) Seq(hs.min)
        else (0 to nGrams - w).map(j => hs.slice(j, j + w).min)
      wins.distinct.sorted
    }
  }

  private val piece: Gen[String] = Gen.oneOf(
    "abcabcabc", "the quick brown fox", "aaaaaaaaaa", "zzzz",
    "café naïve", "日本語の文",
    "😀😁", "0123456789", " ", "mmmm mmmm mmmm")

  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 8)
    ps <- Gen.listOfN(n, piece)
  } yield ps.mkString

  property("kernel == naive slice-min reference") = Prop.forAll(
    textGen, Gen.choose(2, 9), Gen.choose(2, 6)) { (text, k, w) =>
    val got = TextHashes.winnowFpsHex(
      UTF8String.fromString(text).getBytes, k, w).map(_.toString).toSeq
    val want = reference(text, k, w)
    Prop(got == want) :| s"text=${text.take(40)} k=$k w=$w got=$got want=$want"
  }

  property("shared-substring guarantee: span >= k+w-1 shares a fingerprint") =
    Prop.forAll(Gen.listOfN(16, Gen.alphaLowerChar).map(_.mkString), piece, piece) {
      (span, pre, post) =>
      val k = 8; val w = 4
      val a = TextHashes.winnowFpsHex(
        UTF8String.fromString(pre + span).getBytes, k, w).map(_.toString).toSet
      val b = TextHashes.winnowFpsHex(
        UTF8String.fromString(span + post).getBytes, k, w).map(_.toString).toSet
      Prop(a.intersect(b).nonEmpty) :| s"span=${span.take(20)}"
    }
}
