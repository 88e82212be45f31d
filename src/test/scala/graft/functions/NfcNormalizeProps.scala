package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Property check of NfcNormalizeExpr at the expression level. The kernel
 * delegates to java.text.Normalizer, so the properties target what the
 * EXPRESSION adds around it: the isNormalized fast path must be
 * indistinguishable from always-normalizing (its bug class is returning
 * un-normalized input), the UTF8String⇄String round-trip must not mangle
 * surrogate pairs, and canonical-equal spellings must collapse to one
 * output (the dedup-key contract the operators rely on). Generator is
 * heavy in combining marks, precomposed chars, singleton decompositions
 * (U+212B), reorderable mark sequences, Hangul Jamo, and emoji surrogates.
 */
object NfcNormalizeProps extends Properties("NfcNormalize") {

  private val piece: Gen[String] = Gen.oneOf(
    "a", "xy ",
    "e\u0301", "\u00e9",            // decomposed / composed e-acute
    "A\u030a", "\u00c5",            // decomposed / composed A-ring
    "\u212b",                       // ANGSTROM SIGN: singleton -> U+00C5
    "d\u0307\u0323",                // dot-above + dot-below: reordering
    "\u1100\u1161",                 // Hangul Jamo pair -> U+AC00
    "\uac00",                       // already-composed Hangul
    "\ud83d\ude00",                 // emoji surrogate pair, untouched
    "\u4e2d", "\u0338", "x\u0301\u0327")
  private val text: Gen[String] = Gen.listOf(piece).map(_.mkString)

  private def evalNfc(s: String): String =
    NfcNormalizeExpr(Literal(UTF8String.fromString(s), StringType))
      .eval(null).asInstanceOf[UTF8String].toString

  property("agrees with java.text.Normalizer regardless of fast path") =
    Prop.forAll(text) { s =>
      evalNfc(s) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }

  property("idempotent") = Prop.forAll(text) { s =>
    val once = evalNfc(s)
    evalNfc(once) == once
  }

  property("canonical-equal spellings collapse to one key") =
    Prop.forAll(text) { s =>
      val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
      evalNfc(nfd) == evalNfc(s)
    }

  property("null stays null") = Prop {
    NfcNormalizeExpr(Literal(null, StringType)).eval(null) == null
  }
}
