package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/**
 * Property checks of the shingle/MinHash kernels against independent naive
 * formulations. The kernels' bug classes are exactly what they do
 * DIFFERENTLY from the naive shapes — the in-place sorted dedup
 * (off-by-ones at the write cursor), the Mersenne shift-fold standing in
 * for `% (2^31-1)` (fold count, the conditional subtract), the one-pass
 * all-minima update, and the StringBuilder whitespace collapse — so the
 * oracles here use library sorts/sets, hardware `%`, and a regex
 * normalize, sharing none of those mechanisms. Generators are heavy in
 * repeated substrings (dedup), whitespace runs (normalize), and lengths
 * straddling the `< n` null/empty boundary.
 */
object MinHashKernelProps extends Properties("MinHashKernels") {

  private val Prime = 2147483647L

  /** Naive FNV-1a + avalanche replica over UTF-16 units — shared hash
    * definition (the contract), independent loop. */
  private def fnv(s: String): Long = {
    var h = 0xcbf29ce484222325L
    s.foreach { c =>
      h ^= (c & 0xFF); h *= 0x100000001b3L
      h ^= (c >>> 8); h *= 0x100000001b3L
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  private def normalizeRef(s: String): String =
    s.toLowerCase.split("\\s+", -1).filter(_.nonEmpty).mkString(" ")

  private def shinglesRef(text: String, n: Int): Seq[Long] = {
    val s = normalizeRef(text)
    (0 to s.length - n).map(i => fnv(s.substring(i, i + n))).distinct.sorted
  }

  private val texts: Gen[String] = for {
    k <- Gen.choose(0, 10)
    ws <- Gen.listOfN(k, Gen.oneOf("the", "fox", "Fox", "répète", "ab", "a", "  ", "\t"))
    sep <- Gen.oneOf(" ", "  ", " \n ")
  } yield ws.mkString(sep)

  property("shingleHashesSorted == naive distinct/sorted FNV windows") =
    Prop.forAll(texts, Gen.choose(2, 6)) { (text, n) =>
      TextHashes.shingleHashesSorted(text, n).toSeq == shinglesRef(text, n)
    }

  property("minHashSig == per-hash min over naive shingle mods") =
    Prop.forAll(texts, Gen.choose(2, 6), Gen.choose(1, 16),
        Gen.choose(1L, 1000L)) { (text, n, numHashes, seed) =>
      val s = normalizeRef(text)
      val windows = (0 to s.length - n).map(i => fnv(s.substring(i, i + n)))
      val kernel = Option(TextHashes.minHashSig(text, n, numHashes, seed))
      if (windows.isEmpty) kernel.isEmpty
      else {
        val (as, bs) = TextHashes.coefficients(numHashes, seed)
        val ref = (0 until numHashes).map { j =>
          windows.map { w =>
            val x = java.lang.Math.floorMod(w, Prime)
            // BigInt sidesteps the kernel's shift-fold entirely
            ((BigInt(as(j)) * x + bs(j)) mod BigInt(Prime)).toLong
          }.min
        }
        kernel.exists(_.toSeq == ref)
      }
    }

  property("equal normalized text, equal signature; prefix-extended text differs in shingle SET") =
    Prop.forAll(texts) { text =>
      val a = TextHashes.shingleHashesSorted("  " + text.toUpperCase + " ", 3)
      val b = TextHashes.shingleHashesSorted(text.toLowerCase.trim, 3)
      a.toSeq == b.toSeq
    }
}
