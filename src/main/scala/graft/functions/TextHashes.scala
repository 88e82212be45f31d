package graft.functions

import java.util.Arrays

/**
 * Tight JVM kernels for shingling and MinHash. Catalyst's higher-order
 * functions (transform/aggregate) evaluate interpreted per element, so a
 * 64-permutation MinHash over ~300 shingles costs ~20k boxed lambda calls
 * per row; these kernels do the same work in one flat loop per row.
 */
object TextHashes {

  /** Lowercase, collapse whitespace runs to single spaces, trim. */
  def normalize(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) {
        if (sb.length() > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    sb.toString
  }

  /** 64-bit hash of chars [from, from+n) — FNV-1a over UTF-16 code units.
    * Deterministic, seedable, no allocation. */
  private def hashWindow(s: String, from: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + n
    while (i < end) {
      val c = s.charAt(i)
      h ^= (c & 0xFF); h *= 0x100000001b3L
      h ^= (c >>> 8); h *= 0x100000001b3L
      i += 1
    }
    // final avalanche (xorshift-multiply) to spread FNV's weak low bits
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    h
  }

  /** Distinct, sorted hashes of all n-char shingles of normalize(text).
    * Sorted so set intersection is a linear merge. */
  def shingleHashesSorted(text: String, n: Int): Array[Long] = {
    val s = normalize(text)
    val count = s.length - n + 1
    if (count <= 0) return Array.emptyLongArray
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) { hs(i) = hashWindow(s, i, n); i += 1 }
    Arrays.sort(hs)
    // in-place dedup of the sorted array
    var w = 1
    i = 1
    while (i < count) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    if (w == count) hs else Arrays.copyOf(hs, w)
  }

  private val Prime = 2147483647L // 2^31 - 1: a*x+b stays inside a long

  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), (Array[Long], Array[Long])]()

  /** Deterministic (a, b) coefficient pairs in the mod-p space — memoized,
    * the kernel runs once per row and must not regenerate them. */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent((numHashes, seed), { case (n, s) => generate(n, s) })

  private def generate(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    var state = seed
    def next(): Long = { state = state * 6364136223846793005L + 1442695040888963407L; state }
    val as = new Array[Long](numHashes)
    val bs = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      as(i) = java.lang.Math.floorMod(next(), Prime - 1) + 1
      bs(i) = java.lang.Math.floorMod(next(), Prime)
      i += 1
    }
    (as, bs)
  }

  /**
   * MinHash signature: one pass over the shingle windows updating all
   * numHashes minima. null (meaning: no shingles) for too-short text, so
   * callers can filter rather than index empty signatures.
   */
  def minHashSig(text: String, shingleN: Int, numHashes: Int, seed: Long): Array[Long] = {
    val s = normalize(text)
    val count = s.length - shingleN + 1
    if (count <= 0) return null
    val (as, bs) = TextHashes.coefficients(numHashes, seed)
    val mins = new Array[Long](numHashes)
    Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < count) {
      val x = java.lang.Math.floorMod(hashWindow(s, i, shingleN), Prime)
      var j = 0
      while (j < numHashes) {
        val v = (as(j) * x + bs(j)) % Prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    mins
  }

  /**
   * 64-bit SimHash: whitespace tokens of the normalized text, each distinct
   * token hashed once; every hash bit votes ±1 on its output bit, sign wins.
   * One pass, no explode/shuffle. Returns 0 for token-less text.
   */
  def simHash64(text: String): Long = {
    val s = normalize(text)
    if (s.isEmpty) return 0L
    val weights = new Array[Int](64)
    val seen = new java.util.HashSet[Long]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) {
          val h = hashWindow(s, start, i - start)
          if (seen.add(h)) {
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) weights(b) += 1 else weights(b) -= 1
              b += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (weights(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Fraction of equal components between two equal-length signatures —
    * the MinHash Jaccard estimate. Throws on length mismatch: comparing
    * signatures from different numHashes configurations would produce a
    * plausible-looking but meaningless estimate. */
  def sigEqualFraction(a: Array[Long], b: Array[Long]): Double = {
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"signature length mismatch: ${a.length} vs ${b.length}")
    var i = 0; var eq = 0
    val n = a.length
    while (i < n) { if (a(i) == b(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  /** |a ∩ b| for two sorted long arrays — linear merge, no allocation. */
  def sortedIntersectSize(a: Array[Long], b: Array[Long]): Int = {
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    common
  }
}
