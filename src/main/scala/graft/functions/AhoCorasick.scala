package graft.functions

import scala.collection.mutable

/**
 * Aho-Corasick multi-pattern automaton (Aho & Corasick 1975): one pass over
 * the text finds every occurrence of every pattern, independent of pattern
 * count — the classic answer to "match 10^6 blocklist phrases" where a
 * per-phrase `contains` scan costs O(text × patterns).
 *
 * Output sets are pre-aggregated through the fail chain at build time
 * (out(v) ++= out(fail(v))), so the scan loop never walks fail links for
 * reporting — it only follows them on mismatches, the standard amortized
 * O(text) bound.
 *
 * Built once per executor (the expression holds it in a transient lazy
 * val); immutable after construction, safe under concurrent task threads.
 */
final class AhoCorasick private (
    gotoMaps: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val nPatterns: Int) extends Serializable {

  /** Number of DISTINCT patterns occurring in `text` at least once. */
  def countDistinct(text: String): Int = {
    val seen = new java.util.BitSet(nPatterns)
    var node = 0
    var i = 0
    while (i < text.length) {
      val c = Character.valueOf(text.charAt(i))
      var n = node
      var next = gotoMaps(n).get(c)
      while (n != 0 && next == null) {
        n = fail(n)
        next = gotoMaps(n).get(c)
      }
      node = if (next == null) 0 else next.intValue()
      val o = out(node)
      var j = 0
      while (j < o.length) { seen.set(o(j)); j += 1 }
      i += 1
    }
    seen.cardinality()
  }
}

object AhoCorasick {
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "empty pattern set")
    require(patterns.forall(_.nonEmpty), "empty pattern")
    val gotoMaps = mutable.ArrayBuffer(new java.util.HashMap[Character, Integer]())
    val ownOut = mutable.ArrayBuffer(List.empty[Int])
    patterns.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.foreach { ch =>
        val c = Character.valueOf(ch)
        val next = gotoMaps(node).get(c)
        node = if (next != null) next.intValue()
        else {
          gotoMaps += new java.util.HashMap[Character, Integer]()
          ownOut += Nil
          gotoMaps(node).put(c, gotoMaps.length - 1)
          gotoMaps.length - 1
        }
      }
      ownOut(node) = id :: ownOut(node)
    }
    val n = gotoMaps.length
    val fail = new Array[Int](n)
    val out = new Array[Array[Int]](n)
    out(0) = ownOut(0).toArray
    // BFS: fail(child) = deepest proper suffix node; outputs aggregate so
    // the scan loop reports without walking fail chains
    val queue = mutable.Queue.empty[Int]
    gotoMaps(0).forEach { (_, v) =>
      fail(v) = 0
      out(v) = ownOut(v).toArray
      queue.enqueue(v)
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoMaps(u).forEach { (c, v) =>
        var f = fail(u)
        var next = gotoMaps(f).get(c)
        while (f != 0 && next == null) {
          f = fail(f)
          next = gotoMaps(f).get(c)
        }
        fail(v) = if (next != null && next.intValue() != v) next.intValue() else 0
        out(v) = (ownOut(v) ++ out(fail(v))).toArray
        queue.enqueue(v)
      }
    }
    new AhoCorasick(gotoMaps.toArray, fail, out, patterns.length)
  }
}
