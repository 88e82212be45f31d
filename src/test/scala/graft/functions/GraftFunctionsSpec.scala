package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("normalize lowercases and collapses whitespace") {
    assert(TextHashes.normalize("  Hello   World\t!\n") === "hello world !")
    assert(TextHashes.normalize("") === "")
    assert(TextHashes.normalize("   ") === "")
  }

  test("shingleHashesSorted: distinct, sorted, windows of n") {
    val h = TextHashes.shingleHashesSorted("abcdef", 4) // abcd bcde cdef
    assert(h.length === 3)
    assert(h.sorted.sameElements(h))
    assert(TextHashes.shingleHashesSorted("ab", 4).isEmpty)
    // repeated content dedups
    assert(TextHashes.shingleHashesSorted("abababab", 2).length === 2) // ab, ba
    // normalization applies before shingling
    assert(TextHashes.shingleHashesSorted("A  B c", 3)
      .sameElements(TextHashes.shingleHashesSorted("a b C", 3)))
  }

  test("wordGramMd5s equals the HOF transform/md5/array_join formulation") {
    import spark.implicits._
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "a b c", "a b c ", "  doubled  spaces here x y z", "", "one",
      "repeat repeat repeat repeat repeat repeat repeat")
    val df = texts.toDF("text")
    val n = 3
    val fused = df.select(
      GraftFunctions.wordGramMd5s(col("text"), n).as("gs")).collect()
      .map(_.getSeq[String](0).toSet)
    val hof = df.select(col("text"), split(col("text"), " ").as("w"))
      .select(when(size(col("w")) >= n,
        array_distinct(transform(sequence(lit(1), size(col("w")) - (n - 1)),
          i => md5(array_join(slice(col("w"), i, lit(n)), " ")))))
        .otherwise(array().cast("array<string>")).as("gs")).collect()
      .map(_.getSeq[String](0).toSet)
    assert(fused.toSeq === hof.toSeq)
    assert(fused.head.nonEmpty)
  }

  test("minHashSig: numHashes entries, equal text equal sig, null for short text") {
    val a = TextHashes.minHashSig("the quick brown fox", 4, 64, 42)
    val b = TextHashes.minHashSig("the quick brown fox", 4, 64, 42)
    assert(a.length === 64)
    assert(a.sameElements(b))
    assert(TextHashes.minHashSig("ab", 4, 64, 42) === null)
    // different seed, different signature
    val c = TextHashes.minHashSig("the quick brown fox", 4, 64, 43)
    assert(!a.sameElements(c))
  }

  test("minHashSig estimates Jaccard: identical=1, disjoint~0") {
    val x = TextHashes.minHashSig("aaaa bbbb cccc dddd eeee", 4, 128, 42)
    val y = TextHashes.minHashSig("aaaa bbbb cccc dddd eeee", 4, 128, 42)
    val z = TextHashes.minHashSig("zzzz yyyy xxxx wwww vvvv", 4, 128, 42)
    def est(p: Array[Long], q: Array[Long]) =
      p.zip(q).count { case (m, n) => m == n }.toDouble / p.length
    assert(est(x, y) === 1.0)
    assert(est(x, z) < 0.15)
  }

  test("simHash64: identical text equal, near text close, different text far") {
    val a = TextHashes.simHash64("the quick brown fox jumps over the lazy dog again and again")
    val b = TextHashes.simHash64("the quick brown fox jumps over the lazy dog again and again")
    val c = TextHashes.simHash64("the quick brown fox jumps over the sleepy dog again and again")
    val d = TextHashes.simHash64("completely unrelated words about distributed query planning")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(a === b)
    assert(ham(a, c) < ham(a, d))
    assert(TextHashes.simHash64("   ") === 0L)
  }

  test("simHash128: deterministic char-gram hash; near text close, unrelated text far") {
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val near = "the quick brown fox jumps over the sleepy dog again and again"
    val far = "completely unrelated words about distributed query planning"
    val ht = TextHashes.simHash128(t)
    def ham(a: Array[Long], b: Array[Long]) =
      java.lang.Long.bitCount(a(0) ^ b(0)) + java.lang.Long.bitCount(a(1) ^ b(1))
    assert(ht sameElements TextHashes.simHash128(t)) // deterministic
    assert(ham(ht, TextHashes.simHash128(near)) < ham(ht, TextHashes.simHash128(far)))
    assert(TextHashes.simHash128("  x ") sameElements Array(0L, 0L)) // shorter than gramN
  }

  test("simHashBandKeys128: rotations x 4 keys, band id above 32 content bits, equal hash = equal keys") {
    val h = TextHashes.simHash128("some document text with enough characters to vote on properly")
    val keys = TextHashes.simHashBandKeys128(h(0), h(1), 2)
    assert(keys.length === 8)
    assert(keys.map(_ >>> 32).toSeq === (0 until 8).map(_.toLong)) // distinct band ids
    assert(keys sameElements TextHashes.simHashBandKeys128(h(0), h(1), 2))
    // layout 0's band 0 is bits [0,32) verbatim
    assert((keys(0) & 0xffffffffL) === (h(0) & 0xffffffffL))
    // a one-bit flip changes at most one band per rotation layout
    val flipped = TextHashes.simHashBandKeys128(h(0) ^ 1L, h(1), 2)
    assert(keys.zip(flipped).count { case (a, b) => a != b } <= 2)
    assertThrows[IllegalArgumentException](TextHashes.simHashBandKeys128(h(0), h(1), 0))
  }

  test("packed simHash128 kernel is bit-identical to the per-bit voting loop") {
    val rnd = new scala.util.Random(7)
    val words = Seq("spark", "join", "scan", "merge", "agg", "row", "data", "key",
      "batch", "stream", "window", "filter", "x", "yy", "zzz")
    (0 until 200).foreach { _ =>
      val text = Seq.fill(rnd.nextInt(80) + 1)(words(rnd.nextInt(words.length)))
        .mkString(" ")
      val fast = TextHashes.simHash128(text)
      val slow = TextHashes.simHash128ViaLoop(text)
      assert(fast sameElements slow, s"kernel divergence on: $text")
    }
  }

  test("Mersenne-fold MinHash kernel matches the BigInt mod definition") {
    val text = "the quick brown fox jumps over the lazy dog and a cat watches nearby"
    val numHashes = 64
    val seed = 42L
    val sig = TextHashes.minHashSig(text, 4, numHashes, seed)
    val (as, bs) = TextHashes.coefficients(numHashes, seed)
    val p = BigInt(2147483647L)
    // min over distinct shingles equals min over all windows
    val xs = TextHashes.shingleHashesSorted(text, 4)
      .map(h => BigInt(java.lang.Math.floorMod(h, 2147483647L)))
    val expected = (0 until numHashes).map { j =>
      xs.map(x => ((BigInt(as(j)) * x + BigInt(bs(j))) mod p).toLong).min
    }
    assert(sig.toSeq === expected)
  }

  test("sortedIntersectSize is exact set intersection") {
    assert(TextHashes.sortedIntersectSize(Array(1L, 3L, 5L), Array(2L, 3L, 5L, 9L)) === 2)
    assert(TextHashes.sortedIntersectSize(Array.emptyLongArray, Array(1L)) === 0)
    val a = TextHashes.shingleHashesSorted("the quick brown fox", 4)
    assert(TextHashes.sortedIntersectSize(a, a) === a.length)
  }

  test("Column API evaluates inside DataFrames") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"), (3L, "xy"))
      .toDF("id", "text")
    val rows = df.select(col("id"),
      GraftFunctions.minHashSig(col("text"), 4, 16, 42).as("sig"),
      GraftFunctions.shingleHashes(col("text"), 4).as("shs"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2))).toList
    assert(rows.find(_._1 == 1L).get._2 === rows.find(_._1 == 2L).get._2)
    assert(rows.find(_._1 == 3L).get._2 === null) // too short → null sig
  }

  test("SQL registration: functions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_sorted_intersect_size(
        |  graft_shingle_hashes('the quick brown fox', 4),
        |  graft_shingle_hashes('the quick brown fox', 4)) AS n,
        |  size(graft_minhash_sig('the quick brown fox', 4, 32, 42)) AS k,
        |  graft_text_signals('the quick brown fox').ws_tokens AS toks,
        |  graft_text_repetition('a a a b').top_word AS tw,
        |  graft_char_entropy('aab').distinct_chars AS dc,
        |  size(graft_char_grams('abcd', 3)) AS ng""".stripMargin)
      .collect().head
    assert(r.getInt(0) > 0)
    assert(r.getInt(1) === 32)
    assert(r.getInt(2) === 4)
    assert(r.getInt(3) === 3)
    assert(r.getInt(4) === 2)
    assert(r.getInt(5) === 2)
    // the aggregate registers too
    val hh = spark.sql(
      "SELECT graft_misra_gries(x, 2) FROM VALUES ('a'),('a'),('b'),('a') t(x)")
      .collect().head.getSeq[org.apache.spark.sql.Row](0)
    assert(hh.exists(r2 => r2.getString(0) == "a" && r2.getLong(1) >= 2L))
  }

  test("GraftExtensions injects functions at session build") {
    val ext = new GraftExtensions
    // builder-level smoke: applying the extension to a new session works
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]")
      .config("spark.ui.enabled", "false")
      .withExtensions(ext)
      .getOrCreate()
    // getOrCreate may return the existing session; register directly then
    GraftFunctions.register(s2)
    assert(s2.sql("SELECT size(graft_minhash_sig('abcdefgh', 4, 8, 1)) AS n")
      .collect().head.getInt(0) === 8)
  }

  test("ShingleHashesExpr / MinHashSigExpr compile under real codegen (no fallback)") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val input = BoundReference(0, StringType, nullable = true)
    // GenerateUnsafeProjection.generate THROWS on a janino compile error —
    // unlike whole-stage codegen, which silently falls back to interpreted
    // and would mask a broken doGenCode forever
    val proj = GenerateUnsafeProjection.generate(
      Seq(ShingleHashesExpr(input, 4), MinHashSigExpr(input, 4, 64, 42L)))
    val text = "the quick brown fox"
    val row = proj(InternalRow(UTF8String.fromString(text)))
    assert(row.getArray(0).toLongArray()
      .sameElements(TextHashes.shingleHashesSorted(text, 4)))
    assert(row.getArray(1).toLongArray()
      .sameElements(TextHashes.minHashSig(text, 4, 64, 42L)))
    // generated null path: a too-short doc nulls the signature, not the row
    val short = proj(InternalRow(UTF8String.fromString("ab")))
    assert(!short.isNullAt(0) && short.isNullAt(1))
    val nullIn = proj(InternalRow(null))
    assert(nullIn.isNullAt(0) && nullIn.isNullAt(1))
  }
}
