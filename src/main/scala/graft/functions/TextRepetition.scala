package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass repetition counters for
 * [[graft.operators.TextAnalysis.textRepetition]].
 *
 * The Column formulation (array_sort + aggregate folds over tokens and
 * bigrams) interprets a lambda per array element per row — measured 1.7s
 * for a 5k-doc scan at sf0.1, ~8x the one-pass kernels. This kernel
 * counts token multiplicities in one tokenize pass + two hash maps and
 * returns the raw counts; the fraction arithmetic (and the DuckDB oracle
 * mirroring it) stays in Catalyst. The suite asserts kernel-vs-fold
 * equality field by field on the real corpus.
 *
 * Token parity contract (same as [[TextSignals]]): the token list is
 * split(lower(trim(text)), "\s+") EXACTLY — trim() strips ASCII spaces
 * only, and split keeps a phantom leading/trailing empty token when the
 * space-trimmed edge is a non-space \s char. Phantom tokens participate
 * in distinct/top-word/bigram counts just as they do in the fold and in
 * DuckDB's regexp_split_to_array.
 */
case class TextRepetitionExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = TextRepetition.Schema

  override def nullSafeEval(input: Any): Any =
    TextRepetition.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TextRepetition.count($c.toString());")

  override def prettyName: String = "graft_text_repetition"
  override protected def withNewChildInternal(newChild: Expression): TextRepetitionExpr =
    copy(child = newChild)
}

object TextRepetition {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_word", IntegerType, nullable = false),
    StructField("top_bigram", IntegerType, nullable = false)))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** lower() exactly as Spark computes it: ASCII strings take a byte-wise
    * A-Z map (UTF8String's full-ASCII fast path, allocation-free here when
    * nothing changes); anything else routes through UTF8String.toLowerCase
    * itself, so kernel-vs-fold parity holds whatever Spark's slow path does
    * on this JVM's default locale. Per-token Locale.ROOT lowering diverged
    * from lower() for non-full-ASCII docs on e.g. a Turkish-locale JVM. */
  private def lowerLikeSpark(t: String): String = {
    var i = 0
    var ascii = true
    var firstUpper = -1
    while (i < t.length && ascii) {
      val c = t.charAt(i)
      if (c >= 0x80) ascii = false
      else {
        if (firstUpper < 0 && c >= 'A' && c <= 'Z') firstUpper = i
        i += 1
      }
    }
    if (!ascii) UTF8String.fromString(t).toLowerCase.toString
    else if (firstUpper < 0) t
    else {
      val arr = t.toCharArray
      var k = firstUpper
      while (k < arr.length) {
        val c = arr(k)
        if (c >= 'A' && c <= 'Z') arr(k) = (c + 32).toChar
        k += 1
      }
      new String(arr)
    }
  }

  def count(sRaw: String): InternalRow = {
    // parity BY CONSTRUCTION: materialize lower(trim(text)) first and
    // tokenize the lowered string — the exact value the fold spec and the
    // DuckDB oracle split
    val nRaw = sRaw.length
    var b0 = 0
    var e0 = nRaw
    while (b0 < e0 && sRaw.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && sRaw.charAt(e0 - 1) == ' ') e0 -= 1
    val s = lowerLikeSpark(
      if (b0 == 0 && e0 == nRaw) sRaw else sRaw.substring(b0, e0))
    val n = s.length
    val toks = new java.util.ArrayList[String]()
    if (n > 0) {
      if (isWs(s.charAt(0))) toks.add("") // phantom leading "" token
      var start = 0
      while (start < n) {
        if (isWs(s.charAt(start))) start += 1
        else {
          var end = start
          while (end < n && !isWs(s.charAt(end))) end += 1
          toks.add(s.substring(start, end))
          start = end
        }
      }
      if (isWs(s.charAt(n - 1))) toks.add("") // phantom trailing "" token
    }
    val m = toks.size
    val words = new java.util.HashMap[String, Int]()
    val bigrams = new java.util.HashMap[String, Int]()
    var topWord = 0
    var topBigram = 0
    var i = 0
    while (i < m) {
      val t = toks.get(i)
      val c = words.merge(t, 1, (a, b) => a + b)
      if (c > topWord) topWord = c
      if (i > 0) {
        val bg = toks.get(i - 1) + " " + t
        val cb = bigrams.merge(bg, 1, (a, b) => a + b)
        if (cb > topBigram) topBigram = cb
      }
      i += 1
    }
    InternalRow(m, words.size, topWord, topBigram)
  }

  /** Column API: `repetition(text)` yields the counts struct. */
  def repetition(text: Column): Column = {
    import org.apache.spark.sql.graftshim.{ColumnShim => EU}
    EU.column(TextRepetitionExpr(EU.expression(text)))
  }
}
