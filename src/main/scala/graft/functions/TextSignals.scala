package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass text signal counters for [[graft.operators.TextAnalysis]].
 *
 * The Column-expression formulations of text_stats/quality/langid/tokens
 * cost up to seven regex scans per row (five of them re-tokenizing the text
 * for each language's stopword filter — Catalyst's subexpression
 * elimination does not reach inside higher-order-function lambdas). This
 * kernel counts every signal in one character pass + one token pass and
 * returns them as a struct; ratios, rounding, score arithmetic, and the
 * langid decision chain stay in Catalyst, so the published semantics (and
 * the DuckDB oracles, which mirror that arithmetic) are untouched — the
 * suite asserts struct-vs-regex equality field by field on the real corpus.
 *
 * Parity contracts with the built-ins being replaced:
 *  - tokens = split on java-regex \s+ = runs of [ \t\n\x0B\f\r] of the
 *    TRIMMED text ("" yields zero tokens);
 *  - bpe tokens = regexp_count of [A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]:
 *    letter-runs and digit-runs count once, every other non-space char
 *    counts alone (leftmost-longest alternation order matters: a letter
 *    run is never split);
 *  - stopword hits compare the LOWERCASED token (ASCII lowercase — the
 *    lists are ASCII, and lower() only differs from toLowerCase on locale
 *    special cases no list word contains).
 */
case class TextSignalsExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = TextSignals.Schema

  override def nullSafeEval(input: Any): Any =
    TextSignals.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TextSignals.count($c.toString());")

  override def prettyName: String = "graft_text_signals"
  override protected def withNewChildInternal(newChild: Expression): TextSignalsExpr =
    copy(child = newChild)
}

object TextSignals {

  val Schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("bpe_tokens", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("upper", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("cjk", IntegerType, nullable = false),
    StructField("stop_en", IntegerType, nullable = false),
    StructField("stop_de", IntegerType, nullable = false),
    StructField("stop_fr", IntegerType, nullable = false),
    StructField("stop_es", IntegerType, nullable = false)))

  import graft.operators.TextAnalysis.{stopwordsDe, stopwordsEn, stopwordsEs, stopwordsFr}

  // one flat lookup: lowercase token -> bitmask of the lists containing it
  private val stopMask: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    def add(words: Seq[String], bit: Int): Unit =
      words.foreach(w => m.merge(w, 1 << bit, (a, b) => a | b))
    add(stopwordsEn, 0); add(stopwordsDe, 1); add(stopwordsFr, 2); add(stopwordsEs, 3)
    m
  }

  /** java-regex \s — deliberately NOT Character.isWhitespace (which
    * disagrees on the U+001C-001F separators). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  @inline private def isLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  @inline private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def count(s: String): InternalRow = {
    val n = s.length
    var punct = 0; var upper = 0; var alpha = 0; var cjk = 0
    var bpe = 0
    var i = 0
    var prevKind = 0 // 1 = letter run, 2 = digit run, 0 = neither
    while (i < n) {
      val c = s.charAt(i)
      // a surrogate PAIR is one code point to the regex spec: one symbol
      // match for [^A-Za-z0-9\s], not two
      if (Character.isHighSurrogate(c) && i + 1 < n &&
        Character.isLowSurrogate(s.charAt(i + 1))) {
        bpe += 1
        prevKind = 0
        i += 2
      } else {
        if (c == '.' || c == ',' || c == '!' || c == '?' || c == ';' || c == ':') punct += 1
        if (c >= 'A' && c <= 'Z') upper += 1
        if (isLetter(c)) alpha += 1
        if (c >= '\u4e00' && c <= '\u9fff') cjk += 1
        val kind = if (isLetter(c)) 1 else if (isDigit(c)) 2 else 0
        if (kind != 0) { if (kind != prevKind) bpe += 1 }
        else if (!isWs(c)) bpe += 1
        prevKind = kind
        i += 1
      }
    }
    // Token pass replicating size(split(lower(trim(text)), "\s+")) exactly:
    // Spark trim() strips ASCII SPACES only, and split() with its default
    // limit -1 KEEPS leading and trailing empty tokens \u2014 so text whose
    // space-trimmed edges are other \s chars (tab, newline) counts one
    // phantom empty token per such edge. Real tokens are the non-\s runs.
    var wsTokens = 0
    var stopEn = 0; var stopDe = 0; var stopFr = 0; var stopEs = 0
    var b0 = 0
    var e0 = n
    while (b0 < e0 && s.charAt(b0) == ' ') b0 += 1
    while (e0 > b0 && s.charAt(e0 - 1) == ' ') e0 -= 1
    if (e0 > b0) {
      if (isWs(s.charAt(b0))) wsTokens += 1 // phantom leading "" token
      if (isWs(s.charAt(e0 - 1))) wsTokens += 1 // phantom trailing "" token
      var start = b0
      while (start < e0) {
        if (isWs(s.charAt(start))) start += 1
        else {
          var end = start
          while (end < e0 && !isWs(s.charAt(end))) end += 1
          wsTokens += 1
          val tok = s.substring(start, end).toLowerCase(java.util.Locale.ROOT)
          val mask = stopMask.getOrDefault(tok, 0)
          if (mask != 0) {
            if ((mask & 1) != 0) stopEn += 1
            if ((mask & 2) != 0) stopDe += 1
            if ((mask & 4) != 0) stopFr += 1
            if ((mask & 8) != 0) stopEs += 1
          }
          start = end
        }
      }
    }
    InternalRow(n, wsTokens, bpe, punct, upper, alpha, cjk,
      stopEn, stopDe, stopFr, stopEs)
  }

  /** Column API: `signals(text)` yields the struct; project fields with
    * `.getField(...)`. */
  def signals(text: Column): Column = {
    import org.apache.spark.sql.graftshim.{ColumnShim => EU}
    EU.column(TextSignalsExpr(EU.expression(text)))
  }
}
