package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass character-entropy counters for
 * [[graft.operators.TextAnalysis.textEntropy]].
 *
 * Shannon entropy of a document's codepoint distribution is the
 * low-entropy-gibberish signal (repeated padding, base64 walls, template
 * boilerplate score near the extremes; natural prose sits in a narrow
 * band) used alongside the Gopher repetition rules. Computing it from
 * Column primitives would need a per-doc distinct-char histogram —
 * an explode + two aggregations per row. This kernel counts codepoints in
 * one pass (dense 128-slot array for ASCII, sorted map spill for the
 * rest) and returns `(n_chars, distinct_chars, clogc)` where
 * `clogc = Σ c·ln(c)` over per-char counts c; the entropy arithmetic
 * `ln(n) − clogc/n` (and the DuckDB oracle mirroring it) stays in
 * Catalyst.
 *
 * Float-determinism contract: the only order-sensitive float operation is
 * the `Σ c·ln(c)` sum, and both engines accumulate it in ascending
 * codepoint order (here: array slot order then sorted spill keys; oracle:
 * `sum(... ORDER BY ch)` — UTF-8 byte order equals codepoint order). The
 * terms are `ln` of small exact integers, where Java's `Math.log` and
 * DuckDB's libm agree to the published 4-dp rounding.
 *
 * Characters are Unicode codepoints (surrogate pairs count once). The
 * oracle's `string_split(text, '')` splits grapheme clusters, which on
 * the ASCII corpus is the same segmentation; the suite pins the ASCII
 * parity and the codepoint contract separately.
 */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropy.Schema

  override def nullSafeEval(input: Any): Any =
    CharEntropy.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.CharEntropy.count($c.toString());")

  override def prettyName: String = "graft_char_entropy"
  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropy {

  val Schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false),
    StructField("clogc", DoubleType, nullable = false)))

  def count(s: String): InternalRow = {
    val ascii = new Array[Int](128)
    // non-ASCII spill: sorted map so the Σ c·ln(c) accumulation below
    // visits codepoints in ascending order (the float-determinism contract)
    var spill: java.util.TreeMap[Integer, Integer] = null
    var i = 0
    var n = 0
    val len = s.length
    while (i < len) {
      val cp = s.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (spill == null) spill = new java.util.TreeMap[Integer, Integer]()
        spill.merge(cp, 1, (a, b) => a + b)
      }
      n += 1
      i += Character.charCount(cp)
    }
    var distinct = 0
    var clogc = 0.0
    var cp = 0
    while (cp < 128) {
      val c = ascii(cp)
      if (c > 0) {
        distinct += 1
        clogc += c * Math.log(c.toDouble)
      }
      cp += 1
    }
    if (spill != null) {
      val it = spill.values().iterator()
      while (it.hasNext) {
        val c = it.next().intValue()
        distinct += 1
        clogc += c * Math.log(c.toDouble)
      }
    }
    InternalRow(n, distinct, clogc)
  }

  /** Column API: `entropy(text)` yields the counts struct. */
  def entropy(text: Column): Column = {
    import org.apache.spark.sql.graftshim.{ColumnShim => EU}
    EU.column(CharEntropyExpr(EU.expression(text)))
  }
}
