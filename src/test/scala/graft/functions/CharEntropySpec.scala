package graft.functions

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class CharEntropySpec extends SparkSpec {

  /** Independent Scala reference: codepoint counts summed in ascending
    * codepoint order — the same float-determinism contract the kernel and
    * the DuckDB oracle publish, so doubles must match EXACTLY. */
  private def ref(s: String): (Int, Int, Double) = {
    val cps = s.codePoints().toArray
    val counts = cps.groupBy(identity).view.mapValues(_.length).toSeq.sortBy(_._1)
    val clogc = counts.foldLeft(0.0) { case (acc, (_, c)) => acc + c * math.log(c.toDouble) }
    (cps.length, counts.size, clogc)
  }

  test("kernel equals the sorted-order reference on the real corpus") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"), CharEntropy.entropy(col("text")).as("e"))
      .select(col("text"), col("e.n_chars"), col("e.distinct_chars"), col("e.clogc"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d, c) = ref(r.getString(0))
      assert(r.getInt(1) === n)
      assert(r.getInt(2) === d)
      assert(r.getDouble(3) === c) // bit-exact: same terms, same order
    }
  }

  test("codepoint contract: surrogate pairs count once; spill path sorted") {
    import spark.implicits._
    // 𝄞 (U+1D11E) is a surrogate pair; ü exercises the non-ASCII TreeMap
    // spill; 'a' the dense array — all three mixed forces the
    // array-then-spill ascending accumulation
    val s = "𝄞𝄞aü"
    val row = Seq(s).toDF("text").repartition(1)
      .select(CharEntropy.entropy(col("text")).as("e"))
      .select(col("e.n_chars"), col("e.distinct_chars"), col("e.clogc"))
      .head()
    assert(row.getInt(0) === 4)
    assert(row.getInt(1) === 3)
    val (_, _, c) = ref(s)
    assert(row.getDouble(2) === c)
  }

  test("empty text: zero counts, NULL entropy in the operator") {
    import spark.implicits._
    val row = Seq("").toDF("text").repartition(1)
      .select(CharEntropy.entropy(col("text")).as("e"))
      .select(col("e.n_chars"), col("e.distinct_chars"), col("e.clogc"))
      .head()
    assert(row.getInt(0) === 0 && row.getInt(1) === 0 && row.getDouble(2) === 0.0)
  }

  test("textEntropy entry: bounds hold and uniform-char docs score 0") {
    val out = TextAnalysis.textEntropy(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(1)
      val d = r.getLong(2)
      if (n > 0) {
        val h = r.getDouble(3)
        // 0 <= H <= ln(distinct) (within the published 4-dp rounding)
        assert(h >= -0.0001 && h <= math.log(d.toDouble) + 0.0001)
      } else assert(r.isNullAt(3))
    }
    // a uniform doc has exactly zero entropy
    import spark.implicits._
    val z = Seq(("aaaa", 1L)).toDF("text", "doc_id")
    val h = z.select(CharEntropy.entropy(col("text")).as("e"))
      .select(round(log(col("e.n_chars").cast("double")) - col("e.clogc") / col("e.n_chars"), 4))
      .head().getDouble(0)
    assert(h === 0.0)
  }
}
