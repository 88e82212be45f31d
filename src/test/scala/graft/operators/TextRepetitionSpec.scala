package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Repetition signals: planted-document arithmetic plus an equivalence check
  * of the zero-shuffle fold kernel against a naive explode/groupBy
  * formulation over the real corpus. */
class TextRepetitionSpec extends SparkSpec {

  /** Write planted docs as a documents.parquet table so the query entry
    * (which reads a table dir) sees them. */
  private def plantedDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("web"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("planted documents produce the expected fractions") {
    val dir = plantedDir(Seq(
      1L -> "a a a b", // dup 1-2/4, top word 3/4, bigrams [a a, a a, a b] -> 2/3
      2L -> "x y z w", // all distinct
      3L -> "", // empty: all NULL
      4L -> "hello")) // single token: no bigram
    val out = TextAnalysis.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4))).toMap
    assert(out(1L) === ((4L, 0.5, 0.75, 0.6667)))
    assert(out(2L) === ((4L, 0.0, 0.25, 0.3333)))
    assert(out(3L) === ((0L, null, null, null)))
    assert(out(4L) === ((1L, 0.0, 1.0, null)))
  }

  test("one-pass kernel matches the fold-formulation spec on the real corpus") {
    val kernel = TextAnalysis.textRepetition(spark, sfDir)
    val fold = TextAnalysis.textRepetitionFold(spark, sfDir)
    assert(kernel.exceptAll(fold).count() === 0)
    assert(fold.exceptAll(kernel).count() === 0)
  }

  test("kernel handles phantom empty tokens like split does") {
    val dir = plantedDir(Seq(
      10L -> "\tfoo bar\n", // non-space \s edges -> phantom "" tokens
      11L -> "\t\n", // only \s chars -> two phantom "" tokens
      12L -> "  padded  ")) // ASCII-space edges trim clean
    val kernel = TextAnalysis.textRepetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fold = TextAnalysis.textRepetitionFold(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel === fold)
    assert(kernel(10L) === 4L) // "", foo, bar, ""
    assert(kernel(11L) === 2L)
    assert(kernel(12L) === 1L)
  }

  test("fold kernel matches explode/groupBy formulation on the real corpus") {
    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val wordCounts = toks.groupBy("doc_id", "tok").count()
    val naiveWords = wordCounts.groupBy("doc_id").agg(
      sum("count").as("n"), countDistinct("tok").as("nd"), max("count").as("top"))
      .select(col("doc_id"),
        col("n").as("n_tokens"),
        round(lit(1.0) - col("nd").cast("double") / col("n"), 4).as("dup_word_frac"),
        round(col("top").cast("double") / col("n"), 4).as("top_word_frac"))
    val fold = TextAnalysis.textRepetition(spark, sfDir)
      .select("doc_id", "n_tokens", "dup_word_frac", "top_word_frac")
    assert(fold.exceptAll(naiveWords).count() === 0)
    assert(naiveWords.exceptAll(fold).count() === 0)
  }

  test("repetition stays a scan-stage plan: no shuffle exchange") {
    val plan = TextAnalysis.textRepetition(spark, sfDir)
      .queryExecution.executedPlan.toString
    // the only exchange allowed is the rangepartitioning of the final sort
    assert(!plan.contains("hashpartitioning"), s"shuffle in scan-stage signals:\n$plan")
  }
}
