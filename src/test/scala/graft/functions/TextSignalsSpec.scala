package graft.functions

import graft.SparkSpec
import graft.operators.{Tables, TextAnalysis => TA}
import org.apache.spark.sql.functions._

/**
 * The one-pass [[TextSignals]] kernel must agree field by field with the
 * Column-expression formulations it replaced (which stay in TextAnalysis as
 * the executable spec) — on the real corpus and on adversarial strings
 * (tabs, digits runs, mixed-language stopwords, CJK, empties).
 */
class TextSignalsSpec extends SparkSpec {

  private def signalsDf(df: org.apache.spark.sql.DataFrame) =
    df.select(col("text"),
      length(col("text")).cast("long").as("n_chars"),
      TextSignals.signals(col("text")).as("sig"))

  private lazy val corpus = Tables.documents(spark, sfDir).select("text")

  private lazy val nasty = {
    import spark.implicits._
    Seq(
      "",
      "   ",
      "the quick brown fox",
      "der und die das ist von", // german stopwords
      "le la et le 123 456abc78",
      "mixed the der le el und of", // multi-language hits
      "punct.,!?;:galore:??",
      "UPPER lower MiXeD 42",
      "中文文本带一些 ascii words the",
      "a  b   c    d", // runs of spaces
      "word",
      // whitespace-edge cases: Spark trim() strips spaces ONLY and split()
      // keeps leading/trailing empty tokens — phantom-token territory
      "word\n",
      "\tword",
      "\t",
      " \t leading space then tab",
      "tab\tseparated\ttokens\n",
      "emoji 😀 and 🚀go", // surrogate pairs
      "😀" // emoji only
    ).toDF("text")
  }

  private def check(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = signalsDf(df).select(
      col("sig.ws_tokens"), TA.tokenCount(col("text")),
      col("sig.bpe_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")),
      col("sig.punct"), regexp_count(col("text"), lit("[.,!?;:]")),
      col("sig.upper"), regexp_count(col("text"), lit("[A-Z]")),
      col("sig.alpha"), regexp_count(col("text"), lit("[A-Za-z]")),
      col("sig.cjk"), regexp_count(col("text"), lit("[\\u4e00-\\u9fff]")),
      col("sig.stop_en"), TA.stopwordHits(col("text"), TA.stopwordsEn),
      col("sig.stop_de"), TA.stopwordHits(col("text"), TA.stopwordsDe),
      col("sig.stop_fr"), TA.stopwordHits(col("text"), TA.stopwordsFr),
      col("sig.stop_es"), TA.stopwordHits(col("text"), TA.stopwordsEs),
      col("text")).collect()
    val names = Seq("ws_tokens", "bpe_tokens", "punct", "upper", "alpha",
      "cjk", "stop_en", "stop_de", "stop_fr", "stop_es")
    rows.foreach { r =>
      names.zipWithIndex.foreach { case (what, f) =>
        assert(r.getInt(2 * f) === r.getInt(2 * f + 1),
          s"$what diverges on: ${r.getString(20)}")
      }
    }
  }

  test("kernel equals the Column formulations on the real corpus") { check(corpus) }
  test("kernel equals the Column formulations on adversarial strings") { check(nasty) }

  test("query entries built on the kernel equal the Column-built originals") {
    val docs = Tables.documents(spark, sfDir)
    val fromKernel = TA.textQuality(spark, sfDir).collect().toSeq
    val fromColumns = docs
      .select(col("doc_id"), TA.qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(fromKernel === fromColumns)
    val langKernel = TA.textLangId(spark, sfDir).collect().toSeq
    val langColumns = docs
      .select(col("doc_id"), col("lang"), TA.langId(col("text")).as("pred_lang"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(langKernel === langColumns)
  }

  test("the signals struct evaluates once per row, not once per projected field") {
    val plan = TA.textStats(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.sliding("graft_text_signals".length).count(_ == "graft_text_signals") <= 1,
      s"kernel duplicated in plan:\n$plan")
  }
}
