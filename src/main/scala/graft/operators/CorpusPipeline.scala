package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus-assembly operators for LLM training-data pipelines: reproducible
 * stratified sampling, vocabulary statistics, and benchmark decontamination.
 * Complements [[Dedup]] (near-dup removal) and [[TextAnalysis]] (per-doc
 * signals) with the corpus-level steps between them.
 */
object CorpusPipeline {

  /**
   * Deterministic hash bucket in [0, 1000): Knuth multiplicative hash of the
   * id. NOT Spark's `hash`/`rand` — the bucket must be reproducible across
   * engines (the DuckDB oracle computes the same arithmetic), across runs,
   * and across cluster sizes, which is what makes a sampled corpus
   * re-derivable from the raw corpus + the config alone. Safe from Long
   * overflow for ids below ~3.4e9; the multiplier is 2^32 * golden-ratio
   * conjugate, so consecutive ids spread uniformly over buckets.
   */
  def sampleBucket(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(id * lit(2654435761L), lit(1000L))

  /**
   * Stratified sampling: per-language keep rates expressed as bucket
   * thresholds out of 1000 (en 500 = 50%, de 250 = 25%, default 100 = 10%
   * — the up/down-weighting step of corpus mixing). Pure scan-stage filter:
   * zero shuffle, no state, and the same rows survive on 1 executor or
   * 1000. At 100 TB this is the only sampling shape that re-runs
   * identically after a cluster resize.
   */
  def stratifiedSample(
      docs: DataFrame,
      thresholds: Map[String, Int] = Map("en" -> 500, "de" -> 250),
      defaultThreshold: Int = 100): DataFrame = {
    val threshold = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (lang, t)) => when(col("lang") === lang, lit(t)).otherwise(acc)
    }
    docs.filter(sampleBucket(col("doc_id")) < threshold)
  }

  def corpusSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"),
        sampleBucket(col("doc_id")).as("bucket"))
      .orderBy(col("doc_id"))

  /**
   * Top-k corpus vocabulary by token frequency (count desc, token asc —
   * total order, so the LIMIT cut is deterministic). The explode feeds a
   * hash aggregate with map-side partial rows, so the shuffle carries one
   * (token, partial-count) row per distinct token per task — vocabulary
   * cardinality, not corpus token count. TakeOrderedAndProject keeps the
   * final top-k on partial results; no global sort of the vocabulary.
   */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  def vocabTopk(spark: SparkSession, dir: String): DataFrame =
    vocabTopK(Tables.documents(spark, dir))

  /**
   * Benchmark decontamination: flag corpus documents sharing >= 1 char
   * 8-gram with any document of the benchmark set — the contamination
   * check every training corpus runs against its eval sets. The benchmark
   * side (tiny, by construction of eval suites) collapses to a DISTINCT
   * shingle-hash set that BROADCASTS; the corpus side explodes its
   * shingles straight into the broadcast hash semi-join in the SAME stage
   * — the exploded rows never hit an exchange, so at 100 TB the cost is
   * one corpus scan + a per-doc count aggregate over only the matching
   * shingles. Shingle hashes are the 64-bit avalanched FNV of
   * [[Dedup.shingleHashes]]; a cross-engine hash collision altering the
   * count has probability ~n²/2^64 (~1e-9 at 150k shingles).
   */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, gramN: Int = 8): DataFrame = {
    val benchShingles = benchmark
      .select(explode(Dedup.shingleHashes(col("text"), gramN)).as("sh"))
      .distinct()
    docs
      .select(col("doc_id"), explode(Dedup.shingleHashes(col("text"), gramN)).as("sh"))
      .join(broadcast(benchShingles), Seq("sh"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("shared_grams"))
  }

  /** Query entry: benchmark = every 97th document (a deterministic stand-in
    * for an eval set), corpus = the rest. */
  def corpusDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
      .orderBy(col("doc_id"))
  }
}
