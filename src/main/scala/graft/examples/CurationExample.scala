package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Dedup, PageRank, Similarity, Sketches, Tables, TextAnalysis}

/**
 * Curation-side tour of the round-11 operators — the selection queries a
 * data team runs when deciding WHAT of an assembled corpus to train on:
 * entropy/length dashboards, frequent-substring screening, score-weighted
 * and budget-bound selection, quality-aware near-dup survivors, and the
 * embedding-side hygiene passes (outliers, hard negatives, similarity-graph
 * centrality). (No analog in the reference — this exercises the §2c
 * curation surface end to end.)
 *
 * Run: `sbt "runMain graft.examples.CurationExample [sfDir]"`
 * Default sfDir: /root/testdata/sf0.001.
 */
object CurationExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-curation")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)

    // 1. corpus dashboards: char entropy extremes, token-length histogram,
    //    language-ID confusion — the numbers selection thresholds come from
    println("== lowest/highest char entropy ==")
    val ent = TextAnalysis.textEntropy(spark, sfDir).cache()
    ent.orderBy(col("char_entropy").asc_nulls_last).show(3)
    ent.orderBy(col("char_entropy").desc_nulls_last).show(3)
    println("== token-length histogram (log2 buckets) ==")
    CorpusPipeline.lengthHistogram(docs).show()
    println("== language-ID confusion ==")
    TextAnalysis.langidConfusion(spark, sfDir).show(12)

    // 2. frequent substrings: exact heavy hitters over a domain too wide to
    //    groupBy at scale (Misra-Gries census -> exact re-count)
    println("== char-3-gram heavy hitters ==")
    Sketches.heavyHittersQuery(spark, sfDir).show(8, truncate = false)

    // 3. selection: keep-rate proportional to quality, then the best B
    //    tokens under a budget (no global sort — histogram cutoff)
    println("== score-weighted sample (expected keep rate = mean quality) ==")
    val sampled = CorpusPipeline.qualityWeightedSample(docs)
    println(s"kept ${sampled.count()} of ${docs.count()} docs")
    println("== budget select: best 5000 tokens ==")
    val selected = CorpusPipeline.budgetSelect(docs, budgetTokens = 5000L)
    selected.agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"),
      min("quality").as("min_quality")).show()

    // 4. near-dup survivors: keep the best-quality member per cluster, not
    //    whichever re-crawl got the smallest id
    println("== quality-aware near-dup survivors ==")
    Dedup.dedupMinhashBest(spark, sfDir).filter(!col("keep")).show(5)

    // 5. embedding hygiene: off-distribution outliers, contrastive hard
    //    negatives, similarity-graph centrality (boilerplate hubs)
    println("== embedding outliers (bottom decile per label) ==")
    Similarity.embeddingOutliers(spark, sfDir)
      .filter(col("is_outlier")).show(5)
    println("== hard negatives (top similar, different label) ==")
    Similarity.hardNegativesQuery(spark, sfDir).show(5)
    println("== pagerank over the 5-NN cosine graph: top hubs ==")
    PageRank.pageRankQuery(spark, sfDir)
      .orderBy(col("rank_ppm").desc).show(5)

    spark.stop()
  }
}
