package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Dedup, Tables}

/**
 * End-to-end LLM training-corpus assembly over the graft operators — the
 * pipeline a user of the library chains in production, run on the local
 * testdata: near-dup keep decisions -> per-language quality gate ->
 * domain mixing -> token-budget sequence packing, with stage-by-stage
 * survivor counts. (No analog in the reference — this exercises the
 * LLM-data-pipeline surface graft adds beyond the connector.)
 *
 * Run: `sbt "runMain graft.examples.CorpusPipelineExample [sfDir]"`
 * Default sfDir: /root/testdata/sf0.001.
 */
object CorpusPipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-corpus-pipeline")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. drop near-duplicates (MinHash-LSH candidates, exact-Jaccard
    //    verified, connected components keep the cluster minimum; docs in
    //    no pair never appear in the decisions and survive the anti-join)
    // cache each surviving stage: every count below (and the final packing)
    // would otherwise re-run the whole upstream chain — the LSH verify
    // pipeline is the expensive part and must execute once
    val drop = Dedup.nearDupKeepDecisions(
      Dedup.minHashNearDupsVerified(docs, threshold = 0.7))
      .filter(!col("keep")).select("doc_id")
    val deduped = docs.join(drop, Seq("doc_id"), "left_anti").cache()
    val nDeduped = deduped.count()

    // 2. per-language median quality gate
    val quality = CorpusPipeline.qualityFilter(deduped).select("doc_id")
    val filtered = deduped.join(quality, Seq("doc_id"), "left_semi").cache()
    val nFiltered = filtered.count()

    // 3. mix to target domain shares (src0-src4 up-weighted 3x)
    val mixed = filtered.join(
      CorpusPipeline.domainMix(filtered, (0 to 4).map(i => s"src$i" -> 3.0).toMap)
        .select("doc_id"), Seq("doc_id"), "left_semi").cache()
    val nMixed = mixed.count()

    // 4. pack into 2048-token training sequences
    val packed = CorpusPipeline.packSequences(mixed)
    val nSeqs = packed.agg(countDistinct(col("source"), col("seq_id"))).head().getLong(0)

    println(s"corpus:   $total docs")
    println(s"deduped:  $nDeduped docs")
    println(s"quality:  $nFiltered docs")
    println(s"mixed:    $nMixed docs")
    println(s"packed:   $nSeqs sequences of <= 2048 tokens")
    spark.stop()
  }
}
