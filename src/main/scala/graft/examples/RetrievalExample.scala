package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusPipeline, Similarity, Tables, TextAnalysis}

/**
 * Retrieval-side tour of the graft operators — the curation queries a team
 * runs over an assembled corpus: hybrid lexical+semantic search, the
 * snapshot delta before reprocessing, typo mining over the vocabulary, and
 * quote detection via directed containment. (No analog in the reference —
 * this exercises the round-11 retrieval/diff surface.)
 *
 * Run: `sbt "runMain graft.examples.RetrievalExample [sfDir]"`
 * Default sfDir: /root/testdata/sf0.001.
 */
object RetrievalExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-retrieval")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("emb"))

    // 1. hybrid search: BM25 + cosine pools fused by reciprocal-rank fusion
    println("== hybrid search (RRF) ==")
    Similarity.hybridSearch(docs, emb, k = 5)
      .orderBy(col("query_id"), col("rnk")).show(20, truncate = false)

    // 2. snapshot diff: what changed since the last crawl — only added/
    //    changed ids need re-embedding and re-dedup downstream
    println("== snapshot diff (old = docs minus every 7th, 1 in 5 revised) ==")
    val old = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text", when(col("doc_id") % 5 === 0,
        concat(col("text"), lit(" [revised]"))).otherwise(col("text")))
    CorpusPipeline.snapshotDiff(old, docs)
      .groupBy("status").count().orderBy("status").show()

    // 3. typo mining: rare terms one edit from frequent vocabulary
    println("== fuzzy term join (SymSpell delete variants) ==")
    val vc = docs
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      .filter(length(col("term")) >= 3)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    TextAnalysis.fuzzyTermJoin(
      vc.filter(col("cnt") <= 2), vc.filter(col("cnt") >= 10))
      .orderBy(col("typo")).show(10, truncate = false)

    // 4. blocklist screening on token boundaries
    println("== blocklist filter ==")
    val phrases = CorpusPipeline.topBigramPhrases(docs, 3)
    println(s"blocklist: ${phrases.mkString(" | ")}")
    CorpusPipeline.blocklistFilter(docs, phrases)
      .orderBy(col("n_hits").desc, col("doc_id")).show(5)

    spark.stop()
  }
}
