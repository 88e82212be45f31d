package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, Tables}

/**
 * The index-once-query-forever lifecycle both persisted indexes share:
 * build on the historical corpus, reload in a "later" session, serve
 * incremental queries without touching history again. Demonstrates the
 * unified `IndexSidecar` contract — each index directory carries a
 * kind-checked `_graft_index.txt` with the parameters a reader must
 * match (hash family for MinHash, quantizer matrix for IVF), so loading
 * the wrong index fails loudly instead of joining garbage.
 *
 * Run: `sbt "runMain graft.examples.IndexLifecycleExample [sfDir]"`
 * Default sfDir: /root/testdata/sf0.001.
 */
object IndexLifecycleExample {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-index-lifecycle")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tmp = java.nio.file.Files.createTempDirectory("graft-index-example")

    // ---- MinHash signature index: history signed ONCE ----
    val docs = Tables.documents(spark, sfDir)
    val history = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val mhPath = tmp.resolve("minhash-index").toString
    Dedup.writeMinhashIndex(history, mhPath)
    val (sigs, (numHashes, shingleN, seed)) = Dedup.readMinhashIndex(spark, mhPath)
    println(s"minhash index: ${sigs.count()} signatures " +
      s"(numHashes=$numHashes shingleN=$shingleN seed=$seed)")
    // an arriving batch joins the persisted signatures — history is never
    // re-signed
    val dups = Dedup.crossNearDupsWithHistorySigs(
      batch, history, sigs, numHashes = numHashes, shingleN = shingleN, seed = seed)
    println(s"batch-vs-history near-dups: ${dups.count()}")

    // ---- IVF index: corpus partitioned by cell, probes prune files ----
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
    val ivfPath = tmp.resolve("ivf-index").toString
    // build from the first crawl, APPEND the second through the same
    // quantizer — the recurring-ingestion path (no rebuild)
    Similarity.writeIvfIndex(
      emb.filter(col("vec_id") % 2 === 0), ivfPath, numCentroids = 8, lloydIters = 1)
    Similarity.appendIvfIndex(spark, emb.filter(col("vec_id") % 2 =!= 0), ivfPath)
    val probes = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    val hits = Similarity.ivfTopKIndexed(spark, ivfPath, probes, k = 5, nprobe = 2)
    println(s"IVF top-5 over 2 probed cells (grown index): ${hits.count()} results")

    // ---- the sidecar refuses cross-kind reads ----
    try {
      Dedup.readMinhashIndex(spark, ivfPath)
      println("ERROR: cross-kind read was not rejected")
    } catch {
      case e: IllegalArgumentException =>
        println(s"cross-kind read rejected as expected: ${e.getMessage}")
    }

    graft.util.Fs.deleteRecursively(tmp)
    spark.stop()
  }
}
