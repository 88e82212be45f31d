package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for LLM training-data pipelines.
 *
 * Exact dedup is a hash-groupBy (map-side partial agg, single shuffle on the
 * content hash). Near-dup variants (MinHash-LSH, SimHash, n-gram Jaccard)
 * generate candidates via band/bucket equi-joins — never an all-pairs cross
 * join — so they scale with duplicate density, not corpus size squared.
 */
object Dedup {

  /** Exact dedup: one row per distinct content hash, keeping the smallest id. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    exact(Tables.documents(spark, dir)).orderBy(col("text_hash"))
}
