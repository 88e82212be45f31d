package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search over `Array[Float]` columns.
 *
 * `bruteForceTopK` is the exact baseline: the (small) probe set is broadcast,
 * so the big side streams through a broadcast join — one scan, no shuffle of
 * the corpus, no cartesian materialization.
 *
 * `CosineLSH` (random-hyperplane signatures) is the 100 TB scale path:
 * vectors that share a bucket in any of `numTables` tables become join
 * candidates, so cost is (bucket density × tables), not corpus².
 * Hyperplanes are derived from a fixed seed and inlined as literal arrays —
 * broadcast into codegen, no side table.
 */
object Similarity {

  /** Dot product of two double arrays as a Column fold (small/one-off use;
    * the hot path goes through the fused [[cosine]] kernel). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Fused dot+norms kernel; accepts float or double arrays directly. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.cosineSim(a, b)

  private def asDouble(emb: Column): Column = transform(emb, _.cast("double"))

  /**
   * Exact top-k cosine neighbors for each probe vector.
   *
   * @param probes DataFrame with (query_id, q_emb double[]) — must be small;
   *               it is broadcast to every task.
   */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
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

  // ---- random-hyperplane LSH ----

  /** Deterministic pseudo-gaussian hyperplanes (sum of 4 uniforms, seeded). */
  private[operators] def hyperplanes(
      numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var state = seed
    def nextUniform(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
    Array.fill(numPlanes)(Array.fill(dim)(
      nextUniform() + nextUniform() + nextUniform() + nextUniform()))
  }

  /** Sign-pattern bucket id of `emb` for one table's planes — a single
    * kernel pass over all planes ([[graft.functions.HyperplaneBucketExpr]];
    * per-plane Column folds would blow the codegen tree past the JVM method
    * limit at realistic dimensions). */
  private def bucketKey(emb: Column, planes: Array[Array[Double]]): Column =
    graft.functions.GraftFunctions.hyperplaneBucket(emb, planes)

  /** (srcCols*, table, bucket) — one row per vector per table. */
  def lshBuckets(
      df: DataFrame, embCol: String, dim: Int,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L): DataFrame = {
    val tables = (0 until numTables).map { t =>
      struct(lit(t).as("table"),
        bucketKey(col(embCol), hyperplanes(bitsPerTable, dim, seed + t * 1000L)).as("bucket"))
    }
    df.select(col("*"), explode(array(tables: _*)).as("tb"))
      .select(col("*"), col("tb.table"), col("tb.bucket")).drop("tb")
  }

  /**
   * Approximate top-k: candidates = corpus vectors sharing any (table,
   * bucket) with the probe; exact cosine on candidates only. Probes are
   * broadcast — the corpus streams once through the bucket equi-join.
   */
  def lshTopK(
      corpus: DataFrame, probes: DataFrame, dim: Int, k: Int,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L): DataFrame = {
    val corpusBuckets = lshBuckets(corpus.select("vec_id", "emb"), "emb",
      dim, numTables, bitsPerTable, seed)
      .select("vec_id", "table", "bucket")
    val probeBuckets = lshBuckets(probes, "q_emb", dim, numTables, bitsPerTable, seed)
      .select("query_id", "table", "bucket")
    // candidate ids only through the bucket join; vectors re-attach once per
    // distinct candidate (corpus by equi-join, probes by broadcast).
    val candidates = corpusBuckets
      .join(broadcast(probeBuckets), Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    candidates
      .join(corpus.select("vec_id", "emb"), "vec_id")
      .join(broadcast(probes), "query_id")
      .withColumn("sim", round(cosine(col("emb"), col("q_emb")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Query entry (rows-only): LSH top-10 for the first 5 vectors. The test
    * embeddings have weak neighbors (cosine ≈ 0.25-0.4, i.e. angles near
    * 70°), so recall needs few bits and many tables; with strong near-dup
    * similarity (0.9+) the right trade is the reverse — more bits, fewer
    * tables, smaller buckets. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val dim = emb.select(size(col("emb"))).head().getInt(0)
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    lshTopK(emb, probes, dim, 10, numTables = 16, bitsPerTable = 4)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  // ---- IVF (inverted file) ----

  /**
   * Deterministic coarse quantizer: the K corpus vectors with the smallest
   * id-hash become centroids (cheap, reproducible; a Lloyd refinement is a
   * groupBy away but the sampled quantizer already gives balanced cells on
   * real embedding distributions).
   */
  def sampleCentroids(corpus: DataFrame, k: Int): Array[(Int, Array[Double])] =
    corpus.select(col("vec_id"), col("emb"))
      .orderBy(xxhash64(col("vec_id")))
      .limit(k)
      .collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Double](1).toArray }

  /** Columns of per-centroid cosine, sorted ascending by sim as structs. */
  private def centroidSims(emb: Column, centroids: Array[(Int, Array[Double])]): Column =
    array_sort(array(centroids.map { case (cid, c) =>
      struct(
        graft.functions.GraftFunctions.cosineSim(emb, array(c.map(lit): _*)).as("sim"),
        lit(cid).as("cid"))
    }: _*))

  /** Assign every vector to its nearest centroid cell. */
  def assignCells(df: DataFrame, embCol: String,
                  centroids: Array[(Int, Array[Double])]): DataFrame =
    df.withColumn("centroid_id",
      element_at(centroidSims(col(embCol), centroids), -1).getField("cid"))

  /**
   * IVF-flat top-k: vectors live in centroid cells; each probe searches only
   * its `nprobe` nearest cells (equi-join on centroid_id, probes broadcast).
   * The complementary scale path to [[lshTopK]] — cost is corpus/K × nprobe
   * per probe instead of bucket-collision driven, and the index is one
   * assignment pass that any number of queries reuses.
   */
  def ivfTopK(
      corpus: DataFrame, probes: DataFrame, k: Int,
      numCentroids: Int = 16, nprobe: Int = 8): DataFrame = {
    val centroids = sampleCentroids(corpus, numCentroids)
    // a tiny corpus can yield fewer centroids than requested; an unclamped
    // nprobe would make slice() return an empty array and silently drop
    // every probe
    val probeN = math.min(nprobe, centroids.length)
    val indexed = assignCells(corpus.select("vec_id", "emb"), "emb", centroids)
    val probeCells = probes
      .withColumn("cell",
        explode(transform(
          slice(centroidSims(col("q_emb"), centroids), -probeN, probeN),
          s => s.getField("cid"))))
      .select(col("query_id"), col("q_emb"), col("cell").as("centroid_id"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
    indexed.join(broadcast(probeCells), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("emb"), col("q_emb")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"))
  }

  /** Query entry (rows-only): IVF top-10 for the first 5 vectors. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val probes = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
    ivfTopK(emb, probes, 10)
      .orderBy(col("query_id"), col("sim").desc, col("neighbor_id"))
  }

  /**
   * Embedding-cosine near-duplicate pairs: bucket self-join (same table,
   * same bucket), exact cosine verify, distinct pairs. No cross join — the
   * shuffle key is the bucket id.
   */
  def embeddingNearDups(
      corpus: DataFrame, dim: Int, threshold: Double = 0.95,
      numTables: Int = 8, bitsPerTable: Int = 12, seed: Long = 42L): DataFrame = {
    val buckets = lshBuckets(corpus, "emb", dim, numTables, bitsPerTable, seed)
      .select(col("vec_id"), col("table"), col("bucket"))
    // candidate ids first (cheap distinct on two longs), embeddings joined
    // back once per surviving pair — never shuffle vectors through the
    // bucket join or deduplicate on array columns.
    val candidates = buckets.select(col("vec_id").as("vec_a"), col("table"), col("bucket"))
      .join(buckets.select(col("vec_id").as("vec_b"), col("table"), col("bucket")),
        Seq("table", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    candidates
      .join(corpus.select(col("vec_id").as("vec_a"), col("emb").as("emb_a")), "vec_a")
      .join(corpus.select(col("vec_id").as("vec_b"), col("emb").as("emb_b")), "vec_b")
      .withColumn("sim", round(cosine(col("emb_a"), col("emb_b")), 4))
      .filter(col("sim") >= threshold)
      .select("vec_a", "vec_b", "sim")
  }

  /** Query entry (rows-only): near-pairs at cosine >= 0.3 (the synthetic
    * embeddings top out near 0.4, so 0.3 exercises the verify path with a
    * non-empty result). */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val dim = emb.select(size(col("emb"))).head().getInt(0)
    embeddingNearDups(emb, dim, threshold = 0.3, numTables = 8, bitsPerTable = 6)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
