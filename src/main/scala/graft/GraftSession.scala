package graft

import org.apache.spark.sql.SparkSession

/**
 * Opinionated SparkSession builder for graft workloads. Encodes the scale
 * knobs that matter at 100 TB so every deployment doesn't rediscover them:
 *
 *  - AQE on with skew-join handling and partition coalescing — runtime
 *    re-planning beats any static shuffle.partitions guess;
 *  - shuffle partitions default sized to cluster parallelism (caller
 *    overrides for real clusters: ~2-3× total executor cores, sized so a
 *    partition's shuffle block stays a few hundred MB);
 *  - 128 MB file-split target so scan tasks amortize parquet footer reads
 *    without starving parallelism;
 *  - graft's SQL functions registered;
 *  - nanosecond-parquet reads enabled (the events table needs it).
 */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session for tests/benchmarks. */
  def local(cores: Int, appName: String = "graft"): SparkSession = {
    val spark = builder(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
