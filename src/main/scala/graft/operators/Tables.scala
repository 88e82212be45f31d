package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the TPC-H-ish test star schema. */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
    * parquet reader rejects. Read nanos as long and convert to a microsecond
    * timestamp (matches DuckDB, whose TIMESTAMP is also µs-precision). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      // integer DIV: ns→µs on int64 (a double division here loses 1µs ulps)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** The approximate-operator entries carry eager in-query recall
    * assertions (extra Spark jobs) for the correctness gate. The bench main
    * disables them via this flag so timings measure the operator, not the
    * harness check. */
  private[graft] def eagerAssertionsEnabled: Boolean =
    !sys.props.get("graft.bench").contains("1")
}
