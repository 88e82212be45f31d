package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Binned range join: pairs (a, b) with the same key and
 * 0 < b.ts - a.ts <= window. A naive `b.ts BETWEEN a.ts AND a.ts + w` join
 * has no equi-key for the time axis, so Spark plans it as a nested-loop
 * over each key group — quadratic in rows-per-key. Binning restores an
 * equi-join: rows land in floor(ts / window) bins, every qualifying b is
 * in a's bin or the next one, so `a` probes exactly two bins and an exact
 * residual filter keeps the semantics precise. Each qualifying pair
 * matches exactly once (the two probe bins are distinct), so no distinct
 * pass is needed.
 */
object RangeJoin {

  def pairsWithin(
      df: DataFrame, key: String, ts: String, idCol: String,
      windowMs: Long, payload: Seq[String] = Nil): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val wUs = windowMs * 1000L
    val binned = df.select(
      Seq(col(key), col(idCol), unix_micros(col(ts)).as("_us")) ++ payload.map(col): _*)
      // integral DIV, not floor(a/b): the double quotient of large epoch
      // micros can round across an integer boundary and misbin a row
      .withColumn("_bin", expr(s"_us DIV ${wUs}L"))
    val probe = binned.select(
      Seq(col(key), col(idCol).as("id_a"), col("_us").as("us_a")) ++
        payload.map(c => col(c).as(s"${c}_a")) :+
        explode(array(col("_bin"), col("_bin") + 1)).as("_bin"): _*)
    val build = binned.select(
      Seq(col(key), col(idCol).as("id_b"), col("_us").as("us_b"), col("_bin")) ++
        payload.map(c => col(c).as(s"${c}_b")): _*)
    probe.join(build, Seq(key, "_bin"))
      .filter(col("us_b") > col("us_a") && col("us_b") - col("us_a") <= wUs)
      .withColumn("gap_us", col("us_b") - col("us_a"))
      .drop("_bin", "us_a", "us_b")
  }

  /** Query entry (oracle-checked vs a plain SQL range join): event pairs of
    * the same user within 6 hours, oriented earlier→later. */
  def rangeJoinEvents(spark: SparkSession, dir: String): DataFrame =
    pairsWithin(Tables.events(spark, dir), "user_id", "ts", "event_id",
      windowMs = 6L * 3600 * 1000)
      .select(col("user_id"), col("id_a").as("event_a"), col("id_b").as("event_b"),
        col("gap_us"))
      .orderBy(col("event_a"), col("event_b"))
}
