package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of join: for every left row, attach the LATEST right row with the same
 * key and right.ts <= left.ts (time-series point-in-time lookup — the join
 * Spark has no native operator for).
 *
 * Implemented as union + running window, the formulation that scales: both
 * sides shuffle ONCE on the key and sort by (ts, side); a running
 * last-non-null carries each right row forward to every later left row.
 * Cost is one sort-merge-shaped pass — never a `l.ts >= r.ts` range join,
 * whose candidate set is quadratic in rows-per-key. Right rows at exactly
 * left.ts match (right sorts before left on the tie). The right side's
 * value columns travel as ONE struct, so a match is carried atomically
 * (null fields inside a matched row stay null, they are not papered over
 * by an older row).
 *
 * Requirements: both frames contain `key` and `ts`; other column names must
 * not collide across sides; at most one right row per (key, ts) if results
 * must be deterministic (equal-ts right rows tie arbitrarily).
 */
object AsOfJoin {

  def asof(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val leftOnly = left.columns.filter(c => c != key && c != ts)
    val rightOnly = right.columns.filter(c => c != key && c != ts)
    val collisions = leftOnly.toSet.intersect(rightOnly.toSet)
    require(collisions.isEmpty,
      s"asof: column names collide across sides: ${collisions.mkString(", ")}")

    val rType = StructType(rightOnly.map(c => right.schema(right.schema.fieldIndex(c))))
    val lSide = left.select(
      Seq(col(key), col(ts), lit(1).as("_side")) ++
        leftOnly.map(col) :+
        lit(null).cast(rType).as("_r"): _*)
    val rSide = right.select(
      Seq(col(key), col(ts), lit(0).as("_side")) ++
        leftOnly.map(c => lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c)) :+
        struct(rightOnly.map(col).toIndexedSeq: _*).as("_r"): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.union(rSide)
      .withColumn("_last_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        Seq(col(key), col(ts)) ++
          leftOnly.map(col) ++
          rightOnly.map(c => col("_last_r").getField(c).as(c)): _*)
  }

  /** Query entry (oracle-checked vs DuckDB's native ASOF JOIN): every
    * purchase event gets the same user's latest prior non-purchase event.
    * (user_id, ts) is unique in the events table, so the match is
    * deterministic.) */
  def asofJoinEvents(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"), col("value").as("purchase_value"))
    val others = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"),
        col("event_type").as("prior_type"), col("value").as("prior_value"))
    asof(purchases, others, "user_id", "ts")
      .orderBy(col("purchase_id"))
  }
}
