package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("binned range join finds exactly the in-window pairs, each once") {
    import spark.implicits._
    // window 1000ms; bins are [0,1000), [1000,2000), ...
    val df = Seq(
      (1L, 10L, ts(100)),
      (1L, 11L, ts(900)),   // same bin as 10, gap 800 → pair
      (1L, 12L, ts(1050)),  // next bin: pairs with 10 (950) and 11 (150)
      (1L, 13L, ts(2500)),  // gap to 12 is 1450 → out of window
      (2L, 20L, ts(950)),
      (2L, 21L, ts(1950))   // cross-bin pair, gap exactly 1000 → included
    ).toDF("user_id", "event_id", "ts")
    val got = RangeJoin.pairsWithin(df, "user_id", "ts", "event_id", windowMs = 1000)
      .select("id_a", "id_b", "gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(
      (10L, 11L, 800000L),
      (10L, 12L, 950000L),
      (11L, 12L, 150000L),
      (20L, 21L, 1000000L)))
  }

  test("plan is an equi-join on (key, bin) — no nested loop over key groups") {
    val plan = RangeJoin.rangeJoinEvents(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
  }

  test("payload columns travel with both sides") {
    import spark.implicits._
    val df = Seq((1L, 1L, ts(10), "x"), (1L, 2L, ts(20), "y"))
      .toDF("user_id", "event_id", "ts", "tag")
    val row = RangeJoin.pairsWithin(df, "user_id", "ts", "event_id",
      windowMs = 1000, payload = Seq("tag")).collect().head
    assert(row.getAs[String]("tag_a") === "x")
    assert(row.getAs[String]("tag_b") === "y")
  }
}
