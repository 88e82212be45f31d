package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("asof attaches the latest right row at or before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "l-a"), // before any right row → null match
      (1L, ts(250), "l-b"), // matches r@200
      (1L, ts(300), "l-c"), // right at EXACTLY 300 matches (<=)
      (2L, ts(500), "l-d")  // other key: matches its own r@450, not key 1's
    ).toDF("user_id", "ts", "l_tag")
    val right = Seq(
      (1L, ts(200), "r-early", 1.0),
      (1L, ts(300), "r-exact", 2.0),
      (1L, ts(400), "r-late", 3.0), // after every left row → never matched
      (2L, ts(450), "r-other", 4.0)
    ).toDF("user_id", "ts", "r_tag", "r_value")

    val got = AsOfJoin.asof(left, right, "user_id", "ts")
      .orderBy("user_id", "ts")
      .select("l_tag", "r_tag", "r_value")
      .collect().map(r => (r.getString(0), r.getString(1), if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    assert(got.toSeq === Seq(
      ("l-a", null, -1.0),
      ("l-b", "r-early", 1.0),
      ("l-c", "r-exact", 2.0),
      ("l-d", "r-other", 4.0)))
  }

  test("a matched right row carries null fields atomically (no paper-over)") {
    import spark.implicits._
    val left = Seq((1L, ts(300), "l")).toDF("user_id", "ts", "l_tag")
    val right = Seq(
      (1L, ts(100), Some("old"), Some(1.0)),
      (1L, ts(200), None: Option[String], None: Option[Double]) // latest row, null fields
    ).toDF("user_id", "ts", "r_tag", "r_value")
    val row = AsOfJoin.asof(left, right, "user_id", "ts").collect().head
    // the ts=200 row matched; its null fields must NOT fall back to ts=100's
    assert(row.isNullAt(row.fieldIndex("r_tag")))
    assert(row.isNullAt(row.fieldIndex("r_value")))
  }

  test("plan is one shuffle + window — no range join, no cartesian") {
    val events = Tables.events(spark, sfDir)
    val l = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("pid"))
    val r = events.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts"), col("value").as("pv"))
    val plan = AsOfJoin.asof(l, r, "user_id", "ts").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range-join blowup in plan:\n$plan")
    assert(plan.contains("Window"), s"expected window formulation:\n$plan")
  }

  test("column collisions across sides are rejected loudly") {
    import spark.implicits._
    val l = Seq((1L, ts(1), "x")).toDF("k", "ts", "dup")
    val r = Seq((1L, ts(1), "y")).toDF("k", "ts", "dup")
    val e = intercept[IllegalArgumentException](AsOfJoin.asof(l, r, "k", "ts"))
    assert(e.getMessage.contains("dup"))
  }
}
