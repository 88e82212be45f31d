package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketedSpec extends SparkSpec {

  test("bucketed join runs with zero exchange on either side") {
    // managed tables land in the session's default warehouse; DROP TABLE in
    // the finally block removes their data (warehouse.dir is static conf)
    // keep the join a sort-merge so the exchange-free property is visible
    // (a broadcast join would trivially have no shuffle)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val lineitem = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      Bucketed.writeBucketed(orders, "b_orders", "o_orderkey", 8)
      Bucketed.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8)

      val joined = Bucketed.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")

      // and it computes the same thing as the plain join
      val expected = orders.join(lineitem, "o_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE IF EXISTS ${Bucketed.scopedName("b_orders")}")
      spark.sql(s"DROP TABLE IF EXISTS ${Bucketed.scopedName("b_lineitem")}")
    }
  }
}
