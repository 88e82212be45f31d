package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DeserSpec extends SparkSpec {

  test("parseBodies turns delimited bodies into typed rows inside the scan stage") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType)))
    val df = Seq("1,a\n2,b", "3,c").toDF("body")
    val parsed = Deser.parseBodies(df, "body", schema, fieldDelimiter = ",")
    assert(parsed.collect().map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "a"), (2, "b"), (3, "c")))
    assert(!parsed.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("parseMessages resolves header fields from message properties") {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("topic", StringType),
      StructField("id", IntegerType),
      StructField("name", StringType)))
    val df = Seq(
      ("7,alice", Map("topic" -> "t1")),
      ("8,bob", Map("topic" -> "t2"))).toDF("body", "properties")
    val parsed = Deser.parseMessages(df, schema, headerFields = Set("topic"),
      fieldDelimiter = ",")
    assert(parsed.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet ===
      Set(("t1", 7, "alice"), ("t2", 8, "bob")))
  }

  test("parseMessages over a real graft-mq read") {
    val root = java.nio.file.Files.createTempDirectory("graft-deser-mq").toString
    graft.source.TopicLog.append(root, "pm", 0, Iterator(
      graft.source.Message(1000, "k", "t", Map("src" -> "q0"), "5|five"),
      graft.source.Message(2000, "k", "t", Map("src" -> "q0"), "6|six")))
    val mq = spark.read.format("graft-mq")
      .option("topic", "pm").option("consumerGroup", "g").option("rootDir", root).load()
    val schema = StructType(Seq(
      StructField("src", StringType),
      StructField("n", IntegerType),
      StructField("word", StringType)))
    val parsed = Deser.parseMessages(mq, schema, headerFields = Set("src"),
      fieldDelimiter = "|")
    assert(parsed.collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSet ===
      Set(("q0", 5, "five"), ("q0", 6, "six")))
  }
}
