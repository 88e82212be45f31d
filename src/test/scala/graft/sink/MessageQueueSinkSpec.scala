package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import graft.source.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class MessageQueueSinkSpec extends SparkSpec {

  private def freshRoot(): String = Files.createTempDirectory("graft-sink").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("category", StringType)))

  private def sampleDf(n: Int) = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"name$i", if (i % 2 == 0) "A" else "B"))
      .toDF("id", "name", "category")
  }

  test("write routes every row to one topic, numQueues queue files") {
    val root = freshRoot()
    val conv = new RowMessageConverter(schema, fieldDelimiter = ",", keyColumns = Seq("id"))
    MessageQueueSink.write(sampleDf(100), root,
      new DefaultTopicSelector[Map[String, Any]]("out"), conv, numQueues = 4)
    assert(TopicLog.listQueues(root, "out") === Seq(0, 1, 2, 3))
    val total = (0 until 4).map(q => TopicLog.maxOffset(root, "out", q)).sum
    assert(total === 100)
    val (_, m) = TopicLog.readRange(root, "out", 0, 0, 1).next()
    assert(m.body.split(",").length === 2) // id excluded (key), name+category remain
  }

  test("round-trip: sink then source returns the same rows") {
    val root = freshRoot()
    val conv = new RowMessageConverter(schema, fieldDelimiter = "\u0001",
      keyColumns = Seq("id"), writeKeysToBody = true)
    MessageQueueSink.write(sampleDf(50), root,
      new DefaultTopicSelector[Map[String, Any]]("rt"), conv, numQueues = 3)
    val back = spark.read.format("graft-mq")
      .option("topic", "rt").option("consumerGroup", "g").option("rootDir", root)
      .load()
      .select(split(col("body"), "\u0001").as("f"))
      .select(
        element_at(col("f"), 1).cast("long").as("id"),
        element_at(col("f"), 2).as("name"),
        element_at(col("f"), 3).as("category"))
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = sampleDf(50).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
  }

  test("SimpleTopicSelector splits rows across topics by field value") {
    val root = freshRoot()
    val conv = new RowMessageConverter(schema, fieldDelimiter = ",")
    MessageQueueSink.write(sampleDf(20), root,
      new SimpleTopicSelector("category", "default", "category", ""), conv, numQueues = 2)
    val aCount = TopicLog.listQueues(root, "A").map(q => TopicLog.maxOffset(root, "A", q)).sum
    val bCount = TopicLog.listQueues(root, "B").map(q => TopicLog.maxOffset(root, "B", q)).sum
    assert(aCount === 10 && bCount === 10)
  }

  test("dynamic tag column sets tag and can be excluded from body") {
    val conv = new RowMessageConverter(schema, fieldDelimiter = ",",
      isDynamicTag = true, dynamicTagColumn = "category", dynamicTagIncluded = false)
    val m = conv.convert(Row(1L, "n", "A"), bornTs = 5L)
    assert(m.tag === "A")
    assert(m.body === "1,n")
    val convIncl = new RowMessageConverter(schema, fieldDelimiter = ",",
      isDynamicTag = true, dynamicTagColumn = "category")
    assert(convIncl.convert(Row(1L, "n", "A"), 5L).body === "1,n,A")
  }

  test("key columns join with comma; property columns move to properties") {
    val conv = new RowMessageConverter(schema, fieldDelimiter = "|",
      keyColumns = Seq("id", "name"), propertyColumns = Seq("category"))
    val m = conv.convert(Row(7L, "x", "B"), bornTs = 1L)
    assert(m.key === "7,x")
    assert(m.properties === Map("category" -> "B"))
    assert(m.body === "") // id,name excluded as keys; category as property
  }

  test("bornTs column drives message time") {
    val s2 = StructType(schema.fields :+ StructField("ts", TimestampType))
    val conv = new RowMessageConverter(s2, fieldDelimiter = ",", bornTsColumn = "ts")
    val m = conv.convert(Row(1L, "a", "A", new java.sql.Timestamp(123456L)))
    assert(m.bornTs === 123456L)
  }

  test("unknown key column fails fast") {
    assertThrows[IllegalArgumentException] {
      new RowMessageConverter(schema, keyColumns = Seq("nope"))
    }
  }

  test("foreachBatch is idempotent: a replayed batchId appends nothing") {
    val root = freshRoot()
    val conv = new RowMessageConverter(schema, fieldDelimiter = ",")
    val fn = MessageQueueSink.foreachBatch(root,
      new DefaultTopicSelector[Map[String, Any]]("eo"), conv, numQueues = 2)
    val batch = sampleDf(10)
    fn(batch, 0L)
    val afterFirst = (0 until 2).map(q => TopicLog.maxOffset(root, "eo", q)).sum
    assert(afterFirst === 10)
    fn(batch, 0L) // crash-replay of the same micro-batch
    val afterReplay = (0 until 2).map(q => TopicLog.maxOffset(root, "eo", q)).sum
    assert(afterReplay === 10) // no duplicates
    fn(batch, 1L) // a genuinely new batch still lands
    assert((0 until 2).map(q => TopicLog.maxOffset(root, "eo", q)).sum === 20)
  }

  test("streaming pipeline: mq source -> foreachBatch sink with exactly-once replay") {
    import org.apache.spark.sql.streaming.Trigger
    val srcRoot = freshRoot()
    val dstRoot = freshRoot()
    graft.source.TopicLog.append(srcRoot, "in", 0,
      (0 until 6).iterator.map(i =>
        graft.source.Message(1000L * i.max(1), s"k$i", "t", Map.empty, s"$i,n$i,A")))
    val conv = new RowMessageConverter(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("body", org.apache.spark.sql.types.StringType))),
      fieldDelimiter = ",")
    val checkpoint = java.nio.file.Files.createTempDirectory("graft-eo-ckpt").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-mq")
        .option("topic", "in").option("consumerGroup", "g").option("rootDir", srcRoot)
        .option("offsetResetTo", "earliest").load()
        .select(col("body"))
        .writeStream
        .foreachBatch(MessageQueueSink.foreachBatch(dstRoot,
          new DefaultTopicSelector[Map[String, Any]]("out"), conv, numQueues = 1))
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    run()
    assert(TopicLog.maxOffset(dstRoot, "out", 0) === 6)
    run() // restart with no new data: nothing re-appended
    assert(TopicLog.maxOffset(dstRoot, "out", 0) === 6)
  }

  test("DSv2 write path: df.write.format(graft-mq) lands rows in queue logs") {
    val root = freshRoot()
    sampleDf(40).write.format("graft-mq")
      .option("topic", "dsv2").option("consumerGroup", "g").option("rootDir", root)
      .option("keyColumns", "id")
      .option("isDynamicTag", "true").option("dynamicTagColumn", "category")
      .option("dynamicTagColumnWriteIncluded", "false")
      .mode("append")
      .save()
    val queues = TopicLog.listQueues(root, "dsv2")
    assert(queues.nonEmpty)
    val total = queues.map(q => TopicLog.maxOffset(root, "dsv2", q)).sum
    assert(total === 40)
    val (_, m) = TopicLog.readRange(root, "dsv2", queues.head, 0, 1).next()
    assert(m.tag === "A" || m.tag === "B") // dynamic tag from category
    assert(m.key.nonEmpty) // id as message key
    assert(m.body.split("\u0001").length === 1) // only name remains in body
  }

  test("DSv2 write honors numQueues via required distribution") {
    val root = freshRoot()
    sampleDf(30).repartition(10).write.format("graft-mq")
      .option("topic", "nq").option("consumerGroup", "g").option("rootDir", root)
      .option("numQueues", "3").option("fieldDelimiter", ",")
      .mode("append").save()
    assert(TopicLog.listQueues(root, "nq") === Seq(0, 1, 2))
    assert((0 until 3).map(q => TopicLog.maxOffset(root, "nq", q)).sum === 30)
  }

  test("DSv2 write then graft-mq read round-trips") {
    val root = freshRoot()
    sampleDf(25).write.format("graft-mq")
      .option("topic", "rt2").option("consumerGroup", "g").option("rootDir", root)
      .option("fieldDelimiter", ",").option("writeKeysToBody", "true")
      .mode("append").save()
    val back = spark.read.format("graft-mq")
      .option("topic", "rt2").option("consumerGroup", "g").option("rootDir", root)
      .load()
      .select(split(col("body"), ",").as("f"))
      .select(element_at(col("f"), 1).cast("long").as("id"),
        element_at(col("f"), 2).as("name"),
        element_at(col("f"), 3).as("category"))
    val got = back.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val want = sampleDf(25).collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === want)
  }

  test("async flush mode appends per message (same data, more IO)") {
    val root = freshRoot()
    val conv = new RowMessageConverter(schema, fieldDelimiter = ",")
    MessageQueueSink.write(sampleDf(10), root,
      new DefaultTopicSelector[Map[String, Any]]("async"), conv,
      numQueues = 2, flushMode = FlushMode.Async)
    val total = (0 until 2).map(q => TopicLog.maxOffset(root, "async", q)).sum
    assert(total === 10)
  }
}
