package graft.source

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Consumer-group offset commits, DSv2 custom metrics, and the
  * msgDelayLevel write option. */
class ConnectorSurfaceSpec extends SparkSpec {

  private def freshRoot(): String = Files.createTempDirectory("graft-surface").toString

  private def seed(root: String, topic: String, queues: Int, perQueue: Int): Unit =
    (0 until queues).foreach { q =>
      TopicLog.append(root, topic, q,
        (0 until perQueue).iterator.map { i =>
          Message(1000L * (i + 1), s"k$q-$i", if (i % 2 == 0) "even" else "odd",
            Map.empty, s"body-$q-$i")
        })
    }

  test("streaming commit persists consumer-group offsets; lag is observable") {
    val root = freshRoot()
    seed(root, "oc", queues = 2, perQueue = 5)
    assert(OffsetStore.committedOffsets(root, "oc", "g1") === Map.empty)
    assert(OffsetStore.consumerLag(root, "oc", "g1") === Map(0 -> 5L, 1 -> 5L))

    val ckpt = Files.createTempDirectory("graft-oc-ckpt").toString
    val q = spark.readStream.format("graft-mq")
      .option("topic", "oc").option("consumerGroup", "g1").option("rootDir", root)
      .option("offsetResetTo", "earliest")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(OffsetStore.committedOffsets(root, "oc", "g1") === Map(0 -> 5L, 1 -> 5L))
    assert(OffsetStore.consumerLag(root, "oc", "g1") === Map(0 -> 0L, 1 -> 0L))

    // more messages arrive; a restarted stream drains them and the committed
    // offsets advance past the first batch's
    seed(root, "oc", queues = 2, perQueue = 3) // appends 3 more per queue
    assert(OffsetStore.consumerLag(root, "oc", "g1") === Map(0 -> 3L, 1 -> 3L))
    val q2 = spark.readStream.format("graft-mq")
      .option("topic", "oc").option("consumerGroup", "g1").option("rootDir", root)
      .option("offsetResetTo", "earliest")
      .load()
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    assert(OffsetStore.committedOffsets(root, "oc", "g1") === Map(0 -> 8L, 1 -> 8L))
    assert(OffsetStore.consumerLag(root, "oc", "g1") === Map(0 -> 0L, 1 -> 0L))
  }

  test("a queue created after the first run is discovered and drained from 0") {
    // the micro-batch stream re-lists queues on every latestOffset() tick,
    // so new queues join the scan with start offset 0 — the Spark shape of
    // the reference's partitionDiscoveryIntervalMs rediscovery
    val root = freshRoot()
    seed(root, "qd", queues = 2, perQueue = 4)
    val ckpt = Files.createTempDirectory("graft-qd-ckpt").toString
    val out = Files.createTempDirectory("graft-qd-out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft-mq")
        .option("topic", "qd").option("consumerGroup", "g").option("rootDir", root)
        .option("offsetResetTo", "earliest")
        .load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 8)
    // a third queue appears with its own messages
    TopicLog.append(root, "qd", 2,
      (0 until 6).iterator.map(i => Message(7000L + i, s"k2-$i", "even", Map.empty, s"late-$i")))
    drain()
    val byQueue = spark.read.parquet(out).groupBy("queue_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byQueue === Map(0 -> 4L, 1 -> 4L, 2 -> 6L))
  }

  test("SQL DDL surface: CREATE TABLE USING graft-mq, SELECT and INSERT INTO") {
    // the Spark analog of the reference's table factories
    // (source/table/RocketMQDynamicTableSourceFactory.java): declare the
    // connector in DDL, then read and write it with plain SQL
    val root = freshRoot()
    seed(root, "ddl", queues = 2, perQueue = 3)
    spark.sql(
      s"""CREATE TABLE graft_ddl USING `graft-mq` OPTIONS (
         | topic 'ddl', consumerGroup 'g', rootDir '$root')""".stripMargin)
    try {
      assert(spark.sql("SELECT count(*) FROM graft_ddl").head().getLong(0) === 6)
      assert(spark.sql(
        "SELECT body FROM graft_ddl WHERE tag = 'even' AND queue_id = 1 AND offset = 0")
        .head().getString(0) === "body-1-0")
      spark.sql(
        """INSERT INTO graft_ddl
          |SELECT 'ddl' AS topic, 0 AS queue_id, 99 AS offset,
          | TIMESTAMP '2024-01-01 00:00:00' AS born_ts,
          | 'k-new' AS msg_key, 'odd' AS tag,
          | map('p', 'x') AS properties, 'inserted-via-sql' AS body""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM graft_ddl").head().getLong(0) === 7)
      assert(spark.sql("SELECT body FROM graft_ddl WHERE msg_key = 'k-new'")
        .head().getString(0).contains("inserted-via-sql"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_ddl")
  }

  test("queue-to-queue streaming: readStream + writeStream both on graft-mq") {
    // the reference's whole deployment shape — consume one topic, produce
    // another — as a native DSv2 stream on both ends
    val root = freshRoot()
    seed(root, "src", queues = 2, perQueue = 5)
    val ckpt = Files.createTempDirectory("graft-q2q-ckpt").toString
    val q = spark.readStream.format("graft-mq")
      .option("topic", "src").option("consumerGroup", "g").option("rootDir", root)
      .option("offsetResetTo", "earliest")
      .load()
      .writeStream.format("graft-mq")
      .option("topic", "dst").option("consumerGroup", "g").option("rootDir", root)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.format("graft-mq")
      .option("topic", "dst").option("consumerGroup", "g").option("rootDir", root)
      .load()
    assert(out.count() === 10)
    // message-shaped write maps columns by role: bodies and tags survive
    assert(out.filter(col("tag") === "even").count() === 6)
    assert(out.select("body").collect().map(_.getString(0)).sorted.toSeq ===
      (0 until 2).flatMap(q => (0 until 5).map(i => s"body-$q-$i")).sorted)
  }

  test("batch scan reports custom read metrics (read + filtered + bytes)") {
    val root = freshRoot()
    seed(root, "met", queues = 2, perQueue = 10)
    val df = spark.read.format("graft-mq")
      .option("topic", "met").option("consumerGroup", "g").option("rootDir", root)
      .option("tag", "even").load()
    // collect() executes df's own QueryExecution, so its plan carries the
    // metric values (count() would execute a different plan)
    assert(df.collect().length === 10)
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val metrics = scan.metrics
    assert(metrics.contains("graft_messages_read"), s"metrics: ${metrics.keys}")
    assert(metrics("graft_messages_read").value === 10)
    assert(metrics("graft_messages_filtered").value === 10)
    assert(metrics("graft_bytes_read").value > 0)
  }

  test("DSv2 write reports custom write metrics") {
    val root = freshRoot()
    import spark.implicits._
    var captured: Map[String, Long] = Map.empty
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        val nodes = qe.executedPlan.collect {
          case p if p.metrics.contains("graft_messages_written") => p.metrics
        }
        if (nodes.nonEmpty)
          captured = nodes.head.map { case (k, v) => k -> v.value }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .write.format("graft-mq").mode("append")
        .option("topic", "wm").option("consumerGroup", "g").option("rootDir", root)
        .save()
      // the listener fires asynchronously on the listener bus
      val deadline = System.currentTimeMillis() + 10000
      while (captured.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(captured.getOrElse("graft_messages_written", -1L) === 3L)
      assert(captured.getOrElse("graft_bytes_written", -1L) > 0L)
    } finally spark.listenerManager.unregister(listener)
  }

  test("msgDelayLevel shifts delivery time by the broker delay ladder") {
    val root = freshRoot()
    import spark.implicits._
    val base = new java.sql.Timestamp(1000000L)
    Seq((1L, base)).toDF("id", "born_ts")
      .write.format("graft-mq").mode("append")
      .option("topic", "dl").option("consumerGroup", "g").option("rootDir", root)
      .option("msgDelayLevel", "4") // level 4 = 30s
      .save()
    val got = spark.read.format("graft-mq")
      .option("topic", "dl").option("consumerGroup", "g").option("rootDir", root)
      .load().select("born_ts").collect().head.getTimestamp(0)
    assert(got.getTime === 1000000L + 30000L)
  }

  test("msgDelayLevel out of range is rejected") {
    val e = intercept[IllegalArgumentException] {
      graft.config.GraftOptions.parse(Map(
        "topic" -> "t", "consumergroup" -> "g", "rootdir" -> "/tmp",
        "msgdelaylevel" -> "19"))
    }
    assert(e.getMessage.contains("msgDelayLevel"))
  }
}
