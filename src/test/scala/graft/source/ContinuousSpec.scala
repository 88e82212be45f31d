package graft.source

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Drives the DSv2 continuous-mode prototype end to end: a real
 * `Trigger.Continuous` query over the file-backed topic, long-running
 * queue readers tailing the log. Two queues only — each continuous
 * partition pins a core for the query's lifetime, and the suite session
 * is local[4].
 */
class ContinuousSpec extends SparkSpec {

  private def freshRoot(): String = Files.createTempDirectory("graft-cont").toString

  private def awaitCount(table: String, atLeast: Long, timeoutMs: Long = 30000): Long = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var n = 0L
    while (System.nanoTime() < deadline) {
      n = spark.table(table).count()
      if (n >= atLeast) return n
      Thread.sleep(100)
    }
    n
  }

  test("continuous query tails the topic: rows appear without a new trigger round") {
    val root = freshRoot()
    val topic = "cont1"
    (0 until 2).foreach { q =>
      TopicLog.append(root, topic, q,
        (0 until 5).iterator.map(i =>
          Message(1000L * (i + 1), s"k$q-$i", "t", Map.empty, s"body-$q-$i")))
    }
    val q = spark.readStream.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "cg")
      .option("rootDir", root).option("offsetResetTo", "earliest")
      .option("continuousPollMs", "20")
      .load()
      .select(col("queue_id"), col("offset"), col("body"))
      .writeStream.format("memory").queryName("cont_sink")
      .trigger(Trigger.Continuous("500 milliseconds"))
      .start()
    try {
      assert(awaitCount("cont_sink", 10) === 10, "initial backlog not drained")

      // append AFTER the query is running: the tailing readers must pick
      // the rows up without any new planning round
      (0 until 2).foreach { qid =>
        TopicLog.append(root, topic, qid,
          Iterator(Message(9000L, s"late-$qid", "t", Map.empty, s"late-body-$qid")))
      }
      assert(awaitCount("cont_sink", 12) === 12, "late rows never surfaced")

      val rows = spark.table("cont_sink")
        .select("queue_id", "offset", "body").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      // exactly the 12 expected (queue, offset, body) triples — no dupes,
      // no drops, offsets contiguous per queue
      val expected = (for { q <- 0 until 2; i <- 0 until 5 }
        yield (q, i.toLong, s"body-$q-$i")).toSet ++
        Set((0, 5L, "late-body-0"), (1, 5L, "late-body-1"))
      assert(rows === expected)
    } finally q.stop()
  }

  test("continuous checkpoint offsets are the micro-batch QueueOffsets format") {
    // one offsets JSON for both modes means a checkpoint written by either
    // restores in the other (restore-wins contract)
    val merged = new MessageQueueContinuousStream(
      graft.config.GraftOptions.parse(Map(
        "topic" -> "x", "consumergroup" -> "g", "rootdir" -> "/tmp/none")))
      .mergeOffsets(Array(QueuePartitionOffset(0, 7L), QueuePartitionOffset(1, 3L)))
    assert(merged.json() === """{"0":7,"1":3}""")
    assert(QueueOffsets.fromJson(merged.json()) === QueueOffsets(Map(0 -> 7L, 1 -> 3L)))
  }

  test("tag and property selectors apply in the continuous reader") {
    val root = freshRoot()
    val topic = "cont2"
    TopicLog.append(root, topic, 0,
      (0 until 6).iterator.map(i =>
        Message(1000L * (i + 1), s"k$i", if (i % 2 == 0) "keep" else "drop",
          Map("env" -> (if (i < 4) "prod" else "dev")), s"b-$i")))
    val q = spark.readStream.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "cg2")
      .option("rootDir", root).option("offsetResetTo", "earliest")
      .option("tag", "keep").option("propertyFilter", "env=prod")
      .option("continuousPollMs", "20")
      .load()
      .select(col("offset"), col("body"))
      .writeStream.format("memory").queryName("cont_sel")
      .trigger(Trigger.Continuous("500 milliseconds"))
      .start()
    try {
      // i in {0, 2}: tag keep AND env prod (i=4 is keep/dev)
      assert(awaitCount("cont_sel", 2) === 2)
      Thread.sleep(300) // a beat of quiet: no extra rows may trickle in
      val got = spark.table("cont_sel").select("body")
        .collect().map(_.getString(0)).toSet
      assert(got === Set("b-0", "b-2"))
    } finally q.stop()
  }
}
