package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.source.{Message, TopicLog}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class WatermarksSpec extends SparkSpec {
  import Watermarks._

  test("BoundedOutOfOrderness: watermark trails max seen timestamp by the bound") {
    val g = new BoundedOutOfOrderness(5000)
    g.extractTimestamp(10000)
    assert(g.currentWatermark === 5000)
    g.extractTimestamp(8000) // late element does not move it backwards
    assert(g.currentWatermark === 5000)
    g.extractTimestamp(20000)
    assert(g.currentWatermark === 15000)
  }

  test("PerQueue: the slowest queue holds the watermark back") {
    val g = new PerQueue(1000)
    g.extractTimestamp("q0", 10000)
    g.extractTimestamp("q1", 4000)
    assert(g.currentWatermark === 3000) // min(10000,4000) - 1000
    g.extractTimestamp("q1", 9000)
    assert(g.currentWatermark === 8000)
  }

  test("TimeLag: watermark is wall clock minus lag") {
    var now = 100000L
    val g = new TimeLag(5000, () => now)
    assert(g.currentWatermark === 95000)
    now = 200000L
    assert(g.currentWatermark === 195000)
    assert(g.extractTimestamp(42) === 42)
  }

  test("Punctuated: only marker-carrying elements punctuate") {
    val g = new Punctuated()
    assert(g.checkAndGetNextWatermark(Map("__watermark__" -> "1"), 777L) === Some(777L))
    assert(g.checkAndGetNextWatermark(Map("other" -> "1"), 777L) === None)
  }

  test("ForAll tracks the global max") {
    val g = new ForAll(100)
    g.extractTimestamp(500); g.extractTimestamp(300)
    assert(g.currentWatermark === 400)
  }

  test("streaming windowed aggregate over the mq source with watermark drops late rows") {
    val root = Files.createTempDirectory("graft-wm").toString
    // two queues; timestamps in seconds-scale windows
    TopicLog.append(root, "wt", 0, Iterator(
      Message(10000, "a", "t", Map.empty, "1"),
      Message(20000, "b", "t", Map.empty, "1"),
      Message(70000, "c", "t", Map.empty, "1")))
    TopicLog.append(root, "wt", 1, Iterator(
      Message(15000, "d", "t", Map.empty, "1"),
      Message(65000, "e", "t", Map.empty, "1")))

    val outName = "wm_out_" + System.nanoTime()
    val stream = spark.readStream.format("graft-mq")
      .option("topic", "wt").option("consumerGroup", "g").option("rootDir", root)
      .option("offsetResetTo", "earliest").load()
    val agg = Watermarks.withBoundedOutOfOrderness(stream, "born_ts", 5000)
      .groupBy(window(col("born_ts"), "1 minute"))
      .count()
    val q = agg.writeStream.format("memory").queryName(outName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.table(outName)
      .select(col("window.start").cast("long").as("start"), col("count"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows === Map(0L -> 3L, 60L -> 2L))
  }
}
