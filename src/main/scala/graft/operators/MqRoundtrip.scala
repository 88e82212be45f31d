package graft.operators

import java.nio.file.Files

import graft.sink.{DefaultTopicSelector, MessageQueueSink, RowMessageConverter}
import graft.source.TopicLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Full-pipeline proof: events → sink (file-backed queue logs, 8 queues) →
 * DSv2 source scan → body parse back to typed columns. The oracle is the
 * original events table, so any loss or corruption anywhere in the
 * sink/log/source/deserialize chain flips the compare.
 *
 * ts travels inside the body as epoch micros (born_ts is millis, like the
 * broker's born timestamp, so it cannot carry the µs payload).
 */
object MqRoundtrip {

  def mqRoundtripEvents(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-mq-rt").toString
    val topic = "events_rt"
    TopicLog.deleteTopic(root, topic)

    val events = Tables.events(spark, dir).select(
      col("event_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("user_id"),
      col("event_type"),
      col("value"),
      col("props"),
      (unix_micros(col("ts")) / 1000L).cast("long").as("born_ms"))

    val conv = new RowMessageConverter(
      events.schema, fieldDelimiter = "\t",
      keyColumns = Seq("event_id"), writeKeysToBody = true,
      isDynamicTag = true, dynamicTagColumn = "event_type",
      bornTsColumn = "born_ms")
    MessageQueueSink.write(
      events, root, new DefaultTopicSelector[Map[String, Any]](topic), conv, numQueues = 8)

    val back = spark.read.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "rt").option("rootDir", root)
      .load()
      .select(split(col("body"), "\t").as("f"), col("tag"))
    back.select(
      element_at(col("f"), 1).cast("long").as("event_id"),
      timestamp_micros(element_at(col("f"), 2).cast("long")).as("ts"),
      element_at(col("f"), 3).cast("long").as("user_id"),
      col("tag").as("event_type"),
      element_at(col("f"), 5).cast("double").as("value"),
      element_at(col("f"), 6).as("props"))
      .orderBy(col("event_id"))
  }
}
