package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Consume a topic from the file-backed broker and print the messages — the
 * graft analog of the reference's push-consumer example (reference:
 * legacy/example/SimpleConsumer.java:36-76: subscribe(TOPIC, "*"), print
 * each body). Seeds the topic via [[SimpleProducer]] when it is empty, so
 * the example runs standalone.
 *
 * Run: `sbt "runMain graft.examples.SimpleConsumer [rootDir] [topic] [tag]"`
 * Defaults: /tmp/graft-mq-demo SOURCE_TOPIC * (no tag filter).
 */
object SimpleConsumer {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-mq-demo")
    val topic = if (args.length > 1) args(1) else "SOURCE_TOPIC"
    val tag = if (args.length > 2) args(2) else "*"
    if (graft.source.TopicLog.listQueues(root, topic).isEmpty)
      SimpleProducer.main(Array(root, topic))
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-simple-consumer")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = spark.read.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "GID_SIMPLE_CONSUMER")
      .option("rootDir", root).option("tag", tag)
      .option("offsetResetTo", "earliest")
      .load()
    val n = df.count()
    df.orderBy(col("queue_id"), col("offset"))
      .select("queue_id", "offset", "msg_key", "tag", "body")
      .show(20, truncate = false)
    println(s"consumed $n messages from $topic (tag filter: $tag)")
    spark.stop()
  }
}
