package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Always-on consumption with `Trigger.Continuous` — the graft analog of the
 * reference's long-running push consumer (reference:
 * legacy/example/SimpleConsumer.java:36-76: subscribe and stay resident,
 * printing messages as they arrive), where [[StreamingExample]] mirrors the
 * checkpointed batch-drain job. Continuous mode keeps one long-running task
 * per queue split reading the log tail at millisecond latency
 * ([[graft.source.MessageQueueContinuous]]); offsets commit per epoch.
 *
 * A second thread plays the producer, appending a batch every few hundred
 * ms — so the example demonstrates genuine tail-reading, not a drained
 * backlog. The query runs for ~10 seconds, then reports how many messages
 * the console sink saw arrive while resident.
 *
 * Continuous mode needs >= 2 scheduler slots (one per long-running reader
 * plus the epoch coordinator) — the source fails fast below that.
 *
 * Run: `sbt "runMain graft.examples.ContinuousConsumerExample [rootDir]"`
 */
object ContinuousConsumerExample {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-mq-continuous").toString)
    val topic = "CONTINUOUS_TOPIC"
    // seed a first batch so the reader has a queue layout to attach to
    if (graft.source.TopicLog.listQueues(root, topic).isEmpty)
      SimpleProducer.main(Array(root, topic))
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-continuous-consumer")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // resident producer: appends a small batch to the live topic every
    // 300 ms while the continuous query is running — the "messages keep
    // arriving" half of the reference example
    @volatile var producing = true
    val producer = new Thread(() => {
      var batch = 0
      while (producing) {
        graft.source.TopicLog.append(root, topic, batch % 4,
          Iterator.tabulate(5)(i => graft.source.Message(
            System.currentTimeMillis(), s"k$batch-$i", "live", Map.empty,
            s"live message $batch-$i")))
        batch += 1
        Thread.sleep(300)
      }
    }, "example-producer")
    producer.setDaemon(true)

    val query = spark.readStream.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "GID_CONTINUOUS_EXAMPLE")
      .option("rootDir", root).option("offsetResetTo", "earliest")
      .load()
      .select(col("queue_id"), col("offset"), col("msg_key"), col("body"))
      .writeStream.format("console")
      .option("numRows", "5").option("truncate", "false")
      .option("checkpointLocation", s"$root/_checkpoints/continuous-example")
      .trigger(Trigger.Continuous("1 second")) // epoch length, not poll rate
      .start()

    producer.start()
    query.awaitTermination(10000)
    producing = false
    query.stop()

    val seen = spark.read.format("graft-mq")
      .option("topic", topic).option("consumerGroup", "GID_CONTINUOUS_EXAMPLE")
      .option("rootDir", root).option("offsetResetTo", "earliest")
      .load().count()
    println(s"topic $topic held $seen messages when the resident consumer detached")
    spark.stop()
  }
}
