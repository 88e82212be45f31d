package graft.sink

import graft.source.{Message, TopicLog}
import graft.util.Retry
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col

/** Flush discipline for the writer (reference: legacy/RocketMQSink.java:60-150:
  * batch mode buffers and flushes on size/checkpoint; async fires per message
  * with retries). */
sealed trait FlushMode
object FlushMode {
  /** Buffer `batchSize` messages per queue, then append in one IO. */
  final case class Batch(batchSize: Int = 32) extends FlushMode
  /** Append each message as it arrives (per-record IO, lowest latency). */
  case object Async extends FlushMode
}

/**
 * Writes a DataFrame into file-backed topic logs.
 *
 * Queue routing: the frame is repartitioned to `numQueues` partitions and
 * each task owns exactly one queue file — single-writer-per-queue, which is
 * the broker's own invariant and what makes appends safe under any
 * parallelism. At 100 TB this is one shuffle to align producers to queues,
 * then pure sequential appends.
 *
 * The single-writer invariant assumes one live attempt per partition. With
 * speculative execution (spark.speculation=true) or a zombie task racing
 * its retry, two attempts of the same partition can append to the same
 * queue file concurrently and interleave partial lines (corruption, not
 * just duplication) — so `write` REFUSES to run with speculation enabled;
 * use the DSv2 writer (`df.write.format("graft-mq")`), whose per-attempt
 * spill + commit-coordinated append is retry-safe.
 *
 * Topic routing goes through a [[TopicSelector]] (constant or field-driven),
 * retries through [[graft.util.Retry]] with the reference's backoff.
 */
object MessageQueueSink {

  /**
   * Refuses to run the legacy append path when speculative execution is on:
   * two live attempts of one partition would both hold the same queue file
   * and interleave partial lines. The DSv2 writer tolerates speculation
   * because attempts spill privately and only the commit-coordinated winner
   * appends (reference: legacy/RocketMQSink.java:60-150 single-writer
   * semantics).
   */
  private[sink] def assertNoSpeculation(conf: org.apache.spark.SparkConf): Unit =
    require(
      !conf.getBoolean("spark.speculation", defaultValue = false),
      "MessageQueueSink.write appends one queue file per partition and is not " +
        "safe under speculative execution (two attempts of a partition would " +
        "interleave appends). Disable spark.speculation or use the retry-safe " +
        "DSv2 writer: df.write.format(\"graft-mq\")")

  def write(
      df: DataFrame,
      rootDir: String,
      selector: TopicSelector[Map[String, Any]],
      converter: RowMessageConverter,
      numQueues: Int = 8,
      flushMode: FlushMode = FlushMode.Batch(32)): Unit = {
    assertNoSpeculation(df.sparkSession.sparkContext.getConf)
    val schema = df.schema
    val fieldNames = schema.fieldNames
    df.repartition(numQueues).foreachPartition { (rows: Iterator[Row]) =>
      val queueId = org.apache.spark.TaskContext.getPartitionId()
      // queue -> (topic, buffered messages)
      val buffers = scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[Message]]
      val batchSize = flushMode match {
        case FlushMode.Batch(n) => n
        case FlushMode.Async => 1
      }
      def flush(topic: String): Unit = {
        val buf = buffers(topic)
        if (buf.nonEmpty) {
          Retry.call(s"append to $topic/queue-$queueId") {
            TopicLog.append(rootDir, topic, queueId, buf.iterator)
          }
          buf.clear()
        }
      }
      rows.foreach { row =>
        val asMap = fieldNames.zip(row.toSeq).toMap
        val topic = selector.getTopic(asMap)
        val tag = selector.getTag(asMap)
        val m0 = converter.convert(row)
        val m = if (m0.tag.isEmpty && tag.nonEmpty) m0.copy(tag = tag) else m0
        val buf = buffers.getOrElseUpdate(topic, scala.collection.mutable.ArrayBuffer.empty)
        buf += m
        if (buf.length >= batchSize) flush(topic)
      }
      buffers.keys.foreach(flush)
    }
  }

  /**
   * Streaming sink: `df.writeStream.foreachBatch(MessageQueueSink.foreachBatch(...))`.
   *
   * AT-LEAST-ONCE with idempotent skip of fully-marked batches: Structured
   * Streaming replays an unfinished micro-batch with the SAME batchId after
   * a crash, and the committed-batch marker file skips batchIds whose marker
   * landed. The marker is written AFTER the data, so a crash in the window
   * between write() completing and markCommitted() running replays the whole
   * batch — duplicates, not loss. (True exactly-once would need the data
   * append and the marker to commit atomically, e.g. staging + rename.)
   * This matches the reference's pendingOffsetsToCommit bookkeeping, which
   * has the same at-least-once boundary (reference:
   * legacy/RocketMQSourceFunction.java:150, RocketMQSink.java:60-150).
   *
   * Within one batch the guarantee is also at-least-once: a task retry or a
   * crash mid-batch can re-append rows the earlier attempt already flushed,
   * exactly like the reference's async sink. For task-retry atomicity use
   * the DSv2 writer (`df.write.format("graft-mq")`), whose per-task buffer
   * only touches the log at the commit-coordinated commit().
   */
  def foreachBatch(
      rootDir: String,
      selector: TopicSelector[Map[String, Any]],
      converter: RowMessageConverter,
      numQueues: Int = 8,
      flushMode: FlushMode = FlushMode.Batch(32)): (Dataset[Row], Long) => Unit =
    (batch: Dataset[Row], batchId: Long) => {
      if (!isCommitted(rootDir, batchId)) {
        write(batch.toDF(), rootDir, selector, converter, numQueues, flushMode)
        markCommitted(rootDir, batchId)
      }
    }

  private def commitsFile(rootDir: String): java.nio.file.Path =
    java.nio.file.Paths.get(rootDir, "_committed_batches")

  private[sink] def isCommitted(rootDir: String, batchId: Long): Boolean = {
    val f = commitsFile(rootDir)
    java.nio.file.Files.exists(f) &&
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala.contains(batchId.toString)
  }

  private[sink] def markCommitted(rootDir: String, batchId: Long): Unit = {
    java.nio.file.Files.createDirectories(commitsFile(rootDir).getParent)
    java.nio.file.Files.writeString(commitsFile(rootDir), s"$batchId\n",
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
