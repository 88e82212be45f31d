package graft.sink

import java.util

import graft.config.GraftOptions
import graft.source.{Message, TopicLog}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StructType, TimestampType}

/**
 * DSv2 batch write: `df.write.format("graft-mq").option(...).save()`.
 *
 * Each task buffers its rows and appends them to its OWN queue file on
 * commit — task = queue (single writer per queue, the broker invariant), and
 * an aborted/retried task appends nothing (no partial lines). Rows become
 * delimited message bodies via the same exclusion rules as
 * [[RowMessageConverter]]; a `born_ts`-typed column can drive message time.
 */
class MessageQueueWriteBuilder(opts: GraftOptions, schema: StructType,
                               queryId: String = "")
    extends WriteBuilder {
  override def build(): Write = new Write with RequiresDistributionAndOrdering {
    import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
    import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
    override def toBatch: BatchWrite = new MessageQueueBatchWrite(opts, schema)
    // the streaming queryId is stable across restarts (checkpoint metadata)
    // — exactly the writer identity the epoch ledger needs
    override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
      new MessageQueueStreamingWrite(opts, schema, queryId)
    // task = queue, so the requested partition count IS the queue count;
    // 0 lets the incoming partitioning stand. Clustering key: the message
    // key columns (keeps one key's messages ordered within one queue, the
    // broker's per-key ordering guarantee) or the whole row when no keys.
    override def requiredDistribution(): Distribution =
      if (opts.numQueues <= 0) Distributions.unspecified()
      else {
        val cols = if (opts.keyColumns.nonEmpty) opts.keyColumns else schema.fieldNames.toSeq
        Distributions.clustered(cols.map(c => Expressions.identity(c)).toArray)
      }
    override def requiredOrdering(): Array[SortOrder] = Array.empty
    override def requiredNumPartitions(): Int = math.max(opts.numQueues, 0)
    override def supportedCustomMetrics()
        : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
      graft.source.Metrics.writeMetrics
  }
}

class MessageQueueBatchWrite(opts: GraftOptions, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new QueueDataWriterFactory(opts, schema)
  /** A batch append into a ledger-managed topic must advance the committed
    * lengths or its rows would sit invisibly past the high-water mark (and
    * be reclaimed by the next epoch's repair). Raw topics need nothing.
    * NOTE: ledger commits are read-modify-write of one file — a topic
    * admits ONE writing job at a time (the broker's single-writer-per-queue
    * invariant extended to jobs); interleave a batch append with a live
    * streaming query and one side's marks can be lost. */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    graft.source.EpochLedger.read(opts.rootDir, opts.topic).foreach { st =>
      val updated = st.queues ++ messages.collect {
        case QueueCommit(q, lines, bytes) => q -> (lines, bytes)
      }
      graft.source.EpochLedger.publish(opts.rootDir, opts.topic, st.copy(queues = updated))
    }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/**
 * DSv2 streaming sink: `df.writeStream.format("graft-mq")...start()` —
 * the native counterpart of the reference's streaming sink
 * (legacy/RocketMQSink.java). Each micro-batch epoch runs the same
 * spill-then-append writers as the batch path (task = queue, single writer
 * per queue, no partial lines from failed attempts).
 *
 * Delivery is EXACTLY-ONCE via the [[graft.source.EpochLedger]] protocol:
 * task commits truncate-repair their queue to the committed high-water mark
 * before appending, the driver publishes the new marks + epoch id in one
 * atomic rename, readers only see lines below the mark, and a replayed
 * epoch whose id the ledger already covers appends nothing. The reference's
 * pendingOffsetsToCommit bookkeeping (legacy/RocketMQSourceFunction.java:150,
 * RocketMQSink.java:60-150) is at-least-once at this boundary; the ledger
 * closes it.
 */
class MessageQueueStreamingWrite(opts: GraftOptions, schema: StructType,
                                 writerId: String = "")
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new QueueStreamingWriterFactory(opts, schema, writerId)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val prior = graft.source.EpochLedger.read(opts.rootDir, opts.topic)
    if (!prior.exists(_.isCommitted(writerId, epochId))) {
      // base = prior marks, or full raw adoption on first management so
      // queues this epoch didn't touch keep their data readable
      val base = prior.map(_.queues)
        .getOrElse(graft.source.EpochLedger.adoptionState(opts.rootDir, opts.topic))
      val updated = base ++ messages.collect {
        case QueueCommit(q, lines, bytes) => q -> (lines, bytes)
      }
      graft.source.EpochLedger.publish(opts.rootDir, opts.topic,
        graft.source.EpochLedger.State(writerId, epochId, updated))
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class QueueStreamingWriterFactory(opts: GraftOptions, schema: StructType, writerId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    new QueueDataWriter(opts, schema, partitionId, epochId, writerId)
}

class QueueDataWriterFactory(opts: GraftOptions, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new QueueDataWriter(opts, schema, partitionId)
}

private final case class QueueCommit(queueId: Int, lines: Long, bytes: Long)
    extends WriterCommitMessage

class QueueDataWriter(opts: GraftOptions, schema: StructType, partitionId: Int,
                      epochId: Long = -1L, writerId: String = "")
    extends DataWriter[InternalRow] {

  private val fieldNames = schema.fieldNames

  /** A message-shaped input (every column is one of the source's own
    * message/metadata columns, case-insensitively, and there is a string
    * `body`) maps columns by ROLE — body→body, msg_key→key, tag→tag,
    * born_ts→born, properties→properties; topic/queue_id/offset are
    * broker-assigned and ignored. This is what makes
    * `INSERT INTO <graft-mq table> SELECT ... AS body, ...` round-trip:
    * reading a queue and inserting the rows back writes the same messages,
    * not delimiter-joined column soup. (Positional `INSERT ... VALUES`
    * arrives as col1..colN under ACCEPT_ANY_SCHEMA and takes the generic
    * path — alias the columns.) Any explicit body-shaping option
    * (keyColumns / dynamic tag / writeKeysToBody) disables the mapping so
    * an existing delimited-body pipeline never changes format silently. */
  private val messageShaped: Boolean = {
    val msgCols = graft.source.MessageQueueTable.Schema.fieldNames.map(_.toLowerCase).toSet
    opts.keyColumns.isEmpty && !opts.isDynamicTag && !opts.writeKeysToBody &&
      fieldNames.forall(f => msgCols.contains(f.toLowerCase)) &&
      schema.fields.exists(f => f.name.equalsIgnoreCase("body") &&
        f.dataType == org.apache.spark.sql.types.StringType)
  }
  private def idxOf(name: String): Int =
    schema.fields.indexWhere(_.name.equalsIgnoreCase(name))
  private val msgBodyIdx = if (messageShaped) idxOf("body") else -1
  private val msgKeyIdx = if (messageShaped) idxOf("msg_key") else -1
  private val msgTagIdx = if (messageShaped) idxOf("tag") else -1
  private val msgPropsIdx = if (messageShaped) idxOf("properties") else -1

  private val tagIdx =
    if (opts.isDynamicTag && opts.dynamicTagColumn != null)
      schema.fieldIndex(opts.dynamicTagColumn)
    else -1
  private val keyIdx = opts.keyColumns.map(schema.fieldIndex).toArray
  private val bornIdx = {
    val i = schema.fields.indexWhere(f => f.name == "born_ts" && f.dataType == TimestampType)
    i
  }
  private val excluded: Set[Int] =
    (if (opts.writeKeysToBody) Set.empty[Int] else keyIdx.toSet) ++
      (if (tagIdx >= 0 && !opts.dynamicTagColumnWriteIncluded) Set(tagIdx) else Set.empty) ++
      (if (bornIdx >= 0) Set(bornIdx) else Set.empty)
  private val bodyIdx = schema.indices.filterNot(excluded.contains).toArray

  // rows spill to a task-attempt temp file as they arrive (O(1) heap, the
  // 100 TB partition case); commit() appends the spill to the queue log in
  // one transfer and deletes it.
  private val spillPath = java.nio.file.Files.createTempFile(
    s"graft-write-$partitionId-", ".spill")
  private val spill = new java.io.BufferedWriter(new java.io.FileWriter(
    spillPath.toFile, java.nio.charset.StandardCharsets.UTF_8))
  private var rows = 0L
  private var bytes = 0L

  private def str(row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) ""
    else schema(i).dataType match {
      case TimestampType => (row.getLong(i) / 1000L).toString // micros → millis
      case dt => row.get(i, dt).toString
    }

  // msgDelayLevel shifts delivery time (see GraftOptions.DelayLevelMs)
  private val delayMs = graft.config.GraftOptions.delayMs(opts.msgDelayLevel)

  override def write(row: InternalRow): Unit = {
    val born = delayMs +
      (if (bornIdx >= 0 && !row.isNullAt(bornIdx)) row.getLong(bornIdx) / 1000L
       else System.currentTimeMillis())
    val m =
      if (messageShaped) {
        val props =
          if (msgPropsIdx < 0 || row.isNullAt(msgPropsIdx)) Map.empty[String, String]
          else {
            val md = row.getMap(msgPropsIdx)
            val ks = md.keyArray(); val vs = md.valueArray()
            (0 until md.numElements()).map { i =>
              // map values are nullable in SQL; a property is never null
              val v = vs.getUTF8String(i)
              ks.getUTF8String(i).toString -> (if (v == null) "" else v.toString)
            }.toMap
          }
        val tag = if (msgTagIdx >= 0) str(row, msgTagIdx) else opts.tag
        Message(born,
          if (msgKeyIdx >= 0) str(row, msgKeyIdx) else "",
          if (tag == "*") "" else tag,
          props,
          str(row, msgBodyIdx))
      } else {
        val key = keyIdx.map(str(row, _)).mkString(",")
        val tag = if (tagIdx >= 0) str(row, tagIdx) else opts.tag
        // GraftOptions.parse normalizes an empty delimiter to SOH, so writer
        // and reader always agree on the body layout
        val body = bodyIdx.map(str(row, _)).mkString(opts.fieldDelimiter)
        Message(born, key, if (tag == "*") "" else tag, Map.empty, body)
      }
    val line = TopicLog.renderLine(m)
    spill.write(line)
    spill.newLine()
    rows += 1L
    bytes += graft.source.Metrics.utf8Length(line) + 1L
  }

  override def currentMetricsValues()
      : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(graft.source.Metrics.Value(graft.source.Metrics.MessagesWritten, rows),
      graft.source.Metrics.Value(graft.source.Metrics.BytesWritten, bytes))

  /** The queue log is only touched here, after every row spilled cleanly —
    * an attempt that dies mid-write leaves just an orphan temp file.
    *
    * Exactly-once protocol ([[graft.source.EpochLedger]]): a streaming
    * epoch the ledger already covers appends NOTHING (post-commit replay);
    * otherwise a ledger-managed queue is truncated back to its committed
    * byte length first, so the tail a crashed attempt left mid-append is
    * discarded before this attempt's spill lands. A crash DURING this
    * append leaves a tail past the high-water mark that readers never see
    * and the replay reclaims. The first managed write of a pre-existing raw
    * log adopts its complete lines as committed. Spark's commit coordinator
    * prevents the double-commit case within an epoch. */
  override def commit(): WriterCommitMessage = {
    spill.close()
    val ledger = graft.source.EpochLedger.read(opts.rootDir, opts.topic)
    if (epochId >= 0 && ledger.exists(_.isCommitted(writerId, epochId))) {
      java.nio.file.Files.deleteIfExists(spillPath)
      // values are never published: the driver skips committed epochs too
      QueueCommit(partitionId, 0L, 0L)
    } else {
      val (committedLines, committedBytes) = ledger match {
        case Some(st) if st.queues.contains(partitionId) => st.committed(partitionId)
        case None if epochId < 0 => (0L, 0L) // raw batch append, no repair
        case _ =>
          // first managed write of this queue (no ledger yet, or a ledger
          // that never saw this queue): adopt its raw complete lines
          graft.source.TopicLog.sizeInfo(opts.rootDir, opts.topic, partitionId)
      }
      if (ledger.isDefined || epochId >= 0)
        graft.source.EpochLedger.truncateQueue(
          opts.rootDir, opts.topic, partitionId, committedBytes)
      val spillBytes = java.nio.file.Files.size(spillPath)
      TopicLog.appendRendered(opts.rootDir, opts.topic, partitionId, spillPath)
      java.nio.file.Files.deleteIfExists(spillPath)
      QueueCommit(partitionId, committedLines + rows, committedBytes + spillBytes)
    }
  }

  override def abort(): Unit = {
    spill.close()
    java.nio.file.Files.deleteIfExists(spillPath)
  }
  override def close(): Unit = { java.nio.file.Files.deleteIfExists(spillPath); () }
}
