package graft.source

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.read.InputPartition
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader, ContinuousPartitionReaderFactory, ContinuousStream, Offset, PartitionOffset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

import graft.config.GraftOptions

/**
 * Column-pruned Message→InternalRow projection shared by the micro-batch
 * and continuous readers: one extractor per REQUIRED column only.
 */
class QueueRowProjector(topic: String, queueId: Int, requiredSchema: StructType)
    extends Serializable {
  private val extractors: Array[(Long, Message) => Any] =
    requiredSchema.fieldNames.map {
      case "topic" => (_: Long, _: Message) => UTF8String.fromString(topic)
      case "queue_id" => (_: Long, _: Message) => queueId
      case "offset" => (o: Long, _: Message) => o
      case "born_ts" => (_: Long, m: Message) => m.bornTs * 1000L // millis → micros
      case "msg_key" => (_: Long, m: Message) => UTF8String.fromString(m.key)
      case "tag" => (_: Long, m: Message) => UTF8String.fromString(m.tag)
      case "properties" => (_: Long, m: Message) => {
        val keys = new Array[Any](m.properties.size)
        val vals = new Array[Any](m.properties.size)
        var i = 0
        m.properties.foreach { case (k, v) =>
          keys(i) = UTF8String.fromString(k); vals(i) = UTF8String.fromString(v); i += 1
        }
        ArrayBasedMapData(keys, vals)
      }
      case "body" => (_: Long, m: Message) => UTF8String.fromString(m.body)
      case other => throw new IllegalArgumentException(s"unknown column: $other")
    }

  def toRow(offset: Long, m: Message): InternalRow =
    InternalRow.fromSeq(extractors.map(_(offset, m)).toIndexedSeq)
}

/** Continuous-mode position of one queue reader: the NEXT offset to read. */
final case class QueuePartitionOffset(queueId: Int, offset: Long) extends PartitionOffset

/** One queue's continuous split: where the long-running reader task starts. */
final case class ContinuousQueueSplit(topic: String, queueId: Int, startOffset: Long)
    extends InputPartition

/**
 * DSv2 ContinuousStream over the queue logs — the low-latency analog of the
 * reference's always-on poll loop (reference:
 * source/reader/RocketMQPartitionSplitReader.java:90-180, whose fetch loop
 * never returns to a scheduler between polls). Micro-batch mode pays a
 * planning round-trip per batch, so end-to-end latency floors at the
 * trigger interval; here each queue gets ONE long-running task whose
 * reader tails the log and emits rows the moment they land, and the epoch
 * coordinator snips the stream into commit epochs without ever stopping
 * the readers.
 *
 * Offsets are the same `QueueOffsets` JSON as micro-batch mode, so a
 * checkpoint written by one mode restores in the other (restore-wins,
 * like the micro-batch stream). Enabled per-query by
 * `Trigger.Continuous(...)` — the source advertises CONTINUOUS_READ and
 * Spark picks this stream over the micro-batch one automatically.
 *
 * Scope (documented in README §continuous): tag/property pushdown and
 * offset bookkeeping are shared with micro-batch mode, but Spark's
 * continuous engine itself supports only stateless map/filter/project
 * pipelines — windowed aggregates and joins still require micro-batch
 * mode. End-to-end parity is oracle-checked by the
 * `mq_roundtrip_continuous` entry (same SQL as the batch roundtrip), on
 * top of ContinuousSpec's tailing/selector/offset suites.
 */
class MessageQueueContinuousStream(opts: GraftOptions,
    requiredSchema: StructType = MessageQueueTable.Schema)
    extends ContinuousStream {

  private def listQueues(): Seq[Int] = TopicLog.listQueues(opts.rootDir, opts.topic)

  /** The queue set this stream last planned; a new queue appearing in the
    * log triggers a reconfiguration (the continuous analog of micro-batch
    * per-batch queue re-listing). */
  @volatile private var plannedQueues: Seq[Int] = Nil

  override def initialOffset(): Offset =
    QueueOffsets(listQueues().map { q =>
      q -> OffsetStore.resolveStartOffset(opts.rootDir, opts.topic, q, opts.startMode)
    }.toMap)

  override def deserializeOffset(json: String): Offset = QueueOffsets.fromJson(json)

  override def mergeOffsets(offsets: Array[PartitionOffset]): Offset =
    QueueOffsets(offsets.map {
      case QueuePartitionOffset(q, o) => q -> o
      case other => throw new IllegalArgumentException(s"unexpected offset: $other")
    }.toMap)

  override def planInputPartitions(start: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[QueueOffsets].offsets
    // a queue present in the log but absent from the checkpoint starts at
    // its mode-resolved offset (same rule as the micro-batch stream)
    val queues = listQueues()
    plannedQueues = queues
    queues.map { q =>
      val from = s.getOrElse(q,
        OffsetStore.resolveStartOffset(opts.rootDir, opts.topic, q, opts.startMode))
      ContinuousQueueSplit(opts.topic, q, from): InputPartition
    }.toArray
  }

  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    new ContinuousQueueReaderFactory(opts.rootDir, opts.tag, opts.propertyFilter,
      requiredSchema, opts.continuousPollMs)

  override def needsReconfiguration(): Boolean = listQueues() != plannedQueues

  /** Same monitoring-only group-offset surface as the micro-batch stream's
    * commit: restarts are governed by the checkpoint (restore-wins), so a
    * failed write logs and continues. */
  override def commit(end: Offset): Unit =
    try OffsetStore.commitOffsets(opts.rootDir, opts.topic, opts.consumerGroup,
      end.asInstanceOf[QueueOffsets].offsets)
    catch {
      case e: Exception =>
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"could not persist consumer-group offsets for ${opts.consumerGroup}: $e")
    }

  override def stop(): Unit = ()
}

class ContinuousQueueReaderFactory(rootDir: String, tag: String,
    propertyFilter: Map[String, String], requiredSchema: StructType, pollMs: Long)
    extends ContinuousPartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : ContinuousPartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[ContinuousQueueSplit]
    new ContinuousQueueReader(rootDir, tag, propertyFilter, requiredSchema, split, pollMs)
  }
}

/**
 * Long-running tail reader for one queue: `next()` BLOCKS until a record is
 * available, re-polling the log's max offset every `pollMs` while drained —
 * the reference's poll loop re-expressed as a DSv2 continuous reader. The
 * engine runs this on a dedicated thread and interrupts it at query stop;
 * the InterruptedException from the poll sleep is the intended shutdown
 * path. Filtered-out messages (tag/property selector) still advance the
 * position, exactly like the micro-batch reader's offset accounting.
 */
class ContinuousQueueReader(rootDir: String, tagFilter: String,
    propertyFilter: Map[String, String], requiredSchema: StructType,
    split: ContinuousQueueSplit, pollMs: Long)
    extends ContinuousPartitionReader[InternalRow] {

  private val acceptedTags: Set[String] =
    if (tagFilter == null || tagFilter == "*" || tagFilter.isEmpty) null
    else tagFilter.split("\\|\\|").map(_.trim).toSet

  private val projector = new QueueRowProjector(split.topic, split.queueId, requiredSchema)

  private var nextOffset: Long = split.startOffset
  private var chunk: TopicLog.RangeIterator = null
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (chunk != null && chunk.hasNext) {
        val (offset, m) = chunk.next()
        nextOffset = offset + 1
        val tagOk = acceptedTags == null || acceptedTags.contains(m.tag)
        val propsOk = propertyFilter.isEmpty ||
          propertyFilter.forall { case (k, v) => m.properties.get(k).contains(v) }
        if (tagOk && propsOk) {
          current = projector.toRow(offset, m)
          return true
        }
      } else {
        if (chunk != null) { chunk.close(); chunk = null }
        val max = TopicLog.maxOffset(rootDir, split.topic, split.queueId)
        if (max > nextOffset)
          chunk = TopicLog.readRange(rootDir, split.topic, split.queueId, nextOffset, max)
        else Thread.sleep(pollMs) // throws InterruptedException at query stop
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current

  override def getOffset: PartitionOffset =
    QueuePartitionOffset(split.queueId, nextOffset)

  override def close(): Unit = {
    if (chunk != null) { chunk.close(); chunk = null }
  }
}
