package graft.source

import graft.config.StartMode

/**
 * Offset bookkeeping for a consumer group: a restored (checkpointed) offset
 * always wins over the configured start mode, exactly like the reference's
 * offset table restore (reference: legacy/RocketMQSourceFunction.java:147,
 * 338-365, 419-437). In Structured Streaming the checkpoint plays the role
 * of the restored state; this class carries the same semantics for bounded
 * scans and tests.
 */
class OffsetStore(
    rootDir: String,
    topic: String,
    restoredOffsets: Map[Int, Long] = Map.empty) extends Serializable {

  private val table = scala.collection.concurrent.TrieMap[Int, Long](restoredOffsets.toSeq: _*)

  /** Start offset for a queue: restored > explicit start mode. */
  def initialOffset(queueId: Int, mode: StartMode): Long =
    table.getOrElseUpdate(queueId,
      OffsetStore.resolveStartOffset(rootDir, topic, queueId, mode))

  /** Record progress (next offset to read). */
  def update(queueId: Int, offset: Long): Unit = table.put(queueId, offset)

  /** Checkpoint view of the table. */
  def snapshot: Map[Int, Long] = table.toMap
}

object OffsetStore {

  /** Map a start mode to a concrete offset for one queue
    * (reference: legacy/RocketMQSourceFunction.java:338-360 —
    * earliest→minOffset, latest→maxOffset, timestamp→searchOffset). */
  def resolveStartOffset(rootDir: String, topic: String, queueId: Int, mode: StartMode): Long =
    mode match {
      case StartMode.Earliest => TopicLog.minOffset(rootDir, topic, queueId)
      case StartMode.Latest => TopicLog.maxOffset(rootDir, topic, queueId)
      case StartMode.Timestamp(ms) => TopicLog.searchOffset(rootDir, topic, queueId, ms)
      case StartMode.Offset(o) =>
        math.min(o, TopicLog.maxOffset(rootDir, topic, queueId))
    }
}
