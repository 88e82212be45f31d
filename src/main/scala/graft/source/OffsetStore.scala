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

  // ---- durable consumer-group offsets ----
  //
  // Structured Streaming's checkpoint already makes restarts correct; this
  // surface exists so EXTERNAL tooling can see a group's progress and lag,
  // like the reference committing offsets back to the broker on checkpoint
  // complete (reference: legacy/RocketMQSourceFunction.java:340-437,
  // notifyCheckpointComplete → consumer.commitOffset). One file per group
  // under the topic dir, written atomically (temp + move).

  private def offsetsFile(rootDir: String, topic: String, group: String): java.nio.file.Path =
    java.nio.file.Paths.get(rootDir, topic, "__offsets", s"$group.offsets")

  /** Persist a group's committed (next-to-read) offsets. */
  def commitOffsets(
      rootDir: String, topic: String, group: String, offsets: Map[Int, Long]): Unit = {
    val file = offsetsFile(rootDir, topic, group)
    java.nio.file.Files.createDirectories(file.getParent)
    val tmp = java.nio.file.Files.createTempFile(file.getParent, s".$group-", ".tmp")
    val body = offsets.toSeq.sortBy(_._1).map { case (q, o) => s"$q\t$o" }.mkString("", "\n", "\n")
    java.nio.file.Files.writeString(tmp, body)
    java.nio.file.Files.move(tmp, file,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Last committed offsets for a group (empty if it never committed).
    * Malformed lines are skipped, not fatal — this is a monitoring API and
    * the file is plain text anyone may have touched. */
  def committedOffsets(rootDir: String, topic: String, group: String): Map[Int, Long] = {
    val file = offsetsFile(rootDir, topic, group)
    if (!java.nio.file.Files.exists(file)) Map.empty
    else scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(file)).asScala
      .flatMap { line =>
        line.split("\t") match {
          case Array(q, o) if q.trim.nonEmpty =>
            try Some(q.trim.toInt -> o.trim.toLong)
            catch { case _: NumberFormatException => None }
          case _ => None
        }
      }
      .toMap
  }

  /** Per-queue lag (log end minus committed position) — the monitoring
    * number an operator actually watches. Queues the group never committed
    * report the full log length. */
  def consumerLag(rootDir: String, topic: String, group: String): Map[Int, Long] = {
    val committed = committedOffsets(rootDir, topic, group)
    TopicLog.listQueues(rootDir, topic).map { q =>
      q -> math.max(0L, TopicLog.maxOffset(rootDir, topic, q) - committed.getOrElse(q, 0L))
    }.toMap
  }
}
