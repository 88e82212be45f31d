package graft.source

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.connector.read.InputPartition

/**
 * One (topic, broker, queue) slice of work with an offset range — the graft
 * analog of the reference's partition split
 * (reference: source/split/RocketMQPartitionSplit.java:1-101). Doubles as the
 * DSv2 `InputPartition` so the planner hands it straight to readers.
 */
final case class QueueSplit(
    topic: String,
    broker: String,
    queueId: Int,
    startingOffset: Long,
    stoppingOffset: Long) extends InputPartition {

  def splitId: String = s"$topic-$broker-$queueId"

  override def toString: String =
    f"[Topic: $topic, Broker: $broker, Queue: $queueId, " +
      f"StartingOffset: $startingOffset, StoppingOffset: $stoppingOffset]"
}

/**
 * Versioned wire format for [[QueueSplit]] — DataOutputStream layout like the
 * reference's SimpleVersionedSerializer
 * (reference: source/split/RocketMQPartitionSplitSerializer.java:1-66).
 */
object QueueSplitSerializer {
  val CurrentVersion = 0

  def serialize(split: QueueSplit): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeUTF(split.topic)
    out.writeUTF(split.broker)
    out.writeInt(split.queueId)
    out.writeLong(split.startingOffset)
    out.writeLong(split.stoppingOffset)
    out.flush()
    baos.toByteArray
  }

  def deserialize(version: Int, bytes: Array[Byte]): QueueSplit = {
    require(version == CurrentVersion, s"unknown split version: $version")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    QueueSplit(in.readUTF(), in.readUTF(), in.readInt(), in.readLong(), in.readLong())
  }
}

/** Enumerator checkpoint state: reader → assigned splits
  * (reference: source/enumerator/RocketMQSourceEnumState.java:1-35). */
final case class EnumState(currentAssignment: Map[Int, Seq[QueueSplit]])

/** Wire format for [[EnumState]]: readers, then per-reader split counts and
  * length-prefixed split payloads via [[QueueSplitSerializer]]
  * (reference: source/enumerator/RocketMQSourceEnumStateSerializer.java:1-60). */
object EnumStateSerializer {
  val CurrentVersion = 0

  def serialize(state: EnumState): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    val out = new DataOutputStream(baos)
    out.writeInt(state.currentAssignment.size)
    state.currentAssignment.toSeq.sortBy(_._1).foreach { case (reader, splits) =>
      out.writeInt(reader)
      out.writeInt(splits.size)
      splits.foreach { s =>
        val bytes = QueueSplitSerializer.serialize(s)
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    out.flush()
    baos.toByteArray
  }

  def deserialize(version: Int, bytes: Array[Byte]): EnumState = {
    require(version == CurrentVersion,
      s"bytes serialized with version $version; this deserializer supports up to $CurrentVersion")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val nReaders = in.readInt()
    val assignment = (0 until nReaders).map { _ =>
      val reader = in.readInt()
      val nSplits = in.readInt()
      reader -> (0 until nSplits).map { _ =>
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        QueueSplitSerializer.deserialize(QueueSplitSerializer.CurrentVersion, buf)
      }.toSeq
    }.toMap
    EnumState(assignment)
  }
}

/**
 * Deterministic split→reader assignment. Same hash-clockwise formula as the
 * reference enumerator (reference:
 * source/enumerator/RocketMQSourceEnumerator.java:343-350): the topic+broker
 * hash picks a start reader, queue ids count clockwise from there, so one
 * topic's queues spread evenly over readers regardless of the hash.
 */
object SplitAssigner {

  def getSplitOwner(topic: String, broker: String, queueId: Int, numReaders: Int): Int = {
    val startIndex = (((topic + "-" + broker).hashCode * 31) & 0x7FFFFFFF) % numReaders
    (startIndex + queueId) % numReaders
  }

  /** Group splits by owning reader. */
  def assign(splits: Seq[QueueSplit], numReaders: Int): Map[Int, Seq[QueueSplit]] =
    splits.groupBy(s => getSplitOwner(s.topic, s.broker, s.queueId, numReaders))
}
