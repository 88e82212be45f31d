package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import graft.config.GraftOptions
import graft.source.{EpochLedger, TopicLog}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions.col

/**
 * Crash-replay matrix for the exactly-once sink protocol
 * ([[graft.source.EpochLedger]]): every window in which the old design was
 * at-least-once is forced here, and the committed line set must come out
 * exactly once — zero duplicate lines, zero lost lines, no partials.
 */
class ExactlyOnceSpec extends SparkSpec {

  private val bodySchema = StructType(Seq(StructField("body", StringType)))

  private def writer(root: String, queue: Int, epoch: Long): QueueDataWriter =
    new QueueDataWriter(GraftOptions.parse(Map(
      "topic" -> "eo", "consumerGroup" -> "g", "rootDir" -> root)),
      bodySchema, queue, epoch)

  private def row(s: String): InternalRow = InternalRow(UTF8String.fromString(s))

  private def bodies(root: String, topic: String = "eo", queue: Int = 0): Seq[String] =
    TopicLog.readRange(root, topic, queue, 0,
      TopicLog.maxOffset(root, topic, queue)).map(_._2.body).toSeq

  private def streamingWrite(root: String): MessageQueueStreamingWrite =
    new MessageQueueStreamingWrite(GraftOptions.parse(Map(
      "topic" -> "eo", "consumerGroup" -> "g", "rootDir" -> root)), bodySchema)

  /** Run one epoch end to end: task commits then driver publish. */
  private def epoch(root: String, id: Long, lines: Seq[String]): Unit = {
    val w = writer(root, 0, id)
    lines.foreach(l => w.write(row(l)))
    val msg = w.commit()
    streamingWrite(root).commit(id, Array(msg))
  }

  test("epoch replay after successful publish appends nothing") {
    val root = Files.createTempDirectory("graft-eo").toString
    epoch(root, 0, Seq("a", "b"))
    epoch(root, 0, Seq("a", "b")) // crash after publish, before checkpoint → replay
    assert(bodies(root) === Seq("a", "b"))
    epoch(root, 1, Seq("c"))
    assert(bodies(root) === Seq("a", "b", "c"))
  }

  test("crash after task appends but before publish: replay leaves exactly one copy") {
    val root = Files.createTempDirectory("graft-eo").toString
    epoch(root, 0, Seq("a", "b"))
    // epoch 1 attempt: tasks commit (data appended) but the driver dies
    // before publishing the ledger
    val w = writer(root, 0, 1)
    Seq("c", "d").foreach(l => w.write(row(l)))
    w.commit() // no streamingWrite.commit → ledger still at epoch 0
    // the uncommitted tail is invisible to readers
    assert(bodies(root) === Seq("a", "b"))
    // replay of epoch 1 truncate-repairs then re-appends
    epoch(root, 1, Seq("c", "d"))
    assert(bodies(root) === Seq("a", "b", "c", "d"))
  }

  test("crash mid-append (partial line past hwm) is invisible and repaired") {
    val root = Files.createTempDirectory("graft-eo").toString
    epoch(root, 0, Seq("a"))
    // simulate a crash halfway through an epoch-1 append: raw bytes with a
    // torn final line land past the committed mark
    val f = TopicLog.queueFile(root, "eo", 0)
    Files.writeString(f.toPath, "9\tk\tt\t\tgarbage\n9\tk\tt\t\ttorn-lin",
      java.nio.file.StandardOpenOption.APPEND)
    assert(bodies(root) === Seq("a")) // reader capped at the hwm
    epoch(root, 1, Seq("b", "c")) // replay repairs the tail, then appends
    assert(bodies(root) === Seq("a", "b", "c"))
  }

  test("first managed write adopts pre-existing raw log content as committed") {
    val root = Files.createTempDirectory("graft-eo").toString
    TopicLog.append(root, "eo", 0, Iterator(
      graft.source.Message(1L, "k", "t", Map.empty, "legacy")))
    epoch(root, 0, Seq("managed"))
    assert(bodies(root) === Seq("legacy", "managed"))
  }

  test("batch DSv2 append into a ledger-managed topic advances the hwm") {
    val root = Files.createTempDirectory("graft-eo").toString
    epoch(root, 0, Seq("s1"))
    val opts = GraftOptions.parse(Map(
      "topic" -> "eo", "consumerGroup" -> "g", "rootDir" -> root))
    val bw = new MessageQueueBatchWrite(opts, bodySchema)
    val w = new QueueDataWriter(opts, bodySchema, 0)
    w.write(row("b1"))
    bw.commit(Array(w.commit()))
    assert(bodies(root) === Seq("s1", "b1")) // visible: hwm advanced
    epoch(root, 1, Seq("s2")) // next epoch must not reclaim the batch rows
    assert(bodies(root) === Seq("s1", "b1", "s2"))
  }

  test("foreachBatch: duplicate batch, crash-before-publish, and torn tail all heal") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-eo-fb").toString
    val conv = new RowMessageConverter(bodySchema)
    val fn = MessageQueueSink.foreachBatch(root,
      new DefaultTopicSelector[Map[String, Any]]("fb"), conv, numQueues = 1)
    val b0 = Seq("a", "b").toDF("body")
    fn(b0, 0L)
    fn(b0, 0L) // replayed batchId
    assert(bodies(root, "fb") === Seq("a", "b"))
    // crashed batch-1 attempt: data landed, ledger publish never ran
    MessageQueueSink.writeEpochTaskOnlyForTest(Seq("c").toDF("body"), root, "fb", conv)
    assert(bodies(root, "fb") === Seq("a", "b")) // invisible past hwm
    fn(Seq("c", "d").toDF("body"), 1L) // replay heals and lands once
    assert(bodies(root, "fb") === Seq("a", "b", "c", "d"))
  }

  test("mq source reading a ledgered topic sees only committed lines") {
    val root = Files.createTempDirectory("graft-eo-src").toString
    epoch(root, 0, Seq("x", "y"))
    val w = writer(root, 0, 1)
    w.write(row("uncommitted"))
    w.commit() // no publish
    val got = spark.read.format("graft-mq")
      .option("topic", "eo").option("consumerGroup", "g").option("rootDir", root)
      .load().select(col("body")).collect().map(_.getString(0)).toSeq.sorted
    assert(got === Seq("x", "y"))
  }

  test("timestamp search never exposes offsets past the committed hwm") {
    val root = Files.createTempDirectory("graft-eo-ts").toString
    epoch(root, 0, Seq("committed"))
    val w = writer(root, 0, 1)
    w.write(row("uncommitted"))
    w.commit() // no publish: one raw line sits past the hwm
    // a "search to the end of time" stop offset must cap at the hwm, or an
    // endTimeMs-bounded scan would read the uncommitted line
    assert(TopicLog.searchOffset(root, "eo", 0, Long.MaxValue) === 1L)
    assert(TopicLog.searchOffset(root, "eo", 0, 0L) === 0L)
  }

  test("ledger publish is atomic and round-trips state") {
    val root = Files.createTempDirectory("graft-eo-led").toString
    val st = EpochLedger.State("query id with spaces", 7L,
      Map(0 -> (10L, 100L), 3 -> (2L, 20L)))
    EpochLedger.publish(root, "t", st)
    assert(EpochLedger.read(root, "t") === Some(st))
    assert(EpochLedger.isCommitted(root, "t", "query id with spaces", 7L))
    assert(!EpochLedger.isCommitted(root, "t", "query id with spaces", 8L))
    assert(!EpochLedger.isCommitted(root, "t", "someone else", 7L)) // identity-scoped
    assert(!Files.exists(EpochLedger.file(root, "t").resolveSibling("._epochs.tmp")))
  }

  test("a new writer's restarted epoch numbers are not mistaken for replays") {
    val root = Files.createTempDirectory("graft-eo-wid").toString
    def epochAs(writer: String, id: Long, lines: Seq[String]): Unit = {
      val opts = GraftOptions.parse(Map(
        "topic" -> "eo", "consumerGroup" -> "g", "rootDir" -> root))
      val w = new QueueDataWriter(opts, bodySchema, 0, id, writer)
      lines.foreach(l => w.write(row(l)))
      val msg = w.commit()
      new MessageQueueStreamingWrite(opts, bodySchema, writer).commit(id, Array(msg))
    }
    // writer A commits epochs 0..2
    epochAs("query-A", 0, Seq("a0"))
    epochAs("query-A", 1, Seq("a1"))
    epochAs("query-A", 2, Seq("a2"))
    // a NEW query (fresh checkpoint) restarts at epoch 0 with NEW data —
    // it must append, not be skipped as a replay of A's epoch 0
    epochAs("query-B", 0, Seq("b0"))
    assert(bodies(root) === Seq("a0", "a1", "a2", "b0"))
    // and B's own replay of ITS epoch 0 still appends nothing
    epochAs("query-B", 0, Seq("b0"))
    assert(bodies(root) === Seq("a0", "a1", "a2", "b0"))
  }

  test("first managed epoch adopts raw data in queues it does not touch") {
    val root = Files.createTempDirectory("graft-eo-adopt").toString
    // raw data in queues 0 and 2
    TopicLog.append(root, "eo", 0, Iterator(
      graft.source.Message(1L, "k", "t", Map.empty, "raw-q0")))
    TopicLog.append(root, "eo", 2, Iterator(
      graft.source.Message(1L, "k", "t", Map.empty, "raw-q2")))
    // first managed epoch only writes queue 0
    epoch(root, 0, Seq("managed-q0"))
    // queue 2's raw line must stay visible...
    assert(bodies(root, "eo", 2) === Seq("raw-q2"))
    assert(bodies(root, "eo", 0) === Seq("raw-q0", "managed-q0"))
    // ...and a later epoch touching queue 2 must append, not truncate it
    val w = writer(root, 2, 1)
    w.write(row("managed-q2"))
    streamingWrite(root).commit(1, Array(w.commit()))
    assert(bodies(root, "eo", 2) === Seq("raw-q2", "managed-q2"))
  }

  test("real writeStream to graft-mq sink is exactly-once across a restart") {
    import org.apache.spark.sql.streaming.Trigger
    val srcRoot = Files.createTempDirectory("graft-eo-e2e").toString
    val dstRoot = Files.createTempDirectory("graft-eo-e2e").toString
    TopicLog.append(srcRoot, "in", 0, (0 until 5).iterator.map(i =>
      graft.source.Message(1000L * (i + 1), s"k$i", "t", Map.empty, s"body-$i")))
    val checkpoint = Files.createTempDirectory("graft-eo-ckpt").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft-mq")
        .option("topic", "in").option("consumerGroup", "g").option("rootDir", srcRoot)
        .option("offsetResetTo", "earliest").load()
        .select(col("body"))
        .writeStream.format("graft-mq")
        .option("topic", "out").option("consumerGroup", "g").option("rootDir", dstRoot)
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    run()
    val first = (0 until 8).flatMap(q => bodies(dstRoot, "out", q)).sorted
    assert(first === (0 until 5).map(i => s"body-$i"))
    run() // restart with no new data: ledger blocks any re-append
    val second = (0 until 8).flatMap(q => bodies(dstRoot, "out", q)).sorted
    assert(second === first)
  }
}
