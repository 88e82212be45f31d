package graft.source

import org.scalatest.funsuite.AnyFunSuite

class QueueSplitSpec extends AnyFunSuite {

  test("serializer round-trips every field") {
    val split = QueueSplit("orders", "broker-a", 3, 42L, 9000L)
    val bytes = QueueSplitSerializer.serialize(split)
    assert(QueueSplitSerializer.deserialize(QueueSplitSerializer.CurrentVersion, bytes) === split)
  }

  test("serializer round-trips boundary values and unicode topics") {
    val split = QueueSplit("主题-ü", "", 0, Long.MinValue, Long.MaxValue)
    val bytes = QueueSplitSerializer.serialize(split)
    assert(QueueSplitSerializer.deserialize(0, bytes) === split)
  }

  test("unknown version rejected") {
    val bytes = QueueSplitSerializer.serialize(QueueSplit("t", "b", 0, 0, 1))
    assertThrows[IllegalArgumentException](QueueSplitSerializer.deserialize(7, bytes))
  }

  test("splitId is topic-broker-queue") {
    assert(QueueSplit("t", "b", 5, 0, 1).splitId === "t-b-5")
  }

  test("owner formula: clockwise from hash start, ascending queue ids cover readers evenly") {
    val numReaders = 4
    val owners = (0 until 8).map(q => SplitAssigner.getSplitOwner("topic", "broker", q, numReaders))
    // consecutive queues land on consecutive readers (mod numReaders)
    owners.sliding(2).foreach { case Seq(a, b) => assert((a + 1) % numReaders === b) }
    // 8 queues over 4 readers = exactly 2 each
    assert(owners.groupBy(identity).values.map(_.size).toSet === Set(2))
  }

  test("owner formula matches the reference computation") {
    val topic = "tp"; val broker = "bk"; val q = 3; val n = 5
    val start = (((topic + "-" + broker).hashCode * 31) & 0x7FFFFFFF) % n
    assert(SplitAssigner.getSplitOwner(topic, broker, q, n) === (start + q) % n)
  }

  test("enum state round-trips reader assignments (mirrors reference serializer test)") {
    val state = EnumState(Map(
      0 -> Seq(QueueSplit("t", "b", 0, 0, 100), QueueSplit("t", "b", 2, 5, 200)),
      1 -> Seq(QueueSplit("t", "b", 1, 0, 100)),
      2 -> Seq.empty))
    val bytes = EnumStateSerializer.serialize(state)
    assert(EnumStateSerializer.deserialize(0, bytes) === state)
    assertThrows[IllegalArgumentException](EnumStateSerializer.deserialize(3, bytes))
  }

  test("assign + serialize + restore preserves the full assignment") {
    val splits = for (q <- 0 until 8) yield QueueSplit("topic", "file", q, 0, 50)
    val assigned = SplitAssigner.assign(splits, 3)
    val restored = EnumStateSerializer.deserialize(0,
      EnumStateSerializer.serialize(EnumState(assigned)))
    assert(restored.currentAssignment.values.flatten.toSet === splits.toSet)
  }

  test("assign groups all splits with no loss") {
    val splits = for (t <- Seq("a", "b"); q <- 0 until 6)
      yield QueueSplit(t, "file", q, 0, 10)
    val assigned = SplitAssigner.assign(splits, 3)
    assert(assigned.values.flatten.toSet === splits.toSet)
    assert(assigned.keySet.subsetOf((0 until 3).toSet))
  }
}
