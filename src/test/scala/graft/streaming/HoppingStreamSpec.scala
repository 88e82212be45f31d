package graft.streaming

import graft.SparkSpec
import graft.operators.{Relational, StreamingQueries}

/** The streaming sliding-window entry's CONTRACT is equality with the batch
  * q26_hopping answer (they share one oracle SQL) — pinned here row for
  * row, so a drift in either side's window/watermark semantics fails the
  * suite before it fails the correctness gate. */
class HoppingStreamSpec extends SparkSpec {
  test("events_hopping_stream equals the batch hopping-window answer") {
    val stream = StreamingQueries.eventsHoppingStream(spark, sfDir)
    val batch = Relational.q26Hopping(spark, sfDir)
      .withColumnRenamed("win_start", "win_start")
    assert(stream.schema.fieldNames.toSeq === Seq("win_start", "n", "sum_value"))
    assert(stream.exceptAll(batch.toDF(stream.columns.toIndexedSeq: _*)).isEmpty &&
      batch.toDF(stream.columns.toIndexedSeq: _*).exceptAll(stream).isEmpty,
      "stream and batch hopping windows disagree")
  }
}
