package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.source.{Message, TopicLog}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {

  test("gap-based sessions close on timeout; state drains as watermark advances") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val sessions = Sessionize.sessions(input.toDS(), gapMs = 10000, watermarkDelayMs = 0)

    val outName = "sessions_" + System.nanoTime()
    val q = sessions.writeStream.format("memory").queryName(outName)
      .outputMode("append").start()
    try {
      // user 1: two events 5s apart (one session); user 2: one event
      input.addData(
        UserEvent(1L, new Timestamp(10000), 1.0),
        UserEvent(1L, new Timestamp(15000), 2.0),
        UserEvent(2L, new Timestamp(12000), 5.0))
      q.processAllAvailable()
      // advance watermark far enough to time both sessions out
      input.addData(UserEvent(99L, new Timestamp(100000), 0.0))
      q.processAllAvailable()
      input.addData(UserEvent(99L, new Timestamp(200000), 0.0))
      q.processAllAvailable()

      val rows = spark.table(outName).as[UserSession].collect()
        .filter(_.user_id < 99).sortBy(_.user_id)
      assert(rows.length === 2)
      val u1 = rows(0)
      assert(u1.user_id === 1L && u1.n_events === 2 && u1.sum_value === 3.0)
      assert(u1.start_ts.getTime === 10000 && u1.end_ts.getTime === 15000)
      val u2 = rows(1)
      assert(u2.user_id === 2L && u2.n_events === 1 && u2.sum_value === 5.0)
    } finally q.stop()
  }

  test("a gap larger than gapMs splits one user's events into two sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val sessions = Sessionize.sessions(input.toDS(), gapMs = 3000, watermarkDelayMs = 0)
    val outName = "sessions2_" + System.nanoTime()
    val q = sessions.writeStream.format("memory").queryName(outName)
      .outputMode("append").start()
    try {
      input.addData(
        UserEvent(7L, new Timestamp(1000), 1.0),
        UserEvent(7L, new Timestamp(2000), 1.0),
        UserEvent(7L, new Timestamp(20000), 1.0)) // > 3s gap → new session
      q.processAllAvailable()
      input.addData(UserEvent(99L, new Timestamp(500000), 0.0))
      q.processAllAvailable()
      input.addData(UserEvent(99L, new Timestamp(900000), 0.0))
      q.processAllAvailable()
      val rows = spark.table(outName).as[UserSession].collect().filter(_.user_id === 7L)
      assert(rows.length === 2)
      assert(rows.map(_.n_events).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("watermarked dropDuplicates on the mq stream removes replayed keys") {
    val root = Files.createTempDirectory("graft-dd").toString
    TopicLog.append(root, "dd", 0, Iterator(
      Message(10000, "k1", "t", Map.empty, "a"),
      Message(11000, "k2", "t", Map.empty, "b"),
      Message(12000, "k1", "t", Map.empty, "a-replay"), // duplicate key
      Message(13000, "k3", "t", Map.empty, "c")))
    val outName = "dd_" + System.nanoTime()
    val q = spark.readStream.format("graft-mq")
      .option("topic", "dd").option("consumerGroup", "g").option("rootDir", root)
      .option("offsetResetTo", "earliest").load()
      .withWatermark("born_ts", "5 seconds")
      .dropDuplicates("msg_key")
      .writeStream.format("memory").queryName(outName)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val keys = spark.table(outName).select("msg_key").collect().map(_.getString(0)).sorted
    assert(keys.toSeq === Seq("k1", "k2", "k3"))
  }
}
