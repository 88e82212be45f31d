package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** State-store recovery parity: a stateful query stopped after ≥1 committed
  * batch and RESTARTED from the same checkpoint must produce the same final
  * answer as an uninterrupted run — with state that genuinely spans the
  * restart (a session whose events straddle the two runs; a join side
  * buffered before the restart and matched after). This is the recovery
  * path ExactlyOnceSpec's source/sink crash-replay matrix does not reach:
  * the flatMapGroupsWithState session state and the stream-stream join
  * buffers live in the state store, not the offset/epoch ledgers. Restart
  * recovery always loads state from the checkpoint — the same path a
  * crash-recovery restart takes after its WAL replay (the replay itself is
  * pinned by ExactlyOnceSpec). */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("sessionize: session state spanning a restart merges into ONE session") {
    val inDir = tmp("graft-restart-sess-in")
    val outDir = tmp("graft-restart-sess-out")
    val ckpt = tmp("graft-restart-sess-ckpt")
    def ts(s: Long) = new Timestamp(s * 1000)
    def run(): Unit = {
      val schema = Seq.empty[UserEvent].toDS().schema
      val stream = spark.readStream.schema(schema).parquet(inDir).as[UserEvent]
      val q = Sessionize.sessions(stream, gapMs = 10000, watermarkDelayMs = 0)
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // sentinels carry value 0.0; their own (zero-sum) sessions may close
    // via timeout once later events advance the watermark — exclude them,
    // they exist only to gap-split the real sessions
    def sessions(): Seq[(Long, Long, Long, Long)] =
      spark.read.parquet(outDir)
        .filter(col("sum_value") =!= 0.0)
        .select(col("user_id"), col("start_ts"), col("end_ts"), col("n_events"))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
          r.getTimestamp(2).getTime / 1000, r.getLong(3)))
        .toSeq.sorted

    // phase 1: users 1,2 close via per-user sentinel gap-splits (same
    // mechanism as the production entry); user 3's session stays OPEN in
    // the state store when the query stops
    Seq(
      UserEvent(1L, ts(10), 1.0), UserEvent(1L, ts(15), 2.0),
      UserEvent(2L, ts(12), 5.0),
      UserEvent(3L, ts(50), 7.0),
      UserEvent(1L, ts(40), 0.0), // sentinel: closes u1 (gap > 10s)
      UserEvent(2L, ts(35), 0.0)  // sentinel: closes u2
    ).toDS().write.mode("append").parquet(inDir)
    run()
    assert(sessions() === Seq((1L, 10L, 15L, 2L), (2L, 12L, 12L, 1L)),
      "phase 1 must commit the two closed sessions")
    // ≥1 committed batch in the checkpoint before the restart
    assert(Files.list(java.nio.file.Paths.get(ckpt, "commits")).count() >= 1)

    // phase 2: u3 continues WITHIN the 10s gap — only restored state can
    // merge (50s) and (55s) into one session; its sentinel closes it
    Seq(
      UserEvent(3L, ts(55), 1.0),
      UserEvent(3L, ts(90), 0.0) // sentinel: closes u3
    ).toDS().write.mode("append").parquet(inDir)
    run()
    val after = sessions()
    assert(after.contains((3L, 50L, 55L, 2L)),
      s"u3's session must span the restart as ONE merged session, got $after")
    assert(after.count(_._1 == 3L) === 1, s"u3 must not split across the restart: $after")
    // phase-1 sessions are not re-emitted (file-sink exactly-once)
    assert(after.count(_._1 == 1L) === 1 && after.count(_._1 == 2L) === 1)
  }

  test("stream-stream interval join: a side buffered before the restart matches after it") {
    val inDir = tmp("graft-restart-join-in")
    val outDir = tmp("graft-restart-join-out")
    val ckpt = tmp("graft-restart-join-ckpt")
    val H = 3600L
    def ev(id: Long, tsSec: Long, user: Long, typ: String, v: Double) =
      (id, new Timestamp(tsSec * 1000), user, typ, v)
    def write(rows: Seq[(Long, Timestamp, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(inDir)
    def run(): Unit = withStreamShuffle(4) {
      val schema = Seq(ev(0L, 0L, 0L, "x", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value").schema
      val src = spark.readStream.schema(schema).parquet(inDir)
      val purchases = src.filter(col("event_type") === "purchase")
        .select(col("user_id").as("l_user"), col("ts").as("l_ts"),
          col("event_id").as("purchase_id"))
        .withWatermark("l_ts", "1 hour")
      val views = src.filter(col("event_type") =!= "purchase")
        .select(col("user_id").as("r_user"), col("ts").as("r_ts"),
          col("event_id").as("view_id"))
        .withWatermark("r_ts", "1 hour")
      val q = purchases.join(views, expr(
          "l_user = r_user AND r_ts <= l_ts AND r_ts >= l_ts - INTERVAL 6 HOURS"))
        .select(col("l_user").as("user_id"), col("purchase_id"), col("view_id"))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // phase 1: two views only — both sides' state stores now hold buffered
    // rows and the query stops with NOTHING emitted
    write(Seq(ev(1L, 10 * H, 1L, "view", 0.0), ev(2L, 10 * H + 300, 2L, "view", 0.0)))
    run()
    assert(Files.list(java.nio.file.Paths.get(ckpt, "commits")).count() >= 1)
    assert(spark.read.schema("user_id long, purchase_id long, view_id long")
      .parquet(outDir).count() === 0)

    // phase 2: the purchase arrives 1h later (ahead of the restored
    // watermark) — it can only match the view RESTORED from phase-1 state;
    // a late watermark-pusher finalizes the join
    write(Seq(ev(3L, 11 * H, 1L, "purchase", 9.99), ev(4L, 20 * H, 9L, "view", 0.0)))
    run()
    val joined = spark.read.parquet(outDir)
      .select(col("user_id"), col("purchase_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(joined === Seq((1L, 3L, 1L)),
      s"the phase-2 purchase must join the phase-1 buffered view exactly once, got $joined")
  }

  /** Local analog of StreamingQueries' stream-shuffle sizing (that helper is
    * operators-private): state-store partition count tracks the state, not
    * the session default. */
  private def withStreamShuffle[T](n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
