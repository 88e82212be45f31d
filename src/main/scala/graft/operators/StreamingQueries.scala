package graft.operators

import graft.streaming.Watermarks
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/**
 * Oracle-checked STREAMING query: the events table consumed through
 * Structured Streaming's file source with a watermark and a tumbling
 * event-time window, drained with Trigger.AvailableNow into a memory sink.
 * The result must equal the batch oracle — proving the streaming pipeline
 * (watermark bookkeeping included) computes the same answer as SQL over the
 * same data, which is the whole promise of the unified engine.
 */
object StreamingQueries {

  /** The file stream source monitors a directory; expose the single parquet
    * file through a per-input temp dir symlink (absolute target — a relative
    * one would dangle from /tmp). Reused across calls, cleaned at JVM exit. */
  /**
   * Stateful streaming freezes the state-store partition count to
   * spark.sql.shuffle.partitions at first run, and every micro-batch pays a
   * per-partition state checkpoint fsync — at 32 partitions that overhead
   * dominated a ~100k-row drain (7.4s vs 2.1s measured at sf0.1). Size the
   * stream's shuffle to the state, run, restore the session conf. A real
   * deployment sizes this to keys-per-partition instead; the inputs here are
   * small enough that 8 is already fsync-bound, not state-bound.
   */
  private[operators] def withStreamShuffle[T](spark: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    val target = math.min(n, prev.toInt)
    spark.conf.set(key, target.toString)
    try body finally spark.conf.set(key, prev)
  }

  /** [[withStreamShuffle]] plus AQE off: a foreachBatch body whose plan is
    * candidate-sized by construction (trigger-bounded batch, broadcast or
    * pre-sized joins) gains nothing from runtime re-planning but pays an
    * extra driver round per shuffle stage per micro-batch — measurable
    * latency when the per-batch work is seconds, not minutes. AQE stays on
    * everywhere else (it is the skew/size safety net for data-bound plans). */
  private[operators] def withMicroBatchPlanConf[T](spark: SparkSession, n: Int)(body: => T): T = {
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    try withStreamShuffle(spark, n)(body) finally spark.conf.set(aqeKey, prevAqe)
  }

  private def symlinkDir(dir: String, prefix: String): String = {
    val abs = java.nio.file.Paths.get(s"$dir/events.parquet").toAbsolutePath
    val streamDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"$prefix-${math.abs(dir.hashCode)}")
    java.nio.file.Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    // the dir is shared read-only across JVMs (the link target is identical
    // for a given `dir`), so a lost create race is benign — swallow it
    if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      try java.nio.file.Files.createSymbolicLink(link, abs)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    streamDir.toFile.deleteOnExit()
    streamDir.toString
  }

  def eventsWindowedStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamDir = symlinkDir(dir, "graft-events-stream")
    val stream = Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .parquet(streamDir.toString))

    // integer-cents sum, same ulp-proofing as the batch twin (q9EventsHourly)
    val windowed = Watermarks.withBoundedOutOfOrderness(stream, "ts", 5000)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("cents")) / 100.0, 4).as("sum_value"))

    val name = "events_windowed_" + math.abs(dir.hashCode)
    withStreamShuffle(spark, 8) {
      val q = windowed.writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    spark.table(name)
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** Streaming twin of the batch `q26_hopping` entry: the same 2h/1h
    * SLIDING window aggregate driven through the micro-batch path with a
    * bounded-out-of-orderness watermark (shared oracle — one SQL defines
    * both). Each event updates size/slide = 2 open windows, so sliding
    * windows multiply state versus tumbling; at steady state the store
    * holds only windows the watermark hasn't closed. Complete mode +
    * AvailableNow flushes the full window table at drain end, which is
    * exactly the batch answer. */
  def eventsHoppingStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamDir = symlinkDir(dir, "graft-events-stream")
    val stream = Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .parquet(streamDir.toString))

    // integer-cents sum, same ulp-proofing as the batch twin (q26Hopping)
    val windowed = Watermarks.withBoundedOutOfOrderness(stream, "ts", 5000)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("cents")) / 100.0, 4).as("sum_value"))

    val name = "events_hopping_" + math.abs(dir.hashCode)
    withStreamShuffle(spark, 8) {
      val q = windowed.writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    spark.table(name)
      .select(col("window.start").as("win_start"), col("n"), col("sum_value"))
      .orderBy(col("win_start"))
  }

  /** Streaming twin of the batch `kmv_distinct` entry — and the sketch's
    * reason to exist on the stream: `countDistinct` is UNSUPPORTED in a
    * streaming aggregation (it needs the full value set per group), while
    * the bottom-k sketch is a bounded mergeable buffer the state store
    * persists like any other agg state — each micro-batch's partial
    * sketch merges into it, and the final sketch equals the batch answer
    * regardless of how the rows were split into batches. The exact
    * comparison column the shared oracle expects comes from a BATCH pass
    * after the drain (the stream itself never needs it). */
  def kmvDistinctStream(spark: SparkSession, dir: String, k: Int = 128): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamDir = symlinkDir(dir, "graft-events-stream")
    val stream = Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .parquet(streamDir.toString))

    val sketched = stream
      .groupBy(col("event_type"))
      .agg(graft.functions.GraftFunctions
        .bottomKPairs(Sketches.mixHash(col("user_id")), col("user_id"), k).as("sk"))

    val name = "events_kmv_" + math.abs(dir.hashCode)
    withStreamShuffle(spark, 8) {
      val q = sketched.writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    spark.table(name)
      .join(exact, "event_type")
      .select(
        col("event_type"),
        col("exact_users"),
        size(col("sk")).cast("long").as("n_sketch"),
        element_at(col("sk"), size(col("sk"))).getField("key").as("kth_key"),
        when(size(col("sk")) < k, col("exact_users") === size(col("sk")))
          .otherwise(
            abs(lit((k - 1).toDouble * 4294967296.0) / col("kth_key") - col("exact_users"))
              <= col("exact_users") * 0.3)
          .as("kmv_ok"))
      .orderBy(col("event_type"))
  }

  /**
   * Streaming stateful dedup parity: events streamed with a watermark +
   * dropDuplicates on the key, then aggregated — must equal batch
   * count(DISTINCT) SQL. Exercises the dedup state store end-to-end.
   */
  /**
   * Gap-based sessionization through the real stateful streaming path
   * ([[graft.streaming.Sessionize]], flatMapGroupsWithState + event-time
   * timeout), checked against DuckDB's batch islands-and-gaps SQL.
   *
   * Append-mode custom state only EMITS a session when it closes; the last
   * session of every user would stay open at end-of-stream (the watermark
   * never passes its timeout in an AvailableNow drain). A sentinel event
   * per user at max(ts) + 2×gap closes every real session through the
   * gap-split path — the sentinels' own sessions stay open and are never
   * emitted, so the output is exactly the batch answer.
   */
  def sessionizeStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.streaming.{Sessionize, UserEvent}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val gapMs = 12 * 3600 * 1000L
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val schema = raw.schema
    // Encoding-tagged dir: a /tmp sentinel written under the other ts
    // encoding (pre-regeneration events.parquet) must not be reused.
    val streamDir = symlinkDir(dir, s"graft-events-sess-${schema("ts").dataType.typeName}")
    val sentinelFile = java.nio.file.Paths.get(streamDir, "sentinels.parquet")
    if (!java.nio.file.Files.exists(sentinelFile)) {
      // The sentinel file must carry the SAME ts encoding as events.parquet
      // (the stream reads both under one schema) — compute max(ts)+2×gap in
      // expression land so no driver-side type branching is needed.
      val sentinelTs = schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          (col("max_ts") + lit(2 * gapMs * 1000000L)).as("ts")
        case _ =>
          expr(s"max_ts + INTERVAL '${2 * gapMs}' MILLISECOND").cast(schema("ts").dataType).as("ts")
      }
      val maxTs = raw.agg(max(col("ts")).as("max_ts"))
      val sentinels = raw.select(col("user_id")).distinct()
        .crossJoin(broadcast(maxTs))
        .select(
          (lit(-1L) - col("user_id")).as("event_id"),
          sentinelTs,
          col("user_id"),
          lit("__flush").as("event_type"),
          lit(0.0).as("value"),
          lit(null).cast(schema("props").dataType).as("props"))
      val tmpOut = java.nio.file.Files.createTempDirectory("graft-sess-sent")
      sentinels.coalesce(1).write.mode("overwrite").parquet(tmpOut.toString)
      val part = java.nio.file.Files.list(tmpOut).filter(_.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      java.nio.file.Files.move(part, sentinelFile)
    }
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(streamDir))
      .select(col("user_id"), col("ts"), col("value"))
    import spark.implicits._
    val sessions = Sessionize.sessions(stream.as[UserEvent], gapMs)

    val name = "events_sess_" + math.abs(dir.hashCode)
    withStreamShuffle(spark, 8) {
      val q = sessions.toDF().writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .select(col("user_id"), col("start_ts"), col("end_ts"),
        col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("user_id"), col("start_ts"))
  }

  def eventsDedupStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // NOTE: measured here, the default HDFS-backed in-memory state store
    // beats RocksDB ~4x at this scale (RocksDB's per-partition native store
    // setup dominates a single-batch local run); RocksDB wins only for
    // long-lived state far larger than executor heap.
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val streamDir = symlinkDir(dir, "graft-events-dd")
    val stream = Tables.normalizeEventTs(
      spark.readStream.schema(schema).parquet(streamDir.toString))
      .withWatermark("ts", "5 seconds")
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_events"))

    val name = "events_dedup_" + math.abs(dir.hashCode)
    withStreamShuffle(spark, 8) {
      val q = stream.writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Complete())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name).orderBy(col("event_type"))
  }
}
