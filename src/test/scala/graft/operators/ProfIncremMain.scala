package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch phase profiler for dedup_incremental_stream (test scope, not
  * shipped). Usage: sbt "Test/runMain graft.ProfIncremMain <sfDir>" */
object ProfIncremMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("prof-increm").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the JVM/codegen paths once
    t("warmup_full_entry") {
      graft.operators.MqRoundtrip.dedupIncrementalStream(spark, dir).count()
    }
    // phase-by-phase replica of the entry
    
    val root = java.nio.file.Files.createTempDirectory("prof-mq").toString
    val topic = "docs_increm"
    val all = Tables.documents(spark, dir)
    val newDocs = all.filter(col("doc_id") % 3 === 0).select(col("doc_id"), col("text"))
    val history = all.filter(col("doc_id") % 3 =!= 0)
    val conv = new graft.sink.RowMessageConverter(
      newDocs.schema, fieldDelimiter = "\u0001",
      keyColumns = Seq("doc_id"), writeKeysToBody = true)
    t("sink_write") {
      graft.sink.MessageQueueSink.write(
        newDocs, root, new graft.sink.DefaultTopicSelector[Map[String, Any]](topic),
        conv, numQueues = 8)
    }
    val oldSigs = t("sign_history") {
      val s = Dedup.minHashSignatures(history).localCheckpoint(); s.count(); s
    }
    val oldBands = t("band_history") {
      val b = Dedup.historyLshBands(oldSigs).localCheckpoint(); b.df.count(); Some(b)
    }
    val nNew = newDocs.count()
    val trigger = math.max(50L, nNew / 4 + 1)
    val broadcastBatch = oldSigs.count() > 50L * trigger
    println(s"[prof] nNew=$nNew trigger=$trigger broadcastBatch=$broadcastBatch")
    // one synthetic micro-batch: first quarter of newDocs, run the per-batch body
    val batch = newDocs.limit(trigger.toInt).localCheckpoint()
    for (i <- 1 to 3) t(s"one_batch_body_$i") {
      StreamingQueries.withMicroBatchPlanConf(spark, 8) {
        Dedup.crossNearDupsWithHistorySigs(batch, history, oldSigs,
            historyBands = oldBands, broadcastBatch = broadcastBatch)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/out/batch=$i")
      }
    }
    for (i <- 1 to 2) t(s"one_batch_body_bcast_$i") {
      StreamingQueries.withMicroBatchPlanConf(spark, 8) {
        Dedup.crossNearDupsWithHistorySigs(batch, history, oldSigs,
            historyBands = oldBands, broadcastBatch = true)
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$root/outb/batch=$i")
      }
    }
    t("stream_overhead_total") {
      MqRoundtrip.dedupIncrementalStream(spark, dir).count()
    }
    spark.stop()
  }
}
