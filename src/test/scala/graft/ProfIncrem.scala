package graft

/**
 * Phase profiler for `dedup_incremental_stream` — test-scoped tooling (not
 * part of the shipped jar). Breaks the entry into its phases (sink write,
 * history signatures, history bands, per-batch cross-dedup, stream drain)
 * and times each one.
 *
 * Run: `sbt "Test/runMain graft.ProfIncrem [sfDir]"`
 * Default sfDir: /root/testdata/sf0.1; threads via SPARK_GRAFT_CPUS.
 */
object ProfIncrem {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.bench") = "1"
    spark.range(1000).selectExpr("sum(id)").collect()

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }

    // warm run end to end first
    t("warm full entry") {
      SparkEntry.queries("dedup_incremental_stream")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    t("full entry again") {
      SparkEntry.queries("dedup_incremental_stream")(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }

    import graft.operators._
    import graft.sink.{DefaultTopicSelector, MessageQueueSink, RowMessageConverter}
    import graft.source.TopicLog
    val soh = graft.serde.Delimiters.Soh
    val root = graft.util.Fs.processScopedTmpDir("prof-increm").toString
    val topic = "docs_increm"
    val all = Tables.documents(spark, dir)
    val newDocs = all.filter(col("doc_id") % 3 === 0).select(col("doc_id"), col("text"))
    val history = all.filter(col("doc_id") % 3 =!= 0)
    t("sink write") {
      TopicLog.deleteTopic(root, topic)
      val conv = new RowMessageConverter(
        newDocs.schema, fieldDelimiter = soh,
        keyColumns = Seq("doc_id"), writeKeysToBody = true)
      MessageQueueSink.write(
        newDocs, root, new DefaultTopicSelector[Map[String, Any]](topic), conv, numQueues = 8)
    }
    val oldSigs = t("history sigs") { Dedup.minHashSignatures(history).localCheckpoint() }
    val oldBands = t("history bands") { Some(Dedup.historyLshBands(oldSigs).localCheckpoint()) }
    val nNew = t("count") { newDocs.count() }
    val quarter = newDocs.filter(col("doc_id") % 12 === 0)
    t("one batch cross shuffle-plan (1/4 docs, incl parquet write)") {
      Dedup.crossNearDupsWithHistorySigs(quarter, history, oldSigs, historyBands = oldBands)
        .write.mode("overwrite").parquet(root + "/prof-out")
    }
    t("one batch cross broadcast-plan") {
      Dedup.crossNearDupsWithHistorySigs(quarter, history, oldSigs, historyBands = oldBands,
          broadcastBatch = true)
        .write.mode("overwrite").parquet(root + "/prof-out")
    }
    t("one batch cross broadcast-plan again") {
      Dedup.crossNearDupsWithHistorySigs(quarter, history, oldSigs, historyBands = oldBands,
          broadcastBatch = true)
        .write.mode("overwrite").parquet(root + "/prof-out")
    }
    // ---- per-batch plan variants, min-of-2 each ----
    locally {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      def oneCross(bcast: Boolean): Unit =
        Dedup.crossNearDupsWithHistorySigs(quarter, history, oldSigs, historyBands = oldBands,
            broadcastBatch = bcast)
          .write.mode("overwrite").parquet(root + "/prof-out")
      for (aqe <- Seq("true", "false"); bcast <- Seq(false, true)) {
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); oneCross(bcast); (System.nanoTime()-t0)/1e9
        }
        println(f"[prof]   variant aqe=$aqe bcast=$bcast: min ${times.min}%.2f s (${times.map(x => f"$x%.2f").mkString(",")})")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    t("stream drain only") {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      try {
        val q = spark.readStream.format("graft-mq")
          .option("topic", topic).option("consumerGroup", "prof")
          .option("rootDir", root).option("offsetResetTo", "earliest")
          .option("maxRowsPerTrigger", (nNew / 4 + 1).toString)
          .load()
          .select(split(col("body"), soh).as("f"))
          .select(element_at(col("f"), 1).cast("long").as("doc_id"),
            element_at(col("f"), 2).as("text"))
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val t0 = System.nanoTime()
            Dedup.crossNearDupsWithHistorySigs(batch, history, oldSigs, historyBands = oldBands,
                broadcastBatch = true)
              .write.mode("overwrite").parquet(s"$root/prof-out/batch=$batchId")
            println(f"[prof]   batch $batchId: ${(System.nanoTime()-t0)/1e9}%.2f s")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
