package graft

/** Scratch stage profiler for ngram_jaccard (test scope, not shipped).
  * Run: `sbt "Test/runMain graft.ProfJaccard [sfDir]"` */
object ProfJaccard {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.operators._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.props("graft.bench") = "1"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir).localCheckpoint()
    println(s"[prof] docs: ${docs.count()}")
    t("warm entry") { SparkEntry.queries("ngram_jaccard")(spark, dir)
      .write.format("noop").mode("overwrite").save() }
    t("entry again") { SparkEntry.queries("ngram_jaccard")(spark, dir)
      .write.format("noop").mode("overwrite").save() }
    val sigs = t("sigs ckpt") {
      Dedup.minHashSignatures(docs).localCheckpoint()
    }
    val bands = Dedup.lshBands(sigs, "doc_id", 16, 64)
    val rawPairs = t("band self-join + distinct ckpt") {
      bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
        .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash"))
          .hint("shuffle_hash"), Seq("band", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct().localCheckpoint()
    }
    println(s"[prof] distinct band pairs: ${rawPairs.count()}")
    val est = graft.functions.GraftFunctions.sigEqualFraction(col("sig_a"), col("sig_b"))
    val cand = t("est prefilter ckpt") {
      rawPairs
        .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
        .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
        .filter(est >= 0.35)
        .select("doc_a", "doc_b").localCheckpoint()
    }
    println(s"[prof] est survivors: ${cand.count()}")
    t("shingle verify") {
      val candIds = cand.select(col("doc_a").as("doc_id"))
        .union(cand.select(col("doc_b").as("doc_id"))).distinct()
      val sh = docs.join(candIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), Dedup.shingleHashes(col("text"), 4).as("shs"))
        .filter(size(col("shs")) > 0)
      val out = cand
        .join(sh.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
        .withColumn("common",
          graft.functions.GraftFunctions.sortedIntersectSize(col("shs_a"), col("shs_b")))
        .withColumn("jaccard",
          round(col("common").cast("double") /
            (size(col("shs_a")) + size(col("shs_b")) - col("common")), 4))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard").distinct()
      out.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
