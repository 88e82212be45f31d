package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch phase profiler for corpus_assemble (test scope, not shipped).
  * Usage: sbt "Test/runMain graft.operators.ProfAssembleMain <sfDir>" */
object ProfAssembleMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("prof-assemble").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup_full_entry") {
      CorpusPipeline.corpusAssemble(spark, dir).count()
    }
    for (i <- 1 to 2) t(s"full_entry_$i") {
      CorpusPipeline.corpusAssemble(spark, dir).count()
    }
    // phase-by-phase replica of assembleCorpus's stages
    val all = Tables.documents(spark, dir)
    val docs = all.filter(col("doc_id") % 97 =!= 0)
    val benchmark = all.filter(col("doc_id") % 97 === 0)
    val kept = t("quality_filter") {
      val k = docs.join(CorpusPipeline.qualityFilter(docs).select("doc_id"),
        Seq("doc_id"), "left_semi").localCheckpoint()
      k.count(); k
    }
    val decon = t("decontaminate") {
      val d = CorpusPipeline.decontaminate(kept, benchmark).localCheckpoint()
      d.count(); d
    }
    val cfrac = t("cfrac_join") {
      val c = kept
        .select(col("doc_id"),
          size(Dedup.shingleHashes(col("text"), 8)).cast("long").as("n_grams"))
        .join(decon, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("n_grams") === 0, lit(0.0))
            .otherwise(round(coalesce(col("shared_grams"), lit(0L)).cast("double")
              / col("n_grams"), 4)).as("cfrac"))
        .localCheckpoint()
      c.count(); c
    }
    t("hist_cut") {
      cfrac.groupBy("cfrac").agg(count(lit(1)).as("c")).count()
    }
    spark.stop()
  }
}
