package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scratch phase profiler for the bigram-explode family (test scope).
  * Usage: sbt "Test/runMain graft.operators.ProfBigramMain <sfDir>" */
object ProfBigramMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("prof-bigram").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("warmup") { CorpusPipeline.corpusBigramLogProb(spark, dir).count() }
    for (i <- 1 to 2)
      t(s"full_entry_$i") { CorpusPipeline.corpusBigramLogProb(spark, dir).count() }
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    for (i <- 1 to 2)
      t(s"bigram_count_only_$i") { println("  rows=" + bigrams.count()) }
    for (i <- 1 to 2)
      t(s"bigram_groupby_$i") {
        bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12")).count()
      }
    spark.stop()
  }
}
