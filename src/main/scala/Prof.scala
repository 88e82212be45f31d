import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def t(name: String)(body: => Long): Unit = {
    val t0 = System.nanoTime(); val n = body
    println(f"$name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = graft.operators.Tables.documents(spark, dir)
    docs.count()
    t("sigs only") { graft.operators.Dedup.minHashSignatures(docs).count() }
    t("bands") { graft.operators.Dedup.lshBands(graft.operators.Dedup.minHashSignatures(docs)).count() }
    val sigs = graft.operators.Dedup.minHashSignatures(docs)
    val bands = graft.operators.Dedup.lshBands(sigs)
    t("candidates") {
      bands.select(col("doc_id").as("doc_a"), col("band"), col("band_hash"))
        .join(bands.select(col("doc_id").as("doc_b"), col("band"), col("band_hash")), Seq("band", "band_hash"))
        .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct().count()
    }
    t("full minHashNearDups") { graft.operators.Dedup.minHashNearDups(docs).count() }
    spark.stop()
  }
}
