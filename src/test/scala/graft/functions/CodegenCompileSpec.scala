package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Every custom expression claims real `doGenCode` — but a Janino compile
  * error in the generated Java does NOT fail a normal run: Spark logs a
  * warning and silently re-plans the stage interpreted, so a broken
  * template only shows up as a performance cliff (observed: the
  * generated simHash128 call omitted the kernel's defaulted `gramN`
  * argument, which Scala supplies but plain Java cannot — every simhash
  * stage quietly ran interpreted). This suite disables BOTH fallbacks so a
  * template that fails to compile fails the build instead. */
class CodegenCompileSpec extends SparkSpec {

  private def withCodegenOnly[A](body: => A): A = {
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try body
    finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("every custom expression compiles under forced codegen") {
    import spark.implicits._
    val planes = Array(Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, -0.6))
    val cents = Array(Array(0.0, 1.0, 0.0), Array(1.0, 0.0, 0.0))
    // repartition breaks the Project-over-LocalRelation pattern: without
    // it, ConvertToLocalRelation interpreted-evaluates the whole select on
    // the driver at optimization time and NO code is ever generated — the
    // suite would green-light a template that cannot compile
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog repeatedly", Array(0.1f, 0.2f, 0.3f)),
      ("another document with different text entirely here now", Array(0.9f, 0.1f, 0.0f)))
      .toDF("text", "emb")
      .repartition(2)
    val rows = withCodegenOnly {
      df.select(
          GraftFunctions.shingleHashes(col("text"), 4).as("sh"),
          GraftFunctions.minHashSig(col("text"), 4, 16, 42L).as("sig"),
          GraftFunctions.simHash64(col("text")).as("h64"),
          GraftFunctions.simHash128(col("text")).as("h128"),
          GraftFunctions.nfcNormalize(col("text")).as("nfc"),
          GraftFunctions.winnowFps(col("text"), 8, 4).as("fps"),
          TextAnalysisShim.signals(col("text")).as("sig_struct"),
          CharEntropy.entropy(col("text")).as("ent"),
          GraftFunctions.charGrams(col("text"), 3).as("grams3"),
          TextAnalysisShim.repetition(col("text")).as("rep"),
          GraftFunctions.cosineSim(col("emb"), col("emb")).as("cos"),
          GraftFunctions.hyperplaneBucket(col("emb"), planes).as("bkt"),
          GraftFunctions.hyperplaneBucketGen(col("emb"), 8, 7L).as("bktg"),
          GraftFunctions.ivfAssign(col("emb"), cents, 1).as("ivf"))
        .withColumn("isz", GraftFunctions.sortedIntersectSize(col("sh"), col("sh")))
        .withColumn("beq", GraftFunctions.sigEqualFraction(col("sig"), col("sig")))
        .withColumn("bands",
          GraftFunctions.simHashBandKeys128(
            element_at(col("h128"), 1), element_at(col("h128"), 2), 2))
        .collect()
    }
    assert(rows.length === 2)
    // spot-check values so the forced-codegen path produced the same
    // answers the interpreted path is tested for elsewhere
    assert(rows.forall(_.getAs[Double]("cos") > 0.99))
    assert(rows.forall(r => r.getAs[Int]("isz") === r.getAs[Seq[Long]]("sh").length))
    assert(rows.forall(_.getAs[Double]("beq") === 1.0))
  }
}

/** The two struct-emitting kernels live behind operator-internal helpers;
  * mirror their Column wiring here so the suite drives the same
  * expressions the operators plan. */
private object TextAnalysisShim {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim
  def signals(c: Column): Column =
    ColumnShim.column(TextSignalsExpr(ColumnShim.expression(c)))
  def repetition(c: Column): Column =
    ColumnShim.column(TextRepetitionExpr(ColumnShim.expression(c)))
}
