package graft.streaming

import graft.SparkSpec
import graft.functions.GraftFunctions
import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** The streaming claim of `kmv_distinct_stream` is that the sketch state
  * MERGES across micro-batches — each batch contributes a partial sketch
  * and the final buffer equals the single-pass batch answer no matter how
  * the rows were split. The entry's AvailableNow drain over one parquet
  * file may admit everything in one batch, which would leave that claim
  * untested; this spec forces one file per micro-batch and compares
  * against the batch aggregate over the same rows. */
class KmvStreamSpec extends SparkSpec {

  test("sketch state merges across micro-batches == single-pass batch answer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kmv-stream").toFile
    dir.deleteOnExit()
    // 3 files -> 3 micro-batches; overlapping user sets so cross-batch
    // dedup inside the sketch actually matters
    Seq.tabulate(3) { f =>
      (0 until 200).map(i => (s"t${i % 2}", (f * 120 + i).toLong))
    }.zipWithIndex.foreach { case (rows, f) =>
      rows.toDF("event_type", "user_id")
        .coalesce(1).write.parquet(s"$dir/part-$f")
    }

    val schema = spark.read.parquet(s"$dir/part-0").schema
    val sk = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy(col("event_type"))
      .agg(GraftFunctions
        .bottomKPairs(Sketches.mixHash(col("user_id")), col("user_id"), 16).as("sk"))

    val name = "kmv_merge_test"
    val q = sk(spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/part-*"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      "expected at least 3 non-empty micro-batches")

    def rendered(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"),
        concat_ws(",", transform(col("sk"),
          p => concat(p.getField("key"), lit(":"), p.getField("payload")))).as("s"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

    val streamed = rendered(spark.table(name))
    val batch = rendered(sk(spark.read.parquet(s"$dir/part-*")))
    assert(streamed === batch)
  }
}
