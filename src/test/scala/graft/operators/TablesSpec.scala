package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * The events.parquet testdata has shipped with two physical ts encodings:
 * TIMESTAMP(NANOS) (readable only via spark.sql.legacy.parquet.nanosAsLong,
 * which surfaces it as a raw long of nanos) and plain timestamp[us]
 * (surfaced as TIMESTAMP_NTZ — the file carries no UTC-adjustment flag).
 * [[Tables.events]] / [[Tables.normalizeEventTs]] must load BOTH to the
 * exact same µs-precision TimestampType values, or every event-time query
 * silently breaks when the driver regenerates the testdata (round-9
 * regression). Spark cannot WRITE nanos parquet, so the legacy path is
 * exercised the way it actually manifests: a long column of nanoseconds.
 */
class TablesSpec extends SparkSpec {

  private val micros: Seq[(Long, Long)] = Seq(
    // (event_id, ts in µs) — includes a non-integral-ms value to catch
    // any double-division precision loss in the ns→µs conversion
    (1L, 1700000000000001L),
    (2L, 1700003600123456L),
    (3L, 1700007199999999L))

  private def writeFixture(suffix: String)(build: => org.apache.spark.sql.DataFrame): String = {
    val out = java.nio.file.Files.createTempDirectory(s"graft-tables-$suffix").toString
    build.coalesce(1).write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  test("events loads nanos-as-long and native timestamp encodings to identical µs values") {
    import spark.implicits._
    val longDir = writeFixture("long") {
      micros.map { case (id, us) => (id, us * 1000L) }.toDF("event_id", "ts")
    }
    val ntzDir = writeFixture("ntz") {
      micros.toDF("event_id", "us")
        .select(col("event_id"),
          timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    }

    val fromLong = Tables.events(spark, longDir)
    val fromNtz  = Tables.events(spark, ntzDir)
    assert(fromLong.schema("ts").dataType === TimestampType)
    assert(fromNtz.schema("ts").dataType === TimestampType)

    def us(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val expected = micros.toMap
    assert(us(fromLong) === expected)
    assert(us(fromNtz) === expected)
  }

  test("documents/embeddings loaders normalize narrow integer encodings to long") {
    import spark.implicits._
    val docDir = writeFixture("docs32") {
      Seq((1, "en", 10, "hello world"), (2, "de", 5, "hallo"))
        .toDF("doc_id", "lang", "n_chars", "text")
        .select(col("doc_id").cast(IntegerType), col("lang"),
          col("n_chars").cast(IntegerType), col("text"))
    }
    // reuse the events.parquet-named fixture dir for a documents table
    val src = java.nio.file.Paths.get(docDir, "events.parquet")
    val dst = java.nio.file.Paths.get(docDir, "documents.parquet")
    java.nio.file.Files.move(src, dst)
    val docs = Tables.documents(spark, docDir)
    assert(docs.schema("doc_id").dataType === LongType)
    assert(docs.schema("n_chars").dataType === LongType)
    assert(docs.count() === 2)
  }

  test("events on the real testdata yields µs TimestampType") {
    val ev = Tables.events(spark, sfDir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.count() > 0)
    // values are in a sane epoch range (not off by 1000× from a unit mixup)
    val yr = ev.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(yr.getInt(0) >= 1990 && yr.getInt(1) <= 2100)
  }
}
