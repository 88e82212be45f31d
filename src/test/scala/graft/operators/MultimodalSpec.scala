package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Seq(
      (1L, "image", Multimodal.encodeStub(64, 48, 3)),
      (2L, "image", Multimodal.encodeStub(128, 128, 1)),
      (3L, "video", Multimodal.encodeStub(32, 32, 3)),
      (4L, "image", Array[Byte](1, 2, 3)) // corrupt: too short for a header
    ).toDF("media_id", "modality", "content")
  }

  test("withDecodedMeta adds a typed struct; corrupt content yields null meta") {
    val out = Multimodal.withDecodedMeta(media)
    assert(out.schema("meta").dataType === Multimodal.MetaType)
    val byId = out.select(col("media_id"), col("meta")).collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    assert(byId(1L).getInt(0) === 64 && byId(1L).getInt(1) === 48 && byId(1L).getInt(2) === 3)
    assert(byId(2L).getInt(0) === 128)
    assert(byId(4L) === null)
  }

  test("decode is a narrow transform — partition count unchanged, no shuffle") {
    val repartitioned = media.repartition(3)
    val out = Multimodal.withDecodedMeta(repartitioned)
    assert(out.rdd.getNumPartitions === 3)
    // decode itself adds no Exchange beyond the explicit repartition
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.contains("Exchange")) === 1)
  }

  test("resize rewrites the header and keeps other columns intact") {
    val out = Multimodal.resize(media.filter(col("media_id") === 1), 16, 16)
    val row = out.collect().head
    val (w, h, c) = Multimodal.decodeStub(row.getAs[Array[Byte]](2))
    assert((w, h, c) === ((16, 16, 3)))
    assert(row.getLong(0) === 1L && row.getString(1) === "image")
  }

  test("resize is deterministic") {
    val a = Multimodal.resize(media, 8, 8).collect().map(_.getAs[Array[Byte]](2).toSeq)
    val b = Multimodal.resize(media, 8, 8).collect().map(_.getAs[Array[Byte]](2).toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("sampleFrames explodes every Nth frame with indices") {
    val out = Multimodal.sampleFrames(media.filter(col("media_id") === 3), frameSize = 100, everyN = 2)
    val rows = out.select(col("frame_idx"), length(col("frame"))).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).forall(_ % 2 === 0))
    // payload = min(32*32*3, 4096) = 3072 bytes → 31 frames → 16 kept (0,2,…,30)
    assert(rows.length === 16)
  }

  test("embedContent emits fixed-dim float vectors, null for null content") {
    val out = Multimodal.embedContent(media, dim = 8)
    assert(out.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
    val embs = out.select("embedding").collect().map(_.getSeq[Float](0))
    assert(embs.forall(_.length === 8))
    // deterministic
    val again = Multimodal.embedContent(media, dim = 8)
      .select("embedding").collect().map(_.getSeq[Float](0))
    assert(embs.toSeq === again.toSeq)
  }

  test("multimodalFrames entry: even frame indices only, bounded lengths, stable") {
    val rows = Multimodal.multimodalFrames(spark, sfDir).limit(60).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) % 2 === 0) // sampleFrames keeps every 2nd frame
      assert(r.getInt(2) > 0 && r.getInt(2) <= 256)
      // unsigned byte sum of a frame is bounded by 250 * len (stub bytes < 251)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 250L * r.getInt(2))
    }
  }

  test("full pipeline: decode -> resize -> embed keeps schema contract") {
    val out = Multimodal.embedContent(
      Multimodal.withDecodedMeta(
        Multimodal.resize(media.filter(col("media_id") =!= 4), 16, 16)))
    assert(out.columns.toSeq === Seq("media_id", "modality", "content", "meta", "embedding"))
    assert(out.count() === 3)
    assert(out.filter(col("meta").isNull).count() === 0)
  }
}
