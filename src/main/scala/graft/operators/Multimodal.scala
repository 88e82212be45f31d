package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal column handling: image/audio/video travel as opaque `binary`
 * columns plus a typed metadata struct; decode / resize / frame-sample /
 * feature-extract run per-partition over batches of rows — the same batch
 * shape a real codec (libjpeg/ffmpeg via a vectorized UDF) would use, so the
 * Spark-side plumbing (schema, partitioning, no shuffle in the decode stage)
 * is real even though the codecs here are deterministic stubs (no media
 * libraries ship in this environment).
 *
 * Stub wire format (12-byte header + payload):
 * bytes 0-3 width, 4-7 height, 8-11 channels (big-endian ints).
 */
object Multimodal {

  val MetaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  /** Deterministic stub encode: header + rep-count payload. */
  def encodeStub(width: Int, height: Int, channels: Int): Array[Byte] = {
    import graft.serde.ByteUtils
    val payload = new Array[Byte]((width * height * channels) min 4096)
    var i = 0
    while (i < payload.length) { payload(i) = ((i * 31 + width) % 251).toByte; i += 1 }
    ByteUtils.fromInt(width) ++ ByteUtils.fromInt(height) ++ ByteUtils.fromInt(channels) ++ payload
  }

  /** Stub decode: parse the 12-byte header (a real impl would parse the
    * JPEG/PNG header); throws on short/corrupt content. */
  def decodeStub(content: Array[Byte]): (Int, Int, Int) = {
    import graft.serde.ByteUtils
    require(content != null && content.length >= 12, "corrupt media: missing header")
    (ByteUtils.toInt(content, 0), ByteUtils.toInt(content, 4), ByteUtils.toInt(content, 8))
  }

  /**
   * Add a typed `meta` struct decoded from `contentCol`. Runs mapPartitions
   * so a real codec could amortize per-batch init (model load, JNI handle);
   * corrupt rows yield a null meta rather than failing the job.
   */
  def withDecodedMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", MetaType))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val meta =
          try {
            val (w, h, c) = decodeStub(r.getAs[Array[Byte]](idx))
            Row(w, h, c, r.getAs[Array[Byte]](idx).length.toLong)
          } catch { case _: Exception => null }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Stub resize: rewrite the header, deterministically subsample the payload
   * to the new pixel count. Pure per-row transform — stays in the scan stage.
   */
  def resize(df: DataFrame, newWidth: Int, newHeight: Int,
             contentCol: String = "content"): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val schema = df.schema
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](idx)
        val resized =
          try {
            val (_, _, c) = decodeStub(content)
            import graft.serde.ByteUtils
            val payload = content.drop(12)
            val outLen = (newWidth * newHeight * c) min payload.length min 4096
            val out = new Array[Byte](outLen)
            var i = 0
            while (i < outLen) { out(i) = payload(i * payload.length / math.max(outLen, 1)); i += 1 }
            ByteUtils.fromInt(newWidth) ++ ByteUtils.fromInt(newHeight) ++
              ByteUtils.fromInt(c) ++ out
          } catch { case _: Exception => content }
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(Encoders.row(schema))
  }

  /**
   * Stub frame sampling for video-like content: the payload splits into
   * `frameSize`-byte frames; keep every `everyN`-th. Output explodes to one
   * row per kept frame with a frame_idx — the shape a downstream
   * image-encoder stage consumes.
   */
  def sampleFrames(df: DataFrame, frameSize: Int, everyN: Int,
                   contentCol: String = "content"): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame", BinaryType)))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val content = r.getAs[Array[Byte]](idx)
        if (content == null || content.length <= 12) Iterator.empty
        else {
          val payload = content.drop(12)
          payload.grouped(frameSize).zipWithIndex
            .filter { case (_, i) => i % everyN == 0 }
            .map { case (frame, i) => Row.fromSeq(r.toSeq ++ Seq(i, frame)) }
        }
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Query entry (rows-only): derive a deterministic stub image per document
   * (dims keyed off doc_id), then run the full decode → meta → embed
   * pipeline. Proves the binary-column plumbing end-to-end on driver data.
   */
  def multimodalPipeline(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val decoded = embedContent(withDecodedMeta(stubMedia(spark, dir)))
    decoded.select(
      col("media_id"), col("modality"),
      col("meta.width"), col("meta.height"), col("meta.channels"), col("meta.n_bytes"),
      size(col("embedding")).as("emb_dim"))
      .orderBy(col("media_id"))
  }

  /** Deterministic stub media table: one image per document, dims keyed off
    * doc_id (so every byte is reproducible in plain SQL). */
  private def stubMedia(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"), lit("image").as("modality"), col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          Row(id, r.getString(1),
            encodeStub((id % 64 + 16).toInt, (id % 48 + 16).toInt, (id % 3 + 1).toInt))
        }
      }(Encoders.row(StructType(Seq(
        StructField("media_id", LongType),
        StructField("modality", StringType),
        StructField("content", BinaryType)))))
  }

  /**
   * Query entry (oracle-checked): the remaining two multimodal transforms —
   * [[resize]] to 32x32 then [[sampleFrames]] (256-byte frames, keep every
   * 2nd) — reduced per frame to (length, unsigned byte sum). The stub codec
   * is pure integer arithmetic on (doc_id-derived) dims, so DuckDB
   * reproduces every byte and the whole resize→frame-sample path is
   * hash-checked, not just suite-asserted. All three stages are narrow
   * per-partition maps — the scan stage never shuffles.
   */
  def multimodalFrames(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val frames = sampleFrames(resize(stubMedia(spark, dir), 32, 32),
      frameSize = 256, everyN = 2)
    val idIdx = frames.schema.fieldIndex("media_id")
    val frameIdx = frames.schema.fieldIndex("frame_idx")
    val frameCol = frames.schema.fieldIndex("frame")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame_len", IntegerType),
      StructField("frame_sum", LongType)))
    frames.mapPartitions { rows =>
      rows.map { r =>
        val f = r.getAs[Array[Byte]](frameCol)
        var s = 0L; var i = 0
        while (i < f.length) { s += (f(i) & 0xFF); i += 1 }
        Row(r.getLong(idIdx), r.getInt(frameIdx), f.length, s)
      }
    }(Encoders.row(outSchema))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /**
   * Stub feature extraction: a deterministic 8-dim embedding from content
   * bytes (a real impl would run a vision encoder per batch). Demonstrates
   * the batched map shape with typed array output.
   */
  def embedContent(df: DataFrame, contentCol: String = "content",
                   dim: Int = 8): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val outSchema = StructType(df.schema.fields :+
      StructField("embedding", ArrayType(FloatType)))
    df.mapPartitions { rows =>
      rows.map { r =>
        val content = r.getAs[Array[Byte]](idx)
        val emb =
          if (content == null) null
          else {
            val out = new Array[Float](dim)
            var i = 0
            while (i < content.length) {
              out(i % dim) += (content(i) & 0xFF) / 255.0f
              i += 1
            }
            out.toIndexedSeq
          }
        Row.fromSeq(r.toSeq :+ emb)
      }
    }(Encoders.row(outSchema))
  }
}
