package graft.operators

import graft.serde.{DirtyDataStrategy, RowDeserializer}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * DataFrame surface of the delimited-text deserialization layer: turns a
 * column of message bodies into typed columns via [[RowDeserializer]],
 * running inside the scan stage (flatMap over partitions — parsing adds no
 * shuffle; at 100 TB the cost is one pass over the bytes).
 */
object Deser {

  /** Parse a string `bodyCol` into `schema`-typed rows, one DataFrame row per
    * parsed line (dirty lines handled per the deserializer's strategies). */
  def parseBodies(
      df: DataFrame,
      bodyCol: String,
      schema: StructType,
      fieldDelimiter: String = graft.serde.Delimiters.Soh,
      lineDelimiter: String = "\n",
      lengthCheck: String = "NONE"): DataFrame = {
    val deser = RowDeserializer.withLengthCheck(
      schema, lengthCheck, fieldDelimiter = fieldDelimiter, lineDelimiter = lineDelimiter)
    df.select(col(bodyCol)).as(Encoders.STRING)
      .flatMap(body => if (body == null) Nil
        else deser.deserialize(body.getBytes(java.nio.charset.StandardCharsets.UTF_8)))(
        Encoders.row(schema))
      .toDF()
  }

  /**
   * Message-level parse for graft-mq frames: body AND per-message properties
   * feed the deserializer, so `headerFields` columns resolve from message
   * properties exactly like the reference's metadata-aware schema
   * (reference: source/reader/deserializer/RocketMQRowDeserializationSchema.java:60-104).
   */
  def parseMessages(
      df: DataFrame,
      schema: StructType,
      headerFields: Set[String],
      bodyCol: String = "body",
      propsCol: String = "properties",
      fieldDelimiter: String = graft.serde.Delimiters.Soh,
      lengthCheck: String = "NONE"): DataFrame = {
    val deser = RowDeserializer.withLengthCheck(
      schema, lengthCheck, fieldDelimiter = fieldDelimiter, headerFields = headerFields)
    val rows = df.select(col(bodyCol), col(propsCol))
    rows.flatMap { r =>
      val body = r.getString(0)
      val props = if (r.isNullAt(1)) Map.empty[String, String] else r.getMap[String, String](1).toMap
      if (body == null) Nil
      else deser.deserialize(body.getBytes(java.nio.charset.StandardCharsets.UTF_8), props)
    }(Encoders.row(schema)).toDF()
  }

  /**
   * Oracle-checked round-trip: documents → SOH-delimited body text →
   * [[RowDeserializer]] → typed columns. The oracle is simply the original
   * columns, so any parse drift (dropped rows, misaligned fields, bad
   * coercion) flips the compare.
   */
  def deserDocuments(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val bodies = Tables.documents(spark, dir)
      .select(concat_ws(graft.serde.Delimiters.Soh, col("doc_id"), col("lang"), col("n_chars")).as("body"))
    parseBodies(bodies, "body", schema, fieldDelimiter = graft.serde.Delimiters.Soh)
      .orderBy(col("doc_id"))
  }
}
