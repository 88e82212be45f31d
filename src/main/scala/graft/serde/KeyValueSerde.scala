package graft.serde

import java.nio.charset.StandardCharsets

/**
 * Simple key/value message (de)serialization: a message's key and value byte
 * arrays map to two named fields (default "key"/"value").
 *
 * Mirrors the reference's simple KV schemas
 * (reference: legacy/common/serialization/SimpleKeyValueDeserializationSchema.java:30-60,
 * SimpleKeyValueSerializationSchema.java:30-60): a null field name drops that
 * side; null bytes become a null entry.
 */
class KeyValueSerde(
    val keyField: String = KeyValueSerde.DefaultKeyField,
    val valueField: String = KeyValueSerde.DefaultValueField) extends Serializable {

  def deserializeKeyAndValue(key: Array[Byte], value: Array[Byte]): Map[String, String] = {
    var m = Map.empty[String, String]
    if (keyField != null)
      m += keyField -> (if (key != null) new String(key, StandardCharsets.UTF_8) else null)
    if (valueField != null)
      m += valueField -> (if (value != null) new String(value, StandardCharsets.UTF_8) else null)
    m
  }

  /** Tuple form (reference:
    * legacy/common/serialization/SimpleTupleDeserializationSchema.java:28-35). */
  def deserializeKeyAndValueTuple(key: Array[Byte], value: Array[Byte]): (String, String) = (
    if (key != null) new String(key, StandardCharsets.UTF_8) else null,
    if (value != null) new String(value, StandardCharsets.UTF_8) else null)

  def serializeKey(tuple: Map[String, Any]): Array[Byte] =
    if (tuple == null || keyField == null) null
    else tuple.get(keyField).filter(_ != null)
      .map(_.toString.getBytes(StandardCharsets.UTF_8)).orNull

  def serializeValue(tuple: Map[String, Any]): Array[Byte] =
    if (tuple == null || valueField == null) null
    else tuple.get(valueField).filter(_ != null)
      .map(_.toString.getBytes(StandardCharsets.UTF_8)).orNull
}

object KeyValueSerde {
  val DefaultKeyField = "key"
  val DefaultValueField = "value"
}
