package graft.serde

import org.scalatest.funsuite.AnyFunSuite

class KeyValueSerdeSpec extends AnyFunSuite {

  test("deserialize maps key/value bytes to named fields") {
    val serde = new KeyValueSerde()
    val m = serde.deserializeKeyAndValue("k1".getBytes, "v1".getBytes)
    assert(m === Map("key" -> "k1", "value" -> "v1"))
  }

  test("null bytes become null entries; custom field names respected") {
    val serde = new KeyValueSerde("k", "v")
    assert(serde.deserializeKeyAndValue(null, "x".getBytes) === Map("k" -> null, "v" -> "x"))
  }

  test("null field name drops that side") {
    val serde = new KeyValueSerde(null, "v")
    assert(serde.deserializeKeyAndValue("k".getBytes, "x".getBytes) === Map("v" -> "x"))
  }

  test("tuple form mirrors SimpleTupleDeserializationSchema") {
    val serde = new KeyValueSerde()
    assert(serde.deserializeKeyAndValueTuple("k".getBytes, "v".getBytes) === (("k", "v")))
    assert(serde.deserializeKeyAndValueTuple(null, "v".getBytes) === ((null, "v")))
  }

  test("serialize round-trips through deserialize") {
    val serde = new KeyValueSerde()
    val tuple = Map[String, Any]("key" -> "id9", "value" -> 42)
    assert(new String(serde.serializeKey(tuple)) === "id9")
    assert(new String(serde.serializeValue(tuple)) === "42")
    assert(serde.serializeKey(Map[String, Any]("value" -> 1)) === null)
    assert(serde.serializeKey(null) === null)
  }
}
