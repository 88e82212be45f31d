package graft.serde

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RowDeserializerSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("price", DoubleType)))

  private def des(
      fmt: DirtyDataStrategy = DirtyDataStrategy.Skip,
      miss: DirtyDataStrategy = DirtyDataStrategy.Skip,
      incr: DirtyDataStrategy = DirtyDataStrategy.Cut) =
    new RowDeserializer(schema, fmt, miss, incr, fieldDelimiter = ",")

  test("clean multi-line body parses to typed rows") {
    val rows = des().deserialize("1,ok,1.5\n2,two,2.5".getBytes)
    assert(rows === Seq(Row(1, "ok", 1.5), Row(2, "two", 2.5)))
  }

  test("empty lines are dropped (line split drops empty tokens)") {
    val rows = des().deserialize("1,a,1.0\n\n\n2,b,2.0\n".getBytes)
    assert(rows.length === 2)
  }

  test("format error: SKIP drops the row, NULL nulls the field, EXCEPTION throws") {
    val body = "1,ok,1.5\nbad,x,2.0".getBytes
    assert(des(fmt = DirtyDataStrategy.Skip).deserialize(body) === Seq(Row(1, "ok", 1.5)))
    assert(des(fmt = DirtyDataStrategy.SkipSilent).deserialize(body) === Seq(Row(1, "ok", 1.5)))
    assert(des(fmt = DirtyDataStrategy.Null).deserialize(body) ===
      Seq(Row(1, "ok", 1.5), Row(null, "x", 2.0)))
    assertThrows[RuntimeException](des(fmt = DirtyDataStrategy.Exception).deserialize(body))
  }

  test("field missing: SKIP drops, PAD pads with nulls, EXCEPTION throws") {
    val body = "1,solo".getBytes
    assert(des(miss = DirtyDataStrategy.Skip).deserialize(body) === Seq.empty)
    assert(des(miss = DirtyDataStrategy.Pad).deserialize(body) === Seq(Row(1, "solo", null)))
    assertThrows[RuntimeException](des(miss = DirtyDataStrategy.Exception).deserialize(body))
  }

  test("field increment: CUT keeps the first N tokens, SKIP drops") {
    val body = "1,a,1.0,EXTRA,MORE".getBytes
    assert(des(incr = DirtyDataStrategy.Cut).deserialize(body) === Seq(Row(1, "a", 1.0)))
    assert(des(incr = DirtyDataStrategy.Skip).deserialize(body) === Seq.empty)
  }

  test("empty tokens between delimiters are preserved for field alignment") {
    val rows = des(fmt = DirtyDataStrategy.Null).deserialize("1,,2.0".getBytes)
    assert(rows === Seq(Row(1, "", 2.0)))
  }

  test("single non-binary column receives the whole line, delimiter and all") {
    val s = StructType(Seq(StructField("line", StringType)))
    val d = new RowDeserializer(s, fieldDelimiter = ",")
    assert(d.deserialize("a,b,c\nd".getBytes) === Seq(Row("a,b,c"), Row("d")))
  }

  test("single binary data column receives raw body bytes; headers from properties") {
    val s = StructType(Seq(
      StructField("topic", StringType),
      StructField("payload", BinaryType)))
    val d = new RowDeserializer(s, headerFields = Set("topic"))
    val body = Array[Byte](1, 2, 3)
    val rows = d.deserialize(body, Map("topic" -> "t1"))
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "t1")
    assert(rows.head.getAs[Array[Byte]](1).sameElements(body))
  }

  test("all-header schema emits one row per message from properties alone") {
    val s = StructType(Seq(
      StructField("topic", StringType),
      StructField("offset", LongType)))
    val d = new RowDeserializer(s, headerFields = Set("topic", "offset"))
    val rows = d.deserialize("ignored".getBytes, Map("topic" -> "t", "offset" -> "12"))
    assert(rows === Seq(Row("t", 12L)))
  }

  test("header fields interleaved with body fields map body tokens in data order") {
    val s = StructType(Seq(
      StructField("topic", StringType),
      StructField("id", IntegerType),
      StructField("name", StringType)))
    val d = new RowDeserializer(s, fieldDelimiter = ",", headerFields = Set("topic"))
    val rows = d.deserialize("7,alice".getBytes, Map("topic" -> "t9"))
    assert(rows === Seq(Row("t9", 7, "alice")))
  }

  test("null body with multi-column schema yields nothing") {
    assert(des().deserialize(null) === Seq.empty)
  }

  test("lengthCheck shorthand wires the reference strategy triples") {
    val pad = RowDeserializer.withLengthCheck(schema, "PAD", fieldDelimiter = ",")
    assert(pad.deserialize("1,a".getBytes) === Seq(Row(1, "a", null)))
    assert(pad.deserialize("1,a,2.0,junk".getBytes) === Seq(Row(1, "a", 2.0)))
    val exc = RowDeserializer.withLengthCheck(schema, "EXCEPTION", fieldDelimiter = ",")
    assertThrows[RuntimeException](exc.deserialize("1,a".getBytes))
    val skip = RowDeserializer.withLengthCheck(schema, "SKIP", fieldDelimiter = ",")
    assert(skip.deserialize("1,a,2.0,junk".getBytes) === Seq.empty)
  }

  test("empty field delimiter never splits (and never hangs)") {
    val d = new RowDeserializer(schema, fieldDelimiter = "",
      fieldMissingStrategy = DirtyDataStrategy.Pad,
      formatErrorStrategy = DirtyDataStrategy.Null)
    // whole line lands in the first column (unparsable int -> null), rest pad
    assert(d.deserialize("1,a,2.0".getBytes) === Seq(Row(null, null, null)))
  }

  test("SKIP and SKIP_SILENT both count dropped rows (SKIP additionally logs)") {
    val skip = RowDeserializer.withLengthCheck(schema, "SKIP", fieldDelimiter = ",")
    assert(skip.droppedCount === 0)
    assert(skip.deserialize("1,a".getBytes) === Seq.empty) // field missing
    assert(skip.deserialize("1,a,2.0,junk".getBytes) === Seq.empty) // increment
    assert(skip.deserialize("x,a,2.0".getBytes) === Seq.empty) // format error
    assert(skip.droppedCount === 3)
    assert(skip.deserialize("1,a,2.0".getBytes).size === 1) // clean row: no count
    assert(skip.droppedCount === 3)

    val silent = RowDeserializer.withLengthCheck(schema, "SKIP_SILENT", fieldDelimiter = ",")
    assert(silent.deserialize("1,a".getBytes) === Seq.empty)
    assert(silent.droppedCount === 1)
  }

  test("dropped rows feed a registered Spark accumulator") {
    val spark = graft.SparkSpec.session
    val acc = spark.sparkContext.longAccumulator("dirty-rows")
    val d = RowDeserializer.withLengthCheck(schema, "SKIP", fieldDelimiter = ",")
      .withDroppedAccumulator(acc)
    d.deserialize("bad".getBytes)
    d.deserialize("also,bad,row,extra".getBytes)
    assert(acc.value === 2L)
  }

  test("custom multi-char delimiters and \\u0001 default work") {
    val d = new RowDeserializer(schema, fieldDelimiter = "||",
      fieldMissingStrategy = DirtyDataStrategy.Pad)
    assert(d.deserialize("1||x||9.0".getBytes) === Seq(Row(1, "x", 9.0)))
    val soh = new RowDeserializer(schema, fieldDelimiter = "\u0001")
    assert(soh.deserialize("1\u0001y\u00013.0".getBytes) === Seq(Row(1, "y", 3.0)))
  }
}
