package graft.serde

import org.scalatest.funsuite.AnyFunSuite

class ByteUtilsSpec extends AnyFunSuite {

  private val ints = Seq(0, 1, -1, 42, Int.MaxValue, Int.MinValue, 123456789, -987654321)
  private val longs = Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 1690000000000L, -42L)
  private val shorts = Seq[Short](0, 1, -1, Short.MaxValue, Short.MinValue, 1234)
  private val doubles = Seq(0.0, -0.0, 1.5, -3.25, Double.MaxValue, Double.MinPositiveValue, math.Pi)
  private val floats = Seq(0.0f, 1.5f, -3.25f, Float.MaxValue, 1e-30f)

  test("int round-trips big-endian") {
    ints.foreach(v => assert(ByteUtils.toInt(ByteUtils.fromInt(v)) === v))
    assert(ByteUtils.toInt(Array[Byte](0, 0, 0, 42)) === 42)
    assert(ByteUtils.toInt(Array[Byte](-1, -1, -1, -1)) === -1)
  }

  test("long round-trips big-endian") {
    longs.foreach(v => assert(ByteUtils.toLong(ByteUtils.fromLong(v)) === v))
    assert(ByteUtils.toLong(Array[Byte](0, 0, 0, 0, 0, 0, 0, 7)) === 7L)
  }

  test("short round-trips big-endian") {
    shorts.foreach(v => assert(ByteUtils.toShort(ByteUtils.fromShort(v)) === v))
  }

  test("float/double round-trip through IEEE bits") {
    doubles.foreach(v => assert(ByteUtils.toDouble(ByteUtils.fromDouble(v)) === v))
    floats.foreach(v => assert(ByteUtils.toFloat(ByteUtils.fromFloat(v)) === v))
  }

  test("boolean: any nonzero byte is true") {
    assert(ByteUtils.toBoolean(Array[Byte](1)))
    assert(ByteUtils.toBoolean(Array[Byte](-5)))
    assert(!ByteUtils.toBoolean(Array[Byte](0)))
  }

  test("decimal round-trips scale + unscaled value") {
    for (unscaled <- Seq(-1000000L, -1L, 0L, 1L, 99999L); scale <- Seq(0, 2, 5, 10)) {
      val v = java.math.BigDecimal.valueOf(unscaled, scale)
      assert(ByteUtils.toBigDecimal(ByteUtils.fromBigDecimal(v)) === v)
    }
    assert(ByteUtils.toBigDecimal(Array[Byte](1, 2)) === null)
  }

  test("offset variants read mid-array") {
    val buf = Array[Byte](9, 9) ++ ByteUtils.fromInt(123456)
    assert(ByteUtils.toInt(buf, 2) === 123456)
    assertThrows[IllegalArgumentException](ByteUtils.toInt(buf, 3))
  }

  test("reads beyond array bounds throw") {
    assertThrows[IllegalArgumentException](ByteUtils.toLong(Array[Byte](1, 2, 3)))
    assertThrows[IllegalArgumentException](ByteUtils.toShort(Array[Byte](1), 1))
    assertThrows[IllegalArgumentException](ByteUtils.toBoolean(Array.empty[Byte]))
  }
}
