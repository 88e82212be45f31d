package graft.serde

import java.math.{BigDecimal => JBigDecimal, BigInteger}

/**
 * Big-endian primitive decoding of message field bytes.
 *
 * Semantics match the reference connector's byte layout
 * (reference: source/util/ByteUtils.java:1-219): ints/longs/shorts are
 * big-endian two's complement, float/double go through their IEEE bit
 * patterns, boolean is any-nonzero-byte, and decimals are a 4-byte
 * big-endian scale followed by a big-endian unscaled BigInteger.
 */
object ByteUtils {

  def toInt(bytes: Array[Byte], offset: Int = 0): Int = {
    require(offset + java.lang.Integer.BYTES <= bytes.length,
      wrongLengthOrOffset(bytes, offset, java.lang.Integer.BYTES))
    var n = 0
    var i = offset
    while (i < offset + java.lang.Integer.BYTES) {
      n = (n << 8) ^ (bytes(i) & 0xFF)
      i += 1
    }
    n
  }

  def toLong(bytes: Array[Byte], offset: Int = 0): Long = {
    require(offset + java.lang.Long.BYTES <= bytes.length,
      wrongLengthOrOffset(bytes, offset, java.lang.Long.BYTES))
    var l = 0L
    var i = offset
    while (i < offset + java.lang.Long.BYTES) {
      l = (l << 8) ^ (bytes(i) & 0xFF)
      i += 1
    }
    l
  }

  def toShort(bytes: Array[Byte], offset: Int = 0): Short = {
    require(offset + java.lang.Short.BYTES <= bytes.length,
      wrongLengthOrOffset(bytes, offset, java.lang.Short.BYTES))
    (((bytes(offset) & 0xFF) << 8) ^ (bytes(offset + 1) & 0xFF)).toShort
  }

  def toFloat(bytes: Array[Byte], offset: Int = 0): Float =
    java.lang.Float.intBitsToFloat(toInt(bytes, offset))

  def toDouble(bytes: Array[Byte], offset: Int = 0): Double =
    java.lang.Double.longBitsToDouble(toLong(bytes, offset))

  def toBoolean(bytes: Array[Byte], offset: Int = 0): Boolean = {
    require(offset + 1 <= bytes.length, wrongLengthOrOffset(bytes, offset, 1))
    bytes(offset) != 0.toByte
  }

  /** 4-byte big-endian scale + big-endian two's-complement unscaled value;
    * null for anything shorter than 5 bytes (matches reference null-return). */
  def toBigDecimal(bytes: Array[Byte], offset: Int, length: Int): JBigDecimal =
    if (bytes != null && length >= 5 && offset + length <= bytes.length) {
      val scale = toInt(bytes, offset)
      val tc = java.util.Arrays.copyOfRange(bytes, offset + 4, offset + length)
      new JBigDecimal(new BigInteger(tc), scale)
    } else null

  def toBigDecimal(bytes: Array[Byte]): JBigDecimal =
    toBigDecimal(bytes, 0, bytes.length)

  // Inverse encoders (used by the sink's binary body mode and by tests).
  def fromInt(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  def fromLong(v: Long): Array[Byte] = {
    val out = new Array[Byte](8)
    var i = 0
    while (i < 8) { out(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    out
  }

  def fromShort(v: Short): Array[Byte] =
    Array((v >>> 8).toByte, v.toByte)

  def fromFloat(v: Float): Array[Byte] = fromInt(java.lang.Float.floatToIntBits(v))

  def fromDouble(v: Double): Array[Byte] = fromLong(java.lang.Double.doubleToLongBits(v))

  def fromBoolean(v: Boolean): Array[Byte] = Array(if (v) 1.toByte else 0.toByte)

  def fromBigDecimal(v: JBigDecimal): Array[Byte] = {
    val unscaled = v.unscaledValue.toByteArray
    fromInt(v.scale) ++ unscaled
  }

  private def wrongLengthOrOffset(bytes: Array[Byte], offset: Int, length: Int): String =
    s"offset ($offset) + length ($length) exceed the capacity of the array: ${bytes.length}"
}
