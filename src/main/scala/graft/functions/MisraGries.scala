package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Misra-Gries frequent-items summary (Misra & Gries 1982) as a mergeable
 * Catalyst [[TypedImperativeAggregate]]: at most `capacity` counters; an
 * unseen item beyond capacity decrements every counter (each decrement
 * retires capacity+1 occurrences, so the amortized cost is O(1)/row);
 * merging sums counters then subtracts the (capacity+1)-th largest so the
 * result fits again — the subtract-merge of Agarwal et al. 2013
 * ("Mergeable summaries"), which preserves the deficit bound
 * `true(x) − N/(capacity+1) ≤ est(x) ≤ true(x)` over the COMBINED stream.
 *
 * Consequence: any item with true frequency > N/(capacity+1) is in the
 * summary NO MATTER how rows were partitioned or merges ordered. The
 * summary CONTENT is order-dependent (ests are lower bounds, hangers-on
 * vary), so operators must not publish it directly:
 * [[graft.operators.Sketches.heavyHitters]] uses it only as a candidate
 * ROUTE and re-counts candidates exactly — the published answer is a pure
 * function of the data (the dedup_bloom pattern: sketch visible in the
 * plan, invisible in the result).
 *
 * Scale contract: the shuffle carries O(partitions × capacity) entries
 * regardless of input rows or domain cardinality — the point vs a plain
 * groupBy(token) when the domain is unbounded (URLs, n-grams at 100 TB).
 */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0 && capacity <= (1 << 16),
    s"misra-gries capacity out of range: $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(
      buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.get(s) match {
        case Some(c) => buf(s) = c + 1
        case None =>
          if (buf.size < capacity) buf(s) = 1L
          else {
            // decrement-all: retires capacity+1 occurrences at once
            val dead = mutable.ArrayBuffer.empty[String]
            buf.mapValuesInPlace { (k, c) => if (c == 1) { dead += k; 0 } else c - 1 }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  /** Subtract-merge: sum, then if over capacity subtract the
    * (capacity+1)-th largest count from all and drop the non-positive —
    * entries strictly above it number at most `capacity`. */
  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (k, v) => buf(k) = buf.getOrElse(k, 0L) + v }
    if (buf.size > capacity) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - 1 - capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.mapValuesInPlace { (k, c) => if (c <= d) { dead += k; 0 } else c - d }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Sorted (est desc, item) for stable inspection; CONTENT is still
    * order-dependent — see the class contract. */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val arr = buf.toArray.sortBy { case (k, c) => (-c, k) }
    new GenericArrayData(arr.map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (k, c) =>
      (k.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf(new String(b, StandardCharsets.UTF_8)) = bb.getLong
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "graft_misra_gries"
}
