package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/**
 * Bottom-k sketch: the k smallest DISTINCT (key, payload) pairs per group,
 * ordered by (key, payload). A custom Catalyst [[TypedImperativeAggregate]]
 * — the mergeable-sketch shape every distributed engine needs at scale:
 * partial sketches are built map-side per partition, serialized (k pairs,
 * 16 bytes each), merged on the reduce side, so the shuffle carries
 * O(groups x k) bytes no matter how many rows feed the group.
 *
 * Two operators ride on it (operators/Sketches.scala):
 *  - deterministic per-group sampling: key = an engine-neutral mix hash of
 *    the row id — the "sample" is a pure function of the data, replayable
 *    by any engine (and therefore oracle-exact, unlike RNG reservoirs);
 *  - KMV distinct-count estimation: with k distinct hashed minima, the
 *    k-th smallest normalized hash m estimates the domain as (k-1)/m.
 *
 * Reference behavior analog: the connector's metric/selector layer has no
 * sketch surface; this extends the §2c pipeline pack the same way the
 * HLL/quantile entries (q17) do, but with a sketch whose CONTENT is
 * deterministic and exactly checkable, not tolerance-checked.
 *
 * Buffer is a red-black tree of packed pairs, capped at k: insert is
 * O(log k) with an early reject (key above the current max once full), so
 * update cost on a hot group degrades to one comparison per row.
 */
case class BottomKPairsAgg(
    key: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[(Long, Long)]] {

  require(k > 0 && k <= (1 << 20), s"bottom-k size out of range: $k")

  override def children: Seq[Expression] = Seq(key, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): mutable.TreeSet[(Long, Long)] =
    mutable.TreeSet.empty[(Long, Long)]

  private def insert(buf: mutable.TreeSet[(Long, Long)], pair: (Long, Long)): Unit = {
    if (buf.size < k) buf += pair
    else if (Ordering[(Long, Long)].lt(pair, buf.last)) {
      // strict lt also rejects duplicates of the current max cheaply
      if (buf.add(pair)) buf -= buf.last
    }
  }

  override def update(
      buf: mutable.TreeSet[(Long, Long)], input: InternalRow): mutable.TreeSet[(Long, Long)] = {
    val kv = key.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null) {
      insert(buf, (kv.asInstanceOf[Long], pv.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.TreeSet[(Long, Long)],
      other: mutable.TreeSet[(Long, Long)]): mutable.TreeSet[(Long, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[(Long, Long)]): Any =
    new GenericArrayData(buf.toArray.map { case (a, b) => InternalRow(a, b) })

  override def serialize(buf: mutable.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (a, b) => bb.putLong(a); bb.putLong(b) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKPairsAgg =
    copy(key = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "graft_bottom_k"
}
