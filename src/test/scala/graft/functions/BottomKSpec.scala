package graft.functions

import scala.collection.mutable

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

class BottomKSpec extends SparkSpec {

  private def agg(k: Int) = BottomKPairsAgg(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, LongType, nullable = true), k)

  private def pairs(buf: mutable.TreeSet[(Long, Long)]): Seq[(Long, Long)] = buf.toSeq

  test("buffer keeps the k smallest distinct pairs, ordered") {
    val a = agg(3)
    val buf = a.createAggregationBuffer()
    Seq((5L, 50L), (1L, 10L), (9L, 90L), (3L, 30L), (1L, 10L), (2L, 20L))
      .foreach { case (x, y) =>
        a.update(buf, org.apache.spark.sql.catalyst.InternalRow(x, y))
      }
    assert(pairs(buf) === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("same key different payload are distinct entries; ties break on payload") {
    val a = agg(2)
    val buf = a.createAggregationBuffer()
    Seq((7L, 2L), (7L, 1L), (7L, 3L)).foreach { case (x, y) =>
      a.update(buf, org.apache.spark.sql.catalyst.InternalRow(x, y))
    }
    assert(pairs(buf) === Seq((7L, 1L), (7L, 2L)))
  }

  test("null key or payload rows are skipped") {
    val a = agg(4)
    val buf = a.createAggregationBuffer()
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(null, 1L))
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(1L, null))
    a.update(buf, org.apache.spark.sql.catalyst.InternalRow(2L, 2L))
    assert(pairs(buf) === Seq((2L, 2L)))
  }

  test("serialize round-trips; merge equals single-pass result") {
    val a = agg(4)
    val all = Seq((8L, 1L), (3L, 2L), (6L, 3L), (1L, 4L), (9L, 5L), (2L, 6L))
    val single = a.createAggregationBuffer()
    all.foreach { case (x, y) =>
      a.update(single, org.apache.spark.sql.catalyst.InternalRow(x, y))
    }
    val (left, right) = all.splitAt(3)
    val b1 = a.createAggregationBuffer()
    left.foreach { case (x, y) =>
      a.update(b1, org.apache.spark.sql.catalyst.InternalRow(x, y))
    }
    val b2 = a.createAggregationBuffer()
    right.foreach { case (x, y) =>
      a.update(b2, org.apache.spark.sql.catalyst.InternalRow(x, y))
    }
    val merged = a.merge(a.deserialize(a.serialize(b1)), a.deserialize(a.serialize(b2)))
    assert(pairs(merged) === pairs(single))
  }

  test("DataFrame path: partial sketches merge across partitions") {
    import spark.implicits._
    // 1000 rows spread over 8 partitions: the aggregate must build partial
    // sketches map-side and merge them — the answer is the global bottom-4
    val df = spark.range(0, 1000).repartition(8)
      .select(col("id"), (lit(1000) - col("id")).as("key"))
    val rows = df.groupBy(lit(1).as("g"))
      .agg(GraftFunctions.bottomKPairs(col("key"), col("id"), 4).as("sk"))
      .select(explode(col("sk")).as("p"))
      .select(col("p.key"), col("p.payload"))
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 999L), (2L, 998L), (3L, 997L), (4L, 996L)))
  }

  test("SQL registration: graft_bottom_k aggregates in a query") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 10L), (1L, 5L), (2L, 30L), (2L, 7L), (2L, 9L))
      .toDF("g", "v").createOrReplaceTempView("bk_in")
    val out = spark.sql(
      "SELECT g, graft_bottom_k(v, v, 2) AS sk FROM bk_in GROUP BY g ORDER BY g")
      .collect()
    assert(out.length === 2)
    val g2 = out(1).getAs[scala.collection.Seq[Row]]("sk").map(r => r.getLong(0))
    assert(g2.toSeq === Seq(7L, 9L))
  }
}
