package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/**
 * Property check of the Misra-Gries summary's merge-order-independent
 * guarantees, driven WITHOUT Spark: random streams, random partitionings,
 * random merge orders, serialize/deserialize round-trips in the middle —
 * exactly the degrees of freedom a shuffle gives the runtime. The
 * published contract (the one heavyHitters' exact re-count relies on):
 *   (1) at most `capacity` counters survive;
 *   (2) ANY item with true count > N/(capacity+1) is present;
 *   (3) estimates never exceed true counts;
 *   (4) deficits never exceed N/(capacity+1)  (Agarwal et al. 2013).
 */
object MisraGriesProps extends Properties("MisraGries") {

  private val stream: Gen[List[String]] = for {
    vocab <- Gen.choose(2, 40)
    n <- Gen.choose(1, 400)
    // zipf-ish: low item ids drawn much more often
    items <- Gen.listOfN(n, Gen.choose(0, vocab * vocab).map(x =>
      s"i${math.sqrt(x.toDouble).toInt}"))
  } yield items

  private val capacity: Gen[Int] = Gen.choose(1, 12)

  private def runPartitioned(
      agg: MisraGriesAgg, items: List[String], seed: Long): collection.Map[String, Long] = {
    val rng = new scala.util.Random(seed)
    val parts = items.grouped(math.max(1, items.size / (1 + rng.nextInt(5))))
      .map { part =>
        val buf = part.foldLeft(agg.createAggregationBuffer()) { (b, s) =>
          agg.update(b, InternalRow(UTF8String.fromString(s)))
        }
        // shuffle serialization round-trip
        agg.deserialize(agg.serialize(buf))
      }.toList
    rng.shuffle(parts)
      .foldLeft(agg.createAggregationBuffer())((acc, p) => agg.merge(acc, p))
  }

  property("capacity, superset, no-overestimate, bounded deficit — " +
      "any partitioning/merge order") =
    Prop.forAll(stream, capacity, Gen.choose(0L, 1L << 40)) { (items, cap, seed) =>
      val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), cap)
      val sk = runPartitioned(agg, items, seed)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = items.size.toLong
      val bound = n / (cap + 1) // integer floor is fine: count > N/(cap+1)
      (sk.size <= cap) :| s"size ${sk.size} > capacity $cap" &&
        Prop.all(exact.toSeq.map { case (item, c) =>
          val est = sk.getOrElse(item, 0L)
          ((c * (cap + 1) <= n || sk.contains(item)) :| s"lost heavy $item ($c of $n)") &&
            ((est <= c) :| s"overestimate $item: $est > $c") &&
            ((c - est <= bound) :| s"deficit $item: $c - $est > $bound")
        }: _*)
    }

  property("two partitionings of the same stream agree on the published " +
      "answer (exact re-count above the threshold)") =
    Prop.forAll(stream, capacity, Gen.choose(0L, 1L << 40), Gen.choose(0L, 1L << 40)) {
      (items, cap, s1, s2) =>
        val agg = MisraGriesAgg(BoundReference(0, StringType, nullable = true), cap)
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = items.size.toLong
        def answer(seed: Long): Set[String] =
          runPartitioned(agg, items, seed).keySet
            .filter(i => exact(i) * (cap + 1) > n).toSet
        answer(s1) == answer(s2)
    }
}
