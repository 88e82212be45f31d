package graft.functions

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {

  /** Skewed synthetic stream: item i (of `vocab`) appears i+1 times, plus
    * `hot` items that each appear vocab*25 times (far above the guarantee
    * threshold at any reasonable capacity). */
  private def skewed(vocab: Int, hot: Int = 3) = {
    import spark.implicits._
    ((0 until vocab).flatMap(i => Seq.fill(i + 1)(f"item_$i%04d")) ++
      (0 until hot).flatMap(h => Seq.fill(vocab * 25)(f"hot_$h%02d"))).toDF("item")
  }

  test("heavyHitters equals the exact answer with capacity far below the " +
      "domain, under adversarial (sorted, disjoint-partition) layouts") {
    val vocab = 200
    val capacity = 16
    val df = skewed(vocab)
    val total = df.count()
    val exact = df.groupBy("item").agg(count(lit(1)).as("n"))
      .filter(col("n") * (capacity + 1) > total)
      .orderBy(col("n").desc, col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(exact.nonEmpty, "threshold leaves no heavy hitters — test is vacuous")
    // three layouts: as-generated, sorted (hot items clumped at the tail of
    // one partition), and range-partitioned (each partial sees a DISJOINT
    // item set, so every reduce-side merge overflows and subtracts)
    val layouts = Seq(
      df.repartition(7),
      df.orderBy("item").coalesce(3),
      df.repartitionByRange(8, col("item")))
    layouts.foreach { d =>
      val got = Sketches.heavyHitters(d, "item", capacity)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq === exact.toSeq)
    }
  }

  test("sketch content is a superset of the guaranteed-frequency items and " +
      "never overestimates") {
    import spark.implicits._
    val df = skewed(120).repartition(5)
    val capacity = 8
    val row = df.agg(GraftFunctions.misraGries(col("item"), capacity).as("sk"),
      count(lit(1)).as("total")).head()
    val total = row.getLong(1)
    val sk = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sk.size <= capacity)
    val exact = df.groupBy("item").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    exact.foreach { case (item, n) =>
      // guarantee: freq > total/(cap+1) => present; est is a lower bound
      if (n * (capacity + 1) > total) assert(sk.contains(item), s"lost $item ($n)")
      sk.get(item).foreach(est => assert(est <= n && est > 0))
    }
  }

  test("empty input yields an empty result, not a failure") {
    import spark.implicits._
    val out = Sketches.heavyHitters(
      Seq.empty[String].toDF("item"), "item", 4)
    assert(out.count() === 0)
  }

  test("adaptiveMgCapacity is capped at CapacityCeiling and the cap fits " +
      "the MisraGriesAgg require bound at any census") {
    import Sketches.{adaptiveMgCapacity, CapacityCeiling}
    // below the knee: floor, then linear
    assert(adaptiveMgCapacity(0L) === 128)
    assert(adaptiveMgCapacity(2048000L) === 128) // ceil(128.0) == floor
    assert(adaptiveMgCapacity(14766000L) === 923) // the measured sf1 census regime
    // the knee: ceiling * SupportTarget grams is the last constant-support N
    val knee = CapacityCeiling.toLong * Sketches.SupportTarget
    assert(adaptiveMgCapacity(knee) === CapacityCeiling)
    // past the knee — including the 100 TB framing (~1e13 grams) — the
    // capacity is FLAT; an uncapped formula would ask for 625M entries here
    assert(adaptiveMgCapacity(10000000000000L) === CapacityCeiling)
    assert(adaptiveMgCapacity(Long.MaxValue / 4) === CapacityCeiling)
    // the cap is exactly the aggregate's hard bound: constructing the
    // sketch at the cap must not throw
    GraftFunctions.misraGries(col("x"), CapacityCeiling)
  }

  test("support_floor is the smallest count that publishes, and every " +
      "published row clears it") {
    val df = skewed(120).repartition(5)
    val capacity = 8
    val total = df.count()
    val rows = Sketches.heavyHitters(df, "item", capacity).collect()
    assert(rows.nonEmpty)
    val expectedFloor = total / (capacity + 1L) + 1L
    rows.foreach { r =>
      assert(r.getLong(2) === expectedFloor)
      assert(r.getLong(1) >= expectedFloor)
    }
    // floor is tight: expectedFloor - 1 would NOT clear the threshold
    assert((expectedFloor - 1) * (capacity + 1) <= total)
    assert(expectedFloor * (capacity + 1) > total)
  }

  test("closed-form census sum(max(chars-2,0)) equals the exploded gram " +
      "count, including null and short texts") {
    import spark.implicits._
    val docs = (Seq((1L, "hello world"), (2L, "ab"), (3L, null),
      (4L, ""), (5L, "xyz")) ++ (6L to 30L).map(i => (i, s"doc body $i")))
      .toDF("doc_id", "text")
    val census = docs.agg(org.apache.spark.sql.functions.coalesce(
        sum(greatest(length(col("text")) - 2, lit(0)).cast("long")), lit(0L)))
      .head().getLong(0)
    val exploded = docs
      .select(explode(GraftFunctions.charGrams(col("text"), 3)).as("g"))
      .count()
    assert(census === exploded)
    // and on the real corpus (the form heavyHittersQuery actually sizes by)
    val real = graft.operators.Tables.documents(spark, sfDir)
    val realCensus = real.agg(org.apache.spark.sql.functions.coalesce(
        sum(greatest(length(col("text")) - 2, lit(0)).cast("long")), lit(0L)))
      .head().getLong(0)
    val realExploded = real
      .select(explode(GraftFunctions.charGrams(col("text"), 3)).as("g"))
      .count()
    assert(realCensus === realExploded)
  }

  test("heavy_hitters entry equals the plain exact gram computation on the " +
      "real corpus") {
    val got = Sketches.heavyHittersQuery(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val grams = graft.operators.Tables.documents(spark, sfDir)
      .select(explode(transform(
        sequence(lit(1), greatest(length(col("text")) - 2, lit(0))),
        i => col("text").substr(i, lit(3)))).as("gram"))
      .filter(length(col("gram")) === 3)
    val total = grams.count()
    val exact = grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") * 129 > total)
      .orderBy(col("n").desc, col("gram"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === exact.toSeq)
    assert(got.nonEmpty)
  }
}
