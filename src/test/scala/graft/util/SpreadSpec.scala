package graft.util

import graft.SparkSpec

/** Pins the [[Spread.ifNarrow]] gate: the bench-scale pre-kernel spread
  * fires ONLY when the input arrives narrower than the session
  * parallelism — an already-wide production scan must pass through with
  * no inserted exchange (the round-13 verdict's unconditional-spread
  * finding). */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  test("a narrow input is spread to defaultParallelism") {
    val one = (1 to 100).toDF("x").coalesce(1)
    assert(one.rdd.getNumPartitions === 1)
    val out = Spread.ifNarrow(one)
    assert(out.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
  }

  test("an already-wide input passes through untouched — no extra shuffle") {
    val target = spark.sparkContext.defaultParallelism
    val wide = (1 to 100).toDF("x").repartition(target + 3)
    val out = Spread.ifNarrow(wide)
    // identity, not just same-count: pass-through must add nothing at all
    assert(out eq wide)
  }

  test("exactly-at-parallelism passes through") {
    val target = spark.sparkContext.defaultParallelism
    val atPar = (1 to 100).toDF("x").repartition(target)
    assert(Spread.ifNarrow(atPar) eq atPar)
  }
}
