package graft

/**
 * Pins the [[ScaleCheck]] harness contract on a light subset (the committed
 * SCALING.json carries the full ten-entry sf0.01→sf0.1 run). The SF pair
 * must be sf0.01→sf0.1 because that is where the documents table actually
 * steps 10x (500 rows at BOTH sf0.001 and sf0.01 — the harness rejects a
 * flat step as vacuous, which this suite also pins). The subset spans the
 * two pair-generation families most at risk of a quadratic stage at the
 * cheapest wall cost: banded MinHash LSH and SimHash banding.
 */
class ScaleCheckSpec extends SparkSpec {

  test("a flat data step is a harness-usage error, not a vacuous pass") {
    val e = intercept[IllegalArgumentException] {
      ScaleCheck.check(spark, Seq("dedup_simhash" -> "documents"),
        small = "/root/testdata/sf0.001", big = "/root/testdata/sf0.01")
    }
    assert(e.getMessage.contains("does not grow"))
  }

  test("data-bound entries grow at most SlackFactor x the data ratio across SFs") {
    val prev = sys.props.get("graft.bench")
    sys.props("graft.bench") = "1" // time operators, not the eager gates
    try {
      val results = ScaleCheck.check(
        spark, Seq("dedup_minhash" -> "documents", "dedup_simhash" -> "documents"),
        small = "/root/testdata/sf0.01", big = "/root/testdata/sf0.1")
      results.foreach { r =>
        info(f"${r.key}: ${r.tSmall}%.2fs -> ${r.tBig}%.2fs " +
          f"(${r.ratio}%.2fx, bound ${r.bound}%.2fx)")
        assert(r.ok,
          f"${r.key} grew ${r.ratio}%.1fx across the data step (bound ${r.bound}%.1fx) " +
            "— a super-linear stage crept in")
      }
    } finally {
      prev match {
        case Some(v) => sys.props("graft.bench") = v
        case None => sys.props.remove("graft.bench")
      }
    }
  }

  test("the forced-distributed lane re-checks registered data-bound keys only") {
    val base = ScaleCheck.DataBoundEntries.toMap
    ScaleCheck.ForcedDistributedKeys.foreach { case (key, table) =>
      assert(base.get(key).contains(table),
        s"$key -> $table is not a registered data-bound entry; the forced lane " +
          "must re-measure the same keys under the same growth bounds")
      assert(SparkEntry.queries.contains(key), s"$key has no queries entry")
    }
  }
}
