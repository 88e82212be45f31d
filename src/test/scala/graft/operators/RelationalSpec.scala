package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary groups by (returnflag, linestatus) with positive sums") {
    val rows = Relational.q1PricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1)))
    assert(keys.distinct.length === keys.length)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("sum_qty")) > 0)
      assert(r.getLong(r.fieldIndex("count_order")) > 0)
    }
  }

  test("q2 filter respects every predicate") {
    val df = Relational.q2FilterProject(spark, sfDir)
    assert(df.columns.toSeq === Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"))
    val viol = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_quantity") < 24)
      .count()
    assert(df.count() === viol)
  }

  test("q3 top revenue returns at most 10 rows sorted by revenue desc") {
    val rows = Relational.q3TopRevenue(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getDouble(rows.head.fieldIndex("revenue")))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q3 plan broadcasts the customer dim and contains no cartesian product") {
    val plan = Relational.q3TopRevenue(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q2 pushes predicates into the parquet scan") {
    val plan = Relational.q2FilterProject(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("l_shipdate") || plan.contains("l_discount"))
  }

  test("q5 window top-N keeps at most 3 rows per customer, rn in 1..3") {
    val rows = Relational.q5WindowTopN(spark, sfDir).collect()
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 3))
    assert(rows.forall { r => val rn = r.getLong(r.fieldIndex("rn")); rn >= 1 && rn <= 3 })
  }

  test("q6 global sort+limit equals takeOrdered semantics") {
    val rows = Relational.q6SortLimit(spark, sfDir).collect()
    assert(rows.length === 20)
    val prices = rows.map(_.getDouble(2))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q7 anti join returns only customers without recent orders") {
    val result = Relational.q7AntiJoin(spark, sfDir)
    val recentCust = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct().collect().map(_.getLong(0)).toSet
    val got = result.collect().map(_.getLong(0)).toSet
    assert(got.intersect(recentCust).isEmpty)
    assert(got.size + recentCust.size === Tables.customer(spark, sfDir).count())
  }

  test("q9 hourly buckets align to hour boundaries") {
    val rows = Relational.q9EventsHourly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ts = r.getTimestamp(0).toInstant
      assert(ts.getEpochSecond % 3600 === 0)
    }
  }

  test("q17 sketch flags are all true and exact_users matches countDistinct") {
    val rows = Relational.q17Sketches(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("exact_users")) === exact(r.getString(0)))
      Seq("acd_ok", "hll_ok", "p50_ok", "p99_ok").foreach { f =>
        assert(r.getBoolean(r.fieldIndex(f)), s"${r.getString(0)} $f is false")
      }
    }
  }

  test("q10 per-user stats count every event exactly once") {
    val rows = Relational.q10EventsSessions(spark, sfDir).collect()
    val total = rows.map(_.getLong(rows.head.fieldIndex("n_events"))).sum
    assert(total === Tables.events(spark, sfDir).count())
  }

  test("q22 JSON extraction agrees with the from_json struct path") {
    val rows = Relational.q22JsonProps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val viaStruct = Tables.events(spark, sfDir)
      .select(col("event_type"),
        from_json(col("props"), lit("k LONG")).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("sum_k")) === viaStruct(r.getString(0)),
        s"sum_k mismatch for ${r.getString(0)}")
    }
  }

  test("q23 ntile buckets are 1..4 per priority with sizes differing by at most 1") {
    val rows = Relational.q23Ntile(spark, sfDir).collect()
    val perPriority = rows.groupBy(_.getString(0))
    perPriority.foreach { case (prio, bs) =>
      assert(bs.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L, 4L), s"$prio buckets")
      val sizes = bs.map(_.getLong(bs.head.fieldIndex("n")))
      assert(sizes.max - sizes.min <= 1, s"$prio sizes $sizes")
      // buckets partition the price range in order
      val sorted = bs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo.getDouble(lo.fieldIndex("max_price")) <=
          hi.getDouble(hi.fieldIndex("min_price")) + 1e-9)
      case _ => }
    }
    val total = rows.map(_.getLong(rows.head.fieldIndex("n"))).sum
    assert(total === Tables.orders(spark, sfDir).count())
  }

  test("q24 funnel stages are monotone and stage-1 reach equals viewers") {
    val rows = Relational.q24Funnel(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viewers = Tables.events(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(col("user_id")).distinct().count()
    assert(rows(1)._2 === viewers, "stage-1 reach must equal distinct viewers")
    // reach is a reverse cumulative sum: monotone nonincreasing in stage
    val reaches = rows.toSeq.sortBy(_._1).map(_._2._2)
    assert(reaches.sameElements(reaches.sorted.reverse))
    assert(rows.values.map(_._1).sum === rows(1)._2, "exact stages partition stage-1 users")
  }

  test("q26 hopping windows cover every event exactly twice, starts hour-aligned") {
    val rows = Relational.q26Hopping(spark, sfDir).collect()
    val totalN = rows.map(_.getLong(rows.head.fieldIndex("n"))).sum
    assert(totalN === 2 * Tables.events(spark, sfDir).count(),
      "2h windows sliding 1h must cover each event exactly twice")
    rows.foreach { r =>
      val ts = r.getTimestamp(0).getTime
      assert(ts % (3600 * 1000L) === 0, s"window start not hour-aligned: $ts")
    }
  }

  test("q27 z-scores: every kept row is beyond the cut and signed consistently") {
    val rows = Relational.q27Zscore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val means = Tables.events(spark, sfDir).groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val z = r.getDouble(r.fieldIndex("z"))
      assert(math.abs(z) >= 1.5)
      val above = r.getDouble(r.fieldIndex("value")) > means(r.getString(1))
      assert((z > 0) === above, "z sign must match side of the mean")
    }
  }

  test("q29 moving average matches a self-join reference on every event") {
    val rows = Relational.q29MovingAvg(spark, sfDir)
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
    val ref = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id").as("u"), unix_micros(col("ts")).as("t"))
      .join(e, col("u") === col("user_id") &&
        col("us") <= col("t") && col("us") > col("t") - 86400000000L)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("ref_n"),
        (expr("(sum(CAST(round(value * 100) AS LONG)) * 200 + count(1)) DIV (2 * count(1))")
          .cast("double") / 10000.0).as("ref_avg"))
    val joined = rows.join(ref, "event_id")
    assert(joined.count() === rows.count())
    val bad = joined.filter(col("n_24h") =!= col("ref_n") ||
      col("avg_24h") =!= col("ref_avg")).count()
    assert(bad === 0L, s"$bad events disagree with the self-join reference")
  }

  test("q30 grouping sets: gids partition the rows and totals reconcile") {
    val rows = Relational.q30GroupingSets(spark, sfDir).collect()
    val gids = rows.map(_.getLong(rows.head.fieldIndex("gid"))).distinct.sorted
    assert(gids.toSeq === Seq(0L, 2L, 3L), s"unexpected grouping ids: ${gids.toSeq}")
    val total = Tables.orders(spark, sfDir).count()
    // each grouping set independently covers all rows
    gids.foreach { g =>
      val n = rows.filter(_.getLong(rows.head.fieldIndex("gid")) == g)
        .map(_.getLong(rows.head.fieldIndex("n"))).sum
      assert(n === total, s"gid $g covers $n of $total rows")
    }
  }

  test("q28 intersect equals the semi-join formulation and is duplicate-free") {
    val rows = Relational.q28Intersect(spark, sfDir).collect().map(_.getLong(0))
    assert(rows.distinct.length === rows.length)
    val o = Tables.orders(spark, sfDir)
    val by97 = o.filter(year(col("o_orderdate")) === 1997)
      .select(col("o_custkey")).distinct()
    val both = by97.join(
      o.filter(year(col("o_orderdate")) === 1998).select(col("o_custkey")).distinct(),
      Seq("o_custkey"), "left_semi").count()
    assert(rows.length.toLong === both)
  }

  test("q25 retention: offset-0 cell covers every cohort user, offsets nonnegative") {
    val rows = Relational.q25Retention(spark, sfDir).collect()
    assert(rows.forall(_.getLong(1) >= 0))
    val day0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getDate(0).toString -> r.getLong(2)).toMap
    val cohorts = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      .groupBy(col("cohort_day")).count()
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(day0 === cohorts, "every user is active on their own cohort day")
  }

  test("q32_anomaly: z-scores are the integer-moment formula, mean-zero per " +
      "type, flags exactly |z| > 2") {
    val out = Relational.q32Anomaly(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (tpe, rows) =>
      if (rows.exists(r => !r.isNullAt(3))) {
        val zs = rows.map(_.getDouble(3))
        // standardized scores: mean ~0 (rounding noise only), some spread
        assert(math.abs(zs.sum / zs.length) < 0.001, s"$tpe mean ${zs.sum / zs.length}")
        rows.foreach(r => assert(r.getBoolean(4) === (math.abs(r.getDouble(3)) > 2.0)))
        // recompute one row from exact integer moments
        val cs = rows.map(_.getLong(2))
        val (n, s1, ss) = (cs.length.toLong, cs.sum, cs.map(c => c * c).sum)
        val r0 = rows.head
        val expect = BigDecimal((n * r0.getLong(2) - s1).toDouble /
          math.sqrt((n * ss - s1 * s1).toDouble))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r0.getDouble(3) === expect)
      } else rows.foreach(r => assert(r.isNullAt(3) && r.isNullAt(4)))
    }
  }
}
