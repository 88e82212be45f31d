package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.util.Materialize.MaterializeOps
import org.apache.spark.sql.functions._

/**
 * Fixed-point PageRank over a directed edge table — the centrality pass a
 * curation pipeline runs over a document/embedding similarity graph to
 * find hub documents (heavily-referenced boilerplate scores high, isolated
 * content low; both are curation signals the per-doc kernels can't see).
 *
 * Arithmetic contract: ranks are LONG parts-per-million and every step is
 * integer — contribution = rank div outdeg, update = (1−d)·10^6 +
 * (d_num · Σcontrib) div d_den — so the result is bit-exact across
 * engines, runs, and cluster sizes (float PageRank sums in
 * partition-dependent order; a 4-dp round could still flip on ties, the
 * q29 float-sum hazard class). Truncation loses < 1 ppm per division —
 * ranking-irrelevant, and the published semantics ARE the fixed-point
 * recurrence, which the DuckDB oracle replays iteration by iteration.
 *
 * Scale shape: one outdeg aggregate (edge-bounded), then per iteration a
 * contributions join pinned shuffle-hash on the rank table (rank
 * cardinality derives from the graph — broadcast is not gambled) + one
 * dst-keyed sum, both bounded by |edges|; Materialize.cut severs the
 * iteration lineage exactly as [[Dedup.nearDupClusters]] does. Iteration
 * count is fixed (power iteration, not convergence-polled), so the plan
 * depth is static.
 */
object PageRank {

  /**
   * `iters` rounds of the damped power iteration over `edges`
   * (srcCol, dstCol). Returns (id, rank_ppm) for every node appearing as
   * a source or destination. Damping 0.85 as num/den integers.
   */
  def pageRank(edges: DataFrame, srcCol: String = "src_id", dstCol: String = "dst_id",
      iters: Int = 10, dampNum: Int = 85, dampDen: Int = 100,
      smallGraphEdges: Long = Dedup.DefaultSmallGraphEdges): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iteration count out of range: $iters")
    // size-based plan selection, as [[Dedup.nearDupClusters]]: below the
    // edge ceiling one bounded collect replaces iters × (join + agg)
    // distributed rounds, and the all-integer recurrence replays bit-exactly
    // on the driver (suite-pinned against the distributed loop). Similarity
    // graphs at corpus scale run the distributed loop, unchanged. Same
    // eligibility contract as nearDupClusters: integral same-typed id
    // columns only (the driver kernel indexes by primitive Long), output
    // ids cast back to the input type, and the (often knnGraph-derived)
    // edge pipeline checkpoints ONCE to serve the count-only ceiling
    // probe, the fast-path collect and the distributed loop alike — the
    // fall-through path hauls no edge bytes to the driver.
    val srcDt = edges.schema(srcCol).dataType
    val effEdges = graft.util.FastPaths.ceiling(smallGraphEdges)
    if (effEdges > 0 && graft.util.IdTypes.integral(srcDt) &&
        edges.schema(dstCol).dataType == srcDt) {
      val p = graft.util.Materialize.cut(
        edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst")))
      val ranked =
        if (p.count() <= effEdges)
          smallGraphPageRank(edges.sparkSession,
            p.collect().map(r => (r.getLong(0), r.getLong(1))), iters, dampNum, dampDen)
        else distributedPageRank(p, iters, dampNum, dampDen)
      return ranked.select(col("id").cast(srcDt).as("id"), col("pr"))
    }
    // non-integral ids (and the forced-distributed lane) take the same
    // one-pass materialization the over-ceiling path gets: the edge
    // pipeline is often join-derived (e.g. a kNN graph) and the
    // distributed plan scans it three ways (nodes, outdeg, withDeg) —
    // without the cut each scan would re-derive it. Eager, like the
    // ceiling probe above.
    distributedPageRank(
      graft.util.Materialize.cut(
        edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))),
      iters, dampNum, dampDen)
  }

  /** The per-iteration join/agg distributed plan of [[pageRank]] — the
    * 100 TB path, type-agnostic over the (src, dst) edge columns. */
  private def distributedPageRank(e: DataFrame,
      iters: Int, dampNum: Int, dampDen: Int): DataFrame = {
    val nodes = graft.util.Materialize.cut(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id")))
        .distinct())
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // (src, dst, deg) pays the degree join once, not once per iteration
    val withDeg = graft.util.Materialize.cut(e.join(outdeg, "src"))
    val base = (1000000L * (dampDen - dampNum)) / dampDen
    // "pr", not "rank": rank is a window-function keyword inside expr()
    var ranks = nodes.withColumn("pr", lit(1000000L))
    var i = 0
    while (i < iters) {
      val contrib = withDeg
        .join(ranks.hint("shuffle_hash").withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen")).as("pr"))
      i += 1
      // lineage cut every 3rd iteration (and on the last): each
      // Materialize.cut is an EAGER job (reliable checkpoint when a
      // checkpoint dir is configured — the at-scale lane must survive
      // executor loss — else localCheckpoint), and a 3-iteration join/agg chain
      // is still a shallow plan — per-iteration cuts measured ~25% of the
      // entry's wall time in pure checkpoint jobs
      if (i % 3 == 0 || i == iters) ranks = graft.util.Materialize.cut(ranks)
    }
    ranks
  }

  /** Driver fast path of [[pageRank]]: the identical integer recurrence —
    * contribution = pr div deg per edge, update = base + (dampNum·Σ) div
    * dampDen — over indexed arrays. Division and summation are exact longs,
    * so this is bit-equal to the distributed loop by construction. */
  private def smallGraphPageRank(spark: SparkSession, edges: Array[(Long, Long)],
      iters: Int, dampNum: Int, dampDen: Int): DataFrame = {
    val idx = new java.util.HashMap[java.lang.Long, Integer]()
    def indexOf(id: Long): Int = {
      val got = idx.get(id)
      if (got != null) got.intValue()
      else { val i = idx.size(); idx.put(id, i); i }
    }
    val flat = edges.map { case (a, b) => (indexOf(a), indexOf(b)) }
    val n = idx.size()
    val deg = new Array[Long](n)
    flat.foreach { case (a, _) => deg(a) += 1 }
    val base = (1000000L * (dampDen - dampNum)) / dampDen
    var pr = Array.fill(n)(1000000L)
    (1 to iters).foreach { _ =>
      val s = new Array[Long](n)
      flat.foreach { case (a, b) => s(b) += pr(a) / deg(a) }
      pr = Array.tabulate(n)(i => base + (dampNum * s(i)) / dampDen)
    }
    val ids = new Array[Long](n)
    idx.forEach((id, i) => ids(i.intValue()) = id.longValue())
    import spark.implicits._
    (0 until n).map(i => (ids(i), pr(i))).toDF("id", "pr")
  }

  /**
   * Query entry (oracle-checked): min-hop reachability from anchor vector
   * 0 over the exact 5-NN graph, written as a RECURSIVE CTE — Spark 4's
   * `WITH RECURSIVE` surface driven end to end (the graph comes from the
   * IVF machinery, the walk from the SQL engine; DuckDB replays the
   * identical recursion). UNION ALL + a hop cap bounds the path explosion
   * (≤ 5+25+125+625 rows from one anchor at out-degree 5); min(hop)
   * collapses revisits, so cycles can't recurse unboundedly either.
   * All-integer — no rounding contract.
   */
  def reachabilityQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("emb"))
    // materialize the edges BEFORE the recursion: a temp view is a logical
    // plan, so each recursion level would otherwise re-run the whole IVF
    // graph derivation (measured 11.5s -> 3.4s at sf0.1)
    // dir-scoped view name: temp views are session-global, so a bare name
    // would collide across concurrent queries on different sf dirs
    val view = s"graft_knn_edges_${math.abs(dir.hashCode)}"
    Similarity.knnGraph(emb, k = 5, numCentroids = 16, nprobe = 16)
      .select(col("src_id").as("src"), col("neighbor_id").as("dst"))
      .cutLineage()
      .createOrReplaceTempView(view)
    spark.sql(
      s"""WITH RECURSIVE walk(id, hop) AS (
        |  SELECT CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT g.dst, w.hop + 1
        |  FROM walk w JOIN $view g ON g.src = w.id
        |  WHERE w.hop < 4)
        |SELECT id, CAST(min(hop) AS BIGINT) AS hops
        |FROM walk GROUP BY id ORDER BY id""".stripMargin)
  }

  /** Query entry (oracle-checked): 10 fixed-point iterations over the
    * EXACT 5-NN cosine graph ([[Similarity.knnGraph]] at exhaustive
    * nprobe, which provably equals brute force) — the oracle replays the
    * brute-force graph and the 10 integer iterations as chained CTEs. */
  def pageRankQuery(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("emb"))
    val edges = Similarity.knnGraph(emb, k = 5, numCentroids = 16, nprobe = 16)
      .select(col("src_id"), col("neighbor_id"))
    pageRank(edges, "src_id", "neighbor_id", iters = 10)
      .select(col("id").as("vec_id"), col("pr").as("rank_ppm"))
      .orderBy(col("vec_id"))
  }
}
