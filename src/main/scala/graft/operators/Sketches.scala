package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/**
 * Operators on the mergeable bottom-k sketch
 * ([[graft.functions.BottomKPairsAgg]]): deterministic per-group sampling
 * and KMV distinct-count estimation. Both hash with an ENGINE-NEUTRAL
 * mixer (multiply/shift/multiply mod 2^32, every step expressible in ANSI
 * SQL), so the sketch CONTENT — not just a tolerance flag — is replayed
 * exactly by the DuckDB oracle. An RNG reservoir sample could never be
 * oracle-checked; a hash-minima sample is a pure function of the data.
 *
 * Scale shape: one ObjectHashAggregate per group — map-side partial
 * sketches (k pairs, 16 bytes each), so the shuffle carries
 * O(groups x k) bytes regardless of input rows. This is the same
 * partial/merge contract as Spark's own HLL sketches (q17), with the
 * KMV twist that the estimate is deterministic given the data.
 */
object Sketches {

  /** Engine-neutral 32-bit mix of a nonnegative id: multiply / add-shift /
    * multiply, all mod 2^32. Constants: Knuth's 2654435761 spreads
    * sequential ids; the add-shift feeds high bits back down; 40503 (the
    * 16-bit Knuth multiplier) decorrelates the lattice the first multiply
    * leaves on consecutive ids. Stays below 2^49 before each mod, so ANSI
    * long arithmetic never overflows for ids < 2^31. DuckDB replay:
    * `((a + a // 2048) * 40503) % 4294967296` with
    * `a = (id * 2654435761) % 4294967296`. */
  def mixHash(id: Column): Column = {
    val a = (id * lit(2654435761L)) % lit(4294967296L)
    ((a + shiftrightunsigned(a, 11)) * lit(40503L)) % lit(4294967296L)
  }

  /** Deterministic stratified sample: the `k` documents with the smallest
    * mixed doc_id hash per language — replayable by any engine, stable
    * under corpus growth (a new doc displaces at most one sampled doc).
    * Emits the sample as an ordered comma-joined id list per group. */
  def sampleBottomK(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(GraftFunctions.bottomKPairs(mixHash(col("doc_id")), col("doc_id"), k).as("sk"))
      .select(col("lang"),
        size(col("sk")).cast("long").as("n_sampled"),
        concat_ws(",",
          transform(col("sk"), p => p.getField("payload").cast("string"))).as("sample"))
      .orderBy(col("lang"))

  /**
   * Exact heavy hitters via Misra-Gries candidate routing: one pass builds
   * the mergeable [[graft.functions.MisraGriesAgg]] summary (+ the exact
   * stream length in the same aggregate); its items — a SUPERSET of every
   * item with frequency > total/(capacity+1), whatever the partitioning or
   * merge order — come back to the driver as a ≤ capacity census and
   * re-enter as a literal IN filter for an exact re-count. The published
   * answer (exact counts of items above the guarantee threshold) is a pure
   * function of the data; the order-dependent sketch content never reaches
   * it (the dedup_bloom routing pattern).
   *
   * Why not a plain groupBy(item): that shuffle is domain-cardinality
   * bounded — fine for a 31-word vocabulary, unbounded for URLs or n-grams
   * at 100 TB. Here BOTH shuffles are O(partitions × capacity): the sketch
   * pass by the merge contract, the re-count pass because the IN filter
   * drops every non-candidate at the scan.
   *
   * Every published row carries `support_floor` — the smallest exact count
   * that clears the guarantee threshold, floor(total/(capacity+1)) + 1.
   * Below [[CapacityCeiling]] the caller's requested support IS the floor;
   * once [[adaptiveMgCapacity]] hits the ceiling the floor rises with the
   * stream (the fractional-guarantee regime) and this column is how the
   * degradation is SURFACED instead of silently narrowing the answer.
   */
  def heavyHitters(items: DataFrame, itemCol: String, capacity: Int): DataFrame = {
    val first = items.agg(
      GraftFunctions.misraGries(col(itemCol), capacity).as("sk"),
      count(col(itemCol)).as("total")).head()
    val total = first.getLong(1)
    // smallest n with n*(capacity+1) > total: integer floor + 1 in BOTH
    // engines (DuckDB mirrors with total // (capv+1) + 1)
    val supportFloor = total / (capacity + 1L) + 1L
    val cands = first.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (cands.isEmpty) {
      items.sparkSession.emptyDataFrame
        .select(lit("").as(itemCol), lit(0L).as("n"),
          lit(supportFloor).as("support_floor")).limit(0)
    } else {
      items.filter(col(itemCol).isin(cands: _*))
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") * (capacity + 1) > total)
        .withColumn("support_floor", lit(supportFloor))
        .orderBy(col("n").desc, col(itemCol))
    }
  }

  /** SCALE-AWARE Misra-Gries capacity (round 16): capacity grows linearly
    * with the stream so the guarantee threshold total/(capacity+1) pins at
    * a CONSTANT ABSOLUTE support (~[[SupportTarget]] occurrences) instead
    * of a constant FRACTION. The fractional threshold is a vacuity trap on
    * corpora that grow by adding content: per-item frequencies stay flat
    * while total/(129) grows with the corpus, so past some size NOTHING
    * clears support and the entry agrees-on-empty with its oracle
    * (measured: both engines emitted zero rows at the sf1 decade, where
    * the caesar copies widen the trigram vocabulary 10×). Resolves to the
    * historical 128 at every correctness SF (gram census ≤ 2.05M there —
    * sf0.1 measures 1.48M → ceil(92.2) under the floor) and is mirrored
    * from count(*) in the oracle, the adaptiveCentroids pattern.
    *
    * CAPPED at [[CapacityCeiling]] (round 17): constant-absolute-support
    * admits up to N/support distinct survivors, so an uncapped linear
    * capacity IS the sketch size — at the 100 TB framing (~10^13 grams)
    * that's a 10^9-entry map per partial (tens of GB per task, merged on
    * one reducer), i.e. the sketch stops being a sketch. Past the ceiling
    * (census > ~1.05G grams) the guarantee degrades HONESTLY to the
    * fractional regime — threshold total/(2^16+1) grows with the stream —
    * and [[heavyHitters]] surfaces the effective threshold in its
    * `support_floor` column; memory stays O(2^16) entries (~a few MB per
    * partial) at every N. The ceiling is mirrored in the oracle
    * (least(65536, ...)); no testable SF reaches it (sf1 census 14.8M →
    * 923), so it changes no oracle-checked answer — it changes who dies
    * first at 100 TB: nobody, instead of the executors. */
  val SupportTarget: Long = 16000L
  val CapacityCeiling: Int = 1 << 16 // == MisraGriesAgg's hard require bound
  def adaptiveMgCapacity(totalItems: Long, floor: Int = 128): Int = {
    // Double math mirrors the oracle's ceil(total/16000.0); min against the
    // ceiling BEFORE toInt so huge censuses can't saturate through Int
    val need = math.ceil(totalItems.toDouble / SupportTarget)
    math.min(CapacityCeiling.toDouble, math.max(floor.toDouble, need)).toInt
  }

  /** Char 3-gram heavy hitters of the corpus (capacity
    * [[adaptiveMgCapacity]] < the gram vocabulary, so the sketch genuinely
    * decrements): the frequent-substring report over a domain one would
    * not groupBy at 100 TB. Grams come from the one-pass codegen'd
    * [[GraftFunctions.charGrams]] kernel and stay in the scan stage — no
    * pre-shuffle, no interpreted HOF lambdas. The capacity census is a
    * CLOSED FORM over the un-exploded documents — sum(max(chars-2, 0)),
    * exactly the gram count because [[graft.functions.TextHashes.charGrams]]
    * emits numChars-n+1 grams (Spark's length() counts the same code
    * points) and a null text contributes zero in both forms — so sizing
    * the sketch costs one narrow document scan, not a second pass over
    * the ~500× gram explode (the round-16 grams.count() did; ADVICE r16).
    * The oracle needs no such shortcut: its count(*) FROM g is the same
    * number by the same identity. */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame = {
    // partition-gated pre-explode spread: the corpus parquet at test SFs is
    // ONE split (a few MB), but the gram explode amplifies each row ~500x —
    // without the spread the entire sketch+count work runs in a single task
    // (measured 3.9s -> ~1s at local[32]). Spread.ifNarrow applies it only
    // in that regime; at 100 TB the scan already has thousands of splits
    // and an unconditional repartition would COLLAPSE them to core count
    // behind a pointless full shuffle of raw text.
    val docs = Tables.documents(spark, dir)
    val census = docs.agg(coalesce(
      sum(greatest(length(col("text")) - 2, lit(0)).cast("long")), lit(0L)))
      .head().getLong(0)
    val grams = graft.util.Spread.ifNarrow(docs)
      .select(explode(GraftFunctions.charGrams(col("text"), 3)).as("gram"))
    heavyHitters(grams, "gram", capacity = adaptiveMgCapacity(census))
  }

  /** KMV (k minimum values) distinct estimate per event type: with the k
    * smallest distinct hashed user ids, the k-th smallest normalized hash
    * m estimates the distinct count as (k-1)/m. Emitted columns are
    * hash-exact (sketch size + k-th key, replayed by the oracle) plus the
    * estimate as a within-30%-of-exact boolean (k=128 gives ~9% standard
    * error, so the bound sits ~3.4 sigma out; the data is fixed per scale
    * factor, so a pass is stable, not flaky). The exact countDistinct
    * rides along as the comparison column, same contract as q17. */
  def kmvDistinct(spark: SparkSession, dir: String, k: Int = 128): DataFrame = {
    val events = Tables.events(spark, dir)
    events
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        GraftFunctions.bottomKPairs(mixHash(col("user_id")), col("user_id"), k).as("sk"))
      .select(
        col("event_type"),
        col("exact_users"),
        size(col("sk")).cast("long").as("n_sketch"),
        element_at(col("sk"), size(col("sk"))).getField("key").as("kth_key"),
        when(size(col("sk")) < k, col("exact_users") === size(col("sk")))
          .otherwise(
            abs(lit((k - 1).toDouble * 4294967296.0) / col("kth_key") - col("exact_users"))
              <= col("exact_users") * 0.3)
          .as("kmv_ok"))
      .orderBy(col("event_type"))
  }
}
