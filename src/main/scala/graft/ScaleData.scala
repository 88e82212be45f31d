package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-point synthesizer: writes an sf-N× sibling of an existing testdata
 * dir for the data-bound tables (`documents`, `embeddings`, `events`) so
 * the scaling harness gets a decade of growth ABOVE the largest
 * driver-provided SF — the regime where the corpus genuinely spans many
 * parquet splits and the single-split floor excuse stops applying.
 *
 * The construction is replication with per-copy isomorphism, NOT naive
 * duplication (which would give every doc `factor-1` exact twins and blow
 * the near-dup pair count quadratically — a different workload, not a
 * bigger one):
 *
 *  - `documents`: copy k caesar-shifts every ASCII letter by k. Lengths,
 *    token boundaries, within-copy duplicate/near-dup structure and char
 *    statistics are preserved EXACTLY (each copy is isomorphic to the
 *    source corpus), while cross-copy word shingles are disjoint — so
 *    pair density per row is constant and the corpus is `factor`× the
 *    work, which is exactly what a growth-ratio harness must hold fixed.
 *    `doc_id` remaps to `id*factor + k` (unique, integral); `n_chars` is
 *    length-preserved by construction.
 *  - `embeddings`: copy k rotates the embedding dimensions by k positions —
 *    an orthogonal transform, so norms and all within-copy cosines are
 *    preserved exactly; cross-copy similarities distribute like background
 *    pairs. `vec_id` remaps like `doc_id`.
 *  - `events`: copy k offsets `user_id`/`event_id` past the source max;
 *    timestamps are untouched, so every window holds `factor`× the keys —
 *    the streaming-state scale axis.
 *
 * Output is written with `defaultParallelism` splits per table: the POINT
 * of the new SF is a multi-split scan.
 *
 * Run: `SPARK_GRAFT_SCALE_SRC=/root/testdata/sf0.1
 *       SPARK_GRAFT_SCALE_DST=testdata-gen/sf1
 *       sbt "runMain graft.ScaleData"`
 */
object ScaleData {

  private val Lower = ('a' to 'z').mkString
  private val Upper = ('A' to 'Z').mkString

  /** translate() mapping that caesar-shifts letters by k (identity at k=0). */
  private def caesar(text: org.apache.spark.sql.Column, k: Int) = {
    val shift = ((k % 26) + 26) % 26
    if (shift == 0) text
    else translate(text, Lower + Upper,
      Lower.drop(shift) + Lower.take(shift) + Upper.drop(shift) + Upper.take(shift))
  }

  /** id*factor + k: unique iff source ids are unique, stays integral. */
  private def remapId(c: org.apache.spark.sql.Column, factor: Int, k: Int) =
    c * factor + k

  def scaleDocuments(df: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      df.select(df.columns.map {
        case "doc_id" => remapId(col("doc_id"), factor, k).as("doc_id")
        case "text" => caesar(col("text"), k).as("text")
        case c => col(c)
      }.toIndexedSeq: _*)
    }.reduce(_ unionByName _)

  def scaleEmbeddings(df: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { k =>
      df.select(df.columns.map {
        case "vec_id" => remapId(col("vec_id"), factor, k).as("vec_id")
        case "embedding" if k > 0 =>
          // circular dimension rotation by k MOD dim: orthogonal, norm- and
          // within-copy-cosine-preserving. The modulo guards factor > dim —
          // an unreduced k ≥ dim would make the first slice length negative
          // (malformed arrays, not a rotation)
          val sh = pmod(lit(k), size(col("embedding")))
          when(sh === 0, col("embedding")).otherwise(concat(
            slice(col("embedding"), sh + 1, size(col("embedding")) - sh),
            slice(col("embedding"), lit(1), sh))).as("embedding")
        case c => col(c)
      }.toIndexedSeq: _*)
    }.reduce(_ unionByName _)

  def scaleEvents(df: DataFrame, factor: Int): DataFrame = {
    // offset id-like columns past the source max so copies never collide;
    // every other column (ts included) passes through
    val idCols = df.columns.filter(c => c == "user_id" || c == "event_id")
    val offsets = if (idCols.isEmpty) Map.empty[String, Long]
      else {
        val row = df.agg(
          idCols.head -> "max",
          idCols.tail.map(c => c -> "max").toIndexedSeq: _*).head()
        idCols.zipWithIndex.map { case (c, i) => c -> (row.getAs[Number](i).longValue + 1L) }.toMap
      }
    (0 until factor).map { k =>
      df.select(df.columns.map {
        case c if offsets.contains(c) => (col(c) + lit(offsets(c) * k)).as(c)
        case c => col(c)
      }.toIndexedSeq: _*)
    }.reduce(_ unionByName _)
  }

  /** Dim table for the stream-static enrich entry (round 16 — closes the
    * BENCH_sf1_streaming capture note that the data-bound sf1 dir omitted
    * the customer dim): copy k keeps the customers the event stream
    * actually references (c_custkey ≤ the source's max user_id) and
    * offsets their keys by the SAME per-copy offset [[scaleEvents]]
    * applies to user_id, attributes untouched — so each scaled event
    * matches a customer carrying its source event's attributes and the
    * enriched stream is `factor` relabeled copies of the source result
    * (the isomorphism the growth harness needs). Customers no event ever
    * references are dropped rather than replicated: the dim stays
    * events-matched at every copy instead of diluting join selectivity
    * differently at each scale. */
  def scaleCustomer(cust: DataFrame, events: DataFrame, factor: Int): DataFrame = {
    val maxUser = events.agg(max(col("user_id"))).head().getAs[Number](0).longValue
    val off = maxUser + 1L
    val base = cust.filter(col("c_custkey") <= maxUser)
    (0 until factor).map { k =>
      base.select(cust.columns.map {
        case "c_custkey" => (col("c_custkey") + lit(off * k)).as("c_custkey")
        case c => col(c)
      }.toIndexedSeq: _*)
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DST", "testdata-gen/sf1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val splits = spark.sparkContext.defaultParallelism
    def write(name: String, scaled: DataFrame): Unit = {
      scaled.repartition(splits)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      val n = spark.read.parquet(s"$dst/$name.parquet").count()
      println(s"[scaledata] $name: ${n} rows, $splits splits -> $dst/$name.parquet")
    }
    write("documents", scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor))
    write("embeddings", scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor))
    write("events", scaleEvents(spark.read.parquet(s"$src/events.parquet"), factor))
    write("customer", scaleCustomer(
      spark.read.parquet(s"$src/customer.parquet"),
      spark.read.parquet(s"$src/events.parquet"), factor))
    spark.stop()
  }
}
