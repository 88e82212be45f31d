package graft

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ScaleData]]'s replication must be ISOMORPHIC per copy — that is what
  * makes growth ratios on the synthesized decade meaningful. Pins:
  * documents keep length/token structure per copy with disjoint cross-copy
  * vocabulary (duplicate density constant, pair counts linear); embedding
  * rotation is orthogonal (norms and within-copy cosines exact); event id
  * offsets never collide across copies; ids stay unique. */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  private val factor = 3

  test("documents: per-copy isomorphism — lengths exact, cross-copy shingles disjoint") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact twin of 1
      (3L, "Entirely different content, with Punctuation!"))
      .toDF("doc_id", "text")
    val scaled = ScaleData.scaleDocuments(docs, factor)
    assert(scaled.count() === 3L * factor)
    assert(scaled.select(col("doc_id")).distinct().count() === 3L * factor)
    // caesar preserves length exactly (n_chars invariance at the source)
    val lens = scaled.withColumn("copy", col("doc_id") % factor)
      .select(col("copy"), length(col("text")).as("len"))
      .groupBy("copy").agg(sum("len").as("s")).select("s")
      .collect().map(_.getLong(0)).toSet
    assert(lens.size === 1, s"per-copy total length must be identical, got $lens")
    // within-copy duplicate structure preserved: docs 1,2 stay exact twins
    // in every copy; cross-copy texts never collide
    val byText = scaled.groupBy("text").agg(count(lit(1)).as("n"))
    assert(byText.filter(col("n") === 2).count() === factor) // one twin pair per copy
    assert(byText.filter(col("n") > 2).count() === 0, "cross-copy texts must not collide")
    // cross-copy word shingles disjoint: the twins pair within copies only
    val pairs = graft.operators.Dedup.ngramJaccard(scaled, threshold = 0.5)
    assert(pairs.count() === factor.toLong) // exactly the per-copy twin pairs
    assert(pairs.filter(col("doc_a") % factor =!= col("doc_b") % factor).count() === 0,
      "no near-dup pair may cross copies")
  }

  test("embeddings: rotation is orthogonal — norms and within-copy cosines exact") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(0.5f, -1.0f, 2.5f, 0.0f))).toDF("vec_id", "embedding")
    val scaled = ScaleData.scaleEmbeddings(emb, factor)
    assert(scaled.count() === 2L * factor)
    val rows = scaled.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def norm(a: Array[Float]) = math.sqrt(a.map(x => x.toDouble * x).sum)
    def cos(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum / (norm(a) * norm(b))
    for (k <- 0 until factor) {
      val a = rows(1L * factor + k); val b = rows(2L * factor + k)
      assert(math.abs(norm(a) - norm(rows(factor.toLong))) < 1e-6) // |copy| == |copy 0|
      assert(math.abs(cos(a, b) - cos(rows(factor.toLong), rows(2L * factor))) < 1e-9,
        s"within-copy cosine must be rotation-invariant (copy $k)")
    }
    // rotation actually moved the dimensions (copies are not byte-twins)
    assert(rows(1L * factor + 1).toSeq !== rows(factor.toLong).toSeq)
  }

  test("events: id offsets never collide across copies; timestamps untouched") {
    val ev = Seq(
      (10L, 100L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (11L, 200L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val scaled = ScaleData.scaleEvents(ev, factor)
    assert(scaled.count() === 2L * factor)
    assert(scaled.select("event_id").distinct().count() === 2L * factor)
    assert(scaled.select("user_id").distinct().count() === 2L * factor)
    // timestamps pass through: every copy holds the same two instants
    assert(scaled.select("ts").distinct().count() === 2)
  }
}
