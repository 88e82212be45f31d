package graft.operators

import graft.SparkSpec

/** Empty-input sweep across the non-IVF operator families — same rationale
  * as [[EmptyInputSpec]]: a fresh pipeline's first tick must get an empty
  * frame back, never a plan-build failure or a driver-side head-of-empty.
  * Also pins [[CorpusPipeline.bpeMerges]]' early-exhaustion contract: a
  * vocabulary with fewer mergeable pairs than `nMerges` ends the merge
  * table early instead of crashing on an empty argmax. */
class EmptyInputSpec2 extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptySourcedDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
  private def emptyTokenDocs =
    Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_tokens")

  test("vocabTopK / bpeMerges: empty corpus") {
    assert(CorpusPipeline.vocabTopK(emptyDocs).count() === 0)
    assert(CorpusPipeline.bpeMerges(emptyDocs, nMerges = 3).count() === 0)
  }

  test("bpeMerges: merge table ends early when the vocabulary runs out of pairs") {
    // "ab" admits exactly one merge (a,b); asking for 3 must return 1 row
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val out = CorpusPipeline.bpeMerges(docs, nMerges = 3).collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "a" && out(0).getString(2) === "b")
  }

  test("heavyHitters: empty input") {
    val out = Sketches.heavyHitters(emptyDocs.select($"text".as("item")), "item", 8)
    assert(out.count() === 0)
  }

  test("budgetSelect / domainMix: empty corpus") {
    assert(CorpusPipeline.budgetSelect(emptyDocs, budgetTokens = 1000).count() === 0)
    assert(CorpusPipeline.domainMix(emptySourcedDocs,
      Map("web" -> 0.5, "code" -> 0.5)).count() === 0)
  }

  test("packSequences / winnowFingerprints: empty corpus") {
    assert(CorpusPipeline.packSequences(emptySourcedDocs).count() === 0)
    assert(TextAnalysis.winnowFingerprints(emptyDocs).count() === 0)
  }

  test("dedupBloomIncremental: empty history keeps the WHOLE batch as definitely-new") {
    val batch = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    // a null bloom sketch must not null-drop the batch from both routes —
    // with no history every batch doc is new
    assert(Dedup.dedupBloomIncremental(batch, emptyDocs).count() === 2)
  }

  test("decontaminateBloom: empty benchmark contaminates nothing; empty docs flow through") {
    val docs = Seq((1L, "some shingled text that is long enough to gram"))
      .toDF("doc_id", "text")
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(CorpusPipeline.decontaminateBloom(docs, bench).count() === 0)
    assert(CorpusPipeline.decontaminateBloom(emptyDocs, docs).count() === 0)
  }

  test("unigramLogProb / collocationsPmi / bm25Search / dsirSelect: empty corpus") {
    // these four fold a driver-side census of the corpus (total tokens,
    // bucket totals, avg doc length) — a null sum/avg from an empty input
    // must coalesce to zero, not NPE out of Row.getLong/getDouble
    assert(CorpusPipeline.unigramLogProb(emptyDocs).count() === 0)
    assert(CorpusPipeline.collocationsPmi(emptyDocs).count() === 0)
    assert(TextAnalysis.bm25Search(emptyDocs).count() === 0)
    assert(CorpusPipeline.dsirSelect(emptyDocs,
      org.apache.spark.sql.functions.lit(false)).count() === 0)
  }
}
