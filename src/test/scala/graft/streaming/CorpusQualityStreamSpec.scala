package graft.streaming

import graft.SparkSpec
import graft.operators.{MqRoundtrip, TextAnalysis}

/** Streaming-vs-batch parity of the corpus quality pass: the same documents
  * scored through the MQ micro-batch source must land on the batch kernel's
  * answer row for row. */
class CorpusQualityStreamSpec extends SparkSpec {

  test("streamed quality scores equal the batch kernel's") {
    val streamed = MqRoundtrip.corpusQualityStream(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = TextAnalysis.textQuality(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streamed entropy profiles equal the batch kernel's") {
    val streamed = MqRoundtrip.entropyStream(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val batch = TextAnalysis.textEntropy(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streamed decontamination flags equal the batch broadcast join's") {
    import org.apache.spark.sql.functions.col
    val streamed = MqRoundtrip.decontaminateStream(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.operators.Tables.documents(spark, sfDir)
    val batch = graft.operators.CorpusPipeline.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("re-invocation reuses the once-per-JVM topic and returns identical rows") {
    // the cached-firehose contract: a second consumer run against the SAME
    // JVM's topic (no re-publish, same consumer group, fresh checkpoint)
    // must re-read from earliest and reproduce the result exactly — a
    // committed-group-offset leak into a fresh query would surface here as
    // an empty or truncated second read
    val first = MqRoundtrip.corpusQualityStream(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val second = MqRoundtrip.corpusQualityStream(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(first === second)
    assert(second.nonEmpty)
  }

  test("streamed incremental dedup equals the one-shot batch crossNearDups") {
    import org.apache.spark.sql.functions.col
    val streamed = MqRoundtrip.dedupIncrementalStream(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val docs = graft.operators.Tables.documents(spark, sfDir)
    val batch = graft.operators.Dedup.crossNearDups(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 =!= 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // 167 new docs stream through ~4 adaptive micro-batches at sf0.001 —
    // the union over micro-batches must be EXACTLY the batch pair set
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
