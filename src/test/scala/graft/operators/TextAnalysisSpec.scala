package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("redactPii scrubs emails, IPv4s and phones; counts are per-pattern on the original text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail alice.smith+tag@sub.example.co and bob@ex.org today"),
      (2L, "servers 10.0.0.1 and 192.168.255.254 rebooted"),
      (3L, "call +4915112345678 or +15551234567 now"),
      (4L, "mixed joe@a.bc from 8.8.8.8 dial +1234567 end"),
      (5L, "nothing to scrub here at all"),
      (6L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(1L) === (("mail <EMAIL> and <EMAIL> today", 2L, 0L, 0L)))
    assert(r(2L) === (("servers <IP> and <IP> rebooted", 0L, 2L, 0L)))
    assert(r(3L) === (("call <PHONE> or <PHONE> now", 0L, 0L, 2L)))
    assert(r(4L) === (("mixed <EMAIL> from <IP> dial <PHONE> end", 1L, 1L, 1L)))
    assert(r(5L) === (("nothing to scrub here at all", 0L, 0L, 0L)))
    assert(r(6L) === (("", 0L, 0L, 0L)))
  }

  test("redactPii overlap semantics: counts are independent, replaces resolve by precedence") {
    import spark.implicits._
    val docs = Seq(
      // a dotted quad INSIDE an email domain: counted as both an email and
      // an IP, but the email replace (higher precedence) consumes the span
      (1L, "a@1.2.3.4x.com"),
      // a phone hard against an email: the domain class cannot cross '+',
      // so the email stops at "y.zz" and the phone survives as its own match
      (2L, "x@y.zz+123456789")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(docs).collect()
      .map(x => x.getLong(0) -> (x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r(1L) === (("<EMAIL>", 1L, 1L, 0L)))
    assert(r(2L) === (("<EMAIL><PHONE>", 1L, 0L, 1L)))
  }

  test("winnowFingerprints: the winnowing guarantee and the edge cases") {
    import spark.implicits._
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"PREFIX AAA $shared SUFFIX BBB"),
      (2L, s"totally different framing text here $shared and more trailing words"),
      (3L, "unrelated content with no overlap whatsoever in any span"),
      (4L, "tiny"),      // 4 chars < k=8 → zero grams, zero fingerprints
      (5L, "ten chars!"), // 10 chars → 3 grams < w=4 → one fingerprint
      (6L, "")).toDF("doc_id", "text")
    val r = TextAnalysis.winnowFingerprints(docs).collect()
      .map(x => x.getLong(0) ->
        (x.getLong(x.fieldIndex("n_grams")), x.getLong(x.fieldIndex("n_fps")),
          x.getSeq[String](x.fieldIndex("fps")).toSet,
          x.getString(x.fieldIndex("fp_digest"))))
      .toMap
    // guarantee: docs 1 and 2 share a substring far longer than k+w-1=11,
    // so their fingerprint SETS must intersect; doc 3 shares no span
    assert(r(1L)._3.intersect(r(2L)._3).nonEmpty, "shared span produced no shared fingerprint")
    assert(r(1L)._3.intersect(r(3L)._3).isEmpty, "disjoint docs share a fingerprint")
    // density: ~2/(w+1) of grams become fingerprints, never more than windows
    assert(r(1L)._2 < r(1L)._1 && r(1L)._2 > r(1L)._1 / 8)
    // edge cases
    assert(r(4L) ===((0L, 0L, Set.empty[String], TextAnalysis.winnowEmptyDigest)))
    assert(r(5L)._1 === 3L && r(5L)._2 === 1L)
    assert(r(6L)._1 === 0L && r(6L)._2 === 0L)
    // digest pins the set: same text → same digest, deterministic
    val again = TextAnalysis.winnowFingerprints(docs).collect()
      .map(x => x.getLong(0) -> x.getString(x.fieldIndex("fp_digest"))).toMap
    assert(again === r.view.mapValues(_._4).toMap)
  }

  test("pii_redact entry: every planted pattern lands and the corpus text survives around it") {
    val out = TextAnalysis.piiRedact(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { row =>
      val id = row.getLong(0)
      val (emails, ips, phones) = (row.getLong(1), row.getLong(2), row.getLong(3))
      val redacted = row.getString(4)
      val expEmails = (if (id % 3 == 0) 1 else 0) + (if (id % 9 == 0) 1 else 0)
      assert(emails === expEmails, s"doc $id emails")
      assert(ips === (if (id % 2 == 0) 1 else 0), s"doc $id ips")
      assert(phones === (if (id % 5 == 0) 1 else 0), s"doc $id phones")
      assert(!redacted.contains("@") && !redacted.matches("(?s).*\\+[0-9]{7}.*"),
        s"doc $id still carries PII: $redacted")
      assert("<EMAIL>".r.findAllIn(redacted).size === expEmails)
    }
  }
}
