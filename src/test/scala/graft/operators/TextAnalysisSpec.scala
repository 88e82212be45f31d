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
