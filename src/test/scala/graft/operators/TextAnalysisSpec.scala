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

  test("nfcNormalize: composes decomposed sequences, fixes nothing already NFC") {
    import spark.implicits._
    import graft.functions.GraftFunctions.nfcNormalize
    val rows = Seq(
      (1L, "cafe\u0301"),          // e + combining acute -> U+00E9
      (2L, "caf\u00e9"),           // already composed: fixpoint
      (3L, "A\u030Angstro\u0308m"), // ring + diaeresis -> \u00C5 / \u00F6
      (4L, "plain ascii stays"),
      (5L, "")).toDF("doc_id", "text")
    val r = rows.select($"doc_id", nfcNormalize($"text").as("n"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "caf\u00e9")
    assert(r(2L) === "caf\u00e9")
    assert(r(3L) === "\u00C5ngstr\u00F6m")
    assert(r(4L) === "plain ascii stays")
    assert(r(5L) === "")
    // null-safe (UnaryExpression nullSafeEval contract)
    val withNull = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(withNull.select(nfcNormalize($"text")).head().isNullAt(0))
    // the normalization collapses hash-distinct spellings into one key --
    // the reason this must run BEFORE any dedup kernel
    val dedupKey = rows.filter($"doc_id" <= 2)
      .select(md5(nfcNormalize($"text"))).distinct().count()
    assert(dedupKey === 1L)
  }

  test("normalizeText: lengths, changed flag, digest parity across spellings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x cafe\u0301 y"),  // 9 codepoints raw -> 8 after composition
      (2L, "x caf\u00e9 y")    // 8 codepoints, already NFC
    ).toDF("doc_id", "text")
    val r = TextAnalysis.normalizeText(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(x.fieldIndex("n_raw")),
        x.getLong(x.fieldIndex("n_norm")), x.getBoolean(x.fieldIndex("changed")),
        x.getString(x.fieldIndex("norm_digest"))))).toMap
    assert(r(1L)._1 === 9L && r(1L)._2 === 8L && r(1L)._3 === true)
    assert(r(2L)._1 === 8L && r(2L)._2 === 8L && r(2L)._3 === false)
    assert(r(1L)._4 === r(2L)._4, "NFC-equal texts must share a digest")
  }

  test("tfidfTopTerms: corpus-wide terms score zero, rare terms rank first") {
    import spark.implicits._
    // "common" is in every doc (df = N -> idf = ln(1) = 0); each doc also
    // carries a private term (df = 1 -> max idf) and doc 1 repeats its
    // private term so tf breaks the within-doc ordering
    val docs = Seq(
      (1L, "common zebra zebra apple"),
      (2L, "common yak"),
      (3L, "common xerus")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(docs, k = 2).collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getDouble(5)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._3) === Seq("zebra", "apple"))
    assert(byDoc(1L).head._4 > byDoc(1L)(1)._4, "tf=2 private term outranks tf=1")
    assert(byDoc(2L).map(_._3) === Seq("yak", "common"))
    // ubiquitous term scores exactly 0.0
    assert(byDoc(2L)(1)._4 === 0.0)
    // short tokens (< 3 letters) and digits never appear as terms
    val docs2 = Seq((1L, "ab x9 12 no terms of len two")).toDF("doc_id", "text")
    val terms2 = TextAnalysis.tfidfTopTerms(docs2, k = 10).collect().map(_.getString(2))
    assert(terms2.toSet === Set("terms", "len", "two"))
  }

  test("bm25Search: hand-computed scores match, rank is dense per query, " +
      "query-term attach broadcasts and the corpus-sized dl join does not") {
    import spark.implicits._
    // 4 docs, vocabulary built so the top-2 df terms are deterministic:
    // "alpha" in all 4 docs (df=4), "beta" in 3 (df=3). numTerms=2,
    // numQueries=2 -> query 0 = {alpha}, query 1 = {beta}.
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha alpha beta"),
      (3L, "alpha beta delta delta"),
      (4L, "alpha epsilon")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, numTerms = 2, numQueries = 2, k = 4)
    val rows = out.collect().map(r =>
      (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // hand-computed BM25 (k1=1.2, b=0.75, N=4, avgdl=3.0):
    // idf(alpha) = ln(1 + 0.5/4.5); doc 2 has tf=2, dl=3 ->
    // tfnorm = 2*2.2/(2+1.2*1) = 1.375, the highest for alpha
    val n = 4.0; val avgdl = 3.0
    def score(tf: Double, df: Double, dlen: Double): Double = {
      val idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
      val norm = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dlen / avgdl))
      math.rint(idf * norm * 1e4) / 1e4
    }
    val q0 = rows.filter(_._1 == 0).sortBy(_._2)
    assert(q0.map(_._3) === Seq(2L, 4L, 1L, 3L),
      "alpha ranking: tf=2 doc first, then shortest doc, dl breaks ties")
    assert(q0.head._4 === score(2, 4, 3))
    assert(q0(1)._4 === score(1, 4, 2))
    val q1 = rows.filter(_._1 == 1).sortBy(_._2)
    // docs 1 and 2 tie exactly (tf=1, dl=3) -> doc_id breaks the tie
    assert(q1.map(_._3) === Seq(1L, 2L, 3L), "beta: doc 4 has no beta -> absent")
    assert(q1.head._4 === score(1, 3, 3) && q1(1)._4 === q1.head._4)
    assert(q1(2)._4 === score(1, 3, 4))
    // rnk dense 1..k' per query
    assert(q0.map(_._2) === (1 to 4) && q1.map(_._2) === (1 to 3))
    // plan: the 20-row query set broadcasts; nothing corpus-sized does
    val plan = TextAnalysis.bm25Search(docs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"query-term attach should broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin"), s"dl attach must stay shuffle-hash:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"no nested-loop anywhere:\n$plan")
  }

  test("duplicatePassages: shared spans surface, the df cap suppresses boilerplate") {
    import spark.implicits._
    val passage = "the quick brown fox jumps over the lazy dog tonight"
    val boiler = "all rights reserved by the corpus licensing department"
    // docs 1-2 share `passage`; docs 10-15 (6 docs) all carry `boiler`
    val docs = (Seq(
      (1L, s"alpha framing $passage omega"),
      (2L, s"beta $passage gamma closing words"),
      (3L, "unrelated text with no shared span at all here")) ++
      (10L to 15L).map(i => (i, s"doc number $i text $boiler")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.duplicatePassages(docs, maxDocs = 5).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // winnowing guarantee: a shared span of len >= k+w-1 yields >= 1 shared
    // fingerprint -> at least one (n_docs=2, docs 1..2) row
    val pair = out.filter(r => r._2 === 2L && r._3 === 1L && r._4 === 2L)
    assert(pair.nonEmpty, "shared passage produced no cross-doc fingerprint")
    // the 6-doc boilerplate exceeds maxDocs=5: no row may span docs 10..15
    assert(!out.exists(r => r._3 >= 10L && r._4 <= 15L && r._2 >= 6L))
    // doc 3 shares nothing: it appears in no group
    assert(!out.exists(r => r._3 === 3L || r._4 === 3L))
  }

  test("dedupExactNormalized: spelling twins collapse; byte-level dedup keeps both") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared body caf\u00e9"),   // composed
      (2L, "shared body cafe\u0301"),  // decomposed twin of doc 1
      (3L, "a different document")).toDF("doc_id", "text")
    val r = TextAnalysis.dedupExactNormalized(docs).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.length === 2, s"expected 2 normalized groups, got ${r.toSeq}")
    val twinGroup = r.find(_._3 === 2L).get
    assert(twinGroup._2 === 1L, "survivor must be the minimum doc id")
    // the contrast that motivates the operator: raw-byte keys see 3 groups
    val raw = docs.groupBy(md5($"text")).count().count()
    assert(raw === 3L)
  }

  test("fuzzyTermJoin: finds substitution/deletion/insertion pairs, drops " +
      "distance-2; equals the brute-force levenshtein join on a random vocab") {
    import spark.implicits._
    val typos = Seq(("hllo", 1L), ("heello", 1L), ("hxllo", 1L), ("hlo", 1L),
      ("world", 1L)).toDF("term", "cnt")
    val fixes = Seq(("hello", 100L), ("word", 100L)).toDF("term", "cnt")
    val got = TextAnalysis.fuzzyTermJoin(typos, fixes).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // hllo=deletion, heello=insertion, hxllo=substitution; hlo is distance
    // 2 from hello and must be dropped; world~word is a deletion pair
    assert(got === Set(("hllo", "hello"), ("heello", "hello"),
      ("hxllo", "hello"), ("world", "word")))

    // property: on pseudo-random 3-6 char terms over a 3-letter alphabet
    // (dense edit neighborhoods) the variant equi-join equals brute force
    // exactly — recall 1 at distance 1, precision via the exact filter
    val rng = new scala.util.Random(7)
    val vocab = (1 to 60).map(_ =>
      (1 to (3 + rng.nextInt(4))).map(_ => ('a' + rng.nextInt(3)).toChar).mkString)
      .distinct
    val (l, r) = vocab.splitAt(vocab.length / 2)
    val lDf = l.map((_, 1L)).toDF("term", "cnt")
    val rDf = r.map((_, 1L)).toDF("term", "cnt")
    val fast = TextAnalysis.fuzzyTermJoin(lDf, rDf).collect()
      .map(x => (x.getString(0), x.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for (a <- l; b <- r if lev(a, b) <= 1) yield (a, b)).toSet
    assert(fast === brute, s"missing=${brute -- fast} extra=${fast -- brute}")
  }

  test("spellCorrect: unambiguous corrections rewrite matched tokens in " +
      "place, ambiguous typos pass through untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the hllo world"),
      (2L, "ambig stays ambig"),
      (3L, "Hllo capitalized match"),
      (4L, "nothing to fix")).toDF("doc_id", "text")
    val corr = Seq(
      ("hllo", "hello"),
      ("ambig", "amber"), ("ambig", "ambit") // two fixes -> dropped
    ).toDF("typo", "fix")
    val out = TextAnalysis.spellCorrect(docs, corr).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === (("the hello world", 1L)))
    assert(out(2L) === (("ambig stays ambig", 0L)), "ambiguous must not apply")
    // case-insensitive token match; replacement is the mined (lowercase) fix
    assert(out(3L) === (("hello capitalized match", 1L)))
    assert(out(4L) === (("nothing to fix", 0L)))
  }

  test("spell_correct entry: every corrected doc's rewrite count is " +
      "positive and its text differs from the planted original") {
    val out = TextAnalysis.spellCorrectQuery(spark, sfDir).collect()
    assert(out.nonEmpty, "planted typos must be corrected")
    out.foreach { r =>
      assert(r.getLong(2) > 0)
      assert(r.getString(1).nonEmpty)
    }
  }

  test("fuzzy_term_join entry: every planted typo pairs with its source " +
      "word, rare side strictly rarer than fix side") {
    val out = TextAnalysis.fuzzyTermJoinQuery(spark, sfDir).collect()
    assert(out.nonEmpty, "planted typos must surface")
    out.foreach { r =>
      val (typo, fix) = (r.getString(0), r.getString(1))
      assert(typo != fix)
      assert(r.getLong(2) < r.getLong(3),
        s"typo side must be rarer than fix side: $r")
      assert(math.abs(typo.length - fix.length) <= 1)
    }
  }

  test("langidConfusion: doc counts cover the corpus; per-lang shares sum " +
      "to 1000 minus only integer-floor loss") {
    val out = TextAnalysis.langidConfusion(spark, sfDir).collect()
    val n = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getLong(2)).sum === n)
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val s = rows.map(_.getLong(3)).sum
      assert(s <= 1000 && s > 1000 - rows.length, s"lang $lang shares sum $s")
      // the per-cell share must be the exact integer division
      val total = rows.map(_.getLong(2)).sum
      rows.foreach(r => assert(r.getLong(3) === r.getLong(2) * 1000 / total))
    }
  }

  test("lengthHistogram: buckets cover the corpus and bound their members") {
    val out = CorpusPipeline.lengthHistogramQuery(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(out.map(_.getLong(2)).sum === docs.count())
    out.foreach { r =>
      val (bucket, lo, nDocs, nTokens) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      if (bucket >= 0) {
        assert(lo === (1L << bucket))
        // every member has lo <= n < 2*lo, so the bucket's token sum must
        assert(nTokens >= nDocs * lo && nTokens < nDocs * lo * 2)
      } else assert(lo === 0L && nTokens === 0L)
    }
  }
}
