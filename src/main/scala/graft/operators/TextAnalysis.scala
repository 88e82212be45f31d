package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.util.Materialize.MaterializeOps
import org.apache.spark.sql.functions._

/**
 * Text analysis for LLM training-data pipelines: token counting, character
 * statistics, quality scoring, language ID, document fingerprinting.
 *
 * Everything is pure `Column` expressions (whole-stage-codegen'd; no UDFs),
 * so at 100 TB the work stays inside the scan stage with zero shuffles.
 */
object TextAnalysis {

  /** Stopword lists used for quality scoring and language ID. Broadcast as
   *  literal arrays into codegen — no join, no lookup table. */
  val stopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for", "with", "that", "it", "as", "at")
  val stopwordsDe: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein", "eine", "zu", "den", "im", "nicht")
  val stopwordsFr: Seq[String] =
    Seq("le", "la", "les", "de", "et", "est", "un", "une", "du", "des", "en", "que", "qui", "dans", "pour")
  val stopwordsEs: Seq[String] =
    Seq("el", "la", "los", "las", "de", "y", "es", "un", "una", "del", "en", "que", "por", "con", "para")

  private def litArray(words: Seq[String]): Column = array(words.map(lit): _*)

  /** Whitespace tokens of lowercased, trimmed text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Token count; 0 for blank text (split of "" yields [""], guard it). */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Count of tokens that appear in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column = {
    val list = litArray(words)
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(filter(tokens(text), t => array_contains(list, t))))
  }

  /** Ratio helpers — NULL-safe division by text length / token count. */
  private def ratio(num: Column, den: Column, scale: Int): Column =
    round(num.cast("double") / nullif(den.cast("double"), lit(0.0)), scale)

  def punctRatio(text: Column): Column =
    ratio(regexp_count(text, lit("[.,!?;:]")), length(text), 4)

  def upperRatio(text: Column): Column =
    ratio(regexp_count(text, lit("[A-Z]")), length(text), 4)

  def alphaRatio(text: Column): Column =
    ratio(regexp_count(text, lit("[A-Za-z]")), length(text), 4)

  def stopwordRatio(text: Column): Column =
    ratio(stopwordHits(text, stopwordsEn), tokenCount(text), 4)

  /**
   * Composite quality score in [0,1]: favors documents that are long enough,
   * mostly alphabetic, and contain natural-language function words.
   */
  def qualityScore(text: Column): Column = {
    val lengthTerm = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val alphaTerm = coalesce(alphaRatio(text), lit(0.0))
    val stopTerm = least(coalesce(stopwordRatio(text), lit(0.0)) * 4.0, lit(1.0))
    round(lengthTerm * 0.3 + alphaTerm * 0.4 + stopTerm * 0.3, 4)
  }

  /**
   * Heuristic language ID: CJK-character density ⇒ zh, else argmax of
   * per-language stopword hits (ties resolved en > de > fr > es).
   */
  def langId(text: Column): Column = {
    val cjk = regexp_count(text, lit("[\\u4e00-\\u9fff]"))
    val en = stopwordHits(text, stopwordsEn)
    val de = stopwordHits(text, stopwordsDe)
    val fr = stopwordHits(text, stopwordsFr)
    val es = stopwordHits(text, stopwordsEs)
    when(cjk * 2 > length(text), lit("zh"))
      .when(en === 0 && de === 0 && fr === 0 && es === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Whitespace-normalized content fingerprint (md5). Stable across engines;
   *  the rolling-hash variant for shingling lives in [[Dedup.shingleHashes]]. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  // ---- repetition signals (the Gopher/MassiveText repetition filters:
  // duplicate-word fraction, top-word share, top-bigram share) ----

  /** Longest run length in a sorted array == max element multiplicity.
    * A single fold over the array (no explode, no per-doc groupBy, no
    * shuffle): at 100 TB the repetition signals stay inside the scan
    * stage like every other text_* signal. */
  private def maxRunSorted(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Consecutive-token word bigrams "a b". */
  private def wordBigrams(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** The shared fraction arithmetic over a (n_tokens, n_distinct, top_word,
    * top_bigram) counts row — used by both the kernel entry and the fold
    * spec so the published semantics live in one place. */
  private def repetitionFracs(counted: DataFrame): DataFrame =
    counted.select(
      col("doc_id"),
      col("n").cast("long").as("n_tokens"),
      when(col("n") === 0, lit(null).cast("double"))
        .otherwise(round(
          lit(1.0) - col("nd").cast("double") / col("n"), 4)).as("dup_word_frac"),
      when(col("n") === 0, lit(null).cast("double"))
        .otherwise(round(
          col("tw").cast("double") / col("n"), 4)).as("top_word_frac"),
      when(col("n") < 2, lit(null).cast("double"))
        .otherwise(round(
          col("tb").cast("double") / (col("n") - 1), 4)).as("top_bigram_frac"))
      .orderBy(col("doc_id"))

  /**
   * Per-document repetition profile: fraction of tokens that are repeats
   * (1 - distinct/total), most-frequent-word share, most-frequent-bigram
   * share. High values flag boilerplate/spam documents that the quality
   * score alone misses. NULL where undefined (empty text; single-token
   * docs have no bigram). Counts come from the one-pass
   * [[graft.functions.TextRepetition]] kernel (the interpreted
   * array_sort+fold formulation below remains the executable spec; the
   * suite asserts kernel == fold on the real corpus).
   */
  def textRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionFracs(Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.TextRepetition.repetition(col("text")).as("rep"))
      .select(col("doc_id"), col("rep.n_tokens").as("n"),
        col("rep.n_distinct").as("nd"), col("rep.top_word").as("tw"),
        col("rep.top_bigram").as("tb")))

  /** Fold-formulation spec of [[textRepetition]] (interpreted HOF lambdas —
    * slower; kept for the kernel parity suite). */
  private[graft] def textRepetitionFold(spark: SparkSession, dir: String): DataFrame =
    repetitionFracs(Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"),
        tokenCount(col("text")).as("n"))
      .select(col("doc_id"), col("n"),
        size(array_distinct(col("toks"))).as("nd"),
        maxRunSorted(array_sort(col("toks"))).as("tw"),
        when(col("n") < 2, lit(0))
          .otherwise(maxRunSorted(array_sort(wordBigrams(col("toks"))))).as("tb")))

  // ---- query entries (oracle-checked) ----
  //
  // All four entries project from graft.functions.TextSignals — ONE
  // character pass + one token pass per row instead of up to seven regex
  // scans (the Column formulations above remain the executable spec; the
  // suite asserts kernel-vs-Column equality field by field on the real
  // corpus). Ratios, rounding, and the langid decision chain stay in
  // Catalyst so the DuckDB-oracle arithmetic is reproduced exactly.

  private def withSignals(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("long").as("n_chars"),
      graft.functions.TextSignals.signals(col("text")).as("sig"))

  private def ratioOf(num: Column, den: Column): Column =
    round(num.cast("double") / nullif(den.cast("double"), lit(0.0)), 4)

  /** [[qualityScore]] over a signals struct — same arithmetic, one text pass. */
  def signalQuality(sig: Column, nChars: Column): Column =
    round(
      least(sig.getField("ws_tokens").cast("double") / 100.0, lit(1.0)) * 0.3 +
        coalesce(ratioOf(sig.getField("alpha"), nChars), lit(0.0)) * 0.4 +
        least(coalesce(ratioOf(sig.getField("stop_en"), sig.getField("ws_tokens")),
          lit(0.0)) * 4.0, lit(1.0)) * 0.3,
      4)

  /** [[langId]] over a signals struct — same decision chain, one text pass. */
  def signalLangId(sig: Column, nChars: Column): Column = {
    val (en, de, fr, es) = (sig.getField("stop_en"), sig.getField("stop_de"),
      sig.getField("stop_fr"), sig.getField("stop_es"))
    when(sig.getField("cjk") * 2 > nChars, lit("zh"))
      .when(en === 0 && de === 0 && fr === 0 && es === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  def textStats(spark: SparkSession, dir: String): DataFrame =
    withSignals(Tables.documents(spark, dir)).select(
      col("doc_id"),
      col("n_chars"),
      col("sig.ws_tokens").cast("long").as("n_tokens"),
      ratioOf(col("sig.punct"), col("n_chars")).as("punct_ratio"),
      ratioOf(col("sig.upper"), col("n_chars")).as("upper_ratio"),
      ratioOf(col("sig.alpha"), col("n_chars")).as("alpha_ratio"),
      col("sig.stop_en").cast("long").as("stopword_hits"))
      .orderBy(col("doc_id"))

  /** (doc_id, lang, quality) per document — shared input of
    * [[CorpusPipeline.qualityFilter]]. The coalesce is value-neutral
    * (every term of the score is already null-guarded) but marks the
    * column non-nullable: without it the semi-join on quality infers an
    * IsNotNull filter that gets pushed below the projection and
    * re-evaluates the whole signals kernel a second time per row. */
  def docQuality(docs: DataFrame): DataFrame =
    withSignals(docs).select(col("doc_id"), col("lang"),
      coalesce(signalQuality(col("sig"), col("n_chars")), lit(0.0)).as("quality"))

  def textQuality(spark: SparkSession, dir: String): DataFrame =
    withSignals(Tables.documents(spark, dir)).select(
      col("doc_id"),
      signalQuality(col("sig"), col("n_chars")).as("quality"))
      .orderBy(col("doc_id"))

  /**
   * Per-document character-level Shannon entropy in nats:
   * `H = ln(n) − (Σ c·ln(c))/n` over per-codepoint counts `c` — the
   * low-entropy-boilerplate / high-entropy-binary-garbage signal the
   * Gopher repetition rules miss (a doc of one repeated char has
   * dup_word_frac ≈ 1 only if tokens repeat; its CHAR entropy is 0
   * regardless of tokenization). Counts come from the one-pass
   * [[graft.functions.CharEntropy]] kernel; the entropy arithmetic and
   * 4-dp rounding stay in Catalyst so the DuckDB oracle reproduces them
   * exactly (both engines accumulate the only order-sensitive float sum
   * in ascending codepoint order — see the kernel's contract).
   * NULL entropy for empty text.
   */
  def textEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.CharEntropy.entropy(col("text")).as("e"))
      .select(
        col("doc_id"),
        col("e.n_chars").cast("long").as("n_chars"),
        col("e.distinct_chars").cast("long").as("distinct_chars"),
        when(col("e.n_chars") === 0, lit(null).cast("double"))
          .otherwise(round(
            log(col("e.n_chars").cast("double")) - col("e.clogc") / col("e.n_chars"),
            4)).as("char_entropy"))
      .orderBy(col("doc_id"))

  def textLangId(spark: SparkSession, dir: String): DataFrame =
    withSignals(Tables.documents(spark, dir)).select(
      col("doc_id"),
      col("lang"),
      signalLangId(col("sig"), col("n_chars")).as("pred_lang"))
      .orderBy(col("doc_id"))

  /**
   * Language-ID confusion matrix: (labeled lang, predicted lang, count,
   * integer per-mille share of the labeled lang) — the eval artifact that
   * turns [[textLangId]]'s per-doc rows into the per-language error
   * profile curation decisions read (NB the synthetic labels are random
   * w.r.t. content, so here the matrix measures engine parity, not
   * classifier quality). Shares are BIGINT per-mille (the corpus_stats
   * integer-division contract) — no float, no rounding hazard.
   *
   * Scale shape: one map-side-combined aggregate over the scan-stage
   * signals kernel into a langs×langs-bounded table; the per-lang total
   * is a window over THAT table, never a second corpus pass.
   */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    val pred = withSignals(Tables.documents(spark, dir))
      .select(col("lang"), signalLangId(col("sig"), col("n_chars")).as("pred_lang"))
    val conf = pred.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    conf
      .withColumn("total", sum(col("n_docs")).over(w))
      .select(col("lang"), col("pred_lang"), col("n_docs"),
        expr("(n_docs * 1000) div total").as("share_pm"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** Two tokenizations side by side: whitespace tokens and a BPE-ish regex
    * (word pieces, numbers, single punctuation — the GPT-2 pre-tokenizer
    * shape). */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    withSignals(Tables.documents(spark, dir)).select(
      col("doc_id"),
      col("sig.ws_tokens").cast("long").as("ws_tokens"),
      col("sig.bpe_tokens").cast("long").as("bpe_tokens"))
      .orderBy(col("doc_id"))

  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  // ---- winnowing fingerprints (Schleimer et al. 2003, the MOSS kernel) ----

  /**
   * Winnowing document fingerprints: md5 each overlapping `k`-char gram of
   * the normalized text, slide a `w`-gram window and keep each window's
   * MINIMUM hash — the selected set is position-independent (ties collapse
   * under the set semantics), local (the guarantee: any shared substring of
   * length >= k + w - 1 contributes at least one SHARED fingerprint to both
   * documents), and ~2/(w+1) dense. This is the span-level attribution tool
   * [[fingerprint]]'s single whole-doc hash cannot give: two docs sharing a
   * paragraph share fingerprints even when everything else differs.
   *
   * Entirely scan-stage — no explode, no shuffle, 100 TB cost is one corpus
   * pass. The selection runs in the one-flat-pass
   * [[graft.functions.TextHashes.winnowFpsHex]] kernel (reused MessageDigest,
   * monotonic-deque sliding min over raw 16-byte digests — O(n) total, vs
   * the O(n·w) slice-and-array_min higher-order formulation whose per-window
   * allocations and interpreted lambdas dominated this entry's wall time).
   * md5 (not the faster xxhash) because the DuckDB oracle must reproduce
   * every hash byte-identically; a production deployment would swap in
   * xxhash64 via the same kernel shape.
   *
   * Output columns: n_grams, the fingerprint count, and an md5 digest of
   * the sorted fingerprint set — compact enough to verify row-for-row at
   * any corpus size while still pinning every selected hash.
   */
  /** md5("") — the fp_digest of a document with no fingerprints. */
  val winnowEmptyDigest = "d41d8cd98f00b204e9800998ecf8427e"

  def winnowFingerprints(docs: DataFrame, textCol: String = "text",
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 2 && w >= 2, s"degenerate winnowing config k=$k w=$w")
    // null text = absent document (same contract as the dedup operators):
    // no fingerprint row, rather than a (doc_id, null) row
    docs.filter(col(textCol).isNotNull)
      .withColumn("_norm",
        regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
      .withColumn("n_grams",
        greatest(length(col("_norm")) - (k - 1), lit(0)).cast("long"))
      // kernel contract (suite-pinned): n_grams = 0 → empty; 0 < n_grams <
      // w → the single all-grams window; ties collapse under distinct
      .withColumn("fps",
        graft.functions.GraftFunctions.winnowFps(col("_norm"), k, w))
      .withColumn("n_fps", size(col("fps")).cast("long"))
      .withColumn("fp_digest", md5(concat_ws(",", col("fps"))))
      .drop("_norm")
  }

  /** Query entry (oracle-checked): winnowing fingerprints of every corpus
    * document at k=8/w=4 — gram count, fingerprint count, and the digest of
    * the sorted fingerprint set, all reproduced hash-for-hash by the DuckDB
    * oracle's list-comprehension formulation of the same algorithm. */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame =
    // partition-gated spread (Spread.ifNarrow, the duplicate_passages
    // pattern): at bench SFs the corpus is ONE parquet split, so the
    // md5-per-gram winnow kernel otherwise runs in a single task; a
    // production many-split scan passes through untouched. Per-row kernel —
    // results are partitioning-independent by construction.
    winnowFingerprints(graft.util.Spread.ifNarrow(Tables.documents(spark, dir)))
      .select(col("doc_id"), col("n_grams"), col("n_fps"), col("fp_digest"))
      .orderBy(col("doc_id"))

  // ---- PII redaction (the Dolma/FineWeb scrubbing step) ----

  /** The three scrub patterns every public-web training pipeline runs
    * (emails, IPv4 addresses, E.164-style phone numbers). Deliberately
    * alternation-free and anchor-free: greedy character classes behave
    * identically under Java's backtracking (leftmost-first) and
    * RE2-family (leftmost-longest) engines, so the DuckDB oracle matches
    * the Spark kernel byte for byte — an alternation could legally pick
    * different branches per engine. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhonePattern = "\\+[0-9]{7,15}"

  /** Redact emails → `<EMAIL>`, IPv4s → `<IP>`, `+`-prefixed phones →
    * `<PHONE>` in `textCol`, and report per-document match counts. Counts
    * are taken on the ORIGINAL text per pattern (independent, not
    * sequential), so a span matching two patterns — a dotted quad inside
    * an email domain — counts under both; the replace chain then resolves
    * such overlaps by precedence (email > IP > phone), and since the
    * placeholders contain no digits or `@`, a replace can never
    * manufacture a NEW match for a later pattern (suite-pinned). Pure
    * scan-stage codegen'd regexps: at 100 TB this is a zero-shuffle pass
    * like the other text kernels. */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailPattern)).cast("long"))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Pattern)).cast("long"))
      .withColumn("n_phones", regexp_count(t, lit(PhonePattern)).cast("long"))
      .withColumn(textCol,
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailPattern, "<EMAIL>"),
            Ipv4Pattern, "<IP>"),
          PhonePattern, "<PHONE>"))
  }

  /** Query entry (oracle-checked): the synthetic corpus carries no PII, so
    * deterministic PII is PLANTED from doc_id (emails on %3, a second one
    * on %9, IPs on %2, phones on %5 — 12 count combinations) and the same
    * construction runs in the DuckDB oracle; the compare then proves the
    * regex kernels — counts and replaced text — byte-identically across
    * engines, the same plant-then-check pattern the LSH demo suites use. */
  // ---- Unicode NFC normalization (pre-dedup canonicalization) ----

  /**
   * Canonical-normalize `textCol` to Unicode NFC via the custom
   * [[graft.functions.GraftFunctions.nfcNormalize]] expression (Spark has no
   * normalization builtin) and report per-document codepoint lengths before/
   * after plus a digest of the normalized text. This is the step every
   * hash-keyed operator in this library implicitly assumes: composed "é"
   * (U+00E9) and decomposed "e"+U+0301 md5/MinHash/SimHash to unrelated
   * values, so un-normalized corpora silently under-deduplicate. Pure
   * scan-stage kernel — zero shuffle, and the expression's isNormalized fast
   * path makes the 100 TB cost a per-row check for already-clean text.
   */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = graft.functions.GraftFunctions.nfcNormalize(col(textCol))
    docs
      .withColumn("n_raw", length(col(textCol)).cast("long"))
      .withColumn("_norm", norm)
      .withColumn("n_norm", length(col("_norm")).cast("long"))
      .withColumn("changed", col(textCol) =!= col("_norm"))
      .withColumn("norm_digest", md5(col("_norm")))
      .drop("_norm")
  }

  /** Query entry (oracle-checked): the synthetic corpus is pure ASCII (NFC
    * trivially), so decomposed sequences are PLANTED from doc_id — %2 docs
    * get "e"+combining-acute (composes, −1 codepoint), %3 docs get
    * "A"+U+030A and "o"+U+0308 (compose to Å/ö, −2), %5 docs get an
    * already-composed "café" (NFC fixpoint, unchanged) — and the DuckDB
    * oracle plants the identical codepoints and runs its native
    * nfc_normalize. Byte-identical digests then prove the custom Catalyst
    * expression against ICU's NFC, the [[piiRedact]] plant-then-check
    * pattern applied to normalization. */
  def textNormalize(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val planted = Tables.documents(spark, dir).withColumn("text", concat(
      col("text"),
      // decomposed: e + U+0301 combining acute -- NFC composes it
      when(id % 2 === 0, lit(" cafe\u0301")).otherwise(""),
      // decomposed: A + U+030A ring, o + U+0308 diaeresis -- both compose
      when(id % 3 === 0, lit(" A\u030Angstro\u0308m")).otherwise(""),
      // already composed U+00E9 -- an NFC fixpoint, must survive unchanged
      when(id % 5 === 0, lit(" caf\u00e9")).otherwise("")))
    normalizeText(planted)
      .select(col("doc_id"), col("n_raw"), col("n_norm"), col("changed"),
        col("norm_digest"))
      .orderBy(col("doc_id"))
  }

  // ---- TF-IDF top terms (per-document keyword extraction) ----

  /**
   * Top-`k` characteristic terms per document by tf·idf with
   * idf = ln(N/df) — the classic keyword-extraction / topic-labeling pass a
   * curation pipeline runs to tag documents before domain mixing. Terms are
   * lowercased letter-runs of length ≥ 3 (regexp_extract_all, identical
   * semantics under Java and RE2 regex engines for this alternation-free
   * pattern).
   *
   * Scale shape: explode feeds a map-side-combined (doc, term) count; df is
   * a re-aggregation of that tf table (vocabulary-sized, never a second
   * corpus pass) and is joined back shuffle-hash — vocabulary cardinality
   * is unbounded at corpus scale, so a broadcast is a gamble and the
   * [[CorpusPipeline.unigramLogProb]] pin applies. N is one driver scalar
   * (the driver-sized-census contract). The final top-k is a per-document
   * window over that document's own vocabulary — bounded state per key, no
   * global sort. Ranking uses the 4-dp ROUNDED score (desc, then term asc)
   * so both engines rank identical values; the residual ulp-at-boundary
   * risk is the documented [[CorpusPipeline.unigramLogProb]] class.
   */
  def tfidfTopTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // partition-gated spread: the tokenize explode + map-side tf partials
    // otherwise run in one task at one-split bench SFs; tf/df/N are integer
    // counts and the score is a pure per-row function of them, so the
    // result is partitioning-independent
    val toks = graft.util.Spread.ifNarrow(docs).select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]{3,}"), lit(0))).as("term"))
    // checkpointed: both the df aggregation and the scoring join consume tf
    // — without the barrier the corpus tokenize + token shuffle runs twice
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .cutLineage()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.count().toDouble
    val scored = tf.join(dfreq.hint("shuffle_hash"), "term")
      .withColumn("score", round(col("tf") * log(lit(n) / col("df").cast("double")), 4))
    val byScore = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(byScore))
      .filter(col("rnk") <= k)
      .select("doc_id", "rnk", "term", "tf", "df", "score")
  }

  /** Query entry (oracle-checked): top-5 tf·idf terms of every document. */
  def tfidfTopTermsEntry(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("rnk"))

  // ---- BM25 keyword search (corpus retrieval ranking) ----

  /**
   * BM25 ranked retrieval (Robertson/Spärck Jones; the Lucene-default
   * scoring a curation pipeline uses to pull topical slices out of a raw
   * corpus): for each query, the top-`k` documents by
   * `sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` with
   * `idf = ln(1 + (N-df+0.5)/(df+0.5))`. Terms are the [[tfidfTopTerms]]
   * letter-run tokens, so both engines tokenize identically.
   *
   * Queries here are corpus-derived for determinism: the `numTerms`
   * highest-df terms (df desc, term asc) round-robined into `numQueries`
   * queries — the driver census is `numTerms` rows (the IVF-centroid
   * contract: query sets are config-sized, never data-sized; a production
   * caller passes its own literal term lists).
   *
   * Scale shape: ONE corpus explode feeds the map-side-combined (doc, term)
   * tf table; df and doc length are both RE-aggregations of tf (vocabulary-
   * resp. doc-bounded — the text is never scanned twice); the query-term
   * attach is a broadcast of `numTerms` rows, so only query-term postings
   * survive into scoring; dl re-attaches shuffle-hash on doc_id (corpus-
   * doc-sized — never a gambled broadcast); the final top-k ranks inside
   * per-query window partitions over the 4-dp ROUNDED score (desc, doc_id
   * asc) so both engines rank identical values. Residual risk is the
   * [[CorpusPipeline.unigramLogProb]] ulp-at-boundary class on the ≤
   * terms-per-query-element sum.
   */
  def bm25Search(docs: DataFrame, numTerms: Int = 20, numQueries: Int = 4,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]{3,}"), lit(0))).as("term"))
    // checkpointed: four consumers (df census, doc-length stats, and the
    // scoring join) would otherwise each re-run the corpus tokenize +
    // token shuffle — the dominant scan cost of the whole operator
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .cutLineage()
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // ONE census job (round 20): the numTerms-row query set and the
    // doc-length stats are independent aggregates over the checkpointed tf
    // table — unioned, they collect in one action instead of two
    // sequential driver job rounds. The stats row is the null-term row;
    // the top rows re-sort driver-side under the same (df desc, term)
    // total order the query used, so the round-robin query assignment is
    // order-identical to the previous two-job shape.
    val censusRows = dfreq.orderBy(col("df").desc, col("term")).limit(numTerms)
      .select(col("term"), col("df"), lit(null).cast("double").as("avgdl"))
      .unionByName(
        dl.agg(coalesce(avg(col("dl").cast("double")), lit(0.0)).as("avgdl"),
          count(lit(1)).as("df"))
          .select(lit(null).cast("string").as("term"), col("df"), col("avgdl")))
      .collect()
    val statsRow = censusRows.find(_.isNullAt(0)).get
    val avgdl = statsRow.getDouble(2)
    val n = statsRow.getLong(1).toDouble
    val top = censusRows.filter(!_.isNullAt(0))
      .sortBy(r => (-r.getLong(1), r.getString(0)))
    val queries = top.zipWithIndex.map { case (r, i) =>
      (i % numQueries, r.getString(0), r.getLong(1))
    }.toSeq.toDF("query_id", "term", "df")
    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfNorm = col("tf") * (lit(k1) + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    val byScore = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    tf.join(broadcast(queries), "term")
      .join(dl.hint("shuffle_hash"), "doc_id")
      .groupBy("query_id", "doc_id")
      .agg(round(sum(idf * tfNorm), 4).as("score"))
      .withColumn("rnk", row_number().over(byScore))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "doc_id", "score")
  }

  /** Query entry (oracle-checked incl. 4-dp rounded BM25 scores): top-10
    * docs for each of 4 queries built from the 20 highest-df terms. */
  def bm25SearchEntry(spark: SparkSession, dir: String): DataFrame =
    bm25Search(Tables.documents(spark, dir))
      .orderBy(col("query_id"), col("rnk"))

  // ---- cross-document duplicate passages (shared winnowing fingerprints) ----

  /**
   * Passages shared across documents: every winnowing fingerprint
   * ([[winnowFingerprints]] — any shared substring of length ≥ k+w−1 is
   * guaranteed to surface at least one shared fingerprint) that occurs in
   * 2..`maxDocs` distinct documents, with the count, id range, and a digest
   * of the full sorted document list. This is the span-level CROSS-document
   * report [[winnowFingerprint]]'s per-document rows can't give: which
   * passages recur, and exactly where.
   *
   * The `maxDocs` cap is load-bearing at scale, not cosmetic: boilerplate
   * spans (license headers, navigation chrome) land in thousands of
   * documents, and collecting those lists is both a straggler and useless
   * output — the synthetic corpus itself has template fingerprints in 300+
   * docs. So the shape is two-pass, the [[Dedup.ngramJaccardInverted]]
   * df-cap pattern: a fingerprint-count aggregate filtered to the cap
   * (checkpointed — it is the small side), then a shuffle-hash join back to
   * the fingerprint stream so document lists are collected ONLY for
   * fingerprints that passed. Per-group state is ≤ maxDocs ids by
   * construction; no collect can straggle.
   */
  def duplicatePassages(docs: DataFrame, k: Int = 8, w: Int = 4,
      maxDocs: Int = 50): DataFrame = {
    // explode_outer, NOT explode: for a plain explode the optimizer's
    // InferFiltersFromGenerate adds `size(fps) > 0` and predicate pushdown
    // then inlines the ENTIRE winnow expression tree into a pre-scan Filter
    // — with the md5-gram array nested inside the window lambda, i.e.
    // O(n_grams²) md5 calls per document (measured: >300 s for 500 docs vs
    // seconds). The outer Generate is exempt from that rule; the cheap
    // isNotNull on the GENERATED attribute (which cannot be pushed below
    // the Generate) restores exact explode semantics.
    // partition-gated spread ahead of the kernel (Spread.ifNarrow):
    // at bench SFs the corpus is one parquet split, so the md5-heavy winnow
    // scan otherwise runs in a single task; at production scale the scan
    // has natural split parallelism and no exchange is inserted at all.
    // The checkpoint matters at every scale: fps feeds BOTH the df census
    // and the join — un-checkpointed, the winnow kernel executes twice
    val spread = graft.util.Spread.ifNarrow(docs)
    val fps = winnowFingerprints(spread, "text", k, w)
      .select(col("doc_id"), explode_outer(col("fps")).as("fp"))
      .filter(col("fp").isNotNull)
      .cutLineage()
    val shared = fps.groupBy("fp").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2 && col("n_docs") <= maxDocs)
      .cutLineage()
    fps.join(shared.hint("shuffle_hash"), "fp")
      .groupBy("fp", "n_docs")
      .agg(
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"),
        md5(concat_ws(",",
          array_sort(collect_list(col("doc_id").cast("string"))))).as("doc_digest"))
      .select("fp", "n_docs", "min_doc", "max_doc", "doc_digest")
  }

  /** Query entry (oracle-checked): all passages shared by 2..50 documents
    * at the [[winnowFingerprint]] k=8/w=4 configuration. */
  def duplicatePassagesEntry(spark: SparkSession, dir: String): DataFrame =
    duplicatePassages(Tables.documents(spark, dir)).orderBy(col("fp"))

  // ---- canonicalize-then-dedup (NFC composed with exact dedup) ----

  /**
   * Exact deduplication over the NFC-NORMALIZED text: group by
   * md5(nfc(text)), keep the minimum doc id, report copies per group. The
   * composition this entry pins is the reason [[normalizeText]] exists:
   * byte-level exact dedup misses duplicates whose only difference is
   * composed vs decomposed spelling, and every real multi-source web
   * corpus mixes both (different crawlers normalize differently). Same
   * scale shape as the plain exact dedup: one map-side-combined aggregate
   * shuffled on the hash key, the normalization itself scan-stage.
   */
  def dedupExactNormalized(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("key", md5(graft.functions.GraftFunctions.nfcNormalize(col(textCol))))
      .groupBy("key")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("key", "keep_id", "n_copies")

  /** Query entry (oracle-checked): every document gets a COMPOSED suffix;
    * docs on %10 additionally get a twin (id + 1,000,000) carrying the
    * DECOMPOSED spelling of the same suffix. Byte-level dedup would see
    * two distinct texts per twin pair; the normalized key collapses each
    * pair (suite-pinned), and the DuckDB oracle reproduces group keys,
    * survivors and counts exactly via its native nfc_normalize. */
  def dedupExactNfc(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val composed = docs.withColumn("text",
      concat(col("text"), lit(" caf\u00e9")))
    val twins = docs.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", concat(col("text"), lit(" cafe\u0301")))
    dedupExactNormalized(composed.unionByName(twins)).orderBy(col("key"))
  }

  // ---- fuzzy vocabulary join (SymSpell delete-variant equi-join) ----

  /** All deletion variants of a term at edit radius 1, term itself included:
    * `{t} ∪ {t minus char i}`. The SymSpell identity this powers: two terms
    * at Levenshtein distance ≤ 1 ALWAYS share a variant (substitution at i →
    * both 1-deletions at i coincide; insertion/deletion → the longer side's
    * 1-deletion is the shorter side itself), so an equi-join on variants has
    * provable recall 1 at distance 1 — the same pigeonhole contract as
    * [[Multimodal]]'s banded pHash. */
  def deleteVariants(t: Column): Column =
    array_distinct(concat(array(t),
      transform(sequence(lit(1), length(t)),
        i => concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t))))))

  /**
   * SymSpell-style fuzzy term join (Garbe's delete-variant indexing, the
   * scalable form of a Levenshtein join): pairs `(typo, fix)` with
   * `levenshtein ≤ 1` across two (term, cnt) vocabularies — the typo-mining
   * pass a corpus-normalization pipeline runs before token statistics, and
   * the join a naive implementation writes as a quadratic cross-vocabulary
   * `levenshtein` filter. Here each side explodes into its ≤ `length+1`
   * deletion variants and the candidate set is a variant equi-join —
   * vocabulary-bounded (Σ term lengths rows per side), never vocab²; the
   * exact `levenshtein` filter then removes the distance-2 collisions
   * (delete-at-i joined delete-at-j). Recall at distance 1 is exactly 1 by
   * the pigeonhole argument on [[deleteVariants]], so the output EQUALS the
   * brute-force join — verified by the all-pairs DuckDB oracle.
   *
   * Shuffle-hash pin: variant tables are explode-amplified but keep the
   * pre-explode size estimate, and neither side is generally broadcastable
   * at real vocabulary sizes.
   */
  def fuzzyTermJoin(typos: DataFrame, fixes: DataFrame): DataFrame = {
    val lv = typos.select(col("term").as("typo"), col("cnt").as("typo_cnt"),
      explode(deleteVariants(col("term"))).as("v"))
    val rv = fixes.select(col("term").as("fix"), col("cnt").as("fix_cnt"),
      explode(deleteVariants(col("term"))).as("v"))
    lv.join(rv.hint("shuffle_hash"), "v")
      .filter(levenshtein(col("typo"), col("fix")) <= 1)
      .select("typo", "fix", "typo_cnt", "fix_cnt")
      .distinct()
  }

  /** Query entry (oracle-checked vs a brute-force all-pairs Levenshtein
    * join): typo→correction candidates over the corpus vocabulary — rare
    * terms (cnt < total/1000) within edit distance 1 of frequent terms
    * (cnt ≥ total/1000). The synthetic vocabulary is 30 clean words, so
    * typos are PLANTED deterministically (the pii_redact contract): docs
    * with doc_id % 13 == 0 append a corrupted copy of their first ≥5-char
    * word — 2nd char deleted (even ids) or doubled (odd) — and the oracle
    * replays the identical plant. The relative threshold keeps the
    * rare/frequent split scale-invariant: plants stay rare and true vocab
    * stays frequent at every SF. */
  def fuzzyTermJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val (_, vc) = plantedTypoVocab(spark, dir)
    fuzzyTermJoin(
      vc.filter(col("cnt") < col("thr")).select("term", "cnt"),
      vc.filter(col("cnt") >= col("thr")).select("term", "cnt"))
      .orderBy(col("typo"), col("fix"))
  }

  /** The planted-typo corpus plus its thresholded vocabulary — shared by
    * `fuzzy_term_join` (mining) and `spell_correct` (application) so the
    * two entries can never drift apart. */
  private[operators] def plantedTypoVocab(
      spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    // (round-20 note: a partition-gated spread here measured SLOWER for
    // both consumers — the explode partials are cheap, the exchange is not)
    val docs = Tables.documents(spark, dir)
    val w = regexp_extract(lower(col("text")), "[a-z]{5,}", 0)
    val typo = when(col("doc_id") % 2 === 0,
      concat(w.substr(1, 1), w.substr(lit(3), length(w))))
      .otherwise(concat(w.substr(1, 2), w.substr(lit(2), length(w))))
    val planted = docs.withColumn("text",
      when(col("doc_id") % 13 === 0 && w =!= "",
        concat(col("text"), lit(" "), typo)).otherwise(col("text")))
    // checkpointed: the rare/frequent split consumes vc twice and the
    // threshold total once more — un-checkpointed, each re-runs this full
    // corpus explode+aggregate; the vocab table is vocabulary-bounded
    val counts = planted
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]{3,}"), lit(0)))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .cutLineage()
    // corpus-relative rare/frequent threshold: the 1-row total re-enters as
    // a broadcast (a global window would single-partition the vocab table);
    // floor division keeps it integer-exact in both engines (Spark's `/` on
    // longs is a double divide)
    val vc = counts
      .crossJoin(broadcast(counts.agg(sum(col("cnt")).as("tot"))))
      .withColumn("thr", floor(col("tot") / lit(1000)).cast("long"))
    (planted, vc)
  }

  /**
   * Apply mined typo corrections to the corpus — the normalization pass
   * [[fuzzyTermJoin]]'s output feeds. Only UNAMBIGUOUS corrections apply
   * (a typo with two candidate fixes is dropped here, not guessed), so the
   * rewrite is a pure function of (corpus, corrections). Tokens match the
   * correction key case-insensitively on the whole token; matched tokens
   * are replaced by the fix, everything else passes through, and documents
   * reassemble in original token order (whitespace normalized to single
   * spaces — the same contract as the gram kernels).
   *
   * Scale shape: one posexplode + ONE token-keyed join against the
   * vocabulary-bounded correction table (shuffle-hash: corrections derive
   * from aggregates, stats unknowable, broadcast not gambled) + one
   * doc-keyed reassembly groupBy — the [[Dedup.segmentDedup]] reassembly
   * contract, cost linear in corpus tokens at any size.
   */
  def spellCorrect(docs: DataFrame, corrections: DataFrame): DataFrame = {
    val unique = corrections.groupBy(col("typo"))
      .agg(count(lit(1)).as("nfix"), min(col("fix")).as("fix"))
      .filter(col("nfix") === 1).select("typo", "fix")
    val toks = docs
      .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+"))
        .as(Seq("pos", "tok")))
    toks
      .join(unique.hint("shuffle_hash"), lower(col("tok")) === col("typo"), "left")
      .withColumn("out", coalesce(col("fix"), col("tok")))
      .groupBy("doc_id")
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("out")))),
          x => x.getField("out")), " ").as("text"),
        sum(when(col("fix").isNotNull, 1L).otherwise(0L)).as("n_corrected"))
  }

  /** Query entry (oracle-checked: the full mine→filter→rewrite pipeline
    * replayed — plant, threshold split, brute-force distance-1 join,
    * unique-fix filter, token rewrite, reassembly): corrected docs only,
    * with rewritten text and correction counts, over the same planted-typo
    * corpus as `fuzzy_term_join`. */
  def spellCorrectQuery(spark: SparkSession, dir: String): DataFrame = {
    val (planted, vc) = plantedTypoVocab(spark, dir)
    val corrections = fuzzyTermJoin(
      vc.filter(col("cnt") < col("thr")).select("term", "cnt"),
      vc.filter(col("cnt") >= col("thr")).select("term", "cnt"))
      .select("typo", "fix")
    spellCorrect(planted, corrections)
      .filter(col("n_corrected") > 0)
      .orderBy(col("doc_id"))
  }

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val planted = Tables.documents(spark, dir).withColumn("text", concat(
      col("text"),
      when(id % 3 === 0, concat(lit(" reach u"), id.cast("string"),
        lit("@ex"), (id % 7).cast("string"), lit(".example.com"))).otherwise(""),
      when(id % 9 === 0, concat(lit(" or admin"), id.cast("string"),
        lit("@mail.example.org"))).otherwise(""),
      when(id % 2 === 0, concat(lit(" node 10."), (id % 256).cast("string"),
        lit(".0."), (id % 100).cast("string"), lit(" up"))).otherwise(""),
      when(id % 5 === 0, concat(lit(" call +"),
        (id + 14000000000L).cast("string"))).otherwise("")))
    // partition-gated spread: three regexp passes per row otherwise run in
    // one task at one-split bench SFs (per-row kernel, result unchanged)
    redactPii(graft.util.Spread.ifNarrow(planted))
      .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_phones"),
        col("text").as("redacted"))
      .orderBy(col("doc_id"))
  }
}
