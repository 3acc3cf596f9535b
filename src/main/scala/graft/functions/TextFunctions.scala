package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines
  * (SURVEY §7.1 phase 4). Everything here is built from Catalyst-native
  * `org.apache.spark.sql.functions` (codegen'd, whole-stage-friendly, no
  * UDFs) so filters composed from them stay pushdown- and codegen-eligible
  * at 100 TB scale.
  */
object TextFunctions {

  /** Whitespace tokens, empty-safe: `trim` then split on `\s+`, dropping the
    * empty string a leading split can produce. Deterministic across engines
    * (the oracle uses the same trim+regexp split).
    */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Canonical normalization for near-exact dedup (C4-style): lowercase,
    * strip sentence punctuation, collapse whitespace runs, trim. Two
    * boilerplate documents differing only in case/punct/spacing normalize to
    * the same key.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[.,;:!?]", ""), "\\s+", " "))

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish subword proxy: counts alternating letter/digit runs and
    * punctuation marks as separate tokens — `\w+` runs plus single
    * non-space-non-word chars. Expressed as `regexp_extract_all` (no
    * lookarounds) so RE2-based engines compute the identical count.
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Smallest power of two ≥ n (with n ≤ 1 ⇒ 1): the padding-bucket cap
    * shared by the sequence-length bucketing, PSI drift, and l-diversity
    * queries — `1 << bitlength(n − 1)`, closed-form, no loop, and the exact
    * twin of the oracle's `1 << length(bin(n - 1))`.
    */
  def pow2BucketCap(n: Column): Column =
    when(n <= 1L, lit(1L))
      .otherwise(call_function("shiftleft", lit(1L), length(bin(n - 1L))).cast("long"))

  /** Count of sentence-level punctuation characters. Restricted to an explicit
    * class (not POSIX `[:punct:]`) so Spark and any SQL oracle agree exactly.
    */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  def punctRatio(text: Column): Column =
    when(length(text) > 0, punctCount(text).cast("double") / length(text)).otherwise(lit(0.0))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Small closed-class words; public knowledge.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as"),
    "es" -> Seq("el", "la", "los", "las", "un", "una", "y", "de", "en", "que", "es", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "un", "une", "et", "de", "en", "que", "est", "pour", "dans", "sur", "avec"),
    "de" -> Seq("der", "die", "das", "ein", "eine", "und", "von", "zu", "in", "ist", "mit", "auf", "den", "für"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人", "都", "一", "这", "他"))

  private val englishStopwords: Seq[String] = stopwords("en")

  /** Fraction of tokens that are (English) stopwords — a standard quality
    * signal for web-scraped corpora.
    */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    val hits = size(filter(toks, t => t.isInCollection(englishStopwords)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Mean token length — very long "tokens" indicate boilerplate/markup. */
  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(lit(0.0))
  }

  /** Composite document quality score in [0,1] from length, punctuation and
    * stopword signals (Gopher/C4-style heuristics from the public corpus-
    * filtering literature). Deterministic, branch-free except `when`.
    */
  def qualityScore(text: Column): Column =
    round(org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.QualityScoreRaw(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        englishStopwords)), 6)

  /** The declarative four-signal formulation [[qualityScore]] replaces —
    * kept as the parity reference (`ExpressionParitySpec` asserts the native
    * one-pass expression matches it bit-for-bit): the HOF chains here
    * re-tokenize the document ~8× and run interpreted, ~4× slower at sf0.1.
    */
  def qualityScoreHof(text: Column): Column = {
    val lenScore  = least(length(text).cast("double") / 500.0, lit(1.0))
    val punctOk   = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.0)
    val stopOk    = least(stopwordRatio(text) * 5.0, lit(1.0))
    val tokLenOk  = when(meanTokenLength(text).between(2.0, 12.0), 1.0).otherwise(0.0)
    round((lenScore * 0.3 + punctOk * 0.2 + stopOk * 0.3 + tokLenOk * 0.2), 6)
  }

  /** Language-ID by stopword evidence: score = fraction of the language's
    * stopword list present in the document's token set; argmax wins, ties
    * broken by language code (deterministic). Pure Catalyst expression —
    * `sort_array` of (score, lang) structs, take the last.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(array_intersect(toks, lit(words.toArray)))
      // ascending sort + take last = argmax; equal scores tie-break on the
      // struct's second field (lexicographically-last language code wins) —
      // deterministic either way.
      struct(hits.cast("double") / words.size, lit(lang).as("lang"))
    }
    val best = element_at(sort_array(array(scored: _*)), -1)
    best.getField("lang")
  }

  /** 56-bit polynomial rolling-hash fingerprint of the full text (base 31,
    * masked to 56 bits each step so `acc*31` stays below 2^61 — ANSI-mode
    * safe, no wrapping multiply). The classic Rabin-Karp-style document
    * fingerprint; useful as a cheap exact-dup key that's stable across
    * storage layouts. Built from `aggregate` over the char array — stays
    * inside codegen.
    */
  def fingerprint64(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) === 1),
      lit(5381L),
      (acc, c) => (acc * 31L + ascii(c).cast("long")).bitwiseAND(lit((1L << 56) - 1)))

  /** PII redaction for corpus cleaning: masks emails, URLs, and phone-like
    * long digit runs with typed placeholder tags. Pure `regexp_replace`
    * chain (codegen'd, pushdown-friendly), and the patterns avoid
    * lookarounds/backreferences so RE2-based engines apply the identical
    * rewrite. Order matters: emails first (an email would otherwise be
    * half-eaten by the phone digit-run rule), then URLs, then phones.
    *
    * The phone rule requires ≥ 7 ACTUAL digits (each `[0-9][()\-. ]*` group
    * is one digit plus separators), so short structured runs like `1.2 2024`
    * or `v1.2.3.4` survive. Digit-dense non-phones — ISO dates
    * (`2024-01-15`, 8 digits) and dotted IPs (10+ digits) — still redact:
    * a deliberate recall-over-precision trade for PII scrubbing (a missed
    * phone number is a leak; an over-masked date is noise), kept in the
    * pattern because excluding them needs lookarounds RE2 engines reject.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^\\s]+", "<URL>"),
      "\\+?([0-9][()\\-\\. ]*){6,}[0-9]", "<PHONE>")

  /** Space-bounded frequent-items aggregate (Misra-Gries, ≤ `k` counters
    * per partial buffer — each mapper ships at most k (item, count) pairs
    * into the shuffle regardless of vocabulary size; see
    * [[graft.expressions.FreqItemsAgg]] for the guarantees). Returns
    * `array<struct<item, est>>`.
    */
  def freqItems(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.FreqItemsAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), k)
        .toAggregateExpression())

  /** FNV-1a 64-bit hash of a string column — a native codegen'd expression
    * ([[graft.expressions.Fnv1a64]]). Public-domain algorithm simple enough
    * for any engine to recompute (the DuckDB oracle replicates it in HUGEINT
    * arithmetic), which makes it the engine-portable choice for
    * deterministic content-hash decisions (sampling, sharding, simhash).
    */
  def fnv1a64(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Fnv1a64(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** DuckDB-bit-exact Jaro–Winkler similarity
    * ([[graft.expressions.JaroWinkler]] — codegen'd, no UDF boxing).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.JaroWinkler(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Rolling-hash fingerprint reduced mod 1e9+7 at every step, so the
    * accumulator stays below 2^30 and the arithmetic never overflows — the
    * variant that is exactly reproducible in any ANSI-SQL engine with strict
    * (non-wrapping) BIGINT arithmetic, used by the oracle-checked query.
    */
  def fingerprintMod(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => length(c) === 1),
      lit(5381L),
      (acc, c) => pmod(acc * 31L + ascii(c).cast("long"), lit(1000000007L)))

  /** Term statistics for TF-IDF-style weighting: explode tokens → per
    * (doc, term) term frequency → join per-term document frequency. Counts
    * stay integers (exact across engines); the caller applies its preferred
    * idf transform (`tf * ln(N/df)` etc.) — libm log differences make the
    * transformed score engine-specific.
    *
    * Scale shape: two shuffles (doc+term agg, term agg), the second over the
    * much smaller distinct-term set; both partial-aggregated. With
    * `broadcastVocab` the tf⋈df join broadcasts the document-frequency side
    * — vocabulary grows sublinearly (Heaps' law), so it usually fits, and
    * the big exploded tf table then avoids a third shuffle (re-keying from
    * (doc, term) to term). Default off: a pathological vocabulary must not
    * OOM the default path — opt in when the vocabulary is known to fit.
    */
  def termStats(df: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String,
                broadcastVocab: Boolean = false): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(tokens(lower(col(textCol)))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // count(when(tf >= 1, 1)) — vacuously all rows (a count is never < 1),
    // identical df values — NOT count(1): a bare row count lets Catalyst
    // prune tf's count column out of this subtree, which makes the census's
    // exchange canonically DIFFERENT from the tf side's and the corpus is
    // scanned + tokenized twice (the r13 market-basket census lesson; with
    // the column kept, AQE reuses the (doc_id, term) exchange and the
    // corpus is read once — plan-audited on q_tfidf, 2 scans → 1).
    val dfreq = tf.groupBy(col("term"))
      .agg(count(when(col("tf") >= 1L, 1)).as("df"))
    val dff = if (broadcastVocab) broadcast(dfreq) else dfreq
    tf.join(dff, "term").select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** Shingled (word n-gram) fingerprints: the rolling-hash of each n-word
    * window — the "rolling hash" document fingerprinting primitive used for
    * local near-dup detection.
    */
  def shingleFingerprints(text: Column, n: Int): Column = {
    val toks = tokens(lower(text))
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, arXiv:2112.11446
    * Appendix A1.1), as per-document boolean flags plus the AND-composite
    * `keep`. Every rule is evaluated in INTEGER arithmetic (cross-multiplied
    * thresholds, e.g. `10·symbols ≤ words` instead of `symbols/words ≤ 0.1`)
    * so the decision is bit-identical on any engine — no float ratios near a
    * boundary. One narrow codegen'd pass, no shuffle.
    *
    * Rules (flag true = passes; removal conditions are the paper's, so keep
    * is the complement — e.g. the paper removes at bullet ratio > 0.9, so
    * f_bullet passes at ≤ 0.9):
    *  - f_wc:       50 ≤ word count ≤ 100,000
    *  - f_mwl:      mean word length in [3, 10]  (3n ≤ chars ≤ 10n)
    *  - f_symbol:   symbol-to-word ratio ≤ 0.1 PER symbol type — '#' chars
    *                and '...'/'…' runs each individually, not their sum
    *  - f_bullet:   ≤ 90% of lines start with a bullet (-, *, •)
    *  - f_ellipsis: ≤ 30% of lines end with an ellipsis
    *  - f_alpha:    ≥ 80% of words contain an alphabetic character
    *  - f_stop:     ≥ 2 distinct Gopher stop words present
    */
  def gopherFlags(text: Column): Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)
    val words = size(toks)
    val chars = aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val dots = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3 +
      (length(text) - length(regexp_replace(text, "…", "")))
    val lines = filter(split(text, "\n"), l => length(trim(l)) > 0)
    val nLines = greatest(size(lines), lit(1)) // a no-newline doc is one line
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]")))
    val ellipsisLines = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]")))
    val stopHits = size(array_intersect(array_distinct(toks),
      typedlit(Seq("the", "be", "to", "of", "and", "that", "have", "with"))))
    val fWc = words.geq(50) && words.leq(100000)
    val fMwl = (chars >= words * 3) && (chars <= words * 10)
    val fSymbol = (hashes * 10 <= words) && (dots * 10 <= words)
    val fBullet = bulletLines * 10 <= nLines * 9
    val fEllipsis = ellipsisLines * 10 <= nLines * 3
    val fAlpha = alphaWords * 5 >= words * 4
    val fStop = stopHits >= 2
    struct(
      fWc.as("f_wc"), fMwl.as("f_mwl"), fSymbol.as("f_symbol"),
      fBullet.as("f_bullet"), fEllipsis.as("f_ellipsis"),
      fAlpha.as("f_alpha"), fStop.as("f_stop"),
      (fWc && fMwl && fSymbol && fBullet && fEllipsis && fAlpha && fStop).as("keep"))
  }

  /** Gopher repetition rules (Rae et al. 2021 A1.2, the top-n-gram subset):
    * a document is removed when the characters covered by its most frequent
    * word n-gram exceed 20% (n=2), 18% (n=3) or 16% (n=4) of the document.
    * Covered chars are `top_count · chars(gram)` with the gram's tokens
    * joined by single spaces, over `length(text)` raw characters — an
    * explicit, engine-replayable reading of the paper's "fraction of
    * characters contained within the most frequently-occurring n-gram"
    * (the paper's duplicate-n-gram-coverage rules need overlap-interval
    * merging and are deliberately out of scope — documented, not faked).
    * Thresholds compare in INTEGER arithmetic like [[gopherFlags]]; each
    * n-gram census is one per-row [[graft.expressions.TopNgramStats]]
    * HashMap, so the whole rule set is a single narrow scan, no shuffle.
    * Flag true = passes; `keep` = all three.
    */
  def repetitionFlags(text: Column): Column = {
    val br = org.apache.spark.sql.graft.ColumnBridge
    val toks = filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)
    val chars = length(text)
    def covered(n: Int): Column = {
      val st = br.column(graft.expressions.TopNgramStats(br.expression(toks), n))
      element_at(st, 1) * element_at(st, 2)
    }
    // keep ⇔ covered/chars ≤ θ, cross-multiplied: 0.20 = 1/5, 0.18 = 9/50,
    // 0.16 = 4/25 (removal is strictly >θ, so ≤ keeps the boundary doc)
    val f2 = covered(2) * 5 <= chars
    val f3 = covered(3) * 50 <= chars * 9
    val f4 = covered(4) * 25 <= chars * 4
    struct(f2.as("f_top2"), f3.as("f_top3"), f4.as("f_top4"),
      (f2 && f3 && f4).as("keep"))
  }

  /** Count-Min sketch aggregate ([[graft.expressions.CountMinAgg]]):
    * `depth × width` counters answering later point-frequency queries for
    * ANY key — est ≥ exact always, est ≤ exact + ε·n w.h.p. Returns
    * `struct<n, table>`; probe with [[cmEstimate]].
    */
  def cmSketch(item: Column, depth: Int = 5, width: Int = 2048): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.CountMinAgg(
        org.apache.spark.sql.graft.ColumnBridge.expression(item), depth, width)
        .toAggregateExpression())

  /** Point estimate from a [[cmSketch]] result: min over the d probed
    * counters. Replays [[graft.expressions.CountMin.seeds]]'s double
    * hashing with stock codegen'd expressions (`fnv1a64` + `pmod` +
    * `element_at`) — every intermediate stays < depth·width², so the
    * arithmetic is ANSI-overflow-free. `depth`/`width` MUST match the
    * sketch's build parameters.
    */
  def cmEstimate(sketch: Column, item: Column,
                 depth: Int = 5, width: Int = 2048): Column = {
    val b1 = pmod(fnv1a64(item), lit(width.toLong))
    val b2 = lit(1L) + lit(2L) * pmod(
      fnv1a64(concat(item, lit(graft.expressions.CountMin.Salt))),
      lit(width.toLong / 2L))
    val probes = (0 until depth).map { i =>
      element_at(sketch.getField("table"),
        (pmod(b1 + lit(i.toLong) * b2, lit(width.toLong))
          + lit(i.toLong * width) + lit(1L)).cast("int"))
    }
    probes.reduceLeft((a, b) => least(a, b))
  }
}
