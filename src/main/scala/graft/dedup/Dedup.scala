package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Corpus deduplication operators for large-scale training-data pipelines
  * (north-star, SURVEY §7.1 phase 4): exact, MinHash+LSH, SimHash, n-gram
  * Jaccard, and embedding-cosine near-dup.
  *
  * Scale design notes (100 TB posture):
  *  - Signatures (minhash/simhash/fingerprints) are single-pass codegen'd
  *    expressions — no shuffle to build, embarrassingly parallel.
  *  - Candidate generation is always a *bucket* `groupBy` (band hash, simhash
  *    chunk, LSH bucket): one shuffle keyed on the bucket, never an all-pairs
  *    join. Bucket width controls the shuffle's fan-in.
  *  - `maxBucket` caps pathological buckets (stop-shingles, boilerplate) so a
  *    hot key cannot quadratically explode a task — the skew guard.
  *  - Verification joins are on doc-id pairs (narrow, hash-joinable) against
  *    the pre-computed shingle-set table, so the expensive exact Jaccard runs
  *    only on candidates.
  */
object Dedup {

  // ---------------------------------------------------------------- exact

  /** Exact dedup: one representative row (minimum id) per distinct key.
    * Map-side partial aggregation makes this a single shuffle on the key
    * hash; at 100 TB the key would be a 64-bit fingerprint rather than the
    * raw text (see [[graft.functions.TextFunctions.fingerprint64]]) to keep
    * shuffle volume at 8 bytes/row.
    */
  def exact(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(min(col(idCol)).as(idCol))

  // ------------------------------------------------------------- shingles

  /** Distinct word `n`-gram shingle set per document (lowercased,
    * whitespace-tokenized). Documents shorter than `n` words get an empty
    * set. Native expression ([[graft.expressions.WordShingles]]) — one
    * JIT-compiled loop per row instead of a four-lambda HOF chain.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.WordShingles(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks), n))
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(a) + size(b) - inter
    when(union > 0, inter.cast("double") / union).otherwise(lit(0.0))
  }

  /** doc_id → shingle set table (the verification side-input). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // fan out before shingling: the shingle kernel (tokenize + FNV per
    // n-gram window) is the CPU of every consumer's first stage, and a
    // single-file corpus scans as ONE split — profiled 0.5 s one-core on
    // q_ngram_jaccard/q_doc_containment before the fan-out. Ships (id,
    // text) once; no-op at scale where the scan has ≥ cores splits.
    graft.operators.Par.fanOut(df.select(col(idCol).as("doc_id"), col(textCol).as("__t")), Seq("doc_id"))
      .select(col("doc_id"), wordShingles(col("__t"), n).as("shingles"))

  // ------------------------------------- exact n-gram Jaccard (baseline)

  /** Auto-derived hot-shingle cap: drop shingles present in more than
    * `max(64, corpusN/100)` documents. A shingle at document frequency f
    * contributes f²/2 pairs to the inverted-index self-join, so ONE
    * boilerplate 5-gram shared by 1% of a 10M-doc corpus is a 5·10⁹-pair
    * task; under the cap a surviving shingle contributes ≤ 2k pairs. A
    * natural-language word 5-gram above the cap is boilerplate
    * (header/footer/license text), not signal.
    */
  def autoDocFreqCap(corpusN: Long): Int =
    math.max(64L, corpusN / 100L).min(Int.MaxValue.toLong).toInt

  /** Exact all-pairs n-gram Jaccard ≥ `threshold`, via an inverted index on
    * shingles: explode → self-join on shingle → per-pair intersection count →
    * |A∪B| = |A|+|B|−|A∩B|. No signature approximation — this is the oracle
    * semantics MinHash must reproduce. Cost is Σ_s df(s)² over shingle doc
    * frequencies, which ONE boilerplate shingle makes quadratic in the
    * corpus — so the hot-shingle guard is ON by default: `maxDocFreq < 0`
    * derives [[autoDocFreqCap]] from the corpus size (`corpusN`, counted if
    * not supplied), `0` disables the guard (pre-r5 behavior), `> 0` is an
    * explicit cap. Dropped shingles are excluded from the INTERSECTION but
    * not the set sizes, so affected pairs report a conservatively LOWER
    * Jaccard — and a corpus whose every shingle is hot (e.g. > cap exact
    * copies of one document) reports no pairs at all: exact-duplicate
    * handling at that multiplicity belongs to [[exact]]/[[minhashPairs]],
    * whose banding caps hot buckets instead of dropping shingles.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double, maxDocFreq: Int = -1,
                        corpusN: Long = -1L): DataFrame = {
    val cap =
      if (maxDocFreq >= 0) maxDocFreq
      else autoDocFreqCap(if (corpusN >= 0) corpusN else df.count())
    val sets = shingleSets(df, idCol, textCol, n)
    // FULL set size rides each inverted-index row (+8 bytes on a ~50-byte
    // shingle row): the alternative — joining size(shingles) back onto the
    // pair set per side — re-scans and re-shingles the whole corpus and
    // shuffles the (larger-than-n) candidate-pair set twice more. Sizes are
    // taken BEFORE the hot-shingle drop, so capped pairs keep reporting the
    // conservatively lower Jaccard over full set sizes (same values as the
    // join-back formulation, row for row).
    val inv0 = sets.select(col("doc_id"), size(col("shingles")).as("nd"),
      explode(col("shingles")).as("s"))
    val inv = if (cap > 0) {
      val hot = inv0.groupBy("s").count().filter(col("count") > cap).select("s")
      inv0.join(hot, Seq("s"), "left_anti")
    } else inv0
    inv.as("x").join(inv.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.nd").as("na"), col("y.nd").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Directed n-gram containment pairs (Broder's *containment*, the
    * asymmetric cousin of resemblance): C(A→B) = |A∩B| / |A| — near 1.0
    * when A's shingles are mostly inside B even if B is much larger, which
    * Jaccard (|A∩B|/|A∪B|) suppresses. This is the quote / excerpt /
    * doc-inside-doc detector a dedup pass needs alongside near-dup pairs:
    * a 200-word article pasted into a 20k-word page has Jaccard ≈ 0.01 but
    * containment ≈ 1.0.
    *
    * Same scale posture as [[ngramJaccardPairs]]: candidates come from the
    * hot-capped inverted index (Σ_s df(s)² bounded by the doc-frequency
    * cap), intersection counts are one partial-aggregated shuffle on the
    * (a, b) pair key, and set sizes join back on the narrow doc-id. Emits
    * both directions plus the Jaccard so the asymmetry is visible; filter
    * is on max(contain_ab, contain_ba) ≥ `threshold`.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double, maxDocFreq: Int = -1,
                       corpusN: Long = -1L): DataFrame = {
    val cap =
      if (maxDocFreq >= 0) maxDocFreq
      else autoDocFreqCap(if (corpusN >= 0) corpusN else df.count())
    val sets = shingleSets(df, idCol, textCol, n)
    // sizes ride the inverted index — same one-corpus-scan restructure as
    // [[ngramJaccardPairs]] (see the note there)
    val inv0 = sets.select(col("doc_id"), size(col("shingles")).as("nd"),
      explode(col("shingles")).as("s"))
    val inv = if (cap > 0) {
      val hot = inv0.groupBy("s").count().filter(col("count") > cap).select("s")
      inv0.join(hot, Seq("s"), "left_anti")
    } else inv0
    inv.as("x").join(inv.as("y"), col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        col("x.nd").as("na"), col("y.nd").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("a"), col("b"),
        round(col("inter").cast("double") / col("na"), 6).as("contain_ab"),
        round(col("inter").cast("double") / col("nb"), 6).as("contain_ba"),
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 6).as("jaccard"))
      .filter(greatest(col("contain_ab"), col("contain_ba")) >= threshold)
  }

  /** Edit-distance near-dup pairs under blocking: documents are compared
    * only within a (`blockCols`) block, on the first `prefixLen` chars,
    * keeping pairs with Levenshtein ≤ `maxDist`. The classic
    * entity-resolution shape: blocking bounds candidates to Σ_b |b|²
    * (choose keys so blocks are small — here length-bucket × source), the
    * O(prefixLen²) DP runs only on candidates, and the block join is an
    * equi-join on the block key (co-partitioned, AQE-skew-splittable).
    * At corpus scale, swap the grouping keys for SimHash bands
    * ([[simhashPairs]]) — same pair-in-block contract, tighter blocks.
    */
  def editDistancePairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[Column], prefixLen: Int,
                        maxDist: Int): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      substring(col(textCol), 1, prefixLen).as("__t"),
      struct(blockCols: _*).as("__blk"))
    // two-tier filter on the candidates: |len(a)−len(b)| > k already implies
    // edit distance > k (drops most of the block for free), then the BANDED
    // threshold DP — O(prefixLen·k) cells instead of O(prefixLen²), −1 when
    // the band is exceeded. Measured on sf0.1: 18.4 s → sub-second for the
    // same exact result. fanOut on the probe side: the DP executes in the
    // probe partitions of a broadcast join, and a single-file corpus scans
    // as ONE split — without the fan-out the whole DP ran one-core
    // (r12 tail audit: 1.99 s warm with zero shuffle bytes was the tell).
    graft.operators.Par.fanOut(base, Seq("__id")).as("x").join(base.as("y"),
        col("x.__blk") === col("y.__blk") && col("x.__id") < col("y.__id") &&
          abs(length(col("x.__t")) - length(col("y.__t"))) <= maxDist)
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        levenshtein(col("x.__t"), col("y.__t"), maxDist).cast("long").as("edit_dist"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
  }

  /** Exact set-similarity join via PPJoin-style prefix filtering: the same
    * pairs ≥ `threshold` as [[ngramJaccardPairs]] with the guard OFF, but
    * the candidate set comes from a PREFIX inverted index instead of the
    * full one. Each document keeps only its first
    * p = n − ⌈τ·n⌉ + 1 shingles under a global (docFreq asc, shingle asc)
    * order — two sets with Jaccard ≥ τ must share a prefix shingle
    * (Chaudhuri et al. 2006 prefix-filter lemma), so the join is LOSSLESS
    * while indexing only the RAREST ~(1−τ) fraction of each set: hot
    * boilerplate shingles sort last and never enter the index, which kills
    * the df² blowup [[autoDocFreqCap]] can only truncate (and truncation
    * under-reports Jaccard; this path is exact). ⌈τ·n⌉ is computed in
    * integer arithmetic from the rational `tNum/tDen` — a float ceil can
    * round UP and silently shrink the prefix below the lossless bound.
    * Candidates verify with one array_intersect over the pair's full
    * shingle sets. Scale: one df-join + per-doc sort, prefix self-join
    * Σ_{rare s} df(s)², verification O(|candidates|).
    */
  def ppjoinPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                  tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum < tDen, s"threshold in (0,1): $tNum/$tDen")
    val threshold = tNum.toDouble / tDen
    val sets = shingleSets(df, idCol, textCol, n).filter(size(col("shingles")) > 0)
    val inv = sets.select(col("doc_id"), explode(col("shingles")).as("s"))
    val dfreq = inv.groupBy(col("s")).agg(count(lit(1)).as("__df"))
    // __n = count over the SAME doc_id window partition the prefix rank
    // already shuffles+sorts for: shingles are a distinct set, so the
    // per-doc inverted-index row count IS size(shingles) — the former
    // join-back re-scanned and re-shingled the corpus for a number this
    // window already has in hand (plan: one Window operator, no extra
    // exchange, one fewer corpus scan).
    val pref = inv.join(dfreq, "s")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("__df"), col("s"))))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("__rn") <=
        col("__n") - expr(s"(($tNum * __n) + $tDen - 1) div $tDen") + 1)
      .select(col("doc_id"), col("s"))
    val cands = pref.as("x").join(pref.as("y"),
        col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
    cands
      .join(sets.select(col("doc_id").as("a"), col("shingles").as("__sa")), "a")
      .join(sets.select(col("doc_id").as("b"), col("shingles").as("__sb")), "b")
      .select(col("a"), col("b"),
        round(size(array_intersect(col("__sa"), col("__sb"))).cast("double") /
          (size(col("__sa")) + size(col("__sb")) -
            size(array_intersect(col("__sa"), col("__sb")))), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Jaro–Winkler near-dup pairs under the same blocking contract as
    * [[editDistancePairs]]: compare only within a block, on `prefixLen`-char
    * prefixes, keep pairs at similarity ≥ `minSim`. The JW scorer is the
    * native [[graft.expressions.JaroWinkler]] (codegen'd, DuckDB-bit-exact)
    * — the name-matching workhorse of entity resolution, where edit
    * distance over-penalizes transpositions.
    */
  def jaroWinklerPairs(df: DataFrame, idCol: String, textCol: String,
                       blockCols: Seq[Column], prefixLen: Int,
                       minSim: Double): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      substring(col(textCol), 1, prefixLen).as("__t"),
      struct(blockCols: _*).as("__blk"))
    // same probe-side fan-out as editDistancePairs: the JW scorer runs in
    // the probe partitions, and one-split corpora would run it one-core
    graft.operators.Par.fanOut(base, Seq("__id")).as("x").join(base.as("y"),
        col("x.__blk") === col("y.__blk") && col("x.__id") < col("y.__id"))
      .select(col("x.__id").as("a"), col("y.__id").as("b"),
        graft.functions.TextFunctions.jaroWinkler(col("x.__t"), col("y.__t")).as("__jw"))
      .filter(col("__jw") >= minSim)
      .select(col("a"), col("b"), round(col("__jw"), 6).as("jw"))
  }

  // ----------------------------------------------------------- MinHash+LSH

  /** MinHash parameters. `numHashes = bands * rowsPerBand`. With the default
    * 128 hashes in 64 bands of 2, the probability of *missing* a pair at
    * Jaccard j is (1−j²)^64 — ≈1e-29 at j=0.8, so LSH candidates + exact
    * verification reproduce the exact result with overwhelming probability
    * while scanning each document once.
    */
  final case class MinHashParams(numHashes: Int = 128, bands: Int = 64, seed: Long = 42L) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand: Int = numHashes / bands
    private val rng = new scala.util.Random(seed)
    /** Affine-permutation coefficients h_i(x) = (a_i·x + b_i) mod p.
      * Coefficients and hashed inputs are kept below 2^31 so a·x + b < 2^63
      * — no Long overflow, ANSI-mode safe (Spark 4 default).
      */
    val p: Long = 2147483647L // 2^31 - 1, prime
    val as: Array[Long] = Array.fill(numHashes)(rng.nextInt(Int.MaxValue - 1).toLong + 1)
    val bs: Array[Long] = Array.fill(numHashes)(rng.nextInt(Int.MaxValue).toLong)
  }

  /** MinHash signature (array of `numHashes` longs) from a shingle-set
    * column — a native codegen'd Catalyst expression
    * ([[graft.expressions.MinHashSignature]]): one `|shingles| × numHashes`
    * primitive loop per row inside whole-stage codegen, no UDF, no shuffle.
    */
  def minhashSignature(shingles: Column, params: MinHashParams): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.graft.ColumnBridge.expression(shingles),
        params.as, params.bs))

  /** Candidate pairs via LSH banding: a pair is a candidate iff some band of
    * their signatures is identical. One explode (doc × bands) + one groupBy
    * on a hashed 64-bit band key — the only shuffle. Hashing (band index,
    * band signature) down to one long keeps the aggregate on a primitive
    * key (grouping on `array<long>` falls out of the fast hash-aggregate
    * path); a hash collision can only ADD a candidate, and every candidate
    * is exactly verified afterwards. `maxBucket` caps degenerate buckets
    * (skew guard).
    */
  def minhashCandidates(signed: DataFrame, params: MinHashParams, maxBucket: Int = 1000): DataFrame = {
    val r = params.rowsPerBand
    val bands = posexplode(transform(sequence(lit(0), lit(params.bands - 1)),
      i => slice(col("sig"), i * r + 1, lit(r))))
    val tagged = signed
      .select(col("doc_id"), bands.as(Seq("band", "band_sig")))
      .select(col("doc_id"), xxhash64(col("band"), col("band_sig")).as("bk"))
    // skew guard via window count — shares the self-join's partitioning
    val guarded = tagged
      .withColumn("_bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
      .filter(col("_bn").between(2, maxBucket)).drop("_bn")
    guarded.as("x").join(guarded.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** MinHash+LSH near-dup pairs with exact verification: signatures →
    * banded candidates → exact Jaccard on candidates only. Same output as
    * [[ngramJaccardPairs]] (w.h.p.), but each document is scanned once and
    * the only quadratic work is within buckets.
    *
    * Verification joins carry xxhash64-hashed shingle sets (8 bytes/element)
    * instead of the shingle strings (~40 bytes) — a 5× smaller shuffle and a
    * cheaper long-vs-string intersection, with identical Jaccard values
    * w.h.p. (a 64-bit cross-collision within one pair's sets is ~2^-64 per
    * shingle pair).
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, params: MinHashParams = MinHashParams(),
                   corpusN: Long = -1L, broadcastMaxRows: Long = 200000L): DataFrame = {
    val sets = shingleSets(df, idCol, textCol, n)
      .select(col("doc_id"), array_distinct(transform(col("shingles"), s => xxhash64(s))).as("hs"))
    // signature side derives from shingleSets too — two wins over the old
    // direct `df.select(wordShingles...)`: (1) the |shingles|×numHashes
    // signature kernel runs AFTER shingleSets' fan-out exchange, so a
    // single-split corpus no longer computes every signature one-core
    // (the editDistancePairs/codec-fan-out lesson — this was the only
    // heavy kernel left on an unfanned scan); (2) both branches derive
    // from the same shingleSets call so a planner that keeps the subtrees
    // canonically equal CAN share them — in practice per-branch filter
    // pushdown specializes each side's parquet scan, so the corpus is
    // still read twice (plan-audited r18: scans 10 → 10; the win is the
    // fan-out, not scan sharing). Two column-pruned scans beat
    // materializing a corpus-sized shingle table, so this is where it
    // stays.
    val signed = shingleSets(df, idCol, textCol, n)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), minhashSignature(col("shingles"), params).as("sig"))
    val cand = minhashCandidates(signed, params)
    // broadcast the hashed-set side of verification when the caller knows
    // the corpus fits (~200 MB at 1 KB/doc); Spark's estimate for the
    // derived projection otherwise flips to a shuffle join (0.5 s of the
    // 1.7 s query at sf0.1). Unknown count → leave the planner to decide.
    val bcast: DataFrame => DataFrame =
      if (corpusN >= 0 && corpusN <= broadcastMaxRows) broadcast(_) else identity
    cand
      .join(bcast(sets.select(col("doc_id").as("a"), col("hs").as("sa"))), "a")
      .join(bcast(sets.select(col("doc_id").as("b"), col("hs").as("sb"))), "b")
      .select(col("a"), col("b"), round(jaccard(col("sa"), col("sb")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over whitespace tokens: per-bit ±1 votes from each
    * token's 64-bit hash, sign-packed MSB-first — a native codegen'd Catalyst
    * expression ([[graft.expressions.SimHash64]]): one `|tokens| × 64`
    * primitive loop per row, no UDF, no shuffle.
    *
    * Tokens hash with FNV-1a by default: engine-portable (the DuckDB oracle
    * recomputes the signature bit-for-bit — see q_simhash_pairs), same
    * blocking quality as xxhash64. `useFnv = false` selects xxhash64.
    */
  def simhash64(text: Column, useFnv: Boolean = true): Column = {
    val toks = filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SimHash64(
        org.apache.spark.sql.graft.ColumnBridge.expression(toks), useFnv))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, via
    * pigeonhole chunk blocking (Manku et al., WWW'07): the 64 bits split into
    * `maxHamming + 1` chunks, so two hashes within `maxHamming` differing
    * bits MUST agree on at least one whole chunk — grouping on chunks finds
    * every such pair with zero false negatives, in one shuffle. More chunks
    * (higher `maxHamming`) ⇒ wider buckets ⇒ more candidates: the classic
    * deployment is maxHamming=3 with 4 × 16-bit chunks.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int, maxBucket: Int = 1000): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      "chunk blocking needs maxHamming+1 <= 16 chunks of >= 4 bits")
    val c = maxHamming + 1
    val bounds = (0 to c).map(i => i * 64 / c)
    val chunkCols = (0 until c).map { i =>
      val lo = bounds(i)
      val w = bounds(i + 1) - lo
      val mask = if (w == 64) -1L else (1L << w) - 1
      shiftrightunsigned(col("sim"), lo).bitwiseAND(mask)
    }
    // Token-less documents (empty/whitespace-only) have no signal: all-zero
    // votes pack to the all-ones signature, so every such doc would pair
    // with every other at hamming 0 — a meaningless quadratic clique (and a
    // divergence from engines that drop token-less docs, e.g. the DuckDB
    // oracle's unnest of an empty token list). Drop them up front.
    val hashed = df
      .filter(size(filter(split(trim(lower(col(textCol))), "\\s+"), t => length(t) > 0)) > 0)
      .select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sim"))
    val chunks = posexplode(array(chunkCols: _*))
    val buckets = hashed
      .select(col("doc_id"), col("sim"), chunks.as(Seq("chunk", "ck")))
      .groupBy(col("chunk"), col("ck"))
      .agg(array_sort(collect_list(struct(col("doc_id"), col("sim")))).as("xs"))
      .filter(size(col("xs")).between(2, maxBucket))
    buckets
      .select(explode(flatten(transform(sequence(lit(0), size(col("xs")) - 2), i =>
        transform(slice(col("xs"), i + 2, size(col("xs")) - 1 - i),
          y => struct(element_at(col("xs"), i + 1).as("x"), y.as("y")))))).as("p"))
      .select(col("p.x.doc_id").as("a"), col("p.y.doc_id").as("b"),
        hamming(col("p.x.sim"), col("p.y.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // --------------------------------------------------- duplicate resolution

  /** Resolve near-dup PAIRS into keep/drop decisions: connected components
    * over the pair graph, each component represented by its minimum doc id.
    * Returns (doc_id, keep_id) for every document that appears in a pair —
    * rows with doc_id != keep_id are the ones a dedup pass drops.
    *
    * Two paths, size-gated on the EDGE count (one cheap job):
    *  - `≤ maxDriverEdges`: union-find on the driver. The verified near-dup
    *    pair set is orders of magnitude smaller than the corpus (it is the
    *    output of the LSH+verify funnel), so even 100 TB corpora typically
    *    yield driver-sized pair graphs; a distributed iteration on a 255-edge
    *    graph is pure scheduling overhead (measured 2.6 s vs ~0.1 s).
    *  - otherwise: iterative min-label propagation WITH POINTER HALVING,
    *    entirely in DataFrames — per round every node adopts the smallest
    *    label among itself and its neighbors, then additionally the label
    *    of that label (one extra join), so labels shortcut along label
    *    chains and convergence is O(log component diameter) rounds, not
    *    O(diameter): the default 20-round budget covers ~2^20-deep
    *    components instead of 20-deep ones. Each round is two shuffles on
    *    the edge/label tables; no driver-side graph. Non-convergence at
    *    maxRounds throws (a partial label table would under-merge
    *    duplicates SILENTLY — the worst dedup failure mode).
    * Both paths are asserted equal in DedupSpec (deep chain included);
    * ScaleProbe's "deep-chain resolve" row measures rounds/bytes at depth
    * 2^14.
    */
  def resolveDuplicates(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                        maxRounds: Int = 20, maxDriverEdges: Long = 1L << 22): DataFrame = {
    val spark = pairs.sparkSession
    // persist the skinny (u, v) projection: the size gate needs a count and
    // whichever path follows re-reads the edges — without this the whole
    // upstream pair pipeline (LSH + verification) would execute twice.
    // Ids keep their original type: min/least propagate any orderable type,
    // and casting (e.g. string ids) to long would null them out.
    val rawEdges = pairs.select(col(aCol).as("u"), col(bCol).as("v")).persist()
    // fast path requires BOTH id columns to share one integral type: the
    // result casts back to aCol's type, which would truncate wider b-ids
    val integralIds = {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      val ts = rawEdges.schema.map(_.dataType).distinct
      ts.size == 1 && Seq(ByteType, ShortType, IntegerType, LongType).contains(ts.head)
    }
    val nEdges = rawEdges.count()
    // the union-find fast path is long-keyed — only integral id types take it
    if (integralIds && nEdges <= maxDriverEdges) {
      // union-find with path compression; roots then remapped to the
      // component minimum so the semantics match the distributed path
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      val collected = rawEdges
        .select(col("u").cast("long"), col("v").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      collected.foreach { case (u, v) =>
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
      }
      val allNodes = collected.iterator.flatMap(p => Iterator(p._1, p._2)).toSet
      val minOfRoot = scala.collection.mutable.LongMap.empty[Long]
      allNodes.foreach { id =>
        val r = find(id)
        minOfRoot(r) = math.min(minOfRoot.getOrElse(r, id), id)
      }
      import spark.implicits._
      rawEdges.unpersist()
      val idType = pairs.schema(pairs.schema.fieldIndex(aCol)).dataType
      return allNodes.toSeq.sorted.map(id => (id, minOfRoot(find(id))))
        .toDF("id", "keep_id")
        .select(col("id").cast(idType).as("id"), col("keep_id").cast(idType).as("keep_id"))
    }
    val edges = rawEdges
      .unionByName(rawEdges.select(col("v").as("u"), col("u").as("v")))
      .distinct().cache()
    // Each round references the previous labels twice (propagate + converge
    // check), so the logical plan would DOUBLE per round without lineage
    // truncation — localCheckpoint materializes the round's result and cuts
    // the plan (at cluster scale: checkpoint() to reliable storage instead).
    var labels = edges.select(col("u").as("id")).distinct()
      .withColumn("keep_id", col("id"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (round < maxRounds && changed > 0) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("keep_id", "v_label"), "v")
        .groupBy(col("u").as("id")).agg(min(col("v_label")).as("n_label"))
      // Propagate (adopt the smallest neighbor label), then POINTER-HALVE:
      // also adopt the label OF the adopted label (one join against the
      // round-start labels). Plain neighbor-min alone converges in
      // O(component diameter) rounds — a depth-D chain needs D rounds and
      // silently exceeds maxRounds; with halving, labels jump along the
      // label chain as well as the edge graph, and a depth-2^14 chain
      // converges in 15 rounds (ScaleProbe "deep-chain resolve" measures
      // this). Any member's label is a valid upper bound for the component
      // min, so halving never breaks correctness (asserted against the
      // union-find path in DedupSpec, deep chain included).
      val prop = labels.select(col("id"), col("keep_id").as("__old"))
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("__old"),
          least(col("__old"), coalesce(col("n_label"), col("__old"))).as("__k1"))
      // Fold the convergence flag into the SAME select that the checkpoint
      // materializes: the old formulation re-joined next against the previous
      // labels just to count changes — a second shuffling job per round. Now
      // the post-checkpoint count only scans the cached round result.
      val next = prop
        .join(labels.select(col("keep_id").as("__gp"), col("id").as("__k1")), Seq("__k1"), "left")
        .select(col("id"),
          least(col("__k1"), coalesce(col("__gp"), col("__k1"))).as("keep_id"),
          (least(col("__k1"), coalesce(col("__gp"), col("__k1"))) < col("__old")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      // `next` is materialized — the PREVIOUS round's checkpoint blocks are
      // dead weight from here on; release them (Dataset.unpersist can't:
      // checkpoint storage bypasses the CacheManager). Only the final
      // round's label table — the returned result — stays resident.
      org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(labels)
      labels = next.drop("chg")
      round += 1
    }
    edges.unpersist()
    rawEdges.unpersist()
    // LOUD failure, never silent wrong answers: hitting maxRounds with
    // changes still flowing means some component is not fully resolved —
    // returning the partial labels would under-merge duplicates silently
    // (the worst failure mode for a dedup pass). With pointer halving the
    // default budget covers component diameters up to ~2^maxRounds, so a
    // trip here is a genuinely pathological graph — surface it.
    require(changed == 0,
      s"resolveDuplicates did not converge in $maxRounds rounds " +
        s"($changed labels still changing) — raise maxRounds; with pointer " +
        "halving each extra round doubles the resolvable component diameter")
    labels
  }

  /** Policy-driven duplicate resolution: like [[resolveDuplicates]], but the
    * survivor of each near-dup component is the member with the HIGHEST
    * `scoreCol` in `priority` (ties → smallest id) instead of the smallest
    * id — "keep the best-quality copy", the rule curation pipelines
    * actually want (min-id keeps whichever copy happened to be ingested
    * first). Components still come from the same min-label machinery, so
    * the component structure is shared/spec-comparable with the plain
    * resolver; the policy is applied as one aggregation over it.
    *
    * Scale shape: `priority` joins only the component MEMBERS (near-dup-
    * sized, not corpus-sized); the argmax is a partial-aggregating
    * `min(struct(-score, id))` per component — no sort window, hot
    * components cost what any component costs.
    *
    * Coverage: `priority` need not score every document — unscored members
    * simply are not candidates, and a component with NO scored member falls
    * back to the min-id rule (its root) rather than silently vanishing from
    * the mapping. Scores join through a LEFT join for exactly this reason.
    */
  def resolveDuplicatesBy(pairs: DataFrame, priority: DataFrame,
                          idCol: String, scoreCol: String,
                          aCol: String = "a", bCol: String = "b"): DataFrame = {
    val comp = resolveDuplicates(pairs, aCol, bCol)
      .withColumnRenamed("keep_id", "__root")
    val scored = comp.join(
      priority.select(col(idCol).as("id"), col(scoreCol).cast("double").as("__s")), "id")
    val winners = scored.groupBy(col("__root"))
      .agg(min(struct(negate(col("__s")).as("__neg"), col("id").as("__id"))).as("__w"))
      .select(col("__root"), col("__w.__id").as("__win"))
    comp.join(winners, Seq("__root"), "left")
      .select(col("id"), coalesce(col("__win"), col("__root")).as("keep_id"))
  }

  /** Sorted-neighborhood (SNM) candidate pairs — the Hernández/Stolfo
    * blocking family member the prefix/length-blocked string joins
    * ([[levenshteinPairs]], [[jaroWinklerPairs]]) don't cover: sort the
    * corpus globally by `sortKey` (id as tiebreaker), then every pair
    * co-resident in a sliding window of `window` rows (rank distance <
    * window) is a candidate — O(n·window) candidates instead of O(n²),
    * catching near-dups whose keys sort adjacently (suffix typos, trailing
    * noise) that fixed-prefix blocking misses. Returns
    * `(a, b, ka, kb)` — ids ordered by rank (a before b) with both key
    * values, for the caller's similarity verify.
    *
    * Scale shape: the global rank comes from [[Analytics.rangedRank]]
    * (range-sharded boundaries — no single-task global sort), and the
    * window join is a BANDED equi-self-join on floor(rn/window): a pair
    * within rank distance < window sits in the same or adjacent band, so
    * the probe side explodes to exactly 2 skinny band tags and no task
    * ever holds more than ~2·window rows of one band — balanced by
    * construction because ranks are unique. Each qualifying pair meets on
    * exactly one band value (the build row's own), so no dedup pass.
    */
  def sortedNeighborPairs(df: DataFrame, idCol: String, sortKey: Column,
                          window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val ranked = graft.operators.Analytics.rangedRank(
        df.select(col(idCol).as("id"), sortKey.as("__k")), Seq.empty,
        Seq(col("__k"), col("id")))
      .select(col("id"), col("__k"), col("rn"))
    val w = window.toLong
    val build = ranked.select(col("id").as("b"), col("__k").as("kb"),
      col("rn").as("__rnb"), floor(col("rn") / w).as("__band"))
    val probe = ranked.select(col("id").as("a"), col("__k").as("ka"),
        col("rn").as("__rna"))
      .withColumn("__band", explode(array(
        floor(col("__rna") / w), floor(col("__rna") / w) + 1L)))
    probe.join(build, "__band")
      .filter(col("__rnb") > col("__rna") && col("__rnb") - col("__rna") < w)
      .select(col("a"), col("b"), col("ka"), col("kb"))
  }

  /** Multi-pass sorted-neighborhood blocking — the Hernández/Stolfo (SIGMOD
    * '95) completion of [[sortedNeighborPairs]]: a SINGLE sort key misses
    * duplicates whose difference lands in the key's prefix (a transposed
    * first token sorts the two copies far apart, so no window reaches
    * across), and the published method is therefore several independent
    * passes with complementary keys (name, reversed name, alternate
    * attribute concatenations) whose candidate sets are unioned before the
    * one expensive verification step. Returns DISTINCT canonical candidate
    * pairs `(a, b)` with `a < b` — ids only, no keys: each pass ranks by a
    * DIFFERENT key, so there is no one (ka, kb) to publish; callers join
    * the compare field back by id for verification (cheap: candidates are
    * O(n·window·passes), not corpus-shaped).
    *
    * Scale shape: each pass is the single-pass operator verbatim
    * (range-sharded global rank, banded window self-join — no single-task
    * sort, O(n·window) candidates); the union + distinct shuffles bare
    * 16-byte id pairs. Passes are independent scans, embarrassingly
    * parallel across the cluster.
    */
  def sortedNeighborPairsMulti(df: DataFrame, idCol: String,
                               sortKeys: Seq[Column], window: Int): DataFrame = {
    require(sortKeys.nonEmpty, "sortedNeighborPairsMulti needs >= 1 sort key")
    sortKeys.map { k =>
      // canonicalize per pass: rank order follows the pass's key, so the
      // same pair can emerge as (x,y) in one pass and (y,x) in another —
      // least/greatest makes the union's distinct see one row
      sortedNeighborPairs(df, idCol, k, window)
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
    }.reduce(_ unionByName _).distinct()
  }

  // ------------------------------------------------- embedding near-dup

  /** Exact embedding-cosine near-dup pairs (cosine ≥ threshold) — the O(n²)
    * correctness baseline. Use [[embeddingNearDupLsh]] at scale.
    */
  def embeddingNearDupExact(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    // fan out the streamed side: the quadratic dot loop must not run on a
    // single small-file scan split (no-op at scale)
    // project to (unique id, vector) BEFORE fanning out: the hash key is
    // then id-distinctive (never few-partition) and never a map column
    val base = graft.operators.Par.fanOut(
        df.select(col(idCol).as("id"), VectorFunctions.toDouble(col(vecCol)).as("v")), Seq("id"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val a = base.select(col("id").as("a"), col("v").as("va"), col("nrm").as("na"))
    val b = base.select(col("id").as("b"), col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        round(VectorFunctions.cosinePrenormed(
          VectorFunctions.dot(col("va"), col("vb")), col("na"), col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Cost-dispatched embedding near-dup — the entry point callers should
    * use. Below `crossoverN` the exact all-pairs path wins: a recall-sound
    * LSH config at low thresholds does as many candidate dots as exact
    * (T·(1+b)·2^-b ≈ 1) plus pipeline overhead. Measured at τ=0.45 with the
    * 99.9%-recall multiprobe sizing: exact 5-7× faster at n=2k, parity at
    * n=20k (`graft.ScaleProbe`), LSH ahead beyond as candidates grow
    * n^(1+ρ), ρ≈0.63. (Round 2's "4× LSH win at 20k" was measured at ~96%
    * effective recall — recall is paid for in candidates; at higher
    * thresholds p1 rises and the crossover drops sharply.) Above the
    * crossover, auto-sized LSH. The same size-gating idea as
    * [[resolveDuplicates]]' union-find fast path.
    */
  /** The [[embeddingNearDup]] dispatch decision, exposed so probes and
    * callers can print/inspect the SAME predicate the operator executes
    * (a probe re-implementing the compare silently lies the moment the
    * pricing changes). `useExact` is the verdict; the costs and the
    * auto-sized LSH config ride along for logging.
    */
  final case class NearDupDispatch(useExact: Boolean, exactCost: Double,
                                   lshCost: Double,
                                   config: (Int, Int, Int)) {
    def picked: String = if (useExact) "EXACT" else "LSH"
  }

  /** Cost-based dispatch above the small-n floor: exact costs n²/2 dots in
    * a tight codegen loop — priced at half an LSH verification dot (no join
    * machinery) — vs the LSH config's model cost (candidates + probe rows,
    * Ann.autoConfigWithCost). This encodes the measured reality that the
    * crossover is THRESHOLD-dependent: at τ=0.45/R=0.999 exact wins far
    * past 20k vectors (recall is paid for in candidates), at τ=0.7 LSH
    * reaches parity at 20k and wins beyond. When NO config holds the recall
    * (lshCost = MaxValue), the cost compare must not fall through to exact —
    * at large n that launches an infeasible O(n²) job; past the crossover,
    * best-effort LSH with the fallback config is the only tractable plan
    * (autoConfigWithCost has already logged the achieved sub-target recall).
    */
  def nearDupDispatch(corpusN: Long, threshold: Double,
                      crossoverN: Long = 8192L,
                      recall: Double = 0.999): NearDupDispatch = {
    val (config, lshCost) =
      graft.similarity.Ann.autoConfigWithCost(corpusN, threshold, recall)
    val exactCost = 0.5 * corpusN.toDouble * corpusN / 2
    val infeasible = lshCost == Double.MaxValue
    NearDupDispatch(
      corpusN <= crossoverN || (!infeasible && exactCost <= lshCost),
      exactCost, lshCost, config)
  }

  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                       threshold: Double, n: Long = -1L,
                       crossoverN: Long = 8192L,
                       recall: Double = 0.999): DataFrame = {
    val corpusN = if (n > 0) n else df.count()
    val d = nearDupDispatch(corpusN, threshold, crossoverN, recall)
    if (d.useExact)
      embeddingNearDupExact(df, idCol, vecCol, threshold)
    else
      embeddingNearDupLsh(df, idCol, vecCol, dim, threshold,
        bits = d.config._1, tables = d.config._2, probeHamming = d.config._3,
        n = corpusN, recall = recall)
  }

  /** LSH-blocked embedding near-dup: candidates share a random-hyperplane
    * bucket in at least one of `tables` tables, then exact cosine verifies.
    * Turns O(n²·d) into O(n·T·b·d + n²·T·2^-b·d): hashing is linear, and the
    * candidate fraction T·2^-b shrinks as bits grow — total work n^(1+ρ),
    * ρ = ln(1/p1)/ln 2 (≈0.63 at threshold 0.45). Crossover note: at small n
    * (e.g. the sf0.1 corpus, n=2000) a recall-sound config has
    * T·(1+b)·2^-b ≈ 1, i.e. as many candidate dots as exact all-pairs — LSH
    * loses there (use [[embeddingNearDup]], which dispatches) and pulls
    * ahead as n grows, because the n² term carries the 2^-b factor while
    * exact doesn't. Recall < 1 by nature of LSH — auto-sizing targets
    * `recall` (default 99.9%) per pair at the stated threshold via radius-1
    * multiprobe (Ann.tablesFor with probeHamming=1: ~3-5× per-table hit
    * probability, so ~5× fewer tables than single-probe needs), but the
    * 64-table clamp binds at large n/low thresholds; check
    * Ann.expectedRecall(bits, tables, threshold, probeHamming) for the
    * achieved value and raise the threshold, widen the radius, or switch
    * methods if it is too low.
    *
    * Scale shape: candidate generation shuffles only (table, bucket, id) —
    * 20 bytes/row·table — and pairs are deduped as bare (a, b) id pairs
    * BEFORE the vectors are joined back, so the wide embedding column is
    * read twice and never shuffled through the quadratic step.
    */
  def embeddingNearDupLsh(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                          threshold: Double, bits: Int = 0, tables: Int = 0,
                          seed: Long = 42L, maxBucket: Int = 2000,
                          n: Long = -1L, broadcastMaxRows: Long = 500000L,
                          probeHamming: Int = 1, recall: Double = 0.999): DataFrame = {
    require(probeHamming >= 0 && probeHamming <= 1,
      "pair multiprobe supports radius 0 (off) or 1")
    // bits/tables <= 0 → cost-optimal config from (n, threshold, recall):
    // Ann.autoConfig enumerates radius-0 and radius-1 probing and picks the
    // cheapest recall-feasible (bits, tables, radius) — fixed bits on a
    // grown corpus silently degrade to near-all-pairs, fixed tables with
    // growing bits silently lose recall, and a fixed probe radius is wrong
    // in one threshold regime or the other (radius 1 is what keeps the
    // 64-table clamp recall-feasible at low thresholds; radius 0 is cheaper
    // whenever it fits). Explicit bits+tables override everything.
    // n: caller-known corpus size (skips a count job when memoized upstream).
    val corpusN = if (n > 0) n else df.count()
    val (sizedBits, sizedTables, sizedProbe) =
      if (bits > 0 && tables > 0) (bits, tables, probeHamming)
      else if (bits > 0) // caller pinned bits: recall-size tables for THEM
        (bits, graft.similarity.Ann.tablesFor(bits, threshold, recall, probeHamming),
          probeHamming)
      else {
        val (ab, at, ap) = graft.similarity.Ann.autoConfig(corpusN, threshold, recall)
        (ab, at, ap)
      }
    val index = graft.similarity.Ann.LshIndex(dim, sizedBits, sizedTables, seed)
    // The candidate list is O(n·T/2^b) rows while the vector table is O(n):
    // when the vectors fit (≤ broadcastMaxRows ≈ 250 MB at dim 64) the
    // verification joins MUST be broadcast — Spark's size estimate for a
    // derived projection can exceed autoBroadcastJoinThreshold and silently
    // flip both joins to sort-merge over the huge candidate side (measured
    // 66 s vs 4 s on a 20k-vector corpus). Above the cap a shuffle join is
    // the right plan anyway.
    val bcast: DataFrame => DataFrame =
      if (corpusN <= broadcastMaxRows) broadcast(_) else identity
    // Same single-split guard as the exact path: a small corpus scans as ONE
    // partition, and without an exchange before the (broadcast) candidate
    // join, the bucket hashing, the quadratic pair emission, AND the cosine
    // verify all run on one core. No-op at scale.
    val vecs = graft.operators.Par.fanOut(
        df.select(col(idCol).as("doc_id"), VectorFunctions.toDouble(col(vecCol)).as("v")), Seq("doc_id"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val withB = index.withBuckets(vecs.select("doc_id", "v"), "v")
    // (table, bucket, id) tags — 20 bytes/row·table; the vector never rides along.
    val tagged = withB.select(col("doc_id"),
      posexplode(col("buckets")).as(Seq("table", "bucket")))
    // Skew guard: drop pathological buckets before the quadratic self-join.
    // A window count over (table, bucket) shares the self-join's hash
    // partitioning, so the guard adds a sort but ZERO extra exchanges
    // (a groupBy-count + semi-join formulation costs two).
    // With multiprobe a singleton bucket can still receive partners from a
    // neighboring bucket's probes, so only the hot-bucket cap applies; the
    // classic equi-probe also drops singletons (nothing can join them).
    // When n ≤ maxBucket no bucket CAN exceed the cap, so the guard is a
    // no-op by construction and the window pass (a shuffle + sort of n·T
    // tag rows) is skipped outright; the equi-probe's singleton drop is
    // only a join-probe saving, not a semantics change, so losing it in
    // that regime is free.
    val t2 = if (corpusN <= maxBucket) tagged else tagged
      .withColumn("_bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("table"), col("bucket"))))
      .filter(if (sizedProbe > 0) col("_bn") <= maxBucket
              else col("_bn").between(2, maxBucket))
      .drop("_bn")
    // Multiprobe expansion on ONE side only: each probing row re-emits its
    // bucket id with every single bit flipped ((1+bits)× rows of 20 bytes),
    // while the build side keeps real buckets — a pair still meets through a
    // plain equi-join whenever the two signatures differ in ≤ 1 bit.
    val probedX =
      if (sizedProbe <= 0) t2
      else {
        val masks = (0 until sizedBits).map(1L << _)
        t2.select(col("doc_id"), col("table"),
          explode(concat(array(col("bucket")),
            transform(typedlit(masks), m => col("bucket").bitwiseXOR(m)))).as("bucket"))
      }
    // Candidate pairs via codegen'd equi-self-join on the bucket key (not a
    // per-bucket HOF array expansion). The build side is n·T skinny
    // (id, table, bucket) rows ≈ 24 B each: when that fits an executor
    // (≤ ~100 MB) broadcast it so the probe side streams map-only instead
    // of both sides paying a full shuffle — the self-join analog of the
    // verification joins' broadcast gate below.
    val buildSide =
      if (corpusN * sizedTables <= 4000000L) broadcast(t2.as("y")) else t2.as("y")
    val cand = probedX.as("x").join(buildSide,
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    // Verification placement depends on expected candidate MULTIPLICITY
    // (how many table/probe combos re-emit the same pair). A true near-dup
    // collides in ~every table, so multiplicity ≈ tables·probes for exactly
    // the pairs a dedup corpus is full of: at few tables, re-scoring a pair
    // k times costs k cheap codegen'd dots and the distinct only shuffles
    // survivors (verify-first wins); at many tables, dedup the bare (a, b)
    // pairs BEFORE the vector joins — measured on a 100k-vector corpus of
    // 50-way near-dup clusters at T=228, verify-first re-scored 5.6e8
    // redundant candidates while distinct-first bounds dots at unique pairs.
    // NOTE on a rejected "optimization": skipping this pre-distinct when the
    // uniform-bucket sizing model expects few candidate rows looks attractive
    // (the verify becomes map-only), but real embedding corpora are
    // CLUSTERED — measured on the sf0.1 corpus the actual candidate volume
    // was ~7× the model's estimate and the post-verify distinct then paid
    // the full multiplicity (13 s vs 3 s). Multiplicity, not modeled volume,
    // decides: it is a property of the config alone and holds on any data.
    val multiplicity = sizedTables * (1 + (if (sizedProbe > 0) sizedBits else 0))
    val (candUnique, preDeduped) =
      if (multiplicity >= 16) (cand.distinct(), true) else (cand, false)
    val verified = verifyCosinePairs(candUnique, vecs,
      idIsIntegral(df.schema(idCol).dataType), corpusN, dim, threshold, bcast)
    if (preDeduped) verified else verified.distinct()
  }

  private def idIsIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType => true
    case _ => false
  }

  /** Exact-cosine verification of candidate (a, b) id pairs against the
    * corpus vector table `vecs` (doc_id, v, nrm) — the shared verify kernel
    * of every candidate-generation scheme (LSH buckets, semantic clusters).
    *
    * Two regimes. When the corpus fits a replicated flat store (n·dim
    * doubles ≤ 64 MB — the same per-executor memory contract as a broadcast
    * join's build side, minus row headers) and ids are integral, score
    * candidates with [[graft.expressions.CosineByIds]]: a pure projection
    * (two binary searches + one fused dot, ~0.3 µs/pair) instead of two
    * broadcast hash joins that each materialize an 8·dim-byte row per pair
    * (~7 µs/pair measured at dim 64) — zero joins, one WholeStageCodegen
    * span from candidate emission through the threshold filter. Above the
    * gate: the broadcast/shuffle join formulation (`bcast` is the caller's
    * size-gated broadcast hint).
    */
  private def verifyCosinePairs(cand: DataFrame, vecs: DataFrame,
                                integralIds: Boolean, corpusN: Long, dim: Int,
                                threshold: Double,
                                bcast: DataFrame => DataFrame): DataFrame =
    if (integralIds && corpusN * dim <= 8L * 1024 * 1024) {
      val rows = vecs.select(col("doc_id").cast("long"), col("v"), col("nrm"))
        .collect().sortBy(_.getLong(0))
      val ids = Array.tabulate(rows.length)(rows(_).getLong(0))
      val flat = new Array[Double](rows.length * dim)
      val norms = new Array[Double](rows.length)
      var i = 0
      while (i < rows.length) {
        val v = rows(i).getSeq[Double](1)
        var k = 0
        // zero-pad short vectors: products beyond the shorter length are 0,
        // matching DotProduct's min-length loop exactly
        while (k < v.length && k < dim) { flat(i * dim + k) = v(k); k += 1 }
        norms(i) = rows(i).getDouble(2)
        i += 1
      }
      import scala.collection.immutable.ArraySeq
      val br = org.apache.spark.sql.graft.ColumnBridge
      val cos = br.column(graft.expressions.CosineByIds(
        br.expression(col("a").cast("long")), br.expression(col("b").cast("long")),
        ArraySeq.unsafeWrapArray(ids), ArraySeq.unsafeWrapArray(flat),
        ArraySeq.unsafeWrapArray(norms), dim))
      cand.select(col("a"), col("b"), round(cos, 6).as("cos"))
        .filter(col("cos") >= threshold)
    } else cand
      .join(bcast(vecs.select(col("doc_id").as("a"), col("v").as("va"), col("nrm").as("na"))), "a")
      .join(bcast(vecs.select(col("doc_id").as("b"), col("v").as("vb"), col("nrm").as("nb"))), "b")
      .select(col("a"), col("b"),
        round(VectorFunctions.cosinePrenormed(
          VectorFunctions.dot(col("va"), col("vb")), col("na"), col("nb")), 6).as("cos"))
      .filter(col("cos") >= threshold)

  // ------------------------------------------------------- semantic dedup

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its nearest centroid, find
    * near-duplicate pairs (cosine ≥ `eps`) ONLY within each cluster, resolve
    * them to connected components, and keep the minimum-id representative of
    * each component. Returns one row per document:
    * (id, list, keep_id) — `keep_id != id` marks the rows a semantic dedup
    * pass drops. Clustering bounds the quadratic comparison at n²/k per
    * cluster (the paper's regime: k grows with n so clusters stay
    * bucket-sized), at the cost of missing cross-cluster near-dups — the
    * deliberate SemDeDup trade; pairs the paper would compare are exactly
    * the within-cluster ones.
    *
    * Scale shape: assignment is one narrow codegen'd pass (k fused dot
    * products per row, [[graft.similarity.KMeans.Model.assignCol]]); the
    * candidate step self-joins a SKINNY (list, id) projection — the wide
    * vector column never rides through the quadratic join — and
    * `maxCluster` caps pathological clusters exactly like the LSH path's
    * `maxBucket` (a window count that shares the join's hash partitioning,
    * so the guard costs a sort but no extra exchange); verification goes
    * through the shared [[verifyCosinePairs]] kernel (replicated flat store
    * below the memory gate, size-gated broadcast joins above);
    * [[resolveDuplicates]] handles components (driver union-find on the
    * near-dup-sized pair set, min-label propagation past the gate).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    model: graft.similarity.KMeans.Model, eps: Double,
                    n: Long = -1L, maxCluster: Int = 100000,
                    broadcastMaxRows: Long = 500000L): DataFrame = {
    val corpusN = if (n > 0) n else df.count()
    val bcast: DataFrame => DataFrame =
      if (corpusN <= broadcastMaxRows) broadcast(_) else identity
    val vecs = graft.operators.Par.fanOut(
        df.select(col(idCol).as("doc_id"), VectorFunctions.toDouble(col(vecCol)).as("v")), Seq("doc_id"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val assigned = vecs.select(col("doc_id"), model.assignCol(col("v")).as("list"))
    val guarded =
      if (corpusN <= maxCluster) assigned
      else assigned
        .withColumn("_cn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("list"))))
        .filter(col("_cn") <= maxCluster).drop("_cn")
    // within-cluster candidate pairs: each unordered pair appears exactly
    // once (one table, a < b), so no distinct is needed anywhere
    val cand = guarded.as("x").join(bcast(guarded.as("y")),
        col("x.list") === col("y.list") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val pairs = verifyCosinePairs(cand, vecs,
      idIsIntegral(df.schema(idCol).dataType), corpusN, dim, eps, bcast)
    val resolved = resolveDuplicates(pairs).withColumnRenamed("id", "doc_id")
    assigned.join(resolved, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol), col("list"),
        coalesce(col("keep_id"), col("doc_id")).as("keep_id"))
  }
}
