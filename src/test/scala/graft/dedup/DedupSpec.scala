package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dedup operator semantics on crafted corpora: exact keys, Jaccard math,
  * MinHash-LSH vs the exact inverted-index baseline, SimHash blocking
  * completeness, embedding near-dup exact vs LSH.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire tonight"
  private val nearDup = base.replace("tonight", "today") // one token differs
  private val other =
    "completely unrelated text about spark catalyst expressions and codegen pipelines running fast"

  private def docs = Seq(
    (1L, base), (2L, nearDup), (3L, other), (4L, base), (5L, "short text")
  ).toDF("doc_id", "text")

  test("exact dedup keeps the min id per distinct key") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out(base) === 1L)        // 1 and 4 collapse to 1
    assert(out.size === 4)
  }

  test("jaccard column math") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(Dedup.jaccard(col("x"), col("y"))).head.getDouble(0) === 0.5)
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    assert(empty.select(Dedup.jaccard(col("x"), col("y"))).head.getDouble(0) === 0.0)
  }

  test("ngramJaccardPairs finds the near-dup and the exact dup, not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical → jaccard 1.0
    assert(pairs.contains((1L, 2L))) // near-dup
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("containmentPairs flags a doc pasted inside a larger one where Jaccard stays low") {
    val small = "alpha beta gamma delta epsilon zeta eta theta"
    val big = small + " iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi"
    val corpus = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(corpus, "doc_id", "text", n = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(rows.keySet === Set((1L, 2L)))
    val (cab, cba, jac) = rows((1L, 2L))
    assert(cab === 1.0)   // every shingle of the small doc is inside the big one
    assert(cba < 0.5)     // but the big doc is mostly NOT the small one
    assert(jac < 0.5)     // and resemblance alone would have missed the pair
  }

  test("minhashPairs reproduces the exact n-gram Jaccard result") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mh = Dedup.minhashPairs(docs, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mh === exact)
  }

  test("maxDocFreq drops stop-shingles from the inverted index") {
    // every doc shares shingle "x y z"; maxDocFreq=1 kills it
    val d = Seq((1L, "x y z a"), (2L, "x y z b"), (3L, "x y z c")).toDF("doc_id", "text")
    val without = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.1)
    val withCap = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.1, maxDocFreq = 1)
    assert(without.count() === 3)   // all pairs share the hot shingle
    assert(withCap.count() === 0)   // candidate generation pruned it
  }

  test("hot-shingle guard is ON by default: a boilerplate shingle cannot go quadratic") {
    // 70 exact copies of one boilerplate doc (every shingle at df 70 > the
    // auto cap max(64, n/100) = 64) plus a real near-dup pair. Default:
    // the boilerplate clique — 70·69/2 pairs from ONE hot shingle set — is
    // pruned at candidate generation, while the low-df near-dup survives.
    val boiler = (1L to 70L).map(i => (i, "all rights reserved by the example corporation"))
    val d = (boiler ++ Seq((201L, base), (202L, nearDup))).toDF("doc_id", "text")
    val guarded = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded === Set((201L, 202L))) // boilerplate clique gone, signal kept
    val unguarded = Dedup.ngramJaccardPairs(d, "doc_id", "text", n = 3, threshold = 0.5,
      maxDocFreq = 0)
    assert(unguarded.count() === 70L * 69 / 2 + 1) // opt-out restores pre-guard behavior
  }

  test("autoDocFreqCap: 64 floor, 1% of corpus above it") {
    assert(Dedup.autoDocFreqCap(100) === 64)
    assert(Dedup.autoDocFreqCap(6400) === 64)
    assert(Dedup.autoDocFreqCap(10000000) === 100000)
  }

  test("simhashPairs drops token-less docs instead of pairing them at hamming 0") {
    // empty/whitespace docs pack all-zero votes to the all-ones signature —
    // without the filter they'd form a meaningless clique (and diverge from
    // oracles that drop token-less docs before signing)
    val d = (Seq((1L, base), (2L, nearDup)) ++
      Seq((6L, ""), (7L, "   "), (8L, "\t\n"))).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "doc_id", "text", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a >= 6L || b >= 6L })
  }

  test("embeddingNearDup dispatches to best-effort LSH, not exact, when no config holds the recall") {
    // threshold ≈ −1 makes every (bits, tables ≤ 256) config miss 99.9%
    // recall → autoConfigWithCost returns cost=MaxValue; past the crossover
    // the dispatcher must still pick LSH (an O(n²) exact job at the claimed
    // n=10⁹ would be infeasible). Plan-shape assertion only — not executed.
    val vecs = Seq((1L, Seq.fill(16)(0.1f))).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(vecs, "vec_id", "embedding", dim = 16,
      threshold = -0.9995, n = 1000000000L)
    val plan = out.queryExecution.analyzed.toString.toLowerCase
    assert(plan.contains("posexplode"), "expected the LSH bucket explode in the plan")
  }

  test("simhashPairs: identical docs at hamming 0; blocking finds all pairs <= maxHamming") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((1L, 4L)) === 0)           // identical text
    assert(pairs.contains((1L, 2L)))        // near-dup within 10 bits
    // pigeonhole completeness: brute-force check against all simhash pairs
    val hashes = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 10
    } yield ((ia, ib), d)).toMap
    assert(pairs === brute)
  }

  test("simhashPairs rejects maxHamming >= 16 (blocking guarantee boundary)") {
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 16)
    }
  }

  test("embedding near-dup exact: cosine threshold, ordered pairs only") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f)),   // cos ≈ 0.994 with v1
      (3L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to v1
      (4L, Seq(0.0f, 0.0f, 0.0f))    // zero vector → cos defined as 0
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupExact(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L)))
  }

  test("embedding near-dup LSH agrees with exact on well-separated vectors") {
    val rng = new scala.util.Random(3)
    // 20 random unit-ish vectors + 3 planted near-identical pairs
    val randoms = (1L to 20L).map(i => (i, Seq.fill(16)(rng.nextGaussian().toFloat)))
    val planted = Seq(101L, 102L, 103L).flatMap { i =>
      val v = Seq.fill(16)(rng.nextGaussian().toFloat)
      val jitter = v.map(x => x + 0.01f * rng.nextGaussian().toFloat)
      Seq((i, v), (i + 100L, jitter))
    }
    val vecs = (randoms ++ planted).toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupExact(vecs, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(vecs, "vec_id", "embedding",
      dim = 16, threshold = 0.95, bits = 4, tables = 12, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(Set((101L, 201L), (102L, 202L), (103L, 203L)) ++ exact))
    assert(lsh === exact) // high-cosine planted pairs: recall ≈ 1 at these params
  }

  test("embedding near-dup LSH auto-sizing finds the EXACT pair set on the sf0.01 corpus") {
    // recall pin on REAL data with the auto sizing the queries use: the
    // driver oracle for q_embed_near_dup_lsh is the exact-cosine SQL, which
    // only holds while radius-1 multiprobe at the 99.9% target keeps recall
    // at 100% here — any tuning that trades recall for speed fails THIS
    // spec before it fails the driver gate
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Dedup.embeddingNearDupExact(emb, "vec_id", "embedding", 0.45)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, "vec_id", "embedding", dim = 64, threshold = 0.45)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh === exact,
      s"LSH pairs != exact: missed ${(exact -- lsh).size}, spurious ${(lsh -- exact).size} of ${exact.size}")
  }

  test("simhashPairs on the sf0.01 corpus match driver-side brute force exactly") {
    // simhash is engine-specific (xxhash64 seeds) so no SQL oracle exists;
    // this is the equivalent strength check: recompute every pairwise
    // hamming distance driver-side and require exact set equality
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val hashes = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield ((ia, ib), d)).toMap
    assert(pairs === brute)
  }

  test("embeddingNearDup dispatcher: exact below the crossover, LSH above") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val exact = Dedup.embeddingNearDupExact(emb, "vec_id", "embedding", 0.45)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // n=500 < default crossover → exact path, identical pairs
    val auto = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 64, 0.45)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto === exact)
    // crossoverN = 0 forces the LSH path: subset with high recall
    val forced = Dedup.embeddingNearDup(emb, "vec_id", "embedding", 64, 0.45, crossoverN = 0L)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(forced.subsetOf(exact) && forced.size >= exact.size - 1)
  }

  test("dirty input: null/empty/whitespace text flows through without crashing") {
    // production corpora contain nulls and empties; the engine must degrade
    // (null propagation / empty sets), never throw
    val dirty = Seq((1L, "hello world of spark and more words here ok"),
      (2L, null.asInstanceOf[String]), (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val sh = dirty.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(sh(1L).get.nonEmpty)
    assert(sh(2L).isEmpty)          // null text → null shingles
    assert(sh(3L).get.isEmpty)      // empty text → empty set
    assert(sh(4L).get.isEmpty)
    assert(Dedup.exact(dirty, "text", "doc_id").count() === 4)
    assert(Dedup.minhashPairs(dirty, "doc_id", "text", 3, 0.5).count() === 0)
    // token-less docs (empty/whitespace) carry no signal and are dropped
    // before signing (r5): no meaningless hamming-0 clique, no divergence
    // from oracles that unnest empty token lists
    val simPairs = Dedup.simhashPairs(dirty, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(simPairs.isEmpty)
  }

  test("resolveDuplicates: connected components keep the min id") {
    val pairs = Seq((2L, 1L), (2L, 3L), (9L, 5L)).toDF("a", "b") // chain 1-2-3, pair 5-9
    val out = Dedup.resolveDuplicates(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 9L -> 5L))
  }

  test("resolveDuplicates converges on a long chain within maxRounds") {
    val chain = (1L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.resolveDuplicates(chain, maxRounds = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 12)
    assert(out.values.toSet === Set(1L))
  }

  test("resolveDuplicates: pointer halving resolves a deep chain in O(log depth) rounds") {
    // a 300-deep path forced onto the distributed path: plain neighbor-min
    // would need 300 rounds; halving must land it comfortably inside the
    // default 20-round budget (≈ log2(300) + a few)
    val depth = 300L
    val chain = (1L until depth).map(i => (i, i + 1)).toDF("a", "b")
    val out = Dedup.resolveDuplicates(chain, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === depth)
    assert(out.values.toSet === Set(1L))
  }

  test("resolveDuplicates fails LOUDLY when maxRounds cannot cover the diameter") {
    // a silent partial result would under-merge duplicates; the contract is
    // to throw with a message naming the dial to raise
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      Dedup.resolveDuplicates(chain, maxRounds = 2, maxDriverEdges = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    assert(e.getMessage.contains("maxRounds"))
  }

  test("resolveDuplicates works with non-numeric (string) ids via the distributed path") {
    // string ids cannot take the long-keyed union-find fast path; they must
    // fall through to min-label propagation, which orders lexicographically
    val pairs = Seq(("b", "a"), ("b", "c"), ("z", "x")).toDF("a", "b")
    val out = Dedup.resolveDuplicates(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "z" -> "x"))
  }

  test("semanticDedup matches a full driver-side replay on the sf0.01 corpus") {
    // strongest possible check, same spirit as the simhash brute-force spec:
    // recompute assignment, within-cluster cosine pairs, and union-find
    // components entirely driver-side and require row-for-row equality
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 10).orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val model = graft.similarity.KMeans.Model(cents)
    val got = Dedup.semanticDedup(emb, "vec_id", "embedding", dim = 64,
      model = model, eps = 0.45)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2)))).toMap

    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).toMap
    def assignOf(v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        var dot = 0.0; var k = 0
        while (k < 64) { dot += v(k) * c(k); k += 1 }
        (dot * -2.0 + c.map(x => x * x).sum, i)
      }.min._2
    val asg = vecs.map { case (id, v) => id -> assignOf(v) }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var k = 0
      while (k < 64) { s += a(k) * b(k); k += 1 }
      val nn = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
      if (nn > 0) s / nn else 0.0
    }
    val ids = vecs.keys.toArray.sorted
    val pairs = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      if asg(a) == asg(b) &&
        BigDecimal(cos(vecs(a), vecs(b))).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.45
    } yield (a, b)
    assert(pairs.nonEmpty, "corpus must contain within-cluster near-dups for this spec to bite")
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = asg.map { case (id, list) =>
      id -> (list, if (parent.contains(id) || pairs.exists(p => p._1 == id || p._2 == id)) find(id) else id)
    }
    assert(got === want)
  }

  test("resolveDuplicates: driver union-find and distributed propagation agree") {
    // maxDriverEdges = 0 forces the distributed path on the same graph
    val pairs = Seq((2L, 1L), (2L, 3L), (9L, 5L), (7L, 8L), (8L, 9L))
      .toDF("a", "b")
    val fast = Dedup.resolveDuplicates(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Dedup.resolveDuplicates(pairs, maxDriverEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === dist)
    assert(fast === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 7L -> 5L, 8L -> 5L, 9L -> 5L))
  }

  test("editDistancePairs: only same-block pairs compare; distance gates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "kitten one two three", "a", 1L),
      (2L, "sitten one two three", "a", 1L),  // dist 1 from doc 1
      (3L, "totally different txt", "a", 1L), // same block, far
      (4L, "kitten one two three", "b", 1L)   // identical text, other block
    ).toDF("doc_id", "text", "source", "lb")
    val out = Dedup.editDistancePairs(docs, "doc_id", "text",
        Seq(org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("lb")), prefixLen = 50, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map((1L, 2L) -> 1L))
  }

  test("ppjoinPairs equals the uncapped exact inverted index on sf0.001 docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5,
        threshold = 0.8, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pp = Dedup.ppjoinPairs(docs, "doc_id", "text", n = 5, tNum = 4, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pp === exact)
    assert(pp.nonEmpty, "expected near-dup pairs in the corpus")
  }

  test("ppjoinPairs: a corpus-wide hot shingle stays out of the prefix index") {
    import spark.implicits._
    // every doc shares the boilerplate head; only docs 1,2 are really similar
    val boiler = "common header words repeated everywhere in all docs"
    val docs = Seq(
      (1L, boiler + " alpha beta gamma delta epsilon zeta"),
      (2L, boiler + " alpha beta gamma delta epsilon eta"),
      (3L, boiler + " one two three four five six"),
      (4L, boiler + " seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val pp = Dedup.ppjoinPairs(docs, "doc_id", "text", n = 5, tNum = 3, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 5,
        threshold = 0.6, maxDocFreq = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pp === exact)
    assert(pp.contains((1L, 2L)))
  }
}
