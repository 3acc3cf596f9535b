package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the link-graph quality
  * signal a web-scale corpus pipeline ranks pages with (PageRank; Page et
  * al. 1999, the URL-level quality prior in Common-Crawl-derived curation
  * pipelines) — plus hash-deterministic weighted sampling.
  */
object Graph {

  /** Power-iteration PageRank on an edge list (`srcCol`, `dstCol`):
    * `rank'(v) = (1 − d) + d · Σ_{u→v} rank(u) / outdeg(u)` for a fixed
    * iteration count (the classic formulation; dangling nodes keep the
    * (1 − d) floor and simply don't contribute).
    *
    * Scale shape: each iteration is one shuffle-join of the slim
    * (id, rank) table against the deduplicated edge+outdegree table plus
    * one partial-aggregated groupBy(dst). The edge subtree recurs across
    * iterations with identical canonical form, so physical planning reuses
    * ONE exchange for all of them (ReusedExchange — spec-asserted) rather
    * than rescanning; no persist/localCheckpoint, so nothing stays pinned
    * across benchmark runs (the r4 localCheckpoint leak shape). Contribs
    * are summed in DECIMAL(38,18) — associative-exact, so ranks are
    * bit-identical under any partitioning and replayable by any engine.
    *
    * Null-endpoint edges are dropped up front: a null vertex is not a node
    * (the classic formulation never defines one), and the explicit base
    * filter is also what keeps every consumer's subtree canonically EQUAL —
    * without it, the joins above infer per-branch `isNotNull` constraints
    * that push down differently into the nodes / outdeg / contribs copies
    * of the edge build, and the whole edge-build pipeline (scan + join +
    * distinct, the expensive part when edges derive from a join) executes
    * once per consumer instead of once per run (plan-audited r19: the
    * q_pagerank edge build ran 4x per execution, fresh Exchanges + a
    * duplicated broadcast; one Exchange + ReusedExchange after — the same
    * one-predicate canonical mismatch as r18's q_transitivity).
    *
    * Returns (`id`, `rank`) for every node (sources and sinks).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val withDeg = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var ranks = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iterations) {
      val contribs = withDeg
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"),
          (col("rank") / col("outdeg")).cast("decimal(38,18)").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
      ranks = nodes
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) +
            lit(damping) * coalesce(col("s").cast("double"), lit(0.0))).as("rank"))
    }
    ranks
  }

  /** Per-vertex triangle counts via the degree-ordered wedge join (Suri &
    * Vassilvitskii, WWW 2011 — "Counting triangles and the curse of the
    * last reducer"): every undirected edge is directed from its lower
    * (degree, id) endpoint to the higher, each vertex generates wedges
    * only among its OUT-neighbors, and a wedge closes iff its two
    * endpoints are themselves an edge. Each triangle is found exactly
    * once — at its minimum-(degree, id) corner — then exploded to its
    * three corners for per-vertex totals.
    *
    * Scale shape: the degree ordering is THE skew defense — a celebrity
    * vertex of degree d generates wedges only from the neighbors that
    * out-rank it, bounding total wedges by O(m^1.5) instead of Σd² (the
    * "last reducer" blow-up of the naive neighbor self-join). All three
    * joins are hash equi-joins; nothing is collected. Returns
    * (`v`, `triangles`) for every vertex on ≥ 1 triangle.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val lowerFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val dirE = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(when(lowerFirst, col("a")).otherwise(col("b")).as("src"),
        when(lowerFirst, col("b")).otherwise(col("a")).as("dst"))
    val wedges = dirE.select(col("src"), col("dst").as("x"))
      .join(dirE.select(col("src"), col("dst").as("y")), "src")
      .filter(col("x") < col("y"))
    val tri = wedges.join(und,
      least(col("x"), col("y")) === col("a") &&
        greatest(col("x"), col("y")) === col("b"))
      .select(col("src"), col("x"), col("y"))
    tri.select(explode(array(col("src"), col("x"), col("y"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("triangles"))
  }

  /** Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    * exponential race (IPL 2006): each row draws `key = −ln(u) / w` from a
    * hash-derived uniform `u`, and the global `k` smallest keys win — an
    * exact weighted draw without replacement, yet embarrassingly parallel:
    * one scan plus a TakeOrdered top-k; no global sort, no sequential
    * draws, no driver state. `u` is a pure function of the id (FNV-1a into
    * 2^24 buckets, bucket center, so u ∈ (0,1) is an exact dyadic double),
    * making the sample deterministic and layout-independent.
    *
    * `weight` is clamped positive (≥ 1e-12). Returns the winners' id,
    * weight, and race key (rounded 6 dp for display; selection uses the
    * unrounded key with the id as tiebreak).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column,
                     k: Int, salt: String = "ws|"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val h = graft.functions.TextFunctions.fnv1a64(
      concat(lit(salt), col(idCol).cast("string")))
    val u = (pmod(h, lit(1L << 24)).cast("double") + lit(0.5)) / lit((1L << 24).toDouble)
    val w = greatest(weight.cast("double"), lit(1e-12))
    df.select(col(idCol), w.as("weight"), (-log(u) / w).as("race_key"))
      .orderBy(col("race_key").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("weight"), round(col("race_key"), 6).as("race_key"))
  }

  /** Bounded-depth BFS over an UNDIRECTED edge list: minimum hop count from
    * any seed, up to `maxHops`. Level-synchronous: each level is one
    * equi-join of the previous (deduplicated) frontier against the
    * symmetrized edge table; the levels union and a `min(hops)` per node
    * collapses revisits to the BFS distance.
    *
    * Deliberately NO visited-set anti-join: in a declarative engine without
    * mid-query materialization, `visited` appears both inside the next
    * level and in the result, so the lineage doubles per hop — the first
    * formulation of this operator planned 460 Exchange nodes for 3 hops
    * (measured) vs ~40 for this one. The price is wavefront re-expansion,
    * bounded by hops × |reachable| — the right trade for small fixed
    * depths; unbounded BFS belongs to a checkpointing loop like GraphX's.
    * Nothing is collected to the driver. Returns (`node`, `hops`)
    * including the seeds at hop 0.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
              seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 10, s"bounded-depth BFS only: $maxHops")
    val sym = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .union(edges.select(col(dstCol).as("__s"), col(srcCol).as("__d")))
      .distinct()
    var frontier = seeds.select(col(seedCol).as("node"))
    var levels = List(frontier.withColumn("hops", lit(0)))
    for (h <- 1 to maxHops) {
      frontier = sym.join(frontier.withColumnRenamed("node", "__s"), "__s")
        .select(col("__d").as("node")).distinct()
      levels ::= frontier.withColumn("hops", lit(h))
    }
    levels.reduce(_ union _).groupBy(col("node")).agg(min(col("hops")).as("hops"))
  }

  /** Link prediction over an undirected edge list: for every non-adjacent
    * two-hop pair (u, v), the common-neighbor count and the
    * resource-allocation index RA(u,v) = Σ_{w ∈ Γ(u)∩Γ(v)} 1/deg(w)
    * (Zhou, Lü & Zhang, Eur. Phys. J. B 71, 2009 — the RA index
    * consistently beats Adamic–Adar in their benchmark, and unlike AA it
    * needs no logarithm, so it is exactly replayable in integer
    * arithmetic). The near-dup / retrieval use: predict which documents a
    * similarity graph is MISSING edges for — candidate pairs for a second
    * verification pass.
    *
    * Exactness: each wedge center w contributes `10^12 div deg(w)`
    * picocredits (truncating integer division — decimal DIVISION result
    * scales are engine-specific, integer division is not), and the
    * per-pair score is an exact BIGINT sum, order-independent and
    * bit-identical on any engine.
    *
    * Scale shape: wedge generation explodes as Σ_w deg(w)² — the
    * celebrity-vertex blow-up triangle counting dodges with degree
    * ordering. Here every wedge through w is genuinely needed, so the
    * skew defense is `maxDeg`, and it is part of the SEMANTICS, not an
    * approximation knob the oracle can't see: centers with deg(w) >
    * maxDeg are pruned before wedge generation (each contributes
    * < 1/maxDeg ≈ nothing to RA, and a stopword-like hub's
    * common-neighbor signal is noise — the standard production cap on
    * posting/neighbor lists). The oracle replays the same prune. What
    * remains is hash equi-joins plus one partial-aggregated groupBy;
    * known edges leave via an anti-join on the same (least, greatest)
    * key. Nothing is collected. Returns (`u`, `v`, `common_neighbors`,
    * `ra_pico`) with u < v.
    */
  def linkPredict(edges: DataFrame, aCol: String, bCol: String,
                  maxDeg: Int = 64): DataFrame = {
    require(maxDeg >= 1, s"maxDeg must be >= 1: $maxDeg")
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val adj = und.select(col("a").as("w"), col("b").as("n"))
      .unionAll(und.select(col("b").as("w"), col("a").as("n")))
    val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("d"))
    val aw = adj.join(deg.filter(col("d") <= maxDeg), "w")
    val wedges = aw.select(col("w"), col("d"), col("n").as("u"))
      .join(aw.select(col("w"), col("n").as("v")), "w")
      .filter(col("u") < col("v"))
    val cand = wedges
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(expr("CAST(1000000000000 AS BIGINT) div d")).as("ra_pico"))
    cand.join(und,
        cand("u") === und("a") && cand("v") === und("b"), "left_anti")
      .select(col("u"), col("v"), col("common_neighbors"), col("ra_pico"))
  }

  /** Mutual (reciprocated) edges of a DIRECTED graph: pairs (a < b) where
    * both a→b and b→a exist, with each direction's rank carried through.
    * The near-dup use: in a k-NN similarity graph, a MUTUAL nearest-neighbor
    * pair is the high-precision duplicate signal (each document ranks the
    * other among its own top-k — the standard mutual-kNN filter in
    * embedding-dedup and bitext-mining pipelines), while a one-directional
    * edge is often just a hub attracting faraway neighbors.
    *
    * Scale shape: one hash equi-join of the (a < b) half of the edge list
    * against the reversed (a > b) half on the exact pair key — join fan-out
    * is 1 (the pair key is unique per direction after the input's own
    * per-src top-k), so there is no skew amplification regardless of hub
    * degree. Nothing is collected. Returns (`a`, `b`, `rank_ab`,
    * `rank_ba`) where rank_ab is b's rank in a's list.
    *
    * Input contract (matters outside the k-NN use): each directed edge is
    * expected AT MOST ONCE — the shape a per-src top-k emits. Violations
    * degrade deliberately rather than explode: duplicate copies of the
    * same direction collapse to one output row carrying the MAX of their
    * ranks (a join formulation would emit a row per fwd×rev copy pair),
    * and a direction whose rank is NULL is treated as absent, so the pair
    * is dropped as non-mutual instead of surfacing a null rank.
    */
  def mutualEdges(edges: DataFrame, srcCol: String, dstCol: String,
                  rankCol: String): DataFrame = {
    // ONE pass keyed on the unordered pair, not a fwd⋈rev self-join: the
    // split-filter-join formulation put two canonically different filters
    // over the SAME edge subtree, so an expensive edge build (the kNN
    // top-k) executed twice per run and shuffled twice (the q_transitivity
    // lesson). Each direction occurs at most once (per-src top-k), so
    // max(when(...)) recovers each direction's rank exactly; a pair is
    // mutual iff both are non-null. Values and rows identical to the join
    // form (GraphSpec pins it); one partial-aggregated shuffle, no join.
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"),
      col(rankCol).as("r"))
      .filter(col("s") =!= col("d") && col("s").isNotNull && col("d").isNotNull)
    e.select(least(col("s"), col("d")).as("a"),
        greatest(col("s"), col("d")).as("b"),
        when(col("s") < col("d"), col("r")).as("__rab"),
        when(col("s") > col("d"), col("r")).as("__rba"))
      .groupBy(col("a"), col("b"))
      .agg(max(col("__rab")).as("__rab"), max(col("__rba")).as("__rba"))
      .filter(col("__rab").isNotNull && col("__rba").isNotNull)
      .select(col("a"), col("b"),
        col("__rab").cast("long").as("rank_ab"), col("__rba").cast("long").as("rank_ba"))
  }

  /** Degree assortativity of an undirected graph (Newman, PRL 89, 2002):
    * the Pearson correlation of endpoint degrees over all directed edge
    * stubs. r < 0 (disassortative) in a healthy similarity graph — hubs
    * attach to low-degree nodes; r near +1 flags a degenerate corpus where
    * duplicates cluster into cliques, so this is the one-row health gate a
    * pipeline checks before trusting graph-derived dedup components.
    *
    * Exactness: the four moment sums are exact BIGINT aggregates over the
    * both-ways stub list (x-marginals equal y-marginals by symmetry, so
    * Σx = Σy and Σx² = Σy²); r is then ONE left-to-right double expression
    * over those integers — bit-identical on any engine. BIGINT bound:
    * Σ(dx·dy) ≤ m·maxdeg², safe while m·maxdeg² < 2⁶³ (any bounded-degree
    * k-NN graph; a power-law web graph at 10¹² edges needs the sums
    * widened to DECIMAL(38,0) — one cast).
    *
    * Scale shape: two hash equi-joins of the stub list against the degree
    * table (skew-bounded: fan-out per stub is exactly 1) and one global
    * aggregate with map-side partials. Nothing is collected. Returns a
    * single row (`m2`, `sx`, `sxy`, `sx2`, `assortativity`).
    */
  def degreeAssortativity(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val adj = und.select(col("a").as("w"), col("b").as("n"))
      .unionAll(und.select(col("b").as("w"), col("a").as("n")))
    val deg = adj.groupBy(col("w")).agg(count(lit(1)).as("d"))
    val stubs = adj
      .join(deg.select(col("w"), col("d").as("dx")), "w")
      .join(deg.select(col("w").as("n"), col("d").as("dy")), "n")
    val sums = stubs.agg(
      count(lit(1)).as("m2"),
      sum(col("dx")).as("sx"),
      sum(col("dx") * col("dy")).as("sxy"),
      sum(col("dx") * col("dx")).as("sx2"))
    sums.select(col("m2"), col("sx"), col("sxy"), col("sx2"),
      when(col("m2") * col("sx2") - col("sx") * col("sx") === 0L, lit(null))
        .otherwise(round(
          (col("m2").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) /
          (col("m2").cast("double") * col("sx2").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 6))
        .as("assortativity"))
  }
}
