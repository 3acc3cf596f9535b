package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Analytic operators beyond the reference surface (SURVEY §2.5 lists them as
  * absent there): window functions, sessionization, rollup, semi/anti joins,
  * and an as-of join. All are single-shuffle formulations designed to keep
  * their partitioning reusable at scale.
  */
object Analytics {

  /** Cumulative Poisson(1) CDF at k = 0..7 in ppm:
    * `floor(1e6 · e^-1 · Σ_{j=0}^{k} 1/j!)` — the inverse-CDF ladder for
    * the Poisson-bootstrap weights. Pinned against the formula by
    * `StatsSpec` ("Poisson(1) CDF ppm table matches the formula").
    */
  private[graft] val PoissonCdfPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L,
      999916L, 999989L)

  /** Event-time sessionization: a new session starts when the gap from the
    * previous event of the same key exceeds `gapSeconds`. One shuffle
    * (partitionBy key) and two window passes over the sorted partition —
    * the sort order is shared by both, so Spark sorts once. `orderCols`
    * breaks event-time ties deterministically.
    */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String, gapSeconds: Long,
                 orderCols: Seq[Column] = Nil): DataFrame = {
    val ord = col(tsCol) +: orderCols
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val prev = lag(col(tsCol), 1).over(w)
    // microsecond arithmetic: unix_timestamp() truncates to seconds, which
    // would disagree with any engine computing exact gaps (e.g. epoch_us)
    val newSession = when(
      prev.isNull ||
        unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_seq",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Top `k` rows per key by `order` — ranking window + filter. The filter on
    * `row_number` is applied streaming over the sorted partition (no full
    * materialization of the rank column at scale).
    */
  def topPerKey(df: DataFrame, keyCol: Column, order: Seq[Column], k: Int): DataFrame =
    df.withColumn("rn",
        row_number().over(Window.partitionBy(keyCol).orderBy(order: _*)))
      .filter(col("rn") <= k)

  /** Grouped top-k via the bounded-heap aggregate
    * ([[graft.expressions.TopKStructsAgg]]) — same rows as [[topPerKey]]
    * (asserted by spec) with the scale shape a window cannot give: the
    * aggregate partial-combines map-side, so each mapper ships at most k
    * rows per key into the shuffle and no task ever sorts a hot key's whole
    * partition. `ordAsc` are ASCENDING sort fields (negate a numeric column
    * for descending) and must end in a tiebreaker for deterministic output;
    * `payload` are the (name, column) pairs to return. Output: `keyCol`,
    * the payload columns, and `rn` (1-based rank within the key).
    */
  def topPerKeyAgg(df: DataFrame, keyCol: String, ordAsc: Seq[Column],
                   payload: Seq[(String, Column)], k: Int): DataFrame = {
    val br = org.apache.spark.sql.graft.ColumnBridge
    val agg = br.column(graft.expressions.TopKStructsAgg(
        br.expression(struct(ordAsc: _*)),
        br.expression(struct(payload.map { case (n, c) => c.as(n) }: _*)), k)
      .toAggregateExpression())
    df.groupBy(col(keyCol)).agg(agg.as("_topk"))
      .select(col(keyCol), posexplode(col("_topk")).as(Seq("_pos", "_row")))
      .select(col(keyCol) +: payload.map { case (n, _) => col(s"_row.$n") } :+
        (col("_pos") + 1).as("rn"): _*)
  }

  /** As-of join: for each left row, the single latest right row of the same
    * key with `rightTs <= leftTs` (DuckDB/kdb ASOF JOIN semantics).
    *
    * Implemented as the union-and-carry-forward trick — one shuffle on the
    * key, one sort, zero range explosion:
    * tag right rows 0 and left rows 1, sort by (key, ts, tag), then
    * `last(struct(right_row), ignoreNulls)` over the preceding frame carries
    * the most recent right ROW (as one struct, so a null value column in
    * the latest row stays null rather than resurrecting an older non-null)
    * onto every left row. An equi-join with a range
    * condition would rescan right rows per left row (quadratic in hot keys);
    * this is linear after the sort and AQE-skew-splittable.
    *
    * Returns the left rows (original columns) plus the matched right value
    * columns (null where no right row precedes — filter for inner
    * semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, leftTs: String,
               rightTs: String, valueCols: Seq[String],
               tieBreak: Seq[Column] = Nil,
               toleranceUs: Long = -1L): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_tag", lit(1))
    val r0 = right.select(
      (col(keyCol) +: col(rightTs).as("_ts") +: lit(0).as("_tag") +:
        valueCols.map(c => col(c).as(s"_v_$c"))): _*)
    // align schemas: left gets null right-value carriers, right gets null left cols
    val lAligned = valueCols.foldLeft(l)((d, c) => d.withColumn(s"_v_$c", lit(null).cast(right.schema(c).dataType)))
    val rAligned = leftCols.filterNot(_ == keyCol)
      .foldLeft(r0)((d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unioned = lAligned.select((col(keyCol) +: col("_ts") +: col("_tag") +:
        (leftCols.filterNot(_ == keyCol).map(col) ++ valueCols.map(c => col(s"_v_$c")))): _*)
      .unionByName(rAligned.select((col(keyCol) +: col("_ts") +: col("_tag") +:
        (leftCols.filterNot(_ == keyCol).map(col) ++ valueCols.map(c => col(s"_v_$c")))): _*))
    require(!valueCols.contains("__asof_ts"), "__asof_ts is reserved")
    require(toleranceUs < 0L ||
      left.schema(leftTs).dataType == org.apache.spark.sql.types.TimestampType ||
      left.schema(leftTs).dataType == org.apache.spark.sql.types.LongType,
      s"as-of tolerance needs a timestamp/long ts, got ${left.schema(leftTs).dataType}")
    val w = Window.partitionBy(col(keyCol))
      .orderBy((col("_ts") +: col("_tag") +: tieBreak): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the latest right ROW as one struct — per-column last(_v_c,
    // ignoreNulls) would pair a fresh row's timestamp with an OLDER row's
    // value whenever the latest right row holds a null (diverging from the
    // merge operator, which retains the whole closest row)
    val rowPayload = when(col("_tag") === 0,
      struct(col("_ts").as("__asof_ts") +: valueCols.map(c => col(s"_v_$c").as(c)): _*))
    val carried = unioned.withColumn("_asof_row",
      last(rowPayload, ignoreNulls = true).over(w))
    if (toleranceUs < 0L)
      carried.filter(col("_tag") === 1)
        .select((leftCols.map(col) ++ valueCols.map(c =>
          col(s"_asof_row.$c").as(s"asof_$c"))): _*)
    else {
      // max-staleness bound: null the match where the carried row's ts gap
      // exceeds the tolerance — the merge operator's closest-match reasoning
      def micros(c: Column): Column = left.schema(leftTs).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
      val fresh = col("_asof_row.__asof_ts").isNotNull && col("_ts").isNotNull &&
        micros(col("_ts")) - micros(col("_asof_row.__asof_ts")) <= toleranceUs
      carried.filter(col("_tag") === 1)
        .select((leftCols.map(col) ++ valueCols.map(c =>
          when(fresh, col(s"_asof_row.$c")).as(s"asof_$c"))): _*)
    }
  }

  /** AS-OF join through the custom whole-operator plan
    * ([[graft.plans.AsofJoin]] → [[graft.plans.AsofJoinExec]]): same
    * semantics and output schema as [[asofJoin]] (spec-pinned equal), but
    * each side shuffles only its own columns — the union formulation pads
    * every row to the combined width — and the merge keeps O(1) state
    * instead of a window frame. Requires the session to carry
    * [[graft.GraftExtensions]] (Verify/Bench/tests all install it).
    *
    * `rightTies` resolves equal right (key, ts) duplicates deterministically
    * (last in ascending tie order wins), mirroring `asofJoin`'s `tieBreak`.
    */
  def asofJoinMerge(left: DataFrame, right: DataFrame, keyCol: String,
                    leftTs: String, rightTs: String, valueCols: Seq[String],
                    rightTies: Seq[String] = Nil,
                    toleranceUs: Long = -1L): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    // Both sides often derive from the SAME source frame, so their attribute
    // ids collide; the analyzer's DeduplicateRelations re-instances the
    // right child but cannot know which of a CUSTOM node's expressions bind
    // right. Route the right side through a RENAME projection: the aliases
    // mint fresh ids, and because the names differ RemoveRedundantAliases
    // never strips them — the node's right-side expressions stay anchored to
    // the right child across analysis and optimization.
    val rightNames = right.columns.toSeq
    val rTmp = right.select(rightNames.map(c => right.col(c).as(s"__asof_r_$c")): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rTmp.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    def rAttr(name: String) = attr(rPlan, s"__asof_r_$name")
    val values = valueCols.map(rAttr)
    val asofAttrs = valueCols.zip(values).map { case (c, v) =>
      org.apache.spark.sql.catalyst.expressions
        .AttributeReference(s"asof_$c", v.dataType, nullable = true)()
    }
    val node = graft.plans.AsofJoin(lPlan, rPlan,
      attr(lPlan, keyCol), rAttr(keyCol),
      attr(lPlan, leftTs), rAttr(rightTs),
      values, asofAttrs, rightTies.map(rAttr), toleranceUs)
    ColumnBridge.ofRows(left.sparkSession, node)
  }

  /** Range-sharded two-pass global ranking — exact `row_number` (plus the
    * per-partition row count) WITHOUT a window whose parallelism is capped by
    * the partition-key cardinality. `Window.partitionBy(status)` over a
    * 3-value key is 3 tasks forever — a parallelism ceiling, not skew. Here:
    *
    *  1. sample `shards − 1` boundary keys of (partCols ++ orderCols) ONCE
    *     and freeze them as literals ([[RangeShard]]); the shard id becomes a
    *     pure deterministic function of row content (equal sort keys never
    *     straddle a boundary), so the two passes agree with NOTHING pinned —
    *     the r4 `localCheckpoint` pin leaked block-manager memory for the
    *     rest of the session;
    *  2. count rows per (shard, partCols) over a persisted slim key
    *     projection — `shards × |keys|` rows to the driver, where an
    *     exclusive prefix scan per key yields each shard's global row-number
    *     offset and the key totals;
    *  3. a window partitioned by (shard ++ partCols) — parallelism
    *     `shards × |keys|` — computes local row numbers, and a broadcast
    *     join adds the offset and total back. The window's own hash exchange
    *     does the sharding — the r4 `repartitionByRange` exchange is gone.
    *
    * Global row_number = shard prefix + local row_number, exactly.
    * `percent_rank` / `cume_dist` / `ntile` are pure functions of
    * (row_number, partition count) ONLY under a TOTAL per-key ordering, so
    * `orderCols` must end in a tiebreaker that makes rows unique (the same
    * requirement any deterministic oracle comparison imposes); see
    * [[percentRankOf]] / [[cumeDistOf]] / [[ntileOf]]. Partition keys must be
    * non-null, and `orderCols` must be plain ASCENDING columns/expressions
    * (no `.desc` — the boundary comparison is ascending nulls-first; wrap a
    * descending sort key as a negated/inverted expression instead).
    * Output: the input columns plus `rnCol` / `nCol`.
    */
  def rangedRank(df: DataFrame, partCols: Seq[String], orderCols: Seq[Column],
                 shards: Int = 0, rnCol: String = "rn", nCol: String = "n_part"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.SortOrder
    orderCols.foreach { c =>
      require(!org.apache.spark.sql.graft.ColumnBridge.expression(c).isInstanceOf[SortOrder],
        "rangedRank orderCols must be plain ascending expressions (no .asc/.desc): " +
          "boundary sharding compares ascending nulls-first")
    }
    val spark = df.sparkSession
    val nShards = if (shards > 0) shards
      else spark.sessionState.conf.numShufflePartitions
    val oNames = orderCols.indices.map(i => s"__o$i")
    val keyNames = partCols ++ oNames
    // slim key projection: the boundary sample and the counting pass read it
    // from cache; the final pass re-derives the shard from the raw columns
    val slim = df.select((partCols.map(col) ++
        orderCols.zip(oNames).map { case (c, nm) => c.as(nm) }): _*)
    val keyTypes = keyNames.map(nm => slim.schema(nm).dataType)
    // Sample/count memoization: boundaries and the per-(shard, key) prefix
    // table are pure functions of (input data, partCols, nShards) — distinct
    // rank queries over the SAME sort (q_percent_rank and q_ntile both rank
    // orders by (status; totalprice, orderkey)) share one sampling + one
    // counting pass instead of each paying both. The key is the
    // canonicalized logical plan (sameResult-verified) PLUS (a) the actual
    // partCols names — canonicalization erases aliases, and the cached
    // prefix schema embeds the first caller's names — and (b) a fingerprint
    // of the leaf file listings (paths + size): plan canonicalization
    // compares parquet scans by PATH, so without it an overwritten or
    // appended table would serve stale offsets. Entries are a few hundred
    // literal Rows — boundaries plus shards × |keys| prefixes — NOT pinned
    // blocks: driver-side metadata on the scale of a table-statistics cache.
    val canon = slim.queryExecution.optimizedPlan.canonicalized
    val filesFp = Analytics.leafFilesFingerprint(slim)
    val cacheKey = (canon.semanticHash(), nShards, partCols.toList, filesFp.getOrElse(0))
    // an unfingerprintable leaf (None) means the cache CANNOT prove the data
    // unchanged — skip it entirely rather than risk serving stale offsets
    val cached = filesFp.flatMap(_ => Analytics.prefixCache.get(cacheKey))
      .filter(_.plan.sameResult(canon))
    (if (cached.isDefined) Analytics.prefixCacheHits
     else Analytics.prefixCacheMisses).incrementAndGet()
    val (bounds, outRows, prefixSchema) = cached match {
      case Some(e) => (e.bounds, e.rows, e.schema)
      case None =>
        val p = slim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val bs = RangeShard.boundaries(p, keyNames, nShards)
          val countDf = p
            .withColumn("__shard", RangeShard.shardOf(keyNames.map(col), bs, keyTypes))
            .groupBy((col("__shard") +: partCols.map(col)): _*)
            .agg(count(lit(1)).as("c"))
          val countRows = countDf.collect()
          // exclusive prefix per part-key across shards in shard order, + totals —
          // O(shards · |keys|) driver work, rejoined by broadcast (no string
          // round-trip of the key values: they ride in Rows, any type)
          val rows = countRows
            .groupBy(r => partCols.indices.map(i => r.get(i + 1)).toIndexedSeq)
            .values.flatMap { rs =>
              val sorted = rs.sortBy(_.getInt(0))
              val cs = sorted.map(_.getLong(partCols.size + 1))
              val total = cs.sum
              sorted.zip(cs.scanLeft(0L)(_ + _)).map { case (r, pfx) =>
                Row.fromSeq(r.toSeq.dropRight(1) ++ Seq(pfx, total))
              }
            }.toSeq
          val schema = StructType(
            countDf.schema.fields.dropRight(1) ++
              Seq(StructField("__prefix", LongType, nullable = false),
                StructField("__total", LongType, nullable = false)))
          if (filesFp.isDefined) {
            if (Analytics.prefixCache.size >= 64) Analytics.prefixCache.clear()
            Analytics.prefixCache.put(cacheKey,
              Analytics.PrefixEntry(canon, bs, rows, schema))
          }
          (bs, rows, schema)
        } finally p.unpersist(false)
        // the final job recomputes the slim projection once post-unpersist —
        // deterministic sharding makes that safe, and nothing stays pinned
    }
    val prefixDf = spark.createDataFrame(
      java.util.Arrays.asList(outRows: _*), prefixSchema)
    val localW = Window
      .partitionBy((col("__shard") +: partCols.map(col)): _*)
      .orderBy(orderCols: _*)
    df.withColumn("__shard",
        RangeShard.shardOf(partCols.map(col) ++ orderCols, bounds, keyTypes))
      .join(broadcast(prefixDf), "__shard" +: partCols)
      .withColumn(rnCol, row_number().over(localW).cast("long") + col("__prefix"))
      .withColumn(nCol, col("__total"))
      .drop("__shard", "__prefix", "__total")
  }

  private[graft] case class PrefixEntry(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      bounds: Array[Row], rows: Seq[Row], schema: StructType)
  // bounded: entries are tiny driver-side literals; evict wholesale at 64
  // rather than tracking LRU — a clear costs one re-sample, never correctness
  private[graft] val prefixCache =
    new scala.collection.concurrent.TrieMap[(Int, Int, List[String], Int), PrefixEntry]()
  // observability only: Bench reports these so "the shared sampling pass was
  // (not) reused across q_ntile/q_percent_rank" is a logged fact, not a guess
  private[graft] val prefixCacheHits = new java.util.concurrent.atomic.AtomicLong
  private[graft] val prefixCacheMisses = new java.util.concurrent.atomic.AtomicLong
  // observability only: bumped when basketTriples' auto gate engages the
  // level-2 pair prune — the spec asserts the gate fires on a selective
  // (wide-vocab) domain and stays off on a dense one
  private[graft] val pairPruneEngaged = new java.util.concurrent.atomic.AtomicLong

  /** Content fingerprint of a plan's file-backed leaves: sorted file paths +
    * total size. Plan canonicalization compares file scans by root PATH, so
    * a cache keyed on the plan alone would survive an overwrite/append of
    * the same location; file names (part-UUIDs) and sizes change on any
    * rewrite, so hashing the listing catches it. V1 (`HadoopFsRelation`)
    * and DSv2 (`DataSourceV2ScanRelation` over a `FileScan`) leaves are
    * both fingerprinted by listing; local/in-memory leaves carry their data
    * in the canonical plan already. Returns None when ANY leaf is a type
    * this cannot prove unchanged (an unrecognized DSv2 scan, say) — the
    * caller must then SKIP the cache, because a class-name stand-in would
    * satisfy sameResult across an overwrite and serve stale offsets.
    */
  private[graft] def leafFilesFingerprint(df: DataFrame): Option[Int] = {
    val fps = df.queryExecution.optimizedPlan.collectLeaves().map {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some((fs.location.inputFiles.toSeq.sorted, fs.sizeInBytes).hashCode())
          case _ => None
        }
      case v2: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        v2.scan match {
          case fs: org.apache.spark.sql.execution.datasources.v2.FileScan =>
            Some(fs.fileIndex.inputFiles.toSeq.sorted.hashCode())
          case _ => None
        }
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => Some(0)
      case _: org.apache.spark.sql.execution.LogicalRDD => Some(1)
      case _ => None
    }
    if (fps.forall(_.isDefined)) Some(fps.map(_.get).hashCode()) else None
  }

  /** `percent_rank` from a total-order row number: (rn−1)/(n−1), 0 for a
    * single-row partition — the same double arithmetic every SQL engine uses.
    */
  def percentRankOf(rn: Column, n: Column): Column =
    when(n > 1, (rn - 1).cast("double") / (n - 1).cast("double")).otherwise(0.0)

  /** `cume_dist` from a total-order row number: rn/n (rank == row number when
    * the ordering is unique).
    */
  def cumeDistOf(rn: Column, n: Column): Column =
    rn.cast("double") / n.cast("double")

  /** `ntile(k)` from a total-order row number — SQL bucket allocation: the
    * first n mod k buckets get ⌈n/k⌉ rows, the rest ⌊n/k⌋. Closed form, so
    * no second window pass. floor() on doubles is exact below 2^52 rows.
    */
  def ntileOf(rn: Column, n: Column, k: Int): Column = {
    val q = n / k            // Column `/` is double division
    val qf = floor(q)
    val r = n % k
    val bigRows = (qf + 1) * r // rows living in the first r (larger) buckets
    when(rn <= bigRows, floor((rn - 1) / (qf + 1)) + 1)
      .otherwise(r + floor((rn - bigRows - 1) / qf) + 1)
      .cast("long")
  }

  /** Hierarchical rollup aggregate with explicit ALL labels in place of the
    * grouping-set NULLs (so the output is a plain table, comparable across
    * engines; assumes the level columns themselves are non-null). Partial
    * aggregation applies per grouping set; one shuffle.
    */
  def rollupAgg(df: DataFrame, levels: Seq[Column], aggs: Seq[Column],
                allLabel: String = "ALL"): DataFrame = {
    val out = df.rollup(levels: _*).agg(aggs.head, aggs.tail: _*)
    val levelNames = out.columns.take(levels.size).toSeq
    val aggNames = out.columns.drop(levels.size).toSeq
    out.select(
      (levelNames.map(n => coalesce(col(n).cast("string"), lit(allLabel)).as(n)) ++
        aggNames.map(col)): _*)
  }

  /** BM25 ranked retrieval (Robertson et al.; the Okapi/Lucene form with the
    * non-negative idf): `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 −
    * b + b·|d|/avgdl))` with `idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)`.
    * The operator a training-data pipeline uses to pull topical slices out
    * of a web corpus — the retrieval analog of DSIR's importance weighting
    * (scores from corpus statistics, not a learned model).
    *
    * Scale shape: ONE partial-aggregated stats pass over the corpus (N,
    * Σ|d| as an exact LONG — a float sum would be partition-order-dependent
    * — and per-term document frequencies as conditional sums; |terms|+2
    * values collected driver-side), then scoring is a pure scan with
    * idf/avgdl riding into codegen as literals, finished by
    * TakeOrderedAndProject. No shuffle of the corpus, no inverted-index
    * build for an ad-hoc query — the census IS the index; a standing
    * inverted index is a storage-layout concern, not this operator's.
    * Per-term tf reads the staged token-array attribute (never re-running
    * the tokenizer per term — CollapseProject keeps multiply-referenced
    * non-cheap projections staged).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(terms.map(_.toLowerCase).distinct.size == terms.size,
      "terms must be distinct after lowering (duplicates double-count)")
    val lowered = terms.map(_.toLowerCase)
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val staged = df
      .select(col(idCol), toks.as("__toks"))
      .select(Seq(col(idCol), size(col("__toks")).cast("long").as("__len")) ++
        lowered.zipWithIndex.map { case (t, i) =>
          size(filter(col("__toks"), x => x === lit(t))).cast("double").as(s"__tf$i")
        }: _*)
    val stats = staged.agg(count(lit(1)).as("n"),
      (coalesce(sum(col("__len")), lit(0L)).as("sumlen") +:
        lowered.indices.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"df$i"))): _*)
      .head()
    val n = stats.getLong(0).toDouble
    require(n > 0, "bm25TopK: empty corpus")
    val avgdl = stats.getLong(1).toDouble / n
    val idf = lowered.indices.map { i =>
      val dfT = stats.getLong(2 + i).toDouble
      math.log((n - dfT + 0.5) / (dfT + 0.5) + 1.0)
    }
    val raw = lowered.indices.map { i =>
      val tf = col(s"__tf$i")
      lit(idf(i)) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / lit(avgdl)))
    }.reduce(_ + _)
    staged.select(col(idCol), round(raw, 6).as("score"), raw.as("__raw"))
      .orderBy(col("__raw").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Mergeable-sketch distinct-count rollup — the incremental pattern a
    * 100 TB estate uses for distinct counts: HLL sketches (Apache
    * DataSketches, the `hll_sketch_agg` family) are materialized ONCE at
    * fine granularity (per day/source/partition) and every coarser rollup
    * UNIONS the stored sketches without touching raw data again —
    * register-wise max is associative, commutative, and idempotent, so
    * the merge is layout-independent and a day's sketch is reusable by
    * every report that ever needs it. Two partial-aggregated shuffles:
    * |fine| sketch rows, then |coarse| unions; the raw corpus is scanned
    * exactly once. lgK = 12 → relative standard error ≈ 1.04/√2¹² ≈ 1.6%.
    *
    * Returns one row per coarse key with the merged estimate (a LONG —
    * `hll_sketch_estimate`'s rounded count). The estimate is sketch-
    * implementation-specific, so correctness gates pin the EXACT count
    * and an error-band contract, not the estimate value (the
    * q_approx_distinct pattern).
    */
  def hllRollup(df: DataFrame, fineKeys: Seq[Column], coarseKeys: Seq[Column],
                value: Column, lgK: Int = 12,
                estCol: String = "estimate"): DataFrame = {
    require(fineKeys.nonEmpty && coarseKeys.nonEmpty,
      "hllRollup needs fine and coarse keys (coarse ⊆ fine's aliases)")
    require(lgK >= 4 && lgK <= 21, s"lgK out of DataSketches range: $lgK")
    val fine = df.groupBy(fineKeys: _*)
      .agg(hll_sketch_agg(value, lgK).as("__sketch"))
    fine.groupBy(coarseKeys: _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("__sketch"), lit(false)))
        .as(estCol))
  }

  /** Per-key theta sketches ([[graft.expressions.ThetaSketchAgg]]): one
    * serialized distinct-SET sketch per key — the materialization step of
    * the theta workflow. Unlike HLL the stored sketches compose under
    * intersection/difference driver-side
    * ([[graft.expressions.ThetaOps]]), answering cross-segment distinct
    * overlap questions ("users who did A and B") from KB-sized binaries
    * without ever rescanning or joining the raw data.
    */
  def thetaSketches(df: DataFrame, key: Column, keyName: String,
                    value: Column, lgK: Int = 12): DataFrame = {
    val br = org.apache.spark.sql.graft.ColumnBridge
    val agg = br.column(graft.expressions.ThetaSketchAgg(
      br.expression(value), lgK).toAggregateExpression())
    df.groupBy(key.as(keyName)).agg(agg.as("sketch"))
  }

  /** Mergeable-quantile rollup — [[hllRollup]]'s pattern for percentiles:
    * KLL sketches (Karnin, Lang & Liberty, FOCS 2016; the DataSketches
    * `kll_*` family) materialized once per fine key, merged up the
    * hierarchy with `kll_merge_agg_double` — raw data scanned once, any
    * later report reads quantiles out of the stored day sketches. k = 200
    * → normalized rank error ≈ 1.65%. Returns one row per coarse key with
    * the MERGED SKETCH (binary) in `sketchCol`; read values with
    * `kll_sketch_get_quantile_double(col, q)`.
    *
    * NOTE: KLL compaction is randomized (measured: repeated runs on this
    * box give p50s differing ~0.4%), so gates must be rank-error BANDS
    * against exact percentiles — never value equality, and never a
    * repartition-invariance assertion (both would be flaky by design).
    */
  def kllRollup(df: DataFrame, fineKeys: Seq[Column], coarseKeys: Seq[Column],
                value: Column, k: Int = 200,
                sketchCol: String = "sketch"): DataFrame = {
    require(fineKeys.nonEmpty && coarseKeys.nonEmpty,
      "kllRollup needs fine and coarse keys (coarse ⊆ fine's aliases)")
    val fine = df.groupBy(fineKeys: _*)
      .agg(kll_sketch_agg_double(value.cast("double"), k).as("__kll"))
    fine.groupBy(coarseKeys: _*)
      .agg(kll_merge_agg_double(col("__kll")).as(sketchCol))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009): fuse
    * N ranked retrieval lists into one by `score(d) = Σ_lists 1/(kRrf +
    * rank_d)` over the lists containing d — the standard hybrid-retrieval
    * combiner (lexical BM25 ⊕ dense cosine) that needs no score
    * calibration because only RANKS cross lists. Ranks are recomputed
    * here from each list's `(scoreCol desc, id)` total order, so callers
    * pass retrieval output as-is.
    *
    * Determinism/replay: each reciprocal term is one correctly-rounded
    * divide, absent-from-list contributes +0.0, and the terms add in the
    * given list order (a left fold, not an unordered aggregate) — the
    * fused doubles replay bit-identically in SQL. Output: id, one
    * `rank_<name>` per list (null where absent), `rrf` rounded 6dp; top
    * `k` rows by the RAW fused score with id as tiebreaker.
    *
    * Scale shape: inputs are bounded top-k shortlists BY CONSTRUCTION
    * (that is what retrieval emits — this operator is meaningless over
    * unranked corpora), so the single-partition rank windows run on ≤
    * shortlist rows each; fusion itself is a UNION + one hash aggregate
    * over Σ|list| (id, list, rank) facts — no join anywhere, and the
    * shape holds for wide ensembles (100 lists fuse in the same single
    * exchange). The distributed work lives in the upstream retrieval
    * operators ([[bm25TopK]], the ANN tiers).
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              scoreCol: String, k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(lists.map(_._1).distinct.size == lists.size,
      "list names must be distinct (they become rank_<name> columns)")
    require(k > 0 && kRrf > 0, s"k and kRrf must be positive: $k, $kRrf")
    // union + one hash aggregate, NOT an iterated full-outer join: fusing N
    // lists is a single exchange of Σ|list| (id, src, rank) facts and scales
    // to wide ensembles, where a join chain is N-1 joins (and Spark plans
    // full-outer as sort-merge even for tiny sides)
    val tagged = lists.map { case (nm, df) =>
      df.select(col(idCol), lit(nm).as("__src"), row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))).as("__rank"))
    }.reduce(_ unionAll _)
    val pivoted = tagged.groupBy(col(idCol)).agg(
      max(when(col("__src") === lists.head._1, col("__rank"))).as(s"rank_${lists.head._1}"),
      lists.tail.map { case (nm, _) =>
        max(when(col("__src") === nm, col("__rank"))).as(s"rank_$nm")
      }: _*)
    val fused = lists.map { case (nm, _) =>
      when(col(s"rank_$nm").isNotNull,
        lit(1.0) / (lit(kRrf.toDouble) + col(s"rank_$nm").cast("double")))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    pivoted.withColumn("__rrf", fused)
      .orderBy(col("__rrf").desc, col(idCol))
      .limit(k)
      .select(col(idCol) +: lists.map { case (nm, _) => col(s"rank_$nm") } :+
        round(col("__rrf"), 6).as("rrf"): _*)
  }

  /** Inverted-index build — the standing-retrieval layout [[bm25TopK]]
    * deliberately leaves to storage: per term, exact document frequency
    * `df`, exact collection frequency `cf`, and a BOUNDED posting list (the
    * `maxPostings` smallest doc ids), exploded to flat `(term, df, cf, pos,
    * id)` rows ready to be written bucketed by term.
    *
    * Scale shape: at web scale a stopword's posting list is ~the whole
    * corpus — the classic build-killer where one reducer owns 'the'.
    * Postings go through [[graft.expressions.TopKStructsAgg]], so every
    * term ships AT MOST `maxPostings` rows per mapper into the term
    * shuffle and hot terms cost the same as rare ones, while df/cf stay
    * exact through ordinary partial-aggregated counts in the SAME groupBy
    * (one shuffle total after the per-(term, doc) tf combine). Full
    * postings for hot terms are a segmented/delta-encoded storage concern,
    * not a single-shuffle build's.
    */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int, minDf: Long = 1L): DataFrame = {
    require(maxPostings > 0, "maxPostings must be positive")
    val toks = filter(split(trim(lower(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val tf = df.select(col(idCol).as("__id"), explode(toks).as("term"))
      .groupBy(col("term"), col("__id"))
      .agg(count(lit(1)).as("__tf"))
    val br = org.apache.spark.sql.graft.ColumnBridge
    val topk = br.column(graft.expressions.TopKStructsAgg(
        br.expression(struct(col("__id"))),
        br.expression(struct(col("__id").as("id"))), maxPostings)
      .toAggregateExpression())
    tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("__tf")).as("cf"), topk.as("__p"))
      .filter(col("df") >= minDf)
      .select(col("term"), col("df"), col("cf"),
        posexplode(col("__p")).as(Seq("__pos", "__row")))
      .select(col("term"), col("df"), col("cf"),
        (col("__pos") + 1).as("pos"), col("__row.id").as(idCol))
  }

  /** Exact GLOBAL running total (inclusive prefix sum) of `tokens` in
    * `orderCols` order, without a single-task window — the [[rangedRank]]
    * move applied to a SUM instead of a row count:
    *
    *  1. sample shard boundaries of the sort key once ([[RangeShard]] — the
    *     shard is a pure function of row content);
    *  2. census `sum(tokens)` per shard (one partial-aggregated pass,
    *     `shards` rows to the driver) and prefix-scan driver-side;
    *  3. PARALLEL per-shard cumsum windows; each shard's driver-computed
    *     offset rides in as a literal map, and the exact global running
    *     total is `offset + local cumsum`.
    *
    * `pruneAbove`: shards whose offset already reaches the bound are
    * dropped WHOLE by a literal `__shard <= cut` predicate BEFORE any sort
    * (rows past the cut shard cannot satisfy `cum <= bound` — their prefix
    * alone exceeds it); at 1% selectivity that eliminates 99% of a 100 TB
    * corpus at the scan. `orderCols` must be plain ascending expressions
    * ending in a unique tiebreaker (negate a numeric for descending),
    * exactly as in [[rangedRank]]; tokens must be non-negative. Pass
    * precomputed (or cheap) order/token columns — the machinery evaluates
    * them in the census pass and again in the final pass.
    */
  def prefixSum(df: DataFrame, orderCols: Seq[Column], tokens: Column,
                cumCol: String, shards: Int = 0,
                pruneAbove: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.SortOrder
    orderCols.foreach { c =>
      require(!org.apache.spark.sql.graft.ColumnBridge.expression(c).isInstanceOf[SortOrder],
        "prefixSum orderCols must be plain ascending expressions (no .asc/.desc)")
    }
    val spark = df.sparkSession
    val nShards = if (shards > 0) shards
      else spark.sessionState.conf.numShufflePartitions
    val oNames = orderCols.indices.map(i => s"__o$i")
    val slim = df.select(orderCols.zip(oNames).map { case (c, nm) => c.as(nm) } :+
      tokens.cast("long").as("__t"): _*)
    val keyTypes = oNames.map(nm => slim.schema(nm).dataType)
    val p = slim.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (bounds, offsets) =
      try {
        val bs = RangeShard.boundaries(p, oNames, nShards)
        val census = p
          .withColumn("__shard", RangeShard.shardOf(oNames.map(col), bs, keyTypes))
          .groupBy(col("__shard")).agg(sum(col("__t")).as("t"))
          .collect().map(r => r.getInt(0) -> r.getLong(1))
          .sortBy(_._1)
        val offs = census.map(_._1)
          .zip(census.map(_._2).scanLeft(0L)(_ + _))
          .toMap
        (bs, offs)
      } finally p.unpersist(false)
    val kept = pruneAbove match {
      // <= not <: a shard whose exclusive prefix offset EQUALS the bound can
      // still hold zero-token rows with cum == bound; positive-token rows in
      // it are removed by the caller's cum filter either way.
      case Some(b) => offsets.filter(_._2 <= b).keys
      case None    => offsets.keys
    }
    if (kept.isEmpty) return df.withColumn(cumCol, lit(0L)).limit(0)
    val cut = kept.max
    val w = Window.partitionBy(col("__shard")).orderBy(orderCols.map(_.asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__shard", RangeShard.shardOf(orderCols, bounds, keyTypes))
      .filter(col("__shard") <= cut)
      .withColumn(cumCol, sum(tokens.cast("long")).over(w) +
        coalesce(element_at(typedlit(offsets), col("__shard")), lit(0L)))
      .drop("__shard")
  }

  /** Changelog compaction — a Kafka-Streams KTable materialized as a batch
    * view: the single LATEST record per key by `(tsCol, seqCol)` (seq
    * breaks same-timestamp ties, like a log offset). k = 1 through the
    * bounded aggregate: ONE record per (mapper, key) into the shuffle and
    * no per-key sort — compacting a 100 TB changelog shuffles exactly one
    * payload per key per mapper, not the log.
    */
  def latestByKey(df: DataFrame, keyCol: String, tsCol: Column, seqCol: Column,
                  payload: Seq[(String, Column)]): DataFrame =
    topPerKeyAgg(df, keyCol, Seq(negate(tsCol), negate(seqCol)), payload, k = 1)
      .drop("rn")

  /** Changelog → SCD-2 temporal table: every VERSION of each key with its
    * validity interval — the full KTable history, where [[latestByKey]] is
    * only the head. `valid_from` is the record's own timestamp; `valid_to`
    * is the next version's (null while current — filter `valid_to IS NULL`
    * to recover the compacted view). One shuffle on the key and one
    * per-key sort shared by `lead`; linear in the changelog.
    */
  def scd2(df: DataFrame, keyCol: String, tsCol: Column, seqCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(tsCol.asc, seqCol.asc)
    df.withColumn("valid_from", tsCol)
      .withColumn("valid_to", lead(tsCol, 1).over(w))
  }

  /** Stream-stream windowed join (the Kafka-Streams `KStream ⋈ KStream` with
    * `JoinWindows`, reference core.clj's topology joins its streams this
    * way): emit every (left, right) pair of the same key whose timestamps
    * satisfy `leftTs − before <= rightTs <= leftTs + after` (both bounds
    * inclusive, matching JoinWindows). Batch formulation as a BANDED
    * equi-join: with band width W = before + after, each right row carries
    * bucket `rightTs div W` and each left row probes the ≤ 2 buckets its
    * window spans, so the join keys are (key, bucket) and pair enumeration
    * only ever touches events within one window width of each other. A
    * plain key-equality join with the range as a post-filter sort-merges
    * entire key groups — quadratic in a hot key; banding caps the group at
    * one band. Each (left, right) pair shares exactly one of the probed
    * buckets (the right row's own), so no pair is emitted twice.
    *
    * Returns the left columns plus `rightCols` (renamed via the
    * (name → alias) pairs; aliases must not collide with left columns).
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   beforeUs: Long, afterUs: Long,
                   rightCols: Seq[(String, String)]): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      s"window must be non-empty: before=$beforeUs after=$afterUs")
    val wUs = beforeUs + afterUs
    val leftCols = left.columns.toSeq
    // `div` (integral) not `/` (fractional): epoch micros are exact longs
    val l2 = left
      .withColumn("__lt", unix_micros(col(leftTs)))
      .withColumn("__bkt", explode(array_distinct(array(
        expr(s"(__lt - ${beforeUs}L) div ${wUs}L"),
        expr(s"(__lt + ${afterUs}L) div ${wUs}L")))))
    val r2 = right.select(
      col(keyCol).as("__rkey") +: unix_micros(col(rightTs)).as("__rt") +:
        rightCols.map { case (c, a) => col(c).as(a) }: _*)
      .withColumn("__rbkt", expr(s"__rt div ${wUs}L"))
    l2.join(r2,
        l2(keyCol) === r2("__rkey") && l2("__bkt") === r2("__rbkt") &&
          col("__rt") >= col("__lt") - beforeUs &&
          col("__rt") <= col("__lt") + afterUs)
      .select(leftCols.map(col) ++ rightCols.map { case (_, a) => col(a) }: _*)
  }

  /** Per-record trailing sliding-window aggregate — the record-level view of
    * Kafka Streams `SlidingWindows.ofTimeDifference` (reference
    * `core.clj:150`-era windowing trio: tumbling [[graft.SparkEntry]]
    * `q_window_hourly`, hopping `q_window_hopping`, session
    * [[sessionize]]/`q_session_agg`, sliding here): for every event, each
    * agg in `aggs` is evaluated over the same key's events in
    * `[ts − sizeSeconds, ts]`, both bounds inclusive — exactly the window
    * set SlidingWindows materializes, keyed by its closing record.
    *
    * Scale shape: one shuffle on the key and one per-key sort shared by
    * every agg (a single `WindowExec`); the RANGE frame's bounds advance
    * monotonically with the sorted stream, so each row enters and leaves
    * the frame buffer exactly once, and evaluation cost is rows × frame
    * occupancy — bounded by how many events fit in `sizeSeconds`, never by
    * the key's whole partition (Spark re-evaluates the aggregate over the
    * buffered frame rather than retracting, so a frame that holds the hot
    * key's entire history would be the quadratic shape to avoid — size the
    * window to the time scale, not the data). Ties in `tsCol` share a
    * frame (RANGE, not ROWS), keeping output independent of partitioning
    * order.
    *
    * Each `aggs` value must be a BARE aggregate function — the frame is
    * applied to it directly (`agg.over(frame)`), so post-processing (casts,
    * arithmetic) belongs on the returned column, not around the aggregate.
    */
  def slidingAgg(df: DataFrame, keyCol: String, tsCol: String,
                 sizeSeconds: Long, aggs: Seq[(String, Column)]): DataFrame = {
    require(sizeSeconds > 0, s"window size must be positive: $sizeSeconds")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-sizeSeconds * 1000000L, Window.currentRow)
    aggs.foldLeft(df) { case (d, (name, a)) => d.withColumn(name, a.over(w)) }
  }

  /** Ordered-funnel completion: for each key, the first event time at which
    * each stage predicate fires STRICTLY AFTER the previous stage's
    * completion time (the first stage counts its first firing ever). A key
    * that never completes stage i has null from stage i on — later stages
    * can't fire against a null gate, so out-of-order events (a view before
    * any signup) never advance the funnel.
    *
    * Scale shape: one shuffle on the key; each stage is an unordered
    * partition-wide `min(when(...))` window — no ORDER BY, so no per-key
    * sort at any stage — and the final per-key collapse is a partial
    * aggregate over rows that are constant per key. Stage comparisons are
    * at the column's native precision (microseconds for timestamps);
    * same-instant stage transitions do NOT count (strictly after).
    *
    * Returns one row per key: `keyCol` plus one completion-time column per
    * stage, named by the stage's label.
    */
  def funnel(df: DataFrame, keyCol: String, tsCol: String,
             stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val w = Window.partitionBy(col(keyCol))
    val staged = stages.zipWithIndex.foldLeft(df) {
      case (d, ((name, pred), i)) =>
        val gate =
          if (i == 0) pred
          else pred && col(tsCol) > col(stages(i - 1)._1)
        d.withColumn(name, min(when(gate, col(tsCol))).over(w))
    }
    staged.groupBy(col(keyCol))
      .agg(max(col(stages.head._1)).as(stages.head._1),
        stages.tail.map { case (n, _) => max(col(n)).as(n) }: _*)
  }

  /** Ordered funnel with a PER-STEP conversion window: stage i completes at
    * the first matching event strictly after stage i−1 AND within
    * `maxGapSeconds` of it — "purchased within 7 days of viewing", the form
    * product analytics actually reports. Semantics are anchored at each
    * stage's EARLIEST completion (same anchoring as [[funnel]]; a later
    * stage-i event that would open a different window does not re-anchor —
    * stated, deterministic, and exactly replayable in SQL). Gap arithmetic
    * is exact microseconds. Same scale shape as [[funnel]]: one key shuffle,
    * |stages| unordered partition-wide min-windows, zero per-key sorts.
    */
  def funnelWindowed(df: DataFrame, keyCol: String, tsCol: String,
                     stages: Seq[(String, Column)],
                     maxGapSeconds: Long): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapSeconds > 0, s"maxGapSeconds must be positive: $maxGapSeconds")
    val w = Window.partitionBy(col(keyCol))
    val staged = stages.zipWithIndex.foldLeft(df) {
      case (d, ((name, pred), i)) =>
        val gate =
          if (i == 0) pred
          else pred && col(tsCol) > col(stages(i - 1)._1) &&
            unix_micros(col(tsCol)) <=
              unix_micros(col(stages(i - 1)._1)) + maxGapSeconds * 1000000L
        d.withColumn(name, min(when(gate, col(tsCol))).over(w))
    }
    staged.groupBy(col(keyCol))
      .agg(max(col(stages.head._1)).as(stages.head._1),
        stages.tail.map { case (n, _) => max(col(n)).as(n) }: _*)
  }

  /** Time-series resampling onto a dense daily grid with
    * last-observation-carried-forward: every key gets one row per day of
    * the data's global [min, max] day span; days with no observation
    * inherit the key's most recent `valueAgg` value (null before the
    * key's first observation — LOCF never invents data).
    *
    * Scale shape: the day bounds are ONE collected row (a bounded side
    * input, like shard boundaries); the grid is a scan-side generator
    * (|keys| × |days| rows — never a shuffle of the event stream); the
    * daily closes partial-aggregate; the fill is one key-partitioned
    * window ordered by day (|days| rows per key — bounded by the span, not
    * the event count).
    */
  def resampleDailyLocf(df: DataFrame, keyCol: String, tsCol: String,
                        valueAgg: Column, valueName: String): DataFrame = {
    val bounds = df.agg(min(to_date(col(tsCol))), max(to_date(col(tsCol)))).head()
    require(!bounds.isNullAt(0), "resampleDailyLocf: no rows / all-null ts")
    val (d0, d1) = (bounds.getDate(0), bounds.getDate(1))
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(valueAgg.as(valueName))
    val grid = df.select(col(keyCol)).distinct()
      .select(col(keyCol),
        explode(sequence(lit(d0), lit(d1), expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "day"), "left")
      .withColumn(valueName, last(col(valueName), ignoreNulls = true).over(w))
  }

  /** Greedy token-budget selection: keep rows in `orderCols` priority order
    * while the running token total stays ≤ `budget` — "fill the training
    * budget with the best documents first" (the data-pruning selection
    * rule; a row that would cross the budget is dropped, as is everything
    * after it). [[prefixSum]] with the budget as the shard-pruning bound,
    * then the literal cut. Output: the input columns plus the inclusive
    * running total `cumCol`.
    */
  def budgetSelect(df: DataFrame, orderCols: Seq[Column], tokens: Column,
                   budget: Long, shards: Int = 0,
                   cumCol: String = "cum_tokens"): DataFrame = {
    require(budget >= 0L, s"budget must be non-negative: $budget")
    prefixSum(df, orderCols, tokens, cumCol, shards, pruneAbove = Some(budget))
      .filter(col(cumCol) <= budget)
  }

  /** First-order Markov transition matrix over per-key ordered event
    * streams: the count of each (prev_state → state) step plus the
    * row-conditional probability P(state | prev_state).
    *
    * Scale shape: the lag is one key-partitioned window (one shuffle, the
    * per-key sort `orderCols` must be total for determinism); the matrix
    * itself is ≤ |states|² rows after the partial-aggregating count, so the
    * per-prev-state totals join is a broadcast by construction — the event
    * stream is never shuffled a second time. The probability divides the
    * two exact longs in double once, same IEEE result in any engine.
    */
  def transitionMatrix(df: DataFrame, keyCol: String, stateCol: String,
                       orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val steps = df
      .withColumn("__prev", lag(col(stateCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_state"), col(stateCol).as("state"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = steps.groupBy(col("prev_state"))
      .agg(sum(col("n_transitions")).as("__tot"))
    steps.join(broadcast(totals), "prev_state")
      .withColumn("prob",
        round(col("n_transitions").cast("double") / col("__tot").cast("double"), 6))
      .drop("__tot")
  }

  /** ROWS-frame rolling aggregates per key: each agg is evaluated over the
    * last `frameRows` rows up to the current one in `orderCols` order (a
    * partial leading frame at each partition head, like SQL). One key
    * shuffle and one per-key sort shared by every frame.
    *
    * Feed the aggregates EXACT input types (decimal/long): engines disagree
    * on the association order of float frame sums (this engine re-scans the
    * frame in row order; segment-tree implementations sum in tree order),
    * and only exact types make the result independent of that choice.
    */
  def rollingAgg(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                 frameRows: Int, aggs: Seq[(String, Column)]): DataFrame = {
    require(frameRows >= 1, s"frame must span at least the current row: $frameRows")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
      .rowsBetween(-(frameRows - 1L), Window.currentRow)
    aggs.foldLeft(df) { case (d, (name, a)) => d.withColumn(name, a.over(w)) }
  }

  /** Per-group simple OLS (y on x) from EXACT moment sums. `regr_slope`-
    * family builtins stream a float covariance whose value depends on the
    * partial-merge order — nondeterministic across engines AND across runs
    * of the same engine. Instead: x must be integral (long), y decimal;
    * the five moments n, Σx, Σx², Σy, Σxy, Σy² are then exact (pure
    * map-side-combinable partial aggregation, one shuffle of |groups|
    * rows), and the closed forms divide doubles of exact sums once, the
    * same IEEE result everywhere. Output: slope, intercept, r2 (6 dp).
    *
    * The x moments sum as DECIMAL, not bigint: Spark's non-ANSI bigint sum
    * WRAPS silently at extreme row×magnitude products while the DuckDB
    * oracle promotes to HUGEINT — decimal(38,0) keeps both engines exact
    * (and a true overflow turns into a visible null, never a wrong
    * number). Degenerate groups (constant x → dx=0, constant y → dy=0)
    * emit NULL slope/intercept/r2 instead of ±Inf/NaN, mirroring
    * `twoProportionZ`'s degenerate-pool handling.
    */
  def olsTrend(df: DataFrame, groupCols: Seq[Column], x: Column, y: Column): DataFrame = {
    val xi = x.cast("long").cast("decimal(20,0)")
    val yi = y.cast("decimal(19,4)")
    val d = (c: Column) => c.cast("double")
    val safe = (den: Column, v: Column) => when(den =!= lit(0.0), v)
    df.groupBy(groupCols: _*)
      .agg(count(lit(1)).as("__n"),
        sum(xi).as("__sx"), sum(xi * xi).as("__sxx"),
        sum(yi).as("__sy"), sum(yi * yi).as("__syy"),
        sum(yi * xi).as("__sxy"))
      .withColumn("__num", d(col("__n")) * d(col("__sxy")) - d(col("__sx")) * d(col("__sy")))
      .withColumn("__dx", d(col("__n")) * d(col("__sxx")) - d(col("__sx")) * d(col("__sx")))
      .withColumn("__dy", d(col("__n")) * d(col("__syy")) - d(col("__sy")) * d(col("__sy")))
      .withColumn("n_obs", col("__n"))
      .withColumn("slope", safe(col("__dx"), round(col("__num") / col("__dx"), 6)))
      .withColumn("intercept", safe(col("__dx"),
        round((d(col("__sy")) - (col("__num") / col("__dx")) * d(col("__sx"))) / d(col("__n")), 6)))
      .withColumn("r2", safe(col("__dx") * col("__dy"),
        round(col("__num") * col("__num") / (col("__dx") * col("__dy")), 6)))
      .drop("__n", "__sx", "__sxx", "__sy", "__syy", "__sxy", "__num", "__dx", "__dy")
  }

  /** Tidy pairwise Pearson correlation matrix over the given numeric
    * columns, from the same exact-decimal moment sums as [[olsTrend]] (the
    * whole matrix is ONE partial-aggregated pass over the data — no
    * per-pair rescans), emitted as (x_col, y_col, corr_v) rows via a
    * driver-side unpivot of the single aggregate row (p² scalars, not data).
    */
  def corrPairs(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    // fan out before the partial aggregate: the decimal moment partials are
    // the whole cost (O(k²) checked decimal MACs per row) and a single-file
    // table scans as ONE split, so they otherwise run one-core. Exact
    // decimal sums are merge-order-independent by design, so placement
    // cannot change a digit; only the k slim measure columns ride the
    // round-robin exchange. No-op at scale.
    val slim = Par.fanOut(df.select(
      cols.map { case (n, c) => c.as(s"__c_$n") }: _*))
    val dec = cols.map { case (n, _) => n -> col(s"__c_$n").cast("decimal(19,6)") }
    val sums =
      dec.map { case (n, c) => sum(c).as(s"__s_$n") } ++
      dec.map { case (n, c) => sum(c * c).as(s"__q_$n") } ++
      (for { i <- dec.indices; j <- dec.indices if i < j } yield {
        val (ni, ci) = dec(i); val (nj, cj) = dec(j)
        sum(ci * cj).as(s"__p_${ni}__$nj")
      })
    val one = slim.agg(count(lit(1)).as("__n"), sums: _*)
    val d = (c: Column) => c.cast("double")
    val pairs = for { i <- dec.indices; j <- dec.indices if i < j } yield {
      val ni = dec(i)._1; val nj = dec(j)._1
      val num = d(col("__n")) * d(col(s"__p_${ni}__$nj")) - d(col(s"__s_$ni")) * d(col(s"__s_$nj"))
      val dx = d(col("__n")) * d(col(s"__q_$ni")) - d(col(s"__s_$ni")) * d(col(s"__s_$ni"))
      val dy = d(col("__n")) * d(col(s"__q_$nj")) - d(col(s"__s_$nj")) * d(col(s"__s_$nj"))
      struct(lit(ni).as("x_col"), lit(nj).as("y_col"),
        round(num / sqrt(dx * dy), 6).as("corr_v"))
    }
    one.select(explode(array(pairs: _*)).as("__pair")).select(col("__pair.*"))
  }

  /** Position-based (U-shape) attribution: each key's ordered touch
    * sequence splits one unit of credit 40% first / 40% last / 20% spread
    * over interior touches (single-touch keys get 1.0; two-touch 0.5/0.5 —
    * the standard renormalizations). Credit sums per touch type.
    *
    * Credit is carried as integer PICOCREDITS (10⁻¹² of a unit): the
    * interior share 0.2/(n−2) is a non-terminating decimal, and decimal
    * division rounds to engine-specific scales — truncating INTEGER
    * division of 2·10¹¹ picocredits is exact and identical everywhere.
    * One key shuffle + per-key sort; the decimal sum of longs is exact
    * and merge-order-independent at any scale.
    */
  def positionAttribution(df: DataFrame, keyCol: String, orderCols: Seq[Column],
                          typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__pico",
        when(col("__n") === 1, lit(1000000000000L))
          .when(col("__n") === 2, lit(500000000000L))
          .when(col("__rn") === 1 || col("__rn") === col("__n"), lit(400000000000L))
          .otherwise(expr("CAST(200000000000 AS BIGINT) div (__n - 2)")))
      .groupBy(col(typeCol))
      .agg(round(sum(col("__pico").cast("decimal(38,0)")).cast("double") / lit(1e12), 6)
          .as("credit"),
        count(lit(1)).as("n_touches"))
  }

  /** Truncated exponential moving average per key: over the last `depth`
    * rows in `orderCols` order, ema = Σ wₖ·x_{t−k} / Σ wₖ with
    * wₖ = (1−α)ᵏ (pandas' adjust=True normalization, cut at `depth`).
    *
    * ALL arithmetic is integral: the value becomes integer cents, the
    * weights become the exact integers (1−α)ᵏ·10¹⁹ (terminating for
    * decimal α), so numerator and denominator are exact integer sums —
    * engines disagree both on float frame-evaluation order AND on
    * high-scale decimal→double conversion (measured: a wide-scale decimal
    * cast flipped 0.3% of 6-dp roundings); integers have a single
    * correctly-rounded double conversion. Expressed as `depth` lag() terms
    * over ONE shared per-key sort (no self-join, no 20× row explosion;
    * linear and AQE-splittable at scale). The two final divisions are
    * IEEE-identical everywhere.
    */
  def emaTrunc(df: DataFrame, keyCol: String, orderCols: Seq[Column],
               valueCol: Column, alpha: BigDecimal = BigDecimal("0.1"),
               depth: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 20, s"weight scale grows with depth: $depth")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val x = (valueCol.cast("decimal(12,2)") * lit(100)).cast("decimal(14,0)")
    val ratio = BigDecimal(1) - alpha
    val tenPow19 = BigDecimal(10).pow(19)
    val weights = (0 until depth).map(k =>
      lit(BigDecimal((ratio.pow(k) * tenPow19).toBigInt)).cast("decimal(20,0)"))
    def term(k: Int): Column = if (k == 0) x else lag(x, k).over(w)
    val num = (0 until depth).map { k =>
      coalesce(term(k) * weights(k), lit(0L).cast("decimal(35,0)"))
    }.reduce(_ + _)
    val den = (0 until depth).map { k =>
      when(term(k).isNotNull, weights(k)).otherwise(lit(0L).cast("decimal(20,0)"))
    }.reduce(_ + _)
    df.withColumn("ema",
      round(num.cast("double") / den.cast("double") / lit(100.0), 6))
  }

  /** Per-group robust anomaly profile: exact median, MAD, and the count of
    * rows beyond 3·1.4826·MAD (the normal-consistent robust z-score). Two
    * exact-percentile passes; the per-group medians join back and the data
    * shuffles only on the group key. (At 100 TB swap the exact percentile
    * for the mergeable KLL sketch — q_kll_rollup — same shape, bounded
    * state; exact medians are the profiling-grade variant.)
    *
    * The median/MAD sides are |groups| rows, so their broadcast is GATED
    * on a caller-known group cardinality (`nGroups`, the
    * [[graft.dedup.Dedup]] `corpusN` pattern): known and ≤
    * `broadcastMaxGroups` → hint (calendar/enum groupings); unknown (-1)
    * or above (per-user keys) → unhinted, AQE decides from the measured
    * post-aggregation size and the high-cardinality case falls back to a
    * shuffle join co-partitioned with the main groupBy key.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: Column,
                  nGroups: Long = -1L,
                  broadcastMaxGroups: Long = 4000000L): DataFrame = {
    val bcast: DataFrame => DataFrame =
      if (nGroups >= 0 && nGroups <= broadcastMaxGroups) broadcast(_) else identity
    val base = df.select(col(groupCol), valueCol.as("__v"))
    val med = base.groupBy(col(groupCol))
      .agg(expr("percentile(__v, 0.5)").as("__med"))
    val dev = base.join(bcast(med), groupCol)
      .withColumn("__adev", abs(col("__v") - col("__med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(expr("percentile(__adev, 0.5)").as("__mad"))
    dev.join(bcast(mad), groupCol)
      .groupBy(col(groupCol))
      .agg(round(min(col("__med")), 6).as("med"),
        round(min(col("__mad")), 6).as("mad"),
        sum(when(col("__adev") > lit(3.0) * lit(1.4826) * col("__mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_total"))
  }

  /** Zero-filled daily spine per key: one row per (key, day) for every day
    * between that key's first and last observation, `n_ev` = 0 on gap days.
    * The spine explodes from the per-key [min,max] aggregate — bounded by
    * the calendar span, never by the data — and joins back on (key, day),
    * the same partitioning the daily aggregate already has.
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val daily = df.select(col(keyCol), to_date(col(tsCol)).as("day"))
      .groupBy(col(keyCol), col("day")).agg(count(lit(1)).as("__n"))
    val spine = daily.groupBy(col(keyCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(keyCol),
        explode(sequence(col("__d0"), col("__d1"), expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"), coalesce(col("__n"), lit(0L)).as("n_ev"))
  }

  /** Market-basket pair mining: co-occurrence count and lift for every
    * item pair sharing a basket, top `k` by (lift, pair) deterministic
    * order. Pairs are generated INSIDE each basket from its sorted
    * distinct-item array (native [[graft.expressions.PairCombos]] — no
    * self-join, one shuffle on the basket key; baskets are bounded, so the
    * explosion is |basket|², not |data|²). Item totals join back, and
    * the final top-k is a distributed TakeOrdered, never a full sort.
    * Lift = n_ab·N / (n_a·n_b) from exact longs, divided once in double.
    *
    * ONE corpus shuffle: pairs, item counts, AND the basket census all
    * derive from the single `groupBy(basket) → collect_set` aggregate, so
    * the planner's ReusedExchange collapses them onto one scan + one
    * exchange (plan-audited: 3 scans/3 exchanges before, the corpus side
    * scans once after — the difference between one pass and three over
    * 100 TB). `collect_set` dedupes within the basket, so no separate
    * distinct pass exists either.
    *
    * The item-count side is |distinct items| — a parts catalog at TPC-H
    * scale, but potentially 10⁸–10⁹ at a web-scale item space, so the
    * broadcast is GATED on a caller-known cardinality (`distinctItems`,
    * the [[graft.dedup.Dedup]] `corpusN` pattern): known and ≤
    * `broadcastMaxItems` → hint; unknown (-1) or above → unhinted, AQE
    * sizes the post-aggregation side at runtime and broadcasts only when
    * it measured small. The basket-count side is a single-row aggregate —
    * always broadcast-safe.
    */
  def marketBasket(df: DataFrame, basketCol: String, itemCol: String,
                   minPairCount: Long = 2, k: Int = 50,
                   distinctItems: Long = -1L,
                   broadcastMaxItems: Long = 4000000L): DataFrame = {
    // the ONE corpus-wide aggregate everything derives from — building all
    // three consumers from this exact val keeps their exchange subtrees
    // canonically identical (ReusedExchange fires; the fleet scans once)
    val baskets = df
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .groupBy(col("__b"))
      .agg(sort_array(collect_set(col("__i"))).as("__arr"))
    // count(size(__arr) >= 0), not count(1): a bare count lets Catalyst
    // prune collect_set out of this branch and re-derive it as a separate
    // narrow scan + distinct shuffle — referencing __arr (the predicate is
    // vacuously true; collect_set output is never null) keeps the census
    // on the SHARED exchange, so the corpus is read and shuffled once for
    // all three consumers
    val nBaskets = baskets
      .agg(count(when(size(col("__arr")) >= 0, 1)).as("__nb"))
    val itemCounts = baskets.select(explode(col("__arr")).as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    val bcast: DataFrame => DataFrame =
      if (distinctItems >= 0 && distinctItems <= broadcastMaxItems) broadcast(_)
      else identity
    val pairs = baskets
      // native pair generator ([[graft.expressions.PairCombos]]) — the
      // nested transform/slice/flatten HOF re-sliced the array per outer
      // element; same structs, same order (parity in ExpressionParitySpec)
      .select(explode(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PairCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr"))))).as("__pr"))
      .select(col("__pr.p1").as("p1"), col("__pr.p2").as("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(bcast(itemCounts.withColumnRenamed("__i", "p1").withColumnRenamed("__ni", "__n1")), "p1")
      .join(bcast(itemCounts.withColumnRenamed("__i", "p2").withColumnRenamed("__ni", "__n2")), "p2")
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift", round(
        col("n_ab").cast("double") * col("__nb").cast("double") /
          (col("__n1").cast("double") * col("__n2").cast("double")), 6))
      .select(col("p1"), col("p2"), col("n_ab"), col("lift"))
      .orderBy(col("lift").desc, col("p1"), col("p2"))
      .limit(k)
  }

  /** Apriori level-3: frequent item TRIPLES with lift, the step after
    * [[marketBasket]]'s pairs. The level-1 prune is applied scan-side —
    * each basket's item array is intersected with the frequent-item set
    * (support ≥ `minSupport`, a bounded census collected as a LITERAL
    * array, gated by `maxFreqItems`) BEFORE the cubic in-basket generator
    * runs, so the generator's cost is cubic in the basket's FREQUENT-item
    * count only (the classic SON/Apriori observation: infrequent items
    * cannot appear in any frequent triple). Triples then partial-aggregate
    * like any census; lift₃ = n_abc·N²/(n_a·n_b·n_c) in exact-int-derived
    * doubles; top-k is TakeOrderedAndProject.
    *
    * Per-basket blow-up is the caller's contract (same as marketBasket's
    * pair generator): a basket with f frequent items emits C(f, 3) rows —
    * cap pathological baskets upstream if the domain allows them.
    *
    * The level-2 (pair) prune is GATED on estimated pair selectivity
    * (`pairPrune = "auto"`): it engages only when the driver-side
    * independence estimate says ≥ half the frequent-item pairs fall below
    * minSupport — on sf0.1's dense 50-item domain every pair is frequent
    * (support ≥ 775 vs threshold 5, the r13 measurement) and the prune
    * would only add a pair pass, so the gate keeps it off; on a sparse
    * wide-vocab domain it cuts the cubic generator's input before the
    * blow-up. Output is bit-identical either way (AnalyticsSpec pins
    * on == off on a fixture where the prune fires).
    */
  def basketTriples(df: DataFrame, basketCol: Column, itemCol: Column,
                    minSupport: Long, k: Int,
                    maxFreqItems: Int = 100000,
                    pairPrune: String = "auto"): DataFrame = {
    require(minSupport >= 1 && k >= 1, s"minSupport/k must be positive: $minSupport/$k")
    require(Set("auto", "on", "off")(pairPrune),
      s"pairPrune must be auto|on|off: $pairPrune")
    // null/uncastable items carry no itemset information and would poison
    // the frequent-item literal (a NULL row NPEs the collect)
    val items = df.select(basketCol.as("__b"), itemCol.cast("long").as("__i"))
      .filter(col("__i").isNotNull)
    // ONE corpus aggregate (marketBasket's ReusedExchange pattern):
    // collect_set dedupes within the basket (no separate distinct pass),
    // and deriving itemCounts, the basket census, and the triple stream
    // all from THIS val keeps their exchange subtrees canonically
    // identical — the main job scans and shuffles the corpus once.
    // Honest local A/B: ~+0.2 s at sf0.1 (1.8 → 2.0 warm) — reuse shares
    // the EXCHANGE but each consumer re-finalizes the collect_set
    // (ObjectHashAggregate, non-codegen), and local scans are page-cached
    // so the three scans it removes were nearly free here. Kept anyway:
    // at 100 TB the removed corpus scans+shuffles dominate and the
    // repeated finalization reads already-shuffled local buffers.
    val baskets = items.groupBy(col("__b"))
      .agg(sort_array(collect_set(col("__i"))).as("__arr0"))
    val itemCounts = baskets.select(explode(col("__arr0")).as("__i"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__ni"))
    // the frequent-item census is its own EAGER job (the literal prune
    // array must exist before the main plan is built), so exchange reuse
    // with the main job is impossible — give it the cheapest standalone
    // shape (narrow two-column scan + distinct-aggregate) instead of the
    // main job's collect_set machinery; the VALUES are identical
    val freq = items.groupBy(col("__i"))
      .agg(countDistinct(col("__b")).as("__ni"))
      .filter(col("__ni") >= minSupport)
      .limit(maxFreqItems + 1).collect()
    require(freq.length <= maxFreqItems,
      s"more than maxFreqItems=$maxFreqItems frequent items — raise minSupport")
    val freqArr = freq.map(_.getLong(0)).sorted
    // Level-2 (pair) prune GATE — driver-side, priced from stats already in
    // hand, no extra job. The prune itself costs a per-basket C(f,2) pair
    // pass + one pair-support shuffle, so it must engage only where it
    // deletes work: estimate, under item independence, the fraction of
    // frequent-item pairs whose expected co-support n_a·n_b/N falls below
    // minSupport (N lower-bounded by the max item support — a smaller N
    // inflates expectations, i.e. errs toward NOT engaging). Dense domains
    // (sf0.1's 50-item mod buckets: every pair support ≥775 vs threshold 5)
    // estimate ~0 and keep the r13 no-prune shape; sparse wide-vocab
    // domains estimate ~1 and engage. `pairPrune` = on/off forces either
    // path for specs and for callers who know their domain.
    val engagePrune = pairPrune match {
      case "on"  => true
      case "off" => false
      case _ =>
        val supports = freq.map(_.getLong(1)).sorted
        val f = supports.length
        if (f < 3) false
        else {
          val nEst = supports.last.toDouble
          var below = 0L
          var i = 0
          while (i < f - 1) {
            // count j > i with supports(i)·supports(j)/nEst < minSupport,
            // i.e. supports(j) < minSupport·nEst/supports(i) — supports is
            // ascending, so one binary search per i
            val limit = minSupport.toDouble * nEst / supports(i)
            var lo = i + 1; var hi = f
            while (lo < hi) {
              val mid = (lo + hi) >>> 1
              if (supports(mid) < limit) lo = mid + 1 else hi = mid
            }
            below += lo - (i + 1)
            i += 1
          }
          val total = f.toLong * (f - 1) / 2
          below.toDouble / total >= 0.5
        }
    }
    // count(size >= 0) keeps the census on the shared exchange (a bare
    // count would let Catalyst prune collect_set into a separate scan)
    val nBaskets = baskets
      .agg(count(when(size(col("__arr0")) >= 0, 1)).as("__nbk"))
    // NOTE on the AQE-coalesced explode read (profiled r12): the agg's
    // shuffle read coalesces to ~4 tasks (basket table is tiny in bytes)
    // so the O(|basket|³) generation runs ~4-way. An explicit 32-way
    // repartition was A/B'd and REJECTED: it did spread the stage, but
    // total CPU inflated ~5× (the wider stage re-paid per-task setup on
    // HOF-heavy work) and wall-clock was unchanged — at real scale the
    // basket table's bytes grow with the corpus and AQE stops coalescing
    // on its own, so the toy-scale shape is not the 100 TB shape.
    val level1 = baskets
      .withColumn("__arr1", array_intersect(col("__arr0"), typedLit(freqArr.toSeq)))
      .filter(size(col("__arr1")) >= 3)
    // Level-2 prune (gated above): keep, per basket, only items that
    // participate in ≥ 2 FREQUENT pairs within that basket — any item of a
    // frequent triple does (two of the triple's three pairs touch it, and
    // pair support ⊇ triple support), so no frequent triple loses a basket
    // and n_abc/lift are bit-identical with the prune on or off; only
    // cannot-be-frequent candidates are cut before the CUBIC generator.
    // Cost when engaged: one C(f,2)-per-basket pair stream counted once
    // (quadratic — cheap relative to the cubic it guards), a semi-join
    // back, and a per-(basket, item) degree count; exactly the SON/Apriori
    // level-2 step, distributed with no driver-side pair state.
    val pruned =
      if (!engagePrune) level1.select(col("__b"), col("__arr1").as("__arr"))
      else {
        Analytics.pairPruneEngaged.incrementAndGet()
        val bp = level1.select(col("__b"),
            explode(org.apache.spark.sql.graft.ColumnBridge.column(
              graft.expressions.PairCombos(
                org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr1"))))).as("__pr"))
          .select(col("__b"), col("__pr.p1").as("p1"), col("__pr.p2").as("p2"))
        // Pair support via a whole-partition window on (p1, p2), NOT an
        // aggregate + semi-join back: the agg/semi-join form referenced bp
        // from TWO plan branches, so the quadratic PairCombos explode was
        // planned and executed twice — on exactly the sparse domains the
        // prune targets, where that explode is the dominant cost. The
        // window pays one shuffle of the exploded pairs instead (spilling
        // ExternalAppendOnlyUnsafeRowArray frames, no cache pinning), and
        // the generator runs once. Same survivors: a bp row passes iff its
        // (p1, p2) global count >= minSupport, bit-identical to the
        // semi-join (prune on/off parity stays pinned in AnalyticsSpec).
        // The semi-join/window equivalence needs p1/p2 NON-NULL (a semi
        // join drops null keys, Window.partitionBy groups them) — which
        // holds by construction: __arr1 = array_intersect(collect_set(...),
        // literal), and collect_set never emits null elements, so
        // PairCombos only ever sees (and produces) non-null values.
        bp.withColumn("__np",
            count(lit(1)).over(Window.partitionBy(col("p1"), col("p2"))))
          .filter(col("__np") >= minSupport)
          .select(col("__b"), explode(array(col("p1"), col("p2"))).as("__i2"))
          .groupBy(col("__b"), col("__i2")).agg(count(lit(1)).as("__deg"))
          .filter(col("__deg") >= 2)
          .groupBy(col("__b"))
          .agg(sort_array(collect_set(col("__i2"))).as("__arr"))
          .filter(size(col("__arr")) >= 3)
      }
    val triples = pruned
      // native triple generator ([[graft.expressions.TripleCombos]]): the
      // nested-HOF comprehension it replaces re-paid sequence allocation,
      // closure dispatch, and two flatten copies per outer index PER ROW —
      // q_basket_triples sf0.1 warm 3.05 s → 1.80 s with this swap alone.
      // Same structs, same order (parity pinned in ExpressionParitySpec).
      .select(explode(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.TripleCombos(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__arr"))))).as("__t"))
      .select(col("__t.a").as("a"), col("__t.b").as("b"), col("__t.c").as("c"))
      .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("n_abc"))
      .filter(col("n_abc") >= minSupport)
    triples
      .join(itemCounts.select(col("__i").as("a"), col("__ni").as("__na")), "a")
      .join(itemCounts.select(col("__i").as("b"), col("__ni").as("__nb")), "b")
      .join(itemCounts.select(col("__i").as("c"), col("__ni").as("__nc")), "c")
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift", round(
        col("n_abc").cast("double") * col("__nbk").cast("double") * col("__nbk").cast("double")
          / (col("__na").cast("double") * col("__nb").cast("double") * col("__nc").cast("double")), 6))
      .select(col("a"), col("b"), col("c"), col("n_abc"), col("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"), col("c"))
      .limit(k)
  }

  /** 2-D Pareto frontier, maximizing `valueCol` while minimizing the date
    * of `tsCol`: a row survives iff nothing with an earlier-or-equal date
    * strictly dominates it — i.e. it holds its date's max value AND beats
    * every strictly-earlier date's max. The frontier reduces to a per-date
    * max (one partial-aggregated shuffle; the result is bounded by the
    * CALENDAR, not the data) plus a running max over those few dates and a
    * broadcast join back — never the quadratic dominance self-join.
    */
  def paretoFrontierByDate(df: DataFrame, tsCol: String, valueCol: String): DataFrame = {
    val daily = df.groupBy(to_date(col(tsCol)).as("__day"))
      .agg(max(col(valueCol)).as("__dmax"))
    // single-partition window is safe HERE: input is the per-day aggregate,
    // bounded by the calendar span (~10k rows for 30 years)
    val prior = daily.withColumn("__prior",
      max(col("__dmax")).over(Window.orderBy(col("__day"))
        .rowsBetween(Window.unboundedPreceding, -1)))
    df.join(broadcast(prior), to_date(col(tsCol)) === col("__day"))
      .filter(col(valueCol) === col("__dmax") &&
        (col("__prior").isNull || col(valueCol) > col("__prior")))
      .drop("__day", "__dmax", "__prior")
  }

  /** Top-`k` vocabulary with cumulative corpus coverage: token counts (one
    * partial-aggregated shuffle over the token stream), distributed
    * TakeOrdered for the top slice, then the running share over just those
    * `k` rows (single-partition window over a CONSTANT-bounded frame — the
    * tokenizer-design question "how many vocab entries cover 95% of the
    * corpus" needs exactly this shape at any scale). Exact long counts;
    * one double division per row.
    */
  def vocabCoverage(tokens: DataFrame, tokCol: String, k: Int): DataFrame = {
    val counts = tokens.groupBy(col(tokCol).as("tok")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__tot"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(k)
    val w = Window.orderBy(col("n").desc, col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rnk", row_number().over(Window.orderBy(col("n").desc, col("tok"))))
      .withColumn("cum_share",
        round(sum(col("n")).over(w).cast("double") / col("__tot").cast("double"), 6))
      .select(col("tok"), col("n"), col("rnk"), col("cum_share"))
  }

  /** Day-of-week seasonality profile per group: event count, exact-decimal
    * mean of `valueCol`, and the share of the group's events on that
    * weekday (ISO 1=Monday). One partial-aggregated pass; the per-group
    * totals join back by broadcast (≤ |groups| rows).
    */
  def dowProfile(df: DataFrame, groupCol: String, tsCol: String,
                 valueCol: Column): DataFrame = {
    // ISO weekday (1=Mon..7=Sun) from dayofweek (1=Sun..7=Sat): both
    // engines agree on this arithmetic; DuckDB's isodow is the twin
    val a = df.groupBy(col(groupCol),
        (((dayofweek(col(tsCol)) + lit(5)) % lit(7)) + lit(1)).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_ev"),
        sum(valueCol.cast("decimal(18,2)")).cast("double").as("__sum"))
    val totals = a.groupBy(col(groupCol)).agg(sum(col("n_ev")).as("__tot"))
    a.join(broadcast(totals), groupCol)
      .select(col(groupCol), col("dow"), col("n_ev"),
        round(col("__sum") / col("n_ev").cast("double"), 6).as("avg_v"),
        round(col("n_ev").cast("double") / col("__tot").cast("double"), 6).as("share"))
  }

  /** Gaps-and-islands: collapse each key's consecutive identical `stateCol`
    * values (in `orderCols` order) into runs. The run id is the running sum
    * of change-points from ONE lag over ONE window — a single key shuffle
    * and sort shared by the lag, the running sum, and the position counter
    * (the classic rn−rn_by_state island trick needs a second shuffle on
    * (key, state); this form doesn't). Output: key, state, `run_len`,
    * `start_pos` (1-based position of the run's first event in the key's
    * stream).
    */
  def runs(df: DataFrame, keyCol: String, orderCols: Seq[Column],
           stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val brk = when(lag(col(stateCol), 1).over(w).isNull ||
      lag(col(stateCol), 1).over(w) =!= col(stateCol), 1L).otherwise(0L)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__run",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col(stateCol), col("__run"))
      .agg(count(lit(1)).as("run_len"), min(col("__rn")).cast("long").as("start_pos"))
      .drop("__run")
  }

  /** Herfindahl–Hirschman concentration index per group: HHI =
    * Σᵢ (nᵢ/N)² over the members' shares — computed as Σnᵢ² / N² from
    * EXACT longs (two partial-aggregated shuffles, one double division),
    * so there is no float-merge-order nondeterminism and no per-member
    * double summation. 1/|members| = perfectly even … 1.0 = monopoly.
    */
  def hhi(df: DataFrame, groupCol: String, memberCol: String): DataFrame =
    df.groupBy(col(groupCol), col(memberCol))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_members"),
        sum(col("__n")).as("__tot"),
        sum(col("__n") * col("__n")).as("__sq"))
      .select(col(groupCol), col("n_members"),
        round(col("__sq").cast("double") /
          (col("__tot").cast("double") * col("__tot").cast("double")), 6).as("hhi"))

  /** Two-proportion pooled z-test between cohort 0 and cohort 1:
    * z = (p₀ − p₁) / √(p̄(1−p̄)(1/n₀ + 1/n₁)). Counts are exact longs from
    * one partial-aggregated pass; the z formula is a fixed chain of IEEE
    * ops on doubles of exact sums — deterministic in any engine.
    * `cohortCol` must be 0/1, `successCol` 0/1 per row (one row per unit).
    */
  def twoProportionZ(df: DataFrame, cohortCol: Column, successCol: Column): DataFrame = {
    val d = (c: Column) => c.cast("double")
    val agg = df.agg(
      sum(when(cohortCol === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(cohortCol === 0, successCol).otherwise(lit(0L))).as("c_a"),
      sum(when(cohortCol === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(cohortCol === 1, successCol).otherwise(lit(0L))).as("c_b"))
    val pa = d(col("c_a")) / d(col("n_a"))
    val pb = d(col("c_b")) / d(col("n_b"))
    val pool = (d(col("c_a")) + d(col("c_b"))) / (d(col("n_a")) + d(col("n_b")))
    // degenerate pools (0% or 100% conversion overall) have zero pooled
    // variance: the z statistic is undefined, not infinite — emit NULL
    // (ANSI mode would otherwise raise DIVIDE_BY_ZERO)
    val se = sqrt(pool * (lit(1.0) - pool) *
      (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    val z = when(se > 0, (pa - pb) / se).otherwise(lit(null).cast("double"))
    agg.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      round(pa, 6).as("rate_a"), round(pb, 6).as("rate_b"),
      round(z, 6).as("z"), (abs(z) > lit(1.96)).as("significant"))
  }

  /** Table profile: per requested column — row count, null count, distinct
    * count, and min/max (as strings via caller-supplied exact formatting,
    * so one tidy schema covers mixed types). Counts and min/max come from
    * ONE grouping-free pass; each exact distinct count is its own
    * per-column hash census (a narrow single-column parquet read under
    * column pruning) reduced to one long — 1 + |cols| scans total, but no
    * Expand and no keyed SortAggregate (see the body comment and PERF.md
    * r11). The per-column rows unpivot from the reassembled single row.
    * The Deequ-style profiling shape.
    */
  def profileTable(df: DataFrame, cols: Seq[(String, Column)]): DataFrame = {
    val aggs = cols.flatMap { case (n, c) =>
      // min/max in the NATIVE type (string min is lexicographic — wrong
      // for numerics), formatted to string after
      Seq(count(c).as(s"__nn_$n"),
        min(c).cast("string").as(s"__mn_$n"),
        max(c).cast("string").as(s"__mx_$n"))
    }
    // grouping-free pass: string min/max buffers force SortAggregate, but
    // with Keys:[] that is a sortless single pass
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // exact distinct counts, one hash census per column. Multi-column
    // countDistinct in ONE aggregate plans as Expand(|cols|·n rows) into a
    // SortAggregate keyed on every expand column — measured 2.45 s on a
    // 150k-row table (the sort of 900k wide rows dominates). Separate
    // per-column censuses stay HashAggregate (partial-combined, |distinct|
    // rows shuffled each) and reduce to one long before the reassembly
    // crossJoins (1-row broadcasts): 2.45 → 1.2 s, identical output.
    val nds = cols.map { case (n, c) =>
      // isNotNull, NOT na.drop(): na.drop also drops NaN, but countDistinct
      // treated NaN as a distinct non-null value — preserve that
      df.select(c.as("__v")).filter(col("__v").isNotNull).distinct()
        .agg(count(lit(1)).as(s"__nd_$n"))
    }
    val joined = nds.foldLeft(one)((acc, d) => acc.crossJoin(broadcast(d)))
    val rows = cols.map { case (n, _) =>
      struct(lit(n).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$n")).as("n_nulls"),
        col(s"__nd_$n").as("n_distinct"),
        col(s"__mn_$n").as("min_s"), col(s"__mx_$n").as("max_s"))
    }
    joined.select(explode(array(rows: _*)).as("__r")).select(col("__r.*"))
  }

  /** Per-key time-weighted average: each observation's weight is the
    * microseconds until the key's next observation (exact long), the value
    * is an exact decimal — numerator and denominator are exact sums, one
    * guarded division per key. The last observation carries no weight;
    * single-observation keys drop (no span). One key shuffle + sort.
    */
  def twap(df: DataFrame, keyCol: String, tsCol: String,
           orderTieBreak: Seq[Column], valueCol: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol) +: orderTieBreak: _*)
    df.select(col(keyCol) +: col(tsCol) +:
        (orderTieBreak :+ valueCol.cast("decimal(12,2)").as("__v")): _*)
      .withColumn("__dt",
        lead(unix_micros(col(tsCol)), 1).over(w) - unix_micros(col(tsCol)))
      .filter(col("__dt").isNotNull)
      .groupBy(col(keyCol))
      .agg(sum(col("__dt")).as("span_micros"),
        sum(col("__v") * col("__dt")).as("__num"))
      .select(col(keyCol), col("span_micros"),
        when(col("span_micros") > 0,
          round(col("__num").cast("double") / col("span_micros").cast("double"), 6))
          .otherwise(lit(null).cast("double")).as("twap"))
  }

  /** Peak concurrency over half-open [start, end) intervals: the classic
    * sweep — +1/−1 deltas in global (time, delta) order, running sum, max.
    * The global prefix sum is the range-sharded [[prefixSum]] (per-shard
    * windows + a collected shard-offset census) — never a single-reducer
    * window, so the sweep holds at any interval count. Ends sort before
    * starts at the same instant (−1 < +1), so back-to-back intervals don't
    * overlap. Returns one row: the peak and the first instant it is
    * reached.
    *
    * The ±1 deltas come from ONE explode pass over the intervals, not a
    * self-union: a union scans the interval source twice per job, and when
    * the source is itself an aggregation (q_peak_concurrency's
    * session_window rollup) every one of prefixSum's jobs would pay it
    * twice. Local wall-clock is dominated by the FIXED cost of the five
    * jobs (count/sample/census/window + the cache fill), ~0.3-0.5 s each
    * on 191k rows at sf0.1 (measured phase-by-phase in r10) — overhead
    * that amortizes to nothing at real scale, which is what the sharded
    * shape is for.
    */
  def peakConcurrency(intervals: DataFrame, startCol: Column, endCol: Column): DataFrame = {
    val deltas = intervals
      .select(explode(array(
        struct(unix_micros(startCol).as("t"), lit(1L).as("delta")),
        struct(unix_micros(endCol).as("t"), lit(-1L).as("delta")))).as("__d"))
      .select(col("__d.t").as("t"), col("__d.delta").as("delta"))
    val cum = prefixSum(deltas, Seq(col("t"), col("delta")), col("delta"), "cum")
    // ONE aggregate finds both answers: max over (cum, −t) structs is the
    // highest concurrency and, among its ties, the earliest instant — no
    // max-broadcast-join back, so the sweep's plan runs once, not twice
    cum.agg(max(struct(col("cum"), (-col("t")).as("__negt"))).as("__s"))
      .select(col("__s.cum").as("peak"),
        timestamp_micros(-col("__s.__negt")).as("peak_at"))
  }

  /** Deterministic per-key mode: the most frequent value, ties broken by
    * the smallest value. Two partial-aggregating shuffles of (key, value)
    * pairs — never a sort of the raw data — then a per-key top-1 window
    * over the (key × distinct-value) counts, which are bounded by the
    * value-domain size, not the data.
    */
  def modePerKey(df: DataFrame, keyCol: String, valCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol), col(valCol))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__cnt").desc, col(valCol).asc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(keyCol), col(valCol).as("mode_val"), col("__cnt").as("mode_n"))
  }

  /** Local-DP randomized response (Warner 1965; ε = ln 3 at flip probability
    * 1/4): each row's sensitive bit is flipped when its deterministic
    * `coinCol` ∈ {0,1,2,3} lands on 0, and the per-cohort rate is recovered
    * by the unbiased estimator p̂·n = (4·observed − n) / 2. The privacy tier's
    * aggregate face — k-anonymity audits groups, PII redaction rewrites
    * rows, this releases *counts* under plausible deniability.
    *
    * Everything is integer arithmetic until the final halving (exact in
    * IEEE — a power-of-two divide only decrements the exponent), so the
    * estimate replays bit-identically on any engine. One partial-aggregated
    * shuffle on the cohort key; the flip is a codegen'd branch, no UDF.
    * `trueBits` is emitted for calibration audits at test scale — a real
    * release would drop that column (the mechanism never needs it).
    */
  def randomizedResponse(df: DataFrame, cohortCol: Column, bitCol: Column,
                         coinCol: Column): DataFrame = {
    val reported = when(coinCol === 0, lit(1L) - bitCol.cast("long"))
      .otherwise(bitCol.cast("long"))
    df.select(cohortCol.as("cohort"), bitCol.cast("long").as("__bit"),
        reported.as("__rep"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n"),
        sum(col("__bit")).as("true_positives"),
        sum(col("__rep")).as("reported_positives"))
      .withColumn("debiased_estimate",
        (lit(4L) * col("reported_positives") - col("n")).cast("double") / 2.0)
  }

  /** Windowed token co-occurrence PMI — the collocation statistic embedding
    * pipelines pre-compute (word2vec/GloVe-style skip-gram counts) and
    * curators use to find boilerplate multi-word units. Pairs are generated
    * SCAN-SIDE by a nested HOF over each document's token array (every
    * position with its next ≤ `window` neighbors, unordered-canonicalized
    * so (a,b) ≡ (b,a)) — never a positions self-join, whose per-document
    * cost would be quadratic in document length instead of linear × window.
    *
    * PMI uses pair-slot marginals: p(a) = c_a/2N, p(ab) = c_ab/N ⇒
    * pmi = ln(4N·c_ab / (c_a·c_b)) — one ln per OUTPUT row over exact
    * integer counts (no cross-partition float sum anywhere). Shuffles:
    * the pair census (partial-aggregated, hot pairs combine map-side), the
    * |vocab| marginal rollup derived from the census (not the corpus), and
    * two census-sized marginal joins; the pair total rides along as a
    * crossed-in 1-row aggregate (a collected scalar would force the whole
    * census pipeline to run twice — once for the scalar's job, once for
    * the real plan); top-k is TakeOrderedAndProject.
    */
  def pmiPairs(df: DataFrame, textCol: Column, window: Int,
               minCount: Long, k: Int): DataFrame = {
    require(window >= 1 && minCount >= 1 && k >= 1,
      s"window/minCount/k must be positive: $window/$minCount/$k")
    // fan out the token frame: the skip-gram generation + the partial pair
    // counts are the whole cost. CONTENT-hash form (audited): this frame
    // has no id column — duplicate raw texts would collapse the fan-out's
    // spread (perf only, never correctness); callers with duplicate-heavy
    // corpora should dedup upstream or thread an id through pmiPairs (the tiny-vocab partials collapse the
    // shuffle to ~nothing), and a single-file corpus scans as ONE split —
    // without the exchange the entire kernel ran one-core. Native
    // SkipGramPairs replaces the nested sequence/transform/flatten HOF
    // (per-position allocations; parity pinned in ExpressionParitySpec).
    val pairs = Par.fanOut(df.select(textCol.as("__raw")))
      .select(graft.functions.TextFunctions.tokens(lower(col("__raw"))).as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(explode(org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.SkipGramPairs(
          org.apache.spark.sql.graft.ColumnBridge.expression(col("__t")),
          window))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pc = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val marg = pc.select(explode(array(col("a"), col("b"))).as("tok"), col("c_ab"))
      .groupBy(col("tok")).agg(sum(col("c_ab")).as("c_t"))
    val tot = pc.agg(sum(col("c_ab")).as("__np"))
    pc.filter(col("c_ab") >= minCount)
      .join(marg.select(col("tok").as("a"), col("c_t").as("c_a")), "a")
      .join(marg.select(col("tok").as("b"), col("c_t").as("c_b")), "b")
      .crossJoin(tot)
      .select(col("a"), col("b"), col("c_ab"),
        round(log(lit(4.0) * col("__np").cast("double") * col("c_ab").cast("double")
          / (col("c_a").cast("double") * col("c_b").cast("double"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Differentially-private count release, deterministic-replay form: each
    * group's true count is perturbed by bounded discrete noise derived from
    * a keyed hash of the group label (`pmod(fnv1a64(seed‖group), 2m+1) − m`,
    * a uniform draw on [−m, m]). A production release draws FRESH geometric
    * noise per release — the hash stands in for the RNG here so the whole
    * mechanism (noise included) replays bit-exactly under the oracle, the
    * same honesty trade as [[randomizedResponse]]. `true_n` is emitted for
    * calibration at test scale; a real release drops it.
    *
    * One partial-aggregated shuffle on the group key; the noise is a
    * codegen'd expression over the |groups|-row aggregate (zero per-row
    * cost on the corpus).
    */
  def dpNoisyCounts(df: DataFrame, groupCol: Column, seed: String,
                    noiseMag: Int): DataFrame = {
    require(noiseMag >= 0, s"noiseMag must be non-negative: $noiseMag")
    val m = noiseMag.toLong
    df.groupBy(groupCol.as("grp"))
      .agg(count(lit(1)).as("true_n"))
      .withColumn("noise",
        pmod(graft.functions.TextFunctions.fnv1a64(
          concat(lit(seed + ":"), col("grp").cast("string"))), lit(2 * m + 1)) - m)
      .withColumn("released", greatest(lit(0L), col("true_n") + col("noise")))
  }

  /** Pearson chi-squared statistic for independence of two categorical
    * columns — the corpus-audit answer to "is language confounded with
    * source". Every cell of the FULL |a|×|b| grid contributes (including
    * zero cells: the margins make their expected counts positive), and the
    * statistic is computed entirely in exact integer arithmetic: cell term
    * = (o·N − r·c)² / (r·c·N), accumulated as floor-truncated micro-units
    * in BigInt, one exact-long → double division at the end — the
    * cross-engine float-sum problem never arises.
    *
    * Scale shape: ONE partial-aggregated corpus scan producing the
    * (a, b) cell census, which is then a bounded driver-side collect (the
    * margins/grid/statistic are O(|a|·|b|) work over that census — a
    * distributed grid formulation was measured to plan THREE corpus scans,
    * because each margin re-derives the un-persisted cell aggregate).
    * `maxCells` guards the collect: past it, the caller is auditing
    * continuous columns and should bucket them first.
    */
  def chiSquareIndependence(df: DataFrame, aCol: Column, bCol: Column,
                            maxCells: Int = 100000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // guard BEFORE the collect: limit(maxCells + 1) bounds what can ever
    // reach the driver, so a high-cardinality misuse fails with this
    // message instead of a driver OOM
    val cells = df.groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("o"))
      .limit(maxCells + 1)
      .collect().map(r => (r.get(0), r.get(1), r.getLong(2)))
    require(cells.length <= maxCells,
      s"more than maxCells=$maxCells contingency cells — bucket the columns first")
    val rA = cells.groupBy(_._1).map { case (k, v) => k -> BigInt(v.map(_._3).sum) }
    val cB = cells.groupBy(_._2).map { case (k, v) => k -> BigInt(v.map(_._3).sum) }
    val n = BigInt(cells.map(_._3).sum)
    val obs = cells.map { case (a, b, o) => (a, b) -> BigInt(o) }.toMap
    var chiMicro = BigInt(0)
    var nCells = 0L
    if (n > 0) for (a <- rA.keys; b <- cB.keys) {
      val o = obs.getOrElse((a, b), BigInt(0))
      val num = o * n - rA(a) * cB(b)
      chiMicro += (num * num * 1000000) / (rA(a) * cB(b) * n)
      nCells += 1
    }
    Seq((nCells, n.toLong, chiMicro.toLong.toDouble / 1e6))
      .toDF("n_cells", "n_rows", "chi2")
  }

  /** Per-group winsorized statistics: values are clipped to the group's own
    * [pLo, pHi] per-mille rank bounds before averaging — the robust-mean
    * alternative to trimming (every row still counts, outliers just stop
    * dominating the sum).
    *
    * The bounds are DISCRETE percentiles picked by integer rank
    * (`ceil(n·p/1000)` computed as `(n·p + 999) div 1000` — no float `ceil`
    * whose `0.1·n` representation error could shift the rank), so every
    * intermediate is an exact integer and the mean is one deterministic
    * int→double division at the end. One shuffle on the group key: the rank
    * window, the bounds aggregate, and the final aggregate all share the
    * same hash partitioning (the bounds table is |groups| rows; the join
    * back is left to AQE — no forced broadcast).
    */
  def winsorizedStats(df: DataFrame, groupCol: Column, valueCol: Column,
                      tieCol: Column, pLoPermille: Int, pHiPermille: Int): DataFrame = {
    require(0 < pLoPermille && pLoPermille < pHiPermille && pHiPermille <= 1000,
      s"need 0 < pLo < pHi <= 1000, got [$pLoPermille, $pHiPermille]")
    val w = Window.partitionBy(col("__g")).orderBy(col("__v").asc, col("__t").asc)
    val ranked = df.select(groupCol.as("__g"), valueCol.cast("long").as("__v"),
        tieCol.as("__t"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
    // rn == ceil(n·p/1000) expressed as the cross-multiplied band
    // (rn−1)·1000 < n·p ≤ rn·1000 — pure int64, no division anywhere
    def atRank(pPermille: Int): Column =
      (col("__rn") - 1L) * 1000L < col("__n") * pPermille.toLong &&
        col("__n") * pPermille.toLong <= col("__rn") * 1000L
    val bounds = ranked
      .groupBy(col("__g"))
      .agg(min(when(atRank(pLoPermille), col("__v"))).as("lo"),
        min(when(atRank(pHiPermille), col("__v"))).as("hi"))
    ranked.join(bounds, "__g")
      .withColumn("__clip", greatest(col("lo"), least(col("hi"), col("__v"))))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"), min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        sum(col("__v")).as("raw_sum"), sum(col("__clip")).as("win_sum"))
      .select(col("__g").as("grp"), col("n"), col("lo"), col("hi"),
        (col("raw_sum").cast("double") / col("n")).as("raw_mean"),
        (col("win_sum").cast("double") / col("n")).as("win_mean"))
  }

  /** Per-group nucleus (top-p) vocabulary: the smallest prefix of the
    * count-descending token list whose cumulative mass reaches p — the
    * sampling-time "nucleus" applied to a corpus vocabulary, and the
    * curation-time answer to "how concentrated is this source's token
    * distribution". A token enters the nucleus while the mass BEFORE it is
    * still < p·total, cross-multiplied in int64 (`(cum−cnt)·1000 < p·total`)
    * so the cut is exact on any engine.
    *
    * Two shuffles: the (group, token) count (partial-aggregated, hot tokens
    * combine map-side) and the per-group window; the final per-group rollup
    * reuses the window's partitioning. Output is |groups| rows.
    */
  def nucleusVocab(df: DataFrame, groupCol: Column, textCol: Column,
                   pPermille: Int): DataFrame = {
    require(0 < pPermille && pPermille <= 1000, s"need 0 < p <= 1000, got $pPermille")
    val toks = df.select(groupCol.as("grp"),
        explode(graft.functions.TextFunctions.tokens(lower(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp")).orderBy(col("cnt").desc, col("tok").asc)
    val wp = Window.partitionBy(col("grp"))
    toks
      .withColumn("cum", sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(wp))
      .filter((col("cum") - col("cnt")) * 1000L < lit(pPermille.toLong) * col("total"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("nucleus_size"), sum(col("cnt")).as("nucleus_mass"),
        max(col("total")).as("total_tokens"))
      .withColumn("coverage",
        round(col("nucleus_mass").cast("double") / col("total_tokens"), 6))
  }

  /** Per-dimension embedding-table health audit: count, min, max, and the
    * dead/negative tallies for every vector position — the check that finds
    * collapsed dimensions, saturated quantization ranges, and all-zero
    * padding before an ANN index is built over garbage.
    *
    * Deliberately restricted to order-independent statistics (min/max/
    * conditional counts): a cross-partition float SUM is summation-order-
    * dependent and can never hash-match another engine, so means live in
    * the int8-quantized pipeline ([[graft.similarity.Ann]]) where sums are
    * exact integers. One explode (rows × dim, map-side partial agg) and one
    * shuffle on the dimension id; output is |dim| rows.
    */
  def embedDimStats(df: DataFrame, vecCol: Column): DataFrame =
    df.select(posexplode(vecCol).as(Seq("dim", "v")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        round(min(col("v")).cast("double"), 6).as("mn"),
        round(max(col("v")).cast("double"), 6).as("mx"),
        sum(when(col("v") === 0.0f, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("v") < 0.0f, 1L).otherwise(0L)).as("n_neg"))

  /** N-gram novelty curve: documents are split into `buckets` equal-width
    * ingestion batches by id, and each batch is charged with the distinct
    * word n-grams whose FIRST occurrence falls in it. The curve is how a
    * crawl's marginal value is measured — when `novel/seen` flattens, new
    * data is mostly repeating the old (Heaps-law saturation, per batch
    * rather than cumulative).
    *
    * The id range census is one collected row (bounded side input); grams
    * pre-dedup per (gram, bucket) before the min-bucket pass so the heavy
    * shuffle carries each (gram, batch) pair once. At 100 TB the gram
    * string would be a 64-bit fingerprint ([[graft.functions.TextFunctions
    * .fingerprint64]]) — 8 bytes/row on the wire; the raw string keeps the
    * oracle replayable here. Output is `buckets` rows.
    */
  def ngramNovelty(df: DataFrame, idCol: Column, textCol: Column,
                   n: Int, buckets: Int): DataFrame = {
    val b = df.agg(min(idCol.cast("long")), max(idCol.cast("long"))).head()
    // empty input: the aggregates are NULL; any bounds work (zero rows flow)
    val (mn, mx) = if (b.isNullAt(0)) (0L, 0L) else (b.getLong(0), b.getLong(1))
    val span = math.max(1L, mx - mn + 1L)
    // `div` (integer floor division, SQL operator — the Column `/` would be
    // a lossy double divide) over the non-negative offset
    val gramBucket = df
      .select(((idCol.cast("long") - mn) * buckets).as("__braw"),
        explode(graft.dedup.Dedup.wordShingles(textCol, n)).as("gram"))
      .select(least(lit((buckets - 1).toLong), expr(s"__braw div $span")).as("bucket"),
        col("gram"))
      .groupBy(col("gram"), col("bucket")).agg(count(lit(1)).as("__dup"))
    val novel = gramBucket.groupBy(col("gram"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("novel_grams"))
    val seen = gramBucket.groupBy(col("bucket")).agg(count(lit(1)).as("seen_grams"))
    seen.join(novel, Seq("bucket"), "left")
      .select(col("bucket"), col("seen_grams"),
        coalesce(col("novel_grams"), lit(0L)).as("novel_grams"))
      .withColumn("novelty_frac",
        round(col("novel_grams").cast("double") / col("seen_grams"), 6))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic over a BUCKETED value:
    * D = max_b |F_A(b) − F_B(b)| between the rows where `inA` holds and the
    * rest, evaluated at every occupied bucket. The distribution-shift gate
    * PSI can't provide: KS is threshold-free and sensitive to the worst
    * single point of divergence rather than a binned average, so it's the
    * second opinion a corpus-refresh pipeline runs next to PSI before
    * swapping in a new crawl.
    *
    * Exactness: both ECDFs are exact integer cumulative counts; each
    * per-bucket D term is ONE double expression over four integers
    * (identical left-to-right on any engine), and max is order-independent,
    * so the statistic — and the argmax bucket, tie-broken to the smallest —
    * replays bit-for-bit.
    *
    * Scale shape: one corpus scan into a per-bucket census (map-side
    * partials; census size is DOMAIN-bounded by the bucketing, not
    * data-bounded), then cumulative counts via a banded census self-join
    * (b2 ≤ b1 — O(census²) on dozens-to-hundreds of rows, and crucially NO
    * partition-less window: nothing in the plan funnels corpus-scale data
    * to one task). Two tiny aggregates finish. Returns one row
    * (`n_a`, `n_b`, `ks_d`, `ks_at`).
    */
  def ksDrift(df: DataFrame, bucket: Column, inA: Column): DataFrame = {
    val census = df
      .select(bucket.cast("long").as("b"), inA.cast("boolean").as("__a"))
      // a NULL bucket would enter the totals but silently drop out of the
      // banded cumulative (NULL compares UNKNOWN) — out of scope entirely
      .filter(col("b").isNotNull)
      .groupBy(col("b"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("cb"))
    val cum = census.select(col("b"), col("ca"), col("cb"))
      .join(census.select(col("b").as("b2"), col("ca").as("ca2"),
        col("cb").as("cb2")), col("b2") <= col("b"))
      .groupBy(col("b"))
      .agg(sum(col("ca2")).as("cum_a"), sum(col("cb2")).as("cum_b"))
    val totals = census.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val terms = cum.crossJoin(totals)
      .select(col("b"), col("n_a"), col("n_b"),
        abs(col("cum_a").cast("double") / col("n_a").cast("double") -
          col("cum_b").cast("double") / col("n_b").cast("double")).as("d"))
    val dmax = terms.agg(max(col("d")).as("ks_d"))
    terms.crossJoin(dmax)
      .filter(col("d") === col("ks_d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(round(max(col("ks_d")), 6).as("ks_d"), min(col("b")).as("ks_at"))
  }

  /** Deterministic Poisson bootstrap confidence interval for a mean
    * (Poisson bootstrap: Chamandy et al., "Estimating Uncertainty for
    * Massive Data Streams", Google 2012 — resample weights are iid
    * Poisson(1), so no resample needs the corpus size up front and the
    * whole procedure is one scan): each of `b` resamples weighs every row
    * by an inverse-CDF Poisson(1) draw from a CONTENT hash of
    * (salt, resample, id) — no RNG state, so the interval is a pure
    * function of the data and replays on any engine.
    *
    * Exactness: per-resample Σw and Σw·x are exact BIGINT sums (weights
    * ≤ 8 — the CDF tail beyond 8 is 1.1e-6 and is folded into w = 8);
    * each resample mean is ONE double division; the CI bounds are order
    * statistics selected by exact rank (ties broken by resample index)
    * over the `b`-row census — a band self-join, no window.
    *
    * Scale shape: the weight explode is a scan-side generator (b rows per
    * input row, map-side partial aggregation → only `b × partitions`
    * partial rows shuffle); everything after the first aggregate is
    * census-sized. Returns one row: (`b_resamples`, `mean`, `ci_lo`,
    * `ci_hi`) at the 2.5/97.5 percentile ranks.
    */
  def poissonBootstrapCI(df: DataFrame, idCol: Column, x: Column, b: Int,
                         salt: String = "boot#"): DataFrame = {
    require(b >= 40 && b <= 10000, s"b must be in [40, 10000]: $b")
    val cum = PoissonCdfPpm
    val loIdx = math.floor(0.025 * b).toInt
    val hiIdx = math.min(b - 1, math.ceil(0.975 * b).toInt - 1)
    // a NULL id would hash to NULL and fall through the weight CASE to the
    // default arm (w = 8) — rows without an identity are out of scope
    val base = df.select(idCol.cast("string").as("__id"), x.cast("long").as("__x"))
      .filter(col("__id").isNotNull)
    val rep = base.select(col("__id"), col("__x"),
      explode(sequence(lit(0), lit(b - 1))).as("b"))
    val u = pmod(graft.functions.TextFunctions.fnv1a64(
      concat(lit(salt), col("b").cast("string"), lit("#"), col("__id"))),
      lit(1000000L))
    val w = cum.zipWithIndex.reverse.foldLeft(lit(8L)) { case (acc, (t, i)) =>
      when(u < t, lit(i.toLong)).otherwise(acc)
    }
    val means = rep.select(col("b"), w.as("w"), col("__x"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("__x")).as("swx"))
      .select(col("b"), when(col("sw") > 0L,
        col("swx").cast("double") / col("sw").cast("double"))
        .otherwise(lit(0.0)).as("m"))
    val ranked = means
      .join(means.select(col("m").as("m2"), col("b").as("b2")),
        col("m2") < col("m") || (col("m2") === col("m") && col("b2") < col("b")),
        "left")
      .groupBy(col("b"), col("m")).agg(count(col("b2")).as("rk"))
    val full = base.agg(sum(col("__x")).as("sx"), count(lit(1)).as("n"))
    ranked.agg(
        max(when(col("rk") === loIdx.toLong, col("m"))).as("__lo"),
        max(when(col("rk") === hiIdx.toLong, col("m"))).as("__hi"))
      .crossJoin(full)
      .select(lit(b.toLong).as("b_resamples"),
        round(col("sx").cast("double") / col("n").cast("double"), 6).as("mean"),
        round(col("__lo"), 6).as("ci_lo"), round(col("__hi"), 6).as("ci_hi"))
  }

  /** Neyman allocation (Neyman 1934) of a sampling budget across strata:
    * `n_h ∝ N_h·σ_h` — the variance-optimal design for estimating a mean
    * under stratified sampling, which is how an eval-set or QA-sample
    * budget SHOULD be split across languages/sources (proportional
    * allocation oversamples homogeneous strata; equal allocation wastes
    * budget on tiny ones). Integer seats are assigned by the
    * largest-remainder (Hamilton) method, so the allocations sum to
    * exactly `sampleSize`.
    *
    * Exactness: per-stratum moments are exact BIGINT sums; σ_h is one
    * left-to-right double expression over them; the weight is then
    * FIXED-POINT ppm (`floor(N_h·σ_h·10⁶)` — identical double → identical
    * integer on any engine) so every subsequent step (base = S·w div W,
    * remainder ranks, +1 seats) is pure integer arithmetic — a
    * cross-stratum double SUM would be order-dependent and could never
    * hash-replay. Remainder ties break to the smaller stratum name.
    *
    * Scale shape: one corpus scan into the |strata| census (map-side
    * partials), then census-sized joins only. Returns one row per stratum:
    * (`stratum`, `n_h`, `sigma`, `w_ppm`, `alloc`).
    */
  def neymanAllocation(df: DataFrame, stratumCol: String, x: Column,
                       sampleSize: Long): DataFrame = {
    require(sampleSize > 0, s"sampleSize must be positive: $sampleSize")
    val census = df
      .select(col(stratumCol).as("stratum"), x.cast("long").as("__x"))
      // a null x would leave the count in n_h but vanish from the moment
      // sums — an inconsistent sigma; rows without a measurement are out
      .filter(col("__x").isNotNull)
      .groupBy(col("stratum"))
      // moment sums in DECIMAL(38,0): the per-row square fits a long, the
      // cross-corpus SUM does not at 10¹¹ rows — decimal sums stay exact
      .agg(count(lit(1)).as("n_h"),
        sum(col("__x").cast("decimal(20,0)")).as("s_x"),
        sum((col("__x") * col("__x")).cast("decimal(20,0)")).as("q_x"))
    val d = (c: Column) => c.cast("double")
    val sigma = when(col("n_h") > 1L,
      sqrt((d(col("n_h")) * d(col("q_x")) - d(col("s_x")) * d(col("s_x"))) /
        (d(col("n_h")) * (d(col("n_h")) - lit(1.0))))).otherwise(lit(0.0))
    val weighted = census.select(col("stratum"), col("n_h"),
      round(sigma, 6).as("sigma"),
      floor(d(col("n_h")) * sigma * lit(1000000.0)).cast("long").as("w_ppm"))
    val tot = weighted.agg(sum(col("w_ppm")).as("w_tot"))
    val based = weighted.crossJoin(tot)
      .select(col("stratum"), col("n_h"), col("sigma"), col("w_ppm"),
        when(col("w_tot") > 0L,
          expr(s"CAST($sampleSize AS BIGINT) * w_ppm div w_tot")).otherwise(0L).as("base"),
        when(col("w_tot") > 0L,
          expr(s"CAST($sampleSize AS BIGINT) * w_ppm % w_tot")).otherwise(0L).as("rem"))
    val leftover = based.agg((lit(sampleSize) - sum(col("base"))).as("r"))
    // remainder rank via the census self-join (strictly-greater count):
    // |strata|² comparisons on a domain-bounded census, no window
    val ranked = based
      .join(based.select(col("rem").as("rem2"), col("stratum").as("st2")),
        col("rem2") > col("rem") ||
          (col("rem2") === col("rem") && col("st2") < col("stratum")), "left")
      .groupBy(col("stratum"), col("n_h"), col("sigma"), col("w_ppm"),
        col("base"), col("rem"))
      .agg(count(col("st2")).as("n_better"))
    ranked.crossJoin(leftover)
      .select(col("stratum"), col("n_h"), col("sigma"), col("w_ppm"),
        (col("base") + when(col("n_better") < col("r"), 1L).otherwise(0L)).as("alloc"))
  }

  /** KMV / bottom-k distinct sketch (Bar-Yossef et al., RANDOM 2002): per
    * key, the k smallest DISTINCT FNV-1a hashes of the value; the k-th
    * minimum h_k estimates cardinality as (k−1)/u_k with u_k = h_k mapped
    * to (0, 1). Unlike the HLL tier ([[hllRollup]] — opaque DataSketches
    * registers whose estimate is error-contract-gated), a KMV summary is a
    * plain sorted hash list: engine-replayable bit-for-bit (the oracle
    * recomputes it in SQL), mergeable by sorted-union-truncate (the
    * streaming face [[graft.streaming.StatefulOps.streamingKmvDistinct]]
    * merges exactly so, with exact live == batch parity), and it degrades
    * to EXACT counting below k distinct values.
    *
    * Scale shape: one (key, hash) pre-dedup shuffle — 8-byte hashes on the
    * wire, never values — then the bounded top-k aggregate
    * ([[topPerKeyAgg]]: ≤ k rows per (mapper, key) reach the final
    * shuffle). Summary is O(k) per key. Only the final estimate is a
    * double, as ONE left-to-right expression over (k, h_k) — identical on
    * any engine. Returns (`key`, `kmv_k`, `h_k`, `est_distinct`).
    */
  def kmvDistinct(df: DataFrame, keyCol: String, value: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536]: $k")
    // a NULL value hashes to NULL, which would sort FIRST into the bottom-k
    // and poison h_k — drop it here, which is also what the streaming
    // face's null-skip mirrors
    val h = df.select(col(keyCol),
      graft.functions.TextFunctions.fnv1a64(value.cast("string")).as("h"))
      .filter(col("h").isNotNull).distinct()
    topPerKeyAgg(h, keyCol, Seq(col("h")), Seq("h" -> col("h")), k)
      .groupBy(col(keyCol))
      .agg(max(col("rn")).cast("long").as("kmv_k"),
        max_by(col("h"), col("rn")).as("h_k"))
      .select(col(keyCol), col("kmv_k"), col("h_k"),
        when(col("kmv_k") < k, col("kmv_k").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) /
            ((col("h_k").cast("double") + lit(math.pow(2, 63))) / lit(math.pow(2, 64))),
            6)).as("est_distinct"))
  }

  /** Two-sample Mann–Whitney U over a BUCKETED value: the rank-sum test
    * between the rows where `inA` holds and the rest — the nonparametric
    * location test next to [[ksDrift]]'s shape test (KS asks "did the
    * distribution change anywhere", MWU asks "did one side shift up").
    * Ties (bucketing makes many) are handled exactly: midranks via the
    * standard 2× scaling and the tie-corrected variance term Σ(t³ − t).
    *
    * Exactness: everything up to z is BIGINT — doubled rank-sum
    * `2R_A = Σ_b ca·(2·cum − c + 1)` (an integer identity for midranks),
    * `u2 = 2R_A − n_a(n_a+1) = 2U_A`, and the tie term — all safe while
    * 2N² < 2⁶³ (N ≈ 2·10⁹; widen to DECIMAL(38,0) past that, one cast).
    * z is ONE left-to-right double expression over those integers.
    *
    * Scale shape: identical to [[ksDrift]] — one corpus scan into the
    * domain-bounded bucket census, cumulatives via the banded census
    * self-join (no partition-less window), two scalar aggregates. Returns
    * one row (`n_a`, `n_b`, `u2`, `tie_sum`, `z`).
    */
  def mannWhitney(df: DataFrame, bucket: Column, inA: Column): DataFrame = {
    val census = df
      .select(bucket.cast("long").as("b"), inA.cast("boolean").as("__a"))
      .filter(col("b").isNotNull) // same null-bucket rule as ksDrift
      .groupBy(col("b"))
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__a"), 0L).otherwise(1L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = census
      .join(census.select(col("b").as("b2"), col("c").as("c2")), col("b2") <= col("b"))
      .groupBy(col("b"), col("ca"), col("c"))
      .agg(sum(col("c2")).as("cum"))
    val parts = cum.agg(
      sum(col("ca")).as("n_a"),
      sum(col("c") - col("ca")).as("n_b"),
      sum(col("ca") * (col("cum") * 2L - col("c") + 1L)).as("ranks2"),
      sum(col("c") * col("c") * col("c") - col("c")).as("tie_sum"))
    val nD = (col("n_a") + col("n_b")).cast("double")
    val den = sqrt(col("n_a").cast("double") * col("n_b").cast("double") / lit(12.0) *
      ((nD + lit(1.0)) - col("tie_sum").cast("double") / (nD * (nD - lit(1.0)))))
    parts.select(col("n_a"), col("n_b"),
      (col("ranks2") - col("n_a") * (col("n_a") + 1L)).as("u2"), col("tie_sum"),
      when(col("n_a") > 0L && col("n_b") > 0L && den > 0.0,
        round((col("ranks2") - col("n_a") * (col("n_a") + 1L) -
          col("n_a") * col("n_b")).cast("double") / (lit(2.0) * den), 6))
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** Pairwise set similarity from KMV summaries (Beyer et al., SIGMOD 2007
    * — "distinct-value synopses"): for every ordered pair of keys, the
    * Jaccard of their VALUE sets estimated from the two bottom-k
    * signatures — shared hashes within the bottom-k of the union over the
    * union signature size — next to the exact Jaccard for the audit. The
    * sketch answer needs only the 2·k-hash signatures (the 100 TB shape:
    * |keys|·k longs, not |keys| user sets); the estimator is deterministic
    * from the hash, so — unusual for a sketch — BOTH columns are
    * value-gated by the oracle.
    *
    * Scale shape: one (key, hash) pre-dedup shuffle into the bounded
    * bottom-k aggregate; everything pairwise happens on the |keys|²·k
    * signature census (per-pair windows are census-partitioned, ≤ 2k rows
    * each). The exact side is two hash joins over the distinct pair set.
    * Returns per pair: (`a`, `b`, `kmv_shared`, `kmv_union_k`,
    * `jacc_est`, `n_inter`, `n_union`, `jacc_exact`).
    */
  def kmvJaccard(df: DataFrame, keyCol: String, value: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 65536, s"k must be in [2, 65536]: $k")
    val h = df.select(col(keyCol).as("t"),
      graft.functions.TextFunctions.fnv1a64(value.cast("string")).as("h"))
      .filter(col("h").isNotNull).distinct() // NULL hashes would sort first
    val bottom = topPerKeyAgg(h, "t", Seq(col("h")), Seq("h" -> col("h")), k)
      .select(col("t"), col("h"))
    val types = h.select(col("t")).distinct()
    val tpairs = types.select(col("t").as("a"))
      .join(types.select(col("t").as("b")), col("a") < col("b"))
    val tagged = tpairs.join(bottom.withColumnRenamed("t", "a"), Seq("a"))
      .select(col("a"), col("b"), col("h"), lit(1L).as("ia"), lit(0L).as("ib"))
      .unionAll(tpairs.join(bottom.withColumnRenamed("t", "b"), Seq("b"))
        .select(col("a"), col("b"), col("h"), lit(0L).as("ia"), lit(1L).as("ib")))
      .groupBy(col("a"), col("b"), col("h"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
    val w = Window.partitionBy(col("a"), col("b")).orderBy(col("h"))
    val unionK = tagged.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
    val est = unionK.groupBy(col("a"), col("b"))
      .agg(sum(col("ia") * col("ib")).as("kmv_shared"),
        count(lit(1)).as("kmv_union_k"))
      .select(col("a"), col("b"), col("kmv_shared"), col("kmv_union_k"),
        round(col("kmv_shared").cast("double") / col("kmv_union_k").cast("double"), 6)
          .as("jacc_est"))
    val sets = df.select(col(keyCol).as("t"), value.cast("string").as("v"))
      .filter(col("v").isNotNull).distinct() // mirror the hash side's null drop
    val sizes = sets.groupBy(col("t")).agg(count(lit(1)).as("n"))
    val inter = sets.select(col("t").as("a"), col("v"))
      .join(sets.select(col("t").as("b"), col("v")), Seq("v"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_inter"))
    val exact = tpairs
      .join(sizes.select(col("t").as("a"), col("n").as("na")), Seq("a"))
      .join(sizes.select(col("t").as("b"), col("n").as("nb")), Seq("b"))
      .join(inter, Seq("a", "b"), "left")
      .select(col("a"), col("b"), coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        (col("na") + col("nb") - coalesce(col("n_inter"), lit(0L))).as("n_union"))
      .withColumn("jacc_exact",
        round(col("n_inter").cast("double") / col("n_union").cast("double"), 6))
    est.join(exact, Seq("a", "b"))
  }

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007): for every
    * quasi-identifier group, the Earth Mover's Distance between the group's
    * distribution of an ORDERED sensitive bucket and the global one —
    * the third leg of the k-anonymity / l-diversity / t-closeness release
    * gate. l-diversity can pass while every record in a group sits in the
    * top length bucket; EMD over the ordered domain catches exactly that.
    *
    * Exactness: EMD over an ordered discrete domain is
    * Σ_b |F_g(b) − F(b)| / (B − 1). Each CDF term is fixed-point ppm —
    * `cum·1000000 div n` (truncating integer division, exact on any
    * engine) — so the per-group sum is an exact BIGINT (≤ B·10⁶ always, no
    * overflow at any corpus size) and only the final normalization is a
    * single rounded double division.
    *
    * Scale shape: one corpus scan into a (group, bucket) census, densified
    * by a census×bucket-census cross join (both domain-bounded), cumulated
    * by a banded self-join on the bucket census (no partition-less window,
    * no corpus-scale data past the first aggregate). Returns one row per
    * group: the quasi columns, `n_g`, `emd_ppm`, `t_close`.
    */
  def tCloseness(df: DataFrame, quasiCols: Seq[String], bucket: Column): DataFrame = {
    require(quasiCols.nonEmpty, "tCloseness needs at least one quasi column")
    val census = df
      .select(quasiCols.map(col) :+ bucket.cast("long").as("b"): _*)
      .filter(col("b").isNotNull) // same null-bucket rule as ksDrift
      .groupBy(quasiCols.map(col) :+ col("b"): _*)
      .agg(count(lit(1)).as("c"))
    val buckets = census.groupBy(col("b")).agg(sum(col("c")).as("cg"))
    val groups = census.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("c")).as("n_g"))
    // densify: every group × every occupied bucket, zero-filled — the
    // banded cumulative below needs a value at every bucket index
    val grid = groups.crossJoin(buckets.select(col("b")))
      .join(census, quasiCols :+ "b", "left")
      .select(quasiCols.map(col) ++ Seq(col("b"), col("n_g"),
        coalesce(col("c"), lit(0L)).as("c")): _*)
    val cumG = grid
      .join(grid.select(quasiCols.map(c => col(c).as(s"__$c")) ++
        Seq(col("b").as("b2"), col("c").as("c2")): _*),
        quasiCols.map(c => col(c) === col(s"__$c")).reduce(_ && _) &&
          col("b2") <= col("b"))
      .groupBy(quasiCols.map(col) :+ col("b"): _*)
      .agg(max(col("n_g")).as("n_g"), sum(col("c2")).as("cum_g"))
    val cumAll = buckets
      .join(buckets.select(col("b").as("b2"), col("cg").as("cg2")),
        col("b2") <= col("b"))
      .groupBy(col("b")).agg(sum(col("cg2")).as("cum_all"))
    val nAll = buckets.agg(sum(col("cg")).as("n_all"))
    val nBuckets = buckets.agg(count(lit(1)).as("n_b"))
    cumG.join(cumAll, "b").crossJoin(nAll).crossJoin(nBuckets)
      .select(quasiCols.map(col) ++ Seq(col("n_g"), col("n_b"),
        abs(expr("cum_g * 1000000 div n_g") -
          expr("cum_all * 1000000 div n_all")).as("term")): _*)
      .groupBy(quasiCols.map(col) :+ col("n_b"): _*)
      .agg(max(col("n_g")).as("n_g"), sum(col("term")).as("emd_ppm"))
      .select(quasiCols.map(col) ++ Seq(col("n_g"), col("emd_ppm"),
        when(col("n_b") <= 1L, lit(0.0)).otherwise(
          round(col("emd_ppm").cast("double") /
            ((col("n_b") - 1L).cast("double") * 1000000.0), 6)).as("t_close")): _*)
  }
}
