package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan quality gates: the properties that decide whether a
  * query survives a 100× scale-up. These assert on the executed plan,
  * so a refactor that silently loses pushdown, pruning, a broadcast, or
  * adds a shuffle fails CI — not a 1000-executor run.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("predicate pushdown: filters reach the parquet scan (P8/SoQL parity)") {
    val p = plan(Queries.filters(spark, sfDir))
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("IsNotNull"), "null filter should push down")
    assert(p.contains("EqualTo(o_orderstatus,O)"), "equality should push down")
    assert(p.contains("GreaterThanOrEqual(o_totalprice,200000.0)"), "range should push down")
  }

  test("windowed ingest pushes the date-range predicate into the scan") {
    val p = plan(Queries.windowedIngest(spark, sfDir))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThanOrEqual(o_orderdate"), p.linesIterator.filter(_.contains("Pushed")).mkString("\n"))
  }

  test("column pruning: projection reaches ReadSchema") {
    val p = plan(Queries.projectRename(spark, sfDir))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("c_custkey") && readSchema.contains("c_acctbal"))
    assert(!readSchema.contains("c_name"), s"dropped column must not be read: $readSchema")
    assert(!readSchema.contains("c_nationkey"), s"unused column must not be read: $readSchema")
  }

  test("small dimension join is broadcast, not shuffled") {
    val p = plan(Queries.joinInner(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("dedup is one window, zero joins (vs the reference's sort+groupmax+join)") {
    val p = plan(Queries.dedup(spark, sfDir))
    assert(p.contains("Window"))
    assert(!p.contains("Join"), "dedup must not join")
  }

  test("dim agg runs as two-phase hash aggregate (map-side partials)") {
    val p = plan(Queries.dimAgg(spark, sfDir))
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  /** Codegen explain shows subtrees only on the final (non-adaptive)
    * plan — toggle AQE off for the inspection.
    */
  private def codegenPlan(mk: => DataFrame): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try mk.queryExecution.explainString(ExplainMode.fromString("codegen"))
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("hot expressions stay inside whole-stage codegen") {
    Seq(
      codegenPlan(Queries.dimAgg(spark, sfDir)),
      codegenPlan(Queries.tokenCount(spark, sfDir)),
      // the round-6 micro-nat scoring paths are pure built-ins: the
      // floor(ln·1e6 + 0.5) fixed point must compile, not interpret
      codegenPlan(Queries.perplexityFilter(spark, sfDir)),
      codegenPlan(Queries.docTypicality(spark, sfDir)),
      // the literal-basis projection (21 VecDot terms) likewise
      codegenPlan(Queries.pcaProjection(spark, sfDir))
    ).foreach { p =>
      assert(!p.startsWith("Found 0 WholeStageCodegen"), "expected at least one codegen subtree")
    }
  }

  test("custom VecDot expression compiles into generated code (not fallback)") {
    val p = codegenPlan(Queries.annBruteForce(spark, sfDir))
    // VecDot's generated loop accesses numElements/getFloat; a fallback
    // would instead show an eval() call on the expression object
    assert(p.contains(".numElements()"), "VecDot loop should appear in generated code")
  }

  test("brute-force ANN broadcasts the QUERY SET and streams the corpus") {
    val p = Queries.annBruteForce(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    // the query relation (right side) is built/broadcast; the corpus streams
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    // pin the build side: the broadcast subtree must carry the query-set
    // filter (vec_id < 50); the corpus side has no such predicate
    val lines = p.linesIterator.toVector
    val b = lines.indexWhere(_.contains("BroadcastExchange"))
    assert(b >= 0, s"no BroadcastExchange in plan:\n$p")
    assert(lines.drop(b).exists(_.contains("< 50")), s"broadcast side must be the filtered query set:\n$p")
    assert(!lines.take(b).exists(_.contains("< 50")), s"query-set filter must not sit on the streamed side:\n$p")
  }

  test("ANN top-k is a bounded two-phase aggregate, not a window over all pairs") {
    val p = plan(Queries.annBruteForce(spark, sfDir))
    // partial + final ObjectHashAggregate: the shuffle carries at most k
    // candidates per (query, partition), never the full scored pair set
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final ObjectHashAggregate:\n$p")
    assert(!p.contains("Window"), "ranking must not shuffle all scored pairs through a window")
  }

  test("value counts: exactly one shuffle (group) plus the output sort") {
    val p = Queries.valueCounts(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    val exchanges = p.linesIterator.count(l => l.contains("- Exchange"))
    assert(exchanges <= 2, s"expected <=2 exchanges (agg shuffle + sort), got $exchanges:\n$p")
  }

  test("df-cap Jaccard filters via broadcast anti-join on the stop list") {
    val p = plan(Queries.ngramJaccardFiltered(spark, sfDir))
    assert(p.contains("LeftAnti"), s"expected an anti-join for the stop-shingle filter:\n$p")
    assert(
      p.linesIterator.exists(l => l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      "stop list must broadcast; the shingle table must not shuffle for the filter step"
    )
  }

  test("LSH near-dup candidates come from a keyed join, not an all-pairs scan") {
    val p = plan(Queries.embedNearDupLsh(spark, sfDir))
    assert(!p.contains("CartesianProduct"), "candidate generation must never cross-product the corpus")
    assert(!p.contains("BroadcastNestedLoopJoin"), "candidate generation must be a keyed equi-join")
  }

  test("bucketed fuzzy matching joins on the band key — no all-pairs theta join") {
    val df = Queries.fuzzyPairsBucketed(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"candidate generation must not cross-product:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"candidate generation must be a keyed equi-join:\n$p")
    // and it computes exactly the all-pairs answer
    val brute = Queries.fuzzyPairs(spark, sfDir)
    assert(df.collect().toSeq === brute.collect().toSeq)
  }

  test("range join keys on the equality column — never a nested-loop over the interval") {
    val p = plan(Queries.rangeJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"interval predicate must ride the keyed join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"equality must be the join key:\n$p")
  }

  test("unkeyed interval join manufactures a bin key — no nested loop, no cross product") {
    val p = plan(Queries.intervalJoin(spark, sfDir))
    assert(!p.contains("CartesianProduct"), s"binning must give the planner an equi key:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"binning must give the planner an equi key:\n$p")
  }

  test("anti join broadcasts the filtered build side") {
    val p = plan(Queries.antiJoin(spark, sfDir))
    assert(
      p.linesIterator.exists(l => l.contains("Join") && l.contains("LeftAnti")),
      s"expected LeftAnti join:\n$p"
    )
  }

  test("exact ntile (q67) has no single-partition window — every window is keyed") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.ntileQuartiles(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty, "expected the within-bin rank window")
    windows.foreach(w =>
      assert(w.partitionSpec.nonEmpty, s"unpartitioned window = entire table through ONE task at scale:\n${df.queryExecution.optimizedPlan}")
    )
  }

  test("exact ntile matches the built-in window ntile bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val cust = spark.read.parquet(s"$sfDir/customer.parquet").select(org.apache.spark.sql.functions.col("c_custkey"), org.apache.spark.sql.functions.col("c_acctbal"))
    val viaWindow = cust
      .select(
        org.apache.spark.sql.functions.col("c_custkey"),
        org.apache.spark.sql.functions.ntile(4).over(Window.orderBy("c_acctbal", "c_custkey")).as("q")
      )
    val viaBins = graft.operators.Ntile
      .exact(cust, org.apache.spark.sql.functions.col("c_acctbal"), org.apache.spark.sql.functions.col("c_custkey"), k = 4, binWidth = 100.0, bucketCol = "q")
      .select("c_custkey", "q")
    assert(viaBins.except(viaWindow).isEmpty && viaWindow.except(viaBins).isEmpty)
  }

  test("warehouse composites (q157/q158): top-k is TakeOrdered, enums broadcast, filters pushed") {
    val p3 = plan(Queries.shippingPriority(spark, sfDir))
    assert(p3.contains("TakeOrderedAndProject"), "top-10 must not global-sort")
    assert(p3.contains("PushedFilters") && p3.contains("GreaterThan(l_shipdate"), "date filter must reach the lineitem scan")
    val p5 = plan(Queries.regionalRevenue(spark, sfDir))
    assert(p5.contains("BroadcastHashJoin"), "nation/region must broadcast")
    assert(!p5.contains("CartesianProduct"), "co-nation constraint must ride the equi-join")
  }

  test("ewma (q159): all six lag taps share ONE keyed window") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.ewma(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.length === 1, s"lag taps must fuse into one WindowExec, found ${windows.length}")
    assert(windows.head.partitionSpec.nonEmpty, "the EWMA window must be keyed by user")
  }

  test("triangle census (q161): the graph joins are equi-joins; no cartesian product") {
    val p = plan(Queries.triangleCensus(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    // both orient lookups, the wedge join, and the closing-edge probe
    // must plan as hash/merge equi-joins — the only tolerated nested
    // loop is the final 1-row × 1-row scalar attach (n_edges × census)
    val equiJoins = Seq("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
      .map(k => k.r.findAllIn(p).length)
      .sum
    assert(equiJoins >= 4, p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("path signatures (q164): heavy-hitter ranking is TakeOrdered, not a global sort") {
    val p = plan(Queries.pathSignatures(spark, sfDir))
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.filter(l => l.contains("Sort") || l.contains("TakeOrdered")).mkString("\n"))
  }

  test("pareto frontier (q173): the global window runs AFTER the per-day reduction") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.paretoFrontier(spark, sfDir)
    val plan0 = df.queryExecution.optimizedPlan
    val windows = plan0.collect { case w: logical.Window => w }
    assert(windows.length === 1)
    // the window's subtree must contain the date-keyed Aggregate — the
    // reduction that bounds the single-partition input to #dates rows
    val aggBelow = windows.head.child.collect { case a: logical.Aggregate => a }
    assert(aggBelow.nonEmpty, s"skyline window must consume per-day maxima, not raw orders:\n$plan0")
  }

  test("rollup is one scan + one shuffle (grouping-set expansion, not a union of scans)") {
    val p = Queries.rollupAgg(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, s"rollup must not rescan per grouping level:\n$p")
    assert(p.contains("Expand"), "grouping sets should expand map-side")
  }

  test("grouping sets (q97) expand from one scan like rollup/cube") {
    val p = Queries.groupingSetsAgg(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Scan parquet".r.findAllIn(p).size === 1, s"grouping sets must not rescan per set:\n$p")
    assert(p.contains("Expand"), "grouping sets should expand map-side")
  }

  test("batch sessionize (q90): break flags, session ids and the rollup share ONE user_id exchange") {
    val p = Queries.sessionizeBatch(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    val hashExchanges = p.linesIterator.count(l => l.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected the two window passes + groupBy to reuse one user_id shuffle, got $hashExchanges:\n$p")
  }

  test("SCD2 (q91): all three window passes are keyed by the dimension key") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.scd2History(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned window in SCD2 build"))
  }

  test("per-domain cap (q95): every rank window is keyed — no global sort of the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.groupCap(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.size >= 2, "expected the shard-local and the per-language rank windows")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty, "unpartitioned rank window defeats the two-level cap"))
  }

  test("vocab prune (q108): the corpus explodes exactly once (df from a window, not a second explode)") {
    val p = Queries.vocabPrune(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("Generate explode".r.findAllIn(p).size === 1, s"expected one explode of the token stream:\n$p")
  }

  test("fact-fact join (q109) is sort-merge, not broadcast — neither side fits memory at scale") {
    val p = plan(Queries.factJoin(spark, sfDir))
    assert(p.contains("SortMergeJoin"), s"expected SortMergeJoin pinned by the hint:\n$p")
    assert(!p.contains("BroadcastHashJoin"), "a broadcast here hides the 100 TB shape")
  }

  test("histogram (q96): bin assignment is map-side — the exchange carries only partial aggregates") {
    val p = Queries.histogram(spark, sfDir).queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial+final HashAggregate:\n$p")
  }

  test("join hint (q128): SHUFFLE_HASH is honored — hash join without a broadcast or sort") {
    val p = plan(Queries.joinHintShuffleHash(spark, sfDir))
    assert(p.contains("ShuffledHashJoin"), s"expected ShuffledHashJoin pinned by the hint:\n$p")
    assert(!p.contains("SortMergeJoin"), "hint lost: fell back to sort-merge")
  }

  test("correlated EXISTS (q129) decorrelates to joins — no per-row subquery execution") {
    val p = plan(Queries.existsSubquery(spark, sfDir))
    assert(!p.toLowerCase.contains("subquery"), s"subquery survived decorrelation:\n$p")
    assert(p.contains("Join"), "expected the decorrelated aggregate+join shape")
  }

  test("null-safe join (q131) is a hash/merge equi-join, not a nested loop") {
    val p = plan(Queries.nullSafeJoin(spark, sfDir))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), s"null-safe key fell out of the join keys:\n$p")
  }

  test("funnel (q151): the three chained step windows share one user_id exchange") {
    val p = Queries.funnel(spark, sfDir).queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size === 1, s"funnel must not re-shuffle per step:\n$p")
  }

  test("sliding distinct (q177): bitmap replication keeps the plan pure equi — no nested loop") {
    val p = plan(Queries.slidingBitmapDistinct(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the 7-day window must come from explode+equi-join, not a range join:\n$p")
  }

  test("prefix join (q178): every window is doc-keyed; candidates via equi-join only") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.setsimPrefixJoin(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "prefix ranking must never run a global window")
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("concurrency sweep (q180): the global running sum consumes the per-day reduction") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.openOrderConcurrency(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.length === 1)
    val aggBelow = windows.head.child.collect { case a: logical.Aggregate => a }
    assert(aggBelow.nonEmpty, s"sweep-line window must see day deltas, not raw orders:\n${df.queryExecution.optimizedPlan}")
  }

  test("DPP (q182): the fact scan carries a runtime partition-pruning filter") {
    // useStats=false: tiny local stats would talk the planner out of a
    // pruning subquery that pays for itself at any real scale
    val prev = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val p = Queries.dppPrune(spark, sfDir).queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("dynamicpruning"), s"no runtime partition filter on the fact scan:\n$p")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
      case None => spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }

  test("PQ ANN (q190): ADC scan is codes ⋈ broadcast(LUT) on the (sub, cell) equi-key") {
    val p = plan(Queries.annPq(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ADC scoring must ride the (sub, cell) equi-key, never a cross product:\n$p")
    // the LUT side (queries × m × ksub rows — dimension-sized) must
    // broadcast; the compressed corpus codes must stream, never shuffle
    // their raw embeddings to the scoring join. executedPlan.toString
    // inlines the join keys on the operator line.
    val ep = Queries.annPq(spark, sfDir).queryExecution.executedPlan.toString
    assert(
      ep.linesIterator.exists(l => l.contains("BroadcastHashJoin") && l.contains("sub") && l.contains("cell")),
      s"LUT must broadcast-hash-join the code stream on (sub, cell):\n$ep"
    )
  }

  test("IVF-PQ ANN (q193): coarse pruning and ADC scoring are equi-joins only; LUT broadcasts") {
    val df = Queries.annIvfPq(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate pruning and ADC must never cross-product:\n$p")
    val ep = df.queryExecution.executedPlan.toString
    assert(
      ep.linesIterator.exists(l => l.contains("BroadcastHashJoin") && l.contains("sub") && l.contains("cell")),
      s"the dimension-sized LUT must broadcast into the ADC join:\n$ep"
    )
    assert(
      ep.linesIterator.exists(l => l.contains("Join") && l.contains("ccell")),
      s"candidates must come from the coarse-cell equi-join:\n$ep"
    )
  }

  test("winnowing (q195): doc-keyed selection window; pairs via df-capped equi-join only") {
    import org.apache.spark.sql.catalyst.plans.logical
    import org.apache.spark.sql.functions.col
    // the selection pass (now materialized once per dataset via the
    // CandidateGraph snapshot) must be per-document windows, never a
    // global sort — asserted on the producing plan
    val sel = graft.operators.NearDup
      .winnowedFingerprints(graft.sources.Tables.parquet(spark, sfDir, "documents"), col("doc_id"), col("text"))
    val windows = sel.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "fingerprint selection must be per-document, never a global window")
    // the consumer (q195) joins the snapshot on the print key only
    val p = plan(Queries.winnowedOverlapPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"copy candidates must come from the fingerprint equi-join:\n$p")
  }

  test("curation funnel (q196): digest keeper is a keyed window; confirm stage is equi-joins only") {
    import org.apache.spark.sql.catalyst.plans.logical
    val df = Queries.curationFunnel(spark, sfDir)
    val windows = df.queryExecution.optimizedPlan.collect { case w: logical.Window => w }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the exact-dedup keeper must window per digest, never globally")
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), s"no all-pairs anywhere in the funnel:\n$p")
  }

  test("semantic dedup (q197): the cosine pair join is keyed on the cell — no cross product") {
    val p = plan(Queries.semanticDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"within-cell pairs must come from the cell equi-join:\n$p")
  }

  test("bm25 (q198): term stats broadcast onto the postings; top-k is TakeOrdered, not a global sort") {
    val p = plan(Queries.bm25TopK(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"df/corpus stats must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-10 must not materialize a global sort:\n$p")
  }

  test("hard negatives (q199): the query side broadcasts; the corpus streams once") {
    val p = plan(Queries.hardNegatives(spark, sfDir))
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"queries must broadcast onto the streaming corpus:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "TopK partials must combine map-side before the final per-query merge")
  }

  test("mmr (q200): pool pair-sims and pick joins are equi-keyed — no cartesian rerank") {
    val p = plan(Queries.mmrDiversify(spark, sfDir))
    assert(!p.contains("CartesianProduct"),
      s"the rerank must stay keyed on qid / pool ids:\n$p")
  }

  test("corpus report (q201): one two-phase aggregation, zero joins") {
    val p = plan(Queries.corpusReport(spark, sfDir))
    assert(!p.contains("Join"), s"the report is a single keyed pass:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("incremental dedup (q202): probe and confirm are equi-joins only — the index is never crossed") {
    val p = plan(Queries.incrementalDedup(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"the new batch must probe the band index by key:\n$p")
  }

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // isolated session: aggressive thresholds so the 16k-row hot key
    // trips the same OptimizeSkewedJoin rule that saves a 100 TB join
    import org.apache.spark.sql.functions._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val left = s2
      .range(0, 20000)
      // pad must be DATA-DEPENDENT or constant folding strips it from the
      // shuffle and the hot partition carries no bytes
      .select(when(col("id") < 16000, 0L).otherwise(col("id")).as("k"), repeat(sha2(col("id").cast("string"), 256), 2).as("pad"))
    val right = s2.range(0, 20000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val j = left.join(right, "k").agg(sum(length(col("pad"))).as("bytes"), sum(col("v")).as("sv"))
    j.collect()
    val p = j.queryExecution.executedPlan.toString
    assert(p.contains("skew=true"), s"OptimizeSkewedJoin did not fire:\n$p")
  }

  test("sorted neighborhood (q214): candidate joins are equi-keyed — no product anywhere") {
    val p = plan(Queries.sortedNeighborPairs(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"neighbor probes must join on (nation, rank+d):\n$p")
  }

  test("lateral top-k (q224): the correlated LIMIT decorrelates into a rank window — no per-row subquery") {
    val p = plan(Queries.lateralTopK(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LATERAL must decorrelate:\n$p")
    assert(p.contains("Window"), s"expected the rank-window rewrite of the correlated LIMIT:\n$p")
  }

  test("embedding covariance (q222): one two-phase aggregation, constant fan-out, zero joins") {
    val p = plan(Queries.embeddingCovariance(spark, sfDir))
    assert(!p.contains("Join"), s"covariance is a single keyed pass:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final HashAggregate")
  }

  test("aggregate pushdown (q230): count/min/max answered from parquet footer statistics") {
    val p = plan(Queries.aggregatePushdown(spark, sfDir))
    assert(p.contains("PushedAggregation"), s"expected footer-stats aggregation pushdown:\n$p")
    assert(
      p.contains("COUNT(*)") && p.contains("MIN(o_orderkey)"),
      s"all five aggregates should push down:\n$p"
    )
  }

  test("erasure audit (q220): the delete cohort broadcasts onto every surface") {
    val p = plan(Queries.erasureAudit(spark, sfDir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"the request-sized cohort must broadcast:\n$p")
  }

  test("perplexity filter (q237): LM tables broadcast — the corpus bigram stream is never sort-merge shuffled") {
    val p = plan(Queries.perplexityFilter(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"the vocab²-bounded score table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-keyed merge join anywhere:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    spark.catalog.clearCache() // the size gate persists the score table
  }

  test("size-gated LM count join: broadcast below the gate, sort-merge pinned above it — both paths") {
    // the LM ladder (q237/q260/q274/q360) routes its n-gram TYPE
    // tables through this gate, and so does q414's SCD2 close join
    // (a commit's change batch is unbounded in production — the one
    // lakehouse join that previously forced a broadcast); the
    // per-query tests above pin the below-gate (broadcast) shape on
    // the real corpus, this one pins BOTH shapes on one fixture so
    // the above-gate path cannot rot
    val counts = spark
      .range(0, 200)
      .selectExpr("CAST(id AS STRING) AS lft", "CAST(id + 1 AS STRING) AS rgt", "id AS c")
    val stream = spark
      .range(0, 1000)
      .selectExpr("id AS doc_id", "CAST(id % 200 AS STRING) AS lft", "CAST(id % 200 + 1 AS STRING) AS rgt")
    val below = graft.operators.SizeGate
      .countsJoin(stream, counts, Seq("lft", "rgt"), "left", maxBroadcastRows = 1L << 20)
    val pb = plan(below)
    assert(pb.contains("BroadcastHashJoin"), s"below the gate the model table must broadcast:\n$pb")
    assert(!pb.contains("SortMergeJoin"), s"below the gate nothing shuffles the stream:\n$pb")
    val above = graft.operators.SizeGate
      .countsJoin(stream, counts, Seq("lft", "rgt"), "left", maxBroadcastRows = 0L)
    val pa = plan(above)
    assert(pa.contains("SortMergeJoin"), s"above the gate the join must pin sort-merge (no replicated model):\n$pa")
    assert(!pa.contains("BroadcastHashJoin"), s"above the gate the type table must NOT broadcast:\n$pa")
    // same rows either way: the gate changes the physical strategy only
    val a = below.orderBy("doc_id").collect().map(_.toSeq)
    val b = above.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    spark.catalog.clearCache()
  }

  test("size-gated join handle: release() drops the persisted count table (the library caller's contract)") {
    val counts = spark
      .range(0, 50)
      .selectExpr("CAST(id AS STRING) AS lft", "CAST(id + 1 AS STRING) AS rgt", "id AS c")
    val stream = spark
      .range(0, 100)
      .selectExpr("id AS doc_id", "CAST(id % 50 AS STRING) AS lft", "CAST(id % 50 + 1 AS STRING) AS rgt")
    val gated = graft.operators.SizeGate.countsJoinGated(stream, counts, Seq("lft", "rgt"), "left")
    assert(gated.broadcastChosen)
    // the gate's count() materialized the persist
    assert(gated.table.storageLevel.useMemory, "the gate must persist the table it counted")
    gated.joined.count() // the consumer materializes…
    gated.release() // …then the caller releases the handle
    assert(gated.table.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "release() must unpersist the count table")
  }

  test("bpe encode (q238): the encoded vocabulary broadcasts onto the token stream") {
    val p = plan(Queries.bpeEncode(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"the |V|-row encoded vocab must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"tokens join the vocab by broadcast only:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pca projection (q239): the corpus pass is a literal-basis projection — no join, no aggregate") {
    val p = plan(Queries.pcaProjection(spark, sfDir))
    assert(!p.contains("Join"), s"the basis is broadcast as literals, never joined:\n$p")
    assert(!p.contains("HashAggregate"), s"the projection pass aggregates nothing:\n$p")
  }

  test("quantile sketch (q247): the probe joins the sketch, never the fact — no corpus-scale product") {
    val p = plan(Queries.quantileSketch(spark, sfDir))
    // the only non-equi join is the 6-row quantile probe against the
    // sketch-cardinality cumulative histogram — a bounded nested loop;
    // nothing may cartesian over the fact table
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"probe and exact-rank joins must broadcast their bounded sides:\n$p")
  }

  test("skew report (q250): pure keyed aggregation — no join anywhere") {
    val p = plan(Queries.skewReport(spark, sfDir))
    assert(!p.contains("Join"), s"the report is counts + a keyed window + a rollup:\n$p")
  }

  test("doc typicality (q257): the corpus count table broadcasts onto the per-doc counts") {
    val p = plan(Queries.docTypicality(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"the vocab-bounded corpus table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-keyed merge join:\n$p")
  }

  test("parameterized sql (q254): bound parameters fold to literals and push to the scan") {
    val p = plan(Queries.parameterizedSql(spark, sfDir))
    assert(p.contains("PushedFilters:"), p)
    assert(
      p.contains("GreaterThanOrEqual(o_totalprice,150000.0)"),
      s"the bound numeric parameter must reach the parquet scan:\n${p.linesIterator.filter(_.contains("Pushed")).mkString("\n")}"
    )
    assert(
      p.contains("LessThan(o_orderdate,"),
      s"the bound date parameter must reach the parquet scan:\n${p.linesIterator.filter(_.contains("Pushed")).mkString("\n")}"
    )
  }

  test("classifier gains (q262): the corpus rank window is bin-partitioned; unpartitioned windows only consume the decile aggregate") {
    val df = Queries.classifierGains(spark, sfDir)
    val ws = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(ws.exists(_.partitionSpec.nonEmpty), "expected the Ntile.exactRank bin-partitioned window")
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      val hasAgg = w.child.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.nonEmpty
      assert(hasAgg, s"an unpartitioned window may only run over the ≤10-row decile aggregate, never the corpus:\n$w")
    }
  }

  test("rfm segments (q267): every rank window is bin-partitioned — no single-partition sort at customer cardinality") {
    val ws = Queries.rfmSegments(spark, sfDir).queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(ws.nonEmpty, "expected three Ntile.exactRank windows")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty, s"unpartitioned window at customer cardinality:\n$w"))
  }

  test("weighted sample (q270): per-source top-k is the bounded aggregator — no window, winners broadcast back") {
    val p = plan(Queries.weightedSample(spark, sfDir))
    assert(!p.contains("Window"), s"the per-source top-5 must not sort a corpus/|S|-sized window partition:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"expected the k-bounded TopKAggregator partial/final pair:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"the |S|·k winner set must broadcast onto the scored frame:\n$p")
  }

  test("shard pack (q273): the running token total is bin-partitioned — no single-partition window over the epoch") {
    val ws = Queries.shardPack(spark, sfDir).queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(ws.nonEmpty, "expected the exactPrefixSum bin-partitioned running sum")
    ws.foreach(w => assert(w.partitionSpec.nonEmpty, s"unpartitioned window over the corpus order:\n$w"))
  }

  test("trigram perplexity (q274): every LM table broadcasts — the test trigram stream is never merge-joined") {
    val p = plan(Queries.trigramPerplexity(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), s"vocab-bounded LM tables must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no corpus-keyed merge join anywhere:\n$p")
  }

  test("nfc vocab fold (q271): all joins are keyed — no product; the corpus is scanned only for the vocabulary") {
    val p = plan(Queries.nfcVocabFold(spark, sfDir))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"form joins must stay equi-keyed (f = nfc(g)):\n$p")
  }

  test("manifest scan statistics: exact post-pruning rows/bytes drive AUTOMATIC broadcast — no hint, no SizeGate") {
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[graft.sources.ManifestCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.pstat_fact")
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.pstat_dim")
    spark.sql("CREATE TABLE graft_mfst.db.pstat_fact (k BIGINT, v BIGINT) TBLPROPERTIES ('cluster_key'='k')")
    // the dim deliberately has NO cluster key: rows/bytes must be
    // recorded for every file regardless (the always-record contract)
    spark.sql("CREATE TABLE graft_mfst.db.pstat_dim (k BIGINT, w BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.pstat_fact SELECT id, id * 3 FROM range(0, 50000)")
    spark.sql("INSERT INTO graft_mfst.db.pstat_dim SELECT id * 100, id + 7 FROM range(0, 64)")
    val q = "SELECT sum(f.v + d.w) AS s FROM graft_mfst.db.pstat_fact f JOIN graft_mfst.db.pstat_dim d ON f.k = d.k"
    val df = spark.sql(q)
    // the commit records' EXACT row counts reach the logical plan
    val scanStats = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.stats
    }
    assert(scanStats.exists(_.rowCount.contains(BigInt(64))), s"dim rowCount must be exact: ${scanStats.map(_.rowCount)}")
    assert(scanStats.exists(_.rowCount.contains(BigInt(50000))), s"fact rowCount must be exact: ${scanStats.map(_.rowCount)}")
    // …and the reported sizeInBytes alone picks the broadcast
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"a 64-row dim must broadcast with no hint:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    // the decision FLIPS when the dim exceeds the threshold — the
    // stats are genuinely driving it, not a default
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64")
    try {
      val p2 = plan(spark.sql(q))
      assert(!p2.contains("BroadcastHashJoin"), s"a dim above the threshold must not broadcast:\n$p2")
      assert(p2.contains("SortMergeJoin") || p2.contains("ShuffledHashJoin"), p2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // zone pruning SHRINKS the reported stats: a pruned fact scan
    // reports only the surviving files' rows
    spark.sql("INSERT INTO graft_mfst.db.pstat_fact SELECT /*+ COALESCE(1) */ id, id FROM range(100000, 101000)")
    val pruned = spark.sql("SELECT sum(v) AS s FROM graft_mfst.db.pstat_fact WHERE k >= 100000")
    val prunedStats = pruned.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r.stats
    }
    assert(prunedStats.exists(_.rowCount.contains(BigInt(1000))), s"post-pruning rows must be exact: ${prunedStats.map(_.rowCount)}")
  }

  test("bucketed join (q341): no exchange on the join key — the bucket layout carries the partitioning") {
    val p = plan(Queries.bucketedJoin(spark, sfDir))
    assert(p.contains("SortMergeJoin"), s"the merge hint must pin the sort-merge path (a broadcast would vanish at scale):\n$p")
    assert(!p.contains("Exchange hashpartitioning(k"), s"bucketed sides must join shuffle-free (only the priority rollup may shuffle):\n$p")
  }

  // The round-6 verdict's regression-killer: q262/q267/q270 each shipped
  // correct but with a corpus-cardinality unpartitioned rank window — the
  // plan shape that dies first at 100×. The per-query fixes above pin the
  // replacements; THIS sweep makes the class structurally impossible: every
  // registered query's optimized plan is walked, and an unpartitioned
  // logical Window is a failure unless the query is on the allowlist below,
  // where each entry names the bound that makes the single-partition sort
  // safe (vocab-/dimension-/bin-count-cardinality input, never the corpus).
  // The comparison is EXACT set equality, so an allowlist entry whose
  // window disappears goes stale loudly instead of rotting.
  test("registry sweep: no unpartitioned window over an unbounded frame in any registered query plan") {
    val allowlisted: Map[String, String] = Map(
      "q114_user_growth" -> "cumulative sum over the per-DAY first-seen aggregate — date-cardinality",
      "q173_pareto_frontier" -> "prefix max over the per-day max aggregate — date-cardinality (the documented q67-lesson posture)",
      "q180_open_order_concurrency" -> "sweep-line running sum over per-day deltas — date-cardinality (own plan test above)",
      "q198_bm25_topk" -> "rank assigned AFTER limit(10) — 10-row frame",
      "q229_range_layout" -> "lead() over the per-FILE min/max frame — file-count (4) cardinality",
      "q233_ks_drift" -> "CDF running sum over the distinct value support, post keyed histogram reduction",
      "q245_oov_report" -> "vocab truncation over the |V|-bounded aggregate — the documented standard move",
      "q247_quantile_sketch" -> "two rank passes over the occupied GRID BINS, post keyed reduction",
      "q262_classifier_gains" -> "cut lookup over the ≤10-row decile aggregate (own plan test asserts the bound)",
      "q284_greedy_decode" -> "seed rank over the 5-row frame, post TakeOrdered",
      "q292_retrieval_eval" -> "inherits q198's 10-row post-limit rank (the ranked list under eval)",
      "q295_conformal_interval" -> "prefix count over the residual-SUPPORT histogram (the q233 posture)",
      "q296_vocab_coverage" -> "vocab truncation over the |V|-bounded aggregate (the q245 pattern)",
      "q306_km_survival" -> "suffix/prefix sums over the WEEK-support frame (two windows, q233 posture)",
      "q314_isotonic_calibration" -> "≤50-bin prefix windows under the persisted bin frame — bin-count cardinality, seen through the cache recursion",
      "q320_seasonal_decompose" -> "date-cardinality RANGE windows under the persisted interior subtree (the q114 posture, behind a cache)",
      "q346_voptimal_histogram" -> "rank/prefix-sum over the ≤50-value p_size SUPPORT under the persisted DP frame — counted once per cache reference",
      "q349_kendall_tau" -> "rank windows over the 20-row post-TakeOrdered persisted frame (the q198 bound, behind a cache)",
      "q309_hybrid_rrf_fusion" -> "three post-limit ranks over ≤10-row frames (q198's + the tf list + the fused list)",
      "q311_budget_waterfill" -> "rank + prefix sum over the |S|-row per-source aggregate",
      "q326_ndcg" -> "inherits q198's 10-row post-limit rank (the q292 posture — the ranked list under eval)",
      "q340_lag_features" -> "lag/lead/RANGE frames over the per-DAY aggregate — date-cardinality (the q114/q180 posture)",
      "q351_auc_report" -> "prefix negatives over the distinct-SCORE support, post keyed histogram reduction (the q233 posture)",
      "q354_ucb_index" -> "cumulative trial total over the per-DAY aggregate — date-cardinality (the q114 posture); per-arm cumsums are keyed",
      "q361_histogram_join_advisor" -> "rank/prefix-sum over the ≤60-value o_totalprice/10k SUPPORT under the persisted DP frame (the q346 posture)",
      "q381_dp_quantile" -> "CDF prefix sum over the distinct token-count SUPPORT, post keyed histogram reduction (the q233 posture), seen through the persisted scored frame"
    )
    // persist() must not hide a window from this sweep: a cached
    // subtree shows up in the optimized plan as an InMemoryRelation
    // whose work lives in `cachedPlan` (a PHYSICAL plan), so the walk
    // recurses into it — WindowExec with an empty partitionSpec counts
    // exactly like a bare logical Window, and nested caches (an
    // InMemoryTableScanExec inside a cached plan) recurse further.
    // AQE wraps every cached plan in an AdaptiveSparkPlanExec LEAF —
    // a plain collect stops there, which was exactly the blind spot.
    // Unwrap it (and post-execution query stages) before collecting.
    def physCount(sp: org.apache.spark.sql.execution.SparkPlan)(
        hit: PartialFunction[org.apache.spark.sql.execution.SparkPlan, Int]
    ): Int = {
      val rec: PartialFunction[org.apache.spark.sql.execution.SparkPlan, Int] = {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          physCount(a.executedPlan)(hit)
        case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          physCount(qs.plan)(hit)
        case ts: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          physCount(ts.relation.cachedPlan)(hit)
      }
      sp.collect(rec.orElse(hit)).sum
    }
    def cachedBareWindows(sp: org.apache.spark.sql.execution.SparkPlan): Int =
      physCount(sp) {
        case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => 1
      }
    def cartesianCount(sp: org.apache.spark.sql.execution.SparkPlan): Int =
      physCount(sp) { case _: org.apache.spark.sql.execution.joins.CartesianProductExec => 1 }
    val offenders = scala.collection.mutable.SortedMap[String, Int]()
    val cartesians = scala.collection.mutable.SortedSet[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val bare = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window if w.partitionSpec.isEmpty => 1
        case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          cachedBareWindows(r.cachedPlan)
      }.sum
      if (bare > 0) offenders(name) = bare
      // the OTHER scale-killer class: a non-broadcast product means the
      // planner could not broadcast either side — at corpus cardinality
      // that is |A|·|B| rows through every executor. No allowlist: the
      // engine's legitimate cross joins all broadcast a 1-row/domain-
      // bounded side and plan as BroadcastNestedLoopJoin instead.
      if (cartesianCount(df.queryExecution.sparkPlan) > 0) cartesians += name
    }
    spark.catalog.clearCache()
    val unexpected = offenders.keySet -- allowlisted.keySet
    val stale = allowlisted.keySet -- offenders.keySet
    assert(
      unexpected.isEmpty,
      s"unpartitioned Window in queries not allowlisted as bounded: ${unexpected.mkString(", ")} (counts: $offenders)"
    )
    assert(stale.isEmpty, s"allowlist entries whose unpartitioned window no longer exists — remove them: ${stale.mkString(", ")}")
    assert(cartesians.isEmpty, s"non-broadcast CartesianProduct in: ${cartesians.mkString(", ")}")
  }

  test("collated census (q240): corpus is touched only by the grouping — the unhashable ICU join runs post-aggregation") {
    val df = Queries.collatedCensus(spark, sfDir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // ICU collations refuse hash joins (no binary equality): Spark
    // must pick SortMergeJoin — acceptable ONLY because both inputs
    // are vocab-bounded. Assert the corpus-side aggregation sits BELOW
    // the join, so a refactor that joins the raw token stream on a
    // collated key fails here.
    assert(p.contains("SortMergeJoin"), s"expected the documented ICU-collation join fallback:\n$p")
    val joined = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joined.nonEmpty)
    joined.foreach { j =>
      val leftHasAgg = j.left.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }.nonEmpty
      assert(leftHasAgg, s"the collated join must consume the aggregated (vocab-bounded) frame, not the corpus:\n${j.left}")
    }
  }
}
