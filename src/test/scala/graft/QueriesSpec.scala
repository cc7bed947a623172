package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant coverage for every SparkEntry query at sf0.001
  * (the driver's t1 tier). Exact-value parity vs DuckDB is the driver's
  * t2 gate (and `tools/oracle_check.py` locally).
  */
class QueriesSpec extends SparkSpec {

  test("every declared query has an oracle or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // every query now has a deterministic DuckDB mirror (LSH/IVF bake the
    // hyperplanes / unrolled Lloyd iterations into the SQL; the HLL query
    // emits an oracle-checkable bound assertion); keep it that way
    assert(noOracle === Set.empty[String])
  }

  test("all queries run and return rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dedup: at most one row per user_id, none with null value") {
    val d = Queries.dedup(spark, sfDir)
    assert(d.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    assert(d.filter(col("value").isNull).count() === 0)
  }

  test("nan profile: percentages within [0, 100]") {
    val p = Queries.nanProfile(spark, sfDir)
    assert(p.filter(col("nan_pct") < 0 || col("nan_pct") > 100).count() === 0)
  }

  test("value counts: descending and totals to table size") {
    val vc = Queries.valueCounts(spark, sfDir).collect()
    val counts = vc.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse))
    assert(counts.sum === sources.Tables.parquet(spark, sfDir, "events").count())
  }

  test("dim agg: distinct-count per group never exceeds group size") {
    val li = sources.Tables.parquet(spark, sfDir, "lineitem")
    assert(Queries.dimAgg(spark, sfDir).agg(sum("n_distinct")).head.getLong(0) >= li.select("l_orderkey").distinct.count())
  }

  test("approx dim agg: sketched distincts within 5% of exact") {
    val exact = Queries.dimAgg(spark, sfDir).select(col("ship_year"), col("ship_month"), col("l_returnflag"), col("l_linestatus"), col("n_distinct"))
    val li = sources.Tables
      .parquet(spark, sfDir, "lineitem")
      .withColumn("ship_year", year(col("l_shipdate")))
      .withColumn("ship_month", month(col("l_shipdate")))
    val approx = operators.DimAgg
      .approxDimAgg(
        li,
        Seq(col("l_returnflag"), col("l_linestatus"), col("ship_year"), col("ship_month")),
        col("l_orderkey"),
        Seq("avg_qty" -> col("l_quantity"))
      )
      .select(col("ship_year"), col("ship_month"), col("l_returnflag"), col("l_linestatus"), col("n_distinct_approx"))
    val joined = exact.join(approx, Seq("ship_year", "ship_month", "l_returnflag", "l_linestatus")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("n_distinct").toDouble
      val a = r.getAs[Long]("n_distinct_approx").toDouble
      // HLL wobbles in absolute terms on tiny groups; 5% relative OR ±3
      assert(math.abs(a - e) <= math.max(0.05 * e, 3.0), s"approx $a vs exact $e")
    }
  }

  test("semi join returns only qualifying users") {
    val sj = Queries.semiJoin(spark, sfDir)
    assert(sj.filter(col("n_events") < 70).count() === 0)
  }

  test("pii scrub: no raw email/phone survives; every redaction counted") {
    val p = Queries.piiScrub(spark, sfDir)
    assert(p.filter(col("scrubbed").rlike("@")).count() === 0)
    assert(p.filter(col("scrubbed").rlike("555-[0-9]{4}")).count() === 0)
    assert(p.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() === 0)
    assert(p.filter(!col("scrubbed").contains("<EMAIL>") || !col("scrubbed").contains("<PHONE>")).count() === 0)
  }

  test("snapshot diff: classifications are consistent with the counts") {
    val d = Queries.snapshotDiff(spark, sfDir)
    assert(d.filter(col("change_type") === "added" && col("old_n") =!= 0).count() === 0)
    assert(d.filter(col("change_type") === "removed" && col("new_n") =!= 0).count() === 0)
    assert(d.filter(col("change_type") === "same" && col("old_n") =!= col("new_n")).count() === 0)
  }

  test("grouped top-k: at most 3 per brand, ranks contiguous from 1, revenue descending") {
    val k = Queries.topkPerGroup(spark, sfDir)
    assert(k.groupBy("p_brand").count().filter(col("count") > 3).count() === 0)
    val bad = k
      .withColumn(
        "prev_rev",
        lag(col("revenue"), 1).over(org.apache.spark.sql.expressions.Window.partitionBy("p_brand").orderBy("rk"))
      )
      .filter(col("prev_rev").isNotNull && col("prev_rev") < col("revenue"))
    assert(bad.count() === 0)
    assert(k.filter(col("rk") === 1).select("p_brand").distinct().count() === k.select("p_brand").distinct().count())
  }

  test("mad outliers: outlier count bounded by group size; mad non-negative") {
    val m = Queries.madOutliers(spark, sfDir)
    assert(m.filter(col("n_outliers") > col("n_orders")).count() === 0)
    assert(m.filter(col("mad") < 0).count() === 0)
  }

  test("winsorize: p05 <= p95 and the clipped mean lies within them") {
    val w = Queries.winsorize(spark, sfDir)
    assert(w.filter(col("p05") > col("p95")).count() === 0)
    assert(w.filter(col("wins_mean") < col("p05") || col("wins_mean") > col("p95")).count() === 0)
  }

  test("tiered sample: en kept-rate below the others; kept never exceeds total") {
    val s = Queries.tieredSample(spark, sfDir).collect().map(r => r.getAs[String]("lang") -> r).toMap
    s.values.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs")))
    def rateOf(l: String) = s(l).getAs[Long]("n_kept").toDouble / s(l).getAs[Long]("n_docs")
    assert(rateOf("en") < rateOf("zh"))
  }

  test("json flatten roundtrip: totals reconcile with the raw event count") {
    val f = Queries.jsonFlatten(spark, sfDir)
    val total = f.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(total === graft.sources.Tables.events(spark, sfDir).count())
  }

  test("label top terms: five per language, lift above corpus parity for rank 1") {
    val l = Queries.labelTopTerms(spark, sfDir)
    assert(l.groupBy("lang").count().filter(col("count") =!= 5).count() === 0)
    assert(l.filter(col("rk") === 1 && col("lift_permyriad") < 10000).count() === 0)
  }

  test("set ops all: multiset counts dominate the distinct counts") {
    val all = Queries.setOpsAll(spark, sfDir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dist = Queries.setOps(spark, sfDir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all("intersect_all") >= dist("both"))
    assert(all("except_all") >= dist("only_1995"))
  }

  test("null-safe join: null pairs counted; no pair joins a null to a non-null") {
    val n = Queries.nullSafeJoin(spark, sfDir)
    assert(n.filter(col("n_null_pairs") > col("n_pairs")).count() === 0)
    assert(n.agg(sum(col("n_null_pairs"))).collect()(0).getLong(0) > 0, "fixture should produce null-null matches")
  }

  test("share of total: each flag's shares sum to ~10000 permyriad") {
    val s = Queries
      .shareOfTotal(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(sum(col("share_permyriad")).as("tot"))
    // floor() loses at most (cells-1) permyriad per flag
    assert(s.filter(col("tot") > 10000 || col("tot") < 9995).count() === 0)
  }

  test("stream left-outer join: both the matched and the null-emission paths fire") {
    val j = Queries.streamLeftOuterJoin(spark, sfDir)
    val tot = j.agg(sum(col("n_matched")), sum(col("n_unmatched"))).collect()(0)
    assert(tot.getLong(0) > 0, "no inner matches")
    assert(tot.getLong(1) > 0, "watermark never released an outer row")
  }

  test("shared vocab: overlap never exceeds the smaller vocabulary; all 10 pairs present") {
    val v = Queries.sharedVocab(spark, sfDir)
    assert(v.count() === 10)
    assert(v.filter(col("n_shared") > least(col("n1"), col("n2"))).count() === 0)
    assert(v.filter(col("n_shared") <= 0).count() === 0, "languages share the synthetic vocabulary")
  }

  test("sliding windows: every event lands in exactly two 6h/3h windows") {
    val w = Queries.slidingWindows(spark, sfDir)
    val total = w.agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total === 2 * graft.sources.Tables.events(spark, sfDir).count())
  }

  test("filtered agg: per-aggregate predicates bounded by the group count") {
    val f = Queries.filteredAgg(spark, sfDir)
    assert(f.filter(col("n_big") > col("n_orders") || col("n_finished") > col("n_orders")).count() === 0)
    assert(f.filter(col("n_finished") === 0 && col("finished_price") =!= 0.0).count() === 0)
  }

  test("csv roundtrip: totals reconcile with the source table") {
    val c = Queries.csvRoundtrip(spark, sfDir)
    val n = c.agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(n === graft.sources.Tables.parquet(spark, sfDir, "orders").count())
  }

  test("recursive hierarchy: level sizes double down a binary tree until exhaustion") {
    val h = Queries.recursiveHierarchy(spark, sfDir).collect()
    val total = h.map(_.getAs[Long]("n_nodes")).sum
    assert(total === graft.sources.Tables.parquet(spark, sfDir, "customer").count())
    h.sliding(2).foreach {
      case Array(a, b) =>
        val (la, lb) = (a.getAs[Int]("lvl"), b.getAs[Int]("lvl"))
        assert(lb === la + 1, "levels contiguous")
        assert(b.getAs[Long]("n_nodes") <= 2 * a.getAs[Long]("n_nodes"), "binary tree growth bound")
      case _ => ()
    }
  }

  test("observe metrics: side-channel equals a direct aggregate") {
    val m = Queries.observeMetrics(spark, sfDir).collect()(0)
    val li = graft.sources.Tables.parquet(spark, sfDir, "lineitem")
    assert(m.getAs[Long]("n_rows") === li.count())
    assert(m.getAs[Long]("n_discounted") === li.filter(col("l_discount") > 0.05).count())
  }

  test("intra-doc dedup: unique never exceeds chunks; repetition reconciles") {
    val d = Queries.intraDocDedup(spark, sfDir)
    assert(d.filter(col("n_unique") > col("n_chunks")).count() === 0)
    assert(d.filter(col("n_repeated") =!= col("n_chunks") - col("n_unique")).count() === 0)
    assert(d.agg(sum(col("n_repeated"))).collect()(0).getLong(0) > 0, "synthetic docs do repeat passages")
  }

  test("cogroup attribution: attributed bounded by purchases; some conversions attribute") {
    val a = Queries.cogroupAttribution(spark, sfDir)
    assert(a.filter(col("n_attributed") > col("n_purchases")).count() === 0)
    assert(a.agg(sum(col("n_attributed"))).collect()(0).getLong(0) > 0)
  }

  test("z-order blocks are tight rectangles: every 4096-z block bounds a 64x64 box") {
    val z = Queries.zorderCluster(spark, sfDir)
    assert(z.filter(col("x_hi") - col("x_lo") > 63 || col("y_hi") - col("y_lo") > 63).count() === 0)
  }

  test("schema evolution: pre-evolution rows are exactly the even keys") {
    val e = Queries.schemaEvolution(spark, sfDir).collect().map(r => r.getAs[String]("status") -> r.getAs[Long]("n_orders")).toMap
    val o = graft.sources.Tables.parquet(spark, sfDir, "orders")
    assert(e("<pre-evolution>") === o.filter(col("o_orderkey") % 2 === 0).count())
    assert(e.filter(_._1 != "<pre-evolution>").values.sum === o.filter(col("o_orderkey") % 2 === 1).count())
  }

  test("file metadata lineage: each partition's rows trace to one file") {
    val f = Queries.fileMetadataLineage(spark, sfDir)
    assert(f.filter(col("n_files") =!= 1).count() === 0)
  }

  test("variant extract: per-type totals reconcile with the raw json sums") {
    val v = Queries.variantExtract(spark, sfDir)
    val tot = v.agg(sum(col("n"))).collect()(0).getLong(0)
    assert(tot === graft.sources.Tables.events(spark, sfDir).count())
  }

  test("array HOF: long-token stats bounded by the token stream") {
    val a = Queries.arrayHof(spark, sfDir)
    assert(a.filter(col("long_chars") < col("n_long") * 5).count() === 0, "every counted token has >4 chars")
    assert(a.filter(col("has_rare") =!= 0 && col("has_rare") =!= 1).count() === 0)
  }

  test("map ops: element_at lookups reconcile with type cardinality") {
    val m = Queries.mapOps(spark, sfDir)
    assert(m.filter(col("n_click") + col("n_purchase") > 0 && col("n_types") === 0).count() === 0)
    assert(m.filter(col("n_types") < 1).count() === 0)
  }

  test("try arithmetic: exactly the keys ≡ 0 mod 5 divide to null") {
    val t0 = Queries.tryArithmetic(spark, sfDir)
    val nulls = t0.agg(sum(col("n_div_zero"))).collect()(0).getLong(0)
    val expected = graft.sources.Tables
      .parquet(spark, sfDir, "orders")
      .filter(col("o_orderkey") % 5 === 0)
      .count()
    assert(nulls === expected)
  }

  test("explode_outer: docs without rare tokens survive as exactly one row") {
    val e = Queries.explodeOuter(spark, sfDir)
    assert(e.count() === graft.sources.Tables.parquet(spark, sfDir, "documents").count())
    assert(e.filter(col("n_rare") === 0 && col("n_rows") =!= 1).count() === 0)
  }

  test("funnel: monotone non-increasing down the prefix counts") {
    val f = Queries.funnel(spark, sfDir).collect()(0)
    val Seq(u, v, c, p) = Seq("n_users", "n_viewed", "n_clicked_after_view", "n_purchased_after_click").map(f.getAs[Long])
    assert(u >= v && v >= c && c >= p)
    assert(p > 0, "fixture should complete some full funnels")
  }

  test("retention matrix: week-0 row per cohort covers the whole cohort") {
    val r = Queries.retentionMatrix(spark, sfDir)
    val w0 = r.filter(col("weeks_since") === 0).agg(sum(col("n_active"))).collect()(0).getLong(0)
    val users = graft.sources.Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(w0 === users, "every user is active in their own cohort week")
    assert(r.filter(col("weeks_since") < 0).count() === 0)
  }

  test("transition matrix: total transitions = events minus one per user") {
    val t0 = Queries.transitionMatrix(spark, sfDir)
    val total = t0.agg(sum(col("n_transitions"))).collect()(0).getLong(0)
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(total === ev.count() - ev.select("user_id").distinct().count())
  }

  test("bitmap distinct equals countDistinct exactly") {
    val bm = Queries.bitmapDistinct(spark, sfDir)
    val exact = graft.sources.Tables
      .events(spark, sfDir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_distinct_users"))
      .orderBy("event_type")
    assert(bm.collect().toSeq === exact.collect().toSeq)
  }

  test("hll partial-merge: union of weekly sketches lands inside the asserted bound") {
    val h = Queries.hllPartialMerge(spark, sfDir)
    assert(h.filter(col("hll_ok") === 0).count() === 0)
  }

  test("cms heavy hitters: point estimates respect both CMS bounds") {
    val c = Queries.cmsHeavyHitters(spark, sfDir).collect()
    assert(c.length === 5)
    assert(c.forall(_.getAs[Int]("cms_ok") === 1))
  }

  test("shipping priority: top-10, descending, positive revenue") {
    val r = Queries.shippingPriority(spark, sfDir).collect()
    assert(r.length <= 10 && r.nonEmpty)
    val revs = r.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted.reverse))
    assert(revs.forall(_ > 0))
  }

  test("regional revenue: one row per ASIA nation with positive revenue") {
    val r = Queries.regionalRevenue(spark, sfDir)
    val asiaNations = sources.Tables
      .parquet(spark, sfDir, "nation")
      .join(sources.Tables.parquet(spark, sfDir, "region").filter(col("r_name") === "ASIA"), col("n_regionkey") === col("r_regionkey"))
      .count()
    assert(r.count() <= asiaNations)
    assert(r.filter(col("revenue") <= 0).count() === 0)
  }

  test("ewma: one smoothed value per event, inside the user's value envelope") {
    val e = Queries.ewma(spark, sfDir)
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(e.count() === ev.count())
    val env = ev.groupBy("user_id").agg(min("value").as("lo"), max("value").as("hi"))
    // half-away rounding at scale 4 can nudge a boundary value by 5e-5
    val out = e.join(env, "user_id").filter(col("ewma") < col("lo") - 0.0001 || col("ewma") > col("hi") + 0.0001)
    assert(out.count() === 0)
  }

  test("split drift: contributions are non-negative and bounded by 1/2") {
    val d = Queries.splitDriftTvd(spark, sfDir)
    assert(d.filter(col("tvd_contrib") < 0 || col("tvd_contrib") > 0.5).count() === 0)
    assert(d.agg(sum(col("n_train") + col("n_test"))).head.getLong(0) ===
      graft.sources.Tables.events(spark, sfDir).count())
  }

  test("triangle census: wedges bound triangles; counts non-negative") {
    val r = Queries.triangleCensus(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_edges") > 0)
    assert(r.getAs[Long]("n_wedges") >= r.getAs[Long]("n_triangles"))
  }

  test("degree histogram: accounts for every document exactly once") {
    val h = Queries.degreeHistogram(spark, sfDir)
    assert(h.agg(sum("n_nodes")).head.getLong(0) ===
      graft.sources.Tables.parquet(spark, sfDir, "documents").count())
  }

  test("prefix clusters: every cluster has 2+ docs and keep_id is a member") {
    val p = Queries.prefixClusters(spark, sfDir)
    assert(p.filter(col("n_docs") < 2).count() === 0)
  }

  test("path signatures: user totals conserved across the top paths") {
    val p = Queries.pathSignatures(spark, sfDir).collect()
    assert(p.length <= 10 && p.nonEmpty)
    val counts = p.map(_.getAs[Long]("n_users"))
    assert(counts.sameElements(counts.sorted.reverse))
  }

  test("url normalize: parse_url recovers host and path for every doc") {
    val u = Queries.urlNormalize(spark, sfDir)
    assert(u.filter(col("host").isNull || col("path").isNull).count() === 0)
    assert(u.filter(!col("canonical").contains("?page=")).count() === 0)
  }

  test("multimodal audio: every doc demuxes; duration consistent with rate") {
    val a = Queries.multimodalAudio(spark, sfDir)
    assert(a.count() === graft.sources.Tables.parquet(spark, sfDir, "documents").count())
    // integer division, as the demux computes it (`/` on columns is double)
    assert(a.filter(col("ms") =!= expr("n_samples * 1000 div sample_rate")).count() === 0)
    assert(a.filter(!col("sample_rate").isin(8000, 16000, 22050, 44100, 48000)).count() === 0)
  }

  test("partial stats merge: variance non-negative, counts conserved") {
    val m = Queries.partialStatsMerge(spark, sfDir)
    assert(m.filter(col("variance") < 0).count() === 0)
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(m.agg(sum("n")).head.getLong(0) === ev.filter(col("value").isNotNull).count())
  }

  test("cooccurrence: ordered pairs, support bounded by the user universe") {
    val c = Queries.cooccurrence(spark, sfDir)
    assert(c.filter(col("type_a") >= col("type_b")).count() === 0)
    val users = graft.sources.Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(c.filter(col("n_users") > users).count() === 0)
  }

  test("gap histogram: one gap per event beyond each user's first") {
    val h = Queries.gapHistogram(spark, sfDir)
    val ev = graft.sources.Tables.events(spark, sfDir)
    assert(h.agg(sum("n_gaps")).head.getLong(0) ===
      ev.count() - ev.select("user_id").distinct().count())
    assert(h.filter(col("bucket") < 0 || col("bucket") > 12).count() === 0)
  }

  test("golden record: exactly one canonical row per user") {
    val g = Queries.goldenRecord(spark, sfDir)
    val users = graft.sources.Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(g.count() === users)
    assert(g.filter(col("first_ts") > col("last_ts")).count() === 0)
  }

  test("xml ingest: from_xml recovers the embedded id for every order") {
    val x = Queries.xmlIngest(spark, sfDir)
    assert(x.filter(col("parsed_id") =!= col("o_orderkey")).count() === 0)
    assert(x.filter(col("total").isNull || col("status").isNull).count() === 0)
  }

  test("anomaly flags: never fires on a type's first observed week") {
    val a = Queries.anomalyFlags(spark, sfDir)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("event_type").orderBy("week")
    val first = a.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    assert(first.filter(col("spike") === 1).count() === 0)
  }

  test("pareto frontier: strictly increasing day_max over strictly increasing dates") {
    val p = Queries.paretoFrontier(spark, sfDir).collect()
    assert(p.nonEmpty)
    val prices = p.map(_.getDecimal(1))
    assert(prices.sliding(2).forall { case Array(a, b) => a.compareTo(b) < 0; case _ => true })
  }

  test("expectation suite: integrity checks pass on the driver testdata") {
    val e = Queries.expectationSuite(spark, sfDir).collect()
    assert(e.length === 5)
    // the synthetic tables are referentially sound; only the null-rate
    // budget carries a non-zero metric
    assert(e.filter(_.getAs[Int]("passed") === 0).isEmpty)
  }

  test("benford profile: shares sum to ~10000 permyriad over digits 1-9") {
    val b = Queries.benfordProfile(spark, sfDir)
    val total = b.agg(sum("share_permyriad")).head.getLong(0)
    assert(total >= 9990 && total <= 10000, s"permyriad sum $total")
  }

  test("date spine: contiguous days, zero-filled gaps preserved") {
    val d = Queries.dateSpine(spark, sfDir).collect()
    assert(d.length >= 2)
    val days = d.map(_.getTimestamp(0).toLocalDateTime.toLocalDate)
    days.sliding(2).foreach { case Array(a, b) => assert(b === a.plusDays(1), s"gap between $a and $b"); case _ => () }
    assert(d.map(_.getAs[Long]("n_orders")).sum ===
      graft.sources.Tables.parquet(spark, sfDir, "orders").count())
  }

  test("window bounds: one row per user; second_type null only for single-event users") {
    val w = Queries.windowBounds(spark, sfDir)
    assert(w.groupBy("user_id").count().filter(col("count") > 1).count() === 0)
    assert(w.filter(col("second_type").isNull && col("n_events") > 1).count() === 0)
    assert(w.filter(col("n_events") === 1 && col("first_type") =!= col("last_type")).count() === 0)
  }

  test("sliding distinct: one row per observed day, 7d count ≥ that day's own distinct") {
    val daily = graft.sources.Tables
      .events(spark, sfDir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .groupBy("d")
      .agg(countDistinct("user_id").as("n1"))
      .select(col("d").cast("timestamp").as("day"), col("n1"))
    val win = Queries.slidingBitmapDistinct(spark, sfDir)
    assert(win.count() === daily.count())
    assert(win.join(daily, Seq("day")).filter(col("n_users_7d") < col("n1")).count() === 0)
  }

  test("prefix filtering is LOSSLESS: q178 equals the all-pairs exact-Jaccard ground truth") {
    val sh = operators.NearDup
      .shingleTable(graft.sources.Tables.parquet(spark, sfDir, "documents"), col("doc_id"), col("text"), n = 3)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh
      .as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(sz.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
      .filter(col("inter") * 3 >= col("n1") + col("n2"))
      .select("d1", "d2")
    val got = Queries.setsimPrefixJoin(spark, sfDir).select("d1", "d2")
    assert(got.except(brute).isEmpty && brute.except(got).isEmpty)
  }

  test("equi-depth histogram: bins partition each flag's rows and never overlap") {
    val rows = Queries.equidepthHistogram(spark, sfDir).collect()
    val li = graft.sources.Tables.parquet(spark, sfDir, "lineitem")
    val byFlag = li.groupBy("l_returnflag").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (flag, bins) =>
      assert(bins.map(_.getAs[Long]("n_rows")).sum === byFlag(flag), s"$flag depths must total the group")
      val sorted = bins.sortBy(_.getAs[Long]("bin_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Double]("hi") < b.getAs[Double]("lo"), s"$flag bins overlap")
        case _ => ()
      }
    }
  }

  test("open-order concurrency: never negative, and every order eventually closes") {
    val r = Queries.openOrderConcurrency(spark, sfDir).orderBy("day").collect()
    assert(r.forall(_.getAs[Long]("n_open") >= 0))
    assert(r.last.getAs[Long]("n_open") === 0, "running sum must return to zero after the last close")
  }

  test("containment: permille within [750, 1000] and never below the pair's Jaccard") {
    val c = Queries.containmentPairs(spark, sfDir)
    assert(c.filter(col("containment_permille") < 750 || col("containment_permille") > 1000).count() === 0)
    // containment divides by min size, Jaccard by union: containment ≥ J always
    val j = Queries.setsimPrefixJoin(spark, sfDir).select(col("d1"), col("d2"), col("jaccard_permille"))
    assert(c.join(j, Seq("d1", "d2")).filter(col("containment_permille") < col("jaccard_permille")).count() === 0)
  }

  test("k-core: survivors are a subset of the raw graph's deg≥2 nodes, degrees never grow") {
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    val sigs = operators.NearDup.minhashSignatures(docs, col("doc_id"), col("text"), k = 16, n = 3)
    val pairs = operators.NearDup.lshCandidatePairs(sigs, bands = 4, rowsPerBand = 4)
    val sym = pairs.unionByName(pairs.select(col("d2").as("d1"), col("d1").as("d2")))
    val rawDeg = sym.groupBy(col("d1").as("doc_id")).agg(count(lit(1)).as("raw_deg"))
    val core = Queries.kcoreDocs(spark, sfDir)
    val joined = core.join(rawDeg, Seq("doc_id"), "left")
    assert(joined.filter(col("raw_deg").isNull || col("raw_deg") < 2).count() === 0)
    assert(joined.filter(col("deg") > col("raw_deg")).count() === 0)
  }

  test("KMV: deterministic estimate lands in the asserted band for every group") {
    val r = Queries.kmvBottomK(spark, sfDir).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Int]("kmv_ok") === 1))
  }

  test("weighted systematic sample: ~10 per stratum, heavy users always caught") {
    val wts = graft.sources.Tables
      .events(spark, sfDir)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("w"))
    val tots = wts.groupBy("event_type").agg(sum("w").as("tot"))
    val got = Queries.weightedSystematicSample(spark, sfDir)
    val perType = got.groupBy("event_type").count().collect()
    assert(perType.forall { r => val n = r.getLong(1); n >= 8 && n <= 12 })
    // any user whose weight spans a full step must straddle a boundary
    val heavy = wts
      .join(tots, Seq("event_type"))
      .filter(col("w") >= greatest(expr("tot div 10"), lit(1L)))
      .select("event_type", "user_id")
    assert(heavy.join(got, Seq("event_type", "user_id"), "left_anti").count() === 0)
  }

  test("sliding HLL: estimate in band for every (type, week); one row per observed cell") {
    val r = Queries.slidingHllDistinct(spark, sfDir)
    assert(r.filter(col("hll_ok") =!= 1).count() === 0)
    val cells = graft.sources.Tables
      .events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 604800000000").as("week"))
      .distinct()
      .count()
    assert(r.count() === cells)
  }

  test("language mix: every language filled to its quota, none above") {
    val r = Queries.languageMixSample(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n_picked") === row.getAs[Long]("quota"))
      assert(row.getAs[Long]("quota") <= row.getAs[Long]("n_available"))
    }
  }

  test("join cardinality: the histogram-product estimate equals the executed join") {
    val r = Queries.joinCardinalityEstimate(spark, sfDir).head
    assert(r.getAs[Int]("estimate_exact") === 1)
    assert(r.getAs[Long]("actual_rows") > 0)
  }

  test("table checksum: every bucket matches and row counts total the table") {
    val r = Queries.tableChecksum(spark, sfDir)
    assert(r.filter(col("match_ok") =!= 1).count() === 0)
    assert(r.agg(sum("n_rows")).head.getLong(0) ===
      graft.sources.Tables.events(spark, sfDir).count())
  }

  test("late-data audit: the split partitions the table and loss accounting closes") {
    val r = Queries.lateDataAudit(spark, sfDir).head
    val (onTime, late) = (r.getAs[Long]("n_on_time"), r.getAs[Long]("n_late"))
    val (wDropped, rDropped, rKept) =
      (r.getAs[Long]("n_windows_dropped"), r.getAs[Long]("n_rows_dropped"), r.getAs[Long]("n_rows_kept"))
    assert(onTime + late === graft.sources.Tables.events(spark, sfDir).count())
    assert(rDropped + rKept === late)
    // the state operator refuses whole windows; rows lost can only
    // exceed (or equal) the windows they lived in, and a lost row
    // implies a refused window
    assert(wDropped <= rDropped)
    assert((wDropped > 0) === (rDropped > 0))
  }

  test("winnowing: a shared >= w+k-1 substring is always detected; disjoint docs never pair") {
    import spark.implicits._
    // deterministic synthetic texts: docs 1 and 2 share a 200-char
    // verbatim block (well past the w+k-1 = 57 guarantee bound) with
    // different unique tails; docs 3 and 4 are entirely disjoint
    def blob(seed: Int, n: Int): String =
      (0 until n)
        .map(i => ('a' + math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"$seed:$i"), 26)).toChar)
        .mkString
    val shared = blob(7, 200)
    val docs = Seq(
      (1L, shared + blob(1, 120)),
      (2L, blob(2, 120) + shared),
      (3L, blob(3, 300)),
      (4L, blob(4, 300))
    ).toDF("doc_id", "text")
    val pairs = graft.operators.NearDup
      .winnowedOverlapPairs(docs, col("doc_id"), col("text"), k = 8, w = 50, maxDf = 20, minShared = 1)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
      .toSet
    assert(pairs.contains((1L, 2L)), s"the winnowing guarantee missed the shared block: $pairs")
    assert(!pairs.exists { case (a, b) => Set(a, b).intersect(Set(3L, 4L)).nonEmpty && Set(a, b) != Set(1L, 2L) },
      s"disjoint docs must not pair: $pairs")
  }

  test("compaction plan: covers every physical file exactly once within the next-fit bound") {
    val r = Queries.compactionPlan(spark, sfDir).collect()
    val base = s"/tmp/graft_compact/${new java.io.File(sfDir).getName}/orders"
    val files = spark.read
      .parquet(base)
      .select(col("o_orderstatus"), col("_metadata.file_name").as("f"), col("_metadata.file_size").as("sz"))
      .distinct()
      .collect()
    // exactly-once coverage: per-status file counts in the plan equal
    // the physical inventory
    val planned = r.map(row => row.getAs[String]("o_orderstatus") -> row.getAs[Long]("n_files"))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val physical = files.map(_.getAs[String]("o_orderstatus"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(planned === physical)
    // next-fit bound: a group exceeds the 64 KiB target by less than
    // one file (= its last file), so group_bytes < target + max file
    val maxFile = files.map(_.getAs[Long]("sz")).max
    r.foreach { row =>
      assert(row.getAs[Long]("group_bytes") < 64 * 1024L + maxFile,
        s"group ${row.getAs[Long]("grp")} of ${row.getAs[String]("o_orderstatus")} breaks the next-fit bound")
    }
  }

  test("curation funnel: stages are monotone non-increasing from the full corpus") {
    val rows = Queries.curationFunnel(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("stage_id")).toSeq === Seq(1, 2, 3, 4, 5))
    val counts = rows.map(_.getAs[Long]("n_docs")).toSeq
    assert(counts.head === graft.sources.Tables.parquet(spark, sfDir, "documents").count())
    counts.sliding(2).foreach { case Seq(a, b) => assert(b <= a, s"funnel grew: $counts") }
    assert(counts.last > 0, "the funnel must not drain the corpus")
  }

  test("semantic dedup: accounting closes per cell and totals the corpus") {
    val rows = Queries.semanticDedup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") === r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_dup_pairs"))
    }
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total === graft.sources.Tables.parquet(spark, sfDir, "embeddings").count())
  }

  test("bm25: scores strictly ordered by rank, every hit contains a query term") {
    val rows = Queries.bm25TopK(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val (sa, sb) = (a.getAs[Double]("score"), b.getAs[Double]("score"))
        assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ =>
    }
    rows.foreach(r => assert(r.getAs[Long]("n_terms_hit") >= 1 && r.getAs[Long]("n_terms_hit") <= 3))
  }

  test("hard negatives: no neighbor shares its query's label") {
    import spark.implicits._
    val labels = graft.sources.Tables
      .parquet(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("label"))
      .as[(Long, Int)]
      .collect()
      .toMap
    Queries.hardNegatives(spark, sfDir).collect().foreach { r =>
      val (q, n) = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      assert(labels(q) !== labels(n), s"negative $n shares label with query $q")
    }
  }

  test("mmr: three distinct picks per query, all drawn from the relevance pool, pick 1 = argmax rel") {
    val picks = Queries.mmrDiversify(spark, sfDir).collect()
    val pool = graft.operators.Similarity
      .bruteForceTopK(
        graft.sources.Tables.parquet(spark, sfDir, "embeddings"),
        col("vec_id"),
        col("embedding"),
        col("vec_id") < 5,
        k = 10
      )
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"), r.getAs[Double]("sim")))
    val poolSet = pool.map(p => (p._1, p._2)).toSet
    picks.groupBy(_.getAs[Long]("qid")).foreach { case (qid, rows) =>
      val ids = rows.sortBy(_.getAs[Int]("pick")).map(_.getAs[Long]("nid"))
      assert(ids.length === 3 && ids.distinct.length === 3, s"$qid picked $ids")
      ids.foreach(n => assert(poolSet((qid, n)), s"pick $n not in $qid's pool"))
      // pick 1 is the relevance argmax (ties by nid)
      val best = pool.filter(_._1 == qid).minBy(p => (-p._3, p._2))._2
      assert(ids.head === best)
    }
  }

  test("incremental dedup: pairs are strictly new x old; confirmed Jaccard never below the threshold") {
    val rows = Queries.incrementalDedup(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("new_id") % 5 === 0L)
      assert(r.getAs[Long]("old_id") % 5 !== 0L)
      val pm = r.getAs[Long]("jaccard_permille")
      assert(pm >= 500L && pm <= 1000L, s"confirm let through $pm")
    }
  }

  test("streaming probe equals the batch incremental dedup row for row") {
    val batch = Queries.incrementalDedup(spark, sfDir).collect().map(_.toSeq).toSet
    val stream = Queries.streamDedupProbe(spark, sfDir).collect().map(_.toSeq).toSet
    assert(stream === batch)
  }

  test("mixture schedule: weights cover the budget; repeat factors reproduce the integer math") {
    val rows = Queries.mixtureSchedule(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("target_permyriad")).sum === 10000L)
    val total = rows.map(_.getAs[Long]("available_tokens")).sum
    rows.foreach { r =>
      val expected = total * r.getAs[Long]("target_permyriad") / 10000L
      assert(r.getAs[Long]("target_tokens") === expected)
      assert(r.getAs[Long]("repeat_milli") === expected * 1000L / r.getAs[Long]("available_tokens"))
    }
  }

  test("cluster-balanced sample: at most k per cell, ranks contiguous, picks unique") {
    val rows = Queries.clusterBalancedSample(spark, sfDir).collect()
    val vids = rows.map(_.getAs[Long]("vid"))
    assert(vids.distinct.length === vids.length)
    rows.groupBy(_.getAs[Int]("cell")).foreach { case (cell, rs) =>
      val rks = rs.map(_.getAs[Int]("rk")).sorted.toSeq
      assert(rks.length <= 8 && rks === (1 to rks.length), s"cell $cell ranks $rks")
    }
  }

  test("ann recall report: permille in [0,1000], hits never exceed truth, brute recall of itself is 1000") {
    val rows = Queries.annRecallReport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_true"))
      val pm = r.getAs[Long]("recall_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
  }

  test("leakage-free split: the ledger balances and moves only test docs") {
    val rows = Queries.leakageFreeSplit(spark, sfDir).collect()
    val byName = rows.map(r => r.getAs[String]("split") -> r).toMap
    val (te, tr) = (byName("test"), byName("train"))
    assert(te.getAs[Long]("n_moved") === tr.getAs[Long]("n_moved"))
    assert(te.getAs[Long]("n_final") === te.getAs[Long]("n_initial") - te.getAs[Long]("n_moved"))
    assert(tr.getAs[Long]("n_final") === tr.getAs[Long]("n_initial") + tr.getAs[Long]("n_moved"))
    assert(te.getAs[Long]("n_final") + tr.getAs[Long]("n_final") ===
      graft.sources.Tables.parquet(spark, sfDir, "documents").count())
  }

  test("corpus report: per-source totals close against the raw table") {
    val rows = Queries.corpusReport(spark, sfDir).collect()
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_quality_pass") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_exact_dup") >= 0L)
      val pm = r.getAs[Long]("en_permyriad")
      assert(pm >= 0L && pm <= 10000L)
    }
  }

  test("ivm merge: partials close and every group's merge equals the full recompute") {
    val rows = Queries.ivmMergeAgg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_snap") + r.getAs[Long]("n_delta") === r.getAs[Long]("n_merged"))
      assert(r.getAs[Long]("ivm_ok") === 1L, s"merge != recompute for $r")
    }
    val orders = graft.sources.Tables.parquet(spark, sfDir, "orders")
    assert(rows.map(_.getAs[Long]("n_merged")).sum === orders.count())
  }

  test("bpe merge rounds: replace() semantics match the spec'd left-to-right rule; freqs monotone-ish") {
    // the symbol-framing + replace contract the oracle depends on:
    // only whole symbols merge, overlapping runs merge left-to-right
    val checks = spark
      .sql(
        """SELECT replace('|a|a|a|', '|a|a|', '|aa|') AS r1,
          |       replace('|ab|c|', '|b|c|', '|bc|') AS r2,
          |       replace('|x|a|b|y|a|b|', '|a|b|', '|ab|') AS r3""".stripMargin
      )
      .head()
    assert(checks.getString(0) === "|aa|a|") // second overlapping pair untouched
    assert(checks.getString(1) === "|ab|c|") // "b|c" inside "|ab|c|" must NOT match
    assert(checks.getString(2) === "|x|ab|y|ab|") // disjoint occurrences both merge
    val rows = Queries.bpeMergeRounds(spark, sfDir).orderBy("round").collect()
    assert(rows.map(_.getAs[Int]("round")).toSeq === Seq(1, 2, 3))
    rows.foreach { r =>
      assert(r.getAs[Long]("pair_freq") > 0L)
      assert(r.getAs[String]("left_sym").nonEmpty && r.getAs[String]("right_sym").nonEmpty)
    }
    // merging never removes a WORD; vocab can only grow by ≤1 new symbol
    // per round (the merged symbol) and never shrinks below 1
    val sizes = rows.map(_.getAs[Long]("n_sym_after"))
    assert(sizes.forall(_ >= 1L))
  }

  test("kmv intersection: estimate within the 3-sigma bound, exact jaccard sane") {
    val rows = Queries.kmvIntersection(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_permille")
      val est = r.getAs[Long]("est_permille")
      assert(exact >= 0L && exact <= 1000L)
      assert(est >= 0L && est <= 1000L)
      assert(r.getAs[Long]("kmv_ok") === 1L, s"KMV estimate off-bound: $r")
      assert(r.getAs[Long]("n_a") > 0L && r.getAs[Long]("n_b") > 0L)
    }
  }

  test("sorted neighborhood: pairs only within nation and sort distance <= 2; scores in range") {
    val rows = Queries.sortedNeighborPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sc = r.getAs[Long]("score")
      assert(sc >= 4L && sc <= 6L)
      assert(r.getAs[Long]("cust_a") !== r.getAs[Long]("cust_b"))
    }
    // candidate volume is O(n·w): never more than 2 pairs per record
    val cust = graft.sources.Tables.parquet(spark, sfDir, "customer").count()
    assert(rows.length <= 2 * cust)
  }

  test("continuation counts: bounded by vocabulary, bigram totals close") {
    val rows = Queries.continuationCounts(spark, sfDir).collect()
    val vocab = rows.length.toLong
    rows.foreach { r =>
      assert(r.getAs[Long]("n_left_distinct") <= vocab)
      assert(r.getAs[Long]("n_right_distinct") <= vocab)
      assert(r.getAs[Long]("n_as_right") >= r.getAs[Long]("n_left_distinct"))
    }
    // Σ n_as_right = total bigram count = Σ (len(doc) - 1) over docs ≥ 2 tokens
    val expected = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select((size(split(trim(col("text")), "\\s+")) - 1).as("n"))
      .filter(col("n") >= 1)
      .agg(sum("n"))
      .head()
      .getLong(0)
    assert(rows.map(_.getAs[Long]("n_as_right")).sum === expected)
  }

  test("link prediction: common-neighbor counts positive, flags consistent with the edge set") {
    val rows = Queries.commonNeighborPrediction(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_common") >= 1L)
      val e = r.getAs[Long]("is_edge")
      assert(e === 0L || e === 1L)
      assert(r.getAs[Long]("a") < r.getAs[Long]("c"))
    }
  }

  test("dup-ngram fraction: permille bounded, dup count never exceeds shingle count") {
    val rows = Queries.dupNgramFraction(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup") <= r.getAs[Long]("n_shingles"))
      val pm = r.getAs[Long]("dup_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
  }

  test("grouped trend: slope reproduces the closed form on a hand-computed group") {
    val rows = Queries.groupedTrend(spark, sfDir).collect()
    assert(rows.length === 5)
    // recompute one group's slope driver-side from raw rows
    val raw = graft.sources.Tables
      .parquet(spark, sfDir, "events")
      .filter(col("value").isNotNull && col("event_type") === "click")
      .select(
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("x"),
        floor(col("value") * 100 + 0.5).cast("long").as("y")
      )
      .collect()
      .map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1))))
    val n = BigInt(raw.length)
    val sx = raw.map(_._1).sum; val sy = raw.map(_._2).sum
    val sxx = raw.map(p => p._1 * p._1).sum; val sxy = raw.map(p => p._1 * p._2).sum
    val expected = ((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong
    val got = rows.find(_.getString(0) == "click").get.getAs[Long]("slope_micro_cents")
    assert(got === expected)
  }

  test("ab test report: arms partition the users, chi2 non-negative, flag matches threshold") {
    val r = Queries.abTestReport(spark, sfDir).head()
    val users = graft.sources.Tables
      .parquet(spark, sfDir, "events")
      .select("user_id")
      .distinct()
      .count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === users)
    assert(r.getAs[Long]("chi2_milli") >= 0L)
    assert(r.getAs[Long]("significant") === (if (r.getAs[Long]("chi2_milli") >= 3841L) 1L else 0L))
    assert(r.getAs[Long]("conv_a_permille") <= 1000L && r.getAs[Long]("conv_b_permille") <= 1000L)
  }

  test("erasure audit: deletion accounting closes and nothing from the cohort survives") {
    val rows = Queries.erasureAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("surface")).toSet === Set("events", "user_profiles"))
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_before") === r.getAs[Long]("rows_deleted") + r.getAs[Long]("rows_after"))
      assert(r.getAs[Long]("rows_deleted") >= 0L)
    }
    // re-derive the cohort and prove zero surviving rows reference it
    val ev = graft.sources.Tables.parquet(spark, sfDir, "events")
    val survivors = ev.filter(functions.TextOps.hash32(col("user_id").cast("string")) % 20 =!= 0)
    val evRow = rows.find(_.getAs[String]("surface") == "events").get
    assert(survivors.count() === evRow.getAs[Long]("rows_after"))
  }

  test("calibration: buckets partition the corpus, rates bounded") {
    val rows = Queries.classifierCalibration(spark, sfDir).collect()
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n")).sum === docs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n"))
      val pm = r.getAs[Long]("pass_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
  }

  test("embedding covariance: diagonal non-negative, symmetric pairs present once, n constant") {
    val rows = Queries.embeddingCovariance(spark, sfDir).collect()
    assert(rows.length === 21) // 6 dims upper triangle
    val n = rows.head.getAs[Long]("n_vecs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Int]("dim_i") <= r.getAs[Int]("dim_j"))
      if (r.getAs[Int]("dim_i") == r.getAs[Int]("dim_j"))
        assert(r.getAs[Double]("cov_val") >= 0.0, s"negative variance: $r")
    }
  }

  test("timer sessions: a superset of q37's closed sessions, never more than all islands") {
    val withTimers = Queries.timerSessions(spark, sfDir).collect()
    val closedOnly = graft.streaming.Sessionize.run(spark, sfDir, gapMinutes = 720).collect()
    // every successor-closed session also appears in the timer run
    val timerKeys = withTimers.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"))).toSet
    closedOnly.foreach { s =>
      assert(timerKeys.contains((s.user_id, s.start_ms)), s"q37 session missing under timers: $s")
    }
    assert(withTimers.length >= closedOnly.length)
  }

  test("lateral top-k: at most 3 orders per customer, descending within customer") {
    val rows = Queries.lateralTopK(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("c_custkey")).foreach { case (_, g) =>
      assert(g.length <= 3)
      val prices = g.map(_.getAs[Double]("o_totalprice")).toSeq
      assert(prices === prices.sorted.reverse)
    }
  }

  test("sql udf: totals equal the inline-expression computation") {
    val viaUdf = Queries.sqlUdfTokens(spark, sfDir).collect()
    val inline = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .groupBy("source")
      .agg(sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("n_tokens"))
      .collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_tokens"))
      .toMap
    viaUdf.foreach { r =>
      assert(r.getAs[Long]("n_tokens") === inline(r.getAs[String]("source")))
    }
  }

  test("warm-start equals the plain v2-state run row for row") {
    val warm = Queries.initialStateWarmStart(spark, sfDir).collect()
    val plain = Queries.transformWithStateStats(spark, sfDir).collect()
    assert(warm.length === plain.length)
    warm.zip(plain).foreach { case (w, p) => assert(w === p) }
  }

  test("range layout: disjoint file ranges, totals close") {
    val r = Queries.rangeLayoutAudit(spark, sfDir).head()
    assert(r.getAs[Long]("layout_disjoint") === 1L, s"overlapping file ranges: $r")
    assert(r.getAs[Long]("n_overlaps") === 0L)
    val orders = graft.sources.Tables.parquet(spark, sfDir, "orders").count()
    assert(r.getAs[Long]("n_rows") === orders)
  }

  test("pipe syntax lowers to the same answer as the nested spelling; variables fold to literals") {
    val piped = Queries.pipeSyntax(spark, sfDir).collect()
    val nested = graft.sources.Tables
      .parquet(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "O")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(25,6)")).cast("double").as("total")
      )
      .orderBy("o_orderpriority")
      .collect()
    assert(piped.map(_.toString).toSeq === nested.map(_.toString).toSeq)
    val varred = Queries.sessionVariables(spark, sfDir).collect()
    assert(varred.nonEmpty)
    varred.foreach(r => assert(r.getAs[Long]("n_orders") > 0L))
  }

  test("ks drift: bounded in [0, 1000], zero against itself") {
    val r = Queries.ksDrift(spark, sfDir).head()
    val ks = r.getAs[Long]("ks_permille")
    assert(ks >= 0L && ks <= 1000L)
    assert(r.getAs[Long]("n0") > 0L && r.getAs[Long]("n1") > 0L)
    assert(r.getAs[Long]("n_support") > 0L)
  }

  test("retrieval mrr: permille bounded, hits never exceed queries, totals close") {
    val rows = Queries.retrievalMrr(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val emb = graft.sources.Tables.parquet(spark, sfDir, "embeddings")
    assert(rows.map(_.getAs[Long]("n_queries")).sum === emb.filter(col("vec_id") < 50).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_queries"))
      val m = r.getAs[Long]("mrr_permille")
      assert(m >= 0L && m <= 1000L)
    }
  }

  test("cluster quality: density and jaccard ranges bounded, keeper is the min member") {
    val rows = Queries.clusterQualityReport(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 2L)
      assert(r.getAs[Long]("keeper") === r.getAs[Long]("cluster")) // min-label == min id
      val d = r.getAs[Long]("density_permyriad")
      assert(d >= 1L && d <= 10000L)
      val lo = r.getAs[Long]("min_j_permille"); val hi = r.getAs[Long]("max_j_permille")
      // confirmed at 2·inter ≥ union ⇒ inter·1000 div union ≥ 500 exactly
      assert(lo >= 500L && lo <= hi && hi <= 1000L)
    }
  }

  test("point-in-time join: every fact matches exactly one version") {
    val r = Queries.pointInTimeJoin(spark, sfDir).head()
    assert(r.getAs[Long]("pit_exact") === 1L, s"intervals must partition the timeline: $r")
    assert(r.getAs[Long]("n_matches") === r.getAs[Long]("n_facts"))
    assert(r.getAs[Long]("n_priority_match") <= r.getAs[Long]("n_facts"))
    val orders = graft.sources.Tables.parquet(spark, sfDir, "orders").count()
    assert(r.getAs[Long]("n_facts") === orders)
  }

  test("quality classifier: keep counts bounded by doc counts, linear score reproducible") {
    val rows = Queries.qualityClassifierScore(spark, sfDir).collect()
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      val pm = r.getAs[Long]("keep_permyriad")
      assert(pm >= 0L && pm <= 10000L)
      assert(r.getAs[Long]("score_avg") > 0L)
    }
  }

  test("perplexity filter: KN probabilities sum to 1 per context; scores negative and bucketed consistently") {
    import org.apache.spark.sql.functions._
    // independent re-derivation of the KN mass: for every left context l,
    // sum_r P(r|l) must be exactly 1 (the smoothing redistributes the
    // discounted mass, it never creates or destroys any)
    val bg = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(graft.functions.TextOps.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .selectExpr("explode(zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), (x, y) -> struct(x AS l, y AS r))) AS p")
      .select(col("p.l").as("l"), col("p.r").as("r"))
    val cnt = bg.groupBy("l", "r").count().collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val cl = cnt.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val n1p = cnt.groupBy(_._1._1).map { case (l, m) => l -> m.size.toLong }
    val nleft = cnt.groupBy(_._1._2).map { case (r, m) => r -> m.size.toLong }
    val nb = cnt.size.toLong
    cl.keys.foreach { l =>
      val mass = cnt.collect {
        case ((`l`, r), c) =>
          (c - 0.75) / cl(l) + 0.75 * n1p(l) / cl(l) * nleft(r) / nb
      }.sum +
        // unseen continuations of l still receive backoff mass
        nleft.collect { case (r, nl) if !cnt.contains((l, r)) => 0.75 * n1p(l) / cl(l) * nl.toDouble / nb }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"KN mass for context '$l' = $mass")
    }
    val rows = Queries.perplexityFilter(spark, sfDir).collect()
    val totalBigrams = cnt.values.sum
    assert(rows.map(_.getAs[Long]("n_bigrams")).sum === totalBigrams)
    rows.foreach { r =>
      val mean = r.getAs[Long]("mean_logp_micro")
      assert(mean < 0L, "log-probs are negative")
      assert(r.getAs[Long]("ppl_bucket_halfnat") === (-mean) / 500000L)
      assert(r.getAs[Long]("keep") === (if (mean >= -3400000L) 1L else 0L))
    }
  }

  test("bpe encode: per-doc counts bounded, merges actually compress") {
    import org.apache.spark.sql.functions._
    val rows = Queries.bpeEncode(spark, sfDir).collect()
    rows.foreach { r =>
      val (nw, nc, nt) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"))
      assert(nw >= 1L && nt >= nw, "at least one token per word")
      assert(nt <= nc, "merges only shrink the per-word symbol count")
      assert(r.getAs[Long]("chars_per_token_permille") >= 1000L)
      assert(r.getAs[Long]("chars_per_token_permille") === nc * 1000 / nt)
    }
    // chars re-derived independently: sum of [a-z]+ word lengths per doc
    val expectChars = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .agg(sum(length(col("w")))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_chars")).sum === expectChars)
    // three merge rounds on this corpus must compress: strictly fewer
    // tokens than characters in total
    assert(rows.map(_.getAs[Long]("n_tokens")).sum < expectChars)
  }

  test("weighted sample: k per stratum, deterministic replay, and the weighting genuinely biases the draw") {
    import org.apache.spark.sql.functions._
    val rows = Queries.weightedSample(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, ss) =>
      assert(ss.length === 5, s"$src: exactly k sampled")
      assert(ss.map(_.getAs[Int]("rn")).sorted.toSeq === (1 to 5))
    }
    // replayable randomness: a second evaluation draws the same sample
    val again = Queries.weightedSample(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
    // the ES property: weight = n_chars, so the sample's mean length
    // must exceed the population's (measured margin ~18% on this data)
    val sampleMean = rows.map(_.getAs[Long]("n_chars").toDouble).sum / rows.length
    val popMean = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .agg(avg(col("n_chars")))
      .head()
      .getDouble(0)
    assert(sampleMean > popMean, s"weighted draw must over-represent heavy docs: $sampleMean vs $popMean")
  }

  test("cdc apply: incremental path equals the declarative final state in every status group") {
    import org.apache.spark.sql.functions._
    val rows = Queries.cdcApply(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cdc_ok") === 1L, s"${r.getAs[String]("o_orderstatus")}: apply != direct")
    }
    // the op classes genuinely fire
    assert(rows.map(_.getAs[Long]("n_updated")).sum > 0L)
    assert(rows.map(_.getAs[Long]("n_deleted")).sum > 0L)
    // final row count closes: orders - deletes (inserts were the 10%
    // class of the same table, so n_after = n_orders - n_deleted)
    val nOrders = graft.sources.Tables.parquet(spark, sfDir, "orders").count()
    assert(rows.map(_.getAs[Long]("n_after")).sum === nOrders - rows.map(_.getAs[Long]("n_deleted")).sum)
  }

  test("rfm segments: quintile census partitions the customers, ranks stay in 1..5") {
    val rows = Queries.rfmSegments(spark, sfDir).collect()
    val nCust = graft.sources.Tables
      .parquet(spark, sfDir, "orders")
      .select("o_custkey")
      .distinct()
      .count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCust)
    rows.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val q = r.getAs[Long](c)
        assert(q >= 1L && q <= 5L, s"$c=$q out of range")
      }
      assert(r.getAs[Long]("avg_cents") > 0L)
    }
    // each single dimension's quintiles are near-equal-sized by the
    // exact integer cut: marginal sums per r_q within 1 of n/5 ± ties
    val byR = rows.groupBy(_.getAs[Long]("r_q")).view.mapValues(_.map(_.getAs[Long]("n_customers")).sum)
    assert(byR.values.max - byR.values.min <= 1L, s"quintile sizes must be balanced: $byR")
  }

  test("frequent pairs: downward closure holds and metrics are internally consistent") {
    val rows = Queries.frequentPairs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nb, c1, c2) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_p1"), r.getAs[Long]("n_p2"))
      // downward closure: a frequent pair's items are frequent, and the
      // pair support never exceeds either item's support
      assert(nb >= 3L && c1 >= 3L && c2 >= 3L)
      assert(nb <= c1 && nb <= c2)
      assert(r.getAs[Long]("conf_p1_to_p2_permille") === nb * 1000 / c1)
      assert(r.getAs[Long]("lift_permille") > 0L)
    }
  }

  test("dedup retention: per-source accounting closes and totals match the funnel's drop universe") {
    val rows = Queries.dedupRetention(spark, sfDir).collect()
    val total = graft.sources.Tables.parquet(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      assert(
        r.getAs[Long]("n_kept") ===
          r.getAs[Long]("n_docs") - r.getAs[Long]("n_exact_dropped") - r.getAs[Long]("n_neardup_dropped")
      )
      val pm = r.getAs[Long]("keep_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
    // the near-dup rule really fires on this corpus
    assert(rows.map(_.getAs[Long]("n_neardup_dropped")).sum > 0L)
  }

  test("rank rbo: bounded by perfect agreement, disjoint lists score zero") {
    val rows = Queries.rankRbo(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // perfect agreement: every common pair sits at (m, m) and
    // contributes tail(m), so the maximum score is Σ tail(m) — the
    // truncated-RBO mass of two identical top-10 lists (≈ 0.67e9)
    val tails = graft.functions.NumOps.rboTailNanos(10, 0.9)
    val perfectScore = tails.sum
    assert(perfectScore > 600000000L && perfectScore < 1000000000L)
    rows.foreach { r =>
      val v = r.getAs[Long]("rbo_nanos")
      assert(v >= 0L && v <= perfectScore, s"qid ${r.getAs[Long]("qid")}: rbo $v outside [0, $perfectScore]")
      if (r.getAs[Long]("n_common") == 0L) assert(v === 0L)
      if (r.getAs[Long]("n_common") == 10L) assert(v > 0L)
    }
  }

  test("vocab growth: buckets partition docs, cumulative total equals the per-source vocabulary") {
    import org.apache.spark.sql.functions._
    val rows = Queries.vocabGrowth(spark, sfDir).collect()
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val vocabPerSource = docs
      .select(col("source"), explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .distinct()
      .groupBy("source")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, bs) =>
      val sorted = bs.sortBy(_.getAs[Long]("bucket"))
      assert(sorted.map(_.getAs[Long]("bucket")).toSeq === (0L to 4L), s"$src: five buckets")
      assert(sorted.last.getAs[Long]("cum_types") === vocabPerSource(src), s"$src: growth curve must end at |V|")
      // monotone growth; the first bucket carries the bulk on this
      // small-vocab corpus
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("cum_types") <= b.getAs[Long]("cum_types"))
      }
      assert(sorted.head.getAs[Long]("n_new_types") >= sorted.last.getAs[Long]("n_new_types"))
    }
  }

  test("source vocab overlap: symmetric-pair coverage, jaccard bounded by containment, sizes honest") {
    import org.apache.spark.sql.functions._
    val rows = Queries.sourceVocabOverlap(spark, sfDir).collect()
    val nSources = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select("source")
      .distinct()
      .count()
    assert(rows.length === nSources * (nSources - 1) / 2, "one row per unordered source pair")
    rows.foreach { r =>
      val (j, c) = (r.getAs[Long]("jaccard_permille"), r.getAs[Long]("containment_permille"))
      assert(j >= 0L && j <= c && c <= 1000L, "jaccard never exceeds containment")
      assert(r.getAs[Long]("n_shared") <= math.min(r.getAs[Long]("n1"), r.getAs[Long]("n2")))
    }
  }

  test("classifier gains: deciles partition the corpus and the full-corpus lift is exactly 1") {
    val rows = Queries.classifierGains(spark, sfDir).collect().sortBy(_.getAs[Long]("decile"))
    val total = graft.sources.Tables.parquet(spark, sfDir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    assert(rows.last.getAs[Long]("cum_lift_permille") === 1000L, "keeping everything is lift 1 by definition")
    rows.foreach { r =>
      val pm = r.getAs[Long]("pass_permille")
      assert(pm >= 0L && pm <= 1000L)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
    }
  }

  test("held-out perplexity: backoff branches fire on novel text and scores stay ordered") {
    import org.apache.spark.sql.functions._
    // the shared corpus has a 31-word vocab, so every test bigram is
    // train-seen and the backoff branches never execute there — build a
    // synthetic corpus where one TEST doc carries novel vocabulary
    val ids = spark
      .range(0, 40)
      .select(col("id"), (graft.functions.TextOps.hash32(col("id").cast("string")) % 10 === 0).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
    val testId = ids.collectFirst { case (i, true) => i }.get
    val dir = java.nio.file.Files.createTempDirectory("graft_heldout").toString
    import spark.implicits._
    ids.toSeq
      .map { case (i, isTest) =>
        val text =
          if (i == testId) "alpha beta zzznovel qqnovel alpha beta"
          else "alpha beta gamma delta alpha beta gamma"
        (i, text, "en", "src01", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Queries.heldoutPerplexity(spark, dir).collect()
    val novel = rows.find(_.getAs[Long]("doc_id") == testId).get
    // "beta zzznovel" = seen context, unseen continuation; "zzznovel
    // qqnovel" + "qqnovel alpha" = unseen contexts
    assert(novel.getAs[Long]("n_unseen_bigrams") >= 1L, "seen-context/unseen-bigram branch must fire")
    assert(novel.getAs[Long]("n_unseen_contexts") >= 2L, "unseen-context branch must fire")
    assert(novel.getAs[Long]("mean_logp_micro") < 0L)
    // novel vocabulary must score strictly worse than in-distribution
    // test docs (if any other test doc exists)
    rows.filter(_.getAs[Long]("doc_id") != testId).foreach { r =>
      assert(r.getAs[Long]("mean_logp_micro") > novel.getAs[Long]("mean_logp_micro"))
    }
    // on the real corpus the query still runs with zero backoff hits
    val real = Queries.heldoutPerplexity(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach(r => assert(r.getAs[Long]("mean_logp_micro") < 0L))
  }

  test("curation funnel v2: stages chain (n_out feeds the next n_in) and close against the standalone gates") {
    import org.apache.spark.sql.functions._
    val byStage = Queries.curationFunnelV2(spark, sfDir).collect().map(r => r.getString(0) -> r).toMap
    val order = Seq("rules", "perplexity", "typicality", "exact_dedup")
    order.zip(order.tail).foreach { case (a, b) =>
      assert(byStage(a).getAs[Long]("n_out") === byStage(b).getAs[Long]("n_in"), s"$a -> $b must chain")
    }
    order.foreach { st =>
      val r = byStage(st)
      assert(r.getAs[Long]("n_out") <= r.getAs[Long]("n_in"))
      assert(r.getAs[Long]("n_dropped") === r.getAs[Long]("n_in") - r.getAs[Long]("n_out"))
    }
    assert(byStage("rules").getAs[Long]("n_in") === graft.sources.Tables.parquet(spark, sfDir, "documents").count())
    // the perplexity stage must agree with the standalone q237 gate on
    // rule-passing docs (q92's predicates recomputed here)
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    val ws = graft.functions.TextOps.tokens(col("text"))
    val nW = size(ws)
    val sl = length(regexp_replace(trim(col("text")), "\\s+", ""))
    val nStop = size(filter(ws, w => w.isInCollection(Seq("the", "a", "and", "is", "of"))))
    val rulesPass = docs
      .filter(nW >= 30 && nW <= 600 && sl >= nW * 3 && sl <= nW * 6 && nStop * 50 >= nW && size(array_distinct(ws)) * 5 >= nW)
      .select("doc_id")
    val q237Keep = Queries.perplexityFilter(spark, sfDir).filter(col("keep") === 1).select("doc_id")
    assert(byStage("perplexity").getAs[Long]("n_out") === rulesPass.join(q237Keep, Seq("doc_id")).count())
  }

  test("dynamic-gap sessions: totals close, sessions disjoint per user, purchase gap really extends") {
    import org.apache.spark.sql.functions._
    val rows = Queries.dynamicGapSessions(spark, sfDir).collect()
    val nEvents = graft.sources.Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents, "every event lands in exactly one session")
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_.getAs[Long]("start_ms"))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[Long]("end_ms") < b.getAs[Long]("start_ms") ||
          (a.getAs[Long]("end_ms") == b.getAs[Long]("start_ms")),
          s"user $u sessions overlap")
      }
    }
    rows.foreach { r =>
      val span = r.getAs[Long]("end_ms") - r.getAs[Long]("start_ms")
      // the window extends past the last event by its gap: at least 12 h
      assert(span >= 12L * 3600 * 1000, s"session span $span shorter than the smallest gap")
      assert(r.getAs[Long]("n_purchase") <= r.getAs[Long]("n_events"))
    }
    // fixed 12 h everywhere would split strictly more sessions than the
    // dynamic rule (24 h purchase extensions bridge some gaps)
    val fixed = graft.sources.Tables
      .events(spark, sfDir)
      .groupBy(col("user_id"), session_window(col("ts"), "12 hours"))
      .count()
      .count()
    assert(rows.length <= fixed, "dynamic gaps can only merge sessions relative to the 12h-everywhere rule")
  }

  test("doc typicality: KL non-negative within fixed-point slack and reproduces a direct recomputation") {
    import org.apache.spark.sql.functions._
    val rows = Queries.docTypicality(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // Gibbs: KL >= 0; the micro-nat fixed point can dip a few units
    // below zero from truncation, never more
    rows.foreach { r =>
      assert(r.getAs[Long]("kl_micro") >= -5L, s"doc ${r.getAs[Long]("doc_id")}: KL ${r.getAs[Long]("kl_micro")}")
      assert(r.getAs[Long]("typical") === (if (r.getAs[Long]("kl_micro") <= 500000L) 1L else 0L))
    }
    // direct recomputation for one document
    def mn(v: Long): Long = math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong
    val docId = rows.head.getAs[Long]("doc_id")
    val toks = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(col("doc_id"), explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
    val corpus = toks.groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nn = corpus.values.sum
    val dc = toks.filter(col("doc_id") === docId).groupBy("w").count().collect().map(r => (r.getString(0), r.getLong(1)))
    val n = dc.map(_._2).sum
    val part = dc.map { case (w, c) => c * (mn(c) - mn(corpus(w))) }.sum
    assert(rows.head.getAs[Long]("kl_micro") === part / n + mn(nn) - mn(n))
  }

  test("group by all lowers to the explicit grouping; lateral alias chain reproduces its own arithmetic") {
    import org.apache.spark.sql.functions._
    val sugar = Queries.groupByAll(spark, sfDir).collect()
    val explicit = graft.sources.Tables
      .parquet(spark, sfDir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice").cast("decimal(25,6)")).cast("double").as("total"))
      .orderBy("o_orderstatus", "o_orderpriority")
      .collect()
    assert(sugar.toSeq === explicit.toSeq)
    Queries.lateralAliases(spark, sfDir).collect().foreach { r =>
      val rev = r.getAs[Long]("revenue_cents")
      assert(r.getAs[Long]("est_cost_cents") === rev * 25 / 100)
      assert(r.getAs[Long]("margin_cents") === rev - rev * 25 / 100)
      assert(r.getAs[Long]("margin_per_item_cents") === r.getAs[Long]("margin_cents") / r.getAs[Long]("n_items"))
    }
  }

  test("entropy report: micro-nat entropies reproduce a direct recomputation and respect the ln(V) bound") {
    import org.apache.spark.sql.functions._
    val rows = Queries.entropyReport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def mn(v: Long): Long = math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong
    rows.foreach { r =>
      val h1 = r.getAs[Long]("h_unigram_micro")
      // entropy is non-negative and bounded by ln(vocab) (+1 micro-nat
      // of fixed-point slack)
      assert(h1 >= 0L && h1 <= mn(r.getAs[Long]("n_vocab")) + 1)
      // each next token carries SOME new information on natural-ish text
      assert(r.getAs[Long]("h_cond_micro") > 0L)
      assert(r.getAs[Long]("h_bigram_micro") <= 2 * h1 + 2, "H(bigram) <= 2 H(unigram) for near-independent tokens")
    }
    // direct recomputation for one source
    val src = rows.head.getAs[String]("source")
    val counts = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .filter(col("source") === src)
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w")
      .count()
      .collect()
      .map(_.getLong(1))
    val n = counts.sum
    val expected = mn(n) - counts.map(c => c * mn(c)).sum / n
    assert(rows.head.getAs[Long]("h_unigram_micro") === expected)
  }

  test("skew report: Gini reproduces a direct recomputation; bounds hold") {
    import org.apache.spark.sql.functions._
    val rows = Queries.skewReport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_permyriad")
      assert(g >= 0L && g < 10000L, s"gini out of range: $g")
      assert(r.getAs[Long]("top_share_permille") <= 1000L)
      // hottest key sits at or above the average by construction
      assert(r.getAs[Long]("hot_key_factor_permille") >= 1000L)
    }
    // direct recomputation for one event type
    val et = rows.head.getAs[String]("event_type")
    val cnts = graft.sources.Tables
      .events(spark, sfDir)
      .filter(col("event_type") === et)
      .groupBy("user_id")
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (u, c) => (c, u) }
      .map(_._2)
    val n = cnts.length.toLong
    val s0 = cnts.sum
    val sic = cnts.zipWithIndex.map { case (c, i) => (i + 1) * c }.sum
    assert(rows.head.getAs[Long]("gini_permyriad") === (2 * sic - (n + 1) * s0) * 10000 / (n * s0))
  }

  test("blocking quality: counts consistent, rates bounded, candidates bounded by the pair space") {
    val r = Queries.blockingQuality(spark, sfDir).head()
    val (nDocs, nPoss) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_possible_pairs"))
    assert(nPoss === nDocs * (nDocs - 1) / 2)
    assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_truth"))
    assert(r.getAs[Long]("n_candidates") <= nPoss)
    val cp = r.getAs[Long]("completeness_permille")
    val rr = r.getAs[Long]("reduction_permyriad")
    assert(cp >= 0L && cp <= 1000L)
    assert(rr >= 0L && rr <= 10000L)
    // the evaluation is non-trivial on this corpus: the blocker prunes
    // nearly everything yet still surfaces most confirmed duplicates
    assert(rr >= 9000L, s"simhash blocking must prune >90% of the pair space, got $rr permyriad")
    assert(cp >= 500L, s"simhash blocking must surface most confirmed duplicates, got $cp permille")
  }

  test("quantile sketch: every estimate lands within one grid of the true order statistic; partial merge closes") {
    val rows = Queries.quantileSketch(spark, sfDir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("within_grid") === 1L, s"q=${r.getAs[Long]("q_permille")}: estimate outside the grid bound")
      assert(r.getAs[Long]("merge_ok") === 1L, "orderstatus partials must merge to the direct sketch")
      val err = r.getAs[Long]("err_cents")
      assert(err >= 0L && err < 65536L)
    }
    // quantile estimates are monotone in the target rank
    val ests = rows.sortBy(_.getAs[Long]("q_permille")).map(_.getAs[Long]("est_cents"))
    assert(ests.zip(ests.tail).forall { case (a, b) => a <= b })
  }

  test("oov report: rates bounded, truncation really creates OOV, totals close against the raw token count") {
    import org.apache.spark.sql.functions._
    val rows = Queries.oovReport(spark, sfDir).collect()
    val totalTokens = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalTokens)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_oov_types") <= r.getAs[Long]("n_types"))
      val pm = r.getAs[Long]("oov_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
    // the corpus vocabulary exceeds the 25-word cap, so SOME source
    // must see out-of-vocabulary tokens
    assert(rows.map(_.getAs[Long]("n_oov")).sum > 0L)
  }

  test("memorization probe: only test docs, shares bounded, prints close against the winnowed selection") {
    import org.apache.spark.sql.functions._
    val rows = Queries.memorizationProbe(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val testIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val expected = graft.operators.NearDup
      .winnowedFingerprints(graft.sources.Tables.parquet(spark, sfDir, "documents"), col("doc_id"), col("text"))
      .withColumn("is_test", graft.functions.TextOps.hash32(col("doc_id").cast("string")) % 10 === 0)
      .filter(col("is_test"))
      .groupBy("doc_id")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(testIds === expected.keySet, "exactly the test docs that have prints")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_prints") === expected(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_prints"))
      val pm = r.getAs[Long]("shared_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
  }

  test("ivm join: the two-sided delta identity closes against the full recompute in every group") {
    val rows = Queries.ivmJoinMerge(spark, sfDir).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("ivm_ok") === 1L, s"${r.getAs[String]("o_orderpriority")}: incremental != full")
      assert(r.getAs[Long]("n_incremental") === r.getAs[Long]("n_full"))
    }
    // both splits genuinely contribute: some rows flow through the
    // delta terms, most through the stored snapshot join
    assert(rows.map(_.getAs[Long]("n_delta_join")).sum > 0L)
    assert(rows.map(_.getAs[Long]("n_snap_join")).sum > rows.map(_.getAs[Long]("n_delta_join")).sum)
  }

  test("zipf fit: slope reproduces a BigInt recomputation from raw counts; non-positive on rank-ordered data") {
    import org.apache.spark.sql.functions._
    val rows = Queries.zipfFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("slope_milli") <= 0L, "frequency is non-increasing in rank"))
    // independent recomputation for one source with BigInt arithmetic
    val src = rows.head.getAs[String]("source")
    val freqs = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .filter(col("source") === src)
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w")
      .count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (w, f) => (-f, w) }
    def mn(v: Long): BigInt = BigInt(math.floor(math.log(v.toDouble) * 1e6 + 0.5).toLong)
    val xy = freqs.zipWithIndex.map { case ((_, f), i) => (mn(i + 1L), mn(f)) }
    val n = BigInt(xy.length)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum; val sxy = xy.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) * 1000 / (n * sxx - sx * sx)
    assert(rows.head.getAs[Long]("n_vocab") === xy.length.toLong)
    assert(BigInt(rows.head.getAs[Long]("slope_milli")) === slope, s"slope mismatch for $src")
  }

  test("perplexity report: the source histogram closes against the per-doc scores") {
    import org.apache.spark.sql.functions._
    val report = Queries.perplexityReport(spark, sfDir).collect()
    val perDoc = Queries.perplexityFilter(spark, sfDir)
    assert(report.map(_.getAs[Long]("n_docs")).sum === perDoc.count())
    assert(report.map(_.getAs[Long]("n_keep")).sum === perDoc.agg(sum(col("keep"))).head().getLong(0))
    report.foreach { r =>
      assert(r.getAs[Long]("n_keep") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("avg_mean_logp_micro") < 0L)
      // bucket k holds means in (-(k+1)·0.5, -k·0.5] nats — the keep
      // gate at -3.4 nats cannot pass anything in bucket 7+
      if (r.getAs[Long]("ppl_bucket_halfnat") >= 7L) assert(r.getAs[Long]("n_keep") === 0L)
    }
  }

  test("collated census: CI_AI grouping merges the injected variants; keyword join crosses case and accents") {
    import org.apache.spark.sql.functions._
    val rows = Queries.collatedCensus(spark, sfDir).collect()
    val norms = rows.map(_.getAs[String]("w_norm"))
    assert(norms.distinct.length === norms.length, "one row per collated group")
    assert(norms.forall(w => w.matches("^[a-z]+$")), "normalized keys are plain lowercase ascii")
    // every token of the corpus lands in exactly one group
    val totalTokens = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .count()
    assert(rows.map(_.getAs[Long]("n_total")).sum === totalTokens)
    // the (doc_id+pos) jitter injects upper/accent variants: collation
    // must fold several spellings per frequent token, never more than
    // the 4 constructible forms
    rows.foreach { r =>
      val nv = r.getAs[Long]("n_variants")
      assert(nv >= 1L && nv <= 4L, s"${r.getAs[String]("w_norm")}: $nv variants")
    }
    assert(rows.count(_.getAs[Long]("n_variants") >= 3L) > 5, "frequent tokens fold at least 3 spellings")
    // collated equality crosses case ('SPARK', 'QUERY'), accents
    // ('Tablé') and the identity case ('agg')
    val keywords = rows.filter(_.getAs[Long]("is_keyword") == 1L).map(_.getAs[String]("w_norm")).sorted
    assert(keywords === Array("agg", "query", "spark", "table"))
  }

  test("nfc vocab fold: decomposed forms collapse to the type count; nfc join recovers every accented pair") {
    val rows = Queries.nfcVocabFold(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTypes = r.getAs[Long]("n_types")
      // NFC distinct-form count must collapse exactly back to types
      assert(r.getAs[Long]("n_nfc_forms") === nTypes, s"${r.getAs[String]("source")}: NFC must fold both forms")
      // the raw byte join only matches accent-free tokens; the nfc join matches all
      assert(r.getAs[Long]("n_join_nfc") === nTypes)
      assert(r.getAs[Long]("n_join_raw") < r.getAs[Long]("n_join_nfc"), "some tokens must carry the accent")
      // decomposed form is one byte longer per accent: raw > nfc bytes
      assert(r.getAs[Long]("raw_bytes") > r.getAs[Long]("nfc_bytes"))
      assert(r.getAs[Long]("n_raw_forms") > nTypes, "composed and decomposed forms must differ raw")
    }
  }

  test("ann index lifecycle: the stored-index serve path reproduces the in-memory probe bit-for-bit") {
    val rows = Queries.annIndexLifecycle(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("eq_direct") === 1L, s"qid ${r.getAs[Long]("qid")} rnk ${r.getAs[Int]("rnk")} diverged"))
    // and the four index tables really landed on disk — at the paths
    // the shared store actually serves from (the old fixed-/tmp-name
    // assertion outlived the AnnIndex refactor and only passed off
    // stale container state)
    val paths = graft.operators.AnnIndex.stored(spark, sfDir).paths
    Seq(paths.centroids, paths.codebooks, paths.corpusCells, paths.pqCodes).foreach { t =>
      assert(graft.sources.GraftFs.listDataFiles(t).nonEmpty, s"index table $t missing")
    }
  }

  test("shard pack: every doc lands in exactly one shard, budgets fill, order is seed-deterministic") {
    val rows = Queries.shardPack(spark, sfDir).collect().sortBy(_.getAs[Long]("shard_id"))
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents")
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // shard ids are dense from 0
    assert(rows.map(_.getAs[Long]("shard_id")).toSeq === rows.indices.map(_.toLong))
    // every shard except the last is filled to at least the budget
    // minus one doc's worth (a doc STARTS in the shard where its first
    // token lands, so fill ≥ budget − (max doc tokens − 1))
    val maxDocTok = docs
      .select(graft.functions.TextOps.tokenCount(org.apache.spark.sql.functions.col("text")).cast("long"))
      .collect()
      .map(_.getLong(0))
      .max
    rows.init.foreach { r =>
      assert(r.getAs[Long]("shard_tokens") > 2048L - maxDocTok, s"shard ${r.getAs[Long]("shard_id")} underfilled")
    }
    // replaying the query gives the identical packing (seeded order)
    val again = Queries.shardPack(spark, sfDir).collect().sortBy(_.getAs[Long]("shard_id"))
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("trigram perplexity: all three backoff branches fire on novel text; trigram beats bigram on in-distribution docs") {
    import org.apache.spark.sql.functions._
    val ids = spark
      .range(0, 40)
      .select(col("id"), (graft.functions.TextOps.hash32(col("id").cast("string")) % 10 === 0).as("t"))
      .collect()
      .map(r => r.getLong(0) -> r.getBoolean(1))
    val testId = ids.collectFirst { case (i, true) => i }.get
    val dir = java.nio.file.Files.createTempDirectory("graft_trigram").toString
    import spark.implicits._
    ids.toSeq
      .map { case (i, isTest) =>
        val text =
          if (i == testId) "alpha beta gamma zzznovel qqnovel alpha beta gamma delta"
          else "alpha beta gamma delta alpha beta gamma delta epsilon"
        (i, text, "en", "src01", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Queries.trigramPerplexity(spark, dir).collect()
    val novel = rows.find(_.getAs[Long]("doc_id") == testId).get
    // "beta gamma zzznovel" = seen context, unseen continuation (bigram
    // backoff); "gamma zzznovel *", "zzznovel qqnovel *", ... = unseen
    // trigram contexts (full backoff)
    assert(novel.getAs[Long]("n_backoff_bigram") >= 1L, "seen-context/unseen-trigram branch must fire")
    assert(novel.getAs[Long]("n_backoff_full") >= 2L, "unseen-context branch must fire")
    assert(novel.getAs[Long]("mean_logp_micro") < 0L)
    rows.filter(_.getAs[Long]("doc_id") != testId).foreach { r =>
      assert(r.getAs[Long]("mean_logp_micro") > novel.getAs[Long]("mean_logp_micro"))
    }
    // On the real corpus every score stays a negative micro-nat.
    // Measured discovery (kept as a bound, not a hope): the shared
    // corpus is near-random word choice over a ~31-word vocab, so the
    // longer context carries NO extra signal — the trigram model pays
    // its discount/backoff mass without predictive gain, and the
    // median per-doc delta vs the bigram model is slightly NEGATIVE
    // (≈ −0.22 nats). That is the textbook sparsity trade a deeper
    // n-gram makes on unstructured text; on real language the sign
    // flips. The bound asserts the two models stay within 1 nat —
    // a regression in either model's branch algebra would blow it.
    val tri = Queries.trigramPerplexity(spark, sfDir).collect()
    assert(tri.nonEmpty)
    tri.foreach(r => assert(r.getAs[Long]("mean_logp_micro") < 0L))
    val bi = Queries
      .heldoutPerplexity(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("mean_logp_micro"))
      .toMap
    val deltas = tri.map(r => r.getAs[Long]("mean_logp_micro") - bi(r.getAs[Long]("doc_id"))).sorted
    val median = deltas(deltas.length / 2)
    assert(math.abs(median) < 1000000L, s"trigram vs bigram median delta $median µnats out of band")
  }

  test("lsh band sweep: candidates grow and precision falls as bands narrow; recall is monotone in bands") {
    val rows = Queries.lshBandSweep(spark, sfDir).collect().sortBy(_.getAs[Int]("bands"))
    assert(rows.map(_.getAs[Int]("bands")).toSeq === Seq(2, 4, 8))
    assert(rows.map(_.getAs[Long]("n_truth")).distinct.length === 1, "truth set is config-independent")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_cand") <= b.getAs[Long]("n_cand"), "more bands can only add candidates")
      assert(a.getAs[Long]("recall_permille") <= b.getAs[Long]("recall_permille"))
      assert(a.getAs[Long]("precision_permille") >= b.getAs[Long]("precision_permille"))
    }
    rows.foreach(r => assert(r.getAs[Long]("n_hit") <= math.min(r.getAs[Long]("n_cand"), r.getAs[Long]("n_truth"))))
  }

  test("temperature mix: T=2 boosts small sources above proportional and shares stay normalized") {
    val rows = Queries.temperatureMix(spark, sfDir).collect()
    assert(rows.length > 1)
    val p = rows.map(_.getAs[Long]("p_permille")).sum
    val q = rows.map(_.getAs[Long]("q_permille")).sum
    // truncating integer shares: sum in (1000 − |S|, 1000]
    assert(p > 1000L - rows.length && p <= 1000L)
    assert(q > 1000L - rows.length && q <= 1000L)
    // boost ∝ 1/sqrt(n): strictly anti-monotone in token count
    val byTok = rows.sortBy(_.getAs[Long]("n_tokens"))
    byTok.sliding(2).foreach { case Array(a, b) =>
      if (a.getAs[Long]("n_tokens") < b.getAs[Long]("n_tokens"))
        assert(a.getAs[Long]("boost_permille") >= b.getAs[Long]("boost_permille"),
          s"${a.getAs[String]("source")} vs ${b.getAs[String]("source")}: smaller source must boost at least as much")
    }
    // the smallest source is upsampled, the largest downsampled
    assert(byTok.head.getAs[Long]("boost_permille") > 1000L)
    assert(byTok.last.getAs[Long]("boost_permille") < 1000L)
  }

  test("k-anonymity ladder: coarser generalization monotonically shrinks groups and suppression; rows conserved") {
    val rows = Queries.kAnonymity(spark, sfDir).collect().sortBy(_.getAs[String]("level"))
    assert(rows.map(_.getAs[String]("level")).toSeq === Seq("1_day", "2_month", "3_year", "4_dropped"))
    assert(rows.map(_.getAs[Long]("n_rows")).distinct.length === 1, "generalization never drops rows")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_groups") >= b.getAs[Long]("n_groups"))
      assert(a.getAs[Long]("n_suppressed") >= b.getAs[Long]("n_suppressed"),
        "coarser QI can only merge groups above the k threshold")
    }
    rows.foreach(r => assert(r.getAs[Long]("n_suppressed") < 5L * r.getAs[Long]("n_small_groups") + 1L))
  }

  test("next-event dataset: example count closes against per-user sequence lengths; both splits populated") {
    import org.apache.spark.sql.functions._
    val rows = Queries.nextEventDataset(spark, sfDir).collect()
    // every user with n events contributes exactly max(0, n−2) examples
    val expected = graft.sources.Tables
      .events(spark, sfDir)
      .groupBy("user_id")
      .agg(greatest(count(lit(1)) - 2, lit(0L)).as("n"))
      .agg(sum("n"))
      .head()
      .getLong(0)
    assert(rows.map(_.getAs[Long]("n_examples")).sum === expected)
    val splits = rows.map(_.getAs[String]("split")).distinct.sorted
    assert(splits.toSeq === Seq("train", "valid"))
    val tr = rows.filter(_.getAs[String]("split") == "train").map(_.getAs[Long]("n_examples")).sum
    val va = rows.filter(_.getAs[String]("split") == "valid").map(_.getAs[Long]("n_examples")).sum
    // 80/20 hash split within binomial slack
    assert(math.abs(tr * 10 - (tr + va) * 8) < (tr + va), s"split skewed: train=$tr valid=$va")
    rows.foreach(r => assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_examples")))
  }

  test("bucket resample: the kept corpus is strictly flatter across length buckets") {
    val rows = Queries.bucketResample(spark, sfDir).collect()
    assert(rows.length > 2)
    def tvd(shares: Seq[Long]): Long = {
      val u = 1000L / shares.length
      shares.map(x => math.abs(x - u)).sum
    }
    val before = tvd(rows.map(_.getAs[Long]("share_before_permille")).toSeq)
    val after = tvd(rows.map(_.getAs[Long]("share_after_permille")).toSeq)
    assert(after < before, s"resample must flatten: TVD before=$before after=$after")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
      assert(r.getAs[Long]("accept_permille") <= 1000L)
      // the hash gate lands within binomial slack of the target rate
      val want = r.getAs[Long]("n_before") * r.getAs[Long]("accept_permille") / 1000L
      assert(math.abs(r.getAs[Long]("n_after") - want) <= math.max(8L, want / 4), s"bucket ${r.getAs[Long]("bucket")}")
    }
  }

  test("consistent-hash resize: rendezvous moves ~1/(N+1) of keys, mod moves ~N/(N+1)") {
    val rows = Queries.consistentHashResize(spark, sfDir).collect().map(r => r.getAs[String]("scheme") -> r).toMap
    val mod = rows("1_mod").getAs[Long]("moved_permille")
    val rv = rows("2_rendezvous").getAs[Long]("moved_permille")
    // N=8 -> 9: theory says mod ≈ 8/9 ≈ 889‰, rendezvous ≈ 1/9 ≈ 111‰
    assert(math.abs(mod - 889) < 80, s"mod moved $mod permille, expected ~889")
    assert(math.abs(rv - 111) < 80, s"rendezvous moved $rv permille, expected ~111")
    assert(rv * 4 < mod, "rendezvous must move far fewer keys than mod")
  }

  test("boolean retrieval: the cascade narrows monotonically and the index agrees with the scan at every stage") {
    val rows = Queries.booleanRetrieval(spark, sfDir).collect().sortBy(_.getAs[Int]("stage"))
    assert(rows.length === 3)
    rows.foreach(r => assert(r.getAs[Long]("index_eq_scan") === 1L, s"stage ${r.getAs[Int]("stage")} diverged"))
    assert(rows.head.getAs[Long]("n_matching") === rows.head.getAs[Long]("df"), "stage 1 is the first term's posting list")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("df") >= b.getAs[Long]("df"), "terms ordered by df desc")
      assert(a.getAs[Long]("n_matching") >= b.getAs[Long]("n_matching"), "intersection can only narrow")
    }
    rows.foreach(r => assert(r.getAs[Long]("n_matching") <= r.getAs[Long]("df")))
  }

  test("woe encoding: totals close, woe sign tracks the smoothed odds ratio, information value non-negative") {
    val rows = Queries.woeEncoding(spark, sfDir).collect()
    assert(rows.length === 5)
    val g = rows.map(_.getAs[Long]("n_good")).sum
    val b = rows.map(_.getAs[Long]("n_bad")).sum
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(g + b === n)
    rows.foreach { r =>
      val woe = r.getAs[Long]("woe_micro")
      // sign check against the smoothed cross-ratio the definition uses
      val lhs = (r.getAs[Long]("n_good") + 1) * (b + 5)
      val rhs = (r.getAs[Long]("n_bad") + 1) * (g + 5)
      assert((woe > 0) === (lhs > rhs) || woe == 0L)
      assert(r.getAs[Long]("iv_nano") >= -1000L, "IV contributions are non-negative up to smoothing slack")
    }
  }

  test("importance weights: every source reported, acceptance share within [0,1000], en-heavy docs score high") {
    val rows = Queries.importanceWeights(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pm = r.getAs[Long]("selected_permille")
      assert(pm >= 0L && pm <= 1000L)
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
    }
    // the target LM is trained on the 'en' slice: averaged over sources,
    // SOME docs must fall on each side of the acceptance boundary —
    // a degenerate all-positive or all-negative weighting means the
    // two LMs collapsed to the same distribution
    assert(rows.map(_.getAs[Long]("n_selected")).sum > 0, "nothing selected — target LM indistinguishable from raw")
    assert(rows.exists(r => r.getAs[Long]("n_selected") < r.getAs[Long]("n_docs")), "everything selected")
  }

  test("greedy decode: five seed chains, each step is the argmax continuation of the previous token") {
    val rows = Queries.greedyDecode(spark, sfDir).collect().sortBy(_.getAs[Int]("rnk"))
    assert(rows.length === 5)
    assert(rows.map(_.getAs[String]("seed")).distinct.length === 5)
    // recompute the transition argmax for row 1's seed directly
    val seed = rows.head.getAs[String]("seed")
    val s1 = rows.head.getAs[String]("s1")
    if (s1 != null) {
      import org.apache.spark.sql.functions._
      val bg = Queries // rebuild the bigram counts the query used
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val ws = graft.functions.TextOps.tokens(col("text"))
      val pairs = docs
        .select(ws.as("ws"))
        .filter(size(col("ws")) >= 2)
        .select(explode(expr("zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1), (x, y) -> struct(x AS l, y AS r))")).as("p"))
        .select(col("p.l").as("l"), col("p.r").as("r"))
        .filter(col("l") === seed)
        .groupBy("r")
        .agg(count(lit(1)).as("cnt"))
        .collect()
      val want = pairs.map(r => (r.getAs[Long]("cnt"), r.getAs[String]("r"))).sortBy { case (c, t) => (-c, t) }.head._2
      assert(s1 === want, s"step 1 from '$seed' should be the argmax continuation")
    }
  }

  test("tokenizer fertility: all five languages, fertility >= 1000 permille, TTR within (0, 1000]") {
    val rows = Queries.tokenizerFertility(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("lang")).sorted.toSeq === Seq("de", "en", "es", "fr", "zh"))
    rows.foreach { r =>
      assert(r.getAs[Long]("fertility_permille") >= 1000L, "BPE-floor tokens can never undercut whitespace words")
      val ttr = r.getAs[Long]("ttr_permille")
      assert(ttr > 0L && ttr <= 1000L)
      assert(r.getAs[Long]("chars_per_token_permille") > 0L)
    }
  }

  test("cluster label audit: census is complete, minority docs only exist inside multi-doc clusters") {
    val rows = Queries.clusterLabelAudit(spark, sfDir).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs, "every document lands in exactly one language row")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_minority") <= r.getAs[Long]("n_in_dup_clusters"),
        "a minority doc disagrees with its cluster majority, which needs at least a 2-doc cluster")
    }
  }

  test("frequent triples: support bounds respected, every triple's pairs are at least as supported") {
    val rows = Queries.frequentTriples(spark, sfDir).collect()
    assert(rows.nonEmpty, "sf0.001 has known support-2 triples")
    rows.foreach { r =>
      val (p1, p2, p3) = (r.getAs[Long]("p1"), r.getAs[Long]("p2"), r.getAs[Long]("p3"))
      assert(p1 < p2 && p2 < p3, "canonical ordering")
      assert(r.getAs[Long]("n_all") >= 2L)
      val conf = r.getAs[Long]("conf_pair_to_third_permille")
      assert(conf > 0L && conf <= 1000L, "support(abc) <= support(ab) makes confidence a probability")
    }
  }

  test("loo source value: identity mll_loo = mll_full + delta holds and ablating a source moves the normalizer") {
    val rows = Queries.looSourceAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(
        r.getAs[Long]("mll_loo_micro") === r.getAs[Long]("mll_full_micro") + r.getAs[Long]("delta_micro"),
        "delta is defined as the LOO-full difference"
      )
      assert(r.getAs[Long]("t_s") > 0L)
      assert(r.getAs[Long]("mll_full_micro") < 0L, "mean log-prob of a real corpus is negative")
    }
    assert(rows.map(_.getAs[Long]("delta_micro")).distinct.length > 1, "sources must not all ablate identically")
  }

  test("ht estimator audit: sampling rate tracks the stratum design and the HT ratio lands near 1000 permille") {
    val rows = Queries.htEstimatorAudit(spark, sfDir).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val rate = r.getAs[Int]("rate")
      assert(rate === r.getAs[String]("stratum").head.asDigit * 100)
      val sp = r.getAs[Long]("sampled_permille")
      assert(math.abs(sp - rate) < 120, s"stratum ${r.getAs[String]("stratum")}: sampled $sp permille at design rate $rate")
      val ratio = r.getAs[Long]("ht_ratio_permille")
      assert(ratio > 700L && ratio < 1300L, s"HT estimate off by ${ratio - 1000} permille")
    }
  }

  test("ann rerank: exact scores on the shortlist, every served neighbor ranked by true cosine") {
    val rows = Queries.annRerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val brute = Queries.annBruteForce(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Double]("sim")).toMap
    rows.foreach { r =>
      val (qid, nid) = (r.getAs[Long]("qid"), r.getAs[Long]("nid"))
      val rnk = r.getAs[Number]("rnk").longValue
      assert(rnk >= 1L && rnk <= 3L)
      // wherever the served neighbor also appears in the exact top-10,
      // the rerank must have assigned the identical exact cosine
      brute.get((qid, nid)).foreach(exact => assert(r.getAs[Double]("sim") === exact,
        s"rerank score for ($qid,$nid) diverged from the exact cosine"))
    }
    // per query, rank order must be non-increasing in sim
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Number]("rnk").longValue).map(_.getAs[Double]("sim"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
  }

  test("doremi reweight: shares normalize, factor moves against delta, valuable sources gain share") {
    val loo = Queries.looSourceAttribution(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("delta_micro")).toMap
    val rows = Queries.doremiReweight(spark, sfDir).collect()
    assert(rows.length === loo.size)
    val tot = rows.map(_.getAs[Long]("new_permille")).sum
    assert(math.abs(tot - 1000L) <= rows.length, s"new mixture sums to $tot permille (rounding slack only)")
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("factor") === math.max(1L, 1000000L - 10L * loo(src)),
        s"factor must be the linearized update of $src's delta")
    }
  }

  test("retrieval eval: monotone hits in k, recall <= 1000, precision@k consistent with hits") {
    val rows = Queries.retrievalEval(spark, sfDir).collect().sortBy(_.getAs[Int]("k"))
    assert(rows.map(_.getAs[Int]("k")).toSeq === Seq(1, 3, 10))
    val hits = rows.map(_.getAs[Long]("n_hits"))
    assert(hits.zip(hits.tail).forall { case (a, b) => a <= b }, "hits can only grow with k")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_gold"))
      assert(r.getAs[Long]("recall_permille") <= 1000L)
      assert(r.getAs[Long]("precision_permille") === r.getAs[Long]("n_hits") * 1000 / r.getAs[Int]("k"))
    }
  }

  test("packing efficiency: no-packing can never beat the perfect floor, waste shrinks as capacity shrinks") {
    val rows = Queries.packingEfficiency(spark, sfDir).collect().sortBy(_.getAs[Long]("cap"))
    assert(rows.map(_.getAs[Long]("cap")).toSeq === Seq(512L, 1024L, 2048L))
    rows.foreach { r =>
      val cap = r.getAs[Long]("cap")
      assert(r.getAs[Long]("n_seq_nopack") >= r.getAs[Long]("n_seq_packed"))
      assert(r.getAs[Long]("n_seq_nopack") * cap === r.getAs[Long]("total_tok") + r.getAs[Long]("pad_nopack_permille") * 0 +
        (r.getAs[Long]("n_seq_nopack") * cap - r.getAs[Long]("total_tok")), "arithmetic sanity")
      assert(r.getAs[Long]("pad_nopack_permille") >= 0L && r.getAs[Long]("pad_nopack_permille") < 1000L)
    }
    // larger capacity -> more padding waste per sequence when docs are short
    val waste = rows.map(_.getAs[Long]("pad_nopack_permille"))
    assert(waste.zip(waste.tail).forall { case (a, b) => a <= b }, s"waste should grow with capacity: ${waste.toSeq}")
  }

  test("stream drift monitor: four chunks, TVD within [0,1000], chunks jointly reproduce the reference") {
    val rows = Queries.streamDriftMonitor(spark, sfDir).collect()
    assert(rows.length === 4)
    assert(rows.map(_.getAs[Long]("chunk")).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val all = spark.read.parquet(s"$sfDir/events.parquet").count()
    assert(total === all, "chunks partition the corpus")
    rows.foreach { r =>
      val tvd = r.getAs[Long]("tvd_permille")
      assert(tvd >= 0L && tvd <= 1000L)
    }
  }

  test("conformal interval: exact 90% quantile yields held-out coverage near the guarantee") {
    val r = Queries.conformalInterval(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_cal") > 0L && r.getAs[Long]("n_test") > 0L)
    assert(r.getAs[Long]("q_hat") >= 0L)
    val cov = r.getAs[Long]("coverage_permille")
    // finite-sample wiggle around the 900 guarantee, but gross misses mean
    // the order statistic or the split is wrong
    assert(cov > 800L && cov <= 1000L, s"coverage $cov permille")
  }

  test("vocab coverage ladder: coverage grows with vocab size and complements OOV exactly") {
    val rows = Queries.vocabCoverageLadder(spark, sfDir).collect().sortBy(_.getAs[Int]("vsize"))
    assert(rows.map(_.getAs[Int]("vsize")).toSeq === Seq(1000, 2000, 4000))
    val covs = rows.map(_.getAs[Long]("coverage_permille"))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Int]("vsize").toLong)
      assert(r.getAs[Long]("coverage_permille") + r.getAs[Long]("oov_permille") <= 1000L + 1L)
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("total_tokens"))
    }
  }

  test("boilerplate scrub: every source reported and the scrub fraction is a valid permyriad") {
    val rows = Queries.boilerplateScrub(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_chunks"))
      val pm = r.getAs[Long]("boiler_permyriad")
      assert(pm >= 0L && pm <= 10000L)
    }
    // the synthetic corpus repeats passages across documents: a scrub
    // that finds NOTHING anywhere means the df threshold logic is dead
    assert(rows.map(_.getAs[Long]("n_boiler")).sum > 0L, "no boilerplate found in a corpus with known repetition")
  }

  test("epoch shuffle audit: ranks are permutations, footrule lands near the independence expectation") {
    val r = Queries.epochShuffleAudit(spark, sfDir).collect().head
    val n = r.getAs[Long]("n")
    assert(n > 0)
    assert(r.getAs[Long]("n_fixed") <= math.max(5L, n / 20), "far too many fixed points for independent epochs")
    val ratio = r.getAs[Long]("footrule_ratio_permille")
    assert(ratio > 700L && ratio < 1300L, s"footrule ratio $ratio permille — epochs are not independently shuffled")
  }

  test("exactly-once sink: a full second replay leaves the sink equal to the one-pass batch aggregate") {
    val rows = Queries.exactlyOnceSink(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("sink_eq_batch") === 1L,
      s"${r.getAs[String]("event_type")}: replay duplicated or lost rows"))
  }

  test("analyze table: one row per column, ndv bounded by rows, keys unique, canonical bounds ordered") {
    val rows = Queries.analyzeTable(spark, sfDir).collect()
    assert(rows.length === 6)
    val byName = rows.map(r => r.getAs[String]("cname") -> r).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n_rows") - r.getAs[Long]("n_null"))
      assert(r.getAs[String]("min_s") <= r.getAs[String]("max_s"))
    }
    val ok = byName("o_orderkey")
    assert(ok.getAs[Long]("ndv") === ok.getAs[Long]("n_rows"), "order keys are unique")
    assert(byName("o_orderstatus").getAs[Long]("ndv") <= 3L)
  }

  test("neyman allocation: budget is preserved up to rounding and volatile strata are oversampled vs proportional") {
    val rows = Queries.neymanAllocation(spark, sfDir).collect()
    assert(rows.length === 5)
    val neyman = rows.map(_.getAs[Long]("alloc_neyman")).sum
    val prop = rows.map(_.getAs[Long]("alloc_prop")).sum
    assert(math.abs(neyman - 1000L) <= rows.length && math.abs(prop - 1000L) <= rows.length)
    rows.foreach(r => assert(r.getAs[Long]("sd_milli") > 0L, "acctbal varies in every segment"))
    // the two schemes must actually differ somewhere, else the weighting is dead code
    assert(rows.exists(r => r.getAs[Long]("alloc_neyman") != r.getAs[Long]("alloc_prop")) ||
      rows.forall(r => math.abs(r.getAs[Long]("alloc_neyman") - r.getAs[Long]("alloc_prop")) <= 1))
  }

  test("matryoshka recall: the 64-dim control is exact, recall grows with dimensions") {
    val rows = Queries.matryoshkaRecall(spark, sfDir).collect().sortBy(_.getAs[Int]("dims"))
    assert(rows.map(_.getAs[Int]("dims")).toSeq === Seq(16, 32, 64))
    val r64 = rows.last
    assert(r64.getAs[Long]("recall_permille") === 1000L, "full-width truncation must reproduce the truth exactly")
    assert(r64.getAs[Long]("top1_match_permille") === 1000L)
    val recalls = rows.map(_.getAs[Long]("recall_permille"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b }, s"recall must not degrade with more dims: ${recalls.toSeq}")
  }

  test("length bucketing: sorting by length strictly reduces padding waste") {
    val rows = Queries.lengthBucketing(spark, sfDir).collect().sortBy(_.getAs[String]("strategy"))
    assert(rows.map(_.getAs[String]("strategy")).toSeq === Seq("1_arrival", "2_length_sorted"))
    val Array(arrival, sorted) = rows
    assert(arrival.getAs[Long]("total_tok") === sorted.getAs[Long]("total_tok"), "same corpus either way")
    assert(arrival.getAs[Long]("n_batches") === sorted.getAs[Long]("n_batches"))
    assert(sorted.getAs[Long]("pad_tok") < arrival.getAs[Long]("pad_tok"),
      "length-sorted batching must beat arrival order on a length-varying corpus")
  }

  test("psi drift: contributions are non-negative and the total stays under the alarm on a stationary split") {
    val rows = Queries.psiDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("psi_contrib_micro") >= 0L, "PSI terms share sign by construction"))
    val total = rows.map(_.getAs[Long]("psi_contrib_micro")).sum
    // H1 vs H2 of the same synthetic generator: stable distribution,
    // PSI must sit far below the 0.2 (200000 micro) industry alarm
    assert(total < 200000L, s"PSI $total micro-nats on a stationary split")
    assert(rows.map(r => r.getAs[Long]("n_base") + r.getAs[Long]("n_curr")).sum > 0)
  }

  test("l-diversity: l can only degrade as the QI gets finer, and dropped-date groups see every status") {
    val rows = Queries.lDiversity(spark, sfDir).collect().sortBy(_.getAs[String]("level"))
    assert(rows.map(_.getAs[String]("level")).toSeq === Seq("1_day", "2_month", "3_year", "4_dropped"))
    val lmin = rows.map(_.getAs[Long]("l_min"))
    assert(lmin.zip(lmin.tail).forall { case (fine, coarse) => fine <= coarse },
      s"coarser QI can only merge groups, never lower l: ${lmin.toSeq}")
    assert(rows.last.getAs[Long]("l_min") === 3L, "priority-only groups contain all three statuses")
    rows.foreach(r => assert(r.getAs[Long]("disclosing_permille") <= 1000L))
  }

  test("km survival: log-survival is non-increasing, at-risk counts telescope, censoring only at the horizon week") {
    val rows = Queries.kmSurvival(spark, sfDir).collect().sortBy(_.getAs[Long]("t"))
    assert(rows.nonEmpty)
    val ls = rows.map(_.getAs[Long]("log_surv_micro"))
    assert(ls.zip(ls.tail).forall { case (a, b) => b <= a }, "survival cannot increase")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val drop = a.getAs[Long]("n_events") + a.getAs[Long]("n_censored")
        assert(a.getAs[Long]("n_at_risk") - drop === b.getAs[Long]("n_at_risk"),
          "at-risk must telescope exactly by that week's endings")
      case _ => ()
    }
    val totalEnd = rows.map(r => r.getAs[Long]("n_events") + r.getAs[Long]("n_censored")).sum
    assert(totalEnd === rows.head.getAs[Long]("n_at_risk"), "every user ends exactly once")
  }

  test("skew join planner: ratio >= uniform, salt factor is the exact ceiling rule") {
    val r = Queries.skewJoinPlanner(spark, sfDir).collect().head
    assert(r.getAs[Long]("skew_ratio_permille") >= 1000L, "the max key is at least the mean key")
    val target = r.getAs[Long]("target_rows")
    val mx = r.getAs[Long]("max_key_rows")
    assert(r.getAs[Long]("salt_factor") === (mx + target - 1) / target)
    assert(r.getAs[Long]("total_rows") > 0 && r.getAs[Long]("n_keys") > 0)
  }

  test("filtered vector search: every served neighbor satisfies the predicate, k fills when candidates exist") {
    val rows = Queries.filteredVectorSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val label1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("label") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(label1.contains(r.getAs[Long]("nid")),
      s"neighbor ${r.getAs[Long]("nid")} violates the label predicate"))
    // with ~label-cardinality candidates available, every query must fill k = 5
    val perQuery = rows.groupBy(_.getAs[Long]("qid")).map(_._2.length)
    assert(perQuery.forall(_ === 5), "pre-filtering must never under-fill k while candidates remain")
  }

  test("hybrid rrf fusion: a doc on both lists outranks rank-equivalent single-list docs, scores decay with rank") {
    val rows = Queries.hybridRrfFusion(spark, sfDir).collect().sortBy(_.getAs[Int]("fused_rank"))
    assert(rows.length === 10)
    val scores = rows.map(_.getAs[Long]("rrf_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "fused order must follow the fused score")
    rows.foreach { r =>
      val (b, t) = (r.getAs[Int]("bm25_rank"), r.getAs[Int]("tf_rank"))
      assert(b > 0 || t > 0, "a fused doc must come from at least one ranker")
      val expect = (if (b > 0) 1000000L / (60 + b) else 0L) + (if (t > 0) 1000000L / (60 + t) else 0L)
      assert(r.getAs[Long]("rrf_micro") === expect, "RRF term must be the exact integer reciprocal sum")
    }
  }

  test("checkpoint resume: state carried across a second launch reproduces the one-pass batch census") {
    val rows = Queries.checkpointResume(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("resume_eq_batch") === 1L,
      s"${r.getAs[String]("event_type")}: resumed state diverged from batch"))
  }

  test("budget waterfill: allocation exhausts the budget up to truncation and never exceeds a source's supply") {
    val rows = Queries.budgetWaterfill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalT = rows.map(_.getAs[Long]("t_s")).sum
    val budget = totalT * 600 / 1000
    val alloc = rows.map(_.getAs[Long]("alloc_tokens")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc_tokens") <= r.getAs[Long]("t_s"), "cannot allocate more than a source has")
      val funded = r.getAs[Long]("funded_fully") === 1L
      assert(funded === (r.getAs[Long]("t_s") <= r.getAs[Long]("waterline")))
    }
    assert(alloc <= budget, "waterline must respect the budget")
    // truncation slack: at most one waterline-unit per capped source
    val nCapped = rows.count(_.getAs[Long]("funded_fully") === 0L)
    assert(budget - alloc <= math.max(nCapped.toLong, 1L), s"left $budget-$alloc on the table with $nCapped capped sources")
  }

  test("posting compression: delta-varint always beats raw int64 and widths obey the byte ladder") {
    val rows = Queries.postingCompression(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("varint_bytes") < r.getAs[Long]("raw_bytes"),
        s"term ${r.getAs[String]("term")}: gaps of sorted ids must varint-compress below 8 B/id")
      assert(r.getAs[Long]("varint_bytes") >= r.getAs[Long]("df"), "at least one byte per posting")
      assert(r.getAs[Long]("compressed_permille") < 1000L)
    }
  }

  test("cube view selection: eight cuboids, base has zero benefit, apex derives only itself") {
    val rows = Queries.cubeViewSelection(spark, sfDir).collect().sortBy(_.getAs[Int]("gid"))
    assert(rows.length === 8)
    val byGid = rows.map(r => r.getAs[Int]("gid") -> r).toMap
    assert(byGid(0).getAs[Long]("benefit_rows") === 0L, "materializing the base again saves nothing")
    assert(byGid(0).getAs[Long]("n_derivable") === 8L, "the base answers every cuboid")
    assert(byGid(7).getAs[Long]("n_derivable") === 1L, "the apex answers only the apex")
    assert(byGid(7).getAs[String]("cuboid") === "")
    assert(byGid(0).getAs[String]("cuboid") === "flag+status+year")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") <= byGid(0).getAs[Long]("n_rows"), "no cuboid outgrows the base")
      assert(r.getAs[Long]("benefit_rows") >= 0L)
    }
  }

  test("isotonic calibration: fit is monotone non-decreasing, pools average the raw rates, bounds hold") {
    val rows = Queries.isotonicCalibration(spark, sfDir).collect().sortBy(_.getAs[Long]("bin"))
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Long]("iso_permille"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b }, s"PAV output must be non-decreasing: ${iso.toSeq}")
    rows.foreach { r =>
      assert(r.getAs[Long]("iso_permille") >= 0L && r.getAs[Long]("iso_permille") <= 1000L)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
    // total mass is conserved up to the permille quantization: the
    // weighted mean of the fit tracks the overall positive rate
    val n = rows.map(_.getAs[Long]("n")).sum
    val pos = rows.map(_.getAs[Long]("n_pos")).sum
    val fitMass = rows.map(r => r.getAs[Long]("iso_permille") * r.getAs[Long]("n")).sum
    assert(math.abs(fitMass - pos * 1000L) <= n * 2L, "PAV conserves the mean up to quantization")
  }

  test("fellegi-sunter: matches agree more than unmatches on every field, so all weights are positive") {
    val rows = Queries.fellegiSunter(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("field")).sorted.toSeq === Seq("1_lang", "2_source", "3_lenbucket"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_m") > 0L && r.getAs[Long]("n_u") > 0L)
      assert(r.getAs[Long]("m_permille") > r.getAs[Long]("u_permille"),
        s"${r.getAs[String]("field")}: near-duplicates must agree more often than shifted random pairs")
      assert(r.getAs[Long]("weight_micro") > 0L)
      assert(r.getAs[Long]("m_permille") <= 1000L && r.getAs[Long]("u_permille") <= 1000L)
    }
  }

  test("substring excise: cross-doc overlap merges to one run, within-doc repeats stay two, short docs ignored") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_excise").toString
    Seq(
      // docs 0/1 share spans at starts 0 and 1 -> marks {0,1} merge to [0,6): 2 marks, 1 run, 6 tokens
      (0L, "a b c d e f g h i j", "s1"),
      (1L, "a b c d e f X0 Y0 Z0 W0", "s1"),
      // doc 2 repeats "p q r s t" at starts 0 and 7 -> two DISJOINT runs, 10 tokens
      (2L, "p q r s t u1 u2 p q r s t", "s1"),
      // doc 3 all-unique; doc 4 below span length: neither is affected
      (3L, "m1 m2 m3 m4 m5 m6", "s2"),
      (4L, "x1 x2 x3", "s2")
    ).map { case (i, text, src) => (i, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val by = Queries.substringExcise(spark, dir).collect().map(r => r.getAs[String]("source") -> r).toMap
    val s1 = by("s1")
    assert(s1.getAs[Long]("n_docs") === 3L)
    assert(s1.getAs[Long]("docs_affected") === 3L)
    assert(s1.getAs[Long]("total_tokens") === 32L)
    assert(s1.getAs[Long]("dup_spans") === 6L)
    assert(s1.getAs[Long]("merged_runs") === 4L)
    assert(s1.getAs[Long]("excised_tokens") === 22L)
    assert(s1.getAs[Long]("excised_permille") === 22L * 1000L / 32L)
    val s2 = by("s2")
    assert(s2.getAs[Long]("docs_affected") === 0L)
    assert(s2.getAs[Long]("excised_tokens") === 0L)
    // real corpus: repetition exists by construction; invariants hold per source
    val real = Queries.substringExcise(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Long]("excised_tokens") <= r.getAs[Long]("total_tokens"))
      assert(r.getAs[Long]("merged_runs") <= r.getAs[Long]("dup_spans"))
      assert(r.getAs[Long]("excised_tokens") <= 5L * r.getAs[Long]("dup_spans"))
      assert(r.getAs[Long]("excised_tokens") >= 5L * r.getAs[Long]("merged_runs"))
    }
    assert(real.map(_.getAs[Long]("dup_spans")).sum > 0L, "known-repetitive corpus produced zero duplicated spans")
  }

  test("AMS F2 sketch: exact moment is right, the linear sketch replays bit-for-bit and lands in range") {
    import org.apache.spark.sql.functions._
    val r = Queries.amsF2(spark, sfDir).collect().head
    // F2 ≥ F1 always (f² ≥ f), with equality only when every f = 1
    assert(r.getAs[Long]("f2_exact") >= r.getAs[Long]("n_tok"))
    // cross-check the exact moment against an independent computation
    val f2 = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.TextOps.tokens(col("text"))).as("w"))
      .groupBy("w")
      .count()
      .agg(sum(col("count") * col("count")))
      .collect()
      .head
      .getLong(0)
    assert(r.getAs[Long]("f2_exact") === f2)
    // a linear sketch is a SUM: partition order cannot change the bits
    val again = Queries.amsF2(spark, sfDir).collect().head
    assert(again === r, "tug-of-war sketch must be merge-order independent")
    // 8×4 median-of-means keeps the estimate within the coarse
    // Chebyshev envelope even on this tiny 31-word vocabulary
    assert(r.getAs[Long]("f2_est") > 0L)
    assert(r.getAs[Long]("err_permille") < 950L, s"estimate off by ${r.getAs[Long]("err_permille")} permille")
  }

  test("DP histogram: releases post-process to >= 0, noise is bounded two-sided geometric and actually fires") {
    val rows = Queries.dpHistogram(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("z_noise")
      // each geometric quantile is <= 20 at 2^-20 resolution
      assert(math.abs(z) <= 20L, s"noise $z outside the geometric envelope")
      assert(r.getAs[Long]("n_released") === math.max(0L, r.getAs[Long]("n_true") + z))
      assert(r.getAs[Long]("epsilon_micro") === 693147L)
    }
    assert(rows.exists(_.getAs[Long]("z_noise") != 0L), "noise never fired — the mechanism is the identity")
    assert(rows.exists(_.getAs[Long]("z_noise") > 0L) && rows.exists(_.getAs[Long]("z_noise") < 0L),
      "two-SIDED noise must produce both signs across ~100 cells")
  }

  test("phrase search: adjacency is positional (scattered terms do not match), overlaps slide") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    Seq(
      (0L, "t t t t"), // "t t t" at positions 0 and 1 — overlapping matches both count
      (1L, "t t t q1 q2"),
      (2L, "t q3 t q4 t"), // three t's, none adjacent — a bag-of-words match that must NOT surface
      (3L, "u1 u2 u3 u4 u5")
    ).map { case (i, text) => (i, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Queries.phraseSearch(spark, dir).collect()
    assert(rows.forall(_.getAs[String]("phrase") == "t t t"))
    assert(rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matches")).toSeq === Seq(0L -> 2L, 1L -> 1L))
    // real corpus: the postings-adjacency count must equal the direct shingle count of the same phrase
    import org.apache.spark.sql.functions._
    val real = Queries.phraseSearch(spark, sfDir).collect()
    assert(real.nonEmpty)
    val phrase = real.head.getAs[String]("phrase")
    val direct = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), explode(graft.functions.TextOps.wordShingles(graft.functions.TextOps.tokens(col("text")), 3)).as("g"))
      .filter(col("g") === phrase)
      .groupBy("doc_id")
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    real.foreach(r => assert(direct(r.getAs[Long]("doc_id")) === r.getAs[Long]("n_matches"),
      s"postings join and shingle count disagree on doc ${r.getAs[Long]("doc_id")}"))
  }

  test("seasonal decompose: a calendar gap disables the ±3-day trend window instead of borrowing rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seasonal").toString
    val days = (1 to 15).filter(_ != 8) // Feb 8 missing
    days
      .map(d => (d.toLong, java.sql.Timestamp.valueOf(f"2024-02-$d%02d 12:00:00"), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val rows = Queries.seasonalDecompose(spark, dir).collect()
    // only Feb 4 and Feb 12 have a complete ±3-day calendar window
    assert(rows.map(_.getAs[String]("day")).toSeq === Seq("2024-02-04", "2024-02-12"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === 1L)
      assert(r.getAs[Long]("trend_milli") === 1000L)
      assert(r.getAs[Long]("seasonal_milli") === 0L)
      assert(r.getAs[Long]("remainder_milli") === 0L)
    }
    // real corpus: decomposition identity holds in milli units up to the two floor-divs
    val real = Queries.seasonalDecompose(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val resid = r.getAs[Long]("n") * 1000L - r.getAs[Long]("trend_milli") -
        r.getAs[Long]("seasonal_milli") - r.getAs[Long]("remainder_milli")
      assert(resid === 0L, s"decomposition identity broken on ${r.getAs[String]("day")}: $resid")
    }
  }

  test("naive bayes: confusion matrix covers exactly the held-out docs and a learnable signal separates classes") {
    import spark.implicits._
    // synthetic corpus with a clean vocabulary split per class: NB must ace it
    val dir = java.nio.file.Files.createTempDirectory("graft_nb").toString
    (0L until 60L)
      .map { i =>
        val lang = if (i % 2 == 0) "aa" else "bb"
        val text = if (lang == "aa") "apple apple banana cherry" else "dog dog emu fox"
        (i, text, lang, "s1", text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val clean = Queries.naiveBayes(spark, dir).collect()
    assert(clean.forall(r => r.getAs[String]("lang") === r.getAs[String]("pred_lang")),
      s"separable vocabulary must classify perfectly, got ${clean.mkString(";")}")
    assert(clean.map(_.getAs[Long]("n_docs")).sum === 12L) // 60 docs, doc_id % 5 == 0 held out
    // real corpus: every held-out doc appears exactly once in the matrix
    val rows = Queries.naiveBayes(spark, sfDir).collect()
    val nTest = spark.read.parquet(s"$sfDir/documents.parquet").filter("doc_id % 5 = 0").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nTest)
    assert(rows.forall(_.getAs[Long]("n_docs") > 0L))
  }

  test("JL distortion: every consecutive pair is audited and mass concentrates on the k-scaled expectation") {
    val rows = Queries.jlDistortion(spark, sfDir).collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val total = rows.map(_.getAs[Long]("n_pairs")).sum
    assert(total === n - 1, "every consecutive-id pair must land in exactly one bucket")
    // E[d2_proj] = 16·d2_orig → ratio_permille ≈ 1000 → bucket ≈ 10
    val near = rows.filter(r => { val b = r.getAs[Long]("bucket"); b >= 5 && b <= 15 })
      .map(_.getAs[Long]("n_pairs")).sum
    assert(near * 10 >= total * 5, s"only $near/$total pairs within ±50% of the JL expectation")
    val wmean = rows.map(r => r.getAs[Long]("bucket") * r.getAs[Long]("n_pairs")).sum / total
    assert(wmean >= 7L && wmean <= 13L, s"weighted mean bucket $wmean drifted off the expectation")
  }

  test("late interaction: top-3 per query, ordered, and MaxSim recomputes locally for the top hit") {
    val rows = Queries.lateInteraction(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2, 3))
      val ordered = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("score"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
      rs.foreach(r => assert(r.getAs[Long]("did") >= 5L))
    }
    // recompute MaxSim on the driver for one (query, hit) pair
    val top = rows.filter(r => r.getAs[Long]("qid") == 0L && r.getAs[Int]("rank") == 1).head
    val vecs = spark.read
      .parquet(s"$sfDir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.col("vec_id").isin(0L, top.getAs[Long]("did")))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1024).toLong).toArray)
      .toMap
    val (qv, dv) = (vecs(0L), vecs(top.getAs[Long]("did")))
    val maxsim = (0 until 16).map { j =>
      (0 until 16).map { k =>
        (0 until 4).map(o => qv(j * 4 + o) * dv(k * 4 + o)).sum
      }.max
    }.sum
    assert(maxsim === top.getAs[Long]("score"), "distributed MaxSim disagrees with the local recomputation")
  }

  test("OPQ allocation: snake order balances subspace variance products at least as well as the ordered split") {
    val rows = Queries.opqAllocation(spark, sfDir).collect()
    assert(rows.length === 9)
    rows.foreach(r => assert(r.getAs[Double]("var_product") > 0.0))
    val bal = rows.map(r => r.getAs[String]("scheme") -> r.getAs[Long]("balance_permille")).toMap
    assert(bal.values.forall(_ >= 1000L), "max/min ratio is >= 1 by construction")
    assert(bal("3_pca_snake") <= bal("2_pca_ordered"),
      s"snake ${bal("3_pca_snake")} must not be worse than ordered ${bal("2_pca_ordered")} — the OPQ allocation claim")
  }

  test("t-closeness: max EMD is monotone under QI refinement (month >= year >= priority)") {
    val by = Queries.tCloseness(spark, sfDir).collect().map(r => r.getAs[String]("level") -> r).toMap
    assert(by.size === 3)
    val (m, y, p) = (by("1_month"), by("2_year"), by("3_priority"))
    // EMD(·, P) is convex, so a group's EMD is <= the max over any refinement of it
    assert(m.getAs[Long]("t_max_permille") >= y.getAs[Long]("t_max_permille"))
    assert(y.getAs[Long]("t_max_permille") >= p.getAs[Long]("t_max_permille"))
    assert(m.getAs[Long]("n_groups") >= y.getAs[Long]("n_groups"))
    assert(y.getAs[Long]("n_groups") >= p.getAs[Long]("n_groups"))
    Seq(m, y, p).foreach { r =>
      assert(r.getAs[Long]("t_max_permille") >= 0L && r.getAs[Long]("t_max_permille") <= 1000L)
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("exposed_permille") <= 1000L)
    }
  }

  test("nDCG: bounded by the ideal, and a tf-saturated distractor actually drags it under 1000") {
    val rows = Queries.ndcgEval(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("k")).toSeq === Seq(3L, 10L))
    rows.foreach { r =>
      assert(r.getAs[Long]("dcg_nano") <= r.getAs[Long]("idcg_nano"), "DCG can never beat the ideal ordering")
      assert(r.getAs[Long]("ndcg_permille") <= 1000L && r.getAs[Long]("ndcg_permille") > 0L)
    }
    // synthetic: a doc stuffed with the rare term outranks the all-terms doc
    // under BM25 (idf·saturated-tf), but the IDEAL ranking puts rel=3 first
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ndcg").toString
    (Seq(
      (0L, "spark spark spark spark spark spark"), // rel 1, high tf on the rare term
      (1L, "spark join stream") // rel 3
    ) ++ (2L until 12L).map(i => (i, "join stream filler" + i))) // rel 2 crowd making join/stream common
      .map { case (i, text) => (i, text, "en", "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val synth = Queries.ndcgEval(spark, dir).collect()
    synth.foreach(r => assert(r.getAs[Long]("dcg_nano") <= r.getAs[Long]("idcg_nano")))
    assert(synth.exists(_.getAs[Long]("ndcg_permille") < 1000L),
      s"distractor corpus should yield imperfect nDCG, got ${synth.mkString(";")}")
  }

  test("SQL scripting: the WHILE loop lands on the smallest power of two covering max, bins cover the table") {
    val rows = Queries.sqlScripting(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bw = rows.head.getAs[Long]("bin_width")
    val w = bw * 8
    assert((w & (w - 1)) === 0L, s"8·bin_width = $w must be a power of two")
    val mx = spark.read
      .parquet(s"$sfDir/orders.parquet")
      .agg(org.apache.spark.sql.functions.max(org.apache.spark.sql.functions.expr("CAST(floor(o_totalprice) AS BIGINT)")))
      .collect()
      .head
      .getLong(0)
    assert(w >= mx && w / 2 < mx, s"loop must stop at the SMALLEST covering power of two (w=$w, mx=$mx)")
    assert(rows.forall { r => val b = r.getAs[Long]("bin"); b >= 0L && b <= 8L })
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    assert(total === spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("markov attribution: the sole converting channel takes the whole removal effect, exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_markov").toString
    def ev(id: Long, user: Long, sec: Int, tpe: String) =
      (id, java.sql.Timestamp.valueOf(f"2024-03-01 10:00:$sec%02d"), user, tpe, 1.0, "{}")
    val events =
      (1L to 10L).flatMap(u => Seq(ev(u * 10, u, 1, "view"), ev(u * 10 + 1, u, 2, "purchase"))) ++
        Seq(11L, 12L).flatMap(u => Seq(ev(u * 10, u, 1, "click"), ev(u * 10 + 1, u, 2, "error")))
    events
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val by = Queries.markovAttribution(spark, dir).collect().map(r => r.getAs[String]("channel") -> r).toMap
    assert(by.keySet === Set("view", "click", "error"))
    // base = (10·1e9 + 2·0) / 12, floored
    assert(by("view").getAs[Long]("base_conv_nano") === 10L * 1000000000L / 12L)
    assert(by("view").getAs[Long]("removal_conv_nano") === 0L)
    assert(by("view").getAs[Long]("effect_permille") === 1000L)
    assert(by("view").getAs[Long]("share_permille") === 1000L)
    Seq("click", "error").foreach { c =>
      assert(by(c).getAs[Long]("effect_permille") === 0L, s"$c never reaches CONV, removing it changes nothing")
      assert(by(c).getAs[Long]("share_permille") === 0L)
    }
    // real corpus invariants: removal can only lose conversion mass; shares sum to 1000 up to truncation
    val real = Queries.markovAttribution(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Long]("removal_conv_nano") <= r.getAs[Long]("base_conv_nano"))
      assert(r.getAs[Long]("effect_permille") >= 0L && r.getAs[Long]("effect_permille") <= 1000L)
    }
    val shareSum = real.map(_.getAs[Long]("share_permille")).sum
    assert(shareSum <= 1000L && shareSum >= 1000L - real.length,
      s"shares must sum to 1000 up to per-channel floor truncation, got $shareSum")
  }

  test("partition advisor: the layout matching each workload's predicate column skips the most rows") {
    val rows = Queries.partitionAdvisor(spark, sfDir).collect()
    assert(rows.length === 16)
    val best = Map(
      "w1_date_month" -> "2_by_month",
      "w2_priority_eq" -> "1_by_priority",
      "w3_status_eq" -> "3_by_status",
      "w4_cust_eq" -> "4_by_custbucket"
    )
    best.foreach { case (w, expectedLayout) =>
      val forW = rows.filter(_.getAs[String]("workload") == w)
      val winner = forW.minBy(r => (r.getAs[Long]("scan_permille"), r.getAs[String]("layout")))
      assert(winner.getAs[String]("layout") === expectedLayout,
        s"$w: expected $expectedLayout to win, got ${winner.getAs[String]("layout")} " +
          s"(${forW.map(r => r.getAs[String]("layout") -> r.getAs[Long]("scan_permille")).mkString(",")})")
      // a matching layout must actually SKIP something; a mismatched one scans everything
      assert(winner.getAs[Long]("scan_permille") < 1000L)
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("parts_scanned") <= r.getAs[Long]("n_parts"))
      assert(r.getAs[Long]("scan_permille") <= 1000L)
    }
  }

  test("HITS: mass is normalized, ordering is by authority, and the iteration replays bit-for-bit") {
    val rows = Queries.hitsScores(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val auths = rows.map(_.getAs[Long]("auth_nano"))
    assert(auths.zip(auths.tail).forall { case (a, b) => a >= b }, "must be ordered by authority desc")
    rows.foreach { r =>
      assert(r.getAs[Long]("auth_nano") >= 0L && r.getAs[Long]("auth_nano") <= 1000000000L)
      assert(r.getAs[Long]("hub_nano") >= 0L && r.getAs[Long]("hub_nano") <= 1000000000L)
    }
    assert(auths.head > 0L, "top authority must carry mass")
    val again = Queries.hitsScores(spark, sfDir).collect()
    assert(again.toSeq === rows.toSeq, "integer HITS must replay identically")
  }

  test("SPRT: all-failure traffic accepts H0, a tiny sample keeps sampling, dense conversions accept H1") {
    import spark.implicits._
    def write(dir: String, users: Seq[Long], convert: Boolean): Unit =
      users
        .flatMap { u =>
          val base = Seq((u * 10, java.sql.Timestamp.valueOf("2024-03-01 10:00:01"), u, "view", 1.0, "{}"))
          if (convert) base :+ ((u * 10 + 1, java.sql.Timestamp.valueOf("2024-03-01 10:00:02"), u, "purchase", 1.0, "{}"))
          else base
        }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write
        .mode("overwrite")
        .parquet(s"$dir/events.parquet")
    val d1 = java.nio.file.Files.createTempDirectory("graft_sprt1").toString
    write(d1, 1L to 50L, convert = false) // ~25 per arm, 8 suffice to cross −ln 19
    Queries.sprtSequentialTest(spark, d1).collect().foreach { r =>
      assert(r.getAs[String]("decision") === "accept_h0", r.toString)
      assert(r.getAs[String]("cross_day") === "2024-03-01")
    }
    val d2 = java.nio.file.Files.createTempDirectory("graft_sprt2").toString
    write(d2, 1L to 6L, convert = false) // even 6-0 split stays inside the boundaries
    Queries.sprtSequentialTest(spark, d2).collect().foreach { r =>
      assert(r.getAs[String]("decision") === "continue", r.toString)
      assert(r.getAs[String]("cross_day") == null)
    }
    // the shared corpus converts nearly everyone: the walk drifts up —
    // H1 if the arm has enough users to cross, else still sampling
    val real = Queries.sprtSequentialTest(spark, sfDir).collect()
    assert(real.map(_.getAs[String]("arm")).sorted.toSeq === Seq("A", "B"))
    real.foreach { r =>
      assert(r.getAs[Long]("final_llr_micro") > 0L, r.toString)
      assert(Set("accept_h1", "continue").contains(r.getAs[String]("decision")), r.toString)
    }
  }

  test("sequential patterns: order matters (view>click supported, click>view not) and support is anti-monotone") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_seqpat").toString
    (1L to 10L)
      .flatMap(u =>
        Seq(
          (u * 10, java.sql.Timestamp.valueOf("2024-03-01 10:00:01"), u, "view", 1.0, "{}"),
          (u * 10 + 1, java.sql.Timestamp.valueOf("2024-03-01 10:00:02"), u, "click", 1.0, "{}")
        )
      )
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val rows = Queries.sequentialPatterns(spark, dir).collect()
    val byPat = rows.map(r => r.getAs[String]("pattern") -> r.getAs[Long]("support")).toMap
    assert(byPat("view>click") === 10L)
    assert(!byPat.contains("click>view"), "reverse order is never contained, it must not surface")
    assert(!byPat.keys.exists(_.count(_ == '>') == 2), "no 3-pattern exists in 2-event sequences")
    // real corpus: permille bounded; a 3-pattern can never beat its own 2-prefix
    val real = Queries.sequentialPatterns(spark, sfDir).collect()
    assert(real.nonEmpty)
    val sup = real.map(r => r.getAs[String]("pattern") -> r.getAs[Long]("support")).toMap
    real.foreach { r =>
      assert(r.getAs[Long]("support_permille") <= 1000L)
      val p = r.getAs[String]("pattern").split('>')
      if (p.length == 3) sup.get(s"${p(0)}>${p(1)}").foreach { prefix =>
        assert(r.getAs[Long]("support") <= prefix, s"${r.getAs[String]("pattern")} beats its prefix")
      }
    }
  }

  test("slice finder: a concentrated failing slice tops the ranking; scores stay size-weighted deviations") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_slice").toString
    val goodText = ("the" +: (1 to 39).map(i => f"w$i%02d")).mkString(" ") // passes all four q92 rules
    val docs =
      (1L to 60L).map(i => (i, goodText, "en", "s1")) ++
        (61L to 120L).map(i => (i, goodText, "fr", "s2")) ++
        (121L to 160L).map(i => (i, "tiny doc fails rules", "en", "s9"))
    docs
      .map { case (i, text, lang, src) => (i, text, lang, src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val rows = Queries.sliceFinder(spark, dir).collect()
    val top = rows.head
    assert(top.getAs[String]("slice") === "lang=en|source=s9", rows.map(_.getAs[String]("slice")).mkString(","))
    assert(top.getAs[Long]("rate_permille") === 0L)
    // real corpus: ranking invariants
    val real = Queries.sliceFinder(spark, sfDir).collect()
    assert(real.nonEmpty && real.length <= 10)
    val scores = real.map(_.getAs[Long]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    real.foreach { r =>
      assert(r.getAs[Long]("n") >= 20L)
      assert(r.getAs[Long]("score") === r.getAs[Long]("dev_permille") * r.getAs[Long]("n"))
      val gap = math.abs(r.getAs[Long]("rate_permille") - r.getAs[Long]("global_rate_permille"))
      assert(math.abs(gap - r.getAs[Long]("dev_permille")) <= 2L, s"dev disagrees with the rate gap: $r")
    }
  }

  test("compression advisor: dictionary wins the 3-value column, plain wins the near-unique one, bits recompute") {
    import org.apache.spark.sql.functions._
    val rows = Queries.compressionAdvisor(spark, sfDir).collect()
    assert(rows.length === 4)
    val by = rows.map(r => r.getAs[String]("column") -> r).toMap
    assert(by("1_status").getAs[String]("winner") === "dict")
    assert(by("4_price").getAs[String]("winner") === "plain")
    assert(by("4_price").getAs[Long]("best_ratio_permille") === 1000L)
    // plain_bits recomputes independently for the status column
    val statusBits = spark.read
      .parquet(s"$sfDir/orders.parquet")
      .agg(sum(length(col("o_orderstatus"))))
      .collect()
      .head
      .getLong(0) * 8L
    assert(by("1_status").getAs[Long]("plain_bits") === statusBits)
    rows.foreach { r =>
      assert(r.getAs[Long]("rle_runs") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("ndv") <= r.getAs[Long]("n"))
      assert(r.getAs[Long]("best_ratio_permille") <= 1000L)
    }
  }

  test("join discovery: referential pairs surface at full containment and the KMV sample tracks the exact audit") {
    val rows = Queries.joinDiscovery(spark, sfDir).collect()
    assert(rows.length === 8 * 7)
    val by = rows.map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r).toMap
    Seq(
      ("orders.o_custkey", "customer.c_custkey"),
      ("lineitem.l_orderkey", "orders.o_orderkey"),
      ("lineitem.l_partkey", "part.p_partkey"),
      ("lineitem.l_suppkey", "supplier.s_suppkey")
    ).foreach { fk =>
      assert(by(fk).getAs[Long]("exact_permille") === 1000L, s"referential pair $fk must be fully contained")
    }
    rows.filter(_.getAs[Long]("ndv_a") >= 64L).foreach { r =>
      val gap = math.abs(r.getAs[Long]("est_permille") - r.getAs[Long]("exact_permille"))
      assert(gap <= 250L, s"KMV estimate off by $gap permille on ${r.getAs[String]("col_a")}->${r.getAs[String]("col_b")}")
    }
  }

  test("Theil-Sen: a single injected outlier barely moves the median slope but drags OLS") {
    val by = Queries.theilSen(spark, sfDir).collect().map(r => r.getAs[String]("tag") -> r).toMap
    assert(by.size === 2)
    val (raw, out) = (by("1_raw"), by("2_outlier"))
    val nDays = raw.getAs[Long]("n_days")
    assert(raw.getAs[Long]("n_pairs") === nDays * (nDays - 1) / 2)
    val tsShift = math.abs(out.getAs[Long]("ts_slope_milli") - raw.getAs[Long]("ts_slope_milli"))
    val olsShift = math.abs(out.getAs[Long]("ols_slope_milli") - raw.getAs[Long]("ols_slope_milli"))
    assert(tsShift < olsShift, s"median slope moved $tsShift but OLS only $olsShift — robustness inverted")
    assert(olsShift > 0L, "a 10x outlier on the last day must move OLS")
  }

  test("token offsets: every computed offset substrings back to its token, including multi-space normalization") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_offsets").toString
    Seq((0L, "  a  bb   ccc ", "en", "s1", 14L), (1L, "x1 y22 z333", "en", "s1", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val synth = Queries.tokenOffsets(spark, dir).collect()
    assert(synth.length === 1)
    assert(synth.head.getAs[Long]("n_tokens") === 6L)
    assert(synth.head.getAs[Long]("n_violations") === 0L)
    val real = Queries.tokenOffsets(spark, sfDir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Long]("n_violations") === 0L, s"offset table disagrees with the text on ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
  }

  test("incremental SCD2: the fold lands bit-for-bit on the rebuild, and the data exercises the extend path") {
    import org.apache.spark.sql.functions._
    val rows = Queries.scd2Incremental(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("is_current")).sorted.toSeq === Seq(0, 1))
    rows.foreach(r => assert(r.getAs[Long]("incremental_ok") === 1L,
      s"incremental apply diverged from the from-scratch rebuild: $r"))
    // the interesting branch: at least one customer's OPEN island spans the
    // cut (valid_from before it, new orders after), so the seed-extend merge
    // actually executed rather than every boundary trivially closing
    val hist = Queries.scd2History(spark, sfDir)
    val spanning = hist
      .filter(col("is_current") === 1 && col("valid_from") < "1999-01-01")
      .join(
        spark.read
          .parquet(s"$sfDir/orders.parquet")
          .filter(col("o_orderdate") >= org.apache.spark.sql.functions.to_timestamp(lit("1999-01-01")))
          .select(col("o_custkey"))
          .distinct(),
        Seq("o_custkey"),
        "left_semi"
      )
      .count()
    assert(spanning > 0L, "no open island spans the cut — the merge path was never exercised")
  }

  test("timed funnel: the 7-day deadline can only lose conversions, and a late click is really excluded") {
    import spark.implicits._
    val r = Queries.timedFunnel(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_clicked_7d") <= r.getAs[Long]("n_clicked_any"))
    assert(r.getAs[Long]("n_purchased_7d") <= r.getAs[Long]("n_clicked_7d"))
    // q151's unbounded count and this query's any-click count are the same definition
    val unbounded = Queries.funnel(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_clicked_any") === unbounded.getAs[Long]("n_clicked_after_view"))
    // synthetic: a click 8 days after the view misses the window
    val dir = java.nio.file.Files.createTempDirectory("graft_tfunnel").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-03-09 11:00:00"), 1L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val late = Queries.timedFunnel(spark, dir).collect().head
    assert(late.getAs[Long]("n_clicked_any") === 1L)
    assert(late.getAs[Long]("n_clicked_7d") === 0L, "a click 8 days out must miss the 7-day window")
  }

  test("lag features: every feature recomputes from the neighboring output rows") {
    val rows = Queries.lagFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDay = rows.map(r => r.getAs[String]("day") -> r).toMap
    rows.foreach { r =>
      val prev = java.time.LocalDate.parse(r.getAs[String]("day")).minusDays(1).toString
      byDay.get(prev).foreach { p =>
        assert(r.getAs[Long]("lag1") === p.getAs[Long]("n"), s"lag1 of ${r.getAs[String]("day")} != n of $prev")
        assert(p.getAs[Long]("target") === r.getAs[Long]("n"), s"target of $prev != n of ${r.getAs[String]("day")}")
      }
      assert(r.getAs[Long]("ma7_milli") >= 0L)
    }
  }

  test("sketch join estimate: CMS inner product overestimates, within the expected collision mass") {
    val r = Queries.sketchJoinEstimate(spark, sfDir).collect().head
    val exact = r.getAs[Long]("exact_pairs")
    val est = r.getAs[Long]("est_pairs")
    assert(exact > 0L)
    assert(est >= exact, "collision cross-terms are nonnegative — CMS can never underestimate an inner product")
    // e·(‖f‖₁‖g‖₁/w) is the Markov tail cut; the min over 4 independent
    // rows sitting above it would be a (1/e)^4 event — deterministic
    // here (fixed hashes, fixed data), so assert it outright
    val bound = r.getAs[Long]("n_left") * r.getAs[Long]("n_right") / r.getAs[Int]("w")
    assert(est - exact <= 3L * bound, s"realized error ${est - exact} implausibly above e·E[err] ≈ ${3L * bound}")
  }

  test("fd profile: keys audit as exact FDs with zero g3 mass; violated pairs carry positive mass") {
    val rows = Queries.fdProfile(spark, sfDir).collect()
    val by = rows.map(r => (r.getAs[String]("tbl"), r.getAs[String]("lhs")) -> r).toMap
    val key = by(("customer", "c_custkey"))
    assert(key.getAs[Int]("is_fd") === 1 && key.getAs[Long]("g3_violations") === 0L)
    rows.foreach { r =>
      val fd = r.getAs[Int]("is_fd") === 1
      val g3 = r.getAs[Long]("g3_violations")
      assert(if (fd) g3 === 0L else g3 > 0L, s"g3 mass and the FD flag must agree: $r")
      assert(r.getAs[Long]("n_violating_groups") <= r.getAs[Long]("n_groups"))
    }
  }

  test("join-order advisor: best orders join the fact table last, and ties are prefix-set ties") {
    val rows = Queries.joinOrderAdvisor(spark, sfDir).collect()
    assert(rows.length === 8)
    val best = rows.filter(_.getAs[Int]("is_best") === 1)
    assert(best.nonEmpty)
    best.foreach(r => assert(r.getAs[String]("join_order").endsWith("->orders"), s"a plan starting from the fact side should never win: $r"))
    // all 8 orders agree on the final size (it's the full-set estimate)
    assert(rows.map(_.getAs[Long]("est_final_rows")).distinct.length === 1)
    assert(rows.map(_.getAs[Long]("est_cost")).min === best.head.getAs[Long]("est_cost"))
  }

  test("v-optimal frontier: non-increasing in bucket count; b=1 replays the direct total SSE") {
    val rows = Queries.vOptimalHistogram(spark, sfDir).collect().sortBy(_.getAs[Int]("n_buckets"))
    assert(rows.length === 6)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(
        b.getAs[Long]("min_sse_fp") <= a.getAs[Long]("min_sse_fp"),
        "an extra bucket can always reuse the previous split — the frontier cannot rise"
      )
    }
    // independent replication of the one-bucket cost from raw counts
    val fs = graft.sources.Tables
      .parquet(spark, sfDir, "part")
      .groupBy("p_size")
      .count()
      .collect()
      .map(_.getAs[Long]("count"))
    val (n, s1, s2) = (BigInt(fs.length), fs.map(BigInt(_)).sum, fs.map(f => BigInt(f) * f).sum)
    val q = BigInt(1048576)
    assert(BigInt(rows.head.getAs[Long]("min_sse_fp")) === s2 * q - (s1 * s1 * q) / n)
  }

  test("mutual-best matching: the assignment is one-to-one across all rounds") {
    val rows = Queries.mutualBestMatching(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val news = rows.map(_.getAs[Long]("new_id"))
    val olds = rows.map(_.getAs[Long]("old_id"))
    assert(news.distinct.length === news.length, "a new doc claimed two old docs")
    assert(olds.distinct.length === olds.length, "an old doc was claimed twice")
    rows.foreach(r => assert(r.getAs[Int]("round") >= 1 && r.getAs[Int]("round") <= 3))
  }

  test("group k-fold: zero entity leakage and shares that sum to the corpus") {
    val rows = Queries.groupKFold(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("max_folds_per_user") === 1L, "a user's events crossed folds"))
    val share = rows.map(_.getAs[Long]("share_permille")).sum
    assert(share >= 1000L - rows.length && share <= 1000L, s"fold shares must tile the corpus: $share")
  }

  test("kendall tau: concordant + discordant tile all k(k-1)/2 pairs (no ties by construction)") {
    val r = Queries.kendallTau(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_pairs") === 190L)
    assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant") === 190L)
    val tau = r.getAs[Long]("tau_permille")
    assert(tau >= -1000L && tau <= 1000L)
  }

  test("auc report: the histogram rank-sum replays brute-force pair counting") {
    val r = Queries.aucReport(spark, sfDir).collect().head
    // brute force over the collected (score, pos) sample: wins + ties/2;
    // tokenization mirrors TextOps.tokens (trim + split on \s+)
    val docs = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text"))
      .collect()
      .map(_.getString(0).trim.split("\\s+").toSeq)
    val sp = docs.map { toks =>
      val nTok = toks.length.toLong
      val nStop = toks.count(Set("the", "a", "and", "is", "of")).toLong
      val nDist = toks.distinct.length.toLong
      val sumLen = toks.map(_.length).sum.toLong
      val score = nTok * 10 + nStop * 1000 / nTok * 3 + nDist * 1000 / nTok * 2
      val pos = nTok >= 30 && nTok <= 600 && sumLen >= nTok * 3 && sumLen <= nTok * 6 &&
        nStop * 50 >= nTok && nDist * 5 >= nTok
      (score, pos)
    }
    val posS = sp.filter(_._2).map(_._1)
    val negS = sp.filterNot(_._2).map(_._1)
    assert(r.getAs[Long]("n_pos") === posS.length.toLong)
    assert(r.getAs[Long]("n_neg") === negS.length.toLong)
    val num2 = posS.map(p => negS.count(n => p > n) * 2L + negS.count(n => p == n).toLong).sum
    val expected = BigInt(num2) * 10000 / (2L * posS.length * negS.length)
    assert(BigInt(r.getAs[Long]("auc_permyriad")) === expected)
  }

  test("lof outliers: densities positive, report sorted, and lof is a genuine ratio") {
    val rows = Queries.lofOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("kdist") > 0L && r.getAs[Long]("lrd_fp") > 0L && r.getAs[Long]("lof_permille") > 0L)
    }
    val lofs = rows.map(_.getAs[Long]("lof_permille"))
    assert(lofs.sameElements(lofs.sortBy(-_)), "top-10 must be sorted by lof desc")
  }

  test("cohens kappa: the chance correction sits between raw agreement and zero") {
    val r = Queries.cohensKappa(spark, sfDir).collect().head
    val (agree, chance, kappa) =
      (r.getAs[Long]("agree_permille"), r.getAs[Long]("chance_permille"), r.getAs[Long]("kappa_permille"))
    assert(kappa >= -1000L && kappa <= 1000L)
    // sign of kappa follows sign of (agree - chance), and |kappa| <= |agree normalized|
    assert((kappa > 0) === (agree > chance) || kappa === 0L)
    assert(kappa <= agree, "chance correction can only shrink positive agreement")
  }

  test("ucb index: one chosen arm per day, optimism never below the mean, trials never shrink") {
    val rows = Queries.ucbIndexTable(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("day")).foreach { case (d, rs) =>
      assert(rs.count(_.getAs[Int]("is_chosen") === 1) === 1, s"exactly one argmax on $d")
    }
    rows.foreach(r => assert(r.getAs[Long]("ucb_micro") >= r.getAs[Long]("mean_micro")))
    rows.groupBy(_.getAs[String]("arm")).foreach { case (_, rs) =>
      val ns = rs.sortBy(_.getAs[String]("day")).map(_.getAs[Long]("n_i"))
      assert(ns.sameElements(ns.sorted), "cumulative trials must be non-decreasing")
    }
  }

  test("good-turing: discounts reconstruct from the N_r table and the unseen mass from N_1") {
    val rows = Queries.goodTuring(spark, sfDir).collect().sortBy(_.getAs[Long]("r"))
    assert(rows.nonEmpty)
    val byR = rows.map(r => r.getAs[Long]("r") -> r.getAs[Long]("n_r")).toMap
    rows.foreach { r =>
      val rr = r.getAs[Long]("r")
      val expected = (rr + 1) * byR.getOrElse(rr + 1, r.getAs[Long]("n_r_plus1")) * 1000 / r.getAs[Long]("n_r")
      assert(r.getAs[Long]("rstar_permille") === expected)
    }
    val head = rows.head
    assert(head.getAs[Long]("r") === 1L)
    assert(head.getAs[Long]("unseen_mass_permyriad") === head.getAs[Long]("n_r") * 10000 / head.getAs[Long]("n_tok"))
  }

  test("chi-squared: nonnegative statistic, V in [0,1], dof from the grid dims") {
    val r = Queries.chiSquared(spark, sfDir).collect().head
    assert(r.getAs[Long]("chi2_milli") >= 0L)
    val v = r.getAs[Long]("cramers_v_permille")
    assert(v >= 0L && v <= 1000L)
    assert(r.getAs[Long]("dof") === (r.getAs[Long]("n_rows") - 1) * (r.getAs[Long]("n_cols") - 1))
  }

  test("label propagation: every reported community is a subset of one connected component") {
    // LPA refines CC — a community spanning two q80 clusters would be
    // structurally impossible (labels only travel along edges)
    val com = Queries.labelPropagation(spark, sfDir).collect()
    assert(com.nonEmpty)
    com.foreach(r => assert(r.getAs[Long]("n_members") >= 2L))
    val clusters = Queries
      .dedupClusters(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster"))
      .toMap
    // the community label IS a member id (labels start as ids and only
    // ever adopt a neighbor's), so it must sit in some cluster
    com.foreach { r =>
      val c = r.getAs[Long]("community")
      assert(clusters.contains(c), s"community label $c is not a graph node")
    }
  }

  test("pruned trigram frontier (q360): the table shrinks and the sparsity loss is recovered, not leaked") {
    val rows = Queries.prunedTrigramLm(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("min_count")).toSeq === Seq(1L, 2L, 4L))
    val kept = rows.map(_.getAs[Long]("n_tri_types_kept"))
    assert(kept(0) > kept(1) && kept(1) > kept(2), "higher min-count must keep strictly fewer types")
    assert(rows.map(_.getAs[Long]("n_tri_types_full")).distinct.length === 1)
    val gain = rows.map(_.getAs[Long]("gain_vs_bigram_micro"))
    // q274's finding on this sparse corpus: the unpruned trigram LOSES
    // to the bigram; the renormalized pruned model must never do WORSE
    // than the unpruned one by more than rounding, and the harshest
    // prune should recover toward the bigram (gain → 0)
    assert(gain(0) < 0, "the unpruned row must reproduce the measured trigram-vs-bigram loss")
    assert(gain(2) > gain(0), "count pruning with renormalized backoff must recover sparsity loss")
    // hit census: pruning can only reduce trigram hits, and the
    // bigram-backoff bucket absorbs exactly what pruning removes
    val hits = rows.map(_.getAs[Long]("n_tri_hits"))
    val bb = rows.map(_.getAs[Long]("n_backoff_bigram"))
    assert(hits(0) > hits(1) && hits(1) > hits(2))
    assert((0 to 2).forall(i => hits(i) + bb(i) === hits(0) + bb(0)), "hit + bigram-backoff mass is conserved")
  }

  test("truss split audit (q374): truss parts refine the published clusters, and every split cluster contains a peeled bridge") {
    import graft.operators.{CandidateGraph, ConnectedComponents}
    val (_, truss) = Queries.trussPeel(spark, sfDir)
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents").select(col("doc_id"))
    val tl = ConnectedComponents
      .minLabel(docs, col("doc_id"), truss, col("lo"), col("hi"))
      .select(col("id"), col("cluster").as("tc"))
    val q80 = CandidateGraph.clusters(spark, sfDir).select(col("id"), col("cluster").as("c"))
    val lab = tl.join(q80, Seq("id"))
    // REFINEMENT: truss edges ⊆ candidate edges, so a truss component
    // can never span two published clusters — asserted per part
    assert(
      lab.groupBy("tc").agg(countDistinct(col("c")).as("n")).filter(col("n") > 1).count() === 0,
      "a truss part spans two published clusters — refinement violated"
    )
    // every SPLIT cluster must contain a peeled bridge: a candidate
    // edge the truss removed whose endpoints now sit in different
    // truss parts (the single unsupported edge that falsely merged)
    val pairs = CandidateGraph
      .pairs(spark, sfDir)
      .select(least(col("d1"), col("d2")).as("lo"), greatest(col("d1"), col("d2")).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
    val bridges = pairs
      .join(truss, Seq("lo", "hi"), "left_anti")
      .join(lab.select(col("id").as("lo"), col("tc").as("tc1"), col("c").as("cluster")), Seq("lo"))
      .join(lab.select(col("id").as("hi"), col("tc").as("tc2")), Seq("hi"))
      .filter(col("tc1") =!= col("tc2"))
      .select("cluster")
      .distinct()
    val split = Queries.trussSplitAudit(spark, sfDir).filter(col("split") === 1L).select("cluster")
    assert(
      split.join(bridges, Seq("cluster"), "left_anti").count() === 0,
      "a cluster is reported split but holds no peeled bridge edge"
    )
  }

  test("packing contamination (q375): S²−Σl² equals the brute cross-doc ordered token pair count on a real shard") {
    import graft.functions.TextOps
    val docs = graft.sources.Tables
      .parquet(spark, sfDir, "documents")
      .select(
        col("doc_id"),
        TextOps.hash32(concat(col("doc_id").cast("string"), lit("#epoch42"))).as("h"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tok")
      )
    val (cum, _) = graft.operators.Ntile
      .exactPrefixSum(docs, col("n_tok"), col("h"), col("doc_id"), binWidth = (1L << 20).toDouble, cumCol = "cum_tok")
    val byShard = cum
      .withColumn("shard_id", expr("(cum_tok - n_tok) div 1024"))
      .select("shard_id", "doc_id", "n_tok")
      .collect()
      .groupBy(_.getAs[Long]("shard_id"))
    // brute force on the FIRST shard: enumerate every ordered token
    // pair and count the cross-doc ones — the identity, not the formula
    val shard0 = byShard(0L).map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok")))
    val tokens = shard0.flatMap { case (d, l) => Array.fill(l.toInt)(d) }
    var brute = 0L
    for (x <- tokens; y <- tokens) if (x != y) brute += 1
    val s0 = shard0.map(_._2).sum
    val formula0 = s0 * s0 - shard0.map(t => t._2 * t._2).sum
    assert(formula0 === brute, s"S²−Σl² ($formula0) diverges from the enumerated pair count ($brute)")
    // and the engine's rollup at cap 1024 is exactly the per-shard sum
    val expected = byShard.values.map { rows =>
      val s = rows.map(_.getAs[Long]("n_tok")).sum
      s * s - rows.map(r => { val l = r.getAs[Long]("n_tok"); l * l }).sum
    }.sum
    val got = Queries
      .packingContamination(spark, sfDir)
      .filter(col("cap") === 1024L)
      .collect()(0)
      .getAs[Long]("cross_pairs")
    assert(got === expected)
  }

  test("priority sample (q364): with k ≥ n the estimator is exact — tau absent, ŵ = w, zero error") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "d e"), (3L, "f g h i"), (4L, "j")).toDF("doc_id", "text")
    val out = Queries.prioritySampleOf(docs, k = 32).collect()
    // corpora below k+1 rows must keep their whole sample (the tau
    // frame degrades to NULL, never to an annihilating empty frame)
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("tau")), "tau must be NULL when the rank-(k+1) row does not exist")
      assert(r.getAs[Long]("w_hat") === r.getAs[Long]("w"), "ŵ must degrade to w with no threshold")
    }
    assert(out.head.getAs[Long]("est_total_tokens") === out.head.getAs[Long]("total_tokens"))
    assert(out.head.getAs[Long]("err_permille") === 0L)
  }

  test("incremental winnow (q382): every full-run new×old pair survives the probe, never with fewer shared prints") {
    // the store's frozen stop list is a SUBSET of the full-corpus stop
    // list (store df ≤ total df), so the probe keeps at least the
    // prints the full run keeps — recall against the full recompute is
    // monotone, the invariant that makes the incremental path safe
    val isNew = (d: Long) => d % 5 == 0
    val full = Queries
      .winnowedOverlapPairs(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("n_shared")))
      .filter { case (a, b, _) => isNew(a) != isNew(b) }
      .map { case (a, b, n) => if (isNew(a)) ((a, b), n) else ((b, a), n) }
      .toMap
    val inc = Queries
      .incrementalWinnow(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("old_id")) -> r.getAs[Long]("n_shared"))
      .toMap
    assert(full.nonEmpty, "fixture too small: no full-run new×old pair to check against")
    full.foreach { case (k, nFull) =>
      assert(inc.contains(k), s"full-run pair $k missing from the incremental probe")
      assert(inc(k) >= nFull, s"pair $k lost shared prints: inc=${inc(k)} < full=$nFull")
    }
  }

  test("dp quantile (q381): exactly one winner, and it carries the maximum noisy utility") {
    val rows = Queries.dpQuantile(spark, sfDir).collect()
    val winners = rows.filter(_.getAs[Long]("is_winner") == 1L)
    assert(winners.length === 1)
    val maxNoisy = rows.map(_.getAs[Long]("u_noisy")).max
    assert(winners.head.getAs[Long]("u_noisy") === maxNoisy)
    // the CDF is a proper prefix: n_le is strictly increasing with v
    val nle = rows.sortBy(_.getAs[Long]("v")).map(_.getAs[Long]("n_le"))
    assert(nle.zip(nle.tail).forall { case (a, b) => a < b })
    assert(rows.map(_.getAs[Long]("argmax_preserved")).distinct.length === 1)
  }

  test("procrustes drift (q386): alignment collapses a pure rotation to ~zero and isolates injected noise") {
    val rows = Queries.procrustesDrift(spark, sfDir).collect()
    val byV = rows.map(r => r.getString(0) -> r).toMap
    val (nv1, al1) = (byV("1_rotated").getAs[Double]("naive_sq"), byV("1_rotated").getAs[Double]("aligned_sq"))
    val (nv2, al2) = (byV("2_rotated_noisy").getAs[Double]("naive_sq"), byV("2_rotated_noisy").getAs[Double]("aligned_sq"))
    // the optimum of a minimization can never go (meaningfully) negative
    assert(al1 >= -1e-6 && al2 >= -1e-6)
    // a pure orthogonal transform is NOT drift: alignment must collapse
    // it to grid-quantization dust while the naive metric screams
    assert(nv1 > 1.0, s"fixture degenerate: naive drift $nv1 too small to discriminate")
    assert(al1 < 0.001 * nv1, s"rotation not absorbed: aligned=$al1 vs naive=$nv1")
    // injected ±1% noise IS drift: the aligned metric must see it…
    assert(al2 > al1 + 1e-6, s"noise invisible: $al2 vs $al1")
    // …while still attributing the bulk of the naive number to rotation
    assert(al2 < 0.1 * nv2, s"alignment failed on the noisy variant: $al2 vs $nv2")
  }

  test("chao NDV (q390): the correction only adds unseen mass, and beats the naive sample-distinct here") {
    val r = Queries.chaoNdv(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("chao_milli") >= r.getAs[Long]("d_sample") * 1000)
    assert(
      math.abs(r.getAs[Long]("err_permille")) < math.abs(r.getAs[Long]("naive_err_permille")),
      s"chao ${r.getAs[Long]("err_permille")}‰ did not beat naive ${r.getAs[Long]("naive_err_permille")}‰"
    )
  }

  test("pii flow (q389): the sensitive columns flow where lineage says and nowhere else") {
    val rows = Queries.piiFlow(spark, sfDir).collect()
    val byC = rows.map(r => r.getString(0) -> r.getAs[Long]("contains_pii")).toMap
    assert(byC === Map("customer_name" -> 1L, "nation_code" -> 1L, "spend" -> 0L, "avg_order" -> 0L))
  }

  test("vacuum safety (q379): pins answer bit-identically, the expired generation is fully and physically reclaimed") {
    val rows = Queries.vacuumSafety(spark, sfDir).collect()
    val byV = rows.map(r => r.getAs[Int]("version") -> r).toMap
    // the expired snapshot's files are ALL reclaimable (the compaction
    // swap stranded them), and nothing a pin references is touched
    assert(byV(1).getAs[Long]("n_files_reclaimed") === byV(1).getAs[Long]("n_files"))
    assert(byV(1).getAs[Long]("bytes_reclaimed") === byV(1).getAs[Long]("manifest_bytes"))
    Seq(2, 3).foreach { v =>
      assert(byV(v).getAs[Long]("n_files_reclaimed") === 0L, s"v$v lost a pinned file")
      assert(byV(v).getAs[Long]("eq_after_vacuum") === 1L, s"v$v's answer changed through the vacuum")
    }
    // the append only adds rows on top of the compacted snapshot
    assert(byV(3).getAs[Long]("n_rows") > byV(2).getAs[Long]("n_rows"))
    // the reclaimed generation is physically gone, not just declared so
    val g1 = new java.io.File(s"/tmp/graft_vacuum/${new java.io.File(sfDir).getName}/g1")
    assert(g1.listFiles().count(_.getName.endsWith(".parquet")) === 0, "vacuum left expired data files on disk")
  }

  test("vacuum pin expiry (q396): expired reads refuse loudly with evidence, the naive answer would be partial, pins survive") {
    val rows = Queries.vacuumPinExpiry(spark, sfDir).collect()
    val byV = rows.map(r => r.getAs[Int]("version") -> r).toMap
    // both expired versions REFUSE — and each refusal carries the
    // missing-file census that justifies it
    Seq(1, 2).foreach { v =>
      assert(byV(v).getAs[Long]("refused") === 1L, s"expired v$v answered instead of refusing")
      assert(byV(v).getAs[Long]("n_files_missing") > 0L, s"v$v refused without missing-file evidence")
      assert(byV(v).isNullAt(byV(v).fieldIndex("n_rows_guarded")), s"v$v returned rows despite refusing")
    }
    // v1's files are all gone; v2 spans a surviving generation, so the
    // UNGUARDED read would have answered with a silently partial row
    // set — strictly more than v1's nothing, strictly less than v3
    assert(byV(1).getAs[Long]("n_rows_naive") === 0L)
    val naive2 = byV(2).getAs[Long]("n_rows_naive")
    assert(naive2 > 0L && naive2 < byV(3).getAs[Long]("n_rows_guarded"), "v2's naive answer is not the partial hazard")
    // the surviving pin answers bit-identically with zero missing files
    assert(byV(3).getAs[Long]("refused") === 0L)
    assert(byV(3).getAs[Long]("n_files_missing") === 0L)
    assert(byV(3).getAs[Long]("eq_after_vacuum") === 1L)
  }

  test("merge full sync (q395): the BY SOURCE clause matrix converges the table and both audits agree") {
    val rows = Queries.mergeFullSync(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("eq_declarative") === 1L, s"${r.getString(0)}: declarative state diverged from the CASE spec")
      assert(r.getAs[Long]("eq_procedural") === 1L, s"${r.getString(0)}: declarative state diverged from the anti-join twin")
    }
    // the fixture exercises every clause somewhere in the matrix
    assert(rows.map(_.getAs[Long]("n_inserted")).sum > 0L, "no NOT MATCHED insert fired")
    assert(rows.map(_.getAs[Long]("n_expired_deleted")).sum > 0L, "no BY SOURCE delete fired")
    assert(rows.map(_.getAs[Long]("n_tombstoned")).sum > 0L, "no BY SOURCE update fired")
  }

  test("hilbert enacted (q397): physical zone maps equal the advisor's prediction and hilbert prunes no worse than date-major") {
    val rows = Queries.hilbertEnact(spark, sfDir).collect()
    val byL = rows.map(r => r.getString(0) -> r).toMap
    assert(byL.keySet === Set("hilbert", "date_major"))
    rows.foreach { r =>
      assert(r.getAs[Long]("advisor_eq") === 1L, s"${r.getString(0)}: physical files diverged from the advisor's cells")
      // zone-map pruning is sound: every true match is inside a touched file
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_matched"))
      assert(r.getAs[Long]("rows_total") >= r.getAs[Long]("rows_scanned"))
    }
    // the continuity argument made physical: the Hilbert layout's box
    // scan reads no more rows than the date-major strawman's
    assert(
      byL("hilbert").getAs[Long]("rows_scanned") <= byL("date_major").getAs[Long]("rows_scanned"),
      "hilbert layout scanned more than date-major on the box query"
    )
  }

  test("ann rollout gate (q398): paired census is total, sign test exact vs Pascal's triangle, verdict consistent") {
    val rows = Queries.annRolloutGate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hs = r.getAs[Long]("hits_stale"); val hf = r.getAs[Long]("hits_fresh")
      assert(hs >= 0L && hs <= 3L && hf >= 0L && hf <= 3L)
      assert(r.getAs[Long]("delta") === hf - hs)
    }
    val wins = rows.head.getAs[Long]("wins")
    val losses = rows.head.getAs[Long]("losses")
    val p = rows.head.getAs[Long]("p_value_nano")
    val promoted = rows.head.getAs[Long]("promoted")
    assert(rows.forall(r => r.getAs[Long]("wins") == wins && r.getAs[Long]("losses") == losses))
    // the summary is exactly the per-query census
    assert(wins === rows.count(_.getAs[Long]("delta") > 0L).toLong)
    assert(losses === rows.count(_.getAs[Long]("delta") < 0L).toLong)
    // sign test recomputed INDEPENDENTLY via Pascal's triangle
    val n = (wins + losses).toInt
    val expectedP =
      if (n == 0) 1000000000L
      else {
        var row = Array(BigInt(1))
        (1 to n).foreach { _ =>
          row = (BigInt(1) +: (1 until row.length).map(i => row(i - 1) + row(i)) :+ BigInt(1)).toArray
        }
        (row.drop(wins.toInt).sum * BigInt(1000000000L) / row.sum).toLong
      }
    assert(p === expectedP, s"sign-test p-value drifted: $p vs $expectedP (wins=$wins losses=$losses)")
    assert(promoted === (if (wins > losses && p < 50000000L) 1L else 0L))
  }

  test("merge schema evolution (q399): every tier stratum matches the CASE spec, legacy rows read NULL") {
    val rows = Queries.mergeSchemaEvolution(spark, sfDir).collect()
    assert(rows.length === 3)
    rows.foreach(r => assert(r.getAs[Long]("eq_case") === 1L, s"tier=${r.get(0)} diverged from the CASE spec"))
    val byTier = rows.map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getAs[Long]("n_rows")).toMap
    // the legacy stratum (rows the evolving merge never touched) exists
    // and reads the evolved column as NULL; both tiers landed
    assert(byTier.contains(null) && byTier(null) > 0L)
    assert(byTier.getOrElse("gold", 0L) + byTier.getOrElse("std", 0L) > 0L)
  }

  test("deletion vectors (q400): positions-only deletes, physically untouched data files, stacking, compaction") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // contract fixture: the (file, row_index) anti-join IS positional
    // delete — survivors are exactly the non-tombstoned coordinates
    val base = graft.operators.Scratch.dir("graft-dvspec")
    (1L to 20L).toDF("k").repartition(2, col("k")).write.mode("overwrite").parquet(s"$base/d")
    def scan = spark.read
      .parquet(s"$base/d")
      .select(col("k"), col("_metadata.file_name").as("f"), col("_metadata.row_index").as("ri"))
    val listingBefore = new java.io.File(s"$base/d").listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    scan.filter(col("k") % 5 === 0).select("f", "ri").write.mode("overwrite").parquet(s"$base/dv")
    // the delete wrote NOTHING into the data dir — same files, same
    // bytes, same mtimes
    val listingAfter = new java.io.File(s"$base/d").listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length(), f.lastModified())).toSet
    assert(listingAfter === listingBefore, "a positional delete touched the data files")
    val survivors = scan
      .join(spark.read.parquet(s"$base/dv"), Seq("f", "ri"), "left_anti")
      .select("k").as[Long].collect().sorted.toSeq
    assert(survivors === (1L to 20L).filterNot(_ % 5 == 0))
    // the full query's earned flags at sf0.001
    val rows = Queries.deletionVectors(spark, sfDir).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("1_delete_dv", "2_stacked_dv", "3_compacted"))
    rows.foreach(r => assert(r.getAs[Long]("eq_eager") === 1L, s"${r.getString(0)} diverged from the eager rewrite"))
    val byP = rows.map(r => r.getString(0) -> r).toMap
    // stacking strictly shrinks the live set and grows the vector
    assert(byP("2_stacked_dv").getAs[Long]("n_live") < byP("1_delete_dv").getAs[Long]("n_live"))
    assert(byP("2_stacked_dv").getAs[Long]("n_dv_entries") > byP("1_delete_dv").getAs[Long]("n_dv_entries"))
    // compaction preserves the answer and retires the vectors
    assert(byP("3_compacted").getAs[Long]("n_live") === byP("2_stacked_dv").getAs[Long]("n_live"))
    assert(byP("3_compacted").getAs[Long]("n_dv_entries") === 0L)
    // the economics that justify the feature: an eager delete rewrites
    // orders of magnitude more rows than the DV records
    assert(byP("1_delete_dv").getAs[Long]("rewrite_amplification_permille") > 1000L)
  }

  test("partition evolution (q401): each generation prunes by its own scheme, planning-time, with the measured gap") {
    import org.apache.spark.sql.functions._
    val rows = Queries.partitionEvolution(spark, sfDir).collect()
    val byG = rows.map(r => r.getString(0) -> r).toMap
    assert(byG.keySet === Set("g1", "g2"))
    // the evolved generation scans EXACTLY its matches (both dimensions
    // prune); the legacy generation overscans (year prunes, status
    // cannot — it is data there, not layout)
    assert(byG("g2").getAs[Long]("rows_scanned") === byG("g2").getAs[Long]("rows_matched"))
    assert(byG("g2").getAs[Long]("scan_permille") === 1000L)
    assert(byG("g1").getAs[Long]("rows_scanned") > byG("g1").getAs[Long]("rows_matched"))
    rows.foreach(r => assert(r.getAs[Long]("n_files_scanned") <= r.getAs[Long]("n_files_total")))
    // and the pruning is PLANNING-time: the partition predicate reaches
    // the scan as a PartitionFilter on the evolved layout
    val base = graft.operators.Scratch.dir("graft-partevo-plan")
    graft.sources.Tables
      .parquet(spark, sfDir, "orders")
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"), year(col("o_orderdate")).as("yr"))
      .filter(col("yr") >= 1998)
      .repartition(col("yr"), col("st"))
      .write.mode("overwrite").partitionBy("yr", "st").parquet(base)
    val plan = spark.read
      .parquet(base)
      .filter(col("yr") === 1998 && col("st") === "O")
      .queryExecution.executedPlan.toString
    assert(
      plan.linesIterator.exists(l => l.contains("PartitionFilters") && l.contains("yr") && l.contains("st")),
      s"partition predicate did not reach the scan:\n$plan"
    )
  }

  test("write-audit-publish (q402): the gate passes clean batches, rejects real poison, and rejected rows never surface") {
    val rows = Queries.writeAuditPublish(spark, sfDir).collect()
    val byP = rows.map(r => r.getString(0) -> r).toMap
    assert(byP.keySet === Set("v1_initial", "v2_good_published", "v3_poison_rejected"))
    // the clean batch published; the poisoned one did not
    assert(byP("v2_good_published").getAs[Long]("published") === 1L)
    assert(byP("v3_poison_rejected").getAs[Long]("published") === 0L)
    // the audit fired on REAL defects, not on a vacuous batch
    assert(byP("v3_poison_rejected").getAs[Long]("n_null_keys") > 0L)
    assert(byP("v3_poison_rejected").getAs[Long]("n_dup_keys_vs_main") > 0L)
    assert(byP("v3_poison_rejected").getAs[Long]("n_staged_rows") > 0L)
    // a rejected publish changes NOTHING: v3 reads exactly v2
    assert(byP("v3_poison_rejected").getAs[Long]("n_rows_visible") === byP("v2_good_published").getAs[Long]("n_rows_visible"))
    assert(byP("v3_poison_rejected").getAs[Long]("key_checksum") === byP("v2_good_published").getAs[Long]("key_checksum"))
    // and a successful publish grows the read by exactly the batch
    assert(
      byP("v2_good_published").getAs[Long]("n_rows_visible") ===
        byP("v1_initial").getAs[Long]("n_rows_visible") + byP("v2_good_published").getAs[Long]("n_staged_rows")
    )
    // poison is invisible in EVERY version
    rows.foreach(r => assert(r.getAs[Long]("n_poison_visible") === 0L, s"${r.getString(0)} leaked unaudited rows"))
  }

  test("ivf nprobe sweep (q403): recall and cost are monotone in depth, shares bounded, the curve is a real trade") {
    val rows = Queries.ivfNprobeSweep(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("nprobe")).toSeq === Seq(1, 2, 4, 8))
    // deeper probes can only ADD candidates (a filter on one shared
    // frame), and more candidates can only help a top-k cut's recall
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("n_candidates") > a.getAs[Long]("n_candidates"))
      assert(b.getAs[Long]("recall_permille") >= a.getAs[Long]("recall_permille"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("scan_permille") >= 0L && r.getAs[Long]("scan_permille") <= 1000L)
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_queries") * 10L)
    }
    // the sweep is a real trade, not a flat line: the widest depth
    // buys strictly more recall than the narrowest at strictly more cost
    assert(rows.last.getAs[Long]("recall_permille") > rows.head.getAs[Long]("recall_permille"))
  }

  test("ann compact + retrain trigger (q393): contract flags earned, drift signals consistent with the decision") {
    val r = Queries.annCompactRetrain(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("files_reduced") === 1L, "compaction did not reduce the file census")
    assert(r.getAs[Long]("serve_eq_appended") === 1L, "compacted serve diverged from the appended serve")
    val drift = r.getAs[Long]("drift_l1_permille")
    val shift = r.getAs[Long]("centroid_shift_fp")
    assert(drift >= 0L && drift <= 2000L, s"assignment drift out of range: $drift")
    assert(shift >= 0L)
    val recommended = r.getAs[Long]("retrain_recommended")
    assert(recommended === (if (drift >= 25L || shift >= 4096L) 1L else 0L), "decision disagrees with its own signals")
    // recall_recovered is the AUDIT of the recommendation — it must be
    // exactly the comparison of the two measured recalls, not a wish
    val rec = r.getAs[Long]("recall_recovered")
    val stale = r.getAs[Long]("recall_stale_permille")
    val fresh = r.getAs[Long]("recall_retrained_permille")
    assert(rec === (if (fresh >= stale) 1L else 0L))
    assert(stale >= 0L && stale <= 1000L && fresh >= 0L && fresh <= 1000L)
  }
}
