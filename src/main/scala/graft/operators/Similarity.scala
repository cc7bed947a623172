package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NumOps, TopKAggregator, VectorOps}

/** Similarity search over embedding columns (`array<float>`).
  *
  * [[bruteForceTopK]] is the exactness baseline: a broadcast of the
  * (small) query set against a streamed full scan of the corpus — one
  * pass, the corpus never shuffles and never travels to the driver.
  * Right up to ~10⁴ queries × 10⁹ rows it is often the honest winner on
  * a cluster.
  *
  * Per-query ranking everywhere uses a bounded [[TopKAggregator]]
  * rather than a window rank: partial aggregation keeps at most k
  * candidates per (query, partition), so the shuffle carries k·|q|·
  * |partitions| rows instead of every scored pair.
  *
  * [[lshTopK]] is the sublinear path: random-hyperplane signatures
  * bucket the corpus (one cheap column), and only same-bucket pairs are
  * scored. Hyperplane signs are derived from [[TextOps.hash32]] of
  * "k:d" strings — deterministic, no RNG, identical across engines and
  * runs. At 100 TB the bucketed join replaces the n·q scoring loop with
  * per-bucket work; multi-probe = widen the bucket join key.
  *
  * Ranking ties and float-rounding: scores are rounded (half-away, 6dp)
  * BEFORE ranking and tie-broken by neighbor id, so top-k sets are
  * stable across partitionings and engines.
  *
  * Cache discipline: no operator here leaks cached blocks into the
  * session (NoLeakSpec pins `getPersistentRDDs` empty after execution).
  * [[ivfTopK]] persists its training frame only for the Lloyd
  * iterations — which materialize it via their own collects — and
  * unpersists before the search plan is built; the LSH operators don't
  * cache at all: their self-joins consume one shared subtree (the
  * planner's ReuseExchange materializes it once at shuffle scale), and
  * the query-side branches are pruned to the tiny query set by filter
  * pushdown, so the corpus-wide signature pass runs once.
  */
object Similarity {

  /** Per-query bounded top-k over (qid, nid, sim) rows: groupBy qid
    * with a k-bounded aggregator (map-side partials), then explode back
    * to one ranked row per neighbor. Emits (qid, nid, sim, rank).
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    scored
      .groupBy("qid")
      .agg(topk(col("sim"), col("nid")).as("tk"))
      .select(col("qid"), posexplode(col("tk")))
      .select(col("qid"), col("col.nid").as("nid"), col("col.sim").as("sim"), (col("pos") + 1).as("rank"))
  }

  /** Two-stage retrieval's second stage: an ANN SHORTLIST (any
    * candidate generator — IVF-PQ in q290) re-scored EXACTLY against
    * the full vectors, then cut to the final k. This is the production
    * serving shape: the compressed index does the corpus-scale pruning
    * and the expensive exact cosine runs only on |Q|·k_short rows — so
    * quantization error decides RECALL (a truly-close neighbor the
    * shortlist missed stays missed) but never the final ORDER. Both
    * vector fetches are id-keyed equi-joins; the query side is
    * |Q|-bounded.
    */
  def rerankExactTopK(
      shortlist: DataFrame,
      vecs: DataFrame,
      id: Column,
      emb: Column,
      k: Int
  ): DataFrame = {
    val side = vecs.select(id.as("vid"), emb.as("e"), VectorOps.normSq(emb).as("n2"))
    val scored = shortlist
      .select("qid", "nid")
      .join(side.select(col("vid").as("qid"), col("e").as("qe"), col("n2").as("qn")), Seq("qid"))
      .join(side.select(col("vid").as("nid"), col("e").as("ne"), col("n2").as("nn")), Seq("nid"))
      .select(
        col("qid"),
        col("nid"),
        NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim")
      )
    topKPerQuery(scored, k)
  }

  /** Exact cosine top-k of a query frame against a SEPARATE corpus
    * frame — the FILTERED-search primitive: a metadata predicate
    * narrows the corpus BEFORE any scoring, so the scan only moves the
    * eligible vectors (the "filtered ANN" production shape; the
    * post-filter alternative under-fills k whenever the predicate is
    * selective). Same plan skeleton as [[bruteForceTopK]]: queries
    * broadcast, corpus streams, k-bounded aggregator.
    */
  def exactTopKBetween(queries: DataFrame, corpus: DataFrame, id: Column, emb: Column, k: Int): DataFrame = {
    val q = queries.select(id.as("qid"), emb.as("qe"), VectorOps.normSq(emb).as("qn"))
    val c = corpus.select(id.as("nid"), emb.as("ne"), VectorOps.normSq(emb).as("nn"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid"))
      .select(
        col("qid"),
        col("nid"),
        NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim")
      )
    topKPerQuery(scored, k)
  }

  /** Exact cosine top-k: for each query vector (filter `isQuery`), the
    * `k` highest-cosine neighbors (excluding self). The QUERY side is
    * broadcast (it's the small one); the corpus streams — broadcasting
    * the corpus would OOM the moment it outgrows one executor.
    */
  def bruteForceTopK(vecs: DataFrame, id: Column, emb: Column, isQuery: Column, k: Int = 10): DataFrame = {
    // norms once per row at the scan, not once per pair: each pair then
    // costs ONE dot product instead of three
    val q = vecs.filter(isQuery).select(id.as("qid"), emb.as("qe"), VectorOps.normSq(emb).as("qn"))
    val c = vecs.select(id.as("nid"), emb.as("ne"), VectorOps.normSq(emb).as("nn"))
    val scored = c
      .join(broadcast(q), col("qid") =!= col("nid"))
      .select(
        col("qid"),
        col("nid"),
        NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim")
      )
    topKPerQuery(scored, k)
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the `k` highest-cosine neighbors whose `label` DIFFERS —
    * the semantically-closest wrong answers, the negatives that teach
    * an embedding model the most. Same plan skeleton as
    * [[bruteForceTopK]] (broadcast queries onto the streaming corpus,
    * k-bounded map-side TopK partials), with the label-exclusion
    * predicate riding the SAME join — no second pass, no post-filter
    * that would under-fill k. At 100 TB swap the candidate stage for
    * the IVF probe (q36/q193): the exclusion predicate composes
    * identically on the (cell-keyed) candidate rows; the brute rung
    * here is the recall baseline, mirroring the q29/q51 ladder shape.
    */
  def hardNegativeTopK(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      label: Column,
      isQuery: Column,
      k: Int
  ): DataFrame = {
    val q = vecs
      .filter(isQuery)
      .select(id.as("qid"), emb.as("qe"), VectorOps.normSq(emb).as("qn"), label.as("ql"))
    val c = vecs.select(id.as("nid"), emb.as("ne"), VectorOps.normSq(emb).as("nn"), label.as("nl"))
    val scored = c
      .join(broadcast(q), col("ql") =!= col("nl"))
      .select(
        col("qid"),
        col("nid"),
        NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim")
      )
    topKPerQuery(scored, k)
  }

  /** All corpus pairs with cosine ≥ threshold — embedding-based
    * near-duplicate detection (brute rung). No forced broadcast: both
    * sides are the corpus, so the planner picks BroadcastNestedLoop
    * while one side fits an executor and a partition-tiled
    * CartesianProduct (each task pairs one partition per side) beyond
    * that — the honest all-pairs shape.
    *
    * SPEC-ONLY ground truth: an O(n²) theta join must never ship as a
    * query (the same demotion as unbounded Jaccard). The canonical
    * near-dup query is [[lshNearDupPairs]] (q51); SimilaritySpec uses
    * this form to containment-check the LSH rung's recall.
    */
  def nearDupPairs(vecs: DataFrame, id: Column, emb: Column, threshold: Double): DataFrame = {
    val a = vecs.select(id.as("d1"), emb.as("e1"), VectorOps.normSq(emb).as("n1"))
    val b = vecs.select(id.as("d2"), emb.as("e2"), VectorOps.normSq(emb).as("n2"))
    a.join(b, col("d1") < col("d2"))
      .select(
        col("d1"),
        col("d2"),
        NumOps.roundAway(VectorOps.dot(col("e1"), col("e2")) / sqrt(col("n1") * col("n2")), 6).as("sim")
      )
      .filter(col("sim") >= threshold)
  }

  /** ±1 signs of hyperplane `k` over `dim` dimensions, from the parity
    * of hash32("k:d") — deterministic, engine-independent. Exposed to
    * [[graft.Oracles]] so the DuckDB mirror bakes the identical planes.
    */
  private[graft] def hyperplaneSigns(dim: Int, k: Int): Array[Double] =
    Array.tabulate(dim)(d => if (md5Parity(s"$k:$d") == 1) 1.0 else -1.0)

  /** Deterministic random-hyperplane bit: sign of Σ_d e[d]·s(k,d),
    * where s(k,d) = ±1 from the parity of hash32("k:d").
    */
  private def hyperplaneBit(emb: Column, dim: Int, k: Int): Column = {
    val proj = VectorOps.dot(emb, typedlit(hyperplaneSigns(dim, k)))
    when(proj >= 0, lit(1L << k)).otherwise(lit(0L))
  }

  /** Driver-side parity of hash32(s) — same MD5-derived hash as the
    * engine side, computed once per (k,d) at plan time.
    */
  private def md5Parity(s: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex, 16) & 1L).toInt
  }

  /** LSH-bucketed ANN, multi-table: `tables` independent hash tables of
    * `bits` hyperplane bits each; a corpus row is a candidate for a
    * query if they share ANY table's bucket; exact cosine reranks the
    * candidates; bounded top-k per query.
    *
    * Recall for a neighbor at angle θ is `1-(1-(1-θ/π)^bits)^tables` —
    * e.g. ~0.83 at cosine 0.5 with 8×4 — tunable without touching the
    * plan shape. At scale the candidate join shuffles (table, bucket)
    * keys, never the corpus×query cross product. Mirrored exactly by
    * the DuckDB oracle (q31) and recall-checked against
    * [[bruteForceTopK]] in tests.
    */
  def lshTopK(vecs: DataFrame, id: Column, emb: Column, isQuery: Column, dim: Int, bits: Int = 4, tables: Int = 8, k: Int = 3): DataFrame = {
    val bucketStructs = (0 until tables).map { l =>
      struct(
        lit(l).as("tbl"),
        (0 until bits).map(b => hyperplaneBit(emb, dim, l * bits + b)).reduce(_ + _).as("bv")
      )
    }
    // (vec, table, bucket) rows; ONE self-join keyed (table, bucket),
    // not a join per table. The query side prunes to the query set
    // before the signature projection (filter pushdown through the
    // explode), so corpus-wide signatures compute once — on the corpus
    // side — and the tiny query side recomputes only its own rows
    val exploded = vecs
      .select(id.as("vid"), isQuery.as("is_q"), explode(array(bucketStructs: _*)).as("b"))
      .select(col("vid"), col("is_q"), col("b.tbl").as("tbl"), col("b.bv").as("bv"))
    val pairs = exploded
      .filter(col("is_q"))
      .select(col("vid").as("qid"), col("tbl"), col("bv"))
      .join(exploded.select(col("vid").as("nid"), col("tbl"), col("bv")), Seq("tbl", "bv"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
      .distinct()
    val qe = vecs.filter(isQuery).select(id.as("qid"), emb.as("qe"), VectorOps.normSq(emb).as("qn"))
    val ne = vecs.select(id.as("nid"), emb.as("ne"), VectorOps.normSq(emb).as("nn"))
    val scored = pairs
      .join(qe, "qid")
      .join(ne, "nid")
      .select(
        col("qid"),
        col("nid"),
        NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim")
      )
    topKPerQuery(scored, k)
  }

  /** Embedding near-dup at scale — the LSH rung above [[nearDupPairs]]:
    * candidate pairs are rows sharing ANY hyperplane table's bucket
    * (same deterministic planes as [[lshTopK]]), exact cosine reranks
    * only the candidates, threshold filters. The all-pairs theta join
    * disappears: the self-join keys on (table, bucket) — at 100 TB it
    * shuffles (id, 8-byte bucket) rows, never the vector cross product.
    * Candidate recall at cosine ≥ t follows the `1-(1-(1-θ/π)^bits)
    * ^tables` curve; near-dup thresholds (cosine ≥ 0.8 ⇒ θ ≤ 0.2π)
    * give ≥ 0.97 with the 8×4 default. Mirrored exactly by the DuckDB
    * oracle (q51) and containment-checked against [[nearDupPairs]] in
    * SimilaritySpec.
    */
  def lshNearDupPairs(vecs: DataFrame, id: Column, emb: Column, dim: Int, threshold: Double, bits: Int = 4, tables: Int = 8): DataFrame = {
    val bucketStructs = (0 until tables).map { l =>
      struct(
        lit(l).as("tbl"),
        (0 until bits).map(b => hyperplaneBit(emb, dim, l * bits + b)).reduce(_ + _).as("bv")
      )
    }
    // same-name self-join, renamed AFTER: both sides are the identical
    // subtree, so at shuffle scale the planner materializes the
    // signature pass once (ReuseExchange) — no persist, nothing leaks
    val exploded = vecs
      .select(id.as("vid"), explode(array(bucketStructs: _*)).as("b"))
      .select(col("vid"), col("b.tbl").as("tbl"), col("b.bv").as("bv"))
    val pairs = exploded
      .as("a")
      .join(exploded.as("b"), Seq("tbl", "bv"))
      .filter(col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("d1"), col("b.vid").as("d2"))
      .distinct()
    val a = vecs.select(id.as("d1"), emb.as("e1"), VectorOps.normSq(emb).as("n1"))
    val b = vecs.select(id.as("d2"), emb.as("e2"), VectorOps.normSq(emb).as("n2"))
    pairs
      .join(a, "d1")
      .join(b, "d2")
      .select(
        col("d1"),
        col("d2"),
        NumOps.roundAway(VectorOps.dot(col("e1"), col("e2")) / sqrt(col("n1") * col("n2")), 6).as("sim")
      )
      .filter(col("sim") >= threshold)
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer buckets the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * cells and exact-reranks only those members.
    *
    * Determinism: centroids initialize from the `nlist` lowest-id
    * vectors and run a fixed number of Lloyd iterations — no RNG — and
    * centroid means quantize inputs to 6dp and sum as decimal (exact,
    * associative), so cells and results are bit-identical across
    * partitionings, runs, and engines (the DuckDB oracle, q36, unrolls
    * the same iterations). Centroids are tiny (nlist×dim doubles) and
    * travel as ONE [[graft.plans.NearestCells]] reference object per
    * plan — O(1) plan size in nlist, codegen-safe at production cell
    * counts (NearestCellsSpec runs nlist=1024); the training frame is
    * cached across the Lloyd collects and unpersisted before the search
    * plan is built (at 100 TB: train on a sample instead, then one
    * assignment pass — the search-path plan shape is unchanged). The
    * probe join shuffles (cell, id) pairs, never the full query×corpus
    * cross product.
    */
  def ivfTopK(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      isQuery: Column,
      nlist: Int,
      nprobe: Int,
      k: Int,
      lloydIters: Int = 2
  ): DataFrame = {
    // cached for the TRAINING phase only: each Lloyd pass collect()s
    // against this frame, so the cache materializes immediately and
    // every iteration reads it instead of parquet; unpersisted below
    // before the search plan is built (no blocks outlive the operator)
    val base = vecs.select(id.as("vid"), emb.as("e"), isQuery.as("is_q")).persist()

    var centroids: Array[Array[Double]] = null

    // argmax of (v·c - |c|²/2) == nearest centroid by L2. The centroid
    // MATRIX travels as one plan reference (NearestCells), not nlist
    // inlined struct literals — O(1) plan size, codegen-safe at any nlist
    def nearestCell(v: Column): Column =
      element_at(cellsOf(v, centroids, 1), 1)

    // try/finally: a failed init or training collect must not leak the
    // cache (the finally is the ONLY unpersist path)
    try {
      centroids = trainCentroids(base, nlist, lloydIters)
    } finally {
      // training done (or failed) — drop the cache before building the
      // search plan: the corpus/probe branches below re-read the
      // (column-pruned, pushed-down) source, and the session keeps no
      // blocks either way
      base.unpersist(blocking = true)
    }

    val corpus = base.select(col("vid").as("nid"), col("e").as("ne"), VectorOps.normSq(col("e")).as("nn"), nearestCell(col("e")).as("cell"))
    val probes = base
      .filter(col("is_q"))
      .select(
        col("vid").as("qid"),
        col("e").as("qe"),
        VectorOps.normSq(col("e")).as("qn"),
        explode(probeCells(col("e"), centroids, nprobe)).as("cell")
      )
    val scored = probes
      .join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim"))
      .distinct() // a neighbor can surface via several probed cells
    topKPerQuery(scored, k)
  }

  /** Deterministic coarse k-means (shared by [[ivfTopK]], [[ivfPqTopK]]
    * and [[semanticDedupCells]]): init = the `nlist` lowest-id vectors,
    * `lloydIters` fixed Lloyd passes, no RNG. Means quantize elements
    * to 6dp and sum as decimal — exact, associative, partition-order
    * invariant — so every engine (and the DuckDB oracle's unrolled
    * iterations) lands on bit-identical centroids. Expects `base` to
    * carry `vid` / `e` columns and be persisted by the caller (each
    * pass collect()s against it).
    */
  private[graft] def trainCentroids(base: DataFrame, nlist: Int, lloydIters: Int): Array[Array[Double]] = {
    // deterministic init: the nlist lowest-id vectors
    var centroids: Array[Array[Double]] = base
      .orderBy("vid")
      .limit(nlist)
      .select("e")
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    (1 to lloydIters).foreach { _ =>
      val assigned = base.select(col("vid"), col("e"), element_at(cellsOf(col("e"), centroids, 1), 1).as("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "x")))
        .groupBy("cell", "pos")
        .agg((sum(NumOps.roundAway(col("x").cast("double"), 6).cast("decimal(25,6)")).cast("double") / count(lit(1))).as("m"))
        .collect()
      val byCell = means.groupBy(_.getAs[Int]("cell"))
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        byCell.get(j) match {
          case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m"))
          case None => old // empty cell keeps its centroid
        }
      }
    }
    centroids
  }

  /** Every vector's coarse-cell assignment under the shared
    * deterministic quantizer — the reusable first half of
    * [[semanticDedupCells]], and the bucketing for cluster-balanced
    * diverse subsampling (q205): train (on a sample at scale), then
    * ONE map pass against broadcast centroids.
    */
  def assignCells(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      nlist: Int,
      lloydIters: Int = 2
  ): DataFrame = {
    val base = vecs.select(id.as("vid"), emb.as("e")).persist()
    val centroids =
      try trainCentroids(base, nlist, lloydIters)
      finally base.unpersist(blocking = true)
    base.select(col("vid"), element_at(cellsOf(col("e"), centroids, 1), 1).as("cell"))
  }

  /** SemDeDup-shaped semantic dedup: bucket the corpus by the SAME
    * deterministic coarse quantizer the IVF rungs train, score cosine
    * only WITHIN a cell, and greedily drop the larger id of any pair
    * at/above `threshold`. Returns one row per occupied cell with the
    * dedup accounting (members, confirmed pairs, dropped, kept).
    *
    * This is the embedding twin of the MinHash ladder: LSH buckets
    * (q51) catch near-identical vectors; k-means cells catch
    * SEMANTIC redundancy — paraphrases that share meaning, not bytes.
    * At 100 TB the cell assignment is one map pass against broadcast
    * centroids (train on a sample), the pair join is keyed on the cell
    * — never a corpus cross product — and cell population is bounded
    * by the nlist choice, exactly how production SemDeDup shards.
    */
  def semanticDedupCells(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      nlist: Int,
      threshold: Double,
      lloydIters: Int = 2
  ): DataFrame = {
    val base = vecs.select(id.as("vid"), emb.as("e")).persist()
    val centroids =
      try trainCentroids(base, nlist, lloydIters)
      finally base.unpersist(blocking = true)
    val assigned = base.select(
      col("vid"),
      col("e"),
      VectorOps.normSq(col("e")).as("nn"),
      element_at(cellsOf(col("e"), centroids, 1), 1).as("cell")
    )
    val dupPairs = assigned
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.vid") < col("b.vid"))
      .select(
        col("a.cell").as("cell"),
        col("a.vid").as("v1"),
        col("b.vid").as("v2"),
        NumOps.roundAway(VectorOps.dot(col("a.e"), col("b.e")) / sqrt(col("a.nn") * col("b.nn")), 6).as("sim")
      )
      .filter(col("sim") >= threshold)
    val perCell = assigned.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
    val pairStats = dupPairs.groupBy("cell").agg(count(lit(1)).as("n_dup_pairs"))
    val dropStats = dupPairs
      .select(col("cell"), col("v2"))
      .distinct()
      .groupBy("cell")
      .agg(count(lit(1)).as("n_dropped"))
    perCell
      .join(pairStats, Seq("cell"), "left")
      .join(dropStats, Seq("cell"), "left")
      .select(
        col("cell"),
        col("n_vecs"),
        coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        (col("n_vecs") - coalesce(col("n_dropped"), lit(0L))).as("n_kept")
      )
      .orderBy("cell")
  }

  /** (vid, e, nn, cell) under GIVEN frozen centroids — the reusable
    * assignment half of the incremental SemDeDup path: one map pass
    * against broadcast centroids, norms precomputed once.
    */
  private[graft] def assignedWithNorm(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      centroids: Array[Array[Double]]
  ): DataFrame =
    vecs
      .select(id.as("vid"), emb.as("e"))
      .select(
        col("vid"),
        col("e"),
        VectorOps.normSq(col("e")).as("nn"),
        element_at(cellsOf(col("e"), centroids, 1), 1).as("cell")
      )

  /** The 6dp within-cell cosine both SemDeDup paths share. */
  private def cellCosine(aE: Column, aN: Column, bE: Column, bN: Column): Column =
    NumOps.roundAway(VectorOps.dot(aE, bE) / sqrt(aN * bN), 6)

  /** [[semanticDedupCells]]'s keep rule under GIVEN assignments: a
    * vector is dropped iff SOME smaller-id cellmate scores at/above
    * `threshold` (q197's greedy larger-id drop). Factored out so the
    * incremental path and its full-recompute audit twin run the SAME
    * rule. Returns the kept rows (vid, e, nn, cell).
    */
  private[graft] def keptUnderRule(assigned: DataFrame, threshold: Double): DataFrame = {
    val dropped = assigned
      .as("a")
      .join(assigned.as("b"), col("a.cell") === col("b.cell") && col("a.vid") < col("b.vid"))
      .filter(cellCosine(col("a.e"), col("a.nn"), col("b.e"), col("b.nn")) >= threshold)
      .select(col("b.vid").as("vid"))
      .distinct()
    assigned.join(dropped, Seq("vid"), "left_anti")
  }

  /** Incremental SemDeDup — q197's embedding dedup in the q202 shape,
    * the continuous-curation production path: the coarse quantizer is
    * FROZEN (trained on the existing corpus only — a batch must not
    * move yesterday's cell boundaries), the new batch is assigned to
    * those cells in one map pass, and cosine runs only within-cell
    * against (a) the existing KEEPERS — dropped docs left the store,
    * there is nothing else to compare against — and (b) smaller-id
    * batchmates, q197's greedy rule applied inside the batch. Emits
    * keep/drop per new doc with the evidence counts and the cell's
    * keeper census, so per-cell accounting closes:
    * n_old_keepers + batch = keepers' + drops. Scale shape: the corpus
    * never re-pairs — the batch joins keepers cell-keyed (batch-sized
    * left side) and itself within-cell; everything else is map-side
    * assignment against broadcast centroids.
    */
  def incrementalSemanticDedup(
      oldVecs: DataFrame,
      newVecs: DataFrame,
      id: Column,
      emb: Column,
      nlist: Int,
      threshold: Double,
      lloydIters: Int = 2
  ): DataFrame = {
    val oldBase = oldVecs.select(id.as("vid"), emb.as("e")).persist()
    val centroids =
      try trainCentroids(oldBase, nlist, lloydIters)
      finally oldBase.unpersist(blocking = true)
    val keepers = keptUnderRule(assignedWithNorm(oldVecs, id, emb, centroids), threshold)
    val newA = assignedWithNorm(newVecs, id, emb, centroids)
    val keeperHits = newA
      .as("n")
      .join(keepers.as("k"), col("n.cell") === col("k.cell"))
      .filter(cellCosine(col("n.e"), col("n.nn"), col("k.e"), col("k.nn")) >= threshold)
      .select(col("n.vid").as("vid"))
      .groupBy("vid")
      .agg(count(lit(1)).as("n_keeper_hits"))
    val batchHits = newA
      .as("x")
      .join(newA.as("y"), col("x.cell") === col("y.cell") && col("y.vid") < col("x.vid"))
      .filter(cellCosine(col("x.e"), col("x.nn"), col("y.e"), col("y.nn")) >= threshold)
      .select(col("x.vid").as("vid"))
      .groupBy("vid")
      .agg(count(lit(1)).as("n_batch_hits"))
    val keepersPerCell = keepers.groupBy("cell").agg(count(lit(1)).as("n_old_keepers"))
    newA
      .select(col("vid"), col("cell"))
      .join(keeperHits, Seq("vid"), "left")
      .join(batchHits, Seq("vid"), "left")
      .join(keepersPerCell, Seq("cell"), "left")
      .select(
        col("vid"),
        col("cell"),
        coalesce(col("n_old_keepers"), lit(0L)).as("n_old_keepers"),
        coalesce(col("n_keeper_hits"), lit(0L)).as("n_keeper_hits"),
        coalesce(col("n_batch_hits"), lit(0L)).as("n_batch_hits"),
        (coalesce(col("n_keeper_hits"), lit(0L)) + coalesce(col("n_batch_hits"), lit(0L)) === lit(0L))
          .cast("long")
          .as("kept")
      )
  }

  /** The nprobe nearest cells for a query vector — the same
    * [[graft.plans.NearestCells]] expression as assignment, n = nprobe.
    */
  private def probeCells(v: Column, centroids: Array[Array[Double]], nprobe: Int): Column =
    cellsOf(v, centroids, nprobe)

  /** Wrap [[graft.plans.NearestCells]] as a Column. */
  private[graft] def cellsOf(v: Column, centroids: Array[Array[Double]], n: Int): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(graft.plans.NearestCells(bridge.expression(v), centroids, n))
  }

  /** The single nearest coarse cell — the IVF assignment (q36/q197
    * argmax, same deterministic tie rule) exposed for operators that
    * partition work BY cell (q352's within-cell LOF).
    */
  private[graft] def coarseCell(v: Column, centroids: Array[Array[Double]]): Column =
    element_at(cellsOf(v, centroids, 1), 1)

  /** Product-quantization ANN — the fourth rung of the ladder
    * (brute q29 → hyperplane LSH q31 → IVF q36 → PQ): the corpus is
    * compressed to `m` small codes per vector (one per `dim/m`-wide
    * subspace, each quantized by its own `ksub`-cell k-means codebook),
    * and queries score candidates by ASYMMETRIC distance — the exact
    * query subvector dotted against the candidate's per-subspace
    * centroid, summed across subspaces — without ever touching the
    * original corpus floats.
    *
    * Scale shape (the reason PQ exists at 100 TB): the corpus
    * materializes once as (nid, sub, cell) codes — m small ints per
    * vector instead of `dim` floats, a 32–64× footprint cut — and the
    * scoring join is codes ⋈ broadcast(LUT) on the EQUI-key
    * (sub, cell), where the LUT (n_queries × m × ksub rows: every
    * query's dot against every centroid of every subspace) is
    * dimension-sized, never corpus-sized. Map-side partial aggregation
    * collapses the per-subspace contributions to (qid, nid) partials
    * before the shuffle, and the bounded [[TopKAggregator]] keeps only
    * k rows per query thereafter. No cartesian, no theta join, no
    * corpus-side shuffle of raw embeddings (PlanSpec-asserted).
    *
    * Determinism mirrors [[ivfTopK]] exactly, per subspace: codebooks
    * init from the `ksub` lowest-id vectors' slices, fixed Lloyd
    * iterations with 6dp-decimal means, assignment ties break
    * (score desc, cell desc) inside [[graft.plans.NearestCells]], and
    * the ADC sum quantizes each LUT entry to DECIMAL(25,6) so the
    * m-term sum is associative — bit-identical on any partitioning and
    * in the DuckDB oracle (q190), which unrolls the same training.
    */
  /** Deterministic per-subspace PQ codebook training (shared by
    * [[pqTopK]] and [[ivfPqTopK]]): init = the `ksub` lowest-id
    * vectors' slices, `lloydIters` fixed passes; ONE pass over the
    * corpus assigns every subspace per iteration (m structs exploded
    * map-side — plan size O(m), not O(m·ksub)); means quantize to 6dp
    * decimal like [[trainCentroids]]. Codebook width per subspace is
    * min(n, ksub) — the rebuild preserves each subspace's actual
    * length, so a corpus smaller than ksub trains (and searches)
    * rather than indexing past the init array. Expects `base`
    * persisted with `vid`/`e`. Returns (codebooks, dsub).
    */
  private[graft] def trainCodebooks(
      base: DataFrame,
      m: Int,
      ksub: Int,
      lloydIters: Int
  ): (Array[Array[Array[Double]]], Int) = {
    val init = base
      .orderBy("vid")
      .limit(ksub)
      .select("e")
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dim = init(0).length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    def subSlice(sub: Int): Column = slice(col("e"), sub * dsub + 1, dsub)
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(sub => init.map(v => v.slice(sub * dsub, (sub + 1) * dsub)))
    (1 to lloydIters).foreach { _ =>
      val assigned = base
        .select(
          explode(array((0 until m).map { sub =>
            struct(
              lit(sub).as("sub"),
              subSlice(sub).as("se"),
              element_at(cellsOf(subSlice(sub), codebooks(sub), 1), 1).as("cell")
            )
          }: _*)).as("a")
        )
        .select(col("a.sub").as("sub"), col("a.se").as("se"), col("a.cell").as("cell"))
      val means = assigned
        .select(col("sub"), col("cell"), posexplode(col("se")).as(Seq("pos", "x")))
        .groupBy("sub", "cell", "pos")
        .agg(
          (sum(NumOps.roundAway(col("x").cast("double"), 6).cast("decimal(25,6)")).cast("double") / count(lit(1))).as("mm")
        )
        .collect()
      val bySubCell = means.groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("cell")))
      codebooks = codebooks.zipWithIndex.map { case (old, sub) =>
        old.zipWithIndex.map { case (oldCell, j) =>
          bySubCell.get((sub, j)) match {
            case Some(rows) => rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("mm"))
            case None => oldCell // empty cell keeps its centroid
          }
        }
      }
    }
    (codebooks, dsub)
  }

  /** The PQ-compressed corpus: m small (sub, cell) codes per vector. */
  private def pqCodes(base: DataFrame, codebooks: Array[Array[Array[Double]]], dsub: Int): DataFrame = {
    val m = codebooks.length
    def subSlice(sub: Int): Column = slice(col("e"), sub * dsub + 1, dsub)
    base
      .select(
        col("vid").as("nid"),
        explode(array((0 until m).map { sub =>
          struct(lit(sub).as("sub"), element_at(cellsOf(subSlice(sub), codebooks(sub), 1), 1).as("cell"))
        }: _*)).as("c")
      )
      .select(col("nid"), col("c.sub").as("sub"), col("c.cell").as("cell"))
  }

  /** The asymmetric-distance LUT: every query × every (sub, cell)
    * centroid — n_queries·m·ksub rows, dimension-sized, meant to be
    * broadcast by the caller. Each entry quantizes to 6dp decimal so
    * the m-term ADC sum is exact and associative — partition-order
    * invariant, oracle-reproducible.
    */
  private def pqLut(base: DataFrame, codebooks: Array[Array[Array[Double]]], dsub: Int): DataFrame =
    pqLutForQueries(base.filter(col("is_q")).select(col("vid").as("qid"), col("e")), codebooks, dsub)

  /** [[pqLut]] over an explicit (qid, e) query frame — shared by the
    * in-memory path and the stored-index serve path so the ADC terms
    * cannot drift between them.
    */
  private def pqLutForQueries(q: DataFrame, codebooks: Array[Array[Array[Double]]], dsub: Int): DataFrame = {
    val spark = q.sparkSession
    import spark.implicits._
    val m = codebooks.length
    def subSlice(sub: Int): Column = slice(col("e"), sub * dsub + 1, dsub)
    val cents =
      (for { sub <- 0 until m; j <- codebooks(sub).indices } yield (sub, j, codebooks(sub)(j).toSeq))
        .toDF("sub", "cell", "ce")
    q
      .select(
        col("qid"),
        explode(array((0 until m).map { sub =>
          struct(lit(sub).as("sub"), subSlice(sub).as("qse"))
        }: _*)).as("q")
      )
      .select(col("qid"), col("q.sub").as("sub"), col("q.qse").as("qse"))
      .join(broadcast(cents), Seq("sub"))
      .select(
        col("qid"),
        col("sub"),
        col("cell"),
        NumOps.roundAway(VectorOps.dot(col("qse"), col("ce")), 6).cast("decimal(25,6)").as("d")
      )
  }

  // ——— stored-index lifecycle: build → store → probe (q272) ———

  /** Locations of the four persisted IVF-PQ index tables under `root`:
    * the nlist coarse centroids, the m×ksub PQ codebooks, the
    * corpus→cell assignment, and the m codes per corpus vector.
    * Centroids/codebooks are dimension-sized; the assignment and code
    * tables are the corpus-cardinality artifacts whose whole point is
    * to be built ONCE and served many times.
    */
  final case class IvfPqIndexPaths(root: String) {
    def centroids: String = s"$root/centroids"
    def codebooks: String = s"$root/codebooks"
    def corpusCells: String = s"$root/corpus_cells"
    def pqCodes: String = s"$root/pq_codes"
  }

  /** [[buildIvfPqIndex]]'s result: the stored table locations plus the
    * trained quantizers as driver arrays — so an audit can run the
    * in-memory probe against the SAME training and isolate the storage
    * round-trip as the only difference (training is deterministic, but
    * paying it twice per audit would double the build cost for no
    * extra coverage — q193's oracle already pins the trained values).
    */
  final case class IvfPqIndex(
      paths: IvfPqIndexPaths,
      coarse: Array[Array[Double]],
      codebooks: Array[Array[Array[Double]]],
      dsub: Int
  )

  /** BUILD + STORE: train exactly the [[ivfPqTopK]] quantizers
    * (deterministic Lloyd, same cached frame for both trainings), then
    * persist the four index tables through [[RetryingSink]] — the
    * production index lifecycle's write half. Doubles round-trip
    * parquet bit-exactly, so a probe served from these files must
    * reproduce the in-memory path to the last bit ([[servedIvfPqTopK]]
    * is audited against [[ivfPqTopK]] in q272).
    */
  def buildIvfPqIndex(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      nlist: Int,
      m: Int,
      ksub: Int,
      root: String,
      lloydIters: Int = 2
  ): IvfPqIndex = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val base = vecs.select(id.as("vid"), emb.as("e")).persist()
    val coarse = trainCentroids(base, nlist, lloydIters)
    val (codebooks, dsub) = trainCodebooks(base, m, ksub, lloydIters)
    val paths = IvfPqIndexPaths(root)
    val centDf = coarse.zipWithIndex.map { case (v, j) => (j, v.toSeq) }.toSeq.toDF("j", "ce")
    val cbDf =
      (for { sub <- codebooks.indices; j <- codebooks(sub).indices } yield (sub, j, codebooks(sub)(j).toSeq))
        .toDF("sub", "cell", "ce")
    graft.sinks.RetryingSink.overwriteParquet(centDf, paths.centroids)
    graft.sinks.RetryingSink.overwriteParquet(cbDf, paths.codebooks)
    graft.sinks.RetryingSink.overwriteParquet(
      base.select(col("vid").as("nid"), element_at(cellsOf(col("e"), coarse, 1), 1).as("ccell")),
      paths.corpusCells
    )
    graft.sinks.RetryingSink.overwriteParquet(pqCodes(base, codebooks, dsub), paths.pqCodes)
    base.unpersist(blocking = true)
    IvfPqIndex(paths, coarse, codebooks, dsub)
  }

  /** The in-memory IVF-PQ probe for GIVEN quantizers — exactly
    * [[ivfPqTopK]] after training (coarse pruning from `vecs`, ADC
    * over recomputed codes + LUT). The q272 audit runs this against
    * [[servedIvfPqTopK]] on the same [[IvfPqIndex]] so storage is the
    * only variable between the two plans.
    */
  def inMemoryIvfPqTopK(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      isQuery: Column,
      idx: IvfPqIndex,
      nprobe: Int,
      k: Int
  ): DataFrame = {
    val base = vecs.select(id.as("vid"), emb.as("e"), isQuery.as("is_q"))
    val corpusCells = base.select(col("vid").as("nid"), element_at(cellsOf(col("e"), idx.coarse, 1), 1).as("ccell"))
    val probes = base
      .filter(col("is_q"))
      .select(col("vid").as("qid"), explode(cellsOf(col("e"), idx.coarse, nprobe)).as("ccell"))
    val cand = probes
      .join(corpusCells, Seq("ccell"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
    val scored = cand
      .join(pqCodes(base, idx.codebooks, idx.dsub), Seq("nid"))
      .join(broadcast(pqLut(base, idx.codebooks, idx.dsub)), Seq("qid", "sub", "cell"))
      .groupBy("qid", "nid")
      .agg(sum(col("d")).cast("double").as("sim"))
    topKPerQuery(scored, k)
  }

  /** PROBE a stored index: queries are scored against the READ-BACK
    * tables only — the original corpus floats are never touched, which
    * is the serving contract at 100 TB (the index tables are the only
    * thing the query cluster mounts). Centroids and codebooks are the
    * bounded driver collects (nlist·dim and m·ksub·dsub doubles — the
    * [[ivfTopK]] class of dimension-sized pulls); candidates come from
    * the stored assignment, ADC from the stored codes + a broadcast
    * query LUT, top-k through the bounded aggregator.
    */
  def servedIvfPqTopK(
      queries: DataFrame,
      id: Column,
      emb: Column,
      paths: IvfPqIndexPaths,
      nprobe: Int,
      k: Int
  ): DataFrame = {
    val spark = queries.sparkSession
    val cents = spark.read
      .parquet(paths.centroids)
      .orderBy("j")
      .collect()
      .map(_.getAs[scala.collection.Seq[Double]]("ce").toArray)
    val cbRows = spark.read.parquet(paths.codebooks).collect()
    val m = cbRows.iterator.map(_.getAs[Int]("sub")).max + 1
    val codebooks = Array.tabulate(m) { sub =>
      cbRows
        .filter(_.getAs[Int]("sub") == sub)
        .sortBy(_.getAs[Int]("cell"))
        .map(_.getAs[scala.collection.Seq[Double]]("ce").toArray)
    }
    val dsub = codebooks(0)(0).length
    val q = queries.select(id.as("qid"), emb.as("e"))
    val probes = q.select(col("qid"), explode(cellsOf(col("e"), cents, nprobe)).as("ccell"))
    val cand = probes
      .join(spark.read.parquet(paths.corpusCells), Seq("ccell"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
    val scored = cand
      .join(spark.read.parquet(paths.pqCodes), Seq("nid"))
      .join(broadcast(pqLutForQueries(q, codebooks, dsub)), Seq("qid", "sub", "cell"))
      .groupBy("qid", "nid")
      .agg(sum(col("d")).cast("double").as("sim"))
    topKPerQuery(scored, k)
  }

  /** APPEND a new embedding batch to a stored index — the lifecycle
    * verb between build (q272) and erase (q357), and the one a vector
    * store runs DAILY: the batch is encoded with the FROZEN stored
    * quantizers (coarse assignment + PQ codes — append never retrains,
    * the q265 maintenance boundary), and only the two
    * corpus-cardinality tables grow; centroids/codebooks pass through
    * verbatim. The destination starts as a copy of the v1 tables
    * (standing in for the mounted production table — the source index
    * is SHARED by other consumers and must not mutate), then the delta
    * lands via append-mode parquet: new files next to old, nothing
    * rewritten, write cost follows the batch. Because old rows are
    * byte-identical and the quantizers are frozen, every surviving v1
    * (qid, nid) ADC score is bit-identical after the append — the
    * merged serve can only ADD candidates (mirror-image of the q357
    * erasure invariant, spec-asserted pair-by-pair).
    */
  def appendToIndex(
      newVecs: DataFrame,
      id: Column,
      emb: Column,
      idx: IvfPqIndex,
      dest: IvfPqIndexPaths
  ): IvfPqIndexPaths = {
    val spark = newVecs.sparkSession
    val base = newVecs.select(id.as("vid"), emb.as("e"))
    graft.sinks.RetryingSink.overwriteParquet(spark.read.parquet(idx.paths.centroids), dest.centroids)
    graft.sinks.RetryingSink.overwriteParquet(spark.read.parquet(idx.paths.codebooks), dest.codebooks)
    graft.sinks.RetryingSink.overwriteParquet(spark.read.parquet(idx.paths.corpusCells), dest.corpusCells)
    graft.sinks.RetryingSink.overwriteParquet(spark.read.parquet(idx.paths.pqCodes), dest.pqCodes)
    graft.sinks.RetryingSink.appendParquet(
      base.select(col("vid").as("nid"), element_at(cellsOf(col("e"), idx.coarse, 1), 1).as("ccell")),
      dest.corpusCells
    )
    graft.sinks.RetryingSink.appendParquet(pqCodes(base, idx.codebooks, idx.dsub), dest.pqCodes)
    dest
  }

  /** COMPACT a stored index — the verb after [[appendToIndex]]: daily
    * appends grow the two corpus-cardinality tables by delta FILES
    * forever, and the nightly maintenance job folds them back into few
    * large, cell-clustered files. Content is untouched by contract —
    * the rewrite is `read(base ∪ deltas) → repartitionByRange(cluster
    * key) → overwrite` — so a serve from the compacted index is
    * bit-identical to one from the fragmented index (spec-asserted),
    * while the file census shrinks and the layout regains locality
    * (corpus_cells clustered by coarse cell — the key every probe's
    * candidate join hits; pq_codes by (nid, sub) — the ADC join's
    * access path). Quantizers pass through verbatim: compaction, like
    * append and erasure, NEVER retrains. At 100 TB this is
    * delta+base-sized IO once, against unbounded small-file listing
    * cost every query forever — the same economics as q192's parquet
    * compaction, applied to the index artifacts.
    */
  def compactIndex(
      spark: org.apache.spark.sql.SparkSession,
      src: IvfPqIndexPaths,
      dest: IvfPqIndexPaths,
      nFiles: Int = 1
  ): IvfPqIndexPaths = {
    graft.sinks.RetryingSink.overwriteParquet(spark.read.parquet(src.centroids), dest.centroids)
    graft.sinks.RetryingSink.overwriteParquet(spark.read.parquet(src.codebooks), dest.codebooks)
    graft.sinks.RetryingSink.overwriteParquet(
      spark.read.parquet(src.corpusCells).repartitionByRange(nFiles, col("ccell"), col("nid")),
      dest.corpusCells
    )
    graft.sinks.RetryingSink.overwriteParquet(
      spark.read.parquet(src.pqCodes).repartitionByRange(nFiles, col("nid"), col("sub")),
      dest.pqCodes
    )
    dest
  }

  /** Parquet data-file count of one stored-index table — the census a
    * compaction job reports (metadata-cardinality driver work).
    */
  def dataFileCount(path: String): Long =
    graft.sources.GraftFs.listDataFiles(path).size.toLong

  /** IVF nprobe TUNING sweep — the operational alternative when the
    * rollout gate (q398) says a retrain does not pay: before touching
    * the quantizer, sweep the SERVING knob. One training, one scored
    * candidate frame at the widest probe depth (each candidate pair
    * carries the probe RANK at which its cell was reached — a corpus
    * vector lives in exactly one cell, so the pair exists once), and
    * every narrower nprobe is a FILTER on that frame, never a re-scan:
    * the whole curve costs one candidate-generation pass. Per depth:
    * candidates scanned (the serving cost that scales linearly with
    * nprobe), recall@k against the brute truth (the quality bought),
    * and the corpus share actually touched — the three numbers a
    * capacity plan trades.
    */
  def ivfNprobeSweep(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      isQuery: Column,
      nlist: Int,
      nprobes: Seq[Int],
      k: Int,
      lloydIters: Int = 2
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = vecs.sparkSession
    import spark.implicits._
    val base = vecs.select(id.as("vid"), emb.as("e"), isQuery.as("is_q")).persist()
    val centroids = trainCentroids(base, nlist, lloydIters)
    val corpusN = base.count()
    val maxNp = nprobes.max
    val corpus = base.select(
      col("vid").as("nid"),
      col("e").as("ne"),
      VectorOps.normSq(col("e")).as("nn"),
      element_at(cellsOf(col("e"), centroids, 1), 1).as("cell")
    )
    val probes = base
      .filter(col("is_q"))
      .select(
        col("vid").as("qid"),
        col("e").as("qe"),
        VectorOps.normSq(col("e")).as("qn"),
        posexplode(cellsOf(col("e"), centroids, maxNp)).as(Seq("pos", "cell"))
      )
    val scored = probes
      .join(corpus, Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(
        col("qid"),
        col("nid"),
        col("pos"),
        NumOps.roundAway(VectorOps.dot(col("qe"), col("ne")) / sqrt(col("qn") * col("nn")), 6).as("sim")
      )
      .persist()
    scored.count()
    base.unpersist(blocking = true)
    val truth = bruteForceTopK(vecs, id, emb, isQuery, k).select(col("qid"), col("nid")).persist()
    val nTruth = truth.count()
    val nQueries = truth.select("qid").distinct().count()
    val rows = nprobes.sorted.map { np =>
      val cand = scored.filter(col("pos") < np)
      val nCand = cand.count()
      val hits = cand
        .withColumn("rn", row_number().over(Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))))
        .filter(col("rn") <= k)
        .join(truth, Seq("qid", "nid"), "left_semi")
        .count()
      (
        np,
        nQueries,
        nCand,
        nCand * 1000L / nQueries,
        hits,
        hits * 1000L / nTruth,
        nCand * 1000L / (nQueries * (corpusN - 1L))
      )
    }
    scored.unpersist()
    truth.unpersist()
    rows.toDF(
      "nprobe",
      "n_queries",
      "n_candidates",
      "cand_per_query_milli",
      "n_hits",
      "recall_permille",
      "scan_permille"
    )
  }

  def pqTopK(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      isQuery: Column,
      m: Int,
      ksub: Int,
      k: Int,
      lloydIters: Int = 1
  ): DataFrame = {
    // cached for TRAINING only (the Lloyd collects), like ivfTopK;
    // unpersisted before the search plan is built
    val base = vecs.select(id.as("vid"), emb.as("e"), isQuery.as("is_q")).persist()
    val (codebooks, dsub) =
      try trainCodebooks(base, m, ksub, lloydIters)
      finally base.unpersist(blocking = true)

    // ADC scan: codes ⋈ broadcast LUT on (sub, cell), then one keyed
    // aggregation with map-side partials — the whole search is one
    // corpus scan over the compressed codes
    val scored = pqCodes(base, codebooks, dsub)
      .join(broadcast(pqLut(base, codebooks, dsub)), Seq("sub", "cell"))
      .filter(col("qid") =!= col("nid"))
      .groupBy("qid", "nid")
      .agg(sum(col("d")).cast("double").as("sim"))
    topKPerQuery(scored, k)
  }

  /** IVF-PQ — the production composition of the two rungs above and
    * the top of the ANN ladder (q193): the COARSE quantizer ([[ivfTopK]]'s
    * cells) prunes the corpus to each query's `nprobe` nearest cells,
    * and only those candidates are scored, by [[pqTopK]]'s asymmetric
    * distance over the compressed codes. This is the shape FAISS-style
    * systems deploy at billion-vector scale, restated relationally:
    *
    *   - candidate generation is probes ⋈ corpus-cells on the coarse
    *     cell id — an equi-join whose output is corpus/nlist·nprobe
    *     rows per query, never the full corpus;
    *   - scoring is candidates ⋈ codes on nid, then ⋈ broadcast(LUT)
    *     on (qid, sub, cell) — the LUT is still dimension-sized
    *     (n_queries·m·ksub rows), and the original floats are never
    *     touched after encoding (plain PQ codes, not residuals — the
    *     IVF-Flat-PQ hybrid — keeping the arithmetic the oracle
    *     already mirrors for q36 and q190);
    *   - each (qid, nid) candidate arises exactly once (a corpus
    *     vector lives in ONE coarse cell), so no dedup shuffle is
    *     needed before the keyed ADC aggregation.
    *
    * Determinism: both trainings are the proven ones — coarse cells
    * exactly as [[ivfTopK]], per-subspace codebooks exactly as
    * [[pqTopK]] — and the DuckDB oracle (q193) unrolls both in one
    * query.
    */
  def ivfPqTopK(
      vecs: DataFrame,
      id: Column,
      emb: Column,
      isQuery: Column,
      nlist: Int,
      nprobe: Int,
      m: Int,
      ksub: Int,
      k: Int,
      lloydIters: Int = 2
  ): DataFrame = {
    val base = vecs.select(id.as("vid"), emb.as("e"), isQuery.as("is_q")).persist()
    // both trainings against one cached frame: the coarse quantizer is
    // THE ivfTopK/semanticDedupCells one, the codebooks THE pqTopK ones
    val (coarse, codebooks, dsub) =
      try {
        val c = trainCentroids(base, nlist, lloydIters)
        val (cb, d) = trainCodebooks(base, m, ksub, lloydIters)
        (c, cb, d)
      } finally base.unpersist(blocking = true)

    // coarse pruning: one cell per corpus vector, nprobe per query
    val corpusCells = base.select(col("vid").as("nid"), element_at(cellsOf(col("e"), coarse, 1), 1).as("ccell"))
    val probes = base
      .filter(col("is_q"))
      .select(col("vid").as("qid"), explode(cellsOf(col("e"), coarse, nprobe)).as("ccell"))
    val cand = probes
      .join(corpusCells, Seq("ccell"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")

    // ADC over the PRUNED candidate set only (codes + LUT as in pqTopK)
    val scored = cand
      .join(pqCodes(base, codebooks, dsub), Seq("nid"))
      .join(broadcast(pqLut(base, codebooks, dsub)), Seq("qid", "sub", "cell"))
      .groupBy("qid", "nid")
      .agg(sum(col("d")).cast("double").as("sim"))
    topKPerQuery(scored, k)
  }
}
