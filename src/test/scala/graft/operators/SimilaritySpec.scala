package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorOps

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = graft.sources.Tables.parquet(spark, sfDir, "embeddings")

  test("erased stored index: no cohort id is served, and surviving pair scores are bit-identical to the pre-erasure serve") {
    val idx = AnnIndex.stored(spark, sfDir)
    val v2 = AnnIndex.erasedStored(spark, sfDir)
    val queries = vecs.filter($"vec_id" < 50 && AnnIndex.notErased($"vec_id"))
    val served2 = Similarity
      .servedIvfPqTopK(queries, $"vec_id", $"embedding", v2, nprobe = 4, k = 3)
      .select($"qid", $"nid", $"sim")
    assert(served2.filter(!AnnIndex.notErased($"nid")).count() === 0, "an erased id leaked into the served top-k")
    // erasure only REMOVES candidates: every surviving (qid, nid) pair's
    // ADC score must equal the pre-erasure index's score for that pair
    // bit-for-bit (k large enough to cover the full candidate set)
    val served1 = Similarity
      .servedIvfPqTopK(queries, $"vec_id", $"embedding", idx.paths, nprobe = 4, k = 1 << 20)
      .select($"qid", $"nid", $"sim".as("sim1"))
    val joined = served2.join(served1, Seq("qid", "nid"), "left")
    assert(joined.filter($"sim1".isNull).count() === 0, "a served pair was absent from the pre-erasure candidate set")
    assert(joined.filter($"sim" =!= $"sim1").count() === 0, "a surviving pair's score drifted through the erasure rewrite")
  }

  test("appended stored index (q377): new batch fully indexed, census closes, surviving v1 pair scores bit-identical") {
    val idx = AnnIndex.storedBase(spark, sfDir)
    val v2 = AnnIndex.appendedStored(spark, sfDir)
    val nAll = vecs.count()
    val nNew = vecs.filter(AnnIndex.isNewBatch($"vec_id")).count()
    val cells1 = spark.read.parquet(idx.paths.corpusCells)
    val cells2 = spark.read.parquet(v2.corpusCells)
    // every vector (old ∪ batch) indexed exactly once after the append
    assert(cells2.count() === nAll)
    assert(cells2.select("nid").distinct().count() === nAll)
    // the appended assignment rows are exactly the new batch
    val appended = cells2.join(cells1, Seq("nid"), "left_anti")
    assert(appended.count() === nNew)
    assert(appended.filter(!AnnIndex.isNewBatch($"nid")).count() === 0)
    // PQ codes: m rows per vector, old and new alike
    assert(spark.read.parquet(v2.pqCodes).count() === nAll * 16)
    // per-cell census closes: merged = old + frozen-assigned new
    val census = spark.read
      .parquet(v2.corpusCells)
      .groupBy("ccell")
      .count()
      .withColumnRenamed("count", "n_merged")
      .join(cells1.groupBy("ccell").count().withColumnRenamed("count", "n_old"), Seq("ccell"), "left")
      .join(appended.groupBy("ccell").count().withColumnRenamed("count", "n_new"), Seq("ccell"), "left")
      .select($"n_merged", coalesce($"n_old", lit(0L)).as("o"), coalesce($"n_new", lit(0L)).as("n"))
    assert(census.filter($"n_merged" =!= $"o" + $"n").count() === 0)
    // append only ADDS candidates (mirror of the erasure invariant):
    // every pair the v1 index served keeps its ADC score bit-for-bit
    // in the merged serve (k large enough to disable the top-k cut)
    val queries = vecs.filter($"vec_id" < 50)
    val s1 = Similarity
      .servedIvfPqTopK(queries, $"vec_id", $"embedding", idx.paths, nprobe = 4, k = 1 << 20)
      .select($"qid", $"nid", $"sim".as("sim1"))
    val s2 = Similarity
      .servedIvfPqTopK(queries, $"vec_id", $"embedding", v2, nprobe = 4, k = 1 << 20)
      .select($"qid", $"nid", $"sim")
    val joined = s1.join(s2, Seq("qid", "nid"), "left")
    assert(joined.filter($"sim".isNull).count() === 0, "a v1 pair vanished after the append")
    assert(joined.filter($"sim" =!= $"sim1").count() === 0, "a surviving pair's score drifted through the append")
  }

  test("compacted stored index (q393): content identical, serve bit-identical, file census strictly shrinks") {
    val appended = AnnIndex.appendedStored(spark, sfDir)
    val compacted = AnnIndex.compactedStored(spark, sfDir)
    // compaction is CONTENT-NEUTRAL: both corpus-cardinality tables
    // hold exactly the same row multisets after the rewrite
    def asSet(path: String, cols: String*): Set[Seq[Any]] =
      spark.read.parquet(path).select(cols.map(col): _*).collect().map(_.toSeq).toSet
    assert(asSet(compacted.corpusCells, "nid", "ccell") === asSet(appended.corpusCells, "nid", "ccell"))
    assert(asSet(compacted.pqCodes, "nid", "sub", "cell") === asSet(appended.pqCodes, "nid", "sub", "cell"))
    // the point of the job: base + delta files fold into fewer files
    assert(
      Similarity.dataFileCount(compacted.corpusCells) < Similarity.dataFileCount(appended.corpusCells),
      "compaction did not reduce the corpus_cells file count"
    )
    assert(
      Similarity.dataFileCount(compacted.pqCodes) < Similarity.dataFileCount(appended.pqCodes),
      "compaction did not reduce the pq_codes file count"
    )
    // and the serve is bit-identical across the rewrite, pair by pair
    // (k large enough to disable the top-k cut — FULL candidate sets)
    val queries = vecs.filter($"vec_id" < 50)
    val s1 = Similarity
      .servedIvfPqTopK(queries, $"vec_id", $"embedding", appended, nprobe = 4, k = 1 << 20)
      .select($"qid", $"nid", $"sim".as("sim1"))
    val s2 = Similarity
      .servedIvfPqTopK(queries, $"vec_id", $"embedding", compacted, nprobe = 4, k = 1 << 20)
      .select($"qid", $"nid", $"sim")
    val joined = s2.join(s1, Seq("qid", "nid"), "full")
    assert(joined.filter($"sim".isNull || $"sim1".isNull).count() === 0, "compaction changed the candidate set")
    assert(joined.filter($"sim" =!= $"sim1").count() === 0, "a pair's score drifted through the compaction rewrite")
  }

  test("incremental SemDeDup (q378): join/found/singleton verdicts, and store ∪ kept batch ≡ full frozen-centroid recompute") {
    // old store: two clusters, each one keeper (1, 2) and one dropped
    // duplicate (3, 4); the batch exercises all three arrival shapes
    val old = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.95f, 0.05f, 0f, 0f)),
      (4L, Array(0.05f, 0.95f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Array(0.9f, 0.1f, 0f, 0f)), // joins cluster 1
      (11L, Array(0f, 0f, 1f, 0f)), // founds a new cluster
      (12L, Array(0f, 0f, 0.98f, 0.02f)), // duplicate of the founder
      (13L, Array(0f, 0f, 0f, 1f)) // singleton
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .incrementalSemanticDedup(old, batch, $"vec_id", $"embedding", nlist = 2, threshold = 0.4)
      .collect()
    val byId = out.map(r => r.getAs[Long]("vid") -> r).toMap
    assert(byId(10L).getAs[Long]("n_keeper_hits") >= 1L && byId(10L).getAs[Long]("kept") === 0L)
    assert(byId(11L).getAs[Long]("kept") === 1L)
    assert(
      byId(12L).getAs[Long]("n_keeper_hits") === 0L &&
        byId(12L).getAs[Long]("n_batch_hits") >= 1L &&
        byId(12L).getAs[Long]("kept") === 0L
    )
    assert(
      byId(13L).getAs[Long]("n_keeper_hits") === 0L &&
        byId(13L).getAs[Long]("n_batch_hits") === 0L &&
        byId(13L).getAs[Long]("kept") === 1L
    )
    // equivalence: old keepers ∪ kept batch equals a FULL recompute of
    // the q197 rule over old ∪ batch under the same frozen centroids
    val oldBase = old.select($"vec_id".as("vid"), $"embedding".as("e")).persist()
    val centroids = Similarity.trainCentroids(oldBase, nlist = 2, lloydIters = 2)
    oldBase.unpersist(blocking = true)
    val oldKeepers = Similarity
      .keptUnderRule(Similarity.assignedWithNorm(old, $"vec_id", $"embedding", centroids), 0.4)
      .select("vid")
      .collect()
      .map(_.getLong(0))
      .toSet
    val incKeepers = oldKeepers ++ out.filter(_.getAs[Long]("kept") == 1L).map(_.getAs[Long]("vid"))
    val fullKeepers = Similarity
      .keptUnderRule(
        Similarity.assignedWithNorm(old.unionByName(batch), $"vec_id", $"embedding", centroids),
        0.4
      )
      .select("vid")
      .collect()
      .map(_.getLong(0))
      .toSet
    assert(incKeepers === fullKeepers)
  }

  test("native VecDot is bit-identical to the higher-order formulation") {
    val both = vecs
      .limit(50)
      .crossJoin(vecs.limit(50).select($"vec_id".as("v2"), $"embedding".as("e2")))
      .select(
        VectorOps.dot($"embedding", $"e2").as("native"),
        VectorOps.dotHof($"embedding", $"e2").as("hof")
      )
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("cosine: unit parallel vectors → 1.0; orthogonal → 0.0") {
    val d = Seq(
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f))
    ).toDF("a", "b")
    val got = d.select(VectorOps.cosine($"a", $"b").as("c")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
  }

  test("brute-force top-k: k rows per query, ranks contiguous, sims non-increasing") {
    val topk = Similarity.bruteForceTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 10, k = 5)
    val byQ = topk.collect().groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 10)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to 5))
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN: neighbors returned are real (sim matches exact cosine) and recall > 0") {
    val exact = Similarity
      .bruteForceTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, k = 3)
      .select("qid", "nid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Similarity
      .lshTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, dim = 64, bits = 4, tables = 8, k = 3)
      .select("qid", "nid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(lsh.nonEmpty)
    val overlap = (exact & lsh).size.toDouble / exact.size
    assert(overlap > 0.3, s"LSH recall too low (overlap=$overlap)")
  }

  test("IVF ANN: k ranked real neighbors per query, recall above chance") {
    val exact = Similarity
      .bruteForceTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, k = 3)
      .select("qid", "nid")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val ivf = Similarity
      .ivfTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, nlist = 16, nprobe = 4, k = 3)
    val rows = ivf.collect()
    assert(rows.groupBy(_.getAs[Long]("qid")).size === 20)
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // nprobe/nlist = 1/4 of cells scanned; chance recall would be ~0.25
    assert(recall > 0.3, s"IVF recall too low: $recall")
  }

  test("PQ ANN: k ranked neighbors per query from the compressed codes, recall above chance") {
    // ADC approximates the raw DOT product (max-inner-product search),
    // so ground truth is exact dot top-k — not bruteForceTopK's cosine,
    // which ranks differently when norms vary. Fixture is small: exact
    // truth computed driver-side.
    val all = vecs
      .select($"vec_id", $"embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val exact = (for {
      (qid, qe) <- all.filter(_._1 < 20)
      (nid, _) <- all
        .filter(_._1 != qid)
        .map { case (nid, ne) => (nid, dot(qe, ne)) }
        .sortBy { case (nid, d) => (-d, nid) }
        .take(3)
    } yield (qid, nid)).toSet
    val pq = Similarity
      .pqTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, m = 16, ksub = 16, k = 3, lloydIters = 2)
    val rows = pq.collect()
    assert(rows.groupBy(_.getAs[Long]("qid")).size === 20)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to sorted.length))
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    // 16 subspaces × 16 cells over dim 64 (4-dim sub-quantizers): lossy
    // by design but far above chance (measured ~0.42 on this fixture)
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall > 0.3, s"PQ recall too low: $recall")
  }

  test("IVF-PQ ANN: results are a cell-pruned subset consistent with plain PQ scoring") {
    val pq = Similarity
      .pqTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, m = 16, ksub = 16, k = 3, lloydIters = 2)
      .collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid")) -> r.getAs[Double]("sim"))
      .toMap
    val ivfpq = Similarity
      .ivfPqTopK(vecs, $"vec_id", $"embedding", $"vec_id" < 20, nlist = 16, nprobe = 4, m = 16, ksub = 16, k = 3)
      .collect()
    assert(ivfpq.groupBy(_.getAs[Long]("qid")).size === 20)
    // every IVF-PQ hit the full PQ scan also surfaced must carry the
    // IDENTICAL ADC score (same codes, same LUT — pruning only drops
    // candidates, never changes arithmetic)
    val overlapped = ivfpq.flatMap { r =>
      pq.get((r.getAs[Long]("qid"), r.getAs[Long]("nid"))).map(_ -> r.getAs[Double]("sim"))
    }
    assert(overlapped.nonEmpty)
    overlapped.foreach { case (full, pruned) => assert(full === pruned) }
  }

  test("LSH near-dup pairs: subset of brute-force pairs with identical sims") {
    val brute = Similarity
      .nearDupPairs(vecs, $"vec_id", $"embedding", threshold = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val lsh = Similarity
      .lshNearDupPairs(vecs, $"vec_id", $"embedding", dim = 64, threshold = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(lsh.nonEmpty)
    // every LSH pair is a true pair, with the exact same reranked score
    lsh.foreach { case (k, sim) => assert(brute.get(k).contains(sim), s"$k not a brute pair or sim differs") }
    // candidate recall at this loose threshold should still beat 1/2
    assert(lsh.size.toDouble / brute.size > 0.5, s"recall ${lsh.size}/${brute.size}")
  }

  test("PQ trains and searches a corpus SMALLER than ksub (codebook width = n, no crash)") {
    // regression: the codebook rebuild used to tabulate ksub cells and
    // index past the min(n, ksub)-wide init array on small corpora
    val tiny = spark
      .range(0, 6)
      .selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(pmod(id * 31 + i * 7, 13) AS FLOAT)) AS embedding"
      )
    val out = Similarity
      .pqTopK(tiny, $"vec_id", $"embedding", $"vec_id" < 2, m = 4, ksub = 16, k = 3, lloydIters = 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("qid")).distinct.sorted.toSeq === Seq(0L, 1L))
  }

  test("ivf maintenance (q265): census is total, every cell holds old members, shares bounded") {
    val rows = graft.Queries.ivfIndexMaintenance(spark, sfDir).collect()
    val nVecs = graft.sources.Tables.parquet(spark, sfDir, "embeddings").count()
    assert(rows.map(r => r.getAs[Long]("n_old") + r.getAs[Long]("n_new")).sum === nVecs)
    val newTotal = rows.map(_.getAs[Long]("n_new")).sum
    assert(newTotal === graft.sources.Tables
      .parquet(spark, sfDir, "embeddings")
      .filter(col("vec_id") % 10 === 0)
      .count())
    rows.foreach { r =>
      val pm = r.getAs[Long]("new_share_permille")
      assert(pm >= 0L && pm <= 1000L)
    }
    // the frozen index was trained on the old half, so every occupied
    // cell contains at least one old member (Lloyd means sit on data)
    assert(rows.forall(_.getAs[Long]("n_old") > 0L))
  }

  test("cluster separation (q255): membership is total and ratios respect the argmin bound") {
    val rows = graft.Queries.clusterSeparation(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalMembers = rows.map(_.getAs[Long]("n_members")).sum
    val nVecs = graft.sources.Tables.parquet(spark, sfDir, "embeddings").count()
    assert(totalMembers === nVecs, "every vector lands in exactly one cell")
    rows.foreach { r =>
      val mn = r.getAs[Long]("min_sep_permille")
      val av = r.getAs[Long]("avg_sep_permille")
      // the own centroid is the argmin distance, so the second-best
      // squared-distance ratio can never drop below 1
      assert(mn >= 1000L, s"cell ${r.getAs[Int]("cell")}: min ratio $mn below 1000")
      assert(av >= mn && av <= 100000L)
    }
  }
}
