package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NumOps, TextOps}

/** Near-duplicate detection over document text — the scale path for
  * training-data dedup. Three families:
  *
  *  - exact n-gram Jaccard ([[jaccardPairs]]): the ground truth. One
  *    shuffle on shingle (the self-join), one on the pair. Quadratic
  *    only within identical-shingle buckets, so fine when shingles are
  *    discriminative; the all-pairs blowup is what MinHash avoids.
  *  - MinHash + LSH banding ([[minhashSignatures]], [[lshCandidatePairs]]):
  *    the 100 TB path. Signatures are one groupBy over exploded
  *    shingles; banding shuffles 16-byte band keys, never documents;
  *    candidate generation is a per-bucket self-join. Cost scales with
  *    bucket sizes, not n².
  *  - SimHash ([[simhash32]]): one 32-bit value per doc, single
  *    aggregation, hamming-distance comparable.
  *
  * All hashing is anchored on [[TextOps.hash32]] (MD5-derived), so the
  * DuckDB oracle reproduces every intermediate integer exactly.
  *
  * No operator here caches: the self-joins consume the SAME subtree on
  * both sides, which the planner materializes once (ReuseExchange), and
  * per-doc set sizes ride along via a keyed window instead of separate
  * aggregate branches — so queries leak no cached blocks into the
  * session (NoLeakSpec pins `getPersistentRDDs` empty).
  */
object NearDup {

  val MinhashPrime: Long = 2147483647L // 2^31 - 1

  /** Deterministic (a, b) parameters for the k MinHash functions:
    * h_i(x) = (a_i·x + b_i) mod p. Constants are fixed (not seeded at
    * runtime) so signatures are stable across runs and engines.
    */
  def minhashParams(k: Int): Seq[(Long, Long)] =
    (1 to k).map(i => ((2654435761L * i) % MinhashPrime, (40503L * i * i + 97L) % MinhashPrime))

  /** Distinct (doc, word-n-gram-shingle) pairs — the shared first stage. */
  def shingleTable(docs: DataFrame, id: Column, text: Column, n: Int = 3): DataFrame =
    docs
      .select(id.as("doc_id"), explode(TextOps.wordShingles(TextOps.tokens(text), n)).as("g"))
      .distinct()

  /** Exact Jaccard similarity over word n-gram sets for all pairs with
    * at least one shared shingle; keep pairs ≥ `threshold`.
    */
  def jaccardPairs(docs: DataFrame, id: Column, text: Column, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    // per-doc set size rides along on every shingle row via a keyed
    // window — so the self-join's two sides are the SAME subtree (one
    // materialization via ReuseExchange, no persist to leak) and the
    // two post-join size lookups disappear entirely. At 100 TB the
    // shared subtree is a materialized bucketed shingle table.
    val sh = shingleTable(docs, id, text, n)
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
    val common = sh
      .as("a")
      .join(sh.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      // n_sh is constant per doc; min() just carries it through the agg
      .agg(count(lit(1)).as("common"), min(col("a.n_sh")).as("n1"), min(col("b.n_sh")).as("n2"))
    common
      .select(
        col("d1"),
        col("d2"),
        NumOps.roundAway(col("common").cast("double") / (col("n1") + col("n2") - col("common")), 4).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** [[jaccardPairs]] with stop-shingle filtering: shingles occurring in
    * more than `maxDf` documents are dropped from the universe before
    * the self-join (and, symmetrically, from the set sizes — so the
    * result is exact Jaccard over the *discriminative* shingle sets).
    *
    * This is the scale guard for the frequent-shingle blowup: a shingle
    * shared by f docs contributes f² join rows; capping f bounds the
    * join output at maxDf × |shingles| regardless of corpus skew — the
    * difference between O(Σf²) and O(maxDf·Σf) at 100 TB. (Same idea as
    * CountVectorizer's maxDF / web-dedup's stopword shingles.)
    */
  def jaccardPairsFiltered(docs: DataFrame, id: Column, text: Column, n: Int = 3, threshold: Double = 0.8, maxDf: Int = 15): DataFrame =
    jaccardPairsFilteredFromShingles(shingleTable(docs, id, text, n), threshold, maxDf)

  /** [[jaccardPairsFiltered]] over an already-built `(doc_id, g)`
    * shingle table (the CandidateGraph snapshot) — row-identical, one
    * shingle derivation instead of one per plan reference.
    */
  def jaccardPairsFilteredFromShingles(shingles: DataFrame, threshold: Double, maxDf: Int): DataFrame = {
    val sh = shingles
    // drop via BROADCAST ANTI-join against the STOP set (df > maxDf),
    // not an equi-join against the keep set: stop shingles are the few
    // heavy hitters (≤ Σf/maxDf of them by pigeonhole), so the stop
    // list broadcasts and the full shingle table never shuffles for the
    // filtering step — at 100 TB the keep list is corpus-sized and
    // joining it would cost a second full shuffle
    val stop = sh.groupBy("g").agg(count(lit(1)).as("df")).filter(col("df") > maxDf).select("g")
    // sizes ride along via the keyed window (post-filter, so Jaccard is
    // over the discriminative sets) — same no-persist shape as
    // [[jaccardPairs]]: both join sides are one subtree, reused
    val filtered = sh
      .join(broadcast(stop), Seq("g"), "left_anti")
      .withColumn("n_sh", count(lit(1)).over(Window.partitionBy("doc_id")))
    val common = filtered
      .as("a")
      .join(filtered.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("common"), min(col("a.n_sh")).as("n1"), min(col("b.n_sh")).as("n2"))
    common
      .select(
        col("d1"),
        col("d2"),
        NumOps.roundAway(col("common").cast("double") / (col("n1") + col("n2") - col("common")), 4).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature table: doc_id plus k `sig_i` columns, each the
    * min of h_i over the doc's shingles. One explode + one groupBy.
    */
  def minhashSignatures(docs: DataFrame, id: Column, text: Column, k: Int = 16, n: Int = 3): DataFrame =
    minhashSignaturesFromShingles(shingleTable(docs, id, text, n), k)

  /** [[minhashSignatures]] over an ALREADY-built `(doc_id, g)` shingle
    * table — the entry point when the shingle table is materialized
    * once and shared (CandidateGraph); row-identical to the composed
    * form since the signature depends only on the shingle set.
    */
  def minhashSignaturesFromShingles(shingles: DataFrame, k: Int = 16): DataFrame = {
    val sh = shingles.withColumn("x", TextOps.hash32(col("g")))
    val aggs = minhashParams(k).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("x") + lit(b), lit(MinhashPrime))).as(s"sig_$i")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Exact shingle-Jaccard confirm over a candidate-pair frame at the
    * integer-crossed 0.5 threshold (2·inter ≥ n1+n2−inter ⟺ J ≥ 0.5,
    * no float compare) — the shared verification rung behind the
    * funnel (q196), the incremental probe (q202), the leakage-free
    * split (q207) and the contamination matrix (q208). `left`/`right`
    * name the candidate frame's id columns. Returns the surviving
    * pairs with (inter, n1, n2) attached; candidates-only cost — the
    * shingle joins are keyed on the pair ids, linear in candidates.
    */
  def confirmJaccardHalf(cand: DataFrame, shingles: DataFrame, left: String, right: String): DataFrame = {
    val sizes = shingles.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    cand
      .join(shingles.select(col("doc_id").as(left), col("g")), Seq(left))
      .join(shingles.select(col("doc_id").as(right), col("g")), Seq(right, "g"))
      .groupBy(left, right)
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as(left), col("n_sh").as("n1")), Seq(left))
      .join(sizes.select(col("doc_id").as(right), col("n_sh").as("n2")), Seq(right))
      .filter(col("inter") * 2 >= col("n1") + col("n2") - col("inter"))
  }

  /** Per-ROW minhash signatures from a shingle-ARRAY column — the
    * stateless twin of [[minhashSignaturesFromShingles]] for streaming
    * frames (no aggregation, so no streaming state): sig_i is the
    * array-min of the same (a·hash32(g)+b) mod p over the same
    * distinct shingle set, hence value-identical by construction.
    */
  def rowSignatures(df: DataFrame, shingleArr: Column, k: Int = 16): DataFrame = {
    val sigs = minhashParams(k).zipWithIndex.map { case ((a, b), i) =>
      array_min(transform(shingleArr, g => pmod(lit(a) * TextOps.hash32(g) + lit(b), lit(MinhashPrime))))
        .as(s"sig_$i")
    }
    df.select(col("*") +: sigs: _*)
  }

  /** The (doc_id, band idx, band hash) rows of the LSH index — one row
    * per (doc, band), band hash = MD5 of the ':'-joined signature
    * slice. `carry` forwards extra columns alongside (the streaming
    * probe keeps the shingle array for its scalar confirm). Stateless
    * (select + explode only), so it applies to streaming frames too.
    */
  def bandRows(signatures: DataFrame, bands: Int, rowsPerBand: Int, carry: Seq[String] = Nil): DataFrame = {
    val bandStructs = (0 until bands).map { j =>
      val cols = (0 until rowsPerBand).map(r => col(s"sig_${j * rowsPerBand + r}").cast("string"))
      struct(lit(j).as("bi"), md5(concat_ws(":", cols: _*)).as("bv"))
    }
    signatures
      .select(col("doc_id") +: carry.map(col) :+ explode(array(bandStructs: _*)).as("b"): _*)
      .select(col("doc_id") +: carry.map(col) :+ col("b.bi").as("bi") :+ col("b.bv").as("bv"): _*)
  }

  /** LSH banding over the signature table: `bands` bands of
    * `rowsPerBand` signature values hash (MD5 of ':' join) to a bucket;
    * docs sharing any bucket become a candidate pair. Returns distinct
    * (d1 < d2) pairs — recall is tunable via band shape, and the
    * verification join (exact Jaccard on candidates only) stays linear
    * in candidate count.
    */
  def lshCandidatePairs(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    // one (doc, band) row per band, ONE self-join keyed (band idx, band
    // hash) — not a join per band: both sides are the identical
    // subtree, so the planner materializes its shuffle ONCE
    // (ReuseExchange — plan-asserted in NoLeakSpec) instead of running
    // the signature pipeline per side; no persist, nothing leaks
    val exploded = bandRows(signatures, bands, rowsPerBand)
    exploded
      .as("a")
      .join(exploded.as("b"), Seq("bi", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Incremental LSH probe: candidates between a NEW batch and the
    * EXISTING corpus only — the production shape of continuous dedup,
    * where yesterday's index is a materialized (band idx, band hash)
    * table and today's arrivals probe it. Same banding as
    * [[lshCandidatePairs]], but the join is new × old (never new×new
    * or old×old: intra-batch dup handling is a separate, far smaller
    * concern, and re-pairing the existing corpus against itself would
    * redo the work already paid at indexing time). At 100 TB the old
    * side's explode is the PERSISTED index scan — per-day cost is
    * |batch| signatures plus one keyed join against it.
    */
  def lshProbePairs(sigsNew: DataFrame, sigsOld: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    bandRows(sigsNew, bands, rowsPerBand)
      .withColumnRenamed("doc_id", "new_id")
      .join(bandRows(sigsOld, bands, rowsPerBand).withColumnRenamed("doc_id", "old_id"), Seq("bi", "bv"))
      .select(col("new_id"), col("old_id"))
      .distinct()

  /** SimHash near-duplicate pairs — the candidate rung ABOVE
    * [[simhash32]]: pairs within `maxHamming` bit flips. Pigeonhole
    * bucketing makes it a keyed join: split the 32 bits into
    * `maxHamming + 1` disjoint blocks — a pair with ≤ maxHamming
    * differing bits must agree EXACTLY on at least one block — so
    * candidates come from an equi-join on (block idx, block value) and
    * only candidates pay the exact `bit_count(xor)` rerank. The same
    * shape as the MinHash banding join: shuffles (doc, 1-byte block)
    * keys at 100 TB, never the doc cross product. Both join sides are
    * the identical subtree (ReuseExchange materializes the signature
    * pass once). Recall is EXACT (pigeonhole is a theorem, not a
    * probability), unlike the MinHash/hyperplane rungs.
    */
  def simhashNearDupPairs(docs: DataFrame, id: Column, text: Column, maxHamming: Int = 3): DataFrame = {
    val blocks = maxHamming + 1
    require(32 % blocks == 0, s"32 bits must split evenly into ${blocks} blocks (maxHamming+1)")
    val width = 32 / blocks
    val mask = (1L << width) - 1
    val sigs = simhash32(docs, id, text)
    val blockStructs = (0 until blocks).map { i =>
      struct(lit(i).as("bi"), shiftright(col("simhash"), i * width).bitwiseAND(lit(mask)).as("bv"))
    }
    val exploded = sigs
      .select(col("doc_id"), col("simhash"), explode(array(blockStructs: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.bi").as("bi"), col("b.bv").as("bv"))
    exploded
      .as("a")
      .join(exploded.as("b"), Seq("bi", "bv"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("d1"),
        col("b.doc_id").as("d2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming")
      )
      // filter BEFORE distinct: hamming is determined by (d1, d2), so
      // the result is identical and the dedup shuffle carries only the
      // <= maxHamming survivors, not every bucket collision
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** 32-bit SimHash per document: per bit, +1 for every token whose
    * hash has the bit set, −1 otherwise; the sign becomes the bit.
    * Token multiplicity counts (no distinct) — standard SimHash.
    */
  def simhash32(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val words = docs.select(id.as("doc_id"), explode(TextOps.tokens(text)).as("w"))
    val h = TextOps.hash32(col("w"))
    val bitSums = (0 until 32).map { b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"s_$b")
    }
    words
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(
        col("doc_id"),
        (0 until 32)
          .map(b => when(col(s"s_$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _)
          .as("simhash")
      )
  }

  /** Winnowed fingerprint selection (MOSS): min hash per `w`-wide
    * sliding window over the char `k`-gram hashes, distinct per doc —
    * ~2n/w selected prints with the winnowing GUARANTEE: any substring
    * of length ≥ w + k − 1 shared by two documents contributes at
    * least one identical selected print to both (the hash is a pure
    * function of the gram, so the guarantee survives any hash).
    * Selection is a keyed per-doc window — embarrassingly parallel at
    * any corpus size.
    *
    * Prints are 60-bit BIGINTs (first 15 MD5 hex chars) rather than
    * 32-char MD5 strings: the gram frame is the hot path's largest
    * (≈|text| rows per doc), and every downstream operation — two
    * block-window sorts, the doc-keyed lead, the pair equi-join —
    * compares/shuffles the print, so 8-byte longs beat 32-byte
    * strings on every exchange and sort key. 60 bits keeps the
    * birthday collision odds ~1e-6 at millions of grams AND fits a
    * signed BIGINT on both engines (16 hex chars would overflow the
    * ANSI cast).
    *
    * Why not `xxhash64` (one call vs the md5+substring+conv chain)?
    * The oracle: prints must be recomputable bit-identically in DuckDB,
    * which has no xxHash64 (its `hash()` is a different, version-
    * internal function). MD5 is the only 64-bit-derivable hash both
    * engines share, so the chain stays — ~5 s solo at sf0.1 is the
    * price of certain-recall copy detection with a cross-engine-exact
    * fingerprint (round-5 advice item 6: evaluated, documented, kept).
    */
  def winnowedFingerprints(docs: DataFrame, id: Column, text: Column, k: Int = 8, w: Int = 50): DataFrame = {
    val grams = docs
      .select(id.as("doc_id"), text.as("__t"))
      .select(
        col("doc_id"),
        posexplode(
          expr(
            s"transform(sequence(1, greatest(length(__t) - ${k - 1}, 1)), " +
              s"i -> CAST(conv(substring(md5(substring(__t, i, $k)), 1, 15), 16, 10) AS BIGINT))"
          )
        ).as(Seq("pos", "h"))
      )
    // Sliding-window min WITHOUT the O(n·w) frame recompute a naive
    // `ROWS BETWEEN CURRENT AND w-1 FOLLOWING` frame costs (Spark
    // re-aggregates every frame): the classic two-block decomposition.
    // Bucket positions into w-wide blocks; a w-long window starting at
    // offset o of block b ends in block b+1 (or exactly at b's end when
    // o = 0), so its min = min(suffix-min within b from pos, prefix-min
    // at the frame-end row) — and prefix/suffix mins are RUNNING
    // aggregates (O(1)/row), the frame-end lookup one lead(w−1).
    // lead is null exactly when the full window would overrun the doc,
    // which implements standard winnowing's full-windows-only rule;
    // docs shorter than w grams contribute their single global min.
    // Measured 1.8× faster at sf0.1 than the naive frame (10.9 s →
    // 6.2 s — the residual cost is the per-block sorts, not frame
    // recompute); the oracle keeps the naive frame spelling (it
    // states the SEMANTICS) with the same full-window filter.
    val byBlockAsc = Window.partitionBy("doc_id", "blk").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    val byBlockDesc = Window.partitionBy("doc_id", "blk").orderBy(col("pos").desc).rowsBetween(Window.unboundedPreceding, 0)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val annotated = grams
      .withColumn("blk", expr(s"pos div $w"))
      .withColumn("premin", min(col("h")).over(byBlockAsc))
      .withColumn("sufmin", min(col("h")).over(byBlockDesc))
      .withColumn("endmin", lead(col("premin"), w - 1).over(byDoc))
    val full = annotated
      .filter(col("endmin").isNotNull)
      .select(col("doc_id"), least(col("sufmin"), col("endmin")).as("fp"))
    // short docs via ONE keyed aggregation of the raw grams — no
    // per-row count window on the hot path
    val short = grams
      .groupBy("doc_id")
      .agg(min(col("h")).as("fp"), count(lit(1)).as("cnt"))
      .filter(col("cnt") < w)
      .select("doc_id", "fp")
    full.unionByName(short).distinct()
  }

  /** Copy-detection pairs from shared winnowed fingerprints: df-capped
    * fingerprint equi-join (the stop-shingle guard — a print in f docs
    * costs f² pair rows, so prints in more than `maxDf` docs are
    * dropped via broadcast anti-join), shared-print counts, and
    * containment vs the smaller print set. Certain recall for verbatim
    * overlap ≥ w + k − 1 chars (as long as the shared print survives
    * the df cap); never a doc×doc product.
    */
  def winnowedOverlapPairs(
      docs: DataFrame,
      id: Column,
      text: Column,
      k: Int,
      w: Int,
      maxDf: Int,
      minShared: Int
  ): DataFrame =
    winnowedOverlapPairsFromPrints(winnowedFingerprints(docs, id, text, k, w), maxDf, minShared)

  /** The pair stage over a PRECOMPUTED (doc_id, fp) print frame —
    * callers holding the per-dataset snapshot (CandidateGraph
    * .winnowedPrints) use this so the four references below hit a
    * columnar re-read, not four re-runs of the selection windows.
    */
  def winnowedOverlapPairsFromPrints(fps: DataFrame, maxDf: Int, minShared: Int): DataFrame = {
    val stop = fps.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") > maxDf).select("fp")
    val kept = fps.join(broadcast(stop), Seq("fp"), "left_anti")
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
    kept
      .as("a")
      .join(kept.as("b"), col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("doc_id").as("d1"), col("n_fp").as("n1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("n_fp").as("n2")), Seq("d2"))
      .select(
        col("d1"),
        col("d2"),
        col("n_shared"),
        expr("n_shared * 1000 div least(n1, n2)").as("containment_permille")
      )
  }
}
