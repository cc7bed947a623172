package graft

/** DuckDB oracle SQL for every entry in [[Queries]]. Column names, types
  * (as far as both engines allow) and row order match the Spark side —
  * the driver sorts columns by name and hash-compares values, so every
  * computed column is aliased identically in both places (SURVEY §7
  * rounding notes: Spark `bround` ≈ numpy HALF_EVEN; DuckDB `round`
  * validated empirically against it on this data).
  */
object Oracles {

  /** Half-away rounding spelled as IEEE ops — see NumOps.roundAway. */
  private def away(expr: String, scale: Int): String = {
    val p = scale match { case 2 => "100.0"; case 4 => "10000.0"; case 6 => "1000000.0"; case _ => s"1e$scale" }
    s"sign($expr) * (floor(abs($expr) * $p + 0.5) / $p)"
  }

  /** Shared CTE: distinct (doc_id, word-3-gram) shingles. */
  private val ShingleCte =
    """w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w WHERE len(ws) >= 3),
      |sh AS (SELECT DISTINCT doc_id,
      |  ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] || ' ' || ws[CAST(i AS INTEGER) + 2] AS g
      |FROM idx)""".stripMargin

  /** hash32 mirror: int of first 8 MD5 hex chars. */
  private def hx(e: String) = s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  /** Sequential double dot-product of two float lists. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, len($a)), i -> CAST($a[CAST(i AS INTEGER)] AS DOUBLE) * CAST($b[CAST(i AS INTEGER)] AS DOUBLE)))"

  private def cosineSql(a: String, b: String): String =
    s"${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)})"

  private def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(", ")

  /** Sequential double dot of a list column against a LITERAL weight
    * list (hyperplane signs) — mirrors `VecDot(e, typedlit(ws))`.
    */
  private def dotLitSql(e: String, ws: Array[Double], dim: Int): String = {
    val lst = ws.mkString("[", ", ", "]")
    s"list_sum(list_transform(generate_series(1, $dim), i -> CAST($e[CAST(i AS INTEGER)] AS DOUBLE) * ($lst)[CAST(i AS INTEGER)]))"
  }

  /** Exact mirror of [[graft.operators.Similarity.lshTopK]] (q31,
    * dim=64, 8 tables × 4 bits, k=3): the hyperplane sign arrays are
    * baked in as literals (computed by the same driver-side
    * [[graft.operators.Similarity.hyperplaneSigns]] the engine uses),
    * projections accumulate sequentially in double on both engines, so
    * bucket values, candidates, and the reranked top-k agree exactly.
    */
  private val annLshSql: String = {
    val dim = 64; val bits = 4; val tables = 8; val k = 3
    val branches = (0 until tables)
      .map { l =>
        val bv = (0 until bits)
          .map { b =>
            val kk = l * bits + b
            s"(CASE WHEN ${dotLitSql("embedding", graft.operators.Similarity.hyperplaneSigns(dim, kk), dim)} >= 0 THEN CAST(${1L << kk} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
          }
          .mkString("\n    + ")
        s"SELECT vec_id AS vid, (vec_id < 50) AS is_q, $l AS tbl,\n    $bv AS bv FROM embeddings"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH bk AS (
       |$branches
       |),
       |cand AS (SELECT DISTINCT a.vid AS qid, b.vid AS nid
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bv = b.bv AND a.vid <> b.vid
       |  WHERE a.is_q),
       |sc AS (SELECT cand.qid, cand.nid, ${away(cosineSql("q.embedding", "n.embedding"), 6)} AS sim
       |  FROM cand JOIN embeddings q ON q.vec_id = cand.qid JOIN embeddings n ON n.vec_id = cand.nid),
       |rk AS (SELECT qid, nid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM sc)
       |SELECT qid, nid, sim, rnk FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Exact mirror of [[graft.operators.Similarity.bruteForceTopK]]
    * (q29, k=10) — also the ground-truth side of the recall report
    * (q206).
    */
  private val annBruteSql: String = annBruteSqlK(10)

  private def annBruteSqlK(k: Int): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 50),
       |p AS (SELECT q.qid, q.qe, e.vec_id AS nid, e.embedding AS ne FROM q, embeddings e WHERE e.vec_id <> q.qid),
       |s AS (SELECT qid, nid, ${cosineSql("qe", "ne")} AS c FROM p),
       |r AS (SELECT qid, nid, ${away("c", 6)} AS sim FROM s),
       |k AS (SELECT qid, nid, sim,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM r)
       |SELECT qid, nid, sim, rnk FROM k WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin

  /** Exact mirror of [[graft.operators.Similarity.ivfTopK]]
    * (nlist=16, 2 Lloyd iterations unrolled; q36 at nprobe=4, k=3 —
    * the q206 recall report re-instantiates it at k=10). Matching
    * relies on the operator's deterministic arithmetic: init = lowest-id
    * vectors, assignment = argmax(dot − |c|²/2) with (score, idx)
    * lexicographic ties, centroid means = 6dp-quantized decimal sums
    * (associative, so Spark's partitioning can't perturb them), and all
    * dots sequential-double on both engines.
    */
  /** Shared pieces of the deterministic IVF coarse quantizer SQL
    * (q36/q193/q197/q206 and q255's separation report).
    */
  private object IvfSqlBits {
    val dim = 64; val nlist = 16
    def dotD(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    def score(src: String, cent: String) =
      s"${dotD(s"$src.e", s"$cent.ce")} - list_sum(list_transform($cent.ce, x -> x * x)) / 2.0"
    def iter(i: Int, prevC: String): String = iterPx(i, prevC, "")
    /** [[iter]] with every CTE name suffixed by `px` so TWO Lloyd
      * chains (frozen-old vs full-retrain — q393's model drift) can
      * coexist in one statement; px = "" reproduces the original text
      * byte-for-byte.
      */
    def iterPx(i: Int, prevC: String, px: String): String =
      s"""s$px$i AS (SELECT vt$px.vid, vt$px.e, c.j, ${score(s"vt$px", "c")} AS s FROM vt$px, $prevC c),
         |a$px$i AS (SELECT vid, e, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM s$px$i) t WHERE rn = 1),
         |x$px$i AS (SELECT cell, e, CAST(unnest(generate_series(1, $dim)) AS INTEGER) AS pos FROM a$px$i),
         |m$px$i AS (SELECT cell, pos, CAST(sum(CAST(${away("e[pos]", 6)} AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS m FROM x$px$i GROUP BY cell, pos),
         |n$px$i AS (SELECT cell, list(m ORDER BY pos) AS nce FROM m$px$i GROUP BY cell),
         |c$px$i AS (SELECT $prevC.j, COALESCE(n$px$i.nce, $prevC.ce) AS ce FROM $prevC LEFT JOIN n$px$i ON n$px$i.cell = $prevC.j)""".stripMargin
    /** v (double-cast vectors), training subset vt, c0 init, two Lloyd
      * rounds → c2. `trainPred` narrows TRAINING only (q265's frozen
      * old-half index); assignment consumers still see every vector
      * through `v`.
      */
    def lloydCtesFor(trainPred: String): String = lloydCtesPx(trainPred, "")
    /** [[lloydCtesFor]] with suffixed CTE names (v$px .. c${px}2). */
    def lloydCtesPx(trainPred: String, px: String): String =
      s"""v$px AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e, (vec_id < 50) AS is_q FROM embeddings),
         |vt$px AS (SELECT * FROM v$px WHERE $trainPred),
         |c${px}0 AS (SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INTEGER) AS j, e AS ce FROM (SELECT vid, e FROM vt$px ORDER BY vid LIMIT $nlist) t),
         |${iterPx(1, s"c${px}0", px)},
         |${iterPx(2, s"c${px}1", px)}""".stripMargin
    lazy val lloydCtes: String = lloydCtesFor("TRUE")
  }

  private def annIvfSqlFor(nprobe: Int, k: Int): String = {
    import IvfSqlBits.{dotD, score}
    s"""WITH ${IvfSqlBits.lloydCtes},
       |sf AS (SELECT v.vid, v.e, v.is_q, c.j, ${score("v", "c")} AS s FROM v, c2 c),
       |corpus AS (SELECT vid AS nid, e AS ne, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1),
       |probes AS (SELECT vid AS qid, e AS qe, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf WHERE is_q) t WHERE rn <= $nprobe),
       |sc AS (SELECT DISTINCT p.qid, c.nid, ${away(s"${dotD("p.qe", "c.ne")} / sqrt(${dotD("p.qe", "p.qe")} * ${dotD("c.ne", "c.ne")})", 6)} AS sim
       |  FROM probes p JOIN corpus c ON p.cell = c.cell AND p.qid <> c.nid),
       |rk AS (SELECT qid, nid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM sc)
       |SELECT qid, nid, sim, rnk FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  private val annIvfSql: String = annIvfSqlFor(nprobe = 4, k = 3)

  /** Exact mirror of [[graft.operators.Similarity.semanticDedupCells]]
    * (q197): the q36 coarse training unrolled verbatim (same init,
    * ties, 6dp-decimal means), then cosine pairs WITHIN each final
    * cell at 6dp, greedy larger-id drop at threshold 0.4 (the q51
    * fixture threshold), per-cell accounting.
    */
  /** The q36 coarse training unrolled through the final cell
    * assignment: CTE chain ending in `corpus (vid, e, cell)` — shared
    * by the semantic-dedup mirror (q197), the cluster-balanced sample
    * (q205), and — via `trainPred` — the incremental SemDeDup mirror
    * (q378), whose centroids train on the EXISTING corpus only while
    * the final assignment still covers everyone (frozen quantizer).
    */
  private def coarseCellCtesTrain(trainPred: String): String = {
    val dim = 64; val nlist = 16
    def dotD(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    def score(src: String, cent: String) =
      s"${dotD(s"$src.e", s"$cent.ce")} - list_sum(list_transform($cent.ce, x -> x * x)) / 2.0"
    def iter(i: Int, prevC: String): String =
      s"""s$i AS (SELECT v.vid, v.e, c.j, ${score("v", "c")} AS s FROM ctr v, $prevC c),
         |a$i AS (SELECT vid, e, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM s$i) t WHERE rn = 1),
         |x$i AS (SELECT cell, e, CAST(unnest(generate_series(1, $dim)) AS INTEGER) AS pos FROM a$i),
         |m$i AS (SELECT cell, pos, CAST(sum(CAST(${away("e[pos]", 6)} AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS m FROM x$i GROUP BY cell, pos),
         |n$i AS (SELECT cell, list(m ORDER BY pos) AS nce FROM m$i GROUP BY cell),
         |c$i AS (SELECT $prevC.j, COALESCE(n$i.nce, $prevC.ce) AS ce FROM $prevC LEFT JOIN n$i ON n$i.cell = $prevC.j)""".stripMargin
    s"""v AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
       |ctr AS (SELECT * FROM v WHERE $trainPred),
       |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INTEGER) AS j, e AS ce FROM (SELECT vid, e FROM ctr ORDER BY vid LIMIT $nlist) t),
       |${iter(1, "c0")},
       |${iter(2, "c1")},
       |sf AS (SELECT v.vid, v.e, c.j, ${score("v", "c")} AS s FROM v, c2 c),
       |corpus AS (SELECT vid, e, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1)""".stripMargin
  }

  private val coarseCellCtes: String = coarseCellCtesTrain("TRUE")

  private val semanticDedupSql: String = {
    val dim = 64; val tau = "0.4"
    def dotD(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    s"""WITH $coarseCellCtes,
       |p AS (SELECT a.cell, a.vid AS v1, b.vid AS v2,
       |    ${away(s"${dotD("a.e", "b.e")} / sqrt(${dotD("a.e", "a.e")} * ${dotD("b.e", "b.e")})", 6)} AS sim
       |  FROM corpus a JOIN corpus b ON a.cell = b.cell AND a.vid < b.vid),
       |dp AS (SELECT cell, v1, v2 FROM p WHERE sim >= $tau),
       |pc AS (SELECT cell, count(*) AS n_vecs FROM corpus GROUP BY cell),
       |ps AS (SELECT cell, count(*) AS n_dup_pairs FROM dp GROUP BY cell),
       |ds AS (SELECT cell, count(DISTINCT v2) AS n_dropped FROM dp GROUP BY cell)
       |SELECT pc.cell, pc.n_vecs,
       |  COALESCE(ps.n_dup_pairs, CAST(0 AS BIGINT)) AS n_dup_pairs,
       |  COALESCE(ds.n_dropped, CAST(0 AS BIGINT)) AS n_dropped,
       |  pc.n_vecs - COALESCE(ds.n_dropped, CAST(0 AS BIGINT)) AS n_kept
       |FROM pc LEFT JOIN ps ON ps.cell = pc.cell LEFT JOIN ds ON ds.cell = pc.cell
       |ORDER BY pc.cell""".stripMargin
  }

  /** Exact mirror of [[graft.operators.Similarity.pqTopK]] (q190,
    * m=16 subspaces × dsub=4, ksub=16, 2 Lloyd iterations, k=3).
    * Identical arithmetic to the q36 mirror but per subspace: init =
    * the ksub lowest-id vectors' slices, assignment argmax with
    * (s DESC, j DESC) ties, 6dp-decimal centroid means; the ADC score
    * quantizes each per-subspace dot to DECIMAL(25,6) before the
    * m-term sum, so the total is exact on both engines.
    */
  private val annPqSql: String = {
    val dsub = 4; val m = 16; val ksub = 16; val k = 3
    def dotD(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $dsub), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    def score(src: String, cent: String) =
      s"${dotD(s"$src.se", s"$cent.ce")} - list_sum(list_transform($cent.ce, x -> x * x)) / 2.0"
    def iter(i: Int, prev: String): String =
      s"""s$i AS (SELECT t.vid, t.sub, t.se, c.j, ${score("t", "c")} AS s FROM vs t JOIN $prev c ON c.sub = t.sub),
         |a$i AS (SELECT vid, sub, se, j AS cell FROM (SELECT vid, sub, se, j, row_number() OVER (PARTITION BY vid, sub ORDER BY s DESC, j DESC) AS rn FROM s$i) t WHERE rn = 1),
         |x$i AS (SELECT sub, cell, se, CAST(unnest(generate_series(1, $dsub)) AS INTEGER) AS pos FROM a$i),
         |m$i AS (SELECT sub, cell, pos, CAST(sum(CAST(${away("se[pos]", 6)} AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mm FROM x$i GROUP BY sub, cell, pos),
         |n$i AS (SELECT sub, cell, list(mm ORDER BY pos) AS nce FROM m$i GROUP BY sub, cell),
         |c$i AS (SELECT p.sub, p.j, COALESCE(n$i.nce, p.ce) AS ce FROM $prev p LEFT JOIN n$i ON n$i.sub = p.sub AND n$i.cell = p.j)""".stripMargin
    s"""WITH v AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e, (vec_id < 50) AS is_q FROM embeddings),
       |subs AS (SELECT CAST(unnest(generate_series(0, ${m - 1})) AS INTEGER) AS sub),
       |vs AS (SELECT vid, is_q, sub, e[(sub*$dsub+1):(sub*$dsub+$dsub)] AS se FROM v, subs),
       |low AS (SELECT vid FROM v ORDER BY vid LIMIT $ksub),
       |c0 AS (SELECT vs.sub, CAST(row_number() OVER (PARTITION BY vs.sub ORDER BY vs.vid) - 1 AS INTEGER) AS j, vs.se AS ce
       |  FROM vs JOIN low ON vs.vid = low.vid),
       |${iter(1, "c0")},
       |${iter(2, "c1")},
       |sf AS (SELECT t.vid, t.sub, t.se, c.j, ${score("t", "c")} AS s FROM vs t JOIN c2 c ON c.sub = t.sub),
       |code AS (SELECT vid AS nid, sub, j AS cell FROM (SELECT vid, sub, j, row_number() OVER (PARTITION BY vid, sub ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1),
       |lut AS (SELECT t.vid AS qid, t.sub, c.j AS cell, CAST(${away(dotD("t.se", "c.ce"), 6)} AS DECIMAL(25,6)) AS d
       |  FROM vs t JOIN c2 c ON c.sub = t.sub WHERE t.is_q),
       |adc AS (SELECT l.qid, cd.nid, CAST(sum(l.d) AS DOUBLE) AS sim
       |  FROM code cd JOIN lut l ON l.sub = cd.sub AND l.cell = cd.cell
       |  WHERE l.qid <> cd.nid GROUP BY 1, 2),
       |rk AS (SELECT qid, nid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM adc)
       |SELECT qid, nid, sim, rnk FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Exact mirror of [[graft.operators.Similarity.ivfPqTopK]] (q193):
    * the q36 coarse training (nlist=16, 2 Lloyd iterations over the
    * full vectors) and the q190 per-subspace codebook training
    * (m=16 × ksub=16, 2 iterations) unrolled in ONE query; candidates
    * are probes ⋈ corpus cells on the coarse cell (nprobe=4), scored
    * by the same decimal-quantized ADC sum restricted to those
    * candidates.
    */
  private val annIvfPqSql: String = annIvfPqSqlK(3)

  /** The q193 statement with the final cut parameterized — q290 reuses
    * the whole training+probe chain at k_short=10 as its shortlist.
    * `candPred`/`probePred` (extra AND-terms on the candidate corpus /
    * query sides) let q357 mirror the erased-index serve: training is
    * unchanged (erasure does not retrain), only candidates and queries
    * shrink. `trainPred` restricts which vectors TRAIN the quantizers
    * (init picks + Lloyd assignments/means) while assignment, codes
    * and serving still cover the full corpus — q377's delta append
    * mirror: the batch is encoded with quantizers frozen on the OLD
    * corpus, exactly what "append never retrains" means.
    */
  private def annIvfPqSqlK(k: Int, candPred: String = "", probePred: String = "", trainPred: String = "TRUE"): String = {
    val dim = 64; val nlist = 16; val nprobe = 4
    val dsub = 4; val m = 16; val ksub = 16
    def dotFull(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $dim), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    def dotSub(a: String, b: String) =
      s"list_sum(list_transform(generate_series(1, $dsub), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    def scoreC(src: String, cent: String) =
      s"${dotFull(s"$src.e", s"$cent.ce")} - list_sum(list_transform($cent.ce, x -> x * x)) / 2.0"
    def scoreP(src: String, cent: String) =
      s"${dotSub(s"$src.se", s"$cent.ce")} - list_sum(list_transform($cent.ce, x -> x * x)) / 2.0"
    def citer(i: Int, prev: String): String =
      s"""ds$i AS (SELECT t.vid, t.e, c.j, ${scoreC("t", "c")} AS s FROM vtr t, $prev c),
         |da$i AS (SELECT vid, e, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM ds$i) t WHERE rn = 1),
         |dx$i AS (SELECT cell, e, CAST(unnest(generate_series(1, $dim)) AS INTEGER) AS pos FROM da$i),
         |dm$i AS (SELECT cell, pos, CAST(sum(CAST(${away("e[pos]", 6)} AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mm FROM dx$i GROUP BY cell, pos),
         |dn$i AS (SELECT cell, list(mm ORDER BY pos) AS nce FROM dm$i GROUP BY cell),
         |cc$i AS (SELECT p.j, COALESCE(dn$i.nce, p.ce) AS ce FROM $prev p LEFT JOIN dn$i ON dn$i.cell = p.j)""".stripMargin
    def piter(i: Int, prev: String): String =
      s"""ps$i AS (SELECT t.vid, t.sub, t.se, c.j, ${scoreP("t", "c")} AS s FROM vstr t JOIN $prev c ON c.sub = t.sub),
         |pa$i AS (SELECT vid, sub, se, j AS cell FROM (SELECT vid, sub, se, j, row_number() OVER (PARTITION BY vid, sub ORDER BY s DESC, j DESC) AS rn FROM ps$i) t WHERE rn = 1),
         |px$i AS (SELECT sub, cell, se, CAST(unnest(generate_series(1, $dsub)) AS INTEGER) AS pos FROM pa$i),
         |pm$i AS (SELECT sub, cell, pos, CAST(sum(CAST(${away("se[pos]", 6)} AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mm FROM px$i GROUP BY sub, cell, pos),
         |pn$i AS (SELECT sub, cell, list(mm ORDER BY pos) AS nce FROM pm$i GROUP BY sub, cell),
         |pc$i AS (SELECT p.sub, p.j, COALESCE(pn$i.nce, p.ce) AS ce FROM $prev p LEFT JOIN pn$i ON pn$i.sub = p.sub AND pn$i.cell = p.j)""".stripMargin
    s"""WITH v AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e, (vec_id < 50) AS is_q FROM embeddings),
       |vtr AS (SELECT * FROM v WHERE $trainPred),
       |subs AS (SELECT CAST(unnest(generate_series(0, ${m - 1})) AS INTEGER) AS sub),
       |vs AS (SELECT vid, is_q, sub, e[(sub*$dsub+1):(sub*$dsub+$dsub)] AS se FROM v, subs),
       |vstr AS (SELECT vs.* FROM vs JOIN vtr ON vs.vid = vtr.vid),
       |cc0 AS (SELECT CAST(row_number() OVER (ORDER BY vid) - 1 AS INTEGER) AS j, e AS ce FROM (SELECT vid, e FROM vtr ORDER BY vid LIMIT $nlist) t),
       |${citer(1, "cc0")},
       |${citer(2, "cc1")},
       |lowp AS (SELECT vid FROM vtr ORDER BY vid LIMIT $ksub),
       |pc0 AS (SELECT vs.sub, CAST(row_number() OVER (PARTITION BY vs.sub ORDER BY vs.vid) - 1 AS INTEGER) AS j, vs.se AS ce
       |  FROM vs JOIN lowp ON vs.vid = lowp.vid),
       |${piter(1, "pc0")},
       |${piter(2, "pc1")},
       |fin AS (SELECT t.vid, t.is_q, t.e, c.j, ${scoreC("t", "c")} AS s FROM v t, cc2 c),
       |corpcell AS (SELECT vid AS nid, j AS ccell FROM (SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM fin) t WHERE rn = 1),
       |probe AS (SELECT vid AS qid, j AS ccell FROM (SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM fin WHERE is_q$probePred) t WHERE rn <= $nprobe),
       |cand AS (SELECT p.qid, c.nid FROM probe p JOIN corpcell c ON p.ccell = c.ccell AND p.qid <> c.nid$candPred),
       |pfin AS (SELECT t.vid, t.sub, t.se, c.j, ${scoreP("t", "c")} AS s FROM vs t JOIN pc2 c ON c.sub = t.sub),
       |code AS (SELECT vid AS nid, sub, j AS cell FROM (SELECT vid, sub, j, row_number() OVER (PARTITION BY vid, sub ORDER BY s DESC, j DESC) AS rn FROM pfin) t WHERE rn = 1),
       |lut AS (SELECT t.vid AS qid, t.sub, c.j AS cell, CAST(${away(dotSub("t.se", "c.ce"), 6)} AS DECIMAL(25,6)) AS d
       |  FROM vs t JOIN pc2 c ON c.sub = t.sub WHERE t.is_q),
       |adc AS (SELECT ca.qid, ca.nid, CAST(sum(l.d) AS DOUBLE) AS sim
       |  FROM cand ca JOIN code cd ON cd.nid = ca.nid
       |  JOIN lut l ON l.qid = ca.qid AND l.sub = cd.sub AND l.cell = cd.cell
       |  GROUP BY 1, 2),
       |rk AS (SELECT qid, nid, sim, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM adc)
       |SELECT qid, nid, sim, rnk FROM rk WHERE rnk <= $k ORDER BY qid, rnk""".stripMargin
  }

  /** Shared by q45 (direct CSV read) and q49 (the same frame after a
    * parquet snapshot round-trip — byte-identical values by contract).
    */
  private val csvIngestSql: String =
    s"""SELECT event_number, incident_type_desc,
       |  strftime(TRY_CAST(create_time_incident AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS create_ts,
       |  TRY_CAST(priority AS INTEGER) AS priority_int,
       |  TRY_CAST(latitude_x AS DOUBLE) AS latitude,
       |  TRY_CAST(longitude_x AS DOUBLE) AS longitude,
       |  TRY_CAST(district AS INTEGER) AS district
       |FROM read_csv('${graft.sources.Fixtures.CsvPath}', header=true, all_varchar=true)
       |ORDER BY event_number""".stripMargin

  /** Exact mirror of [[graft.operators.Similarity.lshNearDupPairs]]
    * (q51): same baked hyperplane signs as q31's mirror, pairs from any
    * shared (table, bucket), exact cosine rerank at 6dp.
    */
  private val embedNearDupLshSql: String = {
    val dim = 64; val bits = 4; val tables = 8
    val branches = (0 until tables)
      .map { l =>
        val bv = (0 until bits)
          .map { b =>
            val kk = l * bits + b
            s"(CASE WHEN ${dotLitSql("embedding", graft.operators.Similarity.hyperplaneSigns(dim, kk), dim)} >= 0 THEN CAST(${1L << kk} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
          }
          .mkString("\n    + ")
        s"SELECT vec_id AS vid, $l AS tbl,\n    $bv AS bv FROM embeddings"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH bk AS (
       |$branches
       |),
       |cand AS (SELECT DISTINCT a.vid AS d1, b.vid AS d2
       |  FROM bk a JOIN bk b ON a.tbl = b.tbl AND a.bv = b.bv AND a.vid < b.vid),
       |sc AS (SELECT cand.d1, cand.d2, ${away(cosineSql("x.embedding", "y.embedding"), 6)} AS sim
       |  FROM cand JOIN embeddings x ON x.vec_id = cand.d1 JOIN embeddings y ON y.vec_id = cand.d2)
       |SELECT d1, d2, sim FROM sc WHERE sim >= 0.4 ORDER BY d1, d2""".stripMargin
  }

  /** Mirrors PagedFetch.fetchStub arithmetically: one row per day,
    * n_calls from the shared md5-prefix hash, window_start = the
    * month's first day clamped to the range start. Shared by q44 (the
    * flatMap fan-out form) and q64 (the DataSource V2 connector).
    */
  private val pagedFetchSql: String =
    """WITH days AS (SELECT CAST(unnest(generate_series(DATE '2019-01-15', DATE '2019-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
      |SELECT strftime(d, '%Y-%m-%d') AS call_day,
      |  CAST(('0x' || substr(md5(strftime(d, '%Y-%m-%d')), 1, 8)) AS BIGINT) % 97 AS n_calls,
      |  strftime(greatest(CAST(date_trunc('month', d) AS DATE), DATE '2019-01-15'), '%Y-%m-%d') AS window_start
      |FROM days ORDER BY call_day""".stripMargin

  private val langCase: String = {
    val scores = graft.functions.TextOps.LangStopwords.map { case (lang, stop) =>
      lang -> s"len(list_filter(ws, w -> w IN (${inList(stop)})))"
    }
    val whens = scores.init.zipWithIndex.map { case ((lang, s), i) =>
      val later = scores.drop(i + 1).map(_._2)
      s"WHEN ${later.map(o => s"$s >= $o").mkString(" AND ")} THEN '$lang'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  /** CTE chain ending in `cand(d1, d2)` — the exact SQL mirror of
    * [[graft.operators.NearDup.lshCandidatePairs]] (k=16, 4×4 bands).
    * Shared by q27 (which emits the candidates) and q181 (which reranks
    * them by exact containment).
    */
  /** Shingles → minhash signatures → 4×4 banding, through the `band`
    * CTE; the candidate join on top differs per consumer (self-join
    * d1<d2 for the batch dedup family, new×old for the incremental
    * probe q202).
    */
  private val minhashBandCtes: String = {
    val p = graft.operators.NearDup.MinhashPrime
    val params = graft.operators.NearDup.minhashParams(16)
    val sigCols = params.zipWithIndex
      .map { case ((a, b), i) => s"min(($a * x + $b) % $p) AS sig_$i" }
      .mkString(",\n  ")
    val bandCols = (0 until 4)
      .map { j =>
        val parts = (0 until 4).map(r => s"sig_${j * 4 + r}").mkString(" || ':' || ")
        s"md5($parts) AS band_$j"
      }
      .mkString(",\n  ")
    s"""$ShingleCte,
       |hx AS (SELECT doc_id, ${hx("g")} AS x FROM sh),
       |sig AS (SELECT doc_id,
       |  $sigCols
       |FROM hx GROUP BY doc_id),
       |band AS (SELECT doc_id,
       |  $bandCols
       |FROM sig)""".stripMargin
  }

  private val minhashCandCtes: String = {
    val bandJoins = (0 until 4)
      .map(j =>
        s"SELECT a.doc_id AS d1, b.doc_id AS d2 FROM band a JOIN band b ON a.band_$j = b.band_$j AND a.doc_id < b.doc_id"
      )
      .mkString("\nUNION\n")
    s"""$minhashBandCtes,
       |cand AS ($bandJoins)""".stripMargin
  }

  private val minhashSql: String =
    s"""WITH $minhashCandCtes
       |SELECT d1, d2 FROM cand ORDER BY d1, d2""".stripMargin

  private val simhashSql: String = {
    val bitSums = (0 until 32)
      .map(b => s"sum(CASE WHEN (x >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_$b")
      .mkString(",\n  ")
    val assemble = (0 until 32)
      .map(b => s"(CASE WHEN s_$b >= 0 THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString(" + ")
    raw"""WITH wt AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
       |h AS (SELECT doc_id, ${hx("w")} AS x FROM wt),
       |bs AS (SELECT doc_id,
       |  $bitSums
       |FROM h GROUP BY doc_id)
       |SELECT doc_id, $assemble AS simhash FROM bs ORDER BY doc_id""".stripMargin
  }

  /** q198's full statement, shared so q292 can wrap the ranking as a
    * derived table for the recall/precision eval.
    */
  private val bm25Sql: String = {
    val co = away(
      "idf * tf / (tf + CAST(1.2 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl))",
      6
    )
    raw"""WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term FROM documents),
       |dl AS (SELECT doc_id, len(regexp_split_to_array(trim(text), '\s+')) AS dl FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       |  WHERE term IN ('spark', 'join', 'stream') GROUP BY 1, 2),
       |st AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id, tf.tf, dl.dl,
       |    ln(CAST(1.0 AS DOUBLE) + (n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE))) AS idf,
       |    CAST(sum_dl AS DOUBLE) / n_docs AS avgdl
       |  FROM tf JOIN dl USING (doc_id) JOIN dft USING (term), st),
       |co AS (SELECT doc_id, $co AS contrib FROM sc),
       |ag AS (SELECT doc_id, CAST(sum(CAST(contrib AS DECIMAL(25,6))) AS DOUBLE) AS score,
       |    count(*) AS n_terms_hit FROM co GROUP BY 1),
       |rk AS (SELECT doc_id, score, n_terms_hit,
       |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rnk FROM ag)
       |SELECT doc_id, score, n_terms_hit, rnk FROM rk WHERE rnk <= 10 ORDER BY rnk""".stripMargin
  }

  /** q288's full statement, shared so q291 can wrap it as a CTE (the
    * reweighting is pure arithmetic over the valuation frame).
    */
  private val looSourceValueSql: String = {
    def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
    val h = hx("CAST(doc_id AS VARCHAR)")
    raw"""WITH d AS (SELECT doc_id, source, text, $h % 1000 < 100 AS ho FROM documents),
       |trt AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM d WHERE NOT ho),
       |c AS (SELECT w, count(*) AS c FROM trt GROUP BY w),
       |ns AS (SELECT source, w, count(*) AS nsw FROM trt GROUP BY 1, 2),
       |ts AS (SELECT source, count(*) AS t_s FROM trt GROUP BY source),
       |gl AS (SELECT CAST(sum(c) AS BIGINT) AS tt, count(*) AS v FROM c),
       |hot AS (SELECT w, count(*) AS f FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM d WHERE ho) GROUP BY w),
       |hs AS (SELECT hot.w, hot.f, COALESCE(c.c, 0) AS c FROM hot LEFT JOIN c ON c.w = hot.w),
       |bn AS (SELECT CAST(sum(CAST(f AS HUGEINT) * ${mn("c + 1")}) AS HUGEINT) AS base,
       |    CAST(sum(f) AS BIGINT) AS n_ho FROM hs),
       |co AS (SELECT ns.source,
       |    CAST(sum(CAST(f AS HUGEINT) * (${mn("c - nsw + 1")} - ${mn("c + 1")})) AS HUGEINT) AS corr
       |  FROM hs JOIN ns ON ns.w = hs.w GROUP BY 1),
       |r AS (SELECT ts.source, ts.t_s, COALESCE(co.corr, 0) AS corr FROM ts LEFT JOIN co ON co.source = ts.source)
       |SELECT source, t_s,
       |  CAST(base // n_ho - ${mn("tt + v")} AS BIGINT) AS mll_full_micro,
       |  CAST((base + corr) // n_ho - ${mn("tt - t_s + v")} AS BIGINT) AS mll_loo_micro,
       |  CAST(((base + corr) // n_ho - ${mn("tt - t_s + v")})
       |    - (base // n_ho - ${mn("tt + v")}) AS BIGINT) AS delta_micro
       |FROM r, bn, gl ORDER BY source""".stripMargin
  }

  val sql: Map[String, String] = Map(
    "q01_dim_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  sign(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * (floor(abs(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS avg_qty,
        |  sign(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * (floor(abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * 10000.0 + 0.5) / 10000.0) AS avg_price,
        |  sign(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(l_discount)) * (floor(abs(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(l_discount)) * 10000.0 + 0.5) / 10000.0) AS avg_disc,
        |  sign(CAST(sum(CAST(l_tax AS DECIMAL(25,6))) AS DOUBLE) / count(l_tax)) * (floor(abs(CAST(sum(CAST(l_tax AS DECIMAL(25,6))) AS DOUBLE) / count(l_tax)) * 10000.0 + 0.5) / 10000.0) AS avg_tax
        |FROM lineitem
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2, 3, 4""".stripMargin,
    "q02_dedup" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE value IS NOT NULL
        |) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q03_nan_profile" ->
      """SELECT column_name, nan_pct FROM (
        |  SELECT 'o_orderkey' AS column_name, round(100.0 * sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) / count(*), 1) AS nan_pct FROM orders
        |  UNION ALL SELECT 'o_custkey', round(100.0 * sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_orderstatus', round(100.0 * sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_totalprice', round(100.0 * sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_orderdate', round(100.0 * sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', round(100.0 * sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) / count(*), 1) FROM orders
        |) ORDER BY column_name""".stripMargin,
    "q04_value_counts" ->
      """SELECT event_type AS value, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY cnt DESC, value""".stripMargin,
    "q05_nan_pivot" ->
      """SELECT CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  CAST(dayofmonth(l_shipdate) AS INTEGER) AS ship_day,
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1995 THEN l_orderkey END) AS "1995",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1996 THEN l_orderkey END) AS "1996",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1997 THEN l_orderkey END) AS "1997",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1998 THEN l_orderkey END) AS "1998",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 1999 THEN l_orderkey END) AS "1999",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 2000 THEN l_orderkey END) AS "2000",
        |  count(DISTINCT CASE WHEN year(l_shipdate) = 2001 THEN l_orderkey END) AS "2001"
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q06_windowed_ingest" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month_start,
        |  count(*) AS n_orders,
        |  sign(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '2002-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q07_union_chunks" ->
      """SELECT src, count(*) AS n, count(DISTINCT k) AS n_keys,
        |  sign(CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / count(v)) * (floor(abs(CAST(sum(CAST(v AS DECIMAL(25,6))) AS DOUBLE) / count(v)) * 10000.0 + 0.5) / 10000.0) AS avg_v FROM (
        |  SELECT o_orderkey AS k, o_totalprice AS v, 'orders' AS src FROM orders
        |  UNION ALL
        |  SELECT l_orderkey AS k, l_extendedprice AS v, 'lineitem' AS src FROM lineitem
        |) GROUP BY src ORDER BY src""".stripMargin,
    "q08_project_rename" ->
      """SELECT c_custkey AS custkey, c_acctbal AS acctbal, c_mktsegment AS segment
        |FROM customer ORDER BY custkey""".stripMargin,
    "q09_filters" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderdate IS NOT NULL AND o_orderstatus = 'O'
        |  AND o_totalprice >= 200000.0
        |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin,
    "q10_semi_join" ->
      """SELECT user_id, count(*) AS n_events,
        |  sign(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS sum_value
        |FROM events
        |WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 70)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q11_join_inner" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  sign(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(o_totalprice)) * (floor(abs(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(o_totalprice)) * 100.0 + 0.5) / 100.0) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q12_join_left" ->
      """SELECT n_name, count(c_custkey) AS n_customers,
        |  sign(CAST(sum(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(COALESCE(c_acctbal, 0.0) AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS total_bal
        |FROM nation LEFT JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q14_distinct" ->
      "SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
    "q15_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_orderdate_year,
        |  CAST(month(o_orderdate) AS INTEGER) AS o_orderdate_month,
        |  CAST(dayofmonth(o_orderdate) AS INTEGER) AS o_orderdate_day,
        |  CAST(hour(o_orderdate) AS INTEGER) AS o_orderdate_hour
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q16_timedelta" ->
      """SELECT l_orderkey, l_linenumber,
        |  round((epoch(l_shipdate) - epoch(o_orderdate)) / 60.0, 2) AS ship_delay_min
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q17_parse_timestamp" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS parsed
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q18_concat_key" ->
      """SELECT event_id, concat(user_id, ', ', event_id) AS enum_ind
        |FROM events ORDER BY event_id""".stripMargin,
    "q19_cast_coerce" ->
      """SELECT event_id, TRY_CAST(event_type AS INTEGER) AS et_as_int,
        |  TRY_CAST(CAST(event_id AS VARCHAR) AS INTEGER) AS eid_roundtrip
        |FROM events ORDER BY event_id""".stripMargin,
    "q21_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS INTEGER) AS n_bpe_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_actual
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q22_quality_score" -> {
      val stopIn = inList(graft.functions.TextOps.LangStopwords.head._2)
      val stopR = away(s"CAST(len(list_filter(ws, w -> w IN ($stopIn))) AS DOUBLE) / len(ws)", 4)
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS INTEGER) AS n_tokens,
        |  STOPR AS stopword_ratio,
        |  DISTR AS distinct_ratio,
        |  AVGLEN AS avg_token_len,
        |  CAST(CASE WHEN len(ws) BETWEEN 20 AND 200 AND STOPR >= 0.01 THEN 1 ELSE 0 END AS INTEGER) AS quality_flag
        |FROM w ORDER BY doc_id""".stripMargin
        .replace("STOPR", stopR)
        .replace("DISTR", away("CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws)", 4))
        .replace("AVGLEN", away("CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws)", 4))
    },
    "q23_lang_id" ->
      s"""WITH w AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), chr(92) || 's+') AS ws FROM documents),
         |p AS (SELECT doc_id, lang, $langCase AS lang_pred FROM w)
         |SELECT doc_id, lang, lang_pred,
         |  CAST(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END AS INTEGER) AS is_match
         |FROM p ORDER BY doc_id""".stripMargin,
    "q24_fingerprint" ->
      """WITH idx AS (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i FROM documents)
        |SELECT doc_id, min(md5(substr(text, CAST(i AS INTEGER), 8))) AS fp
        |FROM idx GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q25_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q26_ngram_jaccard" -> {
      // canonical dedup rung: stop-shingles (df > 50) dropped before the
      // self-join — the unbounded O(Σf²) form is spec-only ground truth
      val j = away("CAST(common AS DOUBLE) / (x.n_sh + y.n_sh - common)", 4)
      s"""WITH $ShingleCte,
         |keep AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 50),
         |shf AS (SELECT sh.doc_id, sh.g FROM sh JOIN keep USING (g)),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         |  FROM shf a JOIN shf b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |jj AS (SELECT pr.d1, pr.d2, $j AS jaccard
         |  FROM pr JOIN sz x ON pr.d1 = x.doc_id JOIN sz y ON pr.d2 = y.doc_id)
         |SELECT d1, d2, jaccard FROM jj WHERE jaccard >= 0.8 ORDER BY d1, d2""".stripMargin
    },
    "q42_ngram_jaccard_filtered" -> {
      val j = away("CAST(common AS DOUBLE) / (x.n_sh + y.n_sh - common)", 4)
      s"""WITH $ShingleCte,
         |keep AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 15),
         |shf AS (SELECT sh.doc_id, sh.g FROM sh JOIN keep USING (g)),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM shf GROUP BY doc_id),
         |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS common
         |  FROM shf a JOIN shf b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |jj AS (SELECT pr.d1, pr.d2, $j AS jaccard
         |  FROM pr JOIN sz x ON pr.d1 = x.doc_id JOIN sz y ON pr.d2 = y.doc_id)
         |SELECT d1, d2, jaccard FROM jj WHERE jaccard >= 0.8 ORDER BY d1, d2""".stripMargin
    },
    "q27_minhash_lsh" -> minhashSql,
    "q28_simhash" -> simhashSql,
    // pigeonhole-bucketed hamming pairs over the same simhash values
    "q85_simhash_near_dup" ->
      s"""WITH sig AS (SELECT doc_id, simhash FROM ($simhashSql)),
         |blk AS (SELECT doc_id, simhash, bi, (simhash >> (bi * 8)) & 255 AS bv
         |  FROM sig, (SELECT unnest(generate_series(0, 3)) AS bi)),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |  FROM blk a JOIN blk b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id)
         |SELECT d1, d2, hamming FROM cand WHERE hamming <= 3 ORDER BY d1, d2""".stripMargin,
    "q86_interval_join" ->
      """WITH e AS (SELECT event_id, epoch_ns(ts) // 1000 AS us FROM events)
        |SELECT a.event_id, count(*) AS n_within
        |FROM e a JOIN e b ON b.us >= a.us AND b.us < a.us + 1800000000
        |  AND a.event_id <> b.event_id
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin,
    "q87_partitioned_sink" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events, $tot AS sum_value
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY day ORDER BY day""".stripMargin
    },
    "q88_impute" -> {
      val mean = away("CAST(sum(CAST(latitude AS DECIMAL(25,6))) AS DOUBLE) / count(latitude)", 6)
      val filled = away("coalesce(c.latitude, m.mean_lat)", 6)
      s"""WITH calls AS (SELECT event_number, TRY_CAST(district AS INTEGER) AS district,
         |    TRY_CAST(latitude_x AS DOUBLE) AS latitude
         |  FROM read_csv('${graft.sources.Fixtures.CsvPath}', header=true, all_varchar=true)),
         |m AS (SELECT district, $mean AS mean_lat FROM calls WHERE latitude IS NOT NULL GROUP BY district)
         |SELECT c.event_number, c.district, $filled AS latitude_filled,
         |  c.latitude IS NULL AS was_missing
         |FROM calls c LEFT JOIN m ON c.district IS NOT DISTINCT FROM m.district
         |ORDER BY c.event_number""".stripMargin
    },
    "q89_unpivot" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH long AS (
         |  SELECT 'l_quantity' AS measure, CAST(l_quantity AS DOUBLE) AS value FROM lineitem
         |  UNION ALL SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE) FROM lineitem
         |  UNION ALL SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
         |  UNION ALL SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem)
         |SELECT measure, count(value) AS n_values, $tot AS sum_value
         |FROM long GROUP BY measure ORDER BY measure""".stripMargin
    },
    "q31_ann_lsh" -> annLshSql,
    "q36_ann_ivf" -> annIvfSql,
    "q190_ann_pq" -> annPqSql,
    "q193_ann_ivfpq" -> annIvfPqSql,
    "q197_semantic_dedup" -> semanticDedupSql,
    "q38_dim_agg_approx" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(year(l_shipdate) AS INTEGER) AS ship_year,
        |  CAST(month(l_shipdate) AS INTEGER) AS ship_month,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  sign(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * (floor(abs(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS avg_qty,
        |  CAST(1 AS INTEGER) AS hll_ok
        |FROM lineitem
        |GROUP BY 1, 2, 3, 4
        |ORDER BY 1, 2, 3, 4""".stripMargin,
    "q29_ann_brute_force" -> annBruteSql,
    // container sizes mirror MediaCodec: PNG wraps content in +57
    // bytes (sig + IHDR + IDAT + IEND framing), JPEG in +17 (SOI +
    // SOF0 + EOI), GIF in +26 + one length byte per 255-byte sub-block
    // + 12 per extra frame (descriptor + LZW byte + terminator), raw
    // adds nothing. Width/height are the embedded dims(n) values the
    // Spark side must PARSE back out of the headers; GIF n_frames is
    // the embedded 1 + n % 7 the decoder must re-count from image
    // descriptors; PNG/JPEG are genuinely single-frame; raw keeps the
    // documented arithmetic stand-in (same 1 + n % 7 since nb = n)
    "q32_multimodal_decode" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |b AS (SELECT doc_id, n,
        |        CASE CAST(doc_id % 4 AS INTEGER)
        |          WHEN 0 THEN n + 57
        |          WHEN 1 THEN n + 17
        |          WHEN 2 THEN n + 26 + (n + 254) // 255 + 12 * (n % 7)
        |          ELSE n END AS nb
        |      FROM m)
        |SELECT doc_id,
        |  CAST(nb AS INTEGER) AS n_bytes,
        |  CAST(64 + n % 577 AS INTEGER) AS width,
        |  CAST(64 + (n * 31) % 417 AS INTEGER) AS height,
        |  CAST(CASE WHEN doc_id % 4 IN (0, 1) THEN 1 ELSE 1 + n % 7 END AS INTEGER) AS n_frames
        |FROM b ORDER BY doc_id""".stripMargin,
    "q33_stream_agg" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT event_type, count(*) AS n, $tot AS total_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "q35_salted_agg" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT event_type, count(*) AS n, $tot AS sum_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "q34_group_signature" -> {
      val p = graft.operators.NearDup.MinhashPrime
      val sigCols = graft.operators.NearDup
        .minhashParams(8)
        .zipWithIndex
        .map { case ((a, b), i) => s"min(($a * x + $b) % $p) AS sig_$i" }
        .mkString(",\n  ")
      val sigStr = (0 until 8).map(i => s"sig_$i").mkString(" || ':' || ")
      s"""WITH $ShingleCte,
         |hx AS (SELECT sh.doc_id, d.source, ${hx("g")} AS x
         |  FROM sh JOIN documents d ON sh.doc_id = d.doc_id),
         |sig AS (SELECT source,
         |  $sigCols
         |FROM hx GROUP BY source)
         |SELECT source, $sigStr AS sig_str FROM sig ORDER BY source""".stripMargin
    },
    "q39_multimodal_frames" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |b AS (SELECT doc_id, n,
        |        CASE CAST(doc_id % 4 AS INTEGER)
        |          WHEN 0 THEN n + 57
        |          WHEN 1 THEN n + 17
        |          WHEN 2 THEN n + 26 + (n + 254) // 255 + 12 * (n % 7)
        |          ELSE n END AS nb
        |      FROM m),
        |d AS (SELECT doc_id, nb,
        |        CAST(64 + n % 577 AS INTEGER) AS width,
        |        CAST(64 + (n * 31) % 417 AS INTEGER) AS height,
        |        CASE WHEN doc_id % 4 IN (0, 1) THEN 1 ELSE 1 + n % 7 END AS n_frames
        |      FROM b),
        |f AS (SELECT doc_id, nb, width, height, n_frames,
        |        CAST(unnest(generate_series(0, n_frames - 1)) AS INTEGER) AS frame_idx
        |      FROM d)
        |SELECT doc_id, frame_idx,
        |  CAST(frame_idx * (nb // n_frames) AS INTEGER) AS byte_offset,
        |  width, height
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "q40_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, ts, value AS click_value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.value, c.click_id, c.click_value
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q41_stream_windowed" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH b AS (
         |  SELECT date_trunc('day', ts) AS d, event_type, count(*) AS n, $tot AS total_value
         |  FROM events GROUP BY 1, 2),
         |mx AS (SELECT max(ts) AS m FROM events)
         |SELECT strftime(d, '%Y-%m-%d') AS day, event_type, n, total_value
         |FROM b, mx
         |WHERE d + INTERVAL 1 DAY <= m - INTERVAL 1 HOUR
         |ORDER BY day, event_type""".stripMargin
    },
    "q37_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ms(ts) AS tms, value, event_id,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 43200000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM x),
        |s AS (SELECT user_id, grp, min(tms) AS start_ms, max(tms) AS end_ms,
        |        count(*) AS n_events,
        |        CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        |      FROM g GROUP BY user_id, grp),
        |m AS (SELECT user_id, max(grp) AS maxgrp FROM s GROUP BY user_id)
        |SELECT s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value
        |FROM s JOIN m ON s.user_id = m.user_id AND s.grp < m.maxgrp
        |ORDER BY s.user_id, s.start_ms""".stripMargin,
    "q43_windowed_union" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month_start,
        |  count(*) AS n_orders,
        |  sign(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)) * (floor(abs(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)) * 100.0 + 0.5) / 100.0) AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // mirrors PagedFetch.fetchStub arithmetically: one row per day,
    // n_calls from the shared md5-prefix hash, window_start = the
    // month's first day clamped to the 2019-01-15 range start
    "q44_paged_fetch" -> pagedFetchSql,
    // identical fetch surfaced through the DataSource V2 connector
    "q64_paged_source_v2" -> pagedFetchSql,
    // the pushed-down day range [2019-03-10, 2019-05-31]; window_start
    // is unchanged by pushdown (all intersecting windows are whole
    // months here, and the connector derives it from the ORIGINAL
    // option-planned window either way)
    "q77_paged_pushdown" ->
      """WITH days AS (SELECT CAST(unnest(generate_series(DATE '2019-03-10', DATE '2019-05-31', INTERVAL 1 DAY)) AS DATE) AS d)
        |SELECT strftime(d, '%Y-%m-%d') AS call_day,
        |  CAST(('0x' || substr(md5(strftime(d, '%Y-%m-%d')), 1, 8)) AS BIGINT) % 97 AS n_calls,
        |  strftime(greatest(CAST(date_trunc('month', d) AS DATE), DATE '2019-01-15'), '%Y-%m-%d') AS window_start
        |FROM days ORDER BY call_day""".stripMargin,
    "q45_csv_ingest" -> csvIngestSql,
    "q46_json_ingest" -> {
      val cols = graft.sources.Fixtures.Columns.map(c => s"'$c': 'VARCHAR'").mkString("{", ", ", "}")
      s"""SELECT event_number, incident_type_desc,
         |  strftime(TRY_CAST(create_time_incident AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS create_ts,
         |  TRY_CAST(priority AS INTEGER) AS priority_int,
         |  TRY_CAST(latitude_x AS DOUBLE) AS latitude,
         |  TRY_CAST(longitude_x AS DOUBLE) AS longitude,
         |  TRY_CAST(district AS INTEGER) AS district
         |FROM read_json('${graft.sources.Fixtures.JsonPath}', columns=$cols, format='newline_delimited')
         |ORDER BY event_number""".stripMargin
    },
    "q47_salted_join" ->
      """SELECT p_brand, count(*) AS n_items,
        |  sign(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * (floor(abs(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / count(l_extendedprice)) * 100.0 + 0.5) / 100.0) AS avg_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q52_stream_static_join" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT c_mktsegment, count(*) AS n, $tot AS total_value
         |FROM events JOIN customer ON user_id = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
    },
    "q53_rollup" -> {
      val tot = away("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT l_returnflag, l_linestatus, count(*) AS n_items, $tot AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin
    },
    "q54_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    // the q38 assertion pattern: DuckDB emits literal sketch_ok = 1, so
    // rows hash-match iff every Spark-side sketch is inside the bound
    "q55_quantile_profile" -> {
      def q(p: String) = away(s"quantile_cont(n_chars, $p)", 4)
      s"""SELECT lang, count(*) AS n,
         |  ${q("0.5")} AS p50, ${q("0.9")} AS p90, ${q("0.99")} AS p99,
         |  CAST(1 AS INTEGER) AS sketch_ok
         |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q56_lag_gaps" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INTEGER) AS gap_days,
        |  CAST(row_number() OVER w AS INTEGER) AS order_seq
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,
    "q57_split_assign" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bk
        |  FROM documents),
        |s AS (SELECT doc_id,
        |    CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split
        |  FROM b)
        |SELECT split, count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,
    // the merged (latest-wins) state in closed form: the Spark side
    // actually unions and window-ranks; the results must coincide
    "q58_upsert_merge" -> {
      val merged = "CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END"
      val tot = away(s"CAST(sum(CAST(($merged) AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT o_orderstatus, count(*) AS n_orders, $tot AS total_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },
    "q59_multimodal_resize" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |d AS (SELECT doc_id,
        |        CAST(64 + n % 577 AS INTEGER) AS width,
        |        CAST(64 + (n * 31) % 417 AS INTEGER) AS height
        |      FROM m),
        |r AS (SELECT doc_id, width, height, greatest(width, height) AS mx FROM d)
        |SELECT doc_id, width, height,
        |  CAST(CASE WHEN mx <= 256 THEN width ELSE (width * 256) // mx END AS INTEGER) AS new_width,
        |  CAST(CASE WHEN mx <= 256 THEN height ELSE (height * 256) // mx END AS INTEGER) AS new_height
        |FROM r ORDER BY doc_id""".stripMargin,
    // micros floor on both engines: Spark truncates nanos with
    // `ts div 1000`; DuckDB mirrors with epoch_ns // 1000
    "q60_stream_stream_join" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events)
        |SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_pairs
        |FROM e a JOIN e b ON a.user_id = b.user_id AND a.event_id <> b.event_id
        |  AND b.us >= a.us AND b.us <= a.us + 3600000000
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q61_set_ops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |b AS (SELECT 'both' AS set_op, count(*) AS n_customers
        |      FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)),
        |o5 AS (SELECT 'only_1995' AS set_op, count(*) AS n_customers
        |      FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96))
        |SELECT set_op, n_customers FROM b
        |UNION ALL SELECT set_op, n_customers FROM o5
        |ORDER BY set_op""".stripMargin,
    "q62_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER) AS n_tokens,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens, shard,
        |    CAST(coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM d),
        |b AS (SELECT shard, doc_id, n_tokens, cum_before // 2000 AS bin FROM c)
        |SELECT shard, bin, count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens, min(doc_id) AS first_doc
        |FROM b GROUP BY shard, bin ORDER BY shard, bin""".stripMargin,
    "q63_hash_sample" ->
      """SELECT count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 < 100""".stripMargin,
    "q65_json_extract" ->
      """WITH e AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |SELECT event_type, count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q66_cube" -> {
      val tot = away("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
         |  count(*) AS n_items, $tot AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin
    },
    "q67_ntile_quartiles" -> {
      val mn = away("min(c_acctbal)", 2)
      val mx = away("max(c_acctbal)", 2)
      s"""WITH q AS (SELECT c_custkey, c_acctbal,
         |    CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
         |  FROM customer)
         |SELECT quartile, count(*) AS n_customers, $mn AS min_bal, $mx AS max_bal
         |FROM q GROUP BY quartile ORDER BY quartile""".stripMargin
    },
    "q68_fuzzy_pairs" ->
      """WITH t AS (SELECT DISTINCT p_type FROM part)
        |SELECT a.p_type AS t1, b.p_type AS t2,
        |  CAST(levenshtein(a.p_type, b.p_type) AS INTEGER) AS dist
        |FROM t a JOIN t b ON a.p_type < b.p_type
        |WHERE levenshtein(a.p_type, b.p_type) <= 6
        |ORDER BY t1, t2""".stripMargin,
    // identical SQL to q68 on purpose: the bucketed candidate join is
    // provably lossless (dist >= length difference), so its output IS
    // the all-pairs answer
    "q79_fuzzy_pairs_bucketed" ->
      """WITH t AS (SELECT DISTINCT p_type FROM part)
        |SELECT a.p_type AS t1, b.p_type AS t2,
        |  CAST(levenshtein(a.p_type, b.p_type) AS INTEGER) AS dist
        |FROM t a JOIN t b ON a.p_type < b.p_type
        |WHERE levenshtein(a.p_type, b.p_type) <= 6
        |ORDER BY t1, t2""".stripMargin,
    // transitive closure of the SAME minhash-LSH pair graph the engine
    // propagates labels over: min reachable id per node via a recursive
    // CTE — the fixpoint min-label propagation converges to
    "q80_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
         |)
         |SELECT id AS doc_id, min(r) AS cluster,
         |  CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
         |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q81_stratified_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000 AS bk
        |  FROM documents),
        |k AS (SELECT doc_id, lang FROM b
        |  WHERE bk < CASE lang WHEN 'en' THEN 100 WHEN 'de' THEN 500
        |                       WHEN 'es' THEN 300 WHEN 'fr' THEN 300 ELSE 500 END)
        |SELECT lang, count(*) AS n_kept, min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q82_normalize_numbers" ->
      """WITH e AS (SELECT event_type,
        |    CAST(len(regexp_extract_all(props, '[0-9]+')) AS INTEGER) AS n_runs,
        |    md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS norm_h
        |  FROM events)
        |SELECT event_type, CAST(sum(n_runs) AS BIGINT) AS total_num_runs,
        |  count(DISTINCT norm_h) AS n_shapes
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,
    // word-6-gram leakage between the q57 hash-split train and test
    // sets; count(DISTINCT) per contaminated train doc
    "q83_decontaminate" ->
      raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |sp AS (SELECT doc_id, ws,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM w),
        |idx AS (SELECT doc_id, ws, split, unnest(generate_series(1, len(ws) - 5)) AS i FROM sp WHERE len(ws) >= 6),
        |sh AS (SELECT DISTINCT doc_id, split,
        |  ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] || ' ' || ws[CAST(i AS INTEGER) + 2] || ' ' ||
        |  ws[CAST(i AS INTEGER) + 3] || ' ' || ws[CAST(i AS INTEGER) + 4] || ' ' || ws[CAST(i AS INTEGER) + 5] AS g
        |  FROM idx),
        |ts AS (SELECT DISTINCT g FROM sh WHERE split = 'test')
        |SELECT sh.doc_id, count(DISTINCT sh.g) AS n_leaked
        |FROM sh JOIN ts USING (g)
        |WHERE sh.split = 'train'
        |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin,
    "q84_range_join" -> {
      val tot = away("CAST(sum(CAST(b.value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events)
         |SELECT a.user_id, count(*) AS n_followups, $tot AS sum_followup_value
         |FROM e a JOIN e b ON a.user_id = b.user_id
         |  AND b.us > a.us
         |  AND b.us <= a.us + 3600000000
         |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin
    },
    "q69_above_avg" -> {
      def exactAvg = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(o_totalprice)", 2)
      s"""SELECT o_orderpriority, count(*) AS n_above, $exactAvg AS avg_above
         |FROM orders
         |WHERE o_totalprice > (SELECT $exactAvg FROM orders)
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    "q70_vocab" ->
      """WITH tk AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents)
        |SELECT token, count(*) AS n_occurrences
        |FROM tk GROUP BY token
        |ORDER BY n_occurrences DESC, token LIMIT 100""".stripMargin,
    "q71_tfidf" -> {
      val score = away("CAST(tf AS DOUBLE) * n_docs / df", 4)
      s"""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
         |df AS (SELECT token, count(*) AS df FROM (SELECT DISTINCT doc_id, token FROM tk) GROUP BY token),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.token, tf.tf, df.df, $score AS score
         |  FROM tf JOIN df USING (token), n),
         |rk AS (SELECT doc_id, token, tf, df, score,
         |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS INTEGER) AS rnk
         |  FROM sc)
         |SELECT doc_id, rnk, token, tf, df, score FROM rk WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin
    },
    "q72_chunk_docs" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |c AS (SELECT doc_id, ws,
        |    CAST(unnest(generate_series(0, CAST((len(ws) - 1) // 40 AS INTEGER))) AS INTEGER) AS chunk_idx
        |  FROM w)
        |SELECT doc_id, chunk_idx,
        |  array_to_string(list_slice(ws, chunk_idx * 40 + 1, chunk_idx * 40 + 50), ' ') AS chunk_text,
        |  CAST(len(list_slice(ws, chunk_idx * 40 + 1, chunk_idx * 40 + 50)) AS INTEGER) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q73_range_frame" -> {
      val tot = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE)", 2)
      s"""SELECT o_custkey, o_orderkey, $tot AS trailing_30d
         |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
         |        CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d
         |      FROM orders)
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY d RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
         |ORDER BY o_custkey, o_orderkey""".stripMargin
    },
    "q74_zscore" -> {
      // identical formula, identical decimal-exact power sums
      val z = away(
        "(l_quantity - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1))",
        4
      )
      """WITH stats AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_orderkey, l_linenumber, li.l_returnflag, ZEXPR AS z
        |FROM lineitem li JOIN stats USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin.replace("ZEXPR", z)
    },
    "q75_correlation" -> {
      val r = away(
        "(n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))",
        6
      )
      """WITH s AS (SELECT l_returnflag, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n, REXPR AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin.replace("REXPR", r)
    },
    "q76_stream_foreach_batch" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT event_type, count(*) AS n, $tot AS total_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "q48_dict_source" ->
      """SELECT CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS id, v AS o_orderpriority
        |FROM (SELECT DISTINCT o_orderpriority AS v FROM orders WHERE o_orderpriority IS NOT NULL)
        |ORDER BY id""".stripMargin,
    "q49_snapshot_sink" -> csvIngestSql,
    "q50_stream_dedup" ->
      """SELECT DISTINCT md5(text) AS h FROM documents ORDER BY h""".stripMargin,
    // one available-now batch = one micro-batch, so within-watermark
    // dedup emits each key exactly once: the distinct key set
    "q78_stream_dedup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q51_embed_near_dup_lsh" -> embedNearDupLshSql,
    "q20_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
        |FROM orders ORDER BY o_custkey, order_seq""".stripMargin,
    // batch gaps-and-islands, 30-min gap; unlike q37 every session is
    // emitted (no watermark truncation of each user's last session)
    "q90_sessionize_batch" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ms(ts) AS tms, event_id, value,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM x)
        |SELECT user_id, min(tms) AS start_ms, max(tms) AS end_ms, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
        |  CAST(sess + 1 AS INTEGER) AS session_seq
        |FROM g GROUP BY user_id, sess ORDER BY user_id, start_ms""".stripMargin,
    // SCD2 build: islands of constant priority per customer → versioned
    // validity intervals, open-ended on the current version
    "q91_scd2_history" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR o_orderpriority <> prev THEN 1 ELSE 0 END AS chg FROM o),
        |v AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver FROM f),
        |i AS (SELECT o_custkey, ver, max(o_orderpriority) AS o_orderpriority,
        |    strftime(min(o_orderdate), '%Y-%m-%d') AS valid_from, count(*) AS n_orders
        |  FROM v GROUP BY o_custkey, ver),
        |j AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY ver) AS valid_to FROM i)
        |SELECT o_custkey, CAST(ver AS INTEGER) AS version, o_orderpriority, valid_from, valid_to,
        |  n_orders, CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
        |FROM j ORDER BY o_custkey, version""".stripMargin,
    "q96_histogram" -> {
      val mn = away("min(o_totalprice)", 2)
      val mx = away("max(o_totalprice)", 2)
      s"""WITH b AS (SELECT o_totalprice, CAST(floor(o_totalprice / 25000.0) AS INTEGER) AS bin FROM orders)
         |SELECT bin, count(*) AS n_orders, $mn AS min_price, $mx AS max_price, bin * 25000.0 AS bin_lo
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin
    },
    "q97_grouping_sets" -> {
      val tot = away("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS INTEGER) AS gid,
         |  count(*) AS n_items, $tot AS sum_qty
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY gid, l_returnflag NULLS LAST, l_linestatus NULLS LAST""".stripMargin
    },
    // every rule an integer comparison — no float exists to diverge
    "q92_quality_filter" ->
      raw"""WITH d AS (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS ws,
        |    CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS INTEGER) AS sum_len
        |  FROM documents),
        |f AS (SELECT lang, CAST(len(ws) AS INTEGER) AS n_words, sum_len,
        |    CAST(len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS INTEGER) AS n_stop,
        |    CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct
        |  FROM d),
        |p AS (SELECT lang,
        |    CASE WHEN n_words >= 30 AND n_words <= 600 THEN 1 ELSE 0 END AS p_len,
        |    CASE WHEN sum_len >= n_words * 3 AND sum_len <= n_words * 6 THEN 1 ELSE 0 END AS p_wordlen,
        |    CASE WHEN n_stop * 50 >= n_words THEN 1 ELSE 0 END AS p_stop,
        |    CASE WHEN n_distinct * 5 >= n_words THEN 1 ELSE 0 END AS p_div
        |  FROM f)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(p_len) AS BIGINT) AS n_pass_len,
        |  CAST(sum(p_wordlen) AS BIGINT) AS n_pass_wordlen,
        |  CAST(sum(p_stop) AS BIGINT) AS n_pass_stop,
        |  CAST(sum(p_div) AS BIGINT) AS n_pass_diversity,
        |  CAST(sum(p_len * p_wordlen * p_stop * p_div) AS BIGINT) AS n_kept
        |FROM p GROUP BY lang ORDER BY lang""".stripMargin,
    // bigram counts per doc; permyriad = exact integer floor division
    "q93_repetition" ->
      raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |x AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM w WHERE len(ws) >= 2),
        |b AS (SELECT doc_id, CAST(len(ws) AS INTEGER) AS n_words,
        |    CAST(len(list_distinct(ws)) AS INTEGER) AS n_distinct,
        |    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] AS g
        |  FROM x),
        |c AS (SELECT doc_id, g, count(*) AS cnt, max(n_words) AS n_words, max(n_distinct) AS n_distinct
        |  FROM b GROUP BY doc_id, g),
        |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams, max(cnt) AS top_count,
        |    max(n_words) AS n_words, max(n_distinct) AS n_distinct
        |  FROM c GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, top_count,
        |  (10000 * top_count) // n_bigrams AS rep_permyriad,
        |  CAST((10000 * (n_words - n_distinct)) // n_words AS BIGINT) AS dup_word_permyriad
        |FROM a ORDER BY doc_id""".stripMargin,
    // keep-first corpus passage dedup: rank over the passage hash
    "q94_passage_dedup" ->
      raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |c AS (SELECT doc_id, ws,
        |    CAST(unnest(generate_series(0, CAST((len(ws) - 1) // 3 AS INTEGER))) AS INTEGER) AS chunk_idx
        |  FROM w),
        |h AS (SELECT doc_id, chunk_idx,
        |    md5(array_to_string(list_slice(ws, chunk_idx * 3 + 1, chunk_idx * 3 + 3), ' ')) AS h
        |  FROM c),
        |r AS (SELECT doc_id, chunk_idx, row_number() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS rn FROM h)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  (10000 * CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)) // count(*) AS retained_permyriad
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // deterministic per-language cap: global hash rank <= k
    "q95_group_cap" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rn FROM d),
        |k AS (SELECT lang, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM r WHERE rn <= 200 GROUP BY lang),
        |t AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang)
        |SELECT t.lang, n_total, n_kept, id_sum FROM t JOIN k USING (lang) ORDER BY lang""".stripMargin,
    // quantize: same IEEE double chain; ok is the assertion column —
    // literal 1 here, computed in-query on the Spark side
    "q101_embed_quantize" ->
      """WITH s AS (SELECT CAST(min(x) AS DOUBLE) AS lo, CAST(max(x) AS DOUBLE) AS hi
        |    FROM (SELECT unnest(embedding) AS x FROM embeddings)),
        |q AS (SELECT vec_id, embedding, lo, hi, (hi - lo) / 255.0 AS sc FROM embeddings, s)
        |SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n_dims,
        |  CAST(list_sum(list_transform(generate_series(1, len(embedding)), i ->
        |    CAST(least(greatest(floor((CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) - lo) / sc + 0.5), 0.0), 255.0) AS BIGINT) * i)) AS BIGINT) AS qsum,
        |  1 AS ok
        |FROM q ORDER BY vec_id""".stripMargin,
    "q102_vector_centroids" -> {
      val m = away("CAST(sum(CAST(embedding[CAST(i AS INTEGER)] AS DECIMAL(25,12))) AS DOUBLE) / count(*)", 6)
      s"""SELECT label, CAST(i AS INTEGER) AS dim_idx, count(*) AS n_vecs, $m AS mean_val
         |FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings)
         |GROUP BY label, i ORDER BY label, dim_idx""".stripMargin
    },
    // roundtrip answered from the ORC read-back; oracle reads the
    // original parquet — equality proves format fidelity
    "q99_orc_roundtrip" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT event_type, count(*) AS n_events, $tot AS sum_value,
         |  min(epoch_ns(ts) // 1000) AS min_us, max(epoch_ns(ts) // 1000) AS max_us
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    // both engines read the same fixture files byte-for-byte
    "q100_binary_source" ->
      """SELECT regexp_replace(filename, '.*/', '') AS file_name,
        |  CAST(len(content) AS BIGINT) AS length, md5(content) AS content_md5
        |FROM read_text('/tmp/graft_fixtures/calls.*')
        |ORDER BY file_name""".stripMargin,
    // the dynamic pivot's discovered keys, spelled statically (the
    // oracle would fail on row/schema if discovery drifted)
    "q115_dynamic_pivot" -> {
      val yearCols = (1995 to 2001)
        .map(y => s"CAST(sum(CASE WHEN year(l_shipdate) = $y THEN 1 ELSE 0 END) AS BIGINT) AS y$y")
        .mkString(",\n  ")
      s"""SELECT l_returnflag,
         |  $yearCols
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    // exact median: middle element(s) by keyed rank — no engine median()
    "q116_group_median" -> {
      val med = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(o_totalprice)", 2)
      s"""WITH r AS (SELECT o_orderpriority, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) AS rn,
         |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
         |  FROM orders)
         |SELECT o_orderpriority, max(cnt) AS n_orders, $med AS median_price
         |FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    "q117_simpson_diversity" ->
      raw"""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |pd AS (SELECT doc_id, token, count(*) AS cnt FROM tk GROUP BY doc_id, token)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  (10000 * CAST(sum(cnt * cnt) AS BIGINT)) // (CAST(sum(cnt) AS BIGINT) * CAST(sum(cnt) AS BIGINT)) AS simpson_permyriad
        |FROM pd GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q80's fixpoint clusters + longest-member canonicalization
    "q118_dedup_keep_best" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
         |),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
         |j AS (SELECT cl.doc_id, cl.cluster, d.n_chars FROM cl JOIN documents d ON d.doc_id = cl.doc_id),
         |k AS (SELECT *, row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn FROM j)
         |SELECT doc_id, cluster, n_chars, CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_kept
         |FROM k ORDER BY doc_id""".stripMargin,
    "q113_resample_gapfill" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS hour FROM events),
        |c AS (SELECT user_id, hour, count(*) AS n_events FROM e GROUP BY user_id, hour),
        |sp AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM e GROUP BY user_id),
        |spine AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM sp)
        |SELECT spine.user_id, epoch_ms(spine.hour) AS hour_ms,
        |  COALESCE(c.n_events, 0) AS n_events
        |FROM spine LEFT JOIN c ON spine.user_id = c.user_id AND spine.hour = c.hour
        |ORDER BY spine.user_id, hour_ms""".stripMargin,
    "q114_user_growth" ->
      """WITH f AS (SELECT user_id, strftime(min(date_trunc('day', ts)), '%Y-%m-%d') AS day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT day, count(*) AS n_new_users FROM f GROUP BY day)
        |SELECT day, n_new_users,
        |  CAST(sum(n_new_users) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,
    "q109_fact_join" -> {
      val rev = away("CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
         |  count(*) AS n_items, $rev AS revenue
         |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |GROUP BY order_year ORDER BY order_year""".stripMargin
    },
    // mode with a pinned tie-break (count desc, type asc)
    "q110_group_mode" ->
      """WITH c AS (SELECT user_id, event_type, count(*) AS n_occurrences FROM events GROUP BY user_id, event_type),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_occurrences DESC, event_type) AS rn FROM c)
        |SELECT user_id, event_type AS mode_event_type, n_occurrences
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q111_collect_types" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // native forward ASOF: earliest purchase at-or-after each click
    "q112_asof_forward" ->
      """WITH c AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events WHERE event_type = 'purchase')
        |SELECT c.user_id, c.event_id, p.us AS purchase_us, (p.us - c.us) // 1000000 AS gap_s
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.us <= p.us
        |ORDER BY c.user_id, c.event_id""".stripMargin,
    // estimate (signature agreement) next to exact Jaccard for the
    // same LSH candidates — the ladder's rungs, quantified side by side
    "q105_minhash_estimate" -> {
      val p = graft.operators.NearDup.MinhashPrime
      val params = graft.operators.NearDup.minhashParams(16)
      val sigCols = params.zipWithIndex
        .map { case ((a, b), i) => s"min(($a * x + $b) % $p) AS sig_$i" }
        .mkString(",\n  ")
      val bandCols = (0 until 4)
        .map { j =>
          val parts = (0 until 4).map(r => s"sig_${j * 4 + r}").mkString(" || ':' || ")
          s"md5($parts) AS band_$j"
        }
        .mkString(",\n  ")
      val bandJoins = (0 until 4)
        .map(j =>
          s"SELECT a.doc_id AS d1, b.doc_id AS d2 FROM band a JOIN band b ON a.band_$j = b.band_$j AND a.doc_id < b.doc_id"
        )
        .mkString("\nUNION\n")
      val matches = (0 until 16).map(i => s"(CASE WHEN a.sig_$i = b.sig_$i THEN 1 ELSE 0 END)").mkString(" + ")
      val jac = away("CAST(common AS DOUBLE) / (s1.n_sh + s2.n_sh - common)", 4)
      s"""WITH $ShingleCte,
         |hx AS (SELECT doc_id, ${hx("g")} AS x FROM sh),
         |sig AS (SELECT doc_id,
         |  $sigCols
         |FROM hx GROUP BY doc_id),
         |band AS (SELECT doc_id,
         |  $bandCols
         |FROM sig),
         |cand AS ($bandJoins),
         |est AS (SELECT cand.d1, cand.d2, CAST($matches AS INTEGER) AS sig_matches
         |  FROM cand JOIN sig a ON a.doc_id = cand.d1 JOIN sig b ON b.doc_id = cand.d2),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |cm AS (SELECT est.d1, est.d2, count(*) AS common
         |  FROM est JOIN sh sa ON sa.doc_id = est.d1 JOIN sh sb ON sb.doc_id = est.d2 AND sa.g = sb.g
         |  GROUP BY est.d1, est.d2)
         |SELECT est.d1, est.d2, sig_matches,
         |  CAST(10000 * sig_matches AS BIGINT) // 16 AS est_permyriad,
         |  $jac AS jaccard_exact
         |FROM est JOIN cm ON cm.d1 = est.d1 AND cm.d2 = est.d2
         |  JOIN sz s1 ON s1.doc_id = est.d1 JOIN sz s2 ON s2.doc_id = est.d2
         |ORDER BY est.d1, est.d2""".stripMargin
    },
    "q106_bpe_pairs" ->
      raw"""WITH tk AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS cnt FROM tk GROUP BY w),
        |ix AS (SELECT w, cnt, unnest(generate_series(1, len(w) - 1)) AS i FROM wc WHERE len(w) >= 2),
        |p AS (SELECT substr(w, CAST(i AS INTEGER), 2) AS pair, cnt FROM ix)
        |SELECT pair, CAST(sum(cnt) AS BIGINT) AS n_occurrences
        |FROM p GROUP BY pair
        |ORDER BY n_occurrences DESC, pair LIMIT 50""".stripMargin,
    "q107_hot_keys" ->
      """WITH c AS (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey),
        |t AS (SELECT count(*) AS total FROM orders)
        |SELECT o_custkey, n_orders, (10000 * n_orders) // total AS share_permyriad
        |FROM c, t
        |ORDER BY n_orders DESC, o_custkey LIMIT 20""".stripMargin,
    "q108_vocab_prune" ->
      raw"""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |pd AS (SELECT doc_id, token, count(*) AS cnt FROM tk GROUP BY doc_id, token),
        |wdf AS (SELECT *, count(*) OVER (PARTITION BY token) AS df FROM pd),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN df * 100 <= n_docs * 77 THEN cnt ELSE 0 END) AS BIGINT) AS n_kept,
        |  (10000 * CAST(sum(CASE WHEN df * 100 <= n_docs * 77 THEN cnt ELSE 0 END) AS BIGINT)) // CAST(sum(cnt) AS BIGINT) AS kept_permyriad
        |FROM wdf, n GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // gaps-and-islands in MICROSECONDS (the operator's merge unit); a
    // session is emitted once the 1-hour watermark passes its end
    "q104_session_window_stream" -> {
      val tot = away("CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH x AS (
         |  SELECT user_id, epoch_ns(ts) // 1000 AS tus, event_id, value,
         |    CASE WHEN epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000)
         |             OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id) >= 1800000000
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events),
         |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tus, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess FROM x),
         |s AS (SELECT user_id, min(tus) // 1000 AS start_ms,
         |        (max(tus) + 1800000000) // 1000 AS end_ms,
         |        count(*) AS n_events, $tot AS sum_value
         |      FROM g GROUP BY user_id, sess),
         |m AS (SELECT max(epoch_ns(ts) // 1000) // 1000 - 3600000 AS wm_ms FROM events)
         |SELECT user_id, start_ms, end_ms, n_events, sum_value
         |FROM s, m WHERE end_ms <= wm_ms
         |ORDER BY user_id, start_ms""".stripMargin
    },
    // the Bloom prefilter is invisible to results: oracle = plain join
    "q103_bloom_join" -> {
      val tot = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT o_orderpriority, count(*) AS n_orders, $tot AS total_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    "q98_percent_rank" -> {
      val pr = away("percent_rank() OVER w", 6)
      val cd = away("cume_dist() OVER w", 6)
      s"""SELECT o_orderkey, o_orderpriority, $pr AS pct_rank, $cd AS cume
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
         |ORDER BY o_orderpriority, o_orderkey""".stripMargin
    },
    // same composed contact string, same RE2-and-Java-compatible regexes
    "q119_pii_scrub" -> {
      val contact =
        "c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com> tel 555-' || lpad(CAST((c_custkey * 7) % 10000 AS VARCHAR), 4, '0')"
      val emailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val phoneRe = """\b555-[0-9]{4}\b"""
      s"""WITH c AS (SELECT c_custkey, $contact AS contact FROM customer)
         |SELECT c_custkey,
         |  regexp_replace(regexp_replace(contact, '$emailRe', '<EMAIL>', 'g'), '$phoneRe', '<PHONE>', 'g') AS scrubbed,
         |  CAST(len(regexp_extract_all(contact, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(contact, '$phoneRe')) AS BIGINT) AS n_phones
         |FROM c ORDER BY c_custkey""".stripMargin
    },
    "q120_snapshot_diff" ->
      """WITH old AS (SELECT user_id, count(*) AS old_n, count(DISTINCT event_type) AS old_types
        |  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id),
        |neu AS (SELECT user_id, count(*) AS new_n, count(DISTINCT event_type) AS new_types
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' GROUP BY user_id)
        |SELECT COALESCE(old.user_id, neu.user_id) AS user_id,
        |  COALESCE(old_n, 0) AS old_n, COALESCE(new_n, 0) AS new_n,
        |  CASE WHEN old_n IS NULL THEN 'added'
        |       WHEN new_n IS NULL THEN 'removed'
        |       WHEN old_n = new_n AND old_types = new_types THEN 'same'
        |       ELSE 'changed' END AS change_type
        |FROM old FULL OUTER JOIN neu ON old.user_id = neu.user_id
        |ORDER BY user_id""".stripMargin,
    // rank on each engine's own exact decimal sum; round only the output
    "q121_topk_per_group" -> {
      val rev = away("CAST(rev_exact AS DOUBLE)", 2)
      s"""WITH r AS (SELECT p_brand, p_type,
         |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS rev_exact,
         |    count(*) AS n_items
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  GROUP BY p_brand, p_type),
         |k AS (SELECT *, row_number() OVER (PARTITION BY p_brand ORDER BY rev_exact DESC, p_type) AS rk FROM r)
         |SELECT p_brand, p_type, CAST(rk AS BIGINT) AS rk, n_items, $rev AS revenue
         |FROM k WHERE rk <= 3 ORDER BY p_brand, rk""".stripMargin
    },
    "q122_window_bounds" ->
      """WITH w AS (SELECT user_id, event_id, ts, event_type,
        |    first_value(event_type) OVER f AS first_type,
        |    last_value(event_type) OVER f AS last_type,
        |    nth_value(event_type, 2) OVER f AS second_type,
        |    count(*) OVER f AS n_events,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |  WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |SELECT user_id, first_type, last_type, second_type, n_events
        |FROM w WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // value-histogram medians: identical rank arithmetic, exact on both
    "q123_mad_outliers" -> {
      val medp = away("max(median)", 2)
      val madp = away("max(mad)", 4)
      s"""WITH h AS (SELECT o_orderpriority AS g, o_totalprice AS v, count(*) AS cnt FROM orders GROUP BY 1, 2),
         |hc AS (SELECT *, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum, sum(cnt) OVER (PARTITION BY g) AS tot FROM h),
         |m AS (SELECT g, (min(CASE WHEN cum >= (tot + 1) // 2 THEN v END)
         |               + min(CASE WHEN cum >= (tot + 2) // 2 THEN v END)) / 2.0 AS median FROM hc GROUP BY g),
         |d AS (SELECT h.g, abs(h.v - m.median) AS v, h.cnt, m.median FROM h JOIN m ON h.g = m.g),
         |dh AS (SELECT g, v, sum(cnt) AS cnt FROM d GROUP BY 1, 2),
         |dhc AS (SELECT *, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum, sum(cnt) OVER (PARTITION BY g) AS tot FROM dh),
         |mad AS (SELECT g, (min(CASE WHEN cum >= (tot + 1) // 2 THEN v END)
         |                 + min(CASE WHEN cum >= (tot + 2) // 2 THEN v END)) / 2.0 AS mad FROM dhc GROUP BY g)
         |SELECT d.g AS o_orderpriority, CAST(sum(d.cnt) AS BIGINT) AS n_orders,
         |  $medp AS median_price, $madp AS mad,
         |  CAST(sum(CASE WHEN d.v > 3.0 * mad.mad THEN d.cnt ELSE 0 END) AS BIGINT) AS n_outliers
         |FROM d JOIN mad ON d.g = mad.g
         |GROUP BY d.g ORDER BY o_orderpriority""".stripMargin
    },
    "q124_winsorize" -> {
      val wm = away("CAST(sum(CAST(clamped * cnt AS DECIMAL(25,6))) AS DOUBLE) / sum(cnt)", 4)
      s"""WITH h AS (SELECT l_returnflag AS g, l_extendedprice AS v, count(*) AS cnt FROM lineitem GROUP BY 1, 2),
         |hc AS (SELECT *, sum(cnt) OVER (PARTITION BY g ORDER BY v) AS cum, sum(cnt) OVER (PARTITION BY g) AS tot FROM h),
         |b AS (SELECT g, min(CASE WHEN cum >= (tot * 50 + 999) // 1000 THEN v END) AS lo,
         |             min(CASE WHEN cum >= (tot * 950 + 999) // 1000 THEN v END) AS hi FROM hc GROUP BY g),
         |c AS (SELECT h.g, least(greatest(h.v, b.lo), b.hi) AS clamped, h.cnt, b.lo, b.hi
         |      FROM h JOIN b ON h.g = b.g)
         |SELECT g AS l_returnflag, CAST(sum(cnt) AS BIGINT) AS n_items,
         |  max(lo) AS p05, max(hi) AS p95, $wm AS wins_mean
         |FROM c GROUP BY g ORDER BY l_returnflag""".stripMargin
    },
    "q125_tiered_sample" ->
      """WITH d AS (SELECT lang, n_chars,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
        |         < (CASE WHEN lang = 'en' THEN 40 WHEN lang = 'de' THEN 60 ELSE 100 END)
        |    THEN 1 ELSE 0 END AS is_kept
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs, CAST(sum(is_kept) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN is_kept = 1 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // the roundtrip is invisible to semantics: oracle = the flat counts
    "q126_json_flatten" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,
    "q127_label_top_terms" ->
      raw"""WITH tk AS (SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |bl AS (SELECT lang, token, count(*) AS cnt FROM tk GROUP BY 1, 2),
        |lt AS (SELECT lang, sum(cnt) AS lang_toks FROM bl GROUP BY lang),
        |co AS (SELECT token, sum(cnt) AS corpus_cnt FROM bl GROUP BY token),
        |ct AS (SELECT sum(corpus_cnt) AS corpus_toks FROM co),
        |sc AS (SELECT bl.lang, bl.token, bl.cnt,
        |    CAST((CAST(bl.cnt AS HUGEINT) * ct.corpus_toks * 10000)
        |      // (CAST(lt.lang_toks AS HUGEINT) * co.corpus_cnt) AS BIGINT) AS lift_permyriad
        |  FROM bl JOIN lt USING (lang) JOIN co USING (token), ct),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY lift_permyriad DESC, token) AS rk FROM sc)
        |SELECT lang, CAST(rk AS BIGINT) AS rk, token, cnt, lift_permyriad
        |FROM rk WHERE rk <= 5 ORDER BY lang, rk""".stripMargin,
    // hint is plan-only: oracle = the plain join aggregate
    "q128_join_hint_shuffle_hash" -> {
      val qty = away("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT p_brand, count(*) AS n_items, $qty AS sum_qty
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin
    },
    "q129_exists_subquery" ->
      """SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT'
        |    AND o.o_totalprice > (
        |      SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(25,6))) AS DOUBLE) / count(*)
        |      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        |    )
        |)
        |ORDER BY c_custkey""".stripMargin,
    "q130_set_ops_all" ->
      """WITH y95 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |y96 AS (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |SELECT 'except_all' AS set_op,
        |  (SELECT count(*) FROM (SELECT * FROM y95 EXCEPT ALL SELECT * FROM y96)) AS n_rows
        |UNION ALL
        |SELECT 'intersect_all',
        |  (SELECT count(*) FROM (SELECT * FROM y95 INTERSECT ALL SELECT * FROM y96))
        |ORDER BY set_op""".stripMargin,
    "q131_null_safe_join" ->
      """WITH e AS (SELECT user_id, event_id,
        |    nullif(CAST(floor(value / 25) AS BIGINT), 1) AS b FROM events)
        |SELECT a.user_id, count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN a.b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_pairs
        |FROM e a JOIN e b
        |  ON a.user_id = b.user_id
        | AND a.b IS NOT DISTINCT FROM b.b
        | AND a.event_id < b.event_id
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    // left-outer emission model: inner pairs all emit; an unmatched
    // click's null row emits iff the final GLOBAL watermark passed the
    // end of its join window (click ts + 1h). The watermark nodes sit
    // after the event-type filters, so the global watermark is the MIN
    // of the per-side maxima (each ms-truncated, as Spark tracks event
    // time in milliseconds) minus the 1-hour delay.
    "q133_stream_left_outer" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |c AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'purchase'),
        |m AS (SELECT c.user_id, c.event_id, c.us, count(p.event_id) AS nm
        |      FROM c LEFT JOIN p ON c.user_id = p.user_id
        |        AND p.us >= c.us AND p.us <= c.us + 3600000000
        |      GROUP BY 1, 2, 3),
        |wm AS (SELECT (least((SELECT max(us) FROM c), (SELECT max(us) FROM p)) // 1000 - 3600000) * 1000 AS wm_us),
        |agg AS (SELECT user_id,
        |    CAST(sum(nm) AS BIGINT) AS n_matched,
        |    CAST(sum(CASE WHEN nm = 0 AND us + 3600000000 < (SELECT wm_us FROM wm) THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |  FROM m GROUP BY user_id)
        |SELECT user_id, n_matched, n_unmatched FROM agg
        |WHERE n_matched > 0 OR n_unmatched > 0
        |ORDER BY user_id""".stripMargin,
    "q134_shared_vocab" ->
      raw"""WITH tk AS (SELECT DISTINCT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS token FROM documents),
        |n AS (SELECT lang, count(*) AS n_toks FROM tk GROUP BY lang),
        |sh AS (SELECT a.lang AS l1, b.lang AS l2, count(*) AS n_shared
        |  FROM tk a JOIN tk b ON a.token = b.token AND a.lang < b.lang
        |  GROUP BY 1, 2)
        |SELECT sh.l1, sh.l2, na.n_toks AS n1, nb.n_toks AS n2, sh.n_shared
        |FROM sh JOIN n na ON na.lang = sh.l1 JOIN n nb ON nb.lang = sh.l2
        |ORDER BY l1, l2""".stripMargin,
    // every event lands in exactly 2 windows (6h size / 3h slide)
    "q135_sliding_windows" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS us, user_id FROM events),
        |w AS (SELECT ((us // 10800000000) * 10800000000 - k.k * 10800000000) // 1000 AS w_start_ms, user_id
        |  FROM e CROSS JOIN (VALUES (0), (1)) AS k(k))
        |SELECT w_start_ms, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM w GROUP BY w_start_ms ORDER BY w_start_ms""".stripMargin,
    "q136_filtered_agg" -> {
      val fp = away("CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(25,6)) ELSE 0 END) AS DOUBLE)", 2)
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |  count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
         |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
         |  $fp AS finished_price
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    // the roundtrip is byte-faithful: oracle = the same aggregate on the source
    "q137_csv_roundtrip" -> {
      val tot = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT o_orderstatus, count(*) AS n_orders, $tot AS total_price,
         |  min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
    },
    // the identical recursion (DuckDB: // is integer div)
    "q138_recursive_hierarchy" -> {
      val bal = away("CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH RECURSIVE h(c_custkey, c_acctbal, lvl) AS (
         |  SELECT c_custkey, c_acctbal, 0 FROM customer WHERE c_custkey = 0
         |  UNION ALL
         |  SELECT c.c_custkey, c.c_acctbal, h.lvl + 1
         |  FROM customer c JOIN h ON c.c_custkey // 2 = h.c_custkey
         |  WHERE c.c_custkey > 0
         |)
         |SELECT lvl, count(*) AS n_nodes, $bal AS sum_bal
         |FROM h GROUP BY lvl ORDER BY lvl""".stripMargin
    },
    // observed side-channel metrics == the same aggregates computed directly
    "q139_observe_metrics" -> {
      val qty = away("CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT count(*) AS n_rows, $qty AS sum_qty,
         |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
         |FROM lineitem""".stripMargin
    },
    "q140_intra_doc_dedup" ->
      raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |ch AS (SELECT doc_id, ws, unnest(generate_series(0, CAST(floor((len(ws) - 1) / 3.0) AS INTEGER))) AS chunk_idx FROM w),
        |h AS (SELECT doc_id, chunk_idx,
        |    md5(array_to_string(ws[(chunk_idx * 3 + 1):(chunk_idx * 3 + 3)], ' ')) AS h
        |  FROM ch),
        |r AS (SELECT doc_id, h, count(*) AS c FROM h GROUP BY doc_id, h)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks, count(*) AS n_unique,
        |  CAST(sum(c) - count(*) AS BIGINT) AS n_repeated
        |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // attribution: purchase matched iff a click of the same user lies
    // in [purchase − 1h, purchase]
    "q141_cogroup_attribution" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, us FROM e WHERE event_type = 'click')
        |SELECT p.user_id, count(*) AS n_purchases,
        |  CAST(sum(CASE WHEN EXISTS (
        |    SELECT 1 FROM c WHERE c.user_id = p.user_id
        |      AND c.us <= p.us AND p.us - c.us <= 3600000000
        |  ) THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
        |FROM p GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
    // identical div/mod bit-interleave arithmetic
    "q142_zorder_cluster" -> {
      val terms = (0 until 8).flatMap { i =>
        val px = 1L << i
        Seq(s"((bx // $px) % 2) * ${1L << (2 * i)}", s"((by // $px) % 2) * ${1L << (2 * i + 1)}")
      }.mkString(" + ")
      s"""WITH b AS (SELECT l_partkey % 256 AS bx, (l_suppkey * 37) % 256 AS by FROM lineitem),
         |z AS (SELECT bx, by, ($terms) // 4096 AS zblock FROM b)
         |SELECT zblock, count(*) AS n_rows,
         |  min(bx) AS x_lo, max(bx) AS x_hi, min(by) AS y_lo, max(by) AS y_hi
         |FROM z GROUP BY zblock ORDER BY zblock""".stripMargin
    },
    // the merged read, restated closed-form over the source rows
    "q143_schema_evolution" -> {
      val tot = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>' ELSE o_orderstatus END AS status,
         |  count(*) AS n_orders, $tot AS total_price
         |FROM orders GROUP BY status ORDER BY status""".stripMargin
    },
    // one upstream task per status ⇒ exactly one file per partition dir
    "q144_file_metadata" ->
      """SELECT o_orderstatus, count(*) AS n_rows, CAST(1 AS BIGINT) AS n_files,
        |  min(o_orderkey) AS min_key
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // variant paths restated closed-form over the source fields
    "q145_variant_extract" ->
      """WITH e AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |    'u' || CAST(user_id % 5 AS VARCHAR) AS cohort
        |  FROM events)
        |SELECT event_type, cohort, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k
        |FROM e GROUP BY event_type, cohort ORDER BY event_type, cohort""".stripMargin,
    "q146_array_hof" ->
      raw"""WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |f AS (SELECT doc_id, ws, list_filter(ws, x -> len(x) > 4) AS lf FROM w)
        |SELECT doc_id, CAST(len(lf) AS BIGINT) AS n_long,
        |  CAST(coalesce(list_sum(list_transform(lf, x -> len(x))), 0) AS BIGINT) AS long_chars,
        |  CAST(len(list_filter(ws, x -> len(x) >= 9)) > 0 AS INTEGER) AS has_rare
        |FROM f ORDER BY doc_id""".stripMargin,
    "q147_map_ops" ->
      """SELECT user_id,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
        |  count(DISTINCT event_type) AS n_types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q148_try_arithmetic" -> {
      val sq = away("CAST(sum(CAST(q AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH d AS (SELECT o_orderpriority,
         |    CASE WHEN o_orderkey % 5 = 0 THEN NULL
         |         ELSE o_totalprice / CAST(o_orderkey % 5 AS DOUBLE) END AS q
         |  FROM orders)
         |SELECT o_orderpriority, count(*) AS n_orders,
         |  count(*) FILTER (WHERE q IS NULL) AS n_div_zero,
         |  $sq AS sum_quotient
         |FROM d GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    // empty-array docs survive as one null row: n_rows = max(n_rare, 1)
    "q149_explode_outer" ->
      raw"""WITH w AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(trim(text), '\s+'), x -> len(x) >= 9) AS rare
        |  FROM documents)
        |SELECT doc_id, CAST(len(rare) AS BIGINT) AS n_rare,
        |  CAST(greatest(len(rare), 1) AS BIGINT) AS n_rows
        |FROM w ORDER BY doc_id""".stripMargin,
    // the identical 10 floored-integer message-passing rounds, unrolled
    // (the IVF/Lloyd unroll precedent) — same teleport floor, same
    // `pr div deg` share floor, same 85% damping floor
    "q150_pagerank" -> {
      val iterCtes = (0 until 10)
        .map { i =>
          s"""sh$i AS (SELECT p.id, p.pr // d.deg AS sh FROM pr$i p JOIN deg d ON p.id = d.id),
             |fl$i AS (SELECT s.dst AS id, sum(sh.sh) AS infl FROM sym s JOIN sh$i sh ON s.src = sh.id GROUP BY s.dst),
             |pr${i + 1} AS MATERIALIZED (SELECT doc.doc_id AS id,
             |    (15 * 1000000000000) // (100 * (SELECT n FROM nn))
             |    + CAST((85 * COALESCE(f.infl, 0)) // 100 AS BIGINT) AS pr
             |  FROM documents doc LEFT JOIN fl$i f ON doc.doc_id = f.id)""".stripMargin
        }
        .mkString(",\n")
      s"""WITH pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS MATERIALIZED (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM sym GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM documents),
         |pr0 AS (SELECT doc_id AS id, 1000000000000 // (SELECT n FROM nn) AS pr FROM documents),
         |$iterCtes
         |SELECT p.id AS doc_id, COALESCE(d.deg, 0) AS deg, p.pr
         |FROM pr10 p LEFT JOIN deg d ON p.id = d.id
         |ORDER BY doc_id""".stripMargin
    },
    "q151_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS t_view FROM e GROUP BY user_id),
        |c AS (SELECT e.user_id, v.t_view, min(CASE WHEN e.event_type = 'click' AND e.us > v.t_view THEN e.us END) AS t_click
        |  FROM e JOIN v ON e.user_id = v.user_id GROUP BY e.user_id, v.t_view),
        |p AS (SELECT e.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.us > c.t_click THEN e.us END) AS t_purchase
        |  FROM e JOIN c ON e.user_id = c.user_id GROUP BY e.user_id, c.t_view, c.t_click)
        |SELECT count(*) AS n_users, count(t_view) AS n_viewed,
        |  count(t_click) AS n_clicked_after_view,
        |  count(t_purchase) AS n_purchased_after_click
        |FROM p""".stripMargin,
    "q152_retention_matrix" ->
      """WITH e AS (SELECT user_id, (epoch_ns(ts) // 1000) // 604800000000 AS week FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
        |SELECT f.cohort_week, e.week - f.cohort_week AS weeks_since,
        |  count(DISTINCT e.user_id) AS n_active
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY f.cohort_week, weeks_since
        |ORDER BY cohort_week, weeks_since""".stripMargin,
    "q153_transition_matrix" ->
      """WITH o AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n_transitions
        |FROM o WHERE next_type IS NOT NULL
        |GROUP BY from_type, to_type ORDER BY from_type, to_type""".stripMargin,
    // sketch-ladder oracles: the bitmap rung is EXACT (plain
    // count-distinct mirrors it); the HLL / CMS rungs use the q38
    // bound-assertion pattern — the Spark side computes the sketch
    // estimate AND checks it against the exact count from the same
    // scan, so the oracle only restates the exact part + literal ok.
    "q154_bitmap_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q155_hll_partial_merge" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |  CAST(1 AS INTEGER) AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q156_cms_heavy_hitters" ->
      """SELECT user_id, n_events, CAST(1 AS INTEGER) AS cms_ok FROM (
        |  SELECT user_id, count(*) AS n_events FROM events
        |  GROUP BY user_id ORDER BY n_events DESC, user_id LIMIT 5)
        |ORDER BY n_events DESC, user_id""".stripMargin,
    "q157_shipping_priority" -> {
      val rev = away("CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority, $rev AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-06-30'
         |  AND l_shipdate > TIMESTAMP '1997-06-30'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
    },
    "q158_regional_revenue" -> {
      val rev = away("CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT n_name, $rev AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
    },
    "q159_ewma" -> {
      val num = "coalesce(l0 * 32.0, 0.0) + coalesce(l1 * 16.0, 0.0) + coalesce(l2 * 8.0, 0.0) + coalesce(l3 * 4.0, 0.0) + coalesce(l4 * 2.0, 0.0) + coalesce(l5 * 1.0, 0.0)"
      val den = (0 to 5)
        .map(i => s"(CASE WHEN l$i IS NOT NULL THEN ${32 >> i}.0 ELSE 0.0 END)")
        .mkString(" + ")
      s"""WITH l AS (SELECT user_id, event_id, value AS l0,
         |    lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
         |    lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
         |    lag(value, 5) OVER w AS l5
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         |SELECT user_id, event_id, ${away(s"(($num) / ($den))", 4)} AS ewma
         |FROM l ORDER BY user_id, event_id""".stripMargin
    },
    "q160_split_drift_tvd" -> {
      val tvd = away("CAST(abs(n_train * t_test - n_test * t_train) AS DOUBLE) / CAST(t_train * t_test AS DOUBLE) / 2.0", 6)
      s"""WITH b AS (SELECT event_type,
         |    ${hx("CAST(event_id AS VARCHAR)")} % 10 < 8 AS is_train
         |  FROM events),
         |c AS (SELECT event_type,
         |    sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS n_train,
         |    sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS n_test
         |  FROM b GROUP BY event_type),
         |t AS (SELECT sum(n_train) AS t_train, sum(n_test) AS t_test FROM c)
         |SELECT event_type, CAST(n_train AS BIGINT) AS n_train,
         |  CAST(n_test AS BIGINT) AS n_test, $tvd AS tvd_contrib
         |FROM c, t ORDER BY event_type""".stripMargin
    },
    // identical degree-ordered orientation → wedge join → closing-edge
    // check over the same LSH pair CTE the pagerank oracle uses
    "q161_triangle_census" ->
      s"""WITH pairs AS MATERIALIZED (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS (SELECT d1 AS s, d2 AS t FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |deg AS (SELECT s AS id, count(*) AS deg FROM sym GROUP BY s),
         |o AS MATERIALIZED (SELECT
         |    CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND p.d1 < p.d2) THEN p.d1 ELSE p.d2 END AS u,
         |    CASE WHEN a.deg < b.deg OR (a.deg = b.deg AND p.d1 < p.d2) THEN p.d2 ELSE p.d1 END AS v
         |  FROM pairs p JOIN deg a ON p.d1 = a.id JOIN deg b ON p.d2 = b.id),
         |w AS MATERIALIZED (SELECT e1.v AS a, e2.v AS b FROM o e1 JOIN o e2 ON e1.u = e2.u AND e1.v < e2.v),
         |tr AS (SELECT 1 AS x FROM w JOIN pairs ON least(a, b) = d1 AND greatest(a, b) = d2)
         |SELECT (SELECT count(*) FROM pairs) AS n_edges,
         |  (SELECT count(*) FROM w) AS n_wedges,
         |  (SELECT count(*) FROM tr) AS n_triangles""".stripMargin,
    "q162_degree_histogram" ->
      s"""WITH pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS (SELECT d1 AS s, d2 AS t FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |dg AS (SELECT s AS doc_id, count(*) AS deg FROM sym GROUP BY s)
         |SELECT COALESCE(dg.deg, CAST(0 AS BIGINT)) AS deg, count(*) AS n_nodes
         |FROM documents d LEFT JOIN dg ON d.doc_id = dg.doc_id
         |GROUP BY 1 ORDER BY deg""".stripMargin,
    "q163_prefix_clusters" ->
      """SELECT md5(substr(text, 1, 64)) AS prefix_hash, count(*) AS n_docs,
        |  min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1
        |ORDER BY prefix_hash""".stripMargin,
    "q164_path_signatures" ->
      """WITH p AS (SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM events GROUP BY user_id)
        |SELECT path, count(*) AS n_users FROM p
        |GROUP BY path ORDER BY n_users DESC, path LIMIT 10""".stripMargin,
    // host/path reconstructed from the generating fields — ground truth
    // for Spark's parse_url, no URL parser on the oracle side
    "q165_url_normalize" ->
      """SELECT doc_id,
        |  source || '.example.com' AS host,
        |  '/docs/d' || CAST(doc_id AS VARCHAR) AS path,
        |  source || '.example.com/docs/d' || CAST(doc_id AS VARCHAR)
        |    || '?page=' || CAST(doc_id % 3 AS VARCHAR) AS canonical
        |FROM documents ORDER BY doc_id""".stripMargin,
    // WAV mirror: parameters the builder derives from content length
    // (audioParams), container overhead 44 bytes, data padded to block
    // align — the decoder must read all of it back out of the bytes
    "q166_multimodal_audio" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |p AS (SELECT doc_id, n,
        |    CASE CAST(n % 5 AS INTEGER) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
        |    CASE WHEN n % 2 = 0 THEN 1 ELSE 4 END AS ba,
        |    CAST(1 + n % 2 AS INTEGER) AS channels,
        |    CAST(8 * (1 + n % 2) AS INTEGER) AS bits
        |  FROM m),
        |q AS (SELECT doc_id, rate, channels, bits, ba,
        |    ((n + ba - 1) // ba) * ba AS padded FROM p)
        |SELECT doc_id,
        |  CAST(44 + padded AS INTEGER) AS n_bytes,
        |  CAST(rate AS INTEGER) AS sample_rate,
        |  channels, bits,
        |  CAST(padded // ba AS BIGINT) AS n_samples,
        |  CAST((padded // ba) * 1000 // rate AS BIGINT) AS ms
        |FROM q ORDER BY doc_id""".stripMargin,
    // identical two-level power-sum merge; doubles only in the final
    // mean/var expressions, in the same op order as the Spark side
    "q167_partial_stats_merge" -> {
      val mean = away("CAST(s1 AS DOUBLE) / n", 4)
      val vr = away("CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)", 4)
      s"""WITH p AS (SELECT event_type, (epoch_ns(ts) // 1000) // 604800000000 AS week,
         |    count(value) AS n, sum(CAST(value AS DECIMAL(18,6))) AS s1,
         |    sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS s2
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type, sum(n) AS n, sum(s1) AS s1, sum(s2) AS s2 FROM p GROUP BY event_type)
         |SELECT event_type, CAST(n AS BIGINT) AS n, $mean AS mean, $vr AS variance
         |FROM m ORDER BY event_type""".stripMargin
    },
    "q168_cooccurrence" ->
      """WITH s AS (SELECT DISTINCT user_id, event_type FROM events),
        |p AS (SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b
        |  FROM s a JOIN s b ON a.user_id = b.user_id AND a.event_type < b.event_type)
        |SELECT type_a, type_b, count(*) AS n_users FROM p
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // NULL first-event gaps must be dropped BEFORE least(): DuckDB's
    // least() skips NULL arguments (returns 12), it does not propagate
    "q169_gap_histogram" ->
      """WITH g AS (SELECT epoch_ns(ts) // 1000
        |      - lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT least(gap // 600000000, 12) AS bucket, count(*) AS n_gaps
        |FROM g WHERE gap IS NOT NULL
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q170_golden_record" -> {
      val lastv = away("lv.value", 2)
      s"""WITH lv AS (SELECT user_id, value FROM (
         |    SELECT user_id, value,
         |      row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |    FROM events WHERE value IS NOT NULL) WHERE rn = 1),
         |tt AS (SELECT user_id, event_type FROM (
         |    SELECT user_id, event_type,
         |      row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type DESC) AS rn
         |    FROM (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)) WHERE rn = 1),
         |sp AS (SELECT user_id, count(*) AS n_events, min(ts) AS first_ts, max(ts) AS last_ts
         |  FROM events GROUP BY user_id)
         |SELECT sp.user_id, sp.n_events, sp.first_ts, sp.last_ts,
         |  tt.event_type AS top_type, $lastv AS last_value
         |FROM sp JOIN tt USING (user_id) LEFT JOIN lv USING (user_id)
         |ORDER BY user_id""".stripMargin
    },
    // parser-free XML mirror: the fields the builder embedded
    "q171_xml_ingest" ->
      """SELECT o_orderkey, o_orderkey AS parsed_id, o_orderstatus AS status,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q172_anomaly_flags" ->
      """WITH wk AS (SELECT event_type, (epoch_ns(ts) // 1000) // 604800000000 AS week,
        |    count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT event_type, week, n,
        |  CAST(count(n) OVER w > 0 AND n * count(n) OVER w > sum(n) OVER w * 2 AS INTEGER) AS spike
        |FROM wk WINDOW w AS (PARTITION BY event_type ORDER BY week
        |  ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
        |ORDER BY event_type, week""".stripMargin,
    "q173_pareto_frontier" ->
      """WITH d AS (SELECT o_orderdate, max(CAST(o_totalprice AS DECIMAL(12,2))) AS day_max
        |  FROM orders GROUP BY 1),
        |f AS (SELECT o_orderdate, day_max, max(day_max) OVER (ORDER BY o_orderdate
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best FROM d)
        |SELECT o_orderdate, day_max FROM f
        |WHERE prev_best IS NULL OR day_max > prev_best
        |ORDER BY o_orderdate""".stripMargin,
    "q174_expectation_suite" ->
      """WITH c AS (
        |  SELECT 'orders_dup_keys' AS check_name,
        |    count(*) - count(DISTINCT o_orderkey) AS metric, CAST(0 AS BIGINT) AS threshold FROM orders
        |  UNION ALL
        |  SELECT 'orders_orphan_custkeys', count(*), 0 FROM orders
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |  UNION ALL
        |  SELECT 'orders_nonpositive_totalprice',
        |    count(CASE WHEN o_totalprice <= 0 THEN 1 END), 0 FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_qty_out_of_domain',
        |    count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END), 0 FROM lineitem
        |  UNION ALL
        |  SELECT 'events_null_value_permille',
        |    count(CASE WHEN value IS NULL THEN 1 END) * 1000 // count(*), 200 FROM events)
        |SELECT check_name, metric, threshold,
        |  CAST(metric <= threshold AS INTEGER) AS passed
        |FROM c ORDER BY check_name""".stripMargin,
    // first digit from the DECIMAL string rendering on both sides —
    // never log10 on doubles
    "q175_benford_profile" ->
      """WITH d AS (SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS digit
        |  FROM orders),
        |n AS (SELECT digit, count(*) AS n FROM d WHERE digit BETWEEN '1' AND '9' GROUP BY digit),
        |t AS (SELECT sum(n) AS total FROM n)
        |SELECT digit, n, CAST(n * 10000 // total AS BIGINT) AS share_permyriad
        |FROM n, t ORDER BY digit""".stripMargin,
    "q176_date_spine" -> {
      val rev = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""WITH span AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
         |    max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
         |spine AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
         |    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day FROM span),
         |daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
         |    $rev AS revenue FROM orders GROUP BY 1)
         |SELECT CAST(spine.day AS TIMESTAMP) AS day, COALESCE(daily.n_orders, 0) AS n_orders,
         |  COALESCE(daily.revenue, 0.0) AS revenue
         |FROM spine LEFT JOIN daily ON spine.day = daily.day
         |ORDER BY spine.day""".stripMargin
    },
    "q132_share_of_total" -> {
      val rev = away("CAST(rev AS DOUBLE)", 2)
      s"""WITH cell AS (SELECT l_returnflag, l_linestatus,
         |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS rev
         |  FROM lineitem GROUP BY 1, 2),
         |p AS (SELECT l_returnflag, sum(rev) AS flag_rev FROM cell GROUP BY l_returnflag)
         |SELECT cell.l_returnflag, cell.l_linestatus, $rev AS revenue,
         |  CAST(floor(CAST(cell.rev * 10000 AS DOUBLE) / CAST(p.flag_rev AS DOUBLE)) AS BIGINT) AS share_permyriad
         |FROM cell JOIN p ON cell.l_returnflag = p.l_returnflag
         |ORDER BY cell.l_returnflag, cell.l_linestatus""".stripMargin
    },
    // exact sliding distinct: the bitmap-merge answer equals the naive
    // re-count over each trailing window
    "q177_sliding_distinct" ->
      """WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |d AS (SELECT DISTINCT day FROM e)
        |SELECT CAST(d.day AS TIMESTAMP) AS day, count(DISTINCT e.user_id) AS n_users_7d
        |FROM d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day ORDER BY day""".stripMargin,
    // the same (df, shingle) total order, per-doc prefix cut, candidate
    // equi-join and integer Jaccard verify as the Spark side
    "q178_setsim_prefix_join" ->
      s"""WITH $ShingleCte,
        |dfq AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
        |rk AS (SELECT sh.doc_id, sh.g,
        |    row_number() OVER (PARTITION BY sh.doc_id ORDER BY dfq.df, sh.g) AS pos,
        |    count(*) OVER (PARTITION BY sh.doc_id) AS n
        |  FROM sh JOIN dfq USING (g)),
        |pf AS (SELECT doc_id, g FROM rk WHERE pos <= n - (n + 1) // 2 + 1),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM pf a JOIN pf b ON a.g = b.g AND a.doc_id < b.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |it AS (SELECT c.d1, c.d2, count(*) AS inter
        |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y ON y.doc_id = c.d2 AND y.g = x.g
        |  GROUP BY 1, 2)
        |SELECT it.d1, it.d2, inter, x.n + y.n - inter AS n_union,
        |  inter * 1000 // (x.n + y.n - inter) AS jaccard_permille
        |FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
        |WHERE 3 * inter >= x.n + y.n ORDER BY d1, d2""".stripMargin,
    // identical integer bin rule over the per-group distinct-value
    // cumulative counts
    "q179_equidepth_histogram" ->
      """WITH h AS (SELECT l_returnflag AS g, l_extendedprice AS v, count(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT g, v, cnt,
        |    sum(cnt) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY g) AS tot
        |  FROM h)
        |SELECT g AS l_returnflag, CAST((cum - 1) * 4 // tot AS BIGINT) AS bin_id,
        |  CAST(sum(cnt) AS BIGINT) AS n_rows, min(v) AS lo, max(v) AS hi
        |FROM c GROUP BY 1, 2 ORDER BY l_returnflag, bin_id""".stripMargin,
    "q180_open_order_concurrency" ->
      """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS sd,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 + 1 AS INTEGER) AS ed FROM orders),
        |d AS (SELECT sd AS day, CAST(1 AS BIGINT) AS delta FROM o
        |  UNION ALL SELECT ed, CAST(-1 AS BIGINT) FROM o),
        |n AS (SELECT day, sum(delta) AS net FROM d GROUP BY day)
        |SELECT CAST(day AS TIMESTAMP) AS day, CAST(net AS BIGINT) AS net,
        |  CAST(sum(net) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_open
        |FROM n ORDER BY day""".stripMargin,
    "q182_dpp_prune" -> {
      val rev = away("CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)", 2)
      s"""SELECT o_orderpriority, count(*) AS n_orders, $rev AS revenue
         |FROM orders
         |WHERE o_orderpriority IN (
         |  SELECT DISTINCT o_orderpriority FROM orders WHERE o_orderpriority < '3')
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    },
    // identical peeling rounds unrolled as chained CTEs over the same
    // banding candidates. MATERIALIZED is load-bearing: each round
    // references the previous edge set several times, and DuckDB
    // inlines plain CTEs — without it the minhash pipeline re-evaluates
    // ~5^rounds times
    "q183_kcore" -> {
      val rounds = (1 to 3)
        .map { r =>
          val p = r - 1
          s"""s$p AS (SELECT u, v FROM e$p UNION ALL SELECT v, u FROM e$p),
             |k$p AS (SELECT u FROM s$p GROUP BY u HAVING count(*) >= 2),
             |e$r AS MATERIALIZED (SELECT e$p.u, e$p.v FROM e$p
             |  JOIN k$p x ON e$p.u = x.u JOIN k$p y ON e$p.v = y.u)""".stripMargin
        }
        .mkString(",\n")
      s"""WITH $minhashCandCtes,
         |e0 AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM cand),
         |$rounds,
         |s3 AS (SELECT u, v FROM e3 UNION ALL SELECT v, u FROM e3)
         |SELECT u AS doc_id, count(*) AS deg FROM s3 GROUP BY u ORDER BY doc_id""".stripMargin
    },
    "q184_kmv_bottomk" -> {
      val k = 64
      s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         |h AS (SELECT event_type, user_id, ${hx("CAST(user_id AS VARCHAR)")} AS h FROM du),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h, user_id) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS n_exact
         |  FROM h),
         |pick AS (SELECT * FROM r WHERE rk = $k OR (n_exact < $k AND rk = n_exact)),
         |est AS (SELECT event_type, n_exact,
         |    CASE WHEN n_exact < $k THEN n_exact ELSE (${k - 1}) * 4294967296 // h END AS kmv_est
         |  FROM pick)
         |SELECT event_type, n_exact, kmv_est,
         |  CAST(kmv_est >= n_exact / 2.0 AND kmv_est <= n_exact * 2 AS INTEGER) AS kmv_ok
         |FROM est ORDER BY event_type""".stripMargin
    },
    "q185_weighted_systematic" ->
      """WITH w AS (SELECT event_type, user_id, count(*) AS w
        |  FROM events GROUP BY event_type, user_id),
        |c AS (SELECT event_type, user_id, w,
        |    sum(w) OVER (PARTITION BY event_type ORDER BY user_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(w) OVER (PARTITION BY event_type) AS tot
        |  FROM w)
        |SELECT event_type, user_id, w, CAST(cum AS BIGINT) AS cum FROM c
        |WHERE cum // greatest(tot // 10, 1) > (cum - w) // greatest(tot // 10, 1)
        |ORDER BY event_type, user_id""".stripMargin,
    // the source-side checksums; a green match_ok proves the replica's
    // checksums equalled them on the Spark side
    "q186_table_checksum" -> {
      val h = hx("CAST(event_id AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")
      s"""SELECT event_id % 32 AS bucket, count(*) AS n_rows,
         |  CAST(sum($h) AS BIGINT) AS checksum, CAST(1 AS INTEGER) AS match_ok
         |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin
    },
    // exact trailing window from the raw scan; the HLL bound column is
    // the assertion (q38/q155 posture)
    "q187_sliding_hll_distinct" ->
      """WITH e AS (SELECT DISTINCT event_type,
        |    epoch_ns(ts) // 1000 // 604800000000 AS week, user_id FROM events),
        |w AS (SELECT DISTINCT event_type, week FROM e)
        |SELECT w.event_type, w.week, count(DISTINCT e.user_id) AS n_exact_4w,
        |  CAST(1 AS INTEGER) AS hll_ok
        |FROM w JOIN e ON e.event_type = w.event_type AND e.week BETWEEN w.week - 3 AND w.week
        |GROUP BY w.event_type, w.week ORDER BY 1, 2""".stripMargin,
    "q188_language_mix" -> {
      val h = hx("CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (SELECT doc_id, lang, $h AS h FROM documents),
         |r AS (SELECT doc_id, lang,
         |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY lang) AS n_l FROM d),
         |t AS (SELECT count(*) AS n_total, count(DISTINCT lang) AS n_langs FROM documents)
         |SELECT lang, max(n_l) AS n_available,
         |  CAST(max(least(n_l, n_total // n_langs)) AS BIGINT) AS quota,
         |  count(*) AS n_picked, CAST(sum(doc_id) AS BIGINT) AS picked_sum
         |FROM r, t WHERE rk <= least(n_l, n_total // n_langs)
         |GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q189_join_cardinality" ->
      """WITH f1 AS (SELECT user_id AS k, count(*) AS f1 FROM events GROUP BY 1),
        |f2 AS (SELECT o_custkey AS k, count(*) AS f2 FROM orders GROUP BY 1),
        |e AS (SELECT count(*) AS n_shared_keys, CAST(sum(f1 * f2) AS BIGINT) AS est_rows
        |  FROM f1 JOIN f2 USING (k)),
        |a AS (SELECT count(*) AS actual_rows FROM events JOIN orders ON user_id = o_custkey)
        |SELECT n_shared_keys, est_rows, actual_rows,
        |  CAST(est_rows = actual_rows AS INTEGER) AS estimate_exact
        |FROM e, a""".stripMargin,
    // exact containment rerank over the SAME banding candidates as q27
    "q181_containment_pairs" ->
      s"""WITH $minhashCandCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |it AS (SELECT c.d1, c.d2, count(*) AS inter
         |  FROM cand c JOIN sh x ON x.doc_id = c.d1 JOIN sh y ON y.doc_id = c.d2 AND y.g = x.g
         |  GROUP BY 1, 2)
         |SELECT it.d1, it.d2, inter, least(x.n_sh, y.n_sh) AS n_min,
         |  inter * 1000 // least(x.n_sh, y.n_sh) AS containment_permille
         |FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
         |WHERE 4 * inter >= 3 * least(x.n_sh, y.n_sh) ORDER BY d1, d2""".stripMargin,
    // replays the engine's two-phase watermark rule relationally:
    // phase 1 = the 48-hour head, which advances the checkpointed
    // watermark to epoch_ms(max ts) − 72 h; phase 2 = everything
    // older, where a row is dropped iff its day-window end ≤ that
    // restored watermark (ms floor — the unit Spark tracks event time
    // in). n_dropped must equal the engine's numRowsDroppedByWatermark.
    "q191_late_data_audit" ->
      """WITH m AS (SELECT max(ts) AS mx, epoch_ms(max(ts)) - 72*3600*1000 AS wm_ms FROM events)
        |SELECT
        |  count(*) FILTER (WHERE ts >= mx - INTERVAL 48 HOUR) AS n_on_time,
        |  count(*) FILTER (WHERE ts < mx - INTERVAL 48 HOUR) AS n_late,
        |  count(DISTINCT date_trunc('day', ts)) FILTER (WHERE ts < mx - INTERVAL 48 HOUR
        |    AND epoch_ms(date_trunc('day', ts) + INTERVAL 1 DAY) <= wm_ms) AS n_windows_dropped,
        |  count(*) FILTER (WHERE ts < mx - INTERVAL 48 HOUR
        |    AND epoch_ms(date_trunc('day', ts) + INTERVAL 1 DAY) <= wm_ms) AS n_rows_dropped,
        |  count(*) FILTER (WHERE ts < mx - INTERVAL 48 HOUR
        |    AND epoch_ms(date_trunc('day', ts) + INTERVAL 1 DAY) > wm_ms) AS n_rows_kept
        |FROM events, m""".stripMargin,
    // re-derives the plan from the PHYSICAL files the engine wrote:
    // read_blob byte lengths == _metadata.file_size, same name-ordered
    // next-fit fold — proving every file is covered exactly once and
    // each group's bytes obey the next-fit bound
    // identical winnowing: min-md5 per 50-window of char 8-grams,
    // distinct prints, df-cap, pair join — md5-substring parity is the
    // q24 contract, window frames are spelled identically
    "q195_winnowed_overlap" ->
      s"""WITH $winnowFpsCtes,
        |fpsm AS MATERIALIZED (SELECT doc_id, fp FROM fps),
        |stop AS (SELECT fp FROM fpsm GROUP BY fp HAVING count(*) > 20),
        |kept AS MATERIALIZED (SELECT doc_id, fp FROM fpsm WHERE fp NOT IN (SELECT fp FROM stop)),
        |sz AS (SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
        |  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT pr.d1, pr.d2, n_shared,
        |  n_shared * 1000 // least(x.n_fp, y.n_fp) AS containment_permille
        |FROM pr JOIN sz x ON pr.d1 = x.doc_id JOIN sz y ON pr.d2 = y.doc_id
        |WHERE n_shared >= 5 ORDER BY d1, d2""".stripMargin,
    // verifies the rewrite from the REWRITTEN files themselves:
    // read_parquet over the compacted hive layout recounts rows, key
    // checksums, groups, and physical files — the engine's audit row
    // must match what is actually on disk
    "q194_compaction_execute" ->
      """WITH c AS (SELECT o_orderstatus, grp, o_orderkey, filename
        |  FROM read_parquet('/tmp/graft_compact_exec/sf0.01/compacted/*/*/*.parquet',
        |                    hive_partitioning=true, filename=true)),
        |s AS (SELECT o_orderstatus, count(*) AS src_rows,
        |    CAST(sum(o_orderkey) AS BIGINT) AS src_sum FROM orders GROUP BY 1),
        |a AS (SELECT o_orderstatus, count(DISTINCT grp) AS n_groups,
        |    count(DISTINCT CAST(grp AS VARCHAR) || '/' || filename) AS n_files,
        |    count(*) AS n_rows, CAST(sum(o_orderkey) AS BIGINT) AS key_sum
        |  FROM c GROUP BY 1)
        |SELECT a.o_orderstatus, CAST(n_groups AS BIGINT) AS n_groups,
        |  CAST(n_files = n_groups AS INTEGER) AS one_file_per_group,
        |  n_rows,
        |  CAST(n_rows = src_rows AND key_sum = src_sum AS INTEGER) AS lossless
        |FROM a JOIN s USING (o_orderstatus) ORDER BY o_orderstatus""".stripMargin,
    "q192_compaction_plan" ->
      """WITH f AS (SELECT DISTINCT
        |    regexp_extract(filename, 'o_orderstatus=([^/]+)', 1) AS o_orderstatus,
        |    parse_filename(filename) AS file_name,
        |    octet_length(content) AS file_size
        |  FROM read_blob('/tmp/graft_compact/sf0.01/orders/*/*.parquet')),
        |w AS (SELECT o_orderstatus, file_name, file_size,
        |    sum(file_size) OVER (PARTITION BY o_orderstatus ORDER BY file_name
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - file_size AS bytes_before
        |  FROM f)
        |SELECT o_orderstatus, CAST(bytes_before // 65536 AS BIGINT) AS grp,
        |  count(*) AS n_files, CAST(sum(file_size) AS BIGINT) AS group_bytes,
        |  min(file_name) AS first_file
        |FROM w GROUP BY 1, 2 ORDER BY o_orderstatus, grp""".stripMargin,
    // same five-stage fold: q92's quality predicates verbatim, md5
    // keeper window over stage-3 survivors, the q27 banding candidates
    // confirmed by exact shingle Jaccard at the integer-crossed 0.5
    // threshold — drop rule is one-pass greedy on stage-4 survivorship
    "q196_curation_funnel" ->
      raw"""WITH $minhashCandCtes,
         |qf AS (SELECT doc_id, text, lang, regexp_split_to_array(trim(text), '\s+') AS qws,
         |    CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS INTEGER) AS sum_len
         |  FROM documents),
         |fl AS (SELECT doc_id, text,
         |    (lang IN ('en', 'es', 'de', 'fr')) AS ok_lang,
         |    ((lang IN ('en', 'es', 'de', 'fr'))
         |      AND len(qws) BETWEEN 30 AND 600
         |      AND sum_len >= len(qws) * 3 AND sum_len <= len(qws) * 6
         |      AND len(list_filter(qws, x -> list_contains(['the','a','and','is','of'], x))) * 50 >= len(qws)
         |      AND len(list_distinct(qws)) * 5 >= len(qws)) AS ok_q
         |  FROM qf),
         |s4 AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM fl WHERE ok_q) WHERE rn = 1),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |conf AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |    JOIN s4 k1 ON k1.doc_id = c.d1 JOIN s4 k2 ON k2.doc_id = c.d2
         |    JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |dr AS (SELECT DISTINCT conf.d2 FROM conf JOIN sz x ON conf.d1 = x.doc_id JOIN sz y ON conf.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |tot AS (SELECT count(*) AS n1,
         |    CAST(sum(CASE WHEN ok_lang THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN ok_q THEN 1 ELSE 0 END) AS BIGINT) AS n3 FROM fl),
         |k4 AS (SELECT count(*) AS c FROM s4),
         |k5 AS (SELECT count(*) AS c FROM dr)
         |SELECT stage_id, stage, n_docs FROM (
         |  SELECT 1 AS stage_id, 'ingest' AS stage, n1 AS n_docs FROM tot
         |  UNION ALL SELECT 2, 'language', n2 FROM tot
         |  UNION ALL SELECT 3, 'quality', n3 FROM tot
         |  UNION ALL SELECT 4, 'exact_dedup', (SELECT c FROM k4)
         |  UNION ALL SELECT 5, 'near_dedup', (SELECT c FROM k4) - (SELECT c FROM k5)
         |) ORDER BY stage_id""".stripMargin,
    // identical arithmetic order to the engine: idf = ln of exact-int
    // ratio, per-term contribution away-rounded to 6dp, decimal sum
    "q198_bm25_topk" -> bm25Sql,
    // q29's mirror with the label-exclusion predicate on the pair join
    "q199_hard_negatives" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql FROM embeddings WHERE vec_id < 20),
         |p AS (SELECT q.qid, q.qe, e.vec_id AS nid, e.embedding AS ne
         |  FROM q, embeddings e WHERE e.label <> q.ql),
         |s AS (SELECT qid, nid, ${cosineSql("qe", "ne")} AS c FROM p),
         |r AS (SELECT qid, nid, ${away("c", 6)} AS sim FROM s),
         |k AS (SELECT qid, nid, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM r)
         |SELECT qid, nid, sim, rnk FROM k WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // greedy MMR unrolled (3 picks, λ=0.7): pool = q29's top-10 shape
    // for vec_id<5; each round's argmax uses identical double literals
    // and (score DESC, nid) ties on both engines
    "q200_mmr_diversify" -> {
      val mmr = "CAST(0.7 AS DOUBLE) * rel - CAST(0.3 AS DOUBLE) * ms"
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |ap AS (SELECT q.qid, e.vec_id AS nid, ${away(cosineSql("q.qe", "e.embedding"), 6)} AS rel
         |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
         |pool AS (SELECT qid, nid, rel FROM (SELECT qid, nid, rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn FROM ap) t WHERE rn <= 10),
         |pv AS (SELECT p.qid, p.nid, p.rel, e.embedding AS ev FROM pool p JOIN embeddings e ON e.vec_id = p.nid),
         |ps AS (SELECT a.qid, a.nid AS n1, b.nid AS n2, ${away(cosineSql("a.ev", "b.ev"), 6)} AS ps
         |  FROM pv a JOIN pv b ON a.qid = b.qid AND a.nid <> b.nid),
         |s1 AS (SELECT qid, nid, rel FROM (SELECT qid, nid, rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rn FROM pool) t WHERE rn = 1),
         |c2 AS (SELECT p.qid, p.nid, p.rel, max(ps.ps) AS ms FROM pool p
         |  JOIN ps ON ps.qid = p.qid AND ps.n1 = p.nid
         |  JOIN s1 ON s1.qid = ps.qid AND s1.nid = ps.n2
         |  WHERE NOT EXISTS (SELECT 1 FROM s1 x WHERE x.qid = p.qid AND x.nid = p.nid)
         |  GROUP BY 1, 2, 3),
         |s2 AS (SELECT qid, nid, rel FROM (SELECT qid, nid, rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY $mmr DESC, nid) AS rn FROM c2) t WHERE rn = 1),
         |sel2 AS (SELECT qid, nid FROM s1 UNION ALL SELECT qid, nid FROM s2),
         |c3 AS (SELECT p.qid, p.nid, p.rel, max(ps.ps) AS ms FROM pool p
         |  JOIN ps ON ps.qid = p.qid AND ps.n1 = p.nid
         |  JOIN sel2 ON sel2.qid = ps.qid AND sel2.nid = ps.n2
         |  WHERE NOT EXISTS (SELECT 1 FROM sel2 x WHERE x.qid = p.qid AND x.nid = p.nid)
         |  GROUP BY 1, 2, 3),
         |s3 AS (SELECT qid, nid, rel FROM (SELECT qid, nid, rel,
         |    row_number() OVER (PARTITION BY qid ORDER BY $mmr DESC, nid) AS rn FROM c3) t WHERE rn = 1)
         |SELECT qid, pick, nid, rel FROM (
         |  SELECT qid, 1 AS pick, nid, rel FROM s1
         |  UNION ALL SELECT qid, 2, nid, rel FROM s2
         |  UNION ALL SELECT qid, 3, nid, rel FROM s3
         |) ORDER BY qid, pick""".stripMargin
    },
    // one keyed pass; q92's predicates; integer permyriad en-share;
    // away-rounded exact-int mean
    "q201_corpus_report" ->
      raw"""WITH d AS (SELECT source, lang, regexp_split_to_array(trim(text), '\s+') AS ws,
         |    CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS INTEGER) AS sum_len,
         |    md5(text) AS digest FROM documents),
         |f AS (SELECT source, lang, digest, CAST(len(ws) AS INTEGER) AS n_tok,
         |    CASE WHEN len(ws) BETWEEN 30 AND 600
         |      AND sum_len >= len(ws) * 3 AND sum_len <= len(ws) * 6
         |      AND len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) * 50 >= len(ws)
         |      AND len(list_distinct(ws)) * 5 >= len(ws) THEN 1 ELSE 0 END AS p_q,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en
         |  FROM d)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  count(DISTINCT lang) AS n_langs,
         |  CAST(sum(p_q) AS BIGINT) AS n_quality_pass,
         |  count(*) - count(DISTINCT digest) AS n_exact_dup,
         |  ${away("CAST(sum(n_tok) AS DOUBLE) / count(*)", 4)} AS avg_tokens,
         |  CAST(sum(is_en) AS BIGINT) * 10000 // count(*) AS en_permyriad
         |FROM f GROUP BY source ORDER BY source""".stripMargin,
    // the probe-join variant of the banding candidates (new×old only),
    // exact-Jaccard confirmed at the integer-crossed 0.5 threshold
    "q202_incremental_dedup" -> incrementalDedupSql,
    // the streaming twin computes the IDENTICAL result (per-row
    // signatures + stream-static index join) — same oracle by design
    "q203_stream_dedup_probe" -> incrementalDedupSql,
    // integer permyriad/milli arithmetic throughout — no float shares
    "q204_mixture_schedule" ->
      raw"""WITH a AS (SELECT lang,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS available_tokens
         |  FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(available_tokens) AS BIGINT) AS total_tokens FROM a),
         |w(lang, target_permyriad) AS (VALUES
         |  ('en', CAST(4000 AS BIGINT)), ('de', CAST(1500 AS BIGINT)), ('es', CAST(1500 AS BIGINT)),
         |  ('fr', CAST(1500 AS BIGINT)), ('zh', CAST(1500 AS BIGINT)))
         |SELECT a.lang, available_tokens, target_permyriad,
         |  total_tokens * target_permyriad // 10000 AS target_tokens,
         |  (total_tokens * target_permyriad // 10000) * 1000 // available_tokens AS repeat_milli
         |FROM a JOIN w USING (lang), t ORDER BY lang""".stripMargin,
    // the q197 cells re-used for diversity-PRESERVING subsampling:
    // deterministic per-cell uniform pick via the hash32 order
    "q205_cluster_balanced_sample" -> {
      val h = hx("CAST(vid AS VARCHAR)")
      s"""WITH $coarseCellCtes,
         |r AS (SELECT cell, vid, $h AS h FROM corpus),
         |k AS (SELECT cell, vid,
         |    CAST(row_number() OVER (PARTITION BY cell ORDER BY h, vid) AS INTEGER) AS rk FROM r)
         |SELECT cell, vid, rk FROM k WHERE rk <= 8 ORDER BY cell, rk""".stripMargin
    },
    // both ladders' own mirrors as subqueries; recall in integer permille
    "q206_ann_recall_report" ->
      s"""WITH b AS ($annBruteSql),
         |i AS (${annIvfSqlFor(nprobe = 4, k = 10)}),
         |m AS (SELECT b.qid, count(*) AS n_true, count(i.nid) AS n_hit
         |  FROM b LEFT JOIN i ON i.qid = b.qid AND i.nid = b.nid GROUP BY b.qid)
         |SELECT qid, n_true, n_hit, n_hit * 1000 // n_true AS recall_permille
         |FROM m ORDER BY qid""".stripMargin,
    // q202's probe shape with the hash split as the side predicate;
    // leaky test docs counted once, ledger rows derived by arithmetic
    "q207_leakage_free_split" -> {
      val h = hx("CAST(a.doc_id AS VARCHAR)")
      val hb = hx("CAST(b.doc_id AS VARCHAR)")
      val probeJoins = (0 until 4)
        .map(j =>
          s"SELECT a.doc_id AS new_id, b.doc_id AS old_id FROM band a JOIN band b ON a.band_$j = b.band_$j AND $h % 10 = 0 AND $hb % 10 <> 0"
        )
        .mkString("\nUNION\n")
      s"""WITH $minhashBandCtes,
         |spl AS (SELECT doc_id, (${hx("CAST(doc_id AS VARCHAR)")} % 10 = 0) AS is_test FROM documents),
         |cand AS ($probeJoins),
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |it AS (SELECT c.new_id, c.old_id, count(*) AS inter FROM cand c
         |  JOIN sh x ON x.doc_id = c.new_id JOIN sh y ON y.doc_id = c.old_id AND y.g = x.g
         |  GROUP BY 1, 2),
         |leaky AS (SELECT DISTINCT it.new_id
         |  FROM it JOIN sz x ON it.new_id = x.doc_id JOIN sz y ON it.old_id = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |t0 AS (SELECT CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT) AS n_test0,
         |    CAST(sum(CASE WHEN is_test THEN 0 ELSE 1 END) AS BIGINT) AS n_train0 FROM spl),
         |l AS (SELECT count(*) AS n_leaky FROM leaky)
         |SELECT split, n_initial, n_moved, n_final FROM (
         |  SELECT 'test' AS split, n_test0 AS n_initial, n_leaky AS n_moved, n_test0 - n_leaky AS n_final FROM t0, l
         |  UNION ALL SELECT 'train', n_train0, n_leaky, n_train0 + n_leaky FROM t0, l
         |) ORDER BY split""".stripMargin
    },
    // the q27 candidates confirmed at the 0.5 integer threshold, rolled
    // up by source pair
    "q208_contamination_matrix" ->
      s"""WITH $minhashCandCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |it AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT it.d1, it.d2
         |  FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter)
         |SELECT s1.source AS src1, s2.source AS src2, count(*) AS n_pairs,
         |  count(DISTINCT conf.d1) AS n_docs_1, count(DISTINCT conf.d2) AS n_docs_2
         |FROM conf
         |JOIN documents s1 ON s1.doc_id = conf.d1
         |JOIN documents s2 ON s2.doc_id = conf.d2
         |GROUP BY 1, 2 ORDER BY src1, src2""".stripMargin,
    // snapshot ⊕ delta partials vs full recompute; exact DECIMAL sums
    // so the audit equality holds without tolerance
    "q209_ivm_merge" ->
      s"""WITH p AS (SELECT o_orderstatus, o_orderpriority,
         |    CASE WHEN o_orderkey % 10 <> 0 THEN 1 ELSE 0 END AS is_snap,
         |    CAST(o_totalprice AS DECIMAL(25,6)) AS tp FROM orders),
         |m AS (SELECT o_orderstatus, o_orderpriority,
         |    CAST(sum(is_snap) AS BIGINT) AS n_snap,
         |    CAST(sum(1 - is_snap) AS BIGINT) AS n_delta,
         |    count(*) AS n_merged, sum(tp) AS tot FROM p GROUP BY 1, 2)
         |SELECT o_orderstatus, o_orderpriority, n_snap, n_delta, n_merged,
         |  ${away("CAST(tot AS DOUBLE)", 2)} AS total_merged,
         |  CAST(1 AS BIGINT) AS ivm_ok
         |FROM m ORDER BY 1, 2""".stripMargin,
    // the 3 merge rounds unrolled as CTE chains (the Lloyd precedent);
    // replace() is left-to-right non-overlapping on both engines
    "q210_bpe_merge_rounds" -> bpeMergeSql,
    // the learned merges applied back to the corpus: per-doc token
    // count + chars-per-token compression via the encoded vocab
    "q238_bpe_encode" -> bpeEncodeSql,
    // bottom-k per set, union re-ranked by hash; 3σ = 3/√128 ≈ 265‰
    "q211_kmv_intersection" -> {
      val h = hx("elem")
      raw"""WITH du AS (SELECT DISTINCT event_type AS et,
         |    CAST(user_id AS VARCHAR) || '@' || strftime(ts, '%Y-%m-%d') AS elem
         |  FROM events WHERE event_type IN ('click', 'view', 'purchase')),
         |hh AS (SELECT et, elem, $h AS h FROM du),
         |km AS (SELECT et, h FROM (SELECT et, h,
         |    row_number() OVER (PARTITION BY et ORDER BY h, elem) AS rn FROM hh) WHERE rn <= 128),
         |prs(et_a, et_b) AS (VALUES ('click', 'view'), ('click', 'purchase'), ('view', 'purchase')),
         |u AS (SELECT et_a, et_b, h,
         |    max(CASE WHEN et = et_a THEN 1 ELSE 0 END) AS ia,
         |    max(CASE WHEN et = et_b THEN 1 ELSE 0 END) AS ib
         |  FROM prs JOIN km ON km.et IN (et_a, et_b) GROUP BY 1, 2, 3),
         |r AS (SELECT *, row_number() OVER (PARTITION BY et_a, et_b ORDER BY h) AS rn FROM u),
         |est AS (SELECT et_a, et_b, CAST(sum(ia * ib) * 1000 // 128 AS BIGINT) AS est_permille
         |  FROM r WHERE rn <= 128 GROUP BY 1, 2),
         |ex AS (SELECT et_a, et_b,
         |    CAST(sum(ia) AS BIGINT) AS n_a, CAST(sum(ib) AS BIGINT) AS n_b,
         |    CAST(sum(ia * ib) * 1000 // count(*) AS BIGINT) AS exact_permille
         |  FROM (SELECT et_a, et_b, elem,
         |      max(CASE WHEN et = et_a THEN 1 ELSE 0 END) AS ia,
         |      max(CASE WHEN et = et_b THEN 1 ELSE 0 END) AS ib
         |    FROM prs JOIN du ON du.et IN (et_a, et_b) GROUP BY 1, 2, 3) GROUP BY 1, 2)
         |SELECT ex.et_a, ex.et_b, n_a, n_b, exact_permille, est_permille,
         |  CAST(CASE WHEN abs(est_permille - exact_permille) <= 265 THEN 1 ELSE 0 END AS BIGINT) AS kmv_ok
         |FROM ex JOIN est USING (et_a, et_b) ORDER BY et_a, et_b""".stripMargin
    },
    // integer linear inference: score = 10·n_tok + 3·stop‰ + 2·div‰
    "q212_quality_classifier" ->
      raw"""WITH d AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |f AS (SELECT source, CAST(len(ws) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS BIGINT) * 1000 AS stop_milli,
         |    CAST(len(list_distinct(ws)) AS BIGINT) * 1000 AS div_milli FROM d),
         |sc AS (SELECT source,
         |    n_tok * 10 + (stop_milli // n_tok) * 3 + (div_milli // n_tok) * 2 AS score FROM f)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN score >= 1700 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
         |  CAST(sum(score) // count(*) AS BIGINT) AS score_avg,
         |  CAST(sum(CASE WHEN score >= 1700 THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS keep_permyriad
         |FROM sc GROUP BY source ORDER BY source""".stripMargin,
    // the v2-state streaming run reduces to the per-user lifetime
    // aggregate; cents via the exact-IEEE floor(v·100 + 0.5) form
    "q213_transform_with_state" -> lifetimeStatsSql,
    // warm-start (batch snapshot + streamed delta) must equal the SAME
    // full aggregate — state bootstrap ≡ recompute, by construction
    "q228_initial_state" -> lifetimeStatsSql,
    // four-chunk maxFilesPerTrigger=1 replay must ALSO equal it —
    // cross-batch state merging ≡ recompute under a real multi-batch
    // layout (the runner require()s ≥4 data batches)
    "q256_multibatch_replay" -> lifetimeStatsSql,
    // rank within nation, neighbors at sort distance 1-2, integer
    // agreement weights (segment 3 + balance 2 + id 1), gate at 4
    "q214_sorted_neighbor_pairs" ->
      """WITH r AS (SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment,
        |    CAST(row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rn
        |  FROM customer),
        |p AS (SELECT a.c_nationkey AS nation, a.c_custkey AS cust_a, b.c_custkey AS cust_b,
        |    (CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 3 ELSE 0 END
        |     + CASE WHEN abs(a.c_acctbal - b.c_acctbal) <= 50.0 THEN 2 ELSE 0 END
        |     + CASE WHEN abs(a.c_custkey - b.c_custkey) <= 100 THEN 1 ELSE 0 END) AS score
        |  FROM r a JOIN r b ON a.c_nationkey = b.c_nationkey AND b.rn - a.rn IN (1, 2))
        |SELECT nation, cust_a, cust_b, CAST(score AS BIGINT) AS score
        |FROM p WHERE score >= 4 ORDER BY nation, cust_a, cust_b""".stripMargin,
    // bigrams once; continuation count = distinct left contexts
    "q215_continuation_counts" ->
      raw"""WITH d AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |bg AS (SELECT ws[i] AS lft, ws[i+1] AS rgt FROM (
         |    SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 2)),
         |sr AS (SELECT rgt AS w, count(DISTINCT lft) AS n_left_distinct, count(*) AS n_as_right
         |  FROM bg GROUP BY rgt),
         |sl AS (SELECT lft AS w, count(DISTINCT rgt) AS n_right_distinct FROM bg GROUP BY lft)
         |SELECT COALESCE(sr.w, sl.w) AS w,
         |  COALESCE(n_left_distinct, 0) AS n_left_distinct,
         |  COALESCE(n_right_distinct, 0) AS n_right_distinct,
         |  COALESCE(n_as_right, 0) AS n_as_right
         |FROM sr FULL JOIN sl ON sr.w = sl.w ORDER BY w""".stripMargin,
    // confirmed near-dup edges (the q208 derivation) → two-hop common
    // neighbors keyed on the middle vertex, direct edges anti-joined
    "q216_link_prediction" ->
      s"""WITH $minhashCandCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |it AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT it.d1, it.d2
         |  FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |e AS (SELECT d1, d2 FROM conf UNION ALL SELECT d2, d1 FROM conf),
         |tw AS (SELECT x.d1 AS a, y.d2 AS c, count(DISTINCT x.d2) AS n_common
         |  FROM e x JOIN e y ON x.d2 = y.d1 AND x.d1 < y.d2 GROUP BY 1, 2)
         |SELECT a, c, n_common,
         |  CAST(CASE WHEN EXISTS (SELECT 1 FROM conf WHERE conf.d1 = tw.a AND conf.d2 = tw.c)
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_edge
         |FROM tw ORDER BY a, c""".stripMargin,
    // shared shingle CTE → df → per-doc dup share in integer permille
    "q217_dup_ngram_fraction" ->
      s"""WITH $ShingleCte,
         |df AS (SELECT g, count(*) AS df FROM sh GROUP BY g),
         |p AS (SELECT doc_id, count(*) AS n_shingles,
         |    CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
         |  FROM sh JOIN df USING (g) GROUP BY doc_id)
         |SELECT doc_id, n_shingles, n_dup, n_dup * 1000 // n_shingles AS dup_permille
         |FROM p ORDER BY doc_id""".stripMargin,
    // power sums in HUGEINT, slope by truncating integer division
    // (both engines truncate toward zero — verified on negatives)
    "q218_grouped_trend" ->
      """WITH d AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(x * y) AS sxy FROM d GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(sy // n AS BIGINT) AS mean_y_cents,
        |  CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT) AS slope_micro_cents
        |FROM s ORDER BY event_type""".stripMargin,
    // hash-parity arms; χ² in the cross-multiplied 2×2 integer form
    "q219_ab_test_report" -> {
      val h = hx("CAST(user_id AS VARCHAR)")
      s"""WITH u0 AS (SELECT user_id, count(*) AS ne,
         |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
         |  FROM events GROUP BY user_id),
         |u AS (SELECT user_id,
         |    CASE WHEN np * 5 >= ne THEN 1 ELSE 0 END AS converted,
         |    $h % 2 AS arm
         |  FROM u0),
         |t AS (SELECT
         |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         |    CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
         |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         |    CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
         |  FROM u)
         |SELECT n_a, n_b,
         |  conv_a * 1000 // n_a AS conv_a_permille,
         |  conv_b * 1000 // n_b AS conv_b_permille,
         |  CAST(((n_a + n_b)
         |      * (conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a))
         |      * (conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a))
         |      * 1000)
         |    // (n_a * n_b * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b)) AS BIGINT) AS chi2_milli,
         |  CAST(CASE WHEN ((n_a + n_b)
         |      * (conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a))
         |      * (conv_a * (n_b - conv_b) - conv_b * (n_a - conv_a))
         |      * 1000)
         |    // (n_a * n_b * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b)) >= 3841
         |    THEN 1 ELSE 0 END AS BIGINT) AS significant
         |FROM t""".stripMargin
    },
    // anti-join per surface; checksums recomputable from the erased copy
    "q220_erasure_audit" -> {
      val h = hx("CAST(user_id AS VARCHAR)")
      s"""WITH del AS (SELECT DISTINCT user_id FROM events WHERE $h % 20 = 0),
         |kept AS (SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM del)),
         |ev AS (SELECT 'events' AS surface, (SELECT count(*) FROM events) AS rows_before,
         |    count(*) AS rows_after, CAST(sum(event_id) AS BIGINT) AS checksum_after FROM kept),
         |pu AS (SELECT user_id FROM events GROUP BY user_id),
         |puk AS (SELECT user_id FROM pu WHERE user_id NOT IN (SELECT user_id FROM del)),
         |up AS (SELECT 'user_profiles' AS surface, (SELECT count(*) FROM pu) AS rows_before,
         |    count(*) AS rows_after, CAST(sum(user_id) AS BIGINT) AS checksum_after FROM puk)
         |SELECT surface, rows_before, rows_before - rows_after AS rows_deleted,
         |  rows_after, checksum_after
         |FROM (SELECT * FROM ev UNION ALL SELECT * FROM up) ORDER BY surface""".stripMargin
    },
    // the q212 score bucketed at width 200, observed q92 pass rate
    "q221_classifier_calibration" ->
      raw"""WITH d AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws,
         |    len(regexp_replace(trim(text), '\s+', '', 'g')) AS sum_len FROM documents),
         |f AS (SELECT CAST(len(ws) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS BIGINT) * 1000 AS sm,
         |    CAST(len(list_distinct(ws)) AS BIGINT) * 1000 AS dm,
         |    CASE WHEN len(ws) BETWEEN 30 AND 600 AND sum_len >= len(ws) * 3 AND sum_len <= len(ws) * 6
         |      AND len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) * 50 >= len(ws)
         |      AND len(list_distinct(ws)) * 5 >= len(ws) THEN 1 ELSE 0 END AS pass FROM d),
         |sc AS (SELECT n_tok * 10 + (sm // n_tok) * 3 + (dm // n_tok) * 2 AS score, pass FROM f)
         |SELECT score // 200 AS bucket, count(*) AS n, CAST(sum(pass) AS BIGINT) AS n_pass,
         |  CAST(sum(pass) AS BIGINT) * 1000 // count(*) AS pass_permille
         |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    // upper-triangle power sums; float×float exact in double, decimal
    // cast per the q102 convention; covariance assembled in fixed-order
    // double ops
    "q222_embedding_covariance" -> covarianceSql,
    // fixed-order cyclic-Jacobi eigensolver unrolled into 1-row CTE
    // chains; projection replayed per embedding
    "q239_pca_projection" -> pcaSql,
    // same Jacobi chain, full ordered basis, 1/sqrt(ev) scaling
    "q242_whitened_embeddings" -> whitenSql,
    // Spark groups/joins on UNICODE_CI_AI collated strings; the oracle
    // pins the identical semantics as explicit lower(strip_accents(…))
    // normalization over the same deterministically-injected variants
    "q240_collated_census" ->
      raw"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |tk AS (SELECT doc_id, i - 1 AS pos, ws[i] AS w FROM (
         |    SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM d)),
         |cs AS (SELECT doc_id, pos, CASE WHEN (doc_id + pos) % 2 = 0 THEN upper(w) ELSE w END AS m FROM tk),
         |ms AS (SELECT CASE WHEN (doc_id + pos) % 5 = 0
         |    THEN translate(m, 'AEIOUaeiou', 'ÁÉÍÓÚáéíóú') ELSE m END AS messy FROM cs),
         |g AS (SELECT lower(strip_accents(messy)) AS w_norm,
         |    count(DISTINCT messy) AS n_variants, count(*) AS n_total
         |  FROM ms GROUP BY 1),
         |kw(kw) AS (VALUES ('SPARK'), ('Tablé'), ('QUERY'), ('agg'))
         |SELECT w_norm, n_variants, n_total,
         |  CAST(CASE WHEN EXISTS (SELECT 1 FROM kw WHERE lower(strip_accents(kw.kw)) = g.w_norm)
         |    THEN 1 ELSE 0 END AS BIGINT) AS is_keyword
         |FROM g ORDER BY w_norm""".stripMargin,
    // q37's islands plus the timer rule: last islands emit iff
    // end + gap < (ms-floored max event time − 1 h delay) — STRICT, as
    // probed empirically (TimerBoundaryProbe: a timer whose expiry lands
    // exactly on the eviction watermark does NOT fire) — the exact
    // watermark replay (q133 discipline)
    "q223_timer_sessions" ->
      """WITH x AS (
        |  SELECT user_id, epoch_ms(ts) AS tms, value, event_id,
        |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) > 43200000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY tms, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM x),
        |s AS (SELECT user_id, grp, min(tms) AS start_ms, max(tms) AS end_ms,
        |        count(*) AS n_events,
        |        CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
        |      FROM g GROUP BY user_id, grp),
        |m AS (SELECT user_id, max(grp) AS maxgrp FROM s GROUP BY user_id),
        |w AS (SELECT max(epoch_ms(ts)) - 3600000 AS wm FROM events)
        |SELECT s.user_id, s.start_ms, s.end_ms, s.n_events, s.sum_value
        |FROM s JOIN m ON s.user_id = m.user_id, w
        |WHERE s.grp < m.maxgrp OR s.end_ms + 43200000 < w.wm
        |ORDER BY s.user_id, s.start_ms""".stripMargin,
    // DuckDB's native LATERAL — same top-3-per-customer contract
    "q224_lateral_topk" ->
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c, LATERAL (
        |  SELECT o_orderkey, o_totalprice
        |  FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey
        |  LIMIT 3
        |) o
        |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,
    // the UDF body inlined — what Catalyst does on the Spark side
    "q225_sql_udf" ->
      raw"""SELECT source, count(*) AS n_docs,
         |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens,
         |  CAST(max(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS max_tokens
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // the MapState run reduces to the plain keyed count
    "q226_mapstate_type_counts" ->
      """SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin,
    // earliest-3 per user by (ms-floored ts, event_id) — the engine
    // compares unix_millis, so the oracle must rank on epoch_ms too
    "q227_liststate_earliest" ->
      """SELECT user_id, CAST(rnk AS INTEGER) AS rnk, event_id, ts_ms FROM (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |    row_number() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS rnk
        |  FROM events) WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin,
    // every number re-derived from the engine's written files. NOTE:
    // like q194, this oracle is sf0.01-only and engine-run-order
    // dependent — the driver's Verify at sf0.01 runs the engine query
    // (which rewrites /tmp/graft_range_layout/sf0.01) before DuckDB
    // reads it back; at any other sf the path would not match the
    // engine's derived `<basename(dir)>` segment.
    "q229_range_layout" ->
      """WITH f AS (SELECT filename AS fn, count(*) AS n,
        |    min(o_orderdate) AS lo, max(o_orderdate) AS hi
        |  FROM read_parquet('/tmp/graft_range_layout/sf0.01/orders/*.parquet', filename=true)
        |  GROUP BY filename),
        |a AS (SELECT *, lead(lo) OVER (ORDER BY lo, fn) AS next_lo FROM f)
        |SELECT count(*) AS n_files, CAST(sum(n) AS BIGINT) AS n_rows,
        |  min(lo) AS span_start, max(hi) AS span_end,
        |  CAST(sum(CASE WHEN next_lo IS NOT NULL AND hi > next_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
        |  CAST(CASE WHEN sum(CASE WHEN next_lo IS NOT NULL AND hi > next_lo THEN 1 ELSE 0 END) = 0
        |    THEN 1 ELSE 0 END AS BIGINT) AS layout_disjoint
        |FROM a""".stripMargin,
    // q91's history CTEs + the interval-containment join; the audit
    // proves the exactly-one property of half-open version intervals
    "q236_point_in_time_join" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR o_orderpriority <> prev THEN 1 ELSE 0 END AS chg FROM o),
        |v AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver FROM f),
        |i AS (SELECT o_custkey, ver, max(o_orderpriority) AS dim_priority,
        |    strftime(min(o_orderdate), '%Y-%m-%d') AS valid_from FROM v GROUP BY o_custkey, ver),
        |hist AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY ver) AS valid_to FROM i),
        |facts AS (SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS d, o_orderpriority, o_orderkey FROM orders),
        |j AS (SELECT facts.o_orderkey, facts.o_orderpriority, hist.dim_priority
        |  FROM facts JOIN hist ON hist.o_custkey = facts.o_custkey
        |    AND facts.d >= hist.valid_from AND (hist.valid_to IS NULL OR facts.d < hist.valid_to)),
        |per AS (SELECT o_orderkey, count(*) AS nm,
        |    max(CASE WHEN o_orderpriority = dim_priority THEN 1 ELSE 0 END) AS pm
        |  FROM j GROUP BY o_orderkey),
        |a AS (SELECT count(*) AS n_facts,
        |    CAST(sum(COALESCE(nm, 0)) AS BIGINT) AS n_matches,
        |    CAST(sum(CASE WHEN COALESCE(nm, 0) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exactly_one,
        |    CAST(sum(COALESCE(pm, 0)) AS BIGINT) AS n_priority_match
        |  FROM facts LEFT JOIN per USING (o_orderkey))
        |SELECT n_facts, n_matches, n_exactly_one, n_priority_match,
        |  CAST(CASE WHEN n_facts = n_exactly_one THEN 1 ELSE 0 END AS BIGINT) AS pit_exact,
        |  n_priority_match * 1000 // n_facts AS priority_match_permille
        |FROM a""".stripMargin,
    // confirmed edges → recursive-CTE min-label fixpoint over paired
    // nodes only → per-cluster member/pair stats; density in the
    // cross-multiplied 2× integral form
    "q235_cluster_quality" ->
      s"""WITH RECURSIVE $minhashCandCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |cdd AS (SELECT DISTINCT d1, d2 FROM cand),
         |it AS (SELECT c.d1, c.d2, count(*) AS inter FROM cdd c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT it.d1, it.d2, inter, x.n_sh AS na, y.n_sh AS nb
         |  FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |sym AS (SELECT d1 AS src, d2 AS dst FROM conf UNION ALL SELECT d2, d1 FROM conf),
         |reach(id, r) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
         |),
         |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |mem AS (SELECT cluster, count(*) AS n_members, min(id) AS keeper FROM lab GROUP BY cluster),
         |pj AS (SELECT conf.d1, inter * 1000 // (na + nb - inter) AS j FROM conf),
         |ps AS (SELECT lab.cluster, count(*) AS n_pairs,
         |    CAST(min(j) AS BIGINT) AS min_j_permille, CAST(max(j) AS BIGINT) AS max_j_permille
         |  FROM pj JOIN lab ON lab.id = pj.d1 GROUP BY 1)
         |SELECT mem.cluster, n_members, keeper, n_pairs, min_j_permille, max_j_permille,
         |  n_pairs * 2 * 10000 // (n_members * (n_members - 1)) AS density_permyriad
         |FROM mem JOIN ps ON ps.cluster = mem.cluster ORDER BY mem.cluster""".stripMargin,
    // cross-multiplied integer KS over the merged value support
    "q233_ks_drift" ->
      raw"""WITH d AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS v,
         |    CASE WHEN CAST(substr(source, 4) AS INTEGER) < 10 THEN 1 ELSE 0 END AS g0 FROM documents),
         |n AS (SELECT CAST(sum(g0) AS BIGINT) AS n0, CAST(sum(1 - g0) AS BIGINT) AS n1 FROM d),
         |h AS (SELECT v, CAST(sum(g0) AS BIGINT) AS c0, CAST(sum(1 - g0) AS BIGINT) AS c1
         |  FROM d GROUP BY v),
         |c AS (SELECT v, sum(c0) OVER (ORDER BY v) AS f0, sum(c1) OVER (ORDER BY v) AS f1 FROM h)
         |SELECT n0, n1, count(*) AS n_support,
         |  CAST(max(abs(f0 * n1 - f1 * n0)) * 1000 // (n0 * n1) AS BIGINT) AS ks_permille
         |FROM c, n GROUP BY n0, n1""".stripMargin,
    // the brute rung + label joins; first same-label rank per query
    "q234_retrieval_mrr" ->
      s"""WITH b AS ($annBruteSql),
         |t AS (SELECT b.qid, b.nid, b.rnk, ql.label AS qlabel, nl.label AS nlabel
         |  FROM b JOIN embeddings ql ON ql.vec_id = b.qid
         |  JOIN embeddings nl ON nl.vec_id = b.nid),
         |fh AS (SELECT qid, qlabel, min(rnk) AS first_rank FROM t
         |  WHERE qlabel = nlabel GROUP BY 1, 2),
         |pq AS (SELECT DISTINCT t.qid, t.qlabel, fh.first_rank,
         |    COALESCE(1000 // fh.first_rank, 0) AS rr_permille
         |  FROM t LEFT JOIN fh ON fh.qid = t.qid)
         |SELECT qlabel, count(*) AS n_queries,
         |  CAST(sum(CASE WHEN first_rank IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  CAST(sum(rr_permille) // count(*) AS BIGINT) AS mrr_permille
         |FROM pq GROUP BY qlabel ORDER BY qlabel""".stripMargin,
    // the pipe form lowers to this exact aggregate
    "q231_pipe_syntax" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // the variable folds to its literal
    "q232_session_variables" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders WHERE o_totalprice >= 200000.0
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // footer-exact global aggregates
    "q230_agg_pushdown" ->
      """SELECT count(*) AS n_rows, min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust FROM orders""".stripMargin,
    // KN bigram LM with d = 3/4 → rational probabilities; log-probs as
    // mn(num) − mn(den) with mn = floor(ln·1e6 + 0.5) over INTEGERS
    // only, so per-doc sums are exact BIGINTs on both engines
    "q237_perplexity_filter" ->
      s"""WITH $perplexityCtes
         |SELECT doc_id, n_bigrams, mean_logp_micro,
         |  (0 - mean_logp_micro) // 500000 AS ppl_bucket_halfnat,
         |  CAST(CASE WHEN mean_logp_micro >= -3400000 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM q ORDER BY doc_id""".stripMargin,
    // ES priorities from the hash-derived uniform in exact micro-nats;
    // k smallest per stratum
    "q270_weighted_sample" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val h = hx("CAST(doc_id AS VARCHAR)")
      s"""WITH p AS (SELECT doc_id, source, n_chars,
         |    (${mn("1000001")} - ${mn(s"$h % 1000000 + 1")}) * 1000 AS neg_ln_u_nano
         |  FROM documents),
         |r AS (SELECT *, neg_ln_u_nano // greatest(n_chars, 1) AS priority_nano FROM p),
         |k AS (SELECT source, doc_id, n_chars, priority_nano,
         |    row_number() OVER (PARTITION BY source ORDER BY priority_nano, doc_id) AS rn FROM r)
         |SELECT source, CAST(rn AS INTEGER) AS rn, doc_id, n_chars, priority_nano
         |FROM k WHERE rn <= 5 ORDER BY source, rn""".stripMargin
    },
    // incremental I/U/D apply vs the declarative CASE spec of the same
    // final state; per-status counts and cent checksums must agree
    "q269_cdc_apply" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |snap AS (SELECT * FROM o WHERE k % 10 <> 0),
        |ins AS (SELECT * FROM o WHERE k % 10 = 0),
        |upd AS (SELECT k, cents + 100000 AS new_cents FROM snap WHERE k % 7 = 0),
        |del AS (SELECT k FROM snap WHERE k % 13 = 0 AND k % 7 <> 0),
        |ap AS (SELECT s.k, s.st, COALESCE(u.new_cents, s.cents) AS cents
        |  FROM snap s LEFT JOIN upd u ON u.k = s.k
        |  WHERE s.k NOT IN (SELECT k FROM del)
        |  UNION ALL SELECT k, st, cents FROM ins),
        |dr AS (SELECT k, st,
        |    CASE WHEN k % 10 <> 0 AND k % 7 = 0 THEN cents + 100000 ELSE cents END AS cents
        |  FROM o WHERE NOT (k % 10 <> 0 AND k % 13 = 0 AND k % 7 <> 0)),
        |aa AS (SELECT st, count(*) AS n_after, CAST(sum(cents) AS BIGINT) AS ck_after FROM ap GROUP BY st),
        |da AS (SELECT st, count(*) AS n_direct, CAST(sum(cents) AS BIGINT) AS ck_direct FROM dr GROUP BY st),
        |du AS (SELECT s.st, count(*) AS n_updated FROM upd JOIN snap s ON s.k = upd.k GROUP BY s.st),
        |dd AS (SELECT s.st, count(*) AS n_deleted FROM del JOIN snap s ON s.k = del.k GROUP BY s.st)
        |SELECT aa.st AS o_orderstatus, n_after,
        |  COALESCE(n_updated, 0) AS n_updated, COALESCE(n_deleted, 0) AS n_deleted,
        |  CAST(CASE WHEN n_after = n_direct AND ck_after = ck_direct THEN 1 ELSE 0 END AS BIGINT) AS cdc_ok
        |FROM aa JOIN da ON da.st = aa.st
        |LEFT JOIN du ON du.st = aa.st LEFT JOIN dd ON dd.st = aa.st
        |ORDER BY o_orderstatus""".stripMargin,
    // apriori-pruned pair generation over frequent-item baskets;
    // support/confidence/lift in cross-multiplied integers
    "q268_frequent_pairs" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |no AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
        |fi AS (SELECT pk, count(*) AS cnt FROM b GROUP BY pk HAVING count(*) >= 3),
        |fb AS (SELECT b.ok, b.pk, fi.cnt FROM b JOIN fi USING (pk)),
        |pr AS (SELECT a.pk AS p1, c.pk AS p2, count(*) AS nb, max(a.cnt) AS c1, max(c.cnt) AS c2
        |  FROM fb a JOIN fb c ON a.ok = c.ok AND a.pk < c.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT p1, p2, CAST(nb AS BIGINT) AS n_both,
        |  CAST(c1 AS BIGINT) AS n_p1, CAST(c2 AS BIGINT) AS n_p2,
        |  CAST(nb AS BIGINT) * 1000 // c1 AS conf_p1_to_p2_permille,
        |  CAST(CAST(nb AS HUGEINT) * n_orders * 1000 // (c1 * c2) AS BIGINT) AS lift_permille
        |FROM pr, no ORDER BY p1, p2""".stripMargin,
    // exact integer quintiles per RFM dimension over the customer
    // aggregate; 125-segment census
    "q267_rfm_segments" ->
      """WITH pc AS (SELECT o_custkey, max(o_orderdate) AS last_day, count(*) AS freq,
        |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |an AS (SELECT max(o_orderdate) AS anchor, count(DISTINCT o_custkey) AS n FROM orders),
        |rk AS (SELECT o_custkey, cents,
        |    CAST(date_diff('day', last_day, anchor) AS BIGINT) AS rec_days, n,
        |    row_number() OVER (ORDER BY date_diff('day', last_day, anchor), o_custkey) AS r_rn,
        |    row_number() OVER (ORDER BY freq DESC, o_custkey) AS f_rn,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS m_rn
        |  FROM pc, an),
        |q5 AS (SELECT o_custkey, cents,
        |    (r_rn - 1) * 5 // n + 1 AS r_q, (f_rn - 1) * 5 // n + 1 AS f_q, (m_rn - 1) * 5 // n + 1 AS m_q
        |  FROM rk)
        |SELECT r_q, f_q, m_q, count(*) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) // count(*) AS avg_cents
        |FROM q5 GROUP BY 1, 2, 3 ORDER BY r_q, f_q, m_q""".stripMargin,
    // exact md5 keeper, then the confirmed-pairs greedy drop among
    // exact survivors; retention rolled up by source
    "q266_dedup_retention" ->
      s"""WITH $minhashCandCtes,
         |szx AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |itx AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT itx.d1, itx.d2
         |  FROM itx JOIN szx x ON itx.d1 = x.doc_id JOIN szx y ON itx.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |ex AS (SELECT doc_id, source,
         |    CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS exact_drop
         |  FROM documents),
         |sv AS (SELECT doc_id FROM ex WHERE exact_drop = 0),
         |nd AS (SELECT DISTINCT conf.d2 AS doc_id FROM conf
         |  JOIN sv a ON a.doc_id = conf.d1 JOIN sv b ON b.doc_id = conf.d2)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(exact_drop) AS BIGINT) AS n_exact_dropped,
         |  CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup_dropped,
         |  count(*) - CAST(sum(exact_drop) AS BIGINT)
         |    - CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  (count(*) - CAST(sum(exact_drop) AS BIGINT)
         |    - CAST(sum(CASE WHEN nd.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)) * 1000 // count(*) AS keep_permille
         |FROM ex LEFT JOIN nd ON nd.doc_id = ex.doc_id
         |GROUP BY source ORDER BY source""".stripMargin,
    // Lloyd chain trained on the old half only; every vector assigned
    // against the frozen c2; per-cell old/new census
    "q265_ivf_maintenance" -> {
      import IvfSqlBits.score
      s"""WITH ${IvfSqlBits.lloydCtesFor("vid % 10 <> 0")},
         |sx AS (SELECT v.vid, c.j, ${score("v", "c")} AS s FROM v, c2 c),
         |asg AS (SELECT vid, j AS cell FROM (
         |    SELECT vid, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sx)
         |  WHERE rn = 1)
         |SELECT cell, CAST(sum(CASE WHEN vid % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         |  CAST(sum(CASE WHEN vid % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
         |  CAST(sum(CASE WHEN vid % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) * 1000 // count(*) AS new_share_permille
         |FROM asg GROUP BY cell ORDER BY cell""".stripMargin
    },
    // the brute and IVF k=10 mirrors joined on (qid, nid); tail-sum
    // coefficients shared with the engine as integer nanos
    "q264_rank_rbo" -> {
      val tails = graft.functions.NumOps.rboTailNanos(10, 0.9)
      val cases = (1 to 10).map(m => s"WHEN greatest(i.rnk, b.rnk) = $m THEN ${tails(m - 1)}").mkString(" ")
      s"""WITH b AS ($annBruteSql),
         |i AS (${annIvfSqlFor(nprobe = 4, k = 10)}),
         |j AS (SELECT b.qid, i.rnk AS ra, b.rnk AS rb,
         |    CASE WHEN i.rnk IS NULL THEN 0 $cases END AS c
         |  FROM b LEFT JOIN i ON i.qid = b.qid AND i.nid = b.nid)
         |SELECT qid, count(ra) AS n_common, CAST(sum(c) AS BIGINT) AS rbo_nanos
         |FROM j GROUP BY qid ORDER BY qid""".stripMargin
    },
    // first-occurrence buckets over doc-rank fifths; right join keeps
    // zero-new-type buckets
    "q263_vocab_growth" ->
      raw"""WITH rk AS (SELECT source, doc_id,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         |    count(*) OVER (PARTITION BY source) AS nd
         |  FROM documents),
         |bk AS (SELECT source, doc_id, (rn - 1) * 5 // nd AS bucket FROM rk),
         |fo AS (SELECT source, w, min(doc_id) AS doc_id FROM (
         |    SELECT source, doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
         |  GROUP BY source, w),
         |nt AS (SELECT bk.source, bk.bucket, count(*) AS n_new_types
         |  FROM fo JOIN bk ON bk.source = fo.source AND bk.doc_id = fo.doc_id
         |  GROUP BY 1, 2),
         |dd AS (SELECT source, bucket, count(*) AS n_docs FROM bk GROUP BY 1, 2),
         |j AS (SELECT dd.source, dd.bucket, dd.n_docs, COALESCE(nt.n_new_types, 0) AS n_new_types
         |  FROM dd LEFT JOIN nt ON nt.source = dd.source AND nt.bucket = dd.bucket)
         |SELECT source, bucket, n_docs, n_new_types,
         |  CAST(sum(n_new_types) OVER (PARTITION BY source ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_types
         |FROM j ORDER BY source, bucket""".stripMargin,
    // the q212 score ranked into exact integer deciles; cumulative
    // lift in the cross-multiplied form
    "q262_classifier_gains" ->
      raw"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
         |    len(regexp_replace(trim(text), '\s+', '', 'g')) AS sum_len FROM documents),
         |f AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS BIGINT) * 1000 AS sm,
         |    CAST(len(list_distinct(ws)) AS BIGINT) * 1000 AS dm,
         |    CASE WHEN len(ws) BETWEEN 30 AND 600 AND sum_len >= len(ws) * 3 AND sum_len <= len(ws) * 6
         |      AND len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) * 50 >= len(ws)
         |      AND len(list_distinct(ws)) * 5 >= len(ws) THEN 1 ELSE 0 END AS pass FROM d),
         |sc AS (SELECT doc_id, n_tok * 10 + (sm // n_tok) * 3 + (dm // n_tok) * 2 AS score, pass FROM f),
         |rk AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk,
         |    (SELECT count(*) FROM sc) AS n_total, CAST((SELECT sum(pass) FROM sc) AS BIGINT) AS total_pass
         |  FROM sc),
         |dc AS (SELECT (rnk - 1) * 10 // n_total AS decile, count(*) AS n_docs,
         |    CAST(sum(pass) AS BIGINT) AS n_pass, max(n_total) AS n_total, max(total_pass) AS total_pass
         |  FROM rk GROUP BY 1),
         |cm AS (SELECT *, sum(n_docs) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         |    sum(n_pass) OVER (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pass
         |  FROM dc)
         |SELECT decile, n_docs, n_pass,
         |  n_pass * 1000 // n_docs AS pass_permille,
         |  CAST(cum_pass * n_total * 1000 // (cum_n * total_pass) AS BIGINT) AS cum_lift_permille
         |FROM cm ORDER BY decile""".stripMargin,
    // distinct (source, word) sets; word-keyed pair join, exact
    // Jaccard/containment in permille
    "q261_source_vocab_overlap" ->
      raw"""WITH sv AS (SELECT DISTINCT source, w FROM (
         |    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)),
         |sz AS (SELECT source, count(*) AS n FROM sv GROUP BY source),
         |pr AS (SELECT a.source AS src1, b.source AS src2, count(*) AS n_shared
         |  FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source GROUP BY 1, 2)
         |SELECT src1, src2, x.n AS n1, y.n AS n2, n_shared,
         |  n_shared * 1000 // (x.n + y.n - n_shared) AS jaccard_permille,
         |  n_shared * 1000 // least(x.n, y.n) AS containment_permille
         |FROM pr JOIN sz x ON x.source = pr.src1 JOIN sz y ON y.source = pr.src2
         |ORDER BY src1, src2""".stripMargin,
    // train-split KN tables + Laplace continuation floor; three-branch
    // scoring (seen bigram / seen context / unseen context), all
    // integer micro-nats
    "q260_heldout_perplexity" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val h = hx("CAST(doc_id AS VARCHAR)")
      raw"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
         |    ($h % 10 = 0) AS is_test FROM documents),
         |bg AS (SELECT doc_id, is_test, ws[i] AS lft, ws[i+1] AS rgt FROM (
         |    SELECT doc_id, is_test, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |    FROM d WHERE len(ws) >= 2)),
         |cnt AS (SELECT lft, rgt, count(*) AS c FROM bg WHERE NOT is_test GROUP BY 1, 2),
         |lc AS (SELECT lft, CAST(sum(c) AS BIGINT) AS cl, count(*) AS n1p FROM cnt GROUP BY lft),
         |rc AS (SELECT rgt, count(*) AS nleft FROM cnt GROUP BY rgt),
         |ct AS (SELECT (SELECT count(*) FROM cnt) + (SELECT count(*) FROM rc) + 1 AS denc),
         |sc AS (SELECT bg.doc_id, cnt.c, lc.cl, lc.n1p,
         |    COALESCE(rc.nleft, 0) + 1 AS numc, ct.denc
         |  FROM bg LEFT JOIN cnt ON cnt.lft = bg.lft AND cnt.rgt = bg.rgt
         |  LEFT JOIN lc ON lc.lft = bg.lft
         |  LEFT JOIN rc ON rc.rgt = bg.rgt, ct
         |  WHERE bg.is_test),
         |lp AS (SELECT doc_id,
         |    CASE WHEN c IS NOT NULL THEN
         |        ${mn("(c * 4 - 3) * denc + n1p * numc * 3")} - ${mn("cl * denc * 4")}
         |      WHEN cl IS NOT NULL THEN
         |        ${mn("n1p * numc * 3")} - ${mn("cl * denc * 4")}
         |      ELSE ${mn("numc")} - ${mn("denc")} END AS lp_micro,
         |    CASE WHEN c IS NULL AND cl IS NOT NULL THEN 1 ELSE 0 END AS ub,
         |    CASE WHEN cl IS NULL THEN 1 ELSE 0 END AS uc
         |  FROM sc),
         |p AS (SELECT doc_id, count(*) AS n_bigrams,
         |    CAST(sum(ub) AS BIGINT) AS n_unseen_bigrams,
         |    CAST(sum(uc) AS BIGINT) AS n_unseen_contexts,
         |    CAST(sum(lp_micro) AS BIGINT) AS sum_lp
         |  FROM lp GROUP BY doc_id),
         |q2 AS (SELECT doc_id, n_bigrams, n_unseen_bigrams, n_unseen_contexts,
         |    sum_lp // n_bigrams AS mean_logp_micro FROM p)
         |SELECT doc_id, n_bigrams, n_unseen_bigrams, n_unseen_contexts, mean_logp_micro,
         |  (0 - mean_logp_micro) // 500000 AS ppl_bucket_halfnat
         |FROM q2 ORDER BY doc_id""".stripMargin
    },
    // the q237 chain + a renamed q257 chain + q92's predicates + the
    // md5 keeper, staged left-to-right; counts unpivot to 4 rows
    "q259_curation_funnel_v2" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      raw"""WITH $perplexityCtes,
         |qf AS (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS qws,
         |    len(regexp_replace(trim(text), '\s+', '', 'g')) AS qsl FROM documents),
         |fl AS (SELECT doc_id, text, CASE WHEN len(qws) BETWEEN 30 AND 600
         |    AND qsl >= len(qws) * 3 AND qsl <= len(qws) * 6
         |    AND len(list_filter(qws, x -> list_contains(['the','a','and','is','of'], x))) * 50 >= len(qws)
         |    AND len(list_distinct(qws)) * 5 >= len(qws) THEN 1 ELSE 0 END AS ok_rules FROM qf),
         |pk AS (SELECT doc_id, CASE WHEN mean_logp_micro >= -3400000 THEN 1 ELSE 0 END AS ok_ppl FROM q),
         |ktk AS (SELECT doc_id, unnest(ws) AS w FROM d),
         |kcw AS (SELECT w, count(*) AS cw FROM ktk GROUP BY w),
         |ktt AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM kcw),
         |kdc AS (SELECT doc_id, w, count(*) AS c FROM ktk GROUP BY 1, 2),
         |kp AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * (${mn("c")} - ${mn("cw")})) AS BIGINT) AS part
         |  FROM kdc JOIN kcw USING (w) GROUP BY doc_id),
         |kk AS (SELECT doc_id, CASE WHEN part // n_tokens + ${mn("nn")} - ${mn("n_tokens")} <= 500000
         |    THEN 1 ELSE 0 END AS ok_kl FROM kp, ktt),
         |jn AS (SELECT fl.doc_id, fl.text, fl.ok_rules,
         |    CASE WHEN fl.ok_rules = 1 AND COALESCE(pk.ok_ppl, 0) = 1 THEN 1 ELSE 0 END AS s2,
         |    CASE WHEN fl.ok_rules = 1 AND COALESCE(pk.ok_ppl, 0) = 1 AND COALESCE(kk.ok_kl, 0) = 1
         |      THEN 1 ELSE 0 END AS s3
         |  FROM fl LEFT JOIN pk ON pk.doc_id = fl.doc_id LEFT JOIN kk ON kk.doc_id = fl.doc_id),
         |kpx AS (SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM jn WHERE s3 = 1),
         |ag AS (SELECT (SELECT count(*) FROM jn) AS n0,
         |    CAST((SELECT sum(ok_rules) FROM jn) AS BIGINT) AS n1,
         |    CAST((SELECT sum(s2) FROM jn) AS BIGINT) AS n2,
         |    CAST((SELECT sum(s3) FROM jn) AS BIGINT) AS n3,
         |    CAST((SELECT count(*) FROM kpx WHERE rn = 1) AS BIGINT) AS n4)
         |SELECT stage, n_in, n_out, n_in - n_out AS n_dropped FROM (
         |  SELECT 'rules' AS stage, n0 AS n_in, n1 AS n_out FROM ag
         |  UNION ALL SELECT 'perplexity', n1, n2 FROM ag
         |  UNION ALL SELECT 'typicality', n2, n3 FROM ag
         |  UNION ALL SELECT 'exact_dedup', n3, n4 FROM ag)
         |ORDER BY stage""".stripMargin
    },
    // per-event gap extends the running max end; islands break on
    // STRICTLY greater (probed: ts == prev_end merges)
    "q258_dynamic_gap_sessions" ->
      """WITH x AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CASE WHEN event_type = 'purchase' THEN 86400000000 ELSE 43200000000 END AS gap_us,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
        |  FROM events),
        |o AS (SELECT *, max(us + gap_us) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM x),
        |b AS (SELECT *, CASE WHEN prev_end IS NULL OR us > prev_end THEN 1 ELSE 0 END AS brk FROM o),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM b)
        |SELECT user_id, min(us) // 1000 AS start_ms, max(us + gap_us) // 1000 AS end_ms,
        |  count(*) AS n_events, CAST(sum(isp) AS BIGINT) AS n_purchase
        |FROM g GROUP BY user_id, grp ORDER BY user_id, start_ms""".stripMargin,
    // KL(doc ‖ corpus) in the integer micro-nat algebra — ln of
    // integer counts only
    "q257_doc_typicality" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      raw"""WITH tk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
         |cw AS (SELECT w, count(*) AS cw FROM tk GROUP BY w),
         |tt AS (SELECT CAST(sum(cw) AS BIGINT) AS nn FROM cw),
         |dc AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2),
         |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |    CAST(sum(c * (${mn("c")} - ${mn("cw")})) AS BIGINT) AS part
         |  FROM dc JOIN cw USING (w) GROUP BY doc_id)
         |SELECT doc_id, n_tokens,
         |  part // n_tokens + ${mn("nn")} - ${mn("n_tokens")} AS kl_micro,
         |  CAST(CASE WHEN part // n_tokens + ${mn("nn")} - ${mn("n_tokens")} <= 500000
         |    THEN 1 ELSE 0 END AS BIGINT) AS typical
         |FROM p, tt ORDER BY doc_id""".stripMargin
    },
    // the shared Lloyd chain → per-vector best/second-best cell scores
    // → squared-distance separation ratios in integer permille
    "q255_cluster_separation" -> {
      import IvfSqlBits.score
      s"""WITH ${IvfSqlBits.lloydCtes},
         |sx AS (SELECT v.vid, v.e, c.j, ${score("v", "c")} AS s FROM v, c2 c),
         |rk AS (SELECT vid, e, j, s, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sx),
         |b1 AS (SELECT vid, e, j AS cell, s AS s1 FROM rk WHERE rn = 1),
         |b2 AS (SELECT vid, s AS s2 FROM rk WHERE rn = 2),
         |d AS (SELECT b1.vid, b1.cell,
         |    list_sum(list_transform(b1.e, x -> x * x)) - 2 * b1.s1 AS d2own,
         |    list_sum(list_transform(b1.e, x -> x * x)) - 2 * b2.s2 AS d2next
         |  FROM b1 JOIN b2 ON b2.vid = b1.vid),
         |p AS (SELECT vid, cell, CASE WHEN d2own <= 0 THEN 100000
         |    ELSE least(CAST(floor(d2next * 1000 / d2own) AS BIGINT), 100000) END AS sep
         |  FROM d)
         |SELECT cell, count(*) AS n_members,
         |  CAST(min(sep) AS BIGINT) AS min_sep_permille,
         |  CAST(sum(sep) AS BIGINT) // count(*) AS avg_sep_permille
         |FROM p GROUP BY cell ORDER BY cell""".stripMargin
    },
    // GROUP BY ALL is the same sugar in DuckDB — spelled explicitly so
    // the oracle doesn't depend on the sugar resolving identically
    "q252_group_by_all" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    // DuckDB resolves lateral aliases natively; same all-BIGINT chain
    "q253_lateral_aliases" ->
      """SELECT l_returnflag,
        |  count(*) AS n_items,
        |  CAST(floor(sum(CAST(l_extendedprice AS DECIMAL(25,6)) * (1 - CAST(l_discount AS DECIMAL(25,6)))) * 100) AS BIGINT) AS revenue_cents,
        |  revenue_cents * 25 // 100 AS est_cost_cents,
        |  revenue_cents - est_cost_cents AS margin_cents,
        |  margin_cents // n_items AS margin_per_item_cents
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    // the resolved form of the parameterized query — binding ≡ literal
    "q254_parameterized_sql" ->
      """SELECT o_orderpriority, count(*) AS n_orders, min(o_orderdate) AS first_day
        |FROM orders
        |WHERE o_totalprice >= 150000.0 AND o_orderdate < DATE '1997-01-01'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // H = ln N − (Σ c·ln c)/N in q237 micro-nats — ln of integers only
    "q251_entropy_report" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      raw"""WITH d AS (SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |u AS (SELECT source, w, count(*) AS c FROM (
         |    SELECT source, unnest(ws) AS w FROM d) GROUP BY 1, 2),
         |ua AS (SELECT source, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_types,
         |    CAST(sum(c * ${mn("c")}) AS BIGINT) AS smc FROM u GROUP BY source),
         |ue AS (SELECT source, n AS n_tokens, n_types AS n_vocab,
         |    ${mn("n")} - smc // n AS h_unigram_micro FROM ua),
         |b AS (SELECT source, w, count(*) AS c FROM (
         |    SELECT source, ws[i] || ' ' || ws[i + 1] AS w FROM (
         |      SELECT source, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 2))
         |  GROUP BY 1, 2),
         |ba AS (SELECT source, CAST(sum(c) AS BIGINT) AS n, count(*) AS n_types,
         |    CAST(sum(c * ${mn("c")}) AS BIGINT) AS smc FROM b GROUP BY source),
         |be AS (SELECT source, n_types AS n_bigram_types, ${mn("n")} - smc // n AS h_bigram_micro FROM ba)
         |SELECT ue.source, n_tokens, n_vocab, h_unigram_micro, n_bigram_types, h_bigram_micro,
         |  h_bigram_micro - h_unigram_micro AS h_cond_micro
         |FROM ue JOIN be ON be.source = ue.source ORDER BY ue.source""".stripMargin
    },
    // sorted-rank Gini identity over per-user counts, all integers
    "q250_skew_report" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, cnt,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cnt, user_id) AS rn FROM c),
        |a AS (SELECT event_type, count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total,
        |    CAST(max(cnt) AS BIGINT) AS max_cnt, CAST(sum(rn * cnt) AS BIGINT) AS sic
        |  FROM r GROUP BY event_type)
        |SELECT event_type, n_keys, total,
        |  CAST(CAST(2 * sic - (n_keys + 1) * total AS HUGEINT) * 10000 // (n_keys * total) AS BIGINT) AS gini_permyriad,
        |  max_cnt * 1000 // total AS top_share_permille,
        |  CAST(CAST(max_cnt AS HUGEINT) * n_keys * 1000 // total AS BIGINT) AS hot_key_factor_permille
        |FROM a ORDER BY event_type""".stripMargin,
    // simhash pigeonhole candidates scored against the minhash-banded,
    // Jaccard-confirmed truth set; one-row completeness/reduction report
    "q249_blocking_quality" ->
      s"""WITH $minhashCandCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |it AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT it.d1, it.d2
         |  FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |ssig AS (SELECT doc_id, simhash FROM ($simhashSql)),
         |sblk AS MATERIALIZED (SELECT doc_id, simhash, bi, (simhash >> (bi * 8)) & 255 AS bv
         |  FROM ssig, (SELECT unnest(generate_series(0, 3)) AS bi)),
         |scand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM sblk a JOIN sblk b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |nt AS (SELECT count(*) AS n_truth FROM conf),
         |nc AS (SELECT count(*) AS n_candidates FROM scand),
         |fd AS (SELECT count(*) AS n_found FROM conf JOIN scand ON scand.d1 = conf.d1 AND scand.d2 = conf.d2)
         |SELECT n_docs, n_docs * (n_docs - 1) // 2 AS n_possible_pairs,
         |  n_candidates, n_truth, n_found,
         |  n_found * 1000 // n_truth AS completeness_permille,
         |  (n_docs * (n_docs - 1) // 2 - n_candidates) * 10000 // (n_docs * (n_docs - 1) // 2) AS reduction_permyriad
         |FROM nd, nt, nc, fd""".stripMargin,
    // MP4 mirror: parameters the builder derives from content length
    // (mp4Params/dims), container overhead 144 + 100·tracks bytes —
    // the box walk must read all of it back out of the bytes
    "q248_multimodal_video" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |p AS (SELECT doc_id, n,
        |    CASE CAST(n % 4 AS INTEGER) WHEN 0 THEN 600 WHEN 1 THEN 1000
        |      WHEN 2 THEN 48000 ELSE 90000 END AS ts,
        |    CAST(1 + n % 3 AS INTEGER) AS tracks FROM m),
        |q AS (SELECT doc_id, n, ts, tracks,
        |    ts + CAST((CAST(n AS BIGINT) * 3) % 100000 AS INTEGER) AS dur FROM p)
        |SELECT doc_id,
        |  CAST(144 + 100 * tracks + n AS INTEGER) AS n_bytes,
        |  CAST(3 AS INTEGER) AS n_top_boxes,
        |  tracks AS n_tracks,
        |  CAST(ts AS INTEGER) AS timescale,
        |  CAST(CAST(dur AS BIGINT) * 1000 // ts AS BIGINT) AS duration_ms,
        |  CAST(64 + n % 577 AS INTEGER) AS width,
        |  CAST(64 + (n * 31) % 417 AS INTEGER) AS height
        |FROM q ORDER BY doc_id""".stripMargin,
    // fixed-grid histogram sketch: per-bucket counts, cumulative probe
    // at ceil-rank targets, exact order statistic as the audit, partial
    // merge closure across orderstatus
    "q247_quantile_sketch" ->
      """WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey, o_orderstatus FROM orders),
        |pa AS (SELECT o_orderstatus, cents // 65536 AS bucket, count(*) AS cnt FROM c GROUP BY 1, 2),
        |mg AS (SELECT bucket, CAST(sum(cnt) AS BIGINT) AS n FROM pa GROUP BY bucket),
        |dr AS (SELECT cents // 65536 AS bucket, count(*) AS n_direct FROM c GROUP BY 1),
        |mok AS (SELECT CAST(min(CASE WHEN COALESCE(n, -1) = COALESCE(n_direct, -2) THEN 1 ELSE 0 END) AS BIGINT) AS merge_ok
        |  FROM mg FULL JOIN dr USING (bucket)),
        |cm AS (SELECT bucket, n,
        |    sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM mg),
        |cb AS (SELECT bucket, cum, cum - n AS cum_before FROM cm),
        |tt AS (SELECT count(*) AS n_total FROM c),
        |qs AS (SELECT q_permille, n_total, (n_total * q_permille + 999) // 1000 AS k
        |  FROM (VALUES (10), (250), (500), (750), (950), (990)) AS v(q_permille), tt),
        |es AS (SELECT q_permille, n_total, k, bucket * 65536 + 65535 AS est_cents
        |  FROM qs JOIN cb ON cb.cum >= qs.k AND cb.cum_before < qs.k),
        |rk AS (SELECT cents, row_number() OVER (ORDER BY cents, o_orderkey) AS rn FROM c)
        |SELECT CAST(q_permille AS BIGINT) AS q_permille, n_total, est_cents,
        |  rk.cents AS exact_cents, est_cents - rk.cents AS err_cents,
        |  CAST(CASE WHEN est_cents >= rk.cents AND est_cents - rk.cents < 65536 THEN 1 ELSE 0 END AS BIGINT) AS within_grid,
        |  merge_ok
        |FROM es JOIN rk ON rk.rn = es.k, mok
        |ORDER BY q_permille""".stripMargin,
    // truncated top-25 train vocab (truncation is what creates OOV);
    // per-source token/type OOV rates in integer permille
    "q245_oov_report" ->
      raw"""WITH tk AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
         |tv AS (SELECT w FROM (
         |    SELECT w, row_number() OVER (ORDER BY count(*) DESC, w) AS rnk
         |    FROM tk WHERE CAST(substr(source, 4) AS INTEGER) < 10 GROUP BY w)
         |  WHERE rnk <= 25),
         |j AS (SELECT tk.source, tk.w, (tv.w IS NOT NULL) AS inv FROM tk LEFT JOIN tv ON tv.w = tk.w)
         |SELECT source, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
         |  count(DISTINCT w) AS n_types,
         |  count(DISTINCT CASE WHEN NOT inv THEN w END) AS n_oov_types,
         |  CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT) * 1000 // count(*) AS oov_permille
         |FROM j GROUP BY source ORDER BY source""".stripMargin,
    // test prints semi-joined against the distinct train-print set —
    // the winnowing guarantee turned into a leakage exposure share
    "q246_memorization_probe" -> {
      val h = hx("CAST(doc_id AS VARCHAR)")
      s"""WITH $winnowFpsCtes,
         |tg AS (SELECT doc_id, fp, ($h % 10 = 0) AS is_test FROM fps),
         |tr AS (SELECT DISTINCT fp FROM tg WHERE NOT is_test),
         |p AS (SELECT t.doc_id, count(*) AS n_prints,
         |    CAST(sum(CASE WHEN tr.fp IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
         |  FROM tg t LEFT JOIN tr ON tr.fp = t.fp WHERE t.is_test GROUP BY 1)
         |SELECT doc_id, n_prints, n_shared, n_shared * 1000 // n_prints AS shared_permille
         |FROM p ORDER BY doc_id""".stripMargin
    },
    // two-sided delta-join identity; counts + key checksums must equal
    // the full recompute exactly
    "q244_ivm_join" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderpriority, (o_orderkey % 10 <> 0) AS osnap FROM orders),
        |c AS (SELECT c_custkey AS o_custkey, (c_custkey % 20 <> 0) AS csnap FROM customer),
        |j AS (SELECT o.o_orderpriority, o.o_orderkey, o.osnap, c.csnap FROM o JOIN c USING (o_custkey)),
        |sn AS (SELECT o_orderpriority, count(*) AS n_snap_join, CAST(sum(o_orderkey) AS BIGINT) AS ck
        |  FROM j WHERE osnap AND csnap GROUP BY 1),
        |dl AS (SELECT o_orderpriority, count(*) AS n_delta_join, CAST(sum(o_orderkey) AS BIGINT) AS ck
        |  FROM j WHERE NOT (osnap AND csnap) GROUP BY 1),
        |fl AS (SELECT o_orderpriority, count(*) AS n_full, CAST(sum(o_orderkey) AS BIGINT) AS ck
        |  FROM j GROUP BY 1)
        |SELECT fl.o_orderpriority,
        |  COALESCE(n_snap_join, 0) AS n_snap_join,
        |  COALESCE(n_delta_join, 0) AS n_delta_join,
        |  COALESCE(n_snap_join, 0) + COALESCE(n_delta_join, 0) AS n_incremental,
        |  n_full,
        |  CAST(CASE WHEN COALESCE(n_snap_join, 0) + COALESCE(n_delta_join, 0) = n_full
        |    AND COALESCE(sn.ck, 0) + COALESCE(dl.ck, 0) = fl.ck THEN 1 ELSE 0 END AS BIGINT) AS ivm_ok
        |FROM fl
        |LEFT JOIN sn ON sn.o_orderpriority = fl.o_orderpriority
        |LEFT JOIN dl ON dl.o_orderpriority = fl.o_orderpriority
        |ORDER BY fl.o_orderpriority""".stripMargin,
    // rank/freq are integers → micro-nat logs; OLS power sums in
    // HUGEINT (Spark: DECIMAL(38,0)) with truncating division
    "q243_zipf_fit" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      raw"""WITH tk AS (SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
         |vc AS (SELECT source, w, count(*) AS freq FROM tk GROUP BY 1, 2),
         |rk AS (SELECT source, freq, row_number() OVER (PARTITION BY source ORDER BY freq DESC, w) AS rnk FROM vc),
         |xy AS (SELECT source, ${mn("rnk")} AS x, ${mn("freq")} AS y FROM rk),
         |st AS (SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
         |  FROM xy GROUP BY source)
         |SELECT source, n AS n_vocab,
         |  CAST(CAST(n * sxy - sx * sy AS HUGEINT) * 1000 // (n * sxx - sx * sx) AS BIGINT) AS slope_milli,
         |  CAST((CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy) // (n * sxx - sx * sx) AS BIGINT) AS intercept_micro
         |FROM st ORDER BY source""".stripMargin
    },
    // the q237 per-doc scores rolled up as a source × bucket histogram
    "q241_perplexity_report" ->
      s"""WITH $perplexityCtes,
         |f AS (SELECT q.doc_id, mean_logp_micro,
         |    (0 - mean_logp_micro) // 500000 AS ppl_bucket_halfnat,
         |    CASE WHEN mean_logp_micro >= -3400000 THEN 1 ELSE 0 END AS keep,
         |    documents.source
         |  FROM q JOIN documents ON documents.doc_id = q.doc_id)
         |SELECT source, ppl_bucket_halfnat, count(*) AS n_docs,
         |  CAST(sum(keep) AS BIGINT) AS n_keep,
         |  CAST(sum(mean_logp_micro) AS BIGINT) // count(*) AS avg_mean_logp_micro
         |FROM f GROUP BY source, ppl_bucket_halfnat
         |ORDER BY source, ppl_bucket_halfnat""".stripMargin,
    // composed (U+00E9) vs decomposed (e + U+0301) forms synthesized
    // from the distinct vocabulary; raw byte joins miss every accented
    // pair, nfc_normalize recovers them all
    "q271_nfc_vocab_fold" ->
      raw"""WITH v AS (SELECT DISTINCT source, w FROM (
         |    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)),
         |c AS (SELECT source, replace(w, 'e', chr(233)) AS f FROM v),
         |d AS (SELECT source, replace(w, 'e', 'e' || chr(769)) AS g FROM v),
         |af AS (SELECT source, f FROM c UNION ALL SELECT source, g AS f FROM d),
         |st AS (SELECT source, count(DISTINCT f) AS n_raw_forms,
         |    count(DISTINCT nfc_normalize(f)) AS n_nfc_forms,
         |    CAST(sum(strlen(f)) AS BIGINT) AS raw_bytes,
         |    CAST(sum(strlen(nfc_normalize(f))) AS BIGINT) AS nfc_bytes
         |  FROM af GROUP BY source),
         |ty AS (SELECT source, count(*) AS n_types FROM v GROUP BY source),
         |jr AS (SELECT c.source, count(DISTINCT c.f) AS n_join_raw
         |  FROM c JOIN d ON d.source = c.source AND c.f = d.g GROUP BY c.source),
         |jn AS (SELECT c.source, count(DISTINCT c.f) AS n_join_nfc
         |  FROM c JOIN d ON d.source = c.source AND c.f = nfc_normalize(d.g) GROUP BY c.source)
         |SELECT ty.source, n_types, n_raw_forms, n_nfc_forms,
         |  COALESCE(n_join_raw, 0) AS n_join_raw,
         |  COALESCE(n_join_nfc, 0) AS n_join_nfc, raw_bytes, nfc_bytes
         |FROM ty JOIN st ON st.source = ty.source
         |LEFT JOIN jr ON jr.source = ty.source
         |LEFT JOIN jn ON jn.source = ty.source
         |ORDER BY ty.source""".stripMargin,
    // the stored-index serve path must land bit-exactly on the direct
    // in-memory IVF-PQ result (q193's oracle), so the oracle is that
    // result with the audit flag pinned to 1: any storage-path drift
    // fails the hash
    "q272_ann_index_lifecycle" ->
      s"""SELECT qid, nid, sim, rnk, CAST(1 AS BIGINT) AS eq_direct
         |FROM ($annIvfPqSql) t ORDER BY qid, rnk""".stripMargin,
    // seeded global order, running token total, fixed-budget shards cut
    // at each doc's FIRST token; single-node window here, two-phase
    // prefix sum in the engine
    "q273_shard_pack" ->
      raw"""WITH d AS (SELECT doc_id,
         |    ${hx("CAST(doc_id AS VARCHAR) || '#epoch42'")} AS h,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
         |  FROM d),
         |s AS (SELECT *, (cum_tok - n_tok) // 2048 AS shard_id FROM c)
         |SELECT shard_id, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
         |  min_by(doc_id, cum_tok) AS first_doc, max_by(doc_id, cum_tok) AS last_doc
         |FROM s GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    // trigram KN over q260's bigram backbone: P3 = A + B·(N2/D2) with
    // the same three bigram branches, all integer micro-nats
    "q274_trigram_perplexity" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val h = hx("CAST(doc_id AS VARCHAR)")
      raw"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
         |    ($h % 10 = 0) AS is_test FROM documents),
         |tg AS (SELECT doc_id, is_test, ws[i] AS u, ws[i+1] AS v, ws[i+2] AS w FROM (
         |    SELECT doc_id, is_test, ws, unnest(generate_series(1, len(ws) - 2)) AS i
         |    FROM d WHERE len(ws) >= 3)),
         |t3 AS (SELECT u, v, w, count(*) AS c3 FROM tg WHERE NOT is_test GROUP BY 1, 2, 3),
         |x3 AS (SELECT u, v, CAST(sum(c3) AS BIGINT) AS c2, count(*) AS n1uv FROM t3 GROUP BY 1, 2),
         |bgr AS (SELECT doc_id, is_test, ws[i] AS lft, ws[i+1] AS rgt FROM (
         |    SELECT doc_id, is_test, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |    FROM d WHERE len(ws) >= 2)),
         |cnt AS (SELECT lft, rgt, count(*) AS c FROM bgr WHERE NOT is_test GROUP BY 1, 2),
         |lc AS (SELECT lft, CAST(sum(c) AS BIGINT) AS cl, count(*) AS n1p FROM cnt GROUP BY lft),
         |rc AS (SELECT rgt, count(*) AS nleft FROM cnt GROUP BY rgt),
         |ct AS (SELECT (SELECT count(*) FROM cnt) + (SELECT count(*) FROM rc) + 1 AS denc),
         |sc AS (SELECT tg.doc_id, t3.c3, x3.c2, x3.n1uv, cnt.c, lc.cl, lc.n1p,
         |    COALESCE(rc.nleft, 0) + 1 AS numc, ct.denc
         |  FROM tg LEFT JOIN t3 ON t3.u = tg.u AND t3.v = tg.v AND t3.w = tg.w
         |  LEFT JOIN x3 ON x3.u = tg.u AND x3.v = tg.v
         |  LEFT JOIN cnt ON cnt.lft = tg.v AND cnt.rgt = tg.w
         |  LEFT JOIN lc ON lc.lft = tg.v
         |  LEFT JOIN rc ON rc.rgt = tg.w, ct
         |  WHERE tg.is_test),
         |ev AS (SELECT doc_id, c3, c2, n1uv,
         |    CASE WHEN c IS NOT NULL THEN (4 * c - 3) * denc + n1p * numc * 3
         |         WHEN cl IS NOT NULL THEN n1p * numc * 3 ELSE numc END AS n2,
         |    CASE WHEN cl IS NOT NULL THEN 4 * cl * denc ELSE denc END AS d2
         |  FROM sc),
         |lp AS (SELECT doc_id,
         |    CASE WHEN c3 IS NOT NULL THEN ${mn("(4 * c3 - 3) * d2 + n1uv * n2 * 3")} - ${mn("4 * c2")} - ${mn("d2")}
         |         WHEN c2 IS NOT NULL THEN ${mn("n1uv * n2 * 3")} - ${mn("4 * c2")} - ${mn("d2")}
         |         ELSE ${mn("n2")} - ${mn("d2")} END AS lpm,
         |    CASE WHEN c3 IS NULL AND c2 IS NOT NULL THEN 1 ELSE 0 END AS bb,
         |    CASE WHEN c2 IS NULL THEN 1 ELSE 0 END AS bf
         |  FROM ev),
         |ag AS (SELECT doc_id, count(*) AS n_trigrams,
         |    CAST(sum(bb) AS BIGINT) AS n_backoff_bigram,
         |    CAST(sum(bf) AS BIGINT) AS n_backoff_full,
         |    CAST(sum(lpm) AS BIGINT) // count(*) AS mean_logp_micro
         |  FROM lp GROUP BY doc_id)
         |SELECT doc_id, n_trigrams, n_backoff_bigram, n_backoff_full, mean_logp_micro,
         |  (0 - mean_logp_micro) // 500000 AS ppl_bucket_halfnat
         |FROM ag ORDER BY doc_id""".stripMargin
    },
    // three (bands × rows) shapes over the same k=16 signatures,
    // each measured against the published confirmed-pairs truth
    "q275_lsh_band_sweep" -> {
      def bandCfg(name: String, b: Int, r: Int): String = {
        val bandCols = (0 until b)
          .map { j =>
            val parts = (0 until r).map(rr => s"sig_${j * r + rr}").mkString(" || ':' || ")
            s"md5($parts) AS band_$j"
          }
          .mkString(", ")
        val joins = (0 until b)
          .map(j =>
            s"SELECT a.doc_id AS d1, b.doc_id AS d2 FROM ${name}b a JOIN ${name}b b ON a.band_$j = b.band_$j AND a.doc_id < b.doc_id"
          )
          .mkString(" UNION ")
        s"""${name}b AS (SELECT doc_id, $bandCols FROM sig),
           |${name}c AS ($joins)""".stripMargin
      }
      def cfgRow(name: String, b: Int, r: Int): String =
        s"""SELECT CAST($b AS INTEGER) AS bands, CAST($r AS INTEGER) AS rows_per_band,
           |  (SELECT count(*) FROM ${name}c) AS n_cand,
           |  (SELECT count(*) FROM ${name}c JOIN conf ON conf.d1 = ${name}c.d1 AND conf.d2 = ${name}c.d2) AS n_hit,
           |  (SELECT count(*) FROM conf) AS n_truth""".stripMargin
      s"""WITH $minhashCandCtes,
         |szx AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |itx AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT itx.d1, itx.d2
         |  FROM itx JOIN szx x ON itx.d1 = x.doc_id JOIN szx y ON itx.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |${bandCfg("w1", 2, 8)},
         |${bandCfg("w2", 4, 4)},
         |${bandCfg("w3", 8, 2)},
         |u AS (${cfgRow("w1", 2, 8)} UNION ALL ${cfgRow("w2", 4, 4)} UNION ALL ${cfgRow("w3", 8, 2)})
         |SELECT bands, rows_per_band, n_cand, n_hit, n_truth,
         |  n_hit * 1000 // n_truth AS recall_permille,
         |  n_hit * 1000 // greatest(n_cand, 1) AS precision_permille
         |FROM u ORDER BY bands""".stripMargin
    },
    // sqrt is IEEE correctly-rounded, so the T=2 temperature shares
    // are bit-deterministic integers on both engines
    "q276_temperature_mix" ->
      raw"""WITH per AS (SELECT source, count(*) AS n_docs,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY source),
         |q AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000) AS BIGINT) AS q_milli FROM per),
         |tt AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot, CAST(sum(q_milli) AS BIGINT) AS tot_q FROM q)
         |SELECT source, n_docs, n_tokens,
         |  n_tokens * 1000 // tot AS p_permille,
         |  q_milli * 1000 // tot_q AS q_permille,
         |  CAST(CAST(q_milli AS HUGEINT) * tot * 1000 // (CAST(tot_q AS HUGEINT) * n_tokens) AS BIGINT) AS boost_permille
         |FROM q, tt ORDER BY source""".stripMargin,
    // QI = (priority, date) with the day -> month -> year -> dropped
    // generalization ladder; suppression cost of k=5 at each level
    "q277_k_anonymity" -> {
      def level(name: String, dateExpr: Option[String]): String = {
        val grp = dateExpr match {
          case Some(e) => s"SELECT o_orderpriority AS pri, $e AS qi_date, count(*) AS g FROM orders GROUP BY 1, 2"
          case None => s"SELECT o_orderpriority AS pri, count(*) AS g FROM orders GROUP BY 1"
        }
        s"""SELECT '$name' AS level, count(*) AS n_groups,
           |  CAST(sum(CASE WHEN g < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_groups,
           |  CAST(sum(g) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT) AS n_suppressed,
           |  CAST(sum(CASE WHEN g < 5 THEN g ELSE 0 END) AS BIGINT) * 1000 // CAST(sum(g) AS BIGINT) AS suppressed_permille
           |FROM ($grp)""".stripMargin
      }
      s"""${level("1_day", Some("strftime(o_orderdate, '%Y-%m-%d')"))}
         |UNION ALL ${level("2_month", Some("strftime(o_orderdate, '%Y-%m')"))}
         |UNION ALL ${level("3_year", Some("strftime(o_orderdate, '%Y')"))}
         |UNION ALL ${level("4_dropped", None)}
         |ORDER BY level""".stripMargin
    },
    // order-2 next-event examples with the hash train/valid split;
    // the dataset card: counts + user coverage per context cell
    "q278_next_event_dataset" -> {
      val h = hx("CAST(event_id AS VARCHAR)")
      s"""WITH x AS (SELECT user_id, event_id, event_type,
         |    lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev1,
         |    lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev2
         |  FROM events),
         |f AS (SELECT *, CASE WHEN $h % 10 < 8 THEN 'train' ELSE 'valid' END AS split
         |  FROM x WHERE prev1 IS NOT NULL AND prev2 IS NOT NULL)
         |SELECT split, prev2, prev1, event_type AS label,
         |  count(*) AS n_examples, count(DISTINCT user_id) AS n_users
         |FROM f GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin
    },
    // flatten the length-bucket histogram by hash-gated downsampling
    // toward the smallest bucket's mass
    "q279_bucket_resample" -> {
      val h = hx("CAST(doc_id AS VARCHAR)")
      s"""WITH d AS (SELECT doc_id, n_chars // 100 AS bucket FROM documents),
         |hist AS (SELECT bucket, count(*) AS n_before FROM d GROUP BY bucket),
         |tt AS (SELECT min(n_before) AS m, CAST(sum(n_before) AS BIGINT) AS total FROM hist),
         |rates AS (SELECT bucket, n_before, total, m * 1000 // n_before AS accept_permille FROM hist, tt),
         |k AS (SELECT d.bucket, r.n_before, r.accept_permille, r.total,
         |    CASE WHEN $h % 1000 < r.accept_permille THEN 1 ELSE 0 END AS keep
         |  FROM d JOIN rates r ON r.bucket = d.bucket),
         |g AS (SELECT bucket, max(n_before) AS n_before, max(accept_permille) AS accept_permille,
         |    CAST(sum(keep) AS BIGINT) AS n_after, max(total) AS total
         |  FROM k GROUP BY bucket),
         |ta AS (SELECT CAST(sum(n_after) AS BIGINT) AS total_after FROM g)
         |SELECT bucket, n_before, accept_permille, n_after,
         |  n_before * 1000 // total AS share_before_permille,
         |  n_after * 1000 // greatest(total_after, 1) AS share_after_permille
         |FROM g, ta ORDER BY bucket""".stripMargin
    },
    // mod vs rendezvous placement under N=8 -> 9; rendezvous argmax via
    // the packed score*16 + (15-j) integer so max() decides the shard
    "q280_consistent_hash_resize" -> {
      val h = hx("CAST(doc_id AS VARCHAR)")
      val hj = hx("CAST(doc_id AS VARCHAR) || '#shard' || j")
      s"""WITH d AS (SELECT doc_id, $h AS h FROM documents),
         |x AS (SELECT doc_id, h, j, $hj * 16 + (15 - j) AS packed
         |  FROM d, (SELECT unnest(generate_series(0, 8)) AS j)),
         |p AS (SELECT doc_id, h, max(CASE WHEN j < 8 THEN packed END) AS p_old, max(packed) AS p_new
         |  FROM x GROUP BY 1, 2),
         |m AS (SELECT doc_id,
         |    CASE WHEN h % 8 <> h % 9 THEN 1 ELSE 0 END AS moved_mod,
         |    CASE WHEN p_old % 16 <> p_new % 16 THEN 1 ELSE 0 END AS moved_rv
         |  FROM p),
         |a AS (SELECT count(*) AS n_docs, CAST(sum(moved_mod) AS BIGINT) AS mm,
         |    CAST(sum(moved_rv) AS BIGINT) AS mr FROM m)
         |SELECT '1_mod' AS scheme, n_docs, mm AS n_moved, mm * 1000 // n_docs AS moved_permille FROM a
         |UNION ALL
         |SELECT '2_rendezvous', n_docs, mr, mr * 1000 // n_docs FROM a
         |ORDER BY scheme""".stripMargin
    },
    // top-3-df conjunctive cascade; the oracle computes the stage
    // counts once (index and scan are the same VALUES — the two-path
    // audit is engine-side machinery) and pins the equality flag
    "q281_boolean_retrieval" ->
      raw"""WITH p AS (SELECT DISTINCT doc_id, w FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)),
         |dfq AS (SELECT w, count(*) AS df FROM p GROUP BY w),
         |t3 AS (SELECT w, df, stage FROM (
         |    SELECT w, df, CAST(row_number() OVER (ORDER BY df DESC, w) AS INTEGER) AS stage FROM dfq)
         |  WHERE stage <= 3),
         |dc AS (SELECT p.doc_id, t3.stage FROM p JOIN t3 ON t3.w = p.w),
         |cm AS (SELECT dc.doc_id, s.stage FROM dc,
         |    (SELECT CAST(unnest(generate_series(1, 3)) AS INTEGER) AS stage) s
         |  WHERE dc.stage <= s.stage GROUP BY dc.doc_id, s.stage
         |  HAVING count(DISTINCT dc.stage) = s.stage),
         |cnt AS (SELECT stage, count(*) AS n_matching FROM cm GROUP BY stage)
         |SELECT t3.stage, t3.w AS term, t3.df, cnt.n_matching, cnt.n_matching AS n_direct,
         |  CAST(1 AS BIGINT) AS index_eq_scan
         |FROM t3 JOIN cnt ON cnt.stage = t3.stage ORDER BY t3.stage""".stripMargin,
    // balance quintiles (real ntile), F-order target, +1 Laplace WOE in
    // micro-nats, IV contribution in cross-multiplied nanos
    "q282_woe_encoding" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val woe = s"${mn("(n_good + 1) * (bb + 5)")} - ${mn("(n_bad + 1) * (g + 5)")}"
      s"""WITH f AS (SELECT c.c_custkey, c.c_acctbal,
         |    CASE WHEN fo.ck IS NOT NULL THEN 1 ELSE 0 END AS pos
         |  FROM customer c LEFT JOIN (
         |    SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F') fo
         |  ON fo.ck = c.c_custkey),
         |bkt AS (SELECT *, CAST(ntile(5) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS bucket FROM f),
         |per AS (SELECT bucket, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_good,
         |    CAST(sum(1 - pos) AS BIGINT) AS n_bad FROM bkt GROUP BY bucket),
         |tt AS (SELECT CAST(sum(n_good) AS BIGINT) AS g, CAST(sum(n_bad) AS BIGINT) AS bb FROM per),
         |w AS (SELECT bucket, n, n_good, n_bad, g, bb, $woe AS woe_micro FROM per, tt)
         |SELECT bucket, n, n_good, n_bad, woe_micro,
         |  (n_good * bb - n_bad * g) * woe_micro // (g * bb) AS iv_nano
         |FROM w ORDER BY bucket""".stripMargin
    },
    // DSIR hashed-unigram importance weights: target = the 'en' slice,
    // raw = the whole corpus, 1024 Laplace-smoothed buckets, per-doc
    // weight in exact integer micro-nats, rolled up per source
    "q283_importance_weights" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val h = hx("w")
      raw"""WITH tok AS (SELECT doc_id, source, lang,
         |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
         |bk AS (SELECT doc_id, source, lang, HX % 1024 AS b FROM tok),
         |cr AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
         |ct AS (SELECT b, count(*) AS ct FROM bk WHERE lang = 'en' GROUP BY b),
         |lut AS (SELECT cr.b, COALESCE(ct.ct, 0) AS ct, cr.cr FROM cr LEFT JOIN ct ON ct.b = cr.b),
         |inc AS (SELECT b, ${mn("ct + 1")} - ${mn("cr + 1")} AS inc FROM lut),
         |tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt, CAST(sum(cr) AS BIGINT) AS tr FROM lut),
         |pd AS (SELECT x.doc_id, x.source, count(*) AS n_tok, CAST(sum(inc) AS BIGINT) AS sum_inc
         |  FROM bk x JOIN inc ON inc.b = x.b GROUP BY 1, 2),
         |w AS (SELECT doc_id, source, n_tok,
         |    sum_inc - n_tok * (${mn("tt + 1024")} - ${mn("tr + 1024")}) AS w_micro FROM pd, tot),
         |cp AS (SELECT CAST(sum(w_micro) AS BIGINT) AS sw, CAST(sum(n_tok) AS BIGINT) AS st FROM w),
         |sel AS (SELECT source, w_micro,
         |    CASE WHEN CAST(w_micro AS HUGEINT) * st > CAST(n_tok AS HUGEINT) * sw
         |      THEN 1 ELSE 0 END AS selected, n_tok FROM w, cp)
         |SELECT source, count(*) AS n_docs,
         |  CAST(sum(w_micro) // count(*) AS BIGINT) AS mean_w_micro,
         |  CAST(sum(w_micro) // sum(n_tok) AS BIGINT) AS rate_micro,
         |  CAST(sum(selected) AS BIGINT) AS n_selected,
         |  CAST(sum(selected) * 1000 // count(*) AS BIGINT) AS selected_permille
         |FROM sel GROUP BY source ORDER BY source""".stripMargin.replace("HX", h)
    },
    // greedy bigram decode: per-context argmax transition table (ties
    // to the smallest continuation), four unrolled decode joins from
    // the five most frequent seeds; terminal tokens null out
    "q284_greedy_decode" ->
      raw"""WITH d AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |tok AS (SELECT unnest(ws) AS w FROM d),
         |bg AS (SELECT ws[i] AS l, ws[i+1] AS r FROM (
         |    SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 2)),
         |c AS (SELECT l, r, count(*) AS cnt FROM bg GROUP BY 1, 2),
         |best AS (SELECT l, r AS nxt FROM (
         |    SELECT l, r, row_number() OVER (PARTITION BY l ORDER BY cnt DESC, r) AS rn FROM c)
         |  WHERE rn = 1),
         |seeds AS (SELECT CAST(row_number() OVER (ORDER BY freq DESC, w) AS INTEGER) AS rnk, w AS seed
         |  FROM (SELECT w, count(*) AS freq FROM tok GROUP BY w ORDER BY freq DESC, w LIMIT 5))
         |SELECT rnk, seed, b1.nxt AS s1, b2.nxt AS s2, b3.nxt AS s3, b4.nxt AS s4
         |FROM seeds
         |LEFT JOIN best b1 ON b1.l = seeds.seed
         |LEFT JOIN best b2 ON b2.l = b1.nxt
         |LEFT JOIN best b3 ON b3.l = b2.nxt
         |LEFT JOIN best b4 ON b4.l = b3.nxt
         |ORDER BY rnk""".stripMargin,
    // per-language fertility/TTR report: whitespace words vs the
    // BPE-floor token count vs chars, ratios in integer permille
    "q285_tokenizer_fertility" ->
      raw"""WITH pd AS (SELECT lang, doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
         |      + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g')) AS BIGINT) AS n_bpe,
         |    n_chars FROM documents),
         |ty AS (SELECT lang, CAST(count(DISTINCT w) AS BIGINT) AS n_types, count(*) AS n_tokens FROM (
         |    SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
         |  GROUP BY lang),
         |ag AS (SELECT lang, count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS n_words,
         |    CAST(sum(n_bpe) AS BIGINT) AS n_bpe, CAST(sum(n_chars) AS BIGINT) AS n_chars
         |  FROM pd GROUP BY lang)
         |SELECT ag.lang, n_docs, n_words, n_bpe,
         |  n_bpe * 1000 // n_words AS fertility_permille,
         |  n_chars * 1000 // n_bpe AS chars_per_token_permille,
         |  n_types * 1000 // n_tokens AS ttr_permille
         |FROM ag JOIN ty ON ty.lang = ag.lang ORDER BY ag.lang""".stripMargin,
    // q80's recursive CC clusters + per-cluster majority language
    // (ties to the smaller label) -> per-language minority census
    "q286_cluster_label_audit" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
         |),
         |cc AS (SELECT id AS doc_id, min(r) AS cluster FROM reach GROUP BY id),
         |lab AS (SELECT d.doc_id, d.lang, cc.cluster FROM documents d JOIN cc ON cc.doc_id = d.doc_id),
         |sz AS (SELECT cluster, count(*) AS cl_size FROM lab GROUP BY cluster),
         |bl AS (SELECT cluster, lang, count(*) AS cnt FROM lab GROUP BY 1, 2),
         |mj AS (SELECT cluster, lang AS maj_lang FROM (
         |    SELECT cluster, lang, row_number() OVER (PARTITION BY cluster ORDER BY cnt DESC, lang) AS rn
         |    FROM bl) WHERE rn = 1)
         |SELECT lab.lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN cl_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_dup_clusters,
         |  CAST(sum(CASE WHEN lab.lang <> maj_lang THEN 1 ELSE 0 END) AS BIGINT) AS n_minority,
         |  CAST(sum(CASE WHEN lab.lang <> maj_lang THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS minority_permille
         |FROM lab JOIN mj ON mj.cluster = lab.cluster JOIN sz ON sz.cluster = lab.cluster
         |GROUP BY lab.lang ORDER BY lab.lang""".stripMargin,
    // Apriori triples at support 2: the oracle counts all basket
    // triples directly (the engine's closure pruning is lossless, so
    // HAVING >= 2 lands on the same set), confidence from the pair join
    "q287_frequent_triples" ->
      """WITH b AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |fp AS (SELECT p1, p2, count(*) AS n12 FROM (
         |    SELECT a.ok, a.pk AS p1, c.pk AS p2 FROM b a JOIN b c ON c.ok = a.ok AND a.pk < c.pk)
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |tr AS (SELECT a.pk AS p1, c.pk AS p2, z.pk AS p3, count(*) AS n_all
         |  FROM b a JOIN b c ON c.ok = a.ok AND a.pk < c.pk JOIN b z ON z.ok = a.ok AND c.pk < z.pk
         |  GROUP BY 1, 2, 3 HAVING count(*) >= 2)
         |SELECT tr.p1, tr.p2, tr.p3, n_all, n_all * 1000 // n12 AS conf_pair_to_third_permille
         |FROM tr JOIN fp ON fp.p1 = tr.p1 AND fp.p2 = tr.p2
         |ORDER BY 1, 2, 3""".stripMargin,
    // LOO unigram attribution: additive count ablation, shared-V
    // Laplace, mean per-held-out-token micro-nats, HUGEINT sums
    "q288_loo_source_value" -> looSourceValueSql,
    // unequal-rate stratified hash sample, HT inverse-probability
    // estimate vs truth, ratio cross-multiplied in HUGEINT
    "q289_ht_estimator_audit" -> {
      val h = hx("CAST(o_orderkey AS VARCHAR)")
      s"""WITH o AS (SELECT o_orderpriority AS stratum,
         |    CAST(substr(o_orderpriority, 1, 1) AS INTEGER) * 100 AS rate,
         |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         |    o_orderkey FROM orders),
         |tru AS (SELECT stratum, count(*) AS n_pop, CAST(sum(cents) AS HUGEINT) AS truth_c FROM o GROUP BY stratum),
         |sm AS (SELECT stratum, max(rate) AS rate, count(*) AS n_sampled,
         |    CAST(sum(cents) AS HUGEINT) AS samp_c
         |  FROM o WHERE $h % 1000 < rate GROUP BY stratum)
         |SELECT tru.stratum, n_pop, n_sampled,
         |  n_sampled * 1000 // n_pop AS sampled_permille, rate,
         |  CAST(samp_c * 1000000 // (rate * truth_c) AS BIGINT) AS ht_ratio_permille
         |FROM tru JOIN sm ON sm.stratum = tru.stratum ORDER BY tru.stratum""".stripMargin
    },
    // the whole q193 training+probe chain at k_short=10, exact cosine
    // re-rank on the shortlist only, final cut at 3
    "q290_ann_rerank" ->
      s"""WITH short AS (SELECT qid, nid FROM (${annIvfPqSqlK(10)})),
         |n2 AS (SELECT vec_id AS vid, embedding AS e FROM embeddings),
         |sc AS (SELECT s.qid, s.nid, ${cosineSql("q.e", "c.e")} AS c
         |  FROM short s JOIN n2 q ON q.vid = s.qid JOIN n2 c ON c.vid = s.nid),
         |r AS (SELECT qid, nid, ${away("c", 6)} AS sim FROM sc),
         |rr AS (SELECT qid, nid, sim,
         |    CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM r)
         |SELECT qid, nid, sim, rnk FROM rr WHERE rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    // linearized multiplicative DoReMi update over the q288 frame
    "q291_doremi_reweight" ->
      s"""WITH loo AS ($looSourceValueSql),
         |f AS (SELECT source, t_s, greatest(1, 1000000 - 10 * delta_micro) AS factor FROM loo),
         |m AS (SELECT source, t_s, factor, CAST(t_s AS HUGEINT) * factor AS mass FROM f),
         |t AS (SELECT CAST(sum(mass) AS HUGEINT) AS tot, CAST(sum(t_s) AS BIGINT) AS tot_t FROM m)
         |SELECT source, t_s, t_s * 1000 // tot_t AS old_permille, factor,
         |  CAST(mass * 1000 // tot AS BIGINT) AS new_permille
         |FROM m, t ORDER BY source""".stripMargin,
    // recall/precision@k of the q198 ranking against the conjunctive
    // ('spark' AND 'join' AND 'stream') gold set
    "q292_retrieval_eval" ->
      raw"""WITH ranked AS (SELECT doc_id, rnk FROM ($bm25Sql)),
         |gold AS (SELECT doc_id FROM documents
         |  WHERE list_contains(regexp_split_to_array(trim(text), '\s+'), 'spark')
         |    AND list_contains(regexp_split_to_array(trim(text), '\s+'), 'join')
         |    AND list_contains(regexp_split_to_array(trim(text), '\s+'), 'stream')),
         |ng AS (SELECT count(*) AS n_gold FROM gold),
         |x AS (SELECT k.k, r.rnk, CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_gold
         |  FROM ranked r LEFT JOIN gold g ON g.doc_id = r.doc_id,
         |    (SELECT CAST(unnest([1, 3, 10]) AS INTEGER) AS k) k
         |  WHERE r.rnk <= k.k)
         |SELECT x.k, ng.n_gold, CAST(sum(is_gold) AS BIGINT) AS n_hits,
         |  CAST(sum(is_gold) * 1000 // max(ng.n_gold) AS BIGINT) AS recall_permille,
         |  CAST(sum(is_gold) * 1000 // count(*) AS BIGINT) AS precision_permille
         |FROM x, ng GROUP BY x.k, ng.n_gold ORDER BY x.k""".stripMargin,
    // per-tier ceil/mod padding accounting: no-packing vs the
    // perfect-packing floor, all integer
    "q293_packing_efficiency" ->
      raw"""WITH d AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok FROM documents),
         |x AS (SELECT n_tok, cap FROM d, (SELECT CAST(unnest([512, 1024, 2048]) AS BIGINT) AS cap)),
         |a AS (SELECT cap, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tok,
         |    CAST(sum((n_tok + cap - 1) // cap) AS BIGINT) AS n_seq_nopack,
         |    CAST(sum((cap - n_tok % cap) % cap) AS BIGINT) AS pad_nopack
         |  FROM x GROUP BY cap)
         |SELECT cap, n_docs, total_tok, n_seq_nopack,
         |  pad_nopack * 1000 // (n_seq_nopack * cap) AS pad_nopack_permille,
         |  (total_tok + cap - 1) // cap AS n_seq_packed,
         |  ((cap - total_tok % cap) % cap) * 1000 // (((total_tok + cap - 1) // cap) * cap) AS pad_packed_permille
         |FROM a ORDER BY cap""".stripMargin,
    // per-chunk TVD vs the full-corpus category distribution, exact
    // cross-multiplied integers (the streaming side is engine machinery;
    // chunk identity is data-carried so arrival order cannot matter)
    "q294_stream_drift_monitor" ->
      """WITH ev AS (SELECT event_id % 4 AS chunk, event_type FROM events),
         |per AS (SELECT chunk, event_type, count(*) AS n FROM ev GROUP BY 1, 2),
         |ref AS (SELECT event_type, count(*) AS rn FROM ev GROUP BY 1),
         |rt AS (SELECT CAST(sum(rn) AS BIGINT) AS rt FROM ref),
         |bt AS (SELECT chunk, CAST(sum(n) AS BIGINT) AS bt FROM per GROUP BY chunk),
         |mx AS (SELECT b.chunk, r.event_type, b.bt, r.rn, COALESCE(p.n, 0) AS n
         |  FROM bt b CROSS JOIN ref r LEFT JOIN per p ON p.chunk = b.chunk AND p.event_type = r.event_type)
         |SELECT chunk, bt AS n_events,
         |  CAST(sum(abs(CAST(n AS HUGEINT) * rt.rt - CAST(rn AS HUGEINT) * bt)) * 1000
         |    // (2 * bt * max(rt.rt)) AS BIGINT) AS tvd_permille
         |FROM mx, rt GROUP BY chunk, bt ORDER BY chunk""".stripMargin,
    // split-conformal: integer slope from the calibration half, exact
    // ceil(0.9(n+1))-th residual via support histogram + prefix count,
    // coverage on the held-out half
    "q295_conformal_interval" -> {
      val h = hx("CAST(doc_id AS VARCHAR)")
      raw"""WITH d AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok,
         |    n_chars, $h % 1000 < 500 AS is_cal FROM documents),
         |sl AS (SELECT CAST(sum(n_chars) AS BIGINT) // CAST(sum(n_tok) AS BIGINT) AS r FROM d WHERE is_cal),
         |res AS (SELECT is_cal, abs(n_chars - n_tok * sl.r) AS res FROM d, sl),
         |h AS (SELECT res, count(*) AS cnt FROM res WHERE is_cal GROUP BY res),
         |c AS (SELECT res, CAST(sum(cnt) OVER (ORDER BY res) AS BIGINT) AS cum FROM h),
         |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_cal FROM h),
         |q AS (SELECT min(res) AS q_hat, max(n_cal) AS n_cal FROM c, t WHERE cum * 10 >= (n_cal + 1) * 9)
         |SELECT q.n_cal, count(*) AS n_test, q.q_hat,
         |  CAST(sum(CASE WHEN res <= q_hat THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS coverage_permille
         |FROM res, q WHERE NOT is_cal GROUP BY q.n_cal, q.q_hat""".stripMargin
    },
    // top-N coverage / OOV ladder over the frequency-ranked vocabulary
    "q296_vocab_coverage" ->
      raw"""WITH f AS (SELECT w, count(*) AS f FROM (
         |    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents) GROUP BY w),
         |rk AS (SELECT f, row_number() OVER (ORDER BY f DESC, w) AS rnk FROM f),
         |t AS (SELECT CAST(sum(f) AS BIGINT) AS tot, count(*) AS n_types FROM f),
         |x AS (SELECT f, rnk, vsize FROM rk, (SELECT CAST(unnest([1000, 2000, 4000]) AS INTEGER) AS vsize)
         |  WHERE rnk <= vsize)
         |SELECT vsize, t.n_types, count(*) AS n_kept, CAST(sum(f) AS BIGINT) AS covered,
         |  t.tot AS total_tokens,
         |  CAST(sum(f) * 1000 // t.tot AS BIGINT) AS coverage_permille,
         |  CAST((t.tot - sum(f)) * 1000 // t.tot AS BIGINT) AS oov_permille
         |FROM x, t GROUP BY vsize, t.n_types, t.tot ORDER BY vsize""".stripMargin,
    // q94's 3-token passage hashes, repetition df >= 5 across distinct
    // docs marks boilerplate, per-source scrub report
    "q297_boilerplate_scrub" ->
      raw"""WITH d AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |ch AS (SELECT doc_id, source,
         |    md5(array_to_string(ws[(ci * 3 + 1):(ci * 3 + 3)], ' ')) AS h
         |  FROM (SELECT doc_id, source, ws, unnest(generate_series(0, (len(ws) - 1) // 3)) AS ci FROM d)),
         |dfh AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM ch GROUP BY h)
         |SELECT source, CAST(count(DISTINCT ch.doc_id) AS BIGINT) AS n_docs, count(*) AS n_chunks,
         |  CAST(sum(CASE WHEN ndocs >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
         |  CAST(sum(CASE WHEN ndocs >= 5 THEN 1 ELSE 0 END) * 10000 // count(*) AS BIGINT) AS boiler_permyriad
         |FROM ch JOIN dfh ON dfh.h = ch.h
         |GROUP BY source ORDER BY source""".stripMargin,
    // two seeded epoch orders, exact footrule vs the independent
    // expectation (n^2-1)/3, fixed points counted
    "q298_epoch_shuffle_audit" -> {
      val h1 = hx("CAST(doc_id AS VARCHAR) || '#e1'")
      val h2 = hx("CAST(doc_id AS VARCHAR) || '#e2'")
      s"""WITH d AS (SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM documents),
         |r AS (SELECT doc_id,
         |    row_number() OVER (ORDER BY h1, doc_id) AS r1,
         |    row_number() OVER (ORDER BY h2, doc_id) AS r2 FROM d)
         |SELECT count(*) AS n,
         |  CAST(sum(CASE WHEN r1 = r2 THEN 1 ELSE 0 END) AS BIGINT) AS n_fixed,
         |  CAST(CAST(sum(abs(r1 - r2)) AS HUGEINT) * 3000
         |    // (CAST(count(*) AS HUGEINT) * count(*) - 1) AS BIGINT) AS footrule_ratio_permille
         |FROM r""".stripMargin
    },
    // the sink-side audit reduces to the plain category census with the
    // idempotence flag pinned TRUE (duplicate-free by construction is
    // the engine-side machinery under test)
    "q299_exactly_once_sink" ->
      """SELECT event_type, count(*) AS n, CAST(1 AS BIGINT) AS sink_eq_batch
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // per-column stats over the canonical string forms (cents for
    // money, fixed-format timestamps — no raw doubles)
    "q300_analyze_table" ->
      """WITH c AS (
        |  SELECT 'o_custkey' AS cname, CAST(o_custkey AS VARCHAR) AS v FROM orders
        |  UNION ALL SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') FROM orders
        |  UNION ALL SELECT 'o_orderkey', CAST(o_orderkey AS VARCHAR) FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_totalprice', CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR) FROM orders)
        |SELECT cname, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT v) AS BIGINT) AS ndv, min(v) AS min_s, max(v) AS max_s
        |FROM c GROUP BY cname ORDER BY cname""".stripMargin,
    // exact integer moments, floor(sqrt(integer)) sd proxy (IEEE sqrt
    // is correctly rounded -> cross-engine safe), budget split by
    // N_h*S_h vs N_h
    "q301_neyman_allocation" ->
      """WITH c AS (SELECT c_mktsegment AS stratum,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS y FROM customer),
        |p AS (SELECT stratum, count(*) AS n_pop, CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
        |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy FROM c GROUP BY stratum),
        |v AS (SELECT stratum, n_pop, n_pop * syy - sy * sy AS vnum FROM p),
        |sd AS (SELECT stratum, n_pop,
        |    CAST(floor(sqrt(CAST(vnum * 1000000 // (n_pop * (n_pop - 1)) AS DOUBLE))) AS BIGINT) AS sd_milli FROM v),
        |w AS (SELECT stratum, n_pop, sd_milli, CAST(n_pop AS HUGEINT) * sd_milli AS w FROM sd),
        |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw, CAST(sum(n_pop) AS BIGINT) AS tn FROM w)
        |SELECT stratum, n_pop, sd_milli,
        |  1000 * n_pop // tn AS alloc_prop,
        |  CAST(1000 * w // tw AS BIGINT) AS alloc_neyman
        |FROM w, t ORDER BY stratum""".stripMargin,
    // three sliced brute-force rungs vs the full-vector truth; the
    // 64-dim rung is the identity control
    "q302_matryoshka_recall" -> {
      def bf(tag: String, emb: String) =
        s"""q$tag AS (SELECT vec_id AS qid, $emb AS qe FROM v WHERE vec_id < 50),
           |c$tag AS (SELECT vec_id AS nid, $emb AS ne FROM v),
           |s$tag AS (SELECT q.qid, c.nid, ${away(cosineSql("q.qe", "c.ne"), 6)} AS sim
           |  FROM q$tag q, c$tag c WHERE c.nid <> q.qid),
           |k$tag AS (SELECT qid, nid, sim,
           |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk FROM s$tag),
           |t$tag AS (SELECT qid, nid, rnk FROM k$tag WHERE rnk <= 10)""".stripMargin
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         |${bf("f", "embedding")},
         |${bf("a", "embedding[1:16]")},
         |${bf("b", "embedding[1:32]")},
         |${bf("d", "embedding[1:64]")},
         |m AS (SELECT 16 AS dims, qid, nid, rnk FROM ta
         |  UNION ALL SELECT 32, qid, nid, rnk FROM tb
         |  UNION ALL SELECT 64, qid, nid, rnk FROM td),
         |ov AS (SELECT m.dims, count(*) AS n_pairs,
         |    CAST(sum(CASE WHEN f.nid IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
         |  FROM m LEFT JOIN tf f ON f.qid = m.qid AND f.nid = m.nid GROUP BY m.dims),
         |o1 AS (SELECT m.dims, count(*) AS n_q,
         |    CAST(sum(CASE WHEN f.nid = m.nid THEN 1 ELSE 0 END) AS BIGINT) AS n_top1
         |  FROM m JOIN tf f ON f.qid = m.qid AND f.rnk = 1 WHERE m.rnk = 1 GROUP BY m.dims)
         |SELECT ov.dims, n_overlap, n_overlap * 1000 // n_pairs AS recall_permille,
         |  n_top1 * 1000 // n_q AS top1_match_permille
         |FROM ov JOIN o1 ON o1.dims = ov.dims ORDER BY ov.dims""".stripMargin
    },
    // batches of 32 padded to the batch max: arrival order vs
    // length-sorted order
    "q303_length_bucketing" ->
      raw"""WITH d AS (SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok FROM documents),
         |ra AS (SELECT n_tok, (row_number() OVER (ORDER BY doc_id) - 1) // 32 AS batch FROM d),
         |rl AS (SELECT n_tok, (row_number() OVER (ORDER BY n_tok, doc_id) - 1) // 32 AS batch FROM d),
         |wa AS (SELECT batch, count(*) AS nb, max(n_tok) AS mx, CAST(sum(n_tok) AS BIGINT) AS st
         |  FROM ra GROUP BY batch),
         |wl AS (SELECT batch, count(*) AS nb, max(n_tok) AS mx, CAST(sum(n_tok) AS BIGINT) AS st
         |  FROM rl GROUP BY batch),
         |aa AS (SELECT '1_arrival' AS strategy, count(*) AS n_batches, CAST(sum(st) AS BIGINT) AS total_tok,
         |    CAST(sum(nb * mx - st) AS BIGINT) AS pad_tok,
         |    CAST(sum(nb * mx - st) * 1000 // sum(nb * mx) AS BIGINT) AS pad_permille FROM wa),
         |al AS (SELECT '2_length_sorted', count(*), CAST(sum(st) AS BIGINT),
         |    CAST(sum(nb * mx - st) AS BIGINT),
         |    CAST(sum(nb * mx - st) * 1000 // sum(nb * mx) AS BIGINT) FROM wl)
         |SELECT * FROM aa UNION ALL SELECT * FROM al ORDER BY strategy""".stripMargin,
    // H1 vs H2 PSI in exact micro-nats: Laplace-smoothed bucket
    // masses, cross-multiplied contribution, HUGEINT products
    "q304_psi_drift" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH o AS (SELECT (o_orderdate < TIMESTAMP '2019-07-01') AS is_base,
         |    least(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // 5000000, 9) AS bin FROM orders),
         |p AS (SELECT bin, CAST(sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS BIGINT) + 1 AS c,
         |    CAST(sum(CASE WHEN is_base THEN 0 ELSE 1 END) AS BIGINT) + 1 AS d FROM o GROUP BY bin),
         |t AS (SELECT CAST(sum(c) AS BIGINT) AS nn, CAST(sum(d) AS BIGINT) AS mm FROM p)
         |SELECT bin, c - 1 AS n_base, d - 1 AS n_curr,
         |  CAST((CAST(c AS HUGEINT) * mm - CAST(d AS HUGEINT) * nn)
         |    * (${mn("CAST(c AS HUGEINT) * mm")} - ${mn("CAST(d AS HUGEINT) * nn")})
         |    // (CAST(nn AS HUGEINT) * mm) AS BIGINT) AS psi_contrib_micro
         |FROM p, t ORDER BY bin""".stripMargin
    },
    // the q277 ladder, sensitive attribute = order status: worst-case
    // l and the disclosure cost of single-valued groups
    "q305_l_diversity" -> {
      def level(name: String, dateExpr: Option[String]): String = {
        val grp = dateExpr match {
          case Some(e) =>
            s"SELECT o_orderpriority AS pri, $e AS qi_date, count(*) AS g, count(DISTINCT o_orderstatus) AS l FROM orders GROUP BY 1, 2"
          case None =>
            s"SELECT o_orderpriority AS pri, count(*) AS g, count(DISTINCT o_orderstatus) AS l FROM orders GROUP BY 1"
        }
        s"""SELECT '$name' AS level, count(*) AS n_groups,
           |  CAST(min(l) AS BIGINT) AS l_min,
           |  CAST(sum(CASE WHEN l = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single_valued,
           |  CAST(sum(g) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN l = 1 THEN g ELSE 0 END) AS BIGINT) * 1000 // CAST(sum(g) AS BIGINT) AS disclosing_permille
           |FROM ($grp)""".stripMargin
      }
      s"""${level("1_day", Some("strftime(o_orderdate, '%Y-%m-%d')"))}
         |UNION ALL ${level("2_month", Some("strftime(o_orderdate, '%Y-%m')"))}
         |UNION ALL ${level("3_year", Some("strftime(o_orderdate, '%Y')"))}
         |UNION ALL ${level("4_dropped", None)}
         |ORDER BY level""".stripMargin
    },
    // discrete KM with censoring at the last observed week; survival
    // carried in log-space micro-nats (exact integers)
    "q306_km_survival" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH ev AS (SELECT user_id,
         |    CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS wk
         |  FROM events),
         |u AS (SELECT user_id, min(wk) AS w0, max(wk) AS w1 FROM ev GROUP BY user_id),
         |wm AS (SELECT max(wk) AS wmax FROM ev),
         |lv AS (SELECT w1 - w0 AS t, CASE WHEN w1 = wmax THEN 1 ELSE 0 END AS censored FROM u, wm),
         |pw AS (SELECT t, count(*) AS ending, CAST(sum(censored) AS BIGINT) AS n_censored FROM lv GROUP BY t),
         |pe AS (SELECT t, ending, n_censored, ending - n_censored AS n_events FROM pw),
         |ar AS (SELECT *, CAST(sum(ending) OVER (ORDER BY t DESC) AS BIGINT) AS n_at_risk FROM pe)
         |SELECT t, n_at_risk, n_events, n_censored,
         |  CAST(sum(${mn("n_at_risk - n_events")} - ${mn("n_at_risk")}) OVER (ORDER BY t) AS BIGINT) AS log_surv_micro
         |FROM ar ORDER BY t""".stripMargin
    },
    // hottest-key skew diagnosis and the AQE-style salt decision
    "q307_skew_join_planner" ->
      """WITH k AS (SELECT o_custkey, count(*) AS kn FROM orders GROUP BY o_custkey),
        |hot AS (SELECT o_custkey AS top_key, kn AS max_key_rows FROM k ORDER BY kn DESC, o_custkey LIMIT 1),
        |a AS (SELECT count(*) AS n_keys, CAST(sum(kn) AS BIGINT) AS total_rows FROM k)
        |SELECT total_rows, n_keys, top_key, max_key_rows,
        |  CAST(CAST(max_key_rows AS HUGEINT) * n_keys * 1000 // total_rows AS BIGINT) AS skew_ratio_permille,
        |  greatest(total_rows // 32, 1) AS target_rows,
        |  (max_key_rows + greatest(total_rows // 32, 1) - 1) // greatest(total_rows // 32, 1) AS salt_factor
        |FROM a, hot""".stripMargin,
    // pre-filtered exact search: corpus = label 1 only, queries
    // vec_id < 20, k = 5 — the q29 mirror with the predicate pushed
    // under the scoring join
    "q308_filtered_vector_search" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 20),
         |c AS (SELECT vec_id AS nid, embedding AS ne FROM embeddings WHERE label = 1),
         |p AS (SELECT q.qid, q.qe, c.nid, c.ne FROM q, c WHERE c.nid <> q.qid),
         |s AS (SELECT qid, nid, ${cosineSql("qe", "ne")} AS cs FROM p),
         |r AS (SELECT qid, nid, ${away("cs", 6)} AS sim FROM s),
         |k AS (SELECT qid, nid, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rnk FROM r)
         |SELECT qid, nid, sim, rnk FROM k WHERE rnk <= 5 ORDER BY qid, rnk""".stripMargin,
    // RRF of the q198 BM25 list and the raw-tf list: exact integer
    // reciprocal terms, missing ranker contributes zero
    "q309_hybrid_rrf_fusion" ->
      raw"""WITH bm AS (SELECT doc_id, rnk AS r1 FROM ($bm25Sql)),
         |tfq AS (SELECT doc_id, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
         |  WHERE w IN ('spark', 'join', 'stream') GROUP BY doc_id),
         |t10 AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY tf DESC, doc_id) AS INTEGER) AS r2
         |  FROM tfq ORDER BY tf DESC, doc_id LIMIT 10),
         |f AS (SELECT COALESCE(bm.doc_id, t10.doc_id) AS doc_id,
         |    COALESCE(CAST(1000000 AS BIGINT) // (60 + r1), 0) + COALESCE(CAST(1000000 AS BIGINT) // (60 + r2), 0) AS rrf_micro,
         |    COALESCE(r1, 0) AS bm25_rank, COALESCE(r2, 0) AS tf_rank
         |  FROM bm FULL JOIN t10 ON t10.doc_id = bm.doc_id)
         |SELECT doc_id, rrf_micro, bm25_rank, tf_rank,
         |  CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS INTEGER) AS fused_rank
         |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10""".stripMargin,
    // restart-resumed streaming census must equal one-pass batch; the
    // checkpoint/state mechanics are the engine-side machinery
    "q310_checkpoint_resume" ->
      """SELECT event_type, count(*) AS n, CAST(1 AS BIGINT) AS resume_eq_batch
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // exact integer waterline: largest fully-fundable prefix, residual
    // budget spread evenly over the capped tail
    "q311_budget_waterfill" ->
      raw"""WITH p AS (SELECT source,
         |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS t_s
         |  FROM documents GROUP BY source),
         |t AS (SELECT CAST(sum(t_s) AS BIGINT) AS tot, count(*) AS ns FROM p),
         |r AS (SELECT source, t_s, CAST(row_number() OVER (ORDER BY t_s, source) AS INTEGER) AS rk,
         |    CAST(sum(t_s) OVER (ORDER BY t_s, source) AS BIGINT) AS cum FROM p),
         |c AS (SELECT r.*, t.tot, t.ns, t.tot * 600 // 1000 AS b,
         |    CASE WHEN cum + (t.ns - rk) * t_s <= t.tot * 600 // 1000 THEN 1 ELSE 0 END AS feas
         |  FROM r, t),
         |k AS (SELECT COALESCE(max(CASE WHEN feas = 1 THEN rk END), 0) AS k,
         |    CAST(COALESCE(max(CASE WHEN feas = 1 THEN cum END), 0) AS BIGINT) AS cumk,
         |    max(b) AS b, max(ns) AS ns, max(tot) AS tot FROM c),
         |w AS (SELECT CASE WHEN ns = k THEN tot ELSE (b - cumk) // (ns - k) END AS waterline FROM k)
         |SELECT p.source, p.t_s,
         |  least(p.t_s, w.waterline) AS alloc_tokens,
         |  CAST(CASE WHEN p.t_s <= w.waterline THEN 1 ELSE 0 END AS BIGINT) AS funded_fully,
         |  w.waterline
         |FROM p, w ORDER BY p.source""".stripMargin,
    // gaps of sorted per-term doc ids, varint width by the exact CASE
    // ladder, top-20 df terms
    "q312_posting_compression" ->
      raw"""WITH p AS (SELECT DISTINCT doc_id, w FROM (
         |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)),
         |top AS (SELECT w, count(*) AS df FROM p GROUP BY w ORDER BY df DESC, w LIMIT 20),
         |g AS (SELECT p.w, p.doc_id,
         |    p.doc_id - COALESCE(lag(p.doc_id) OVER (PARTITION BY p.w ORDER BY p.doc_id), 0) AS gap
         |  FROM p JOIN top ON top.w = p.w),
         |v AS (SELECT w, CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
         |    WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4 ELSE 5 END AS vb FROM g)
         |SELECT v.w AS term, count(*) AS df, count(*) * 8 AS raw_bytes,
         |  CAST(sum(vb) AS BIGINT) AS varint_bytes,
         |  CAST(sum(vb) * 1000 // (count(*) * 8) AS BIGINT) AS compressed_permille
         |FROM v GROUP BY v.w ORDER BY df DESC, term""".stripMargin,
    // HRU benefit table over the 8-cuboid lattice; containment by
    // grouping-id bitmask
    "q313_cube_view_selection" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year FROM lineitem),
        |g AS (SELECT CAST(GROUPING(l_returnflag, l_linestatus, ship_year) AS INTEGER) AS gid
        |  FROM li GROUP BY CUBE (l_returnflag, l_linestatus, ship_year)),
        |s AS (SELECT gid, count(*) AS n_rows FROM g GROUP BY gid),
        |b AS (SELECT n_rows AS base_rows FROM s WHERE gid = 0),
        |d AS (SELECT v.gid, v.n_rows, count(*) AS n_derivable
        |  FROM s v JOIN s w ON (w.gid & v.gid) = v.gid GROUP BY 1, 2)
        |SELECT d.gid,
        |  concat_ws('+', CASE WHEN (d.gid & 4) = 0 THEN 'flag' END,
        |    CASE WHEN (d.gid & 2) = 0 THEN 'status' END,
        |    CASE WHEN (d.gid & 1) = 0 THEN 'year' END) AS cuboid,
        |  d.n_rows, d.n_derivable,
        |  (b.base_rows - d.n_rows) * d.n_derivable AS benefit_rows
        |FROM d, b ORDER BY d.gid""".stripMargin,
    // permille-quantized PAV via the minimax characterization over the
    // bounded occupied-bin lattice (prefix-sum windows, j<=i<=k trio)
    "q314_isotonic_calibration" ->
      raw"""WITH doc AS (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |f AS (SELECT CAST(len(ws) AS BIGINT) AS n_tok,
         |    CAST(len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS BIGINT) * 1000 AS stop_milli,
         |    CAST(len(list_distinct(ws)) AS BIGINT) * 1000 AS div_milli,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos FROM doc),
         |sc AS (SELECT n_tok * 10 + (stop_milli // n_tok) * 3 + (div_milli // n_tok) * 2 AS score, pos FROM f),
         |b AS (SELECT least(score // 100, 49) AS bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS p
         |  FROM sc GROUP BY 1),
         |pre AS (SELECT bin, n, p, CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
         |    CAST(sum(p) OVER (ORDER BY bin) AS BIGINT) AS cp FROM b),
         |mi AS (SELECT i.bin, i.n, i.p, j.bin AS jb,
         |    min((k.cp - (j.cp - j.p)) * 1000 // (k.cn - (j.cn - j.n))) AS mr
         |  FROM pre i JOIN pre j ON j.bin <= i.bin JOIN pre k ON k.bin >= i.bin
         |  GROUP BY 1, 2, 3, 4)
         |SELECT bin, n, p AS n_pos, p * 1000 // n AS rate_permille,
         |  CAST(max(mr) AS BIGINT) AS iso_permille
         |FROM mi GROUP BY bin, n, p ORDER BY bin""".stripMargin,
    // FS m/u estimation: confirmed near-dup pairs vs the deterministic
    // id-shift unmatch pairs; log-odds weights in exact micro-nats
    "q315_fellegi_sunter" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH $minhashCandCtes,
         |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |it AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |conf AS (SELECT it.d1, it.d2
         |  FROM it JOIN sz x ON it.d1 = x.doc_id JOIN sz y ON it.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |dd AS (SELECT doc_id, lang, source, n_chars // 100 AS lb FROM documents),
         |mx AS (SELECT max(doc_id) AS mx FROM dd),
         |unp AS (SELECT d1, d2 FROM (
         |    SELECT a.doc_id AS d1, (a.doc_id + 137) % (mx.mx + 1) AS d2 FROM dd a, mx) s
         |  WHERE d1 < d2 AND EXISTS (SELECT 1 FROM dd WHERE dd.doc_id = s.d2)
         |    AND NOT EXISTS (SELECT 1 FROM conf WHERE conf.d1 = s.d1 AND conf.d2 = s.d2)),
         |fm AS (SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN x.lang = y.lang THEN 1 ELSE 0 END) AS BIGINT) AS al,
         |    CAST(sum(CASE WHEN x.source = y.source THEN 1 ELSE 0 END) AS BIGINT) AS asrc,
         |    CAST(sum(CASE WHEN x.lb = y.lb THEN 1 ELSE 0 END) AS BIGINT) AS alb
         |  FROM conf JOIN dd x ON x.doc_id = conf.d1 JOIN dd y ON y.doc_id = conf.d2),
         |fu AS (SELECT count(*) AS n,
         |    CAST(sum(CASE WHEN x.lang = y.lang THEN 1 ELSE 0 END) AS BIGINT) AS al,
         |    CAST(sum(CASE WHEN x.source = y.source THEN 1 ELSE 0 END) AS BIGINT) AS asrc,
         |    CAST(sum(CASE WHEN x.lb = y.lb THEN 1 ELSE 0 END) AS BIGINT) AS alb
         |  FROM unp JOIN dd x ON x.doc_id = unp.d1 JOIN dd y ON y.doc_id = unp.d2),
         |m AS (SELECT * FROM (VALUES ('1_lang'), ('2_source'), ('3_lenbucket')) t(field)),
         |sm AS (SELECT m.field, fm.n AS n_m,
         |    CASE m.field WHEN '1_lang' THEN fm.al WHEN '2_source' THEN fm.asrc ELSE fm.alb END AS agree_m
         |  FROM m, fm),
         |su AS (SELECT m.field, fu.n AS n_u,
         |    CASE m.field WHEN '1_lang' THEN fu.al WHEN '2_source' THEN fu.asrc ELSE fu.alb END AS agree_u
         |  FROM m, fu)
         |SELECT sm.field, n_m, n_u,
         |  (agree_m + 1) * 1000 // (n_m + 2) AS m_permille,
         |  (agree_u + 1) * 1000 // (n_u + 2) AS u_permille,
         |  ${mn("(agree_m + 1) * (n_u + 2)")} - ${mn("(agree_u + 1) * (n_m + 2)")} AS weight_micro
         |FROM sm JOIN su ON su.field = sm.field ORDER BY sm.field""".stripMargin
    },
    "q316_substring_excise" ->
      """WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |i5 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 4)) AS i FROM w WHERE len(ws) >= 5),
        |sp AS (SELECT doc_id, i AS start,
        |    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] || ' ' || ws[CAST(i AS INTEGER) + 2]
        |      || ' ' || ws[CAST(i AS INTEGER) + 3] || ' ' || ws[CAST(i AS INTEGER) + 4] AS g
        |  FROM i5),
        |dup AS (SELECT g FROM sp GROUP BY g HAVING count(*) >= 2),
        |mk AS (SELECT doc_id, start FROM sp JOIN dup USING (g)),
        |rn AS (SELECT doc_id, start,
        |    CASE WHEN max(start + 5) OVER (PARTITION BY doc_id ORDER BY start
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= start THEN 0 ELSE 1 END AS brk
        |  FROM mk),
        |gr AS (SELECT doc_id, start, sum(brk) OVER (PARTITION BY doc_id ORDER BY start
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp FROM rn),
        |iv AS (SELECT doc_id, grp, count(*) AS n_marks, min(start) AS lo, max(start) + 5 AS hi
        |  FROM gr GROUP BY 1, 2),
        |pd AS (SELECT doc_id, CAST(sum(n_marks) AS BIGINT) AS dup_spans, count(*) AS n_runs,
        |    CAST(sum(hi - lo) AS BIGINT) AS excised
        |  FROM iv GROUP BY 1),
        |tk AS (SELECT doc_id, source, len(ws) AS n_tok FROM w)
        |SELECT tk.source, count(*) AS n_docs, count(pd.doc_id) AS docs_affected,
        |  CAST(sum(tk.n_tok) AS BIGINT) AS total_tokens,
        |  CAST(coalesce(sum(pd.dup_spans), 0) AS BIGINT) AS dup_spans,
        |  CAST(coalesce(sum(pd.n_runs), 0) AS BIGINT) AS merged_runs,
        |  CAST(coalesce(sum(pd.excised), 0) AS BIGINT) AS excised_tokens,
        |  CAST(coalesce(sum(pd.excised), 0) * 1000 // sum(tk.n_tok) AS BIGINT) AS excised_permille
        |FROM tk LEFT JOIN pd ON pd.doc_id = tk.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q317_ams_f2" ->
      s"""WITH fr AS (SELECT w, count(*) AS f FROM
         |    (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents) GROUP BY w),
         |ex AS (SELECT CAST(sum(CAST(f AS HUGEINT) * f) AS HUGEINT) AS f2,
         |    CAST(sum(f) AS BIGINT) AS n_tok, count(*) AS n_vocab FROM fr),
         |sg AS (SELECT r, CAST(sum(CASE WHEN ${hx("w || '#' || r")} % 2 = 0 THEN f ELSE -f END) AS BIGINT) AS s_r
         |  FROM fr, (SELECT unnest(generate_series(0, 31)) AS r) GROUP BY r),
         |gx AS (SELECT r // 4 AS grp, CAST(sum(CAST(s_r AS HUGEINT) * s_r) AS HUGEINT) AS gsum FROM sg GROUP BY 1),
         |md AS (SELECT list_sort(list(gsum)) AS gs FROM gx)
         |SELECT n_tok, n_vocab, CAST(f2 AS BIGINT) AS f2_exact,
         |  CAST((gs[4] + gs[5]) // 8 AS BIGINT) AS f2_est,
         |  CAST(abs((gs[4] + gs[5]) - 8 * f2) * 1000 // (8 * f2) AS BIGINT) AS err_permille
         |FROM md, ex""".stripMargin,
    "q318_dp_histogram" -> {
      def g(tag: String) = {
        val k = s"(${hx(s"source || '|' || lang || '|$tag'")} % 1048576 + 1)"
        s"(19 - (length(bin($k)) - 1) + CASE WHEN ($k & ($k - 1)) = 0 THEN 1 ELSE 0 END)"
      }
      s"""WITH c AS (SELECT source, lang, count(*) AS n_true FROM documents GROUP BY 1, 2),
         |z AS (SELECT source, lang, n_true, CAST(${g("a")} - ${g("b")} AS BIGINT) AS z_noise FROM c)
         |SELECT source, lang, n_true, z_noise,
         |  CAST(greatest(0, n_true + z_noise) AS BIGINT) AS n_released,
         |  CAST(693147 AS BIGINT) AS epsilon_micro
         |FROM z ORDER BY source, lang""".stripMargin
    },
    "q319_phrase_search" ->
      """WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
        |i3 AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w WHERE len(ws) >= 3),
        |sh AS (SELECT doc_id,
        |    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] || ' ' || ws[CAST(i AS INTEGER) + 2] AS g
        |  FROM i3),
        |top AS (SELECT g AS phrase FROM (SELECT g, count(*) AS cnt FROM sh GROUP BY g)
        |  ORDER BY cnt DESC, g LIMIT 1)
        |SELECT doc_id, top.phrase, count(*) AS n_matches
        |FROM sh JOIN top ON sh.g = top.phrase
        |GROUP BY 1, 2 ORDER BY n_matches DESC, doc_id LIMIT 20""".stripMargin,
    "q320_seasonal_decompose" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1),
        |dn AS (SELECT day, n, CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS dnum FROM d),
        |wi AS (SELECT day, n, dnum,
        |    count(*) OVER w7 AS win_days, CAST(sum(n) OVER w7 AS BIGINT) AS win_sum
        |  FROM dn WINDOW w7 AS (ORDER BY dnum RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |it AS (SELECT day, n, dnum % 7 AS dow, win_sum * 1000 // 7 AS trend_milli,
        |    n * 1000 - win_sum * 1000 // 7 AS detr_milli
        |  FROM wi WHERE win_days = 7),
        |sea AS (SELECT dow, CAST(sum(detr_milli) AS BIGINT) // count(*) AS seasonal_milli FROM it GROUP BY 1)
        |SELECT strftime(it.day, '%Y-%m-%d') AS day, it.n, it.trend_milli, sea.seasonal_milli,
        |  it.detr_milli - sea.seasonal_milli AS remainder_milli
        |FROM it JOIN sea USING (dow) ORDER BY it.day""".stripMargin,
    "q321_naive_bayes" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH d0 AS (SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents),
         |tr AS (SELECT * FROM d0 WHERE doc_id % 5 <> 0),
         |te AS (SELECT * FROM d0 WHERE doc_id % 5 = 0),
         |trt AS (SELECT lang AS c, unnest(ws) AS w FROM tr),
         |wc AS (SELECT w, c, count(*) AS cnt FROM trt GROUP BY 1, 2),
         |cs AS (SELECT c, n_c, tok_c FROM
         |    (SELECT lang AS c, count(*) AS n_c FROM tr GROUP BY 1) a JOIN
         |    (SELECT c, CAST(sum(cnt) AS BIGINT) AS tok_c FROM wc GROUP BY 1) b USING (c)),
         |g AS (SELECT (SELECT count(*) FROM tr) AS n_train, (SELECT count(DISTINCT w) FROM trt) AS v),
         |ms AS (SELECT t.doc_id, wc.c, CAST(sum(${mn("wc.cnt + 1")}) AS BIGINT) AS msum
         |  FROM (SELECT doc_id, unnest(ws) AS w FROM te) t JOIN wc ON wc.w = t.w GROUP BY 1, 2),
         |sc AS (SELECT te.doc_id, te.lang, cs.c,
         |    ${mn("cs.n_c")} - ${mn("g.n_train")} + coalesce(ms.msum, 0)
         |      - len(te.ws) * ${mn("cs.tok_c + g.v")} AS score
         |  FROM te CROSS JOIN cs CROSS JOIN g
         |  LEFT JOIN ms ON ms.doc_id = te.doc_id AND ms.c = cs.c),
         |pr AS (SELECT doc_id, lang, c,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rn FROM sc)
         |SELECT lang, c AS pred_lang, count(*) AS n_docs
         |FROM pr WHERE rn = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },
    "q322_jl_distortion" ->
      s"""WITH q AS (SELECT vec_id, i - 1 AS i,
         |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1024) AS BIGINT) AS qi
         |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
         |y AS (SELECT vec_id, j,
         |    CAST(sum(CASE WHEN ${hx("'jl|' || i || '|' || j")} % 2 = 0 THEN qi ELSE -qi END) AS BIGINT) AS yj
         |  FROM q CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j) GROUP BY 1, 2),
         |do2 AS (SELECT a.vec_id, CAST(sum((a.qi - b.qi) * (a.qi - b.qi)) AS BIGINT) AS d2_orig
         |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1 AND b.i = a.i GROUP BY 1),
         |dp2 AS (SELECT a.vec_id, CAST(sum((a.yj - b.yj) * (a.yj - b.yj)) AS BIGINT) AS d2_proj
         |  FROM y a JOIN y b ON b.vec_id = a.vec_id + 1 AND b.j = a.j GROUP BY 1)
         |SELECT ratio_permille // 100 AS bucket, count(*) AS n_pairs FROM
         |  (SELECT d2_proj * 1000 // (16 * d2_orig) AS ratio_permille
         |   FROM do2 JOIN dp2 USING (vec_id) WHERE d2_orig > 0)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q323_late_interaction" ->
      """WITH sub AS (SELECT vec_id, (i - 1) // 4 AS sub, (i - 1) % 4 AS off,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1024) AS BIGINT) AS qi
        |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i FROM embeddings)),
        |p AS (SELECT vec_id, sub,
        |    CAST(sum(CASE WHEN off = 0 THEN qi ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN off = 1 THEN qi ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN off = 2 THEN qi ELSE 0 END) AS BIGINT) AS c2,
        |    CAST(sum(CASE WHEN off = 3 THEN qi ELSE 0 END) AS BIGINT) AS c3
        |  FROM sub GROUP BY 1, 2),
        |qs AS (SELECT vec_id AS qid, sub AS qsub, c0 AS q0, c1 AS q1, c2 AS q2, c3 AS q3
        |  FROM p WHERE vec_id < 5),
        |ds AS (SELECT * FROM p WHERE vec_id >= 5),
        |dots AS (SELECT qs.qid, ds.vec_id AS did, qs.qsub,
        |    max(q0 * c0 + q1 * c1 + q2 * c2 + q3 * c3) AS best
        |  FROM ds CROSS JOIN qs GROUP BY 1, 2, 3),
        |sc AS (SELECT qid, did, CAST(sum(best) AS BIGINT) AS score FROM dots GROUP BY 1, 2),
        |rk AS (SELECT qid, did, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, did) AS rank FROM sc)
        |SELECT qid, rank, did, score FROM rk WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,
    "q324_opq_allocation" -> opqSql,
    "q325_t_closeness" -> {
      def lvl(tag: String, name: String, qi: String) =
        s"""g$tag AS (SELECT $qi AS qi, sv, count(*) AS c FROM ob GROUP BY 1, 2),
           |sz$tag AS (SELECT qi, CAST(sum(c) AS BIGINT) AS n_g FROM g$tag GROUP BY 1),
           |dn$tag AS (SELECT sz$tag.qi, sz$tag.n_g, gl.sv, gl.cg, coalesce(g$tag.c, 0) AS c
           |  FROM sz$tag CROSS JOIN gl LEFT JOIN g$tag ON g$tag.qi = sz$tag.qi AND g$tag.sv = gl.sv),
           |cm$tag AS (SELECT qi, n_g,
           |    abs(sum(CAST(c AS HUGEINT) * gt.n - CAST(cg AS HUGEINT) * n_g)
           |      OVER (PARTITION BY qi ORDER BY sv ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cabs
           |  FROM dn$tag, gt),
           |em$tag AS (SELECT qi, n_g,
           |    CAST(CAST(sum(cabs) AS HUGEINT) * 1000 // (gt.m1 * n_g * gt.n) AS BIGINT) AS emd
           |  FROM cm$tag, gt GROUP BY qi, n_g, gt.m1, gt.n),
           |lv$tag AS (SELECT '$name' AS level, count(*) AS n_groups, max(emd) AS t_max_permille,
           |    CAST(sum(CASE WHEN emd > 333 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
           |    CAST(sum(CASE WHEN emd > 333 THEN n_g ELSE 0 END) * 1000 // sum(n_g) AS BIGINT) AS exposed_permille
           |  FROM em$tag)""".stripMargin
      s"""WITH ob AS (SELECT o_orderpriority AS pri, o_orderdate AS d,
         |    least(CAST(floor(o_totalprice) AS BIGINT) // 50000, 9) AS sv FROM orders),
         |gl AS (SELECT sv, count(*) AS cg FROM ob GROUP BY 1),
         |gt AS (SELECT count(*) AS n, count(DISTINCT sv) - 1 AS m1 FROM ob),
         |${lvl("a", "1_month", "pri || '|' || strftime(d, '%Y-%m')")},
         |${lvl("b", "2_year", "pri || '|' || strftime(d, '%Y')")},
         |${lvl("c", "3_priority", "pri")}
         |SELECT * FROM lva UNION ALL SELECT * FROM lvb UNION ALL SELECT * FROM lvc ORDER BY level""".stripMargin
    },
    "q326_ndcg" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      raw"""WITH g AS (SELECT doc_id,
         |    CAST(CASE WHEN list_contains(ws, 'spark') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(ws, 'join') THEN 1 ELSE 0 END
         |     + CASE WHEN list_contains(ws, 'stream') THEN 1 ELSE 0 END AS BIGINT) AS rel
         |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents)),
         |h AS (SELECT CAST(sum(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
         |    CAST(sum(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |    CAST(sum(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1 FROM g),
         |ranked AS (SELECT doc_id, rnk FROM ($bm25Sql)),
         |ks AS (SELECT CAST(unnest([3, 10]) AS BIGINT) AS k),
         |dc AS (SELECT ks.k, CAST(sum(CAST((1 << CAST(g.rel AS INTEGER)) - 1 AS BIGINT) * 1000000000
         |      // ${mn("r.rnk + 1")}) AS BIGINT) AS dcg_nano
         |  FROM ranked r JOIN g ON g.doc_id = r.doc_id CROSS JOIN ks
         |  WHERE r.rnk <= ks.k GROUP BY ks.k),
         |id AS (SELECT ks.k, CAST(sum(CAST(CASE WHEN pos <= n3 THEN 7
         |      WHEN pos <= n3 + n2 THEN 3 WHEN pos <= n3 + n2 + n1 THEN 1 ELSE 0 END AS BIGINT) * 1000000000
         |      // ${mn("pos + 1")}) AS BIGINT) AS idcg_nano
         |  FROM (SELECT unnest(generate_series(1, 10)) AS pos) p CROSS JOIN h CROSS JOIN ks
         |  WHERE pos <= ks.k GROUP BY ks.k)
         |SELECT dc.k, dc.dcg_nano, id.idcg_nano,
         |  dc.dcg_nano * 1000 // id.idcg_nano AS ndcg_permille
         |FROM dc JOIN id ON id.k = dc.k ORDER BY dc.k""".stripMargin
    },
    "q328_markov_attribution" -> markovSql,
    "q339_timed_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) // 1000 AS us FROM events),
        |v AS (SELECT user_id, min(CASE WHEN event_type = 'view' THEN us END) AS t_view FROM e GROUP BY 1),
        |c AS (SELECT e.user_id, v.t_view,
        |    min(CASE WHEN e.event_type = 'click' AND e.us > v.t_view THEN e.us END) AS t_click_any,
        |    min(CASE WHEN e.event_type = 'click' AND e.us > v.t_view
        |      AND e.us <= v.t_view + 604800000000 THEN e.us END) AS t_click
        |  FROM e JOIN v ON v.user_id = e.user_id GROUP BY 1, 2),
        |p AS (SELECT e.user_id, c.t_view, c.t_click_any, c.t_click,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.us > c.t_click
        |      AND e.us <= c.t_click + 604800000000 THEN e.us END) AS t_purchase
        |  FROM e JOIN c ON c.user_id = e.user_id GROUP BY 1, 2, 3, 4)
        |SELECT count(*) AS n_users, count(t_view) AS n_viewed, count(t_click_any) AS n_clicked_any,
        |  count(t_click) AS n_clicked_7d, count(t_purchase) AS n_purchased_7d
        |FROM p""".stripMargin,
    "q340_lag_features" ->
      """WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n FROM events GROUP BY 1),
        |dn AS (SELECT day, CAST(n AS BIGINT) AS n,
        |    CAST(datediff('day', DATE '1970-01-01', day) AS BIGINT) AS dnum FROM d),
        |w AS (SELECT *,
        |    CASE WHEN lag(dnum) OVER o = dnum - 1 THEN lag(n) OVER o END AS lag1,
        |    max(n) OVER (ORDER BY dnum RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS lag7,
        |    count(*) OVER t7 AS win7, CAST(sum(n) OVER t7 AS BIGINT) AS sum7,
        |    CASE WHEN lead(dnum) OVER o = dnum + 1 THEN lead(n) OVER o END AS target
        |  FROM dn WINDOW o AS (ORDER BY dnum),
        |    t7 AS (ORDER BY dnum RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT strftime(day, '%Y-%m-%d') AS day, n, lag1, lag7, sum7 * 1000 // 7 AS ma7_milli, target
        |FROM w WHERE lag1 IS NOT NULL AND lag7 IS NOT NULL AND win7 = 7 AND target IS NOT NULL
        |ORDER BY day""".stripMargin,
    // bucketing is a physical-layout property; the oracle sees only the
    // relational join-aggregate the bucketed plan must reproduce
    "q341_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*) AS n_lines,
        |  count(DISTINCT o.o_orderkey) AS n_orders,
        |  CAST(sum(CAST(floor(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q342_fd_profile" -> fdProfileSql,
    "q343_join_order_advisor" -> joinOrderSql,
    "q344_sketch_join_estimate" ->
      """WITH seeds(r, ha, hb) AS (VALUES (0, 1299721, 7), (1, 15485863, 101),
        |    (2, 32452843, 1009), (3, 49979687, 10007)),
        |se AS (SELECT r, ((ha * user_id + hb) % 2147483647) % 64 AS bucket, count(*) AS c
        |  FROM events, seeds GROUP BY 1, 2),
        |so AS (SELECT r, ((ha * o_custkey + hb) % 2147483647) % 64 AS bucket, count(*) AS c
        |  FROM orders, seeds GROUP BY 1, 2),
        |ip AS (SELECT se.r, sum(CAST(se.c AS HUGEINT) * so.c) AS ip
        |  FROM se JOIN so ON se.r = so.r AND se.bucket = so.bucket GROUP BY 1),
        |est AS (SELECT min(ip) AS est FROM ip),
        |ex AS (SELECT sum(CAST(fe AS HUGEINT) * fo) AS exact FROM
        |  (SELECT user_id AS k, count(*) AS fe FROM events GROUP BY 1) a JOIN
        |  (SELECT o_custkey AS k, count(*) AS fo FROM orders GROUP BY 1) b USING (k)),
        |ms AS (SELECT * FROM (SELECT count(*) AS n_left FROM events),
        |  (SELECT count(*) AS n_right FROM orders))
        |SELECT CAST(4 AS INTEGER) AS d_rows, CAST(64 AS INTEGER) AS w,
        |  CAST(n_left AS BIGINT) AS n_left, CAST(n_right AS BIGINT) AS n_right,
        |  CAST(exact AS BIGINT) AS exact_pairs, CAST(est AS BIGINT) AS est_pairs,
        |  CAST((est - exact) * 1000 // exact AS BIGINT) AS err_permille,
        |  CAST(CAST(n_left AS HUGEINT) * n_right // 64 * 1000 // exact AS BIGINT) AS bound_permille
        |FROM est, ex, ms""".stripMargin,
    "q345_dp_clipped_mean" -> {
      def g(tag: String) = {
        val k = s"(${hx(s"source || '|$tag'")} % 1048576 + 1)"
        s"(19 - (length(bin($k)) - 1) + CASE WHEN ($k & ($k - 1)) = 0 THEN 1 ELSE 0 END)"
      }
      s"""WITH c AS (SELECT source, count(*) AS n_true,
         |    CAST(sum(least(n_chars, 2000)) AS BIGINT) AS sum_clip FROM documents GROUP BY 1),
         |u AS (SELECT *, sum_clip // 2000 AS units_true FROM c),
         |z AS (SELECT *, greatest(0, units_true + (${g("ua")} - ${g("ub")})) AS units_released,
         |    greatest(1, n_true + (${g("na")} - ${g("nb")})) AS n_released FROM u)
         |SELECT source, n_true, CAST(n_released AS BIGINT) AS n_released,
         |  CAST(units_true AS BIGINT) AS units_true, CAST(units_released AS BIGINT) AS units_released,
         |  CAST(sum_clip // n_true AS BIGINT) AS mean_clip_true,
         |  CAST(units_released * 2000 // n_released AS BIGINT) AS mean_est,
         |  CAST(1386294 AS BIGINT) AS epsilon_micro
         |FROM z ORDER BY source""".stripMargin
    },
    "q346_voptimal_histogram" -> vOptimalSql,
    "q347_mutual_best_matching" -> mutualBestSql,
    "q348_group_kfold" ->
      s"""WITH ev AS (SELECT *, CAST(${hx("'gkf1|' || user_id")} % 5 AS INTEGER) AS fold FROM events),
         |lk AS (SELECT max(nf) AS max_folds_per_user FROM (
         |  SELECT user_id, count(DISTINCT fold) AS nf FROM ev GROUP BY 1)),
         |tt AS (SELECT count(*) AS n_total FROM ev)
         |SELECT fold, count(DISTINCT user_id) AS n_users, count(*) AS n_events,
         |  CAST(count(*) * 1000 // (SELECT n_total FROM tt) AS BIGINT) AS share_permille,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT) AS purchase_permille,
         |  (SELECT CAST(max_folds_per_user AS BIGINT) FROM lk) AS max_folds_per_user
         |FROM ev GROUP BY fold ORDER BY fold""".stripMargin,
    "q349_kendall_tau" ->
      """WITH pp AS (SELECT l_partkey AS partkey,
        |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
        |    CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |top AS (SELECT * FROM pp ORDER BY rev_cents DESC, partkey LIMIT 20),
        |rk AS (SELECT row_number() OVER (ORDER BY rev_cents DESC, partkey) AS ri,
        |    row_number() OVER (ORDER BY qty DESC, partkey) AS qi FROM top)
        |SELECT CAST(20 AS INTEGER) AS k, count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN a.qi < b.qi THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN a.qi > b.qi THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST((sum(CASE WHEN a.qi < b.qi THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN a.qi > b.qi THEN 1 ELSE 0 END)) * 1000 // count(*) AS BIGINT) AS tau_permille
        |FROM rk a JOIN rk b ON a.ri < b.ri""".stripMargin,
    "q350_label_propagation" -> labelPropSql,
    "q351_auc_report" ->
      raw"""WITH d AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws,
         |    CAST(len(regexp_replace(trim(text), '\s+', '', 'g')) AS BIGINT) AS sum_len FROM documents),
         |f AS (SELECT CAST(len(ws) AS BIGINT) AS n_tok, sum_len,
         |    CAST(len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS BIGINT) AS n_stop,
         |    CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct FROM d),
         |sc AS (SELECT n_tok * 10 + (n_stop * 1000 // n_tok) * 3 + (n_distinct * 1000 // n_tok) * 2 AS score,
         |    CASE WHEN n_tok >= 30 AND n_tok <= 600 AND sum_len >= n_tok * 3 AND sum_len <= n_tok * 6
         |      AND n_stop * 50 >= n_tok AND n_distinct * 5 >= n_tok THEN 1 ELSE 0 END AS pos FROM f),
         |bys AS (SELECT score, CAST(sum(pos) AS BIGINT) AS np, CAST(sum(1 - pos) AS BIGINT) AS nn
         |  FROM sc GROUP BY 1),
         |pre AS (SELECT *, CAST(sum(nn) OVER (ORDER BY score) AS BIGINT) - nn AS cumneg FROM bys),
         |ag AS (SELECT CAST(sum(np) AS BIGINT) AS p, CAST(sum(nn) AS BIGINT) AS n,
         |    sum(CAST(np AS HUGEINT) * (2 * cumneg + nn)) AS num2 FROM pre)
         |SELECT p AS n_pos, n AS n_neg,
         |  CAST(num2 * 10000 // (2 * p * n) AS BIGINT) AS auc_permyriad,
         |  CAST(num2 * 10000 // (p * n) - 10000 AS BIGINT) AS gini_permyriad
         |FROM ag""".stripMargin,
    "q352_lof_outliers" -> lofSql,
    "q353_cohens_kappa" -> kappaSql,
    "q354_ucb_index" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      s"""WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type AS arm,
         |    CASE WHEN value >= 50 THEN 1 ELSE 0 END AS succ FROM events),
         |daily AS (SELECT day, arm, count(*) AS t, CAST(sum(succ) AS BIGINT) AS sx FROM ev GROUP BY 1, 2),
         |spine AS (SELECT day, arm FROM (SELECT DISTINCT day FROM ev), (SELECT DISTINCT arm FROM ev)),
         |cum AS (SELECT s.day, s.arm, COALESCE(d.t, 0) AS t, COALESCE(d.sx, 0) AS sx
         |  FROM spine s LEFT JOIN daily d USING (day, arm)),
         |ci AS (SELECT *, CAST(sum(t) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS n_i,
         |    CAST(sum(sx) OVER (PARTITION BY arm ORDER BY day) AS BIGINT) AS s_i FROM cum),
         |dt AS (SELECT day, CAST(sum(t) AS BIGINT) AS dtot FROM daily GROUP BY 1),
         |dn AS (SELECT day, CAST(sum(dtot) OVER (ORDER BY day) AS BIGINT) AS nn FROM dt),
         |wt AS (SELECT ci.*, dn.nn FROM ci JOIN dn USING (day) WHERE n_i > 0),
         |ix AS (SELECT *, s_i * 1000000 // n_i AS mean_micro, ${mn("nn")} AS lnn FROM wt),
         |b AS (SELECT *, 2 * lnn * 1000000 // n_i AS b2 FROM ix),
         |sc AS (SELECT *, CAST(floor(sqrt(CAST(b2 AS DOUBLE))) AS BIGINT) AS s0 FROM b),
         |u AS (SELECT *, mean_micro + (CASE WHEN (s0 + 1) * (s0 + 1) <= b2 THEN s0 + 1
         |    WHEN s0 * s0 > b2 THEN s0 - 1 ELSE s0 END) AS ucb_micro FROM sc),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY day ORDER BY ucb_micro DESC, arm) AS rk FROM u)
         |SELECT strftime(day, '%Y-%m-%d') AS day, arm, n_i,
         |  CAST(mean_micro AS BIGINT) AS mean_micro, CAST(ucb_micro AS BIGINT) AS ucb_micro,
         |  CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_chosen
         |FROM rk ORDER BY day, arm""".stripMargin
    },
    "q355_good_turing" ->
      raw"""WITH w AS (SELECT regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |i3 AS (SELECT ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w WHERE len(ws) >= 3),
         |bg AS (SELECT ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1]
         |    || ' ' || ws[CAST(i AS INTEGER) + 2] AS g FROM i3),
         |fr AS (SELECT g, count(*) AS f FROM bg GROUP BY 1),
         |nr AS (SELECT f AS r, count(*) AS n_r FROM fr GROUP BY 1),
         |tot AS (SELECT CAST(sum(f) AS BIGINT) AS n_tok, count(*) AS n_vocab FROM fr),
         |n1 AS (SELECT CAST(COALESCE(sum(n_r), 0) AS BIGINT) AS n_1 FROM nr WHERE r = 1)
         |SELECT CAST(a.r AS BIGINT) AS r, a.n_r,
         |  CAST(COALESCE(b.n_r, 0) AS BIGINT) AS n_r_plus1,
         |  CAST((a.r + 1) * COALESCE(b.n_r, 0) * 1000 // a.n_r AS BIGINT) AS rstar_permille,
         |  n_tok, n_vocab, CAST(n_1 * 10000 // n_tok AS BIGINT) AS unseen_mass_permyriad
         |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1, tot, n1
         |WHERE a.r <= 5 ORDER BY r""".stripMargin,
    "q356_chi_squared" ->
      """WITH o AS (SELECT source, lang, count(*) AS o FROM documents GROUP BY 1, 2),
        |r AS (SELECT source, CAST(sum(o) AS BIGINT) AS rc FROM o GROUP BY 1),
        |c AS (SELECT lang, CAST(sum(o) AS BIGINT) AS cc FROM o GROUP BY 1),
        |g AS (SELECT r.source, c.lang, CAST(COALESCE(o.o, 0) AS BIGINT) AS o, r.rc, c.cc
        |  FROM r CROSS JOIN c LEFT JOIN o ON o.source = r.source AND o.lang = c.lang),
        |nt AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |dm AS (SELECT (SELECT count(*) FROM r) AS nr, (SELECT count(*) FROM c) AS nc),
        |ag AS (SELECT CAST(sum((CAST(o AS HUGEINT) * n - CAST(rc AS HUGEINT) * cc)
        |      * (CAST(o AS HUGEINT) * n - CAST(rc AS HUGEINT) * cc) * 1000
        |      // (CAST(rc AS HUGEINT) * cc)) AS HUGEINT) AS num, max(n) AS n FROM g, nt),
        |st AS (SELECT n, nr, nc, (nr - 1) * (nc - 1) AS dof,
        |    CAST(num // n AS BIGINT) AS chi2_milli FROM ag, dm),
        |v2 AS (SELECT *, chi2_milli * 1000 // (n * least(nr - 1, nc - 1)) AS v2 FROM st),
        |sq AS (SELECT *, CAST(floor(sqrt(CAST(v2 AS DOUBLE))) AS BIGINT) AS s0 FROM v2)
        |SELECT n, nr AS n_rows, nc AS n_cols, CAST(dof AS BIGINT) AS dof, chi2_milli,
        |  CAST(CASE WHEN (s0 + 1) * (s0 + 1) <= v2 THEN s0 + 1
        |    WHEN s0 * s0 > v2 THEN s0 - 1 ELSE s0 END AS BIGINT) AS cramers_v_permille
        |FROM sq""".stripMargin,
    // erased-index serve: the SAME training (erasure never retrains),
    // with the cohort removed from candidates and queries — exactly
    // what serving from the rewritten corpus_cells/pq_codes tables
    // must produce; the audit flag is pinned so any erased id that
    // leaks into the served top-k fails the hash
    "q357_erasure_stored_index" ->
      s"""SELECT qid, nid, sim, rnk, CAST(1 AS BIGINT) AS no_erased_hit
         |FROM (${annIvfPqSqlK(3, candPred = " AND c.nid % 20 <> 0", probePred = " AND vid % 20 <> 0")}) t
         |ORDER BY qid, rnk""".stripMargin,
    // delta-append serve: quantizers TRAINED on the old corpus only
    // (append never retrains), assignment/codes/serving over everyone
    // — exactly what serving from the appended tables must produce
    "q377_ann_delta_append" ->
      s"""SELECT qid, nid, sim, rnk,
         |  CAST(CASE WHEN nid % 10 = 7 THEN 1 ELSE 0 END AS BIGINT) AS is_new_hit
         |FROM (${annIvfPqSqlK(3, trainPred = "vid % 10 <> 7")}) t
         |ORDER BY qid, rnk""".stripMargin,
    // the fold replayed as zone arithmetic: zones = k // w in min
    // order, three zones per output group (the tail group takes two);
    // per-group censuses from the zone ranges; eq_stats / eq_content
    // earned in-engine (derived stats ≡ verification scan, compacted
    // fingerprint ≡ original)
    "q420_manifest_compaction" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |z AS (SELECT (k // wdt.w) // 3 AS g, k FROM o, wdt)
        |SELECT g AS "group", CAST(CASE WHEN g = 2 THEN 2 ELSE 3 END AS BIGINT) AS n_files_in,
        |  count(*) AS n_rows, min(k) AS min_k, max(k) AS max_k,
        |  CAST(1 AS BIGINT) AS eq_stats, CAST(8 AS BIGINT) AS n_files_before,
        |  CAST(3 AS BIGINT) AS n_files_after, CAST(1 AS BIGINT) AS eq_content
        |FROM z GROUP BY g ORDER BY g""".stripMargin,
    // the race outcomes are protocol constants (commuting intents both
    // land; a duplicate delete lands exactly once with the fought-over
    // file as the overlap), and the final census is schedule-
    // independent: all rows minus the k%6=2 delete cohort plus the
    // k%5=0 append batch (keys +10^7)
    "q419_occ_concurrency" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |d AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 6 = 2),
        |a AS (SELECT count(*) AS n, CAST(sum(k) + 10000000 * count(*) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 5 = 0),
        |b AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |f AS (SELECT b.n - d.n + a.n AS n, b.kk - d.kk + a.kk AS kk,
        |    b.cc - d.cc + a.cc AS cc FROM b, d, a)
        |SELECT '1_commuting_race' AS phase, CAST(2 AS BIGINT) AS n_committed,
        |  CAST(0 AS BIGINT) AS n_conflicted, CAST(0 AS BIGINT) AS overlap_exact,
        |  f.n AS n_rows_final, f.kk AS key_checksum, f.cc AS cents_checksum FROM f
        |UNION ALL SELECT '2_duplicate_race', 1, 1, 1, f.n, f.kk, f.cc FROM f
        |ORDER BY phase""".stripMargin,
    // the maintained view re-derived as the head-state aggregate:
    // survivors (k%18<>2) carry the k%9=4 update (+30 cents), the
    // appended batch (k%4=0, keys +10^7) lands in the same k%10
    // groups; eq_recompute earned in-engine per group, 3 micro-batches
    "q418_streaming_cdf_ivm" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |f AS (
        |  SELECT k % 10 AS g, cents + CASE WHEN k % 9 = 4 THEN 30 ELSE 0 END AS c
        |  FROM o WHERE k % 18 <> 2
        |  UNION ALL SELECT k % 10, cents FROM o WHERE k % 4 = 0
        |)
        |SELECT g, count(*) AS n_rows, CAST(sum(c) AS BIGINT) AS cents_sum,
        |  CAST(1 AS BIGINT) AS eq_recompute, CAST(3 AS BIGINT) AS n_batches
        |FROM f GROUP BY g ORDER BY g""".stripMargin,
    // the pruned semi-join re-derived: build side = March-1996 ship
    // keys, files scanned = the build keys' distinct zones (k // w),
    // matched fact census = the build keys' orders rows; eq_full
    // earned in-engine (pruned census ≡ full-scan census)
    "q417_manifest_join_pruning" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |b AS (SELECT DISTINCT l_orderkey AS k FROM lineitem
        |  WHERE l_shipdate BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'),
        |zc AS (SELECT count(DISTINCT b.k // wdt.w) AS nz FROM b, wdt),
        |m AS (SELECT count(*) AS n, CAST(sum(o.k) AS BIGINT) AS kk,
        |    CAST(sum(o.cents) AS BIGINT) AS cc FROM o WHERE o.k IN (SELECT k FROM b))
        |SELECT 'dpp_scan' AS scan, CAST(8 AS BIGINT) AS n_files_total, zc.nz AS n_files_scanned,
        |  m.n AS n_rows, m.kk AS key_checksum, m.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS eq_full FROM zc, m""".stripMargin,
    // phase 1 = the whole-table aggregates (stats-served, earned
    // equal to the scan in-engine); phase 2 = a LEGACY DV (no
    // cardinality): the DV-subtracted scan answer, the naive stats
    // overcount pinned to the tombstoned cohort (k%10=3), and the eq
    // bits as 0 SENTINELS (no metadata answer was computed); phase 3
    // = a stats-complete DV (k%10=7 on a fresh log): COUNT(*) stays
    // log arithmetic (rows − dvRows, eq_count_meta earned in-engine),
    // MIN/MAX honestly ineligible
    "q416_metadata_only_agg" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |a AS (SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM o),
        |b AS (SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM o WHERE k % 10 <> 3),
        |d AS (SELECT count(*) AS n FROM o WHERE k % 10 = 3),
        |c AS (SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM o WHERE k % 10 <> 7),
        |e AS (SELECT count(*) AS n FROM o WHERE k % 10 = 7)
        |SELECT '1_stats_only' AS phase, CAST(1 AS BIGINT) AS meta_eligible,
        |  CAST(1 AS BIGINT) AS count_meta_eligible, a.n AS n_rows,
        |  a.mn AS min_k, a.mx AS max_k, CAST(0 AS BIGINT) AS n_meta_overcount,
        |  CAST(1 AS BIGINT) AS eq_meta_scan, CAST(1 AS BIGINT) AS eq_count_meta FROM a
        |UNION ALL SELECT '2_dv_in_force', 0, 0, b.n, b.mn, b.mx, d.n, 0, 0 FROM b, d
        |UNION ALL SELECT '3_dv_rows_in_log', 0, 1, c.n, c.mn, c.mx, e.n, 0, 1 FROM c, e
        |ORDER BY phase""".stripMargin,
    // the four SQL-visible versions re-derived from the statement
    // cohorts: v1 = even keys, v2 = all, v3 = +100 cents on k%5=0,
    // v4 = v3 minus k%7=0; eq_current / missing_refused /
    // expired_refused earned in-engine (AS-OF-head ≡ plain read;
    // VERSION AS OF 99 refuses; after expireHistory(3) VERSION AS OF
    // 2 refuses AS EXPIRED while v3/v4 keep serving their censuses)
    "q415_sql_time_travel" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 = 0),
        |v2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |v3 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END) AS BIGINT) AS cc FROM o),
        |v4 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END) AS BIGINT) AS cc
        |  FROM o WHERE k % 7 <> 0)
        |SELECT CAST(1 AS BIGINT) AS version, v1.n AS n_rows, v1.kk AS key_checksum,
        |  v1.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_current,
        |  CAST(1 AS BIGINT) AS missing_refused, CAST(1 AS BIGINT) AS expired_refused FROM v1
        |UNION ALL SELECT 2, v2.n, v2.kk, v2.cc, 1, 1, 1 FROM v2
        |UNION ALL SELECT 3, v3.n, v3.kk, v3.cc, 1, 1, 1 FROM v3
        |UNION ALL SELECT 4, v4.n, v4.kk, v4.cc, 1, 1, 1 FROM v4
        |ORDER BY version""".stripMargin,
    // the SCD2 ledger re-derived from the cohort predicates: inserts
    // k%11=0 (+10^7), updates k%12=7 (pre+post = 2 rows each in the
    // feed), deletes k%21=2; open/closed counts follow; eq_current /
    // eq_asof earned in-engine (current ≡ head read, as-of slice ≡
    // every version's direct read)
    "q414_scd2_from_feed" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |a AS (SELECT count(*) AS n FROM o),
        |i AS (SELECT count(*) AS n FROM o WHERE k % 11 = 0),
        |u AS (SELECT count(*) AS n FROM o WHERE k % 12 = 7),
        |d AS (SELECT count(*) AS n FROM o WHERE k % 21 = 2)
        |SELECT CAST(2 AS BIGINT) AS version, i.n AS n_changes, a.n + i.n AS n_open_after,
        |  CAST(0 AS BIGINT) AS n_closed_after, CAST(1 AS BIGINT) AS eq_current,
        |  CAST(1 AS BIGINT) AS eq_asof FROM a, i
        |UNION ALL SELECT 3, 2 * u.n, a.n + i.n, u.n, 1, 1 FROM a, i, u
        |UNION ALL SELECT 4, d.n, a.n + i.n - d.n, u.n + d.n, 1, 1 FROM a, i, u, d
        |ORDER BY version""".stripMargin,
    // the pruned range scan re-derived: bucket width from max(k), the
    // predicate spans buckets 0-1 exactly (2 of 8 files planned);
    // eq_full earned in-engine (pruned census ≡ full-scan census)
    "q413_manifest_file_skipping" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |m AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE k BETWEEN w // 2 AND w + w // 2)
        |SELECT 'range_scan' AS scan, CAST(8 AS BIGINT) AS n_files_total,
        |  CAST(2 AS BIGINT) AS n_files_scanned, m.n AS n_rows, m.kk AS key_checksum,
        |  m.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_full FROM m""".stripMargin,
    // per-batch staging censuses from the mod-3 cohorts (m2's nulls =
    // the k%6=2 slice), publish verdicts from the audit rule, final
    // main = the clean cohorts exactly; poison census earned 0
    "q412_streaming_wap" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |m0 AS (SELECT count(*) AS n FROM o WHERE k % 3 = 0),
        |m1 AS (SELECT count(*) AS n FROM o WHERE k % 3 = 1),
        |m2 AS (SELECT count(*) AS n FROM o WHERE k % 3 = 2),
        |nn AS (SELECT count(*) AS n FROM o WHERE k % 6 = 2),
        |fin AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE k % 3 <> 2)
        |SELECT 'batch_m0' AS batch, m0.n AS n_staged_rows, CAST(0 AS BIGINT) AS n_null_keys,
        |  CAST(1 AS BIGINT) AS published, fin.n AS n_main_rows, fin.kk AS main_key_checksum,
        |  CAST(0 AS BIGINT) AS n_poison_visible FROM m0, fin
        |UNION ALL SELECT 'batch_m1', m1.n, 0, 1, fin.n, fin.kk, 0 FROM m1, fin
        |UNION ALL SELECT 'batch_m2', m2.n, nn.n, 0, fin.n, fin.kk, 0 FROM m2, nn, fin
        |ORDER BY batch""".stripMargin,
    // fact censuses from the nationkey split; dangling is 0 at every
    // LOG version by the atomic joint commit (earned in-engine via
    // the anti-join census), while the torn read (fact@v2 ⋈ dim@v1 —
    // what two independent logs permit) dangles every new fact row
    "q411_multitable_commit" ->
      """WITH c AS (SELECT c_custkey AS ck, c_nationkey AS nk FROM customer),
        |a AS (SELECT count(*) AS n, CAST(sum(ck) AS BIGINT) AS kk FROM c WHERE nk < 15),
        |b AS (SELECT count(*) AS n, CAST(sum(ck) AS BIGINT) AS kk FROM c),
        |t AS (SELECT count(*) AS n FROM c WHERE nk >= 15)
        |SELECT '1_initial' AS phase, CAST(1 AS BIGINT) AS version, a.n AS n_fact_rows,
        |  a.kk AS fact_key_checksum, CAST(0 AS BIGINT) AS n_dangling,
        |  t.n AS n_dangling_torn FROM a, t
        |UNION ALL SELECT '2_joint_commit', 2, b.n, b.kk, 0, t.n FROM b, t
        |ORDER BY phase""".stripMargin,
    // the rollback replayed as arithmetic: bad append = k%13=0 keys
    // +10^7, bad delete = the k%9=1 cohort, restore returns the
    // initial census exactly; eq_restored earned in-engine, n_commits
    // pins the intact audit trail (genesis + 4 commits)
    "q409_restore_version" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |a AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o),
        |bd AS (SELECT count(*) AS n, CAST(sum(k) + 10000000 * count(*) AS BIGINT) AS kk
        |    FROM o WHERE k % 13 = 0),
        |d9 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE k % 9 = 1)
        |SELECT '1_initial' AS phase, CAST(1 AS BIGINT) AS version, a.n AS n_rows,
        |  a.kk AS key_checksum, CAST(1 AS BIGINT) AS eq_restored,
        |  CAST(5 AS BIGINT) AS n_commits FROM a
        |UNION ALL SELECT '2_bad_append', 2, a.n + bd.n, a.kk + bd.kk, 1, 5 FROM a, bd
        |UNION ALL SELECT '3_bad_delete', 3, a.n + bd.n - d9.n, a.kk + bd.kk - d9.kk, 1, 5 FROM a, bd, d9
        |UNION ALL SELECT '4_restored', 4, a.n, a.kk, 1, 5 FROM a
        |ORDER BY phase""".stripMargin,
    // retained censuses re-derived from the cohort predicates; the
    // protocol facts (pin refusal, one orphaned file, expired-read
    // refusal, retained equality) are earned in-engine and pinned
    "q410_snapshot_expiration" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |r AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE k % 9 <> 0),
        |s AS (SELECT count(*) AS n, CAST(sum(k) + 10000000 * count(*) AS BIGINT) AS kk
        |    FROM o WHERE k % 7 = 0)
        |SELECT '1_retained_horizon' AS phase, CAST(2 AS BIGINT) AS version, r.n AS n_rows,
        |  r.kk AS key_checksum, CAST(1 AS BIGINT) AS refused_while_pinned,
        |  CAST(1 AS BIGINT) AS n_orphaned, CAST(1 AS BIGINT) AS v1_refuses,
        |  CAST(1 AS BIGINT) AS eq_retained FROM r
        |UNION ALL SELECT '2_retained_head', 3, r.n + s.n, r.kk + s.kk, 1, 1, 1, 1 FROM r, s
        |ORDER BY phase""".stripMargin,
    // late-interaction MaxSim with IVF token routing: the q36 Lloyd
    // training over ALL token vectors (each embedding row IS a token:
    // vid//8 = doc, vid%8 = position, cap < 6), corpus tokens in their
    // top-1 cell, query tokens probing top-2; candidate doc pairs from
    // cell co-residence; score = Σ_qtoken max_dtoken away(cosine, 6dp)
    // summed as DECIMAL(25,6) (the q190 ADC discipline); brute top-3
    // over ALL pairs is the recall truth joined back per routed row
    "q408_multivector_maxsim" ->
      s"""WITH ${IvfSqlBits.lloydCtes},
         |sfq AS (SELECT v.vid, v.e, c.j, ${IvfSqlBits.score("v", "c")} AS s FROM v, c2 c),
         |asg AS (SELECT vid, j AS cell, rn FROM (SELECT vid, j,
         |    row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sfq) t
         |  WHERE rn <= 2),
         |tok AS (SELECT vid, vid // 8 AS did, e FROM v WHERE vid % 8 < 6),
         |cor AS (SELECT t.did AS ddid, a.cell FROM tok t JOIN asg a ON a.vid = t.vid AND a.rn = 1
         |  WHERE t.did >= 3),
         |prb AS (SELECT t.did AS qdid, a.cell FROM tok t JOIN asg a ON a.vid = t.vid
         |  WHERE t.did < 3),
         |cand AS (SELECT DISTINCT p.qdid, c.ddid FROM prb p JOIN cor c ON p.cell = c.cell),
         |qt AS (SELECT did AS qdid, vid AS qvid, e AS qe FROM tok WHERE did < 3),
         |dt AS (SELECT did AS ddid, e AS de FROM tok WHERE did >= 3),
         |ct AS (SELECT qt.qdid, dt.ddid, qt.qvid, ${away(cosineSql("qt.qe", "dt.de"), 6)} AS c FROM qt, dt),
         |bb AS (SELECT qdid, ddid, qvid, max(c) AS best FROM ct GROUP BY 1, 2, 3),
         |sc AS MATERIALIZED (SELECT qdid, ddid,
         |    CAST(sum(CAST(best AS DECIMAL(25,6))) AS DOUBLE) AS score FROM bb GROUP BY 1, 2),
         |bt AS (SELECT qdid, ddid FROM (SELECT qdid, ddid,
         |    row_number() OVER (PARTITION BY qdid ORDER BY score DESC, ddid) AS rnk FROM sc) t
         |  WHERE rnk <= 3),
         |rt AS (SELECT s.qdid, s.ddid, s.score,
         |    CAST(row_number() OVER (PARTITION BY s.qdid ORDER BY s.score DESC, s.ddid) AS INTEGER) AS rnk
         |  FROM sc s JOIN cand ON cand.qdid = s.qdid AND cand.ddid = s.ddid)
         |SELECT r.qdid AS qid, r.rnk, r.ddid AS did, r.score,
         |  CAST(CASE WHEN b.ddid IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS brute_hit
         |FROM rt r LEFT JOIN bt b ON b.qdid = r.qdid AND b.ddid = r.ddid
         |WHERE r.rnk <= 3 ORDER BY qid, rnk""".stripMargin,
    // the streaming serve is q377's appended-index serve row-for-row
    // — micro-batching and the mid-stream compaction swap must both
    // be invisible; eq_batch (vs the one batch serve) and two_batches
    // (the swap actually interleaved) are earned in-engine
    "q407_streaming_ann_serve" ->
      s"""SELECT qid, nid, sim, rnk,
         |  CAST(1 AS BIGINT) AS eq_batch, CAST(1 AS BIGINT) AS two_batches
         |FROM (${annIvfPqSqlK(3, trainPred = "vid % 10 <> 7")}) t
         |ORDER BY qid, rnk""".stripMargin,
    // post-evolution state: NULL tier = legacy rows the backfill never
    // touched; NULLS FIRST pins Spark's ascending null order
    "q391_schema_evolution_v2" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |d AS (SELECT k, cents,
        |    CASE WHEN k % 3 = 0 THEN (CASE WHEN cents >= 20000000 THEN 'gold' ELSE 'std' END) END AS tier
        |  FROM o)
        |SELECT tier, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS cents_checksum,
        |  CAST(1 AS BIGINT) AS eq_declarative
        |FROM d GROUP BY tier ORDER BY tier NULLS FIRST""".stripMargin,
    // column-level PII classification of the fixture report — plan
    // metadata, pinned literally
    "q389_pii_flow" ->
      """SELECT * FROM (VALUES
        |  ('avg_order', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('customer_name', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('nation_code', CAST(1 AS BIGINT), CAST(1 AS BIGINT)),
        |  ('spend', CAST(0 AS BIGINT), CAST(0 AS BIGINT))
        |) AS t(out_col, n_sensitive_sources, contains_pii)
        |ORDER BY out_col""".stripMargin,
    // the four pair producers re-derived (minhash confirm, simhash
    // pigeonhole, winnow overlap, exact digests), unioned per method,
    // matrix from one pair-keyed self-join
    "q392_dedup_agreement" -> {
      // the winnow chain's CTE names collide with the shingle chain's
      // (both define `idx`) — rename its four CTEs, word-bounded
      val winnowRenamed = Seq("idx" -> "widx", "wmin" -> "wwmin", "fps" -> "wfps", "g" -> "wg")
        .foldLeft(winnowFpsCtes) { case (acc, (a, b)) => acc.replaceAll(s"\\b$a\\b", b) }
      s"""WITH $minhashCandCtes,
         |msz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
         |mit AS (SELECT c.d1, c.d2, count(*) AS inter FROM cand c
         |  JOIN sh a ON a.doc_id = c.d1 JOIN sh b ON b.doc_id = c.d2 AND b.g = a.g
         |  GROUP BY 1, 2),
         |mh AS (SELECT mit.d1, mit.d2 FROM mit
         |  JOIN msz x ON mit.d1 = x.doc_id JOIN msz y ON mit.d2 = y.doc_id
         |  WHERE inter * 2 >= x.n_sh + y.n_sh - inter),
         |ex AS (SELECT a.doc_id AS d1, b.doc_id AS d2 FROM documents a
         |  JOIN documents b ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id),
         |sg AS (SELECT doc_id, simhash FROM ($simhashSql)),
         |sblk AS MATERIALIZED (SELECT doc_id, simhash, bi, (simhash >> (bi * 8)) & 255 AS bv
         |  FROM sg, (SELECT unnest(generate_series(0, 3)) AS bi)),
         |sm AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM sblk a JOIN sblk b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |$winnowRenamed,
         |wstop AS (SELECT fp FROM wfps GROUP BY fp HAVING count(*) > 20),
         |wkept AS MATERIALIZED (SELECT doc_id, fp FROM wfps WHERE fp NOT IN (SELECT fp FROM wstop)),
         |wn AS (SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM wkept a JOIN wkept b ON a.fp = b.fp AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 5),
         |u AS MATERIALIZED (
         |  SELECT '1_exact' AS m, d1, d2 FROM ex
         |  UNION SELECT '2_minhash', d1, d2 FROM mh
         |  UNION SELECT '3_simhash', d1, d2 FROM sm
         |  UNION SELECT '4_winnow', d1, d2 FROM wn),
         |mn(m) AS (VALUES ('1_exact'), ('2_minhash'), ('3_simhash'), ('4_winnow')),
         |szs AS (SELECT mn.m, COALESCE(c.n, CAST(0 AS BIGINT)) AS n FROM mn
         |  LEFT JOIN (SELECT m, count(*) AS n FROM u GROUP BY m) c ON c.m = mn.m),
         |pw AS (SELECT a.m AS method_a, b.m AS method_b, count(*) AS nc
         |  FROM u a JOIN u b ON a.d1 = b.d1 AND a.d2 = b.d2 AND a.m < b.m GROUP BY 1, 2),
         |mp(method_a, method_b) AS (VALUES
         |  ('1_exact', '2_minhash'), ('1_exact', '3_simhash'), ('1_exact', '4_winnow'),
         |  ('2_minhash', '3_simhash'), ('2_minhash', '4_winnow'), ('3_simhash', '4_winnow'))
         |SELECT mp.method_a, mp.method_b, x.n AS n_a, y.n AS n_b,
         |  COALESCE(pw.nc, CAST(0 AS BIGINT)) AS n_common,
         |  COALESCE(pw.nc, 0) * 1000 // greatest(x.n + y.n - COALESCE(pw.nc, 0), 1) AS jaccard_permille
         |FROM mp JOIN szs x ON x.m = mp.method_a JOIN szs y ON y.m = mp.method_b
         |LEFT JOIN pw ON pw.method_a = mp.method_a AND pw.method_b = mp.method_b
         |ORDER BY mp.method_a, mp.method_b""".stripMargin
    },
    // Chao1 from the hash-seeded 10% sample vs the exact NDV
    "q390_chao_ndv" -> {
      val h = hx("CAST(o_orderkey AS VARCHAR) || '|chao'")
      s"""WITH sm AS (SELECT o_custkey FROM orders WHERE $h % 10 = 0),
         |fr AS (SELECT o_custkey, count(*) AS c FROM sm GROUP BY 1),
         |st AS (SELECT count(*) AS d_sample,
         |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2 FROM fr),
         |tt AS (SELECT count(*) AS n_rows, count(DISTINCT o_custkey) AS exact_ndv FROM orders),
         |ns AS (SELECT count(*) AS n_sample FROM sm),
         |ch AS (SELECT *, d_sample * 1000 + f1 * (f1 - 1) * 500 // (f2 + 1) AS chao_milli
         |  FROM st, tt, ns)
         |SELECT n_rows, n_sample, d_sample, f1, f2, CAST(chao_milli AS BIGINT) AS chao_milli, exact_ndv,
         |  CAST((chao_milli - exact_ndv * 1000) * 1000 // (exact_ndv * 1000) AS BIGINT) AS err_permille,
         |  CAST((d_sample - exact_ndv) * 1000 // exact_ndv AS BIGINT) AS naive_err_permille
         |FROM ch""".stripMargin
    },
    // batch digests probe the stored digest set; verdicts per new doc
    "q387_incremental_exact_dedup" ->
      """WITH d AS (SELECT doc_id, md5(text) AS dg FROM documents),
        |st AS (SELECT DISTINCT dg FROM d WHERE doc_id % 5 <> 0),
        |nb AS (SELECT doc_id, dg FROM d WHERE doc_id % 5 = 0),
        |bk AS (SELECT dg, min(doc_id) AS batch_keeper FROM nb GROUP BY dg)
        |SELECT nb.doc_id,
        |  CAST(CASE WHEN st.dg IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_store,
        |  bk.batch_keeper,
        |  CASE WHEN st.dg IS NOT NULL THEN 'dup_of_store'
        |    WHEN nb.doc_id <> bk.batch_keeper THEN 'dup_in_batch'
        |    ELSE 'unique' END AS verdict
        |FROM nb LEFT JOIN st ON st.dg = nb.dg JOIN bk ON bk.dg = nb.dg
        |ORDER BY nb.doc_id""".stripMargin,
    // three layouts, one box: the Hilbert chain is the ENGINE's own
    // generated SQL text (operators/SpaceFill) — shared verbatim
    "q388_hilbert_layout" -> {
      val zBits = (0 until 6)
        .map(i => s"(((db >> $i) & 1) * ${1L << (2 * i + 1)} + ((pb >> $i) & 1) * ${1L << (2 * i)})")
        .mkString(" + ")
      val hChain = graft.operators.SpaceFill
        .levels(6)
        .zipWithIndex
        .map { case (sv, k) =>
          val (nx, ny, dt) = graft.operators.SpaceFill.hilbertStep(sv, s"x$k", s"y$k")
          s"h${k + 1} AS (SELECT db, pb, $nx AS x${k + 1}, $ny AS y${k + 1}, d$k + $dt AS d${k + 1} FROM h$k)"
        }
        .mkString(",\n")
      def audit(src: String, fileExpr: String, name: String): String =
        s"""SELECT '$name' AS layout, count(*) AS n_files,
           |  CAST(sum(CASE WHEN hi_d >= 10 AND lo_d <= 19 AND hi_p >= 10 AND lo_p <= 19 THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
           |  CAST(sum(CASE WHEN hi_d >= 10 AND lo_d <= 19 AND hi_p >= 10 AND lo_p <= 19 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           |  CAST(sum(n_rows) AS BIGINT) AS rows_total
           |FROM (SELECT $fileExpr AS f, count(*) AS n_rows,
           |    min(db) AS lo_d, max(db) AS hi_d, min(pb) AS lo_p, max(pb) AS hi_p
           |  FROM $src GROUP BY 1)""".stripMargin
      s"""WITH b AS (SELECT
         |    least(date_diff('day', DATE '1992-01-01', o_orderdate) // 64, 63) AS db,
         |    least(CAST(floor(o_totalprice / 10000) AS BIGINT), 63) AS pb
         |  FROM orders),
         |h0 AS (SELECT db, pb, db AS x0, pb AS y0, CAST(0 AS BIGINT) AS d0 FROM b),
         |$hChain,
         |mt AS (SELECT count(*) AS rows_matched FROM b
         |  WHERE db BETWEEN 10 AND 19 AND pb BETWEEN 10 AND 19),
         |au AS (${audit("h6", "d6 // 64", "hilbert")}
         |  UNION ALL
         |  ${audit("b", s"(($zBits)) // 64", "zorder")}
         |  UNION ALL
         |  ${audit("b", "(db * 64 + pb) // 64", "date_major")})
         |SELECT layout, n_files, files_touched, rows_total, rows_scanned,
         |  (SELECT rows_matched FROM mt) AS rows_matched,
         |  CAST(rows_scanned * 1000 // rows_total AS BIGINT) AS scan_permille,
         |  CAST((SELECT rows_matched FROM mt) * 1000 // greatest(rows_scanned, 1) AS BIGINT) AS hit_permille
         |FROM au ORDER BY layout""".stripMargin
    },
    // Procrustes drift: grid-exact cross moments, MᵀM through the
    // SHARED unrolled Jacobi chain, Σ√eigenvalues in rank order —
    // every double a fixed-order chain, replayed per variant
    "q386_procrustes_drift" -> {
      val dims = 6
      val ds = 1 to dims
      def variant(tag: String, bExpr: Int => String): String = {
        val grid = ds.map(i => s"CAST(floor(e[$i] * 32768.0) AS BIGINT) AS a$i") ++
          ds.map(i => s"CAST(floor((${bExpr(i)}) * 32768.0) AS BIGINT) AS b$i")
        val sums = Seq("count(*) AS n") ++
          ds.map(i => s"sum(a$i * a$i) AS ta$i") ++
          ds.map(i => s"sum(b$i * b$i) AS tb$i") ++
          (for { i <- ds; j <- ds } yield s"sum(a$i * b$j) AS m$i$j")
        val mCols = (for { i <- ds; j <- ds } yield s"CAST(m$i$j AS DOUBLE) / 1073741824.0 AS m$i$j")
          .mkString(", ")
        val mtmCols = (for { i <- ds; j <- ds } yield s"(${ds.map(k => s"m$k$i * m$k$j").mkString(" + ")}) AS a$i$j") ++
          (for { i <- ds; j <- ds } yield s"${if (i == j) "1.0" else "0.0"} AS v$i$j")
        val (rotations, last) = jacobiRotationCtes(dims)
        val egRows = ds.map(j => s"SELECT $j AS idx, a$j$j AS ev FROM $last").mkString("\nUNION ALL ")
        val ranks = ds
          .map(k => s"b$k AS MATERIALIZED (SELECT * FROM eg ORDER BY ev DESC, idx LIMIT 1 OFFSET ${k - 1})")
          .mkString(",\n")
        val trA = ds.map(i => s"CAST(st.ta$i AS DOUBLE) / 1073741824.0").mkString(" + ")
        val trB = ds.map(i => s"CAST(st.tb$i AS DOUBLE) / 1073741824.0").mkString(" + ")
        val trace = ds.map(i => s"mm.m$i$i").mkString(" + ")
        val sigma = ds.map(k => s"sqrt(greatest(b$k.ev, 0.0))").mkString(" + ")
        s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
           |q AS (SELECT ${grid.mkString(", ")} FROM e),
           |st AS MATERIALIZED (SELECT ${sums.mkString(", ")} FROM q),
           |mm AS MATERIALIZED (SELECT $mCols FROM st),
           |j0 AS MATERIALIZED (SELECT ${mtmCols.mkString(", ")} FROM mm),
           |$rotations,
           |eg AS MATERIALIZED ($egRows),
           |$ranks
           |SELECT '$tag' AS variant, st.n AS n_vectors,
           |  ${away(s"(($trA) + ($trB)) - 2.0 * ($trace)", 6)} AS naive_sq,
           |  ${away(s"(($trA) + ($trB)) - 2.0 * ($sigma)", 6)} AS aligned_sq
           |FROM st, mm, ${ds.map(k => s"b$k").mkString(", ")}""".stripMargin
      }
      def noiseExpr(i: Int) =
        s"CAST((${hx(s"CAST(vec_id AS VARCHAR) || '|pd$i'")} % 2001 - 1000) AS DOUBLE) / 100000.0"
      def bRot(i: Int) = if (i == 1) s"-e[$dims]" else s"e[${i - 1}]"
      s"""SELECT * FROM (
         |(${variant("1_rotated", bRot)})
         |UNION ALL
         |(${variant("2_rotated_noisy", i => s"${bRot(i)} + ${noiseExpr(i)}")})
         |) ORDER BY variant""".stripMargin
    },
    // per-source vs global dedup census over md5 digests (q24 parity)
    "q384_dedup_scope" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS dg FROM documents),
        |g AS (SELECT dg, count(DISTINCT source) AS n_src_g, min(doc_id) AS keeper_global
        |  FROM d GROUP BY dg),
        |sg AS (SELECT dg, source, min(doc_id) AS keeper_src FROM d GROUP BY dg, source)
        |SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN d.doc_id <> sg.keeper_src THEN 1 ELSE 0 END) AS BIGINT) AS drop_per_source,
        |  CAST(sum(CASE WHEN d.doc_id <> g.keeper_global THEN 1 ELSE 0 END) AS BIGINT) AS drop_global,
        |  CAST(sum(CASE WHEN g.n_src_g > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_cross_digest,
        |  CAST(sum(CASE WHEN d.doc_id <> g.keeper_global THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN d.doc_id <> sg.keeper_src THEN 1 ELSE 0 END) AS BIGINT) AS missed_by_per_source
        |FROM d JOIN g ON g.dg = d.dg JOIN sg ON sg.dg = d.dg AND sg.source = d.source
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // the expected lineage edge set, pinned literally — plan metadata
    // has one right answer
    "q385_column_lineage" ->
      """SELECT * FROM (VALUES
        |  ('avg_order_value', 'orders', 'o_orderkey'),
        |  ('avg_order_value', 'orders', 'o_totalprice'),
        |  ('c_mktsegment', 'customer', 'c_mktsegment'),
        |  ('n_orders', 'orders', 'o_orderkey'),
        |  ('revenue', 'orders', 'o_totalprice')
        |) AS t(out_col, src_table, src_col)
        |ORDER BY out_col, src_table, src_col""".stripMargin,
    // DP quantile: utilities over the token-count support, q376's
    // integer geometric noise per support value, argmax = the release
    "q381_dp_quantile" -> {
      def g(tag: String) = {
        val k = s"(${hx(s"CAST(v AS VARCHAR) || '|$tag'")} % 1048576 + 1)"
        s"(19 - (length(bin($k)) - 1) + CASE WHEN ($k & ($k - 1)) = 0 THEN 1 ELSE 0 END)"
      }
      raw"""WITH d AS (SELECT CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS v FROM documents),
         |tt AS (SELECT count(*) AS n FROM d),
         |h AS (SELECT v, count(*) AS cnt FROM d GROUP BY v),
         |c AS (SELECT v, cnt, CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_le FROM h),
         |u AS (SELECT v, cnt, n_le, -abs(n_le * 2 - (SELECT n FROM tt)) AS utility FROM c),
         |z AS (SELECT *, CAST(${g("dqa")} - ${g("dqb")} AS BIGINT) AS z_noise FROM u),
         |y AS (SELECT *, utility + z_noise AS u_noisy FROM z),
         |w AS (SELECT v AS winner FROM y ORDER BY u_noisy DESC, v LIMIT 1),
         |tm AS (SELECT v AS true_med FROM y ORDER BY utility DESC, v LIMIT 1)
         |SELECT v, cnt, n_le, CAST(utility AS BIGINT) AS utility, z_noise,
         |  CAST(u_noisy AS BIGINT) AS u_noisy,
         |  CAST(CASE WHEN v = (SELECT winner FROM w) THEN 1 ELSE 0 END AS BIGINT) AS is_winner,
         |  CAST(CASE WHEN (SELECT winner FROM w) = (SELECT true_med FROM tm) THEN 1 ELSE 0 END AS BIGINT) AS argmax_preserved,
         |  CAST(693147 AS BIGINT) AS epsilon_micro
         |FROM y ORDER BY v""".stripMargin
    },
    // incremental winnow probe: the store's own df census is the stop
    // list (frozen — arrivals don't reshape the index they probe)
    "q382_incremental_winnow" ->
      s"""WITH $winnowFpsCtes,
        |fm AS MATERIALIZED (SELECT * FROM fps),
        |st AS (SELECT doc_id, fp FROM fm WHERE doc_id % 5 <> 0),
        |nb AS (SELECT doc_id, fp FROM fm WHERE doc_id % 5 = 0),
        |stop AS (SELECT fp FROM st GROUP BY fp HAVING count(*) > 20),
        |ks AS (SELECT * FROM st WHERE fp NOT IN (SELECT fp FROM stop)),
        |kb AS (SELECT * FROM nb WHERE fp NOT IN (SELECT fp FROM stop)),
        |szs AS (SELECT doc_id, count(*) AS n_fp FROM ks GROUP BY doc_id),
        |szb AS (SELECT doc_id, count(*) AS n_fp FROM kb GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS new_id, b.doc_id AS old_id, count(*) AS n_shared
        |  FROM kb a JOIN ks b ON a.fp = b.fp GROUP BY 1, 2)
        |SELECT pr.new_id, pr.old_id, n_shared,
        |  n_shared * 1000 // least(x.n_fp, y.n_fp) AS containment_permille
        |FROM pr JOIN szb x ON pr.new_id = x.doc_id JOIN szs y ON pr.old_id = y.doc_id
        |WHERE n_shared >= 5 ORDER BY new_id, old_id""".stripMargin,
    // the q380 final state again — per-batch merges over key-disjoint
    // chunks compose to the one-shot merge; multi_batch pinned
    "q383_streaming_merge" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |snap AS (SELECT * FROM o WHERE k % 10 <> 0),
        |upd AS (SELECT k FROM snap WHERE k % 7 = 0),
        |del AS (SELECT k FROM snap WHERE k % 13 = 0 AND k % 7 <> 0),
        |dr AS (SELECT k, st,
        |    CASE WHEN k % 10 <> 0 AND k % 7 = 0 THEN cents + 100000 ELSE cents END AS cents
        |  FROM o WHERE NOT (k % 10 <> 0 AND k % 13 = 0 AND k % 7 <> 0)),
        |aa AS (SELECT st, count(*) AS n_after FROM dr GROUP BY st),
        |du AS (SELECT s.st, count(*) AS n_updated FROM upd JOIN snap s ON s.k = upd.k GROUP BY s.st),
        |dd AS (SELECT s.st, count(*) AS n_deleted FROM del JOIN snap s ON s.k = del.k GROUP BY s.st)
        |SELECT aa.st AS o_orderstatus, n_after,
        |  COALESCE(n_updated, 0) AS n_updated, COALESCE(n_deleted, 0) AS n_deleted,
        |  CAST(1 AS BIGINT) AS eq_declarative, CAST(1 AS BIGINT) AS multi_batch
        |FROM aa LEFT JOIN du ON du.st = aa.st LEFT JOIN dd ON dd.st = aa.st
        |ORDER BY o_orderstatus""".stripMargin,
    // q269's fixture through real MERGE INTO: same final state, both
    // equality flags pinned (the engine earns them from the data)
    "q380_merge_into" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |snap AS (SELECT * FROM o WHERE k % 10 <> 0),
        |upd AS (SELECT k FROM snap WHERE k % 7 = 0),
        |del AS (SELECT k FROM snap WHERE k % 13 = 0 AND k % 7 <> 0),
        |dr AS (SELECT k, st,
        |    CASE WHEN k % 10 <> 0 AND k % 7 = 0 THEN cents + 100000 ELSE cents END AS cents
        |  FROM o WHERE NOT (k % 10 <> 0 AND k % 13 = 0 AND k % 7 <> 0)),
        |aa AS (SELECT st, count(*) AS n_after FROM dr GROUP BY st),
        |du AS (SELECT s.st, count(*) AS n_updated FROM upd JOIN snap s ON s.k = upd.k GROUP BY s.st),
        |dd AS (SELECT s.st, count(*) AS n_deleted FROM del JOIN snap s ON s.k = del.k GROUP BY s.st)
        |SELECT aa.st AS o_orderstatus, n_after,
        |  COALESCE(n_updated, 0) AS n_updated, COALESCE(n_deleted, 0) AS n_deleted,
        |  CAST(1 AS BIGINT) AS eq_declarative, CAST(1 AS BIGINT) AS eq_procedural
        |FROM aa LEFT JOIN du ON du.st = aa.st LEFT JOIN dd ON dd.st = aa.st
        |ORDER BY o_orderstatus""".stripMargin,
    // vacuum safety: manifests are re-read from disk (they survive the
    // vacuum by construction); pinned answers re-derived from the
    // logical orders table; the expired version reports NULLs — after
    // the vacuum nothing can read it, which is the point
    "q379_vacuum_safety" ->
      """WITH m AS (SELECT version, dir, file_name, file_size
        |  FROM read_parquet('/tmp/graft_vacuum/sf0.01/manifests/*.parquet')),
        |req AS (SELECT DISTINCT dir, file_name FROM m WHERE version IN (2, 3)),
        |pv AS (SELECT version, count(*) AS n_files, CAST(sum(file_size) AS BIGINT) AS manifest_bytes
        |  FROM m GROUP BY 1),
        |rc AS (SELECT version, count(*) AS nr, CAST(sum(file_size) AS BIGINT) AS br
        |  FROM m ANTI JOIN req USING (dir, file_name) GROUP BY 1),
        |o2 AS (SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS ck FROM orders WHERE o_orderdate < DATE '1998-01-01'),
        |o3 AS (SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS ck FROM orders WHERE o_orderdate < DATE '1999-01-01'),
        |a AS (
        |  SELECT 1 AS version, CAST(0 AS BIGINT) AS pinned, CAST(NULL AS BIGINT) AS n_rows,
        |    CAST(NULL AS BIGINT) AS key_checksum, CAST(NULL AS BIGINT) AS eq_after_vacuum
        |  UNION ALL SELECT 2, 1, (SELECT n FROM o2), (SELECT ck FROM o2), 1
        |  UNION ALL SELECT 3, 1, (SELECT n FROM o3), (SELECT ck FROM o3), 1)
        |SELECT CAST(pv.version AS INTEGER) AS version, pinned, pv.n_files, pv.manifest_bytes,
        |  COALESCE(rc.nr, CAST(0 AS BIGINT)) AS n_files_reclaimed,
        |  COALESCE(rc.br, CAST(0 AS BIGINT)) AS bytes_reclaimed,
        |  n_rows, key_checksum, eq_after_vacuum
        |FROM pv LEFT JOIN rc USING (version) JOIN a USING (version)
        |ORDER BY version""".stripMargin,
    // incremental SemDeDup: centroids frozen on the existing corpus
    // (trainPred), batch assigned by the same quantizer, hits counted
    // against old keepers and smaller-id batchmates only. corpus is
    // MATERIALIZED: five consumers would otherwise re-derive the whole
    // Lloyd chain per reference
    "q378_incremental_semdedup" -> {
      val dim = 64
      def dotD(a: String, b: String) =
        s"list_sum(list_transform(generate_series(1, $dim), i -> $a.e[CAST(i AS INTEGER)] * $b.e[CAST(i AS INTEGER)]))"
      def cos(a: String, b: String) =
        away(s"${dotD(a, b)} / sqrt(${dotD(a, a)} * ${dotD(b, b)})", 6)
      s"""WITH ${coarseCellCtesTrain("vid % 10 <> 7")},
         |cm AS MATERIALIZED (SELECT * FROM corpus),
         |oa AS (SELECT * FROM cm WHERE vid % 10 <> 7),
         |na AS (SELECT * FROM cm WHERE vid % 10 = 7),
         |od AS (SELECT DISTINCT b.vid FROM oa a JOIN oa b ON a.cell = b.cell AND a.vid < b.vid
         |  WHERE ${cos("a", "b")} >= 0.4),
         |ok AS MATERIALIZED (SELECT * FROM oa WHERE vid NOT IN (SELECT vid FROM od)),
         |kh AS (SELECT n.vid, count(*) AS n_keeper_hits FROM na n JOIN ok k ON n.cell = k.cell
         |  WHERE ${cos("n", "k")} >= 0.4 GROUP BY n.vid),
         |bh AS (SELECT x.vid, count(*) AS n_batch_hits FROM na x JOIN na y ON x.cell = y.cell AND y.vid < x.vid
         |  WHERE ${cos("x", "y")} >= 0.4 GROUP BY x.vid),
         |kc AS (SELECT cell, count(*) AS n_old_keepers FROM ok GROUP BY cell)
         |SELECT na.vid AS vec_id, na.cell,
         |  COALESCE(kc.n_old_keepers, CAST(0 AS BIGINT)) AS n_old_keepers,
         |  COALESCE(kh.n_keeper_hits, CAST(0 AS BIGINT)) AS n_keeper_hits,
         |  COALESCE(bh.n_batch_hits, CAST(0 AS BIGINT)) AS n_batch_hits,
         |  CAST(CASE WHEN COALESCE(kh.n_keeper_hits, 0) + COALESCE(bh.n_batch_hits, 0) = 0
         |    THEN 1 ELSE 0 END AS BIGINT) AS kept
         |FROM na LEFT JOIN kh ON kh.vid = na.vid LEFT JOIN bh ON bh.vid = na.vid
         |LEFT JOIN kc ON kc.cell = na.cell
         |ORDER BY vec_id""".stripMargin
    },
    // full + old fixpoints via recursive CTEs; the engine's maintained
    // labels must equal the full recompute bit-for-bit (eq_full earned
    // per row), relabeled = new node or member of a touched component
    "q358_incremental_clusters" ->
      s"""WITH RECURSIVE pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |sym AS (SELECT d1 AS src, d2 AS dst FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
         |),
         |full_lbl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |opairs AS (SELECT d1, d2 FROM pairs WHERE d1 % 5 <> 0 AND d2 % 5 <> 0),
         |osym AS (SELECT d1 AS src, d2 AS dst FROM opairs UNION ALL SELECT d2, d1 FROM opairs),
         |oreach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents WHERE doc_id % 5 <> 0
         |  UNION
         |  SELECT oreach.id, osym.dst FROM oreach JOIN osym ON oreach.r = osym.src
         |),
         |old_lbl AS (SELECT id, min(r) AS cluster FROM oreach GROUP BY id),
         |dep AS (SELECT d1 AS id FROM pairs WHERE d1 % 5 = 0 OR d2 % 5 = 0
         |  UNION SELECT d2 FROM pairs WHERE d1 % 5 = 0 OR d2 % 5 = 0),
         |aff AS (SELECT DISTINCT ol.cluster FROM old_lbl ol JOIN dep ON dep.id = ol.id)
         |SELECT f.id AS doc_id, f.cluster,
         |  CAST(CASE WHEN f.id % 5 = 0 OR ol.cluster IN (SELECT cluster FROM aff)
         |    THEN 1 ELSE 0 END AS BIGINT) AS relabeled,
         |  CAST(1 AS BIGINT) AS eq_full
         |FROM full_lbl f LEFT JOIN old_lbl ol ON ol.id = f.id
         |ORDER BY doc_id""".stripMargin,
    // per-(doc, track) sample-table mirror: the builder's arithmetic
    // (mp4TrackSamples / mp4Params) recomputed from content length —
    // the box walk must recover every column from the bytes
    "q359_mp4_sample_tables" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |p AS (SELECT doc_id, n,
        |    CASE CAST(n % 4 AS INTEGER) WHEN 0 THEN 600 WHEN 1 THEN 1000
        |      WHEN 2 THEN 48000 ELSE 90000 END AS ts,
        |    CAST(1 + n % 3 AS INTEGER) AS tracks FROM m),
        |t AS (SELECT doc_id, n, ts, CAST(unnest(generate_series(1, tracks)) AS INTEGER) AS tid FROM p),
        |s AS (SELECT doc_id, tid, ts, n,
        |    CAST(8 + ((n + 13 * tid) % 40) AS INTEGER) AS ns,
        |    1 + n % 500 AS d1,
        |    1 + (3 * n + tid) % 500 AS d2,
        |    1 + (n + tid) % 7 AS spc FROM t),
        |x AS (SELECT doc_id, tid, ts, ns, spc,
        |    CAST((ns // 2) * d1 + (ns - ns // 2) * d2 AS BIGINT) AS ticks,
        |    CASE WHEN tid % 2 = 1 THEN CAST(ns AS BIGINT) * (64 + n % 1024)
        |         ELSE CAST(list_sum(list_transform(generate_series(0, ns - 1),
        |           i -> 32 + ((n + 11 * i) % 992))) AS BIGINT) END AS total_bytes
        |  FROM s)
        |SELECT doc_id, tid AS track_id, CAST(ts AS INTEGER) AS timescale, ns AS n_samples,
        |  ticks AS duration_ticks,
        |  CAST(ticks * 1000 // ts AS BIGINT) AS duration_ms,
        |  total_bytes,
        |  CAST(total_bytes // ns AS BIGINT) AS mean_sample_size,
        |  CAST((ns + spc - 1) // spc AS INTEGER) AS n_chunks
        |FROM x ORDER BY doc_id, track_id""".stripMargin,
    // q274's KN formulas with the seen-trigram branch gated on
    // c3 >= min_count and the backoff weight renormalized per context
    // (λ = (3K + 4S)/(4·c2) — pruned mass S redistributed through P2;
    // K=N1+, S=0 reproduces q274 at min_count=1), swept over three
    // pruning levels in one pass; the bigram reference is P2 = N2/D2
    "q360_pruned_trigram_lm" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val h = hx("CAST(doc_id AS VARCHAR)")
      raw"""WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws,
         |    ($h % 10 = 0) AS is_test FROM documents),
         |tg AS (SELECT doc_id, is_test, ws[i] AS u, ws[i+1] AS v, ws[i+2] AS w FROM (
         |    SELECT doc_id, is_test, ws, unnest(generate_series(1, len(ws) - 2)) AS i
         |    FROM d WHERE len(ws) >= 3)),
         |t3 AS (SELECT u, v, w, count(*) AS c3 FROM tg WHERE NOT is_test GROUP BY 1, 2, 3),
         |bgr AS (SELECT doc_id, is_test, ws[i] AS lft, ws[i+1] AS rgt FROM (
         |    SELECT doc_id, is_test, ws, unnest(generate_series(1, len(ws) - 1)) AS i
         |    FROM d WHERE len(ws) >= 2)),
         |cnt AS (SELECT lft, rgt, count(*) AS c FROM bgr WHERE NOT is_test GROUP BY 1, 2),
         |lc AS (SELECT lft, CAST(sum(c) AS BIGINT) AS cl, count(*) AS n1p FROM cnt GROUP BY lft),
         |rc AS (SELECT rgt, count(*) AS nleft FROM cnt GROUP BY rgt),
         |ct AS (SELECT (SELECT count(*) FROM cnt) + (SELECT count(*) FROM rc) + 1 AS denc),
         |lv AS (SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS min_count),
         |fs AS (SELECT count(*) AS n_tri_types_full FROM t3),
         |kp AS (SELECT min_count, count(*) AS n_tri_types_kept FROM t3, lv
         |  WHERE c3 >= min_count GROUP BY 1),
         |x3 AS (SELECT u, v, min_count, CAST(sum(c3) AS BIGINT) AS c2,
         |    CAST(sum(CASE WHEN c3 >= min_count THEN 1 ELSE 0 END) AS BIGINT) AS kcnt,
         |    CAST(sum(CASE WHEN c3 < min_count THEN c3 ELSE 0 END) AS BIGINT) AS smass
         |  FROM t3, lv GROUP BY 1, 2, 3),
         |sc AS (SELECT lv.min_count, t3.c3, x3.c2, x3.kcnt * 3 + x3.smass * 4 AS lam_num,
         |    cnt.c, lc.cl, lc.n1p,
         |    COALESCE(rc.nleft, 0) + 1 AS numc, ct.denc
         |  FROM tg CROSS JOIN lv
         |  LEFT JOIN t3 ON t3.u = tg.u AND t3.v = tg.v AND t3.w = tg.w
         |  LEFT JOIN x3 ON x3.u = tg.u AND x3.v = tg.v AND x3.min_count = lv.min_count
         |  LEFT JOIN cnt ON cnt.lft = tg.v AND cnt.rgt = tg.w
         |  LEFT JOIN lc ON lc.lft = tg.v
         |  LEFT JOIN rc ON rc.rgt = tg.w, ct
         |  WHERE tg.is_test),
         |ev AS (SELECT min_count, c3, c2, lam_num,
         |    CASE WHEN c IS NOT NULL THEN (4 * c - 3) * denc + n1p * numc * 3
         |         WHEN cl IS NOT NULL THEN n1p * numc * 3 ELSE numc END AS n2,
         |    CASE WHEN cl IS NOT NULL THEN 4 * cl * denc ELSE denc END AS d2
         |  FROM sc),
         |lp AS (SELECT min_count,
         |    CASE WHEN c3 IS NOT NULL AND c3 >= min_count THEN 1 ELSE 0 END AS hit,
         |    ${mn("n2")} - ${mn("d2")} AS lp_bi,
         |    CASE WHEN c3 IS NOT NULL AND c3 >= min_count
         |           THEN ${mn("(4 * c3 - 3) * d2 + lam_num * n2")} - ${mn("4 * c2")} - ${mn("d2")}
         |         WHEN c2 IS NOT NULL
         |           THEN ${mn("lam_num * n2")} - ${mn("4 * c2")} - ${mn("d2")}
         |         ELSE ${mn("n2")} - ${mn("d2")} END AS lp,
         |    CASE WHEN (c3 IS NULL OR c3 < min_count) AND c2 IS NOT NULL THEN 1 ELSE 0 END AS bb,
         |    CASE WHEN c2 IS NULL THEN 1 ELSE 0 END AS bf
         |  FROM ev),
         |ag AS (SELECT min_count, count(*) AS n_test_trigrams,
         |    CAST(sum(hit) AS BIGINT) AS n_tri_hits,
         |    CAST(sum(bb) AS BIGINT) AS n_backoff_bigram,
         |    CAST(sum(bf) AS BIGINT) AS n_backoff_full,
         |    CAST(sum(lp) AS BIGINT) AS sum_lp,
         |    CAST(sum(lp_bi) AS BIGINT) AS sum_lp_bi
         |  FROM lp GROUP BY 1)
         |SELECT min_count, (SELECT n_tri_types_full FROM fs) AS n_tri_types_full,
         |  n_tri_types_kept,
         |  n_tri_types_kept * 1000 // (SELECT n_tri_types_full FROM fs) AS kept_permille,
         |  n_test_trigrams, n_tri_hits, n_backoff_bigram, n_backoff_full,
         |  sum_lp // n_test_trigrams AS mean_lp_micro,
         |  (sum_lp - sum_lp_bi) // n_test_trigrams AS gain_vs_bigram_micro
         |FROM ag JOIN kp USING (min_count) ORDER BY min_count""".stripMargin
    },
    "q361_histogram_join_advisor" -> histogramJoinSql,
    // stss sync indices (1, 1+g, …) priced against stsz sizes — the
    // builder's arithmetic recomputed; the demux must recover the plan
    // from the boxes alone
    "q362_keyframe_plan" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |p AS (SELECT doc_id, n, CAST(1 + n % 3 AS INTEGER) AS tracks FROM m),
        |t AS (SELECT doc_id, n, CAST(unnest(generate_series(1, tracks)) AS INTEGER) AS tid FROM p),
        |s AS (SELECT doc_id, tid, n,
        |    CAST(8 + ((n + 13 * tid) % 40) AS INTEGER) AS ns,
        |    CAST(2 + ((n + tid) % 5) AS INTEGER) AS g FROM t),
        |y AS (SELECT *, CAST((ns + g - 1) // g AS INTEGER) AS n_sync,
        |    1 + ((ns + g - 1) // g - 1) * g AS last_idx FROM s),
        |x AS (SELECT doc_id, tid, ns, g, n_sync,
        |    CASE WHEN tid % 2 = 1 THEN CAST(n_sync AS BIGINT) * (64 + n % 1024)
        |      ELSE CAST(list_sum(list_transform(generate_series(0, n_sync - 1),
        |        j -> 32 + ((n + 11 * (j * g)) % 992))) AS BIGINT) END AS planned_bytes,
        |    CASE WHEN tid % 2 = 1 THEN CAST(ns AS BIGINT) * (64 + n % 1024)
        |      ELSE CAST(list_sum(list_transform(generate_series(0, ns - 1),
        |        i -> 32 + ((n + 11 * i) % 992))) AS BIGINT) END AS total_bytes,
        |    CASE WHEN tid % 2 = 1 THEN CAST(last_idx - 1 AS BIGINT) * (64 + n % 1024)
        |      ELSE CAST(COALESCE(list_sum(list_transform(generate_series(0, last_idx - 2),
        |        i -> 32 + ((n + 11 * i) % 992))), 0) AS BIGINT) END AS last_sync_offset
        |  FROM y)
        |SELECT doc_id, tid AS track_id, ns AS n_samples, n_sync,
        |  CAST(CASE WHEN n_sync >= 2 THEN g ELSE 0 END AS INTEGER) AS sync_stride,
        |  planned_bytes, total_bytes, last_sync_offset,
        |  CAST(planned_bytes * 1000 // total_bytes AS BIGINT) AS fetch_permille
        |FROM x ORDER BY doc_id, track_id""".stripMargin,
    // Morton interleave + per-file zone maps for both layouts; the
    // same 2-D box predicate priced against each
    "q363_zorder_layout" -> {
      val zBits = (0 until 6)
        .map(i => s"(((db >> $i) & 1) * ${1L << (2 * i + 1)} + ((pb >> $i) & 1) * ${1L << (2 * i)})")
        .mkString(" + ")
      def audit(fileExpr: String, name: String): String =
        s"""SELECT '$name' AS layout, count(*) AS n_files,
           |  CAST(sum(CASE WHEN hi_d >= 10 AND lo_d <= 19 AND hi_p >= 10 AND lo_p <= 19 THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
           |  CAST(sum(CASE WHEN hi_d >= 10 AND lo_d <= 19 AND hi_p >= 10 AND lo_p <= 19 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           |  CAST(sum(n_rows) AS BIGINT) AS rows_total
           |FROM (SELECT $fileExpr AS f, count(*) AS n_rows,
           |    min(db) AS lo_d, max(db) AS hi_d, min(pb) AS lo_p, max(pb) AS hi_p
           |  FROM b GROUP BY 1)""".stripMargin
      s"""WITH b AS (SELECT
         |    least(date_diff('day', DATE '1992-01-01', o_orderdate) // 64, 63) AS db,
         |    least(CAST(floor(o_totalprice / 10000) AS BIGINT), 63) AS pb
         |  FROM orders),
         |mt AS (SELECT count(*) AS rows_matched FROM b
         |  WHERE db BETWEEN 10 AND 19 AND pb BETWEEN 10 AND 19),
         |au AS (${audit(s"(($zBits)) // 64", "zorder")}
         |  UNION ALL
         |  ${audit("(db * 64 + pb) // 64", "date_major")})
         |SELECT layout, n_files, files_touched, rows_total, rows_scanned,
         |  (SELECT rows_matched FROM mt) AS rows_matched,
         |  CAST(rows_scanned * 1000 // rows_total AS BIGINT) AS scan_permille,
         |  CAST((SELECT rows_matched FROM mt) * 1000 // greatest(rows_scanned, 1) AS BIGINT) AS hit_permille
         |FROM au ORDER BY layout""".stripMargin
    },
    // priority q = w*2^20 // u with hash-seeded u; top-32 by (q desc,
    // id) with the 33rd priority as threshold; ŵ = max(w, τ) audited
    // against the true token total
    "q364_priority_sample" ->
      raw"""WITH d AS (SELECT doc_id,
         |    greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT), 1) AS w
         |  FROM documents),
         |q AS (SELECT doc_id, w,
         |    w * 1048576 // (${hx("'ps|' || doc_id")} % 1048576 + 1) AS q FROM d),
         |rk AS (SELECT doc_id, w, q, row_number() OVER (ORDER BY q DESC, doc_id) AS rk FROM q),
         |ta AS (SELECT q AS tau FROM rk WHERE rk = 33),
         |tt AS (SELECT count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS total_tokens FROM d),
         |sm AS (SELECT doc_id, w, q AS priority, (SELECT tau FROM ta) AS tau,
         |    greatest(w, (SELECT tau FROM ta)) AS w_hat FROM rk WHERE rk <= 32),
         |es AS (SELECT CAST(sum(w_hat) AS BIGINT) AS est_total_tokens FROM sm)
         |SELECT doc_id, w, priority, tau, w_hat, n_docs, total_tokens, est_total_tokens,
         |  CAST((est_total_tokens - total_tokens) * 1000 // total_tokens AS BIGINT) AS err_permille
         |FROM sm, tt, es ORDER BY priority DESC, doc_id""".stripMargin,
    // hash-derived {0,1,2} Poisson-bootstrap counts, 32 replicate
    // means, 2nd/31st order statistics as the interval
    "q365_bootstrap_ci" ->
      raw"""WITH d AS (SELECT doc_id,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS w FROM documents),
         |r AS (SELECT CAST(unnest(generate_series(0, 31)) AS INTEGER) AS b),
         |x AS (SELECT b, w, ${hx("'bs' || b || '|' || doc_id")} % 4 AS hm FROM d, r),
         |c AS (SELECT b, w, CASE WHEN hm = 0 THEN 0 WHEN hm = 1 THEN 2 ELSE 1 END AS c FROM x),
         |mm AS (SELECT CAST(b AS BIGINT) AS b,
         |    CAST(sum(c * w) * 1000 // greatest(sum(c), 1) AS BIGINT) AS mean_milli
         |  FROM c GROUP BY b),
         |sl AS (SELECT mean_milli AS boot_lo_milli FROM (
         |  SELECT mean_milli, row_number() OVER (ORDER BY mean_milli, b) AS rn FROM mm) WHERE rn = 2),
         |sh AS (SELECT mean_milli AS boot_hi_milli FROM (
         |  SELECT mean_milli, row_number() OVER (ORDER BY mean_milli DESC, b) AS rn FROM mm) WHERE rn = 2),
         |tt AS (SELECT count(*) AS n_docs, CAST(sum(w) AS BIGINT) AS total_tokens FROM d)
         |SELECT n_docs, total_tokens,
         |  CAST(total_tokens * 1000 // n_docs AS BIGINT) AS mean_milli,
         |  CAST(32 AS INTEGER) AS n_replicates, boot_lo_milli, boot_hi_milli,
         |  boot_hi_milli - boot_lo_milli AS width_milli,
         |  CAST(CASE WHEN total_tokens * 1000 // n_docs BETWEEN boot_lo_milli AND boot_hi_milli
         |    THEN 1 ELSE 0 END AS BIGINT) AS point_in_interval
         |FROM tt, sl, sh""".stripMargin,
    // four unrolled peeling rounds: per-edge triangle support via the
    // wedge join, keep support >= 1 (k=3), census per round
    "q366_ktruss" -> {
      val rows = (1 to 4)
        .map(r =>
          s"""SELECT CAST($r AS INTEGER) AS round,
             |  (SELECT count(*) FROM e${r - 1}) AS n_edges_before,
             |  (SELECT count(*) FROM e$r) AS n_edges_after""".stripMargin
        )
        .mkString("\nUNION ALL\n")
      s"""WITH $trussRoundCtes,
         |cen AS ($rows)
         |SELECT round, n_edges_before, n_edges_after,
         |  n_edges_before - n_edges_after AS n_removed,
         |  CAST(CASE WHEN n_edges_before = n_edges_after THEN 1 ELSE 0 END AS BIGINT) AS is_fixpoint
         |FROM cen ORDER BY round""".stripMargin
    },
    // the peel's final edge set re-clustered (recursive CTE fixpoint)
    // against the full clustering — truss components refine clusters
    "q374_truss_split_audit" ->
      s"""WITH RECURSIVE $trussRoundCtes,
         |fsym AS (SELECT d1 AS src, d2 AS dst FROM prs UNION ALL SELECT d2, d1 FROM prs),
         |reach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT reach.id, fsym.dst FROM reach JOIN fsym ON reach.r = fsym.src
         |),
         |full_lbl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |tsym AS (SELECT lo AS src, hi AS dst FROM e4 UNION ALL SELECT hi, lo FROM e4),
         |treach(id, r) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT treach.id, tsym.dst FROM treach JOIN tsym ON treach.r = tsym.src
         |),
         |truss_lbl AS (SELECT id, min(r) AS tcluster FROM treach GROUP BY id),
         |sz AS (SELECT tcluster, count(*) AS part_size FROM truss_lbl GROUP BY 1),
         |j AS (SELECT f.cluster, t.tcluster, sz.part_size
         |  FROM full_lbl f JOIN truss_lbl t ON t.id = f.id JOIN sz ON sz.tcluster = t.tcluster),
         |g AS (SELECT cluster, count(*) AS n_docs, count(DISTINCT tcluster) AS n_truss_parts,
         |    CAST(sum(CASE WHEN part_size >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_in_core,
         |    CAST(sum(CASE WHEN part_size = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cut_loose
         |  FROM j GROUP BY 1)
         |SELECT cluster, n_docs, n_truss_parts, n_in_core, n_cut_loose,
         |  CAST(CASE WHEN n_truss_parts > 1 THEN 1 ELSE 0 END AS BIGINT) AS split
         |FROM g WHERE n_docs >= 2 ORDER BY cluster""".stripMargin,
    // q273's seeded packing order at two budgets; cross-doc ordered
    // token pairs per shard = S² − Σlᵢ²
    "q375_packing_contamination" ->
      raw"""WITH d AS (SELECT doc_id,
         |    ${hx("CAST(doc_id AS VARCHAR) || '#epoch42'")} AS h,
         |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tok
         |  FROM documents),
         |c AS (SELECT doc_id, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
         |  FROM d),
         |cp AS (SELECT CAST(unnest([1024, 2048]) AS BIGINT) AS cap),
         |sh AS (SELECT cap, (cum_tok - n_tok) // cap AS shard_id,
         |    count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS s_tok,
         |    CAST(sum(n_tok * n_tok) AS BIGINT) AS sum_sq
         |  FROM c, cp GROUP BY 1, 2)
         |SELECT cap, count(*) AS n_shards, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         |  CAST(sum(s_tok) AS BIGINT) AS total_tokens,
         |  CAST(sum(s_tok * s_tok) AS BIGINT) AS total_pairs,
         |  CAST(sum(s_tok * s_tok - sum_sq) AS BIGINT) AS cross_pairs,
         |  CAST(max(n_docs) AS BIGINT) AS max_docs_per_shard,
         |  CAST(sum(s_tok * s_tok - sum_sq) * 1000 // sum(s_tok * s_tok) AS BIGINT) AS contamination_permille
         |FROM sh GROUP BY cap ORDER BY cap""".stripMargin,
    // per-type geometric noise, argmax (noisy desc, type asc), the
    // winner and the argmax-preserved honesty flag
    "q376_dp_noisy_max" -> {
      def g(tag: String) = {
        val k = s"(${hx(s"event_type || '|$tag'")} % 1048576 + 1)"
        s"(19 - (length(bin($k)) - 1) + CASE WHEN ($k & ($k - 1)) = 0 THEN 1 ELSE 0 END)"
      }
      s"""WITH n AS (SELECT event_type, count(*) AS n_true FROM events GROUP BY 1),
         |z AS (SELECT event_type, n_true,
         |    CAST(${g("nma")} - ${g("nmb")} AS BIGINT) AS z_noise FROM n),
         |y AS (SELECT *, n_true + z_noise AS n_noisy FROM z),
         |w AS (SELECT event_type AS winner FROM y ORDER BY n_noisy DESC, event_type LIMIT 1),
         |tm AS (SELECT event_type AS true_max FROM y ORDER BY n_true DESC, event_type LIMIT 1)
         |SELECT event_type, n_true, z_noise, CAST(n_noisy AS BIGINT) AS n_noisy,
         |  CAST(CASE WHEN event_type = (SELECT winner FROM w) THEN 1 ELSE 0 END AS BIGINT) AS is_winner,
         |  CAST(CASE WHEN (SELECT winner FROM w) = (SELECT true_max FROM tm) THEN 1 ELSE 0 END AS BIGINT) AS argmax_preserved,
         |  CAST(693147 AS BIGINT) AS epsilon_micro
         |FROM y ORDER BY event_type""".stripMargin
    },
    // q166's WAV parameters framed at win=1024/hop=256 — the demux
    // fields recomputed from content length, then pure arithmetic
    "q367_stft_plan" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n FROM documents),
        |p AS (SELECT doc_id, n,
        |    CASE CAST(n % 5 AS INTEGER) WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |      WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS rate,
        |    CASE WHEN n % 2 = 0 THEN 1 ELSE 4 END AS ba FROM m),
        |q AS (SELECT doc_id, rate, ba, (((n + ba - 1) // ba) * ba) // ba AS ns FROM p),
        |f AS (SELECT doc_id, rate, ba, ns,
        |    CASE WHEN ns >= 1024 THEN (ns - 1024) // 256 + 1 ELSE 0 END AS nf FROM q)
        |SELECT doc_id, CAST(rate AS INTEGER) AS sample_rate, CAST(ns AS BIGINT) AS n_samples,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(1024 * ba AS BIGINT) AS frame_bytes,
        |  CAST(256 * ba AS BIGINT) AS hop_bytes,
        |  CAST(CASE WHEN nf > 0 THEN 44 + (nf - 1) * 256 * ba ELSE 0 END AS BIGINT) AS last_frame_offset,
        |  CAST(1024 * 1000 // rate AS BIGINT) AS frame_ms,
        |  CAST(CASE WHEN nf > 0 THEN (1024 + (nf - 1) * 256) * 1000 // ns ELSE 0 END AS BIGINT) AS coverage_permille
        |FROM f ORDER BY doc_id""".stripMargin,
    // stream/batch parity: the tombstone anti-join's batch equivalent
    "q370_stream_erasure" -> {
      val h = hx("CAST(user_id AS VARCHAR)")
      s"""WITH del AS (SELECT DISTINCT user_id FROM events WHERE $h % 20 = 0)
         |SELECT event_type, count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS checksum
         |FROM events WHERE user_id NOT IN (SELECT user_id FROM del)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    // the q104 SCD2 islands probed at three AS-OF dates
    "q371_time_travel" ->
      """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
        |    lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |  FROM orders),
        |f AS (SELECT *, CASE WHEN prev IS NULL OR o_orderpriority <> prev THEN 1 ELSE 0 END AS chg FROM o),
        |v AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver FROM f),
        |i AS (SELECT o_custkey, ver, strftime(min(o_orderdate), '%Y-%m-%d') AS valid_from,
        |    count(*) AS n_orders FROM v GROUP BY o_custkey, ver),
        |j AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY ver) AS valid_to FROM i),
        |ts AS (SELECT unnest(['1996-01-01', '1998-01-01', '2000-01-01']) AS as_of)
        |SELECT as_of, count(*) AS n_entities,
        |  CAST(sum(CASE WHEN ver > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_evolved,
        |  CAST(sum(n_orders) AS BIGINT) AS n_orders_active,
        |  CAST(max(ver) AS INTEGER) AS max_version
        |FROM j JOIN ts ON valid_from <= as_of AND (valid_to IS NULL OR valid_to > as_of)
        |GROUP BY as_of ORDER BY as_of""".stripMargin,
    // int8 affine codes vs the q190 PQ codebooks, both reconstructed
    // on the floor(x·2¹⁰) grid — the training CTEs are the q190 mirror
    "q372_quantization_audit" -> {
      val dsub = 4
      def dotD(a: String, b: String) =
        s"list_sum(list_transform(generate_series(1, $dsub), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
      def score(src: String, cent: String) =
        s"${dotD(s"$src.se", s"$cent.ce")} - list_sum(list_transform($cent.ce, x -> x * x)) / 2.0"
      def iter(i: Int, prev: String): String =
        s"""s$i AS (SELECT t.vid, t.sub, t.se, c.j, ${score("t", "c")} AS s FROM vs t JOIN $prev c ON c.sub = t.sub),
           |a$i AS (SELECT vid, sub, se, j AS cell FROM (SELECT vid, sub, se, j, row_number() OVER (PARTITION BY vid, sub ORDER BY s DESC, j DESC) AS rn FROM s$i) t WHERE rn = 1),
           |x$i AS (SELECT sub, cell, se, CAST(unnest(generate_series(1, $dsub)) AS INTEGER) AS pos FROM a$i),
           |m$i AS (SELECT sub, cell, pos, CAST(sum(CAST(${away("se[pos]", 6)} AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mm FROM x$i GROUP BY sub, cell, pos),
           |n$i AS (SELECT sub, cell, list(mm ORDER BY pos) AS nce FROM m$i GROUP BY sub, cell),
           |c$i AS (SELECT p.sub, p.j, COALESCE(n$i.nce, p.ce) AS ce FROM $prev p LEFT JOIN n$i ON n$i.sub = p.sub AND n$i.cell = p.j)""".stripMargin
      s"""WITH v AS (SELECT vec_id AS vid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |xq AS MATERIALIZED (SELECT vid, i, CAST(floor(e[i] * 1024) AS BIGINT) AS xq FROM (
         |    SELECT vid, e, CAST(unnest(generate_series(1, 64)) AS INTEGER) AS i FROM v)),
         |rg AS (SELECT i, min(xq) AS mn, max(xq) AS mx FROM xq GROUP BY i),
         |i8 AS (SELECT count(DISTINCT vid) AS n_vectors,
         |    CAST(sum((xq - (mn + ((xq - mn) * 255 // greatest(mx - mn, 1)) * (mx - mn) // 255))
         |      * (xq - (mn + ((xq - mn) * 255 // greatest(mx - mn, 1)) * (mx - mn) // 255))) AS BIGINT) AS sse
         |  FROM xq JOIN rg USING (i)),
         |subs AS (SELECT CAST(unnest(generate_series(0, 15)) AS INTEGER) AS sub),
         |vs AS (SELECT vid, sub, e[(sub*$dsub+1):(sub*$dsub+$dsub)] AS se FROM v, subs),
         |low AS (SELECT vid FROM v ORDER BY vid LIMIT 16),
         |c0 AS (SELECT vs.sub, CAST(row_number() OVER (PARTITION BY vs.sub ORDER BY vs.vid) - 1 AS INTEGER) AS j, vs.se AS ce
         |  FROM vs JOIN low ON vs.vid = low.vid),
         |${iter(1, "c0")},
         |${iter(2, "c1")},
         |sf AS (SELECT t.vid, t.sub, t.se, c.j, ${score("t", "c")} AS s FROM vs t JOIN c2 c ON c.sub = t.sub),
         |code AS (SELECT vid, sub, j AS cell FROM (SELECT vid, sub, j, row_number() OVER (PARTITION BY vid, sub ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1),
         |prq AS (SELECT code.vid, CAST(code.sub * $dsub + dj AS INTEGER) AS i,
         |    CAST(floor(c2.ce[dj] * 1024) AS BIGINT) AS rq
         |  FROM code JOIN c2 ON c2.sub = code.sub AND c2.j = code.cell,
         |    (SELECT CAST(unnest(generate_series(1, $dsub)) AS INTEGER) AS dj)),
         |pq AS (SELECT count(DISTINCT xq.vid) AS n_vectors,
         |    CAST(sum((xq.xq - rq) * (xq.xq - rq)) AS BIGINT) AS sse
         |  FROM xq JOIN prq ON prq.vid = xq.vid AND prq.i = xq.i),
         |u AS (SELECT 'int8_scalar' AS method, CAST(512 AS BIGINT) AS bits_per_vector, n_vectors, sse FROM i8
         |  UNION ALL SELECT 'pq_16x4', CAST(64 AS BIGINT), n_vectors, sse FROM pq)
         |SELECT method, bits_per_vector, n_vectors, sse AS sum_sq_err_fp,
         |  CAST(sse // (n_vectors * 64) AS BIGINT) AS mean_sq_err_fp
         |FROM u ORDER BY method""".stripMargin
    },
    // the q23 predictor's confusion rollup: per-class P/R/F1 permille
    // plus the macro row (label '~macro' sorts last)
    "q373_langid_eval" ->
      raw"""WITH w AS (SELECT lang, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |p AS (SELECT lang, $langCase AS pred FROM w),
         |cf AS (SELECT lang, pred, count(*) AS c FROM p GROUP BY 1, 2),
         |rc AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_true FROM cf GROUP BY 1),
         |cc AS (SELECT pred AS lang, CAST(sum(c) AS BIGINT) AS n_pred FROM cf GROUP BY 1),
         |dg AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_correct FROM cf WHERE lang = pred GROUP BY 1),
         |pc AS (SELECT COALESCE(rc.lang, cc.lang) AS label,
         |    COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred,
         |    COALESCE(n_correct, 0) AS n_correct
         |  FROM rc FULL JOIN cc ON cc.lang = rc.lang
         |  LEFT JOIN dg ON dg.lang = COALESCE(rc.lang, cc.lang)),
         |pm AS (SELECT *, n_correct * 1000 // greatest(n_pred, 1) AS precision_permille,
         |    n_correct * 1000 // greatest(n_true, 1) AS recall_permille FROM pc),
         |f AS (SELECT *, 2 * precision_permille * recall_permille
         |    // greatest(precision_permille + recall_permille, 1) AS f1_permille FROM pm),
         |mc AS (SELECT '~macro' AS label, CAST(sum(n_true) AS BIGINT) AS n_true,
         |    CAST(sum(n_pred) AS BIGINT) AS n_pred, CAST(sum(n_correct) AS BIGINT) AS n_correct,
         |    CAST(sum(precision_permille) // count(*) AS BIGINT) AS precision_permille,
         |    CAST(sum(recall_permille) // count(*) AS BIGINT) AS recall_permille,
         |    CAST(sum(f1_permille) // count(*) AS BIGINT) AS f1_permille FROM f)
         |SELECT label, n_true, n_pred, n_correct,
         |  CAST(precision_permille AS BIGINT) AS precision_permille,
         |  CAST(recall_permille AS BIGINT) AS recall_permille,
         |  CAST(f1_permille AS BIGINT) AS f1_permille
         |FROM f
         |UNION ALL SELECT * FROM mc
         |ORDER BY label""".stripMargin,
    // full-rebuild summary; the engine's incremental fold must land on
    // the same bits, so incremental_ok is a literal 1 it has to earn
    "q338_scd2_incremental" ->
      s"""WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         |    lag(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
         |  FROM orders),
         |f AS (SELECT *, CASE WHEN prev IS NULL OR o_orderpriority <> prev THEN 1 ELSE 0 END AS chg FROM o),
         |v AS (SELECT *, sum(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver FROM f),
         |i AS (SELECT o_custkey, ver, strftime(min(o_orderdate), '%Y-%m-%d') AS valid_from,
         |    count(*) AS n_orders FROM v GROUP BY o_custkey, ver),
         |j AS (SELECT *, lead(valid_from) OVER (PARTITION BY o_custkey ORDER BY ver) AS valid_to FROM i),
         |r AS (SELECT o_custkey, CAST(ver AS INTEGER) AS version, valid_from, valid_to, n_orders,
         |    CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current FROM j)
         |SELECT is_current, count(*) AS n_rows, count(DISTINCT o_custkey) AS n_customers,
         |  CAST(sum(n_orders) AS BIGINT) AS sum_orders,
         |  CAST(sum(o_custkey * 1000 + version * 10 + n_orders
         |    + ${hx("valid_from")} % 97 + ${hx("coalesce(valid_to, 'open')")} % 89) AS BIGINT) AS chk,
         |  CAST(1 AS BIGINT) AS incremental_ok
         |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "q336_theil_sen" ->
      """WITH d AS (SELECT CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |mx AS (SELECT max(x) AS mx FROM d),
        |se AS (SELECT '1_raw' AS tag, x, n FROM d
        |  UNION ALL SELECT '2_outlier', x,
        |    CAST(CASE WHEN x = (SELECT mx FROM mx) THEN n * 10 ELSE n END AS BIGINT) FROM d),
        |sl AS (SELECT a.tag, (b.n - a.n) * 1000 // (b.x - a.x) AS sl
        |  FROM se a JOIN se b ON b.tag = a.tag AND b.x > a.x),
        |tsm AS (SELECT tag, count(*) AS n_pairs, list_sort(list(sl)) AS arr FROM sl GROUP BY 1),
        |ts2 AS (SELECT tag, n_pairs, arr[CAST((n_pairs + 1) // 2 AS INTEGER)] AS ts_slope_milli FROM tsm),
        |ol AS (SELECT tag, count(*) AS n_days, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(n) AS BIGINT) AS sy,
        |    CAST(sum(x * n) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx FROM se GROUP BY 1),
        |ol2 AS (SELECT tag, n_days,
        |    (n_days * sxy - sx * sy) * 1000 // (n_days * sxx - sx * sx) AS ols_slope_milli FROM ol)
        |SELECT ts2.tag, ol2.n_days, ts2.n_pairs, ts2.ts_slope_milli, ol2.ols_slope_milli
        |FROM ts2 JOIN ol2 ON ol2.tag = ts2.tag ORDER BY ts2.tag""".stripMargin,
    "q337_token_offsets" ->
      raw"""WITH w AS (SELECT doc_id, source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
         |tk AS (SELECT doc_id, source, array_to_string(ws, ' ') AS norm, i - 1 AS i,
         |    ws[CAST(i AS INTEGER)] AS tok
         |  FROM (SELECT doc_id, source, ws, unnest(generate_series(1, len(ws))) AS i FROM w)),
         |st AS (SELECT *, CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt FROM tk)
         |SELECT source, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN substr(norm, CAST(strt + 1 AS INTEGER), length(tok)) = tok
         |    THEN 0 ELSE 1 END) AS BIGINT) AS n_violations,
         |  CAST(max(length(tok)) AS BIGINT) AS max_token_len,
         |  CAST(sum((strt + 1) * (${hx("tok")} % 997)) AS BIGINT) AS offset_checksum
         |FROM st GROUP BY 1 ORDER BY 1""".stripMargin,
    "q335_join_discovery" -> {
      val defs = Seq(
        ("customer", "c_custkey"),
        ("orders", "o_custkey"),
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey")
      )
      val tallSel = defs
        .map { case (tb, c) => s"SELECT DISTINCT '$tb.$c' AS col, CAST($c AS BIGINT) AS v FROM $tb" }
        .mkString("\nUNION ALL ")
      s"""WITH tall AS ($tallSel),
         |nd AS (SELECT col, count(*) AS ndv FROM tall GROUP BY 1),
         |smp AS (SELECT col, v FROM (SELECT col, v,
         |    row_number() OVER (PARTITION BY col ORDER BY ${hx("CAST(v AS VARCHAR)")}, v) AS rn FROM tall)
         |  WHERE rn <= 64),
         |km AS (SELECT s.col AS col_a, t2.col AS col_b, count(*) AS m FROM smp s
         |  JOIN tall t2 ON t2.v = s.v AND t2.col <> s.col GROUP BY 1, 2),
         |ex AS (SELECT a.col AS col_a, b.col AS col_b, count(*) AS xm FROM tall a
         |  JOIN tall b ON b.v = a.v AND b.col <> a.col GROUP BY 1, 2),
         |pr AS (SELECT a.col AS col_a, a.ndv AS ndv_a, b.col AS col_b FROM nd a, nd b WHERE a.col <> b.col)
         |SELECT pr.col_a, pr.col_b, pr.ndv_a,
         |  CAST(coalesce(km.m, 0) AS BIGINT) AS kmv_matches,
         |  CAST(coalesce(km.m, 0) * 1000 // least(64, pr.ndv_a) AS BIGINT) AS est_permille,
         |  CAST(coalesce(ex.xm, 0) * 1000 // pr.ndv_a AS BIGINT) AS exact_permille
         |FROM pr LEFT JOIN km ON km.col_a = pr.col_a AND km.col_b = pr.col_b
         |LEFT JOIN ex ON ex.col_a = pr.col_a AND ex.col_b = pr.col_b
         |ORDER BY pr.col_a, pr.col_b""".stripMargin
    },
    "q333_slice_finder" ->
      raw"""WITH d AS (SELECT lang, source, CAST(n_chars // 500 AS VARCHAR) AS lenb,
         |    regexp_split_to_array(trim(text), '\s+') AS ws,
         |    len(regexp_replace(trim(text), '\s+', '', 'g')) AS sum_len FROM documents),
         |f AS (SELECT lang, source, lenb, len(ws) AS n_words, sum_len,
         |    len(list_filter(ws, x -> list_contains(['the','a','and','is','of'], x))) AS n_stop,
         |    len(list_distinct(ws)) AS n_distinct FROM d),
         |p AS (SELECT lang, source, lenb,
         |    CASE WHEN n_words >= 30 AND n_words <= 600 AND sum_len >= n_words * 3 AND sum_len <= n_words * 6
         |      AND n_stop * 50 >= n_words AND n_distinct * 5 >= n_words THEN 1 ELSE 0 END AS pass FROM f),
         |g AS (SELECT count(*) AS nn, CAST(sum(pass) AS BIGINT) AS pp FROM p),
         |sl AS (
         |  SELECT 'lang=' || lang AS slice, count(*) AS n, CAST(sum(pass) AS BIGINT) AS n_pass FROM p GROUP BY 1
         |  UNION ALL SELECT 'source=' || source, count(*), CAST(sum(pass) AS BIGINT) FROM p GROUP BY 1
         |  UNION ALL SELECT 'lenb=' || lenb, count(*), CAST(sum(pass) AS BIGINT) FROM p GROUP BY 1
         |  UNION ALL SELECT 'lang=' || lang || '|source=' || source, count(*), CAST(sum(pass) AS BIGINT)
         |    FROM p GROUP BY 1
         |  UNION ALL SELECT 'lang=' || lang || '|lenb=' || lenb, count(*), CAST(sum(pass) AS BIGINT)
         |    FROM p GROUP BY 1
         |  UNION ALL SELECT 'source=' || source || '|lenb=' || lenb, count(*), CAST(sum(pass) AS BIGINT)
         |    FROM p GROUP BY 1),
         |sc AS (SELECT slice, n, n_pass * 1000 // n AS rate_permille,
         |    g.pp * 1000 // g.nn AS global_rate_permille,
         |    CAST(abs(CAST(n_pass AS HUGEINT) * g.nn - CAST(g.pp AS HUGEINT) * n) * 1000
         |      // (CAST(n AS HUGEINT) * g.nn) AS BIGINT) AS dev_permille
         |  FROM sl, g WHERE n >= 20)
         |SELECT slice, n, rate_permille, global_rate_permille, dev_permille, dev_permille * n AS score
         |FROM sc ORDER BY score DESC, slice LIMIT 10""".stripMargin,
    "q334_compression_advisor" ->
      """WITH tall AS (
        |  SELECT o_orderkey AS k, '1_status' AS c, o_orderstatus AS v FROM orders
        |  UNION ALL SELECT o_orderkey, '2_priority', o_orderpriority FROM orders
        |  UNION ALL SELECT o_orderkey, '3_month', strftime(o_orderdate, '%Y-%m') FROM orders
        |  UNION ALL SELECT o_orderkey, '4_price', CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR) FROM orders),
        |pl AS (SELECT c, count(*) AS n, CAST(sum(length(v)) * 8 AS BIGINT) AS plain_bits FROM tall GROUP BY 1),
        |dc AS (SELECT c, count(*) AS ndv, CAST(sum(length(v)) * 8 AS BIGINT) AS dlen_bits
        |  FROM (SELECT DISTINCT c, v FROM tall) GROUP BY 1),
        |rn AS (SELECT a.c, CAST(sum(CASE WHEN a.v <> b.v THEN 1 ELSE 0 END) AS BIGINT) AS changes,
        |    CAST(sum(CASE WHEN a.v <> b.v THEN length(b.v) ELSE 0 END) AS BIGINT) AS change_bytes
        |  FROM tall a JOIN tall b ON b.c = a.c AND b.k = a.k + 1 GROUP BY 1),
        |hd AS (SELECT c, CAST(length(v) AS BIGINT) AS head_bytes FROM tall WHERE k = 0),
        |x AS (SELECT pl.c, pl.n, dc.ndv, pl.plain_bits,
        |    dc.dlen_bits + pl.n * length(bin(dc.ndv - 1)) AS dict_bits,
        |    rn.changes + 1 AS rle_runs,
        |    (hd.head_bytes + rn.change_bytes) * 8 + (rn.changes + 1) * 32 AS rle_bits
        |  FROM pl JOIN dc USING (c) JOIN rn ON rn.c = pl.c JOIN hd ON hd.c = pl.c)
        |SELECT c AS "column", n, ndv, plain_bits, dict_bits, rle_runs, rle_bits,
        |  CASE WHEN plain_bits <= dict_bits AND plain_bits <= rle_bits THEN 'plain'
        |       WHEN dict_bits <= rle_bits THEN 'dict' ELSE 'rle' END AS winner,
        |  least(plain_bits, dict_bits, rle_bits) * 1000 // plain_bits AS best_ratio_permille
        |FROM x ORDER BY 1""".stripMargin,
    "q331_sprt" -> {
      def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
      val inc = s"(${mn("3")} - ${mn("2")})"
      s"""WITH u AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_day,
         |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv FROM events GROUP BY 1),
         |ua AS (SELECT *, CASE WHEN ${hx("CAST(user_id AS VARCHAR)")} % 2 = 0 THEN 'A' ELSE 'B' END AS arm
         |  FROM u),
         |d AS (SELECT arm, first_day, count(*) AS n_users,
         |    CAST(sum(CASE WHEN conv = 1 THEN $inc ELSE -$inc END) AS BIGINT) AS d_llr
         |  FROM ua GROUP BY 1, 2),
         |c AS (SELECT *, sum(d_llr) OVER (PARTITION BY arm ORDER BY first_day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM d),
         |f AS (SELECT arm, CAST(sum(n_users) AS BIGINT) AS n_users, count(*) AS n_days,
         |    CAST(sum(d_llr) AS BIGINT) AS final_llr_micro,
         |    min(CASE WHEN cum >= ${mn("19")} THEN first_day END) AS up_day,
         |    min(CASE WHEN cum <= -${mn("19")} THEN first_day END) AS down_day
         |  FROM c GROUP BY 1)
         |SELECT arm, n_users, n_days, final_llr_micro,
         |  strftime(least(up_day, down_day), '%Y-%m-%d') AS cross_day,
         |  CASE WHEN up_day IS NOT NULL AND (down_day IS NULL OR up_day <= down_day) THEN 'accept_h1'
         |       WHEN down_day IS NOT NULL THEN 'accept_h0' ELSE 'continue' END AS decision
         |FROM f ORDER BY arm""".stripMargin
    },
    "q332_sequential_patterns" ->
      """WITH rk AS (SELECT user_id, event_type AS t,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk FROM events),
        |ext AS (SELECT user_id, t, min(rk) AS frank, max(rk) AS lrank FROM rk GROUP BY 1, 2),
        |nu AS (SELECT count(DISTINCT user_id) AS n_u FROM ext),
        |s2 AS (SELECT a.t || '>' || b.t AS pattern, CAST(2 AS INTEGER) AS len,
        |    count(DISTINCT a.user_id) AS support
        |  FROM ext a JOIN ext b ON b.user_id = a.user_id AND a.frank < b.lrank GROUP BY 1, 2),
        |fb2 AS (SELECT r.user_id, a.t AS ta, r.t AS tb, min(r.rk) AS fb
        |  FROM rk r JOIN ext a ON a.user_id = r.user_id AND r.rk > a.frank GROUP BY 1, 2, 3),
        |s3 AS (SELECT f.ta || '>' || f.tb || '>' || c.t AS pattern, CAST(3 AS INTEGER) AS len,
        |    count(DISTINCT f.user_id) AS support
        |  FROM fb2 f JOIN ext c ON c.user_id = f.user_id AND c.lrank > f.fb GROUP BY 1, 2),
        |al AS (SELECT * FROM s2 UNION ALL SELECT * FROM s3)
        |SELECT pattern, len, support, support * 1000 // (SELECT n_u FROM nu) AS support_permille
        |FROM al ORDER BY support DESC, pattern LIMIT 12""".stripMargin,
    "q329_partition_advisor" -> {
      def lay(name: String, key: String) =
        s"""SELECT '$name' AS layout, $key AS pk, count(*) AS rws,
           |    min(dt) AS dt_min, max(dt) AS dt_max, min(pri) AS pri_min, max(pri) AS pri_max,
           |    min(st) AS st_min, max(st) AS st_max, min(ck) AS ck_min, max(ck) AS ck_max
           |  FROM ob GROUP BY 2""".stripMargin
      // zone-map intersect composed with exact partition-key pruning
      // where the predicate column determines the layout key
      val conds = Seq(
        (
          "w1_date_month",
          "(dt_min <= '1996-01-31' AND dt_max >= '1996-01-01') AND (layout <> '2_by_month' OR pk = '1996-01')"
        ),
        (
          "w2_priority_eq",
          "(pri_min <= '1-URGENT' AND pri_max >= '1-URGENT') AND (layout <> '1_by_priority' OR pk = '1-URGENT')"
        ),
        ("w3_status_eq", "(st_min <= 'F' AND st_max >= 'F') AND (layout <> '3_by_status' OR pk = 'F')"),
        ("w4_cust_eq", "(ck_min <= 37 AND ck_max >= 37) AND (layout <> '4_by_custbucket' OR pk = '5')")
      )
      val evals = conds
        .map { case (w, c) =>
          s"""SELECT layout, '$w' AS workload, count(*) AS n_parts,
             |  CAST(sum(CASE WHEN $c THEN 1 ELSE 0 END) AS BIGINT) AS parts_scanned,
             |  CAST(sum(CASE WHEN $c THEN rws ELSE 0 END) * 1000 // sum(rws) AS BIGINT) AS scan_permille
             |FROM stats GROUP BY 1""".stripMargin
        }
        .mkString("\nUNION ALL\n")
      s"""WITH ob AS (SELECT o_orderpriority AS pri, strftime(o_orderdate, '%Y-%m') AS mon,
         |    o_orderstatus AS st, o_custkey AS ck, strftime(o_orderdate, '%Y-%m-%d') AS dt FROM orders),
         |stats AS (
         |  ${lay("1_by_priority", "pri")}
         |  UNION ALL ${lay("2_by_month", "mon")}
         |  UNION ALL ${lay("3_by_status", "st")}
         |  UNION ALL ${lay("4_by_custbucket", "CAST(ck % 16 AS VARCHAR)")}
         |)
         |$evals
         |ORDER BY layout, workload""".stripMargin
    },
    "q330_hits" -> {
      val rounds = (1 to 8)
        .map { r =>
          s"""hr$r AS MATERIALIZED (SELECT e.src AS id, CAST(sum(a.v) AS BIGINT) AS v
             |  FROM ed e JOIN a${r - 1} a ON a.id = e.dst GROUP BY 1),
             |ht$r AS (SELECT CAST(sum(v) AS HUGEINT) AS tot FROM hr$r),
             |h$r AS MATERIALIZED (SELECT id, CAST(CAST(v AS HUGEINT) * 1000000000 // tot AS BIGINT) AS v FROM hr$r, ht$r),
             |ar$r AS MATERIALIZED (SELECT e.dst AS id, CAST(sum(h.v) AS BIGINT) AS v
             |  FROM ed e JOIN h$r h ON h.id = e.src GROUP BY 1),
             |at$r AS (SELECT CAST(sum(v) AS HUGEINT) AS tot FROM ar$r),
             |a$r AS MATERIALIZED (SELECT id, CAST(CAST(v AS HUGEINT) * 1000000000 // tot AS BIGINT) AS v FROM ar$r, at$r)""".stripMargin
        }
        .mkString(",\n")
      s"""WITH pairs AS (SELECT d1, d2 FROM ($minhashSql)),
         |ed AS (SELECT DISTINCT greatest(d1, d2) AS src, least(d1, d2) AS dst FROM pairs),
         |nodes AS (SELECT src AS id FROM ed UNION SELECT dst FROM ed),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |a0 AS (SELECT id, CAST(1000000000 // (SELECT n FROM nn) AS BIGINT) AS v FROM nodes),
         |$rounds
         |SELECT COALESCE(a.id, h.id) AS doc_id, COALESCE(a.v, 0) AS auth_nano, COALESCE(h.v, 0) AS hub_nano
         |FROM a8 a FULL JOIN h8 h ON h.id = a.id
         |ORDER BY auth_nano DESC, doc_id LIMIT 10""".stripMargin
    },
    // the scripting loop computes the smallest power of two >= max —
    // closed form: 1 << len(bin(mx - 1)) (mx >= 2 always holds here)
    "q327_sql_scripting" ->
      """WITH mxv AS (SELECT max(CAST(floor(o_totalprice) AS BIGINT)) AS mx FROM orders),
        |wv AS (SELECT (CAST(1 AS BIGINT) << length(bin(mx - 1))) // 8 AS bin_width FROM mxv)
        |SELECT CAST(floor(o_totalprice) AS BIGINT) // bin_width AS bin,
        |  count(*) AS n_orders, bin_width
        |FROM orders, wv
        |GROUP BY 1, 3 ORDER BY 1""".stripMargin,
    // compaction is content-neutral by contract (files_reduced /
    // serve_eq_appended earned in-engine, pinned here); drift, model
    // shift, and both recalls are re-derived: the stale serve trains
    // on the old corpus only (q377's mirror), the retrained serve on
    // everyone (q193's), recall@3 against the brute mirror, the two
    // coarse chains (suffixed names) feed assignment drift + the
    // fixed-point centroid-shift sum
    "q393_ann_compact_retrain" -> {
      import IvfSqlBits.score
      def el(t: String) = s"$t.ce[CAST(i.i AS INTEGER)]"
      s"""WITH stale AS MATERIALIZED (SELECT qid, nid FROM (${annIvfPqSqlK(3, trainPred = "vid % 10 <> 7")}) t),
         |fresh AS MATERIALIZED (SELECT qid, nid FROM ($annIvfPqSql) t),
         |bt AS MATERIALIZED (SELECT qid, nid FROM (${annBruteSqlK(3)}) t),
         |${IvfSqlBits.lloydCtesPx("vid % 10 <> 7", "_o")},
         |${IvfSqlBits.lloydCtesPx("TRUE", "_f")},
         |sfz AS (SELECT v_o.vid, c.j, ${score("v_o", "c")} AS s FROM v_o, c_o2 c),
         |asg AS (SELECT vid, j AS cell FROM (SELECT vid, j,
         |    row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sfz) t WHERE rn = 1),
         |cls AS (SELECT cell, CAST(sum(CASE WHEN vid % 10 <> 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         |    CAST(count(*) AS BIGINT) AS n_all FROM asg GROUP BY cell),
         |tt AS (SELECT CAST(sum(n_old) AS BIGINT) AS t_old, CAST(sum(n_all) AS BIGINT) AS t_all FROM cls),
         |dr AS (SELECT CAST(sum(abs(n_old * 1000 // t_old - n_all * 1000 // t_all)) AS BIGINT) AS drift FROM cls, tt),
         |sh AS (SELECT CAST(sum(CAST(floor((${el("f")} - ${el("o")}) * (${el("f")} - ${el("o")}) * 1048576.0) AS BIGINT)) AS BIGINT) AS shift_fp
         |  FROM c_f2 f JOIN c_o2 o ON o.j = f.j, (SELECT unnest(generate_series(1, 64)) AS i) i),
         |nb AS (SELECT count(*) AS n FROM bt),
         |rs AS (SELECT count(*) AS h FROM stale JOIN bt USING (qid, nid)),
         |rf AS (SELECT count(*) AS h FROM fresh JOIN bt USING (qid, nid))
         |SELECT CAST(1 AS BIGINT) AS files_reduced, CAST(1 AS BIGINT) AS serve_eq_appended,
         |  dr.drift AS drift_l1_permille, sh.shift_fp AS centroid_shift_fp,
         |  CAST(rs.h * 1000 // nb.n AS BIGINT) AS recall_stale_permille,
         |  CAST(rf.h * 1000 // nb.n AS BIGINT) AS recall_retrained_permille,
         |  CAST(CASE WHEN dr.drift >= 25 OR sh.shift_fp >= 4096 THEN 1 ELSE 0 END AS BIGINT) AS retrain_recommended,
         |  CAST(CASE WHEN rf.h >= rs.h THEN 1 ELSE 0 END AS BIGINT) AS recall_recovered
         |FROM dr, sh, nb, rs, rf""".stripMargin
    },
    // the whole sweep from ONE Lloyd chain: probe ranks cut per depth
    // by a VALUES join, recall against the k=10 brute mirror
    "q403_ivf_nprobe_sweep" -> {
      import IvfSqlBits.{dotD, score}
      s"""WITH ${IvfSqlBits.lloydCtes},
         |sf AS (SELECT v.vid, v.e, v.is_q, c.j, ${score("v", "c")} AS s FROM v, c2 c),
         |corpus AS (SELECT vid AS nid, e AS ne, j AS cell FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1),
         |probes AS (SELECT vid AS qid, e AS qe, j AS cell, rn - 1 AS pos FROM (SELECT vid, e, j, row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf WHERE is_q) t WHERE rn <= 8),
         |sc AS MATERIALIZED (SELECT p.qid, c.nid, p.pos, ${away(s"${dotD("p.qe", "c.ne")} / sqrt(${dotD("p.qe", "p.qe")} * ${dotD("c.ne", "c.ne")})", 6)} AS sim
         |  FROM probes p JOIN corpus c ON p.cell = c.cell AND p.qid <> c.nid),
         |bt AS MATERIALIZED (SELECT qid, nid FROM ($annBruteSql) t),
         |nq AS (SELECT count(DISTINCT qid) AS n FROM bt),
         |nt AS (SELECT count(*) AS n FROM bt),
         |nc AS (SELECT count(*) AS n FROM v),
         |nps(np) AS (VALUES (1), (2), (4), (8)),
         |cand AS (SELECT np, qid, nid, sim FROM sc, nps WHERE pos < np),
         |cnt AS (SELECT np, CAST(count(*) AS BIGINT) AS n_cand FROM cand GROUP BY np),
         |tk AS (SELECT np, qid, nid FROM (SELECT np, qid, nid,
         |    row_number() OVER (PARTITION BY np, qid ORDER BY sim DESC, nid) AS rn FROM cand) t WHERE rn <= 10),
         |ht AS (SELECT np, CAST(count(*) AS BIGINT) AS hits FROM tk JOIN bt USING (qid, nid) GROUP BY np)
         |SELECT CAST(cnt.np AS INTEGER) AS nprobe, CAST(nq.n AS BIGINT) AS n_queries, cnt.n_cand AS n_candidates,
         |  cnt.n_cand * 1000 // nq.n AS cand_per_query_milli,
         |  COALESCE(ht.hits, 0) AS n_hits,
         |  COALESCE(ht.hits, 0) * 1000 // nt.n AS recall_permille,
         |  cnt.n_cand * 1000 // (nq.n * (nc.n - 1)) AS scan_permille
         |FROM cnt LEFT JOIN ht ON ht.np = cnt.np, nq, nt, nc
         |ORDER BY nprobe""".stripMargin
    },
    // the four ref censuses re-derived from the cohort predicates:
    // tag = the full initial table (pinned through vacuum — eq earned
    // in-engine), wap = initial + staged (k%7=0, keys +10^7), main
    // after the delete-rewrite = k%9<>0, publish = that + staged.
    // Global facts are protocol constants: 1 orphan vacuumed, 2 files
    // held only by non-main refs, fast-forward refused on diverged
    // heads, zero staged rows leaked into main
    "q406_branch_tag_refs" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |a AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o),
        |s AS (SELECT count(*) AS n, CAST(sum(k) + 10000000 * count(*) AS BIGINT) AS kk
        |    FROM o WHERE k % 7 = 0),
        |dl AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE k % 9 <> 0)
        |SELECT '1_tag_audit' AS phase, CAST(1 AS BIGINT) AS version, a.n AS n_rows,
        |  a.kk AS key_checksum, CAST(0 AS BIGINT) AS n_staged_in_main,
        |  CAST(1 AS BIGINT) AS n_vacuum_deleted, CAST(2 AS BIGINT) AS n_kept_other_refs,
        |  CAST(0 AS BIGINT) AS ff_legal, CAST(1 AS BIGINT) AS eq_pinned FROM a
        |UNION ALL SELECT '2_wap_staged', 2, a.n + s.n, a.kk + s.kk, 0, 1, 2, 0, 1 FROM a, s
        |UNION ALL SELECT '3_main_after_delete', 3, dl.n, dl.kk, 0, 1, 2, 0, 1 FROM dl
        |UNION ALL SELECT '4_main_after_publish', 4, dl.n + s.n, dl.kk + s.kk, 0, 1, 2, 0, 1 FROM dl, s
        |ORDER BY phase""".stripMargin,
    // the feed's four change classes re-derived from the cohort
    // predicates: inserts = the k%5=0 batch (keys +10^7), updates =
    // the k%6=1 cohort (post = pre + 50 cents each), deletes = the
    // k%15=2 cohort (untouched by the update — disjoint mod classes);
    // eq_apply / eq_ivm are earned in-engine (feed replay vs direct
    // read, maintained aggregate vs recompute)
    "q405_change_data_feed" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |i AS (SELECT count(*) AS n, CAST(sum(k) + 10000000 * count(*) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 5 = 0),
        |u AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 6 = 1),
        |d AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 15 = 2)
        |SELECT CAST(2 AS BIGINT) AS version, 'insert' AS change_type, i.n AS n_rows,
        |  i.kk AS key_checksum, i.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS eq_apply, CAST(1 AS BIGINT) AS eq_ivm FROM i
        |UNION ALL SELECT 3, 'update_preimage', u.n, u.kk, u.cc, 1, 1 FROM u
        |UNION ALL SELECT 3, 'update_postimage', u.n, u.kk, u.cc + 50 * u.n, 1, 1 FROM u
        |UNION ALL SELECT 4, 'delete', d.n, d.kk, d.cc, 1, 1 FROM d
        |ORDER BY version, change_type""".stripMargin,
    // the deterministic three-writer interleave replayed as
    // arithmetic: B's append doubles the table (keys shifted +10^7),
    // A's compaction is row-preserving (censuses of v2 and v3 equal),
    // C's abort leaves the head untouched — version/attempt/outcome
    // columns are the protocol's deterministic constants, eq_final is
    // earned in-engine (multiset equality of the final read vs
    // init ∪ append)
    // the two SQL-visible versions from the even/odd INSERT cohorts;
    // eq_head / eq_direct / both refusals earned in-engine (AS-OF-head
    // ≡ plain read; a fresh disk-replayed log instance serves the same
    // bytes; VERSION AS OF 99 refuses at resolution; INSERT into a
    // pinned past version refuses at analysis)
    "q422_manifest_catalog_sql" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 = 0),
        |v2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT CAST(1 AS BIGINT) AS version, v1.n AS n_rows, v1.kk AS key_checksum,
        |  v1.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_head,
        |  CAST(1 AS BIGINT) AS missing_refused, CAST(1 AS BIGINT) AS past_write_refused,
        |  CAST(1 AS BIGINT) AS eq_direct FROM v1
        |UNION ALL SELECT 2, v2.n, v2.kk, v2.cc, 1, 1, 1, 1 FROM v2
        |ORDER BY version""".stripMargin,
    // the per-version fact/dim censuses from the commit cohorts
    // (even, +odd, +shifted k%50=0 with generation-2-only dim keys);
    // n_dangling is 0 at every SINGLE-LOG version by construction and
    // exactly the new-generation fact cohort in the two-log torn-read
    // counterfactual; rebased is the protocol constant
    // the three timestamp probes resolve to the pinned-clock commit
    // cohorts (v2 = k%3 in (0,1) for both the exact-time and
    // between-commits probes, v3 = all keys for the after-head
    // probe); eq_version_read / before_first_refused /
    // past_write_refused earned in-engine (exact-time read ≡
    // VERSION AS OF 2; a timestamp before the first commit refuses
    // at resolution; a write to a timestamp-pinned snapshot refuses
    // at analysis)
    "q431_timestamp_as_of" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 3 IN (0, 1)),
        |v3 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_exact_commit_time' AS probe, v2.n AS n_rows, v2.kk AS key_checksum,
        |  v2.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_version_read,
        |  CAST(1 AS BIGINT) AS before_first_refused,
        |  CAST(1 AS BIGINT) AS past_write_refused FROM v2
        |UNION ALL SELECT '2_between_commits', v2.n, v2.kk, v2.cc, 1, 1, 1 FROM v2
        |UNION ALL SELECT '3_after_head', v3.n, v3.kk, v3.cc, 1, 1, 1 FROM v3
        |ORDER BY probe""".stripMargin,
    "q430_durable_multitable" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |e AS (SELECT count(*) AS n FROM o WHERE k % 2 = 0),
        |a AS (SELECT count(*) AS n FROM o),
        |x AS (SELECT count(*) AS n FROM o WHERE k % 50 = 0)
        |SELECT '1_batch1_atomic' AS phase, CAST(1 AS BIGINT) AS version, e.n AS n_fact_rows,
        |  CAST(100 AS BIGINT) AS n_dim_rows, CAST(0 AS BIGINT) AS n_dangling,
        |  CAST(0 AS BIGINT) AS rebased FROM e
        |UNION ALL SELECT '2_fact_append_other_instance', 2, a.n, 100, 0, 0 FROM a
        |UNION ALL SELECT '3_atomic_swap_rebase', 3, a.n + x.n, 120, 0, 1 FROM a, x
        |UNION ALL SELECT '4_two_logs_torn_read', -1, a.n + x.n, 100, x.n, 0 FROM a, x
        |ORDER BY phase""".stripMargin,
    // the three ref-addressed censuses from the cohorts: the audit
    // tag pins v1 (even keys), the wap branch serves all ∪ the
    // shifted k%100=0 staging, publish flips the plain read to the
    // same; `ok` earned in-engine (ref read ≡ version-number read,
    // staging invisible pre-publish, unknown ref refuses)
    "q429_manifest_refs_sql" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 = 0),
        |st AS (SELECT count(*) AS n, CAST(sum(k + 10000000) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 100 = 0),
        |al AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_audit_tag' AS phase, v1.n AS n_rows, v1.kk AS key_checksum,
        |  v1.cc AS cents_checksum, CAST(1 AS BIGINT) AS ok FROM v1
        |UNION ALL SELECT '2_wap_staged', al.n + st.n, al.kk + st.kk, al.cc + st.cc, 1 FROM al, st
        |UNION ALL SELECT '3_published', al.n + st.n, al.kk + st.kk, al.cc + st.cc, 1 FROM al, st
        |ORDER BY phase""".stripMargin,
    // phase 1: only the strict-OCC loser's one staged file is
    // vacuum-eligible (n_unreachable folds the aborted flag); phase
    // 2: expiration below the rewrite frees the two rewritten-away
    // insert files → 3 orphans, 3 deleted; censuses = the post-UPDATE
    // table (+100 on k%5=0), bit-identical across the vacuum;
    // eq_head / expired_refused earned in-engine
    "q428_manifest_vacuum" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |c AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END) AS BIGINT) AS cc FROM o)
        |SELECT '1_before' AS phase, CAST(1 AS BIGINT) AS n_unreachable, CAST(0 AS BIGINT) AS n_deleted,
        |  c.n AS n_rows, c.kk AS key_checksum, c.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS eq_head, CAST(1 AS BIGINT) AS expired_refused FROM c
        |UNION ALL SELECT '2_after_expire_vacuum', 3, 3, c.n, c.kk, c.cc, 1, 1 FROM c
        |ORDER BY phase""".stripMargin,
    // history = genesis + eight single-file appends (COALESCE(1));
    // .files' zone maps recomputed as per-zone min/max/count over the
    // same 8-bucket layout — footer-derived stats proven to BE the
    // zone arithmetic
    "q426_manifest_metadata_sql" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |z AS (SELECT k // w AS zone, min(k) AS mn, max(k) AS mx, count(*) AS n
        |  FROM o, wdt GROUP BY k // w),
        |hist AS (
        |  SELECT 'history' AS section, CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS a,
        |    CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c, 'genesis' AS op
        |  UNION ALL
        |  SELECT 'history', CAST(zone + 1 AS BIGINT), 1, 0, 0, 'append' FROM z),
        |fl AS (SELECT 'files' AS section,
        |    CAST(mn // w + 1 AS BIGINT) AS id,
        |    mn AS a, mx AS b, n AS c, 'file' AS op FROM z, wdt)
        |SELECT * FROM hist UNION ALL SELECT * FROM fl
        |ORDER BY section, id""".stripMargin,
    // per-cohort (k%4) insert counts and cents sums from the source;
    // single_cohort_commits / eq_ivm earned in-engine (every commit's
    // feed rows are one cohort; the feed-maintained view equals the
    // direct table aggregate)
    "q427_streaming_lakehouse_loop" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
        |SELECT k % 4 AS cohort, count(*) AS n_inserts,
        |  CAST(sum(cents) AS BIGINT) AS cents_sum,
        |  CAST(1 AS BIGINT) AS single_cohort_commits, CAST(1 AS BIGINT) AS eq_ivm
        |FROM o GROUP BY k % 4 ORDER BY cohort""".stripMargin,
    // the four statement-visible versions from the DML cohorts: v1 =
    // all, v2 = +100 on k%5=0, v3 = minus k%7=0, v4 = MERGE (matched
    // k%11=0 survivors reset to orig+5; deleted k%11=0∧k%7=0 rows
    // reinserted at orig); eq_current / stale_rewrite_aborted earned
    // in-engine (AS-OF-head ≡ plain read; a strict replace from a
    // stale read aborts on the side table and the append survives)
    "q425_manifest_row_level" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |v2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END) AS BIGINT) AS cc FROM o),
        |v3 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END) AS BIGINT) AS cc
        |  FROM o WHERE k % 7 <> 0),
        |v4 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk, CAST(sum(cc) AS BIGINT) AS cc FROM (
        |  SELECT k, CASE WHEN k % 11 = 0 THEN cents + 5
        |                 ELSE cents + CASE WHEN k % 5 = 0 THEN 100 ELSE 0 END END AS cc
        |    FROM o WHERE k % 7 <> 0
        |  UNION ALL
        |  SELECT k, cents AS cc FROM o WHERE k % 7 = 0 AND k % 11 = 0))
        |SELECT CAST(1 AS BIGINT) AS version, v1.n AS n_rows, v1.kk AS key_checksum,
        |  v1.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_current,
        |  CAST(1 AS BIGINT) AS stale_rewrite_aborted FROM v1
        |UNION ALL SELECT 2, v2.n, v2.kk, v2.cc, 1, 1 FROM v2
        |UNION ALL SELECT 3, v3.n, v3.kk, v3.cc, 1, 1 FROM v3
        |UNION ALL SELECT 4, v4.n, v4.kk, v4.cc, 1, 1 FROM v4
        |ORDER BY version""".stripMargin,
    // the five versions' change counts from the commit cohorts:
    // even/odd INSERT appends, the DV delete (k%10=4), the cdc
    // rewrite's pre+post images (k%10=5), the post-restart append
    // (k%50=0); eq_apply / resumed_only_new earned in-engine (feed
    // fingerprints replay v1→head; the checkpoint restart served
    // exactly v5)
    "q424_streaming_cdf_source" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |e AS (SELECT count(*) AS n FROM o WHERE k % 2 = 0),
        |od AS (SELECT count(*) AS n FROM o WHERE k % 2 = 1),
        |d4 AS (SELECT count(*) AS n FROM o WHERE k % 10 = 4),
        |u5 AS (SELECT count(*) AS n FROM o WHERE k % 10 = 5),
        |i50 AS (SELECT count(*) AS n FROM o WHERE k % 50 = 0)
        |SELECT CAST(1 AS BIGINT) AS version, e.n AS n_inserts, CAST(0 AS BIGINT) AS n_deletes,
        |  CAST(0 AS BIGINT) AS n_update_pre, CAST(0 AS BIGINT) AS n_update_post,
        |  CAST(1 AS BIGINT) AS eq_apply, CAST(1 AS BIGINT) AS resumed_only_new FROM e
        |UNION ALL SELECT 2, od.n, 0, 0, 0, 1, 1 FROM od
        |UNION ALL SELECT 3, 0, d4.n, 0, 0, 1, 1 FROM d4
        |UNION ALL SELECT 4, 0, 0, u5.n, u5.n, 1, 1 FROM u5
        |UNION ALL SELECT 5, i50.n, 0, 0, 0, 1, 1 FROM i50
        |ORDER BY version""".stripMargin,
    // q413's 2-of-8 arithmetic, now pinned against the EXECUTED
    // DSv2 plan's file index: bucket width from max(k), the BETWEEN
    // spans zones 0-1 exactly; eq_full earned in-engine (pruned scan
    // ≡ all-files read under the same predicate)
    // q423's pruning generalized to a NON-cluster column: the probe
    // predicate references only m = k + 10M, whose per-file footer
    // stats ride the commit records; 2-of-8 files is the same zone
    // arithmetic as q423 shifted by 10M, and the IS NULL probe plans
    // ZERO files off the null counts (m is never null). eq_full and
    // both scanned counts earned in-engine (read off the executed
    // plan; equal to the unpruned direct read)
    // v1 = the even cohort under the pre-evolution 2-column schema;
    // the head adds the odd cohort written with bonus = cents % 1000,
    // old rows null-filled (n_bonus_null = the even count). n_cols and
    // dup_refused earned in-engine (per-version schema arity; a
    // duplicate ADD COLUMN refuses pre-persist)
    // q423's layout × 4 hive partitions (p = k % 4): 32 files; the
    // scanned counts are the two-level pruning arithmetic (partition
    // prune keeps 8, ∧ the k-zone keeps 2, zone-only keeps 2 zones ×
    // 4 partitions = 8); censuses re-derived from the same cohorts;
    // eq_full and every scanned count earned in-engine (executed-plan
    // file census; equal to the direct all-files read)
    // the per-(version, partition) insert censuses from the two
    // commit cohorts (even keys land p∈{0,2}, odd keys p∈{1,3}); the
    // partition column itself is served from the FileRef dirs, never
    // from file bytes, so matching these censuses IS the plan-time
    // constant working
    "q435_partitioned_cdf" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderkey % 4 AS p,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders)
        |SELECT CAST(1 AS BIGINT) AS version, p, count(*) AS n_rows,
        |  CAST(sum(k) AS BIGINT) AS key_checksum, CAST(sum(cents) AS BIGINT) AS cents_checksum,
        |  count(*) AS n_inserts FROM o WHERE k % 2 = 0 GROUP BY p
        |UNION ALL SELECT 2, p, count(*), CAST(sum(k) AS BIGINT), CAST(sum(cents) AS BIGINT),
        |  count(*) FROM o WHERE k % 2 = 1 GROUP BY p
        |ORDER BY version, p""".stripMargin,
    // phase 2 = untouched partitions ∪ the p=2 replacement cohort
    // (shifted keys, cents+5); phase 3 = the static whole-table
    // replacement; ops_ok earned in-engine (the commit chain's op
    // tags are exactly genesis/append/overwrite_partitions/
    // overwrite_table)
    // phase 1/3 = the full table and the deleted p=2 cohort (both
    // via time travel), phase 2 = the survivors; meta_only /
    // non_aligned_refused / n_after_truncate earned in-engine (commit
    // record shape; loud refusal; metadata truncate to zero)
    // main during staging = the even cohort; the audit (and the
    // published main) = even ∪ odd; heads_ok / typo_refused earned
    // in-engine (branch heads at 1/2 pre-publish; an unknown branch
    // refuses at commit and lands nowhere)
    // the rewrites' change censuses: update pre/post = the k%10=3
    // cohort at original / +7 cents; delete = the k%9=4 cohort whose
    // cents carry the prior update where the cohorts overlap
    // (k ≡ 3 mod 10 ∧ k ≡ 4 mod 9)
    // 8 zone files fold 4-to-1 into 2; the k-range probe that kept
    // 2-of-8 pre-compaction keeps 1-of-2 after (both scanned counts
    // earned off the executed plan); the census is the q423 range
    // arithmetic; eq_across_compaction earned in-engine (head ≡ the
    // pre-compaction version's read)
    // the join census over fact⋈dim; the planning probes (exact
    // reported rowCounts, unaided broadcast, threshold-capped flip to
    // sort-merge) are earned in-engine off the logical/physical plans
    "q441_scan_statistics" ->
      """WITH f AS (SELECT o_orderkey AS k, o_custkey AS cust,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |d AS (SELECT c_custkey AS k,
        |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal FROM customer
        |  WHERE c_custkey % 50 = 0),
        |j AS (SELECT count(*) AS n, CAST(sum(f.cents) AS BIGINT) AS cc,
        |    CAST(sum(d.bal) AS BIGINT) AS bb FROM f JOIN d ON f.cust = d.k)
        |SELECT 'auto_broadcast' AS probe, j.n AS n_rows, j.cc AS cents_checksum,
        |  j.bb AS bal_checksum, CAST(1 AS BIGINT) AS fact_rows_exact,
        |  CAST(1 AS BIGINT) AS dim_rows_exact, CAST(1 AS BIGINT) AS bhj_used,
        |  CAST(1 AS BIGINT) AS smj_when_capped FROM j""".stripMargin,
    // add→rename→drop→re-add over the even/odd order split: v1 = the
    // even cohort under original names; v3 = everything under the
    // renamed column; head = the re-added b is a FRESH physical
    // column, so it reads all-null (b_checksum 0, n_b_null = n);
    // schema widths and the cluster-key-rename refusal earned
    // in-engine
    // three cohort batches land exactly once; the crash-shaped replay
    // of batch 1 (fresh instance, fresh files) publishes nothing —
    // head stays 3, watermark 2; the skip/refusal flags and head/
    // watermark are earned in-engine
    // the feed serves the HEAD schema across the ALTER: v1 (evens) is
    // null-filled bonus; v3 (odds) carries bonus = cents % 1000; the
    // set_schema commit v2 is feed-invisible; the restart/stream≡batch
    // flags are earned in-engine
    // the isolation-matrix censuses: p=1 then p=2 dynamically
    // overwritten with shifted cohorts, p=3's k%10=4 rows DV-deleted
    // and absorbed by the compaction; the land/abort/guard flags are
    // earned in-engine off the commit outcomes
    // per-version feed censuses: v1/v2 = the k%8 insert split; v3 =
    // p=0 removed whole-file; v4 = p=1's live rows deleted + the
    // shifted cohort inserted; v5 = the DV cohort; v6 (compaction) is
    // feed-invisible — no row; eq_apply/compact_invisible earned
    // in-engine
    // censuses of the m-range, 2-D box, and full-table probes (m is
    // the multiplicative hash of k, exact integer arithmetic in both
    // engines); the pruning/eq/feed-silence flags are earned in-engine
    // off the executed plans and the rewrite commit
    "q447_zorder_optimize" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    (o_orderkey * 2654435761) % 65536 AS m,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |mr AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE m BETWEEN 0 AND 8191),
        |bx AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE m BETWEEN 0 AND 8191 AND k BETWEEN w // 2 AND w + w // 2),
        |fl AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_m_range' AS probe, mr.n AS n_rows, mr.kk AS key_checksum,
        |  mr.cc AS cents_checksum, CAST(1 AS BIGINT) AS ok FROM mr
        |UNION ALL SELECT '2_box', bx.n, bx.kk, bx.cc, 1 FROM bx
        |UNION ALL SELECT '3_full_across_rewrite', fl.n, fl.kk, fl.cc, 1 FROM fl
        |ORDER BY probe""".stripMargin,
    // the DPP join census (fact rows whose partition the dim's tag
    // filter selects — p ∈ {2, 5}) and the full census; the planted
    // runtime filter and the post-runtime file census are earned
    // in-engine off the executed plan
    "q448_runtime_pruning" ->
      """WITH f AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 8 AS p FROM orders),
        |j AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM f WHERE p IN (2, 5)),
        |fl AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM f)
        |SELECT '1_dpp_join' AS probe, j.n AS n_rows, j.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS ok FROM j
        |UNION ALL SELECT '2_full', fl.n, fl.cc, 1 FROM fl
        |ORDER BY probe""".stripMargin,
    // enforced phase: the corpus census unchanged across two refused
    // writes (the violating INSERT and the impossible ALTER — both
    // earned in-engine with the head version pinned); after DROP
    // CONSTRAINT the (0, -1) row lands
    "q449_check_constraints" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |base AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_enforced' AS probe, base.n AS n_rows, base.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS ok FROM base
        |UNION ALL SELECT '2_after_drop', base.n + 1, base.cc - 1, 1 FROM base
        |ORDER BY probe""".stripMargin,
    // the source after deleting even keys; the clone after its own
    // one-row insert (the full corpus + (0, 7)); the clone's pinned
    // v1 = the cloned snapshot; zero-copy earned in-engine by the
    // physical file census under the clone's directory
    "q450_shallow_clone" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |src AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 <> 0),
        |cl AS (SELECT count(*) + 1 AS n, CAST(sum(cents) + 7 AS BIGINT) AS cc FROM o),
        |pin AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_source_after_delete' AS probe, src.n AS n_rows, src.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS ok FROM src
        |UNION ALL SELECT '2_clone_after_insert', cl.n, cl.cc, 1 FROM cl
        |UNION ALL SELECT '3_clone_v1_snapshot', pin.n, pin.cc, 1 FROM pin
        |ORDER BY probe""".stripMargin,
    // point probe at max(k), IN probe at {min, max}, and a
    // past-the-range miss; the scanned-file counts (1 / ≤2 / 0 of 8
    // full-range mod-8 files) are earned in-engine off the executed
    // plans' file indexes
    "q451_bloom_skipping" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |hi AS (SELECT max(k) AS hi FROM o), lo AS (SELECT min(k) AS lo FROM o),
        |pt AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o, hi WHERE k = hi),
        |il AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, hi, lo WHERE k = hi OR k = lo)
        |SELECT '1_point' AS probe, pt.n AS n_rows, pt.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS ok FROM pt
        |UNION ALL SELECT '2_in_list', il.n, il.cc, 1 FROM il
        |UNION ALL SELECT '3_miss', 0, 0, 1
        |ORDER BY probe""".stripMargin,
    // the full census, the point probe at max(k), and the {min, max}
    // IN probe; the bucket-pruned file sets (value's bucket only,
    // strictly fewer than all files) are earned in-engine off the
    // executed plans against the driver-side hash arithmetic
    "q452_bucket_transform" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |hi AS (SELECT max(k) AS hi FROM o), lo AS (SELECT min(k) AS lo FROM o),
        |fl AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |pt AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o, hi WHERE k = hi),
        |il AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, hi, lo WHERE k = hi OR k = lo)
        |SELECT '1_full' AS probe, fl.n AS n_rows, fl.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS ok FROM fl
        |UNION ALL SELECT '2_point', pt.n, pt.cc, 1 FROM pt
        |UNION ALL SELECT '3_in_list', il.n, il.cc, 1 FROM il
        |ORDER BY probe""".stripMargin,
    // the same point census before and after the compaction, and the
    // full census (≡ the pre-OPTIMIZE version — time travel earned
    // in-engine); the 1-of-8 → 1-of-2 scanned-file counts and the
    // rebuilt-sidecar pruning are earned off the executed plans
    "q453_bloom_maintenance" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |hi AS (SELECT max(k) AS hi FROM o),
        |pt AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o, hi WHERE k = hi),
        |fl AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_point_pre_optimize' AS probe, pt.n AS n_rows, pt.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS ok FROM pt
        |UNION ALL SELECT '2_point_post_optimize', pt.n, pt.cc, 1 FROM pt
        |UNION ALL SELECT '3_census_across', fl.n, fl.cc, 1 FROM fl
        |ORDER BY probe""".stripMargin,
    "q446_cdf_maintenance" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 4 AS p FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE k % 8 < 4),
        |v2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE k % 8 >= 4),
        |d3 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE p = 0),
        |d4 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o WHERE p = 1),
        |i4 AS (SELECT count(*) AS n, CAST(sum(k + 10000000) AS BIGINT) AS kk FROM o
        |  WHERE p = 1 AND k % 3 = 0),
        |d5 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk FROM o
        |  WHERE p = 3 AND k % 5 = 4)
        |SELECT CAST(1 AS BIGINT) AS version, v1.n AS n_inserts, CAST(0 AS BIGINT) AS n_deletes,
        |  v1.kk AS insert_key_sum, CAST(0 AS BIGINT) AS delete_key_sum,
        |  CAST(1 AS BIGINT) AS eq_apply, CAST(1 AS BIGINT) AS compact_invisible FROM v1
        |UNION ALL SELECT 2, v2.n, 0, v2.kk, 0, 1, 1 FROM v2
        |UNION ALL SELECT 3, 0, d3.n, 0, d3.kk, 1, 1 FROM d3
        |UNION ALL SELECT 4, i4.n, d4.n, i4.kk, d4.kk, 1, 1 FROM i4, d4
        |UNION ALL SELECT 5, 0, d5.n, 0, d5.kk, 1, 1 FROM d5
        |ORDER BY version""".stripMargin,
    "q445_maintenance_matrix" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
        |    o_orderkey % 4 AS p FROM orders),
        |p1n AS (SELECT k + 10000000 AS k, cents + 5 AS cents FROM o WHERE p = 1 AND k % 3 = 0),
        |p2n AS (SELECT k + 20000000 AS k, cents + 9 AS cents FROM o WHERE p = 2 AND k % 3 = 0),
        |c1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |c2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM (SELECT k, cents FROM o WHERE p <> 1 UNION ALL SELECT k, cents FROM p1n)),
        |c3 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM (SELECT k, cents FROM o WHERE p NOT IN (1, 2)
        |        UNION ALL SELECT k, cents FROM p1n UNION ALL SELECT k, cents FROM p2n)),
        |c4 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk, CAST(sum(cents) AS BIGINT) AS cc
        |  FROM (SELECT k, cents FROM o WHERE p = 0
        |        UNION ALL SELECT k, cents FROM o WHERE p = 3 AND k % 5 <> 4
        |        UNION ALL SELECT k, cents FROM p1n UNION ALL SELECT k, cents FROM p2n))
        |SELECT '1_initial' AS phase, c1.n AS n_rows, c1.kk AS key_checksum,
        |  c1.cc AS cents_checksum, CAST(1 AS BIGINT) AS ok FROM c1
        |UNION ALL SELECT '2_disjoint_landed', c2.n, c2.kk, c2.cc, 1 FROM c2
        |UNION ALL SELECT '3_overlap_aborted', c3.n, c3.kk, c3.cc, 1 FROM c3
        |UNION ALL SELECT '4_dv_absorbed', c4.n, c4.kk, c4.cc, 1 FROM c4
        |ORDER BY phase""".stripMargin,
    "q444_cdf_evolution" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |ev AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 = 0),
        |od AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc,
        |    CAST(sum(cents % 1000) AS BIGINT) AS bb FROM o WHERE k % 2 = 1)
        |SELECT CAST(1 AS BIGINT) AS version, ev.n AS n_rows, ev.cc AS cents_checksum,
        |  CAST(0 AS BIGINT) AS bonus_checksum, ev.n AS n_bonus_null,
        |  CAST(1 AS BIGINT) AS resumed_only_new, CAST(1 AS BIGINT) AS schema_commit_empty,
        |  CAST(1 AS BIGINT) AS eq_stream_batch FROM ev
        |UNION ALL SELECT 3, od.n, od.cc, od.bb, 0, 1, 1, 1 FROM od
        |ORDER BY version""".stripMargin,
    "q443_idempotent_writer" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT 'exactly_once' AS probe, b.n AS n_rows, b.kk AS key_checksum,
        |  b.cc AS cents_checksum, CAST(3 AS BIGINT) AS head_version,
        |  CAST(2 AS BIGINT) AS txn_watermark, CAST(1 AS BIGINT) AS applied_ok,
        |  CAST(1 AS BIGINT) AS replay_skipped, CAST(1 AS BIGINT) AS commit_refused FROM b""".stripMargin,
    "q442_column_mapping" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS a,
        |    o_orderkey % 1000 AS b FROM orders),
        |ev AS (SELECT count(*) AS n, CAST(sum(a) AS BIGINT) AS aa,
        |    CAST(sum(b) AS BIGINT) AS bb FROM o WHERE k % 2 = 0),
        |al AS (SELECT count(*) AS n, CAST(sum(a) AS BIGINT) AS aa,
        |    CAST(sum(b) AS BIGINT) AS bb FROM o)
        |SELECT '1_v1_original_names' AS phase, ev.n AS n_rows, ev.aa AS amount_checksum,
        |  ev.bb AS b_checksum, CAST(0 AS BIGINT) AS n_b_null, CAST(3 AS BIGINT) AS n_cols,
        |  CAST(1 AS BIGINT) AS ck_rename_refused FROM ev
        |UNION ALL SELECT '2_v3_renamed', al.n, al.aa, al.bb, 0, 3, 1 FROM al
        |UNION ALL SELECT '3_head_drop_readd', al.n, al.aa, 0, al.n, 3, 1 FROM al
        |ORDER BY phase""".stripMargin,
    "q440_manifest_optimize" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |m AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE k BETWEEN w // 2 AND w + w // 2)
        |SELECT 'compact_4_to_1' AS probe, CAST(8 AS BIGINT) AS n_files_before,
        |  CAST(2 AS BIGINT) AS n_files_after, CAST(2 AS BIGINT) AS n_groups,
        |  CAST(1 AS BIGINT) AS n_files_scanned, m.n AS n_rows, m.kk AS key_checksum,
        |  m.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_across_compaction FROM m""".stripMargin,
    "q439_cdc_on_write" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |u AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 10 = 3),
        |d AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents + CASE WHEN k % 10 = 3 THEN 7 ELSE 0 END) AS BIGINT) AS cc
        |  FROM o WHERE k % 9 = 4)
        |SELECT 'delete' AS change_type, d.n AS n_rows, d.kk AS key_checksum,
        |  d.cc AS cents_checksum FROM d
        |UNION ALL SELECT 'update_postimage', u.n, u.kk, u.cc + 7 * u.n FROM u
        |UNION ALL SELECT 'update_preimage', u.n, u.kk, u.cc FROM u
        |ORDER BY change_type""".stripMargin,
    "q438_wap_sql" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |ev AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 = 0),
        |al AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_main_during_staging' AS phase, ev.n AS n_rows, ev.kk AS key_checksum,
        |  ev.cc AS cents_checksum, CAST(1 AS BIGINT) AS heads_ok,
        |  CAST(1 AS BIGINT) AS typo_refused FROM ev
        |UNION ALL SELECT '2_audit_reads_staged', al.n, al.kk, al.cc, 1, 1 FROM al
        |UNION ALL SELECT '3_published', al.n, al.kk, al.cc, 1, 1 FROM al
        |ORDER BY phase""".stripMargin,
    "q437_metadata_delete" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderkey % 4 AS p,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |sv AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE p <> 2),
        |del AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE p = 2)
        |SELECT '1_initial' AS phase, v1.n AS n_rows, v1.kk AS key_checksum,
        |  v1.cc AS cents_checksum, CAST(1 AS BIGINT) AS meta_only,
        |  CAST(1 AS BIGINT) AS non_aligned_refused, CAST(0 AS BIGINT) AS n_after_truncate FROM v1
        |UNION ALL SELECT '2_after_partition_delete', sv.n, sv.kk, sv.cc, 1, 1, 0 FROM sv
        |UNION ALL SELECT '3_deleted_cohort_time_travel', del.n, del.kk, del.cc, 1, 1, 0 FROM del
        |ORDER BY phase""".stripMargin,
    "q436_partition_overwrite" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderkey % 4 AS p,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |v1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o),
        |keep AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE p <> 2),
        |rep AS (SELECT count(*) AS n, CAST(sum(k + 10000000) AS BIGINT) AS kk,
        |    CAST(sum(cents + 5) AS BIGINT) AS cc FROM o WHERE p = 2 AND k % 3 = 0),
        |v3 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 50 = 0)
        |SELECT '1_initial' AS phase, v1.n AS n_rows, v1.kk AS key_checksum,
        |  v1.cc AS cents_checksum, CAST(1 AS BIGINT) AS ops_ok FROM v1
        |UNION ALL SELECT '2_dynamic_p2_replaced', keep.n + rep.n, keep.kk + rep.kk,
        |  keep.cc + rep.cc, 1 FROM keep, rep
        |UNION ALL SELECT '3_static_whole_table', v3.n, v3.kk, v3.cc, 1 FROM v3
        |ORDER BY phase""".stripMargin,
    "q434_partitioned_manifest" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderkey % 4 AS p,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |po AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE p = 2),
        |bz AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE p = 2 AND k BETWEEN w // 2 AND w + w // 2),
        |zo AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE k BETWEEN w // 2 AND w + w // 2)
        |SELECT '1_partition_only' AS probe, CAST(32 AS BIGINT) AS n_files_total,
        |  CAST(8 AS BIGINT) AS n_files_scanned, po.n AS n_rows, po.kk AS key_checksum,
        |  po.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_full FROM po
        |UNION ALL SELECT '2_partition_and_zone', 32, 2, bz.n, bz.kk, bz.cc, 1 FROM bz
        |UNION ALL SELECT '3_zone_only', 32, 8, zo.n, zo.kk, zo.cc, 1 FROM zo
        |ORDER BY probe""".stripMargin,
    "q433_schema_evolution" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |ev AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc FROM o WHERE k % 2 = 0),
        |od AS (SELECT count(*) AS n, CAST(sum(cents) AS BIGINT) AS cc,
        |    CAST(sum(cents % 1000) AS BIGINT) AS bb FROM o WHERE k % 2 = 1)
        |SELECT '1_v1_pre_evolution' AS phase, ev.n AS n_rows, ev.cc AS cents_checksum,
        |  CAST(0 AS BIGINT) AS bonus_checksum, CAST(0 AS BIGINT) AS n_bonus_null,
        |  CAST(2 AS BIGINT) AS n_cols, CAST(1 AS BIGINT) AS dup_refused FROM ev
        |UNION ALL SELECT '2_head_evolved', ev.n + od.n, ev.cc + od.cc, od.bb, ev.n, 3, 1
        |  FROM ev, od
        |ORDER BY phase""".stripMargin,
    "q432_manifest_column_stats" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderkey + 10000000 AS m,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |sel AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE m BETWEEN 10000000 + w // 2 AND 10000000 + w + w // 2)
        |SELECT '1_noncluster_zone_scan' AS scan, CAST(8 AS BIGINT) AS n_files_total,
        |  CAST(2 AS BIGINT) AS n_files_scanned, sel.n AS n_rows, sel.kk AS key_checksum,
        |  sel.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_full FROM sel
        |UNION ALL SELECT '2_nullcount_prune', 8, 0, 0, 0, 0, 1
        |ORDER BY scan""".stripMargin,
    "q423_manifest_scan_pruning" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |wdt AS (SELECT 1 + max(k) // 8 AS w FROM o),
        |m AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc
        |  FROM o, wdt WHERE k BETWEEN w // 2 AND w + w // 2)
        |SELECT 'dsv2_zone_scan' AS scan, CAST(8 AS BIGINT) AS n_files_total,
        |  CAST(2 AS BIGINT) AS n_files_scanned, m.n AS n_rows, m.kk AS key_checksum,
        |  m.cc AS cents_checksum, CAST(1 AS BIGINT) AS eq_full FROM m""".stripMargin,
    // the cross-instance replay of the q404 matrix: protocol constants
    // are deterministic (B's append = v2 from another instance, A's
    // compaction rebases to v3, B's delete aborts, the torn tail
    // leaves the head at v3); censuses re-derived from the same
    // init ∪ shifted-append fixture; eq_final earned in-engine (a
    // fresh instance's replay-from-disk read vs the expected multiset)
    "q421_durable_log" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_init' AS phase, CAST(1 AS BIGINT) AS version, CAST(1 AS BIGINT) AS attempts,
        |  CAST(0 AS BIGINT) AS rebased, CAST(1 AS BIGINT) AS committed, CAST(0 AS BIGINT) AS n_overlap,
        |  b.n AS n_rows_visible, b.kk AS key_checksum, b.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS eq_final FROM b
        |UNION ALL SELECT '2_append_other_instance', 2, 1, 0, 1, 0,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |UNION ALL SELECT '3_compact_disjoint_rebase', 3, 1, 1, 1, 0,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |UNION ALL SELECT '4_delete_overlap_abort', -1, 1, 0, 0, 1,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |UNION ALL SELECT '5_torn_tail_recovered', 3, 1, 0, 1, 0,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |ORDER BY phase""".stripMargin,
    "q404_occ_commit" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk,
        |    CAST(sum(cents) AS BIGINT) AS cc FROM o)
        |SELECT '1_init' AS phase, CAST(1 AS BIGINT) AS version, CAST(1 AS BIGINT) AS attempts,
        |  CAST(0 AS BIGINT) AS rebased, CAST(1 AS BIGINT) AS committed, CAST(0 AS BIGINT) AS n_overlap,
        |  b.n AS n_rows_visible, b.kk AS key_checksum, b.cc AS cents_checksum,
        |  CAST(1 AS BIGINT) AS eq_final FROM b
        |UNION ALL SELECT '2_append_first_wins', 2, 1, 0, 1, 0,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |UNION ALL SELECT '3_compact_disjoint_rebase', 3, 1, 1, 1, 0,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |UNION ALL SELECT '4_delete_overlap_abort', -1, 1, 0, 0, 1,
        |  2 * b.n, 2 * b.kk + 10000000 * b.n, 2 * b.cc, 1 FROM b
        |ORDER BY phase""".stripMargin,
    // the three WAP versions re-derived from the mod-class fixture:
    // good batch disjoint from main (publishes), poisoned batch's
    // nulls (k%12=5) and main-key collisions (k%6=2 shifted onto %3=0)
    // fail the audit, so v3 ≡ v2 and no poison row is ever visible
    "q402_write_audit_publish" ->
      """WITH o AS (SELECT o_orderkey AS k FROM orders),
        |m AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS ck FROM o WHERE k % 3 = 0),
        |g AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS ck FROM o WHERE k % 3 = 1),
        |p AS (SELECT count(*) AS n FROM o WHERE k % 3 = 2),
        |pn AS (SELECT count(*) AS n FROM o WHERE k % 3 = 2 AND k % 12 = 5),
        |-- dup census mirrors the engine's semi-join: a poison row's
        |-- SHIFTED key (k%6=2 → k+1) counts only if k+1 actually exists
        |-- in the published read (k+1 ≡ 0 mod 3 by construction, and
        |-- dbgen's orderkey runs make it exist — but the oracle checks
        |-- existence rather than assuming the layout)
        |pd AS (SELECT count(*) AS n FROM o
        |  WHERE k % 6 = 2 AND EXISTS (SELECT 1 FROM o m WHERE m.k = o.k + 1 AND m.k % 3 = 0))
        |SELECT 'v1_initial' AS phase, CAST(0 AS BIGINT) AS n_staged_rows,
        |  CAST(0 AS BIGINT) AS n_null_keys, CAST(0 AS BIGINT) AS n_dup_keys_vs_main,
        |  CAST(0 AS BIGINT) AS published, m.n AS n_rows_visible, m.ck AS key_checksum,
        |  CAST(0 AS BIGINT) AS n_poison_visible FROM m
        |UNION ALL SELECT 'v2_good_published', g.n, 0, 0, 1, m.n + g.n, m.ck + g.ck, 0 FROM m, g
        |UNION ALL SELECT 'v3_poison_rejected', p.n, pn.n, pd.n, 0, m.n + g.n, m.ck + g.ck, 0
        |FROM m, g, p, pn, pd
        |ORDER BY phase""".stripMargin,
    // one file per hive leaf by construction, so the file censuses are
    // the partition-value censuses; scans/matches from the predicates
    "q401_partition_evolution" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    year(o_orderdate) AS yr FROM orders),
        |g1 AS (SELECT * FROM o WHERE yr < 1998),
        |g2 AS (SELECT * FROM o WHERE yr >= 1998),
        |a1 AS (SELECT 'g1' AS generation, 'yr' AS partition_scheme,
        |    (SELECT count(DISTINCT yr) FROM g1) AS n_files_total,
        |    (SELECT count(DISTINCT yr) FROM g1 WHERE yr BETWEEN 1996 AND 1999) AS n_files_scanned,
        |    (SELECT count(*) FROM g1 WHERE yr BETWEEN 1996 AND 1999) AS rows_scanned,
        |    (SELECT count(*) FROM g1 WHERE yr BETWEEN 1996 AND 1999 AND st = 'O') AS rows_matched),
        |a2 AS (SELECT 'g2', 'yr,st',
        |    (SELECT count(*) FROM (SELECT DISTINCT yr, st FROM g2)),
        |    (SELECT count(*) FROM (SELECT DISTINCT yr, st FROM g2 WHERE yr BETWEEN 1996 AND 1999 AND st = 'O')),
        |    (SELECT count(*) FROM g2 WHERE yr BETWEEN 1996 AND 1999 AND st = 'O'),
        |    (SELECT count(*) FROM g2 WHERE yr BETWEEN 1996 AND 1999 AND st = 'O'))
        |SELECT *, rows_matched * 1000 // rows_scanned AS scan_permille
        |FROM (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
        |ORDER BY generation""".stripMargin,
    // the evolved final state as one CASE pass (the q391 tier rule);
    // eq_case earned in-engine, NULLS FIRST pins Spark's null order
    "q399_merge_schema_evolution" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |fin AS (SELECT k, st,
        |    CASE WHEN k % 4 = 0 THEN cents + 100000 ELSE cents END AS cents,
        |    CASE WHEN k % 4 = 0 THEN
        |      (CASE WHEN cents + 100000 >= 20000000 THEN 'gold' ELSE 'std' END) END AS tier
        |  FROM o WHERE k % 10 <> 0 OR k % 4 = 0)
        |SELECT tier, count(*) AS n_rows, CAST(sum(cents) AS BIGINT) AS cents_checksum,
        |  CAST(sum(k) AS BIGINT) AS key_checksum, CAST(1 AS BIGINT) AS eq_case
        |FROM fin GROUP BY tier ORDER BY tier NULLS FIRST""".stripMargin,
    // per-phase live census re-derived from the cohort predicates;
    // eq_eager earned in-engine (DV-subtracted read vs full rewrite),
    // amplification = rows an eager delete rewrites per tombstone row
    "q400_deletion_vectors" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |ca AS (SELECT count(*) AS n FROM o WHERE k % 20 = 3),
        |cb AS (SELECT count(*) AS n FROM o WHERE k % 20 = 7),
        |e1 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk, CAST(sum(cents) AS BIGINT) AS ck
        |  FROM o WHERE k % 20 <> 3),
        |e2 AS (SELECT count(*) AS n, CAST(sum(k) AS BIGINT) AS kk, CAST(sum(cents) AS BIGINT) AS ck
        |  FROM o WHERE k % 20 <> 3 AND k % 20 <> 7)
        |SELECT '1_delete_dv' AS phase, e1.n AS n_live, e1.kk AS key_checksum, e1.ck AS cents_checksum,
        |  (SELECT n FROM ca) AS n_dv_entries, CAST(1 AS BIGINT) AS eq_eager,
        |  CAST(e1.n * 1000 // (SELECT n FROM ca) AS BIGINT) AS rewrite_amplification_permille
        |FROM e1
        |UNION ALL SELECT '2_stacked_dv', e2.n, e2.kk, e2.ck,
        |  (SELECT n FROM ca) + (SELECT n FROM cb), 1,
        |  CAST(e2.n * 1000 // (SELECT n FROM cb) AS BIGINT) FROM e2
        |UNION ALL SELECT '3_compacted', e2.n, e2.kk, e2.ck, 0, 1, NULL FROM e2
        |ORDER BY phase""".stripMargin,
    // the paired shadow comparison replayed: both serve mirrors, the
    // per-query hit census from the brute truth, and the exact sign
    // test — C(n,k) by the integral recurrence in a recursive HUGEINT
    // CTE, denominator = the binomials' own sum (2^n), all integer
    "q398_ann_rollout_gate" ->
      s"""WITH RECURSIVE stale AS MATERIALIZED (SELECT qid, nid FROM (${annIvfPqSqlK(3, trainPred = "vid % 10 <> 7")}) t),
         |fresh AS MATERIALIZED (SELECT qid, nid FROM ($annIvfPqSql) t),
         |bt AS MATERIALIZED (SELECT qid, nid FROM (${annBruteSqlK(3)}) t),
         |pq AS MATERIALIZED (SELECT bt.qid,
         |    CAST(count(s.nid) AS BIGINT) AS hits_stale,
         |    CAST(count(f.nid) AS BIGINT) AS hits_fresh
         |  FROM bt LEFT JOIN stale s ON s.qid = bt.qid AND s.nid = bt.nid
         |  LEFT JOIN fresh f ON f.qid = bt.qid AND f.nid = bt.nid
         |  GROUP BY bt.qid),
         |nn AS (SELECT CAST(sum(CASE WHEN hits_fresh > hits_stale THEN 1 ELSE 0 END) AS BIGINT) AS wins,
         |    CAST(sum(CASE WHEN hits_fresh < hits_stale THEN 1 ELSE 0 END) AS BIGINT) AS losses FROM pq),
         |bin AS (SELECT CAST(0 AS BIGINT) AS k, CAST(1 AS HUGEINT) AS c, wins + losses AS n FROM nn
         |  UNION ALL SELECT k + 1, c * (n - k) // (k + 1), n FROM bin WHERE k < n),
         |pv AS (SELECT CAST((SELECT sum(c) FROM bin WHERE k >= (SELECT wins FROM nn)) * 1000000000
         |    // (SELECT sum(c) FROM bin) AS BIGINT) AS p_value_nano)
         |SELECT pq.qid, pq.hits_stale, pq.hits_fresh, pq.hits_fresh - pq.hits_stale AS delta,
         |  nn.wins, nn.losses, pv.p_value_nano,
         |  CAST(CASE WHEN nn.wins > nn.losses AND pv.p_value_nano < 50000000 THEN 1 ELSE 0 END AS BIGINT) AS promoted
         |FROM pq, nn, pv ORDER BY qid""".stripMargin,
    // field-level lineage of the nested fixture report — plan
    // metadata, pinned literally (the q389 convention): struct paths,
    // the map key, the VARIANT path, and the whole-struct reference
    "q394_field_lineage" ->
      """SELECT * FROM (VALUES
        |  ('n_named', 'cust_nested', 'profile.name', CAST(1 AS BIGINT)),
        |  ('n_contact', 'cust_nested', 'attrs_v.contact', CAST(1 AS BIGINT)),
        |  ('n_profiles', 'cust_nested', 'profile', CAST(1 AS BIGINT)),
        |  ('n_segged', 'cust_nested', 'attrs_m[''seg'']', CAST(0 AS BIGINT)),
        |  ('nation_code', 'cust_nested', 'profile.nation.code', CAST(0 AS BIGINT)),
        |  ('total_balance', 'cust_nested', 'balance', CAST(0 AS BIGINT))
        |) AS t(out_col, src_table, src_col, sensitive_edge)
        |ORDER BY out_col, src_col""".stripMargin,
    // full-sync final state as one CASE pass; clause censuses from the
    // same predicates; both equality audits earned in-engine, pinned
    "q395_merge_full_sync" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders),
        |fin AS (SELECT k, st,
        |    CASE WHEN k % 10 <> 0 AND k % 13 = 0 THEN CAST(-1 AS BIGINT)
        |      WHEN k % 7 = 0 THEN cents + 100000
        |      ELSE cents END AS cents
        |  FROM o
        |  WHERE NOT (k % 10 = 0 AND k % 13 = 0)
        |    AND NOT (k % 10 <> 0 AND k % 13 = 0 AND st = 'O')),
        |ins AS (SELECT st, count(*) AS n_inserted FROM o WHERE k % 10 = 0 AND k % 13 <> 0 GROUP BY st),
        |exd AS (SELECT st, count(*) AS n_expired FROM o WHERE k % 10 <> 0 AND k % 13 = 0 AND st = 'O' GROUP BY st),
        |tmb AS (SELECT st, count(*) AS n_tombstoned FROM o WHERE k % 10 <> 0 AND k % 13 = 0 AND st <> 'O' GROUP BY st),
        |ag AS (SELECT st, count(*) AS n_after FROM fin GROUP BY st)
        |SELECT ag.st AS o_orderstatus, ag.n_after,
        |  CAST(COALESCE(ins.n_inserted, 0) AS BIGINT) AS n_inserted,
        |  CAST(COALESCE(exd.n_expired, 0) AS BIGINT) AS n_expired_deleted,
        |  CAST(COALESCE(tmb.n_tombstoned, 0) AS BIGINT) AS n_tombstoned,
        |  CAST(1 AS BIGINT) AS eq_declarative, CAST(1 AS BIGINT) AS eq_procedural
        |FROM ag LEFT JOIN ins ON ins.st = ag.st LEFT JOIN exd ON exd.st = ag.st
        |LEFT JOIN tmb ON tmb.st = ag.st
        |ORDER BY o_orderstatus""".stripMargin,
    // the surviving manifests re-read after the engine's JVM exits
    // (q379's convention); v1/v2 refusals with their missing-file
    // censuses, v2's naive partial answer re-derived from the logical
    // table, v3 re-answered from the data
    "q396_vacuum_pin_expiry" ->
      """WITH m AS (SELECT version, dir, file_name
        |  FROM read_parquet('/tmp/graft_vacuum_expiry/sf0.01/manifests/*.parquet')),
        |fc AS (SELECT version, count(*) AS n_manifest_files
        |  FROM (SELECT DISTINCT version, dir, file_name FROM m) GROUP BY 1),
        |req AS (SELECT DISTINCT dir, file_name FROM m WHERE version = 3),
        |ms AS (SELECT version, count(*) AS n_missing
        |  FROM (SELECT DISTINCT version, dir, file_name FROM m) mm
        |  ANTI JOIN req USING (dir, file_name) GROUP BY version),
        |o2 AS (SELECT count(*) AS n FROM orders
        |  WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1999-01-01'),
        |o3 AS (SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS ck FROM orders
        |  WHERE o_orderdate < DATE '1999-01-01'),
        |a AS (
        |  SELECT 1 AS version, CAST(0 AS BIGINT) AS pinned, CAST(1 AS BIGINT) AS refused,
        |    CAST(0 AS BIGINT) AS n_rows_naive, CAST(NULL AS BIGINT) AS n_rows_guarded,
        |    CAST(NULL AS BIGINT) AS key_checksum, CAST(NULL AS BIGINT) AS eq_after_vacuum
        |  UNION ALL SELECT 2, 0, 1, (SELECT n FROM o2), NULL, NULL, NULL
        |  UNION ALL SELECT 3, 1, 0, NULL, (SELECT n FROM o3), (SELECT ck FROM o3), 1)
        |SELECT CAST(a.version AS INTEGER) AS version, pinned, fc.n_manifest_files,
        |  CAST(COALESCE(ms.n_missing, 0) AS BIGINT) AS n_files_missing,
        |  refused, n_rows_naive, n_rows_guarded, key_checksum, eq_after_vacuum
        |FROM a JOIN fc ON fc.version = a.version LEFT JOIN ms ON ms.version = a.version
        |ORDER BY version""".stripMargin,
    // the enacted layouts re-priced from the logical cells (the q388
    // audit, two layouts); advisor_eq pinned — the engine earns it by
    // comparing the physical per-file census to this same prediction
    "q397_hilbert_enact" -> {
      val hChain = graft.operators.SpaceFill
        .levels(6)
        .zipWithIndex
        .map { case (sv, k) =>
          val (nx, ny, dt) = graft.operators.SpaceFill.hilbertStep(sv, s"x$k", s"y$k")
          s"h${k + 1} AS (SELECT db, pb, $nx AS x${k + 1}, $ny AS y${k + 1}, d$k + $dt AS d${k + 1} FROM h$k)"
        }
        .mkString(",\n")
      def audit(src: String, fileExpr: String, name: String): String =
        s"""SELECT '$name' AS layout, count(*) AS n_files,
           |  CAST(sum(CASE WHEN hi_d >= 10 AND lo_d <= 19 AND hi_p >= 10 AND lo_p <= 19 THEN 1 ELSE 0 END) AS BIGINT) AS files_touched,
           |  CAST(sum(CASE WHEN hi_d >= 10 AND lo_d <= 19 AND hi_p >= 10 AND lo_p <= 19 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
           |  CAST(sum(n_rows) AS BIGINT) AS rows_total
           |FROM (SELECT $fileExpr AS f, count(*) AS n_rows,
           |    min(db) AS lo_d, max(db) AS hi_d, min(pb) AS lo_p, max(pb) AS hi_p
           |  FROM $src GROUP BY 1)""".stripMargin
      s"""WITH b AS (SELECT
         |    least(date_diff('day', DATE '1992-01-01', o_orderdate) // 64, 63) AS db,
         |    least(CAST(floor(o_totalprice / 10000) AS BIGINT), 63) AS pb
         |  FROM orders),
         |h0 AS (SELECT db, pb, db AS x0, pb AS y0, CAST(0 AS BIGINT) AS d0 FROM b),
         |$hChain,
         |mt AS (SELECT count(*) AS rows_matched FROM b
         |  WHERE db BETWEEN 10 AND 19 AND pb BETWEEN 10 AND 19),
         |au AS (${audit("h6", "d6 // 64", "hilbert")}
         |  UNION ALL
         |  ${audit("b", "(db * 64 + pb) // 64", "date_major")})
         |SELECT layout, n_files, files_touched, rows_total, rows_scanned,
         |  (SELECT rows_matched FROM mt) AS rows_matched,
         |  CAST(rows_scanned * 1000 // rows_total AS BIGINT) AS scan_permille,
         |  CAST(1 AS BIGINT) AS advisor_eq
         |FROM au ORDER BY layout""".stripMargin
    }
  )

  /** q195/q246 shared winnowing chain: char-8-gram 60-bit prints,
    * naive sliding-min spelling (states the semantics; the engine runs
    * the two-block decomposition), full-windows-only plus the
    * short-doc global min — ends in `fps(doc_id, fp)` distinct.
    */
  private lazy val winnowFpsCtes: String =
    """idx AS (SELECT doc_id, CAST(unnest(generate_series(1, greatest(length(text) - 7, 1))) AS INTEGER) AS i, text FROM documents),
      |g AS (SELECT doc_id, i, CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 15)) AS BIGINT) AS h, count(*) OVER (PARTITION BY doc_id) AS cnt FROM idx),
      |wmin AS (SELECT doc_id, i, cnt, min(h) OVER (PARTITION BY doc_id ORDER BY i ROWS BETWEEN CURRENT ROW AND 49 FOLLOWING) AS fp FROM g),
      |fps AS (SELECT DISTINCT doc_id, fp FROM wmin WHERE i + 49 <= cnt
      |  UNION SELECT doc_id, min(h) AS fp FROM g WHERE cnt < 50 GROUP BY doc_id)""".stripMargin

  /** q237/q241 shared chain: KN bigram-LM count tables → per-bigram
    * integer micro-nat log-probs → per-doc sums and truncated means.
    */
  private lazy val perplexityCtes: String = {
    def mn(e: String) = s"CAST(floor(ln(CAST($e AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
    raw"""d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
       |bg AS (SELECT doc_id, ws[i] AS lft, ws[i+1] AS rgt FROM (
       |    SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i FROM d WHERE len(ws) >= 2)),
       |cnt AS (SELECT lft, rgt, count(*) AS c FROM bg GROUP BY 1, 2),
       |lc AS (SELECT lft, CAST(sum(c) AS BIGINT) AS cl, count(*) AS n1p FROM cnt GROUP BY lft),
       |rc AS (SELECT rgt, count(*) AS nleft FROM cnt GROUP BY rgt),
       |nbt AS (SELECT count(*) AS nb FROM cnt),
       |st AS (SELECT cnt.lft, cnt.rgt,
       |    ${mn("nb * (c * 4 - 3) + n1p * nleft * 3")} - ${mn("cl * nb * 4")} AS lp_micro
       |  FROM cnt JOIN lc USING (lft) JOIN rc USING (rgt), nbt),
       |p AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(lp_micro) AS BIGINT) AS sum_lp
       |  FROM bg JOIN st USING (lft, rgt) GROUP BY doc_id),
       |q AS (SELECT doc_id, n_bigrams, sum_lp // n_bigrams AS mean_logp_micro FROM p)""".stripMargin
  }

  /** q222 (and q239's input): upper-triangle power sums; float×float
    * exact in double, decimal cast per the q102 convention; covariance
    * assembled in fixed-order double ops.
    */
  private lazy val covarianceSql: String = {
    val cov = away(
      "(CAST(sxy AS DOUBLE) * n_vecs - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (n_vecs * n_vecs)",
      6
    )
    """WITH prs AS (SELECT i.i AS dim_i, j.j AS dim_j
      |  FROM (SELECT unnest(generate_series(1, 6)) AS i) i,
      |       (SELECT unnest(generate_series(1, 6)) AS j) j
      |  WHERE j.j >= i.i),
      |p AS (SELECT dim_i, dim_j,
      |    CAST(embedding[CAST(dim_i AS INTEGER)] AS DECIMAL(25,12)) AS dx,
      |    CAST(embedding[CAST(dim_j AS INTEGER)] AS DECIMAL(25,12)) AS dy,
      |    CAST(CAST(embedding[CAST(dim_i AS INTEGER)] AS DOUBLE)
      |       * CAST(embedding[CAST(dim_j AS INTEGER)] AS DOUBLE) AS DECIMAL(25,12)) AS dxy
      |  FROM embeddings, prs),
      |s AS (SELECT dim_i, dim_j, count(*) AS n_vecs,
      |    sum(dx) AS sx, sum(dy) AS sy, sum(dxy) AS sxy
      |  FROM p GROUP BY 1, 2)
      |SELECT CAST(dim_i AS INTEGER) AS dim_i, CAST(dim_j AS INTEGER) AS dim_j, n_vecs,
      |""".stripMargin + cov + " AS cov_val FROM s ORDER BY dim_i, dim_j"
  }

  /** q239: the q222 covariance re-derived as a CTE, the SAME fixed-order
    * cyclic-Jacobi eigensolver as operators/Pca unrolled into 1-row CTE
    * chains — one (θ, t, (c,s), updated A+V) quartet per rotation of the
    * fixed 6-sweep schedule, every FP expression a left-associative
    * chain and the only libm call IEEE-exact sqrt — then the top-2
    * columns of V selected by descending diagonal and applied per
    * embedding.
    */
  // `final` without a type annotation = a compile-time constant, which
  // matters: the `sql` map val forces the lazy pca SQL during object
  // construction, BEFORE later plain vals initialize (a non-final val
  // here would read as 0 and generate empty CTE bodies)
  private final val PcaDims = 6

  /** Centered projection of an embedding onto basis-CTE `b`, divided by
    * nothing ("" scale) or an expression suffix.
    */
  private def pcaProjExpr(b: String): String =
    (1 to PcaDims).map(i => s"(CAST(embedding[$i] AS DOUBLE) - mu.m$i) * $b.w$i").mkString(" + ")

  /** Shared q239/q242 prefix: covariance + means + the unrolled Jacobi
    * chain, ending in the 6-row eigenpair CTE `eg` (idx, ev, w1..w6).
    */
  /** The unrolled cyclic-Jacobi rotation chain over a caller-supplied
    * `j0` CTE holding (a11..a66, v11..v66): one (θ, t, (c,s), updated
    * A+V) quartet per rotation of the fixed 6-sweep schedule. Shared
    * by the PCA family (over the covariance) and the Procrustes drift
    * mirror (over MᵀM). Returns (rotationCtes, lastCteName).
    */
  private def jacobiRotationCtes(dims: Int): (String, String) = {
    val ds = 1 to dims
    val schedule = for { _ <- 1 to 6; p <- 1 until dims; q <- p + 1 to dims } yield (p, q)
    // MATERIALIZED throughout: DuckDB inlines single-reference CTEs, and
    // each rotation references the previous state ~100 times — textual
    // expansion would re-expand the parquet scan combinatorially
    // (observed as "Too many open files" with the 36 cv subqueries)
    val rotations = schedule.zipWithIndex.map { case ((p, q), idx) =>
      val r = idx + 1
      val prev = s"j${r - 1}"
      // one MATERIALIZED CTE per rotation: the θ → t → (c, s) scalar
      // chain nests as single-reference subqueries (inlined exactly
      // once each — same IEEE expressions, same order), so only the
      // updated state j$r materializes. 90 pipelines per chain instead
      // of 360 — the per-CTE scheduling overhead was the oracle wall's
      // floor once the re-inlining bugs were fixed.
      val rot = s"rot$r AS (SELECT 1.0 / sqrt(t * t + 1.0) AS c, " +
        s"t * (1.0 / sqrt(t * t + 1.0)) AS s FROM " +
        s"(SELECT CASE WHEN apq = 0.0 THEN 0.0 " +
        s"WHEN theta >= 0.0 THEN 1.0 / (theta + sqrt(theta * theta + 1.0)) " +
        s"ELSE 1.0 / (theta - sqrt(theta * theta + 1.0)) END AS t FROM " +
        s"(SELECT a$p$q AS apq, " +
        s"CASE WHEN a$p$q = 0.0 THEN 0.0 ELSE (a$q$q - a$p$p) / (2.0 * a$p$q) END AS theta " +
        s"FROM $prev) th$r) tt$r)"
      def aCol(i: Int, j: Int): String =
        if (i == p && j == p) s"c * c * a$p$p - 2.0 * s * c * a$p$q + s * s * a$q$q"
        else if (i == q && j == q) s"s * s * a$p$p + 2.0 * s * c * a$p$q + c * c * a$q$q"
        else if ((i == p && j == q) || (i == q && j == p)) "0.0"
        else if (i == p) s"c * a$p$j - s * a$q$j"
        else if (j == p) s"c * a$p$i - s * a$q$i"
        else if (i == q) s"s * a$p$j + c * a$q$j"
        else if (j == q) s"s * a$p$i + c * a$q$i"
        else s"a$i$j"
      def vCol(i: Int, j: Int): String =
        if (j == p) s"c * v$i$p - s * v$i$q"
        else if (j == q) s"s * v$i$p + c * v$i$q"
        else s"v$i$j"
      val cols = (for { i <- ds; j <- ds } yield s"${aCol(i, j)} AS a$i$j") ++
        (for { i <- ds; j <- ds } yield s"${vCol(i, j)} AS v$i$j")
      val jn = s"j$r AS MATERIALIZED (SELECT ${cols.mkString(", ")} FROM $prev, rot$r)"
      Seq(rot, jn).mkString(",\n")
    }
    (rotations.mkString(",\n"), s"j${schedule.size}")
  }

  private lazy val pcaCommonCtes: String = {
    val dims = PcaDims
    val ds = 1 to dims
    val (rotations, last) = jacobiRotationCtes(dims)
    val cmCols = (for { i <- ds; j <- ds } yield {
      val (lo, hi) = (math.min(i, j), math.max(i, j))
      s"(SELECT cov_val FROM cv WHERE dim_i = $lo AND dim_j = $hi) AS c$i$j"
    }).mkString(",\n    ")
    val j0Cols = (for { i <- ds; j <- ds } yield s"cm.c$i$j AS a$i$j") ++
      (for { i <- ds; j <- ds } yield s"${if (i == j) "1.0" else "0.0"} AS v$i$j")
    // NOT a decimal sum: cross-engine float→decimal casts diverge at
    // ~1e-7 relative (DuckDB renders the float's shortest 7-digit form
    // first; Spark widens through the exact double). floor(x·2³⁰) is
    // pure IEEE → identical BIGINTs → exact sum → fixed-order double
    // mean, bit-identical to the driver's (see Pca.momentsFromCov).
    val muCols = ds
      .map(i =>
        s"CAST(sum(CAST(floor(CAST(embedding[$i] AS DOUBLE) * 1073741824.0) AS BIGINT)) AS DOUBLE)" +
          s" / count(*) / 1073741824.0 AS m$i"
      )
      .mkString(",\n    ")
    val egRows = ds
      .map(j => s"SELECT $j AS idx, a$j$j AS ev, ${ds.map(i => s"v$i$j AS w$i").mkString(", ")} FROM $last")
      .mkString("\nUNION ALL ")
    s"""cv AS MATERIALIZED ($covarianceSql),
       |mu AS MATERIALIZED (SELECT $muCols FROM embeddings),
       |cm AS MATERIALIZED (SELECT $cmCols),
       |j0 AS MATERIALIZED (SELECT ${j0Cols.mkString(", ")} FROM cm),
       |$rotations,
       |eg AS MATERIALIZED ($egRows)""".stripMargin
  }

  /** Ranked-eigenpair CTE: `name` = the k-th pair by (ev DESC, idx). */
  private def pcaRankCte(name: String, k: Int): String =
    s"$name AS MATERIALIZED (SELECT * FROM eg ORDER BY ev DESC, idx LIMIT 1 OFFSET ${k - 1})"

  private lazy val pcaSql: String =
    s"""WITH $pcaCommonCtes,
       |${pcaRankCte("b1", 1)},
       |${pcaRankCte("b2", 2)}
       |SELECT vec_id,
       |  ${away(pcaProjExpr("b1"), 6)} AS pc1,
       |  ${away(pcaProjExpr("b2"), 6)} AS pc2,
       |  ${away("b1.ev", 6)} AS eig1,
       |  ${away("b2.ev", 6)} AS eig2
       |FROM embeddings, mu, b1, b2
       |ORDER BY vec_id""".stripMargin

  /** q242: the full ordered eigenbasis applied with 1/√λ scaling. */
  private lazy val whitenSql: String = {
    val ranks = (1 to PcaDims).map(k => pcaRankCte(s"b$k", k)).mkString(",\n")
    val cols = (1 to PcaDims)
      .map(k => s"  ${away(s"(${pcaProjExpr(s"b$k")}) / sqrt(b$k.ev)", 6)} AS wc$k")
      .mkString(",\n")
    s"""WITH $pcaCommonCtes,
       |$ranks
       |SELECT vec_id,
       |$cols
       |FROM embeddings, mu, ${(1 to PcaDims).map(k => s"b$k").mkString(", ")}
       |ORDER BY vec_id""".stripMargin
  }

  /** q324: the same covariance + unrolled Jacobi chain; variance
    * products per PQ subspace under the three allocation schemes,
    * the snake order being the parametric-OPQ balance.
    */
  private lazy val opqSql: String = {
    val ranks = (1 to PcaDims).map(k => pcaRankCte(s"b$k", k)).mkString(",\n")
    val dgn = (1 to PcaDims)
      .map(i => s"(SELECT cov_val FROM cv WHERE dim_i = $i AND dim_j = $i) AS d$i")
      .mkString(", ")
    s"""WITH $pcaCommonCtes,
       |$ranks,
       |dgn AS (SELECT $dgn),
       |pr AS (
       |  SELECT '1_original' AS scheme, 1 AS subspace, d1 * d2 AS p FROM dgn
       |  UNION ALL SELECT '1_original', 2, d3 * d4 FROM dgn
       |  UNION ALL SELECT '1_original', 3, d5 * d6 FROM dgn
       |  UNION ALL SELECT '2_pca_ordered', 1, b1.ev * b2.ev FROM b1, b2
       |  UNION ALL SELECT '2_pca_ordered', 2, b3.ev * b4.ev FROM b3, b4
       |  UNION ALL SELECT '2_pca_ordered', 3, b5.ev * b6.ev FROM b5, b6
       |  UNION ALL SELECT '3_pca_snake', 1, b1.ev * b6.ev FROM b1, b6
       |  UNION ALL SELECT '3_pca_snake', 2, b2.ev * b5.ev FROM b2, b5
       |  UNION ALL SELECT '3_pca_snake', 3, b3.ev * b4.ev FROM b3, b4
       |)
       |SELECT scheme, CAST(subspace AS INTEGER) AS subspace, ${away("p", 6)} AS var_product,
       |  CAST(floor(mx / mn * 1000.0 + 0.5) AS BIGINT) AS balance_permille
       |FROM (SELECT *, max(p) OVER (PARTITION BY scheme) AS mx,
       |      min(p) OVER (PARTITION BY scheme) AS mn FROM pr)
       |ORDER BY scheme, subspace""".stripMargin
  }

  /** q328: transition counts from per-user prefixes, then 32 rounds of
    * synchronous integer value iteration UNROLLED as materialized CTEs
    * (the q239 Jacobi pattern) — once for the base chain and once per
    * removed channel. Channel list is the generator's fixed event
    * domain minus the conversion event (the q292 fixed-terms posture).
    */
  private lazy val markovSql: String = {
    val chans = Seq("click", "error", "signup", "view")
    val rounds = 32
    def chain(tag: String, excluded: Option[String]): String = {
      val states = ("START" +: chans.filterNot(excluded.contains)).map(c => s"'$c'").mkString(", ")
      val ex = excluded.map(c => s"WHERE e.s <> '$c' AND e.t <> '$c'").getOrElse("")
      val base = s"v_${tag}_0 AS (SELECT s, CAST(0 AS BIGINT) AS v FROM (SELECT unnest([$states]) AS s))"
      val steps = (1 to rounds).map { r =>
        s"""v_${tag}_$r AS MATERIALIZED (SELECT e.s,
           |    CAST((max(kc.kconv) + coalesce(sum(e.c * cv.v), 0)) // max(tt.tot) AS BIGINT) AS v
           |  FROM edgesx e JOIN v_${tag}_${r - 1} cv ON cv.s = e.t
           |  JOIN tot tt ON tt.s = e.s JOIN kc ON kc.s = e.s
           |  $ex GROUP BY e.s)""".stripMargin
      }
      (base +: steps).mkString(",\n")
    }
    val chains = (("base", None) +: chans.map(c => (c, Some(c)))).map { case (t, ex) => chain(t, ex) }.mkString(",\n")
    val resRows = chans
      .map(c =>
        s"SELECT '$c' AS channel, (SELECT v FROM v_base_$rounds WHERE s = 'START') AS base_conv_nano, " +
          s"(SELECT v FROM v_${c}_$rounds WHERE s = 'START') AS removal_conv_nano"
      )
      .mkString("\nUNION ALL ")
    s"""WITH ev AS MATERIALIZED (SELECT user_id, ts, event_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk FROM events),
       |fp AS (SELECT user_id, min(rk) AS fp_rk FROM ev WHERE event_type = 'purchase' GROUP BY 1),
       |kept AS (SELECT ev.*, fp.fp_rk FROM ev LEFT JOIN fp USING (user_id)
       |  WHERE fp.fp_rk IS NULL OR ev.rk <= fp.fp_rk),
       |nx AS MATERIALIZED (SELECT *, lead(event_type) OVER (PARTITION BY user_id ORDER BY rk) AS next_type FROM kept),
       |edges0 AS (
       |  SELECT 'START' AS s, CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS t
       |  FROM nx WHERE rk = 1
       |  UNION ALL
       |  SELECT event_type, CASE WHEN next_type = 'purchase' THEN 'CONV' ELSE next_type END
       |  FROM nx WHERE next_type IS NOT NULL
       |  UNION ALL
       |  SELECT event_type, 'NULL' FROM nx WHERE next_type IS NULL AND fp_rk IS NULL),
       |edges AS MATERIALIZED (SELECT s, t, CAST(count(*) AS BIGINT) AS c FROM edges0 GROUP BY 1, 2),
       |edgesx AS MATERIALIZED (SELECT s, t, c FROM edges
       |  UNION ALL SELECT DISTINCT s, 'START', CAST(0 AS BIGINT) FROM edges),
       |tot AS MATERIALIZED (SELECT s, CAST(sum(c) AS BIGINT) AS tot FROM edges GROUP BY 1),
       |kc AS MATERIALIZED (SELECT s, CAST(sum(CASE WHEN t = 'CONV' THEN c ELSE 0 END) AS BIGINT) * 1000000000 AS kconv
       |  FROM edges GROUP BY 1),
       |$chains,
       |res AS ($resRows),
       |eff AS (SELECT channel, base_conv_nano, removal_conv_nano,
       |    (base_conv_nano - removal_conv_nano) * 1000 // base_conv_nano AS effect_permille,
       |    base_conv_nano - removal_conv_nano AS d FROM res),
       |sm AS (SELECT CAST(sum(d) AS BIGINT) AS sd FROM eff)
       |SELECT channel, base_conv_nano, removal_conv_nano, effect_permille,
       |  CASE WHEN sm.sd = 0 THEN CAST(0 AS BIGINT) ELSE d * 1000 // sm.sd END AS share_permille
       |FROM eff, sm ORDER BY channel""".stripMargin
  }

  /** Shared by q213 (plain v2-state run) and q228 (warm-start run) —
    * both must equal the full per-user lifetime aggregate.
    */
  private lazy val lifetimeStatsSql: String =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(COALESCE(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)) AS BIGINT) AS sum_cents,
      |  min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Shared BPE training chain (q210 + q238): word-frequency base and
    * three (pairs → argmax → replace) CTE rounds, producing merge CTEs
    * b1..b3 and word states w1..w3; optional per-round vocab recounts
    * v1..v3 (q210's report column only).
    */
  private def bpeTrainCtes(withVocabCounts: Boolean): String = {
    def pairs(wn: String, pn: String) =
      s"""$pn AS (SELECT ss[i] AS a, ss[i+1] AS b, CAST(sum(freq) AS BIGINT) AS pf FROM (
         |    SELECT list_filter(string_split(sym, '|'), x -> x <> '') AS ss, freq,
         |      unnest(generate_series(1, len(list_filter(string_split(sym, '|'), x -> x <> '')) - 1)) AS i
         |    FROM $wn) GROUP BY 1, 2)""".stripMargin
    def best(pn: String, bn: String) =
      s"$bn AS (SELECT a, b, pf FROM $pn ORDER BY pf DESC, a, b LIMIT 1)"
    def apply(wn: String, bn: String, wn2: String) =
      s"$wn2 AS (SELECT replace(sym, '|'||a||'|'||b||'|', '|'||a||b||'|') AS sym, freq FROM $wn, $bn)"
    def vocab(wn: String, vn: String) =
      s"$vn AS (SELECT count(DISTINCT x) AS n FROM (SELECT unnest(list_filter(string_split(sym, '|'), x -> x <> '')) AS x FROM $wn))"
    val roundCtes = (1 to 3)
      .map { r =>
        val prev = if (r == 1) "w0" else s"w${r - 1}"
        val base = Seq(pairs(prev, s"p$r"), best(s"p$r", s"b$r"), apply(prev, s"b$r", s"w$r"))
        (if (withVocabCounts) base :+ vocab(s"w$r", s"v$r") else base).mkString(",\n")
      }
      .mkString(",\n")
    raw"""toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents),
       |w0 AS (SELECT '|' || regexp_replace(w, '(.)', '\1|', 'g') AS sym, count(*) AS freq
       |  FROM toks WHERE regexp_matches(w, '^[a-z]+$$') GROUP BY w),
       |$roundCtes""".stripMargin
  }

  /** q210: the training chain + per-round vocab size report. */
  private lazy val bpeMergeSql: String =
    s"""WITH ${bpeTrainCtes(withVocabCounts = true)}
       |SELECT * FROM (
       |  SELECT 1 AS round, a AS left_sym, b AS right_sym, pf AS pair_freq, (SELECT n FROM v1) AS n_sym_after FROM b1
       |  UNION ALL SELECT 2, a, b, pf, (SELECT n FROM v2) FROM b2
       |  UNION ALL SELECT 3, a, b, pf, (SELECT n FROM v3) FROM b3
       |) ORDER BY round""".stripMargin

  /** q238: the training chain's learned merges b1..b3 applied to the
    * distinct word vocabulary, then rolled up per document.
    */
  private lazy val bpeEncodeSql: String =
    raw"""WITH ${bpeTrainCtes(withVocabCounts = false)},
       |toks2 AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$')),
       |v0 AS (SELECT DISTINCT w, '|' || regexp_replace(w, '(.)', '\1|', 'g') AS sym FROM toks2),
       |u1 AS (SELECT w, replace(sym, '|'||a||'|'||b||'|', '|'||a||b||'|') AS sym FROM v0, b1),
       |u2 AS (SELECT w, replace(sym, '|'||a||'|'||b||'|', '|'||a||b||'|') AS sym FROM u1, b2),
       |u3 AS (SELECT w, replace(sym, '|'||a||'|'||b||'|', '|'||a||b||'|') AS sym FROM u2, b3),
       |enc AS (SELECT w, CAST(len(list_filter(string_split(sym, '|'), x -> x <> '')) AS BIGINT) AS n_tok,
       |    CAST(length(w) AS BIGINT) AS n_ch FROM u3),
       |p AS (SELECT doc_id, count(*) AS n_words, CAST(sum(n_ch) AS BIGINT) AS n_chars,
       |    CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM toks2 JOIN enc USING (w) GROUP BY doc_id)
       |SELECT doc_id, n_words, n_chars, n_tokens,
       |  n_chars * 1000 // n_tokens AS chars_per_token_permille
       |FROM p ORDER BY doc_id""".stripMargin

  /** q343: the Selinger enumeration replayed — same 8 connected
    * orders, same interleaved-division cardinality model, in HUGEINT.
    */
  private lazy val joinOrderSql: String = {
    val tn = Seq("region", "nation", "customer", "orders")
    val orders = Seq(
      Seq(0, 1, 2, 3),
      Seq(1, 0, 2, 3),
      Seq(1, 2, 0, 3),
      Seq(1, 2, 3, 0),
      Seq(2, 1, 0, 3),
      Seq(2, 1, 3, 0),
      Seq(2, 3, 1, 0),
      Seq(3, 2, 1, 0)
    )
    def sizeExpr(i: Int, j: Int): String = {
      var e = s"CAST(c$i AS HUGEINT)"
      for (k <- i + 1 to j) e = s"(($e * c$k) // m${k - 1}$k)"
      e
    }
    val branches = orders
      .map { o =>
        val cost = (2 to 4)
          .map { len => val p = o.take(len); sizeExpr(p.min, p.max) }
          .mkString("(", " + ", ")")
        s"SELECT '${o.map(tn).mkString("->")}' AS join_order, $cost AS est_cost, ${sizeExpr(0, 3)} AS est_final_rows FROM m"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH st AS (SELECT * FROM
       |    (SELECT count(*) AS c0, count(DISTINCT r_regionkey) AS d0 FROM region),
       |    (SELECT count(*) AS c1, count(DISTINCT n_regionkey) AS d1r, count(DISTINCT n_nationkey) AS d1n FROM nation),
       |    (SELECT count(*) AS c2, count(DISTINCT c_nationkey) AS d2n, count(DISTINCT c_custkey) AS d2c FROM customer),
       |    (SELECT count(*) AS c3, count(DISTINCT o_custkey) AS d3 FROM orders)),
       |m AS (SELECT *, greatest(d0, d1r) AS m01, greatest(d1n, d2n) AS m12, greatest(d2c, d3) AS m23 FROM st),
       |costs AS ($branches)
       |SELECT join_order, CAST(est_cost AS BIGINT) AS est_cost,
       |  CAST(est_final_rows AS BIGINT) AS est_final_rows,
       |  CAST(CASE WHEN est_cost = (SELECT min(est_cost) FROM costs) THEN 1 ELSE 0 END AS INTEGER) AS is_best
       |FROM costs ORDER BY est_cost, join_order""".stripMargin
  }

  /** q352: within-cell LOF replayed — the q36 Lloyd assignment CTEs,
    * then integer-grid distances, corrected isqrt, and the fixed-point
    * lrd/lof chain.
    */
  private lazy val lofSql: String = {
    import IvfSqlBits.score
    s"""WITH ${IvfSqlBits.lloydCtes},
       |sf AS (SELECT v.vid, v.e, c.j, ${score("v", "c")} AS s FROM v, c2 c),
       |asn AS MATERIALIZED (SELECT vid, e, j AS cell FROM (SELECT vid, e, j,
       |    row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1),
       |sz AS (SELECT cell, count(*) AS n FROM asn GROUP BY 1),
       |ok AS MATERIALIZED (SELECT asn.vid, asn.cell, list_transform(asn.e, x -> CAST(floor(x * 1024) AS BIGINT)) AS q
       |  FROM asn JOIN sz USING (cell) WHERE n >= 4),
       |pr AS (SELECT a.vid AS av, b.vid AS bv, a.cell AS cell,
       |    CAST(list_sum(list_transform(generate_series(1, 64), i ->
       |      (a.q[CAST(i AS INTEGER)] - b.q[CAST(i AS INTEGER)])
       |        * (a.q[CAST(i AS INTEGER)] - b.q[CAST(i AS INTEGER)]))) AS BIGINT) AS d2
       |  FROM ok a JOIN ok b ON a.cell = b.cell AND a.vid <> b.vid),
       |dd AS (SELECT *, CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT) AS s0 FROM pr),
       |de AS (SELECT av, bv, cell,
       |    CASE WHEN (s0 + 1) * (s0 + 1) <= d2 THEN s0 + 1 WHEN s0 * s0 > d2 THEN s0 - 1 ELSE s0 END AS d
       |  FROM dd),
       |nb AS MATERIALIZED (SELECT av, bv, cell, d FROM (SELECT *,
       |    row_number() OVER (PARTITION BY av ORDER BY d, bv) AS rn FROM de) t WHERE rn <= 3),
       |kd AS MATERIALIZED (SELECT av AS vid, max(d) AS kdist FROM nb GROUP BY 1),
       |lr AS MATERIALIZED (SELECT nb.av AS vid,
       |    CAST(3 * 1048576 // greatest(sum(greatest(kb.kdist, nb.d)), 1) AS BIGINT) AS lrd
       |  FROM nb JOIN kd kb ON kb.vid = nb.bv GROUP BY 1),
       |sl AS (SELECT nb.av AS vid, CAST(sum(lb.lrd) AS BIGINT) AS slrd
       |  FROM nb JOIN lr lb ON lb.vid = nb.bv GROUP BY 1)
       |SELECT sl.vid AS vec_id, CAST(ok.cell AS INTEGER) AS cell, kd.kdist, lr.lrd AS lrd_fp,
       |  CAST(sl.slrd * 1000 // (3 * lr.lrd) AS BIGINT) AS lof_permille
       |FROM sl JOIN lr ON lr.vid = sl.vid JOIN kd ON kd.vid = sl.vid JOIN ok ON ok.vid = sl.vid
       |ORDER BY lof_permille DESC, vec_id LIMIT 10""".stripMargin
  }

  /** q353: κ replayed — q36 Lloyd assignment, per-cell majority label
    * (count desc, label asc), then the confusion-matrix integers.
    */
  private lazy val kappaSql: String = {
    import IvfSqlBits.score
    s"""WITH ${IvfSqlBits.lloydCtes},
       |sf AS (SELECT v.vid, c.j, ${score("v", "c")} AS s FROM v, c2 c),
       |asn AS (SELECT vid, j AS cell FROM (SELECT vid, j,
       |    row_number() OVER (PARTITION BY vid ORDER BY s DESC, j DESC) AS rn FROM sf) t WHERE rn = 1),
       |lab AS (SELECT a.vid, a.cell, e2.label FROM asn a JOIN embeddings e2 ON e2.vec_id = a.vid),
       |mj AS (SELECT cell, label AS pred FROM (SELECT cell, label,
       |    row_number() OVER (PARTITION BY cell ORDER BY c DESC, label) AS rn
       |  FROM (SELECT cell, label, count(*) AS c FROM lab GROUP BY 1, 2)) t WHERE rn = 1),
       |cf AS (SELECT lab.label, mj.pred, count(*) AS c FROM lab JOIN mj USING (cell) GROUP BY 1, 2),
       |dg AS (SELECT CAST(COALESCE(sum(c), 0) AS BIGINT) AS agree FROM cf WHERE label = pred),
       |rc AS (SELECT label, sum(c) AS rowc FROM cf GROUP BY 1),
       |cc AS (SELECT pred AS label, sum(c) AS colc FROM cf GROUP BY 1),
       |ch AS (SELECT sum(CAST(COALESCE(rowc, 0) AS HUGEINT) * COALESCE(colc, 0)) AS pe_num,
       |    count(*) AS n_classes FROM rc FULL JOIN cc USING (label)),
       |nn AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cf)
       |SELECT n, n_classes, CAST(agree * 1000 // n AS BIGINT) AS agree_permille,
       |  CAST(pe_num * 1000 // (CAST(n AS HUGEINT) * n) AS BIGINT) AS chance_permille,
       |  CAST((CAST(n AS HUGEINT) * agree - pe_num) * 1000
       |    // (CAST(n AS HUGEINT) * n - pe_num) AS BIGINT) AS kappa_permille
       |FROM nn, dg, ch""".stripMargin
  }

  /** q350: the four synchronous LPA rounds unrolled over the q27
    * candidate pairs — majority vote with smallest-label ties, self
    * vote included, exactly the engine's min(struct(-c, lbl)) rule.
    */
  private lazy val labelPropSql: String = {
    val rounds = (1 to 4)
      .map { r =>
        s"""m$r AS (SELECT e.src AS id, l.lbl FROM e JOIN l${r - 1} l ON e.dst = l.id
           |  UNION ALL SELECT id, lbl FROM l${r - 1}),
           |l$r AS MATERIALIZED (SELECT id, lbl FROM (SELECT id, lbl,
           |    row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
           |  FROM (SELECT id, lbl, count(*) AS c FROM m$r GROUP BY 1, 2)) WHERE rn = 1)""".stripMargin
      }
      .mkString(",\n")
    s"""WITH prs AS MATERIALIZED (SELECT d1, d2 FROM ($minhashSql)),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM
       |  (SELECT d1 AS src, d2 AS dst FROM prs UNION ALL SELECT d2, d1 FROM prs)),
       |l0 AS MATERIALIZED (SELECT DISTINCT src AS id, src AS lbl FROM e),
       |$rounds,
       |com AS (SELECT lbl AS community, count(*) AS n_members FROM l4 GROUP BY 1),
       |tot AS (SELECT count(*) AS n_communities FROM com)
       |SELECT community, n_members, (SELECT n_communities FROM tot) AS n_communities
       |FROM com WHERE n_members >= 2
       |ORDER BY n_members DESC, community LIMIT 20""".stripMargin
  }

  /** q347: the mutual-best matching rounds replayed over q202's pair
    * scores — rank-1-both-sides per round, matched ids leave the pool.
    */
  private lazy val mutualBestSql: String = {
    val rounds = (1 to 3)
      .map { r =>
        val prev = if (r == 1) "" else s"""p$r AS MATERIALIZED (SELECT * FROM p${r - 1}
           |  WHERE new_id NOT IN (SELECT new_id FROM m${r - 1})
           |    AND old_id NOT IN (SELECT old_id FROM m${r - 1})),\n""".stripMargin
        s"""${prev}bn$r AS (SELECT new_id, old_id FROM (SELECT new_id, old_id,
           |    row_number() OVER (PARTITION BY new_id ORDER BY w DESC, old_id) AS rn FROM p$r) WHERE rn = 1),
           |bo$r AS (SELECT new_id, old_id FROM (SELECT new_id, old_id,
           |    row_number() OVER (PARTITION BY old_id ORDER BY w DESC, new_id) AS rn FROM p$r) WHERE rn = 1),
           |m$r AS MATERIALIZED (SELECT p.new_id, p.old_id, p.w FROM p$r p
           |  JOIN bn$r USING (new_id, old_id) JOIN bo$r USING (new_id, old_id))""".stripMargin
      }
      .mkString(",\n")
    val selects = (1 to 3)
      .map(r => s"SELECT CAST($r AS INTEGER) AS round, new_id, old_id, w AS jaccard_permille FROM m$r")
      .mkString("\nUNION ALL\n")
    s"""WITH base AS ($incrementalDedupSql),
       |p1 AS MATERIALIZED (SELECT new_id, old_id, CAST(jaccard_permille AS BIGINT) AS w FROM base),
       |$rounds
       |$selects
       |ORDER BY round, new_id""".stripMargin
  }

  /** q346: the v-optimal DP replayed — same fixed-point SSE, same
    * unrolled L1..L6 min-fold over the ≤50-value p_size support.
    */
  private lazy val vOptimalSql: String = {
    val levels = (2 to 6)
      .map { b =>
        s"""l$b AS (SELECT rj AS e, min(pc + err_fp) AS cost FROM pairs
           |  JOIN (SELECT e AS pe, cost AS pc FROM l${b - 1}) p ON ri - 1 = pe GROUP BY rj)""".stripMargin
      }
      .mkString(",\n")
    val branches = (1 to 6)
      .map { b =>
        s"""SELECT CAST($b AS INTEGER) AS n_buckets, CAST(cost AS BIGINT) AS min_sse_fp,
           |  CAST(n AS BIGINT) AS n_values FROM l$b, nm WHERE e = n""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"""WITH sup AS (SELECT p_size AS v, count(*) AS f FROM part GROUP BY 1),
       |pre AS (SELECT v, f, row_number() OVER (ORDER BY v) AS r,
       |    CAST(sum(f) OVER (ORDER BY v) AS HUGEINT) AS sf,
       |    CAST(sum(CAST(f AS HUGEINT) * f) OVER (ORDER BY v) AS HUGEINT) AS sf2 FROM sup),
       |pairs AS (SELECT i.r AS ri, j.r AS rj,
       |    (j.sf2 - (i.sf2 - CAST(i.f AS HUGEINT) * i.f)) * 1048576
       |      - ((j.sf - (i.sf - i.f)) * (j.sf - (i.sf - i.f)) * 1048576) // (j.r - i.r + 1) AS err_fp
       |  FROM pre j JOIN pre i ON j.r >= i.r),
       |nm AS (SELECT max(r) AS n FROM pre),
       |l1 AS (SELECT rj AS e, err_fp AS cost FROM pairs WHERE ri = 1),
       |$levels
       |$branches
       |ORDER BY n_buckets""".stripMargin
  }

  /** q342: per candidate-pair FD audit (exact + g3 violation mass),
    * one rollup CTE per pair, unioned — mirrors the engine's
    * pair-independent keyed aggregates.
    */
  private lazy val fdProfileSql: String = {
    val pairs = Seq(
      ("customer", "c_custkey", "c_nationkey"),
      ("customer", "c_nationkey", "c_mktsegment"),
      ("orders", "o_orderkey", "o_orderstatus"),
      ("orders", "o_custkey", "o_orderpriority"),
      ("part", "p_partkey", "p_brand"),
      ("part", "p_brand", "p_type")
    )
    val ctes = pairs.zipWithIndex
      .map { case ((tbl, lhs, rhs), i) =>
        s"""a$i AS (SELECT l, sum(c) AS tot, max(c) AS mx, count(*) AS nd FROM (
           |    SELECT CAST($lhs AS VARCHAR) AS l, CAST($rhs AS VARCHAR) AS r, count(*) AS c
           |    FROM $tbl GROUP BY 1, 2) GROUP BY l)""".stripMargin
      }
      .mkString(",\n")
    val selects = pairs.zipWithIndex
      .map { case ((tbl, lhs, rhs), i) =>
        s"""SELECT '$tbl' AS tbl, '$lhs' AS lhs, '$rhs' AS rhs, count(*) AS n_groups,
           |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_groups,
           |  CAST(sum(tot - mx) AS BIGINT) AS g3_violations,
           |  CAST(CASE WHEN max(nd) = 1 THEN 1 ELSE 0 END AS INTEGER) AS is_fd
           |FROM a$i""".stripMargin
      }
      .mkString("\nUNION ALL\n")
    s"WITH $ctes\n$selects\nORDER BY tbl, lhs, rhs"
  }

  /** q361: the v-optimal DP with argmin backtrace over the
    * o_totalprice/10k support, histogram-mass selectivity for the
    * `< 15` cut, the q343 chain pricing with the filtered cardinality,
    * and the executed audit join.
    */
  private lazy val histogramJoinSql: String = {
    def level(b: Int): String =
      s"""l$b AS MATERIALIZED (SELECT e, cost, pe FROM (SELECT rj AS e, pc + err_fp AS cost, pe2 AS pe,
         |    row_number() OVER (PARTITION BY rj ORDER BY pc + err_fp, pe2) AS rn
         |  FROM pairs JOIN (SELECT e AS pe2, cost AS pc FROM l${b - 1}) ON ri - 1 = pe2) WHERE rn = 1)""".stripMargin
    val tn = Seq("nation", "customer", "orders_f")
    val orders3 = Seq(Seq(0, 1, 2), Seq(1, 0, 2), Seq(1, 2, 0), Seq(2, 1, 0))
    def sizeExpr(i: Int, j: Int): String = {
      var e = s"CAST(c$i AS HUGEINT)"
      for (k <- i + 1 to j) e = s"(($e * c$k) // m${k - 1}$k)"
      e
    }
    val branches = orders3
      .map { o =>
        val cost = (2 to 3)
          .map { len => val p = o.take(len); sizeExpr(p.min, p.max) }
          .mkString("(", " + ", ")")
        s"SELECT '${o.map(tn).mkString("->")}' AS join_order, $cost AS est_cost, ${sizeExpr(0, 2)} AS est_final_rows FROM m"
      }
      .mkString("\nUNION ALL\n")
    s"""WITH sup AS (SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS v, count(*) AS f
       |  FROM orders GROUP BY 1),
       |pre AS MATERIALIZED (SELECT v, f, row_number() OVER (ORDER BY v) AS r,
       |    CAST(sum(f) OVER (ORDER BY v) AS BIGINT) AS sf,
       |    CAST(sum(CAST(f AS HUGEINT) * f) OVER (ORDER BY v) AS HUGEINT) AS sf2 FROM sup),
       |pairs AS MATERIALIZED (SELECT i.r AS ri, j.r AS rj,
       |    (j.sf2 - (i.sf2 - CAST(i.f AS HUGEINT) * i.f)) * 1048576
       |      - ((j.sf - (i.sf - i.f)) * (j.sf - (i.sf - i.f)) * 1048576) // (j.r - i.r + 1) AS err_fp
       |  FROM pre j JOIN pre i ON j.r >= i.r),
       |nm AS (SELECT max(r) AS n FROM pre),
       |l1 AS MATERIALIZED (SELECT rj AS e, err_fp AS cost, 0 AS pe FROM pairs WHERE ri = 1),
       |${level(2)},
       |${level(3)},
       |${level(4)},
       |c3 AS (SELECT pe AS e3 FROM l4, nm WHERE e = n),
       |c2x AS (SELECT l3.pe AS e2, e3 FROM l3, c3 WHERE l3.e = e3),
       |c1x AS (SELECT l2.pe AS e1, e2, e3 FROM l2, c2x WHERE l2.e = e2),
       |bks AS (SELECT 0 AS lo_r, e1 AS hi_r FROM c1x
       |  UNION ALL SELECT e1, e2 FROM c1x
       |  UNION ALL SELECT e2, e3 FROM c1x
       |  UNION ALL SELECT e3, n FROM c1x, nm),
       |bst AS (SELECT lo.v AS lo_v, hi.v AS hi_v, hi.sf - COALESCE(lo2.sf, 0) AS mass
       |  FROM bks JOIN pre hi ON hi.r = bks.hi_r
       |  JOIN pre lo ON lo.r = bks.lo_r + 1
       |  LEFT JOIN pre lo2 ON lo2.r = bks.lo_r),
       |eh AS (SELECT CAST(sum(CASE WHEN hi_v < 15 THEN mass WHEN lo_v >= 15 THEN 0
       |    ELSE mass * (15 - lo_v) // (hi_v - lo_v + 1) END) AS BIGINT) AS est_o_rows_hist FROM bst),
       |vm AS (SELECT min(v) AS vmin, max(v) AS vmax, CAST(sum(f) AS BIGINT) AS n_orders FROM sup),
       |eu AS (SELECT CAST(n_orders * least(greatest(15 - vmin, 0), vmax - vmin + 1)
       |    // (vmax - vmin + 1) AS BIGINT) AS est_o_rows_uniform FROM vm),
       |exo AS (SELECT CAST(COALESCE(sum(f), 0) AS BIGINT) AS exact_o_rows FROM sup WHERE v < 15),
       |st AS (SELECT * FROM
       |    (SELECT count(*) AS c0, count(DISTINCT n_nationkey) AS d0n FROM nation),
       |    (SELECT count(*) AS c1, count(DISTINCT c_nationkey) AS d1n, count(DISTINCT c_custkey) AS d1c FROM customer),
       |    (SELECT count(DISTINCT o_custkey) AS d2 FROM orders), eh),
       |m AS (SELECT *, est_o_rows_hist AS c2, greatest(d0n, d1n) AS m01, greatest(d1c, d2) AS m12 FROM st),
       |costs AS ($branches),
       |exq AS (SELECT count(*) AS executed_final_rows FROM nation
       |  JOIN customer ON n_nationkey = c_nationkey
       |  JOIN orders ON c_custkey = o_custkey
       |  WHERE CAST(floor(o_totalprice / 10000) AS BIGINT) < 15)
       |SELECT join_order, CAST(est_cost AS BIGINT) AS est_cost,
       |  CAST(est_final_rows AS BIGINT) AS est_final_rows,
       |  CAST(CASE WHEN est_cost = (SELECT min(est_cost) FROM costs) THEN 1 ELSE 0 END AS INTEGER) AS is_best,
       |  est_o_rows_hist, est_o_rows_uniform, exact_o_rows,
       |  CAST(executed_final_rows AS BIGINT) AS executed_final_rows,
       |  CAST((est_final_rows - executed_final_rows) * 1000 // executed_final_rows AS BIGINT) AS final_err_permille
       |FROM costs, eh, eu, exo, exq ORDER BY est_cost, join_order""".stripMargin
  }

  /** The q366/q374 truss peel as CTEs: `prs` (candidate pairs), `e0`
    * (normalized edges), four peeling rounds ending in `e4`.
    * MATERIALIZED is load-bearing (the q118/HITS lesson): every round
    * references the previous edge set three times, so an inlined chain
    * re-derives the whole banding pipeline 3^r times.
    */
  private lazy val trussRoundCtes: String = {
    val rounds = (1 to 4)
      .map { r =>
        s"""sym$r AS MATERIALIZED (SELECT lo AS u, hi AS v FROM e${r - 1} UNION ALL SELECT hi, lo FROM e${r - 1}),
           |sp$r AS MATERIALIZED (SELECT a.v AS a, b.v AS b, count(*) AS supp
           |  FROM sym$r a JOIN sym$r b ON a.u = b.u AND a.v < b.v GROUP BY 1, 2),
           |e$r AS MATERIALIZED (SELECT lo, hi FROM e${r - 1}
           |  LEFT JOIN sp$r ON sp$r.a = lo AND sp$r.b = hi
           |  WHERE COALESCE(supp, 0) >= 1)""".stripMargin
      }
      .mkString(",\n")
    s"""prs AS (SELECT d1, d2 FROM ($minhashSql)),
       |e0 AS MATERIALIZED (SELECT DISTINCT least(d1, d2) AS lo, greatest(d1, d2) AS hi FROM prs WHERE d1 <> d2),
       |$rounds""".stripMargin
  }

  private lazy val incrementalDedupSql: String = {
    val probeJoins = (0 until 4)
      .map(j =>
        s"SELECT a.doc_id AS new_id, b.doc_id AS old_id FROM band a JOIN band b ON a.band_$j = b.band_$j AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0"
      )
      .mkString("\nUNION\n")
    s"""WITH $minhashBandCtes,
       |cand AS ($probeJoins),
       |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
       |it AS (SELECT c.new_id, c.old_id, count(*) AS inter FROM cand c
       |  JOIN sh x ON x.doc_id = c.new_id JOIN sh y ON y.doc_id = c.old_id AND y.g = x.g
       |  GROUP BY 1, 2)
       |SELECT it.new_id, it.old_id, inter,
       |  inter * 1000 // (x.n_sh + y.n_sh - inter) AS jaccard_permille
       |FROM it JOIN sz x ON it.new_id = x.doc_id JOIN sz y ON it.old_id = y.doc_id
       |WHERE inter * 2 >= x.n_sh + y.n_sh - inter
       |ORDER BY new_id, old_id""".stripMargin
  }
}
