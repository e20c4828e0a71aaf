package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Similarity.ivfTopK]]
  * (IVF-flat approximate top-k), optionally preceded by `iters` rounds
  * of [[graft.operators.Similarity.kmeansIterate]] Lloyd refinement.
  *
  * Fully relational — unlike [[AnnOracle]] no literals are injected:
  * the seed centroids are themselves corpus rows (`vec_id < nlist`, the
  * deterministic sample), and every refinement round is unrolled as the
  * same assign → quantized-mean CTE chain the Spark side executes. All
  * cosines are left-fold double on both engines (`graft_dot` ≡
  * `list_cosine_similarity`, bitwise); the centroid mean accumulates
  * `floor(x·2²⁰)` in exact BIGINT (order-independent) with one double
  * division at the end, so refined centroids — and therefore cell
  * assignment, probe choice and ranking — match bitwise across engines.
  * Ties break on centroid id in both engines (stated rule; bitwise
  * cosine ties between distinct centroids do not occur in practice). */
object IvfOracle {

  /** The unrolled Lloyd-refinement CTE chain (assign → quantized mean),
    * shared by [[sql]] and [[driftSql]]; references a `corp` CTE the
    * caller defines. */
  private def refineChain(iters: Int, dim: Int): String =
    (1 to iters).map { i =>
      val prev = s"cent${i - 1}"
      s"""asg$i AS (
         |  SELECT n_id, c_id FROM (
         |    SELECT corp.n_id, c.c_id, row_number() OVER (PARTITION BY corp.n_id
         |      ORDER BY list_cosine_similarity(corp.v, c.cv) DESC, c.c_id ASC) rk
         |    FROM corp, $prev c) t WHERE rk = 1),
         |el$i AS (
         |  SELECT a.c_id, t.i AS pos, c2.v[t.i] AS x
         |  FROM asg$i a, corp c2, range(1, ${dim + 1}) t(i)
         |  WHERE c2.n_id = a.n_id),
         |sum$i AS (
         |  SELECT c_id, pos, sum(CAST(floor(x * 1048576.0) AS BIGINT)) sq, count(*) cnt
         |  FROM el$i GROUP BY c_id, pos),
         |cent$i AS (
         |  SELECT c_id, list(CAST(sq AS DOUBLE) / (1048576.0 * CAST(cnt AS DOUBLE))
         |                    ORDER BY pos) cv
         |  FROM sum$i GROUP BY c_id),""".stripMargin
    }.mkString("\n")

  /** q146 mirror of [[graft.operators.Similarity.ivfBalanceAudit]]:
    * the engine's ivfAssign validity filters replayed explicitly
    * (non-null, right-length vectors on both sides), argmax-cell
    * assignment, per-cell counts over ALL valid centroids (empty
    * cells kept), the q144 two-step fixed-point rates, and the
    * integer imbalance factor. */
  def balanceSql(nlist: Int = 16, dim: Int = 64): String =
    s"""WITH corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |cent AS (SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings
       |  WHERE vec_id < $nlist AND embedding IS NOT NULL AND len(embedding) = $dim),
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, cent) t WHERE rk = 1),
       |cnt AS (SELECT c.c_id,
       |    CAST(coalesce(a.n, 0) AS BIGINT) AS n_vecs
       |  FROM cent c LEFT JOIN (
       |    SELECT c_id, count(*) n FROM assign GROUP BY c_id) a USING (c_id)),
       |tt AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total,
       |    CAST(count(*) AS BIGINT) AS n_cells,
       |    CAST(sum(CASE WHEN n_vecs = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
       |  FROM cnt),
       |rb AS (SELECT c_id, n_vecs,
       |    CAST(CASE WHEN n_total = 0 THEN 0
       |      ELSE ((n_vecs * 1024) // n_total) * 1024
       |        + (((n_vecs * 1024) % n_total) * 1024) // n_total
       |      END AS BIGINT) AS r_q,
       |    n_cells, n_empty
       |  FROM cnt, tt),
       |s2 AS (SELECT CAST(sum(r_q * r_q) AS BIGINT) AS s FROM rb)
       |SELECT rb.c_id, rb.n_vecs, rb.r_q, rb.n_cells, rb.n_empty,
       |  CAST((rb.n_cells * s2.s) // 1048576 AS BIGINT) AS imb_q
       |FROM rb, s2""".stripMargin

  /** q172 mirror of [[graft.operators.Similarity
    * .clusterBalancedSample]]: the argmax-cell assignment (engine
    * validity filters replayed), the q98 Hamilton chain over the
    * cell census (√cell-count weights, largest-remainder seats tied
    * by ascending cell id), and the q101 md5-rank execution within
    * each cell. */
  def clusterBalancedSampleSql(nlist: Int = 16, dim: Int = 64,
      budget: Long = 137L): String =
    s"""WITH corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |cent AS (SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings
       |  WHERE vec_id < $nlist AND embedding IS NOT NULL AND len(embedding) = $dim),
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, cent) t WHERE rk = 1),
       |per AS (SELECT CAST(c_id AS BIGINT) AS cell,
       |    CAST(count(*) AS BIGINT) AS n_size
       |  FROM assign GROUP BY 1),
       |q AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
       |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
       |b AS (SELECT cell, s_q, ($budget * s_q) // s AS base,
       |    $budget * s_q - (($budget * s_q) // s) * s AS rem FROM q, tot),
       |l AS (SELECT CAST($budget - sum(base) AS BIGINT) AS leftover FROM b),
       |a AS (SELECT cell, base + CASE WHEN
       |      CAST(row_number() OVER (ORDER BY rem DESC, cell ASC) AS BIGINT) <= leftover
       |    THEN 1 ELSE 0 END AS alloc FROM b, l),
       |ranked AS (SELECT CAST(n_id AS BIGINT) AS vec_id,
       |    CAST(c_id AS BIGINT) AS cell,
       |    CAST(row_number() OVER (PARTITION BY c_id
       |      ORDER BY md5('graft' || CAST(n_id AS VARCHAR)) ASC, n_id ASC) AS BIGINT) AS rk
       |  FROM assign)
       |SELECT vec_id, cell FROM ranked JOIN a USING (cell) WHERE rk <= alloc""".stripMargin

  /** q178 mirror of [[graft.operators.Similarity
    * .incrementalClusterSample]]: the q114 membership split, the
    * argmax assignment of the FULL frame to standing-seeded cells,
    * the q98 Hamilton quotas over the STANDING census, and the
    * batch's md5-rank admission into each cell's residual seats
    * (cells with no standing row admit nothing). */
  def incrementalClusterSampleSql(nlist: Int = 16, dim: Int = 64,
      budget: Long = 137L, newPermille: Int = 100,
      salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt, "vec_id")
    s"""WITH mem AS (SELECT vec_id, (($bucket) % 1000 < $newPermille) is_new
       |            FROM embeddings WHERE vec_id IS NOT NULL),
       |alle AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |corp AS (SELECT a.n_id, a.v FROM alle a JOIN mem ON mem.vec_id = a.n_id
       |         WHERE NOT mem.is_new),
       |cent AS (SELECT n_id c_id, v cv FROM corp WHERE n_id < $nlist),
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM alle, cent) t WHERE rk = 1),
       |per AS (SELECT CAST(a.c_id AS BIGINT) AS cell,
       |    CAST(count(*) AS BIGINT) AS n_std
       |  FROM assign a JOIN mem ON mem.vec_id = a.n_id
       |  WHERE NOT mem.is_new GROUP BY 1),
       |q AS (SELECT *, CAST(floor(sqrt(n_std) * 1048576) AS BIGINT) AS s_q FROM per),
       |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
       |b AS (SELECT cell, n_std, s_q, ($budget * s_q) // s AS base,
       |    $budget * s_q - (($budget * s_q) // s) * s AS rem FROM q, tot),
       |l AS (SELECT CAST($budget - sum(base) AS BIGINT) AS leftover FROM b),
       |a AS (SELECT cell, n_std, base + CASE WHEN
       |      CAST(row_number() OVER (ORDER BY rem DESC, cell ASC) AS BIGINT) <= leftover
       |    THEN 1 ELSE 0 END AS alloc FROM b, l),
       |newv AS (SELECT CAST(asg.n_id AS BIGINT) AS vec_id,
       |    CAST(asg.c_id AS BIGINT) AS cell,
       |    CAST(row_number() OVER (PARTITION BY asg.c_id
       |      ORDER BY md5('$salt' || CAST(asg.n_id AS VARCHAR)) ASC, asg.n_id ASC) AS BIGINT) AS rk
       |  FROM assign asg JOIN mem ON mem.vec_id = asg.n_id
       |  WHERE mem.is_new)
       |SELECT n.vec_id, n.cell,
       |  CAST(CASE WHEN n.rk <= greatest(coalesce(a.alloc, 0) - coalesce(a.n_std, 0), 0)
       |    THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM newv n LEFT JOIN a ON a.cell = n.cell""".stripMargin
  }

  /** q175 mirror of [[graft.operators.Similarity
    * .clusterBalancedSampleSheet]]: the q172 assignment + Hamilton
    * chain closing as the per-cell acceptance sheet (population,
    * quota, executed keep count, natural vs kept 2^20 fixed-point
    * shares). */
  def clusterBalancedSampleSheetSql(nlist: Int = 16, dim: Int = 64,
      budget: Long = 137L): String =
    s"""WITH corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |cent AS (SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings
       |  WHERE vec_id < $nlist AND embedding IS NOT NULL AND len(embedding) = $dim),
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, cent) t WHERE rk = 1),
       |per AS (SELECT CAST(c_id AS BIGINT) AS cell,
       |    CAST(count(*) AS BIGINT) AS n_vecs
       |  FROM assign GROUP BY 1),
       |q AS (SELECT *, CAST(floor(sqrt(n_vecs) * 1048576) AS BIGINT) AS s_q FROM per),
       |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
       |b AS (SELECT cell, n_vecs, s_q, ($budget * s_q) // s AS base,
       |    $budget * s_q - (($budget * s_q) // s) * s AS rem FROM q, tot),
       |l AS (SELECT CAST($budget - sum(base) AS BIGINT) AS leftover FROM b),
       |a AS (SELECT cell, n_vecs, base + CASE WHEN
       |      CAST(row_number() OVER (ORDER BY rem DESC, cell ASC) AS BIGINT) <= leftover
       |    THEN 1 ELSE 0 END AS alloc FROM b, l),
       |k AS (SELECT cell, n_vecs, alloc,
       |    least(alloc, n_vecs) AS n_kept FROM a),
       |t2 AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS tv,
       |    CAST(sum(n_kept) AS BIGINT) AS tk FROM k)
       |SELECT cell, n_vecs, CAST(alloc AS BIGINT) AS alloc,
       |  CAST(n_kept AS BIGINT) AS n_kept,
       |  CAST((n_vecs * 1048576) // tv AS BIGINT) AS natural_share_q,
       |  CAST(CASE WHEN tk > 0 THEN (n_kept * 1048576) // tk ELSE 0 END AS BIGINT)
       |    AS kept_share_q
       |FROM k, t2""".stripMargin

  def sql(nlist: Int = 16, nprobe: Int = 4, k: Int = 5, qBound: Long = 8,
      iters: Int = 0, dim: Int = 64): String = {
    val refine = refineChain(iters, dim)
    val cent = s"cent$iters"
    s"""WITH corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |cent0 AS (
       |  SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings WHERE vec_id < $nlist),
       |$refine
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, $cent) t WHERE rk = 1),
       |q AS (SELECT vec_id q_id, embedding::DOUBLE[] qv FROM embeddings WHERE vec_id < $qBound),
       |probe AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY list_cosine_similarity(qv, cv) DESC, c_id ASC) rk
       |    FROM q, $cent) t WHERE rk <= $nprobe)
       |SELECT q_id, n_id, cos, rank FROM (
       |  SELECT q.q_id, corp.n_id, list_cosine_similarity(q.qv, corp.v) AS cos,
       |    CAST(row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY list_cosine_similarity(q.qv, corp.v) DESC, corp.n_id ASC) AS BIGINT) AS rank
       |  FROM q
       |  JOIN probe ON probe.q_id = q.q_id
       |  JOIN assign ON assign.c_id = probe.c_id
       |  JOIN corp ON corp.n_id = assign.n_id
       |  WHERE q.q_id <> corp.n_id) t
       |WHERE rank <= $k""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.semanticDedup]] (SemDeDup):
    * the same seed/refine/assign chain as [[sql]], then within-cell
    * pairs at `threshold` drop the higher id (keep-min-id), closing as
    * the per-vector (vec_id, cell, kept) disposition sheet. */
  def semanticDedupSql(nlist: Int = 16, iters: Int = 2, dim: Int = 64,
      threshold: Double = 0.35): String = {
    val refine = refineChain(iters, dim)
    val cent = s"cent$iters"
    s"""WITH corp AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |cent0 AS (
       |  SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings WHERE vec_id < $nlist),
       |$refine
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, $cent) t WHERE rk = 1),
       |drops AS (
       |  SELECT DISTINCT b.n_id AS d_id
       |  FROM assign a JOIN assign b ON a.c_id = b.c_id AND a.n_id < b.n_id
       |  JOIN corp va ON va.n_id = a.n_id
       |  JOIN corp vb ON vb.n_id = b.n_id
       |  WHERE list_cosine_similarity(va.v, vb.v) >= $threshold)
       |SELECT assign.n_id AS vec_id, CAST(assign.c_id AS BIGINT) AS cell,
       |  CAST(CASE WHEN d.d_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM assign LEFT JOIN drops d ON assign.n_id = d.d_id""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.incrementalSemanticDedup]]
    * over the q68-style md5-bucket membership (is_new ⇔ bucket <
    * `newPermille`): centroids train on the CORPUS side only (the q82
    * standing-index convention), the standing keep sheet is the q113
    * within-cell computation among old vectors, and a new vector drops
    * on a ≥ threshold same-cell neighbor that is kept-old (any id) or
    * lower-id new. Emits the NEW side's disposition only. */
  def incrementalSemanticDedupSql(nlist: Int = 16, iters: Int = 2, dim: Int = 64,
      threshold: Double = 0.35, newPermille: Int = 100, salt: String = "graft"): String = {
    val refine = refineChain(iters, dim)
    val cent = s"cent$iters"
    val bucket = DecontaminateOracle.bucketExpr(salt, "vec_id")
    s"""WITH mem AS (SELECT vec_id, (($bucket) % 1000 < $newPermille) is_new
       |            FROM embeddings WHERE vec_id IS NOT NULL),
       |alle AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |corp AS (SELECT a.n_id, a.v FROM alle a JOIN mem ON mem.vec_id = a.n_id
       |         WHERE NOT mem.is_new),
       |cent0 AS (SELECT n_id c_id, v cv FROM corp WHERE n_id < $nlist),
       |$refine
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM alle, $cent) t WHERE rk = 1),
       |oldasg AS (SELECT a.n_id, a.c_id FROM assign a JOIN mem ON mem.vec_id = a.n_id
       |           WHERE NOT mem.is_new),
       |newasg AS (SELECT a.n_id, a.c_id FROM assign a JOIN mem ON mem.vec_id = a.n_id
       |           WHERE mem.is_new),
       |olddrop AS (SELECT DISTINCT b.n_id d
       |            FROM oldasg a JOIN oldasg b ON a.c_id = b.c_id AND a.n_id < b.n_id
       |            JOIN alle va ON va.n_id = a.n_id JOIN alle vb ON vb.n_id = b.n_id
       |            WHERE list_cosine_similarity(va.v, vb.v) >= $threshold),
       |oldkept AS (SELECT o.n_id, o.c_id FROM oldasg o
       |            LEFT JOIN olddrop d ON o.n_id = d.d WHERE d.d IS NULL),
       |aside AS (SELECT n_id, c_id, FALSE AS a_new FROM oldkept
       |          UNION ALL SELECT n_id, c_id, TRUE FROM newasg),
       |drops AS (SELECT DISTINCT b.n_id d
       |          FROM aside a JOIN newasg b ON a.c_id = b.c_id
       |            AND (NOT a.a_new OR a.n_id < b.n_id)
       |          JOIN alle va ON va.n_id = a.n_id JOIN alle vb ON vb.n_id = b.n_id
       |          WHERE list_cosine_similarity(va.v, vb.v) >= $threshold)
       |SELECT n.n_id AS vec_id, CAST(n.c_id AS BIGINT) AS cell,
       |  CAST(CASE WHEN d.d IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM newasg n LEFT JOIN drops d ON n.n_id = d.d""".stripMargin
  }

  /** Mirror of
    * [[graft.operators.Decontaminate.semanticContaminationReport]]
    * (q138): the q114 split/train-side-centroid chain, then the q49
    * probe chain driven by the EVAL side, then per-pair quantized
    * cosines at `threshold` aggregated onto the flagged train vector
    * (count, max, window-ranked top evidence — ties → min eval id). */
  def semanticContaminationSql(nlist: Int = 16, iters: Int = 2, dim: Int = 64,
      threshold: Double = 0.35, nprobe: Int = 4, evalPermille: Int = 100,
      salt: String = "graft"): String = {
    val refine = refineChain(iters, dim)
    val cent = s"cent$iters"
    val bucket = DecontaminateOracle.bucketExpr(salt, "vec_id")
    s"""WITH mem AS (SELECT vec_id, (($bucket) % 1000 < $evalPermille) is_eval
       |            FROM embeddings WHERE vec_id IS NOT NULL),
       |alle AS (SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings),
       |corp AS (SELECT a.n_id, a.v FROM alle a JOIN mem ON mem.vec_id = a.n_id
       |         WHERE NOT mem.is_eval),
       |cent0 AS (SELECT n_id c_id, v cv FROM corp WHERE n_id < $nlist),
       |$refine
       |assign AS (
       |  SELECT n_id, c_id FROM (
       |    SELECT n_id, c_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY list_cosine_similarity(v, cv) DESC, c_id ASC) rk
       |    FROM corp, $cent) t WHERE rk = 1),
       |q AS (SELECT a.n_id q_id, a.v qv FROM alle a JOIN mem ON mem.vec_id = a.n_id
       |      WHERE mem.is_eval),
       |probe AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY list_cosine_similarity(qv, cv) DESC, c_id ASC) rk
       |    FROM q, $cent) t WHERE rk <= $nprobe),
       |pairs AS (
       |  SELECT a.n_id, q.q_id,
       |    CAST(floor(list_cosine_similarity(q.qv, c2.v) * 1048576.0) AS BIGINT) cos_q
       |  FROM q
       |  JOIN probe ON probe.q_id = q.q_id
       |  JOIN assign a ON a.c_id = probe.c_id
       |  JOIN alle c2 ON c2.n_id = a.n_id
       |  WHERE list_cosine_similarity(q.qv, c2.v) >= $threshold),
       |top AS (
       |  SELECT n_id, q_id FROM (
       |    SELECT n_id, q_id, row_number() OVER (PARTITION BY n_id
       |      ORDER BY cos_q DESC, q_id ASC) rk FROM pairs) t WHERE rk = 1)
       |SELECT p.n_id AS vec_id, CAST(count(*) AS BIGINT) AS n_evals,
       |  max(p.cos_q) AS max_cos_q, CAST(min(t.q_id) AS BIGINT) AS top_eval_id
       |FROM pairs p JOIN top t ON t.n_id = p.n_id
       |GROUP BY p.n_id""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.ivfDrift]] over the q82
    * fixture: standing corpus = `vec_id % 8 <> 0`, incoming batch =
    * `vec_id % 8 = 0`, seeds = the standing corpus's `vec_id < nlist`
    * rows, `iters` Lloyd rounds. Displacement is floor((1−cos)·2²⁰) in
    * BIGINT, means are floor divisions — integer-exact end to end, so
    * the drift report (counts, quantized means, refresh decision)
    * compares bitwise. */
  def driftSql(nlist: Int = 16, iters: Int = 1, dim: Int = 64): String = {
    val refine = refineChain(iters, dim)
    val cent = s"cent$iters"
    def assignAgg(src: String, nCol: String, sumCol: String) =
      s"""(SELECT c_id, count(*) AS $nCol,
         |   sum(CAST(floor(greatest(1.0 - cos, 0.0) * 1048576.0) AS BIGINT)) AS $sumCol
         | FROM (SELECT n_id, c_id, cos FROM (
         |    SELECT s.n_id, c.c_id, list_cosine_similarity(s.v, c.cv) AS cos,
         |      row_number() OVER (PARTITION BY s.n_id
         |        ORDER BY list_cosine_similarity(s.v, c.cv) DESC, c.c_id ASC) rk
         |    FROM $src s, $cent c) t WHERE rk = 1) a
         | GROUP BY c_id)""".stripMargin
    s"""WITH corp AS (
       |  SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id % 8 <> 0),
       |cent0 AS (
       |  SELECT vec_id c_id, embedding::DOUBLE[] cv FROM embeddings
       |  WHERE vec_id < $nlist AND vec_id % 8 <> 0),
       |$refine
       |newb AS (
       |  SELECT vec_id n_id, embedding::DOUBLE[] v FROM embeddings WHERE vec_id % 8 = 0),
       |so AS ${assignAgg("corp", "n_old", "sum_old_q")},
       |sn AS ${assignAgg("newb", "n_new", "sum_new_q")},
       |cells AS (SELECT DISTINCT c_id FROM $cent),
       |j AS (SELECT c.c_id,
       |    coalesce(o.n_old, 0) AS n_old, coalesce(n.n_new, 0) AS n_new,
       |    coalesce(o.sum_old_q, 0) AS sum_old_q, coalesce(n.sum_new_q, 0) AS sum_new_q
       |  FROM cells c LEFT JOIN so o USING (c_id) LEFT JOIN sn n USING (c_id)),
       |means AS (SELECT c_id, n_old, n_new,
       |    CAST(CASE WHEN n_old > 0
       |      THEN floor(CAST(sum_old_q AS DOUBLE) / CAST(n_old AS DOUBLE)) ELSE 0 END AS BIGINT) AS mean_old_q,
       |    CAST(CASE WHEN n_new > 0
       |      THEN floor(CAST(sum_new_q AS DOUBLE) / CAST(n_new AS DOUBLE)) ELSE 0 END AS BIGINT) AS mean_new_q
       |  FROM j)
       |SELECT c_id, n_old, n_new, mean_old_q, mean_new_q,
       |  CAST(CASE WHEN 4 * n_new > n_old OR 10 * mean_new_q > 12 * mean_old_q
       |       THEN 1 ELSE 0 END AS BIGINT) AS refresh
       |FROM means""".stripMargin
  }

  /** q127 mirror of
    * [[graft.operators.Similarity.principalComponent]]: the
    * covariance-free power iteration unrolled — per round, the
    * per-vector projection `c` (quantized-term BIGINT sum), the
    * un-normalized next direction `w` (same quantization), the
    * exact-integer norm, and the normalized `v`; closing with the
    * Rayleigh eigenvalue from the final round's projections and the
    * pos-0 sign canonicalization. Every corpus-order-dependent sum
    * accumulates `floor(·2^20)` BIGINTs, so all `iters` rounds match
    * the Spark side bitwise. */
  def pcaSql(iters: Int = 3, dim: Int = 64): String = {
    val Q = 1048576L
    s"""WITH ${pcaChain(iters, dim)},
       |eig AS (SELECT
       |    CAST(sum(CAST(floor((CAST(cq AS DOUBLE) / $Q)
       |      * (CAST(cq AS DOUBLE) / $Q) * $Q) AS BIGINT)) AS DOUBLE)
       |      / ($Q * count(*)) AS eigval
       |  FROM c$iters)
       |SELECT m.pos, m.mu, vv.pc, eig.eigval
       |FROM mu m JOIN vv USING (pos), eig""".stripMargin
  }

  /** q128 mirror of [[graft.operators.Similarity.whitenAudit]]: the
    * [[pcaChain]] plus per-vector quantized-term projections onto the
    * canonicalized component and centered norms — the same floor(·2^20)
    * BIGINT accumulation, so every vector's (proj, cnorm2, resid2)
    * matches bitwise. */
  def whitenSql(iters: Int = 3, dim: Int = 64): String = {
    val Q = 1048576L
    s"""WITH ${pcaChain(iters, dim)},
       |per AS (SELECT c.vec_id,
       |    CAST(sum(CAST(floor(c.xc * vv.pc * $Q) AS BIGINT)) AS DOUBLE) / $Q AS proj,
       |    CAST(sum(CAST(floor(c.xc * c.xc * $Q) AS BIGINT)) AS DOUBLE) / $Q AS cnorm2
       |  FROM cent c JOIN vv USING (pos) GROUP BY c.vec_id)
       |SELECT vec_id, proj, cnorm2, cnorm2 - proj * proj AS resid2
       |FROM per""".stripMargin
  }

  /** The shared power-iteration CTE chain: rows0 → mu → cent → v0 →
    * `iters` (c/w/nrm/v) rounds → sign canonicalization, ending with
    * `vv(pos, pc)` — the canonicalized component both pca closings
    * read. */
  private def pcaChain(iters: Int, dim: Int): String = {
    val Q = 1048576L
    val rounds = (1 to iters).map { t =>
      s"""c$t AS MATERIALIZED (SELECT vec_id,
         |    CAST(sum(CAST(floor(xc * v * $Q) AS BIGINT)) AS BIGINT) AS cq
         |  FROM cent JOIN v${t - 1} USING (pos) GROUP BY vec_id),
         |w$t AS (SELECT pos,
         |    CAST(sum(CAST(floor(xc * (CAST(cq AS DOUBLE) / $Q) * $Q) AS BIGINT))
         |      AS DOUBLE) / $Q AS w
         |  FROM cent JOIN c$t USING (vec_id) GROUP BY pos),
         |nrm$t AS (SELECT sqrt(CAST(sum(CAST(floor(w * w * $Q) AS BIGINT))
         |      AS DOUBLE) / $Q) AS nrm FROM w$t),
         |v$t AS (SELECT pos, w / nrm AS v FROM w$t, nrm$t)""".stripMargin
    }.mkString(",\n")
    s"""rows0 AS MATERIALIZED (
       |  SELECT vec_id, CAST(i - 1 AS INTEGER) AS pos,
       |         CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) AS x
       |  FROM (SELECT vec_id, embedding, unnest(range(1, $dim + 1)) AS i
       |        FROM embeddings
       |        WHERE embedding IS NOT NULL AND len(embedding) = $dim)),
       |mu AS MATERIALIZED (SELECT pos,
       |    CAST(sum(CAST(floor(x * $Q) AS BIGINT)) AS DOUBLE)
       |      / ($Q * count(*)) AS mu
       |  FROM rows0 GROUP BY pos),
       |cent AS MATERIALIZED (SELECT r.vec_id, r.pos, r.x - m.mu AS xc
       |  FROM rows0 r JOIN mu m USING (pos)),
       |v0 AS (SELECT pos, 1.0 / sqrt($dim) AS v FROM mu),
       |$rounds,
       |sg AS (SELECT CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END AS sg
       |       FROM v$iters WHERE pos = 0),
       |vv AS MATERIALIZED (SELECT pos, v * sg AS pc FROM v$iters, sg)""".stripMargin
  }
}
