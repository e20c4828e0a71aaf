package graft.queries

/** Generated DuckDB mirror of [[graft.operators.Drift.lengthPsi]] —
  * the PSI ingest-drift monitor replayed relationally: the q68 md5
  * split, `percentile_disc` standing decile edges (the q60-pinned
  * selection semantics ≡ [[graft.operators.Quantiles
  * .multiQuantileDisc]]), the 9-comparison bin expression, the exact
  * two-step fixed-point rates, and the [[DsirOracle.logChain]] log2q
  * replay per bin. All-BIGINT end to end. */
object PsiOracle {

  /** q144 mirror. */
  def sql(newPermille: Int = 100, bins: Int = 10,
      salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt)
    val edgeDefs = (1 until bins).map { i =>
      val q = (BigDecimal(i) / BigDecimal(bins)).toString
      s"percentile_disc($q) WITHIN GROUP (ORDER BY x) AS e$i"
    }.mkString(",\n       |    ")
    val binExpr = (1 until bins).map { i =>
      s"CASE WHEN x > e$i THEN 1 ELSE 0 END"
    }.mkString(" + ")
    def rate(cnt: String, n: String) =
      s"""CASE WHEN $n = 0 THEN 0
         |    ELSE (($cnt * 1024) // $n) * 1024 + ((($cnt * 1024) % $n) * 1024) // $n
         |    END""".stripMargin
    s"""WITH base AS MATERIALIZED (
       |  SELECT (($bucket) % 1000 < $newPermille) AS is_new,
       |    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT) AS x
       |  FROM documents WHERE doc_id IS NOT NULL),
       |ed AS (SELECT $edgeDefs
       |  FROM base WHERE NOT is_new),
       |bn AS (SELECT is_new, CAST($binExpr AS BIGINT) AS bin FROM base, ed),
       |cnt AS (SELECT bin,
       |    CAST(sum(CASE WHEN NOT is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_std,
       |    CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new
       |  FROM bn GROUP BY bin),
       |ab AS (SELECT CAST(t.i AS BIGINT) AS bin FROM range(0, $bins) t(i)),
       |cc AS (SELECT ab.bin, CAST(coalesce(cnt.n_std, 0) AS BIGINT) AS n_std,
       |    CAST(coalesce(cnt.n_new, 0) AS BIGINT) AS n_new
       |  FROM ab LEFT JOIN cnt USING (bin)),
       |tt AS (SELECT CAST(sum(n_std) AS BIGINT) AS t_std,
       |    CAST(sum(n_new) AS BIGINT) AS t_new FROM cc),
       |pb AS (SELECT bin, n_std, n_new,
       |    CAST(${rate("n_std", "t_std")} AS BIGINT) AS rs_q,
       |    CAST(${rate("n_new", "t_new")} AS BIGINT) AS rn_q
       |  FROM cc, tt),
       |${DsirOracle.logChain("pb", Seq("s" -> "rs_q + 1", "n" -> "rn_q + 1"),
           keyCols = Seq("bin", "n_std", "n_new", "rs_q", "rn_q"))},
       |psi AS (SELECT bin, n_std, n_new, rs_q, rn_q,
       |    CAST((rs_q - rn_q) * ((e_s * 64 + f_s) - (e_n * 64 + f_n)) AS BIGINT) AS psi_q
       |  FROM l6),
       |tot2 AS (SELECT CAST(sum(psi_q) AS BIGINT) AS psi_total_q FROM psi)
       |SELECT psi.bin, psi.n_std, psi.n_new, psi.rs_q, psi.rn_q, psi.psi_q,
       |  t.psi_total_q,
       |  CAST(CASE WHEN t.psi_total_q * 10 > 201326592 THEN 1 ELSE 0 END AS BIGINT) AS alert
       |FROM psi, tot2 t""".stripMargin
  }

  /** q156 mirror: the per-source length-PSI sheet
    * ([[graft.operators.Drift.lengthPsiBySource]]) — corpus-wide
    * standing deciles and occupancy, per-(source, bin) counts over a
    * sources × bins grid, the q144 rate/log arithmetic per cell, one
    * PSI sum per source. */
  def bySourceSql(bins: Int = 10): String = {
    val edgeDefs = (1 until bins).map { i =>
      val q = (BigDecimal(i) / BigDecimal(bins)).toString
      s"percentile_disc($q) WITHIN GROUP (ORDER BY x) AS e$i"
    }.mkString(",\n       |    ")
    val binExpr = (1 until bins).map { i =>
      s"CASE WHEN x > e$i THEN 1 ELSE 0 END"
    }.mkString(" + ")
    def rate(cnt: String, n: String) =
      s"""CASE WHEN $n = 0 THEN 0
         |    ELSE (($cnt * 1024) // $n) * 1024 + ((($cnt * 1024) % $n) * 1024) // $n
         |    END""".stripMargin
    s"""WITH base AS MATERIALIZED (
       |  SELECT coalesce(source, 'unknown') AS source,
       |    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT) AS x
       |  FROM documents WHERE doc_id IS NOT NULL),
       |ed AS (SELECT $edgeDefs
       |  FROM base),
       |std AS (SELECT CAST($binExpr AS BIGINT) AS bin,
       |    CAST(count(*) AS BIGINT) AS n_std
       |  FROM base, ed GROUP BY 1),
       |cnt AS (SELECT source, CAST($binExpr AS BIGINT) AS bin,
       |    CAST(count(*) AS BIGINT) AS n_new
       |  FROM base, ed GROUP BY 1, 2),
       |tstd AS (SELECT CAST(coalesce(sum(n_std), 0) AS BIGINT) AS t_std FROM std),
       |srcs AS (SELECT DISTINCT source FROM base),
       |grid AS (SELECT s.source, CAST(r.i AS BIGINT) AS bin,
       |    CAST(coalesce(std.n_std, 0) AS BIGINT) AS n_std,
       |    CAST(coalesce(cnt.n_new, 0) AS BIGINT) AS n_new,
       |    tstd.t_std
       |  FROM srcs s CROSS JOIN range(0, $bins) r(i)
       |  LEFT JOIN std ON std.bin = r.i
       |  LEFT JOIN cnt ON cnt.source = s.source AND cnt.bin = r.i, tstd),
       |tn AS (SELECT source, CAST(sum(n_new) AS BIGINT) AS t_new
       |  FROM grid GROUP BY source),
       |pb AS (SELECT grid.source, bin, n_std, n_new,
       |    CAST(${rate("n_std", "t_std")} AS BIGINT) AS rs_q,
       |    CAST(${rate("n_new", "t_new")} AS BIGINT) AS rn_q,
       |    t_new
       |  FROM grid JOIN tn ON tn.source = grid.source),
       |${DsirOracle.logChain("pb", Seq("s" -> "rs_q + 1", "n" -> "rn_q + 1"),
           keyCols = Seq("source", "rs_q", "rn_q", "t_new"))},
       |psi AS (SELECT source, t_new,
       |    (rs_q - rn_q) * ((e_s * 64 + f_s) - (e_n * 64 + f_n)) AS psi_bin_q
       |  FROM l6),
       |agg AS (SELECT source, CAST(max(t_new) AS BIGINT) AS n_docs,
       |    CAST(sum(psi_bin_q) AS BIGINT) AS psi_q
       |  FROM psi GROUP BY source)
       |SELECT source, n_docs, psi_q,
       |  CAST(CASE WHEN psi_q * 10 > 201326592 THEN 1 ELSE 0 END AS BIGINT) AS alert
       |FROM agg""".stripMargin
  }
}
