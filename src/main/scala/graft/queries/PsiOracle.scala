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
}
