package graft.queries

import graft.functions.TextFunctions

/** Generated DuckDB mirror of the q71 corpus-build capstone — the
  * shipped curation operators chained end-to-end exactly as the Spark
  * side composes them, each stage reusing the SAME oracle CTEs its
  * standalone query runs:
  *
  *   per-source cap (q67) → train side of THE md5-bucket split (q55
  *   complement) → near-dup keep-set over the full-corpus pair graph
  *   (q58/q59, [[ClusterOracle.pairCtes]]) → decontamination drop
  *   (q66, [[DecontaminateOracle.sql]]) → PII redaction (q69
  *   decorate-then-redact, [[TextFunctions]] patterns).
  */
object CorpusOracle {

  def sql: String = s"""WITH RECURSIVE
${ctes("documents")}
$closing"""

  /** The chain's CTE list (no leading WITH) over an arbitrary docs
    * relation — `documents` for q71, the policy-acted CTE for the
    * q167 capstone ([[graft.operators.Ensemble.applyFeedPolicy]]
    * composed in FRONT of the release build). */
  private[queries] def ctes(docsRel: String): String = {
    val bucket = DecontaminateOracle.bucketExpr()
    s"""capped AS (
  SELECT doc_id, source, lang, text FROM (
    SELECT doc_id, source, lang, text,
      row_number() OVER (PARTITION BY source
        ORDER BY md5(concat('graft', CAST(doc_id AS VARCHAR))), doc_id) AS rk
    FROM $docsRel WHERE doc_id IS NOT NULL) t
  WHERE rk <= 10),
train AS (
  SELECT doc_id, source, lang, text FROM capped
  WHERE ($bucket) % 1000 >= 100),
${ClusterOracle.pairCtes(docsRel)},
contaminated AS (SELECT train_id FROM (
${DecontaminateOracle.sql(docsRel = docsRel)}
) t_dc)"""
  }

  /** The closing redact-and-filter select over the chain's CTEs. */
  private[queries] val closing: String =
    s"""SELECT d.doc_id, d.source, d.lang,
  regexp_replace(regexp_replace(
    concat('email user', CAST(d.doc_id AS VARCHAR), '@mail.example.org from 10.',
           CAST(d.doc_id % 200 AS VARCHAR), '.', CAST((d.doc_id * 7) % 250 AS VARCHAR),
           '.1 ', coalesce(d.text, '')),
    '${TextFunctions.EmailPattern}', '<EMAIL>', 'g'),
    '${TextFunctions.Ipv4Pattern}', '<IP>', 'g') AS text_redacted
FROM train d
WHERE NOT EXISTS (SELECT 1 FROM cl
                  WHERE cl.doc_id = d.doc_id AND cl.cluster_id <> d.doc_id)
  AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.train_id = d.doc_id)"""
}
