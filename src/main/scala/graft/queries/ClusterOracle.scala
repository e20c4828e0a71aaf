package graft.queries

/** Generated DuckDB mirror of the near-dup CLUSTER layer
  * ([[graft.operators.ConnectedComponents]]): transitive closure over
  * the union of the two document-space near-dup pair sets (MinHash+LSH
  * q28 ∪ banded SimHash q47), labeling every document with the minimum
  * doc id of its component.
  *
  * The oracle computes the closure with a recursive CTE — feasible
  * because LSH banding keeps the pair graph tiny at oracle scale —
  * while the Spark side iterates large-star/small-star; both reduce to
  * "min reachable node id", so results must agree EXACTLY regardless of
  * algorithm. (q50's embedding pairs live in the `embeddings.vec_id`
  * keyspace with no driver-provided mapping to doc ids, so unioning
  * them in would conflate two id spaces; the components operator itself
  * is keyspace-agnostic.) */
object ClusterOracle {

  /** Shared CTE chain: near-dup pairs → symmetric edges → per-node min
    * reachable id (`cl(doc_id, cluster_id)`). Emitted WITHOUT a leading
    * WITH so callers prepend `WITH RECURSIVE` (q58/q59 here, the q71
    * corpus capstone in [[CorpusOracle]]). */
  private[queries] def pairCtes(docsRel: String = "documents"): String = {
    val mh = MinhashOracle.sql(numHashes = 16, rowsPerBand = 4, threshold = 0.8,
      docsRel = docsRel)
    val smh = SimhashOracle.pairsSql(maxHamming = 5, docsRel = docsRel)
    s"""mh AS (SELECT a_id, b_id FROM (
$mh
) t_mh),
smh AS (SELECT a_id, b_id FROM (
$smh
) t_sh),
pr AS (SELECT a_id, b_id FROM mh UNION SELECT a_id, b_id FROM smh),
edges AS (SELECT a_id AS u, b_id AS v FROM pr UNION SELECT b_id, a_id FROM pr),
nodes AS (SELECT DISTINCT u FROM edges),
reach(node, r) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT rc.node, e.v FROM reach rc JOIN edges e ON e.u = rc.r
),
cl AS (SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
       FROM reach GROUP BY node)"""
  }

  /** q58: every document labeled with its near-dup cluster id
    * (singletons label themselves). */
  def clustersSql: String =
    s"""WITH RECURSIVE ${pairCtes()}
SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id"""

  /** q104: the leakage-safe split — THE md5-bucket membership
    * ([[DecontaminateOracle.bucketExpr]]) keyed on the cluster id, so
    * a near-dup family lands whole on one side. */
  def splitSql(evalPermille: Int = 100, salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt, "cluster_id")
    s"""WITH RECURSIVE ${pairCtes()},
lab AS (SELECT d.doc_id, CAST(coalesce(cl.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id
        WHERE d.doc_id IS NOT NULL)
SELECT doc_id, cluster_id,
  CASE WHEN ($bucket) % 1000 < $evalPermille THEN 'eval' ELSE 'train' END AS split
FROM lab"""
  }

  /** q105: the incremental-maintenance equivalence oracle — the
    * MONOLITHIC minhash-pair closure over the full corpus. The Spark
    * side folds the new batch's pairs into the standing corpus
    * components ([[graft.operators.ConnectedComponents.componentsFromIncrement]]);
    * because labels are the old graph's closure skeleton and LSH
    * candidacy is per-pair (a pair's bands depend only on its two
    * docs, so splitting the corpus changes nothing about which pairs
    * verify), the incremental result must be bitwise-equal to this
    * full recompute. Minhash-only: the incremental candidate kernel
    * ([[graft.operators.Dedup.crossNearDupPairs]]) is the minhash
    * pipeline, so the simhash union of q58 stays out on both sides. */
  def incrementalClustersSql: String = {
    val mh = MinhashOracle.sql(numHashes = 16, rowsPerBand = 4, threshold = 0.8)
    s"""WITH RECURSIVE mh AS (SELECT a_id, b_id FROM (
$mh
) t_mh),
edges AS (SELECT a_id AS u, b_id AS v FROM mh UNION SELECT b_id, a_id FROM mh),
nodes AS (SELECT DISTINCT u FROM edges),
reach(node, r) AS (
  SELECT u, u FROM nodes
  UNION
  SELECT rc.node, e.v FROM reach rc JOIN edges e ON e.u = rc.r
),
cl AS (SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
       FROM reach GROUP BY node)
SELECT d.doc_id, coalesce(cl.cluster_id, d.doc_id) AS cluster_id
FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id"""
  }

  /** q59: the dedup keep-set — documents minus non-canonical cluster
    * members. */
  def keepSql: String =
    s"""WITH RECURSIVE ${pairCtes()}
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM cl
                  WHERE cl.doc_id = d.doc_id AND cl.cluster_id <> d.doc_id)"""

  /** q154: the per-source near-dup census — the shared closure chain
    * joined back to the documents' source column, rolled up per source
    * with exact two-step fixed-point rates (the
    * [[graft.operators.Dedup.dupRatesBySource]] shape). Membership in
    * `cl` IS pair-graph membership; `cluster_id <> doc_id` IS the q59
    * drop-set predicate — both read the same CTE the q58/q59 oracles
    * read, so the census cannot drift from them. */
  def dupRatesBySourceSql: String = {
    def rate(cnt: String) =
      s"""CASE WHEN n = 0 THEN 0
         |    ELSE (($cnt * 1024) // n) * 1024 + ((($cnt * 1024) % n) * 1024) // n
         |    END""".stripMargin
    s"""WITH RECURSIVE ${pairCtes()},
srcs AS (SELECT doc_id, coalesce(source, 'unknown') AS source
  FROM documents WHERE doc_id IS NOT NULL),
g AS (SELECT s.source,
    CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CASE WHEN cl.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
    CAST(sum(CASE WHEN cl.cluster_id IS NOT NULL AND cl.cluster_id <> s.doc_id
             THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
  FROM srcs s LEFT JOIN cl ON cl.doc_id = s.doc_id GROUP BY s.source)
SELECT source, n, n_dup, n_dropped,
  CAST(${rate("n_dup")} AS BIGINT) AS dup_rate_q,
  CAST(${rate("n_dropped")} AS BIGINT) AS drop_rate_q
FROM g"""
  }

  /** q160: the duplication profile — cluster-size histogram over the
    * shared closure chain plus the singleton row (docs off the pair
    * graph), the [[graft.operators.Dedup.clusterSizeProfile]]
    * shape. */
  def clusterSizeProfileSql: String =
    s"""WITH RECURSIVE ${pairCtes()},
szs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS sz FROM cl GROUP BY cluster_id),
hist AS (SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         FROM szs GROUP BY sz),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE doc_id IS NOT NULL),
gn AS (SELECT CAST(count(*) AS BIGINT) AS g FROM cl),
uni AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
          CAST(tot.n - gn.g AS BIGINT) AS n_clusters
        FROM tot, gn WHERE tot.n - gn.g > 0),
allr AS (SELECT * FROM hist UNION ALL SELECT * FROM uni)
SELECT cluster_size, n_clusters,
  CAST(cluster_size * n_clusters AS BIGINT) AS n_docs
FROM allr"""

  /** q140 mirror of [[graft.operators.ConnectedComponents
    * .keepBestFromComponents]] over token-count scores: the shared
    * closure chain, every pair-graph member scored
    * `len(string_split_regex(coalesce(text,''), '\s+'))` (the
    * graft_tokcount twin), the per-cluster winner by
    * (n_tokens DESC, doc_id ASC). */
  def qualityKeepSql: String =
    s"""WITH RECURSIVE ${pairCtes()},
sc AS (SELECT cl.doc_id, cl.cluster_id,
  CAST(len(string_split_regex(coalesce(d.text, ''), '\\s+')) AS BIGINT) AS n_tokens
  FROM cl LEFT JOIN documents d ON d.doc_id = cl.doc_id),
win AS (SELECT cluster_id, doc_id AS keep_id FROM (
  SELECT cluster_id, doc_id, row_number() OVER (PARTITION BY cluster_id
    ORDER BY n_tokens DESC, doc_id ASC) rk FROM sc) t WHERE rk = 1)
SELECT sc.doc_id, sc.cluster_id, sc.n_tokens,
  CAST(CASE WHEN sc.doc_id = w.keep_id THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM sc JOIN win w ON w.cluster_id = sc.cluster_id"""

  /** q108: the release-bundle capstone — the full closure chained with
    * the q104 cluster-keyed split bucket, the q101 Hamilton allocation
    * (population = the kept train side), and the q99 prefix-sum shard
    * assignment over the sampled docs. Every stage reuses the exact CTE
    * formulation of its standalone oracle, so the composition is
    * bitwise by construction. */
  def releaseBundleSql(evalPermille: Int = 100, budget: Long = 250L,
      capacity: Long = 2048L, packsPerShard: Long = 16L,
      salt: String = "graft"): String = {
    val bucket = DecontaminateOracle.bucketExpr(salt, "cluster_id")
    s"""WITH RECURSIVE ${pairCtes()},
rel AS (SELECT doc_id, source,
    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents WHERE doc_id IS NOT NULL),
lab AS (SELECT r.doc_id, r.source, r.n_tokens,
    CAST(coalesce(cl.cluster_id, r.doc_id) AS BIGINT) AS cluster_id
  FROM rel r LEFT JOIN cl ON cl.doc_id = r.doc_id),
st AS (SELECT *, (cluster_id = doc_id) AS is_kept,
    CASE WHEN ($bucket) % 1000 < $evalPermille THEN 'eval' ELSE 'train' END AS split
  FROM lab),
tr AS (SELECT doc_id, source, n_tokens FROM st WHERE is_kept AND split = 'train'),
per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_size FROM tr GROUP BY 1),
qt AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM qt),
bs AS (SELECT source, s_q, ($budget * s_q) // s AS base,
    $budget * s_q - (($budget * s_q) // s) * s AS rem FROM qt, tot),
lv AS (SELECT CAST($budget - sum(base) AS BIGINT) AS leftover FROM bs),
al AS (SELECT source, base + CASE WHEN
      CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) <= leftover
    THEN 1 ELSE 0 END AS alloc FROM bs, lv),
rk AS (SELECT doc_id, source, n_tokens,
    CAST(row_number() OVER (PARTITION BY source
      ORDER BY md5('$salt' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS rnk
  FROM tr),
samp AS (SELECT doc_id, n_tokens FROM rk JOIN al USING (source) WHERE rnk <= alloc),
cum AS (SELECT doc_id,
    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
  FROM samp),
shd AS (SELECT doc_id, CAST((cb // $capacity) // $packsPerShard AS BIGINT) AS shard FROM cum)
SELECT st.doc_id, st.source, st.n_tokens, st.cluster_id,
  CASE WHEN NOT is_kept THEN 'dropped_dup'
       WHEN split = 'eval' THEN 'eval'
       WHEN shd.shard IS NOT NULL THEN 'sampled'
       ELSE 'train_unsampled' END AS status,
  shd.shard AS shard
FROM st LEFT JOIN shd USING (doc_id)"""
  }
}
