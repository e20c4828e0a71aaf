package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity, Skew}
import graft.multimodal.Multimodal

/** The LLM-data-pipeline extension surface (SURVEY §2.3): dedup (exact,
  * MinHash+LSH+Jaccard, embedding-cosine), similarity search, text
  * analysis (tokens, quality, language-ID, fingerprints), multimodal
  * metadata. All over the driver's `documents`/`embeddings` tables, with
  * DuckDB oracles wherever the op is SQL-expressible (the md5-based
  * MinHash family is chosen precisely because it is). */
object ExtensionQueries {
  import QuerySpec.MoneyAddend

  /** q108's shard grouping (packs per shard) — ONE constant feeding both
    * the Spark `pack_first div N` expression and the oracle's
    * `releaseBundleSql(packsPerShard = N)`, so the two sides cannot
    * silently drift apart. */
  private val ReleasePacksPerShard = 16L

  /** q99's packing geometry — the same single-constant rule as
    * [[ReleasePacksPerShard]]: both the Spark `shardManifest` call and
    * the interpolated oracle SQL read these, so the two sides cannot
    * silently drift apart. */
  private val ManifestCapacity = 2048L
  private val ManifestPacksPerShard = 16L

  private val StopList = TextFunctions.Stopwords.map(s => s"'$s'").mkString(", ")

  /** The quality-rule evidence CTE chain (mirror of
    * [[graft.operators.QualityRules.flags]]' stat inputs, ending at
    * CTE `j`) — ONE textual definition shared by the q74 audit and the
    * q141 overlap matrix, so the two oracles cannot drift apart.
    * Emitted WITHOUT a leading WITH. */
  private lazy val qualityRuleCtes: String =
    s"""toks AS (SELECT doc_id, lang, string_split_regex(text, '\\s+') AS t,
       |  string_split_regex(lower(text), '\\s+') AS tl FROM documents),
       |base AS (SELECT doc_id, lang, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(tl, x -> x IN ($StopList))) AS BIGINT) AS stop_cnt FROM toks),
       |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
       |tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
       |tok_stats AS (SELECT doc_id, max(c) AS top_token_n FROM tc GROUP BY 1),
       |grams AS (SELECT doc_id,
       |  unnest(list_transform(range(1, greatest(len(t), 1)), i -> t[i] || ' ' || t[i + 1])) AS g FROM toks),
       |gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
       |gram_stats AS (SELECT doc_id, max(c) AS top_bigram_n, CAST(sum(c) AS BIGINT) AS n_bigrams FROM gc GROUP BY 1),
       |pos AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t FROM toks),
       |wp AS (SELECT doc_id, i, t[i] AS w FROM pos),
       |runs AS (SELECT doc_id, w, i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp FROM wp),
       |rl AS (SELECT doc_id, count(*) AS run_len FROM runs GROUP BY doc_id, w, grp),
       |max_run AS (SELECT doc_id, max(run_len) AS max_token_run FROM rl GROUP BY 1),
       |g3 AS (SELECT doc_id,
       |  list_transform(range(1, greatest(len(t) - 1, 1)), i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS g FROM toks),
       |g3s AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_3grams,
       |  CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct_3grams FROM g3),
       |j AS (SELECT b.doc_id, b.lang, b.n_tokens, b.stop_cnt, ts.top_token_n,
       |  coalesce(gs.top_bigram_n, 0) AS top_bigram_n, coalesce(gs.n_bigrams, 0) AS n_bigrams,
       |  m.max_token_run, s.n_3grams, s.n_distinct_3grams
       | FROM base b JOIN tok_stats ts USING (doc_id) LEFT JOIN gram_stats gs USING (doc_id)
       | JOIN max_run m USING (doc_id) JOIN g3s s USING (doc_id))""".stripMargin
  private def markers(l: String) = TextFunctions.LangMarkers(l).map(s => s"'$s'").mkString(", ")

  val specs: Seq[QuerySpec] = Seq(

    QuerySpec(
      "q23_dedup_exact",
      """Exact dedup via content hash: one group per distinct normalized
        |text, min id kept. Same kernel as the CDC upsert precombine; one
        |hash shuffle at any scale.""".stripMargin,
      (s, d) => Dedup.exactGroups(Tables.documents(s, d)),
      Some("""SELECT md5(lower(text)) AS h, min(doc_id) AS keeper_id, count(*) AS n_copies
             |FROM documents GROUP BY md5(lower(text))""".stripMargin)),

    QuerySpec(
      "q24_token_stats",
      """Token counting: whitespace tokenization, all codegen'd (split +
        |size; no UDF).""".stripMargin,
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.bpeishTokenCount(col("text")).as("n_bpeish"),
        length(col("text")).cast("long").as("len_chars")),
      Some(s"""SELECT doc_id,
              | CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
              | CAST(length(regexp_extract_all(text, '${TextFunctions.BpeishPattern.replace("'", "''")}')) AS BIGINT) AS n_bpeish,
              | CAST(length(text) AS BIGINT) AS len_chars
              |FROM documents""".stripMargin)),

    QuerySpec(
      "q25_text_quality",
      """Quality scoring: length saturation + stopword density +
        |punctuation sparsity, fully arithmetic (deterministic per-row
        |doubles both engines).""".stripMargin,
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tokens"),
        TextFunctions.punctCount(col("text")).as("punct_cnt"),
        TextFunctions.stopwordCount(col("text")).as("stop_cnt"),
        TextFunctions.qualityScore(col("text")).as("quality")),
      Some(s"""WITH t AS (SELECT doc_id, text,
              |  CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) n_tokens,
              |  CAST(length(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) punct_cnt,
              |  CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
              |       x -> x IN ($StopList))) AS BIGINT) stop_cnt
              |FROM documents)
              |SELECT doc_id, n_tokens, punct_cnt, stop_cnt,
              |  least(CAST(length(text) AS DOUBLE) / 1000.0, 1.0) * 0.5
              |  + (CAST(stop_cnt AS DOUBLE) / greatest(n_tokens, 1)) * 0.3
              |  + (1.0 - least((CAST(punct_cnt AS DOUBLE) /
              |       greatest(CAST(length(text) AS BIGINT), 1)) * 5.0, 1.0)) * 0.2 AS quality
              |FROM t""".stripMargin)),

    QuerySpec(
      "q26_lang_id",
      """Language-ID heuristic: marker-word votes per language, argmax
        |with fixed priority ties (en>de>fr>es).""".stripMargin,
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextFunctions.langId(col("text")).as("lang_pred")),
      Some(s"""WITH t AS (SELECT doc_id, lang,
              |  len(list_filter(string_split_regex(lower(text),'\\s+'), x -> x IN (${markers("en")}))) s_en,
              |  len(list_filter(string_split_regex(lower(text),'\\s+'), x -> x IN (${markers("de")}))) s_de,
              |  len(list_filter(string_split_regex(lower(text),'\\s+'), x -> x IN (${markers("fr")}))) s_fr,
              |  len(list_filter(string_split_regex(lower(text),'\\s+'), x -> x IN (${markers("es")}))) s_es
              |FROM documents)
              |SELECT doc_id, lang,
              |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_pred
              |FROM t""".stripMargin)),

    QuerySpec(
      "q27_fingerprint",
      """Document fingerprinting: min-md5 over word 3-shingles (1-perm
        |minhash). NULL for <3-token docs in both engines. Computed over
        |the relational shingle rows (same values as the per-row
        |TextFunctions.minShingleFingerprint column, ~10× faster: the
        |HOF transform evaluates interpreted per element); the left join
        |restores the NULL rows shingleRows drops.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val fp = graft.operators.Dedup.shingleRows(docs)
          .groupBy(col("doc_id")).agg(min(md5(col("sh"))).as("fp"))
        docs.select("doc_id").join(fp, Seq("doc_id"), "left_outer")
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') toks FROM documents)
             |SELECT doc_id, list_min(list_transform(range(1, greatest(len(toks) - 1, 1)),
             |  i -> md5(concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) AS fp
             |FROM t""".stripMargin)),

    QuerySpec(
      "q28_dedup_minhash_lsh",
      """Near-dup text dedup: shingle → 16 MinHash sigs (ONE md5 per
        |shingle + the pairwise-independent affine family (a·x+b) mod p —
        |16× fewer digests than per-i hashing) → 4-row LSH bands →
        |bucket-join candidates → exact 3-gram Jaccard ≥ 0.8
        |verification. Bucket-local quadratic only; the hash family is
        |exact BIGINT arithmetic, reproducible in SQL, which is why this
        |whole pipeline oracle-checks (MinhashOracle).""".stripMargin,
      (s, d) => Dedup.nearDupPairs(Tables.documents(s, d)),
      Some(MinhashOracle.sql(numHashes = 16, rowsPerBand = 4, threshold = 0.8))),

    QuerySpec(
      "q29_embedding_neardup",
      """Embedding-cosine near-dup pairs (id-bounded slice; unbounded
        |scale path is the LSH-bucketed ANN). Cosine is left-fold double
        |— bitwise equal to DuckDB's list_cosine_similarity on
        |DOUBLE[].""".stripMargin,
      (s, d) => Dedup.embeddingNearDupPairs(Tables.embeddings(s, d), 0.35, 1000L),
      Some("""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             |  list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
             |FROM embeddings a, embeddings b
             |WHERE a.vec_id < b.vec_id AND a.vec_id < 1000 AND b.vec_id < 1000
             |  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35""".stripMargin)),

    QuerySpec(
      "q30_cosine_topk",
      """Similarity search: brute-force exact cosine top-5 for 8 query
        |vectors over the whole corpus — broadcast queries, stream corpus,
        |one pass + k·|q| window. The exactness baseline the ANN path is
        |measured against.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(e.filter(col("vec_id") < 8), e, 5)
      },
      Some(AnnRecallOracle.bruteForceSql(qBound = 8, k = 5))),

    QuerySpec(
      "q31_multimodal_meta",
      """Multimodal column plumbing: opaque binary payload + typed
        |metadata (mime, byte size, source). The decode stage is the
        |mapPartitions path in graft.multimodal (stubbed codec, real
        |plumbing) — this query oracle-checks the metadata layer.""".stripMargin,
      (s, d) => Multimodal.toMediaTable(Tables.documents(s, d)).select(
        col("media_id"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"), col("meta.source").as("source")),
      Some("""SELECT doc_id AS media_id, 'text/plain' AS mime,
             | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, source
             |FROM documents""".stripMargin)),

    QuerySpec(
      "q45_dedup_simhash",
      """SimHash-64 signatures per document — fully integer/string
        |arithmetic over md5 hex digits, so even this hash-sketch
        |operator oracle-checks exactly. Near-dup pairs are found by
        |hamming distance over these signatures (spec-verified).""".stripMargin,
      (s, d) => graft.operators.Dedup.simhashSignature(Tables.documents(s, d)),
      Some(SimhashOracle.sql)),

    QuerySpec(
      "q32_approx_distinct",
      """Distinct-user counting per event type — the exact columns
        |oracle-check in DuckDB; the HLL++ sketch sheet of this operator
        |([[approxDistinctUsers]]) is error-bounded against these exact
        |counts in ApproxDistinctSpec instead (DuckDB's HLL sketch
        |differs by construction, so the sketch column itself is
        |spec-bounded, not oracle-compared).""".stripMargin,
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
      Some("""SELECT event_type,
             | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             | count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QuerySpec(
      "q46_ann_topk",
      """Approximate similarity search: multi-probe sign-bit LSH top-5
        |for 8 query vectors — the SCALE path for similarity (probe cost
        |≤ (bits+1)/2^bits of the corpus instead of all of it). The
        |seeded hyperplanes are injected as literals into the DuckDB
        |oracle, and all vector math is left-fold double on both
        |engines, so even this approximate operator compares EXACTLY.
        |Recall is spec-bounded in SimilaritySpec: >0.7 vs brute force on
        |the (near-random) driver embeddings, and ≥0.9 on planted
        |high-cosine near-dups — the regime the LSH guarantee
        |covers.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.annTopK(e.filter(col("vec_id") < 8), e, 5, bits = 4,
          seed = 42L, multiProbe = true, dim = 64)
      },
      Some(AnnOracle.sql(bits = 4, k = 5, qBound = 8, seed = 42L, dim = 64))),

    QuerySpec(
      "q50_embedding_neardup_lsh",
      """Embedding near-dup pairs over the FULL corpus via sign-bit LSH
        |bucketing — the unbounded scale path q29's id-bounded O(n²)
        |slice stands in for: one bucket shuffle, quadratic only within a
        |bucket, one-bit-flip probes catch hyperplane-boundary pairs.
        |Same plane literals in the DuckDB oracle, so the bucketed
        |approximation compares exactly.""".stripMargin,
      (s, d) => Dedup.embeddingNearDupPairsLsh(Tables.embeddings(s, d),
        threshold = 0.35, bits = 4, seed = 42L, dim = 64),
      Some(AnnOracle.pairsSql(threshold = 0.35, bits = 4, seed = 42L, dim = 64))),

    QuerySpec(
      "q49_ivf_topk",
      """IVF-flat approximate top-k — the second ANN family beside q46's
        |sign-bit LSH: a deterministic corpus sample (vec_id < 16) seeds
        |16 centroids, TWO Lloyd k-means rounds refine them
        |(quantized-mean accumulation, so even the refinement is bitwise
        |reproducible in the DuckDB oracle — every round unrolled as the
        |same assign → mean CTE chain), then each query scans its 4
        |highest-cosine cells. Probe cost nprobe/nlist of the corpus;
        |assignment is a map-side-combined argmax so the one exchange
        |carries one row per vector. Fully relational in the oracle — no
        |injected literals. Recall lift from refinement is spec-bounded
        |in SimilaritySpec (≥0.9 @ nprobe=4 on clustered data).""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val refined = Similarity.kmeansIterate(e, e.filter(col("vec_id") < 16),
          iters = 2, dim = 64)
        Similarity.ivfTopK(e.filter(col("vec_id") < 8), e, refined, k = 5,
          nprobe = 4, dim = 64)
      },
      Some(IvfOracle.sql(nlist = 16, nprobe = 4, k = 5, qBound = 8, iters = 2, dim = 64))),

    QuerySpec(
      "q47_simhash_neardup",
      """Banded simhash near-dup pairing — the end-to-end SCALE path for
        |simhash dedup: q45's signatures → 4×4-hex band keys →
        |bucket-join candidates (quadratic only within a band bucket) →
        |hamming ≤ 5 verification. Hamming ≤ 3 pairs are guaranteed
        |candidates (pigeonhole over 4 bands); the driver documents'
        |planted near-dups sit at ≤ 5 with the random-collision tail
        |starting at 6.""".stripMargin,
      (s, d) => Dedup.simhashNearDupPairs(Tables.documents(s, d), maxHamming = 5),
      Some(SimhashOracle.pairsSql(maxHamming = 5))),

    QuerySpec(
      "q48_salted_agg",
      """Skew-mitigated aggregation: two-phase salted groupBy over the
        |events hot keys — phase 1 aggregates on (key, salt) spreading
        |each key over 32 reducers, phase 2 merges the partials. The salt
        |hashes the unique event_id (deterministic under task retry —
        |SPARK-23207-safe). Oracle is the plain GROUP BY: the rewrite is
        |value-identical for algebraic aggregates; all output columns are
        |order-insensitive (counts, integer sums, min/max) so the
        |equality is exact, not approximate.""".stripMargin,
      (s, d) => Skew.saltedAgg(Tables.events(s, d), Seq("event_type"),
        saltBuckets = 32, saltFrom = col("event_id"),
        Skew.saltedCount("n_events"),
        Skew.saltedSum(col("user_id"), "sum_uid"),
        Skew.saltedMin(col("value"), "min_value"),
        Skew.saltedMax(col("value"), "max_value")),
      Some("""SELECT event_type, count(*) AS n_events,
             | CAST(sum(user_id) AS BIGINT) AS sum_uid,
             | min(value) AS min_value, max(value) AS max_value
             |FROM events GROUP BY event_type""".stripMargin))
  )

  /** Additional text-corpus statistics specs appended after the core
    * extension block (registration order is irrelevant to the driver). */
  val extraSpecs: Seq[QuerySpec] = Seq(
    QuerySpec(
      "q51_term_stats",
      """Corpus vocabulary statistics — the TF-IDF kernel with
        |integer-only outputs so it oracle-checks exactly (the idf log is
        |left to the consumer: transcendental functions round differently
        |across libm implementations): per term, document frequency and
        |total term frequency. Scale shape: explode → partial-agg on
        |(term, doc) → term; the shuffle carries one row per distinct
        |(term, doc), not per token occurrence.""".stripMargin,
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("term"))
        .groupBy("term")
        .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf_total")),
      Some("""SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, count(*) AS tf_total
             |FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) term
             |      FROM documents) t
             |GROUP BY term""".stripMargin)),

    QuerySpec(
      "q52_asof_join",
      """As-of join (kdb/pandas merge_asof; Spark has no native form):
        |each event picks up the user's most recent order at-or-before
        |the event time. Implemented as the union + last-non-null-window
        |composition ([[graft.operators.AsofJoin]]) — ONE shuffle on the
        |key, linear in |left|+|right|, vs. a range join's per-key cross
        |product that dies on skew at 100 TB. Right side is deduped to
        |one row per (key, time) so "most recent" is unambiguous in both
        |engines; oracle is DuckDB's NATIVE ASOF LEFT JOIN.""".stripMargin,
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
        val ord = Tables.orders(s, d)
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"))
          .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
        graft.operators.AsofJoin.asofJoin(ev, ord, "user_id", "ts", "o_orderdate",
          Seq("o_orderkey", "o_orderdate"))
      },
      Some("""WITH ord AS (SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
             |             FROM orders GROUP BY o_custkey, o_orderdate),
             |ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events)
             |SELECT ev.user_id, ev.event_id, ev.ts, ord.o_orderkey, ord.o_orderdate
             |FROM ev ASOF LEFT JOIN ord
             |ON ev.user_id = ord.user_id AND ev.ts >= ord.o_orderdate""".stripMargin)),

    QuerySpec(
      "q53_range_join",
      """Banded range join: same-user event pairs within a 5-minute
        |window ([[graft.operators.RangeJoin]]). A naive range join is
        |the per-key cross product; the banded form buckets both sides
        |by the gap width and probes only adjacent buckets, so join
        |fan-out is bounded by bucket population — the shape that
        |survives hot keys at 100 TB. Each pair is found exactly once
        |(unique b-bucket × distinct probe buckets); the oracle is the
        |plain quadratic range join, which must agree exactly.""".stripMargin,
      (s, d) => graft.operators.RangeJoin.timeWindowPairs(
        Tables.events(s, d), "user_id", "ts", "event_id", maxGapSeconds = 300L),
      Some("""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events)
             |SELECT a.user_id, a.event_id AS a_id, b.event_id AS b_id,
             |  a.ts AS a_ts, b.ts AS b_ts,
             |  date_diff('microseconds', a.ts, b.ts) AS gap_us
             |FROM ev a JOIN ev b
             |ON a.user_id = b.user_id
             | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
             | AND (b.ts > a.ts OR b.event_id > a.event_id)""".stripMargin)),

    QuerySpec(
      "q54_sessionize",
      """Row-level sessionization: each event carries its session ordinal
        |under the 30-minute gap rule — the row-granularity complement of
        |q35's session_window aggregation (lag marks starts, running sum
        |numbers them; ONE shuffle on the key). Oracle is the identical
        |two-window formulation in DuckDB.""".stripMargin,
      (s, d) => graft.operators.Sessionize.assignSessions(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts")),
        "user_id", "ts", "event_id", gapSeconds = 1800L),
      Some("""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts FROM events),
             |m AS (SELECT event_id, user_id, ts,
             |  CASE WHEN lag(ts) OVER w IS NULL
             |        OR date_diff('microseconds', lag(ts) OVER w, ts) >= 1800000000
             |       THEN 1 ELSE 0 END AS ns
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT event_id, user_id, ts,
             |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |FROM m""".stripMargin)),

    QuerySpec(
      "q55_deterministic_sample",
      """Deterministic hash-based 10% sample of documents — membership is
        |a pure function of the row key (md5 bucket), so the sample is
        |stable across runs, partitionings, and incremental loads, unlike
        |df.sample(). The same md5-digit arithmetic runs in the DuckDB
        |oracle, so the two engines select EXACTLY the same rows.""".stripMargin,
      (s, d) => graft.operators.Sampling.sampleByKey(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source")),
        "doc_id", permille = 100),
      Some {
        val base = (0 until 12).map { j =>
          s"(strpos('0123456789abcdef', substr(md5(concat('graft', CAST(doc_id AS VARCHAR))), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
        }.mkString("\n    + ")
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE doc_id IS NOT NULL AND ($base) % 1000 < 100""".stripMargin
      }),

    QuerySpec(
      "q56_stratified_sample",
      """Stratified deterministic sampling — class balancing for a
        |training corpus: keep 5% of English (dominant), 50% of German,
        |100% of French, drop everything else. Membership stays a pure
        |function of (key, stratum rate), so per-class fractions are
        |exact-in-expectation and reproducible; the oracle applies the
        |same md5-bucket arithmetic with a CASE'd threshold.""".stripMargin,
      (s, d) => graft.operators.Sampling.stratifiedSampleByKey(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source")),
        "doc_id", "lang", Map("en" -> 50, "de" -> 500, "fr" -> 1000)),
      Some {
        val base = (0 until 12).map { j =>
          s"(strpos('0123456789abcdef', substr(md5(concat('graft', CAST(doc_id AS VARCHAR))), ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
        }.mkString("\n    + ")
        s"""SELECT doc_id, lang, source FROM documents
           |WHERE doc_id IS NOT NULL AND ($base) % 1000 <
           |  CASE WHEN lang = 'en' THEN 50 WHEN lang = 'de' THEN 500
           |       WHEN lang = 'fr' THEN 1000 ELSE 0 END""".stripMargin
      }),

    QuerySpec(
      "q57_window_distribution",
      """Distribution window functions over customers per market segment:
        |ntile deciles, percent_rank, cume_dist — the remaining window
        |family beside ranking (q08), running frames (q09), and offsets
        |(q39). Total ordering via the unique custkey tiebreak;
        |percent_rank/cume_dist are single exact-integer-ratio divisions,
        |identical in both engines.""".stripMargin,
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        Tables.customer(s, d).select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(10).over(w).cast("long").as("decile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
      },
      Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
             | CAST(ntile(10) OVER w AS BIGINT) AS decile,
             | percent_rank() OVER w AS pct_rank,
             | cume_dist() OVER w AS cume
             |FROM customer
             |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)""".stripMargin)),

    QuerySpec(
      "q58_neardup_clusters",
      """Near-dup cluster resolution — the step from pairwise dedup
        |output to a runnable dedup: connected components over the UNION
        |of the minhash (q28) and simhash (q47) pair graphs via the
        |alternating large-star/small-star iteration (O(log² n) rounds,
        |each two groupBy-mins + a join — no driver-side graph), then
        |every document labeled with its component's min doc id
        |(singletons label themselves). The DuckDB oracle computes the
        |same closure with a recursive CTE; both reduce to "min reachable
        |id", so they agree exactly regardless of algorithm.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.unionNearDupPairs(docs, maxHamming = 5)
        graft.operators.ConnectedComponents.clusterLabels(docs, "doc_id", pairs)
      },
      Some(ClusterOracle.clustersSql)),

    QuerySpec(
      "q59_dedup_keepset",
      """End-to-end dedup keep-set — the pipeline deliverable composed
        |from q58's clusters: documents minus every non-canonical
        |near-dup cluster member, via one anti-join on the drop-set
        |(|drop-set| ≤ pair-graph nodes, a vanishing fraction of the
        |corpus, so the anti-join broadcasts at any scale). Invariant
        |spec-checked: |kept| = |docs| − Σ(|cluster|−1).""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.unionNearDupPairs(docs, maxHamming = 5)
        graft.operators.ConnectedComponents.keepCanonical(
          docs.select("doc_id", "lang", "source"), "doc_id", pairs)
      },
      Some(ClusterOracle.keepSql)),

    QuerySpec(
      "q60_multi_quantile",
      """Per-group exact multi-quantile aggregation: percentile_disc at
        |{0.25, 0.5, 0.75, 0.95} of lineitem extended price per return
        |flag — the full quantile family beside q40's median. Executed
        |as ONE window sort per group with all four ranks picked from
        |that ordering ([[graft.operators.Quantiles]]) instead of four
        |value-buffering percentile aggregates. Discrete
        |percentiles SELECT an existing input value (no interpolation
        |arithmetic), so the double outputs compare bitwise across
        |engines. The approx_percentile sketch sheet of this operator is
        |error-bounded against these exact values in QuantileSpec
        |(mirroring the q32/HLL pattern: sketches are engine-specific by
        |construction, so the sketch column is spec-bounded, not
        |oracle-compared).""".stripMargin,
      (s, d) => graft.operators.Quantiles.multiQuantileDisc(
        Tables.lineitem(s, d), "l_returnflag", "l_extendedprice",
        Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75, "p95" -> 0.95)),
      Some("""SELECT l_returnflag,
             | percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
             | percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
             | percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS p75,
             | percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice) AS p95,
             | count(*) AS n_rows
             |FROM lineitem
             |WHERE l_extendedprice IS NOT NULL
             |GROUP BY l_returnflag""".stripMargin)),

    QuerySpec(
      "q61_unicode_normalize",
      """Unicode text normalization — training-corpus cleaning: NFC
        |canonicalization (custom codegen'd Catalyst expression; Spark
        |has no builtin), accent strip (NFD + drop combining marks),
        |control-char strip, whitespace collapse. The driver corpus is
        |pure ASCII, so the query first DECORATES it deterministically
        |and identically in both engines (precomposed e-acute, a +
        |decomposed combining grave, BEL + tab injections) and then
        |normalizes — exercising real composition, mark-stripping and
        |control handling rather than a no-op; the cleaning pass must
        |exactly restore the collapsed original. Pure per-row map work:
        |zero shuffles at any scale.""".stripMargin,
      (s, d) => {
        val dec = expr("replace(replace(replace(text, 'e', 'é'), 'a', 'à'), ' ', '	 ')")
        Tables.documents(s, d).select(
          col("doc_id"),
          length(dec).cast("long").as("n_raw"),
          graft.functions.TextNormalize.normalizeText(dec).as("norm_text"))
      },
      Some("""WITH dec AS (SELECT doc_id,
             |  replace(replace(replace(text, 'e', chr(233)), 'a', 'a' || chr(768)),
             |          ' ', chr(9) || chr(7) || ' ') AS d
             |  FROM documents)
             |SELECT doc_id, CAST(length(d) AS BIGINT) AS n_raw,
             |  nfc_normalize(trim(regexp_replace(regexp_replace(strip_accents(nfc_normalize(d)),
             |    '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'), '\s+', ' ', 'g'))) AS norm_text
             |FROM dec""".stripMargin)),

    QuerySpec(
      "q62_event_sequences",
      """Behavioral sequence construction — the training-data op that
        |turns an event log into per-user ordered interaction sequences
        |(the input shape for sequence models and session-based
        |features): per user, the time-ordered event-type path capped at
        |50 steps, plus the uncapped event count. One shuffle on the
        |key; per-key memory is bounded by the cap after the sort-slice,
        |and the hot-key ceiling is the documented window/collect story
        |(Sessionize scaladoc). Ordering is total — (ts, event_id) with
        |the unique id tiebreak — so the concatenated path is
        |deterministic and oracle-comparable as an exact string.""".stripMargin,
      (s, d) => Tables.events(s, d)
        // explicit null rule (q52/q55/q56 convention): a NULL ts has no
        // defined position in a time-ordered path — drop the row on
        // both sides rather than inherit engine-specific NULL ordering
        // (Spark's struct array_sort treats a NULL field as a tie →
        // arrival order; DuckDB ORDER BY defaults NULLS LAST)
        .filter(col("ts").isNotNull)
        .groupBy(col("user_id"))
        .agg(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type"))))
            .as("seq0"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"),
          expr("array_join(transform(slice(seq0, 1, 50), x -> x.event_type), '>')").as("path"),
          col("n_events")),
      Some("""WITH ev AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) ts
             |            FROM events WHERE ts IS NOT NULL)
             |SELECT user_id,
             |  array_to_string((list(event_type ORDER BY ts, event_id))[1:50], '>') AS path,
             |  count(*) AS n_events
             |FROM ev GROUP BY user_id""".stripMargin)),

    QuerySpec(
      "q63_session_cooccurrence",
      """Item co-occurrence within sessions — the counting kernel behind
        |co-occurrence embeddings and PMI features (the log is left to
        |the consumer, q51's rule: transcendentals round differently
        |across libm builds): unordered event-type pairs sharing a
        |session, counted exactly. COMPOSES two shipped operators —
        |sessionize assigns the windows, then a (key, session)
        |self-join forms within-session pairs. The sessionized frame is
        |materialized once (self-join aliasing defeats exchange reuse —
        |the round-2 lesson); join fan-out is per-session quadratic,
        |bounded by the gap rule exactly like the banded range join's
        |bucket population. Integer counts; least/greatest
        |canonicalization — exact in both engines.""".stripMargin,
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
        val sess = graft.operators.Dedup.materialize(
          graft.operators.Sessionize.assignSessions(ev, "user_id", "ts", "event_id", 1800L)
            .select(col("user_id"), col("session_id"), col("event_id"), col("event_type")))
        val a = sess.select(col("user_id"), col("session_id"),
          col("event_id").as("a_id"), col("event_type").as("a_type"))
        val b = sess.select(col("user_id"), col("session_id"),
          col("event_id").as("b_id"), col("event_type").as("b_type"))
        a.join(b, Seq("user_id", "session_id"))
          .filter(col("a_id") < col("b_id"))
          .groupBy(
            least(col("a_type"), col("b_type")).as("type_a"),
            greatest(col("a_type"), col("b_type")).as("type_b"))
          .agg(count(lit(1)).as("n_cooc"))
      },
      Some("""WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) ts, event_type FROM events),
             |m AS (SELECT event_id, user_id, ts, event_type,
             |  CASE WHEN lag(ts) OVER w IS NULL
             |        OR date_diff('microseconds', lag(ts) OVER w, ts) >= 1800000000
             |       THEN 1 ELSE 0 END AS ns
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (SELECT event_id, user_id, event_type,
             |  sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |       ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM m)
             |SELECT least(a.event_type, b.event_type) AS type_a,
             |       greatest(a.event_type, b.event_type) AS type_b,
             |       count(*) AS n_cooc
             |FROM sess a JOIN sess b
             |  ON a.user_id = b.user_id AND a.session_id = b.session_id
             | AND a.event_id < b.event_id
             |GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "q64_rolling_features",
      """Rolling feature engineering over row frames: per user, the
        |trailing-5-event moving average / min / max of value, window
        |population, and the inter-event gap — the standard
        |session-feature block. The moving average is oracle-exact the
        |q01 way: DOUBLE values sum through exact DECIMAL(18,6) addends
        |(order-independent — windowed double sums would diverge:
        |DuckDB's segment tree associates differently than Spark's
        |running frame), then ONE double division by the frame count.
        |The gap is integer microseconds. One key shuffle; frames are
        |O(1) per row.""".stripMargin,
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val order = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val w = order.rowsBetween(-4, Window.currentRow)
        Tables.events(s, d).select(
          col("user_id"), col("event_id"), col("ts"),
          (sum(col("value").cast(MoneyAddend)).over(w).cast("double") /
            count(lit(1)).over(w)).as("mavg_5"),
          min(col("value")).over(w).as("mmin_5"),
          max(col("value")).over(w).as("mmax_5"),
          count(lit(1)).over(w).as("n_win"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(order)).as("gap_us"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) ts, value FROM events)
             |SELECT user_id, event_id, ts,
             |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE)
             |    / count(*) OVER w AS mavg_5,
             |  min(value) OVER w AS mmin_5,
             |  max(value) OVER w AS mmax_5,
             |  CAST(count(*) OVER w AS BIGINT) AS n_win,
             |  epoch_us(ts) - lag(epoch_us(ts), 1) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
             |FROM ev
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)""".stripMargin)),

    QuerySpec(
      "q65_sequence_packing",
      """GPT-style sequence packing: concatenate documents in id order
        |and chop the token stream into 2048-token training sequences;
        |each doc reports the pack holding its first and last token and
        |how many packs it spans ([[graft.operators.SequencePack]]).
        |The exclusive prefix sum runs TWO-LEVEL (per-bucket subtotals →
        |running sum over the tiny subtotal frame → broadcast back →
        |intra-bucket window) so no task ever sees the global ORDER BY —
        |the only single-partition window is over corpus/8192 rows. The
        |oracle is the equivalent single global window scan; integer
        |arithmetic makes the decomposition bitwise identical.""".stripMargin,
      (s, d) => graft.operators.SequencePack.packAssignments(
        Tables.documents(s, d).select(col("doc_id"),
          graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", capacity = 2048L),
      Some("""WITH t AS (SELECT doc_id,
             |  CAST(length(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id IS NOT NULL),
             |c AS (SELECT doc_id, n_tokens,
             |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM t)
             |SELECT doc_id, n_tokens,
             |  cb // 2048 AS pack_first,
             |  (cb + greatest(n_tokens, 1) - 1) // 2048 AS pack_last,
             |  ((cb + greatest(n_tokens, 1) - 1) // 2048) - (cb // 2048) + 1 AS packs_spanned
             |FROM c""".stripMargin)),

    QuerySpec(
      "q66_decontamination",
      """Train/test decontamination — the n-gram overlap audit run
        |before shipping an eval split: training documents sharing ≥3
        |distinct 3-gram shingles with any test document
        |([[graft.operators.Decontaminate]]). The test split is the
        |SAME deterministic md5-bucket membership as q55 (one split
        |definition across the pipeline). Stop-phrase shingles are
        |dropped by a document-frequency cap (df ≤ 20) BEFORE the
        |shingle join — the hot-key bound that keeps the join linear at
        |100 TB (a shingle in thousands of docs is a quadratic key and
        |carries no contamination signal). Same shingle definition as
        |the q28 minhash oracle; all-integer counting.""".stripMargin,
      (s, d) => graft.operators.Decontaminate.contaminationReport(
        Tables.documents(s, d)),
      Some(DecontaminateOracle.sql())),

    QuerySpec(
      "q67_source_cap",
      """Deterministic per-source document cap — domain balancing for a
        |training corpus: at most 10 documents per source, chosen by
        |md5-hash order of the doc id ([[graft.operators.Sampling]]
        |capPerGroup) so the kept set is a pure function of the data
        |(no run-to-run or partitioning drift, unlike a random
        |limit-per-group). One hash shuffle on the group key; BIGINT
        |running-count rank (no Int row_number ceiling).""".stripMargin,
      (s, d) => graft.operators.Sampling.capPerGroup(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("lang")),
        "doc_id", "source", k = 10),
      Some("""SELECT doc_id, source, lang FROM (
             |  SELECT doc_id, source, lang,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY md5(concat('graft', CAST(doc_id AS VARCHAR))), doc_id) AS rk
             |  FROM documents WHERE doc_id IS NOT NULL)
             |WHERE rk <= 10""".stripMargin)),

    QuerySpec(
      "q68_incremental_dedup",
      """Incremental near-dup — the production append shape: dedup the
        |incoming batch (the q55 10% md5-bucket split standing in for
        |"today's load") against the STANDING corpus, emitting
        |(new_id, corpus_id, jacc) pairs
        |([[graft.operators.Dedup.crossNearDupPairs]]). One
        |signature/band pipeline over both sides (the corpus bands are
        |exactly what an incremental system persists between loads);
        |the candidate join is new-bands × corpus-bands, so fan-out is
        |bounded by bucket population × the SMALL new side — never
        |corpus × corpus. Same affine minhash family and relational
        |Jaccard verify as q28; the oracle unrolls the identical
        |pipeline with the split predicate.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val flagged = graft.operators.Sampling.withSplitBucket(docs, "doc_id")
          .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
        graft.operators.Dedup.crossNearDupPairs(flagged, "is_new")
      },
      Some(MinhashOracle.crossSql())),

    QuerySpec(
      "q69_pii_redaction",
      """PII redaction — training-corpus scrubbing: replace email
        |addresses and dotted-quad IPs with typed placeholders. The
        |driver corpus contains no PII, so the query first DECORATES
        |each document deterministically and identically in both
        |engines (a synthetic email and IP derived from doc_id — the
        |q61 decorate-then-clean pattern) and then redacts; counts are
        |taken pre-redaction so the match totals oracle-check too.
        |Patterns are restricted to the regex subset where Java regex
        |and RE2 match identically (explicit classes, bounded
        |quantifiers, no lookaround/backrefs/\b). Pure per-row map
        |work: zero shuffles at any scale.""".stripMargin,
      (s, d) => {
        // coalesce: Spark concat is null-in-null-out while DuckDB's
        // skips NULLs — NULL text must decorate identically both sides
        val decorated = concat(lit("email user"), col("doc_id").cast("string"),
          lit("@mail.example.org from 10."), (col("doc_id") % 200).cast("string"),
          lit("."), ((col("doc_id") * 7) % 250).cast("string"), lit(".1 "),
          coalesce(col("text"), lit("")))
        Tables.documents(s, d).filter(col("doc_id").isNotNull)
          .select(col("doc_id"),
            TextFunctions.redactIps(TextFunctions.redactEmails(decorated)).as("redacted"),
            regexp_count(decorated, lit(TextFunctions.EmailPattern)).cast("long").as("n_emails"),
            regexp_count(decorated, lit(TextFunctions.Ipv4Pattern)).cast("long").as("n_ips"))
      },
      Some(s"""WITH t AS (SELECT doc_id, text,
             |  concat('email user', CAST(doc_id AS VARCHAR), '@mail.example.org from 10.',
             |         CAST(doc_id % 200 AS VARCHAR), '.', CAST((doc_id * 7) % 250 AS VARCHAR),
             |         '.1 ', coalesce(text, '')) AS decorated
             |  FROM documents WHERE doc_id IS NOT NULL)
             |SELECT doc_id,
             |  regexp_replace(regexp_replace(decorated,
             |    '${TextFunctions.EmailPattern}', '<EMAIL>', 'g'),
             |    '${TextFunctions.Ipv4Pattern}', '<IP>', 'g') AS redacted,
             |  CAST(len(regexp_extract_all(decorated, '${TextFunctions.EmailPattern}')) AS BIGINT) AS n_emails,
             |  CAST(len(regexp_extract_all(decorated, '${TextFunctions.Ipv4Pattern}')) AS BIGINT) AS n_ips
             |FROM t""".stripMargin)),

    QuerySpec(
      "q70_unpivot",
      """Unpivot / melt — the wide→long reshape that turns per-row
        |feature columns into (key, metric, value) training examples;
        |the inverse of q37's pivot, closing the reshape family. Uses
        |Spark's native unpivot (an Expand node: one pass, no join, no
        |shuffle — output is input×4 rows produced map-side). The
        |oracle is the transparent engine-portable form, a UNION ALL of
        |one SELECT per metric.""".stripMargin,
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "value"),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
             |       'l_quantity' AS metric, l_quantity AS value FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
             |       'l_extendedprice', l_extendedprice FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
             |       'l_discount', l_discount FROM lineitem
             |UNION ALL
             |SELECT l_orderkey, CAST(l_linenumber AS BIGINT),
             |       'l_tax', l_tax FROM lineitem""".stripMargin)),

    QuerySpec(
      "q71_corpus_build",
      """Corpus-build capstone — the shipped curation operators composed
        |end-to-end into one training-corpus deliverable, proving they
        |chain without recompute: per-source cap at 10 (q67 domain
        |balancing) → the train side of THE md5-bucket split (q55's
        |complement, bucket ≥ 100) → near-dup dedup keep-set over the
        |full-corpus minhash∪simhash pair graph (q58/q59; the
        |components frame is computed ONCE and fed through
        |keepCanonicalFromComponents) → drop train docs contaminated
        |against the test split (q66) → PII redaction of the surviving
        |text (q69's decorate-then-redact so the redaction observably
        |fires). Dedup/decontamination run against the FULL corpus —
        |conservative (a kept doc may be dropped as the near-dup of a
        |capped-away one) and exactly what a production pipeline does:
        |dedup once, then carve splits/caps from labeled output. Scale
        |shape: the filters after the pair pipelines are two anti-joins
        |on vanishing-fraction drop-sets (broadcastable at any scale);
        |everything upstream is the already-audited banded/bucketed
        |plan of the component queries, run once each; and the shingle
        |pass — the token-stream window shuffle that dominates every
        |shingle consumer — is materialized ONCE and shared by the
        |minhash-signature, Jaccard-verify and decontamination stages
        |(FromShingles overloads) — the capstone's cost is ≤ the sum
        |of its parts by construction.""".stripMargin,
      (s, d) => corpusBuild(Tables.documents(s, d)),
      Some(CorpusOracle.sql)),

    QuerySpec(
      "q72_repetition_stats",
      """Gopher/C4-style within-document repetition filters: per doc, the
        |token count, vocabulary size (type-token numerator), the mass of
        |the most frequent token and of the most frequent bigram, plus a
        |`repetitive` flag (top bigram > 18% of bigram mass OR top token
        |> 20% of tokens) evaluated in integer cross-multiplication so
        |the threshold oracle-checks bitwise — no doubles anywhere.
        |Scale shape: two explode → two-level aggregations (partial
        |map-side combine on (doc_id, term) absorbs the within-doc
        |repetition before the exchange — a doc of one repeated word
        |ships ONE row per partition, not one per occurrence); both
        |final aggs leave their side hash-partitioned on doc_id, so the
        |closing join adds no exchange at scale (AQE broadcasts the
        |bigram side at small SF); no per-doc data ever collects to a
        |single task beyond its own distinct-term set.""".stripMargin,
      (s, d) => {
        val toks = Tables.documents(s, d).select(
          col("doc_id"), TextFunctions.rawTokens(col("text")).as("toks"))
        val tokStats = toks
          .select(col("doc_id"), explode(col("toks")).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(
            sum(col("c")).as("n_tokens"),
            count(lit(1)).as("n_distinct"),
            max(col("c")).as("top_token_n"))
        val gramStats = toks
          .select(col("doc_id"),
            explode(TextFunctions.tokenNgrams(col("toks"), 2)).as("g"))
          .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
          .groupBy(col("doc_id")).agg(
            max(col("c")).as("top_bigram_n"),
            sum(col("c")).as("n_bigrams"))
        tokStats.join(gramStats, Seq("doc_id"), "left")
          .select(
            col("doc_id"), col("n_tokens"), col("n_distinct"), col("top_token_n"),
            coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            when(lit(50) * coalesce(col("top_bigram_n"), lit(0L)) >
                   lit(9) * coalesce(col("n_bigrams"), lit(0L)), 1L)
              .when(lit(5) * col("top_token_n") > col("n_tokens"), 1L)
              .otherwise(0L).as("repetitive"))
      },
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
             |tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
             |tc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY 1, 2),
             |tok_stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS top_token_n FROM tc GROUP BY 1),
             |grams AS (SELECT doc_id,
             |  unnest(list_transform(range(1, greatest(len(t), 1)), i -> t[i] || ' ' || t[i + 1])) AS g
             |  FROM toks),
             |gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
             |gram_stats AS (SELECT doc_id, max(c) AS top_bigram_n, CAST(sum(c) AS BIGINT) AS n_bigrams FROM gc GROUP BY 1)
             |SELECT ts.doc_id, ts.n_tokens, ts.n_distinct, ts.top_token_n,
             |  coalesce(gs.top_bigram_n, 0) AS top_bigram_n,
             |  coalesce(gs.n_bigrams, 0) AS n_bigrams,
             |  CAST(CASE WHEN 50 * coalesce(gs.top_bigram_n, 0) > 9 * coalesce(gs.n_bigrams, 0)
             |        OR 5 * ts.top_token_n > ts.n_tokens THEN 1 ELSE 0 END AS BIGINT) AS repetitive
             |FROM tok_stats ts LEFT JOIN gram_stats gs USING (doc_id)""".stripMargin)),

    QuerySpec(
      "q73_intra_doc_repetition",
      """Intra-document repetition (the remaining Gopher filters q72's
        |corpus-level kernel can't see): the longest run of consecutive
        |identical tokens, and duplicate 3-gram mass (total vs distinct
        |3-grams), with an `intra_repetitive` flag (dup-3-gram mass >
        |30% OR a token run ≥ 4) in integer cross-multiplication.
        |Scale shape: ZERO shuffles — the run length is a higher-order
        |`aggregate` fold over the token array and the 3-gram counts are
        |array expressions, so the whole query is one codegen'd
        |projection over the scan; the DuckDB oracle deliberately uses a
        |different algorithm (positional unnest + gaps-and-islands
        |window) so the two engines cross-validate the semantics rather
        |than re-running one implementation.""".stripMargin,
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.rawTokens(col("text")).as("toks"))
        .select(
          col("doc_id"),
          TextFunctions.maxTokenRun(col("toks")).as("max_token_run"),
          TextFunctions.tokenNgrams(col("toks"), 3).as("g3"))
        .select(
          col("doc_id"), col("max_token_run"),
          size(col("g3")).cast("long").as("n_3grams"),
          size(array_distinct(col("g3"))).cast("long").as("n_distinct_3grams"))
        .select(
          col("doc_id"), col("max_token_run"), col("n_3grams"), col("n_distinct_3grams"),
          when(lit(10) * (col("n_3grams") - col("n_distinct_3grams")) > lit(3) * col("n_3grams"), 1L)
            .when(col("max_token_run") >= 4, 1L)
            .otherwise(0L).as("intra_repetitive")),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents),
             |pos AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS i, t FROM toks),
             |w AS (SELECT doc_id, i, t[i] AS w FROM pos),
             |runs AS (SELECT doc_id, w, i - row_number() OVER (PARTITION BY doc_id, w ORDER BY i) AS grp FROM w),
             |rl AS (SELECT doc_id, count(*) AS run_len FROM runs GROUP BY doc_id, w, grp),
             |max_run AS (SELECT doc_id, max(run_len) AS max_token_run FROM rl GROUP BY doc_id),
             |g3 AS (SELECT doc_id,
             |  list_transform(range(1, greatest(len(t) - 1, 1)), i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) AS g
             |  FROM toks),
             |g3s AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_3grams,
             |  CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct_3grams FROM g3)
             |SELECT m.doc_id, m.max_token_run, s.n_3grams, s.n_distinct_3grams,
             |  CAST(CASE WHEN 10 * (s.n_3grams - s.n_distinct_3grams) > 3 * s.n_3grams
             |        OR m.max_token_run >= 4 THEN 1 ELSE 0 END AS BIGINT) AS intra_repetitive
             |FROM max_run m JOIN g3s s USING (doc_id)""".stripMargin)),

    QuerySpec(
      "q74_filter_audit",
      """Quality-filter audit — the Dolma/C4-style keep/drop decision a
        |corpus pipeline runs before training, with REASON CODES so
        |curation is reviewable (what fraction died, and why) instead
        |of a silent filter: first failing rule by precedence
        |too_short (< 20 tokens) → non_english (declared lang) →
        |repetitive (the q72 corpus-level ∪ q73 intra-doc rules) →
        |low_stopword (stopword mass < 2%, the machine-generated-text
        |smell) → kept. All thresholds integer-cross-multiplied; every
        |reason fires on the driver corpus. Scale shape: the only
        |shuffles are q72's two-level (doc_id, term) aggregations; the
        |run/3-gram/stopword columns ride the same scan map-side, and
        |the reason CASE is a final projection — auditing costs no more
        |than the repetition stats it reuses.""".stripMargin,
      (s, d) => graft.operators.QualityRules.audit(Tables.documents(s, d)),
      Some(s"""WITH $qualityRuleCtes,
             |audit AS (SELECT doc_id, n_tokens,
             |  CASE WHEN n_tokens < 20 THEN 'too_short'
             |       WHEN lang <> 'en' THEN 'non_english'
             |       WHEN 50 * top_bigram_n > 9 * n_bigrams OR 5 * top_token_n > n_tokens
             |            OR max_token_run >= 4 OR 10 * (n_3grams - n_distinct_3grams) > 3 * n_3grams THEN 'repetitive'
             |       WHEN 50 * stop_cnt < n_tokens THEN 'low_stopword'
             |       ELSE 'kept' END AS reason
             | FROM j)
             |SELECT doc_id, n_tokens, reason,
             |  CAST(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END AS BIGINT) AS kept
             |FROM audit""".stripMargin)),

    QuerySpec(
      "q75_embedding_quantize",
      """Int8 embedding quantization — the 4× memory cut that makes a
        |billion-vector ANN index fit executor RAM: per vector, scale =
        |max|x| (float widened to double FIRST, so both engines run the
        |identical IEEE ops), q_i = trunc(127·x/scale) — truncation, not
        |rounding, because Spark's double→long cast truncates while
        |DuckDB's CAST rounds; `trunc` pins both to the same kernel.
        |Emits integer summaries (l1 mass, sum, min/max, saturation
        |count) rather than the int8 array so the oracle compares
        |engine-portable scalars; the array itself is the same
        |`transform` one projection earlier. Pure map-side work: zero
        |shuffles at any scale, and the zero-vector guard
        |(greatest(scale, 1e-30)) keeps the kernel total without a
        |per-row branch.""".stripMargin,
      (s, d) =>
        Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x => x.cast("double")).as("v"))
          .select(col("vec_id"), col("label"), col("v"),
            greatest(array_max(transform(col("v"), x => abs(x))), lit(1e-30))
              .as("scale"))
          .select(col("vec_id"), col("label"),
            transform(col("v"), x => (lit(127.0) * x / col("scale")).cast("long"))
              .as("qv"))
          .select(
            col("vec_id"), col("label"),
            size(col("qv")).cast("long").as("n_dims"),
            array_min(col("qv")).as("q_min"),
            array_max(col("qv")).as("q_max"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
            size(filter(col("qv"), x => abs(x) === 127L)).cast("long").as("n_sat")),
      Some("""WITH e AS (SELECT vec_id, label,
             |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
             |s AS (SELECT vec_id, label, v,
             |  greatest(list_max(list_transform(v, x -> abs(x))), 1e-30) AS scale FROM e),
             |q AS (SELECT vec_id, label,
             |  list_transform(v, x -> CAST(trunc(127.0 * x / scale) AS BIGINT)) AS qv FROM s)
             |SELECT vec_id, label, CAST(len(qv) AS BIGINT) AS n_dims,
             |  list_min(qv) AS q_min, list_max(qv) AS q_max,
             |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
             |  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
             |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
             |FROM q""".stripMargin)),

    QuerySpec(
      "q76_corpus_summary",
      """Per-(source, lang) corpus composition sheet — the first report
        |a data curator pulls before training: document and token
        |volumes plus exact length percentiles per slice, feeding the
        |per-source caps (q67) and stratified splits (q56) with actual
        |numbers. Exercises the multi-column-group variant of the
        |one-sort multi-quantile kernel (q60's operator) on the
        |documents domain; percentile_disc SELECTS existing BIGINT
        |lengths, so everything compares bitwise. Scale shape: one
        |shuffle on the compound (source, lang) key for the window
        |sort, one for the sums — both partial-aggregated map-side;
        |slices parallelize across tasks and the final join of the two
        |sheets is on the same compound key, so no third exchange at
        |scale. ADJUDICATION (r15): this sheet keys on the PROVENANCE
        |lang label, deliberately — its subject is slice mechanics
        |(volumes + percentiles per declared slice), and on this
        |corpus the labels are synthetic and text-independent, so
        |recomposing on the q184 derived lang_id would key the sheet
        |on near-arbitrary predictions without exercising anything
        |q184 doesn't already oracle. A production pipeline passes
        |q184's lang_id as this operator's langCol — the operator is
        |parameterized for exactly that.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d).select(
          col("source"), col("lang"), col("n_chars"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
        val sums = docs.groupBy(col("source"), col("lang")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(col("n_chars")).as("sum_chars"))
        val quantiles = graft.operators.Quantiles.multiQuantileDisc(
          docs, Seq("source", "lang"), "n_chars",
          Seq("p50_chars" -> 0.50, "p95_chars" -> 0.95))
          .drop("n_rows")
        sums.join(quantiles, Seq("source", "lang"))
      },
      Some("""SELECT source, lang, count(*) AS n_docs,
             |  CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS sum_tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
             |  percentile_disc(0.50) WITHIN GROUP (ORDER BY n_chars) AS p50_chars,
             |  percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars) AS p95_chars
             |FROM documents GROUP BY source, lang""".stripMargin)),

    QuerySpec(
      "q77_containment_dedup",
      """Containment near-dup — the short-doc-embedded-in-long-doc
        |relation symmetric Jaccard dilutes (a doc fully contained in
        |one 10× longer has containment 1.0 but Jaccard ≈ 0.1, so q28
        |never surfaces it): among the SAME MinHash/LSH candidate pairs
        |as q28, exact shingle-set containment |A∩B|/min(|A|,|B|) ≥ 0.5
        |with the integer overlap counts exposed. Shares the
        |candidate-bounded relational overlap kernel with the Jaccard
        |verify (one extra closing projection, zero new shuffles); at
        |100 TB the plan is identical to q28's audited shape.""".stripMargin,
      (s, d) => Dedup.containmentPairs(Tables.documents(s, d)),
      Some(MinhashOracle.containmentSql(numHashes = 16, rowsPerBand = 4,
        threshold = 0.5))),

    QuerySpec(
      "q78_rolling_fingerprint",
      """Karp-Rabin rolling-hash document fingerprint — the
        |incrementally-updatable polynomial form (h·131 + cp mod 2³¹−1
        |over code points) that content-defined chunking and streaming
        |fingerprinters use, completing the fingerprint family beside
        |q27's min-shingle md5 and xxhash64. Runs as the native codegen
        |`graft_kr` Expression ([[graft.functions.RollingHash]]): a
        |primitive long loop inside WholeStageCodegen — a HOF fold over
        |split-to-chars would allocate a per-row array of single-char
        |strings and evaluate interpreted. P < 2³¹ keeps intermediates
        |< 2³⁹, exact in BIGINT, so DuckDB replays the identical fold
        |with list_reduce over unicode() code points. The n_same_hash
        |window (one hash shuffle) is the dedup-ready grouping.""".stripMargin,
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("kr_hash"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextFunctions.rollingFingerprint(col("text")).as("kr_hash"))
          .select(col("doc_id"), col("kr_hash"),
            count(lit(1)).over(w).as("n_same_hash"))
      },
      Some("""WITH h AS (SELECT doc_id,
             |  list_reduce(
             |    list_prepend(CAST(0 AS BIGINT),
             |      list_transform(range(1, length(text) + 1), i -> CAST(unicode(text[i]) AS BIGINT))),
             |    (acc, c) -> (acc * 131 + c) % 2147483647) AS kr_hash
             | FROM documents)
             |SELECT doc_id, kr_hash,
             |  CAST(count(*) OVER (PARTITION BY kr_hash) AS BIGINT) AS n_same_hash
             |FROM h""".stripMargin)),

    QuerySpec(
      "q79_document_chunking",
      """Within-document chunking — the RAG/context-window splitter
        |(complementing q65's cross-document concat-and-chop packing):
        |each document becomes overlapping 32-token chunks at stride 24
        |(8-token overlap so no boundary context is lost), emitted as
        |(doc_id, chunk_idx, chunk_text, n_chunk_tokens); the final
        |chunk keeps its natural shorter length. The parameterized
        |operator is [[graft.operators.Chunking.chunkDocuments]]; this
        |catalog entry pins it at width=32, stride=24. Scale shape:
        |pure map-side — explode over a per-doc start sequence
        |(|tokens|/24 elements) then slice + join from the bound token
        |array; zero shuffles, no window, chunk_idx arithmetic is exact
        |in both engines because starts are 1 + k·24 by
        |construction.""".stripMargin,
      (s, d) => graft.operators.Chunking.chunkDocuments(
        Tables.documents(s, d), width = 32, stride = 24),
      Some("""WITH toks AS (SELECT doc_id, string_split_regex(coalesce(text, ''), '\s+') AS t
             |              FROM documents),
             |starts AS (SELECT doc_id, t, unnest(range(1, len(t) + 1, 24)) AS start FROM toks)
             |SELECT doc_id,
             |  CAST((start - 1) / 24 AS BIGINT) AS chunk_idx,
             |  array_to_string(t[start : least(start + 31, len(t))], ' ') AS chunk_text,
             |  CAST(least(start + 31, len(t)) - start + 1 AS BIGINT) AS n_chunk_tokens
             |FROM starts""".stripMargin)),

    QuerySpec(
      "q80_rare_token_stats",
      """Corpus-relative rarity audit — the out-of-vocabulary /
        |rare-mass quality signal (Dolma-style): per doc, how many
        |token occurrences belong to words whose CORPUS frequency is
        |below the corpus mean (c·|vocab| < total, an integer-exact,
        |parameter-free rarity line), with a `rare_heavy` flag at
        |> 25% rare mass — the gibberish/ocr-noise smell that needs
        |corpus context no per-doc rule can see. Scale shape: the q51
        |kernel — occurrences are NEVER shuffled raw; the (doc, term,
        |cnt) pre-aggregation map-side-combines before its exchange,
        |corpus term frequencies aggregate from it, the single-row
        |corpus stats broadcast, and the rare-set join is term-level
        |(rows = doc × distinct-term, not occurrences).""".stripMargin,
      (s, d) => {
        val dt = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(TextFunctions.tokens(col("text"))).as("w"))
          .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
        val tf = dt.groupBy(col("w")).agg(sum(col("cnt")).as("c"))
        val stats = tf.agg(sum(col("c")).as("total"), count(lit(1)).as("vocab"))
        val rare = tf.crossJoin(broadcast(stats))
          .filter(col("c") * col("vocab") < col("total"))
          .select(col("w"), lit(1L).as("__rare"))
        dt.join(rare, Seq("w"), "left")
          .groupBy(col("doc_id")).agg(
            sum(col("cnt")).as("n_tokens"),
            sum(when(col("__rare").isNotNull, col("cnt")).otherwise(0L)).as("n_rare"))
          .select(col("doc_id"), col("n_tokens"), col("n_rare"),
            when(lit(4) * col("n_rare") > col("n_tokens"), 1L).otherwise(0L)
              .as("rare_heavy"))
      },
      Some("""WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w FROM documents),
             |tf AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
             |stats AS (SELECT CAST(sum(c) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS vocab FROM tf),
             |rare AS (SELECT w FROM tf, stats WHERE c * vocab < total),
             |per_doc AS (SELECT t.doc_id,
             |  CAST(count(*) AS BIGINT) AS n_tokens,
             |  CAST(count(*) FILTER (r.w IS NOT NULL) AS BIGINT) AS n_rare
             | FROM tok t LEFT JOIN rare r ON t.w = r.w GROUP BY t.doc_id)
             |SELECT doc_id, n_tokens, n_rare,
             |  CAST(CASE WHEN 4 * n_rare > n_tokens THEN 1 ELSE 0 END AS BIGINT) AS rare_heavy
             |FROM per_doc""".stripMargin)),

    QuerySpec(
      "q81_curation_gate",
      """Curation-at-ingest gate, batch twin with reason codes — the
        |library operator ([[graft.streaming.Curation]]) whose streaming
        |face filters + dedups data AS IT ARRIVES (the reference's whole
        |shape: transform inside the micro-batch): map-side quality
        |rules (too_short < 20 tokens → non_english → low_stopword
        |< 2%) then exact content dedup, the stream's arrival-order
        |keeper pinned to min-id so the decision is deterministic and
        |oracles bitwise. The corpus has no exact duplicates, so the
        |query first UNIONS in deterministic copies of every 50th doc
        |(the q69 decorate-then-process pattern) — every reason code
        |including 'duplicate' observably fires. Scale shape: rules ride
        |the scan map-side; dedup is one hash shuffle on the content
        |md5 plus one co-partitioned join back — no window, no sort;
        |streaming parity is spec-asserted (StreamingCurationSpec).""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        val echoes = docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"), col("text"))
        graft.streaming.Curation.batchAudit(docs.union(echoes))
      },
      Some(s"""WITH u AS (
             |  SELECT doc_id, lang, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, text FROM documents WHERE doc_id % 50 = 0),
             |t AS (SELECT doc_id, md5(lower(text)) AS h,
             |  coalesce(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), -1) AS n_tokens,
             |  CASE WHEN coalesce(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), -1) < 20 THEN 'too_short'
             |       WHEN lang <> 'en' THEN 'non_english'
             |       WHEN 100 * coalesce(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
             |              x -> x IN ($StopList))) AS BIGINT), 0)
             |            < 2 * CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) THEN 'low_stopword'
             |       ELSE 'kept' END AS qr
             |  FROM u),
             |k AS (SELECT h, min(doc_id) AS keeper_id FROM t WHERE qr = 'kept' GROUP BY h)
             |SELECT doc_id, n_tokens,
             |  CASE WHEN qr <> 'kept' THEN qr
             |       WHEN doc_id <> keeper_id THEN 'duplicate'
             |       ELSE 'kept' END AS reason,
             |  CAST(CASE WHEN qr = 'kept' AND doc_id = keeper_id THEN 1 ELSE 0 END AS BIGINT) AS kept
             |FROM t LEFT JOIN k USING (h)""".stripMargin)),

    QuerySpec(
      "q82_ivf_drift",
      """Incremental ANN maintenance — the similarity-search twin of
        |q68's incremental dedup: a growing corpus must not re-run
        |k-means per append, so the NEW batch (vec_id % 8 = 0, the
        |deterministic eighth standing in for "today's load") is
        |assigned to the STANDING IVF centroids (seeded from the old
        |corpus, one Lloyd round — the q49 kernel) and each cell
        |reports n_old/n_new plus mean quantized cosine displacement
        |(floor((1−cos)·2²⁰), floor-divided mean) with a `refresh`
        |decision: new mass > 25% of standing, OR incoming points
        |sitting > 20% farther from the centroid than the standing
        |population (the corpus-relative drift line). All integer-exact
        |from the shared left-fold-double cosines, so even the refresh
        |decision oracles bitwise. Scale shape: two argmax assignment
        |passes (one exchange row per vector each — and a real index
        |already persists the old side's), per-cell aggregation on
        |nlist keys, nlist-row joins; means divide before the
        |cross-multiplied comparison so nothing overflows at any corpus
        |size.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val old = e.filter(col("vec_id") % 8 =!= 0)
        val fresh = e.filter(col("vec_id") % 8 === 0)
        val cent = Similarity.kmeansIterate(old, old.filter(col("vec_id") < 16),
          iters = 1, dim = 64)
        Similarity.ivfDrift(old, fresh, cent, dim = 64)
      },
      Some(IvfOracle.driftSql(nlist = 16, iters = 1, dim = 64))),

    {
      val digits = (0 until 12).map { j =>
        s"(strpos('0123456789abcdef', substr(hh, ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
      }.mkString("\n             |    + ")
      QuerySpec(
        "q83_repeated_spans",
        """Cross-document repeated exact-substring spans — Lee et al.'s
          |exact substring dedup criterion in suffix-array-free form
          |([[graft.operators.Dedup.repeatedSpanStats]], width 16 /
          |stride 4): every 16-token window keyed by the 48-bit
          |md5-derived span key (the minhash idiom); keys in ≥ 2
          |distinct docs mark verbatim cross-document spans (license
          |headers, boilerplate, templated text) that whole-doc Jaccard
          |dilutes; per doc, repeated-window mass with a
          |`span_dup_heavy` flag > 25% (integer cross-multiplied).
          |Scale shape: map-side window explode to 8-byte keys (never
          |span text on the wire), (doc, key) pre-aggregation map-side
          |combines before the ONE hash exchange, repeated-key set and
          |closing join both key-level — the q80 kernel over span keys,
          |same data movement order as the shingle pass.""".stripMargin,
        (s, d) => Dedup.repeatedSpanStats(Tables.documents(s, d), width = 16, stride = 4),
        Some(s"""WITH toks AS (SELECT doc_id, string_split_regex(text, '\\s+') AS t FROM documents),
             |w AS (SELECT doc_id, unnest(range(1, greatest(len(t) - 15, 1) + 1, 4)) AS start, t FROM toks),
             |f AS (SELECT doc_id, start, t FROM w WHERE start + 15 <= len(t)),
             |h AS (SELECT doc_id, md5(array_to_string(t[start : start + 15], ' ')) AS hh FROM f),
             |k AS (SELECT doc_id, $digits AS k FROM h),
             |dk AS (SELECT doc_id, k, count(*) AS cnt FROM k GROUP BY 1, 2),
             |rep AS (SELECT k FROM dk GROUP BY k HAVING count(*) >= 2),
             |stats AS (SELECT dk.doc_id, CAST(sum(cnt) AS BIGINT) AS n_windows,
             |  CAST(sum(CASE WHEN r.k IS NOT NULL THEN cnt ELSE 0 END) AS BIGINT) AS n_rep_windows
             | FROM dk LEFT JOIN rep r USING (k) GROUP BY 1)
             |SELECT d.doc_id, coalesce(s.n_windows, 0) AS n_windows,
             |  coalesce(s.n_rep_windows, 0) AS n_rep_windows,
             |  CAST(CASE WHEN 4 * coalesce(s.n_rep_windows, 0) > coalesce(s.n_windows, 0)
             |       THEN 1 ELSE 0 END AS BIGINT) AS span_dup_heavy
             |FROM documents d LEFT JOIN stats s USING (doc_id)""".stripMargin))
    },

    QuerySpec(
      "q84_salient_terms",
      """Per-document salient terms — the per-doc consumer of q51's
        |TF-IDF kernel: top-5 terms per doc ranked by
        |document-frequency-normalized term frequency (weight = tf/df,
        |one IEEE division of exact integers — bitwise identical in
        |both engines, where an ln-idf would diverge across libm
        |implementations, the precise reason q51 left the log to the
        |consumer; tf/df orders identically to tf·(N/df) since N is a
        |positive constant). Ties break on the term string, so the
        |ranking is total. Scale shape: the q51 kernel — occurrences
        |pre-aggregate to (doc, term, tf) map-side before the one
        |exchange; df derives from that frame (term-level rows); the
        |closing join is term-level and the per-doc top-5 window
        |shuffles doc-grouped term rows, never raw occurrences.""".stripMargin,
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("weight").desc, col("term").asc)
        val dt = Tables.documents(s, d)
          .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val dfreq = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
        dt.join(dfreq, Seq("term"))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            (col("tf").cast("double") / col("df").cast("double")).as("weight"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
      },
      Some("""WITH dt AS (SELECT doc_id, term, count(*) AS tf FROM (
             |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
             |    FROM documents) t
             |  GROUP BY 1, 2),
             |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
             |ranked AS (SELECT doc_id, term, tf, df,
             |    CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) AS weight,
             |    CAST(row_number() OVER (PARTITION BY doc_id
             |      ORDER BY CAST(tf AS DOUBLE) / CAST(df AS DOUBLE) DESC, term ASC) AS BIGINT) AS rank
             |  FROM dt JOIN dfreq USING (term))
             |SELECT doc_id, term, tf, df, weight, rank FROM ranked WHERE rank <= 5""".stripMargin)),

    QuerySpec(
      "q85_funnel_analysis",
      """First-touch funnel over the event log — the product-analytics
        |staple (view → click → purchase, each step inside a 24-hour
        |conversion window): per user entering at 'view', the earliest
        |view, the earliest click strictly after it within 24 h, the
        |earliest purchase strictly after that within 24 h, the step
        |count reached, and the exact view→purchase latency in epoch
        |microseconds (BIGINT; −1 for non-converters). The window makes
        |the funnel discriminate (unwindowed, every driver user
        |eventually completes); timestamp + interval arithmetic is exact
        |micros in both engines, so everything compares bitwise. The
        |parameterized operator is [[graft.operators.Funnel.firstTouch]]
        |(any step sequence, any window); this entry pins it at
        |(view, click, purchase) × 24 h. Scale shape: one
        |min-aggregation + join per step, all keyed on user_id, so
        |every exchange hash-partitions on the same key and AQE
        |broadcasts the shrinking funnel frontier into the next event
        |scan; the sequential dependency between steps is inherent to
        |strictly-ordered funnel semantics, not an implementation
        |artifact.""".stripMargin,
      (s, d) => graft.operators.Funnel.firstTouch(
          Tables.events(s, d), "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSeconds = 86400L)
        .withColumnRenamed("conversion_us", "view_to_purchase_us"),
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type
             |            FROM events WHERE ts IS NOT NULL),
             |v AS (SELECT user_id, min(ts) AS t_view FROM ev
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM ev e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |        AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM ev e JOIN c USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |        AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY 1)
             |SELECT user_id, v.t_view, c.t_click, p.t_purchase,
             |  CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
             |         + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps,
             |  coalesce(date_diff('microseconds', v.t_view, p.t_purchase), -1) AS view_to_purchase_us
             |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin)),

    QuerySpec(
      "q86_cohort_retention",
      """Weekly cohort retention — the companion sheet to q85's funnel:
        |users are cohorted by the ISO week of their first 'signup'
        |event (date_trunc week → Monday in both engines), and each
        |(cohort_week, week_offset) cell counts the distinct cohort
        |members active (any event) that week, beside the cohort size.
        |week_offset is an exact integer: both week starts are Mondays,
        |so the day difference is always a multiple of 7 and the
        |integer division is exact — no truncation-direction ambiguity.
        |Pre-signup activity (negative offset) is excluded by rule.
        |Scale shape: the signup frame is one min-aggregation on
        |user_id; the activity join is keyed on user_id (broadcastable
        |frontier, like q85); the retention cells aggregate on the
        |small (cohort, offset) key with map-side distinct pre-
        |aggregation — no window, no sort, nothing per-user ever
        |collects.""".stripMargin,
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("ts").isNotNull)
          .select(col("user_id"), col("ts"), col("event_type"))
        val signup = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
          .select(col("user_id"), to_date(date_trunc("week", col("t0"))).as("cohort_week"))
        val cohortSize = signup.groupBy(col("cohort_week"))
          .agg(countDistinct(col("user_id")).as("n_cohort"))
        val cells = ev
          .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("act_week"))
          .join(signup, "user_id")
          .select(col("cohort_week"), col("user_id"),
            expr("datediff(act_week, cohort_week) div 7").cast("long").as("week_offset"))
          .filter(col("week_offset") >= 0)
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
        cells.join(cohortSize, "cohort_week")
          .select(col("cohort_week"), col("week_offset"), col("n_active"), col("n_cohort"))
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type
             |            FROM events WHERE ts IS NOT NULL),
             |signup AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |           FROM ev WHERE event_type = 'signup' GROUP BY 1),
             |siz AS (SELECT cohort_week, CAST(count(DISTINCT user_id) AS BIGINT) AS n_cohort
             |        FROM signup GROUP BY 1),
             |cells AS (SELECT s.cohort_week,
             |    CAST(date_diff('day', s.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset,
             |    e.user_id
             |  FROM ev e JOIN signup s USING (user_id)),
             |r AS (SELECT cohort_week, week_offset, CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
             |      FROM cells WHERE week_offset >= 0 GROUP BY 1, 2)
             |SELECT cohort_week, week_offset, n_active, n_cohort
             |FROM r JOIN siz USING (cohort_week)""".stripMargin)),

    {
      val metrics = Seq(
        "quantity" -> "l_quantity", "extendedprice" -> "l_extendedprice",
        "discount" -> "l_discount", "tax" -> "l_tax")
      val pairs = for {
        ((na, _), i) <- metrics.zipWithIndex
        (nb, _) <- metrics.drop(i + 1)
      } yield (na, nb)
      def duckCorr(a: String, b: String) =
        s"""(CAST(n AS DOUBLE) * CAST(s_${a}_$b AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$b AS DOUBLE))
           |    / (sqrt(CAST(n AS DOUBLE) * CAST(s_${a}_$a AS DOUBLE) - CAST(s_$a AS DOUBLE) * CAST(s_$a AS DOUBLE))
           |       * sqrt(CAST(n AS DOUBLE) * CAST(s_${b}_$b AS DOUBLE) - CAST(s_$b AS DOUBLE) * CAST(s_$b AS DOUBLE)))""".stripMargin
      val duckSums = metrics.map { case (n, _) => s"sum(q_$n) AS s_$n" } ++
        (for { ((a, _), i) <- metrics.zipWithIndex; (b, _) <- metrics.drop(i) }
          yield s"sum(q_$a * q_$b) AS s_${a}_$b")
      QuerySpec(
        "q87_feature_correlation",
        """Pairwise feature-correlation sheet from EXACT integer moments
          |— the reproducibility pattern for second-order statistics at
          |scale: a streaming/partition-ordered Pearson (Welford or
          |plain double sums) is order-dependent, so instead each
          |2-decimal money column is quantized ×100 to an exact integer
          |(round, then a cast both engines agree on because the value
          |is already integral), the five moments (n, Σx, Σy, Σxy, Σx²,
          |Σy²) accumulate in DECIMAL(38,0)/HUGEINT — exact in ANY
          |order — and one closing double expression (products, sqrt,
          |divide: all deterministic IEEE ops on identical inputs)
          |produces the correlation. Per l_returnflag group × 6 metric
          |pairs. Scale shape: ONE map-side-combined aggregation over
          |the scan computes all 14 moments; the 6 output rows per
          |group are a projection union over the tiny moment frame —
          |no second pass over data, no window, nothing
          |order-sensitive.""".stripMargin,
        (s, d) => {
          val q = Tables.lineitem(s, d).select(
            col("l_returnflag") +:
              metrics.map { case (n, c) => round(col(c) * 100).cast("long").as(s"q_$n") }: _*)
          val sums =
            metrics.map { case (n, _) =>
              sum(col(s"q_$n").cast("decimal(38,0)")).as(s"s_$n") } ++
            (for { ((a, _), i) <- metrics.zipWithIndex; (b, _) <- metrics.drop(i) }
              yield sum(col(s"q_$a").cast("decimal(19,0)") * col(s"q_$b").cast("decimal(19,0)"))
                .as(s"s_${a}_$b"))
          val allAggs = count(lit(1)).as("n") +: sums
          val m = q.groupBy(col("l_returnflag"))
            .agg(allAggs.head, allAggs.tail: _*)
          def corr(a: String, b: String): org.apache.spark.sql.Column = {
            val nd = col("n").cast("double")
            (nd * col(s"s_${a}_$b").cast("double") -
              col(s"s_$a").cast("double") * col(s"s_$b").cast("double")) /
              (sqrt(nd * col(s"s_${a}_$a").cast("double") -
                col(s"s_$a").cast("double") * col(s"s_$a").cast("double")) *
               sqrt(nd * col(s"s_${b}_$b").cast("double") -
                col(s"s_$b").cast("double") * col(s"s_$b").cast("double")))
          }
          pairs.map { case (a, b) =>
            m.select(col("l_returnflag"), lit(a).as("metric_a"), lit(b).as("metric_b"),
              col("n"), corr(a, b).as("corr"))
          }.reduce(_.unionAll(_))
        },
        Some(s"""WITH q AS (SELECT l_returnflag,
             |${metrics.map { case (n, c) => s"  CAST(round($c * 100) AS HUGEINT) AS q_$n" }.mkString(",\n")}
             |  FROM lineitem),
             |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             |  ${duckSums.mkString(",\n  ")}
             |  FROM q GROUP BY 1)
             |${pairs.map { case (a, b) =>
                  s"""SELECT l_returnflag, '$a' AS metric_a, '$b' AS metric_b, n,
                     |  ${duckCorr(a, b)} AS corr
                     |FROM m""".stripMargin
                }.mkString("\nUNION ALL\n")}""".stripMargin))
    },

    QuerySpec(
      "q88_conversion_by_cohort",
      """Conversion quality by signup cohort — THREE shipped operators
        |composed into one growth sheet: the first-touch funnel
        |([[graft.operators.Funnel.firstTouch]], q85's
        |view→click→purchase × 24 h) joined to q86's ISO-week signup
        |cohorts, then the exact multi-quantile kernel
        |([[graft.operators.Quantiles.multiQuantileDisc]], q60/q76's
        |operator) picks the median conversion latency among each
        |cohort's converters. Per cohort_week: entrants, converters,
        |and p50 view→purchase micros (−1 for cohorts with no
        |converters). Everything integer/timestamp-exact — funnel
        |times, week arithmetic, percentile_disc rank picks — so the
        |composed sheet oracles bitwise. Scale shape: the funnel's
        |user-keyed passes, one broadcastable cohort join, a
        |(cohort)-keyed count aggregation, and ONE window sort per
        |cohort over converters only — each stage the already-audited
        |plan of its component operator.""".stripMargin,
      (s, d) => {
        val ev = Tables.events(s, d).filter(col("ts").isNotNull)
        val funnel = graft.operators.Funnel.firstTouch(
          ev, "user_id", "ts", "event_type",
          steps = Seq("view", "click", "purchase"), windowSeconds = 86400L)
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t0"))
          .select(col("user_id"), to_date(date_trunc("week", col("t0"))).as("cohort_week"))
        val joined = funnel.join(cohort, "user_id")
        val counts = joined.groupBy(col("cohort_week")).agg(
          count(lit(1)).as("n_entered"),
          sum(when(col("steps") === 3, 1L).otherwise(0L)).as("n_converted"))
        val p50 = graft.operators.Quantiles.multiQuantileDisc(
          joined.filter(col("steps") === 3),
          Seq("cohort_week"), "conversion_us", Seq("p50_us" -> 0.50))
          .drop("n_rows")
        counts.join(p50, Seq("cohort_week"), "left")
          .select(col("cohort_week"), col("n_entered"), col("n_converted"),
            coalesce(col("p50_us"), lit(-1L)).as("p50_us"))
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type
             |            FROM events WHERE ts IS NOT NULL),
             |v AS (SELECT user_id, min(ts) AS t_view FROM ev
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM ev e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND e.ts > v.t_view
             |        AND e.ts <= v.t_view + INTERVAL 24 HOUR GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM ev e JOIN c USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
             |        AND e.ts <= c.t_click + INTERVAL 24 HOUR GROUP BY 1),
             |funnel AS (SELECT user_id,
             |    CAST(1 + CASE WHEN c.t_click IS NOT NULL THEN 1 ELSE 0 END
             |           + CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps,
             |    coalesce(date_diff('microseconds', v.t_view, p.t_purchase), -1) AS conversion_us
             |  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)),
             |cohort AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
             |           FROM ev WHERE event_type = 'signup' GROUP BY 1),
             |j AS (SELECT f.user_id, f.steps, f.conversion_us, co.cohort_week
             |      FROM funnel f JOIN cohort co USING (user_id)),
             |counts AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_entered,
             |    CAST(count(*) FILTER (steps = 3) AS BIGINT) AS n_converted
             |  FROM j GROUP BY 1),
             |p50 AS (SELECT cohort_week,
             |    percentile_disc(0.50) WITHIN GROUP (ORDER BY conversion_us) AS p50_us
             |  FROM j WHERE steps = 3 GROUP BY 1)
             |SELECT cohort_week, n_entered, n_converted, coalesce(p50_us, -1) AS p50_us
             |FROM counts LEFT JOIN p50 USING (cohort_week)""".stripMargin)),

    QuerySpec(
      "q89_mixing_weights",
      """Temperature-scaled corpus mixing weights
        |([[graft.operators.Mixing.sqrtTemperatureWeights]]): per-source
        |token volumes → α=1/2 sampling weights, the data-mixing step
        |that rebalances a multi-source corpus (upsample small sources,
        |damp dominant ones). Exact cross-engine: sqrt is a correctly
        |rounded IEEE op, ×2^20 only shifts the exponent, so the
        |quantized sqrt is a deterministic BIGINT whose sum is
        |order-independent; each weight is then one IEEE division of
        |exact integers (w_temp/w_prop divides those two identical
        |doubles). Scale shape: ONE corpus scan into a map-side-combined
        |agg keyed on source, then an unpartitioned window over the
        |tiny per-source frame for totals (a re-aggregated broadcast
        |branch would plan a second full corpus scan).""".stripMargin,
      (s, d) => graft.operators.Mixing.sqrtTemperatureWeights(
        Tables.documents(s, d).select(col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "source", "n_tokens"),
      Some("""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(len(string_split_regex(coalesce(text, ''), '\s+'))) AS BIGINT) AS n_size
             |  FROM documents GROUP BY 1),
             |q AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
             |tot AS (SELECT CAST(sum(n_size) AS BIGINT) AS tot_size,
             |               CAST(sum(s_q) AS BIGINT) AS tot_sq FROM q)
             |SELECT source, n_items, n_size,
             |  CAST(n_size AS DOUBLE) / tot_size AS w_prop,
             |  CAST(s_q AS DOUBLE) / tot_sq AS w_temp,
             |  (CAST(s_q AS DOUBLE) / tot_sq) / (CAST(n_size AS DOUBLE) / tot_size) AS boost
             |FROM q, tot""".stripMargin)),

    QuerySpec(
      "q90_event_anomaly",
      """Daily event-rate anomaly sheet
        |([[graft.operators.Anomaly.dailySpikes]]): per-type daily
        |volumes vs the trailing 7 observed days, with a ×2^20
        |integer-quantized deviation ratio (one BIGINT floor division)
        |and a cross-multiplied 1.5×-baseline spike flag — all integer
        |arithmetic, bitwise-oracled. Incomplete baselines report −1
        |and never flag. Scale shape: one map-side-combined
        |(type, day) count over the raw log, then one window over the
        |post-aggregation frame (≤ days×types rows) — the window sort
        |never sees the log itself.""".stripMargin,
      (s, d) => graft.operators.Anomaly.dailySpikes(
        Tables.events(s, d), "event_type", "ts",
        baselineDays = 7, num = 3L, den = 2L),
      Some("""WITH daily AS (SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS n_events
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
             |w AS (SELECT event_type, day, n_events,
             |    CAST(count(*) OVER tr AS BIGINT) AS trail_days,
             |    CAST(coalesce(sum(n_events) OVER tr, 0) AS BIGINT) AS trail_sum
             |  FROM daily WINDOW tr AS (PARTITION BY event_type ORDER BY day
             |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, day, n_events, trail_days, trail_sum,
             |  CASE WHEN trail_days = 7
             |       THEN CAST((n_events * 7 * 1048576) // trail_sum AS BIGINT)
             |       ELSE CAST(-1 AS BIGINT) END AS ratio_q,
             |  CASE WHEN trail_days = 7 AND n_events * 14 > trail_sum * 3
             |       THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_spike
             |FROM w""".stripMargin)),

    QuerySpec(
      "q91_bigram_phrases",
      """Bigram collocation detection
        |([[graft.operators.Phrases.bigramLift]]) — the word2phrase
        |step: every adjacent token pair scored by lift over its
        |unigram independence rate, pairs clearing 2× flagged as
        |phrases to fuse before BPE training. All-BIGINT arithmetic:
        |`lift_q = ((pair_cnt−1)·2^20·N) div (cnt1·cnt2)` is one
        |integer floor division and the flag cross-multiplies — a
        |float PMI would need ln, which diverges across libm (the
        |q51/q84 precedent). Scale shape: pairs assemble MAP-SIDE
        |(slice+arrays_zip on the token array, no window over the
        |token stream — the q28 shingle lesson) and collapse in a
        |map-side-combined (w1, w2) count; unigram counts likewise
        |keyed on term with corpus total N via an unpartitioned
        |window over the vocab-sized frame (the q89 idiom); closing
        |joins are vocab-level, never corpus rows.""".stripMargin,
      (s, d) => graft.operators.Phrases.bigramLift(
        Tables.documents(s, d), "text", minCount = 3, discount = 1,
        num = 2L, den = 1L),
      Some("""WITH toks AS (SELECT string_split_regex(lower(text), '\s+') AS t
             |              FROM documents WHERE text IS NOT NULL),
             |pairs AS (SELECT t[i] AS w1, t[i+1] AS w2
             |          FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)),
             |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS pair_cnt
             |       FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3),
             |uni AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
             |          SELECT unnest(t) AS term FROM toks) GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM uni)
             |SELECT pc.w1, pc.w2, pair_cnt, u1.cnt AS cnt1, u2.cnt AS cnt2,
             |  ((pair_cnt - 1) * 1048576 * tot.n) // (u1.cnt * u2.cnt) AS lift_q,
             |  CAST(CASE WHEN (pair_cnt - 1) * tot.n > 2 * u1.cnt * u2.cnt
             |       THEN 1 ELSE 0 END AS BIGINT) AS is_phrase
             |FROM pc JOIN uni u1 ON pc.w1 = u1.term
             |        JOIN uni u2 ON pc.w2 = u2.term, tot""".stripMargin)),

    QuerySpec(
      "q92_vocab_drift",
      """Vocabulary drift between corpus slices
        |([[graft.operators.Drift.termDrift]]) — the crawl-monitoring
        |guard: per-term occurrence RATES compared between slice A
        |(even doc_id, standing corpus) and slice B (odd doc_id,
        |candidate snapshot), terms whose rate moved > 1.5× in either
        |direction flagged with a signed drift_dir. The rate ratio
        |quantizes as one BIGINT floor division
        |`(cnt_b·N_a·2^20) div (cnt_a·N_b)` and the tests
        |cross-multiply — all integer, bitwise-oracled (the q90
        |idiom). New terms (absent from A) report ratio −1 and flag
        |upward. Scale shape: ONE corpus scan — map-side token
        |explode into a single map-side-combined agg keyed on term
        |(conditional sums, not per-slice re-scans), slice totals via
        |an unpartitioned window over the vocab-sized frame; nothing
        |after the one exchange exceeds vocab rows.""".stripMargin,
      (s, d) => graft.operators.Drift.termDrift(
        Tables.documents(s, d), "text", col("doc_id") % 2 === 0,
        minTotal = 10L, num = 3L, den = 2L),
      Some("""WITH toks AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
             |              FROM documents WHERE text IS NOT NULL),
             |per AS (SELECT term,
             |    CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             |    CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
             |  FROM toks GROUP BY 1),
             |tot AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS na,
             |               CAST(sum(cnt_b) AS BIGINT) AS nb FROM per)
             |SELECT term, cnt_a, cnt_b,
             |  CASE WHEN cnt_a > 0 THEN (cnt_b * na * 1048576) // (cnt_a * nb)
             |       ELSE CAST(-1 AS BIGINT) END AS ratio_q,
             |  CAST(CASE WHEN cnt_b * na * 2 > cnt_a * nb * 3 THEN 1
             |            WHEN cnt_a * nb * 2 > cnt_b * na * 3 THEN -1
             |            ELSE 0 END AS BIGINT) AS drift_dir
             |FROM per, tot WHERE cnt_a + cnt_b >= 10""".stripMargin)),

    QuerySpec(
      "q93_vocab_growth",
      """Vocabulary growth curve (Heaps'-law sheet,
        |[[graft.operators.VocabGrowth.growthCurve]]) — the
        |tokenizer-sizing step: the corpus in doc-id order, cut into
        |10 equal-width id buckets, with per-bucket and cumulative
        |docs / tokens / distinct-vocabulary counts. First occurrence
        |is min(doc_id) per term — order-independent, unlike a
        |scan-order "first seen" — and every column is a BIGINT count
        |or the exact integer bucket `(id·10) div (max_id+1)`, so the
        |sheet oracles bitwise with no quantization at all. Scale
        |shape: three scans, each collapsing map-side before its one
        |exchange — a doc_id-only scan for the broadcast 1-row corpus
        |bound (the q80 idiom), a per-bucket volume scan, and the
        |first-occurrence scan (explode → min(doc_id) keyed on term);
        |the closing join and cumulative window run over the ≤10-row
        |bucket frame.""".stripMargin,
      (s, d) => graft.operators.VocabGrowth.growthCurve(
        Tables.documents(s, d), "text", buckets = 10),
      Some("""WITH mx AS (SELECT CAST(max(doc_id) AS BIGINT) AS max_id FROM documents),
             |d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
             |             string_split_regex(lower(text), '\s+') AS t
             |      FROM documents WHERE text IS NOT NULL),
             |vol AS (SELECT (doc_id * 10) // (max_id + 1) AS bucket,
             |               CAST(count(*) AS BIGINT) AS n_docs,
             |               CAST(sum(len(t)) AS BIGINT) AS n_tokens
             |        FROM d, mx GROUP BY 1),
             |fo AS (SELECT term, min(doc_id) AS first_id FROM (
             |         SELECT doc_id, unnest(t) AS term FROM d) GROUP BY 1),
             |nt AS (SELECT (first_id * 10) // (max_id + 1) AS bucket,
             |              CAST(count(*) AS BIGINT) AS new_terms
             |       FROM fo, mx GROUP BY 1)
             |SELECT bucket, n_docs, n_tokens, new_terms,
             |  CAST(sum(n_docs) OVER w AS BIGINT) AS docs_cum,
             |  CAST(sum(n_tokens) OVER w AS BIGINT) AS tokens_cum,
             |  CAST(sum(new_terms) OVER w AS BIGINT) AS vocab_cum
             |FROM (SELECT COALESCE(vol.bucket, nt.bucket) AS bucket,
             |        COALESCE(n_docs, 0) AS n_docs,
             |        COALESCE(n_tokens, 0) AS n_tokens,
             |        COALESCE(new_terms, 0) AS new_terms
             |      FROM vol FULL OUTER JOIN nt ON vol.bucket = nt.bucket)
             |WINDOW w AS (ORDER BY bucket
             |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin)),

    QuerySpec(
      "q94_embedding_audit",
      """Embedding-column health audit
        |([[graft.operators.EmbeddingAudit.healthSheet]]) — the
        |pre-index gate: per label, null vectors, ragged dimensions
        |(dim_min ≠ dim_max = model-version mix-up), all-zero vectors,
        |non-finite norms, and the squared-norm distribution
        |(min/max/mean) that drifts when a batch comes from a
        |different checkpoint. Norm² is `graft_dot(v,v)` — bitwise
        |equal to DuckDB's list_dot_product on DOUBLE[] (the q30
        |contract) — floor-quantized ×2^20 to BIGINT per ROW, so the
        |per-group sums and the one-floor-division mean are
        |order-independent and bitwise-oracled; non-finite norms are
        |excluded from the quantized stats and labels with no finite
        |vector report −1 (the q90 idiom). Scale shape: ONE scan, one
        |map-side-combined agg keyed on label; the dot product and
        |every predicate are codegen map work (no higher-order
        |functions); nothing after the single exchange exceeds group
        |rows.""".stripMargin,
      (s, d) => graft.operators.EmbeddingAudit.healthSheet(
        Tables.embeddings(s, d)),
      Some("""WITH v AS (SELECT CAST(label AS BIGINT) AS label,
             |    embedding IS NULL AS is_null,
             |    CAST(len(embedding) AS BIGINT) AS dim,
             |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
             |  FROM embeddings),
             |w AS (SELECT label, is_null, dim, n2,
             |    (isnan(n2) OR isinf(n2)) AS bad,
             |    CASE WHEN NOT (isnan(n2) OR isinf(n2))
             |         THEN CAST(floor(n2 * 1048576) AS BIGINT) END AS n2_q
             |  FROM v)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             |  min(dim) AS dim_min, max(dim) AS dim_max,
             |  CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
             |  CAST(sum(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
             |  COALESCE(min(n2_q), -1) AS norm_min_q,
             |  COALESCE(max(n2_q), -1) AS norm_max_q,
             |  CASE WHEN count(n2_q) > 0
             |       THEN CAST(sum(n2_q) AS BIGINT) // count(n2_q)
             |       ELSE CAST(-1 AS BIGINT) END AS norm_mean_q
             |FROM w GROUP BY 1""".stripMargin)),

    QuerySpec(
      "q95_source_overlap",
      """Cross-source near-duplicate overlap matrix
        |([[graft.operators.SourceOverlap.overlapMatrix]]) — the
        |provenance view of dedup: verified near-dup pairs (the q28
        |MinHash→LSH→Jaccard pipeline, bitwise-oracled end-to-end)
        |rolled up to canonical (src_a ≤ src_b) source cells; the
        |diagonal is within-source duplication, hot off-diagonal cells
        |mark syndication/mirrors and decide which acquisition to
        |deprecate. Adds only two doc_id-keyed joins against the thin
        |(doc_id, source) projection and a BIGINT count onto the
        |≤|sources|² key — oracles bitwise by construction on top of
        |q28's relation. Scale shape: candidate generation stays
        |banded/bucketed; the collision-bounded pair relation
        |broadcasts against the pruned two-column scan.""".stripMargin,
      (s, d) => graft.operators.SourceOverlap.overlapMatrix(
        Tables.documents(s, d)),
      Some(s"""WITH p AS (
             |${MinhashOracle.sql(16, 4, 0.8)}
             |), s AS (SELECT doc_id, source FROM documents)
             |SELECT least(a.source, b.source) AS src_a,
             |       greatest(a.source, b.source) AS src_b,
             |       CAST(count(*) AS BIGINT) AS n_pairs
             |FROM p JOIN s a ON p.a_id = a.doc_id
             |       JOIN s b ON p.b_id = b.doc_id
             |GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "q96_source_curation",
      """Per-source curation dashboard
        |([[graft.streaming.Curation.sourceAudit]]) — q81's audit
        |relation rolled up to (source, reason) cells with doc counts
        |and token mass: "which acquisition is failing which rule" at
        |a glance. Token mass sums greatest(n_tokens, 0) so the −1
        |null-text sentinel never deflates a cell; every column is a
        |BIGINT count on top of q81's already-oracled relation, so the
        |sheet oracles bitwise. Like q81 the corpus first UNIONs in
        |deterministic copies of every 50th doc so the 'duplicate'
        |cell observably fires. Scale shape: map-side rules, one md5
        |hash shuffle + co-partitioned join back (the audited q81
        |plan), then ONE map-side-combined count onto the
        |≤|sources|×5 key.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("text"), col("source"))
        val echoes = docs.filter(col("doc_id") % 50 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("lang"),
            col("text"), col("source"))
        graft.streaming.Curation.sourceAudit(docs.union(echoes))
      },
      Some(s"""WITH u AS (
             |  SELECT doc_id, lang, text, source FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, lang, text, source FROM documents WHERE doc_id % 50 = 0),
             |t AS (SELECT doc_id, source, md5(lower(text)) AS h,
             |  coalesce(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), -1) AS n_tokens,
             |  CASE WHEN coalesce(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), -1) < 20 THEN 'too_short'
             |       WHEN lang <> 'en' THEN 'non_english'
             |       WHEN 100 * coalesce(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
             |              x -> x IN ($StopList))) AS BIGINT), 0)
             |            < 2 * CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) THEN 'low_stopword'
             |       ELSE 'kept' END AS qr
             |  FROM u),
             |k AS (SELECT h, min(doc_id) AS keeper_id FROM t WHERE qr = 'kept' GROUP BY h)
             |SELECT source, reason, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(greatest(n_tokens, 0)) AS BIGINT) AS n_tokens
             |FROM (SELECT source,
             |        CASE WHEN qr <> 'kept' THEN qr
             |             WHEN doc_id <> keeper_id THEN 'duplicate'
             |             ELSE 'kept' END AS reason, n_tokens
             |      FROM t LEFT JOIN k USING (h))
             |GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "q97_doc_novelty",
      """Per-document novelty score
        |([[graft.operators.Novelty.noveltyScores]]) — the
        |dedup-priority / curriculum signal: the fraction of a doc's
        |DISTINCT 3-token shingles appearing nowhere else in the
        |corpus; near-0 marks boilerplate assembled from corpus-common
        |phrases even when no pairwise near-dup fires. BIGINT counts,
        |one integer floor division for novelty_q, cross-multiplied
        |majority flag — bitwise-oracled (the q90 idiom), reusing the
        |q28 shingle CTE shape. Scale shape: NO corpus-wide (doc_id,
        |shingle) distinct — shingles dedup DOC-LOCALLY map-side
        |(array_distinct over codegen graft_ngrams, before the
        |explode), after which a plain count keyed on shingle IS
        |document frequency; one map-side-combined sh agg, one
        |co-partitioned join back over the materialized shingle frame,
        |one doc-keyed count.""".stripMargin,
      (s, d) => graft.operators.Novelty.noveltyScores(
        Tables.documents(s, d)),
      Some("""WITH docs AS (SELECT doc_id, string_split_regex(lower(text), '\s+') toks
             |             FROM documents WHERE text IS NOT NULL),
             |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)),
             |    i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2])))) sh FROM docs),
             |dfq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh,
             |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
             |  (CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1048576) // count(*) AS novelty_q,
             |  CAST(CASE WHEN 2 * sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) > count(*)
             |       THEN 1 ELSE 0 END AS BIGINT) AS is_novel
             |FROM sh JOIN dfq USING (sh) GROUP BY doc_id""".stripMargin)),

    QuerySpec(
      "q98_sampling_allocation",
      """Integer sample-budget allocation
        |([[graft.operators.Mixing.sqrtAllocation]]) — the step after
        |q89: per-source α=1/2 shares turned into whole-document
        |quotas summing EXACTLY to a 100k budget by the
        |largest-remainder (Hamilton) method on the quantized integer
        |weights. base = (budget·s_q) div S floors each quota; the
        |leftover seats go to the largest BIGINT remainders, ties by
        |source name — every step integer, bitwise-oracled (no float
        |share is ever allocated). Scale shape: q89's audited plan
        |(one map-side-combined corpus agg + unpartitioned window over
        |the per-source frame) plus rank/total windows over the SAME
        |tiny frame.""".stripMargin,
      (s, d) => graft.operators.Mixing.sqrtAllocation(
        Tables.documents(s, d).select(col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "source", "n_tokens", budget = 100000L),
      Some("""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(len(string_split_regex(coalesce(text, ''), '\s+'))) AS BIGINT) AS n_size
             |  FROM documents GROUP BY 1),
             |q AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
             |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
             |b AS (SELECT source, n_items, n_size, s_q,
             |    (100000 * s_q) // s AS base,
             |    100000 * s_q - ((100000 * s_q) // s) * s AS rem
             |  FROM q, tot),
             |l AS (SELECT CAST(100000 - sum(base) AS BIGINT) AS leftover FROM b),
             |r AS (SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) AS rk FROM b)
             |SELECT source, n_items, n_size, s_q, base,
             |  base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc
             |FROM r, l""".stripMargin)),

    QuerySpec(
      "q99_shard_manifest",
      """Training-shard manifest
        |([[graft.operators.SequencePack.shardManifest]]) — q65's pack
        |assignments grouped 16 packs per shard into the writer's work
        |order: per shard, the doc count, token mass, widest document
        |span, and the boundary-crossing docs a writer must split or
        |shift. A doc belongs to the shard where it STARTS, so the
        |manifest partitions the corpus; all BIGINT counts over q65's
        |exact integer relation — bitwise-oracled by construction.
        |Scale shape: q65's audited two-level prefix-sum plan plus ONE
        |map-side-combined count onto the small shard key.""".stripMargin,
      (s, d) => graft.operators.SequencePack.shardManifest(
        Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens")),
        "doc_id", "n_tokens", capacity = ManifestCapacity,
        packsPerShard = ManifestPacksPerShard),
      Some(s"""WITH t AS (SELECT doc_id,
             |  CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id IS NOT NULL),
             |c AS (SELECT doc_id, n_tokens,
             |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM t),
             |p AS (SELECT doc_id, n_tokens,
             |  cb // $ManifestCapacity AS pack_first,
             |  (cb + greatest(n_tokens, 1) - 1) // $ManifestCapacity AS pack_last
             |  FROM c)
             |SELECT pack_first // $ManifestPacksPerShard AS shard,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |  CAST(max(pack_last - pack_first + 1) AS BIGINT) AS max_span,
             |  CAST(sum(CASE WHEN pack_last // $ManifestPacksPerShard <> pack_first // $ManifestPacksPerShard THEN 1 ELSE 0 END) AS BIGINT)
             |    AS boundary_crossers
             |FROM p GROUP BY 1""".stripMargin)),

    QuerySpec(
      "q100_corpus_datasheet",
      """Corpus datasheet capstone
        |([[graft.operators.Datasheet.summarize]]) — the one-page
        |"datasheet for datasets" a release ships with: volume,
        |vocabulary, provenance spread, exact duplication, curation
        |yield (q81 rules + dedup), and the exact median document
        |length (the q60 decimal-exact rank pick), as one long-format
        |(metric, value) sheet. Every value is a BIGINT count or a
        |rank-picked integer — no ratios, no floats — so the capstone
        |oracles bitwise. Scale shape: four corpus passes, one per
        |grain — scalar sheet (ONE scan; the three distincts share it
        |via Expand), vocabulary two-stage distinct, the q60 quantile
        |kernel, q81's audited curation plan — each collapsing
        |map-side; the closing union is nine 1-row frames.""".stripMargin,
      (s, d) => graft.operators.Datasheet.summarize(
        Tables.documents(s, d)),
      Some(s"""WITH scalars AS (SELECT
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(count(text) AS BIGINT) AS n_text_docs,
             |    CAST(sum(coalesce(len(string_split_regex(text, '\\s+')), 0)) AS BIGINT) AS n_tokens,
             |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             |    CAST(count(DISTINCT md5(lower(text))) AS BIGINT) AS n_distinct_content
             |  FROM documents),
             |vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM (
             |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS term
             |    FROM documents WHERE text IS NOT NULL)),
             |med AS (SELECT CAST(percentile_disc(0.5) WITHIN GROUP (
             |    ORDER BY len(string_split_regex(text, '\\s+'))) AS BIGINT) AS m
             |  FROM documents WHERE text IS NOT NULL),
             |t AS (SELECT doc_id, md5(lower(text)) AS h,
             |  coalesce(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), -1) AS n_tok,
             |  CASE WHEN coalesce(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT), -1) < 20 THEN 'too_short'
             |       WHEN lang <> 'en' THEN 'non_english'
             |       WHEN 100 * coalesce(CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
             |              x -> x IN ($StopList))) AS BIGINT), 0)
             |            < 2 * CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) THEN 'low_stopword'
             |       ELSE 'kept' END AS qr
             |  FROM documents),
             |k AS (SELECT h, min(doc_id) AS keeper_id FROM t WHERE qr = 'kept' GROUP BY h),
             |kept AS (SELECT CAST(sum(CASE WHEN qr = 'kept' AND doc_id = keeper_id
             |    THEN 1 ELSE 0 END) AS BIGINT) AS kc
             |  FROM t LEFT JOIN k USING (h))
             |SELECT 'n_docs' AS metric, n_docs AS value FROM scalars
             |UNION ALL SELECT 'n_text_docs', n_text_docs FROM scalars
             |UNION ALL SELECT 'n_tokens', n_tokens FROM scalars
             |UNION ALL SELECT 'n_langs', n_langs FROM scalars
             |UNION ALL SELECT 'n_sources', n_sources FROM scalars
             |UNION ALL SELECT 'n_exact_dup_docs', n_text_docs - n_distinct_content FROM scalars
             |UNION ALL SELECT 'n_distinct_terms', v FROM vocab
             |UNION ALL SELECT 'p50_doc_tokens', m FROM med
             |UNION ALL SELECT 'curation_kept_docs', kc FROM kept""".stripMargin)),

    QuerySpec(
      "q101_allocation_sample",
      """Allocation execution
        |([[graft.operators.Mixing.executeSqrtAllocation]]) — the step
        |after q98: the per-source Hamilton quotas materialized as a
        |concrete keep-set, exactly min(alloc, n) docs per source
        |chosen by md5-hash order of doc_id (the capPerGroup ordering),
        |so the sampled corpus is a pure function of the data — same
        |rows on any engine, run, or partitioning. Budget 137 over 20
        |sources forces base=6 quotas plus 17 largest-remainder seats,
        |exercising the tie-break path. Scale shape: q98's audited
        |quota plan over a 2-column pruned scan, the tiny quota frame
        |broadcast back, ONE group-key shuffle for the BIGINT ranking
        |window.""".stripMargin,
      (s, d) => graft.operators.Mixing.executeSqrtAllocation(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 137L),
      Some("""WITH pop AS (SELECT doc_id, source,
             |    CAST(len(string_split_regex(coalesce(text, ''), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id IS NOT NULL),
             |per AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n_size
             |  FROM pop GROUP BY 1),
             |q AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
             |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
             |b AS (SELECT source, s_q, (137 * s_q) // s AS base,
             |    137 * s_q - ((137 * s_q) // s) * s AS rem FROM q, tot),
             |l AS (SELECT CAST(137 - sum(base) AS BIGINT) AS leftover FROM b),
             |a AS (SELECT source, base + CASE WHEN
             |      CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) <= leftover
             |    THEN 1 ELSE 0 END AS alloc FROM b, l),
             |ranked AS (SELECT doc_id, source, n_tokens,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS rk
             |  FROM pop)
             |SELECT doc_id, source, n_tokens
             |FROM ranked JOIN a USING (source) WHERE rk <= alloc""".stripMargin)),

    QuerySpec(
      "q102_allocation_epochs",
      """Allocation with repetition
        |([[graft.operators.Mixing.allocationEpochs]]) — the
        |with-replacement closing of the mixing loop: every source
        |emits EXACTLY alloc rows as (doc, epoch) appearances, base
        |alloc div n epochs per doc plus the alloc mod n leftovers to
        |the md5-rank prefix, so no two docs of a source differ by
        |more than one repeat. Budget 1200 over 500 docs forces the
        |upsampling path (sources seen ~2.4 epochs); at budget <
        |corpus the same operator degenerates to q101's keep-set at
        |epoch 0. All-BIGINT on a total md5 order — bitwise-oracled.
        |Scale shape: q101's audited plan plus a narrow
        |sequence+explode; emitted rows bounded by the budget, not the
        |corpus.""".stripMargin,
      (s, d) => graft.operators.Mixing.allocationEpochs(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 1200L),
      Some("""WITH pop AS (SELECT doc_id, source,
             |    CAST(len(string_split_regex(coalesce(text, ''), '\s+')) AS BIGINT) AS n_tokens
             |  FROM documents WHERE doc_id IS NOT NULL),
             |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(n_tokens) AS BIGINT) AS n_size
             |  FROM pop GROUP BY 1),
             |q AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
             |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
             |b AS (SELECT source, n_items, s_q, (1200 * s_q) // s AS base,
             |    1200 * s_q - ((1200 * s_q) // s) * s AS rem FROM q, tot),
             |l AS (SELECT CAST(1200 - sum(base) AS BIGINT) AS leftover FROM b),
             |a AS (SELECT source, n_items, base + CASE WHEN
             |      CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) <= leftover
             |    THEN 1 ELSE 0 END AS alloc FROM b, l),
             |ranked AS (SELECT doc_id, source, n_tokens,
             |    CAST(row_number() OVER (PARTITION BY source
             |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS rk
             |  FROM pop),
             |rep AS (SELECT doc_id, source, n_tokens,
             |    alloc // n_items + CASE WHEN rk <= alloc % n_items THEN 1 ELSE 0 END AS reps
             |  FROM ranked JOIN a USING (source))
             |SELECT doc_id, source, n_tokens, CAST(unnest(range(reps)) AS BIGINT) AS epoch
             |FROM rep WHERE reps > 0""".stripMargin)),

    QuerySpec(
      "q103_snapshot_diff",
      """Corpus snapshot diff
        |([[graft.operators.SnapshotDiff.summarize]]) — the release
        |delta a reviewer signs off on: per (source, status) doc counts
        |and token mass with status added / removed / modified /
        |unchanged, membership by key presence and modification by
        |md5(coalesce(text,'')) equality. Snapshots are simulated
        |deterministically from one table: the old cut lacks doc_id %
        |10 = 0 (those are the release's additions) and carries a
        |' v1' draft suffix on doc_id % 7 = 0 (re-crawled in the new
        |cut); the new cut lacks doc_id % 11 = 0 (takedowns). NULL
        |text stays NULL through concat on both engines, so a
        |null-in-both doc lands unchanged. All BIGINT counts over
        |engine-independent hashes — bitwise-oracled. Scale shape: two
        |map-side-thinned (key, source, hash, tokens) frames — the
        |wide text column never shuffles — one key shuffle per side
        |for the full-outer sort-merge join, map-side-combined agg
        |onto the tiny (source, status) key.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val old = docs.filter(col("doc_id") % 10 =!= 0)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v1"))).otherwise(col("text")))
        val nw = docs.filter(col("doc_id") % 11 =!= 0)
        graft.operators.SnapshotDiff.summarize(old, nw, "doc_id", "text")
      },
      Some("""WITH o AS (SELECT doc_id, source,
             |    CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
             |  FROM documents WHERE doc_id % 10 <> 0 AND doc_id IS NOT NULL),
             |n AS (SELECT doc_id, source, text
             |  FROM documents WHERE doc_id % 11 <> 0 AND doc_id IS NOT NULL),
             |oo AS (SELECT doc_id, source, md5(coalesce(text, '')) AS h,
             |    CAST(len(string_split_regex(coalesce(text, ''), '\s+')) AS BIGINT) AS t,
             |    1 AS f FROM o),
             |nn AS (SELECT doc_id, source, md5(coalesce(text, '')) AS h,
             |    CAST(len(string_split_regex(coalesce(text, ''), '\s+')) AS BIGINT) AS t,
             |    1 AS f FROM n),
             |j AS (SELECT coalesce(nn.source, oo.source) AS source,
             |    CASE WHEN oo.f IS NULL THEN 'added'
             |         WHEN nn.f IS NULL THEN 'removed'
             |         WHEN oo.h = nn.h THEN 'unchanged'
             |         ELSE 'modified' END AS status,
             |    coalesce(oo.t, 0) AS t_o, coalesce(nn.t, 0) AS t_n
             |  FROM oo FULL OUTER JOIN nn USING (doc_id))
             |SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(t_o) AS BIGINT) AS tokens_old,
             |  CAST(sum(t_n) AS BIGINT) AS tokens_new,
             |  CAST(sum(t_n) - sum(t_o) AS BIGINT) AS token_delta
             |FROM j GROUP BY 1, 2""".stripMargin)),

    QuerySpec(
      "q104_cluster_safe_split",
      """Leakage-safe train/eval split
        |([[graft.operators.Sampling.clusterSafeSplit]]) — THE
        |md5-bucket split (q55) keyed on the near-dup CLUSTER id
        |instead of the doc's own id, so a near-duplicate family never
        |straddles the split: bucketing doc ids directly puts a test
        |doc's near-twin in train with probability ≈ the train
        |fraction, exactly the contamination q66 then has to detect
        |after the fact. Composes the shared components frame (q58's
        |minhash ∪ simhash pair graph, one star iteration) with the
        |q55 bucket arithmetic over the canonical id; singletons key
        |by their own id, so with no pairs this IS q55's split. The
        |oracle chains the q58 recursive-CTE closure with the q55
        |bucket CTE — both engine-exact, so the composition oracles
        |bitwise. Scale shape: the components frame is pair-graph
        |bounded and the corpus side is thinned to the bare id before
        |the label join (~8 bytes/doc — q58's audited labeling shape;
        |broadcast when the frame's checkpoint stats are known small);
        |bucket and split are per-row projections.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.unionNearDupPairs(docs, maxHamming = 5)
        graft.operators.Sampling.clusterSafeSplit(docs, "doc_id",
          graft.operators.ConnectedComponents.components(pairs), evalPermille = 100)
      },
      Some(ClusterOracle.splitSql(evalPermille = 100))),

    QuerySpec(
      "q105_incremental_clusters",
      """Incremental cluster maintenance
        |([[graft.operators.ConnectedComponents.componentsFromIncrement]])
        |— the clustering twin of q68's incremental dedup, closing the
        |incremental family (dedup candidates q68, ANN cells q82,
        |cluster labels here): fold today's batch (the q55 10%
        |md5-bucket split) into the STANDING corpus components without
        |re-running the historical pair graph. The standing frame is
        |components over the corpus side's minhash pairs; the
        |increment is q68's new×corpus kernel plus the batch's own
        |self-pairs; the star iteration then runs over
        |labels-as-edges ∪ increment — pair-graph NODE count + batch
        |rows, never the historical edge multiset, and none of the
        |corpus-side shingle/signature/verify work repeats. Labels are
        |the old graph's closure skeleton and LSH candidacy is
        |per-pair (a pair's bands depend only on its two docs), so the
        |oracle is the MONOLITHIC full-corpus minhash closure — the
        |incremental path must reproduce it bitwise, including batch
        |pairs that merge standing clusters. Scale shape: the
        |convergence bill is O(1) rounds on a star-forest prior
        |(lastRounds-probed in spec) vs O(log² n) for a rebuild; the
        |closing label join is q58's audited ~8 bytes/doc shape.""".stripMargin,
      (s, d) => {
        val cc = graft.operators.ConnectedComponents
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val flagged = graft.operators.Sampling.withSplitBucket(docs, "doc_id")
          .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
        val standing = cc.components(
          Dedup.nearDupPairs(flagged.filter(!col("is_new")).select("doc_id", "text"))
            .select("a_id", "b_id"))
        val increment = Dedup.crossNearDupPairs(flagged, "is_new")
          .select(col("new_id").as("a_id"), col("corpus_id").as("b_id"))
          .unionByName(Dedup.nearDupPairs(flagged.filter(col("is_new")).select("doc_id", "text"))
            .select("a_id", "b_id"))
        cc.clusterLabelsFromComponents(Tables.documents(s, d), "doc_id",
          cc.componentsFromIncrement(standing, increment))
      },
      Some(ClusterOracle.incrementalClustersSql)),

    QuerySpec(
      "q106_bpe_pair_stats",
      """BPE pair statistics ([[graft.operators.Phrases.bpePairStats]])
        |— the distributed step of byte-pair-encoding tokenizer
        |training: frequency-weighted counts of every adjacent symbol
        |pair inside words, whose argmax is the merge BPE performs
        |each iteration. Top-50 by (pair_count DESC, c1, c2) — total
        |order since (c1, c2) is the group key, so the LIMIT cut is
        |engine-independent; counts are BIGINT sums of exact word
        |frequencies, so the sheet oracles bitwise. The boundary is
        |deliberate: BPE is corpus-scale exactly once (the word-freq
        |agg); merge iterations rewrite the vocab-sized symbol table —
        |single-node by construction in sentencepiece and the HF
        |trainers alike — so the engine ships the corpus collapse and
        |the pair table it implies. Scale shape: ONE corpus scan
        |collapsing map-side onto vocab keys; the char-pair explode
        |and pair agg run entirely on the vocab-sized frame; the
        |closing top-k is TakeOrdered over a ≤ |alphabet|² sheet —
        |corpus rows never move after the first combine.""".stripMargin,
      (s, d) => graft.operators.Phrases.bpePairStats(
        Tables.documents(s, d), "text", k = 50),
      Some("""WITH toks AS (SELECT string_split_regex(lower(text), '\s+') AS t
             |              FROM documents WHERE text IS NOT NULL),
             |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
             |         SELECT unnest(t) AS w FROM toks)
             |       WHERE length(w) >= 2
             |         AND NOT regexp_matches(w, '[\x01-\x08]') GROUP BY w),
             |pr AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS c1,
             |              substr(w, CAST(i AS INTEGER) + 1, 1) AS c2, cnt
             |       FROM (SELECT w, cnt, unnest(range(1, length(w))) AS i FROM wc))
             |SELECT c1, c2, CAST(sum(cnt) AS BIGINT) AS pair_count
             |FROM pr GROUP BY c1, c2
             |ORDER BY pair_count DESC, c1, c2 LIMIT 50""".stripMargin)),

    {
      val digits = (0 until 12).map { j =>
        s"(strpos('0123456789abcdef', substr(hh, ${j + 1}, 1)) - 1) * ${1L << (4 * (11 - j))}"
      }.mkString("\n             |    + ")
      QuerySpec(
        "q107_span_scrub",
        """Span scrubbing ([[graft.operators.Dedup.scrubRepeatedSpans]])
          |— the TRANSFORM closing q83's detect step: every token
          |covered by a cross-document repeated 16-token window (key in
          |≥ 2 distinct docs, the q83 criterion at the same width 16 /
          |stride 4) is removed and the survivors reassemble in order —
          |the boilerplate cure a pipeline ships, not just the count.
          |Overlapping windows merge (a token is removed once);
          |clean_text is the whitespace-normalized kept-token stream,
          |total on null text (''). Exact token surgery over
          |engine-identical md5 span keys, so the oracle replays it
          |bitwise with the same CTE chain as q83 plus a coverage
          |expansion. Scale shape: ONE materialized window frame feeds
          |both the repeated-key set and the coverage frame (the q83
          |reuse rule); coverage collapses to per-afflicted-doc sorted
          |int arrays, materialized so its true size drives a broadcast
          |of the closing enrichment join — the corpus text column
          |never shuffles; token filtering/reassembly is per-row array
          |work.""".stripMargin,
        (s, d) => Dedup.scrubRepeatedSpans(Tables.documents(s, d), width = 16, stride = 4),
        Some(s"""WITH tk AS (SELECT doc_id, coalesce(string_split_regex(text, '\\s+'), []) AS t FROM documents),
             |w AS (SELECT doc_id, unnest(range(1, greatest(len(t) - 15, 1) + 1, 4)) AS start, t FROM tk),
             |f AS (SELECT doc_id, start, t FROM w WHERE start + 15 <= len(t)),
             |h AS (SELECT doc_id, start, md5(array_to_string(t[start : start + 15], ' ')) AS hh FROM f),
             |k AS (SELECT doc_id, start, $digits AS k FROM h),
             |rep AS (SELECT k FROM (SELECT DISTINCT doc_id, k FROM k) GROUP BY k HAVING count(*) >= 2),
             |cov AS (SELECT doc_id,
             |          list_sort(list_distinct(flatten(list(range(start, start + 16))))) AS covered
             |        FROM (SELECT DISTINCT k.doc_id, k.start FROM k JOIN rep USING (k))
             |        GROUP BY doc_id)
             |SELECT tk.doc_id,
             |  coalesce(array_to_string(list_transform(list_filter(range(1, len(t) + 1),
             |    i -> NOT list_contains(coalesce(c.covered, []), i)), i -> t[i]), ' '), '') AS clean_text,
             |  CAST(len(t) AS BIGINT) AS n_tokens,
             |  CAST(len(coalesce(c.covered, [])) AS BIGINT) AS n_removed
             |FROM tk LEFT JOIN cov c USING (doc_id)""".stripMargin))
    },

    QuerySpec(
      "q108_release_bundle",
      """Release-bundle capstone — the engine's END STATE: one queryable
        |release table giving every document's disposition in a shipped
        |training release, composed from the shipped operators over ONE
        |shared shingle/pair/components frame (the reference's own end
        |state is a queryable curated table, 01-setup-ec-vm.md:309).
        |Chain: near-dup components over the minhash∪simhash pair graph
        |(q58; the star iteration runs ONCE — spec-asserted via
        |componentsRuns) → canonical keep-set as a per-doc flag (q59's
        |drop criterion, node ≠ cluster min) → cluster-safe train/eval
        |split keyed on the cluster id (q104, the SAME components
        |frame) → sqrt-allocation sample of the kept train side, budget
        |250 (q101's Hamilton quotas + md5-rank execution) → prefix-sum
        |shard assignment of the sampled docs at capacity 2048 / 16
        |packs per shard (q99's two-level pack kernel). Output: one row
        |per doc — (doc_id, source, n_tokens, cluster_id, status ∈
        |dropped_dup|eval|sampled|train_unsampled, shard — NULL unless
        |sampled). Every stage is BIGINT/md5-deterministic, so the
        |whole bundle oracles bitwise via the standalone oracles' CTEs
        |chained verbatim. Scale shape: the pair pipeline and star
        |iteration are the audited banded plans, paid once; the wide
        |text column is read and tokenized ONCE into a materialized
        |~24-byte/doc (doc_id, source, n_tokens) projection that every
        |downstream consumer (disposition join, split, allocation
        |population) re-reads instead of re-scanning the corpus's
        |heaviest column; the disposition is then one broadcastable
        |label join (comps is pair-graph-node bounded) + per-row
        |bucket arithmetic; allocation windows run on the train side
        |with ONE group-key shuffle; the pack prefix-sum serializes
        |only the budget-bounded sampled frame (materialized —
        |≤ budget rows by construction, so its window is trivially
        |single-partition safe).""".stripMargin,
      (s, d) => {
        val cc = graft.operators.ConnectedComponents
        val docs = Tables.documents(s, d)
        // ONE shingle pass feeds the minhash pipeline; ONE components
        // frame feeds the keep flag AND the cluster-keyed split — the
        // q71 shared-frame rule. Shingle checkpoint and simhash arm
        // are independent eager chains: built concurrently (§2.6).
        val Seq(shingles, simPairs) =
          graft.operators.Par.run[org.apache.spark.sql.DataFrame](
            () => Dedup.materialize(Dedup.shingleRows(docs)),
            () => Dedup.simhashNearDupPairs(docs, maxHamming = 5)
              .select("a_id", "b_id"))
        val pairs = Dedup.nearDupPairsFromShingles(shingles)
          .select("a_id", "b_id").union(simPairs)
        val comps = cc.components(pairs)
        // base is consumed by the disposition join, the split, and the
        // allocation population — materialized so the WIDE text column
        // is read and tokenized ONCE and every consumer re-reads the
        // ~24-byte/doc narrow projection instead of re-scanning the
        // corpus's heaviest column per consumer.
        val base = Dedup.materialize(docs.filter(col("doc_id").isNotNull)
          .select(col("doc_id"), col("source"),
            TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")))
        val status = base
          .join(graft.operators.Sampling.clusterSafeSplit(base, "doc_id", comps,
            evalPermille = 100), Seq("doc_id"))
          .withColumn("is_kept", col("cluster_id") === col("doc_id"))
        val sampled = Dedup.materialize(graft.operators.Mixing.executeSqrtAllocation(
          status.filter(col("is_kept") && col("split") === "train")
            .select(col("doc_id"), col("source"), col("n_tokens")),
          "doc_id", "source", "n_tokens", budget = 250L))
        val shards = graft.operators.SequencePack
          .packAssignments(sampled, "doc_id", "n_tokens", capacity = 2048L)
          .select(col("doc_id"), expr(s"pack_first div $ReleasePacksPerShard").as("shard"))
        status.join(shards, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("source"), col("n_tokens"), col("cluster_id"),
            when(!col("is_kept"), lit("dropped_dup"))
              .when(col("split") === "eval", lit("eval"))
              .when(col("shard").isNotNull, lit("sampled"))
              .otherwise(lit("train_unsampled")).as("status"),
            col("shard"))
      },
      Some(ClusterOracle.releaseBundleSql(evalPermille = 100, budget = 250L,
        capacity = 2048L, packsPerShard = ReleasePacksPerShard))),

    QuerySpec(
      "q109_bpe_merge_delta",
      """BPE merge-step delta ([[graft.operators.Phrases.bpeMergeDelta]])
        |— the incremental-family twin of q106, closing the tokenizer
        |loop the way q105 closes clustering: perform the ONE merge BPE
        |does next (fuse the q106-argmax pair under the same total
        |order) and produce the post-merge pair sheet by DELTA — only
        |words containing the fused pair are re-paired (old pairs
        |subtracted, rewritten-word pairs added onto the standing
        |sheet), never the whole vocabulary. The rewrite is greedy
        |left-to-right non-overlapping replacement — exactly BPE's
        |merge scan — via a one-char marker mapped back to the fused
        |symbol in the output. The oracle is the MONOLITHIC recount
        |(re-pair every word of the merged symbolization from scratch),
        |so the hash match IS the incremental == monolithic equivalence
        |proof, q105's pattern. Top-50 by (pair_count DESC, c1, c2) —
        |total order, engine-independent cut. Scale shape: ONE
        |map-side-combined corpus collapse (standing state in a real
        |trainer); P0, the affected subset, the rewrite, and the delta
        |are vocab-sized or smaller; the argmax is a one-row collect
        |off the materialized sheet (the boundary every BPE trainer
        |crosses per merge); closing joins are ≤ |alphabet|²-keyed —
        |corpus rows never move after the first combine.""".stripMargin,
      (s, d) => graft.operators.Phrases.bpeMergeDelta(
        Tables.documents(s, d), "text", k = 50),
      Some("""WITH toks AS (SELECT string_split_regex(lower(text), '\s+') AS t
             |              FROM documents WHERE text IS NOT NULL),
             |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
             |         SELECT unnest(t) AS w FROM toks)
             |       WHERE length(w) >= 2
             |         AND NOT regexp_matches(w, '[\x01-\x08]') GROUP BY w),
             |p0 AS (SELECT substr(w, CAST(i AS INTEGER), 1) AS c1,
             |              substr(w, CAST(i AS INTEGER) + 1, 1) AS c2,
             |              CAST(sum(cnt) AS BIGINT) AS pair_count
             |       FROM (SELECT w, cnt, unnest(range(1, length(w))) AS i FROM wc)
             |       GROUP BY 1, 2),
             |top AS (SELECT c1 AS ta, c2 AS tb FROM p0
             |        ORDER BY pair_count DESC, c1, c2 LIMIT 1),
             |mw AS (SELECT replace(w, ta || tb, chr(1)) AS m, cnt, ta, tb FROM wc, top),
             |np AS (SELECT CASE WHEN substr(m, CAST(i AS INTEGER), 1) = chr(1)
             |                   THEN ta || tb ELSE substr(m, CAST(i AS INTEGER), 1) END AS c1,
             |              CASE WHEN substr(m, CAST(i AS INTEGER) + 1, 1) = chr(1)
             |                   THEN ta || tb ELSE substr(m, CAST(i AS INTEGER) + 1, 1) END AS c2,
             |              cnt
             |       FROM (SELECT m, cnt, ta, tb, unnest(range(1, length(m))) AS i FROM mw
             |             WHERE length(m) >= 2))
             |SELECT c1, c2, CAST(sum(cnt) AS BIGINT) AS pair_count
             |FROM np GROUP BY c1, c2
             |ORDER BY pair_count DESC, c1, c2 LIMIT 50""".stripMargin)),

    QuerySpec(
      "q110_bpe_encode",
      """BPE apply/encode ([[graft.operators.Phrases.bpeEncode]]) — the
        |missing third of the tokenizer family, closing train (q106) →
        |incremental update (q109) → APPLY: learn 8 merges by replaying
        |the merge step (each iteration fuses the current argmax pair
        |under the q106 total order, tie-broken on the EXPANDED symbol
        |strings) and encode every document with the learned table.
        |Output per doc: (doc_id, n_words, n_chars, n_bpe_tokens) — the
        |before/after symbol counts a tokenizer-budget planner consumes.
        |All-BIGINT, so the sheet oracles bitwise; the oracle is the
        |bounded-merge-count replay (one generated CTE block per merge —
        |[[BpeOracle.encodeSql]]), so the hash match proves the whole
        |train+apply chain, not just the final counts. Marker contract
        |enforced on both engines (words containing U+0001–U+0008 are
        |excluded from vocab and token stream alike). Scale shape:
        |corpus scanned exactly TWICE (vocab collapse + encode pass,
        |both map-side combined / vocab-joined); each merge iteration
        |is vocab-local with a one-row argmax collect — the boundary
        |every BPE trainer crosses per merge.""".stripMargin,
      (s, d) => graft.operators.Phrases.bpeEncode(
        Tables.documents(s, d), "text", numMerges = 8),
      Some(BpeOracle.encodeSql(numMerges = 8))),

    QuerySpec(
      "q111_paragraph_neardup",
      """Paragraph-granularity near-dup pairs
        |([[graft.operators.Dedup.paragraphNearDupPairs]], RefinedWeb-
        |style): the banded MinHash kernel applied to sub-document
        |units — fixed 24-token blocks here, the segmentation fallback
        |for the driver's newline-free synthetic corpus
        |([[graft.operators.Dedup.blankLineParagraphs]] is the
        |real-corpus unit) — catching templated paragraphs that
        |whole-doc Jaccard (q28) dilutes: one shared paragraph in a
        |5-paragraph doc scores ~0.2 whole-doc, 1.0 here. Cross-doc
        |pairs only; (doc, para) packs into ONE BIGINT so the ENTIRE
        |whole-doc pipeline (signatures, bands, candidate join, exact
        |Jaccard verify) runs unchanged, and the oracle is the SAME
        |generated CTE chain over the packed unit frame. Scale shape:
        |identical to q28 — the unit explode multiplies row count, not
        |bytes; everything stays banded/bucket-local.""".stripMargin,
      (s, d) => Dedup.paragraphNearDupPairs(Tables.documents(s, d), blockTokens = 24),
      Some(MinhashOracle.paragraphPairsSql(blockTokens = 24))),

    QuerySpec(
      "q112_paragraph_scrub",
      """Paragraph-dedup scrub ([[graft.operators.Dedup
        |.scrubDupParagraphs]]) — the TRANSFORM closing q111's detect
        |step, the way q107 closes q83: every paragraph near-duplicating
        |a paragraph of a lower-id document (any b-side appearance in
        |the cross-doc pair set — keep-first, deterministic because the
        |pair set is) is dropped; survivors reassemble in paragraph
        |order as (doc_id, clean_text, n_paras, n_dropped), total on
        |null text. Scale shape (the q83 materialization rule): ONE
        |paragraph frame feeds the pair pipeline AND reassembly, ONE
        |shingle frame feeds signatures AND verification; the drop-set
        |is pair-bounded so the anti-join broadcasts; reassembly is one
        |doc_id group-key shuffle.""".stripMargin,
      (s, d) => Dedup.scrubDupParagraphs(Tables.documents(s, d), blockTokens = 24),
      Some(MinhashOracle.paragraphScrubSql(blockTokens = 24))),

    QuerySpec(
      "q113_semantic_dedup",
      """Semantic dedup ([[graft.operators.Similarity.semanticDedup]],
        |SemDeDup — Abbas et al. 2023): cluster the embedding space
        |with the q49 k-means (same seed, same TWO bitwise-reproducible
        |Lloyd rounds), then within each cell drop every vector whose
        |cosine to a lower-id cell-mate reaches 0.35 (the q29/q50
        |near-dup threshold) — keep-one-per-ε-ball with a deterministic
        |min-id representative. Output: the per-vector (vec_id, cell,
        |kept) disposition sheet a curation pipeline consumes — the
        |k-means-partitioned complement of q50's fixed sign-bit
        |buckets. The oracle chains the q49 refine CTEs verbatim plus
        |the within-cell pair/drop closing, so the hash match covers
        |clustering AND disposition. Scale shape: assignment is the
        |audited map-side argmax (one exchange row per vector); the
        |quadratic is strictly within-cell, bounded by nlist (scale it
        |with the corpus — SemDeDup runs 50k clusters at web scale);
        |the assigned frame is materialized ONCE feeding both pair
        |sides and the disposition join.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val refined = Similarity.kmeansIterate(e, e.filter(col("vec_id") < 16),
          iters = 2, dim = 64)
        Similarity.semanticDedup(e, refined, threshold = 0.35, dim = 64)
      },
      Some(IvfOracle.semanticDedupSql(nlist = 16, iters = 2, dim = 64, threshold = 0.35))),

    QuerySpec(
      "q114_incremental_semantic_dedup",
      """Incremental semantic dedup ([[graft.operators.Similarity
        |.incrementalSemanticDedup]]) — the SemDeDup member of the
        |incremental family (q68 minhash, q82 IVF drift, q105 clusters,
        |q109 BPE): dedup an incoming batch (q68's md5-bucket
        |membership, is_new ⇔ bucket < 100) against FROZEN standing
        |keep decisions. Centroids train on the corpus side only (the
        |q82 standing-index convention); a new vector drops on a
        |≥ 0.35 same-cell neighbor that is kept-standing (any id — old
        |decisions never retro-drop) or lower-id new (the q113 b-side
        |rule within the batch). Output: the batch's (vec_id, cell,
        |kept) disposition only. Scale shape: one assignment pass
        |(map-side argmax; the standing side's assignment and keep
        |sheet are persisted state in a real system, replayed here for
        |the oracle); batch verification joins (kept-old ∪ new) × NEW
        |within cells — bounded by the small batch, never
        |corpus × corpus.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val flagged = graft.operators.Sampling.withSplitBucket(e, "vec_id")
          .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
        val old = flagged.filter(!col("is_new"))
        val refined = Similarity.kmeansIterate(old, old.filter(col("vec_id") < 16),
          iters = 2, dim = 64)
        Similarity.incrementalSemanticDedup(flagged, "is_new", refined,
          threshold = 0.35, dim = 64)
      },
      Some(IvfOracle.incrementalSemanticDedupSql(nlist = 16, iters = 2, dim = 64,
        threshold = 0.35, newPermille = 100))),

    QuerySpec(
      "q115_boilerplate_scrub",
      """Corpus-level EXACT boilerplate removal ([[graft.operators.Dedup
        |.scrubBoilerplateUnits]] — the MassiveText/RefinedWeb
        |repeated-line filter): any token-block unit (q111's
        |segmentation) whose normalized text occurs in ≥ 2 DISTINCT
        |documents is corpus chrome and is dropped from EVERY document —
        |no keep-first, unlike the fuzzy q112 scrub (prevalence itself
        |is the signal); the two compose, this pass first. Survivors
        |reassemble in unit order as (doc_id, clean_text, n_units,
        |n_dropped). Scale shape: the census shuffles 8-byte md5-48 unit
        |keys (never text) through a two-level distinct-doc aggregate;
        |the boilerplate set is prevalence-bounded and broadcast for the
        |anti-join; reassembly is one doc_id group-key shuffle — the
        |text column moves exactly once.""".stripMargin,
      (s, d) => Dedup.scrubBoilerplateUnits(Tables.documents(s, d),
        blockTokens = 24, minDocs = 2L),
      Some(MinhashOracle.boilerplateScrubSql(blockTokens = 24, minDocs = 2L))),

    QuerySpec(
      "q116_bloom_decontaminate",
      """Bloom-filter decontamination probe ([[graft.operators
        |.Decontaminate.bloomContaminationCandidates]]) — the
        |broadcast-sketch shape of q66 for a 100 TB training side: the
        |eval split's shingles (q66's split, df-capped on the TEST side
        |alone so the filter is computable without a corpus census)
        |collapse into a 2^18-bit Bloom filter; every training shingle
        |computes its 4 md5-window probe positions map-side and passes
        |4 chained BROADCAST semi-joins (the all-bits AND gate — zero
        |training-side exchanges before the final map-side-combinable
        |per-doc count). Candidates are a strict superset of exact
        |matches (no false negatives — spec-asserted; deterministic
        |fill⁴ false-positive rate), routed to the q66 exact join.
        |Output (train_id, n_shingles, n_candidates) at ≥ 3 candidate
        |shingles; all-integer, bitwise-oracled — the oracle replays
        |bit positions digit-by-digit and the set-membership gate.""".stripMargin,
      (s, d) => graft.operators.Decontaminate.bloomContaminationCandidates(
        Tables.documents(s, d)),
      Some(DecontaminateOracle.bloomSql())),

    QuerySpec(
      "q117_ann_recall_audit",
      """ANN recall audit ([[graft.operators.Similarity.annRecallAudit]])
        |— measure the approximate indexes BEFORE trusting them, the
        |step every ANN deployment runs when tuning nprobe/bits: per
        |query vector and family (ivf = q49's IVF-flat, lsh = q46's
        |multi-probe sign-bit LSH), how many of the EXACT top-5 (q30's
        |brute force) the index returned — (q_id, method, n_returned,
        |n_hits, recall). n_returned < k exposes an index that cannot
        |even fill k; recall = n_hits/k (two identical BIGINTs over an
        |identical literal — IEEE-identical on both engines, so the
        |DOUBLE oracles bitwise). The oracle embeds all three audited
        |CTE chains and replays the hit join. Scale shape: each kernel
        |keeps its own audited plan; the audit joins q·k-bounded
        |frames — an audit runs over a query SAMPLE by construction, so
        |the exact arm's corpus scan is the q30 slice, not a new
        |quadratic.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val refined = Similarity.kmeansIterate(e, e.filter(col("vec_id") < 16),
          iters = 2, dim = 64)
        Similarity.annRecallAudit(e.filter(col("vec_id") < 8), e, refined,
          k = 5, nprobe = 4, bits = 4, seed = 42L, dim = 64)
      },
      Some(AnnRecallOracle.sql(nlist = 16, nprobe = 4, bits = 4, k = 5,
        qBound = 8, seed = 42L, iters = 2, dim = 64))),

    QuerySpec(
      "q118_bpe_fertility",
      """Tokenizer fertility sheet ([[graft.operators.Phrases
        |.bpeFertilitySheet]]) — the corpus-health readout a tokenizer
        |budget planner consumes, composed from q110's encoder: per
        |(source, lang), doc/word/char/BPE-symbol totals plus fertility
        |(BPE symbols per word — the number multilingual tokenizer
        |evals report per language) and compression (chars per symbol).
        |Ratios are identical BIGINTs under one IEEE division (bitwise
        |both engines; nullif-guarded zero groups). The oracle embeds
        |the whole q110 train+apply CTE chain, so the hash covers
        |training, encoding AND the sheet. Scale shape: q110's two
        |audited corpus passes plus ONE map-side-combined aggregation
        |onto the small (source, lang) key — no new corpus-sized
        |movement. ADJUDICATION (r15): keys on the provenance lang
        |label by the q76 decision — a production run passes q184's
        |derived lang_id as langCol; the operator is parameterized
        |for it.""".stripMargin,
      (s, d) => graft.operators.Phrases.bpeFertilitySheet(
        Tables.documents(s, d), "text", numMerges = 8),
      Some(BpeOracle.fertilitySql(numMerges = 8))),

    QuerySpec(
      "q119_incremental_boilerplate",
      """Incremental boilerplate scrub ([[graft.operators.Dedup
        |.scrubBoilerplateIncrement]]) — q115's member of the
        |incremental family (q68 minhash, q82 IVF, q105 clusters, q109
        |BPE, q114 SemDeDup): scrub an incoming batch (q68's md5-bucket
        |split, is_new ⇔ bucket < 100) against the COMBINED standing ∪
        |batch prevalence census without retro-scrubbing shipped docs.
        |The standing side collapses to the (unit-key, doc-count)
        |census a production system persists and folds deltas into
        |(the q82 standing-index convention), so steady-state cost is
        |batch-sized. The oracle is deliberately MONOLITHIC — census
        |over the union, scrub read for batch docs — so the hash match
        |proves incremental == monolithic, the q105/q109/q114
        |pattern.""".stripMargin,
      (s, d) => {
        val flagged = graft.operators.Sampling.withSplitBucket(
            Tables.documents(s, d), "doc_id")
          .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
        Dedup.scrubBoilerplateIncrement(flagged, "is_new",
          blockTokens = 24, minDocs = 2L)
      },
      Some(MinhashOracle.incrementalBoilerplateSql(blockTokens = 24,
        minDocs = 2L, newPermille = 100))),

    QuerySpec(
      "q120_winnow_matches",
      """Winnowing fingerprint matches ([[graft.operators.Winnow]] —
        |Schleimer/Wilkerson/Aiken 2003, the MOSS algorithm): each
        |window of 4 consecutive token-3-gram hashes contributes its
        |minimal hash (rightmost tie), giving a ~2/(w+1)-density sketch
        |with the winnowing guarantee — any shared verbatim run of ≥
        |w+k−1 = 6 tokens lands ≥ 1 identical fingerprint in both docs;
        |the local, positional near-dup evidence set-global MinHash
        |(q28) can't give, at a fraction of q83's exhaustive span keys.
        |Output: (a_id, b_id, n_shared) over df-capped fingerprints
        |(the q66 hot-key bound) at ≥ 2 shared. Both engines select via
        |ONE integer — enc = h36·2²⁴ + (2²⁴−1−i) — whose plain window
        |min IS the argmin-with-rightmost-tie, so the sketch oracles
        |bitwise. Scale shape: gram hashing map-side; one doc-keyed
        |window exchange of 16-byte rows; the match join fans out ≤
        |maxDf per hash over a sketch ~2/(w+1) the gram volume.""".stripMargin,
      (s, d) => graft.operators.Winnow.matches(Tables.documents(s, d)),
      Some(WinnowOracle.matchesSql())),

    QuerySpec(
      "q121_eval_contamination",
      """Eval-side contamination report ([[graft.operators.Decontaminate
        |.evalContaminationReport]]) — the flip side of q66, answering
        |the EVAL owner's question: which test items are compromised
        |and must be dropped or re-drawn before the split ships? A test
        |doc is compromised by a training doc when the pair shares ≥ 3
        |distinct capped shingles (the SAME split/shingle/df-cap
        |definitions as q66 — one evidence rule read from both ends, so
        |the two reports cannot disagree about what leakage is); per
        |compromised test doc: how many training docs leak into it and
        |the worst single-doc overlap. All-integer, bitwise-oracled.
        |Scale shape: q66's capped-join kernel (df cap keeps fan-out
        |linear); the pair rollup keys on join-bounded (test, train)
        |pairs and the closing aggregation is test-split-sized.""".stripMargin,
      (s, d) => graft.operators.Decontaminate.evalContaminationReport(
        Tables.documents(s, d)),
      Some(DecontaminateOracle.evalSql())),

    QuerySpec(
      "q122_minhash_recall_audit",
      """MinHash/LSH recall audit ([[graft.operators.Dedup
        |.minhashRecallAudit]]) — the q117 pattern for the banded dedup
        |family: per exact-Jaccard band (id-bounded slice, the q29
        |pattern), how many TRUE near-dup pairs exist, how many the q28
        |band geometry (16 hashes × 4 rows/band) surfaces as
        |candidates, recall = hits/true, plus the total candidate count
        |(the precision/cost context). The number band tuning pins to
        |on a REAL corpus — the S-curve 1−(1−j^r)^b assumes uniform
        |shingle statistics this measures instead. ONE shared shingle
        |frame feeds the exact arm (co-shingled pairs only, never
        |all-pairs) and the banded arm; integer counts + one IEEE
        |division, so the report oracles bitwise. Scale shape: the
        |exact arm is the documented audit-sized slice; everything else
        |is q28's audited plan.""".stripMargin,
      (s, d) => graft.operators.Dedup.minhashRecallAudit(Tables.documents(s, d)),
      Some(MinhashOracle.recallAuditSql())),

    QuerySpec(
      "q123_unigram_lm_round",
      """Unigram-LM tokenizer round ([[graft.operators.Phrases
        |.unigramLmRound]]) — the SECOND tokenizer family beside BPE
        |(SentencePiece's model, Kudo 2018), as one deterministic
        |Viterbi hard-EM round over the q106 word-count frame: seed
        |substring census (singles + top-512 multis), q89-quantized
        |scores with INTEGER-log costs (22 − length(bin(score_q+1)) —
        |floor(log2) off the binary string, no libm), min-cost DP
        |segmentation per distinct word (tie: cost ASC, start ASC),
        |frequency-weighted expected counts, re-score + prune, top-200
        |under (em_cnt DESC, piece). All-BIGINT, so the whole EM round
        |oracles bitwise against a recursive-CTE replay. Scale shape:
        |ONE corpus scan; DP and backtrace are maxWordLen vocab-sized
        |hops — per-round cost bounded by vocabulary, not corpus.""".stripMargin,
      (s, d) => graft.operators.Phrases.unigramLmRound(
        Tables.documents(s, d), "text"),
      Some(BpeOracle.unigramSql())),

    QuerySpec(
      "q124_unigram_encode",
      """Unigram-LM apply/encode ([[graft.operators.Phrases
        |.unigramEncode]]) — the APPLY member closing the second
        |tokenizer family the way q110 closes BPE: segment every
        |truncated corpus word with the seed-scored vocabulary's
        |min-cost Viterbi path (q123's E-step segmentation, one shared
        |kernel) and report per doc (doc_id, n_words, n_chars,
        |n_pieces) — the budget sheet a tokenizer planner consumes,
        |now comparable across both families. All-BIGINT; the oracle
        |replays the same recursive DP chain and closes with per-word
        |path lengths joined onto the (doc, word) stream. Scale shape:
        |DP once per DISTINCT word (vocab-sized, map-side vs the
        |broadcast cost map); the corpus side collapses onto
        |(doc, word) count keys before the word-keyed join — narrow
        |count rows move, never tokens or text; per-doc sums combine
        |map-side.""".stripMargin,
      (s, d) => graft.operators.Phrases.unigramEncode(
        Tables.documents(s, d), "text"),
      Some(BpeOracle.unigramEncodeSql())),

    QuerySpec(
      "q125_lm_quality_buckets",
      """CCNet-style LM-perplexity quality filter ([[graft.operators
        |.Phrases.lmQualityBuckets]], Wenzek et al. 2020): score every
        |document by the engine's OWN unigram piece model — per-doc
        |total Viterbi cost (the integer −log p surrogate) normalized
        |per piece, ppl_q = cost_q·2^20 DIV n_pieces — and split the
        |corpus at the exact discrete 33 %/67 % percentiles into
        |head/middle/tail (CCNet keeps the head as the cleanest
        |slice); empty docs bucket 'empty'. Composes three shipped
        |kernels (unigram vocab + Viterbi DP + the q60 percentile
        |selection); all-BIGINT scoring + discrete selection, so the
        |whole sheet oracles bitwise. Scale shape: q124's audited
        |encode shape plus ONE global discrete-percentile pass over
        |16-byte rows (the q40 global-median shape; approx_percentile
        |is the documented outgrow path) and a two-value broadcast
        |onto the disposition sheet.""".stripMargin,
      (s, d) => graft.operators.Phrases.lmQualityBuckets(
        Tables.documents(s, d), "text"),
      Some(BpeOracle.unigramQualitySql())),

    QuerySpec(
      "q126_dsir_weights",
      """DSIR importance weights ([[graft.operators.Mixing
        |.dsirWeights]], Xie et al. 2023): score every raw document by
        |Σ over its hashed-bigram occurrences of
        |log p_target(b) − log p_raw(b) — the importance weight DSIR
        |resamples by when assembling a target-flavored mix from a
        |generic crawl. Target = the q55 md5-bucket split; features =
        |md5-48 bigrams mod 8192; +1-smoothed BIGINT counts; every log
        |is the exact fixed-point log2 (6 fractional bits via the
        |squaring algorithm — defined BIGINT truncations, no libm), so
        |the sheet oracles bitwise against a 6-step unrolled CTE
        |replay. Output per doc: (doc_id, n_bigrams, weight_q) in
        |1/64-log2 units; selection composes downstream (q10 top-k /
        |q101 allocation). Scale shape: map-side bigram assembly onto
        |(doc, bucket) count keys; the 8192-row sheet log-chains
        |locally and BROADCASTS into the scoring join; per-doc sums
        |combine map-side — only 24-byte count rows move.""".stripMargin,
      (s, d) => graft.operators.Mixing.dsirWeights(Tables.documents(s, d)),
      Some(DsirOracle.sql())),

    QuerySpec(
      "q127_embedding_pca",
      """Top principal component of the embedding corpus
        |([[graft.operators.Similarity.principalComponent]]) by
        |covariance-free power iteration — the spectral audit/whitening
        |primitive an ANN deployment runs before trusting cosine
        |geometry (anisotropic embeddings concentrate variance in one
        |direction; projecting it out is the standard fix). The d×d
        |covariance never materializes: 3 rounds, each two linear
        |passes over the centered 24-byte rows. Every
        |corpus-order-dependent sum quantizes floor(·2^20) per term
        |first (the q49 k-means idiom) — exact BIGINT accumulation, one
        |division + one correctly-rounded sqrt per round — so all
        |rounds, the Rayleigh eigenvalue, and the sign-canonicalized
        |component oracle bitwise against the unrolled CTE replay.
        |Output: (pos, mu, pc, eigval), one row per dimension.""".stripMargin,
      (s, d) => graft.operators.Similarity.principalComponent(
        Tables.embeddings(s, d), iters = 3, dim = 64),
      Some(IvfOracle.pcaSql(iters = 3, dim = 64))),

    QuerySpec(
      "q128_embedding_whiten",
      """Whitening audit ([[graft.operators.Similarity.whitenAudit]]) —
        |the TRANSFORM-side reading of q127 (the q83→q107 / q111→q112
        |detect→transform pairing applied to the spectral family): per
        |vector, its projection onto the dominant direction and the
        |centered-energy split projecting it out leaves —
        |(vec_id, proj, cnorm2, resid2 = cnorm2 − proj²). Σproj²/Σcnorm2
        |is the anisotropy fraction the whitening decision reads;
        |resid2 is the whitened norm² a re-normalization uses. Same
        |quantized-term exact-sum contract as q127, so every vector's
        |row oracles bitwise against the shared power-iteration CTE
        |chain plus one per-vector closing. Scale shape: q127's audited
        |passes plus ONE extra linear pass (posexplode → d-row
        |broadcast join → map-side-combined per-vector sums).""".stripMargin,
      (s, d) => graft.operators.Similarity.whitenAudit(
        Tables.embeddings(s, d), iters = 3, dim = 64),
      Some(IvfOracle.whitenSql(iters = 3, dim = 64))),

    QuerySpec(
      "q129_pq_codes",
      """Product-quantization code sheet ([[graft.operators.Similarity
        |.pqTrain]] + `pqEncode`, Jégou et al. 2011) — the COMPRESSION
        |member of the ANN family: vectors L2-normalize, split into
        |m=4 subspaces of 16 dims, each subspace Lloyd-trains ksub=8
        |sub-centroids (2 rounds, corpus-row seeds), and every vector
        |compresses to m codes — 64-dim float32 (256 B) → 4 B of
        |index. Every DISTANCE is exact integer arithmetic (components
        |floor(·2^14) to BIGINT before the squared-difference sum), so
        |assignment argmins carry no float fold-order dependence and
        |the sheet — (vec_id, s, code, dist_q), dist_q the per-subspace
        |quantization distortion an index-health audit reads — oracles
        |bitwise against the unrolled train+encode CTE replay. Scale
        |shape: ONE materialized long-form subvector frame feeds all
        |rounds; per round a broadcast(m·ksub) join + map-side-combined
        |argmin (one exchange row per (vector, subspace)); the codebook
        |frame is m·ksub rows, always broadcastable.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.operators.Similarity.pqEncode(e,
          graft.operators.Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64),
          m = 4, dim = 64)
      },
      Some(PqOracle.codesSql(m = 4, ksub = 8, iters = 2, dim = 64))),

    QuerySpec(
      "q130_pq_adc_topk",
      """Asymmetric-distance (ADC) top-k over PQ codes
        |([[graft.operators.Similarity.pqAdcTopK]]): each query builds
        |an m×ksub integer lookup table of subspace distances to every
        |codebook entry; a corpus vector's distance is the BIGINT sum
        |of m table lookups over its codes — the original vectors are
        |never touched after encoding, which is the entire point at
        |100 TB (the index holds 4-byte codes, not 256-byte vectors).
        |Normalized-vector squared L2 orders identically to cosine, so
        |this ranks the same geometry as q30/q46/q49. Integer distances
        |end-to-end → (q_id, n_id, adc_q, rank) oracles bitwise. Scale
        |shape: codes scanned once against the BROADCAST lut
        |(|q|·m·ksub rows), per-(q, n) sum map-side combined; flat ADC
        |is the audited baseline — a deployment puts the q49 IVF in
        |front (probe cells, ADC inside), composing as a pre-filter on
        |the codes frame.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cb = graft.operators.Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
        val codes = graft.operators.Similarity.pqEncode(e, cb, m = 4, dim = 64)
        graft.operators.Similarity.pqAdcTopK(
          e.filter(col("vec_id") < 8), codes, cb, k = 5, m = 4, dim = 64)
      },
      Some(PqOracle.adcTopKSql(m = 4, ksub = 8, iters = 2, k = 5, qBound = 8, dim = 64))),

    QuerySpec(
      "q131_pq_recall_audit",
      """PQ recall audit ([[graft.operators.Similarity.pqRecallAudit]])
        |— the q117 reading for the compression family: per query, a
        |method='pq' row (flat ADC over ALL codes — the compression
        |ceiling) and a method='ivfadc' row (the q132 IVF∘PQ serving
        |composition at nprobe=4), both scoring how many of the EXACT
        |cosine top-5 each ranking recovered (the q117 sheet shape, so
        |lsh / ivf / pq / ivfadc all audit against the same exact arm).
        |The pq row pins the (m, ksub) memory budget; the pq→ivfadc
        |gap is exactly the probe-miss cost the nprobe knob buys back.
        |Scale shape: the exact arm is the documented O(|q|·corpus)
        |audit slice (queries are a SAMPLE by construction); the codes
        |frame is materialized ONCE and feeds both arms; the closing
        |join is q·k-bounded.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.operators.Similarity.pqRecallAudit(
          e.filter(col("vec_id") < 8), e,
          graft.operators.Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64),
          k = 5, m = 4, dim = 64,
          centroids = Some(e.filter(col("vec_id") < 16)), nprobe = 4)
      },
      Some(PqOracle.recallSql(m = 4, ksub = 8, iters = 2, k = 5, qBound = 8,
        dim = 64, nlist = 16, nprobe = 4))),

    QuerySpec(
      "q132_ivfadc_topk",
      """IVFADC top-k ([[graft.operators.Similarity.ivfAdcTopK]],
        |Jégou et al. 2011 §IV) — the IVF∘PQ composition q130's
        |flat-ADC scaladoc names as the deployment shape: probe the
        |query's nprobe=4 highest-cosine IVF cells (the q49 probe),
        |then ADC-rank ONLY the codes of vectors living in the probed
        |cells. Per-query work drops from |corpus| code rows to
        |~nprobe/nlist of them; the index still holds m-byte codes,
        |never vectors — this is how a 100 TB corpus serves ANN from
        |RAM. Inputs are what a deployed index persists: the code
        |sheet, the (n_id, c_id) posting-list membership, centroids,
        |codebooks. Exact-integer distances end to end (the q129
        |contract) → (q_id, n_id, adc_q, rank) oracles bitwise. Scale
        |shape: codes⋈cells is the id-keyed join the index stores
        |pre-materialized; probes (|q|·nprobe) and luts (|q|·m·ksub)
        |broadcast; the per-(q, n) sum is map-side combined over
        |probed cells only.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cb = graft.operators.Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
        val codes = graft.operators.Similarity.pqEncode(e, cb, m = 4, dim = 64)
        val cent = e.filter(col("vec_id") < 16)
        val cells = graft.operators.Similarity.ivfAssign(e, cent, dim = 64)
          .select(col("n_id"), col("c_id"))
        graft.operators.Similarity.ivfAdcTopK(
          e.filter(col("vec_id") < 8), codes, cells, cent, cb,
          k = 5, nprobe = 4, m = 4, dim = 64)
      },
      Some(PqOracle.ivfAdcTopKSql(m = 4, ksub = 8, iters = 2, k = 5, qBound = 8,
        dim = 64, nlist = 16, nprobe = 4))),

    QuerySpec(
      "q133_pq_residual_codes",
      """Residual-PQ code sheet ([[graft.operators.Similarity
        |.pqResidualCodes]], Jégou et al. 2011 §IV.A — the classic
        |IVFADC refinement): each vector encodes the RESIDUAL after
        |its IVF centroid (both on the unit sphere), with one PQ
        |trained on the pooled residuals — the FAISS convention.
        |Residual magnitudes are bounded by within-cell spread instead
        |of the whole sphere, so the SAME (m=4, ksub=8) budget spends
        |its codes on a far smaller volume: total reconstruction error
        |drops strictly below q129's flat sheet on clustered data
        |(spec-pinned on planted geometry) — distortion falls without
        |growing m. Output is the q129 sheet shape
        |(vec_id, s, code, dist_q), so the two dist_q columns compare
        |directly. Residual components are two correctly-rounded
        |divisions and a subtraction (IEEE-identical across engines);
        |the q129 exact-integer train/assign chain then applies
        |unchanged — bitwise oracle. Scale shape: ONE map-side argmax
        |assignment + a broadcast nlist-row centroid join forms
        |residuals map-side; then the audited q129 shapes over ONE
        |materialized residual subvector frame.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.operators.Similarity.pqResidualCodes(
          e, e.filter(col("vec_id") < 16), m = 4, ksub = 8, iters = 2, dim = 64)
      },
      Some(PqOracle.residCodesSql(m = 4, ksub = 8, iters = 2, dim = 64, nlist = 16))),

    QuerySpec(
      "q134_bm25_retrieval",
      """BM25 ranked retrieval ([[graft.operators.Retrieval.bm25TopK]],
        |Robertson & Zaragoza 2009) — the retrieval member of the text
        |family: for each eval-split document (THE q55 md5-bucket
        |membership), the top-5 training documents by BM25 over its
        |distinct in-cap terms — what a RAG pipeline, an eval owner,
        |or a contamination analyst asks of a landed corpus. Every
        |score is an exact BIGINT: Lucene idf (2N+2)/(2df+1) under the
        |q126 fixed-point log2 kernel, tf saturation as an integer
        |quotient with avgdl = T DIV N (documented convention), ranks
        |by (score DESC, id ASC) — bitwise oracle. Common-term pruning
        |is contractual: terms with train-df > 100 never score (their
        |idf ≈ 0 and their posting lists are the corpus), which bounds
        |the scoring join at ≤ |terms|·dfCap rows per eval doc. Scale
        |shape: ONE token pass with map-side combine; stats broadcast;
        |one term-keyed shuffle with df-capped fan-out; per-pair sums
        |combine map-side; the top-k window partitions by eval doc.""".stripMargin,
      (s, d) => graft.operators.Retrieval.bm25TopK(Tables.documents(s, d)),
      Some(Bm25Oracle.sql())),

    QuerySpec(
      "q135_rrf_fusion",
      """Reciprocal-rank fusion over the three ANN arms
        |([[graft.operators.Similarity.rrfFusionTopK]],
        |Cormack/Clarke/Büttcher 2009) — the hybrid-retrieval combiner
        |a deployment runs when no single probe budget buys the recall
        |it needs: multi-probe LSH (q46), refined IVF (q49) and PQ ADC
        |(q130) each contribute 2^20 DIV (60 + rank) per surfaced
        |pair; candidates several cheap indexes agree on outrank any
        |single arm's tail. n_arms is the agreement signal. Every
        |score is integer division of integers summed in BIGINT —
        |order-independent, bitwise oracle. Scale shape: the arms
        |keep their own audited shapes; fusion touches only 3·k·|q|
        |rank rows — query-bounded, corpus-independent.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val refined = graft.operators.Similarity.kmeansIterate(
          e, e.filter(col("vec_id") < 16), iters = 2, dim = 64)
        val cb = graft.operators.Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
        graft.operators.Similarity.rrfFusionTopK(
          e.filter(col("vec_id") < 8), e, refined, cb,
          k = 5, nprobe = 4, bits = 4, seed = 42L, m = 4, rrfK = 60, dim = 64)
      },
      Some(AnnRecallOracle.rrfSql(nlist = 16, nprobe = 4, bits = 4, k = 5,
        qBound = 8, seed = 42L, iters = 2, dim = 64, m = 4, ksub = 8,
        pqIters = 2, rrfK = 60))),

    QuerySpec(
      "q136_oov_audit",
      """OOV-rate audit ([[graft.operators.Phrases.oovAudit]]) — the
        |operational readout behind the streaming LM gate's UNK
        |fallback: for each incoming document (the q68/q114 md5
        |split), the occurrences of words the STANDING model cannot
        |represent (≥ 1 character outside the standing single-char
        |vocabulary — exactly the words whose Viterbi path takes UNK
        |pieces) and the integer rate 1000·n_oov DIV n_words. A
        |rising sheet = the standing tokenizer is aging off the
        |ingest distribution; re-run the q123 EM round — the
        |vocabulary twin of q82's IVF drift report. Null-text docs
        |report zeros. Scale shape: the standing side collapses to
        |its alphabet-sized character census (one broadcast row); the
        |batch side to (doc, word) count keys map-side; per-word
        |checks are one array_except against the broadcast alphabet;
        |per-doc sums combine map-side.""".stripMargin,
      (s, d) => graft.operators.Phrases.oovAudit(Tables.documents(s, d)),
      Some(BpeOracle.oovAuditSql())),

    QuerySpec(
      "q137_bigram_lm_quality",
      """Bigram-LM quality buckets ([[graft.operators.Phrases
        |.bigramLmQuality]]) — the conditional-probability upgrade of
        |q125: every token scored by how predictable it is GIVEN its
        |predecessor under the corpus's own add-1-smoothed bigram LM
        |(the first-order member of CCNet's n-gram KenLM direction —
        |scrambled-but-common-words text that fools a unigram filter
        |scores badly here). Occurrence cost = log2q(c1+V) −
        |log2q(c2+1) in 1/64-log2 units under the exact fixed-point
        |kernel; per-doc ppl_q = cost·2^20 DIV n_bigrams;
        |head/middle/tail at the exact discrete 33/67 cuts; < 2
        |tokens → 'empty'. All-BIGINT → bitwise oracle. Scale shape:
        |ONE materialized token pass; bigrams collapse map-side onto
        |(doc, w1, w2) count keys; the model sheet log-chains in
        |place and joins once on the bigram key; per-doc sums combine
        |map-side; cuts are the q40 16-byte percentile pass.""".stripMargin,
      (s, d) => graft.operators.Phrases.bigramLmQuality(Tables.documents(s, d)),
      Some(BpeOracle.bigramLmQualitySql())),

    QuerySpec(
      "q138_semantic_contamination",
      """Semantic eval-decontamination ([[graft.operators.Decontaminate
        |.semanticContaminationReport]], Yang et al. 2023) — the
        |embedding-space member of the contamination family (exact q66,
        |eval-side q121, Bloom q116): verbatim n-gram checks miss
        |paraphrased eval leakage, so each eval item (the q68/q114 md5
        |split) probes its nprobe highest-cosine cells of the STANDING
        |IVF index (centroids trained on the train side only — the q82
        |standing-index convention) and flags train vectors at
        |cosine ≥ 0.35 (the threshold is caller-chosen; on the
        |synthetic driver corpus 0.35 sits in the far tail of the
        |cross-pair cosine distribution, so the report stays small
        |and non-empty at every test SF. CHANGELOG: the shipped
        |default was 0.5 through round 10 and is 0.35 since round 11,
        |aligning with q50/q113/q114 — callers relying on the old 0.5
        |default should pass it explicitly). One row per flagged train vector: hit count,
        |max cosine (quantized per-pair floor(·2^20) BEFORE the max —
        |integer-exact sheet), and the closest eval item as reviewable
        |evidence (ties → min id). Cross-cell misses are the measured
        |q117 recall trade. Scale shape: one assignment exchange row
        |per train vector (persisted index state in a real system);
        |centroids and the benchmark-sized eval probe frame broadcast,
        |so the wide train vectors never shuffle; the window sorts
        |only flagged pairs.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val train = graft.operators.Sampling.withSplitBucket(e, "vec_id")
          .filter(col("__bucket") >= 100).drop("__bucket")
        val refined = Similarity.kmeansIterate(train,
          train.filter(col("vec_id") < 16), iters = 2, dim = 64)
        graft.operators.Decontaminate.semanticContaminationReport(
          e, refined, threshold = 0.35, nprobe = 4, evalPermille = 100, dim = 64)
      },
      Some(IvfOracle.semanticContaminationSql(nlist = 16, iters = 2, dim = 64,
        threshold = 0.35, nprobe = 4, evalPermille = 100))),

    QuerySpec(
      "q139_sq8_audit",
      """Scalar-quantization (SQ8) distortion audit ([[graft.operators
        |.Similarity.sqAudit]], the FAISS ScalarQuantizer member beside
        |the PQ family — Jégou et al. 2011 §III compares exactly these
        |two): each dimension of the normalized corpus maps to an 8-bit
        |code on its own corpus [min, max] range — 64 B/vector where PQ
        |m=4 spends 4 B — and the sheet answers the sizing question a
        |deployment asks: what does 16× the bytes buy in
        |reconstruction error? One row per vector: dist_q =
        |Σ floor((x−recon)²·2^20) (exact BIGINT — order-independent)
        |and the worst single dimension. Constant dimensions
        |reconstruct exactly. Scale shape: ONE materialized
        |(vec, pos, x) pass feeds stats and encoding; the d-row stats
        |broadcast; per-vector sums combine map-side — two linear
        |24-byte exchanges, nothing quadratic in n or d.""".stripMargin,
      (s, d) => Similarity.sqAudit(Tables.embeddings(s, d), dim = 64),
      Some(PqOracle.sqAuditSql(dim = 64))),

    QuerySpec(
      "q140_quality_keepset",
      """Quality-aware canonicalization ([[graft.operators
        |.ConnectedComponents.keepBestFromComponents]]) — the
        |production upgrade of q59's min-id keeper: per near-dup
        |cluster (q58's components over the MinHash ∪ SimHash pair
        |graph) keep the MOST COMPLETE copy — winner by
        |(n_tokens DESC, doc_id ASC), the keep-longest rule a C4/
        |RefinedWeb-style pipeline applies so a truncated crawl loses
        |to the full page. Output is the reviewable per-member
        |disposition (doc_id, cluster_id, n_tokens, kept) q59's
        |anti-join form doesn't expose; n_tokens via the codegen
        |graft_tokcount. Scale shape: the components frame is
        |pair-graph-node-sized (vanishing under LSH banding); score
        |join id-keyed on it; winner = map-side-combined max(struct)
        |onto cluster keys; the corpus is touched once for the
        |(id, n_tokens) projection.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.unionNearDupPairs(docs, maxHamming = 5)
        val scored = docs.filter(col("doc_id").isNotNull)
          .select(col("doc_id"),
            TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"))
        graft.operators.ConnectedComponents.keepBestFromComponents(
          scored, "doc_id", "n_tokens",
          graft.operators.ConnectedComponents.components(pairs))
          .select(col("node_id").as("doc_id"), col("cluster_id"),
            col("score").as("n_tokens"), col("kept"))
      },
      Some(ClusterOracle.qualityKeepSql)),

    QuerySpec(
      "q141_filter_overlap",
      """Quality-rule co-fire matrix ([[graft.operators.QualityRules
        |.overlapMatrix]]) — the report that tunes a filter cascade:
        |q74's precedence audit hides overlap (a doc dying too_short
        |never shows its repetition), so this evaluates the SAME four
        |rules independently (one shared flags kernel — the Spark code
        |and the oracle CTE chain are both single-sourced with q74)
        |and counts, per unordered rule pair, the documents BOTH kill:
        |a rule whose kills are a subset of an earlier rule's is dead
        |weight; a near-zero off-diagonal means independent failure
        |modes. 10 rows at 4 rules, diagonal = independent kill
        |counts. Scale shape: the q74 evidence shape plus ONE global
        |aggregate of 10 boolean-pair sums collapsed map-side (a
        |single row crosses the exchange), exploded driver-free into
        |the long sheet.""".stripMargin,
      (s, d) => graft.operators.QualityRules.overlapMatrix(Tables.documents(s, d)),
      Some {
        val conds = Map(
          "too_short" -> "n_tokens < 20",
          "non_english" -> "lang <> 'en'",
          "repetitive" -> ("(50 * top_bigram_n > 9 * n_bigrams OR 5 * top_token_n > n_tokens" +
            " OR max_token_run >= 4 OR 10 * (n_3grams - n_distinct_3grams) > 3 * n_3grams)"),
          "low_stopword" -> "50 * stop_cnt < n_tokens")
        val names = graft.operators.QualityRules.RuleNames
        val rows = for { i <- names.indices; jj <- i until names.size } yield {
          val (a, b) = (names(i), names(jj))
          s"""SELECT '$a' AS rule_a, '$b' AS rule_b,
             |  CAST(sum(CASE WHEN (${conds(a)}) AND (${conds(b)}) THEN 1 ELSE 0 END) AS BIGINT) AS n_docs
             |FROM j""".stripMargin
        }
        s"WITH $qualityRuleCtes\n" + rows.mkString("\nUNION ALL\n")
      }),

    QuerySpec(
      "q142_ivfadc_rerank",
      """IVFADC+R top-k ([[graft.operators.Similarity
        |.ivfAdcRerankTopK]], Jégou et al. 2011 §V — the FAISS
        |IndexRefineFlat shape): q132's IVF∘PQ composition kept to a
        |SHORTLIST of 3k ADC candidates per query, then ONLY those
        |candidates' raw vectors fetched and re-ranked by exact cosine
        |— the standard refinement that buys back ADC's
        |quantization-error rank inversions while exact distances are
        |paid for |q|·3k vectors, never the corpus. Output keeps the
        |surviving adc_q beside the exact cos so every re-rank
        |inversion is reviewable; rank by (cos DESC, n_id ASC), the
        |q30 total order — integer ADC shortlist + the q30 bitwise
        |cosine chain, so the sheet oracles bitwise. Scale shape: the
        ||q|·3k shortlist broadcasts into the corpus scan (a
        |broadcast fetch join, never a corpus shuffle); the query
        |side broadcasts into the pair frame; the window sorts
        |shortlist-bounded rows per query.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cb = graft.operators.Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
        val codes = graft.operators.Similarity.pqEncode(e, cb, m = 4, dim = 64)
        val cent = e.filter(col("vec_id") < 16)
        val cells = graft.operators.Similarity.ivfAssign(e, cent, dim = 64)
          .select(col("n_id"), col("c_id"))
        graft.operators.Similarity.ivfAdcRerankTopK(
          e.filter(col("vec_id") < 8), e, codes, cells, cent, cb,
          k = 5, shortlist = 15, nprobe = 4, m = 4, dim = 64)
      },
      Some(PqOracle.ivfAdcRerankSql(m = 4, ksub = 8, iters = 2, k = 5,
        shortlist = 15, qBound = 8, dim = 64, nlist = 16, nprobe = 4))),

    QuerySpec(
      "q143_quality_classifier",
      """Supervised quality classifier ([[graft.operators.Classifier
        |.nbQualityScores]]) — the fastText-style curated-reference
        |keep gate the published pipelines run beside the
        |unsupervised filters (GPT-3's classifier, Brown et al. 2020
        |App. A; LLaMA's Wikipedia fastText; q125's CCNet LM is the
        |UNsupervised sibling): closed-form multinomial Naive Bayes
        |over the q126 hashed-bigram features, trained on the md5
        |split's first half with label "document comes from a curated
        |publisher" (source src0-src4), scoring every HELD-OUT doc
        |with the positive-class log-odds. Integer end to end (counts
        |BIGINT, logs the exact fixed-point log2q kernel), so scores
        |AND the MAP predicted column oracle bitwise; the per-doc
        |sheet carries (predicted, actual) — the confusion matrix is
        |one groupBy downstream. Scale shape: the q126 audited shape —
        |(doc, bucket) count rows are the only corpus-sized exchange;
        |the 8192-row model sheet and one-row prior/normalizer frame
        |broadcast (the model artifact a deployment ships to ingest
        |workers); unseen buckets cost zero lookup by the score
        |decomposition.""".stripMargin,
      (s, d) => graft.operators.Classifier.nbQualityScores(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(ClassifierOracle.sql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q144_length_psi",
      """PSI ingest-drift monitor ([[graft.operators.Drift
        |.lengthPsi]]) — the distribution-level guard beside q92's
        |per-term rates: the population stability index (credit
        |scoring's standard drift alarm, applied to the crawl
        |pipeline) over document LENGTH, binned by the STANDING
        |slice's exact decile edges (the q60-pinned percentile_disc
        |kernel), incoming batch = the q68 md5 split. Fires when the
        |batch's length distribution no longer matches the corpus the
        |filters were tuned on — truncated scrapes, boilerplate
        |injection, a changed extractor — before any content-level
        |signal moves. Bin rates are EXACT fixed-point
        |floor(cnt·2^20/N) in two 10-bit steps (no overflow for any
        |corpus < 2^53 docs); per-bin psi_q = (rs_q−rn_q)·Δlog2q ≥ 0
        |(the true PSI property); alert ⇔ total > 0.3 log2 units (≈
        |the classic 0.2 nat line). All integers — the 10-row sheet
        |and the verdict oracle bitwise. Scale shape: ONE corpus pass
        |onto a 16-byte (is_new, length) frame (codegen
        |graft_tokcount — text never leaves the scan); edges are one
        |broadcast row; binning is a 9-comparison map-side
        |expression; ONE map-side-combined aggregation onto ≤ 10
        |keys; the windows sort 10 rows.""".stripMargin,
      (s, d) => graft.operators.Drift.lengthPsi(Tables.documents(s, d)),
      Some(PsiOracle.sql())),

    QuerySpec(
      "q145_source_overlap",
      """Cross-source duplication matrix ([[graft.operators.Dedup
        |.sourceOverlapMatrix]]) — the provenance report a curation
        |team reads off the near-dup pair graph: per unordered SOURCE
        |pair, how many q28 near-dup pairs connect a document of one
        |source to one of the other. The diagonal is each source's
        |internal duplication mass; a heavy off-diagonal cell names
        |the two feeds syndicating the same content — the signal that
        |drops a redundant source BEFORE paying its processing cost
        |(the RefinedWeb/C4 practice of auditing WHERE duplication
        |comes from, not just how much). Null sources fold to '' on
        |both engines; BIGINT counts over the q28-pinned pair set →
        |bitwise oracle. Scale shape: the pair frame is
        |LSH-band-bounded; the (doc_id, source) projection joins
        |id-keyed onto it twice; the closing aggregation collapses
        |map-side onto ≤ sources² keys. Corpus text is touched only
        |inside the audited q28 kernel.""".stripMargin,
      (s, d) => graft.operators.Dedup.sourceOverlapMatrix(Tables.documents(s, d)),
      Some(MinhashOracle.sourceOverlapSql())),

    QuerySpec(
      "q146_ivf_balance",
      """IVF index-balance audit ([[graft.operators.Similarity
        |.ivfBalanceAudit]]) — FAISS's imbalance_factor as a
        |relational health sheet: per cell its vector count and exact
        |fixed-point occupancy rate (the q144 two-step kernel), plus
        |the globals an index operator watches — cell count, EMPTY
        |cell count (wasted nlist budget), and imb_q = nlist·Σp_i²
        |(1 = balanced; k means probe cost behaves like nlist/k
        |effective cells). Serving cost is driven by the largest
        |probed cells, so a drifting imbalance factor is the
        |re-train/re-balance trigger — the q82 drift report says WHERE
        |vectors moved; this says what the skew costs. Σr_q² ≤ 2^40
        |whatever nlist is (rates sum to ≤ 2^20), so the integer
        |factor is safe at any index size. All-BIGINT → bitwise
        |oracle. Scale shape: one ivfAssign pass (one exchange row
        |per vector — persisted index state in a real system), a
        |map-side-combined count onto nlist keys, nlist-row
        |windows.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.operators.Similarity.ivfBalanceAudit(
          e, e.filter(col("vec_id") < 16), dim = 64)
      },
      Some(IvfOracle.balanceSql(nlist = 16, dim = 64))),

    QuerySpec(
      "q147_classifier_pr",
      """Classifier operating-point sheet ([[graft.operators
        |.Classifier.operatingPoints]]) — the threshold-picking report
        |a deployment reads before wiring q143's gate: the held-out
        |scores swept at their own exact DECILE thresholds (the
        |q60-pinned percentile_disc kernel — data-driven cut
        |candidates, not arbitrary constants), one row per distinct
        |threshold with integer confusion counts (predict positive ⇔
        |score_q ≥ thr_q) and precision/recall (−1.0 when undefined,
        |the q90 idiom). GPT-3's appendix documents exactly this knob;
        |this sheet is how the cut gets chosen with evidence.
        |Thresholds are SELECTED score values, counts BIGINT,
        |precision/recall single IEEE divisions of exact integers —
        |bitwise oracle. Scale shape: the 16-byte held-out score
        |frame sweeps against ≤ 9 broadcast threshold rows (map-side
        |row multiplication, map-side-combined collapse onto ≤ 9
        |keys); the decile pass is one sort of the score
        |frame.""".stripMargin,
      (s, d) => graft.operators.Classifier.operatingPoints(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(ClassifierOracle.operatingPointsSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q148_classifier_calibration",
      """Classifier reliability (calibration) sheet ([[graft.operators
        |.Classifier.calibrationSheet]]) — the rank-calibration readout
        |read beside q147's threshold sweep: held-out scores binned by
        |their own exact decile edges (the q60-pinned percentile_disc
        |kernel, the q144 binning expression), per bin the integer
        |counts, observed score bounds and the EXACT fixed-point
        |positive rate (the q144 two-step rate kernel), plus a `mono`
        |flag marking where the reliability curve inverts. A threshold
        |gate needs rank-calibration — higher score band ⇒ higher true
        |positive rate — and NB is notoriously over-confident in
        |probability space (Niculescu-Mizil & Caruana 2005), so the
        |per-band EMPIRICAL rate is the evidence score order can be
        |trusted (DeGroot & Fienberg 1983's reliability diagram as a
        |relational sheet). All-BIGINT → bitwise oracle. Scale shape:
        |the 16-byte held-out score frame crosses ONE broadcast edge
        |row; binning is a ≤ 9-comparison map-side expression; counts
        |collapse map-side onto ≤ bins keys; the windows after the
        |single exchange sort `bins` rows.""".stripMargin,
      (s, d) => graft.operators.Classifier.calibrationSheet(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(ClassifierOracle.calibrationSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q149_prefix_recall",
      """Prefix-dimension (Matryoshka) recall audit ([[graft.operators
        |.Similarity.prefixRecallAudit]], Kusupati et al. 2022) — the
        |dimension-TRUNCATION member of the audit family beside q117
        |(index approximation) and q131 (code compression): per query
        |and prefix length dp ∈ {8,16,32,64}, how many of the exact
        |full-dimension top-k survive when ranking by cosine over only
        |the FIRST dp components. MRL-style serving truncates the
        |embedding for a dp/64-sized index and scan cost; this sheet
        |is the evidence a corpus tolerates that, and the dp = 64 arm
        |is the audit's own pin (recall 1.0 by construction —
        |identical cosines, identical tiebreak). The q117 sheet shape
        |(method = 'd<dp>'); recall divides two identical integers by
        |an identical literal — IEEE-identical. Zero-norm prefixes are
        |excluded from that arm on both sides. Scale shape: exact arm
        |= the documented O(|q|·corpus) audit slice; prefix arms scan
        ||dims| 8·dp-byte prefix rows per vector once against the
        |broadcast query side; the closing join touches q·k·|dims|
        |rows.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.operators.Similarity.prefixRecallAudit(
          e.filter(col("vec_id") < 8), e, k = 5, dim = 64)
      },
      Some(AnnRecallOracle.prefixSql())),

    QuerySpec(
      "q150_gate_agreement",
      """Cross-family quality-gate agreement matrix ([[graft.operators
        |.Ensemble.gateAgreement]]) — the ensemble readout the
        |published pipelines tune with (rule cascades, CCNet LM
        |buckets and supervised classifiers run TOGETHER in practice;
        |Longpre et al. 2023): per unordered pair of the engine's
        |three quality families — q74's rule verdict, q125's LM bucket
        |(tail/empty = drop), q143's MAP-negative classifier — the
        |integer kill-decision confusion over the held-out slice
        |where all three are defined, plus the exact fixed-point
        |agreement rate (the q144 two-step kernel). q141 answers this
        |WITHIN the rule family; this sheet answers it ACROSS
        |families: a signal whose kills subset another's adds nothing
        |to the cascade; a near-zero both-kill cell is the evidence
        |the families catch independent garbage. Every kill flag is a
        |comparison over its family's bitwise-oracled sheet →
        |all-BIGINT bitwise oracle. Scale shape: the three kernels
        |keep their audited shapes; the join keys 16-byte decision
        |frames (text never re-shuffles); the closing is ONE global
        |24-sum aggregate collapsed map-side, exploded driver-free
        |into 6 rows.""".stripMargin,
      (s, d) => graft.operators.Ensemble.gateAgreement(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(gateAgreementSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q151_rp_distortion",
      """Random-projection (Johnson–Lindenstrauss) distortion audit
        |([[graft.operators.Similarity.rpDistortionAudit]], Dasgupta &
        |Gupta 2003) — the PROJECTION member of the compression-audit
        |family beside q139's SQ8 codes, q129's PQ codes and q149's
        |prefix truncation: every vector projected onto 16 seeded
        |Gaussian directions scaled 1/√16, and per audit query the
        |floor-quantized pairwise squared-distance ratio
        |floor(d_proj²/d_orig²·2^20) with its min/max bounds. The JL
        |lemma says ratios concentrate near 1; this sheet measures the
        |ACTUAL ε on the corpus — the evidence for serving ANN over 16
        |of 64 dims when embeddings lack Matryoshka prefix structure.
        |Projection planes are seeded literals (the q46 convention);
        |distances use the dot identity ‖a−b‖² = ‖a‖²+‖b‖²−2a·b over
        |the bitwise-shared dot kernel, so the sheet oracles exactly.
        |Coincident pairs count n_degenerate, excluded from bounds.
        |Scale shape: projections are 16 map-side dots per vector (the
        |persisted projected index); the audit pair stage is the
        |documented O(|q|·corpus) slice with the query side broadcast
        |and per-vector norms precomputed (2 dots per pair); the
        |closing aggregate collapses map-side onto |q| keys.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        graft.operators.Similarity.rpDistortionAudit(
          e.filter(col("vec_id") < 8), e, kDim = 16, dim = 64)
      },
      Some(AnnRecallOracle.rpDistortionSql())),

    QuerySpec(
      "q152_zipf_audit",
      """Zipf rank–frequency fit ([[graft.operators.Zipf
        |.rankFrequencyFit]], Piantadosi 2014) — the corpus-health
        |sheet beside the drift monitors: natural language reads slope
        |≈ −1 in log–log rank–frequency; template/boilerplate
        |injection flattens the head, dedup bugs steepen it, OCR noise
        |fattens the tail. OLS over (log2q rank, log2q count) for the
        |top 4096 vocabulary terms — the head is where Zipf is
        |sharpest AND the cap bounds every integer sum below 2^56 for
        |any corpus size (counts enter only through the total-domain
        |log2q kernel). Slope ships as the exact integer pair
        |(slope_num, slope_den) plus their single IEEE division (the
        |q90 idiom) — bitwise oracle. Scale shape: ONE token explode
        |collapsing map-side onto term keys (the q51 shape); one
        |vocab-sized rank sort (vocab ≪ corpus, the q89 idiom); the
        |fit touches 4096 24-byte rows and closes in a single-row
        |aggregate.""".stripMargin,
      (s, d) => graft.operators.Zipf.rankFrequencyFit(Tables.documents(s, d)),
      Some(zipfSql(fitRanks = 4096))),

    QuerySpec(
      "q153_gate_rates_by_source",
      """Per-source gate kill rates ([[graft.operators.Ensemble
        |.gateRatesBySource]]) — the acquisition-level ablation the
        |published pipelines publish as their curation table (Dolma's
        |per-source keep fractions; RefinedWeb's removal-rate
        |waterfall): which feed fails which quality family, at what
        |rate, over the held-out slice. Reads the SAME kill frame as
        |q150 (single-sourced, so the global and per-source sheets
        |cannot disagree) rolled up per source with exact two-step
        |fixed-point rates. A source whose nb kill rate towers over
        |its rules rate is machine-generated-looking but rule-clean —
        |the laundered-spam signature; a source all three families
        |kill is a feed to drop at acquisition. All-BIGINT → bitwise
        |oracle. Scale shape: the kill frame's audited shape plus ONE
        |map-side-combined rollup onto source keys; the doc_id join
        |recovering the source column is co-keyed with the frame's
        |own exchanges.""".stripMargin,
      (s, d) => graft.operators.Ensemble.gateRatesBySource(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(gateRatesBySourceSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q154_dup_rates_by_source",
      """Per-source near-dup census ([[graft.operators.Dedup
        |.dupRatesBySource]]) — the dedup-side twin of q153's
        |gate-rate sheet: which feed is redundant, at what rate. The
        |q58 cluster layer (minhash ∪ simhash pair graphs → connected
        |components) joined back to the source column and rolled up
        |per source: pair-graph membership count, q59 drop-set count,
        |and exact two-step fixed-point rates. A source whose dup rate
        |dwarfs the corpus's is a mirror/scrape to drop at
        |acquisition; a dropped rate far below the member rate marks
        |the canonical home its mirrors collapse onto. All-BIGINT →
        |bitwise oracle (the oracle reads the SAME closure CTE as
        |q58/q59, so the census cannot drift from them). Scale shape:
        |the audited q58 shapes plus a broadcast-sized components
        |frame joined back to the corpus and ONE map-side rollup onto
        |source keys.""".stripMargin,
      (s, d) => graft.operators.Dedup.dupRatesBySource(Tables.documents(s, d)),
      Some(ClusterOracle.dupRatesBySourceSql)),

    QuerySpec(
      "q155_source_kl_fingerprint",
      """Per-source KL-divergence fingerprint ([[graft.operators
        |.Mixing.sourceKlDivergence]]) — exact add-1-smoothed
        |KL(P_source ‖ P_corpus) over the engine's hashed-bigram
        |buckets (the q126 DSIR feature space), rolled up per feed:
        |how far each source's token distribution sits from the corpus
        |it feeds. A feed whose KL towers over its peers is
        |machine-generated, non-linguistic, or mislabeled content —
        |flag it at acquisition, before paying to curate it. Every log
        |is the shared 1/64-log2 fixed point (log2qExpr); the closing
        |division truncates toward zero through an explicit sign CASE
        |on both sides → bitwise oracle. Scale shape: bigrams collapse
        |map-side onto (source, bucket) keys before any join (lighter
        |than q126's per-doc exchange); the scoring grid is sources ×
        |buckets — a sheet, never corpus-sized — with the global
        |counts and one-row total broadcast in.""".stripMargin,
      (s, d) => graft.operators.Mixing.sourceKlDivergence(Tables.documents(s, d)),
      Some(DsirOracle.sourceKlSql())),

    QuerySpec(
      "q156_source_length_psi",
      """Per-source length-PSI sheet ([[graft.operators.Drift
        |.lengthPsiBySource]]) — the drift family's member of the
        |acquisition-level ablation: which feed's length PROFILE
        |diverges from the corpus, the form-side complement of q155's
        |content fingerprint (two feeds can share vocabulary yet bin
        |nowhere near each other). Every source binned against the
        |corpus-wide standing deciles (ONE broadcast model row, the
        |q144 artifact) and scored with exactly q144's PSI arithmetic,
        |one row per source with the industry 0.3 alert line. A
        |dominant source reads near-zero by construction — the sheet
        |ranks outlier feeds. All-BIGINT → bitwise oracle. Scale
        |shape: one codegen token-count pass; map-side binning; ONE
        |(source, bin)-keyed exchange; the closing grid is sources ×
        |bins.""".stripMargin,
      (s, d) => graft.operators.Drift.lengthPsiBySource(Tables.documents(s, d)),
      Some(PsiOracle.bySourceSql())),

    QuerySpec(
      "q157_label_separation",
      """Label-separation sheet ([[graft.operators.EmbeddingAudit
        |.labelSeparationSheet]]) — the supervised embedding-health
        |audit: per unordered label pair, the exact-integer dot of the
        |two quantized class centroids and its cosine; per label
        |(diagonal), the within-class scatter. Low off-diagonal |cos|
        |with small within = labels worth learning; a pair at cos ≈ 1
        |is two names for one cluster; a label whose scatter rivals
        |its centroid energy is noise, not a class. Component sums
        |quantize floor(·2^20) per term (q127 convention), centroids
        |divide trunc-toward-zero through an explicit sign CASE, and
        |the one closing IEEE division/sqrt follows the q152 rule →
        |bitwise oracle including the DOUBLE cosine. Scale shape: ONE
        |corpus pass; (label, dim)-keyed map-side-combined sums are
        |the only corpus-driven exchange; everything downstream is
        |labels × dim, broadcast throughout.""".stripMargin,
      (s, d) => graft.operators.EmbeddingAudit.labelSeparationSheet(
        Tables.embeddings(s, d), dim = 64),
      Some(labelSeparationSql(dim = 64))),

    QuerySpec(
      "q158_content_kl_drift",
      """Content-KL ingest-drift monitor, batch twin ([[graft
        |.operators.Drift.contentKlDrift]]) — the content-side
        |sibling of q144's length PSI: the incoming md5 split scored
        |as exact add-1-smoothed KL(P_incoming ‖ P_standing) over the
        |hashed-bigram buckets (q155's arithmetic with the batch in
        |the source seat). Catches what length PSI can't — a feed
        |that starts SAYING something different at the same length
        |(template injection, language flip, upstream encoder
        |change). One closing row (n_bigrams, n_buckets, kl_q,
        |alert); alert at 0.5 bits (kl_q ≥ 32 in 1/64-log2 units).
        |Single-sourced through contentKlModel + klAgainstModel — the
        |streaming monitor's own kernels
        |(StreamingContentDriftSpec pins a streamed batch bitwise).
        |All-BIGINT → bitwise oracle. Scale shape: bigrams collapse
        |map-side onto `buckets` keys (the only corpus-driven
        |exchange); the model is ONE broadcast row; the scoring grid
        |is `buckets` rows.""".stripMargin,
      (s, d) => graft.operators.Drift.contentKlDrift(Tables.documents(s, d)),
      Some(DsirOracle.contentKlSql())),

    QuerySpec(
      "q159_source_scorecard",
      """Feed-triage scorecard ([[graft.operators.Ensemble
        |.sourceScorecard]]) — the acquisition family's capstone: one
        |row per source joining the q153 gate kill rates, q154 dup
        |census, q155 KL fingerprint, q156 length PSI and q193
        |language KL (the minted-label seat — a feed whose TEXT
        |switched language shows here even when every other line
        |holds), so the drop/keep/renegotiate decision about a feed
        |reads off a single relation. Deliberately a composition, not
        |a re-derivation: every column is bitwise its member sheet's
        |value (spec-tied), the oracle composes the five member
        |oracles with the same full-outer joins, and a source absent
        |from the gate sheet carries NULLs, never drops. Scale shape:
        |the five audited member shapes plus four joins on
        |sources-sized frames.""".stripMargin,
      (s, d) => graft.operators.Ensemble.sourceScorecard(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(sourceScorecardSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q160_dup_profile",
      """Duplication profile ([[graft.operators.Dedup
        |.clusterSizeProfile]]) — the cluster-size histogram (Lee et
        |al. 2021's corpus-health reading): per near-dup cluster
        |size, how many clusters and documents, plus the singleton
        |row. The SHAPE of duplication is the diagnosis: a few huge
        |clusters are mirrors (drop the feed — q154 names it); a long
        |size-2/3 tail is boilerplate (scrub units — q115); the
        |size-1 row is the uniqueness mass. All-BIGINT → bitwise
        |oracle reading the SAME closure CTE as q58/q59/q154. Scale
        |shape: the audited q58 cells plus two map-side-combined
        |aggregations over the graph-node-sized components frame and
        |one corpus count.""".stripMargin,
      (s, d) => graft.operators.Dedup.clusterSizeProfile(Tables.documents(s, d)),
      Some(ClusterOracle.clusterSizeProfileSql)),

    QuerySpec(
      "q161_dsir_resample",
      """DSIR importance RESAMPLING ([[graft.operators.Mixing
        |.dsirResample]], Xie et al. 2023) — the APPLY member the
        |weight sheet existed for, closing the mixing family's
        |train→apply convention (q106→q110, q123→q124, q143→q147, now
        |q126→q161): sample 25 % of the corpus without replacement
        |with per-doc probability ∝ 2^(weight_q/64) via the
        |Gumbel-top-k trick the paper itself uses (Kool et al. 2019).
        |The uniform draw is the q55 md5 bucket under an INDEPENDENT
        |'resample' salt; the base-2 Gumbel evaluates in the shared
        |1/64-log2 fixed point (key_q = weight_q + 384 − log2q(eq+1),
        |eq = log2q(1001) − log2q(bucket+1) — same monotone structure
        |as the natural-log Gumbel key; the 1/64 quantization draws
        |the noise from 1000 fixed-point levels, a deterministic
        |approximation of the paper's sampler, not an exact
        |equivalence); the budget cut is the exact discrete
        |percentile (q60 pin) with a STRICT > keep. All-BIGINT →
        |bitwise oracle. MixingSpec proves the point of it: the kept
        |mix's KL-to-target (the q158 kernel) drops strictly below
        |the raw corpus's on a planted two-distribution fixture.
        |Scale shape: q126's audited weight shape; Gumbel keys are
        |map-side; the scored frame materializes ONCE (it feeds cut
        |and filter); the cut is DISTRIBUTED radix select
        |([[graft.operators.Quantiles.globalQuantileDisc]] — four
        |map-side histogram passes, sheet-sized exchanges, NO
        |single-partition sort whatever the key distribution); the
        |keep filter broadcasts the one-row cut.""".stripMargin,
      (s, d) => graft.operators.Mixing.dsirResample(
        Tables.documents(s, d), budgetPermille = 250),
      Some(DsirOracle.resampleSql(budgetPermille = 250))),

    QuerySpec(
      "q162_feed_policy",
      """Feed-policy verdicts ([[graft.operators.Ensemble
        |.feedPolicy]]) — the APPLY member of the acquisition family:
        |thresholds over the q159 scorecard columns become one
        |per-source keep / downweight / drop verdict, the decision the
        |scorecard existed to inform. Drop lines: dup_rate_q ≥ 2^19 (a
        |mirror) or kl_q ≥ 192 (3 bits/bigram — alien content); damp
        |lines: the q156 PSI alert, rules-kill ≥ ~0.8, or the q193
        |lang KL ≥ 128 (2 bits/doc of minted-label divergence — the
        |mislabeled-language feed no other line can see; EnsembleSpec
        |plants one and proves only this seat damps it). The verdict
        |column is BY CONSTRUCTION a CASE over q159 (the oracle embeds
        |the q159 composition verbatim), so policy and evidence cannot
        |disagree; a source with NULL metrics keeps (NULL comparisons
        |never fire — both engines identically). EnsembleSpec proves
        |the ACT side end-to-end: a planted mirror feed drops from
        |[[graft.operators.Ensemble.applyFeedPolicy]]'s filtered
        |corpus. Scale shape: exactly q159's audited composition plus
        |one map-side CASE on the sources-sized sheet.""".stripMargin,
      (s, d) => graft.operators.Ensemble.feedPolicy(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(feedPolicySql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q163_resample_mix",
      """Per-source composition of the q161 resampled mixture
        |([[graft.operators.Mixing.resampleComposition]]) — the q76
        |reading of DSIR's output: per feed, docs in, docs the
        |importance resample kept, the exact two-step fixed-point
        |keep rate, and the kept weight mass. DSIR's whole point is
        |that the kept SHARE shifts toward target-flavored feeds —
        |this sheet is where the shift is visible and reviewable
        |before training on the mix. All-BIGINT → bitwise oracle (the
        |oracle embeds the q161 chain verbatim, so the sheet cannot
        |drift from the keep-set). Scale shape: q161's audited shape
        |plus two sources-sized map-side rollups and one broadcast
        |left join.""".stripMargin,
      (s, d) => graft.operators.Mixing.resampleComposition(
        Tables.documents(s, d), budgetPermille = 250),
      Some(DsirOracle.resampleCompositionSql(budgetPermille = 250))),

    QuerySpec(
      "q164_policy_act",
      """The ACTED corpus under the q162 feed policy ([[graft
        |.operators.Ensemble.applyFeedPolicy]]) — the artifact a
        |release build actually consumes, oracled doc-by-doc: 'drop'
        |sources vanish, 'downweight' sources keep their deterministic
        |md5-bucket half (the q55 idiom under the 'downweight' salt —
        |stable under incremental loads), 'keep' sources pass whole,
        |NULL doc_ids never emit (no identity to sample by).
        |LOAD-BEARING NULL RULE a release owner must know: a source
        |ABSENT from the verdict sheet — never audited, or carrying
        |all-NULL metrics — passes WHOLE. Policy only acts on
        |measured evidence; an unseen feed is the next audit's
        |problem, not a silent drop, at the batch act and at the
        |ingest gate identically (both close through actOnVerdicts).
        |The
        |oracle embeds the q162 verdict CTE verbatim and replays the
        |bucket filter, so every per-doc keep decision — the CASE, the
        |NULL-verdict keep rule, the damp sample — pins bitwise.
        |[[graft.streaming.Curation.feedPolicyGate]] is this exact
        |kernel at ingest (StreamingPolicyGateSpec). Scale shape:
        |q162's audited composition once on the sources-sized
        |evidence; the corpus-side act is ONE broadcast verdict join
        |plus a map-side bucket filter — the corpus never
        |shuffles.""".stripMargin,
      (s, d) => graft.operators.Ensemble.applyFeedPolicy(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4"))
        .select(col("doc_id"), col("source")),
      Some(policyActSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q165_token_budget_resample",
      """TOKEN-budget DSIR resample ([[graft.operators.Mixing
        |.dsirResampleTokens]]) — q161 with the budget in the unit
        |mixture papers actually allocate (tokens, not documents — a
        |doc-count budget over-represents long documents' mass): rank
        |by the same deterministic Gumbel key, keep the longest prefix
        |whose cumulative q24/q144 token count stays within 25 % of
        |the corpus total, tested by the exact integer
        |cross-multiplication cum·1000 ≤ total·250 (no division, no
        |rounding ambiguity; an over-long doc past the cap drops even
        |if its key ranks — the budget is a hard cap). All-BIGINT →
        |bitwise oracle (the q161 scored chain shared verbatim; the
        |oracle states the rule as a ROWS-framed window, the engine
        |computes the identical set distributedly). Scale shape: the
        |q126-audited weights + map-side keys materialized once; the
        |budget boundary is radix-LOCATED
        |([[graft.operators.Quantiles.radixLocate]] — four map-side
        |token-mass histogram passes, NO single-partition sort);
        |rows above the boundary key keep by one broadcast
        |comparison; the boundary key's tie group splits its residual
        |by a SECOND radix locate over doc_id — no window serializes
        |the collision set either (it is ~n/60 worst case: the Gumbel
        |noise quantizes through two 1/64 logs to ~230 effective
        |levels, measured in MixingSpec's full-duplicate
        |spec). API NOTE (r15): the doc_id tie-split requires a
        |BIGINT doc_id — a deliberate narrowing to the engine-wide
        |BIGINT id convention; string-id callers must mint a BIGINT
        |key first (the README id-convention section).""".stripMargin,
      (s, d) => graft.operators.Mixing.dsirResampleTokens(
        Tables.documents(s, d), tokenBudgetPermille = 250),
      Some(DsirOracle.resampleTokensSql(tokenBudgetPermille = 250))),

    QuerySpec(
      "q166_policy_operating_points",
      """Feed-policy OPERATING POINTS ([[graft.operators.Ensemble
        |.feedPolicyOperatingPoints]]) — the q147 evidence sheet for
        |the q162 drop lines: candidate thresholds are the EXACT
        |deciles of the scorecard's own dup_rate_q / kl_q columns
        |(percentile_disc selection — existing values, never invented
        |constants), crossed into a ≤ 9×9 grid; per cell the q162
        |CASE replays and the sheet reports sources/docs dropped,
        |damped, kept, and the kept KL-to-corpus mass Σ kl_q·n_docs —
        |the curve whose knee a release owner reads instead of
        |trusting the shipped 2^19/192 defaults. All SELECTED BIGINTs
        |and BIGINT rollups → bitwise oracle (the q159 composition
        |embedded verbatim, the established pattern). Scale shape:
        |the q159 composition runs once and materializes
        |(sources-sized); deciles and sweep touch that sheet crossed
        |with a broadcast ≤ 81-row grid — nothing corpus-sized
        |moves.""".stripMargin,
      (s, d) => graft.operators.Ensemble.feedPolicyOperatingPoints(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4")),
      Some(feedPolicyOperatingPointsSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q167_policy_release",
      """Policy→release capstone — [[graft.operators.Ensemble
        |.applyFeedPolicy]] composed in FRONT of the q71 release build:
        |the full acquisition→curation→release chain in one oracled
        |relation. The q162 verdicts act on the raw corpus (drop
        |feeds vanish, damped feeds keep their md5-bucket half), and
        |the ENTIRE release machinery — per-source cap, train split,
        |near-dup keep-set over the minhash∪simhash pair graph,
        |decontamination, PII redaction — runs on the acted corpus
        |(the shared [[corpusBuild]] chain, so q71 and q167 cannot
        |drift). The oracle chains the q164 CTE into the q71 chain
        |verbatim. Scale shape: the q162 evidence runs once on
        |sources-sized sheets; the act is one broadcast join + a
        |map-side bucket filter; downstream stages keep their audited
        |banded/bucketed shapes over the (smaller) acted
        |corpus.""".stripMargin,
      (s, d) => corpusBuild(graft.operators.Ensemble.applyFeedPolicy(
        Tables.documents(s, d),
        col("source").isin("src0", "src1", "src2", "src3", "src4"))),
      Some(policyReleaseSql(
        "source IN ('src0','src1','src2','src3','src4')"))),

    QuerySpec(
      "q168_resample_budget_sweep",
      """Resample BUDGET SWEEP ([[graft.operators.Mixing
        |.resampleBudgetSweep]]) — the q166 convention applied to the
        |resample family's own bare constant: budgetPermille ships as
        |a hand-picked 250, so the q161 keep rule sweeps the whole
        |decile grid (100‰…900‰) and reports per budget the exact
        |percentile cut, docs kept, q24/q144 tokens kept, and the
        |kept importance mass Σ weight_q — the curve whose knee a
        |mixture owner reads instead of trusting the shipped
        |constant. Corpus totals repeat per row so keep fractions
        |read off the sheet; budget rows never vanish (empty corpus →
        |nine all-zero rows, NULL cuts). Every row ties bitwise to
        |q161 at that budget (same scored chain, same STRICT > keep);
        |all-BIGINT → bitwise oracle. Scale shape: the scored frame
        |materializes once; the nine cuts SHARE the radix kernel's
        |four histogram passes (multi-target locate); the sweep is
        |ONE map-side pass — cuts are nonincreasing in budget, so
        |kept-sets are NESTED and each row classifies once into the
        |smallest budget that keeps it, nine cells closing by a 9-row
        |cumulative window. No 9× corpus scan, no per-budget shuffle,
        |nothing corpus-sized moves.""".stripMargin,
      (s, d) => graft.operators.Mixing.resampleBudgetSweep(
        Tables.documents(s, d)),
      Some(DsirOracle.budgetSweepSql())),

    QuerySpec(
      "q169_resample_release",
      """Resample→release capstone — [[graft.operators.Mixing
        |.dsirResample]] composed in FRONT of the q71 release build,
        |the mixing twin of q167: the q161 importance keep-set (25 %
        |doc budget) selects the corpus, and the ENTIRE release
        |machinery — per-source cap, train split, near-dup keep-set
        |over the minhash∪simhash pair graph, decontamination, PII
        |redaction — runs on the resampled corpus through the one
        |shared [[corpusBuild]] chain (q71, q167 and q169 cannot
        |drift). The acquisition seat (q167) acts on FEED verdicts;
        |this seat acts on PER-DOC importance — the two composable
        |fronts a release owner chooses between (or chains). The
        |oracle embeds the q161 keep CTE, joins documents back for
        |lang/text, and re-roots the q71 chain on the resampled
        |corpus. Scale shape: q161's audited radix shape once; the
        |keep join is doc_id-keyed on the (smaller) kept set;
        |downstream stages keep their audited banded/bucketed shapes
        |over the resampled corpus.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        corpusBuild(docs.join(
          graft.operators.Mixing.dsirResample(docs, budgetPermille = 250)
            .select(col("doc_id")), "doc_id"))
      },
      Some(resampleReleaseSql(budgetPermille = 250))),

    QuerySpec(
      "q170_interleave_manifest",
      """Mixture-interleaved TRAINING ORDER ([[graft.operators.Mixing
        |.interleaveManifest]]) — the step after q102: every
        |epoch-appearance of the 1200-budget allocation gets a
        |stride-scheduled position key on a 2^62-slot grid
        |(appearance j of a source with quota alloc lands at
        |j·(GRID DIV alloc) + stride DIV 2 — the closed form of
        |Megatron-LM's blendable-dataset greedy, Waldspurger &
        |Weihl 1995's stride scheduling), so reading in (pos_key,
        |source, appearance) order yields a training stream carrying
        |every source at ~its allocated share in EVERY prefix — the
        |guarantee an md5 shuffle gives only in expectation. Within a
        |source the order is epoch-major over the md5-rank lattice
        |(appearance = epoch·n_items + rank−1), so repeats of a doc
        |sit ~n_items apart. All BIGINT on the q102 total order —
        |bitwise-oracled. Scale shape: q102's audited plan (pruned
        |quota pass, broadcast quotas, ONE group-key shuffle) plus
        |per-row key arithmetic; no global sort — a trainer
        |range-partitions by pos_key at write time.""".stripMargin,
      (s, d) => graft.operators.Mixing.interleaveManifest(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 1200L),
      Some(s"""WITH ${interleaveChainSql(1200L)}
             |SELECT doc_id, source, n_tokens, epoch, appearance, pos_key
             |FROM manifest""".stripMargin)),

    QuerySpec(
      "q171_interleave_mix_audit",
      """Interleave ACCEPTANCE SHEET ([[graft.operators.Mixing
        |.interleaveMixAudit]]) — per position block of the q170
        |order, is the stream actually mixed at the allocated shares?
        |The 2^62 grid is cut into 16 equal slices MAP-SIDE (pos_key
        |is already a grid coordinate — no global rank is ever
        |computed) and each (block, source) cell reports its
        |appearance count, within-block share, allocated target
        |share, and signed deviation, all exact 2^20 fixed-point floor
        |divisions of the manifest's own counts (targets re-derived
        |by summation, not re-joined — one definition, nothing to
        |drift). The stride lattice bounds the deviation at ±1
        |appearance per source per block edge; a trainer reads this
        |sheet before shipping shards because a badly mixed order
        |shows up as loss spikes only after GPUs are spent. Scale
        |shape: the manifest's audited plan + a map-side block
        |projection + ONE map-side-combined (block, source) agg +
        |three windows over the 16×sources SHEET (the deliberate
        |sheet-sized-total pattern).""".stripMargin,
      (s, d) => graft.operators.Mixing.interleaveMixAudit(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 1200L, nBlocks = 16),
      Some(s"""WITH ${interleaveChainSql(1200L)},
             |${interleaveAuditTailSql(16)}""".stripMargin)),

    QuerySpec(
      "q172_cluster_balanced_sample",
      """Cluster-BALANCED diversity sample ([[graft.operators
        |.Similarity.clusterBalancedSample]]) — the q98/q101 Hamilton
        |allocation lifted from provenance strata to CONTENT strata:
        |embeddings partition into the q49 k-means cells (16 seed
        |centroids, the deterministic vec_id < nlist sample), a
        |137-vector budget allocates across cells ∝ √cell-mass (the
        |α=1/2 temperature stance — natural-frequency sampling
        |reproduces the corpus's mode collapse; √mass flattens
        |dominant modes and over-represents rare content regions, the
        |SemDeDup cell-partitioned curation rationale), and each
        |cell's quota executes by md5-rank of vec_id — the kept set a
        |pure function of the data. Budget 137 over 16 cells forces
        |base quotas plus largest-remainder seats (the q101 tie-break
        |path) on cell-count strata. Scale shape: the audited
        |map-side argmax assignment (one exchange row per vector), a
        |quota pass over the nlist-sized census, one broadcast quota
        |join + the per-cell ranking window; nlist scales ~√N so no
        |task sorts more than ~√N ids.""".stripMargin,
      (s, d) => graft.operators.Similarity.clusterBalancedSample(
        Tables.embeddings(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 16),
        budget = 137L),
      Some(IvfOracle.clusterBalancedSampleSql(
        nlist = 16, dim = 64, budget = 137L))),

    QuerySpec(
      "q173_epoch_plan",
      """Token-budget EPOCH PLAN ([[graft.operators.Mixing
        |.epochPlanSheet]]) — the data-constrained-scaling sheet
        |(Muennighoff et al. 2023): a 110k-token budget exceeds every
        |source's mass (~27k corpus tokens at sf0.01), so the α=1/2
        |mixture wants each source repeated alloc/n_tokens epochs —
        |but repeated data decays past ~4 epochs, so the sheet
        |reports per source the Hamilton token allocation, the
        |implied 1/64-fixed-point epoch count, the
        |ceiling-respecting spend, and the stranded budget a planner
        |must reallocate (re-run on the uncapped survivors — the
        |q101 no-redistribution convention). The 110k budget lands
        |~13 sources capped and ~7 under the ceiling, exercising
        |both paths. All BIGINT (alloc·64 and 256·n_size headroom
        |documented) — bitwise-oracled. Scale shape: exactly q98's
        |audited plan (one map-side-combined corpus agg + windows
        |over the per-source sheet) plus per-row closing
        |arithmetic.""".stripMargin,
      (s, d) => graft.operators.Mixing.epochPlanSheet(
        Tables.documents(s, d).select(col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "source", "n_tokens", budgetTokens = 110000L),
      Some("""WITH per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
             |    CAST(sum(len(string_split_regex(coalesce(text, ''), '\s+'))) AS BIGINT) AS n_size
             |  FROM documents GROUP BY 1),
             |q AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
             |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM q),
             |b AS (SELECT source, n_items, n_size, s_q,
             |    (110000 * s_q) // s AS base,
             |    110000 * s_q - ((110000 * s_q) // s) * s AS rem
             |  FROM q, tot),
             |l AS (SELECT CAST(110000 - sum(base) AS BIGINT) AS leftover FROM b),
             |a AS (SELECT source, n_items, n_size, s_q, base + CASE WHEN
             |      CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) <= leftover
             |    THEN 1 ELSE 0 END AS alloc FROM b, l),
             |c AS (SELECT source, n_items, n_size, s_q, alloc,
             |    CASE WHEN n_size > 0 THEN (alloc * 64) // n_size END AS epochs_q,
             |    CASE WHEN n_size > 0 THEN least(alloc, (256 * n_size) // 64)
             |      ELSE CAST(0 AS BIGINT) END AS eff_tokens
             |  FROM a)
             |SELECT source, n_items, n_size, s_q,
             |  CAST(alloc AS BIGINT) AS alloc_tokens,
             |  CAST(epochs_q AS BIGINT) AS epochs_q,
             |  CAST(eff_tokens AS BIGINT) AS eff_tokens,
             |  CAST(alloc - eff_tokens AS BIGINT) AS unused_tokens,
             |  CAST(CASE WHEN alloc > eff_tokens THEN 1 ELSE 0 END AS BIGINT) AS capped
             |FROM c""".stripMargin)),

    QuerySpec(
      "q174_interleaved_shards",
      """Interleaved SHARD MANIFEST ([[graft.operators.SequencePack
        |.interleavedShardManifest]]) — the packing step a trainer
        |runs after q170: the epoch-appearances concatenate in
        |(pos_key, source, appearance) stride order and chop into
        |2048-token packs, 16 packs per shard (the q99 sheet shape:
        |appearance count, token mass, widest span, trailing-boundary
        |crossers) plus n_sources — the distinct feeds each shard
        |carries, the column that SHOWS the interleave landed (a
        |doc-id-order pack of a source-clustered corpus reads 1 here;
        |the stride order reads ~every allocated source in every
        |shard, so per-shard loss is an unbiased estimate of
        |full-mixture loss). The prefix sum is the q65 two-level
        |kernel over the GRID coordinate (buckets = pos_key DIV 2^42 —
        |the only single-partition window is the ≤2^20-row bucket
        |frame, never appearance-count-sized); integer end-to-end, so
        |the decomposition is bitwise the oracle's global scan. Scale
        |shape: q170's audited plan + ONE bucket-keyed exchange over
        |the budget-bounded manifest + a map-side shard
        |rollup.""".stripMargin,
      (s, d) => graft.operators.SequencePack.interleavedShardManifest(
        graft.operators.Mixing.interleaveManifest(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
          "doc_id", "source", "n_tokens", budget = 1200L),
        "source", capacity = ManifestCapacity,
        packsPerShard = ManifestPacksPerShard),
      Some(s"""WITH ${interleaveChainSql(1200L)},
             |ord AS (SELECT source, n_tokens, appearance, pos_key,
             |    CAST(coalesce(sum(n_tokens) OVER (
             |      ORDER BY pos_key, source, appearance
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
             |  FROM manifest),
             |p AS (SELECT source, n_tokens,
             |    cb // $ManifestCapacity AS pack_first,
             |    (cb + greatest(n_tokens, 1) - 1) // $ManifestCapacity AS pack_last
             |  FROM ord)
             |SELECT pack_first // $ManifestPacksPerShard AS shard,
             |  CAST(count(*) AS BIGINT) AS n_appearances,
             |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |  CAST(max(pack_last - pack_first + 1) AS BIGINT) AS max_span,
             |  CAST(sum(CASE WHEN pack_last // $ManifestPacksPerShard <> pack_first // $ManifestPacksPerShard
             |    THEN 1 ELSE 0 END) AS BIGINT) AS boundary_crossers,
             |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
             |FROM p GROUP BY 1""".stripMargin)),

    QuerySpec(
      "q175_cluster_sample_sheet",
      """Cluster-balanced-sample ACCEPTANCE SHEET ([[graft.operators
        |.Similarity.clusterBalancedSampleSheet]]) — the family
        |convention that every APPLY ships with its evidence (q147
        |for the classifier, q166 for the feed policy, q168/q171 for
        |the resample and interleave): one row per q172 k-means cell
        |with population, Hamilton quota, executed keep count
        |(min(alloc, n_vecs) by construction — spec-pinned to the
        |actual q172 sample's per-cell counts), and the two 2^20
        |fixed-point shares the flattening claim is MADE of: the
        |cell's corpus share vs its share of the kept sample. A
        |dominant cell reads kept < natural (damped), a rare cell
        |kept > natural (boosted) — the √-mass contract, checkable
        |per cell before the sample ships. All BIGINT → bitwise
        |oracle (the q172 assignment + Hamilton chain closing as the
        |sheet). Scale shape: q172's audited plan minus the ranking
        |window (quotas need no per-vector rank) — map-side argmax,
        |nlist-sized quota pass, two windows over the cell
        |SHEET.""".stripMargin,
      (s, d) => graft.operators.Similarity.clusterBalancedSampleSheet(
        Tables.embeddings(s, d),
        Tables.embeddings(s, d).filter(col("vec_id") < 16),
        budget = 137L),
      Some(IvfOracle.clusterBalancedSampleSheetSql(
        nlist = 16, dim = 64, budget = 137L))),

    QuerySpec(
      "q176_policy_training_order",
      """Policy→TRAINING-ORDER capstone — the q167 convention extended
        |one stage past the release table, all the way to the
        |trainer's work order: the q162 feed verdicts act on the raw
        |corpus ([[graft.operators.Ensemble.applyFeedPolicy]] — drop
        |feeds vanish, damped feeds keep their md5-bucket half), the
        |acted corpus allocates and interleaves through the q179
        |EPOCH-CAPPED stride schedule (the policy shrinks the corpus
        |under a fixed 1200 budget — exactly the regime that pushes
        |boosted small survivors past the Muennighoff 4-epoch decay
        |ceiling, so the capstone ships the capped allocation, not
        |the raw q170 one), and the q174 pack kernel emits the shard
        |manifest the trainer consumes — acquisition evidence →
        |policy act → capped mixture allocation → training order →
        |shard work-order in ONE oracled relation (the oracle chains
        |the q164 acted CTE into the recursive capped chain re-rooted
        |on it, then the pack closing, all verbatim — no stage can
        |drift from its standalone query). Scale shape: q164's
        |audited act (sources-sized evidence + one broadcast join +
        |map-side bucket filter), then q179's audited plan over the
        |(smaller) acted corpus — one corpus agg + sheet-round
        |fixpoint + the q170 tail — then the budget-bounded
        |pack.""".stripMargin,
      (s, d) => {
        val acted = graft.operators.Ensemble.applyFeedPolicy(
          Tables.documents(s, d),
          col("source").isin("src0", "src1", "src2", "src3", "src4"))
        graft.operators.SequencePack.interleavedShardManifest(
          graft.operators.Mixing.cappedInterleaveManifest(
            acted.select(col("doc_id"), col("source"),
              TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                .as("n_tokens")),
            "doc_id", "source", "n_tokens", budget = 1200L,
            maxEpochs64 = 256L),
          "source", capacity = ManifestCapacity,
          packsPerShard = ManifestPacksPerShard)
      },
      Some(s"""WITH RECURSIVE acted AS MATERIALIZED (
             |${policyActSql("source IN ('src0','src1','src2','src3','src4')",
                 selectCols = "d.doc_id, d.source, d.text")}
             |),
             |${cappedInterleaveChainSql(1200L, 256L, from = "acted")},
             |$packShardClosingSql""".stripMargin)),

    QuerySpec(
      "q177_curriculum_order",
      """Quality-CURRICULUM training order ([[graft.operators.Mixing
        |.phasedInterleave]] over the q125 LM-quality buckets) — the
        |anneal-the-cleanest-last schedule: the corpus's own CCNet
        |buckets become phases (tail=0 read first, middle=1, head=2
        |last; 'empty' docs have nothing to train on and are
        |excluded), the 2^62 grid splits into three slices, phase
        |budgets are the PROPORTIONAL Hamilton split of the 1200
        |budget over phase token mass (the curriculum reorders, it
        |does not rebalance phases), and within each phase the q170
        |stride interleave runs per source — so phases can NEVER
        |interleave with each other while every within-phase prefix
        |still carries every source at its allocated share. All
        |BIGINT on (phase, source)-keyed totals — bitwise-oracled
        |(the q125 recursive chain embedded verbatim, then the
        |phased allocation replayed). Scale shape: q125's audited
        |scoring once, then q170's audited plan with strictly FINER
        |window partitions ((phase, source) keys) and two extra
        |sheet-sized Hamilton passes. ADJUDICATION (r16): this
        |curriculum deliberately keeps the GLOBAL q125 buckets — its
        |subject is the anneal order under the corpus's own model,
        |and re-phasing on q194's per-language buckets would change
        |which docs anneal last without exercising any machinery
        |q183/q194 don't already oracle; a per-language curriculum IS
        |buildable today with zero new code — pass q194's per-lang
        |bucket as phaseCol exactly as this query passes q125's — and
        |a production multilingual run should.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val phases = graft.operators.Phrases.lmQualityBuckets(docs, "text")
          .select(col("doc_id"),
            when(col("bucket") === "tail", 0L)
              .when(col("bucket") === "middle", 1L)
              .when(col("bucket") === "head", 2L).as("phase"))
          .filter(col("phase").isNotNull)
        graft.operators.Mixing.phasedInterleave(
          docs.join(phases, "doc_id")
            .select(col("doc_id"), col("source"), col("phase"),
              TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                .as("n_tokens")),
          "doc_id", "source", "n_tokens", "phase", nPhases = 3,
          budget = 1200L)
      },
      Some(curriculumOrderSql(1200L))),

    QuerySpec(
      "q178_incremental_cluster_sample",
      """Incremental cluster-balanced sample ([[graft.operators
        |.Similarity.incrementalClusterSample]]) — the q114
        |frozen-decision convention applied to q172, completing the
        |incremental family for the sampling member (q68 minhash,
        |q82 IVF drift, q105 clusters, q109 BPE, q114 SemDeDup, q119
        |boilerplate): the incoming batch (q68's md5 membership,
        |is_new ⇔ bucket < 100) is admitted against the STANDING
        |sample without displacing it — standing census fixes the
        |per-cell Hamilton quotas, standing kept is frozen at
        |min(alloc, n_standing), and a new vector keeps iff its md5
        |rank within the batch's cell cohort fits the cell's RESIDUAL
        |seats. Deliberate inversion vs q164's pass-whole rule: a
        |frozen ALLOCATION admits nothing outside its census — new
        |mass in an unallocated or at-quota cell reads kept = 0, and
        |that rejected mass is the q82 refresh signal. Output: the
        |batch's (vec_id, cell, kept) disposition, the q114 shape.
        |All-BIGINT admission over engine-shared cosines → bitwise
        |oracle. Scale shape: one materialized argmax pass over the
        |frame; quotas on the nlist-sized standing census; the batch
        |ranks within cohorts bounded by the batch, never the
        |corpus.""".stripMargin,
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val flagged = graft.operators.Sampling.withSplitBucket(e, "vec_id")
          .withColumn("is_new", col("__bucket") < 100).drop("__bucket")
        val oldSide = flagged.filter(!col("is_new"))
        graft.operators.Similarity.incrementalClusterSample(
          flagged, "is_new", oldSide.filter(col("vec_id") < 16),
          budget = 137L)
      },
      Some(IvfOracle.incrementalClusterSampleSql(
        nlist = 16, dim = 64, budget = 137L, newPermille = 100))),

    QuerySpec(
      "q179_capped_interleave",
      """Epoch-CEILING-capped training order ([[graft.operators.Mixing
        |.cappedInterleaveManifest]]) — the q173 Muennighoff ceiling
        |ENFORCED in the q170 interleave allocation, closing the gap
        |between the plan sheet and the shipped order: every source's
        |quota caps at (256·n_items) DIV 64 = 4 epochs, the stranded
        |budget REDISTRIBUTES over the uncapped survivors by the same
        |largest-remainder rule iterated to fixpoint (capped set grows
        |monotonically — ≤ sources rounds; this corpus converges in
        |4: budget 2000 over ~25-doc sources lands 18 capped and 2
        |open, Σ alloc = 2000 conserved), and the stride-manifest
        |tail is q170's own shared definition — at cap = ∞ the order
        |is bitwise q170 (MixingSpec pins it). All BIGINT: the oracle
        |replays the fixpoint as a recursive CTE (each step holds
        |caps, Hamilton-allocates the residual, caps strict
        |violators, stops when none) into the shared manifest tail.
        |Scale shape: ONE corpus agg into the materialized
        |sources-sized sheet, fixpoint rounds as sheet-only windows
        |(never corpus rows), then q170's audited tail — broadcast
        |quotas, ONE group-key shuffle, budget-bounded
        |explode.""".stripMargin,
      (s, d) => graft.operators.Mixing.cappedInterleaveManifest(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 2000L, maxEpochs64 = 256L),
      Some(s"""WITH RECURSIVE ${cappedInterleaveChainSql(2000L, 256L)}
             |SELECT doc_id, source, n_tokens, epoch, appearance, pos_key
             |FROM manifest""".stripMargin)),

    QuerySpec(
      "q180_curriculum_mix_audit",
      """Curriculum ACCEPTANCE SHEET ([[graft.operators.Mixing
        |.phasedMixAudit]]) — the family convention that every APPLY
        |ships its evidence (q147 classifier, q166 policy, q168/q171
        |resample/interleave), closing the one member that shipped
        |without it: per (phase, block, source) of the q177 order, is
        |each PHASE SLICE internally mixed at its allocated shares?
        |Each phase's grid slice cuts into 8 equal sub-slices
        |MAP-SIDE (pos_key arithmetic — no global rank), and every
        |cell reports its appearance count, within-block share, the
        |source's within-PHASE allocated share, and the signed
        |deviation — targets re-derived from the manifest by
        |summation (the q171 one-definition rule). Phases never
        |interleave with each other, so only this per-phase reading
        |catches a slice that degenerated to a provenance-sorted
        |slab — a bad phase mix is otherwise invisible until
        |training. Exact 2^20 fixed-point shares — bitwise oracle
        |(the shared q177 chain closed by the audit rollup). Scale
        |shape: q177's audited plan + a map-side block projection +
        |ONE map-side-combined (phase, block, source) agg + three
        |windows over the 3×8×sources SHEET.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val phases = graft.operators.Phrases.lmQualityBuckets(docs, "text")
          .select(col("doc_id"),
            when(col("bucket") === "tail", 0L)
              .when(col("bucket") === "middle", 1L)
              .when(col("bucket") === "head", 2L).as("phase"))
          .filter(col("phase").isNotNull)
        graft.operators.Mixing.phasedMixAudit(
          docs.join(phases, "doc_id")
            .select(col("doc_id"), col("source"), col("phase"),
              TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                .as("n_tokens")),
          "doc_id", "source", "n_tokens", "phase", nPhases = 3,
          budget = 1200L, nBlocks = 8)
      },
      Some(curriculumMixAuditSql(1200L, nBlocks = 8))),

    QuerySpec(
      "q181_langid_confusion",
      """Language-ID confusion sheet ([[graft.operators.LangId
        |.langIdConfusion]]) — the first gate CCNet applies, derived
        |from TEXT instead of trusting the upstream label: the q143
        |closed-form NB kernel lifted from 2 classes to K over hashed
        |CHAR-TRIGRAM features (Cavnar & Trenkle 1994; the fastText
        |lang-ID feature family), trained on the md5 split's first
        |half, every held-out doc argmax-scored (integer log-joint in
        |1/64-log2 fixed point, ties by class name), rolled up as the
        |(labeled, predicted) confusion sheet — the q143 evidence
        |convention for the multi-class member. On THIS corpus the
        |labels are synthetic and text-independent, so the sheet
        |shows the honest near-uniform confusion a mislabeled feed
        |would show (exactly the reading the sheet exists for);
        |LangIdSpec proves separability on a planted bilingual
        |fixture. All BIGINT scores with deterministic tiebreak →
        |bitwise oracle. Scale shape: map-side trigram assembly
        |collapsing onto (doc, bucket) keys; the ≤ buckets×K model
        |sheet and K-row constants broadcast; the only corpus-sized
        |exchanges key on doc_id (feature sums + the docs×K argmax
        |window); the confusion rollup is ≤ K² map-side-combined
        |keys.""".stripMargin,
      (s, d) => graft.operators.LangId.langIdConfusion(
        Tables.documents(s, d)),
      Some(LangIdOracle.confusionSql())),

    QuerySpec(
      "q182_interleave_increment",
      """Incremental interleave member ([[graft.operators.Mixing
        |.interleaveIncrement]]) — the q178 frozen-decision convention
        |for the training-order family, completing its incremental
        |set: the standing corpus (q68 md5 membership, is_new ⇔
        |bucket < 100) freezes the 500-budget q170 quotas and
        |strides; the incoming batch's items rank within their source
        |cohort and PATCH the standing order's repeat slots
        |(appearances n_standing…alloc−1, earliest first — a fresh
        |doc is worth more than an epoch ≥ 1 re-read, Muennighoff
        |2023), keeping each slot's frozen pos_key so the loader
        |swaps content by position without re-keying anything.
        |Admission stops at the residual capacity; sources outside
        |the standing census admit nothing (the q178 rule), and the
        |rejected mass is the q82 refresh signal. Budget 500 over
        |~450 standing docs leaves ~0–3 repeat slots per source
        |against ~2–3 arrivals — both dispositions exercised. All
        |BIGINT on the md5 total order → bitwise oracle (standing
        |allocation CTEs re-rooted on the standing split + the batch
        |cohort rank + the admission arithmetic). Scale shape:
        |pruned standing quota pass, quota sheet broadcast onto the
        |batch, ONE batch-sized group-key shuffle for the cohort
        |rank; the standing manifest is never read or
        |re-keyed.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"))
        val flagged = graft.operators.Sampling.withSplitBucket(docs, "doc_id")
        graft.operators.Mixing.interleaveIncrement(
          flagged.filter(col("__bucket") >= 100).drop("__bucket"),
          flagged.filter(col("__bucket") < 100).drop("__bucket"),
          "doc_id", "source", "n_tokens", budget = 500L)
      },
      Some(interleaveIncrementSql(500L))),

    QuerySpec(
      "q183_capped_curriculum",
      """Epoch-capped CURRICULUM order ([[graft.operators.Mixing
        |.cappedPhasedInterleave]]) — the q179 ceiling lifted into the
        |q177 curriculum, closing the same day-one gap inside each
        |phase: per (phase, source) cohort the quota caps at
        |(256·n_items) DIV 64 = 4 epochs and each phase's stranded
        |budget redistributes over ITS OWN uncapped survivors by the
        |iterated largest-remainder fixpoint (phases never trade
        |budget — the proportional phase split stands; all fixpoint
        |windows are phase-partitioned over ONE materialized
        |(phase, source) sheet, rounds bounded by the deepest
        |single-phase cascade). The 1500 budget over ~8-doc cohorts
        |pushes boosted small cohorts past 4 epochs while large ones stay open, so both
        |dispositions exercise. At cap = ∞ this is bitwise q177; at
        |nPhases = 1 it is bitwise q179 (MixingSpec pins both). All
        |BIGINT → bitwise oracle: the q177 chain with the fixpoint as
        |a phase-PARTITIONED recursive CTE into the shared curriculum
        |tail. Scale shape: q177's audited plan with the quota pass
        |replaced by sheet-round fixpoint windows — nothing
        |corpus-sized moves that the uncapped curriculum didn't
        |already move.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val phases = graft.operators.Phrases.lmQualityBuckets(docs, "text")
          .select(col("doc_id"),
            when(col("bucket") === "tail", 0L)
              .when(col("bucket") === "middle", 1L)
              .when(col("bucket") === "head", 2L).as("phase"))
          .filter(col("phase").isNotNull)
        graft.operators.Mixing.cappedPhasedInterleave(
          docs.join(phases, "doc_id")
            .select(col("doc_id"), col("source"), col("phase"),
              TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                .as("n_tokens")),
          "doc_id", "source", "n_tokens", "phase", nPhases = 3,
          budget = 1500L, maxEpochs64 = 256L)
      },
      Some(s"""${cappedCurriculumChainSql(1500L, 256L)}
             |SELECT doc_id, source, phase, n_tokens, epoch, appearance, pos_key
             |FROM cman""".stripMargin)),

    QuerySpec(
      "q186_capped_mix_audit",
      """Capped-order ACCEPTANCE SHEET ([[graft.operators.Mixing
        |.cappedInterleaveMixAudit]]) — the q171 audit lifted onto the
        |SHIPPED order: q179's epoch-capped manifest is what the
        |engine now recommends (and q176 packs), and the cap CHANGES
        |the targets — the stranded budget of the ~18 capped sources
        |redistributes onto the 2 open survivors, so the uncapped
        |q171 sheet cannot accept this manifest. The audit re-derives
        |targets from the manifest by SUMMATION (the q171
        |one-definition rule), so the lift is the shared rollup
        |([[graft.operators.Mixing.mixAuditOverManifest]]) over the
        |capped order — at cap = ∞ bitwise q171 (MixingSpec pins it).
        |Exact 2^20 fixed-point shares — bitwise oracle (the q179
        |recursive chain closed by the q171 audit tail, both
        |verbatim). Scale shape: q179's audited plan + a map-side
        |block projection + ONE map-side-combined (block, source) agg
        |+ three windows over the 16×sources SHEET.""".stripMargin,
      (s, d) => graft.operators.Mixing.cappedInterleaveMixAudit(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens")),
        "doc_id", "source", "n_tokens", budget = 2000L, maxEpochs64 = 256L,
        nBlocks = 16),
      Some(s"""WITH RECURSIVE ${cappedInterleaveChainSql(2000L, 256L)},
             |${interleaveAuditTailSql(16)}""".stripMargin)),

    QuerySpec(
      "q187_capped_curriculum_audit",
      """Capped-CURRICULUM acceptance sheet ([[graft.operators.Mixing
        |.cappedPhasedMixAudit]]) — q186's lift for the phased member:
        |q183's epoch-capped curriculum redistributes each phase's
        |stranded budget onto ITS OWN open survivors, so every phase's
        |within-phase targets differ from q180's — and only a sheet
        |that re-derives targets from the shipped manifest (the shared
        |[[graft.operators.Mixing.phasedMixAuditOverManifest]] rollup)
        |can accept it. Per (phase, block, source): appearance count,
        |within-block share, within-PHASE allocated share, signed
        |deviation — at cap = ∞ bitwise q180 (MixingSpec pins it).
        |Exact 2^20 fixed-point shares — bitwise oracle (the q183
        |phase-partitioned recursive fixpoint closed by the q180 audit
        |tail, both verbatim). Scale shape: q183's audited plan + a
        |map-side block projection + ONE (phase, block, source) agg +
        |three windows over the 3×8×sources SHEET.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val phases = graft.operators.Phrases.lmQualityBuckets(docs, "text")
          .select(col("doc_id"),
            when(col("bucket") === "tail", 0L)
              .when(col("bucket") === "middle", 1L)
              .when(col("bucket") === "head", 2L).as("phase"))
          .filter(col("phase").isNotNull)
        graft.operators.Mixing.cappedPhasedMixAudit(
          docs.join(phases, "doc_id")
            .select(col("doc_id"), col("source"), col("phase"),
              TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                .as("n_tokens")),
          "doc_id", "source", "n_tokens", "phase", nPhases = 3,
          budget = 1500L, maxEpochs64 = 256L, nBlocks = 8)
      },
      Some(s"""${cappedCurriculumChainSql(1500L, 256L)},
             |${curriculumAuditTailSql(8, nPhases = 3)}""".stripMargin)),

    QuerySpec(
      "q190_capped_increment",
      """Capped-order INCREMENT ([[graft.operators.Mixing
        |.cappedInterleaveIncrement]]) — the q182 frozen-decision
        |member for a standing CAPPED order: patching a q179 manifest
        |with the uncapped increment would freeze the WRONG quotas
        |(the cap redistributes allocation, so the derived strides and
        |pos_keys would not exist in the frozen manifest — the exact
        |drift the one-definition rule exists to prevent). Here the
        |frozen quotas come from the capped fixpoint with the SAME
        |ceiling the standing order shipped with, and the admission
        |tail is q182's verbatim (shared `incrementOverQuotas` — at
        |cap = ∞ the two members are bitwise identical; MixingSpec
        |pins it). The cap also bounds residual capacity: arrivals can
        |never push a frozen group past its epoch ceiling. Budget 2000
        |at the 4-epoch cap over the ~90% standing split caps most
        |sources at 4·n_standing, leaving real repeat slots for
        |arrivals — admissions AND rejections both exercise. All
        |BIGINT → bitwise oracle (the capped fixpoint re-rooted on the
        |standing split + the q182 admission arithmetic). Scale shape:
        |q179's pruned quota fixpoint, quota sheet broadcast onto the
        |batch, ONE batch-sized group-key shuffle; the standing
        |manifest is never read or re-keyed.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
          TextFunctions.tokenCount(coalesce(col("text"), lit(""))).as("n_tokens"))
        val flagged = graft.operators.Sampling.withSplitBucket(docs, "doc_id")
        graft.operators.Mixing.cappedInterleaveIncrement(
          flagged.filter(col("__bucket") >= 100).drop("__bucket"),
          flagged.filter(col("__bucket") < 100).drop("__bucket"),
          "doc_id", "source", "n_tokens", budget = 2000L, maxEpochs64 = 256L)
      },
      Some(cappedIncrementSql(2000L, 256L))),

    QuerySpec(
      "q184_langid_apply",
      """Lang-ID APPLY ([[graft.operators.LangId.applyLangId]]) — the
        |act that MINTS the lang_id column for the corpus (the
        |q162→q164 evidence→act convention closing the q181 gap):
        |EVERY doc — train and held-out alike; the act labels the
        |corpus, the evidence split only tunes it — scores through the
        |SAME join-path arithmetic as the q181 evidence sheet (one
        |shared scorer — sheet and act cannot drift; the streaming
        |gate is spec-pinned bitwise to the same arithmetic), and docs
        |whose margin falls below the threshold read lang_id =
        |'unknown' — the CCNet drop rule (Wenzek 2020 discard
        |low-confidence lang-ID rows rather than mislabel them). The
        |threshold (5000, ~the q185 sheet's 40% decile band on this
        |corpus — margins here are WHOLE-DOC log-odds, hundreds of
        |bits) is READ from the q185 sheet, the engine convention for
        |every act knob. Integer log-odds, deterministic tiebreak →
        |bitwise oracle (the q181 chain with scoreAll, closed by the
        |argmax + abstain CASE). Scale shape: exactly q181's audited
        |plan over the whole corpus — trigrams collapse map-side onto
        |(doc, bucket) keys BEFORE any per-class work, the model sheet
        |and constants broadcast, every corpus-sized exchange keys on
        |doc_id (the broadcast-fold gate kernel is deliberately NOT
        |used at corpus scale: its O(len·K) interpreted fold is the
        |micro-batch trade, not the corpus one).""".stripMargin,
      (s, d) => graft.operators.LangId.applyLangId(
        Tables.documents(s, d), marginThresholdQ = 5000L),
      Some(LangIdOracle.applySql(marginThresholdQ = 5000L))),

    QuerySpec(
      "q185_langid_abstain_sheet",
      """Lang-ID ABSTAIN operating points ([[graft.operators.LangId
        |.langIdOperatingPoints]]) — the q147 convention for the q184
        |knob: held-out margins swept at their own exact DECILE
        |thresholds (the q60-pinned radix selection — data-driven cut
        |candidates, not constants), per threshold the abstain/scored/
        |correct counts, the held-out accuracy AMONG SCORED docs and
        |the abstain rate — the sheet marginThresholdQ is READ from (a
        |deployment picks the leftmost threshold clearing its accuracy
        |bar; the abstain rate is the mass it pays — the CCNet trade).
        |On THIS corpus labels are text-independent, so the sheet
        |honestly shows accuracy ~uniform across margin bands — the
        |evidence that thresholding buys nothing HERE, exactly what
        |the sheet exists to reveal (LangIdSpec proves the planted
        |bilingual fixture separates and its sheet rewards the
        |threshold). BIGINT counts, −1.0-guarded IEEE divisions →
        |bitwise oracle. Scale shape: the q181 audited plan reduced to
        |17-byte rows, radix-selected deciles (no single-task sort),
        |one ≤ 9× broadcast sweep collapsing map-side.""".stripMargin,
      (s, d) => graft.operators.LangId.langIdOperatingPoints(
        Tables.documents(s, d)),
      Some(LangIdOracle.operatingPointsSql())),

    QuerySpec(
      "q188_langid_drift",
      """Predicted-LANGUAGE distribution drift ([[graft.operators
        |.LangId.langDistDrift]]) — the gate → monitor convention
        |(q144/q158) for the lang-ID line, the alarm a provenance
        |label structurally cannot raise: the corpus splits on an
        |INDEPENDENT arrivals salt, the standing slice trains the NB
        |model and folds its own whole-corpus predictions into the
        |standing predicted-lang baseline, the incoming slice scores
        |through the SAME join-path arithmetic, and the exact
        |add-1-smoothed KL(batch ‖ standing) over the K-class support
        |closes in 1/64-log2 units — "this feed switched language"
        |shows as mass moving between classes even when bigram
        |concentration (q158) holds. Single-sourced end to end with
        |the streaming monitor (shared KL close; the gate kernel is
        |pinned bitwise to the batch scorer; StreamingLangIdGateSpec
        |pins a streamed batch bitwise to this sheet). All BIGINT →
        |bitwise oracle (the q181 chain re-rooted on the standing
        |slice + a second scoring chain over arrivals + the q158 KL
        |close on K classes). Scale shape: ONE trigram chain per
        |side with the standing consts/sheet materialized (baseline
        |scoring + arrival scoring + class support — the q167
        |materialize-the-sheet rule); every corpus-sized exchange
        |keys on doc_id; the closes are ≤ K-key rollups.""".stripMargin,
      (s, d) => graft.operators.LangId.langDistDrift(
        Tables.documents(s, d)),
      Some(LangIdOracle.langDistDriftSql())),

    QuerySpec(
      "q189_resample_training_order",
      """Resample→TRAINING-ORDER capstone ([[graft.operators.Mixing
        |.dsirResample]] → [[graft.operators.Mixing
        |.cappedInterleaveManifest]] → [[graft.operators.SequencePack
        |.interleavedShardManifest]]) — completing the capstone
        |matrix: the acquisition seat has policy→release (q167) AND
        |policy→order (q176), but the per-doc importance seat had only
        |resample→release (q169) — a trainer consuming the q161
        |keep-set needs shards too. The 250‰ DSIR keep-set acts on the
        |corpus, the kept docs allocate and interleave through the
        |EPOCH-CAPPED stride schedule (a resampled corpus under a
        |fixed 1200 budget is exactly the regime that over-repeats
        |boosted small survivors — same rationale as q176's capped
        |recomposition), and the q174 pack kernel emits the shard
        |work-order — importance evidence → keep-set → capped mixture
        |→ training order → shards in ONE oracled relation (the q161
        |keep CTE, the capped recursive chain re-rooted on it, and the
        |shared pack closing, all verbatim). Scale shape: q161's
        |audited radix shape once; the keep join is doc_id-keyed on
        |the kept set; then q179's audited plan over the (smaller)
        |resampled corpus and the budget-bounded pack.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val kept = docs.join(
          graft.operators.Mixing.dsirResample(docs, budgetPermille = 250)
            .select(col("doc_id")), "doc_id")
        graft.operators.SequencePack.interleavedShardManifest(
          graft.operators.Mixing.cappedInterleaveManifest(
            kept.select(col("doc_id"), col("source"),
              TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                .as("n_tokens")),
            "doc_id", "source", "n_tokens", budget = 1200L,
            maxEpochs64 = 256L),
          "source", capacity = ManifestCapacity,
          packsPerShard = ManifestPacksPerShard)
      },
      Some(s"""WITH RECURSIVE kept AS MATERIALIZED (SELECT doc_id FROM (
             |${DsirOracle.resampleSql(250)}
             |) t_k),
             |acted AS (SELECT d.doc_id, d.source, d.text
             |  FROM documents d JOIN kept k ON k.doc_id = d.doc_id),
             |${cappedInterleaveChainSql(1200L, 256L, from = "acted")},
             |$packShardClosingSql""".stripMargin)),

    QuerySpec(
      "q191_langid_composition",
      """MINTED-label composition sheet (q184 ∘ the q76 mechanics) —
        |the composition the q76 adjudication points at, shipped as
        |its own oracled relation: the q184 act labels the corpus
        |(lang_id = predicted, or 'unknown' below the q185-read
        |margin threshold), the labels join back on doc_id, and the
        |corpus rolls onto (source, lang_id) with doc and token
        |volumes — the per-slice composition sheet a curator reads
        |AFTER minting the label instead of trusting provenance
        |(q76's subject stays the provenance-slice mechanics; THIS
        |sheet is what production composes — the 'unknown' row per
        |source is the abstained mass the CCNet drop rule pays).
        |Bitwise oracle: the q184 chain as a derived table + one
        |rollup. Scale shape: q184's audited plan (doc_id-keyed
        |exchanges, broadcast model sheet), ONE doc_id-keyed join
        |back, ONE map-side-combined rollup onto ≤ sources×(K+1)
        |keys.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        docs.join(
          graft.operators.LangId.applyLangId(docs, marginThresholdQ = 5000L)
            .select(col("doc_id"), col("lang_id")), "doc_id")
          .groupBy(col("source"), col("lang_id"))
          .agg(count(lit(1)).as("n_docs"),
            sum(TextFunctions.tokenCount(coalesce(col("text"), lit(""))))
              .as("n_tokens"))
      },
      Some(LangIdOracle.compositionSql(marginThresholdQ = 5000L))),

    QuerySpec(
      "q192_langid_drift_by_source",
      """Per-SOURCE predicted-language drift ([[graft.operators.LangId
        |.langDistDriftBySource]]) — the q155/q156 by-source
        |convention for the q188 monitor, the attribution the one-row
        |sheet can't give: when the aggregate language KL moves, WHICH
        |feed switched? Every arrival's prediction joins its source
        |back on doc_id and each source's predicted-lang distribution
        |reads its own exact add-1-smoothed KL against the standing
        |corpus's — q188's arithmetic with every window partitioned by
        |source (one row per arrival source: n_docs, n_langs, kl_q —
        |the sheet carries the blame, the one-row twin carries the
        |alert). All BIGINT → bitwise oracle (the shared q188 drift
        |chain closed per source). Scale shape: q188's audited plan +
        |one doc_id-keyed arrival-sized join + ONE (source, class)
        |rollup; the closes are windows over the sources×K
        |grid.""".stripMargin,
      (s, d) => graft.operators.LangId.langDistDriftBySource(
        Tables.documents(s, d)),
      Some(LangIdOracle.langDistDriftBySourceSql())),

    QuerySpec(
      "q193_lang_kl_by_source",
      """Per-source LANGUAGE-fingerprint KL ([[graft.operators.LangId
        |.langKlBySource]]) — the FIFTH q159 scorecard member, wiring
        |the lang-ID line into the acquisition policy: every doc
        |scores through the q184 act's arithmetic (threshold 0), each
        |source's predicted-language distribution spreads over the
        |K-class support, and the exact add-1-smoothed
        |KL(P_source ‖ P_corpus) closes per source in 1/64-log2 units
        |— the q155 self-seat convention with MINTED languages in the
        |bucket seat. The signal provenance labels and content-KL
        |both structurally miss: a feed whose TEXT switched language
        |reads a high seat here even when its bigram concentration
        |holds; the q162 policy damps it (lang_kl_q ≥ 128 — 2
        |bits/doc). All BIGINT → bitwise oracle (the q192 close with
        |the corpus in the baseline seat). Scale shape: ONE
        |whole-corpus scoring pass (q184's audited plan), collapsed
        |to the materialized sources×K counts sheet; every close is a
        |window/rollup over that sheet.""".stripMargin,
      (s, d) => graft.operators.LangId.langKlBySource(
        Tables.documents(s, d)),
      Some(LangIdOracle.langKlBySourceSql())),

    QuerySpec(
      "q194_lang_quality_buckets",
      """PER-LANGUAGE CCNet quality buckets ([[graft.operators.Phrases
        |.lmQualityBucketsByLang]]) — what Wenzek et al. 2020 §4.3
        |actually do, where q125 is the corpus-global approximation:
        |a single global LM scores a minority-language doc mostly on
        |"is not the majority language" (its perplexity measures
        |language mismatch, not quality, and the whole minority slice
        |lands in 'tail'), so real CCNet trains a model PER LANGUAGE
        |and cuts head/middle/tail within each. The label is the
        |engine's own MINTED lang_id (the q184 act at the q185-read
        |threshold — not the provenance claim a feed can lie about;
        |abstained docs cut against each other as 'unknown'), the
        |unigram piece model trains per minted language, each doc
        |scores under its own language's model, and the 33 %/67 %
        |ppl_q cuts select per language through the GROUPED radix
        |kernel ([[graft.operators.Quantiles.groupQuantileDisc]] —
        |exact per-group percentiles in 4 map-side histogram passes,
        |no per-group single-task sort). Single-language degeneracy
        |is bitwise q125 + the constant lang_id column (PhrasesSpec).
        |All-BIGINT scoring + discrete selection → bitwise oracle.
        |Scale shape: the q184 audited scoring plan once, the q124
        |encode shape with keys widened to (lang, ·) — the DP still
        |runs once per distinct (lang, word), per-lang vocabularies
        |travel as ONE broadcast K-row map frame — and the grouped
        |radix cuts.""".stripMargin,
      (s, d) => graft.operators.Phrases.lmQualityBucketsByLang(
        Tables.documents(s, d)),
      Some(BpeOracle.unigramQualityByLangSql())),

    QuerySpec(
      "q195_langid_model_increment",
      """Incremental lang-ID model ([[graft.operators.LangId
        |.langIdModelIncrement]]) — the q105/q109/q119 family's seat
        |for the language model: multinomial NB state is a SUM of
        |per-doc counts, so a batch's (bucket, class) trigram counts
        |fold into the standing counts artifact with NO retrain of the
        |standing corpus (where the quantized logs could never fold —
        |log2q(a+b) ≠ log2q(a)+log2q(b) — the artifact persists
        |counts, [[graft.operators.LangId.langIdCounts]]), and the
        |folded counts re-quantize through the same formulas. The
        |corpus splits on the independent arrivals salt (q188's
        |convention, is_new ⇔ bucket < 100); the oracle is
        |deliberately MONOLITHIC — one retrain over standing ∪ batch —
        |so the hash match PROVES incremental == monolithic; LangIdSpec
        |additionally pins the PATCHED one-row artifact's gate
        |predictions bitwise to the retrained artifact's (a new class
        |arriving only in the batch included). Scale shape: the batch
        |pays its own trigram collapse; the standing seat is
        |sheet-sized persisted counts ([[graft.operators.LangId
        |.incrementOverCounts]] is the production entry); every fold
        |exchange carries ≤ buckets×K cells.""".stripMargin,
      (s, d) => {
        val flagged = graft.operators.Sampling.withSplitBucket(
          Tables.documents(s, d), "doc_id", "arrivals")
        graft.operators.LangId.langIdModelIncrement(
          flagged.filter(col("__bucket") >= 100).drop("__bucket"),
          flagged.filter(col("__bucket") < 100).drop("__bucket"))
      },
      Some(LangIdOracle.modelIncrementSql())),

    QuerySpec(
      "q196_lang_release",
      """Lang→release capstone ([[graft.operators.LangId.actOnLangId]]
        |∘ the q71 release build) — CCNet's actual pipeline order:
        |language identification acts FIRST (Wenzek et al. 2020 drop
        |non-target/low-confidence-language docs before any quality
        |machinery), so the release chain runs on docs whose MINTED
        |lang_id is confident, carrying the minted label — not the
        |provenance claim — into the released corpus's `lang` seat.
        |The act drops the q184 abstained mass (lang_id = 'unknown' at
        |the q185-read threshold); the ENTIRE release machinery —
        |per-source cap, train split, near-dup keep-set over the
        |minhash∪simhash pair graph, decontamination, PII redaction —
        |is the shared [[corpusBuild]] chain, so q71/q167/q169/q196
        |cannot drift. The oracle chains the q184 CTE into the q71
        |chain verbatim. Completes the act matrix: policy→release
        |(q167), resample→release (q169), lang→release (q196). Scale
        |shape: the q184 audited scoring plan once + ONE doc_id-keyed
        |keep join; downstream stages keep their audited shapes over
        |the SMALLER kept corpus.""".stripMargin,
      (s, d) => corpusBuild(graft.operators.LangId.actOnLangId(
        Tables.documents(s, d), marginThresholdQ = 5000L)),
      Some(langReleaseSql(marginThresholdQ = 5000L))),

    QuerySpec(
      "q197_curriculum_shards",
      """Curriculum SHARD MANIFEST ([[graft.operators.SequencePack
        |.phasedShardManifest]] over the q183 capped curriculum) — the
        |packing step that was MISSING from the phased line: q174
        |packs the flat order and q183 ships a phased one, but a
        |trainer honoring phase boundaries cannot consume shards that
        |mix two phases, so pack and shard numbering here RESTART at
        |every phase boundary (phase = pos_key DIV the phase-major
        |slice — the grid coordinate every phased interleave mints; no
        |shard spans a phase BY CONSTRUCTION). One row per
        |(phase, shard) with the q174 census columns — n_sources still
        |shows the interleave landed within every phase. At nPhases=1
        |bitwise q174's kernel + the constant phase (SequencePackSpec
        |pins it). Integer end-to-end → bitwise oracle (the q183 chain
        |into the q174 pack tail with every window phase-partitioned).
        |Scale shape: q183's audited plan + the q174 two-level prefix
        |kernel with keys widened to (phase, bucket) — the bucket
        |frame stays ≤ 2^20 rows, offsets broadcast, one map-side
        |shard rollup.""".stripMargin,
      (s, d) => {
        val docs = Tables.documents(s, d)
        val phases = graft.operators.Phrases.lmQualityBuckets(docs, "text")
          .select(col("doc_id"),
            when(col("bucket") === "tail", 0L)
              .when(col("bucket") === "middle", 1L)
              .when(col("bucket") === "head", 2L).as("phase"))
          .filter(col("phase").isNotNull)
        graft.operators.SequencePack.phasedShardManifest(
          graft.operators.Mixing.cappedPhasedInterleave(
            docs.join(phases, "doc_id")
              .select(col("doc_id"), col("source"), col("phase"),
                TextFunctions.tokenCount(coalesce(col("text"), lit("")))
                  .as("n_tokens")),
            "doc_id", "source", "n_tokens", "phase", nPhases = 3,
            budget = 1500L, maxEpochs64 = 256L),
          "source", capacity = ManifestCapacity,
          packsPerShard = ManifestPacksPerShard, nPhases = 3)
      },
      Some({
        val slice = 4611686018427387904L / 3
        s"""${cappedCurriculumChainSql(1500L, 256L)},
           |ord AS (SELECT pos_key // $slice AS phase, source, n_tokens,
           |    appearance, pos_key,
           |    CAST(coalesce(sum(n_tokens) OVER (
           |      PARTITION BY pos_key // $slice
           |      ORDER BY pos_key, source, appearance
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
           |  FROM cman),
           |pk AS (SELECT phase, source, n_tokens,
           |    cb // $ManifestCapacity AS pack_first,
           |    (cb + greatest(n_tokens, 1) - 1) // $ManifestCapacity AS pack_last
           |  FROM ord)
           |SELECT CAST(phase AS BIGINT) AS phase,
           |  pack_first // $ManifestPacksPerShard AS shard,
           |  CAST(count(*) AS BIGINT) AS n_appearances,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(max(pack_last - pack_first + 1) AS BIGINT) AS max_span,
           |  CAST(sum(CASE WHEN pack_last // $ManifestPacksPerShard <> pack_first // $ManifestPacksPerShard
           |    THEN 1 ELSE 0 END) AS BIGINT) AS boundary_crossers,
           |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
           |FROM pk GROUP BY 1, 2""".stripMargin
      }))
  )

  /** q182 oracle: the q102 allocation CTEs re-rooted on the standing
    * md5 split, the batch cohort rank, and the residual-slot
    * admission arithmetic ([[graft.operators.Mixing
    * .interleaveIncrement]] replayed relationally). */
  private def interleaveIncrementSql(budget: Long): String = {
    val bucket = DecontaminateOracle.bucketExpr("graft")
    s"""WITH std AS (SELECT * FROM documents
       |  WHERE doc_id IS NOT NULL AND (($bucket) % 1000) >= 100),
       |${interleaveAllocSql(budget, "std")},
       |npop AS (SELECT doc_id, source,
       |    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND (($bucket) % 1000) < 100),
       |newb AS (SELECT doc_id, source, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS batch_rank
       |  FROM npop),
       |adm AS (SELECT n.doc_id, n.source, n.n_tokens, n.batch_rank,
       |    CASE WHEN a.alloc IS NOT NULL AND n.batch_rank <= a.alloc - a.n_items
       |      THEN 1 ELSE 0 END AS kept,
       |    a.n_items, a.alloc
       |  FROM newb n LEFT JOIN a USING (source))
       |SELECT doc_id, source, n_tokens, batch_rank,
       |  CAST(kept AS BIGINT) AS kept,
       |  CAST(CASE WHEN kept = 1
       |    THEN (n_items + batch_rank - 1) // n_items END AS BIGINT) AS epoch,
       |  CAST(CASE WHEN kept = 1
       |    THEN n_items + batch_rank - 1 END AS BIGINT) AS appearance,
       |  CAST(CASE WHEN kept = 1
       |    THEN (n_items + batch_rank - 1) * (4611686018427387904 // alloc)
       |      + (4611686018427387904 // alloc) // 2 END AS BIGINT) AS pos_key
       |FROM adm""".stripMargin
  }

  /** q177 oracle: `SELECT *` over the shared
    * [[curriculumChainSql]]'s closing `cman` relation. */
  private def curriculumOrderSql(budget: Long): String =
    s"""${curriculumChainSql(budget)}
       |SELECT doc_id, source, phase, n_tokens, epoch, appearance, pos_key
       |FROM cman""".stripMargin

  /** Shared q177/q180 curriculum CTE chain: the q125 recursive
    * quality chain embedded verbatim as the phase map (tail→0,
    * middle→1, head→2, empty excluded), then [[graft.operators
    * .Mixing.phasedInterleave]] replayed relationally — proportional
    * phase-budget Hamilton, per-phase sqrt-Hamilton across sources,
    * the (phase, source)-ranked epoch-major appearances, and the
    * phase-sliced stride keys — closing as relation `cman` so the
    * order and its acceptance sheet cannot drift. */
  private def curriculumChainSql(budget: Long): String =
    s"""WITH ${curriculumPrefixSql(budget)},
       |per2 AS (SELECT phase, source, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(n_tokens) AS BIGINT) AS gm FROM pop GROUP BY 1, 2),
       |q2 AS (SELECT *, CAST(floor(sqrt(gm) * 1048576) AS BIGINT) AS s_q FROM per2),
       |s2 AS (SELECT phase, CAST(sum(s_q) AS BIGINT) AS s FROM q2 GROUP BY 1),
       |b2 AS (SELECT q2.phase, source, n_items, s_q, s, pbudget,
       |    CASE WHEN s = 0 THEN 0 ELSE (pbudget * s_q) // s END AS base
       |  FROM q2 JOIN s2 USING (phase) JOIN pa USING (phase)),
       |r2 AS (SELECT *, pbudget * s_q - base * s AS rem FROM b2),
       |l2 AS (SELECT phase, CAST(max(pbudget) - sum(base) AS BIGINT) AS leftover,
       |    max(s) AS s FROM r2 GROUP BY 1),
       |a2 AS (SELECT r2.phase, r2.source, r2.n_items,
       |    base + CASE WHEN
       |        CAST(row_number() OVER (PARTITION BY r2.phase
       |          ORDER BY rem DESC, source ASC) AS BIGINT)
       |          <= (CASE WHEN l2.s = 0 THEN 0 ELSE l2.leftover END)
       |      THEN 1 ELSE 0 END AS alloc
       |  FROM r2 JOIN l2 ON r2.phase = l2.phase),
       |${curriculumTailSql()}""".stripMargin

  /** The q177/q183 curriculum PREFIX CTEs: the q125 recursive quality
    * chain as the phase map (`qb`), the phased population (`pop`),
    * and the proportional Hamilton phase budgets (`pa`). Emitted
    * WITHOUT a leading WITH (the q125 chain inside is recursive, so
    * the emitting query must open `WITH` — q177's does, and the q183
    * recursive fixpoint needs `WITH RECURSIVE` anyway). */
  private def curriculumPrefixSql(budget: Long): String =
    s"""qb AS (SELECT doc_id, CAST(CASE bucket
       |      WHEN 'tail' THEN 0 WHEN 'middle' THEN 1 WHEN 'head' THEN 2
       |    END AS BIGINT) AS phase FROM (
       |${BpeOracle.unigramQualitySql()}
       |) tq),
       |pop AS (SELECT d.doc_id, d.source, qb.phase,
       |    CAST(len(string_split_regex(coalesce(d.text, ''), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents d JOIN qb USING (doc_id)
       |  WHERE d.doc_id IS NOT NULL AND qb.phase IS NOT NULL),
       |pm AS (SELECT phase, CAST(sum(n_tokens) AS BIGINT) AS pmass FROM pop GROUP BY 1),
       |ptot AS (SELECT CAST(sum(pmass) AS BIGINT) AS tm FROM pm),
       |pb AS (SELECT phase, pmass, tm,
       |    CASE WHEN tm = 0 THEN 0 ELSE ($budget * pmass) // tm END AS pbase,
       |    $budget * pmass
       |      - (CASE WHEN tm = 0 THEN 0 ELSE ($budget * pmass) // tm END) * tm AS prem
       |  FROM pm, ptot),
       |pl AS (SELECT CAST($budget - sum(pbase) AS BIGINT) AS pleft,
       |    max(tm) AS tm FROM pb),
       |pa AS (SELECT phase, pbase + CASE WHEN
       |      CAST(row_number() OVER (ORDER BY prem DESC, phase ASC) AS BIGINT)
       |        <= (CASE WHEN pl.tm = 0 THEN 0 ELSE pl.pleft END)
       |    THEN 1 ELSE 0 END AS pbudget FROM pb, pl)""".stripMargin

  /** q183 chain: the curriculum with [[graft.operators.Mixing
    * .cappedPhasedInterleave]]'s per-phase fixpoint as a
    * phase-PARTITIONED recursive CTE — each step holds capped
    * (phase, source) cohorts at their caps, Hamilton-allocates each
    * phase's residual over its own uncapped survivors (all windows
    * PARTITION BY phase), caps strict violators, and continues while
    * ANY phase produced one (`cont` is the global bool_or, matching
    * the engine's one fixpoint loop over the union sheet). Closes
    * with the shared [[curriculumTailSql]]. */
  private def cappedCurriculumChainSql(budget: Long,
      maxEpochs64: Long): String =
    s"""WITH RECURSIVE ${curriculumPrefixSql(budget)},
       |per2 AS (SELECT phase, source, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(n_tokens) AS BIGINT) AS gm FROM pop GROUP BY 1, 2),
       |cq2 AS (SELECT phase, source, n_items,
       |    CAST(floor(sqrt(gm) * 1048576) AS BIGINT) AS s_q,
       |    ($maxEpochs64 * n_items) // 64 AS cap, pbudget
       |  FROM per2 JOIN pa USING (phase)),
       |st2 AS (
       |  SELECT 0 AS it, phase, source, n_items, s_q, cap, pbudget,
       |    FALSE AS capped, CAST(0 AS BIGINT) AS alloc, TRUE AS cont
       |  FROM cq2
       |  UNION ALL
       |  SELECT it + 1, phase, source, n_items, s_q, cap, pbudget,
       |    capped OR viol AS capped,
       |    CASE WHEN capped OR viol THEN cap ELSE alloc_new END AS alloc,
       |    bool_or(viol) OVER () AS cont
       |  FROM (
       |    SELECT *, (NOT capped AND alloc_new > cap) AS viol FROM (
       |      SELECT it, phase, source, n_items, s_q, cap, pbudget, capped,
       |        CASE WHEN capped THEN cap
       |             ELSE base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
       |        END AS alloc_new
       |      FROM (
       |        SELECT *,
       |          CASE WHEN su = 0 THEN 0
       |               ELSE bres - sum(CASE WHEN capped THEN 0 ELSE base END)
       |                 OVER (PARTITION BY phase)
       |          END AS leftover,
       |          CAST(row_number() OVER (PARTITION BY phase
       |            ORDER BY capped ASC, rem DESC NULLS LAST,
       |            source ASC) AS BIGINT) AS rnk
       |        FROM (
       |          SELECT *,
       |            CASE WHEN capped THEN NULL
       |                 WHEN su = 0 THEN 0
       |                 ELSE (bres * s_q) // su END AS base,
       |            CASE WHEN capped THEN NULL
       |                 WHEN su = 0 THEN 0
       |                 ELSE bres * s_q - ((bres * s_q) // su) * su END AS rem
       |          FROM (
       |            SELECT *,
       |              sum(CASE WHEN capped THEN 0 ELSE s_q END)
       |                OVER (PARTITION BY phase) AS su,
       |              pbudget - sum(CASE WHEN capped THEN cap ELSE 0 END)
       |                OVER (PARTITION BY phase) AS bres
       |            FROM st2 WHERE cont) w1) w2) w3) w4) w5
       |),
       |a2 AS (SELECT phase, source, n_items, alloc FROM st2
       |  WHERE it = (SELECT max(it) FROM st2)),
       |${curriculumTailSql()}""".stripMargin

  /** The curriculum manifest TAIL CTEs (`ranked2` → `cman`) over
    * `pop` and an allocation CTE `a2(phase, source, n_items, alloc)`
    * — the SQL twin of [[graft.operators.Mixing]]'s shared
    * `phasedManifestOverQuotas`, ONE textual definition for the q177
    * and q183 chains. */
  private def curriculumTailSql(): String = {
    val slice = 4611686018427387904L / 3
    s"""ranked2 AS (SELECT doc_id, source, phase, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY phase, source
       |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS rk
       |  FROM pop),
       |rep2 AS (SELECT doc_id, source, phase, n_tokens, rk, n_items, alloc,
       |    alloc // n_items + CASE WHEN rk <= alloc % n_items THEN 1 ELSE 0 END AS reps
       |  FROM ranked2 JOIN a2 USING (phase, source)),
       |app2 AS (SELECT doc_id, source, phase, n_tokens, rk, n_items, alloc,
       |    CAST(unnest(range(reps)) AS BIGINT) AS epoch
       |  FROM rep2 WHERE reps > 0),
       |cman AS (SELECT doc_id, source, phase, n_tokens, epoch,
       |  CAST(epoch * n_items + rk - 1 AS BIGINT) AS appearance,
       |  CAST(phase * $slice
       |    + (epoch * n_items + rk - 1) * ($slice // alloc)
       |    + ($slice // alloc) // 2 AS BIGINT) AS pos_key
       |FROM app2)""".stripMargin
  }

  /** q180 oracle: the shared [[curriculumChainSql]] closed by the
    * per-(phase, block, source) audit rollup — blocks are map-side
    * sub-slices of each phase's grid slice, targets the within-phase
    * allocation shares re-derived from `cman` by summation. */
  private def curriculumMixAuditSql(budget: Long, nBlocks: Int): String =
    s"""${curriculumChainSql(budget)},
       |${curriculumAuditTailSql(nBlocks, nPhases = 3)}""".stripMargin

  /** The q180/q187 curriculum audit ROLLUP closing over a `cman`
    * relation — the SQL twin of [[graft.operators.Mixing
    * .phasedMixAuditOverManifest]], ONE textual definition for the
    * uncapped and capped curriculum acceptance sheets. `nPhases`
    * mirrors the Scala twin's parameter (the grid slices phase-major
    * into nPhases equal bands — a hard-coded 3 would silently
    * mis-slice any curriculum with a different phase count). */
  private def curriculumAuditTailSql(nBlocks: Int, nPhases: Int = 3): String = {
    val slice = 4611686018427387904L / nPhases
    val blockW = slice / nBlocks
    s"""blk AS (SELECT phase, source,
       |    least((pos_key - phase * $slice) // $blockW,
       |      CAST(${nBlocks - 1} AS BIGINT)) AS block
       |  FROM cman),
       |cells AS (SELECT phase, block, source,
       |    CAST(count(*) AS BIGINT) AS n_appearances
       |  FROM blk GROUP BY 1, 2, 3),
       |w AS (SELECT phase, block, source, n_appearances,
       |    sum(n_appearances) OVER (PARTITION BY phase, block) AS bt,
       |    sum(n_appearances) OVER (PARTITION BY phase, source) AS palloc,
       |    sum(n_appearances) OVER (PARTITION BY phase) AS pt
       |  FROM cells)
       |SELECT phase, block, source, n_appearances,
       |  CAST((n_appearances * 1048576) // bt AS BIGINT) AS share_q,
       |  CAST((palloc * 1048576) // pt AS BIGINT) AS target_q,
       |  CAST((n_appearances * 1048576) // bt
       |    - (palloc * 1048576) // pt AS BIGINT) AS dev_q
       |FROM w""".stripMargin
  }

  /** The q170 population + per-source census CTEs (`pop`, `per`) —
    * shared by the uncapped and capped allocation chains. */
  private def interleavePopSql(from: String): String =
    s"""pop AS (SELECT doc_id, source,
       |    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM $from WHERE doc_id IS NOT NULL),
       |per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_items,
       |    CAST(sum(n_tokens) AS BIGINT) AS n_size
       |  FROM pop GROUP BY 1)""".stripMargin

  /** The stride-manifest tail CTEs (`ranked` → `manifest`) over `pop`
    * and an allocation CTE `a(source, n_items, alloc)` — the SQL twin
    * of [[graft.operators.Mixing]]'s shared `manifestOverQuotas`, ONE
    * textual definition for the q170 and q179 chains. */
  // lazy: the specs vals earlier in this object interpolate this at
  // their own initialization (a plain val would still be null there)
  private lazy val interleaveManifestTailSql: String =
    """ranked AS (SELECT doc_id, source, n_tokens,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS rk
      |  FROM pop),
      |rep AS (SELECT doc_id, source, n_tokens, rk, n_items, alloc,
      |    alloc // n_items + CASE WHEN rk <= alloc % n_items THEN 1 ELSE 0 END AS reps
      |  FROM ranked JOIN a USING (source)),
      |app AS (SELECT doc_id, source, n_tokens, rk, n_items, alloc,
      |    CAST(unnest(range(reps)) AS BIGINT) AS epoch
      |  FROM rep WHERE reps > 0),
      |manifest AS (SELECT doc_id, source, n_tokens, epoch,
      |    CAST(epoch * n_items + rk - 1 AS BIGINT) AS appearance,
      |    CAST((epoch * n_items + rk - 1) * (4611686018427387904 // alloc)
      |      + (4611686018427387904 // alloc) // 2 AS BIGINT) AS pos_key
      |  FROM app)""".stripMargin

  /** Shared q170/q171/q174 manifest CTE chain: the q102 allocation
    * chain (pop → per → qq → tot → b → l → a) extended with the
    * shared [[interleaveManifestTailSql]] (epoch-major appearances +
    * 2^62-grid stride keys), closing as a `manifest` relation —
    * [[graft.operators.Mixing.interleaveManifest]] replayed
    * relationally so the manifest and every sheet built on it cannot
    * drift. `from` re-roots the population. */
  /** The q102 allocation CTEs (pop → per → qq → tot → b → l → a) —
    * the uncapped sqrt-Hamilton closing as `a(source, n_items,
    * alloc)`, shared by the manifest chain and the q182 increment. */
  private def interleaveAllocSql(budget: Long, from: String): String =
    s"""${interleavePopSql(from)},
       |qq AS (SELECT *, CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q FROM per),
       |tot AS (SELECT CAST(sum(s_q) AS BIGINT) AS s FROM qq),
       |b AS (SELECT source, n_items, s_q, ($budget * s_q) // s AS base,
       |    $budget * s_q - (($budget * s_q) // s) * s AS rem FROM qq, tot),
       |l AS (SELECT CAST($budget - sum(base) AS BIGINT) AS leftover FROM b),
       |a AS (SELECT source, n_items, base + CASE WHEN
       |      CAST(row_number() OVER (ORDER BY rem DESC, source ASC) AS BIGINT) <= leftover
       |    THEN 1 ELSE 0 END AS alloc FROM b, l)""".stripMargin

  private def interleaveChainSql(budget: Long,
      from: String = "documents"): String =
    s"""${interleaveAllocSql(budget, from)},
       |$interleaveManifestTailSql""".stripMargin

  /** The q171/q186 audit ROLLUP closing over a `manifest` relation —
    * the SQL twin of [[graft.operators.Mixing.mixAuditOverManifest]],
    * ONE textual definition for the uncapped and capped acceptance
    * sheets (targets re-derived from the manifest by summation, the
    * one-definition rule). Emitted as trailing CTEs + final SELECT. */
  private def interleaveAuditTailSql(nBlocks: Int): String =
    s"""blk AS (SELECT source,
       |    least(pos_key // (4611686018427387904 // $nBlocks),
       |      CAST(${nBlocks - 1} AS BIGINT)) AS block
       |  FROM manifest),
       |cells AS (SELECT block, source,
       |    CAST(count(*) AS BIGINT) AS n_appearances
       |  FROM blk GROUP BY 1, 2),
       |w AS (SELECT block, source, n_appearances,
       |    sum(n_appearances) OVER (PARTITION BY block) AS bt,
       |    sum(n_appearances) OVER (PARTITION BY source) AS alloc,
       |    sum(n_appearances) OVER () AS t
       |  FROM cells)
       |SELECT block, source, n_appearances,
       |  CAST((n_appearances * 1048576) // bt AS BIGINT) AS share_q,
       |  CAST((alloc * 1048576) // t AS BIGINT) AS target_q,
       |  CAST((n_appearances * 1048576) // bt
       |    - (alloc * 1048576) // t AS BIGINT) AS dev_q
       |FROM w""".stripMargin

  /** q179 chain: [[graft.operators.Mixing.cappedAllocation]]'s
    * iterated-Hamilton fixpoint replayed as a RECURSIVE CTE (the
    * emitting query must open with `WITH RECURSIVE`): iteration rows
    * carry `(it, source, …, capped, alloc, cont)`; each step holds
    * the capped groups at their caps, Hamilton-allocates the residual
    * budget over the uncapped (base = floor share, leftover seats by
    * remainder DESC then source ASC — exactly the q98 arithmetic),
    * caps strict violators, and continues while any group was capped
    * this round (`cont = bool_or(viol) OVER ()`); the step's
    * `WHERE cont` makes the recursion emit zero rows at fixpoint.
    * CTE `a` reads the LAST iteration, then the shared
    * [[interleaveManifestTailSql]] closes the stride manifest. */
  private def cappedInterleaveChainSql(budget: Long, maxEpochs64: Long,
      from: String = "documents"): String =
    s"""${cappedInterleaveAllocSql(budget, maxEpochs64, from)},
       |$interleaveManifestTailSql""".stripMargin

  /** The capped allocation CTEs alone (pop → per → cq → st → a) — the
    * [[cappedInterleaveChainSql]] prefix without the manifest tail,
    * shared with the q190 capped increment (which freezes the capped
    * quotas but patches the batch instead of emitting the manifest).
    * The emitting query must open with `WITH RECURSIVE`. */
  private def cappedInterleaveAllocSql(budget: Long, maxEpochs64: Long,
      from: String = "documents"): String =
    s"""${interleavePopSql(from)},
       |cq AS (SELECT source, n_items,
       |    CAST(floor(sqrt(n_size) * 1048576) AS BIGINT) AS s_q,
       |    ($maxEpochs64 * n_items) // 64 AS cap FROM per),
       |st AS (
       |  SELECT 0 AS it, source, n_items, s_q, cap,
       |    FALSE AS capped, CAST(0 AS BIGINT) AS alloc, TRUE AS cont
       |  FROM cq
       |  UNION ALL
       |  SELECT it + 1, source, n_items, s_q, cap,
       |    capped OR viol AS capped,
       |    CASE WHEN capped OR viol THEN cap ELSE alloc_new END AS alloc,
       |    bool_or(viol) OVER () AS cont
       |  FROM (
       |    SELECT *, (NOT capped AND alloc_new > cap) AS viol FROM (
       |      SELECT it, source, n_items, s_q, cap, capped,
       |        CASE WHEN capped THEN cap
       |             ELSE base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
       |        END AS alloc_new
       |      FROM (
       |        SELECT *,
       |          CASE WHEN su = 0 THEN 0
       |               ELSE bres - sum(CASE WHEN capped THEN 0 ELSE base END) OVER ()
       |          END AS leftover,
       |          CAST(row_number() OVER (ORDER BY capped ASC, rem DESC NULLS LAST,
       |            source ASC) AS BIGINT) AS rnk
       |        FROM (
       |          SELECT *,
       |            CASE WHEN capped THEN NULL
       |                 WHEN su = 0 THEN 0
       |                 ELSE (bres * s_q) // su END AS base,
       |            CASE WHEN capped THEN NULL
       |                 WHEN su = 0 THEN 0
       |                 ELSE bres * s_q - ((bres * s_q) // su) * su END AS rem
       |          FROM (
       |            SELECT *,
       |              sum(CASE WHEN capped THEN 0 ELSE s_q END) OVER () AS su,
       |              $budget - sum(CASE WHEN capped THEN cap ELSE 0 END) OVER () AS bres
       |            FROM st WHERE cont) w1) w2) w3) w4) w5
       |),
       |a AS (SELECT source, n_items, alloc FROM st
       |  WHERE it = (SELECT max(it) FROM st))""".stripMargin

  /** q190 oracle: the q182 admission arithmetic with the frozen
    * quotas swapped for the CAPPED fixpoint allocation re-rooted on
    * the standing split — [[graft.operators.Mixing
    * .cappedInterleaveIncrement]] replayed relationally (the
    * admission tail is q182's verbatim: the two members share
    * `incrementOverQuotas` in the engine and this SQL here). */
  private def cappedIncrementSql(budget: Long, maxEpochs64: Long): String = {
    val bucket = DecontaminateOracle.bucketExpr("graft")
    s"""WITH RECURSIVE std AS (SELECT * FROM documents
       |  WHERE doc_id IS NOT NULL AND (($bucket) % 1000) >= 100),
       |${cappedInterleaveAllocSql(budget, maxEpochs64, "std")},
       |npop AS (SELECT doc_id, source,
       |    CAST(len(string_split_regex(coalesce(text, ''), '\\s+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |  WHERE doc_id IS NOT NULL AND (($bucket) % 1000) < 100),
       |newb AS (SELECT doc_id, source, n_tokens,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY md5('graft' || CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS BIGINT) AS batch_rank
       |  FROM npop),
       |adm AS (SELECT n.doc_id, n.source, n.n_tokens, n.batch_rank,
       |    CASE WHEN a.alloc IS NOT NULL AND n.batch_rank <= a.alloc - a.n_items
       |      THEN 1 ELSE 0 END AS kept,
       |    a.n_items, a.alloc
       |  FROM newb n LEFT JOIN a USING (source))
       |SELECT doc_id, source, n_tokens, batch_rank,
       |  CAST(kept AS BIGINT) AS kept,
       |  CAST(CASE WHEN kept = 1
       |    THEN (n_items + batch_rank - 1) // n_items END AS BIGINT) AS epoch,
       |  CAST(CASE WHEN kept = 1
       |    THEN n_items + batch_rank - 1 END AS BIGINT) AS appearance,
       |  CAST(CASE WHEN kept = 1
       |    THEN (n_items + batch_rank - 1) * (4611686018427387904 // alloc)
       |      + (4611686018427387904 // alloc) // 2 END AS BIGINT) AS pos_key
       |FROM adm""".stripMargin
  }

  /** The q174 pack-kernel CLOSING over a `manifest` relation — the
    * stride-order prefix sum, pack spans and the per-shard rollup,
    * ONE textual definition shared by the q176 (policy→order) and
    * q189 (resample→order) capstones so the trainer-facing sheet
    * cannot drift between them. */
  // lazy: interpolated by specs vals that initialize before this
  // object's later-defined vals (the ExtensionQueries init-order rule)
  private lazy val packShardClosingSql: String =
    s"""ord AS (SELECT source, n_tokens, appearance, pos_key,
       |    CAST(coalesce(sum(n_tokens) OVER (
       |      ORDER BY pos_key, source, appearance
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
       |  FROM manifest),
       |p AS (SELECT source, n_tokens,
       |    cb // $ManifestCapacity AS pack_first,
       |    (cb + greatest(n_tokens, 1) - 1) // $ManifestCapacity AS pack_last
       |  FROM ord)
       |SELECT pack_first // $ManifestPacksPerShard AS shard,
       |  CAST(count(*) AS BIGINT) AS n_appearances,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(max(pack_last - pack_first + 1) AS BIGINT) AS max_span,
       |  CAST(sum(CASE WHEN pack_last // $ManifestPacksPerShard <> pack_first // $ManifestPacksPerShard
       |    THEN 1 ELSE 0 END) AS BIGINT) AS boundary_crossers,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
       |FROM p GROUP BY 1""".stripMargin

  /** q159 oracle: the five member oracles (q153/q154/q155/q156/q193)
    * embedded verbatim as derived tables and full-outer joined on
    * source — the [[graft.operators.Ensemble.sourceScorecard]]
    * composition, so the scorecard cannot drift from its members. */
  private def sourceScorecardSql(positiveSql: String): String =
    s"""WITH d AS (SELECT source, n AS n_docs, dup_rate_q, drop_rate_q FROM (
       |${ClusterOracle.dupRatesBySourceSql}
       |) t1),
       |g AS (SELECT source, n AS n_gated, rate_rules_q, rate_lm_q, rate_nb_q FROM (
       |${gateRatesBySourceSql(positiveSql)}
       |) t2),
       |k AS (SELECT source, kl_q FROM (
       |${DsirOracle.sourceKlSql()}
       |) t3),
       |p AS (SELECT source, psi_q, alert AS psi_alert FROM (
       |${PsiOracle.bySourceSql()}
       |) t4),
       |lk AS (SELECT source, kl_q AS lang_kl_q FROM (
       |${LangIdOracle.langKlBySourceSql()}
       |) t5)
       |SELECT source, n_docs, dup_rate_q, drop_rate_q, n_gated,
       |  rate_rules_q, rate_lm_q, rate_nb_q, kl_q, psi_q, psi_alert,
       |  lang_kl_q
       |FROM d
       |FULL JOIN g USING (source)
       |FULL JOIN k USING (source)
       |FULL JOIN p USING (source)
       |FULL JOIN lk USING (source)""".stripMargin

  /** The q71 release chain over an arbitrary corpus frame — ONE
    * textual definition shared by q71 (raw documents) and the q167
    * capstone (the q164 policy-acted corpus), so the two cannot
    * drift: per-source cap 10 → train split → near-dup keep-set over
    * the minhash∪simhash pair graph → decontamination drop → PII
    * redaction. The shingle pass materializes ONCE and feeds the
    * signature, verify and decontamination stages (the FromShingles
    * sharing rule). */
  private def corpusBuild(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val capped = graft.operators.Sampling.capPerGroup(
      docs.select(col("doc_id"), col("source"), col("lang"), col("text")),
      "doc_id", "source", k = 10)
    val train = graft.operators.Sampling.withSplitBucket(capped, "doc_id")
      .filter(col("__bucket") >= 100).drop("__bucket")
    // ONE shingle pass (the token-stream window shuffle) feeds the
    // minhash signature, Jaccard-verify, AND decontamination stages
    // — the FromShingles sharing rule. The shingle checkpoint and the
    // simhash arm are independent eager chains: build them
    // concurrently (guide §2.6) so their jobs overlap instead of
    // queueing behind each other.
    val Seq(shingles, simPairs) = graft.operators.Par.run[org.apache.spark.sql.DataFrame](
      () => Dedup.materialize(Dedup.shingleRows(docs)),
      () => Dedup.simhashNearDupPairs(docs, maxHamming = 5).select("a_id", "b_id"))
    val pairs = Dedup.nearDupPairsFromShingles(shingles).select("a_id", "b_id")
      .union(simPairs)
    val comps = graft.operators.ConnectedComponents.components(pairs)
    val deduped = graft.operators.ConnectedComponents
      .keepCanonicalFromComponents(train, "doc_id", comps)
    val contaminated = graft.operators.Decontaminate
      .contaminationReportFromShingles(shingles)
      .select(col("train_id").as("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val decorated = concat(lit("email user"), col("doc_id").cast("string"),
      lit("@mail.example.org from 10."), (col("doc_id") % 200).cast("string"),
      lit("."), ((col("doc_id") * 7) % 250).cast("string"), lit(".1 "),
      coalesce(col("text"), lit("")))
    clean.select(col("doc_id"), col("source"), col("lang"),
      TextFunctions.redactIps(TextFunctions.redactEmails(decorated))
        .as("text_redacted"))
  }

  /** q166 oracle: the q159 composition embedded verbatim, its
    * dup_rate_q / kl_q columns swept at their own exact deciles
    * (percentile_disc ≡ [[graft.operators.Quantiles
    * .globalQuantileDisc]], the q60 pin), the q162 CASE replayed per
    * grid cell under identical three-valued NULL logic, and BIGINT
    * what-if rollups. */
  private def feedPolicyOperatingPointsSql(positiveSql: String,
      downRulesQ: Long = 838861L, downLangKlQ: Long = 128L): String = {
    def decs(c: String) = (1 to 9).map(i =>
      s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY $c)").mkString(",\n      ")
    s"""WITH sc AS MATERIALIZED (
       |${sourceScorecardSql(positiveSql)}
       |),
       |td AS (SELECT DISTINCT thr_dup_q FROM (SELECT unnest([
       |      ${decs("dup_rate_q")}]) AS thr_dup_q FROM sc) z
       |    WHERE thr_dup_q IS NOT NULL),
       |tk AS (SELECT DISTINCT thr_kl_q FROM (SELECT unnest([
       |      ${decs("kl_q")}]) AS thr_kl_q FROM sc) z
       |    WHERE thr_kl_q IS NOT NULL),
       |v AS (SELECT g.thr_dup_q, g.thr_kl_q,
       |    CASE WHEN sc.dup_rate_q >= g.thr_dup_q OR sc.kl_q >= g.thr_kl_q
       |           THEN 'drop'
       |         WHEN sc.psi_alert = 1 OR sc.rate_rules_q >= $downRulesQ
       |           OR sc.lang_kl_q >= $downLangKlQ
       |           THEN 'downweight'
       |         ELSE 'keep' END AS verdict,
       |    coalesce(sc.n_docs, 0) AS nd, coalesce(sc.kl_q, 0) AS klq
       |  FROM (SELECT td.thr_dup_q, tk.thr_kl_q FROM td CROSS JOIN tk) g
       |  CROSS JOIN sc)
       |SELECT thr_dup_q, thr_kl_q,
       |  CAST(sum(CASE WHEN verdict = 'drop' THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_src,
       |  CAST(sum(CASE WHEN verdict = 'downweight' THEN 1 ELSE 0 END) AS BIGINT) AS n_down_src,
       |  CAST(sum(CASE WHEN verdict = 'keep' THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_src,
       |  CAST(sum(CASE WHEN verdict = 'drop' THEN nd ELSE 0 END) AS BIGINT) AS docs_dropped,
       |  CAST(sum(CASE WHEN verdict = 'downweight' THEN nd ELSE 0 END) AS BIGINT) AS docs_damped,
       |  CAST(sum(CASE WHEN verdict = 'keep' THEN nd ELSE 0 END) AS BIGINT) AS docs_kept,
       |  CAST(sum(CASE WHEN verdict <> 'drop' THEN klq * nd ELSE 0 END) AS BIGINT) AS kept_kl_mass_q
       |FROM v GROUP BY 1, 2""".stripMargin
  }

  /** q167 oracle: the q164 acted-corpus chain embedded verbatim as
    * the `acted` CTE (carrying lang/text for the release stages),
    * then the ENTIRE q71 chain ([[CorpusOracle.ctes]]) re-rooted on
    * it — one WITH RECURSIVE, every stage textually identical to its
    * standalone oracle. */
  /** q196 oracle: the q184 act embedded as the language keep-set —
    * kept docs carry the MINTED label in the `lang` seat — then the
    * ENTIRE q71 chain re-rooted on the kept corpus; the lang twin of
    * [[policyReleaseSql]]/[[resampleReleaseSql]]. */
  private def langReleaseSql(marginThresholdQ: Long): String =
    s"""WITH RECURSIVE acted AS MATERIALIZED (
       |  SELECT d.doc_id, d.source, a.lang_id AS lang, d.text
       |  FROM documents d JOIN (
       |${LangIdOracle.applySql(marginThresholdQ)}
       |  ) a ON a.doc_id = d.doc_id
       |  WHERE a.lang_id <> 'unknown'),
       |${CorpusOracle.ctes("acted")}
       |${CorpusOracle.closing}""".stripMargin

  private def policyReleaseSql(positiveSql: String): String =
    s"""WITH RECURSIVE acted AS MATERIALIZED (
       |${policyActSql(positiveSql,
           selectCols = "d.doc_id, d.source, d.lang, d.text")}
       |),
       |${CorpusOracle.ctes("acted")}
       |${CorpusOracle.closing}""".stripMargin

  /** q169 oracle: the q161 importance-resample keep-set embedded as
    * the `kept` CTE, joined back to `documents` for the release
    * stages' lang/text (the resample's scored frame deliberately
    * carries neither), then the ENTIRE q71 chain re-rooted on the
    * resampled corpus — the mixing twin of [[policyReleaseSql]]. */
  private def resampleReleaseSql(budgetPermille: Int): String =
    s"""WITH RECURSIVE kept AS MATERIALIZED (SELECT doc_id FROM (
       |${DsirOracle.resampleSql(budgetPermille)}
       |) t_k),
       |acted AS (SELECT d.doc_id, d.source, d.lang, d.text
       |  FROM documents d JOIN kept k ON k.doc_id = d.doc_id),
       |${CorpusOracle.ctes("acted")}
       |${CorpusOracle.closing}""".stripMargin

  /** q162 oracle: the q159 composition embedded verbatim with the
    * [[graft.operators.Ensemble.feedPolicy]] CASE on top — one
    * textual definition of the evidence, so the verdict column is
    * bitwise a function of the scorecard both engines agree on
    * (NULL metrics fall through to 'keep' under identical
    * three-valued logic). */
  private def feedPolicySql(positiveSql: String,
      dropDupQ: Long = 524288L, dropKlQ: Long = 192L,
      downRulesQ: Long = 838861L, downLangKlQ: Long = 128L): String =
    s"""SELECT source, n_docs, dup_rate_q, drop_rate_q, n_gated,
       |  rate_rules_q, rate_lm_q, rate_nb_q, kl_q, psi_q, psi_alert,
       |  lang_kl_q,
       |  CASE WHEN dup_rate_q >= $dropDupQ OR kl_q >= $dropKlQ THEN 'drop'
       |       WHEN psi_alert = 1 OR rate_rules_q >= $downRulesQ
       |         OR lang_kl_q >= $downLangKlQ
       |         THEN 'downweight'
       |       ELSE 'keep' END AS verdict
       |FROM (
       |${sourceScorecardSql(positiveSql)}
       |) sc""".stripMargin

  /** q164 oracle: the q162 verdict CTE embedded verbatim, joined back
    * to the corpus with the [[graft.operators.Ensemble.actOnVerdicts]]
    * semantics — NULL-verdict rows keep, 'downweight' rows keep iff
    * their md5 bucket under the 'downweight' salt falls in the damp
    * permille, NULL doc_ids never emit. */
  private def policyActSql(positiveSql: String,
      downweightPermille: Int = 500,
      selectCols: String = "d.doc_id, d.source"): String = {
    val bucket = DecontaminateOracle.bucketExpr("downweight", "d.doc_id")
    s"""WITH v AS (SELECT source, verdict FROM (
       |${feedPolicySql(positiveSql)}
       |) t9)
       |SELECT $selectCols
       |FROM documents d
       |LEFT JOIN v ON coalesce(d.source, 'unknown') = v.source
       |WHERE d.doc_id IS NOT NULL AND (
       |  coalesce(v.verdict, 'keep') = 'keep' OR
       |  (v.verdict = 'downweight'
       |    AND ($bucket) % 1000 < $downweightPermille))""".stripMargin
  }

  /** q157 oracle: the [[graft.operators.EmbeddingAudit
    * .labelSeparationSheet]] mirror — per-row list_dot_product norms
    * (the q30/q94 bitwise contract), floor-quantized per-dimension
    * component sums over a literal dim range, the sign-CASE
    * trunc-toward-zero centroid, pure-BIGINT pair dots, and the same
    * single IEEE division over two sqrts. */
  private def labelSeparationSql(dim: Int): String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v,
       |    list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS n2
       |  FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim
       |    AND label IS NOT NULL),
       |fin AS (SELECT * FROM base WHERE NOT isnan(n2) AND NOT isinf(n2)),
       |stats AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(floor(n2 * 1048576) AS BIGINT)) AS BIGINT) AS ssq_q
       |  FROM fin GROUP BY label),
       |sums AS (SELECT label, CAST(r.i AS BIGINT) AS d,
       |    CAST(sum(CAST(floor(v[CAST(r.i AS INTEGER) + 1] * 1048576) AS BIGINT))
       |      AS BIGINT) AS s
       |  FROM fin, range(0, $dim) r(i) GROUP BY 1, 2),
       |m AS (SELECT label, d,
       |    CASE WHEN s >= 0 THEN s // n ELSE -((-s) // n) END AS m
       |  FROM sums JOIN stats USING (label)),
       |pairs AS (SELECT a.label AS lab_a, b.label AS lab_b,
       |    CAST(sum(a.m * b.m) AS BIGINT) AS dot_c_q
       |  FROM m a JOIN m b ON a.d = b.d WHERE a.label <= b.label
       |  GROUP BY 1, 2),
       |sd AS (SELECT label, CAST(sum(m * m) AS BIGINT) AS selfq
       |  FROM m GROUP BY label)
       |SELECT p.lab_a, p.lab_b, sa.n AS n_a, sb.n AS n_b, p.dot_c_q,
       |  CASE WHEN da.selfq > 0 AND db.selfq > 0
       |    THEN CAST(p.dot_c_q AS DOUBLE)
       |      / (sqrt(CAST(da.selfq AS DOUBLE)) * sqrt(CAST(db.selfq AS DOUBLE)))
       |    ELSE 0.0 END AS cos_c,
       |  CAST(CASE WHEN p.lab_a = p.lab_b
       |    THEN greatest(0, (sa.ssq_q // sa.n) - (da.selfq // 1048576))
       |    ELSE -1 END AS BIGINT) AS within_q
       |FROM pairs p
       |JOIN stats sa ON sa.label = p.lab_a
       |JOIN stats sb ON sb.label = p.lab_b
       |JOIN sd da ON da.label = p.lab_a
       |JOIN sd db ON db.label = p.lab_b""".stripMargin

  /** q152 oracle: term counts → exact (cnt DESC, term ASC) ranks →
    * the [[DsirOracle.logChain]] fixed-point log2 replay of rank and
    * count over the top `fitRanks` rows → one-row OLS sums and the
    * integer slope pair. */
  private def zipfSql(fitRanks: Int): String =
    s"""WITH tok AS (SELECT w FROM (
       |    SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
       |    FROM documents) WHERE length(w) >= 1),
       |cnts AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY w),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
       |    CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n_tokens FROM cnts),
       |rk AS (SELECT w, cnt,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, w ASC) AS BIGINT) AS rank
       |  FROM cnts),
       |fit0 AS (SELECT rank, cnt FROM rk WHERE rank <= $fitRanks),
       |${DsirOracle.logChain("fit0", Seq("r" -> "rank", "c" -> "cnt"),
           keyCols = Seq("rank", "cnt"), prefix = "z")},
       |xy AS (SELECT (e_r * 64 + f_r) AS x, (e_c * 64 + f_c) AS y FROM z6),
       |sums AS (SELECT CAST(count(*) AS BIGINT) AS n_fit,
       |    CAST(coalesce(sum(x), 0) AS BIGINT) AS sum_x,
       |    CAST(coalesce(sum(y), 0) AS BIGINT) AS sum_y,
       |    CAST(coalesce(sum(x * x), 0) AS BIGINT) AS sum_xx,
       |    CAST(coalesce(sum(x * y), 0) AS BIGINT) AS sum_xy
       |  FROM xy)
       |SELECT t.n_terms, t.n_tokens, s.n_fit, s.sum_x, s.sum_y, s.sum_xx,
       |  s.sum_xy,
       |  CAST(s.n_fit * s.sum_xy - s.sum_x * s.sum_y AS BIGINT) AS slope_num,
       |  CAST(s.n_fit * s.sum_xx - s.sum_x * s.sum_x AS BIGINT) AS slope_den,
       |  CASE WHEN s.n_fit * s.sum_xx - s.sum_x * s.sum_x = 0 THEN -1.0
       |    ELSE CAST(s.n_fit * s.sum_xy - s.sum_x * s.sum_y AS DOUBLE)
       |      / (s.n_fit * s.sum_xx - s.sum_x * s.sum_x) END AS slope
       |FROM tot t, sums s""".stripMargin

  /** The shared q150/q153 oracle prefix: the three family mirrors
    * embedded as nested-WITH subqueries (ClassifierOracle.sql /
    * BpeOracle.unigramQualitySql / the shared qualityRuleCtes + q74
    * precedence CASE), joined on doc_id into the held-out kill frame
    * `kf(doc_id, k_rules, k_lm, k_nb)` — ONE textual definition, the
    * [[graft.operators.Ensemble]] killFrame mirror. */
  private def killFrameCtes(positiveSql: String): String =
    s"""nbs AS (SELECT doc_id, predicted FROM (
       |${ClassifierOracle.sql(positiveSql)}
       |) t1),
       |lms AS (SELECT doc_id, bucket FROM (
       |${BpeOracle.unigramQualitySql()}
       |) t2),
       |rls AS (SELECT doc_id, reason FROM (
       |WITH $qualityRuleCtes,
       |audit AS (SELECT doc_id,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN lang <> 'en' THEN 'non_english'
       |       WHEN 50 * top_bigram_n > 9 * n_bigrams OR 5 * top_token_n > n_tokens
       |            OR max_token_run >= 4 OR 10 * (n_3grams - n_distinct_3grams) > 3 * n_3grams THEN 'repetitive'
       |       WHEN 50 * stop_cnt < n_tokens THEN 'low_stopword'
       |       ELSE 'kept' END AS reason
       | FROM j)
       |SELECT doc_id, reason FROM audit) t3),
       |kf AS (SELECT nbs.doc_id,
       |    (rls.reason <> 'kept') AS k_rules,
       |    (lms.bucket IN ('tail', 'empty')) AS k_lm,
       |    (nbs.predicted = 0) AS k_nb
       |  FROM nbs JOIN lms USING (doc_id) JOIN rls USING (doc_id))""".stripMargin

  /** q150 oracle: [[killFrameCtes]] closed by one 24-sum aggregate
    * and the 6-row pair union — the
    * [[graft.operators.Ensemble.gateAgreement]] shape. */
  private def gateAgreementSql(positiveSql: String): String = {
    val sigs = graft.operators.Ensemble.SignalNames
    val pairs = for {
      i <- sigs.indices
      j <- i until sigs.size
    } yield (sigs(i), sigs(j))
    val sumDefs = pairs.flatMap { case (a, b) => Seq(
      s"CAST(sum(CASE WHEN k_$a AND k_$b THEN 1 ELSE 0 END) AS BIGINT) AS bk_${a}_$b",
      s"CAST(sum(CASE WHEN k_$a AND NOT k_$b THEN 1 ELSE 0 END) AS BIGINT) AS ao_${a}_$b",
      s"CAST(sum(CASE WHEN NOT k_$a AND k_$b THEN 1 ELSE 0 END) AS BIGINT) AS bo_${a}_$b",
      s"CAST(sum(CASE WHEN NOT k_$a AND NOT k_$b THEN 1 ELSE 0 END) AS BIGINT) AS nn_${a}_$b")
    }.mkString(",\n    ")
    val rowSelects = pairs.map { case (a, b) =>
      val ag = s"(bk_${a}_$b + nn_${a}_$b)"
      s"""SELECT '$a' AS sig_a, '$b' AS sig_b,
         |  bk_${a}_$b AS n_both_kill, ao_${a}_$b AS n_a_only,
         |  bo_${a}_$b AS n_b_only, nn_${a}_$b AS n_neither,
         |  CAST(CASE WHEN __n = 0 THEN -1
         |    ELSE (($ag * 1024) // __n) * 1024 + ((($ag * 1024) % __n) * 1024) // __n
         |    END AS BIGINT) AS agree_q
         |FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH ${killFrameCtes(positiveSql)},
       |s AS (SELECT CAST(count(*) AS BIGINT) AS __n,
       |    $sumDefs
       |  FROM kf)
       |$rowSelects""".stripMargin
  }

  /** q153 oracle: [[killFrameCtes]] joined back to the documents'
    * source column and rolled up per source with the exact two-step
    * rates — the [[graft.operators.Ensemble.gateRatesBySource]]
    * shape. */
  private def gateRatesBySourceSql(positiveSql: String): String = {
    def rate(cnt: String) =
      s"""CASE WHEN n = 0 THEN 0
         |    ELSE (($cnt * 1024) // n) * 1024 + ((($cnt * 1024) % n) * 1024) // n
         |    END""".stripMargin
    s"""WITH ${killFrameCtes(positiveSql)},
       |srcs AS (SELECT doc_id, coalesce(source, 'unknown') AS source
       |  FROM documents WHERE doc_id IS NOT NULL),
       |g AS (SELECT s.source,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CASE WHEN k_rules THEN 1 ELSE 0 END) AS BIGINT) AS n_rules,
       |    CAST(sum(CASE WHEN k_lm THEN 1 ELSE 0 END) AS BIGINT) AS n_lm,
       |    CAST(sum(CASE WHEN k_nb THEN 1 ELSE 0 END) AS BIGINT) AS n_nb
       |  FROM kf JOIN srcs s USING (doc_id) GROUP BY s.source)
       |SELECT source, n, n_rules, n_lm, n_nb,
       |  CAST(${rate("n_rules")} AS BIGINT) AS rate_rules_q,
       |  CAST(${rate("n_lm")} AS BIGINT) AS rate_lm_q,
       |  CAST(${rate("n_nb")} AS BIGINT) AS rate_nb_q
       |FROM g""".stripMargin
  }

  /** The HLL++ sketch sheet of q32: approximate beside exact distinct
    * counts. Spec-bounded (ApproxDistinctSpec), not oracle-compared —
    * sketches are engine-specific by construction. */
  def approxDistinctUsers(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))

  /** The approx_percentile (GK-sketch) sheet of q60: approximate beside
    * exact per-group quantiles. Spec-bounded (QuantileSpec) on RANK
    * error — the sketch's actual guarantee — not oracle-compared:
    * sketches are engine-specific by construction. */
  def approxQuantiles(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    Tables.lineitem(s, d).groupBy(col("l_returnflag")).agg(
      expr("approx_percentile(l_extendedprice, array(0.25, 0.50, 0.75, 0.95), 10000)").as("approx_q"),
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice)").as("p25"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice)").as("p75"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").as("p95"),
      count(lit(1)).as("n_rows"))
}
