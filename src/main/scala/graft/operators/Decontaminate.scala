package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Train/test contamination detection — the n-gram overlap audit every
  * LLM training pipeline runs before shipping an eval split: find
  * training documents that share verbatim 3-gram shingles with any
  * held-out test document.
  *
  * The split is the deterministic md5-bucket membership of
  * [[Sampling.sampleByKey]] (same salt ⇒ the test split IS the q55
  * sample — one split definition across the pipeline), so the report
  * is a pure function of the data.
  *
  * Scale shape (100 TB): the join key is the shingle string, and raw
  * shingle joins explode on stop-phrase shingles ("of the and" appears
  * in a large fraction of any corpus — a quadratic hot key). The
  * document-frequency cap (`maxShingleDf`) drops those before the
  * join — exactly what production decontamination does, because a
  * shingle shared by thousands of documents carries no contamination
  * signal anyway. After the cap, per-shingle fan-out is bounded by
  * maxShingleDf on each side, so the join is linear in shingle volume
  * with a constant-bounded multiplier. Distinct-shingle counting is a
  * two-level aggregate (expand + partial agg), never a per-group set
  * in driver memory.
  */
object Decontaminate {

  /** One row per contaminated training document:
    * (train_id, n_shared_shingles, n_test_docs) — how many distinct
    * capped shingles it shares with the test split and how many test
    * documents it overlaps. Rows with NULL doc_id are excluded (no
    * stable split membership — the [[Sampling.sampleByKey]] rule). */
  def contaminationReport(
      docs: DataFrame,
      testPermille: Int = 100,
      maxShingleDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame =
    contaminationReportFromShingles(Dedup.shingleRows(docs),
      testPermille, maxShingleDf, minOverlap, salt)

  /** [[contaminationReport]] over a precomputed (doc_id, sh) shingle
    * frame (the [[Dedup.shingleRows]] shape; positional rows fine — the
    * distinct below owns set semantics). A pipeline that also runs
    * shingle-based dedup (q71) should [[Dedup.materialize]] ONE shingle
    * frame and feed both — the shingle pass is a full window shuffle of
    * the token stream, the most expensive stage of either consumer.
    *
    * Split membership is an EXPRESSION on the shingle rows' own doc_id
    * (the [[Sampling.withSplitBucket]] arithmetic) — deriving it from
    * the frame that supplies the evidence removes a corpus-sized
    * membership join AND makes membership/evidence desync structurally
    * impossible. CONTRACT: `shingles` must cover the whole corpus
    * being audited. Passing a subset's shingles (e.g. train-only)
    * cannot be detected here and silently UNDER-reports: test docs
    * with no shingle rows contribute no overlap, and a contaminated
    * train doc ships. When in doubt, use [[contaminationReport]],
    * which derives the frame itself. */
  def contaminationReportFromShingles(
      shingles: DataFrame,
      testPermille: Int = 100,
      maxShingleDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame = {
    val capped = cappedSplitShingles(shingles, testPermille, maxShingleDf, salt)
    val trainSh = capped.filter(!col("is_test"))
      .select(col("doc_id").as("train_id"), col("sh"))
    val testSh = capped.filter(col("is_test"))
      .select(col("doc_id").as("test_id"), col("sh"))
    trainSh.join(testSh, "sh")
      .groupBy(col("train_id"))
      .agg(countDistinct(col("sh")).as("n_shared_shingles"),
        countDistinct(col("test_id")).as("n_test_docs"))
      .filter(col("n_shared_shingles") >= minOverlap)
  }

  /** Pre-round-9 signature. Split membership is now derived from the
    * shingle rows' own doc_id; the `docs` frame is IGNORED — a caller
    * that scoped the audit by restricting `docs` must restrict
    * `shingles` instead. Deprecated (no defaults, so legacy call
    * shapes fail to resolve rather than silently re-scoping). */
  @deprecated("membership derives from the shingle rows' own doc_id; " +
    "`docs` is ignored — use the overload without it", "round 10")
  def contaminationReportFromShingles(docs: DataFrame, shingles: DataFrame,
      testPermille: Int, maxShingleDf: Long, minOverlap: Long,
      salt: String): DataFrame =
    contaminationReportFromShingles(shingles, testPermille, maxShingleDf,
      minOverlap, salt)

  /** THE contamination evidence frame both report directions read —
    * distinct (doc_id, sh) rows tagged with split membership (the
    * [[Sampling.withSplitBucket]] expression on the rows' own doc_id,
    * no membership join) and df-capped (the hot-key bound): the ONE
    * definition of what counts as leakage evidence, so
    * [[contaminationReportFromShingles]] and
    * [[evalContaminationReport]] cannot disagree by construction.
    * Materialized twice (pre-cap for the df census, post-cap for the
    * join both directions close over). */
  private def cappedSplitShingles(shingles: DataFrame, testPermille: Int,
      maxShingleDf: Long, salt: String): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille must be in [0,1000], got $testPermille")
    val sh = Dedup.materialize(
      Sampling.withSplitBucket(shingles.distinct(), "doc_id", salt)
        .select(col("doc_id"), col("sh"),
          (col("__bucket") < testPermille).as("is_test")))
    val rare = sh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select(col("sh"))
    Dedup.materialize(sh.join(rare, Seq("sh"), "left_semi"))
  }

  /** Eval-side contamination report — the flip side of
    * [[contaminationReport]], answering the question the EVAL owner
    * asks: which test items are compromised and must be dropped or
    * re-drawn before the split ships? A test doc is compromised by a
    * training doc when the two share ≥ `minOverlap` distinct capped
    * shingles (the same pair-level evidence rule); per compromised
    * test doc the report carries how many training docs leak into it
    * and the worst single-doc overlap. Output:
    * `(test_id, n_train_docs, max_overlap)`.
    *
    * Same split, shingle, and df-cap definitions as q66 — one
    * contamination evidence rule read from both ends, so the two
    * reports cannot disagree about what counts as leakage.
    *
    * Scale shape: identical to [[contaminationReport]] through the
    * capped join (df-capped fan-out keeps it linear); the pair-level
    * aggregation keys on (test, train) pairs the join already bounds,
    * and the closing per-test rollup is test-split-sized. */
  def evalContaminationReport(
      docs: DataFrame,
      testPermille: Int = 100,
      maxShingleDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame =
    evalContaminationReportFromShingles(Dedup.shingleRows(docs),
      testPermille, maxShingleDf, minOverlap, salt)

  /** [[evalContaminationReport]] over a precomputed shingle frame —
    * the same sharing contract as [[contaminationReportFromShingles]]
    * (a pipeline running BOTH directions materializes ONE shingle
    * frame and feeds each). Reads [[cappedSplitShingles]], the shared
    * evidence frame, so the directions agree by construction. */
  def evalContaminationReportFromShingles(
      shingles: DataFrame,
      testPermille: Int = 100,
      maxShingleDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame = {
    val capped = cappedSplitShingles(shingles, testPermille, maxShingleDf, salt)
    val trainSh = capped.filter(!col("is_test"))
      .select(col("doc_id").as("train_id"), col("sh"))
    val testSh = capped.filter(col("is_test"))
      .select(col("doc_id").as("test_id"), col("sh"))
    // capped is a distinct (doc, sh) frame, so the join emits each
    // (test, train, sh) once: a plain count IS the distinct count,
    // without the two-level distinct rewrite over the join output
    trainSh.join(testSh, "sh")
      .groupBy(col("test_id"), col("train_id"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minOverlap)
      .groupBy(col("test_id"))
      .agg(count(lit(1)).as("n_train_docs"), max(col("n_pair")).as("max_overlap"))
  }

  /** Pre-round-9 signature — see the
    * [[contaminationReportFromShingles]] deprecation note. */
  @deprecated("membership derives from the shingle rows' own doc_id; " +
    "`docs` is ignored — use the overload without it", "round 10")
  def evalContaminationReportFromShingles(docs: DataFrame, shingles: DataFrame,
      testPermille: Int, maxShingleDf: Long, minOverlap: Long,
      salt: String): DataFrame =
    evalContaminationReportFromShingles(shingles, testPermille, maxShingleDf,
      minOverlap, salt)

  /** Bloom-filter hash positions of a shingle: `k = 4` probes, probe
    * `j` reading hex digits `[8j+1, 8j+8]` of md5 (a 32-bit integer)
    * mod `mBits` — ONE digest per shingle, exact BIGINT arithmetic,
    * mirrored digit-by-digit in the DuckDB oracle
    * ([[graft.queries.DecontaminateOracle.bloomSql]]). */
  private[graft] def bloomPosition(c: Column, j: Int, mBits: Long): Column =
    conv(substring(md5(c), 1 + 8 * j, 8), 16, 10).cast("long") % mBits

  private[graft] def bloomPositions(c: Column, mBits: Long): Column =
    array((0 until 4).map(bloomPosition(c, _, mBits)): _*)

  /** The q116 Bloom filter as a ONE-ROW broadcastable frame — column
    * `__bmask: map<bigint, bigint>` mapping each SET bit position of
    * the eval split's capped shingles to 1. The static side of the
    * streaming decontamination gate
    * ([[graft.streaming.Curation.decontaminationGate]]): built once,
    * batch-side, from the eval corpus (same split/shingle/df-cap
    * definitions as [[bloomContaminationCandidates]], so the gate and
    * the batch probe agree on the filter bit-for-bit), then broadcast
    * onto the ingest stream where every probe is a map lookup — the
    * filter is ≤ mBits entries (~262k at the default sizing, a few MB)
    * regardless of corpus scale, and carries ZERO streaming state. */
  def bloomEvalMask(
      docs: DataFrame,
      testPermille: Int = 100,
      mBits: Long = 1L << 18,
      maxTestDf: Long = 20L,
      salt: String = "graft"): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille must be in [0,1000], got $testPermille")
    require(mBits > 0, s"mBits must be positive, got $mBits")
    val testSh = Sampling.withSplitBucket(docs, "doc_id", salt)
      .filter(col("__bucket") < testPermille)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.tokenNgrams(
          split(lower(col("text")), "\\s+"), 3))).as("sh"))
    val rare = testSh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxTestDf).select(col("sh"))
    testSh.join(rare, Seq("sh"), "left_semi")
      .select(explode(bloomPositions(col("sh"), mBits)).as("bit")).distinct()
      .agg(map_from_entries(collect_list(struct(col("bit"), lit(1L)))).as("__bmask"))
  }

  /** Bloom-filter decontamination probe — the broadcast-sketch variant
    * of [[contaminationReport]], the shape production decontamination
    * takes when the training side is 100 TB: the EVAL split's shingles
    * collapse into an `mBits`-bit Bloom filter (a set of set bit
    * positions, ≤ mBits rows regardless of corpus size), and every
    * training shingle probes it map-side. A training shingle whose 4
    * probe bits are all set is a contamination CANDIDATE — a strict
    * superset of the exact matches (Bloom has no false negatives; the
    * deterministic false-positive rate is fill⁴, ~10⁻⁴ at the default
    * sizing), routed to the exact [[contaminationReport]] join or
    * human review. Output: `(train_id, n_shingles, n_candidates)` for
    * docs with ≥ `minOverlap` candidate shingles.
    *
    * The df cap is applied on the TEST side only (`maxTestDf`) — the
    * q66 hot-key bound restated so it is computable from the sketch
    * side alone: a stop-phrase shingle is prevalent in every split, so
    * capping its test-side df drops it from the filter, and the train
    * side never needs a corpus-wide census.
    *
    * Scale shape — the point of this operator: the training side is
    * never joined against eval data, never df-capped, never exchanged
    * on the shingle string ANYWHERE. The shingle frame is built fully
    * map-side — split-bucket membership is an EXPRESSION on doc_id
    * (no membership join), and per-doc set semantics come from
    * `array_distinct` on the per-doc gram array BEFORE the explode (a
    * shingle cannot span documents, so per-doc dedup IS the
    * (doc, shingle) distinct — without the corpus-wide exchange
    * `.distinct()` would cost). Each shingle row then computes its 4
    * positions map-side and passes through 4 chained BROADCAST
    * semi-joins against the bit set (the all-bits AND gate, zero
    * exchanges); the training side's only shuffles are the two
    * map-side-combinable per-doc counts. Eval-side work is bounded by
    * the eval split (tiny by construction), and the broadcast state is
    * ≤ mBits rows regardless of scale — the Bloom trade in its native
    * habitat. */
  def bloomContaminationCandidates(
      docs: DataFrame,
      testPermille: Int = 100,
      mBits: Long = 1L << 18,
      maxTestDf: Long = 20L,
      minOverlap: Long = 3L,
      salt: String = "graft"): DataFrame = {
    require(testPermille >= 0 && testPermille <= 1000,
      s"testPermille must be in [0,1000], got $testPermille")
    require(mBits > 0, s"mBits must be positive, got $mBits")
    val sh = Dedup.materialize(
      Sampling.withSplitBucket(docs, "doc_id", salt)
        .select(col("doc_id"), (col("__bucket") < testPermille).as("is_test"),
          explode(array_distinct(graft.functions.TextFunctions.tokenNgrams(
            split(lower(col("text")), "\\s+"), 3))).as("sh")))
    val testSh = sh.filter(col("is_test"))
    val rare = testSh.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxTestDf).select(col("sh"))
    // the filter: distinct set bits of the capped eval shingles
    val bits = Dedup.materialize(
      testSh.join(rare, Seq("sh"), "left_semi")
        .select(explode(bloomPositions(col("sh"), mBits)).as("bit")).distinct())
    val train = sh.filter(!col("is_test"))
      .select(Seq(col("doc_id").as("train_id"), col("sh")) ++
        (0 until 4).map(j => bloomPosition(col("sh"), j, mBits).as(s"__p$j")): _*)
    // the AND gate: 4 chained broadcast semi-joins, one per probe —
    // all map-side; a shingle survives iff every probe bit is set
    val candidates = (0 until 4).foldLeft(train) { (t, j) =>
      t.join(broadcast(bits), t(s"__p$j") === bits("bit"), "left_semi")
    }
    val totals = sh.filter(!col("is_test"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    // the flagged set is minOverlap-bounded (tiny) while totals is one
    // row per training doc — broadcast the flagged side, not a merge
    // join keyed on the corpus
    val flagged = candidates.groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") >= minOverlap)
    totals.withColumnRenamed("doc_id", "train_id")
      .join(broadcast(flagged), "train_id")
      .select(col("train_id"), col("n_shingles"), col("n_candidates"))
  }

  /** Semantic eval-decontamination — the EMBEDDING-SPACE member of the
    * contamination family (exact n-gram [[contaminationReport]],
    * eval-side [[evalContaminationReport]], Bloom
    * [[bloomContaminationCandidates]]): verbatim-overlap checks miss
    * paraphrased or translated eval leakage, so the audit the
    * benchmark literature actually calls for compares eval items to
    * training docs in embedding space (Yang et al. 2023,
    * "Rethinking Benchmark and Contamination for Language Models with
    * Rephrased Samples", arXiv:2311.04850 — public). A brute-force
    * eval × train sweep is the one shape that cannot ship at 100 TB;
    * this routes the probe through the STANDING IVF index instead
    * (the q49/q114 centroids — per-cell scan, nprobe/nlist of the
    * corpus per eval item).
    *
    * Split is the [[Sampling.withSplitBucket]] md5 membership (eval ⇔
    * bucket < `evalPermille` — the q68/q114 convention, one split
    * definition across the pipeline). For each eval vector: probe its
    * `nprobe` highest-cosine cells, compare against the train vectors
    * assigned there, and flag pairs with cosine ≥ `threshold`. Output
    * is the decontamination sheet a curation run consumes — one row
    * per FLAGGED train vector:
    * `(vec_id, n_evals, max_cos_q, top_eval_id)` with `n_evals` the
    * count of eval items hitting it, `max_cos_q = floor(cos·2^20)` of
    * the closest one (quantized per-pair BEFORE the max, so the sheet
    * is integer-exact), and `top_eval_id` that closest eval item
    * (ties → min eval id) — the evidence a reviewer inspects.
    *
    * Cross-cell misses are the documented IVF recall trade (q117's
    * audit measures it); the probe direction is eval → train because
    * the eval split is small by construction — exactly the side a
    * production system can afford to fan out.
    *
    * Scale shape (100 TB): ONE assignment exchange row per train
    * vector (the map-side-argmax [[Similarity.ivfAssign]] — and a real
    * system reads the persisted index instead of recomputing);
    * centroids broadcast (nlist rows); the benchmark-sized eval probe
    * frame broadcasts into the per-cell join, so the wide train
    * vectors NEVER shuffle for the comparison; the flagged-pair frame
    * is tiny (contamination is the exception) and its window sorts
    * only flagged pairs per train doc. */
  def semanticContaminationReport(embs: DataFrame, centroids: DataFrame,
      threshold: Double, nprobe: Int = 4, evalPermille: Int = 100,
      dim: Int = 0, salt: String = "graft"): DataFrame = {
    require(evalPermille >= 0 && evalPermille <= 1000,
      s"evalPermille must be in [0,1000], got $evalPermille")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    graft.GraftSession.ensureConfs(embs.sparkSession)
    val d = if (dim > 0) dim else Similarity.inferDim(embs)
    if (d <= 0) return embs.sparkSession.emptyDataFrame
      .select(lit(0L).as("vec_id"), lit(0L).as("n_evals"),
        lit(0L).as("max_cos_q"), lit(0L).as("top_eval_id"))
      .limit(0)
    val flagged = Sampling.withSplitBucket(embs, "vec_id", salt)
      .withColumn("__eval", col("__bucket") < evalPermille).drop("__bucket")
    val assigned = Dedup.materialize(
      Similarity.ivfAssign(flagged.filter(!col("__eval")), centroids, d)
        .select(col("n_id"), col("n_v"), col("n_n"), col("c_id")))
    val cent = centroids
      .filter(col("embedding").isNotNull && size(col("embedding")) === d)
      .select(col("vec_id").as("c_id"),
        col("embedding").cast("array<double>").as("c_v"))
      .withColumn("c_n", sqrt(Similarity.dot(col("c_v"), col("c_v"))))
    // eval → nprobe highest-cosine cells (|eval| × nlist rows: the
    // benchmark-sized side — a window is fine, the frame is tiny)
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cos_c").desc, col("c_id").asc)
    val probes = flagged.filter(col("__eval"))
      .filter(col("embedding").isNotNull && size(col("embedding")) === d)
      .select(col("vec_id").as("q_id"),
        col("embedding").cast("array<double>").as("q_v"))
      .withColumn("q_n", sqrt(Similarity.dot(col("q_v"), col("q_v"))))
      .crossJoin(broadcast(cent))
      .select(col("q_id"), col("q_v"), col("q_n"), col("c_id"),
        (Similarity.dot(col("q_v"), col("c_v")) / (col("q_n") * col("c_n")))
          .as("cos_c"))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nprobe)
      .select(col("q_id"), col("q_v"), col("q_n"), col("c_id"))
    // a train vector lives in exactly ONE cell and probe cells are
    // distinct per eval item → each (eval, train) pair scores at most
    // once; count(1) IS the distinct-eval count
    val pairs = Dedup.materialize(assigned.join(broadcast(probes), "c_id")
      .select(col("n_id"), col("q_id"),
        (Similarity.dot(col("q_v"), col("n_v")) / (col("q_n") * col("n_n")))
          .as("cos"))
      .filter(col("cos") >= threshold)
      .select(col("n_id"), col("q_id"),
        floor(col("cos") * lit(1048576.0)).cast("long").as("cos_q")))
    val wTop = Window.partitionBy(col("n_id"))
      .orderBy(col("cos_q").desc, col("q_id").asc)
    val top = pairs.withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1).select(col("n_id"), col("q_id").as("top_eval_id"))
    pairs.groupBy(col("n_id"))
      .agg(count(lit(1)).as("n_evals"), max(col("cos_q")).as("max_cos_q"))
      .join(top, "n_id")
      .select(col("n_id").as("vec_id"), col("n_evals"),
        col("max_cos_q"), col("top_eval_id"))
  }
}
