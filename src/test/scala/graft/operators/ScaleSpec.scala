package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.TestSpark
import graft.sources.Tables

/** Scale-mechanism specs: salted aggregation equivalence and bucketed
  * co-located joins (shuffle elimination) — the two knobs SURVEY's
  * 100 TB stance leans on beyond AQE defaults. */
class ScaleSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def collectShuffles(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    var n = 0
    plan.foreach {
      case _: ShuffleExchangeExec => n += 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        n += collectShuffles(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        n += collectShuffles(s.plan)
      case _ =>
    }
    n
  }

  test("salted two-phase aggregation equals direct aggregation on skewed data") {
    // 90% of rows on one key — the shape that straggles a single reducer
    val rows = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 50}" else "HOT", i.toDouble))
    val df = rows.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(sum($"v").as("s"), count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val salted = Skew.saltedAgg(df, Seq("k"), saltBuckets = 16, saltFrom = $"v",
      Skew.saltedSum($"v", "s"), Skew.saltedCount("n"),
      Skew.saltedMin($"v", "mn"), Skew.saltedMax($"v", "mx"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(salted.keySet == direct.keySet)
    direct.foreach { case (k, (s, n, mn, mx)) =>
      val (s2, n2, mn2, mx2) = salted(k)
      assert(n2 == n && mn2 == mn && mx2 == mx)
      assert(math.abs(s2 - s) < 1e-6 * math.abs(s) + 1e-9) // fp assoc tolerance
    }
  }

  test("AQE splits a skewed join partition at runtime (join-side skew is delegated to AQE)") {
    // The engine's documented stance: aggregation-side skew → saltedAgg;
    // JOIN-side skew → AQE's OptimizeSkewedJoin. This proves the
    // delegation actually fires: one hot key carries ~all fact rows,
    // thresholds are lowered so the optimization triggers at test scale.
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.get("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    try {
      val fact = spark.range(200000)
        .select((when(col("id") % 100 =!= 0, lit(7L))
          .otherwise(expr("(id div 100) % 50"))).as("k"),
          col("id").as("payload"))
      val dim = spark.range(50).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val joined = fact.join(dim, "k").groupBy("name").agg(sum("payload").as("s"))
      // drive THIS query execution (df.count() would plan a separate
      // one and leave this adaptive plan unexecuted/non-final)
      val qe = joined.queryExecution
      assert(qe.toRdd.count() > 0)
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"), s"expected AQE skew-join split in plan:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    // The 100 TB shape: fact partitioned by a key, dim filtered at query
    // time — DPP turns the dim filter into a runtime partition filter on
    // the fact scan so unneeded partitions are never read.
    val wh = java.nio.file.Files.createTempDirectory("dpp").toString
    Tables.orders(spark, sf001)
      .withColumn("bucket_k", expr("o_orderkey % 10"))
      .write.mode("overwrite").partitionBy("bucket_k").parquet(s"$wh/fact")
    val prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // keep the dim broadcastable: DPP reuses the broadcast as the filter
    try {
      val fact = spark.read.parquet(s"$wh/fact")
      val dim = spark.range(10).select(col("id").as("bucket_k"), concat(lit("g"), col("id")).as("grp"))
        .filter(col("bucket_k") < 3)
      val joined = fact.join(dim, "bucket_k").groupBy("grp").agg(count(lit(1)).as("n"))
      val qe = joined.queryExecution
      assert(qe.toRdd.count() == 3)
      val plan = qe.executedPlan.toString
      assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
        s"expected a dynamic pruning filter on the fact scan:\n$plan")
    } finally spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", prev)
  }

  test("runtime bloom-filter pruning injects a row-level filter on the large join side") {
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join → bloom applies
    try {
      // parquet-backed sides (the rule keys off scan-based plans)
      // the injection rule keys off a SELECTIVE in-query filter on the
      // creation side (beyond isnotnull) — filter at query time, not at
      // write time
      val joined = Tables.lineitem(spark, sf001)
        .join(Tables.orders(spark, sf001).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(sum("l_quantity"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("BloomFilter") || plan.contains("might_contain"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
      assert(joined.count() == 1)
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("window operators stay bounded on an extreme hot key (the documented single-reducer ceiling)") {
    // AsofJoin/Sessionize evaluate each key on one reducer (windows
    // cannot be salted). The ceiling is a per-key SORT — O(n_k log n_k)
    // — so a key at 10× uniform density must cost a small constant
    // more, not the O(n_k²) blow-up a per-key cross product would show.
    val n = 400000
    val keys = 2000
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val sess = Sessionize.assignSessions(df, "k", "ts", "id", gapSeconds = 60L)
      // min of 2 runs: absorb JIT/scheduling jitter in a ratio test
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        sess.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    def mkDF(keyExpr: org.apache.spark.sql.Column) = spark.range(n.toLong).select(
      col("id"), keyExpr.cast("int").as("k"),
      timestamp_seconds(col("id") % 100000).as("ts"))
    // uniform: every key ~n/keys rows; hot: HALF the rows on one key
    // (1000× a uniform key's share — well past the asked-for 10×)
    val uniform = mkDF(pmod(col("id"), lit(keys)))
    val hot = mkDF(when(col("id") < n / 2, lit(0)).otherwise(pmod(col("id"), lit(keys))))
    val tU = run(uniform)
    val tH = run(hot)
    info(f"sessionize 400k rows: uniform=$tU%.2fs hot-key(50%% of rows)=$tH%.2fs ratio=${tH / tU}%.2f")
    // generous bound: the sort ceiling predicts a small-constant ratio
    // (measured ~0.8–1.8 idle), but this machine's contention bursts
    // inflate wall-clock up to ~13× (BENCH_ANCHOR.json caveat) and
    // min-of-2 only partially absorbs a burst landing on one side —
    // the assert exists to catch a QUADRATIC blow-up (ratio ≥ 100s on
    // this shape), not to police small constants
    assert(tH <= 12.0 * tU + 5.0,
      f"hot-key runtime $tH%.2fs blows past the sort-bounded ceiling (uniform $tU%.2fs)")
    // and the result is still correct on the hot key: one session per
    // 60s gap run — contiguous ids on key 0 are 1s apart, one session
    val hotSessions = Sessionize.assignSessions(hot, "k", "ts", "id", 60L)
      .filter(col("k") === 0).agg(countDistinct(col("session_id"))).collect().head.getLong(0)
    assert(hotSessions >= 1L)
  }

  test("bucketed tables join without a shuffle exchange") {
    // explicit per-table paths → external tables; no warehouse conf needed
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    val n = 16
    Tables.orders(spark, sf001).write.mode("overwrite")
      .bucketBy(n, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.lineitem(spark, sf001).write.mode("overwrite")
      .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

    // disable auto-broadcast so the measurement isolates bucketing (a
    // broadcast join would be trivially shuffle-free either way)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity"))

    assert(joined.count() > 0)
    // after materialization the adaptive plan is final: at most the
    // groupBy exchange may remain — the JOIN itself must be shuffle-free
    // because both sides share bucketing on the join key
    val shuffles = collectShuffles(joined.queryExecution.executedPlan)
    assert(shuffles <= 1, s"expected at most the groupBy exchange, got $shuffles")
    // control: the same join on unbucketed parquet DOES shuffle both sides
    val plain = Tables.lineitem(spark, sf001)
      .join(Tables.orders(spark, sf001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity"))
    assert(plain.count() > 0)
    assert(collectShuffles(plain.queryExecution.executedPlan) > shuffles)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("round-6 operators hold their documented plan shapes") {
    val docs = Tables.documents(spark, sf001)

    // Curation.keepByQuality is the map-side ingest gate: ZERO exchanges
    val gate = graft.streaming.Curation.keepByQuality(docs.select("doc_id", "lang", "text"))
    assert(gate.count() > 0)
    assert(collectShuffles(gate.queryExecution.executedPlan) == 0,
      "the quality gate must be a pure narrow filter/projection")

    // Curation.batchAudit: one keeper-set hash exchange + (at scale) the
    // co-partitioned join back — never a window or sort
    val audit = graft.streaming.Curation.batchAudit(docs.select("doc_id", "lang", "text"))
    assert(audit.count() > 0)
    val auditPlan = audit.queryExecution.executedPlan.toString
    assert(!auditPlan.contains("Window") && !auditPlan.contains("Sort "),
      "batchAudit must not window or sort")
    assert(collectShuffles(audit.queryExecution.executedPlan) <= 2,
      "batchAudit is one keeper aggregation exchange plus at most the join")

    // repeatedSpanStats: raw windows must pre-aggregate (partial_count
    // on (doc, key)) before any exchange. The stats frame checkpoints
    // that aggregation away, so the assertion runs on the exposed
    // pre-materialization frame (repeatedSpanKeys) where the expensive
    // path is actually visible — then no-window on the full stats plan.
    val keys = Dedup.repeatedSpanKeys(docs, width = 16, stride = 4)
    assert(keys.count() > 0)
    val keyPlan = keys.queryExecution.executedPlan.toString
    assert(keyPlan.contains("partial_count"),
      "span keys must map-side combine before shuffling")
    assert(!keyPlan.contains("Window"), "span-key assembly must not window")
    val spans = Dedup.repeatedSpanStats(docs, width = 16, stride = 4)
    assert(spans.count() > 0)
    assert(!spans.queryExecution.executedPlan.toString.contains("Window"),
      "repeatedSpanStats must not window")
  }

  test("mixing and anomaly sheets hold their documented plan shapes") {
    val docs = Tables.documents(spark, sf001)

    // sqrtTemperatureWeights: exactly ONE corpus scan (the naive
    // totals-branch shape re-reads the parquet), map-side combine on
    // the per-source agg, and the totals window only ever sees the
    // tiny post-aggregation frame.
    val mix = graft.operators.Mixing.sqrtTemperatureWeights(
      docs.select(col("source"),
        coalesce(length(col("text")), lit(0)).cast("long").as("sz")),
      "source", "sz")
    assert(mix.count() > 0)
    val mixPlan = mix.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(mixPlan).size == 1,
      "mixing weights must read the corpus exactly once")
    assert(mixPlan.contains("partial_count"),
      "per-source sizes must map-side combine before shuffling")

    // dailySpikes: the raw event log is reduced by a map-side-combined
    // (series, day) count BEFORE the one trailing window — the window
    // sort must sit above the aggregation, never on log rows.
    val spikes = graft.operators.Anomaly.dailySpikes(
      Tables.events(spark, sf001), "event_type", "ts")
    assert(spikes.count() > 0)
    val spikePlan = spikes.queryExecution.executedPlan.toString
    assert(spikePlan.contains("partial_count"),
      "daily counts must map-side combine before shuffling")
    val wIdx = spikePlan.indexOf("Window")
    val aIdx = spikePlan.indexOf("HashAggregate")
    val sIdx = spikePlan.indexOf("Scan parquet")
    assert(wIdx >= 0 && aIdx >= 0 && sIdx >= 0 && wIdx < aIdx && aIdx < sIdx,
      "the trailing window must sit ABOVE the (series, day) aggregation, " +
        "which sits above the scan — the window sort never sees log rows")
  }

  test("phrase and drift sheets hold their documented plan shapes") {
    val docs = Tables.documents(spark, sf001)

    // bigramLift: pairs assemble map-side (no window over the token
    // stream) and collapse in a map-side-combined (w1, w2) count. The
    // unigram frame is materialized (it joins twice; un-materialized,
    // Spark re-plans its subtree per consumer and the corpus is read
    // three times), so the closing plan scans parquet exactly ONCE
    // (the pair branch) and reads the checkpointed vocab frame for
    // both join sides.
    val phr = graft.operators.Phrases.bigramLift(docs, "text")
    assert(phr.count() > 0)
    val phrPlan = phr.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(phrPlan).size == 1,
      "the closing plan scans the corpus once — the vocab frame is materialized")
    // ≥ 2 (both join sides checkpointed), not an exact count — the
    // corpus-scan bound above pins the real contract; the node count is
    // a rendering detail.
    assert("Scan ExistingRDD".r.findAllIn(phrPlan).size >= 2,
      "both unigram join sides read the one materialized vocab frame")
    assert(phrPlan.contains("partial_count"),
      "pair counts must map-side combine before shuffling")
    assert(!phrPlan.contains("Window"),
      "no window anywhere near the token stream in the closing plan")

    // bpePairStats: ONE corpus scan collapsing map-side onto vocab
    // keys; the char-pair explode and pair agg run on the vocab-sized
    // frame; the closing top-k is TakeOrdered (no global sort of the
    // pair sheet).
    val bpe = graft.operators.Phrases.bpePairStats(docs, "text", k = 50)
    assert(bpe.count() > 0)
    val bpePlan = bpe.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(bpePlan).size == 1,
      "bpePairStats must read the corpus exactly once")
    assert(bpePlan.contains("partial_count"),
      "the word-count agg must map-side combine before its exchange")
    assert(bpePlan.contains("TakeOrderedAndProject"),
      "the top-k must be TakeOrdered, not a global sort")

    // termDrift: exactly ONE corpus scan (conditional sums, not
    // per-slice re-scans), map-side combine on the term agg, and the
    // slice-totals window strictly above the aggregation.
    val drift = graft.operators.Drift.termDrift(
      docs, "text", col("doc_id") % 2 === 0)
    assert(drift.count() > 0)
    val driftPlan = drift.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(driftPlan).size == 1,
      "termDrift must read the corpus exactly once")
    assert(driftPlan.contains("partial_sum"),
      "slice counts must map-side combine before shuffling")
    val wIdx = driftPlan.indexOf("Window")
    val aIdx = driftPlan.indexOf("HashAggregate")
    val sIdx = driftPlan.indexOf("Scan parquet")
    assert(wIdx >= 0 && aIdx >= 0 && wIdx < aIdx && aIdx < sIdx,
      "the totals window must sit ABOVE the term aggregation, " +
        "which sits above the scan — the window never sees token rows")
  }

  test("growth curve and embedding audit hold their documented plan shapes") {
    // growthCurve: the materialized 1-row corpus bound leaves exactly
    // TWO parquet scans in the closing plan (volume + first-occurrence
    // — different grains, rescanning column-pruned parquet beats
    // materializing a corpus-sized frame), consumed via broadcast on
    // both branches; every aggregation combines map-side; the
    // cumulative window sits above the bucket join, never on corpus
    // rows.
    val vg = graft.operators.VocabGrowth.growthCurve(
      Tables.documents(spark, sf001), "text")
    assert(vg.count() > 0)
    val vgPlan = vg.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(vgPlan).size == 2,
      "volume + first-occurrence scans only — the corpus bound is materialized, not re-planned per branch")
    assert("BroadcastExchange".r.findAllIn(vgPlan).size == 2,
      "the 1-row bound broadcasts onto both per-row branches")
    assert(vgPlan.contains("partial_count") && vgPlan.contains("partial_min"),
      "volume counts and first-occurrence mins must map-side combine")
    val vgW = vgPlan.indexOf("Window")
    assert(vgW >= 0 && vgW < vgPlan.indexOf("Scan parquet"),
      "the cumulative window sits at the top of the plan, over the bucket frame")

    // healthSheet: ONE scan, one map-side-combined agg keyed on label,
    // the codegen dot product in the per-row projection, no window,
    // no higher-order functions (interpreted lambda nodes) anywhere.
    val ea = graft.operators.EmbeddingAudit.healthSheet(
      Tables.embeddings(spark, sf001))
    assert(ea.count() > 0)
    val eaPlan = ea.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(eaPlan).size == 1,
      "the audit reads the embeddings exactly once")
    assert(eaPlan.contains("graft_dot"),
      "norm2 must be the native codegen dot product")
    assert(eaPlan.contains("partial_count"),
      "the label agg must map-side combine")
    assert(!eaPlan.contains("Window") && !eaPlan.contains("ArrayTransform") &&
      !eaPlan.contains("ArrayAggregate"),
      "no window and no interpreted higher-order functions on the audit path")
  }

  test("provenance sheets add only thin joins and map-side counts to their audited upstreams") {
    val docs = Tables.documents(spark, sf001)

    // overlapMatrix: everything upstream is the audited q28 pipeline;
    // the provenance layer must add doc_id-keyed joins against the
    // COLUMN-PRUNED (doc_id, source) projection — never a re-read of
    // text — and a map-side-combined count. Both source scans must
    // show the 2-column ReadSchema.
    val om = graft.operators.SourceOverlap.overlapMatrix(docs)
    assert(om.count() > 0)
    val omPlan = om.queryExecution.executedPlan.toString
    val srcScans = "ReadSchema: struct<doc_id:bigint,source:string>".r
      .findAllIn(omPlan).size
    assert(srcScans == 2,
      "both provenance joins read the pruned 2-column projection, not the text")
    assert(omPlan.contains("partial_count"),
      "the cell count must map-side combine")

    // sourceAudit: q81's audited plan (map-side rules, one md5
    // exchange, co-partitioned join back) plus ONE more aggregation —
    // still no window, no sort anywhere.
    val sa = graft.streaming.Curation.sourceAudit(
      docs.select("doc_id", "lang", "text", "source"))
    assert(sa.count() > 0)
    val saPlan = sa.queryExecution.executedPlan.toString
    assert(!saPlan.contains("Window") && !saPlan.contains("Sort "),
      "sourceAudit must not window or sort")
    assert(saPlan.contains("partial_count"),
      "the (source, reason) count must map-side combine")
  }

  test("novelty, allocation, manifest and datasheet hold their documented plan shapes") {
    val docs = Tables.documents(spark, sf001)

    // noveltyScores: the doc-locally-distinct shingle frame is
    // materialized (df agg + join-back both consume it), so the
    // closing plan reads NO parquet — both consumers read the one
    // checkpointed frame — and the df count combines map-side. No
    // corpus-wide (doc_id, sh) distinct exists anywhere: doc-local
    // array_distinct made the plain count BE document frequency.
    val nv = graft.operators.Novelty.noveltyScores(docs)
    assert(nv.count() > 0)
    val nvPlan = nv.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(nvPlan).size == 0 &&
      "Scan ExistingRDD".r.findAllIn(nvPlan).size >= 2,
      "both consumers read the one materialized shingle frame (zero parquet " +
        "pins the contract; the ExistingRDD count is a lower bound)")
    assert(nvPlan.contains("partial_count"), "df counts combine map-side")

    // sqrtAllocation: q89's shape — ONE corpus scan, every window
    // strictly above the per-source aggregation.
    val al = graft.operators.Mixing.sqrtAllocation(
      docs.select(col("source"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens")),
      "source", "n_tokens", budget = 1000L)
    assert(al.count() > 0)
    val alPlan = al.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(alPlan).size == 1,
      "allocation adds no corpus pass beyond q89's one scan")
    assert(alPlan.indexOf("Window") < alPlan.indexOf("Scan parquet"),
      "rank/total windows run over the per-source frame, never corpus rows")

    // executeSqrtAllocation: the quota pass re-plans q98's shape over
    // a SECOND scan pruned to (source, text->n_tokens); the tiny quota
    // frame comes back as a broadcast join (never a shuffle), and the
    // keep-set adds exactly one group-key shuffle for its ranking
    // window.
    val ex = graft.operators.Mixing.executeSqrtAllocation(
      docs.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens")),
      "doc_id", "source", "n_tokens", budget = 137L)
    assert(ex.count() > 0)
    val exPlan = ex.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(exPlan).size == 2,
      "quota pass + keep pass: two pruned scans, no materialized corpus")
    assert(exPlan.contains("BroadcastHashJoin"),
      "the per-source quota frame broadcasts back onto the corpus")

    // allocationEpochs: q101's exact shape (two pruned scans, quota
    // broadcast, one ranking shuffle) — the with-replacement explode
    // is narrow and must NOT add an exchange.
    val ae = graft.operators.Mixing.allocationEpochs(
      docs.select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCount(coalesce(col("text"), lit("")))
          .as("n_tokens")),
      "doc_id", "source", "n_tokens", budget = 137L)
    assert(ae.count() > 0)
    val aePlan = ae.queryExecution.executedPlan
    assert("Scan parquet".r.findAllIn(aePlan.toString).size == 2 &&
      aePlan.toString.contains("BroadcastHashJoin"),
      "epoch materialization reuses q101's two-scan broadcast shape")
    assert(collectShuffles(aePlan) == collectShuffles(ex.queryExecution.executedPlan),
      "the sequence+explode adds no exchange beyond the keep-set plan")

    // shardManifest: one map-side-combined agg on top of the audited
    // q65 plan — the shard rollup itself must not sort or window.
    val sm = graft.operators.SequencePack.shardManifest(
      docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens")),
      "doc_id", "n_tokens", capacity = 2048L, packsPerShard = 16L)
    assert(sm.count() > 0)
    assert(sm.queryExecution.executedPlan.toString.contains("partial_count"),
      "the shard rollup combines map-side")

    // datasheet: the scalar branch computes its THREE distincts over
    // one scan via Expand; FOUR parquet passes in the final plan —
    // scalars, vocab, and TWO for curation (batchAudit's keeper
    // branch rescans rather than materializing corpus-sized stats,
    // its documented trade) — not one per metric. The median's scan
    // no longer appears here: globalQuantileDisc materializes its
    // 8-byte token-count projection once at construction (r13's
    // radix select) and the final plan reads that checkpoint.
    val ds = graft.operators.Datasheet.summarize(docs)
    assert(ds.count() == 9)
    val dsPlan = ds.queryExecution.executedPlan.toString
    assert(dsPlan.contains("Expand"),
      "multi-distinct scalars share one scan through Expand")
    assert("Scan parquet".r.findAllIn(dsPlan).size == 4,
      "one pass per grain plus curation's keeper rescan — nothing per-metric")
  }

  test("snapshot diff shuffles thin frames only: two scans, one full-outer join, map-side summary") {
    val docs = Tables.documents(spark, sf001)
    val old = docs.filter(col("doc_id") % 10 =!= 0)
    val nw = docs.filter(col("doc_id") % 11 =!= 0)

    val sd = graft.operators.SnapshotDiff.summarize(old, nw, "doc_id", "text")
    assert(sd.count() > 0)
    val plan = sd.queryExecution.executedPlan
    val s = plan.toString
    assert("Scan parquet".r.findAllIn(s).size == 2,
      "one pruned scan per snapshot — no materialized corpus")
    assert(s.contains("FullOuter"), "membership needs the full-outer join")
    assert(!s.contains("CartesianProduct") && !s.contains("BroadcastNestedLoop"),
      "keyed join only")
    // each side is thinned to (key, source, hash, tokens) BEFORE its
    // exchange: two join-side shuffles plus the (source, status) agg
    // shuffle, nothing MORE (the wide text column never moves). Upper
    // bound, not exact count — AQE/plan-rendering may legally collapse
    // exchanges; the regression guarded against is EXTRA shuffles.
    assert(collectShuffles(plan) <= 3,
      s"expected at most 3 exchanges, got ${collectShuffles(plan)}")
    assert(s.contains("partial_count"), "the summary combines map-side")
  }

  test("cluster-safe split adds only a broadcast label join to a precomputed components frame") {
    val docs = Tables.documents(spark, sf001)
    // checkpoint propagates the planted frame's known-small stats, so
    // the label join plans broadcast STATICALLY; a frame with large
    // estimated stats (the full pair pipeline) falls back to q58's
    // id-only sort-merge — both ship ~8 bytes/doc
    val comps = graft.operators.ConnectedComponents.components(
      Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id"))
    val sp = Sampling.clusterSafeSplit(docs, "doc_id", comps, evalPermille = 100)
    assert(sp.count() > 0)
    val s = sp.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(s).size == 1,
      "one pruned corpus scan; the components frame is pair-graph bounded")
    assert(s.contains("BroadcastHashJoin"), "the label join broadcasts")
    assert(!s.contains("SortMergeJoin"),
      "the corpus is never shuffled for labeling — bucket and split are projections")
  }

  test("span scrubbing reassembles text map-side: one corpus scan, broadcast coverage, no token window") {
    val docs = Tables.documents(spark, sf001)
    val scrub = graft.operators.Dedup.scrubRepeatedSpans(docs, width = 16, stride = 4)
    assert(scrub.count() > 0)
    val s = scrub.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(s).size == 1,
      "the closing plan reads the corpus once; the window frame is materialized upstream")
    assert(s.contains("BroadcastHashJoin"),
      "the materialized afflicted-docs coverage frame must broadcast onto the corpus")
    assert(!s.contains("SortMergeJoin"),
      "the text column never shuffles for the enrichment join")
    assert(!s.contains("Window"),
      "token filtering and reassembly are per-row array work, not a window")
  }

  test("incremental cluster maintenance absorbs a 500-pair batch into a 200k-node prior in O(1) rounds") {
    // the iteration's input is the labels frame + the batch — built
    // here as in-memory frames precisely because the operator never
    // touches the historical pair graph or the corpus (no scan to
    // audit); the scale claim under test is the CONVERGENCE bill:
    // a star-forest prior must absorb a small increment in O(1)
    // star rounds where a full rebuild pays O(log² n) over the graph
    val standing = spark.range(0, 200000).select(
      col("id").as("node_id"), (col("id") - (col("id") % 4)).as("cluster_id"))
    val batch = spark.range(0, 500).select(
      (col("id") + 1000000L).as("a_id"), (col("id") * 40).as("b_id"))
    val updated = graft.operators.ConnectedComponents
      .componentsFromIncrement(standing, batch)
    assert(updated.count() == 200500L)
    assert(graft.operators.ConnectedComponents.lastRounds.get() <= 2L,
      "a small increment on a 200k-node star-forest prior must settle in O(1) rounds")
    // every new node landed in the standing cluster it was paired with
    val newLabels = updated.filter(col("node_id") >= 1000000L)
      .select(col("node_id"), col("cluster_id"))
    assert(newLabels.filter(col("cluster_id") =!= (col("node_id") - 1000000L) * 40).count() == 0)
  }

  test("sequence packing holds its invariants at 2M documents without a global window") {
    // 2M docs ~ the per-executor share of a corpus; the operator's
    // single-partition window sees only n/bucketWidth subtotal rows
    val n = 2000000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      (pmod(col("id") * 2654435761L, lit(97L)) + 1L).as("n_tokens"))
    val t0 = System.nanoTime()
    val packed = SequencePack.packAssignments(docs, "doc_id", "n_tokens", capacity = 2048L)
    val agg = packed.agg(
      sum(col("n_tokens")).as("total"),
      max(col("pack_last")).as("last_pack"),
      min(col("pack_first")).as("first_pack"),
      sum(col("packs_spanned") - lit(1L)).as("crossings"),
      count(lit(1)).as("n")).collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    val total = agg.getLong(0)
    info(f"packed 2M docs (${total / 1e6}%.0fM tokens) in $secs%.1fs")
    assert(agg.getLong(4) == n)
    assert(agg.getLong(2) == 0L, "the first doc's tokens start in pack 0")
    // every token-stream position maps to exactly one pack: the last
    // pack is (total-1) div capacity (all docs here have >= 1 token)
    assert(agg.getLong(1) == (total - 1L) / 2048L)
    // a doc crosses a boundary at most ceil(tokens/capacity) times;
    // with tokens <= 98 << 2048, crossings == number of boundaries
    // interior to some doc — bounded by the number of boundaries
    assert(agg.getLong(3) <= total / 2048L)
  }

  test("per-group cap is partition-invariant and emits exactly k rows per group under extreme skew") {
    // half the corpus in one group — the hot-domain shape
    val n = 1000000L
    val base = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") < n / 2, lit("hot")).otherwise(concat(lit("g"), pmod(col("id"), lit(997L)))).as("source"))
    val a = Sampling.capPerGroup(base.repartition(4), "doc_id", "source", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Sampling.capPerGroup(base.repartition(32, col("doc_id")), "doc_id", "source", k = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "kept set must be a pure function of the data, not the partitioning")
    val perGroup = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perGroup("hot") == 5)
    assert(perGroup.values.forall(_ <= 5))
  }

  test("release bundle and BPE merge delta hold their documented plan shapes") {
    // q108: the wide text column is read ONCE (materialized narrow base
    // + materialized components + budget-bounded sampled frame), so the
    // CLOSING plan touches no parquet at all — every consumer reads a
    // checkpointed frame.
    val rel = graft.SparkEntry.queries("q108_release_bundle")(spark, sf001)
    assert(rel.count() > 0)
    val relPlan = rel.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(relPlan).size == 0,
      "the closing disposition plan must read only materialized frames — " +
        "a parquet scan here means a consumer re-reads the corpus text column")
    // Lower bound, not an exact count: the contract is "the closing plan
    // reads checkpointed frames" (zero parquet above pins the negative
    // side); the precise node count is a plan-rendering detail that AQE
    // or a Spark upgrade may legitimately change.
    assert("Scan ExistingRDD".r.findAllIn(relPlan).size >= 3,
      "base, components, and the sampled frame all arrive checkpointed")

    // q109: the corpus collapse and the standing pair sheet are
    // materialized; the delta path re-pairs only the affected vocab
    // subset from the checkpointed word counts — no parquet rescans —
    // and the closing top-k is TakeOrdered, not a global sort.
    val delta = graft.operators.Phrases.bpeMergeDelta(
      Tables.documents(spark, sf001), "text", k = 50)
    assert(delta.count() > 0)
    val dPlan = delta.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(dPlan).size == 0,
      "the delta plan must read the materialized word counts, never the corpus")
    // ≥ 2, not == 3: the invariant is that BOTH materialized inputs (P0
    // and the affected-word subset) arrive checkpointed rather than
    // recomputed — the zero-parquet assertion above already excludes any
    // corpus rescan; pinning the exact node count would fail on
    // plan-rendering changes unrelated to that contract.
    assert("Scan ExistingRDD".r.findAllIn(dPlan).size >= 2,
      "P0 and the affected word subset must arrive checkpointed")
    // Semantic property (k bounded before any exchange), visible as the
    // TakeOrdered node: a global Sort + Limit here would serialize the
    // full sheet through one partition.
    assert(dPlan.contains("TakeOrdered"),
      "the top-k must be TakeOrdered, not a global sort")
  }

  test("paragraph scrub and BPE encode hold their documented scan budgets") {
    // q112: ONE materialized paragraph frame + ONE materialized shingle
    // frame feed everything; the CLOSING plan's only parquet read is
    // the narrow doc_id base projection — the wide text column was
    // tokenized exactly once, before the checkpoint.
    val scrub = Dedup.scrubDupParagraphs(Tables.documents(spark, sf001), blockTokens = 24)
    assert(scrub.count() > 0)
    val sPlan = scrub.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(sPlan).size == 1,
      "only the closing doc_id projection may read parquet — a second scan " +
        "means a consumer re-tokenizes the corpus text column")
    assert("Scan ExistingRDD".r.findAllIn(sPlan).size >= 2,
      "the paragraph frame and the pair pipeline's frames arrive checkpointed")
    // The drop-set is pair-bounded and explicitly broadcast: a merge
    // anti-join here would sort/shuffle the whole paragraph frame —
    // text column included — the exact movement the operator avoids.
    assert(!sPlan.contains("SortMergeJoin LeftAnti"),
      "the paragraph drop-set must broadcast, not merge-join")

    // q110: the corpus is scanned exactly TWICE in total — the vocab
    // collapse (paid during training, before its checkpoint, invisible
    // here) and the encode pass; the closing plan shows the encode-pass
    // text scan plus the narrow doc_id base = 2 parquet scans. The
    // encode joins NOTHING (the merge table rides as ≤ 8 replace
    // literals per token — an earlier vocab-join formulation let the
    // planner broadcast the exploded TOKEN STREAM), and the per-doc
    // sums combine map-side so the doc_id exchange carries partials.
    val enc = graft.operators.Phrases.bpeEncode(Tables.documents(spark, sf001), "text", numMerges = 4)
    assert(enc.count() > 0)
    val ePlan = enc.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(ePlan).size == 2,
      "encode pass + doc_id base — any more means a merge iteration rescans the corpus")
    assert("Scan ExistingRDD".r.findAllIn(ePlan).size == 0,
      "the closing plan reads no checkpoint — the merge chain is literals, not a vocab join")
    assert(ePlan.contains("partial_count"),
      "per-doc sums must combine map-side before the doc_id exchange")
  }

  test("boilerplate scrubs broadcast their census; bloom probe never exchanges the train side before the count") {
    // q115: the unit frame is materialized once; the boilerplate set is
    // prevalence-bounded and must broadcast into the anti-join — a
    // merge anti-join would shuffle the whole unit frame, text included.
    val boil = Dedup.scrubBoilerplateUnits(Tables.documents(spark, sf001), blockTokens = 24)
    assert(boil.count() > 0)
    val bPlan = boil.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(bPlan).size == 1,
      "only the closing doc_id projection may read parquet")
    assert(!bPlan.contains("SortMergeJoin LeftAnti"),
      "the boilerplate set must broadcast, not merge-join")

    // q119: same closing shape; the standing census folds into the
    // materialized boiler frame, so the batch-side plan reads one
    // parquet base and checkpointed frames.
    val incr = Dedup.scrubBoilerplateIncrement(
      Tables.documents(spark, sf001)
        .withColumn("is_new", col("doc_id") % 2 === 0), "is_new", blockTokens = 24)
    assert(incr.count() > 0)
    val iPlan = incr.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(iPlan).size == 1,
      "standing census arrives via the checkpointed boiler frame — the " +
        "closing plan must not rescan the corpus")
    assert(!iPlan.contains("SortMergeJoin LeftAnti"),
      "the combined-census drop-set must broadcast")

    // q116: the 4 probe gates are broadcast semi-joins — the training
    // side's ONLY exchanges are the two per-doc aggregations (candidate
    // count + shingle totals); any SortMergeJoin means a corpus-keyed
    // exchange crept back in.
    val probe = graft.operators.Decontaminate.bloomContaminationCandidates(
      Tables.documents(spark, sf001))
    assert(probe.count() > 0)
    val pExec = probe.queryExecution.executedPlan
    val pPlan = pExec.toString
    assert(!pPlan.contains("SortMergeJoin"), "all joins must broadcast")
    assert("BroadcastHashJoin .*LeftSemi".r.findAllIn(pPlan).size >= 4,
      "the all-bits AND gate is 4 chained broadcast semi-probes")
    assert(collectShuffles(pExec) <= 2,
      s"train side: candidate count + totals only, got ${collectShuffles(pExec)}")
  }

  test("round-10 operators hold their documented plan shapes") {
    val docs = Tables.documents(spark, sf001)

    // q122: ONE materialized shingle frame feeds the exact arm, the
    // banded arm, and the per-doc counts — the closing plan reads only
    // checkpoints; a parquet scan here means an arm rebuilt its own
    // shingles. The lone sort-merge join is the truePairs x cands hit
    // join (both candidate-bounded); no cross products anywhere.
    val audit = Dedup.minhashRecallAudit(docs)
    assert(audit.count() > 0)
    val aPlan = audit.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(aPlan).isEmpty,
      "both audit arms must read the one materialized shingle frame")
    assert(!aPlan.contains("CartesianProduct"))

    // q123/q125: the Viterbi side reads the materialized word/vocab
    // frames and the ONE-ROW broadcast cost map (a bounded
    // BroadcastNestedLoopJoin build) — never the corpus.
    val round = Phrases.unigramLmRound(docs, "text")
    assert(round.count() > 0)
    val rPlan = round.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(rPlan).isEmpty,
      "the EM round closes over checkpointed vocab/word frames only")
    assert(!rPlan.contains("CartesianProduct"))

    val buckets = Phrases.lmQualityBuckets(docs, "text")
    assert(buckets.count() > 0)
    val bPlan = buckets.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(bPlan).isEmpty,
      "bucketing reads the materialized scored frame + the 2-value cuts broadcast")
    assert(!bPlan.contains("CartesianProduct"))

    // q124: at most the two documented corpus reads (doc-id spine +
    // token explode); the DP/vocab side arrives via checkpoints, and
    // the per-doc sums combine map-side before the doc_id exchange.
    val enc = Phrases.unigramEncode(docs, "text")
    assert(enc.count() > 0)
    val ePlan = enc.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(ePlan).size <= 2,
      "encode reads the corpus at most twice — spine + token stream")
    assert(!ePlan.contains("CartesianProduct"))
    assert(ePlan.contains("partial_sum"),
      "per-doc budget sums must combine map-side")
  }

  test("round-11 PQ family holds its documented plan shapes") {
    val e = Tables.embeddings(spark, sf001)

    // q133: the closing assign reads ONE materialized residual
    // subvector frame against checkpointed codebooks — zero parquet in
    // the final plan (a parquet scan here means the residual chain
    // recomputed itself per round), argmin combined map-side so the
    // one exchange carries one row per (vector, subspace).
    val resid = Similarity.pqResidualCodes(e, e.filter(col("vec_id") < 16),
      m = 4, ksub = 8, iters = 2, dim = 64)
    assert(resid.count() > 0)
    val rPlan = resid.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(rPlan).isEmpty,
      "the closing assign reads the materialized residual frame, not the corpus")
    assert(!rPlan.contains("CartesianProduct"))
    assert(rPlan.contains("partial_min"),
      "the code argmin must combine map-side")

    // q132: no cartesian products anywhere (the centroid cross joins
    // are nlist-bounded broadcasts), and the per-(q, n) ADC sum
    // combines map-side before its exchange.
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
    val cent = e.filter(col("vec_id") < 16)
    val cells = Similarity.ivfAssign(e, cent, dim = 64).select(col("n_id"), col("c_id"))
    val iv = Similarity.ivfAdcTopK(e.filter(col("vec_id") < 8), codes, cells,
      cent, cb, k = 5, nprobe = 4, m = 4, dim = 64)
    assert(iv.count() > 0)
    val iPlan = iv.queryExecution.executedPlan.toString
    assert(!iPlan.contains("CartesianProduct"))
    assert(iPlan.contains("partial_sum"),
      "the per-(q, n) ADC sum must combine map-side")
  }

  test("acquisition-family sheets hold their documented plan shapes") {
    val docs = Tables.documents(spark, sf001)

    // q154: the components frame joins back to the corpus BROADCAST
    // (it is a materialized ExistingRDD — unhinted, Spark would
    // sort-merge a pair-graph-sized frame against the corpus), and
    // the source rollup combines map-side.
    val dup = Dedup.dupRatesBySource(docs)
    assert(dup.count() > 0)
    val dPlan = dup.queryExecution.executedPlan.toString
    assert(!dPlan.contains("SortMergeJoin"),
      "the census adds only broadcast joins to the q58 cells")
    assert(dPlan.contains("partial_count"),
      "the source rollup must combine map-side")

    // q155: the only corpus-driven exchange is the (source, bucket)
    // count combine; the grid joins are all broadcast; the one
    // nested-loop is the one-row total.
    val kl = Mixing.sourceKlDivergence(docs)
    assert(kl.count() > 0)
    val kPlan = kl.queryExecution.executedPlan.toString
    assert(!kPlan.contains("SortMergeJoin") && !kPlan.contains("CartesianProduct"))
    // the (source, bucket) count combine happened at materialize time
    // (sb is a checkpointed frame); the CLOSING rollup's own KL sum
    // must still combine map-side
    assert(kPlan.contains("partial_sum"),
      "the per-source KL sum must combine map-side")

    // q157: the closing plan reads ONLY materialized frames (zero
    // parquet — the per-dim sums and stats are checkpointed), and the
    // labels x dim self-join broadcasts.
    val sep = EmbeddingAudit.labelSeparationSheet(
      Tables.embeddings(spark, sf001), dim = 64)
    assert(sep.count() > 0)
    val sPlan = sep.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(sPlan).isEmpty,
      "the closing sheet reads materialized frames, not the corpus")
    assert(!sPlan.contains("SortMergeJoin"),
      "the labels x dim self-join must broadcast")

    // q158: against a MATERIALIZED standing model (the production
    // shape — the artifact is persisted, not recomputed per batch),
    // the probe kernel scans its batch exactly once — the batch total
    // rides the grid window, not a second aggregate branch.
    val model = Dedup.materialize(Drift.contentKlModel(docs))
    val probe = Drift.klAgainstModel(docs.limit(50), model)
    assert(probe.count() == 1)
    val pPlan = probe.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(pPlan).size == 1,
      "klAgainstModel must read the batch exactly once")
    assert(!pPlan.contains("CartesianProduct"))
  }
}
