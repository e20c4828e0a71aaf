package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Mixing]] semantics on hand fixtures: weights are a distribution,
  * α=1/2 flattens toward uniform (small sources boosted, large ones
  * damped, order preserved), the pow path agrees with the exact
  * quantized path at α=1/2, and α=1 recovers natural proportion.
  * q89 oracles the quantized arithmetic bitwise on driver data; this
  * spec proves the distributional properties. */
class MixingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // items: source a = 9 docs × 100 tokens, b = 4 × 100, c = 1 × 100
  private def fixture = (
    Seq.fill(9)(("a", 100L)) ++ Seq.fill(4)(("b", 100L)) ++ Seq(("c", 100L))
  ).toDF("source", "n_tokens")

  test("sqrt weights form a distribution and flatten toward uniform") {
    val rows = Mixing.sqrtTemperatureWeights(fixture, "source", "n_tokens")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_items"), r.getAs[Long]("n_size"),
          r.getAs[Double]("w_prop"), r.getAs[Double]("w_temp"),
          r.getAs[Double]("boost")))).toMap

    assert(rows.keySet == Set("a", "b", "c"))
    val (_, _, pa, ta, ba) = rows("a"); val (_, _, pb, tb, bb) = rows("b")
    val (_, _, pc, tc, bc) = rows("c")
    // both weight columns are distributions
    assert(math.abs((pa + pb + pc) - 1.0) < 1e-12)
    assert(math.abs((ta + tb + tc) - 1.0) < 1e-9) // quantization: ≤ 3/2^20 off
    // sizes 900/400/100 → sqrt ratio 3:2:1 (exactly representable)
    assert(math.abs(ta / tc - 3.0) < 1e-4 && math.abs(tb / tc - 2.0) < 1e-4)
    // flattening: the dominant source is damped, the rare one boosted,
    // and temperature preserves the size ordering
    assert(ba < 1.0 && bc > 1.0)
    assert(ta > tb && tb > tc)
    // natural shares are exact: 900/1400, 400/1400, 100/1400
    assert(pa == 900.0 / 1400 && pb == 400.0 / 1400 && pc == 100.0 / 1400)
  }

  test("sqrtAllocation sums exactly to the budget and seats the largest remainders") {
    // sizes 900/400/100 -> s_q proportional to 30/20/10 -> shares
    // 1/2, 1/3, 1/6 of the budget. With budget 100: bases
    // 50/33/16 = 99, one leftover seat; remainders (budget*s_q mod S)
    // are 0, 1/3·S, 2/3·S -> the seat goes to c.
    val items = (Seq.fill(9)(("a", 100L)) ++ Seq.fill(4)(("b", 100L)) ++
      Seq(("c", 100L))).toDF("source", "n_tokens")
    val m = Mixing.sqrtAllocation(items, "source", "n_tokens", budget = 100L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("base"), r.getAs[Long]("alloc")))).toMap
    assert(m == Map("a" -> ((50L, 50L)), "b" -> ((33L, 33L)), "c" -> ((16L, 17L))),
      "the single leftover seat goes to the largest remainder (c at 2/3)")
    assert(m.values.map(_._2).sum == 100L)

    // exact-division case: no leftover, alloc == base everywhere
    val even = Seq(("x", 900L), ("y", 400L), ("z", 100L)).toDF("source", "n_tokens")
    val e = Mixing.sqrtAllocation(even, "source", "n_tokens", budget = 60L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    assert(e == Map("x" -> 30L, "y" -> 20L, "z" -> 10L))

    // tie-break: two equal groups, odd budget -> the NAME decides
    val tie = Seq(("p", 100L), ("q", 100L)).toDF("source", "n_tokens")
    val t = Mixing.sqrtAllocation(tie, "source", "n_tokens", budget = 7L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    assert(t == Map("p" -> 4L, "q" -> 3L),
      "equal remainders seat by ascending group name")
  }

  test("executeSqrtAllocation keeps min(alloc, n) per group, deterministically") {
    // keyed fixture: a = 9 docs, b = 4, c = 1, all 100 tokens. Budget
    // 100 allocates 50/33/17 (the seat test above) but the groups only
    // HAVE 9/4/1 docs -> every group is smaller than its quota and
    // keeps everything (no redistribution).
    val items = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++ Seq(("c1", "c", 100L)))
      .toDF("doc_id", "source", "n_tokens")
    val all = Mixing.executeSqrtAllocation(items, "doc_id", "source",
      "n_tokens", budget = 100L)
    assert(all.count() == 14L, "quota > group size keeps the whole group")

    // budget 6 -> quotas 3/2/1; each group keeps exactly its quota,
    // chosen by md5 order — recompute the expected pick in plain Scala
    val kept = Mixing.executeSqrtAllocation(items, "doc_id", "source",
      "n_tokens", budget = 6L)
      .collect().map(r => r.getAs[String]("doc_id")).toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = Seq("a" -> 3, "b" -> 2, "c" -> 1).flatMap { case (g, k) =>
      items.collect().filter(_.getAs[String]("source") == g)
        .map(_.getAs[String]("doc_id"))
        .sortBy(id => (md5hex("graft" + id), id)).take(k).toSeq
    }.toSet
    assert(kept == expected, "the keep-set is the md5-rank prefix per group")

    // partition-independence: a different physical layout, same rows
    val shuffled = Mixing.executeSqrtAllocation(items.repartition(7),
      "doc_id", "source", "n_tokens", budget = 6L)
      .collect().map(_.getAs[String]("doc_id")).toSet
    assert(shuffled == kept, "keep-set is a pure function of the data")

    // null keys are excluded from BOTH the quota and the keep-set:
    // nulls carry huge token mass; if they leaked into the quota pass
    // they would distort every allocation
    val withNulls = items.union(
      Seq((null.asInstanceOf[String], "a", 1000000L)).toDF("doc_id", "source", "n_tokens"))
    val nn = Mixing.executeSqrtAllocation(withNulls, "doc_id", "source",
      "n_tokens", budget = 6L)
      .collect().map(_.getAs[String]("doc_id")).toSet
    assert(nn == kept, "null-key rows join neither population")
  }

  test("allocationEpochs emits exactly alloc rows per group with balanced repeats") {
    val items = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++ Seq(("c1", "c", 100L)))
      .toDF("doc_id", "source", "n_tokens")

    // budget 100 ≫ the 14-doc corpus: quotas 50/33/17 all exceed group
    // sizes -> with-replacement. Per source exactly alloc rows; no two
    // docs of a source differ by more than one repeat.
    val rows = Mixing.allocationEpochs(items, "doc_id", "source",
      "n_tokens", budget = 100L).collect()
    assert(rows.length == 100, "total materialized rows = budget")
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.view.mapValues(_.length).toMap ==
      Map("a" -> 50, "b" -> 33, "c" -> 17), "each group emits exactly alloc rows")
    for ((src, rs) <- bySource) {
      val reps = rs.groupBy(_.getAs[String]("doc_id")).values.map(_.length)
      assert(reps.max - reps.min <= 1, s"$src repeats unbalanced: $reps")
      // epochs are dense [0, reps) per doc
      for (docRows <- rs.groupBy(_.getAs[String]("doc_id")).values)
        assert(docRows.map(_.getAs[Long]("epoch")).sorted.toSeq ==
          (0L until docRows.length).toSeq)
    }

    // budget 6 < corpus: degenerates to the keep-set at epoch 0
    val down = Mixing.allocationEpochs(items, "doc_id", "source",
      "n_tokens", budget = 6L).collect()
    assert(down.forall(_.getAs[Long]("epoch") == 0L))
    val keep = Mixing.executeSqrtAllocation(items, "doc_id", "source",
      "n_tokens", budget = 6L).collect().map(_.getAs[String]("doc_id")).toSet
    assert(down.map(_.getAs[String]("doc_id")).toSet == keep,
      "downsampling path IS executeSqrtAllocation's keep-set")
  }

  test("log2q is the exact fixed-point log2: within 1/32 of math.log over a wide range") {
    import org.apache.spark.sql.functions.expr
    // range deliberately crosses the old x*2^20 wrap point (2^43):
    // 100 TB corpus totals land there, and the shifted-mantissa form
    // must stay exact through the top of the BIGINT domain
    val xs = (1L to 40L).map(i => (i * i * i) % 100000 + i) ++
      Seq(1L, 2L, 3L, 1023L, 1024L, 1025L, 999999L, (1L << 40) - 1,
        (1L << 43) - 1, 1L << 43, (1L << 43) + 12345L, (1L << 50) + 999L,
        (1L << 62) - 1, 1L << 62, Long.MaxValue)
    val got = xs.toDF("x").withColumn("l", expr(Mixing.log2qExpr("x")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      val exact = math.log(x.toDouble) / math.log(2.0)
      val approx = got(x).toDouble / 64.0
      // floor semantics + one truncation per squaring round: the fold
      // under-reads by < 1/64 + rounding slack; never over-reads
      assert(approx <= exact + 1e-9, s"log2q over-read at $x: $approx > $exact")
      assert(exact - approx < 1.0 / 32.0, s"log2q drift at $x: $approx vs $exact")
    }
    assert(got(1L) == 0L && got(2L) == 64L && got(1024L) == 640L)
  }

  test("dsirWeights scores target-flavored docs above off-target docs") {
    // ids 1..60 at the default salt: the target split (bucket < 100)
    // is {17, 21}, both odd. Odd docs share style-A bigrams with the
    // target; even docs carry style-B bigrams the target never uses —
    // so odd train docs must outweigh even ones under DSIR.
    val styleA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val styleB = "one two three four five six seven eight nine ten"
    val docs = (1L to 60L).map { i =>
      (i, if (i % 2 == 1) s"$styleA $styleA" else s"$styleB $styleB")
    }.toDF("doc_id", "text")
    val w = Mixing.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val odd = (1L to 59L by 2).map(w(_)._2)
    val even = (2L to 60L by 2).map(w(_)._2)
    assert(odd.min > even.max,
      s"every target-flavored doc must outweigh every off-target doc: " +
        s"odd min ${odd.min} vs even max ${even.max}")
    // identical text ⇒ identical weight (pure function of content)
    assert(odd.toSet.size == 1 && even.toSet.size == 1)

    // null text is total: zero bigrams, zero weight
    val withNull = Seq((1L, Some("some words in here")), (2L, None))
      .toDF("doc_id", "text")
    val nw = Mixing.dsirWeights(withNull).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(nw(2L) == ((0L, 0L)))
  }

  test("pow path matches the exact path at alpha=1/2 and proportion at alpha=1") {
    val exact = Mixing.sqrtTemperatureWeights(fixture, "source", "n_tokens")
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("w_temp")).toMap
    val powHalf = Mixing.temperatureWeights(fixture, "source", "n_tokens", 0.5)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Double]("w_temp")).toMap
    exact.foreach { case (k, w) =>
      assert(math.abs(powHalf(k) - w) < 1e-6, s"alpha=1/2 pow vs quantized at $k")
    }
    val powOne = Mixing.temperatureWeights(fixture, "source", "n_tokens", 1.0)
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Double]("w_prop"), r.getAs[Double]("w_temp"), r.getAs[Double]("boost")))
    powOne.foreach { case (k, p, t, b) =>
      assert(math.abs(t - p) < 1e-12 && math.abs(b - 1.0) < 1e-12, s"alpha=1 at $k")
    }
    assertThrows[IllegalArgumentException] {
      Mixing.temperatureWeights(fixture, "source", "n_tokens", 0.0)
    }
  }

  test("sourceKlDivergence: a single-source corpus reads exactly zero") {
    // one source IS the corpus: c_sb = c_gb and t_s = t_g for every
    // bucket, so every Δ_b is 0 BEFORE quantization — kl_q must be
    // exactly 0, not merely small
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "only"),
      (2L, "eta theta iota kappa lambda mu", "only")
    ).toDF("doc_id", "text", "source")
    val out = Mixing.sourceKlDivergence(d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "only")
    assert(r.getLong(1) == 10L, "5 bigrams per 6-token doc x 2 docs")
    assert(r.getLong(3) == 0L, "P_s == P_g must read kl_q == 0 exactly")
  }

  test("sourceKlDivergence: a disjoint-vocabulary feed towers over a corpus-like one") {
    // 'bulk' dominates the corpus (so P_g ~ P_bulk: small KL);
    // 'alien' is disjoint vocabulary (P_alien far from P_g: large KL)
    val bulk = (1 to 40).map { i =>
      (i.toLong, (1 to 30).map(j => s"w${(i * 7 + j) % 50}").mkString(" "), "bulk")
    }
    val alien = Seq((100L, (1 to 30).map(j => s"zz$j").mkString(" "), "alien"))
    val d = (bulk ++ alien).toDF("doc_id", "text", "source")
    val out = Mixing.sourceKlDivergence(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("bulk", "alien"))
    assert(out("alien")._3 > out("bulk")._3,
      s"disjoint vocab must diverge more: $out")
    assert(out("alien")._3 > 0L)
    // n_buckets never exceeds the distinct-bigram count
    assert(out("alien")._2 <= 29L, "29 bigrams can hit at most 29 buckets")
  }

  test("sourceKlDivergence: null sources group as 'unknown'; text-free sources total") {
    val d = Seq(
      (1L, "a b c d e f g h", null),
      (2L, null, "silent")
    ).toDF("doc_id", "text", "source")
    val out = Mixing.sourceKlDivergence(d).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set("unknown", "silent"))
    assert(out("unknown")._1 == 7L)
    assert(out("silent") == ((0L, 0L)), "a bigram-free source still gets a row")
  }

  // ---- DSIR resample (q161/q163): the apply member ----

  /** Planted two-distribution corpus where target membership (the q55
    * md5 split, salt 'graft', permille 100) is known to the test:
    * target docs speak vocabulary A; non-targets are 30 % A-speakers /
    * 70 % B-speakers by a deterministic id rule. DSIR should upweight
    * the A-speakers, so the resampled mix sits closer to the target
    * distribution than the raw corpus does. */
  private def plantedCorpus = {
    import org.apache.spark.sql.functions._
    val ids = (1L to 400L)
    val mem = Sampling.withSplitBucket(ids.toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1) < 100L)).toMap
    def textA(i: Long) = (0 until 24).map(j => s"alpha${(i * 3 + j) % 12}").mkString(" ")
    def textB(i: Long) = (0 until 24).map(j => s"beta${(i * 5 + j) % 12}").mkString(" ")
    val rows = ids.map { i =>
      val aish = mem(i) || i % 10 < 3
      (i, if (aish) textA(i) else textB(i), if (aish) "aset" else "bset")
    }
    (rows.toDF("doc_id", "text", "source"),
      rows.filter(r => mem(r._1)).toDF("doc_id", "text", "source"))
  }

  test("dsirResample: kept mix's KL-to-target drops strictly below the raw corpus's") {
    import org.apache.spark.sql.functions._
    val (docs, target) = plantedCorpus
    val model = graft.operators.Drift.contentKlModel(target)
    def klOf(batch: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Drift.klAgainstModel(batch, model)
        .select("kl_q").head().getLong(0)
    val kept = Mixing.dsirResample(docs, budgetPermille = 300)
    val keptDocs = docs.join(kept.select("doc_id"), "doc_id")
    val (klKept, klRaw) = (klOf(keptDocs), klOf(docs))
    assert(klKept < klRaw,
      s"resampling toward the target must reduce KL: kept=$klKept raw=$klRaw")
    // and the kept mean importance weight exceeds the raw mean: the
    // sample IS weight-driven, not uniform
    val w = Mixing.dsirWeights(docs)
    def meanW(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("weight_q"))).head().getDouble(0)
    assert(meanW(kept) > meanW(w), "kept docs must carry above-average weight")
  }

  test("dsirResample: budget bound, determinism, and the degenerate budgets") {
    import org.apache.spark.sql.functions._
    val (docs, _) = plantedCorpus
    val kept = Mixing.dsirResample(docs, budgetPermille = 300)
    val n = kept.count()
    assert(n > 0L && n <= 120L, s"floor-of-budget bound: got $n of <= 120")
    assert(n >= 100L, s"ties can only SHRINK the keep-set slightly: got $n")
    val again = Mixing.dsirResample(docs, budgetPermille = 300)
      .collect().map(_.getLong(0)).toSet
    assert(again == kept.collect().map(_.getLong(0)).toSet, "bitwise re-run")
    assert(Mixing.dsirResample(docs, budgetPermille = 1000).count() == 400L,
      "budget 1000 keeps every non-null-id doc")
    assert(Mixing.dsirResample(docs, budgetPermille = 0).count() == 0L,
      "budget 0 keeps nothing")
  }

  test("resampleComposition: sheet ties bitwise to the keep-set; shares shift toward target feeds") {
    import org.apache.spark.sql.functions._
    val (docs, _) = plantedCorpus
    val kept = Mixing.dsirResample(docs, budgetPermille = 300)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sheet = Mixing.resampleComposition(docs, budgetPermille = 300)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(sheet.keySet == Set("aset", "bset"))
    for ((s, (nRaw, nKept, _, rateQ)) <- sheet) {
      assert(nKept == kept.getOrElse(s, 0L), s"n_kept ties to the keep-set for $s")
      val expected = ((nKept * 1024L) / nRaw) * 1024L + (((nKept * 1024L) % nRaw) * 1024L) / nRaw
      assert(rateQ == expected, s"two-step fixed-point rate for $s")
    }
    // the A-flavored feed's keep RATE must exceed the B-flavored one's:
    // the importance resample shifts share toward the target
    assert(sheet("aset")._4 > sheet("bset")._4,
      s"target-flavored feed must keep at a higher rate: $sheet")
  }

  test("resampleBudgetSweep: rows tie to the keep-sets; cuts replay locally; monotone") {
    import org.apache.spark.sql.functions._
    val (docs, _) = plantedCorpus
    val sheet = Mixing.resampleBudgetSweep(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(sheet.keySet == (100L to 900L by 100L).toSet)
    // local replay: full scored frame via the degenerate budget-1000
    // resample (returns every scored row), cuts as rank ceil(q*n) of
    // the ascending key sort, keeps by the strict > rule
    val scored = Mixing.dsirResample(docs, budgetPermille = 1000)
      .select("doc_id", "weight_q", "key_q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val keys = scored.map(_._3).sorted
    val n = keys.length
    // token counts replayed through the engine's own q144 convention
    val toks = graft.functions.TextFunctions
      .tokenCount(coalesce(col("text"), lit("")))
    val tokOf = docs.select(col("doc_id"), toks.as("t")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (b <- 100 to 900 by 100) {
      val q = BigDecimal(1000 - b) / BigDecimal(1000)
      val rank = (q * n).setScale(0, BigDecimal.RoundingMode.CEILING).toInt
      val cut = keys(rank - 1)
      val kept = scored.filter(_._3 > cut)
      val row = sheet(b.toLong)
      assert(row.getLong(1) == cut, s"cut at $b")
      assert(row.getLong(2) == kept.length.toLong, s"n_docs_kept at $b")
      assert(row.getLong(3) == kept.map(t => tokOf(t._1)).sum, s"n_tokens_kept at $b")
      assert(row.getLong(4) == kept.map(_._2).sum, s"weight_q_kept at $b")
      assert(row.getLong(5) == n.toLong && row.getLong(6) == tokOf.values.sum,
        s"totals at $b")
    }
    // the 300 row ties bitwise to the shipped resample's own keep-set
    val k300 = Mixing.dsirResample(docs, budgetPermille = 300)
    assert(sheet(300L).getLong(2) == k300.count(), "300 row ties to q161's count")
    assert(sheet(300L).getLong(4) ==
      k300.agg(sum("weight_q")).head().getLong(0), "300 row ties to q161's mass")
    // monotone: a bigger budget never keeps less
    val counts = (100L to 900L by 100L).map(sheet(_).getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, c) => a <= c }, s"monotone: $counts")
    assert(counts.last <= n.toLong)
  }

  test("resampleBudgetSweep: empty corpus yields nine all-zero rows with NULL cuts") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    val rows = Mixing.resampleBudgetSweep(empty).collect()
    assert(rows.length == 9, "budget rows never vanish")
    assert(rows.forall(r => r.isNullAt(1) && r.getLong(2) == 0L &&
      r.getLong(3) == 0L && r.getLong(4) == 0L && r.getLong(5) == 0L &&
      r.getLong(6) == 0L), "all-zero sheet, NULL cuts")
  }

  test("dsirResampleTokens: budget cap, maximal prefix, degenerate budgets") {
    import org.apache.spark.sql.functions._
    val (docs, _) = plantedCorpus
    val total = 400L * 24L  // every planted doc is exactly 24 tokens
    val kept = Mixing.dsirResampleTokens(docs, tokenBudgetPermille = 250)
      .collect()
    val keptTokens = kept.map(_.getLong(2)).sum
    assert(keptTokens * 1000L <= total * 250L,
      s"cumulative kept tokens must respect the cap: $keptTokens of $total")
    // maximality: one more 24-token doc would cross the cap
    assert((keptTokens + 24L) * 1000L > total * 250L,
      s"the prefix must be the LONGEST within budget: $keptTokens")
    // uniform doc length makes the token budget coincide with the doc
    // budget: exactly floor(400 * 0.25) = 100 docs
    assert(kept.length == 100, s"uniform-length corpus: got ${kept.length}")
    // the kept set is the TOP of the key ranking: min kept key >= max
    // dropped key (with the doc_id tiebreak, strictly a prefix)
    val keptIds = kept.map(_.getLong(0)).toSet
    val allKeys = Mixing.dsirResample(docs, budgetPermille = 1000)
      .select("doc_id", "key_q").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val ranked = allKeys.sortBy { case (id, k) => (-k, id) }.map(_._1)
    assert(ranked.take(100).toSet == keptIds, "kept IS the ranking prefix")
    assert(Mixing.dsirResampleTokens(docs, tokenBudgetPermille = 0).count() == 0L)
    assert(Mixing.dsirResampleTokens(docs, tokenBudgetPermille = 1000).count() == 400L)
  }

  test("interleaveManifest: stride lattice, epoch-major bijection, per-prefix mix") {
    // sizes 900/100 tokens -> sqrt weights 3:1; budget 80 -> alloc 60/20
    val items = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      Seq(("b1", "b", 100L))).toDF("doc_id", "source", "n_tokens")
    val rows = Mixing.interleaveManifest(items, "doc_id", "source",
      "n_tokens", budget = 80L).collect()
    assert(rows.length == 80, "Σ rows = budget")
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.view.mapValues(_.length).toMap == Map("a" -> 60, "b" -> 20))

    val grid = 4611686018427387904L // 2^62
    for ((src, rs, alloc, nItems) <- Seq(
        ("a", bySource("a"), 60L, 9L), ("b", bySource("b"), 20L, 1L))) {
      // appearance is a bijection onto [0, alloc)
      val apps = rs.map(_.getAs[Long]("appearance")).sorted.toSeq
      assert(apps == (0L until alloc), s"$src appearances not dense")
      // the stride key formula, recomputed in plain Scala
      val stride = grid / alloc
      assert(rs.forall(r => r.getAs[Long]("pos_key") ==
        r.getAs[Long]("appearance") * stride + stride / 2),
        s"$src pos_key != appearance·stride + stride/2")
      // epoch-major: a doc's appearances are congruent mod n_items
      // (each epoch is one full md5-ordered pass over the group)
      for (docRows <- rs.groupBy(_.getAs[String]("doc_id")).values)
        assert(docRows.map(_.getAs[Long]("appearance") % nItems).toSet.size == 1,
          s"$src repeats not spaced n_items apart")
    }

    // THE stride guarantee: every prefix of the (pos_key, source,
    // appearance) order carries each source within ±2 of its
    // proportional share — the property an md5 shuffle only has in
    // expectation
    val ordered = rows.sortBy(r => (r.getAs[Long]("pos_key"),
      r.getAs[String]("source"), r.getAs[Long]("appearance")))
    var na = 0L; var n = 0L
    for (r <- ordered) {
      n += 1; if (r.getAs[String]("source") == "a") na += 1
      assert(math.abs(na - n * 60.0 / 80.0) <= 2.0,
        s"prefix $n carries a at $na (proportional ${n * 0.75})")
    }

    // pure function of the data; degenerate budgets
    val re = Mixing.interleaveManifest(items.repartition(7), "doc_id",
      "source", "n_tokens", budget = 80L)
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("epoch"),
        r.getAs[Long]("pos_key"))).toSet
    assert(re == rows.map(r => (r.getAs[String]("doc_id"),
      r.getAs[Long]("epoch"), r.getAs[Long]("pos_key"))).toSet)
    assert(Mixing.interleaveManifest(items, "doc_id", "source", "n_tokens",
      budget = 0L).count() == 0L)
    assert(Mixing.interleaveManifest(items.limit(0), "doc_id", "source",
      "n_tokens", budget = 10L).count() == 0L)
  }

  test("interleaveMixAudit: blocks carry each group near its allocated share") {
    // sizes 900/100 -> alloc 240/80 at budget 320; 16 blocks of ~20
    val items = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      Seq(("b1", "b", 100L))).toDF("doc_id", "source", "n_tokens")
    val sheet = Mixing.interleaveMixAudit(items, "doc_id", "source",
      "n_tokens", budget = 320L, nBlocks = 16).collect()
    // every (block, group) cell materializes: 16 × 2
    assert(sheet.length == 32, s"expected 16×2 cells, got ${sheet.length}")
    assert(sheet.map(_.getAs[Long]("n_appearances")).sum == 320L)
    // per-group totals re-sum to the allocation
    val perGroup = sheet.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_appearances")).sum).toMap
    assert(perGroup == Map("a" -> 240L, "b" -> 80L))
    // targets are the allocated shares; deviations stay within ±1
    // appearance of a ~20-row block (2^20/20 ≈ 52429)
    assert(sheet.forall(r => r.getAs[Long]("target_q") ==
      (if (r.getAs[String]("source") == "a") 240L * 1048576L / 320L
       else 80L * 1048576L / 320L)))
    assert(sheet.forall(r => math.abs(r.getAs[Long]("dev_q")) <= 60000L),
      s"worst dev_q = ${sheet.map(r => math.abs(r.getAs[Long]("dev_q"))).max}")
    assert(sheet.forall(r => r.getAs[Long]("dev_q") ==
      r.getAs[Long]("share_q") - r.getAs[Long]("target_q")))
    // empty corpus -> empty sheet
    assert(Mixing.interleaveMixAudit(items.limit(0), "doc_id", "source",
      "n_tokens", budget = 320L).count() == 0L)
  }

  test("phasedInterleave: phases slice the grid in order; within-phase is the q170 machinery") {
    // phase 0: a=900/b=100 token groups; phase 1: c=400 tokens.
    // masses 1000:400 -> budget 70 splits 50/20 exactly
    val items = ((1 to 9).map(i => (s"a$i", "a", 0L, 100L)) ++
      Seq(("b1", "b", 0L, 100L)) ++
      (1 to 4).map(i => (s"c$i", "c", 1L, 100L)))
      .toDF("doc_id", "source", "phase", "n_tokens")
    val rows = Mixing.phasedInterleave(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L).collect()
    assert(rows.length == 70, "Σ rows = budget")
    val byPhase = rows.groupBy(_.getAs[Long]("phase"))
    assert(byPhase.view.mapValues(_.length).toMap == Map(0L -> 50, 1L -> 20),
      "phase budgets are the proportional Hamilton split of token mass")
    // within phase 0 the sqrt-Hamilton runs: weights 3:1 -> 37/13?
    // exact: s_q 30Q/10Q, S=40Q, base a=(50*30Q)//40Q=37, b=12,
    // rems 20Q/20Q equal -> seat by source asc -> a gets it? wait:
    // 50*30/40 = 37.5 -> base 37 rem .5*40Q=20Q; 50*10/40 = 12.5 ->
    // base 12 rem 20Q; leftover 1; tie by source asc -> a. So 38/12.
    val phase0 = byPhase(0L).groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length).toMap
    assert(phase0 == Map("a" -> 38, "b" -> 12),
      s"within-phase sqrt-Hamilton with the name tie-break: $phase0")
    // the grid slices in phase order and never interleaves:
    // every phase-0 key < every phase-1 key
    val slice = 4611686018427387904L / 2
    assert(byPhase(0L).forall(_.getAs[Long]("pos_key") < slice))
    assert(byPhase(1L).forall(r => r.getAs[Long]("pos_key") >= slice))
    // within a phase, appearances are dense per (phase, source)
    for ((g, alloc) <- Seq(("a", 38L), ("b", 12L))) {
      val apps = byPhase(0L).filter(_.getAs[String]("source") == g)
        .map(_.getAs[Long]("appearance")).sorted.toSeq
      assert(apps == (0L until alloc), s"phase 0/$g appearances not dense")
    }

    // nPhases = 1 with all phases 0 is BITWISE interleaveManifest
    val flat = items.filter(org.apache.spark.sql.functions.col("phase") === 0L)
    val one = Mixing.phasedInterleave(flat, "doc_id", "source",
      "n_tokens", "phase", nPhases = 1, budget = 80L)
      .select("doc_id", "epoch", "appearance", "pos_key")
      .collect().map(_.toSeq).toSet
    val ref = Mixing.interleaveManifest(flat.drop("phase"), "doc_id",
      "source", "n_tokens", budget = 80L)
      .select("doc_id", "epoch", "appearance", "pos_key")
      .collect().map(_.toSeq).toSet
    assert(one == ref, "nPhases=1 degenerates to the unphased manifest")

    // out-of-range / null phases join no population
    val dirty = items.union(Seq(("z1", "z", 7L, 100L))
      .toDF("doc_id", "source", "phase", "n_tokens"))
    assert(Mixing.phasedInterleave(dirty, "doc_id", "source", "n_tokens",
      "phase", nPhases = 2, budget = 70L).count() == 70L)
  }

  test("phasedMixAudit: per-phase blocks carry each source near its phase share") {
    // planted curriculum: phase 0 = 9:1 doc split (sqrt 3:1 shares),
    // phase 1 = 4:4 (1:1 shares); equal 100-token docs
    val items = ((1 to 9).map(i => (s"a$i", "a", 0L, 100L)) ++
      Seq(("b1", "b", 0L, 100L)) ++
      (10 to 13).map(i => (s"a$i", "a", 1L, 100L)) ++
      (2 to 5).map(i => (s"b$i", "b", 1L, 100L)))
      .toDF("doc_id", "source", "phase", "n_tokens")
    val audit = Mixing.phasedMixAudit(items, "doc_id", "source", "n_tokens",
      "phase", nPhases = 2, budget = 160L, nBlocks = 4).collect()

    // the sheet totals the full budget, and every cell's counts are
    // consistent with the manifest itself (recomputed independently)
    assert(audit.map(_.getAs[Long]("n_appearances")).sum == 160L)
    val man = Mixing.phasedInterleave(items, "doc_id", "source", "n_tokens",
      "phase", nPhases = 2, budget = 160L).collect()
    val slice = 4611686018427387904L / 2
    val blockW = slice / 4
    val cells = man.groupBy(r => (r.getAs[Long]("phase"),
        math.min((r.getAs[Long]("pos_key") - r.getAs[Long]("phase") * slice)
          / blockW, 3L),
        r.getAs[String]("source")))
      .view.mapValues(_.length.toLong).toMap
    val fromAudit = audit.map(r => (r.getAs[Long]("phase"),
      r.getAs[Long]("block"), r.getAs[String]("source")) ->
      r.getAs[Long]("n_appearances")).toMap
    assert(fromAudit == cells, "audit cells != manifest recount")

    // shares are the exact fixed-point divisions and dev = share−target
    for (r <- audit) {
      val (p, b) = (r.getAs[Long]("phase"), r.getAs[Long]("block"))
      val bt = audit.filter(x => x.getAs[Long]("phase") == p &&
        x.getAs[Long]("block") == b).map(_.getAs[Long]("n_appearances")).sum
      val pt = audit.filter(_.getAs[Long]("phase") == p)
        .map(_.getAs[Long]("n_appearances")).sum
      val palloc = audit.filter(x => x.getAs[Long]("phase") == p &&
        x.getAs[String]("source") == r.getAs[String]("source"))
        .map(_.getAs[Long]("n_appearances")).sum
      assert(r.getAs[Long]("share_q") ==
        r.getAs[Long]("n_appearances") * 1048576L / bt)
      assert(r.getAs[Long]("target_q") == palloc * 1048576L / pt)
      assert(r.getAs[Long]("dev_q") ==
        r.getAs[Long]("share_q") - r.getAs[Long]("target_q"))
      // the stride lattice bound: every cell within ±2 appearances of
      // its proportional share of the block
      assert(math.abs(r.getAs[Long]("n_appearances").toDouble -
        bt.toDouble * palloc / pt) <= 2.0,
        s"cell ($p,$b,${r.getAs[String]("source")}) off its share")
    }

    // nPhases = 1 degenerates to interleaveMixAudit (plus the phase col)
    val one = Mixing.phasedMixAudit(items, "doc_id", "source", "n_tokens",
      "phase", nPhases = 1, budget = 80L, nBlocks = 4)
    val flat = Mixing.interleaveMixAudit(
      items.filter(org.apache.spark.sql.functions.col("phase") === 0L),
      "doc_id", "source", "n_tokens", budget = 80L, nBlocks = 4)
    val oneSet = one.collect().map(r => (r.getAs[Long]("block"),
      r.getAs[String]("source"), r.getAs[Long]("n_appearances"),
      r.getAs[Long]("share_q"), r.getAs[Long]("target_q"))).toSet
    val flatSet = flat.collect().map(r => (r.getAs[Long]("block"),
      r.getAs[String]("source"), r.getAs[Long]("n_appearances"),
      r.getAs[Long]("share_q"), r.getAs[Long]("target_q"))).toSet
    assert(oneSet == flatSet)
  }

  test("cappedAllocation: ceiling enforced, cascade redistributes, budget conserved") {
    // sizes 900/400/100 -> sqrt weights 3:2:1. Caps at 4 epochs:
    // a = 100 (25 docs), b = 16 (4 docs), c = 4 (1 doc). Budget 60:
    // round 1 Hamilton gives 30/20/10 -> b (20>16) and c (10>4) cap;
    // round 2 redistributes the residual 40 to a (40 <= 100) -> done.
    // A single clamp WITHOUT redistribution would leave a at 30 — the
    // 40 pins that the stranded 10 seats actually moved.
    val items = ((1 to 25).map(i => (s"a$i", "a", 36L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++
      Seq(("c1", "c", 100L))).toDF("doc_id", "source", "n_tokens")
    val m = Mixing.cappedAllocation(items, "source", "n_tokens",
      budget = 60L, maxEpochs64 = 256L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("cap"), r.getAs[Long]("alloc"),
          r.getAs[Long]("capped")))).toMap
    assert(m == Map("a" -> ((100L, 40L, 0L)), "b" -> ((16L, 16L, 1L)),
      "c" -> ((4L, 4L, 1L))))
    // (a) no source exceeds its ceiling; (b) Σ alloc = budget while
    // uncapped mass remains
    assert(m.values.forall { case (cap, alloc, _) => alloc <= cap })
    assert(m.values.map(_._2).sum == 60L)

    // all-capped (infeasible) regime: Σ cap < budget strands the rest.
    // a = 9 docs (cap 36): round 1 caps b, c; round 2 pushes a to 40 >
    // 36 -> caps; round 3 finds no violator. Fixpoint = the caps.
    val small = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++
      Seq(("c1", "c", 100L))).toDF("doc_id", "source", "n_tokens")
    val s = Mixing.cappedAllocation(small, "source", "n_tokens",
      budget = 60L, maxEpochs64 = 256L)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("alloc"), r.getAs[Long]("capped")))).toMap
    assert(s == Map("a" -> ((36L, 1L)), "b" -> ((16L, 1L)), "c" -> ((4L, 1L))))
    assert(s.values.map(_._1).sum == 56L, "stranded 4 reads off the sheet")

    // cap = ∞ is bitwise sqrtAllocation
    val unc = Mixing.sqrtAllocation(small, "source", "n_tokens", budget = 60L)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    val inf = Mixing.cappedAllocation(small, "source", "n_tokens",
      budget = 60L, maxEpochs64 = 1L << 40)
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("alloc")).toMap
    assert(inf == unc)
  }

  test("cappedInterleaveManifest: capped order, cap=∞ bitwise q170, determinism") {
    val items = ((1 to 25).map(i => (s"a$i", "a", 36L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++
      Seq(("c1", "c", 100L))).toDF("doc_id", "source", "n_tokens")
    val rows = Mixing.cappedInterleaveManifest(items, "doc_id", "source",
      "n_tokens", budget = 60L, maxEpochs64 = 256L).collect()
    // exactly the capped allocation's rows per source (40/16/4)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(rows.length == 60 &&
      bySource.view.mapValues(_.length).toMap == Map("a" -> 40, "b" -> 16, "c" -> 4))
    // THE ceiling guarantee: no doc appears more than 4 times (b and c
    // sit exactly AT 4 epochs, never over — uncapped q170 would hand
    // c1 ten appearances here)
    assert(rows.groupBy(r => (r.getAs[String]("source"),
      r.getAs[String]("doc_id"))).values.forall(_.length <= 4))
    assert(rows.filter(_.getAs[String]("source") == "c").length == 4)
    // pure function of the data
    val re = Mixing.cappedInterleaveManifest(items.repartition(7), "doc_id",
      "source", "n_tokens", budget = 60L, maxEpochs64 = 256L)
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("epoch"),
        r.getAs[Long]("pos_key"))).toSet
    assert(re == rows.map(r => (r.getAs[String]("doc_id"),
      r.getAs[Long]("epoch"), r.getAs[Long]("pos_key"))).toSet)

    // cap = ∞ is bitwise interleaveManifest
    val inf = Mixing.cappedInterleaveManifest(items, "doc_id", "source",
      "n_tokens", budget = 60L, maxEpochs64 = 1L << 40)
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("epoch"),
        r.getAs[Long]("appearance"), r.getAs[Long]("pos_key"))).toSet
    val unc = Mixing.interleaveManifest(items, "doc_id", "source",
      "n_tokens", budget = 60L)
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("epoch"),
        r.getAs[Long]("appearance"), r.getAs[Long]("pos_key"))).toSet
    assert(inf == unc)

    // degenerate budgets
    assert(Mixing.cappedInterleaveManifest(items, "doc_id", "source",
      "n_tokens", budget = 0L).count() == 0L)
    assert(Mixing.cappedInterleaveManifest(items.limit(0), "doc_id", "source",
      "n_tokens", budget = 10L).count() == 0L)
  }

  test("dsirResampleTokens tie groups: full-duplicate collision profile, exact split without a window") {
    import org.apache.spark.sql.functions._
    // the worst case the q165 boundary can see: every text identical,
    // so key_q varies ONLY through the Gumbel draw — which quantizes
    // through two 1/64-fixed-point logs to ~230 effective levels, NOT
    // the md5 bucket's nominal 1000. This measured profile (max
    // collision ~n/60) is WHY the boundary split is a second radix
    // locate instead of a doc_id-ordered window: at 10^10 docs the
    // fattest tie would be ~10^8 rows through one window task.
    val n = 2000
    val docs = (1 to n).map(i => (i.toLong, "alpha beta gamma delta", "s"))
      .toDF("doc_id", "text", "source")
    val scored = Mixing.dsirResample(docs, budgetPermille = 1000)
      .select(col("key_q")).collect().map(_.getLong(0))
    assert(scored.length == n)
    val byKey = scored.groupBy(identity).view.mapValues(_.length)
    assert(byKey.size >= 200 && byKey.size <= 400,
      s"${byKey.size} distinct keys — the ~230-level quantization " +
        "profile moved; re-measure the scaladoc bound")
    val maxTie = byKey.values.max
    assert(maxTie >= n / 200 && maxTie <= n / 20,
      s"max tie group $maxTie off the measured ~n/60 profile")

    // the keep rule stays exact in the max-collision regime: kept mass
    // <= floor(total·permille/1000), budget maximality (no dropped doc
    // fits the residual), determinism under repartition
    val kept = Mixing.dsirResampleTokens(docs, tokenBudgetPermille = 250)
      .collect()
    val total = n.toLong * 4L
    val keptTok = kept.map(_.getAs[Long]("n_tokens")).sum
    assert(keptTok <= total * 250L / 1000L)
    assert(keptTok + 4L > total * 250L / 1000L,
      "a 4-token doc still fits: the kept prefix is not maximal")
    val re = Mixing.dsirResampleTokens(docs.repartition(7),
      tokenBudgetPermille = 250)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(re == kept.map(_.getAs[Long]("doc_id")).toSet)
  }

  test("interleaveIncrement: residual slots patch in frozen pos_keys, census rule holds") {
    // standing: a = 9 docs × 100 tokens, b = 1 × 100 -> sqrt 3:1;
    // budget 12 -> alloc a = 9 (residual 0), b = 3 (residual 2)
    val standing = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      Seq(("b1", "b", 100L))).toDF("doc_id", "source", "n_tokens")
    val batch = (Seq(("na1", "a", 50L), ("na2", "a", 50L)) ++
      (1 to 3).map(i => (s"nb$i", "b", 50L)) ++
      Seq(("nc1", "c", 50L))).toDF("doc_id", "source", "n_tokens")
    val rows = Mixing.interleaveIncrement(standing, batch, "doc_id",
      "source", "n_tokens", budget = 12L).collect()
    assert(rows.length == 6, "one disposition row per batch item")
    val byDoc = rows.map(r => r.getAs[String]("doc_id") -> r).toMap

    // a is at quota (alloc = n_standing): no residual, all rejected
    assert(Seq("na1", "na2").forall(d => byDoc(d).getAs[Long]("kept") == 0L &&
      byDoc(d).isNullAt(byDoc(d).fieldIndex("pos_key"))))
    // c is outside the standing census: admits nothing (the q178 rule)
    assert(byDoc("nc1").getAs[Long]("kept") == 0L)
    // b has 2 residual slots for 3 arrivals: cohort ranks 1..2 keep,
    // earliest residual slot first (appearance = n_standing + r − 1)
    val bKept = rows.filter(r => r.getAs[String]("source") == "b" &&
      r.getAs[Long]("kept") == 1L)
    assert(bKept.length == 2)
    assert(bKept.map(_.getAs[Long]("appearance")).sorted.toSeq == Seq(1L, 2L))
    assert(bKept.map(_.getAs[Long]("epoch")).sorted.toSeq == Seq(1L, 2L),
      "patched slots are epoch >= 1 re-reads, never first appearances")

    // THE patch contract: every admitted pos_key is a slot the frozen
    // standing manifest actually scheduled for that group at epoch >= 1
    val man = Mixing.interleaveManifest(standing, "doc_id", "source",
      "n_tokens", budget = 12L).collect()
    val standingSlots = man.filter(r => r.getAs[String]("source") == "b" &&
      r.getAs[Long]("epoch") >= 1L)
      .map(r => (r.getAs[Long]("appearance"), r.getAs[Long]("pos_key"))).toSet
    assert(bKept.map(r => (r.getAs[Long]("appearance"),
      r.getAs[Long]("pos_key"))).toSet == standingSlots,
      "admitted slots != the standing manifest's repeat slots")

    // pure function of the data
    val re = Mixing.interleaveIncrement(standing.repartition(5),
      batch.repartition(3), "doc_id", "source", "n_tokens", budget = 12L)
      .collect().map(r => (r.getAs[String]("doc_id"), r.getAs[Long]("kept"),
        Option(r.getAs[java.lang.Long]("pos_key")))).toSet
    assert(re == rows.map(r => (r.getAs[String]("doc_id"),
      r.getAs[Long]("kept"), Option(r.getAs[java.lang.Long]("pos_key")))).toSet)
  }

  test("cappedPhasedInterleave: per-phase ceilings, phase-local redistribution, degenerate pins") {
    // phase 0: a = 25×36 tokens (cap 100), b = 1×100 (cap 4) -> sqrt
    // 3:1; phase 1: c = 4×100 (cap 16). Masses 1000/400, budget 70 ->
    // phase budgets 50/20. Phase 0 round 1: Hamilton 38/12 (rem tie,
    // a first) -> b caps at 4; round 2 redistributes: a = 46 (<= 100).
    // Phase 1: single source, 20 > cap 16 -> capped, strands 4 — the
    // stranded mass stays IN its phase (never migrates to phase 0).
    val items = ((1 to 25).map(i => (s"a$i", "a", 0L, 36L)) ++
      Seq(("b1", "b", 0L, 100L)) ++
      (1 to 4).map(i => (s"c$i", "c", 1L, 100L)))
      .toDF("doc_id", "source", "phase", "n_tokens")
    val rows = Mixing.cappedPhasedInterleave(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L, maxEpochs64 = 256L)
      .collect()
    val byPS = rows.groupBy(r => (r.getAs[Long]("phase"),
      r.getAs[String]("source"))).view.mapValues(_.length.toLong).toMap
    assert(byPS == Map((0L, "a") -> 46L, (0L, "b") -> 4L, (1L, "c") -> 16L))
    // ceiling per cohort: no doc exceeds 4 appearances
    assert(rows.groupBy(r => (r.getAs[Long]("phase"),
      r.getAs[String]("doc_id"))).values.forall(_.length <= 4))
    // phases never interleave: every phase-0 key below every phase-1 key
    val slice = 4611686018427387904L / 2
    assert(rows.forall(r => (r.getAs[Long]("pos_key") < slice) ==
      (r.getAs[Long]("phase") == 0L)))

    // cap = ∞ is bitwise phasedInterleave
    def keyOf(r: org.apache.spark.sql.Row) = (r.getAs[String]("doc_id"),
      r.getAs[Long]("epoch"), r.getAs[Long]("appearance"),
      r.getAs[Long]("pos_key"))
    val inf = Mixing.cappedPhasedInterleave(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L,
      maxEpochs64 = 1L << 40).collect().map(keyOf).toSet
    val unc = Mixing.phasedInterleave(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L).collect()
      .map(keyOf).toSet
    assert(inf == unc)

    // nPhases = 1 is bitwise cappedInterleaveManifest
    val onePhase = Mixing.cappedPhasedInterleave(
      items.filter(org.apache.spark.sql.functions.col("phase") === 0L),
      "doc_id", "source", "n_tokens", "phase", nPhases = 1, budget = 50L,
      maxEpochs64 = 256L).collect().map(keyOf).toSet
    val flat = Mixing.cappedInterleaveManifest(
      items.filter(org.apache.spark.sql.functions.col("phase") === 0L),
      "doc_id", "source", "n_tokens", budget = 50L, maxEpochs64 = 256L)
      .collect().map(keyOf).toSet
    assert(onePhase == flat)

    // pure function of the data
    val re = Mixing.cappedPhasedInterleave(items.repartition(7), "doc_id",
      "source", "n_tokens", "phase", nPhases = 2, budget = 70L,
      maxEpochs64 = 256L).collect().map(keyOf).toSet
    assert(re == rows.map(keyOf).toSet)
  }

  test("epochPlanSheet: exact allocations, the repeat ceiling, stranded budget") {
    // one 900-token source, one 100-token source, one zero-token source
    val items = Seq(("a", 900L), ("b", 100L), ("z", 0L))
      .toDF("source", "n_tokens")
    val m = Mixing.epochPlanSheet(items, "source", "n_tokens",
      budgetTokens = 4000L)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // sqrt weights 3:1:0 -> allocs 3000/1000/0 exactly (no remainder)
    assert(m("a").getAs[Long]("alloc_tokens") == 3000L)
    assert(m("b").getAs[Long]("alloc_tokens") == 1000L)
    assert(m("z").getAs[Long]("alloc_tokens") == 0L)
    // a: 3000/900 = 3.33 epochs = 213 in 1/64 units — under the 4-epoch
    // ceiling, nothing stranded
    assert(m("a").getAs[Long]("epochs_q") == 3000L * 64L / 900L)
    assert(m("a").getAs[Long]("eff_tokens") == 3000L &&
      m("a").getAs[Long]("unused_tokens") == 0L &&
      m("a").getAs[Long]("capped") == 0L)
    // b: 10 epochs wanted, ceiling spends 256·100/64 = 400 tokens,
    // strands 600
    assert(m("b").getAs[Long]("epochs_q") == 640L)
    assert(m("b").getAs[Long]("eff_tokens") == 400L &&
      m("b").getAs[Long]("unused_tokens") == 600L &&
      m("b").getAs[Long]("capped") == 1L)
    // z: no tokens to repeat — NULL epochs, zero spend, uncapped at
    // zero quota
    assert(m("z").isNullAt(m("z").fieldIndex("epochs_q")))
    assert(m("z").getAs[Long]("eff_tokens") == 0L &&
      m("z").getAs[Long]("capped") == 0L)
    // Σ alloc = budget even with the degenerate group present
    assert(m.values.map(_.getAs[Long]("alloc_tokens")).sum == 4000L)
  }

  test("cappedInterleaveMixAudit: targets are the CAPPED shares; cap=∞ bitwise the uncapped audit") {
    // the cappedAllocation fixture: budget 60 -> uncapped Hamilton
    // 30/20/10 but capped alloc 40/16/4 (b and c at their 4-epoch
    // ceilings, the stranded 10 seats moved to a)
    val items = ((1 to 25).map(i => (s"a$i", "a", 36L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++
      Seq(("c1", "c", 100L))).toDF("doc_id", "source", "n_tokens")
    val audit = Mixing.cappedInterleaveMixAudit(items, "doc_id", "source",
      "n_tokens", budget = 60L, maxEpochs64 = 256L, nBlocks = 4).collect()
    // targets re-derive the CAPPED allocation (40/16/4 over 60), not
    // the uncapped 30/20/10 the q171 sheet would wrongly demand
    val tq = audit.map(r => r.getAs[String]("source") ->
      r.getAs[Long]("target_q")).toMap
    assert(tq == Map("a" -> 40L * 1048576L / 60L,
      "b" -> 16L * 1048576L / 60L, "c" -> 4L * 1048576L / 60L))
    // per-source appearance totals = the capped allocation exactly
    val bySrc = audit.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_appearances")).sum).toMap
    assert(bySrc == Map("a" -> 40L, "b" -> 16L, "c" -> 4L))
    // the stride lattice still mixes every block near its capped share
    audit.foreach { r =>
      val bt = audit.filter(_.getAs[Long]("block") == r.getAs[Long]("block"))
        .map(_.getAs[Long]("n_appearances")).sum
      val share = bt.toDouble *
        bySrc(r.getAs[String]("source")).toDouble / 60.0
      assert(math.abs(r.getAs[Long]("n_appearances").toDouble - share) <= 2.0,
        s"cell (${r.getAs[Long]("block")},${r.getAs[String]("source")}) off")
    }
    // cap = ∞ is bitwise interleaveMixAudit
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("block"),
      r.getAs[String]("source"), r.getAs[Long]("n_appearances"),
      r.getAs[Long]("share_q"), r.getAs[Long]("target_q"),
      r.getAs[Long]("dev_q"))
    val inf = Mixing.cappedInterleaveMixAudit(items, "doc_id", "source",
      "n_tokens", budget = 60L, maxEpochs64 = 1L << 40, nBlocks = 4)
      .collect().map(key).toSet
    val unc = Mixing.interleaveMixAudit(items, "doc_id", "source",
      "n_tokens", budget = 60L, nBlocks = 4).collect().map(key).toSet
    assert(inf == unc)
  }

  test("cappedPhasedMixAudit: per-phase capped targets; cap=∞ bitwise the uncapped audit") {
    // the cappedPhasedInterleave fixture: phase 0 = a 25×36 (cap 100)
    // + b 1×100 (cap 4), phase 1 = c 4×100 (cap 16); masses 1000/400
    val items = ((1 to 25).map(i => (s"a$i", "a", 0L, 36L)) ++
      Seq(("b1", "b", 0L, 100L)) ++
      (1 to 4).map(i => (s"c$i", "c", 1L, 100L)))
      .toDF("doc_id", "source", "phase", "n_tokens")
    val audit = Mixing.cappedPhasedMixAudit(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L,
      maxEpochs64 = 256L, nBlocks = 4).collect()
    // within-phase totals equal the capped per-(phase, source) alloc:
    // phase budgets 50/20 (mass Hamilton); phase 0 sqrt 3:1 -> 38/13
    // wants b at 13 > cap 4 -> b caps, a absorbs 46; phase 1: c capped
    // at 16 of 20 (stranded 4 reads as missing rows)
    val byPs = audit.groupBy(r => (r.getAs[Long]("phase"),
      r.getAs[String]("source")))
      .view.mapValues(_.map(_.getAs[Long]("n_appearances")).sum).toMap
    assert(byPs == Map((0L, "a") -> 46L, (0L, "b") -> 4L, (1L, "c") -> 16L))
    // targets are the within-phase capped shares
    val tq = audit.map(r => (r.getAs[Long]("phase"),
      r.getAs[String]("source")) -> r.getAs[Long]("target_q")).toMap
    assert(tq((0L, "a")) == 46L * 1048576L / 50L)
    assert(tq((0L, "b")) == 4L * 1048576L / 50L)
    assert(tq((1L, "c")) == 1048576L, "a one-source phase is its own mix")
    // cap = ∞ is bitwise phasedMixAudit
    def key(r: org.apache.spark.sql.Row) = (r.getAs[Long]("phase"),
      r.getAs[Long]("block"), r.getAs[String]("source"),
      r.getAs[Long]("n_appearances"), r.getAs[Long]("share_q"),
      r.getAs[Long]("target_q"), r.getAs[Long]("dev_q"))
    val inf = Mixing.cappedPhasedMixAudit(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L,
      maxEpochs64 = 1L << 40, nBlocks = 4).collect().map(key).toSet
    val unc = Mixing.phasedMixAudit(items, "doc_id", "source",
      "n_tokens", "phase", nPhases = 2, budget = 70L, nBlocks = 4)
      .collect().map(key).toSet
    assert(inf == unc)
  }

  test("cappedInterleaveIncrement: freezes the CAPPED quotas; ceiling bounds admissions; cap=∞ bitwise") {
    // standing = the cappedAllocation fixture (capped alloc 40/16/4 vs
    // uncapped 30/20/10): residual slots differ PER SOURCE between the
    // two members — c has 3 capped repeat slots but 9 uncapped ones
    val standing = ((1 to 25).map(i => (s"a$i", "a", 36L)) ++
      (1 to 4).map(i => (s"b$i", "b", 100L)) ++
      Seq(("c1", "c", 100L))).toDF("doc_id", "source", "n_tokens")
    val batch = (1 to 20).map(i => (s"nc$i", "c", 50L))
      .toDF("doc_id", "source", "n_tokens")
    val rows = Mixing.cappedInterleaveIncrement(standing, batch, "doc_id",
      "source", "n_tokens", budget = 60L, maxEpochs64 = 256L).collect()
    assert(rows.length == 20)
    val kept = rows.filter(_.getAs[Long]("kept") == 1L)
    // capped residual = alloc − n_standing = 4 − 1 = 3 (uncapped would
    // admit 9); the admitted appearances are the earliest repeat slots
    assert(kept.length == 3)
    assert(kept.map(_.getAs[Long]("appearance")).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    // THE ceiling contract: no admission past the epoch cap — every
    // admitted appearance sits strictly under cap = 4
    assert(kept.forall(_.getAs[Long]("appearance") < 4L))
    // admitted pos_keys are slots the frozen CAPPED manifest scheduled
    val man = Mixing.cappedInterleaveManifest(standing, "doc_id", "source",
      "n_tokens", budget = 60L, maxEpochs64 = 256L).collect()
    val slots = man.filter(r => r.getAs[String]("source") == "c" &&
      r.getAs[Long]("epoch") >= 1L)
      .map(r => (r.getAs[Long]("appearance"), r.getAs[Long]("pos_key"))).toSet
    assert(kept.map(r => (r.getAs[Long]("appearance"),
      r.getAs[Long]("pos_key"))).toSet == slots)
    // cap = ∞ is bitwise interleaveIncrement
    def key(r: org.apache.spark.sql.Row) = (r.getAs[String]("doc_id"),
      r.getAs[Long]("batch_rank"), r.getAs[Long]("kept"),
      Option(r.getAs[java.lang.Long]("pos_key")))
    val inf = Mixing.cappedInterleaveIncrement(standing, batch, "doc_id",
      "source", "n_tokens", budget = 60L, maxEpochs64 = 1L << 40)
      .collect().map(key).toSet
    val unc = Mixing.interleaveIncrement(standing, batch, "doc_id",
      "source", "n_tokens", budget = 60L).collect().map(key).toSet
    assert(inf == unc)
  }
}
