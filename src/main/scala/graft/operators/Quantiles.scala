package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group multi-quantile in ONE sort pass.
  *
  * `percentile_disc(q) WITHIN GROUP (ORDER BY x)` selects the smallest
  * x whose cumulative distribution reaches q — equivalently the value
  * at 1-based rank `ceil(q·n)` of the group's ascending sort. Stacking
  * k percentile_disc aggregates in one groupBy makes Spark buffer the
  * group's values k times in k interpreted ObjectHashAggregate
  * buffers; this operator instead sorts each group ONCE (a single
  * codegen'd window sort — one shuffle on the group key) and picks all
  * k ranks from that ordering with a plain conditional aggregation.
  *
  * Scale shape: exact per-group quantiles inherently serialize each
  * GROUP through one task (any implementation must see a group's full
  * ordering); within that bound this form strictly dominates the
  * buffered aggregates — the per-task sort is external (spills to
  * disk) where the k buffers are in-memory only, and the rank is
  * BIGINT (a running count, not IntegerType row_number) so groups
  * beyond 2³¹ rows rank correctly instead of overflowing. For group
  * counts in the thousands-and-up (the q60 shape: a handful of return
  * flags is the DEGENERATE case) tasks parallelize across groups; a
  * corpus whose single group exceeds one task's disk is what
  * approx_percentile is for (the error-bounded sheet in QuantileSpec).
  *
  * Result is bitwise identical to percentile_disc (discrete
  * selection, no interpolation arithmetic), so it oracle-compares
  * exactly cross-engine.
  *
  * Rows with NULL `valCol` are excluded (percentile_disc semantics);
  * `n_rows` therefore counts non-null values, and all-NULL groups are
  * absent from the output — oracles must mirror with
  * `WHERE val IS NOT NULL`.
  */
object Quantiles {

  /** One output row per group: `groupCol, <name_i>..., n_rows` where
    * `qs` maps output column name → percentile in (0, 1]. Each q must
    * be exactly representable in ≤ 10 decimal places (any practical
    * quantile is; a computed q like 1/3.0 is rejected rather than
    * silently reinterpreted). */
  def multiQuantileDisc(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      qs: Seq[(String, Double)]): DataFrame =
    multiQuantileDisc(df, Seq(groupCol), valCol, qs)

  /** Multi-column grouping variant: one output row per distinct
    * `groupCols` tuple (one shuffle on the compound key). */
  def multiQuantileDisc(
      df: DataFrame,
      groupCols: Seq[String],
      valCol: String,
      qs: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column required")
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"percentiles must be in (0, 1]: $qs")
    require(qs.forall { case (_, q) => BigDecimal(q).scale <= 10 },
      s"percentiles must be exact in 10 decimal places (got $qs); " +
        "rank selection is decimal-exact and will not guess a rounding")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ordered = byGroup.orderBy(col(valCol))
    val ranked = df
      .select(groupCols.map(col) :+ col(valCol): _*)
      .filter(col(valCol).isNotNull)
      // BIGINT 1-based rank: a running count over the ROWS frame — the
      // same ordering row_number() would give, without its Int ceiling;
      // tied values share ranks' VALUES so the pick stays deterministic
      .withColumn("__rn", count(lit(1)).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", count(lit(1)).over(byGroup))
    val picks: Seq[Column] = qs.map { case (name, q) =>
      // the rank pick is DECIMAL-exact: in double arithmetic
      // 0.07 * 100 = 7.000000000000001, whose ceil silently selects
      // rank 8 where percentile_disc's exact rational ceil(q·n) = 7.
      // decimal(11,10) × decimal(20,0) → decimal(32,10) is exact for
      // any group size, so ceil lands on the true rank
      val qExact = lit(BigDecimal(q).setScale(10).underlying())
      max(when(col("__rn") === ceil(qExact * col("__n")), col(valCol))).as(name)
    }
    ranked.groupBy(groupCols.map(col): _*)
      .agg(picks.head, picks.tail :+ max(col("__n")).as("n_rows"): _*)
  }

  /** GLOBAL exact discrete quantiles over a BIGINT column with NO
    * single-partition sort — the distributed replacement for the
    * `multiQuantileDisc(df.withColumn("__g", lit(0)), …)` constant-
    * group idiom, whose one "group" funnels the whole frame through a
    * single task (fine for a per-flag TPC-H group, a scale-killer for
    * a corpus-sized scored frame at 100 TB).
    *
    * Kernel: radix select ([[radixLocate]]). The value is located
    * digit-by-digit over its unsigned-ordered 64-bit image in
    * `64/digitBits` rounds; each round is one map-side-combinable
    * histogram of at most 2^digitBits buckets per quantile (a
    * sheet-sized frame whatever the data distribution — no range
    * knob, no boundary-bucket sort, no skew failure mode). The whole
    * chain is one lazy DAG: each round's located digits feed the next
    * round's candidate filter through a broadcast of a ≤|qs|-row
    * frame — no driver-side iteration, no collect.
    *
    * Result is bitwise `percentile_disc` (the value at 1-based rank
    * `ceil(q·n)` of the ascending sort, the same decimal-exact rank
    * arithmetic as [[multiQuantileDisc]] — QuantilesSpec pins the two
    * kernels equal on planted ties/negatives/extremes). Returns
    * exactly ONE row with one named BIGINT column per entry of `qs`
    * (NULL on an empty/all-NULL input — the established "NULL cut
    * keeps nothing" contract of its callers).
    *
    * Scale shape (100 TB): `64/digitBits` passes over an internally
    * materialized 16-byte projection; every exchange carries either
    * histogram cells (≤ |qs|·2^digitBits rows) or the ≤|qs|-row
    * located frame; the only windows run per-quantile over histogram
    * cells. Nothing anywhere serializes corpus rows through one
    * task.
    *
    * `materializeInput = false` skips the internal checkpoint of the
    * 16-byte projection — pass it when `df` is ALREADY materialized
    * (re-deriving a projection of a checkpoint is cheaper than a
    * second checkpoint write; the kernel scans its input ~5 times
    * either way). */
  def globalQuantileDisc(df: DataFrame, valCol: String,
      qs: Seq[(String, Double)], digitBits: Int = 16,
      materializeInput: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"percentiles must be in (0, 1]: $qs")
    require(qs.forall { case (_, q) => BigDecimal(q).scale <= 10 },
      s"percentiles must be exact in 10 decimal places (got $qs); " +
        "rank selection is decimal-exact and will not guess a rounding")
    require(df.schema(valCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"globalQuantileDisc radix-selects over BIGINT; $valCol is " +
        df.schema(valCol).dataType.simpleString)
    // weight 1 per row makes the weighted locate a plain rank locate
    val proj = df.select(col(valCol).as("__u")).filter(col("__u").isNotNull)
      .select(col("__u"), lit(1L).as("__w"))
    val t = if (materializeInput) Dedup.materialize(proj) else proj
    // n rides the same bounded one-row read [[radixLocate]] already
    // pays for its shared-prefix skip, so the targets frame is pure
    // literals instead of one more full scan of `t` inside the locate
    // DAG. The rank arithmetic stays decimal-exact: BigDecimal
    // multiplication is exact rational arithmetic, identical to the
    // decimal(11,10)×decimal(20,0) ceil the in-plan expression did.
    val nRow = t.agg(count(lit(1)).as("__n"),
      min(col("__u")).as("__lo"), max(col("__u")).as("__hi")).head()
    val n = nRow.getLong(0)
    import t.sparkSession.implicits._
    val targets = qs.map { case (name, q) =>
      val rr = if (n > 0L)
        Some((BigDecimal(q).setScale(10) * BigDecimal(n))
          .setScale(0, BigDecimal.RoundingMode.CEILING).toLongExact)
      else None
      (name, rr)
    }.toDF("qn", "rr")
    val bounds =
      if (n > 0L) Some((nRow.getLong(1), nRow.getLong(2))) else None
    val located = radixLocate(t, targets, digitBits, bounds)
    val picks = qs.map { case (name, _) =>
      max(when(col("qn") === name, col("u"))).as(name)
    }
    located.agg(picks.head, picks.tail: _*)
  }

  /** PER-GROUP exact discrete quantiles with NO per-group single-task
    * sort — [[globalQuantileDisc]]'s contract lifted to a group key
    * (the per-LANGUAGE CCNet cuts' kernel, q194): each group's value
    * is located digit-by-digit by the grouped radix kernel
    * ([[groupRadixLocate]]), so a group whose rows outgrow one task's
    * external sort — the corpus/K shape a per-language split of
    * 100 TB produces, where [[multiQuantileDisc]]'s window sort
    * serializes each group through ONE task — still cuts in
    * `64/digitBits` map-side histogram passes.
    *
    * Result is bitwise `percentile_disc(q) WITHIN GROUP (ORDER BY v)
    * ... GROUP BY g` (the same decimal-exact `ceil(q·n)` rank
    * arithmetic; QuantilesSpec pins the grouped kernel equal to
    * [[multiQuantileDisc]] on planted ties/negatives/extremes).
    * Output: one row per group with a named BIGINT column per entry
    * of `qs` — groups with no non-NULL value are ABSENT (the
    * [[multiQuantileDisc]] convention: oracles mirror with
    * `WHERE val IS NOT NULL`).
    *
    * Scale shape (100 TB): `64/digitBits` passes over an internally
    * materialized (group, value) projection; the per-pass broadcast
    * carries |groups|·|qs| located rows and every exchange carries
    * histogram cells (≤ |groups|·|qs|·2^digitBits) — nothing
    * anywhere serializes a group's rows through one task. */
  def groupQuantileDisc(df: DataFrame, groupCol: String, valCol: String,
      qs: Seq[(String, Double)], digitBits: Int = 16,
      materializeInput: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (_, q) => q > 0.0 && q <= 1.0 },
      s"percentiles must be in (0, 1]: $qs")
    require(qs.forall { case (_, q) => BigDecimal(q).scale <= 10 },
      s"percentiles must be exact in 10 decimal places (got $qs); " +
        "rank selection is decimal-exact and will not guess a rounding")
    require(df.schema(valCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"groupQuantileDisc radix-selects over BIGINT; $valCol is " +
        df.schema(valCol).dataType.simpleString)
    val proj = df.select(col(groupCol).as("__g"), col(valCol).as("__u"))
      .filter(col("__u").isNotNull)
      .select(col("__g"), col("__u"), lit(1L).as("__w"))
    val t = if (materializeInput) Dedup.materialize(proj) else proj
    val targets = t.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
      .select(col("__g"), explode(array(qs.map { case (name, q) =>
        val qExact = lit(BigDecimal(q).setScale(10).underlying())
        struct(lit(name).as("qn"),
          ceil(qExact * col("__n")).cast("long").as("rr"))
      }: _*)).as("e"))
      .select(col("__g"), col("e.qn").as("qn"), col("e.rr").as("rr"))
    val located = groupRadixLocate(t, targets, digitBits)
    val picks = qs.map { case (name, _) =>
      max(when(col("qn") === name, col("u"))).as(name)
    }
    located.groupBy(col("__g").as(groupCol))
      .agg(picks.head, picks.tail: _*)
  }

  /** [[radixLocate]] lifted to a group key — `tw` rows
    * `(__g, __u, __w)`, `targets` rows `(__g, qn, rr)`; each
    * (group, target) locates independently, and candidate rows reach
    * only their OWN group's targets through a broadcast equi-join on
    * `__g` (never a row×targets cross product), so the per-pass
    * frame sizes scale with |groups|·|qs| histogram cells, not with
    * group count × corpus rows. Same per-pass arithmetic, same
    * all-NULL row for an unreachable rank, same signed-domain
    * mapping. Kept textually beside [[radixLocate]] rather than
    * unifying them: the ungrouped kernel's plan (a ≤|qs|-row
    * broadcast CROSS join) is audited and anchored fleet-wide, and a
    * constant-group retrofit would reshape every caller's plan for
    * zero semantic gain. */
  private[graft] def groupRadixLocate(tw: DataFrame, targets: DataFrame,
      digitBits: Int = 16): DataFrame = {
    require(digitBits >= 1 && digitBits <= 21 && 64 % digitBits == 0,
      s"digitBits must divide 64 and keep cells addressable: $digitBits")
    val passes = 64 / digitBits
    val tm = tw.select(col("__g"),
      col("__u").bitwiseXOR(lit(Long.MinValue)).as("__u"), col("__w"))
    // same shared-prefix pass skip as [[radixLocate]], with the GLOBAL
    // (all-groups) min/max — conservative for every group, so each
    // (group, target) still locates its own value exactly
    val mm = tw.agg(min(col("__u")), max(col("__u"))).head()
    val skip: Int =
      if (mm.isNullAt(0)) 0
      else {
        val lo = mm.getLong(0) ^ Long.MinValue
        val hi = mm.getLong(1) ^ Long.MinValue
        var p = 0
        while (p < passes - 1 &&
            (lo >>> (64 - digitBits * (p + 1))) ==
              (hi >>> (64 - digitBits * (p + 1)))) p += 1
        p
      }
    val prefix: Long =
      if (skip == 0 || mm.isNullAt(0)) 0L
      else (mm.getLong(0) ^ Long.MinValue) >>> (64 - digitBits * skip)
    var locked = targets.select(col("__g"), col("qn"), lit(prefix).as("u"),
      col("rr"), lit(0L).as("before"))
    for (p <- (skip + 1) to passes) {
      val loShift = 64 - digitBits * p
      // Java shifts count mod 64, so u >>> 64 would be a NO-OP, not 0:
      // round 1 (every row a candidate) must skip the prefix test; a
      // skipped-prefix start behaves identically (every row carries the
      // shared prefix by construction)
      val prefixMatch =
        if (p == skip + 1) lit(true)
        else shiftrightunsigned(col("__u"), 64 - digitBits * (p - 1)) ===
          col("u")
      val hist = tm.join(broadcast(locked), Seq("__g"))
        .filter(col("rr").isNotNull && prefixMatch)
        .groupBy(col("__g"), col("qn"), col("rr"), col("before"),
          shiftrightunsigned(col("__u"), loShift).as("nhi"))
        .agg(sum(col("__w")).as("c"))
      val wq = Window.partitionBy(col("__g"), col("qn")).orderBy(col("nhi"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val loc = hist
        .withColumn("cumc", sum(col("c")).over(wq))
        .filter(col("cumc") >= col("rr"))
        .groupBy(col("__g"), col("qn"))
        .agg(min(struct(col("nhi"), col("rr"), col("before"),
          col("cumc"), col("c"))).as("m"))
        .select(col("__g"), col("qn"), col("m.nhi").as("u"),
          (col("m.rr") - (col("m.cumc") - col("m.c"))).as("rr"),
          (col("m.before") + (col("m.cumc") - col("m.c"))).as("before"))
      locked = locked.select(col("__g"), col("qn"))
        .join(broadcast(loc), Seq("__g", "qn"), "left")
    }
    locked.select(col("__g"), col("qn"),
      col("u").bitwiseXOR(lit(Long.MinValue)).as("u"),
      col("rr"), col("before"))
  }

  /** Weighted radix LOCATE — the shared distributed-selection kernel
    * under [[globalQuantileDisc]] (weights ≡ 1: rank select) and the
    * token-budget resample boundary
    * ([[graft.operators.Mixing.dsirResampleTokens]], weights = token
    * counts: the first value whose running mass overflows the
    * budget).
    *
    * Input `tw`: rows `(__u, __w)` — `__u` the BIGINT sort key in its
    * ordinary SIGNED order (the kernel flips the sign bit internally
    * for digit extraction and flips it back on output, so callers
    * compare the returned `u` against their keys with plain signed
    * `<`/`=`), `__w` a positive BIGINT weight. Input
    * `targets`: rows `(qn, rr)` — per named target, the 1-based
    * cumulative-weight rank to reach. Output: one row per target —
    * `(qn, u, rr, before)` where `u` is the smallest `__u` at which
    * the running Σ`__w` in ascending `__u` order first reaches `rr`
    * (cum ≥ rr), `before` is the total mass STRICTLY below `u`, and
    * the returned `rr` is the residual rank within `u`'s tie group
    * (original rr − before). All three are NULL when `rr` is NULL or
    * the total mass never reaches it — callers branch on that.
    *
    * Each of the `64/digitBits` rounds histograms the candidate rows
    * (those matching the prefix located so far) by their next
    * `digitBits`-wide digit — map-side combinable onto ≤ 2^digitBits
    * cells per target — and picks the cell where the running mass
    * crosses the residual rank. A cell's cum is computed by a window
    * per target over HISTOGRAM CELLS (never input rows); prefixes
    * travel as a broadcast ≤|targets|-row frame, so the chain is one
    * lazy DAG with no driver iteration and no data-dependent knobs:
    * adversarial distributions (all values equal, all distinct, any
    * skew) change nothing about the per-round frame sizes. */
  private[graft] def radixLocate(tw: DataFrame, targets: DataFrame,
      digitBits: Int = 16,
      knownBounds: Option[(Long, Long)] = None): DataFrame = {
    require(digitBits >= 1 && digitBits <= 21 && 64 % digitBits == 0,
      s"digitBits must divide 64 and keep cells addressable: $digitBits")
    val passes = 64 / digitBits
    // unsigned-order image: XOR the sign bit so unsigned comparison of
    // the digit prefixes == signed comparison of the original keys
    val tm = tw.select(
      col("__u").bitwiseXOR(lit(Long.MinValue)).as("__u"), col("__w"))
    // Skip the passes every row agrees on. A pass whose digit is shared
    // by the WHOLE key domain histograms into exactly one cell and
    // locates that digit — pure overhead. One map-side min/max
    // aggregation (a bounded ONE-ROW driver read, the
    // Similarity.inferDim idiom; a caller that already holds signed
    // (min, max) — e.g. from the read that sized its targets — passes
    // them via `knownBounds` and skips the scan) finds how many
    // leading digits the domain shares and seeds the locate with that
    // prefix directly: real-world keys (doc ids, token counts,
    // fixed-point scores) fill well under 48 bits, so this typically
    // replaces 2-3 of the 4 full histogram passes (each a corpus scan
    // + exchange + window) with one plain aggregate scan — a win at
    // any scale; on a genuinely 64-bit-spread domain it degrades to
    // one extra scan. Results are bitwise unchanged: the skipped
    // passes could only ever have located the shared prefix with
    // rank/mass untouched.
    val mmOpt: Option[(Long, Long)] = knownBounds.orElse {
      val mm = tw.agg(min(col("__u")), max(col("__u"))).head()
      if (mm.isNullAt(0)) None else Some((mm.getLong(0), mm.getLong(1)))
    }
    val skip: Int = mmOpt match {
      case None => 0
      case Some((sLo, sHi)) =>
        val lo = sLo ^ Long.MinValue
        val hi = sHi ^ Long.MinValue
        var p = 0
        while (p < passes - 1 &&
            (lo >>> (64 - digitBits * (p + 1))) ==
              (hi >>> (64 - digitBits * (p + 1)))) p += 1
        p
    }
    val prefix: Long =
      if (skip == 0) 0L
      else (mmOpt.get._1 ^ Long.MinValue) >>> (64 - digitBits * skip)
    var locked = targets.select(col("qn"), lit(prefix).as("u"), col("rr"),
      lit(0L).as("before"))
    for (p <- (skip + 1) to passes) {
      val loShift = 64 - digitBits * p
      // Java shifts count mod 64, so u >>> 64 would be a NO-OP, not 0:
      // round 1 (every row a candidate) must skip the prefix test; a
      // skipped-prefix start behaves identically (every row carries the
      // shared prefix by construction)
      val prefixMatch =
        if (p == skip + 1) lit(true)
        else shiftrightunsigned(col("__u"), 64 - digitBits * (p - 1)) ===
          col("u")
      val hist = tm.crossJoin(broadcast(locked))
        .filter(col("rr").isNotNull && prefixMatch)
        .groupBy(col("qn"), col("rr"), col("before"),
          shiftrightunsigned(col("__u"), loShift).as("nhi"))
        .agg(sum(col("__w")).as("c"))
      val wq = Window.partitionBy(col("qn")).orderBy(col("nhi"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val loc = hist
        .withColumn("cumc", sum(col("c")).over(wq))
        .filter(col("cumc") >= col("rr"))
        .groupBy(col("qn"))
        .agg(min(struct(col("nhi"), col("rr"), col("before"),
          col("cumc"), col("c"))).as("m"))
        .select(col("qn"), col("m.nhi").as("u"),
          (col("m.rr") - (col("m.cumc") - col("m.c"))).as("rr"),
          (col("m.before") + (col("m.cumc") - col("m.c"))).as("before"))
      // left join from the target list: a target whose mass never
      // reaches rr (or whose rr is NULL) survives as an all-NULL row
      // instead of vanishing
      locked = locked.select(col("qn")).join(broadcast(loc), Seq("qn"), "left")
    }
    // the final pass's u is the FULL unsigned image — map it back to
    // the caller's signed domain
    locked.select(col("qn"),
      col("u").bitwiseXOR(lit(Long.MinValue)).as("u"),
      col("rr"), col("before"))
  }
}
