package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** [[Ensemble.gateAgreement]] — the cross-family quality-gate
  * agreement matrix: every cell must recompute exactly from the three
  * family sheets evaluated independently, and the diagonal must
  * collapse to each signal's own kill census. */
class EnsembleSpec extends AnyFunSuite {
  import TestSpark._

  private val positive =
    col("source").isin("src0", "src1", "src2", "src3", "src4")

  test("cells recompute from the three family sheets; diagonals collapse") {
    val docs = Tables.documents(spark, sf001)
    val out = Ensemble.gateAgreement(docs, positive).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out.size == 6, "3 signals -> 6 unordered pairs")

    // rebuild the per-doc kill flags from the families directly
    val nb = Classifier.nbQualityScores(docs, positive)
      .select("doc_id", "predicted").collect()
      .map(r => r.getLong(0) -> (r.getLong(1) == 0L)).toMap
    val lm = Phrases.lmQualityBuckets(docs, "text")
      .select("doc_id", "bucket").collect()
      .map(r => r.getLong(0) -> Set("tail", "empty").contains(r.getString(1)))
      .toMap
    val rl = QualityRules.audit(docs)
      .select("doc_id", "reason").collect()
      .map(r => r.getLong(0) -> (r.getString(1) != "kept")).toMap
    val ids = nb.keySet & lm.keySet & rl.keySet
    assert(ids.nonEmpty && ids.size == nb.size,
      "held-out docs must all carry lm + rules verdicts")
    val k = Map("rules" -> rl, "lm" -> lm, "nb" -> nb)
    val n = ids.size.toLong
    for {
      (a, b) <- out.keys
    } {
      val bk = ids.count(i => k(a)(i) && k(b)(i)).toLong
      val ao = ids.count(i => k(a)(i) && !k(b)(i)).toLong
      val bo = ids.count(i => !k(a)(i) && k(b)(i)).toLong
      val nn = ids.count(i => !k(a)(i) && !k(b)(i)).toLong
      val ag = bk + nn
      val agq = ((ag * 1024L) / n) * 1024L + (((ag * 1024L) % n) * 1024L) / n
      assert(out((a, b)) == ((bk, ao, bo, nn, agq)), s"cell ($a, $b)")
    }
    // diagonals: a signal always agrees with itself
    for (s <- Ensemble.SignalNames) {
      val (bk, ao, bo, nn, agq) = out((s, s))
      assert(ao == 0L && bo == 0L, s"one-sided cells on diagonal $s")
      assert(bk + nn == n, s"diagonal $s partitions the slice")
      assert(agq == 1048576L, s"diagonal $s agree rate")
    }
    // every cell partitions the same slice
    assert(out.values.forall { case (bk, ao, bo, nn, _) =>
      bk + ao + bo + nn == n })
    info(s"held-out slice $n docs; kill counts: " +
      Ensemble.SignalNames.map(s => s"$s=${ids.count(k(s))}").mkString(" "))
  }

  test("scorecard columns are bitwise the member sheets'; no source drops") {
    val docs = Tables.documents(spark, sf001)
    val sc = Ensemble.sourceScorecard(docs, positive).collect()
      .map(r => r.getString(0) -> r).toMap
    // the dedup census is the row universe at sf0.001 (every source
    // has docs); each member's columns must appear verbatim
    val dups = Dedup.dupRatesBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5)))).toMap
    val psi = Drift.lengthPsiBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val kl = Mixing.sourceKlDivergence(docs).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val lang = LangId.langKlBySource(docs).collect()
      .map(r => r.getString(0) -> r.getLong(r.fieldIndex("kl_q"))).toMap
    assert(sc.keySet == dups.keySet && sc.keySet == psi.keySet,
      "full-outer joins must preserve every source")
    for ((s, r) <- sc) {
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == dups(s), s"dup cols of $s")
      assert(r.getLong(8) == kl(s), s"kl col of $s")
      assert((r.getLong(9), r.getLong(10)) == psi(s), s"psi cols of $s")
      assert(r.getLong(r.fieldIndex("lang_kl_q")) == lang(s), s"lang col of $s")
    }
  }

  test("per-source rates recompute; totals tie out to the agreement diagonals") {
    val docs = Tables.documents(spark, sf001)
    val bySrc = Ensemble.gateRatesBySource(docs, positive).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(bySrc.nonEmpty)
    // the per-source kill counts must sum to the q150 diagonals —
    // same kill frame, two rollups
    val diag = Ensemble.gateAgreement(docs, positive).collect()
      .filter(r => r.getString(0) == r.getString(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(bySrc.values.map(_._2).sum == diag("rules"), "rules total")
    assert(bySrc.values.map(_._3).sum == diag("lm"), "lm total")
    assert(bySrc.values.map(_._4).sum == diag("nb"), "nb total")
    // every rate recomputes from its own counts
    for ((src, (n, nr, nl, nn, rr, rl, rn)) <- bySrc) {
      def rq(c: Long) = ((c * 1024L) / n) * 1024L + (((c * 1024L) % n) * 1024L) / n
      assert(n > 0 && rr == rq(nr) && rl == rq(nl) && rn == rq(nn), s"rates of $src")
    }
  }

  // ---- feed policy (q162): the acquisition family's apply member ----

  test("feedPolicy verdict is a pure CASE over the scorecard columns") {
    val docs = Tables.documents(spark, sf001)
    val rows = Ensemble.feedPolicy(docs, positive).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val get = (c: String) =>
        if (r.isNullAt(r.fieldIndex(c))) None else Some(r.getLong(r.fieldIndex(c)))
      val expected =
        if (get("dup_rate_q").exists(_ >= 524288L) || get("kl_q").exists(_ >= 192L)) "drop"
        else if (get("psi_alert").contains(1L) || get("rate_rules_q").exists(_ >= 838861L) ||
          get("lang_kl_q").exists(_ >= 128L)) "downweight"
        else "keep"
      assert(r.getString(r.fieldIndex("verdict")) == expected,
        s"verdict CASE for ${r.getString(0)}")
    }
  }

  test("a planted mirror feed drops end-to-end; the clean feed survives") {
    import spark.implicits._
    // 100 mutually-distinct clean docs; a 10-doc 'mirror' feed whose
    // every doc verbatim-copies a clean doc — the feed q154/q162 exist
    // to catch. Mirror ids are larger, so every mirror doc is the
    // NON-canonical member of its 2-cluster.
    def tokens(i: Long) = (0 until 30).map(j => s"w${i}x$j").mkString(" ")
    val clean = (1L to 100L).map(i => (i, "the and is of " + tokens(i), "en", "clean"))
    val mirror = (1L to 10L).map(i => (1000L + i, "the and is of " + tokens(i), "en", "mirror"))
    val docs = (clean ++ mirror).toDF("doc_id", "text", "lang", "source")
    val pos = col("source") === "clean"

    val verdicts = Ensemble.feedPolicy(docs, pos).collect()
      .map(r => r.getString(0) -> r.getString(r.fieldIndex("verdict"))).toMap
    assert(verdicts("mirror") == "drop",
      s"an all-duplicates feed must drop: $verdicts")
    assert(verdicts("clean") != "drop",
      s"a 10%-dup clean feed must not drop: $verdicts")

    val acted = Ensemble.applyFeedPolicy(docs, pos)
    assert(acted.filter(col("source") === "mirror").count() == 0L,
      "dropped feed's docs must vanish from the filtered corpus")
    assert(acted.filter(col("source") === "clean").count() > 0L,
      "the surviving feed keeps docs")
    assert(acted.columns.toSeq == docs.columns.toSeq,
      "the act returns the corpus's own columns")
  }

  test("a mislabeled-language feed damps via the lang seat alone — no other line can see it") {
    import spark.implicits._
    // the regime the fifth member exists for: a feed whose lang LABEL
    // says 'en' but whose TEXT is zz-language. The rules family can't
    // object (the label passes non_english, and the planted stopword
    // prefix clears the stopword ratio); the content-KL stays under
    // its 3-bit drop line (the corpus holds real zz text elsewhere,
    // and the +8192 smoothing damps a ~7%-mass feed); only the MINTED
    // label diverges. A truthfully-labeled zz feed anchors the zz
    // class in the trained model. The zz text draws from ONE closed
    // 400-word vocabulary shared by liar and zzfeed — doc-id-unique
    // words would fingerprint the liar's TRAINED half inside the en
    // class and pull its held-out half back to en — via a stride-13
    // walk from a doc-dependent offset, so any two zz docs share
    // ZERO body words (no dup line fires) while both feeds cover the
    // same vocabulary; and the zz-text share stays under a quarter
    // of the corpus so the liar's all-zz prediction vector clears
    // the 2-bit damp line.
    def enText(i: Long) =
      "the and is of " + (0 until 30).map(j => s"w${i}x$j").mkString(" ")
    def zzText(i: Long) =
      "the and is of " + (0 until 30).map(j => s"zq${(i * 7 + j * 13) % 400}w").mkString(" ")
    val clean = (1L to 260L).map(i => (i, enText(i), "en", "clean"))
    val zzfeed = (1L to 24L).map(i => (3000L + i, zzText(3000L + i), "zz", "zzfeed"))
    val liar = (1L to 24L).map(i => (4000L + i, zzText(4000L + i), "en", "liar"))
    val docs = (clean ++ zzfeed ++ liar).toDF("doc_id", "text", "lang", "source")
    val pos = col("source") === "clean"

    val sc = Ensemble.sourceScorecard(docs, pos).collect()
      .map(r => r.getString(0) -> r).toMap
    def gl(s: String, c: String): Option[Long] = {
      val r = sc(s); val i = r.fieldIndex(c)
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    }
    // the liar feed clears every OTHER line...
    assert(gl("liar", "dup_rate_q").forall(_ < 524288L), "liar is not a mirror")
    assert(gl("liar", "kl_q").forall(_ < 192L),
      s"liar's content must not be alien (corpus holds zz text): ${gl("liar", "kl_q")}")
    assert(gl("liar", "psi_alert").forall(_ == 0L), "liar's shape is the corpus norm")
    assert(gl("liar", "rate_rules_q").forall(_ < 838861L),
      "the mechanical rules cannot see a mislabeled language")
    // ...and fails the lang line
    assert(gl("liar", "lang_kl_q").exists(_ >= 128L),
      s"the minted-label KL must expose the liar: ${gl("liar", "lang_kl_q")}")
    assert(gl("clean", "lang_kl_q").exists(_ < 128L),
      s"the majority feed reads a low lang seat: ${gl("clean", "lang_kl_q")}")

    val verdicts = Ensemble.feedPolicy(docs, pos).collect()
      .map(r => r.getString(0) -> r.getString(r.fieldIndex("verdict"))).toMap
    assert(verdicts("liar") == "downweight",
      s"the lang damp line must act on the liar: $verdicts")
    assert(verdicts("clean") == "keep", s"clean must keep: $verdicts")
  }

  test("operating points: thresholds are scorecard deciles; every cell recomputes locally") {
    import spark.implicits._
    // the mirror fixture plus a third, alien-vocabulary feed so the
    // dup and KL axes both spread across sources
    def tokens(i: Long) = (0 until 30).map(j => s"w${i}x$j").mkString(" ")
    val clean = (1L to 60L).map(i => (i, "the and is of " + tokens(i), "en", "clean"))
    val mirror = (1L to 12L).map(i => (1000L + i, "the and is of " + tokens(i), "en", "mirror"))
    val alien = (1L to 20L).map(i =>
      (2000L + i, (0 until 30).map(j => s"zq${(i * 7 + j) % 9}").mkString(" "), "xx", "alien"))
    val docs = (clean ++ mirror ++ alien).toDF("doc_id", "text", "lang", "source")
    val pos = col("source") === "clean"

    val sc = Ensemble.sourceScorecard(docs, pos).collect()
      .map(r => r.getString(0) -> r).toMap
    val sheet = Ensemble.feedPolicyOperatingPoints(docs, pos).collect()
    assert(sheet.nonEmpty)
    def optLong(r: org.apache.spark.sql.Row, c: String): Option[Long] = {
      val i = r.fieldIndex(c); if (r.isNullAt(i)) None else Some(r.getLong(i))
    }
    val dupVals = sc.values.flatMap(optLong(_, "dup_rate_q")).toSet
    val klVals = sc.values.flatMap(optLong(_, "kl_q")).toSet
    sheet.foreach { row =>
      val (td, tk) = (row.getLong(0), row.getLong(1))
      assert(dupVals.contains(td) && klVals.contains(tk),
        s"thresholds must be SELECTED scorecard values: ($td, $tk)")
      // local replay of the q162 CASE at these lines
      val verdicts = sc.values.map { r =>
        val drop = optLong(r, "dup_rate_q").exists(_ >= td) ||
          optLong(r, "kl_q").exists(_ >= tk)
        val down = !drop && (optLong(r, "psi_alert").contains(1L) ||
          optLong(r, "rate_rules_q").exists(_ >= 838861L) ||
          optLong(r, "lang_kl_q").exists(_ >= 128L))
        val v = if (drop) "drop" else if (down) "downweight" else "keep"
        (v, optLong(r, "n_docs").getOrElse(0L), optLong(r, "kl_q").getOrElse(0L))
      }
      def cnt(v: String) = verdicts.count(_._1 == v).toLong
      def docsOf(v: String) = verdicts.filter(_._1 == v).map(_._2).sum
      assert(row.getAs[Long]("n_drop_src") == cnt("drop") &&
        row.getAs[Long]("n_down_src") == cnt("downweight") &&
        row.getAs[Long]("n_keep_src") == cnt("keep"), s"source counts at ($td,$tk)")
      assert(row.getAs[Long]("docs_dropped") == docsOf("drop") &&
        row.getAs[Long]("docs_damped") == docsOf("downweight") &&
        row.getAs[Long]("docs_kept") == docsOf("keep"), s"doc masses at ($td,$tk)")
      val keptMass = verdicts.filter(_._1 != "drop").map(t => t._3 * t._2).sum
      assert(row.getAs[Long]("kept_kl_mass_q") == keptMass, s"kept KL mass at ($td,$tk)")
    }
    // the sweep must actually DISCRIMINATE: some cell drops the mirror
    // or alien mass, some cell keeps everything
    val dropped = sheet.map(_.getAs[Long]("docs_dropped")).toSet
    assert(dropped.size > 1, s"a one-note sweep informs nothing: $dropped")
  }

  test("actOnVerdicts survives a corpus verdict column and collapses duplicate sheet rows") {
    import spark.implicits._
    // the corpus itself carries a `verdict` column — the join must not
    // throw an ambiguous-reference AnalysisException, and the corpus's
    // own column must pass through untouched
    val docs = (1L to 40L).map(i =>
      (i, if (i <= 20) "a" else "b", s"caller$i")).toDF("doc_id", "source", "verdict")
    // duplicate, CONFLICTING sheet rows: severity must win (drop beats
    // keep; an unrecognized string beats downweight), never silently
    // duplicating kept docs
    val sheet = Seq(("a", "keep"), ("a", "drop"), ("b", "downweight"),
      ("b", "mystery"), ("b", "keep")).toDF("source", "verdict")
    val acted = Ensemble.actOnVerdicts(docs, sheet)
    val bySrc = acted.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("a"), s"drop must win the a-conflict: $bySrc")
    assert(!bySrc.contains("b"),
      s"the unrecognized verdict (which kills its rows) must outrank the damp: $bySrc")
    assert(acted.count() == 0L)
    // no duplication either: a sheet with N identical rows acts once
    val dupKeep = Seq(("a", "keep"), ("a", "keep"), ("a", "keep"))
      .toDF("source", "verdict")
    val kept = Ensemble.actOnVerdicts(docs, dupKeep)
    assert(kept.count() == 40L, "duplicate identical rows must not multiply docs")
    assert(kept.columns.toSeq == docs.columns.toSeq &&
      kept.filter(col("verdict").startsWith("caller")).count() == 40L,
      "the corpus's own verdict column passes through untouched")
    // NULL verdict in the sheet = evidence-free = keep
    val nullSheet = Seq(("a", Option.empty[String])).toDF("source", "verdict")
    assert(Ensemble.actOnVerdicts(docs, nullSheet).count() == 40L)
  }
}
