package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import org.apache.spark.sql.functions.col

/** [[Drift.termDrift]] decisions pinned on a hand fixture with
  * planted drift: the up/down flags fire on rate (not raw-count)
  * changes, a count-stable term in differently-sized slices is rated
  * by rate, new/vanished vocabulary gets the −1 ratio and the right
  * flag, the exact quantized ratio, the minTotal gate, and null-text
  * drops. q92 oracles the arithmetic on driver data — where the
  * synthetic vocab is uniform, so the fire paths live here. */
class DriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Q = 1048576L

  test("planted drift fires by rate; new and vanished vocab flagged") {
    // Slice A (ids 0..9): 10 docs of "base base base base stable" -> 50 tokens.
    // Slice B (ids 10..14): 5 docs of "base base boom boom boom
    // boom boom stable fresh x" -> 50 tokens. So N_a = N_b = 50.
    //   base: 40 -> 10   (rate 4x down)     -> drift_dir -1
    //   boom: 0 -> 25    (new vocab)        -> ratio -1, drift_dir +1
    //   stable: 10 -> 5  (rate 10/50 vs 5/50 = 2x down) -> -1
    //   fresh: 0 -> 5    (below minTotal=10) -> gated out
    val docs = (0 until 10).map(i => (i.toLong, "base base base base stable")) ++
      (10 until 15).map(i => (i.toLong, "base base boom boom boom boom boom stable fresh x"))
    val out = Drift.termDrift(docs.toDF("doc_id", "text"), "text",
        col("doc_id") < 10, minTotal = 10L, num = 3L, den = 2L)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("ratio_q"), r.getAs[Long]("drift_dir")))).toMap

    assert(out("base") == ((40L, 10L, 10L * 50L * Q / (40L * 50L), -1L)))
    assert(out("boom") == ((0L, 25L, -1L, 1L)))
    assert(out("stable") == ((10L, 5L, 5L * 50L * Q / (10L * 50L), -1L)))
    assert(!out.contains("fresh") && !out.contains("x"), "minTotal gates rare terms")
  }

  test("lengthPsi: identical length distributions score exactly zero, no alert") {
    // constant length -> all mass in bin 0 on BOTH sides -> every
    // per-bin psi_q is exactly 0 and the verdict is quiet
    val docs = (0L until 400L).map(i => (i, "a b c d e")).toDF("doc_id", "text")
    val out = Drift.lengthPsi(docs).collect()
    assert(out.length == 10, "exactly bins rows")
    assert(out.forall(_.getAs[Long]("psi_q") == 0L))
    assert(out.forall(_.getAs[Long]("psi_total_q") == 0L))
    assert(out.forall(_.getAs[Long]("alert") == 0L))
    val b0 = out.find(_.getAs[Long]("bin") == 0L).get
    assert(b0.getAs[Long]("rs_q") == 1048576L && b0.getAs[Long]("rn_q") == 1048576L,
      "full mass rate = 2^20 exactly")
  }

  test("lengthPsi: a planted length shift in the incoming batch fires the alert") {
    // the md5 split decides membership, so plant the shift THROUGH
    // it: short standing docs, long incoming docs
    val ids = (0L until 600L).toDF("doc_id")
    val isNew = Sampling.withSplitBucket(ids, "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("__bucket") < 100L)).toMap
    val docs = (0L until 600L).map { i =>
      (i, if (isNew(i)) Seq.fill(50)("w").mkString(" ") else "a b c d e")
    }.toDF("doc_id", "text")
    val out = Drift.lengthPsi(docs).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("psi_q") >= 0L), "per-bin PSI is non-negative")
    assert(out.map(_.getAs[Long]("psi_q")).sum ==
      out.head.getAs[Long]("psi_total_q"), "total = sum of contributions")
    assert(out.forall(_.getAs[Long]("alert") == 1L), "disjoint distributions must alert")
    // all standing mass in bin 0, all incoming mass in the top bin
    val b0 = out.find(_.getAs[Long]("bin") == 0L).get
    val b9 = out.find(_.getAs[Long]("bin") == 9L).get
    assert(b0.getAs[Long]("n_new") == 0L && b9.getAs[Long]("n_std") == 0L)
    assert(b9.getAs[Long]("rn_q") == 1048576L)
  }

  test("lengthPsi: a varied-but-split-independent distribution stays under the alert line") {
    // lengths vary 7 ways but are a function of doc_id alone, never of
    // the md5 bucket — only sampling noise separates the two sides, and
    // at 2000 docs that noise sits well under the 0.3 log2 line (the
    // operator's whole point: fire on SHIFT, tolerate sampling noise at
    // adequate sample sizes)
    val docs = (0L until 2000L).map { i =>
      (i, Seq.fill(1 + (i % 7).toInt)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = Drift.lengthPsi(docs).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("psi_q") >= 0L))
    val totalStd = out.map(_.getAs[Long]("n_std")).sum
    val totalNew = out.map(_.getAs[Long]("n_new")).sum
    assert(totalStd > 0 && totalNew > 0 && totalStd + totalNew == 2000L)
    assert(out.head.getAs[Long]("alert") == 0L,
      s"stable split alerted: psi_total_q=${out.head.getAs[Long]("psi_total_q")}")
  }

  test("lengthPsi: driver corpus sheet is consistent (tiny-sample alert is legitimate)") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val out = Drift.lengthPsi(docs).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("psi_q") >= 0L))
    assert(out.map(_.getAs[Long]("psi_q")).sum == out.head.getAs[Long]("psi_total_q"))
    assert(out.map(_.getAs[Long]("n_std")).sum > 0)
  }

  test("lengthPsi: parameter bounds throw") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    assertThrows[IllegalArgumentException] { Drift.lengthPsi(docs, newPermille = 1001) }
    assertThrows[IllegalArgumentException] { Drift.lengthPsi(docs, bins = 1) }
  }

  test("rate ratio is slice-size-normalized; stable terms stay quiet") {
    // A has 3x the volume of B; "even" keeps the same RATE in both
    // (6/30 vs 2/10) -> ratio exactly 1<<20, no flag, even though raw
    // counts drop 3x. Null text contributes nothing.
    val docs = (0 until 3).flatMap(i => Seq(
        (i.toLong * 2, Option("even odd odd odd odd pad pad pad pad pad")))) ++
      Seq((1L, Option("even odd odd odd pad pad pad pad pad pad")), (3L, Option.empty[String]))
    val out = Drift.termDrift(docs.toDF("doc_id", "text"), "text",
        col("doc_id") % 2 === 0, minTotal = 4L, num = 3L, den = 2L)
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Long]("ratio_q"), r.getAs[Long]("drift_dir")))).toMap

    assert(out("even") == ((3L, 1L, Q, 0L)))
    // odd: rate 0.4 -> 0.3 is only a 1.33x drop — inside the 1.5x band
    assert(out("odd") == ((12L, 3L, 3L * 30L * Q / (12L * 10L), 0L)))
    intercept[IllegalArgumentException] {
      Drift.termDrift(docs.toDF("doc_id", "text"), "text", col("doc_id") < 2, num = 1L, den = 1L)
    }
  }

  test("lengthPsiBySource: corpus-proportional sources read exactly zero") {
    // sources A and B each hold ONE copy of the same length multiset:
    // every per-bin rate equals the corpus rate as an identical
    // RATIONAL (c/n == (c/2)/(n/2)), so the two-step fixed point
    // agrees term by term and psi_q is exactly 0 — not merely small
    val lens = Seq(1, 3, 7, 12, 20, 35, 60, 100, 200, 400)
    val docs = lens.zipWithIndex.flatMap { case (l, i) =>
      val text = (0 until l).map(j => s"t$j").mkString(" ")
      Seq((i.toLong * 2, text, "A"), (i.toLong * 2 + 1, text, "B"))
    }.toDF("doc_id", "text", "source")
    val out = Drift.lengthPsiBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("A") == ((10L, 0L, 0L)), s"A must read exactly zero: $out")
    assert(out("B") == ((10L, 0L, 0L)))
  }

  test("lengthPsiBySource: a shifted-length feed alarms, the dominant feed stays quiet") {
    // 'bulk' spans the corpus deciles; 'outlier' is 3 docs of one
    // extreme length — all its mass lands in the top bin, PSI blows
    // past the 0.3 line. Kept SMALL deliberately: bulk (~96% of the
    // corpus) keeps mass in every bin, so its own PSI stays under the
    // line — a LARGE concentrated foreign mass would empty a bin for
    // bulk and legitimately alarm the dominant feed too (PSI's
    // zero-bin term; the smoothed log keeps it finite, not small)
    val bulk = (1 to 90).map { i =>
      (i.toLong, (0 until i).map(j => s"w$j").mkString(" "), "bulk")
    }
    val outlier = (100 to 102).map { i =>
      (i.toLong, (0 until 500).map(j => s"x$j").mkString(" "), "outlier")
    }
    // a null source and a null doc_id: the first groups as 'unknown',
    // the second is excluded entirely (the q144 base filter)
    val docs = (bulk ++ outlier).toDF("doc_id", "text", "source")
      .union(Seq((Some(200L), "a b c", Option.empty[String]),
        (Option.empty[Long], "dropped doc", Option("ghost")))
        .toDF("doc_id", "text", "source"))
    val out = Drift.lengthPsiBySource(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set("bulk", "outlier", "unknown"), s"got ${out.keySet}")
    assert(out("outlier")._1 == 3L && out("outlier")._3 == 1L,
      s"a one-length feed against a broad corpus must alarm: $out")
    assert(out("bulk")._1 == 90L && out("bulk")._3 == 0L,
      s"the dominant feed spans every corpus bin — no alarm: $out")
    assert(out("unknown")._1 == 1L)
    assert(Drift.lengthPsiBySource(docs).count() == 3L, "null doc_id excluded")
  }

  test("content KL: a batch equal to the standing slice reads exactly zero") {
    val docs = (1L to 20L).map { i =>
      (i, (0 until 15).map(j => s"alpha${(i + j) % 9} beta${j % 4}").mkString(" "))
    }.toDF("doc_id", "text")
    val model = Drift.contentKlModel(docs)
    val out = Drift.klAgainstModel(docs, model).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) > 0L, "bigrams counted")
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L,
      s"equal bucket counts must cancel before quantization: $r")
  }

  test("content KL: a template-injection spike alarms; tiny probes and empty models are safe") {
    val standing = (1L to 20L).map { i =>
      (i, (0 until 15).map(j => s"alpha${(i + j) % 9} beta${j % 4}").mkString(" "))
    }.toDF("doc_id", "text")
    val model = Drift.contentKlModel(standing)
    // a boilerplate storm: ONE bigram carrying the whole batch's mass
    // — the concentration spike hashed features exist to catch
    val spike = Seq((100L, Seq.fill(2001)("spam").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Drift.klAgainstModel(spike, model).collect().head
    assert(r.getLong(0) == 2000L && r.getLong(1) == 1L)
    assert(r.getLong(2) >= 32L && r.getLong(3) == 1L,
      s"an all-one-bucket batch must clear the 0.5-bit line: $r")
    // a small disjoint-vocabulary batch: positive KL, but +1 smoothing
    // keeps a B-dwarfed batch under the alarm — tiny probes are
    // safe-side by construction
    val flipped = (100L to 105L).map { i =>
      (i, (0 until 15).map(j => s"zz${i}q$j").mkString(" "))
    }.toDF("doc_id", "text")
    val f = Drift.klAgainstModel(flipped, model).collect().head
    assert(f.getLong(2) > 0L && f.getLong(3) == 0L,
      s"84 bigrams against 8192 smoothed buckets cannot false-alarm: $f")
    // empty standing model: t_g = 0, empty map — the probe still
    // closes (KL vs uniform), never crashes
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = Drift.klAgainstModel(flipped, Drift.contentKlModel(empty))
      .collect().head
    assert(e.getLong(0) > 0L, "batch mass still counted against an empty model")
  }
}
