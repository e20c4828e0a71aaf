package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("cosine matches a hand computation") {
    val df = Seq((Array(1.0, 0.0, 1.0), Array(1.0, 1.0, 0.0))).toDF("a", "b")
    val c = df.select(Similarity.cosine(col("a"), col("b"))).head.getDouble(0)
    assert(math.abs(c - 0.5) < 1e-12) // dot=1, norms sqrt(2)*sqrt(2)=2
  }

  test("brute-force top-k: ranks are dense per query, self excluded, cos descending") {
    val e = Tables.embeddings(spark, sf001)
    val top = Similarity.bruteForceTopK(e.filter(col("vec_id") < 4), e, 5)
    val rows = top.orderBy("q_id", "rank").collect()
    assert(rows.length == 20)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
      assert(rs.forall(_.getAs[Long]("n_id") != q))
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cos"))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("multi-probe ANN strictly improves recall over single-probe at <= bits+1 buckets") {
    // The driver embeddings are near-random (top-10 neighbor cosines all
    // < 0.5), the worst case for LSH — so the spec asserts the two
    // properties that hold regardless of data geometry: multi-probe
    // dominates single-probe (it probes a superset of buckets), and the
    // measured recalls clear floors set below this data's deterministic
    // values. The >= 0.9 guarantee LSH actually makes — for HIGH-cosine
    // neighbors — is asserted on planted near-dups in the next test.
    val e = Tables.embeddings(spark, sf001)
    val qs = e.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(qs, e, 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    def recallOf(multiProbe: Boolean): Double = {
      val approx = Similarity.annTopK(qs, e, 10, bits = 2, multiProbe = multiProbe)
        .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val single = recallOf(multiProbe = false)
    val multi = recallOf(multiProbe = true)
    info(f"ANN recall@10 (2-bit LSH): single=$single%.2f multi=$multi%.2f")
    assert(single > 0.25, s"single-probe recall $single below deterministic floor")
    assert(multi >= single + 0.2, s"multi-probe ($multi) must materially beat single ($single)")
    assert(multi > 0.7, s"multi-probe recall $multi below deterministic floor")
  }

  test("ANN finds planted high-similarity near-dups with recall >= 0.9 (the LSH guarantee)") {
    // 50 base vectors + 50 small perturbations (cos ≈ 0.99): the regime
    // sign-bit LSH is built for. Bit-flip probability per plane is
    // acos(cos)/π ≈ 0.05, so with 4 bits + one-flip multi-probe the
    // planted partner is reachable with P ≈ 0.98 per pair; measured
    // recall on this fixed seed is 1.0.
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val qs = all.filter(col("vec_id") < 50)
    val top1 = Similarity.annTopK(qs, all, 1, bits = 4, multiProbe = true).collect()
    val hits = top1.count(r => r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + 100L)
    val recall = hits / 50.0
    info(f"planted near-dup recall@1 (4-bit multi-probe LSH): $recall%.2f")
    assert(recall >= 0.9, s"planted-dup recall $recall < 0.9")
  }

  test("IVF top-k: recall grows with nprobe and clears deterministic floors") {
    val e = Tables.embeddings(spark, sf001)
    val qs = e.filter(col("vec_id") < 20)
    val cent = e.filter(col("vec_id") < 16)
    val exact = Similarity.bruteForceTopK(qs, e, 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    def recallAt(np: Int): Double = {
      val ivf = Similarity.ivfTopK(qs, e, cent, 10, nprobe = np).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val r2 = recallAt(2); val r4 = recallAt(4); val r8 = recallAt(8)
    info(f"IVF recall@10 (16 cells): nprobe2=$r2%.2f nprobe4=$r4%.2f nprobe8=$r8%.2f")
    assert(r8 >= r2, "recall must be monotone in nprobe (probed cells are supersets)")
    assert(r4 > 0.75, s"nprobe=4 recall $r4 below deterministic floor")
    assert(r8 > 0.85, s"nprobe=8 recall $r8 below deterministic floor")
    // k-means refinement on the driver embeddings: measured for the
    // record, floor-asserted only — these vectors are near-random
    // (top-10 cosines < 0.5, no cluster structure), so NO centroid
    // placement can push partition-based recall much past ~0.83 at
    // nprobe=4; that cap is data, not design. The ≥0.9 refinement
    // guarantee is asserted on clustered data in the dedicated k-means
    // test below, the regime Lloyd iterations actually address.
    val refined = Similarity.kmeansIterate(e, cent, iters = 2, dim = 64)
    val ivfR = Similarity.ivfTopK(qs, e, refined, 10, nprobe = 4, dim = 64).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    val r4r = (exact & ivfR).size.toDouble / exact.size
    info(f"IVF recall@10 nprobe=4 with 2 k-means rounds: $r4r%.2f (seed: $r4%.2f; near-random data caps both)")
    assert(r4r >= 0.75, s"refined nprobe=4 recall $r4r below deterministic floor")
  }

  test("IVF finds planted high-similarity near-dups with recall >= 0.9") {
    // near-identical vectors assign to the same centroid cell, and a
    // query's probe set always contains its own best cell
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val top1 = Similarity.ivfTopK(all.filter(col("vec_id") < 50), all,
      all.filter(col("vec_id") < 16), 1, nprobe = 4).collect()
    val recall = top1.count(r => r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + 100L) / 50.0
    info(f"IVF planted near-dup recall@1: $recall%.2f")
    assert(recall >= 0.9)
  }

  test("k-means refinement lifts IVF recall to >= 0.9 at nprobe=4 on clustered data") {
    // 12 well-separated direction clusters. The 16 seed centroids are
    // HEAVILY CORRUPTED cluster samples (noise comparable to the
    // center magnitude): every cluster keeps rough affinity to ≥1
    // seed, but cell boundaries are badly placed — exactly the defect
    // Lloyd re-centering fixes in a few rounds.
    val rnd = new scala.util.Random(11)
    val nClusters = 12; val per = 40; val dim = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    // point jitter 4.0 vs per-component center scale 5.0: wide clusters
    // whose boundary points SPLIT across badly-seeded cells (measured
    // seed recall 0.90); re-centered centroids pull every cluster deep
    // into one cell (measured refined recall 1.00)
    val pts = for (c <- 0 until nClusters; j <- 0 until per) yield
      (j.toLong * nClusters + c,
        centers(c).map(x => (x + 4.0 * rnd.nextGaussian()).toFloat))
    val all = pts.toDF("vec_id", "embedding")
    val seeds = (0 until 16).map(i =>
      (i.toLong, centers(i % nClusters).map(x => (x + 8.0 * rnd.nextGaussian()).toFloat)))
      .toDF("vec_id", "embedding")
    val qs = all.filter(col("vec_id") < 24)
    val exact = Similarity.bruteForceTopK(qs, all, 10).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
    def recallWith(cent: org.apache.spark.sql.DataFrame): Double = {
      val ivf = Similarity.ivfTopK(qs, all, cent, 10, nprobe = 4, dim = dim).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id"))).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val r0 = recallWith(seeds)
    val refined = Similarity.kmeansIterate(all, seeds, iters = 3, dim = dim)
    val r3 = recallWith(refined)
    info(f"IVF recall@10 nprobe=4: corrupted seeds=$r0%.2f refined(3 rounds)=$r3%.2f")
    assert(r3 >= 0.95, s"refined recall $r3 < 0.95")
    assert(r3 >= r0 + 0.05, s"refinement must lift recall over the corrupted seeds ($r0 -> $r3)")
  }

  test("k-means refinement is bitwise deterministic and drops empty cells only") {
    val e = Tables.embeddings(spark, sf001)
    val seeds = e.filter(col("vec_id") < 16)
    def run(): Map[Long, Seq[Double]] =
      Similarity.kmeansIterate(e, seeds, iters = 2, dim = 64).collect()
        .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    val a = run(); val b = run()
    assert(a == b, "quantized-mean accumulation must be run-to-run identical")
    assert(a.nonEmpty && a.size <= 16)
    assert(a.values.forall(_.length == 64), "every refined centroid keeps full dimension")
  }

  test("ANN handles null and mismatched-length embeddings without truncated-dot bucketing") {
    val good = (0L until 20L).map(i => (i, Array.tabulate(8)(j => (i + j + 1).toFloat)))
    val all = (good.map { case (i, v) => (i, v) } :+ (90L, null.asInstanceOf[Array[Float]]) :+
      (91L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    // dim inferred as the modal length (8); null and length-2 rows excluded
    val res = Similarity.annTopK(all.filter(col("vec_id") < 5), all, 3, bits = 2)
    val ids = res.collect().map(_.getAs[Long]("n_id")).toSet
    assert(!ids.contains(90L) && !ids.contains(91L))
    assert(res.count() > 0)
  }

  test("bucket distribution: 4-bit LSH splits the corpus into multiple buckets") {
    val e = Tables.embeddings(spark, sf001)
    val planes = Similarity.hyperplanes(64, 4)
    val buckets = e.select(Similarity.lshBucket(col("embedding").cast("array<double>"), planes).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.length > 4, "expected spread across >4 of 16 buckets")
  }

  test("semantic dedup keeps the min-id representative per ε-ball, keeps non-dups") {
    // Planted near-identical pairs (i, i+100) over 50 base vectors —
    // the same fixture the IVF recall test uses: near-copies share an
    // argmax cell, so SemDeDup must drop exactly the HIGHER id of each
    // pair and keep everything else.
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansIterate(all, all.filter(col("vec_id") < 16), iters = 2, dim = 64)
    val out = Similarity.semanticDedup(all, cents, threshold = 0.95, dim = 64)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("kept")).toMap
    assert(out.size == 100, "one disposition row per vector")
    val dropped = out.filter(_._2 == 0L).keys.toSet
    assert(dropped.forall(_ >= 100L), "only the higher-id copy of a planted pair may drop")
    val recall = dropped.count(_ >= 100L) / 50.0
    info(f"SemDeDup planted-dup drop recall: $recall%.2f")
    assert(recall >= 0.9, "near-copies share an argmax cell — most planted dups must drop")
    // random gaussians are near-orthogonal: no base vector reaches 0.95
    // cosine to a different base vector, so every base id is kept
    assert((0L until 50L).forall(out(_) == 1L))
  }

  test("recall audit agrees with a direct intersection of the kernels' outputs") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter(col("vec_id") < 8)
    val refined = Similarity.kmeansIterate(e, e.filter(col("vec_id") < 16),
      iters = 2, dim = 64)
    val audit = Similarity.annRecallAudit(q, e, refined, k = 5, nprobe = 4,
      bits = 4, seed = 42L, dim = 64)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(audit.keys.map(_._1).toSet.size == 8 && audit.size == 16,
      "8 queries x 2 methods")
    // recompute one method's hits directly
    val exact = Similarity.bruteForceTopK(q, e, 5).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, e, refined, k = 5, nprobe = 4, dim = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = ivf.groupBy(_._1)
    for ((qid, rows) <- byQ) {
      val hits = rows.count(exact)
      val (nRet, nHits, recall) = audit((qid, "ivf"))
      assert(nRet == rows.length && nHits == hits && recall == hits / 5.0,
        s"q$qid ivf audit row")
    }
    assert(audit.values.forall { case (nRet, nHits, rec) =>
      nHits <= nRet && rec >= 0.0 && rec <= 1.0 })
  }

  test("prefix recall audit: full-dimension arm reads exactly 1.0; counts recompute") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter(col("vec_id") < 8)
    val out = Similarity.prefixRecallAudit(q, e, k = 5, dim = 64)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out.keys.map(_._1).toSet.size == 8 && out.size == 32,
      "8 queries x 4 prefix arms")
    // the dp = 64 arm ranks by the identical cosine chain: recall 1.0
    // by construction — this pins the audit plumbing itself
    for (qid <- 0L until 8L) {
      val (nRet, nHits, rec) = out((qid, "d64"))
      assert(nRet == 5L && nHits == 5L && rec == 1.0, s"d64 arm of q$qid")
    }
    // recompute the d16 arm directly from a hand-sliced ranking
    val exact = Similarity.bruteForceTopK(q, e, 5).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sliced = e.select(col("vec_id"),
      slice(col("embedding").cast("array<double>"), 1, 16).cast("array<float>").as("embedding"))
    val d16 = Similarity.bruteForceTopK(
      sliced.filter(col("vec_id") < 8), sliced, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    for ((qid, rows) <- d16.groupBy(_._1)) {
      val hits = rows.count(exact)
      val (nRet, nHits, rec) = out((qid, "d16"))
      assert(nRet == rows.length && nHits == hits && rec == hits / 5.0,
        s"d16 audit row of q$qid")
    }
    val means = Seq("d8", "d16", "d32").map { m =>
      val rs = out.collect { case ((_, mm), (_, _, rec)) if mm == m => rec }
      m -> rs.sum / rs.size
    }
    info(s"driver-corpus mean recall@5 by prefix: ${means.map { case (m, v) => f"$m=$v%.2f" }.mkString(" ")}")
  }

  test("prefix recall audit: signal-in-prefix reads 1.0 everywhere; signal-past-the-prefix zeroes the short arm") {
    val rnd = new scala.util.Random(11)
    // geometry A: ALL signal in the first 8 dims, zero tail — every
    // prefix arm sees the whole vector, so every recall is 1.0
    val a = (0L until 60L).map(i => i ->
      (Array.fill(8)(rnd.nextGaussian()) ++ Array.fill(56)(0.0)).map(_.toFloat))
      .toDF("vec_id", "embedding")
    val outA = Similarity.prefixRecallAudit(
      a.filter(col("vec_id") < 6), a, k = 3, dim = 64).collect()
    assert(outA.length == 24)
    assert(outA.forall(_.getAs[Double]("recall") == 1.0),
      "zero-tail geometry: truncation loses nothing at any dp >= 8")
    // geometry B: a COMMON direction fills the first 8 dims and every
    // distinguishing coordinate lives in the tail; each query's true
    // top-1 is its planted partner at a HIGH id. The d8 arm sees all
    // pairs at the identical cosine and falls back to the id
    // tiebreak — its recall@1 must be exactly 0; d64 reads 1.0.
    val common = Array.fill(8)(1.0)
    val base = (0L until 30L).map(i => i ->
      (common ++ Array.fill(56)(rnd.nextGaussian())).map(_.toFloat))
    val pert = base.map { case (i, v) =>
      (i + 100L) -> v.map(x => x + 0.01f * rnd.nextGaussian().toFloat) }
    val b = (base ++ pert).toDF("vec_id", "embedding")
    val outB = Similarity.prefixRecallAudit(
      b.filter(col("vec_id") < 6), b, k = 1, dim = 64)
      .collect().map(r => (r.getString(1), r.getAs[Double]("recall")))
    val d8 = outB.collect { case ("d8", rec) => rec }
    val d64 = outB.collect { case ("d64", rec) => rec }
    assert(d64.forall(_ == 1.0), "full arm must find the planted partner")
    assert(d8.forall(_ == 0.0),
      s"common-prefix geometry: d8 must collapse to the tiebreak, got ${d8.toSeq}")
  }

  test("rp distortion audit: ratios recompute by hand; JL bounds hold on the driver corpus") {
    val e = Tables.embeddings(spark, sf001)
    val out = Similarity.rpDistortionAudit(
      e.filter(col("vec_id") < 8), e, kDim = 16, dim = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out.size == 8)
    val total = e.filter(col("embedding").isNotNull && size(col("embedding")) === 64).count()
    assert(out.values.forall { case (np, nd, _, _) => np == total - 1 && nd == 0L },
      "every query pairs the full corpus minus itself; no coincident vectors")
    // hand-recompute one query's bounds from collected vectors
    val planes = Similarity.hyperplanes(64, 16, 42L)
    val vecs = e.filter(col("vec_id") < 600)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dotA(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def projA(v: Array[Double]): Array[Double] =
      planes.map(p => dotA(v, p) / 4.0)
    val qv = vecs(3L); val qp = projA(qv)
    val ratios = vecs.collect { case (id, nv) if id != 3L =>
      val np = projA(nv)
      val do2 = dotA(qv, qv) + dotA(nv, nv) - 2.0 * dotA(qv, nv)
      val dp2 = dotA(qp, qp) + dotA(np, np) - 2.0 * dotA(qp, np)
      math.floor(dp2 / do2 * 1048576.0).toLong
    }.toSeq
    // the hand slice covers ids < 600; the audit covers the whole
    // corpus — its bounds must CONTAIN or extend the slice's
    val (_, _, lo, hi) = out(3L)
    assert(lo <= ratios.min && hi >= ratios.max,
      s"audit bounds [$lo, $hi] vs hand slice [${ratios.min}, ${ratios.max}]")
    // JL at kDim=16 on 64-dim gaussian-ish data: broad deterministic
    // band — ratios stay within [0.1, 4]x on this fixed seed
    assert(out.values.forall { case (_, _, l, h) =>
      l > 104857L && h < 4L * 1048576L },
      s"ratio bounds escaped the JL band: $out")
    info(s"kDim=16 ratio bounds per query: ${out.toSeq.sortBy(_._1).map { case (q, (_, _, l, h)) => f"q$q [${l / 1048576.0}%.2f, ${h / 1048576.0}%.2f]" }.mkString(" ")}")
  }

  test("rp distortion audit: a coincident pair counts degenerate and stays out of the bounds") {
    val rnd = new scala.util.Random(5)
    val base = (0L until 40L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    // vector 100 is an exact copy of query 0: d_orig² = 0
    val all = (base :+ (100L -> base.head._2)).toDF("vec_id", "embedding")
    val out = Similarity.rpDistortionAudit(
      all.filter(col("vec_id") < 1), all, kDim = 16, dim = 64)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_pairs") == 40L)
    assert(r.getAs[Long]("n_degenerate") == 1L, "the planted copy is degenerate")
    assert(r.getAs[Long]("min_ratio_q") > 0L, "bounds exclude the degenerate pair")
  }

  test("incremental semantic dedup freezes standing decisions (hand-built geometry)") {
    // One cell (single centroid). Standing: 20=(1,0,0) keeps,
    // 21=(1,.3,0) drops standing (cos .958 to 20). New batch:
    //  - 5 ≈ kept-standing 50=(0,1,0): drops even though 5 < 50 —
    //    standing decisions are FROZEN (monolithic SemDeDup would have
    //    kept 5 and dropped 50 instead);
    //  - 7=(1,.6,0): cos .969 to the DROPPED standing 21 but only .857
    //    to kept 20 — must survive (only KEPT standing vectors veto);
    //  - 3/4 near-copies within the batch: the lower id keeps.
    val rows = Seq(
      (20L, Array(1f, 0f, 0f), false), (21L, Array(1f, 0.3f, 0f), false),
      (50L, Array(0f, 1f, 0f), false),
      (3L, Array(0f, 0f, 1f), true), (4L, Array(0f, 0.01f, 1f), true),
      (5L, Array(0.01f, 1f, 0f), true), (7L, Array(1f, 0.6f, 0f), true))
      .toDF("vec_id", "embedding", "is_new")
    val oneCell = Seq((0L, Array(1f, 1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.incrementalSemanticDedup(rows, "is_new", oneCell,
      threshold = 0.95, dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(3L, 4L, 5L, 7L), "only the batch's disposition is emitted")
    assert(out(3L) == 1L && out(4L) == 0L, "within-batch near-copy: lower id keeps")
    assert(out(5L) == 0L, "a kept standing vector vetoes regardless of id order")
    assert(out(7L) == 1L, "a DROPPED standing vector must not veto")
  }

  test("graft_pqdist native expression is bitwise identical to the HOF formulation") {
    // the native kernel's semantic specification IS the interpreted
    // aggregate(zip_with(...)) fold — pin them equal over adversarial
    // values: negatives, exact halves, floor boundaries at the 2^-14
    // quantum, huge magnitudes, zeros, and mismatched lengths
    val rnd = new scala.util.Random(13)
    val pairs: Seq[(Array[Double], Array[Double])] =
      (0 until 200).map { _ =>
        val n = 1 + rnd.nextInt(16)
        (Array.fill(n)(rnd.nextGaussian() * math.pow(10.0, rnd.nextInt(7) - 3)),
          Array.fill(n)(rnd.nextGaussian() * math.pow(10.0, rnd.nextInt(7) - 3)))
      } ++ Seq(
        (Array(0.5 / 16384.0, -0.5 / 16384.0), Array(1.0 / 16384.0, -1.0 / 16384.0)),
        (Array(0.0, -0.0), Array(-0.0, 0.0)),
        // magnitude ceiling of the pin: dq² must stay within BIGINT on
        // the HOF side too (ANSI throws past 2^63; the real domain is
        // unit-sphere components, 2^30-bounded per term)
        (Array(1e4, -1e4), Array(-1e4, 1e4)),
        (Array(1.0, 2.0), Array(1.0, 2.0, 3.0)))   // mismatched → NULL both ways
    val df = pairs.toDF("a", "b")
      .select(Similarity.pqDist(col("a"), col("b")).as("native"),
        Similarity.pqDistHof(col("a"), col("b")).as("hof"))
    val rows = df.collect()
    assert(rows.length == pairs.length)
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), s"value disagreement: $r")
    }
    assert(rows.last.isNullAt(0), "mismatched lengths must be NULL")
    assert(rows.count(!_.isNullAt(0)) == pairs.length - 1)
  }

  test("PQ train/encode: planted subspace clusters, determinism, one row per (vector, subspace)") {
    // dim 8, m=2 subspaces of 4, ksub=4: each subspace has 4 planted
    // prototype directions; every vector is (protoA[i%4], protoB[(i/4)%4])
    // plus tiny jitter. After training, near-copies of the same
    // prototype pair must share their full code tuple.
    val rnd = new scala.util.Random(23)
    val protos = Array.fill(2, 4)(Array.fill(4)(rnd.nextGaussian() * 3.0))
    def mk(i: Int): Array[Float] =
      (protos(0)(i % 4) ++ protos(1)((i / 4) % 4))
        .map(x => (x + 0.01 * rnd.nextGaussian()).toFloat)
    val embs = (0 until 64).map(i => (i.toLong, mk(i))).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(embs, m = 2, ksub = 4, iters = 2, dim = 8)
    val cbRows = cb.collect()
    assert(cbRows.map(_.getInt(0)).toSet == Set(0, 1), "one codebook per subspace")
    assert(cbRows.forall(_.getSeq[Double](2).length == 4), "sub-centroids keep subspace dim")
    // determinism: retrain on repartitioned input → bitwise same codebooks
    val cb2 = Similarity.pqTrain(embs.repartition(7), m = 2, ksub = 4, iters = 2, dim = 8)
    assert(cb.collect().map(_.toString).sorted.toSeq ==
      cb2.collect().map(_.toString).sorted.toSeq, "codebooks must be partition-invariant")
    val codes = Similarity.pqEncode(embs, cb, m = 2, dim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes.size == 128, "one row per (vector, subspace)")
    // same prototype pair (i, i+16 share protoA AND protoB when
    // i%4 == (i+16)%4 and (i/4)%4 == ((i+16)/4)%4 — i.e. i and i+16
    // share subspace-0 prototype; full-tuple twins are i and i+16 with
    // equal (i%4, (i/4)%4): i vs i+16 differs in (i/4)%4. Use exact
    // twins: i and i+32 share i%4; (i/4)%4 vs ((i+32)/4)%4 = +8%4 = same.
    val twins = (0 until 32).map(i => (i.toLong, (i + 32).toLong))
    val agree = twins.count { case (a, b) =>
      codes((a, 0)) == codes((b, 0)) && codes((a, 1)) == codes((b, 1)) }
    info(s"planted prototype twins sharing full code tuple: $agree/32")
    assert(agree >= 29, s"near-identical prototype pairs must share codes: $agree/32")
  }

  test("PQ Lloyd drops empty cells; encode stays total; degenerate vectors are excluded") {
    import spark.implicits._
    // only 2 genuinely distinct prototypes per subspace but ksub=4
    // seeds: Lloyd rounds must empty some cells and drop them, and
    // encoding against the shrunken codebook stays total
    val protoA = Array(3.0, 0.0, 0.0, 0.0); val protoB = Array(0.0, 3.0, 0.0, 0.0)
    val embs = (0 until 40).map { i =>
      val p = if (i % 2 == 0) protoA else protoB
      (i.toLong, (p ++ p).map(x => (x + 0.001 * ((i * 31) % 7 - 3)).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(embs, m = 2, ksub = 4, iters = 2, dim = 8)
    val perSub = cb.collect().groupBy(_.getInt(0)).map { case (s, rs) => s -> rs.length }
    info(s"surviving sub-centroids per subspace: $perSub")
    assert(perSub.values.forall(n => n >= 1 && n <= 4))
    val codes = Similarity.pqEncode(embs, cb, m = 2, dim = 8)
    assert(codes.count() == 80, "every vector still encodes in every subspace")

    // null / zero-norm / wrong-length vectors: excluded, never crash
    val dirty = Seq(
      (100L, Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f)),
      (101L, null.asInstanceOf[Array[Float]]),
      (102L, Array.fill(8)(0f)),
      (103L, Array(1f, 2f))).toDF("vec_id", "embedding")
    val dirtyCodes = Similarity.pqEncode(dirty, cb, m = 2, dim = 8)
      .collect().map(_.getLong(0)).toSet
    assert(dirtyCodes == Set(100L), s"only the valid vector encodes: $dirtyCodes")
  }

  test("PQ ADC finds planted high-similarity near-dups with recall >= 0.9") {
    // the lsh/ivf planted fixture applied to the compression family: a
    // perturbed copy shares (almost always) its base's full code tuple,
    // so its ADC distance equals the query's own quantization floor —
    // the regime PQ retrieval is built for
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(all, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(all, cb, m = 4, dim = 64)
    val top1 = Similarity.pqAdcTopK(all.filter(col("vec_id") < 50), codes, cb,
      k = 1, m = 4, dim = 64).collect()
    val recall = top1.count(r => r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + 100L) / 50.0
    info(f"PQ ADC planted near-dup recall@1 (m=4, ksub=8): $recall%.2f")
    assert(recall >= 0.9, s"planted-dup ADC recall $recall < 0.9")
  }

  test("PQ recall audit clears a deterministic floor on the driver embeddings and matches a direct recompute") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter(col("vec_id") < 8)
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    val audit = Similarity.pqRecallAudit(q, e, cb, k = 5, m = 4, dim = 64)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(audit.size == 8, "one pq row per query")
    val mean = audit.values.map(_._3).sum / 8.0
    info(f"PQ recall@5 on driver embeddings (m=4, ksub=8): mean=$mean%.2f")
    assert(audit.values.forall { case (nRet, nHits, rec) =>
      nRet == 5 && nHits <= nRet && rec == nHits / 5.0 })
    // direct recompute of one query's hits
    val exact = Similarity.bruteForceTopK(q, e, 5).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
    val adc = Similarity.pqAdcTopK(q, codes, cb, k = 5, m = 4, dim = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    adc.groupBy(_._1).foreach { case (qid, rows) =>
      assert(audit(qid)._2 == rows.count(exact), s"q$qid hit count")
    }
  }

  test("IVFADC finds planted high-similarity near-dups with recall >= 0.9 at a fraction of the codes") {
    // the lsh/ivf/pq planted fixture applied to the COMPOSITION: the
    // perturbed copy shares both its base's IVF cell (the ivf planted
    // guarantee) and its code tuple (the pq planted guarantee), so
    // probing nprobe=4 of 16 cells must still surface it — while the
    // ADC arm touches only the probed cells' codes
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(all, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(all, cb, m = 4, dim = 64)
    val cent = all.filter(col("vec_id") < 16)
    val cells = Similarity.ivfAssign(all, cent, dim = 64).select(col("n_id"), col("c_id"))
    val top1 = Similarity.ivfAdcTopK(all.filter(col("vec_id") < 50), codes, cells,
      cent, cb, k = 1, nprobe = 4, m = 4, dim = 64).collect()
    val recall = top1.count(r => r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + 100L) / 50.0
    info(f"IVFADC planted near-dup recall@1 (nprobe=4/16, m=4, ksub=8): $recall%.2f")
    assert(recall >= 0.9, s"planted-dup IVFADC recall $recall < 0.9")
  }

  test("two-method recall audit: ivfadc rows measure the probe-restricted arm against the same exact arm") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter(col("vec_id") < 8)
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    val cent = e.filter(col("vec_id") < 16)
    val audit = Similarity.pqRecallAudit(q, e, cb, k = 5, m = 4, dim = 64,
      centroids = Some(cent), nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(audit.size == 16, "8 queries x 2 methods")
    assert(audit.keys.map(_._2).toSet == Set("pq", "ivfadc"))
    // ivfadc recomputed directly must equal its audit rows
    val exact = Similarity.bruteForceTopK(q, e, 5).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
    val cells = Similarity.ivfAssign(e, cent, dim = 64).select(col("n_id"), col("c_id"))
    val iv = Similarity.ivfAdcTopK(q, codes, cells, cent, cb, k = 5,
      nprobe = 4, m = 4, dim = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    iv.groupBy(_._1).foreach { case (qid, rows) =>
      val (nRet, nHits, _) = audit((qid, "ivfadc"))
      assert(nRet == rows.length && nHits == rows.count(exact), s"q$qid ivfadc row")
    }
    val meanPq = audit.collect { case ((_, "pq"), v) => v._3 }.sum / 8.0
    val meanIv = audit.collect { case ((_, "ivfadc"), v) => v._3 }.sum / 8.0
    info(f"recall@5: flat pq=$meanPq%.2f ivfadc(nprobe=4/16)=$meanIv%.2f")
  }

  test("IVF balance audit: hand geometry pins counts, empty cells and the imbalance factor") {
    // 2 centroids on orthogonal axes; 8 extra corpus vectors hug
    // axis 0 -> cell 0 holds 9 of 10 (its centroid + the 8), cell 1
    // keeps only its own centroid vector: a 9-vs-1 skew whose exact
    // rates and imbalance factor recompute below
    def axis(i: Int, scale: Double) = Array.tabulate(4)(j => if (j == i) scale.toFloat else 0.01f)
    val cents = Seq(0L -> axis(0, 1.0), 1L -> axis(1, 1.0))
    val corpus = (cents ++ (10L until 18L).map(i => i -> axis(0, 2.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.ivfBalanceAudit(corpus,
      corpus.filter(col("vec_id") < 2), dim = 4).collect()
      .map(r => r.getAs[Long]("c_id") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("r_q"), r.getAs[Long]("n_cells"),
          r.getAs[Long]("n_empty"), r.getAs[Long]("imb_q")))).toMap
    assert(out.size == 2)
    // centroid 1's own vector is on axis 1 -> cell 1 keeps exactly it
    val (n0, r0, c0, e0, i0) = out(0L)
    val (n1, r1, _, _, _) = out(1L)
    assert(n0 + n1 == 10L && c0 == 2L)
    assert(n1 == 1L && e0 == 0L)
    // recompute the exact two-step rates and the factor
    def rate(c: Long, n: Long) = (c * 1024 / n) * 1024 + ((c * 1024 % n) * 1024) / n
    assert(r0 == rate(n0, 10L) && r1 == rate(n1, 10L))
    assert(i0 == 2L * (r0 * r0 + r1 * r1) / 1048576L)
    info(s"imbalance factor = ${i0 / 1048576.0} (skewed 9-vs-1 over 2 cells)")
  }

  test("IVF balance audit: a balanced index reads factor ~1 and zero empty cells") {
    val e = Tables.embeddings(spark, sf001)
    val out = Similarity.ivfBalanceAudit(e, e.filter(col("vec_id") < 16), dim = 64)
      .collect()
    assert(out.length == 16)
    val total = out.map(_.getAs[Long]("n_vecs")).sum
    assert(total == e.filter(col("embedding").isNotNull).count())
    val imb = out.head.getAs[Long]("imb_q") / 1048576.0
    info(f"driver-embedding imbalance factor at nlist=16: $imb%.2f")
    assert(imb >= 1.0 - 1e-3, "factor is >= 1 by Cauchy-Schwarz")
  }

  test("IVFADC+R equals the exact-cosine re-sort of its ADC shortlist (direct recompute)") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter(col("vec_id") < 8)
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
    val cent = e.filter(col("vec_id") < 16)
    val cells = Similarity.ivfAssign(e, cent, dim = 64).select(col("n_id"), col("c_id"))
    val rr = Similarity.ivfAdcRerankTopK(q, e, codes, cells, cent, cb,
      k = 5, shortlist = 15, nprobe = 4, m = 4, dim = 64)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")) ->
        r.getAs[Long]("n_id")).toMap
    // recompute: shortlist by ADC, exact cosine per pair, re-sort
    val short = Similarity.ivfAdcTopK(q, codes, cells, cent, cb,
      k = 15, nprobe = 4, m = 4, dim = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val vecs = e.filter(col("vec_id") < 1000000)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      dot / (math.sqrt(a.indices.map(i => a(i) * a(i)).sum) *
        math.sqrt(b.indices.map(i => b(i) * b(i)).sum))
    }
    short.groupBy(_._1).foreach { case (qid, pairs) =>
      val resort = pairs.map(_._2)
        .sortBy(n => (-cos(vecs(qid), vecs(n)), n)).take(5)
      resort.zipWithIndex.foreach { case (n, i) =>
        assert(rr((qid, i + 1L)) == n, s"q$qid rank ${i + 1}")
      }
    }
  }

  test("IVFADC+R recall >= plain IVFADC at the same probe budget (the refinement guarantee)") {
    // any true-top-k member the shortlist surfaces has a higher exact
    // cosine than every non-member in it, so the re-rank keeps ALL the
    // shortlist's true-top-k members while the ADC ordering may rank
    // them below quantization noise — recall can only rise
    val e = Tables.embeddings(spark, sf001)
    val q = e.filter(col("vec_id") < 8)
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(e, cb, m = 4, dim = 64)
    val cent = e.filter(col("vec_id") < 16)
    val cells = Similarity.ivfAssign(e, cent, dim = 64).select(col("n_id"), col("c_id"))
    val exact = Similarity.bruteForceTopK(q, e, 5).select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val adc = Similarity.ivfAdcTopK(q, codes, cells, cent, cb, k = 5,
      nprobe = 4, m = 4, dim = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val rr = Similarity.ivfAdcRerankTopK(q, e, codes, cells, cent, cb,
      k = 5, shortlist = 15, nprobe = 4, m = 4, dim = 64)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hitsAdc = adc.count(exact)
    val hitsRr = rr.count(exact)
    info(f"recall@5: ivfadc=${hitsAdc / 40.0}%.2f ivfadc+r(3k)=${hitsRr / 40.0}%.2f")
    assert(hitsRr >= hitsAdc, s"re-rank recall $hitsRr < plain $hitsAdc")
    assertThrows[IllegalArgumentException] {
      Similarity.ivfAdcRerankTopK(q, e, codes, cells, cent, cb,
        k = 5, shortlist = 4, nprobe = 4, m = 4, dim = 64)
    }
  }

  test("IVFADC+R finds planted near-dups with recall >= the IVFADC floor") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(all, m = 4, ksub = 8, iters = 2, dim = 64)
    val codes = Similarity.pqEncode(all, cb, m = 4, dim = 64)
    val cent = all.filter(col("vec_id") < 16)
    val cells = Similarity.ivfAssign(all, cent, dim = 64).select(col("n_id"), col("c_id"))
    val top1 = Similarity.ivfAdcRerankTopK(all.filter(col("vec_id") < 50), all,
      codes, cells, cent, cb, k = 1, shortlist = 3, nprobe = 4, m = 4, dim = 64).collect()
    val recall = top1.count(r => r.getAs[Long]("n_id") == r.getAs[Long]("q_id") + 100L) / 50.0
    info(f"IVFADC+R planted near-dup recall@1 (shortlist=3, nprobe=4/16): $recall%.2f")
    assert(recall >= 0.9, s"planted-dup IVFADC+R recall $recall < 0.9")
  }

  test("RRF fusion: scores recompute from the arm rankings; planted recall >= every single arm") {
    val rnd = new scala.util.Random(7)
    val base = (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian().toFloat))
    val pert = base.map { case (i, v) => (i + 100L) -> v.map(x => x + 0.02f * rnd.nextGaussian().toFloat) }
    val all = (base ++ pert).toDF("vec_id", "embedding")
    val qs = all.filter(col("vec_id") < 50)
    val refined = Similarity.kmeansIterate(all, all.filter(col("vec_id") < 16),
      iters = 2, dim = 64)
    val cb = Similarity.pqTrain(all, m = 4, ksub = 8, iters = 2, dim = 64)
    val fused = Similarity.rrfFusionTopK(qs, all, refined, cb, k = 5,
      nprobe = 4, bits = 4, seed = 42L, m = 4, rrfK = 60, dim = 64).collect()

    // scores recompute exactly from the three arm rankings
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.select("q_id", "n_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val arms = Seq(
      ranksOf(Similarity.annTopK(qs, all, 5, bits = 4, seed = 42L, multiProbe = true, dim = 64)),
      ranksOf(Similarity.ivfTopK(qs, all, refined, 5, nprobe = 4, dim = 64)),
      ranksOf(Similarity.pqAdcTopK(qs,
        Similarity.pqEncode(all, cb, m = 4, dim = 64), cb, 5, m = 4, dim = 64)))
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val contribs = arms.flatMap(_.get(key)).map(rk => 1048576L / (60L + rk))
      assert(r.getLong(2) == contribs.length, s"n_arms mismatch at $key")
      assert(r.getLong(3) == contribs.sum, s"rrf_q mismatch at $key")
    }
    // per-query: dense ranks, <= k rows
    fused.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(4)).sorted.toSeq == (1L to rs.length))
      assert(rs.length <= 5)
    }
    // planted recall@1: fusion must not lose to any single arm
    def recall1(pairs: Map[(Long, Long), Long]): Double =
      (0L until 50L).count(q => pairs.get((q, q + 100L)).contains(1L)) / 50.0
    val fusedTop1 = fused.filter(_.getLong(4) == 1L)
      .map(r => (r.getLong(0), r.getLong(1)) -> 1L).toMap
    val rF = recall1(fusedTop1)
    val singles = arms.map(a => recall1(a.filter(_._2 == 1L)))
    info(f"planted recall@1: fused=$rF%.2f arms=${singles.map(s => f"$s%.2f").mkString("/")}")
    assert(rF >= 0.9, s"fused planted recall $rF < 0.9")
    assert(singles.forall(rF >= _), "fusion must not lose to any single arm on planted dups")
  }

  test("residual PQ cuts total reconstruction error strictly below flat PQ at equal (m, ksub)") {
    // 12 well-separated direction clusters (the k-means fixture): flat
    // PQ must spend its 8 sub-centroids per subspace covering the whole
    // sphere, while residual PQ covers only within-cell jitter around
    // each vector's IVF centroid — same budget, far smaller volume
    val rnd = new scala.util.Random(11)
    val nClusters = 12; val per = 40; val dim = 16
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 5.0))
    val pts = for (c <- 0 until nClusters; j <- 0 until per) yield
      (j.toLong * nClusters + c,
        centers(c).map(x => (x + 1.0 * rnd.nextGaussian()).toFloat))
    val all = pts.toDF("vec_id", "embedding")
    val cent = Similarity.kmeansIterate(all, all.filter(col("vec_id") < 16),
      iters = 2, dim = dim)
    def totalDistortion(sheet: org.apache.spark.sql.DataFrame): Long =
      sheet.agg(sum(col("dist_q"))).head.getLong(0)
    val flat = Similarity.pqEncode(all,
      Similarity.pqTrain(all, m = 4, ksub = 8, iters = 2, dim = dim), m = 4, dim = dim)
    val resid = Similarity.pqResidualCodes(all, cent, m = 4, ksub = 8,
      iters = 2, dim = dim)
    assert(resid.count() == flat.count(), "same (vector, subspace) coverage")
    val (df0, dr) = (totalDistortion(flat), totalDistortion(resid))
    info(f"total dist_q at (m=4, ksub=8): flat=$df0 residual=$dr (${dr.toDouble / df0}%.2f x)")
    assert(dr < df0, s"residual encoding must cut total reconstruction error: $dr >= $df0")
    assert(dr.toDouble / df0 < 0.75,
      "on clustered geometry the cut should be substantial, not marginal")
    // partition invariance of the residual chain
    val again = Similarity.pqResidualCodes(all.repartition(7), cent, m = 4,
      ksub = 8, iters = 2, dim = dim)
    assert(again.collect().map(_.toString).sorted.toSeq ==
      resid.collect().map(_.toString).sorted.toSeq)
  }

  test("principalComponent recovers a planted dominant direction") {
    // Planted anisotropy in dim 8: variance 4 along u = (e0+e1)/√2,
    // tiny deterministic jitter elsewhere. The iteration must land on
    // ±u (canonicalized +), with eigval ≈ the planted variance.
    val d = 8
    val n = 200
    val rows = (0 until n).map { i =>
      val a = if (i % 2 == 0) 2.0 else -2.0           // ±2 along u
      val v = Array.tabulate(d) { j =>
        val base = if (j == 0 || j == 1) a / math.sqrt(2.0) else 0.0
        base + 0.01 * (((i * 7 + j * 13) % 11) - 5)   // deterministic jitter
      }
      (i.toLong, v)
    }
    val embs = rows.toDF("vec_id", "embedding")
    val pc = Similarity.principalComponent(embs, iters = 3, dim = d)
      .collect().sortBy(_.getInt(0))
    assert(pc.length == d)
    val v = pc.map(_.getDouble(2))
    val u = Array.tabulate(d)(j => if (j < 2) 1.0 / math.sqrt(2.0) else 0.0)
    val cos = v.zip(u).map { case (a, b) => a * b }.sum /
      math.sqrt(v.map(x => x * x).sum)
    assert(cos > 0.999, s"recovered direction off the planted axis: cos=$cos")
    assert(v(0) >= 0.0, "sign canonicalization: pos-0 component non-negative")
    val eig = pc.head.getDouble(3)
    assert(eig > 3.5 && eig < 4.5, s"Rayleigh estimate off planted variance 4: $eig")
    // unit-norm output
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)

    // partition invariance: the quantized sums are order-independent
    val again = Similarity.principalComponent(embs.repartition(7), iters = 3, dim = d)
      .collect().sortBy(_.getInt(0)).map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(again.toSeq == pc.map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq,
      "pca must be bitwise partition-invariant")

    // degenerate: empty corpus → empty frame, not a crash
    val empty = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    assert(Similarity.principalComponent(empty, dim = 0).count() == 0)

    // whitening audit over the same planted corpus: nearly all centered
    // energy lives along the planted axis, projections sit at ±2, and
    // the residual is the jitter floor
    val wa = Similarity.whitenAudit(embs, iters = 3, dim = d).collect()
    assert(wa.length == n)
    val anisotropy = wa.map(r => r.getDouble(1) * r.getDouble(1)).sum /
      wa.map(_.getDouble(2)).sum
    assert(anisotropy > 0.95, s"planted axis must dominate: $anisotropy")
    wa.foreach { r =>
      assert(math.abs(math.abs(r.getDouble(1)) - 2.0) < 0.1,
        s"projection off the planted ±2: ${r.getDouble(1)}")
      assert(r.getDouble(3) >= -1e-9 && r.getDouble(3) < 0.1,
        s"residual must be the small jitter energy: ${r.getDouble(3)}")
    }
  }

  test("sqAudit: two-level dims reconstruct exactly; mid-range error is IEEE-exact") {
    // the plain-Scala twin of the operator's per-element chain (the
    // RetrievalSpec idiom): replicate the exact IEEE expression and
    // assert bitwise equality, not tolerance
    def eqOf(x: Double, mn: Double, mx: Double): Long = {
      val code = if (mx > mn)
        math.min(math.max(math.floor((x - mn) * 255.0 / (mx - mn)), 0.0), 255.0)
      else 0.0
      val recon = mn + code * (mx - mn) / 255.0
      math.floor((x - recon) * (x - recon) * 1048576.0).toLong
    }
    // four unit basis vectors + one unit mid vector: every dimension's
    // corpus range is [0, 1], basis components hit the range endpoints
    // (exact reconstruction), the mid vector's 0.5 lands between codes
    val embs = ((0L until 4L).map(i =>
      i -> Array.tabulate(4)(j => if (j == i) 1.0 else 0.0)) :+
      (9L -> Array.fill(4)(0.5))).toDF("vec_id", "embedding")
    val out = Similarity.sqAudit(embs, dim = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 5)
    (0L until 4L).foreach { i =>
      assert(out(i) == ((0L, 0L)), s"endpoint components must round-trip: ${out(i)}")
    }
    val e05 = eqOf(0.5, 0.0, 1.0)
    assert(e05 > 0L, "a mid-range component must carry quantization error")
    assert(out(9L) == ((4L * e05, e05)), s"hand chain mismatch: ${out(9L)} vs ${4L * e05}")

    // per-dimension error is bounded by one code step
    val stepEq = math.floor((1.0 / 255.0) * (1.0 / 255.0) * 1048576.0).toLong
    assert(e05 <= stepEq)

    // degenerate: empty corpus → empty sheet, not a crash
    assert(Similarity.sqAudit(Seq.empty[(Long, Array[Double])]
      .toDF("vec_id", "embedding"), dim = 0).isEmpty)
  }

  test("sqAudit: 64 B/vector buys strictly lower distortion than PQ's 4 B (the size trade)") {
    val e = Tables.embeddings(spark, sf001)
    val sqErr = Similarity.sqAudit(e, dim = 64)
      .agg(sum(col("dist_q"))).head.getLong(0) / 1048576.0
    val cb = Similarity.pqTrain(e, m = 4, ksub = 8, iters = 2, dim = 64)
    // PQ assignment distance IS its reconstruction error (code → centroid)
    val pqErr = Similarity.pqEncode(e, cb, m = 4, dim = 64)
      .agg(sum(col("dist_q"))).head.getLong(0) / (16384.0 * 16384.0)
    assert(sqErr < pqErr / 10.0,
      s"SQ8 at 16x the bytes must cut distortion by >10x: sq=$sqErr pq=$pqErr")
  }

  test("cluster-balanced sample: √mass quotas per cell, md5-rank execution, determinism") {
    // three axis-aligned clusters of very different mass: 16/4/1
    // vectors hugging e0/e1/e2 — argmax-cosine assignment to the axis
    // centroids is unambiguous by construction
    def near(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(3)(0.0f); v(axis) = 1.0f
      v((axis + 1) % 3) = 0.001f * (i + 1); v
    }
    val vecs = ((0 until 16).map(i => (10L + i, near(0, i))) ++
      (0 until 4).map(i => (30L + i, near(1, i))) ++
      Seq((40L, near(2, 0)))).toDF("vec_id", "embedding")
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

    // cell masses 16/4/1 -> √mass weights 4:2:1 -> budget 7 allocates
    // exactly 4/2/1 (no remainder seats)
    val kept = Similarity.clusterBalancedSample(vecs, cents, budget = 7L, dim = 3)
      .collect()
    assert(kept.length == 7)
    val perCell = kept.groupBy(_.getAs[Long]("cell"))
      .view.mapValues(_.length).toMap
    assert(perCell == Map(0L -> 4, 1L -> 2, 2L -> 1),
      s"√mass flattening: dominant cell damped, singleton kept whole — got $perCell")

    // the kept prefix is the md5 order within each cell, recomputed in
    // plain Scala (the executeSqrtAllocation contract)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expect0 = (0 until 16).map(i => 10L + i)
      .sortBy(id => (md5hex("graft" + id), id)).take(4).toSet
    assert(kept.filter(_.getAs[Long]("cell") == 0L)
      .map(_.getAs[Long]("vec_id")).toSet == expect0)

    // pure function of the data; budget ≥ corpus keeps everything
    val re = Similarity.clusterBalancedSample(vecs.repartition(5), cents,
      budget = 7L, dim = 3).collect().map(_.getAs[Long]("vec_id")).toSet
    assert(re == kept.map(_.getAs[Long]("vec_id")).toSet)
    assert(Similarity.clusterBalancedSample(vecs, cents, budget = 100L,
      dim = 3).count() == 21L, "quota > cell size keeps the whole cell")

    // the acceptance sheet pins to the executed sample and SHOWS the
    // flattening the √-mass allocation claims
    val sheet = Similarity.clusterBalancedSampleSheet(vecs, cents,
      budget = 7L, dim = 3)
      .collect().map(r => r.getAs[Long]("cell") -> r).toMap
    assert(sheet.keySet == Set(0L, 1L, 2L))
    assert(sheet.view.mapValues(_.getAs[Long]("n_kept")).toMap ==
      perCell.map { case (c, n) => c -> n.toLong },
      "sheet n_kept must equal the actual per-cell sample counts")
    // dominant cell damped: kept share 4/7 < natural 16/21;
    // singleton boosted: 1/7 > 1/21
    val dom = sheet(0L); val rare = sheet(2L)
    assert(dom.getAs[Long]("kept_share_q") < dom.getAs[Long]("natural_share_q"))
    assert(rare.getAs[Long]("kept_share_q") > rare.getAs[Long]("natural_share_q"))
    assert(sheet.values.forall(r => r.getAs[Long]("n_kept") ==
      math.min(r.getAs[Long]("alloc"), r.getAs[Long]("n_vecs"))))
  }

  test("incremental cluster sample: frozen quotas, residual-seat admission, unallocated cells reject") {
    // 4-d axis clusters. STANDING: 16 near e0, 4 near e1, 1 near e2
    // (nothing near e3). NEW batch: 50/51 near e2, 60 near e0, 70
    // near e3. Budget 14 -> standing quotas 8/4/2 exactly (s_q 4:2:1).
    def near(axis: Int, i: Int): Array[Float] = {
      val v = Array.fill(4)(0.0f); v(axis) = 1.0f
      v((axis + 1) % 4) = 0.001f * (i + 1); v
    }
    val standing = ((0 until 16).map(i => (10L + i, near(0, i), false)) ++
      (0 until 4).map(i => (30L + i, near(1, i), false)) ++
      Seq((40L, near(2, 0), false)))
    val batch = Seq((50L, near(2, 1), true), (51L, near(2, 2), true),
      (60L, near(0, 20), true), (70L, near(3, 0), true))
    val all = (standing ++ batch).toDF("vec_id", "embedding", "is_new")
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)), (3L, Array(0.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.incrementalClusterSample(all, "is_new", cents,
      budget = 14L, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("kept")))).toMap
    assert(out.keySet == Set(50L, 51L, 60L, 70L),
      "the disposition covers exactly the batch")
    // cell 0 (alloc 8, standing 16): over quota -> nothing admitted
    assert(out(60L) == ((0L, 0L)))
    // cell 3: no standing member -> no quota row -> rejected
    assert(out(70L) == ((3L, 0L)))
    // cell 2 (alloc 2, standing 1): ONE residual seat -> the md5-first
    // of {50, 51} keeps, the other rejects
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val first = Seq(50L, 51L).sortBy(id => (md5hex("graft" + id), id)).head
    assert(out(first)._2 == 1L && out(Seq(50L, 51L).find(_ != first).get)._2 == 0L,
      s"residual admission must follow the md5 order: $out")
    // pure function of the data
    val re = Similarity.incrementalClusterSample(all.repartition(5), "is_new",
      cents, budget = 14L, dim = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("cell"), r.getAs[Long]("kept")))).toMap
    assert(re == out)
  }
}
