package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class SequencePackSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Driver-side reference: the literal global scan the operator's
    * two-level prefix sum must reproduce bitwise. */
  private def reference(rows: Seq[(Long, Long)], cap: Long): Map[Long, (Long, Long, Long)] = {
    var cum = 0L
    rows.sortBy(_._1).map { case (id, n) =>
      val first = cum / cap
      val last = (cum + math.max(n, 1L) - 1L) / cap
      cum += n
      id -> ((first, last, last - first + 1L))
    }.toMap
  }

  private def run(rows: Seq[(Long, Long)], cap: Long, bucketWidth: Long) =
    SequencePack.packAssignments(rows.toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
        cap, bucketWidth)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  test("two-level prefix sum matches the global scan on sparse ids, zero-token docs and boundary hits") {
    val rnd = new scala.util.Random(11)
    // sparse non-contiguous ids; token counts include 0 and exact
    // capacity multiples so pack boundaries land on document edges
    val ids = rnd.shuffle((1L to 5000L).toList).take(400).sorted
    val rows = ids.map(id => id -> (rnd.nextInt(8) match {
      case 0 => 0L            // empty doc
      case 1 => 37L           // == capacity
      case 2 => 74L           // spans exactly 2 packs from a boundary
      case _ => rnd.nextInt(90).toLong
    }))
    val got = run(rows, cap = 37L, bucketWidth = 100L)
    assert(got == reference(rows, 37L))
  }

  test("bucket width does not change the assignment") {
    val rows = (1L to 200L).map(i => i -> (i % 13))
    val a = run(rows, cap = 50L, bucketWidth = 7L)
    val b = run(rows, cap = 50L, bucketWidth = 100000L) // one bucket: the global scan itself
    assert(a == b)
  }

  test("shardManifest partitions the corpus and counts boundary crossers exactly") {
    // cap 10, 2 packs/shard. Docs in id order: 15 + 3 + 10 + 2 tokens
    // (cum starts 0, 15, 18, 28):
    //   doc 1: packs 0-1 (span 2), shard 0
    //   doc 2: pack 1, shard 0
    //   doc 3: packs 1-2 (span 2), starts in shard 0, ends in pack 2
    //     = shard 1 -> the one boundary CROSSER
    //   doc 4: pack 2, shard 1
    val rows = Seq((1L, 15L), (2L, 3L), (3L, 10L), (4L, 2L))
    val m = SequencePack.shardManifest(rows.toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", capacity = 10L, packsPerShard = 2L)
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("max_span"), r.getAs[Long]("boundary_crossers")))).toMap
    // reference: cum=0 -> d1 packs 0..1 (span 2); cum=15 -> d2 packs
    // 1..1; cum=18 -> d3 packs 1..2 (span 2, crosses shard 0->1);
    // cum=28 -> d4 packs 2..2 (shard 1).
    assert(m == Map(
      0L -> ((3L, 28L, 2L, 1L)),
      1L -> ((1L, 2L, 1L, 0L))))
    assert(m.values.map(_._1).sum == rows.size,
      "every doc counts exactly once — the manifest partitions the corpus")
  }

  test("null ids are dropped; packs_spanned is always >= 1 and pack_first is monotone in id order") {
    val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, 5L), (null, 99L), (2L, 0L), (3L, 200L))
      .toDF("doc_id", "n_tokens")
    val rs = SequencePack.packAssignments(withNull, "doc_id", "n_tokens", 64L, 2L)
      .orderBy("doc_id").collect()
    assert(rs.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rs.forall(_.getLong(4) >= 1L))
    assert(rs.map(_.getLong(2)).toSeq == rs.map(_.getLong(2)).toSeq.sorted)
  }

  test("interleaved shard manifest: two-level kernel == local scan; every shard carries the mix") {
    // the MixingSpec 3:1 fixture: alloc 60/20 at budget 80, every
    // appearance 100 tokens — pack at 1000 tokens (10 appearances),
    // 2 packs per shard -> 4 shards of 20 appearances
    val items = ((1 to 9).map(i => (s"a$i", "a", 100L)) ++
      Seq(("b1", "b", 100L))).toDF("doc_id", "source", "n_tokens")
    val manifest = Mixing.interleaveManifest(items, "doc_id", "source",
      "n_tokens", budget = 80L)
    val sheet = SequencePack.interleavedShardManifest(manifest, "source",
      capacity = 1000L, packsPerShard = 2L)
      .collect().map(r => r.getAs[Long]("shard") ->
        ((r.getAs[Long]("n_appearances"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("max_span"), r.getAs[Long]("boundary_crossers"),
          r.getAs[Long]("n_sources")))).toMap

    // local reference: global prefix scan over the stride order
    val ordered = manifest.collect().sortBy(r => (r.getAs[Long]("pos_key"),
      r.getAs[String]("source"), r.getAs[Long]("appearance")))
    var cum = 0L
    val ref = ordered.map { r =>
      val n = r.getAs[Long]("n_tokens")
      val first = cum / 1000L
      val last = (cum + math.max(n, 1L) - 1L) / 1000L
      cum += n
      (r.getAs[String]("source"), n, first / 2L, last / 2L, last - first + 1L)
    }
    val refSheet = ref.groupBy(_._3).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_._2).sum,
        rs.map(_._5).max, rs.count(x => x._4 != x._3).toLong,
        rs.map(_._1).distinct.length.toLong)
    }.toMap
    assert(sheet == refSheet,
      s"two-level kernel must equal the global scan: $sheet vs $refSheet")

    // totals partition the manifest; 100-token appearances at cap
    // 1000 never cross a boundary
    assert(sheet.values.map(_._1).sum == 80L)
    assert(sheet.values.forall(_._4 == 0L))
    // THE interleave reading: every shard carries BOTH sources —
    // per-shard loss estimates full-mixture loss
    assert(sheet.values.forall(_._5 == 2L),
      s"every shard must carry the full mix: $sheet")
    // a doc-id-ordered pack of the same rows would give single-source
    // shards (the contrast the n_sources column exists to show):
    // 60 a-appearances then 20 b's -> shards 0..2 pure 'a', shard 3 pure 'b'
    // (sanity-check the contrast locally, no operator call needed)
    val contrast = (Seq.fill(60)("a") ++ Seq.fill(20)("b")).grouped(20)
      .map(_.distinct.length).toSeq
    assert(contrast == Seq(1, 1, 1, 1))
  }

  test("phased shard manifest: per-phase restart == the flat kernel run on each phase alone; nPhases=1 is bitwise flat") {
    import org.apache.spark.sql.functions._
    def census(df: org.apache.spark.sql.DataFrame,
        keyCols: Seq[String]): Map[Seq[Long], (Long, Long, Long, Long, Long)] =
      df.collect().map(r => keyCols.map(r.getAs[Long](_)) ->
        ((r.getAs[Long]("n_appearances"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("max_span"), r.getAs[Long]("boundary_crossers"),
          r.getAs[Long]("n_sources")))).toMap

    // a 2-phase curriculum whose phases allocate differently
    val items = ((1 to 6).map(i => (s"a$i", "a", 0L, 100L)) ++
      (1 to 2).map(i => (s"b$i", "b", 0L, 100L)) ++
      (1 to 4).map(i => (s"c$i", "a", 1L, 100L)) ++
      (1 to 4).map(i => (s"d$i", "b", 1L, 100L)))
      .toDF("doc_id", "source", "phase", "n_tokens")
    val manifest = Dedup.materialize(Mixing.phasedInterleave(
      items, "doc_id", "source", "n_tokens", "phase", nPhases = 2,
      budget = 24L))
    val phased = census(SequencePack.phasedShardManifest(manifest,
      "source", capacity = 300L, packsPerShard = 2L, nPhases = 2),
      Seq("phase", "shard"))
    assert(phased.nonEmpty && phased.keySet.map(_.head) == Set(0L, 1L),
      "both phases shard")
    // the semantic contract: each phase's census is EXACTLY what the
    // flat kernel produces on that phase's slice alone — shard ids
    // restart, nothing leaks across the boundary
    val slice = 4611686018427387904L / 2
    for (p <- 0L to 1L) {
      val alone = census(SequencePack.interleavedShardManifest(
        manifest.filter(expr(s"pos_key div $slice") === p),
        "source", capacity = 300L, packsPerShard = 2L), Seq("shard"))
        .map { case (k, v) => (Seq(p) ++ k) -> v }
      assert(phased.filter(_._1.head == p) == alone,
        s"phase $p must pack as if alone")
    }

    // nPhases = 1 degeneracy: bitwise the phase-agnostic kernel plus
    // the constant phase 0
    val flat = Dedup.materialize(Mixing.interleaveManifest(
      items.select(col("doc_id"), col("source"), col("n_tokens")),
      "doc_id", "source", "n_tokens", budget = 24L))
    val one = census(SequencePack.phasedShardManifest(flat, "source",
      capacity = 300L, packsPerShard = 2L, nPhases = 1),
      Seq("phase", "shard"))
    val agnostic = census(SequencePack.interleavedShardManifest(flat,
      "source", capacity = 300L, packsPerShard = 2L), Seq("shard"))
      .map { case (k, v) => (Seq(0L) ++ k) -> v }
    assert(one == agnostic, "nPhases=1 must be bitwise the flat kernel")
  }
}
