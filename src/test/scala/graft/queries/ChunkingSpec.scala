package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** q79's within-document chunking, re-derived per document in plain
  * Scala (stride-24 windows of 32 tokens, last chunk short) and
  * compared row-by-row, plus the zero-shuffle plan assertion. */
class ChunkingSpec extends AnyFunSuite {
  import TestSpark._

  test("q79 chunks match a plain-Scala recomputation on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q79_document_chunking")(spark, sf001).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
        ((r.getAs[String]("chunk_text"), r.getAs[Long]("n_chunk_tokens")))).toMap
    val expected = docs.flatMap { case (id, text) =>
      val t = text.split("\\s+", -1).toSeq
      Iterator.from(0).map(_ * 24).takeWhile(_ < t.size).zipWithIndex.map {
        case (start, idx) =>
          val chunk = t.slice(start, start + 32)
          (id, idx.toLong) -> ((chunk.mkString(" "), chunk.size.toLong))
      }
    }
    assert(rows.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(rows(k) == v, s"chunk $k") }
    // overlap property, asserted explicitly: consecutive chunks of the
    // same doc share their seam — chunk k's tokens from index 24 equal
    // chunk k+1's first tokens (8 when chunk k is full, fewer only when
    // chunk k is itself the short tail)
    val byDoc = rows.toSeq.groupBy(_._1._1)
      .map { case (id, cs) => id -> cs.sortBy(_._1._2).map(_._2._1.split(" ", -1).toSeq) }
    val multiDocs = byDoc.filter(_._2.size > 1)
    assert(multiDocs.nonEmpty, "corpus should produce at least one multi-chunk doc")
    multiDocs.foreach { case (id, chunks) =>
      chunks.sliding(2).zipWithIndex.foreach { case (Seq(a, b), k) =>
        val seam = a.drop(24)
        assert(seam.nonEmpty && seam == b.take(seam.size),
          s"doc $id chunks $k/${k + 1} must share the ${seam.size}-token seam")
      }
    }
  }

  test("q80 rare-token stats match a plain-Scala recomputation on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\s+", -1).toSeq).toMap
    val tf = docs.values.flatten.groupBy(identity).map { case (w, occ) => w -> occ.size.toLong }
    val total = tf.values.sum
    val vocab = tf.size.toLong
    val rare = tf.filter { case (_, c) => c * vocab < total }.keySet
    val rows = SparkEntry.queries("q80_rare_token_stats")(spark, sf001).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val t = docs(id)
      val nRare = t.count(rare).toLong
      assert(r.getAs[Long]("n_tokens") == t.size.toLong, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_rare") == nRare, s"doc $id n_rare")
      assert(r.getAs[Long]("rare_heavy") == (if (4 * nRare > t.size) 1L else 0L), s"doc $id flag")
    }
  }

  test("q80 rare_heavy flag fires on sf0.01") {
    val flagged = SparkEntry.queries("q80_rare_token_stats")(spark, sf01)
      .filter(org.apache.spark.sql.functions.col("rare_heavy") === 1L).count()
    assert(flagged > 0)
  }

  test("chunkDocuments edge cases: stride>len, empty doc, width==stride, width<stride") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c"),              // 3 tokens, shorter than any stride below
      (2L, ""),                   // empty text → ONE empty chunk (split yields [""])
      (3L, "t1 t2 t3 t4 t5 t6")). // 6 tokens
      toDF("doc_id", "text")
    def rows(width: Int, stride: Int) =
      graft.operators.Chunking.chunkDocuments(docs, width, stride)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx")) ->
          ((r.getAs[String]("chunk_text"), r.getAs[Long]("n_chunk_tokens"))))
        .toMap

    // stride (8) > len: every doc is a single chunk of its full text
    val single = rows(width = 8, stride = 8)
    assert(single == Map(
      (1L, 0L) -> (("a b c", 3L)),
      (2L, 0L) -> (("", 1L)),
      (3L, 0L) -> (("t1 t2 t3 t4 t5 t6", 6L))))

    // NULL text behaves like empty text: the doc stays represented
    val withNull = graft.operators.Chunking.chunkDocuments(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text"), width = 8, stride = 8)
      .collect()
    assert(withNull.length == 1 && withNull.head.getAs[String]("chunk_text") == "")

    // width == stride: exact partition of the token stream, no overlap
    val part = rows(width = 2, stride = 2)
    assert(part((3L, 0L)) == (("t1 t2", 2L)))
    assert(part((3L, 1L)) == (("t3 t4", 2L)))
    assert(part((3L, 2L)) == (("t5 t6", 2L)))
    assert(part((1L, 0L)) == (("a b", 2L)) && part((1L, 1L)) == (("c", 1L)))

    // width < stride: documented token-skipping semantics (gap of 1)
    val gap = rows(width = 2, stride = 3)
    assert(gap((3L, 0L)) == (("t1 t2", 2L)))
    assert(gap((3L, 1L)) == (("t4 t5", 2L))) // t3 skipped by construction

    // overlap (stride < width): last chunk short, seam preserved
    val overlap = rows(width = 4, stride = 2)
    assert(overlap((3L, 0L)) == (("t1 t2 t3 t4", 4L)))
    assert(overlap((3L, 1L)) == (("t3 t4 t5 t6", 4L)))
    assert(overlap((3L, 2L)) == (("t5 t6", 2L)))

    // invalid parameters are rejected eagerly
    intercept[IllegalArgumentException](rows(width = 0, stride = 2))
    intercept[IllegalArgumentException](rows(width = 2, stride = 0))
  }

  test("q79 plans as a single zero-shuffle generate") {
    val df = SparkEntry.queries("q79_document_chunking")(spark, sf001)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), "q79 must not shuffle")
    assert(!physical.contains("Window"), "q79 must not window")
  }
}
