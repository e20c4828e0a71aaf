package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, TestSpark}

/** q72's Gopher-style repetition stats, re-derived per document in plain
  * Scala (independent of both Spark SQL and the DuckDB oracle) and
  * compared field-by-field. `split("\\s+", -1)` mirrors Spark's
  * limit=-1 semantics (trailing empty strings kept). */
class RepetitionStatsSpec extends AnyFunSuite {
  import TestSpark._

  private def expectedStats(text: String): (Long, Long, Long, Long, Long) = {
    val toks = text.split("\\s+", -1).toSeq
    val tokCounts = toks.groupBy(identity).map(_._2.size.toLong)
    val grams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    val gramCounts = grams.groupBy(identity).map(_._2.size.toLong)
    (toks.size.toLong, tokCounts.size.toLong, tokCounts.max,
      if (gramCounts.isEmpty) 0L else gramCounts.max, grams.size.toLong)
  }

  test("q72 matches a plain-Scala recomputation on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q72_repetition_stats")(spark, sf001).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (nTok, nDist, topTok, topGram, nGrams) = expectedStats(docs(id))
      assert(r.getAs[Long]("n_tokens") == nTok, s"doc $id n_tokens")
      assert(r.getAs[Long]("n_distinct") == nDist, s"doc $id n_distinct")
      assert(r.getAs[Long]("top_token_n") == topTok, s"doc $id top_token_n")
      assert(r.getAs[Long]("top_bigram_n") == topGram, s"doc $id top_bigram_n")
      assert(r.getAs[Long]("n_bigrams") == nGrams, s"doc $id n_bigrams")
      val expectFlag =
        if (50 * topGram > 9 * nGrams || 5 * topTok > nTok) 1L else 0L
      assert(r.getAs[Long]("repetitive") == expectFlag, s"doc $id repetitive")
    }
  }

  private def expectedIntraStats(text: String): (Long, Long, Long) = {
    val toks = text.split("\\s+", -1).toSeq
    var prev: Option[String] = None
    var run = 0L
    var best = 0L
    toks.foreach { x =>
      run = if (prev.contains(x)) run + 1 else 1
      prev = Some(x)
      best = math.max(best, run)
    }
    val g3 = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
    (best, g3.size.toLong, g3.distinct.size.toLong)
  }

  test("q73 matches a plain-Scala recomputation on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q73_intra_doc_repetition")(spark, sf001).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (maxRun, n3, nd3) = expectedIntraStats(docs(id))
      assert(r.getAs[Long]("max_token_run") == maxRun, s"doc $id max_token_run")
      assert(r.getAs[Long]("n_3grams") == n3, s"doc $id n_3grams")
      assert(r.getAs[Long]("n_distinct_3grams") == nd3, s"doc $id n_distinct_3grams")
      val expectFlag = if (10 * (n3 - nd3) > 3 * n3 || maxRun >= 4) 1L else 0L
      assert(r.getAs[Long]("intra_repetitive") == expectFlag, s"doc $id intra_repetitive")
    }
  }

  test("q73 plans as a single zero-shuffle projection") {
    val df = SparkEntry.queries("q73_intra_doc_repetition")(spark, sf001)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), "q73 must not shuffle")
    assert(!physical.contains("Join"), "q73 must not join")
  }

  test("q74 reason codes match a plain-Scala recomputation of the rule chain on sf0.001") {
    val stopwords = graft.functions.TextFunctions.Stopwords.toSet
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id", "lang", "text").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val rows = SparkEntry.queries("q74_filter_audit")(spark, sf001).collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (lang, text) = docs(id)
      val (nTok, _, topTok, topGram, nGrams) = expectedStats(text)
      val (maxRun, n3, nd3) = expectedIntraStats(text)
      val stopCnt = text.split("\\s+", -1).count(t => stopwords(t.toLowerCase))
      val expected =
        if (nTok < 20) "too_short"
        else if (lang != "en") "non_english"
        else if (50 * topGram > 9 * nGrams || 5 * topTok > nTok ||
                 maxRun >= 4 || 10 * (n3 - nd3) > 3 * n3) "repetitive"
        else if (50 * stopCnt < nTok) "low_stopword"
        else "kept"
      assert(r.getAs[String]("reason") == expected, s"doc $id reason")
      assert(r.getAs[Long]("kept") == (if (expected == "kept") 1L else 0L), s"doc $id kept")
      assert(r.getAs[Long]("n_tokens") == nTok, s"doc $id n_tokens")
    }
  }

  test("q74 exercises multiple reason codes on sf0.01") {
    val reasons = SparkEntry.queries("q74_filter_audit")(spark, sf01)
      .select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(reasons.contains("kept"))
    assert(reasons.size >= 4, s"only $reasons fired")
  }

  test("q72 structural invariants hold on sf0.01") {
    val rows = SparkEntry.queries("q72_repetition_stats")(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("n_distinct") <= nTok)
      assert(r.getAs[Long]("top_token_n") <= nTok)
      val nGrams = r.getAs[Long]("n_bigrams")
      assert(nGrams == math.max(nTok - 1, 0L))
      assert(r.getAs[Long]("top_bigram_n") <= nGrams)
    }
  }
}
