package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** [[Phrases.bigramLift]] decisions pinned on a hand fixture: the
  * planted collocation fires, an equally-frequent-but-independent pair
  * stays quiet, the exact quantized lift, the minCount gate, the
  * discount's effect, map-side pair assembly on short/empty/null docs,
  * and the guard rails. q91 oracles the arithmetic on driver data —
  * where uniform synthetic soup rarely clears 2×, so the flag's fire
  * path lives here. */
class PhrasesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val Q = 1048576L

  test("planted collocation fires, independent pair does not, exact lift") {
    // 8 docs each containing "new york" (always adjacent), padded with
    // filler so N is known; "red" and "car" each appear 8 times but
    // adjacent only twice — frequent words, weak association.
    val docs =
      (0 until 8).map(i => s"new york f$i a b") ++
      (0 until 2).map(i => s"red car g$i a b") ++
      (0 until 6).map(i => s"red h$i car x$i y")
    val out = Phrases.bigramLift(docs.toDF("text"), "text",
        minCount = 2, discount = 1, num = 2L, den = 1L)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        ((r.getAs[Long]("pair_cnt"), r.getAs[Long]("cnt1"), r.getAs[Long]("cnt2"),
          r.getAs[Long]("lift_q"), r.getAs[Long]("is_phrase")))).toMap

    val n = docs.map(_.split("\\s+").length).sum.toLong
    // "new york": 8 adjacent of 8/8 occurrences -> lift (8-1)*N/64, fires
    assert(out(("new", "york")) == ((8L, 8L, 8L, (8L - 1L) * Q * n / 64L, 1L)))
    assert(out(("new", "york"))._4 > 2L * Q)
    // "red car": 2 adjacent of 8x8 -> lift (2-1)*N/64 ~ N/64 < 2x, quiet
    assert(out(("red", "car")) == ((2L, 8L, 8L, (2L - 1L) * Q * n / 64L, 0L)))
    assert(out(("red", "car"))._4 < 2L * Q)
    // singleton pairs gated by minCount=2
    assert(!out.contains(("a", "b")) || out(("a", "b"))._1 >= 2L)
    assert(!out.keys.exists(_._1.startsWith("f")), "filler bigrams below minCount")
  }

  test("short, empty, and null docs contribute nothing; guards hold") {
    val docs = Seq(Some("solo"), Some(""), None, Some("pair here"), Some("pair here"))
    val out = Phrases.bigramLift(docs.toDF("text"), "text",
      minCount = 2, discount = 1).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == Set(("pair", "here")))
    intercept[IllegalArgumentException] {
      Phrases.bigramLift(docs.toDF("text"), "text", minCount = 1, discount = 1)
    }
    intercept[IllegalArgumentException] {
      Phrases.bigramLift(docs.toDF("text"), "text", num = 0L)
    }
  }

  test("bpePairStats counts frequency-weighted char pairs; BPE's argmax is the top row") {
    // "abab" x3 contributes a-b twice and b-a once per occurrence;
    // "ab" x2 adds a-b each; "Cd" folds to "cd" (casing convention)
    // joining doc2's "cd"; "x" is pairless -> a-b 8, b-a 3, c-d 2
    val docs = Seq(Some("abab abab abab ab ab Cd"), Some("cd x"), None)
    val rows = Phrases.bpePairStats(docs.toDF("text"), "text", k = 10)
      .collect().map(r => (r.getAs[String]("c1"), r.getAs[String]("c2")) ->
        r.getAs[Long]("pair_count")).toMap
    assert(rows == Map(("a", "b") -> 8L, ("b", "a") -> 3L, ("c", "d") -> 2L))

    // the argmax — the merge BPE would perform — is the first row of
    // the total (pair_count DESC, c1, c2) order
    val top = Phrases.bpePairStats(docs.toDF("text"), "text", k = 1).collect()
    assert(top.length == 1 &&
      top.head.getAs[String]("c1") == "a" && top.head.getAs[String]("c2") == "b")

    // k cuts on the total order: ties on pair_count break by (c1, c2)
    val tied = Phrases.bpePairStats(
      Seq("xy pq xy pq").toDF("text"), "text", k = 1).collect()
    assert(tied.head.getAs[String]("c1") == "p", "tie must break lexicographically")

    intercept[IllegalArgumentException] {
      Phrases.bpePairStats(docs.toDF("text"), "text", k = 0)
    }
  }

  test("bpeMergeDelta applies the argmax merge incrementally and equals the monolithic recount") {
    // wc: ab:2, cab:1, xy:1. Char pairs: (a,b)=3 (argmax), (c,a)=1, (x,y)=1.
    // Merging (a,b): "ab" fuses whole (no pairs left), "cab" -> (c, ab).
    // Post-merge sheet: (c,ab)=1, (x,y)=1 — (a,b) and (c,a) vanish, the
    // fused symbol appears as a NEW 2-char symbol; count-1 tie breaks
    // lexicographically on c1 ("c" < "x").
    val docs = Seq(Some("ab ab cab xy"), None)
    val rows = Phrases.bpeMergeDelta(docs.toDF("text"), "text", k = 10)
      .collect().map(r => (r.getAs[String]("c1"), r.getAs[String]("c2")) ->
        r.getAs[Long]("pair_count"))
    assert(rows.toMap == Map(("c", "ab") -> 1L, ("x", "y") -> 1L))
    assert(rows.head._1 == (("c", "ab")), "ties must cut on the (c1, c2) total order")

    // greedy left-to-right scan: "aaa" under merge (a,a) yields [aa],a —
    // ONE fused pair member, not two overlapping merges
    val greedy = Phrases.bpeMergeDelta(Seq("aaa aa").toDF("text"), "text", k = 10)
      .collect().map(r => (r.getAs[String]("c1"), r.getAs[String]("c2")) ->
        r.getAs[Long]("pair_count")).toMap
    assert(greedy == Map(("aa", "a") -> 1L))

    intercept[IllegalArgumentException] {
      Phrases.bpeMergeDelta(docs.toDF("text"), "text", k = 0)
    }
  }

  test("bpeEncode learns rank-ordered merges and encodes documents (hand-computed)") {
    // Vocab: ababc(2), abc(1), xy(1). Merge replay:
    //  1. pairs ab=5, bc=3, ba=2, xy=1      -> fuse (a,b)    [ababc -> (ab)(ab)c]
    //  2. pairs (ab,c)=3, (ab,ab)=2, xy=1   -> fuse (ab,c)   [ababc -> (ab)(abc)]
    //  3. pairs (ab,abc)=2, xy=1            -> fuse (ab,abc) [ababc -> (ababc)]
    //  4. pairs xy=1                        -> fuse (x,y)
    //  5. no pairs left -> exhausted (early stop is exercised)
    val docs = Seq((1L, "ababc ababc"), (2L, "abc"), (3L, "xy"))
      .toDF("doc_id", "text")
    val at5 = Phrases.bpeEncode(docs, "text", numMerges = 5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(at5(1L) == ((2L, 10L, 2L)), "both ababc tokens collapse to one symbol")
    assert(at5(2L) == ((1L, 3L, 1L)))
    assert(at5(3L) == ((1L, 2L, 1L)))

    // Stopping after merge 2 leaves ababc as 2 symbols and xy unfused —
    // the encode must apply EXACTLY the learned prefix, in rank order.
    val at2 = Phrases.bpeEncode(docs, "text", numMerges = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(at2(1L) == ((2L, 10L, 4L)))
    assert(at2(2L) == ((1L, 3L, 1L)))
    assert(at2(3L) == ((1L, 2L, 2L)))

    intercept[IllegalArgumentException] {
      Phrases.bpeEncode(docs, "text", numMerges = 0)
    }
    intercept[IllegalArgumentException] {
      Phrases.bpeEncode(docs, "text", numMerges = 9)
    }
  }

  test("bpeEncode enforces the marker contract and is total on null text") {
    // The marker-range word drops from vocab AND token stream (the
    // enforced contract); the null-text doc reports zeros.
    val docs = Seq((1L, Some("abz ab ab")), (2L, None), (3L, Some("ab")))
      .toDF("doc_id", "text")
    val out = Phrases.bpeEncode(docs, "text", numMerges = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 4L, 2L)), "the \\u0001-carrying word is excluded")
    assert(out(2L) == ((0L, 0L, 0L)))
    assert(out(3L) == ((1L, 2L, 1L)))
  }

  test("fertility sheet aggregates the encode per (source, lang) with exact ratios") {
    // same corpus as the hand-computed encode test, tagged into groups
    val docs = Seq(
      (1L, "ababc ababc", "web", "en"),
      (2L, "abc", "web", "en"),
      (3L, "xy", "books", "fr"))
      .toDF("doc_id", "text", "source", "lang")
    val sheet = Phrases.bpeFertilitySheet(docs, "text", numMerges = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7)))).toMap
    // web/en: docs 1+2 -> words 3, chars 13, symbols 3 (each doc's
    // tokens collapse to single symbols at 5 merges)
    assert(sheet(("web", "en")) == ((2L, 3L, 13L, 3L, 1.0, 13.0 / 3.0)))
    assert(sheet(("books", "fr")) == ((1L, 1L, 2L, 1L, 1.0, 2.0)))

    // a zero-word group (null text) reports NULL ratios, not inf
    val withNull = Seq((1L, Some("ab ab"), "w", "en"), (2L, None, "empty", "xx"))
      .toDF("doc_id", "text", "source", "lang")
    val row = Phrases.bpeFertilitySheet(withNull, "text", numMerges = 1)
      .filter($"source" === "empty").head
    assert(row.getLong(2) == 1L && row.getLong(3) == 0L &&
      row.isNullAt(6) && row.isNullAt(7))
  }

  test("unigramLmRound: hand-computed Viterbi-EM on a tiny corpus") {
    // Corpus "aa aa b": words aa(cnt 2, len 2), b(1).
    // Seed census (occurrence-weighted): a = 4, aa = 2, b = 1; total 7.
    // score_q = cnt·2^20 // 7 → a 599186, aa 299593, b 149796;
    // cost = 22 − bits(score_q+1)   → a 2,      aa 3,      b 4.
    // DP "aa": pos2 candidates a+a = 4 vs aa = 3 → ["aa"]; "b" → ["b"].
    // EM: aa = 2, b = 1, a = 0 (kept: single-char coverage); total 3.
    // em_score_q: aa 2·2^20//3 = 699050, b 349525, a 0.
    val d1 = Seq((1L, "aa aa b")).toDF("doc_id", "text")
    val r1 = Phrases.unigramLmRound(d1, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r1 == Map(
      "aa" -> ((2L, 2L, 699050L)),
      "b" -> ((1L, 1L, 349525L)),
      "a" -> ((4L, 0L, 0L))))

    // Corpus "abab abab ab": words abab(2), ab(1). Seed: a 5, b 5,
    // ab 5, ba 2, aba 2, bab 2, abab 2; total 23. Costs: 5-count
    // pieces → 4, 2-count → 5. DP "abab": ab+ab = 8 vs aba|abab
    // paths → abab wins at 5 (whole-word piece beats pairs);
    // "ab" → ["ab"] (4 < a+b = 8). EM: abab 2, ab 1; singles pruned
    // to em 0 but kept. em_total 3.
    val d2 = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val r2 = Phrases.unigramLmRound(d2, "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(r2 == Map(
      "abab" -> ((2L, 2L, 699050L)),
      "ab" -> ((5L, 1L, 349525L)),
      "a" -> ((5L, 0L, 0L)),
      "b" -> ((5L, 0L, 0L))))
    // unused multi-char seeds (ba, aba, bab) are pruned
    assert(!r2.contains("ba") && !r2.contains("aba") && !r2.contains("bab"))

    // null/empty text is total; words truncate at maxWordLen
    val d3 = Seq((1L, Some("abcdefghij")), (2L, None))
      .toDF("doc_id", "text")
    val r3 = Phrases.unigramLmRound(d3, "text", maxWordLen = 4)
      .collect().map(_.getString(0)).toSet
    assert(r3.contains("abcd") && !r3.exists(_.length > 4))
  }

  test("unigramEncode: hand-computed per-doc piece budget") {
    // Corpus doc1 "aa aa b", doc2 "aaaaa". Seed census: a=9, aa=6,
    // aaa=3, aaaa=2, b=1; total 21. score_q = cnt·2^20//21 → costs
    // 22−bits(+1): a 3, aa 3, aaa 4, aaaa 5, b 6.
    // DP: "aa"→["aa"] (3 < a+a=6); "b"→["b"];
    // "aaaaa": pos5 candidates (8,4,a) (7,3,aa) (7,2,aaa) (8,1,aaaa)
    //   → min (7,2) → aaa, pred 2 → then pos2 → aa: ["aaa","aa"], 2
    //   pieces (the tie at cost 7 exercises the start-ASC tie-break).
    // doc1: 3 words, 5 chars, 3 pieces; doc2: 1 word, 5 chars, 2.
    val d = Seq((1L, Some("aa aa b")), (2L, Some("aaaaa")), (3L, None))
      .toDF("doc_id", "text")
    val enc = Phrases.unigramEncode(d, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(enc(1L) == ((3L, 5L, 3L)))
    assert(enc(2L) == ((1L, 5L, 2L)))
    assert(enc(3L) == ((0L, 0L, 0L)), "null text reports zeros")

    // encode counts the model's domain: words truncate at maxWordLen
    val t = Seq((1L, "abcdefghij")).toDF("doc_id", "text")
    val row = Phrases.unigramEncode(t, "text", maxWordLen = 4).collect().head
    assert(row.getLong(1) == 1L && row.getLong(2) == 4L && row.getLong(3) == 1L)
  }

  test("lmQualityBuckets: hand-computed CCNet-style head/middle/tail split") {
    // Corpus d1 "aa aa b", d2 "aaaaa", d3 "aa", d4 null. Seed census:
    // a=11, aa=7, aaa=3, aaaa=2, b=1 (total 24) → costs a 3, aa 3,
    // aaa 4, aaaa 5, b 6. Word paths: aa→[aa] cost 3; b→[b] 6;
    // aaaaa→[aaa, aa] cost 7, 2 pieces.
    // d1: cost 12, 3 pieces → ppl 12·2^20//3 = 4194304
    // d2: cost 7, 2 pieces  → ppl 3670016
    // d3: cost 3, 1 piece   → ppl 3145728
    // cuts over {3145728, 3670016, 4194304}: p33 = rank ceil(.99)=1 →
    // 3145728; p67 = rank ceil(2.01)=3 → 4194304. So d3 head, d2 and
    // d1 middle (both ≤ p67), d4 empty — a p67 at the max exercises
    // the ≤ boundary.
    val d = Seq((1L, Some("aa aa b")), (2L, Some("aaaaa")),
      (3L, Some("aa")), (4L, None)).toDF("doc_id", "text")
    val r = Phrases.lmQualityBuckets(d, "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getString(4)))).toMap
    assert(r(1L) == ((3L, 12L, 4194304L, "middle")))
    assert(r(2L) == ((2L, 7L, 3670016L, "middle")))
    assert(r(3L) == ((1L, 3L, 3145728L, "head")))
    assert(r(4L) == ((0L, 0L, 0L, "empty")))

    // all-empty corpus: one NULL cuts row, everything buckets 'empty'
    val e = Seq((1L, None: Option[String]), (2L, None)).toDF("doc_id", "text")
    val re = Phrases.lmQualityBuckets(e, "text").collect()
    assert(re.length == 2 && re.forall(_.getString(4) == "empty"))
  }

  test("lmQualityBucketsByLang: single-language degeneracy is bitwise q125 plus the constant lang_id") {
    // one lang label + threshold 0 → every doc (null text included,
    // prior-only) mints the same class, so the per-lang chain — vocab,
    // DP, cuts and all — must collapse to the corpus-global q125 sheet
    val docs = ((1 to 36).map { i =>
      val t = if (i % 3 == 0) s"w${i % 6} rare oddity qqq plain run"
              else s"w${i % 6} plain run of common text"
      (i.toLong, Option(t), "en")
    } :+ ((40L, None: Option[String], "en")))
      .toDF("doc_id", "text", "lang")
    val byLang = Phrases.lmQualityBucketsByLang(docs, marginThresholdQ = 0L)
      .collect()
    assert(byLang.map(_.getAs[String]("lang_id")).toSet == Set("en"))
    val got = byLang.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_pieces"), r.getAs[Long]("cost_q"),
        r.getAs[Long]("ppl_q"), r.getAs[String]("bucket")))).toMap
    val want = Phrases.lmQualityBuckets(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == want, "single-lang per-lang sheet must be bitwise q125")
  }

  test("lmQualityBucketsByLang: the minority language splits within itself where the global model tails it") {
    // the Wenzek §4.3 regime the operator exists for: a global LM
    // scores the minority alphabet's docs mostly on "is not the
    // majority language" — its whole slice lands in 'tail' — while
    // the per-language model ranks them against EACH OTHER. Disjoint
    // alphabets make the minted labels exact (the LangIdSpec regime);
    // within each language, clean docs repeat the language's common
    // words and noisy docs use rare long strings of the same alphabet.
    val docs = (
      (1 to 18).map(i => (i.toLong, "ava vava avva ava vava avva", "ava")) ++
      (19 to 30).map(i => (i.toLong, "ava vava avva aavv ava vava", "ava")) ++
      (31 to 38).map(i => (i.toLong, "ozo zozo ozzo ozo zozo ozzo", "ozo")) ++
      (39 to 42).map(i => (i.toLong, "ozzozzoo zozozozz oozozzoz ozo", "ozo"))
    ).toDF("doc_id", "text", "lang")
    val byLang = Phrases.lmQualityBucketsByLang(docs, marginThresholdQ = 0L)
      .collect()
    // minted labels are exact on the disjoint alphabets
    assert(byLang.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("lang_id")).toMap.forall { case (id, l) =>
        l == (if (id <= 30) "ava" else "ozo") }, "minted labels exact")
    val ozoByLang = byLang.filter(_.getAs[String]("lang_id") == "ozo")
    assert(ozoByLang.filter(r => r.getAs[Long]("doc_id") <= 38)
      .forall(_.getAs[String]("bucket") == "head"),
      "per-lang: the minority's clean docs read head under their OWN model")
    assert(ozoByLang.map(_.getAs[String]("bucket")).toSet.size >= 2,
      "per-lang: the minority slice splits within itself")
    val globalOzo = Phrases.lmQualityBuckets(docs, "text")
      .collect().filter(_.getLong(0) > 30L)
    assert(globalOzo.count(_.getString(4) == "tail") > globalOzo.length / 2,
      "global: the minority slice predominantly tails — language " +
        "mismatch read as bad quality")
    assert(!globalOzo.exists(_.getString(4) == "head"),
      "global: no minority doc can reach head under the majority's model")
  }

  test("bigramLmQuality: word order matters — scrambled common words score worse than ordered ones") {
    // 20 docs share one fixed phrase (its bigrams are common); 2 docs
    // use the SAME WORDS scrambled (every bigram rare). A unigram
    // filter cannot tell these apart — the bigram model must.
    val ordered = "the quick brown fox jumps over the lazy dog"
    val scrambled = Seq("dog the over fox lazy quick jumps brown the",
      "lazy fox the dog brown jumps quick over the")
    val docs = ((1L to 20L).map(i => (i, Some(ordered))) ++
      scrambled.zipWithIndex.map { case (t, j) => (100L + j, Some(t)) } ++
      Seq((200L, Some("single")), (201L, None))).toDF("doc_id", "text")
    val out = Phrases.bigramLmQuality(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(3), r.getString(4)))).toMap
    assert(out.size == 24, "one row per doc")
    assert(out(200L)._3 == "empty" && out(201L)._3 == "empty",
      "sub-bigram and null docs bucket 'empty'")
    val orderedPpl = out(1L)._2
    assert((1L to 20L).forall(out(_)._2 == orderedPpl), "identical docs score identically")
    Seq(100L, 101L).foreach { i =>
      assert(out(i)._2 > orderedPpl,
        s"scrambled doc $i must be less predictable: ${out(i)._2} vs $orderedPpl")
      assert(out(i)._3 == "tail", s"scrambled doc $i: ${out(i)}")
    }
    assert(out(1L)._3 == "head", "the dominant ordered phrase is the corpus's cleanest text")
    assert(out(1L)._1 == 8L, "n_bigrams = tokens - 1")

    // per-doc costs recompute from hand counts under the plain-Scala
    // log2q twin (the RetrievalSpec idiom): all 22 ordered-phrase
    // bigram slots (8 per doc x 20 docs + scrambled contributions)
    def log2q(x0: Long): Long = {
      val bits = 64 - java.lang.Long.numberOfLeadingZeros(x0)
      var m = if (bits > 21) x0 >> (bits - 21) else x0 << (21 - bits)
      var f = 0L
      for (_ <- 1 to 6) {
        val q = (m * m) / 1048576L
        if (q >= 2097152L) { m = q / 2; f = f * 2 + 1 } else { m = q; f = f * 2 }
      }
      (bits - 1).toLong * 64 + f
    }
    val allTexts = (1L to 20L).map(_ => ordered) ++ scrambled :+ "single"
    val toks = allTexts.map(_.split(" ").toSeq)
    val bigrams = toks.flatMap(ts => ts.zip(ts.tail))
    val c2 = bigrams.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val c1 = bigrams.groupBy(_._1).map { case (w, xs) => w -> xs.size.toLong }
    val v = toks.flatten.distinct.size.toLong
    def docCost(ts: Seq[String]): Long =
      ts.zip(ts.tail).map { case (a, b) => log2q(c1(a) + v) - log2q(c2((a, b)) + 1) }.sum
    val expectedOrdered = docCost(ordered.split(" ").toSeq)
    val got = Phrases.bigramLmQuality(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == expectedOrdered,
      s"hand-computed cost mismatch: ${got(1L)} vs $expectedOrdered")
    assert(got(100L) == docCost(scrambled.head.split(" ").toSeq))
  }

  test("oovAudit: hand-computed OOV rates against a controlled standing alphabet") {
    // split membership is md5-derived — discover it, then construct
    // texts by role (the RetrievalSpec idiom)
    val ids = (1L to 40L)
    val buckets = Sampling.withSplitBucket(ids.toDF("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (newIds, oldIds) = ids.partition(buckets(_) < 500)
    assert(newIds.size >= 4 && oldIds.nonEmpty, s"fixture needs both splits")
    val n = newIds.take(4)
    // standing alphabet: exactly {a, b, c} (plus nothing else)
    val docs = (
      oldIds.map(i => (i, Some("abc cab ba"))) ++ Seq(
        (n(0), Some("ab ba cab")),       // 3 words, 0 OOV
        (n(1), Some("ab zz ba qq")),     // 4 words, 2 OOV (z, q unseen)
        (n(2), Some("zzz")),             // 1 word, 1 OOV
        (n(3), None)) ++                 // null text → zeros
      newIds.drop(4).map(i => (i, Some("abc")))
    ).toDF("doc_id", "text")
    val out = Phrases.oovAudit(docs, newPermille = 500)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == newIds.toSet, "one row per NEW doc, standing docs absent")
    assert(out(n(0)) == ((3L, 0L, 0L)))
    assert(out(n(1)) == ((4L, 2L, 500L)))
    assert(out(n(2)) == ((1L, 1L, 1000L)))
    assert(out(n(3)) == ((0L, 0L, 0L)))
    // the audit names exactly the words the UNK fallback would price:
    // an all-in-vocab doc has oov_permille 0, a pure-OOV doc 1000
    newIds.drop(4).foreach(i => assert(out(i) == ((1L, 0L, 0L))))

    // empty standing corpus: everything is OOV (vocab is empty)
    val allNew = Phrases.oovAudit(
      docs.filter(org.apache.spark.sql.functions.col("doc_id").isin(newIds: _*)),
      newPermille = 1000)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(allNew(n(0)) == 1000L && allNew(n(3)) == 0L)
  }
}
