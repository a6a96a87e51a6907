package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

class CorpusSpec extends SparkSpec with Checkers {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "apple banana apple cherry", "s1", 25L),
    (1L, "banana banana durian", "s1", 20L),
    (2L, "apple cherry cherry cherry", "s1", 26L),
    (3L, "durian elderberry fig grape", "s2", 27L),
    (4L, "fig fig fig grape grape", "s2", 23L)
  ).toDF("doc_id", "text", "source", "n_chars")

  test("bpeTrain: exact hand-computed trajectory, boundary-safe merges, " +
    "early exhaustion") {
    // 2×"abc" + 5×"ab" + 6×"bc": round 1 merges (b,c) n=8; round 2 (a,b)
    // n=5 — and the merged pair "<a><b>" must NOT false-match "abc"'s
    // [a, bc] (a naive space-joined replace would corrupt it here);
    // round 3 (a,bc) n=2; then no pairs remain → the loop exhausts at 3
    // of the 20 budgeted merges
    val bpeDocs = (Seq.fill(2)("abc") ++ Seq.fill(5)("ab") ++ Seq.fill(6)("bc"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Corpus.bpeTrain(bpeDocs, merges = 20)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1, "b", "c", 8L), (2, "a", "b", 5L), (3, "a", "bc", 2L)),
      s"trajectory mismatch: $got")
  }

  test("tfidfTopTerms ranks rarer terms above ubiquitous ones") {
    val top = Corpus.tfidfTopTerms(docs, k = 2)
      .select("doc_id", "term").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 1: 'banana' appears twice and in 2/5 docs; 'durian' once in 2/5 —
    // banana's tf wins; both beat nothing else (doc has only 2 terms)
    assert(top(1L) == Set("banana", "durian"))
    // doc 4: fig (tf 3, df 2) and grape (tf 2, df 2) are its only terms
    assert(top(4L) == Set("fig", "grape"))
    // every doc yields at most k rows
    assert(top.values.forall(_.size <= 2))
  }

  test("tfidfTopTerms: a term in every doc has score 0 and ranks last") {
    val all = Seq(
      (0L, "common rare1 common", "s", 1L),
      (1L, "common rare2", "s", 1L),
      (2L, "common rare3", "s", 1L)).toDF("doc_id", "text", "source", "n_chars")
    val rows = Corpus.tfidfTopTerms(all, k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(rows == Map(0L -> "rare1", 1L -> "rare2", 2L -> "rare3"))
  }

  test("packSequences preserves totals and packs per shard") {
    val packed = Corpus.packSequences(docs, budget = 5)
    val rows = packed.as[(String, Long, Long, Long)].collect()
    // totals preserved: sum over bins == corpus token count per shard
    val tokensByShard = rows.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    assert(tokensByShard == Map("s1" -> 11L, "s2" -> 9L)) // 4+3+4, 4+5
    val docsByShard = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(docsByShard == Map("s1" -> 3L, "s2" -> 2L))
    // bins are consecutive from 0 within each shard
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq)
    }
    // s1 in doc order: toks 4,3,4 with budget 5 -> priors 0,4,7 -> bins 0,0,1
    val s1 = rows.filter(_._1 == "s1").sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq
    assert(s1 == Seq((0L, 2L, 7L), (1L, 1L, 4L)))
  }

  test("lmScore ranks in-distribution text above OOV-heavy text") {
    val train = Seq(
      (100L, "the cat sat on the mat", "s", 1L),
      (101L, "the dog sat on the rug", "s", 1L)).toDF("doc_id", "text", "source", "n_chars")
    val eval = Seq(
      (0L, "the cat sat", "s", 1L),       // all in-vocabulary
      (1L, "zyx qwv jkl", "s", 1L))       // all OOV → add-1 floor
      .toDF("doc_id", "text", "source", "n_chars")
    val rows = Corpus.lmScore(train, eval)
      .as[(Long, Double, Long)].collect().map { case (k, v, n) => k -> (v, n) }.toMap
    assert(rows(0L)._2 == 3 && rows(1L)._2 == 3)
    assert(rows(0L)._1 > rows(1L)._1, s"in-vocab doc must outscore OOV doc: $rows")
    // OOV prob is exactly 1/(n+v): n=12 train tokens, v=7 vocab → ln(1/19)
    assert(math.abs(rows(1L)._1 - BigDecimal(math.log(1.0 / 19)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("packedTexts materializes bins in doc_id order with exact fingerprints") {
    val packed = Corpus.packedTexts(docs, budget = 5)
      .as[(String, Long, Int, Int, String)].collect().toSeq
    // same bin structure as packSequences (s1: bins 0,1; s2: bin 0)
    assert(packed.map(p => (p._1, p._2, p._3)) ==
      Seq(("s1", 0L, 2), ("s1", 1L, 1), ("s2", 0L, 2)))
    // s1 bin 0 = docs 0,1 in id order
    val expected = "apple banana apple cherry banana banana durian"
    assert(packed.head._4 == expected.length)
    assert(packed.head._5 == java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("tokenShard deals round-robin by token rank and balances totals") {
    // token counts: doc0=4, doc1=3, doc2=4, doc3=4, doc4=5
    // rank desc (ties by doc_id): 4(5), 0(4), 2(4), 3(4), 1(3)
    // 2 shards round-robin: shard0 = {4,2,1} = 12 toks, shard1 = {0,3} = 8
    val out = Corpus.tokenShard(docs, nShards = 2)
      .as[(Int, Long, Long)].collect().toSeq
    assert(out == Seq((0, 3L, 12L), (1, 2L, 8L)))
    // totals preserved and balance within one max-document (5 tokens)
    assert(out.map(_._3).sum == 20L)
    assert(out.map(_._3).max - out.map(_._3).min <= 5L)
  }

  test("tokenShardRanged equals the window form exactly") {
    // enough rows to spread over several range partitions, with token ties
    val many = (0L until 500L).map(i =>
      (i, Seq.fill((i % 17 + 1).toInt)("w").mkString(" "), s"s${i % 3}", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val windowForm = Corpus.tokenShard(many, nShards = 8)
      .as[(Int, Long, Long)].collect().toSeq
    val rangedForm = Corpus.tokenShardRanged(many, nShards = 8, parts = 7)
      .as[(Int, Long, Long)].collect().toSeq
    assert(rangedForm == windowForm)
  }

  test("lengthCurriculumRanged equals the ntile window form exactly") {
    // 503 rows: 503 mod 4 = 3, so ntile's first three buckets take one
    // extra row — exercises the uneven-tiling arithmetic, with token ties
    val many = (0L until 503L).map(i =>
      (i, Seq.fill((i % 17 + 1).toInt)("w").mkString(" "), s"s${i % 3}", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val windowForm = Corpus.lengthCurriculum(many, n = 4)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    val rangedForm = Corpus.lengthCurriculumRanged(many, n = 4, parts = 7)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(rangedForm == windowForm)
    // tiling sanity: equal-count buckets within one row of each other
    assert(rangedForm.map(_._2).max - rangedForm.map(_._2).min <= 1)
  }

  test("vocabCoverage: OOV occurrences are exactly the out-of-vocab tokens") {
    // train = docs 0-2 (tokens: apple banana cherry durian); top-3 vocab by
    // (count desc, term asc): cherry(4), apple(3), banana(3) — durian cut.
    val train = docs.where(col("doc_id") <= 2)
    val eval_  = Seq(
      (10L, "apple durian durian kumquat", "s1", 27L),
      (11L, "banana cherry", "s2", 13L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = Corpus.vocabCoverage(train, eval_, v = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    // s1: 4 tokens, OOV = durian×2 + kumquat = 3 → 75%; s2: 2 tokens, 0 OOV
    assert(out == Seq(("s1", 4L, 3L, 75.0), ("s2", 2L, 0L, 0.0)))
  }

  test("vocabCoverage vocab cut is deterministic under frequency ties") {
    // all terms tie at count 1 → the v-cut must take the lexicographically
    // first v terms, every run
    val train = Seq((0L, "delta alpha echo bravo charlie", "s", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val eval_ = Seq((1L, "alpha bravo charlie delta echo", "s", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = Corpus.vocabCoverage(train, eval_, v = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    // vocab = {alpha, bravo, charlie}; OOV = {delta, echo} = 2 of 5
    assert(out == Seq(("s", 5L, 2L, 40.0)))
  }

  test("lengthCurriculum tiers are equal-count and length-monotone") {
    val many = (0L until 100L).map(i =>
      (i, Seq.fill((i % 23 + 1).toInt)("w").mkString(" "), s"s${i % 3}", 1L))
      .toDF("doc_id", "text", "source", "n_chars")
    val out = Corpus.lengthCurriculum(many, n = 4)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._1) == Seq(1, 2, 3, 4))
    assert(out.map(_._2).sum == 100L)
    assert(out.map(_._2).max - out.map(_._2).min <= 1, "ntile equal-count")
    // each tier's max length ≤ next tier's min length (monotone schedule)
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 <= b._3, s"tier ${a._1} max ${a._4} > tier ${b._1} min ${b._3}")
    }
    assert(out.map(_._5).sum == many.select(sum(size(split(col("text"), " "))))
      .as[Long].head())
  }

  test("contamination flags eval docs sharing an n-gram with train, and only those") {
    val train = Seq(
      (100L, "alpha beta gamma delta epsilon", "s", 1L),
      (101L, "zeta eta theta iota kappa", "s", 1L)).toDF("doc_id", "text", "source", "n_chars")
    val eval = Seq(
      (0L, "alpha beta gamma delta others here", "s", 1L),  // shares 'alpha beta gamma delta'
      (1L, "totally unrelated words in this document", "s", 1L),
      (2L, "short doc", "s", 1L)                             // < n tokens: dropped
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = Corpus.contamination(train, eval, n = 4)
      .select("doc_id", "n_hit", "contaminated").as[(Long, Long, Boolean)].collect().toSeq
    assert(out == Seq((0L, 1L, true), (1L, 0L, false)))
    // the eval-broadcast and bloom forms are optimizations, not semantics:
    // identical rows on the same input
    val bcast = Corpus.contaminationBroadcast(train, eval, n = 4)
      .select("doc_id", "n_hit", "contaminated").as[(Long, Long, Boolean)].collect().toSeq
    assert(bcast == out)
    val bloom = Corpus.contaminationBloom(train, eval, n = 4)
      .select("doc_id", "n_hit", "contaminated").as[(Long, Long, Boolean)].collect().toSeq
    assert(bloom == out)
  }

  test("ngramProfile counts the multiset, not the set") {
    import graft.functions.TextFunctions
    // "a b a b a b" -> trigrams: "a b a","b a b","a b a","b a b" = 4 total,
    // 2 distinct, max freq 2
    assert(TextFunctions.ngramProfileScala("a b a b a b", 3) == ((4, 2, 2)))
    assert(TextFunctions.ngramProfileScala("x y", 3) == ((0, 0, 0)))
    assert(TextFunctions.ngramProfileScala(null, 3) == ((0, 0, 0)))
    val rep = Corpus.repetitionStats(
      Seq((0L, "a b a b a b", "s", 1L)).toDF("doc_id", "text", "source", "n_chars"), n = 3)
      .select("n_grams", "rep_ratio", "top_freq_ratio")
      .as[(Long, Double, Double)].head()
    assert(rep == ((4L, 0.5, 0.5)))
  }

  test("ngramProfile properties: total = max(0, tokens-n+1); distinct, maxFreq bounded") {
    import graft.functions.TextFunctions
    val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "x")
    val textGen = Gen.listOf(wordGen).map(_.mkString(" "))
    check(Prop.forAll(textGen, Gen.choose(1, 4)) { (text, n) =>
      val (total, dist, mx) = TextFunctions.ngramProfileScala(text, n)
      val toks = text.split("\\s+").count(_.nonEmpty)
      val expTotal = math.max(0, toks - n + 1)
      total == expTotal &&
        dist <= total && (total == 0 || dist >= 1) &&
        mx <= total && (total == 0 || mx >= 1) &&
        // pigeonhole: dist distinct grams at max frequency mx must cover total
        dist.toLong * mx >= total
    })
  }

  test("packSequences properties: totals preserved, bins dense from 0, budget respected") {
    val docGen = Gen.listOfN(12,
      Gen.zip(Gen.choose(0, 30), Gen.oneOf("s1", "s2", "s3")))
    check(Prop.forAll(docGen, Gen.choose(1L, 40L)) { (docs0, budget0) =>
      // clamp: scalacheck's default shrinker steps outside the generator's
      // range (e.g. -1 tokens, budget 0) — normalize instead of discarding
      val docs = docs0.map { case (n, s) => (math.max(0, n), s) }
      val budget = math.max(1L, budget0)
      val df = docs.zipWithIndex.map { case ((nTok, src), i) =>
        (i.toLong, Seq.fill(nTok)("w").mkString(" "), src, 1L)
      }.toDF("doc_id", "text", "source", "n_chars")
      val rows = Corpus.packSequences(df, budget)
        .as[(String, Long, Long, Long)].collect()
      // reference model: per shard in doc_id order, bin = floor(prior/budget)
      // (bin indices may legitimately SKIP when one doc overflows a bin)
      val expected = docs.zipWithIndex
        .map { case ((n, s), i) => (s, i.toLong, n.toLong) }
        .groupBy(_._1).toSeq.flatMap { case (src, ds) =>
          val sorted = ds.sortBy(_._2)
          val priors = sorted.map(_._3).scanLeft(0L)(_ + _)
          sorted.zip(priors).map { case ((_, _, t), p) => (src, p / budget, t) }
        }
        .groupBy { case (src, bin, _) => (src, bin) }
        .map { case ((src, bin), ts) =>
          (src, bin, ts.size.toLong, ts.map(_._3).sum) }
        .toSet
      rows.toSet == expected
    }, minTests = 25)
  }

  test("shuffledSample is deterministic, salt-sensitive, and a valid prefix") {
    val a = Corpus.shuffledSample(docs, "saltA", n = 3).as[(String, Long)].collect().toSeq
    val a2 = Corpus.shuffledSample(docs, "saltA", n = 3).as[(String, Long)].collect().toSeq
    val b = Corpus.shuffledSample(docs, "saltB", n = 3).as[(String, Long)].collect().toSeq
    assert(a == a2)                        // reproducible across runs
    assert(a.map(_._2) != b.map(_._2))     // salt changes the order
    assert(a.map(_._1) == a.map(_._1).sorted) // ordered by shuffle key
    assert(a.map(_._2).distinct.size == 3) // a permutation prefix, no repeats
  }

  test("boilerplateStrip removes exactly the segments repeated across >= minDf docs") {
    // width=2 segments; "follow us" planted in 3 of 4 docs -> boilerplate;
    // every other segment is unique and must survive.
    val planted = Seq(
      (0L, "alpha beta follow us gamma delta", "s", 1L),
      (1L, "epsilon zeta follow us", "s", 1L),
      (2L, "eta theta follow us iota kappa", "s", 1L),
      (3L, "lambda mu nu xi", "s", 1L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val out = Corpus.boilerplateStrip(planted, width = 2, minDf = 3)
      .as[(Long, Int, Int, String)].collect()
      .map { case (id, k, dr, m) => (id, (k, dr, m)) }.toMap
    // docs 0-2 each drop exactly their one "follow us" segment
    assert(out(0L)._1 == 2 && out(0L)._2 == 1)
    assert(out(1L)._1 == 1 && out(1L)._2 == 1)
    assert(out(2L)._1 == 2 && out(2L)._2 == 1)
    // doc 3 keeps everything
    assert(out(3L)._1 == 2 && out(3L)._2 == 0)
    // the cleaned fingerprint matches the expected reassembly for doc 0
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma delta".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L)._3 == expected)
    // a doc whose every segment is boilerplate fingerprints the empty string
    val allBp = Seq(
      (0L, "spam ham", "s", 1L), (1L, "spam ham", "s", 1L), (2L, "spam ham", "s", 1L)
    ).toDF("doc_id", "text", "source", "n_chars")
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    val bp = Corpus.boilerplateStrip(allBp, width = 2, minDf = 3)
      .as[(Long, Int, Int, String)].collect()
    assert(bp.forall { case (_, k, dr, m) => k == 0 && dr == 1 && m == emptyMd5 })
  }
}
