package graft

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

class TextFunctionsSpec extends SparkSpec with Checkers {
  import spark.implicits._

  test("tokenCount counts whitespace tokens, ignoring empties") {
    val df = Seq("  a b   c ", "", "one").toDF("text")
      .select(TF.tokenCount(col("text")).as("n"))
    assert(df.as[Int].collect().toSeq == Seq(3, 0, 1))
  }

  test("fnv1a64 is deterministic and spreads") {
    assert(TF.fnv1a64("abc") == TF.fnv1a64("abc"))
    assert(TF.fnv1a64("abc") != TF.fnv1a64("abd"))
  }

  test("simhash: identical docs identical, similar docs close, disjoint docs far") {
    val a = ("the quick brown fox jumps over the lazy dog " * 5).split(" ").toSeq
    val b = a.updated(3, "cat") // one token changed
    val c = Seq("completely", "different", "vocabulary", "entirely", "unrelated")
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(TF.simhash64(a) == TF.simhash64(a))
    assert(ham(TF.simhash64(a), TF.simhash64(b)) <= 16)
    assert(ham(TF.simhash64(a), TF.simhash64(c)) > 16)
  }

  test("minhashSigScala: null below n tokens; deterministic; est-jaccard tracks overlap") {
    assert(TF.minhashSigScala("one two", 3, 32) == null)
    val doc = (1 to 200).map(i => s"tok$i").mkString(" ")
    val near = (1 to 200).map(i => if (i == 100) "CHANGED" else s"tok$i").mkString(" ")
    val far = (1 to 200).map(i => s"other$i").mkString(" ")
    val s1 = TF.minhashSigScala(doc, 3, 128)
    val s2 = TF.minhashSigScala(near, 3, 128)
    val s3 = TF.minhashSigScala(far, 3, 128)
    assert(s1.toSeq == TF.minhashSigScala(doc, 3, 128).toSeq)
    def est(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(s1, s2) > 0.9) // 3 of 198 shingles differ
    assert(est(s1, s3) < 0.1)
  }

  test("minhash signature estimate tracks true Jaccard within ±0.15 (128 perms)") {
    // construct doc pairs with controlled shingle overlap and compare the
    // signature-match estimate against exact Jaccard of the shingle sets
    val rnd = new scala.util.Random(9)
    for (sharedFrac <- Seq(0.9, 0.7, 0.5, 0.3)) {
      val total = 400
      val shared = (1 to (total * sharedFrac).toInt).map(i => s"s$i")
      val a = shared ++ (1 to total - shared.length).map(i => s"a$i${rnd.nextInt(100)}")
      val b = shared ++ (1 to total - shared.length).map(i => s"b$i${rnd.nextInt(100)}")
      val docA = a.mkString(" ")
      val docB = b.mkString(" ")
      val sa = TF.shinglesScala(docA, 3).toSet
      val sb = TF.shinglesScala(docB, 3).toSet
      val trueJ = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val ha = TF.minhashSigScala(docA, 3, 128)
      val hb = TF.minhashSigScala(docB, 3, 128)
      val est = ha.zip(hb).count { case (x, y) => x == y }.toDouble / ha.length
      assert(math.abs(est - trueJ) < 0.15,
        f"sharedFrac=$sharedFrac: est=$est%.3f vs true=$trueJ%.3f")
    }
  }

  test("shinglesScala emits distinct in-order n-grams") {
    assert(TF.shinglesScala("a b c d", 3).toSeq == Seq("a b c", "b c d"))
    assert(TF.shinglesScala("a b a b a b", 2).toSeq == Seq("a b", "b a"))
    assert(TF.shinglesScala("a b", 3).isEmpty)
  }

  test("langIdScala picks the marker-dominant language") {
    assert(TF.langIdScala("the cat and the dog is that it for this") == "en")
    assert(TF.langIdScala("el que la de los las una por") == "es")
    assert(TF.langIdScala("zzz qqq xxx") == "und")
  }

  test("fingerprint is order-sensitive and deterministic (column form)") {
    val fps = Seq("a b c", "a b c", "c b a").toDF("text")
      .select(TF.fingerprint(col("text")).as("fp")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("qualityScore lands in [0,1] for arbitrary text") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val q = Seq(s).toDF("text")
        .select(TF.qualityScore(col("text")).as("q")).as[Double].head()
      q >= 0.0 && q <= 1.0
    }, minTests = 15)
  }

  test("textProfile is total and bounded on arbitrary unicode") {
    check(Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.oneOf("你好", "世界", "héllo", "καλή", "🙂🙃", "a b", "\t\n", ""))).map(_.mkString(" "))) { s =>
      val (q, nTok, nBpe, _) = TF.textProfile(s)
      q >= 0.0 && q <= 1.0 && nTok >= 0 && nBpe >= 0 &&
        TF.textProfile(s) == TF.textProfile(s) // deterministic
    }, minTests = 30)
  }

  test("text stack handles CJK / accents / emoji without loss") {
    assert(TF.textProfile("你好 世界")._2 == 2) // whitespace tokens
    val sh = TF.shinglesScala("héllo wörld foo bar", 3)
    assert(sh.toSeq == Seq("héllo wörld foo", "wörld foo bar"))
    // minhash of identical unicode text is identical; different text differs
    val a = TF.minhashSigScala("你好 世界 再见 朋友", 2, 16).toSeq
    val b = TF.minhashSigScala("你好 世界 再见 朋友", 2, 16).toSeq
    val c = TF.minhashSigScala("völlig andere wörter hier", 2, 16).toSeq
    assert(a == b && a != c)
  }
}
