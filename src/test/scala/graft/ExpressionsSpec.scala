package graft

import graft.functions.{Expressions, VectorOps}
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine_sim expression matches hand computation, float and double") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(Expressions.cosineSim(col("a"), col("b"))).as[Double].head()
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - want) < 1e-12)
    val gotD = df.select(Expressions.cosineSim(
      col("a").cast("array<double>"), col("b"))).as[Double].head()
    assert(math.abs(gotD - want) < 1e-12)
  }

  test("cosine_sim: zero vector yields 0.0, not NaN") {
    val df = Seq((Seq(0f, 0f), Seq(1f, 2f))).toDF("a", "b")
    assert(df.select(Expressions.cosineSim(col("a"), col("b"))).as[Double].head() == 0.0)
  }

  test("cosine_sim stays inside whole-stage codegen") {
    // over a range source — a local relation would be constant-folded away
    val df = spark.range(10)
      .select(array(col("id").cast("float"), lit(1f)).as("a"),
        array(lit(2f), col("id").cast("float")).as("b"))
      .select(Expressions.cosineSim(col("a"), col("b")).as("c"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in simple-mode plans
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.count() == 10) // and the generated code actually compiles/runs
  }

  test("cosine_sim agrees with scala reference on 200 random vector pairs") {
    val rnd = new scala.util.Random(42)
    val pairs = (0 until 200).map { _ =>
      val d = 1 + rnd.nextInt(32)
      (Seq.fill(d)(rnd.nextFloat() * 10 - 5), Seq.fill(d)(rnd.nextFloat() * 10 - 5))
    }
    val got = pairs.toDF("a", "b")
      .select(Expressions.cosineSim(col("a"), col("b"))).as[Double].collect()
    pairs.zip(got).foreach { case ((a, b), g) =>
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val den = math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum)
      val want = if (den > 0) dot / den else 0.0
      assert(math.abs(g - want) < 1e-9, s"a=$a b=$b")
    }
  }

  test("registered SQL functions: cosine_sim and ulid callable from SQL") {
    GraftExtensions.register(spark)
    val c = spark.sql(
      "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    val ids = spark.range(100).selectExpr("ulid() AS id").as[String].collect()
    assert(ids.forall(_.length == 26))
    assert(ids.distinct.length == 100)
  }

  test("ulid column expression is nondeterministic but well-formed per row") {
    val ids = spark.range(50).select(graft.functions.Ulid.ulid().as("id"))
      .as[String].collect()
    assert(ids.forall(id => id.length == 26 &&
      id.forall("0123456789ABCDEFGHJKMNPQRSTVWXYZ".contains(_))))
  }

  test("krWindowPositions stays inside whole-stage codegen") {
    val df = spark.range(10)
      .select(concat(lit("abcdefghij"), col("id").cast("string")).as("text"))
      .select(Expressions.krWindowPositions(col("text"), 4).as("p"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    assert(df.count() == 10) // and the generated code actually compiles/runs
  }

  test("krWindowPositions: rolling positions == direct per-window fold (incl. unicode)") {
    import graft.functions.KrHash
    val rnd = new scala.util.Random(42)
    val texts = Seq(
      "",                                   // shorter than width
      "abcdefgh",                           // exactly one window (w=8)
      (1 to 300).map(i => s"w$i").mkString(" "),
      "héllo wörld " * 30,                  // non-ASCII BMP
      "ab😀cd " * 40,             // surrogate pairs (non-BMP)
      rnd.alphanumeric.take(500).mkString)
    for (t <- texts; w <- Seq(8, 40)) {
      // driver-side spec form: direct fold over every codepoint window
      val cps = t.codePoints.toArray
      val expect = (0 to cps.length - w).filter { j =>
        KrHash.windowHash(new String(cps, j, w)) % KrHash.SelectMod == 0L
      }.map(_ + 1)
      val got = Seq(t).toDF("text")
        .select(Expressions.krWindowPositions(col("text"), w).as("p"))
        .as[Seq[Int]].head()
      assert(got == expect, s"w=$w text=${t.take(30)}…")
    }
  }

  test("kr window selection: ~1/16 rate, same ballpark as the md5 spec twin") {
    val docs = Tables.documents(spark, Sf0001)
    val total = docs.where(length(col("text")) >= 40)
      .select(sum(length(col("text")) - 40 + 1)).as[Long].head()
    val kr = graft.operators.Dedup.windowTable(docs).count()
    val md5n = graft.operators.Dedup.windowTableMd5(docs).count()
    val (rKr, rMd5) = (kr.toDouble / total, md5n.toDouble / total)
    assert(rKr > 1.0 / 32 && rKr < 1.0 / 8, s"kr rate $rKr far from 1/16")
    assert(math.abs(rKr - rMd5) < 1.0 / 32,
      s"kr rate $rKr vs md5 twin $rMd5 diverge beyond sampling noise")
  }

  test("kr windows are content-defined: shared span selects identical windows at any offset") {
    val span = (1 to 60).map(i => s"shared$i").mkString(" ")
    val d = Seq(1L -> ("prefix one two three " + span),
      2L -> ("a different and much longer lead-in before the copy " + span))
      .toDF("doc_id", "text")
    val w = graft.operators.Dedup.windowTable(d, 40)
      .select("doc_id", "win").as[(Long, String)].collect()
    val w1 = w.filter(_._1 == 1L).map(_._2).toSet
    val w2 = w.filter(_._1 == 2L).map(_._2).toSet
    // every span-interior window is selected on both sides or neither
    val interior = (w1 ++ w2).filter(span.contains)
    assert(interior.nonEmpty && interior.forall(x => w1(x) == w2(x)))
  }
}
