package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame

/** The dedup artifact store's one invariant: feeding an operator
  * precomputed artifact tables must change NOTHING about its output —
  * store-backed and derive-from-text forms are the same operator. Drift
  * here would silently decouple the dashboard numbers from the live
  * algorithms, so every artifact-accepting operator is asserted
  * row-identical both ways on real testdata.
  */
class ArtifactStoreSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, Sf0001)

  // in-memory store build (the SparkEntry store is the same three tables
  // written to parquet; parquet round-tripping of longs/strings/arrays is
  // covered by the oracle gate)
  private lazy val art = Some(Dedup.Artifacts(
    sigs = Dedup.sigTable(docs).persist(),
    shingles = Dedup.shingleTable(docs).persist(),
    winsPos = Dedup.windowTable(docs).persist()))

  private def same(a: DataFrame, b: DataFrame, what: String): Unit = {
    val cols = a.columns.toSeq
    assert(cols == b.columns.toSeq, s"$what: schema drift")
    val (ra, rb) = (a.orderBy(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq,
      b.orderBy(cols.map(org.apache.spark.sql.functions.col): _*).collect().toSeq)
    assert(ra == rb, s"$what: store-backed output differs from live (${ra.length} vs ${rb.length} rows)")
  }

  test("minhashCandidates: store-backed == derived, with and without verify") {
    same(Dedup.minhashCandidates(docs, minEstJaccard = 0.4),
      Dedup.minhashCandidates(docs, minEstJaccard = 0.4, art = art), "candidates")
    same(Dedup.minhashCandidates(docs, minEstJaccard = 0.4, verifyJaccard = Some(0.9)),
      Dedup.minhashCandidates(docs, minEstJaccard = 0.4, verifyJaccard = Some(0.9), art = art),
      "candidates+verify")
  }

  test("transitive drops / deduped / ngram / containment: store-backed == derived") {
    same(Dedup.minhashTransitiveDrops(docs, minEstJaccard = 0.4, verifyJaccard = Some(0.9)),
      Dedup.minhashTransitiveDrops(docs, minEstJaccard = 0.4, verifyJaccard = Some(0.9), art = art),
      "transitive drops")
    same(Dedup.minhashDeduped(docs, minEstJaccard = 0.4, verifyJaccard = Some(0.9)),
      Dedup.minhashDeduped(docs, minEstJaccard = 0.4, verifyJaccard = Some(0.9), art = art),
      "deduped")
    same(Dedup.ngramJaccard(docs, minJaccard = 0.7, minEstJaccard = 0.35),
      Dedup.ngramJaccard(docs, minJaccard = 0.7, minEstJaccard = 0.35, art = art), "ngram")
    same(Dedup.containmentPairs(docs, minContain = 0.9),
      Dedup.containmentPairs(docs, minContain = 0.9, art = art), "containment")
  }

  test("store manifest: parameter drift between build and consumer throws") {
    val root = java.nio.file.Files.createTempDirectory("graft_manifest").toFile.getAbsolutePath
    val built = Dedup.StoreParams(version = 1, n = 3, perms = 32, width = 40,
      selection = "md5-nibble0", censusThr = 400L)
    Dedup.StoreManifest.write(root, built)
    Dedup.StoreManifest.check(root, built) // exact match passes
    // every single-parameter drift must fail LOUDLY, not return wrong rows
    val drifted = Seq(
      built.copy(n = 5), built.copy(perms = 64), built.copy(width = 50),
      built.copy(selection = "kr-mod16"), built.copy(censusThr = 500L),
      built.copy(version = 2))
    drifted.foreach { p =>
      val e = intercept[IllegalStateException](Dedup.StoreManifest.check(root, p))
      assert(e.getMessage.contains("parameter drift"), e.getMessage)
    }
    // a store with no manifest is unverifiable — also a loud failure
    val bare = java.nio.file.Files.createTempDirectory("graft_nomanifest").toFile.getAbsolutePath
    val e2 = intercept[IllegalStateException](Dedup.StoreManifest.check(bare, built))
    assert(e2.getMessage.contains("no manifest"))
  }

  test("substring family: store-backed == derived") {
    same(Dedup.substringDupPairs(docs, width = 40, minShared = 2),
      Dedup.substringDupPairs(docs, width = 40, minShared = 2, art = art), "substring pairs")
    same(Dedup.substringDupMass(docs, width = 40),
      Dedup.substringDupMass(docs, width = 40, art = art), "substring mass")
    same(Dedup.substringClean(docs, width = 40),
      Dedup.substringClean(docs, width = 40, art = art), "substring clean")
    same(Dedup.exactJaccardPairs(docs, minJaccard = 0.7),
      Dedup.exactJaccardPairs(docs, minJaccard = 0.7, art = art), "exact jaccard")
  }
}
