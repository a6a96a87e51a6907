package graft

import graft.operators.{Dedup, Multimodal, Sampling}
import org.apache.spark.sql.functions._

/** Every operator must degrade to an empty result on empty input — not
  * throw from a head() on nothing, divide by a missing count, or loop
  * forever waiting for convergence that never starts.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptyPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.exactNormalized(emptyDocs).count() == 0)
    assert(Dedup.minhashCandidates(emptyDocs).count() == 0)
    assert(Dedup.simhashPairs(emptyDocs).count() == 0)
    assert(Dedup.exactJaccardPairs(emptyDocs).count() == 0)
    assert(Dedup.minhashDeduped(emptyDocs).count() == 0)
  }

  test("clusters terminates immediately on an empty pair graph") {
    assert(Dedup.clusters(emptyPairs).count() == 0)
  }

  test("round-6 dedup/graph/similarity tiers return empty on empty input") {
    assert(Dedup.substringDupPairs(emptyDocs).count() == 0)
    assert(Dedup.substringDupMass(emptyDocs).count() == 0)
    assert(Dedup.containmentPairs(emptyDocs).count() == 0)
    assert(graft.operators.Graph.triangleCounts(emptyDocs).count() == 0)
    val e = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(graft.operators.Similarity.hammingTopK(e, probeId = 0L).count() == 0)
    assert(graft.operators.Similarity.hammingProbeSetTopK(e, e).count() == 0)
  }

  test("round-9 incremental/streaming tiers degrade on empty input") {
    // empty increment against a real corpus window table
    val docs = Tables.documents(spark, Sf0001)
    assert(Dedup.substringMassIncremental(
      Dedup.windowCensus(Dedup.windowTable(docs)), emptyDocs).count() == 0)
    // empty corpus census: increment's dup mass is purely internal
    val emptyCensus = Seq.empty[(String, Long)].toDF("win", "n_docs")
    val selfOnly = Dedup.substringMassIncremental(emptyCensus, docs)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.substringDupMass(docs).as[(Long, Long)].collect().toMap
    assert(selfOnly == full, "with no standing corpus, incremental == full self mass")
    // an EMPTY streaming micro-batch must write its (empty) partition and
    // drop nothing, not throw
    val tmp = java.nio.file.Files.createTempDirectory("emptybatch")
    val idx = s"$tmp/index"; val acc = s"$tmp/accepted"
    Dedup.seedStreamStores(docs, idx, acc, Seq("doc_id"), n = 3, perms = 32)
    Dedup.minhashStreamBatch(emptyDocs, 0L, idx, acc, Seq("doc_id"),
      3, 32, 8, 0.4, Some(0.9))
    assert(spark.read.parquet(acc).count() == 0)
  }

  test("retrieval/chunking/semantic tiers return empty on empty input") {
    import graft.operators.{Corpus, Similarity}
    assert(Corpus.bm25TopK(emptyDocs, Seq("a", "b")).count() == 0)
    assert(Corpus.bpePairs(emptyDocs).count() == 0)
    assert(Corpus.pmiBigrams(emptyDocs).count() == 0)
    assert(Corpus.overlapChunks(emptyDocs).count() == 0)
    val e = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.semDedup(e).count() == 0)
    assert(Similarity.hardNegatives(e, e).count() == 0)
    assert(Dedup.substringClean(emptyDocs).count() == 0)
  }

  test("dynamic partition overwrite with an empty update touches nothing") {
    val dir = java.nio.file.Files.createTempDirectory("partow_empty").toString + "/t"
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "part", "v")
    base.write.partitionBy("part").parquet(dir)
    graft.operators.Layout.overwritePartitions(
      base.where(lit(false)), dir, "part")
    assert(spark.read.parquet(dir).count() == 2)
  }

  test("quantile sketch of an empty frame: empty rollup, NaN estimate guarded") {
    import graft.functions.QuantileSketch
    val d = Seq.empty[Double].toDF("v")
    val skUdaf = udaf(QuantileSketch.sketch, org.apache.spark.sql.Encoders.scalaDouble)
    val packed = d.agg(skUdaf(col("v"))).as[Array[Long]].head()
    assert(packed.isEmpty)
    assert(QuantileSketch.totalCount(packed) == 0L)
    assert(QuantileSketch.estimateQuantile(packed, 0.5).isNaN)
  }

  test("sampling of an empty frame is empty") {
    val d = Seq.empty[(Long, String)].toDF("doc_id", "lang")
    assert(Sampling.stratified(d, "lang", "doc_id", Map("en" -> 0.5)).count() == 0)
    assert(Sampling.mix(Seq((d, 0.5), (d, 0.9)), "doc_id").count() == 0)
  }

  test("multimodal metadata extraction of an empty media table is empty") {
    val m = Seq.empty[(Long, Int, Array[Byte])].toDF("media_id", "kind_id", "payload")
    assert(Multimodal.extractMeta(m).count() == 0)
    assert(Multimodal.sampleFrames(m).count() == 0)
  }

  test("embedding near-dup of an empty table is empty") {
    val e = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDup(e).count() == 0)
  }

  test("corpus ops return empty on an empty corpus") {
    import graft.operators.Corpus
    val d = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Corpus.tfidfTopTerms(d).count() == 0)       // nDocs=0 → no terms, no div
    assert(Corpus.packSequences(d).count() == 0)
    assert(Corpus.shuffledSample(d, "s").count() == 0)
    assert(Corpus.contamination(d, d).count() == 0)
    assert(Corpus.repetitionStats(d).count() == 0)
  }

  test("token sharding and heavy hitters return empty on an empty corpus") {
    import graft.operators.{Corpus, HeavyHitters}
    val d = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Corpus.tokenShard(d).count() == 0)
    // zero total tokens: the n*frac > n_total filter must not emit rows
    // (0 > 0 is false), and the MG aggregate yields an empty candidate set
    assert(HeavyHitters.frequentTokens(d).count() == 0)
  }

  test("scd2Upsert with an empty change set is the identity") {
    import graft.operators.Layout
    val base = Seq((1L, "a", 1L, true)).toDF("k", "v", "version", "is_current")
    val changes = Seq.empty[(Long, String)].toDF("k", "v")
    val out = Layout.scd2Upsert(base, changes, "k")
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(out == Seq((1L, "a", 1L, true)))
  }

  test("quantize of an empty embedding table is empty") {
    import graft.operators.Similarity
    val e = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.quantize(e).count() == 0)
  }

  test("probe-set similarity of an empty probe set is empty") {
    import graft.operators.Similarity
    val e = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f))).toDF("vec_id", "embedding")
    val none = e.where(col("vec_id") < 0)
    assert(Similarity.probeSetSearch(e, none, 0.5).count() == 0)
    assert(Similarity.ivfProbeSetTopK(e, none, k = 3, nlist = 2, nprobe = 2,
      sampleRows = 8).count() == 0)
  }
}
