package graft

import graft.operators.{Corpus, Maintenance, Similarity, TextIndex}
import org.apache.spark.sql.functions._

/** The maintenance planner's decision core and its two family wrappers:
  * pure policy arithmetic over O(batches) stats rows — every edge the
  * runner would otherwise discover as a run-time refusal is decided at
  * PLAN time (drop-all, nothing-to-do, newest-stays-unfolded).
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def plan(batchDocs: Seq[(Long, Long)], ttl: Int, live: Int) =
    Maintenance.planFromBatchStats(spark, batchDocs, ttl, live)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("retention fires on aged batches and respects the drop-all refusal") {
    val b = Seq(0L -> 10L, 1L -> 20L, 2L -> 30L, 3L -> 40L)
    // cutoff = 3-2 = 1: batches 0,1 age; 2,3 survive (2 <= budget 2)
    assert(plan(b, ttl = 2, live = 2) == Seq(("retain", 1L, 2L, 30L)))
    // ttl = 1 ages everything older than the newest-but-one; one batch
    // short of drop-all stays legal
    assert(plan(b, ttl = 1, live = 2) == Seq(("retain", 2L, 3L, 60L)))
    // ttl = 0 ages EVERY batch (cutoff = newest): the drop-all refusal
    // suppresses retention at plan time, and the untouched 4 live
    // batches then exceed the budget -> compaction instead
    assert(plan(b, ttl = 0, live = 2) == Seq(("compact", 2L, 3L, 60L)))
    // a single-batch store can never age (drop-all refusal at plan time)
    assert(plan(Seq(5L -> 7L), ttl = 0, live = 1) == Seq(("none", -1L, 0L, 0L)))
  }

  test("compaction fires past the live-batch budget, newest stays unfolded") {
    val b = Seq(0L -> 10L, 1L -> 20L, 2L -> 30L, 3L -> 40L, 4L -> 50L)
    // no aging (ttl 10); 5 live > 2 -> fold batches 0..3
    assert(plan(b, ttl = 10, live = 2) == Seq(("compact", 3L, 4L, 100L)))
    // within budget -> nothing to do
    assert(plan(b, ttl = 10, live = 5) == Seq(("none", -1L, 0L, 0L)))
    // over budget but only ONE foldable batch: a single-batch fold is a
    // guaranteed no-op, so the plan refuses to schedule it
    assert(plan(Seq(0L -> 10L, 1L -> 20L), ttl = 10, live = 1) ==
      Seq(("none", -1L, 0L, 0L)))
  }

  test("runTextIndexMaintenance executes the plan (retention first, " +
       "then compaction over survivors) and the serve stays exact") {
    import spark.implicits._
    val docs = (0L until 120L).map(i =>
      (i, s"tok$i alpha beta ${if (i % 3 == 0) "gamma" else "delta"}"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_run")
    tmp.toFile.deleteOnExit()
    val idx = tmp.toFile.getAbsolutePath + "/text_index"
    (0 until 6).foreach { i =>
      TextIndex.appendTextIndexBatch(
        docs.where(col("doc_id") >= i * 20L && col("doc_id") < (i + 1) * 20L),
        idx, batchId = i.toLong)
    }
    // ttl 3: cutoff 2 drops batches 0-2; survivors {3,4,5} > budget 2
    // -> fold {3,4} into batch 4 (newest stays)
    val executed = Maintenance.runTextIndexMaintenance(spark, idx,
        ttlBatches = 3, maxLiveBatches = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(executed.toSeq == Seq(
      ("retain", 2L, 3L, 60L), ("compact", 4L, 2L, 40L)))
    val batches = spark.read.parquet(s"$idx/stats")
      .select("batch").distinct().as[Int].collect().sorted
    assert(batches.toSeq == Seq(4, 5), s"post-maintenance batches: $batches")
    // the maintained store serves exactly the retained corpus (folding
    // is value-invisible; aging is exact for this family)
    val retained = docs.where(col("doc_id") >= 60L)
    val a = TextIndex.bm25TopKStored(spark, idx, Seq("alpha", "gamma"), k = 20)
    val b2 = Corpus.bm25TopK(retained, Seq("alpha", "gamma"), k = 20)
    assert(a.exceptAll(b2).isEmpty && b2.exceptAll(a).isEmpty)
  }

  test("retention and compaction compose: compaction counts survivors only") {
    val b = (0L to 9L).map(i => i -> (i + 1) * 10L)
    // cutoff = 9-3 = 6: batches 0..6 age (7), survivors 7,8,9 (3 > 2)
    // -> ALSO fold survivors 7,8 (newest 9 stays)
    assert(plan(b, ttl = 3, live = 2) == Seq(
      ("retain", 6L, 7L, (1L to 7L).map(_ * 10L).sum),
      ("compact", 8L, 2L, 80L + 90L)))
  }

  test("guards: empty store and bad policy refuse loudly") {
    intercept[IllegalArgumentException] { plan(Nil, ttl = 1, live = 1) }
    intercept[IllegalArgumentException] { plan(Seq(0L -> 1L), ttl = -1, live = 1) }
    intercept[IllegalArgumentException] { plan(Seq(0L -> 1L), ttl = 1, live = 0) }
  }

  test("text-index wrapper reads the stats table; its n_docs equals the " +
       "corpus count over the same batches (the stats invariant)") {
    val docs = (0L until 100L).map(i => (i, s"tok$i alpha beta"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_spec")
    tmp.toFile.deleteOnExit()
    val idx = tmp.toFile.getAbsolutePath + "/text_index"
    (0 until 4).foreach { i =>
      TextIndex.appendTextIndexBatch(
        docs.where(col("doc_id") >= i * 25L && col("doc_id") < (i + 1) * 25L),
        idx, batchId = i.toLong)
    }
    val got = Maintenance.planTextIndexMaintenance(spark, idx,
        ttlBatches = 1, maxLiveBatches = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // cutoff 2: batches 0,1,2 (75 docs) age; survivor 3 alone is within
    // the live budget
    assert(got.toSeq == Seq(("retain", 2L, 3L, 75L)))
  }

  test("IVF wrapper excludes the batch=-1 layout seed from the decision") {
    val dim = 4
    val emb = (0 until 40).map { i =>
      val rnd = new scala.util.Random(i * 131L)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_maint_ivf")
    tmp.toFile.deleteOnExit()
    val w = tmp.toFile.getAbsolutePath
    Similarity.saveIvfIndex(emb, s"$w/ivf_index", nlist = 4, sampleRows = 40)
    Similarity.seedIvfStore(emb.where(col("vec_id") < 14L), w)
    Similarity.streamIngestIvfBatch(
      emb.where(col("vec_id") >= 14L && col("vec_id") < 28L), 1L,
      s"$w/ivf_index", s"$w/cells", nlist = 4, sampleRows = 40)
    Similarity.streamIngestIvfBatch(emb.where(col("vec_id") >= 28L), 2L,
      s"$w/ivf_index", s"$w/cells", nlist = 4, sampleRows = 40)
    val got = Maintenance.planIvfStoreMaintenance(spark, w,
        ttlBatches = 10, maxLiveBatches = 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // live batches 0,1,2 (seed -1 excluded); 3 > 1 -> fold batches 0,1
    assert(got.toSeq == Seq(("compact", 1L)))
  }
}
