package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** CROSS-JVM cache invalidation: the JVM-local caches (loaded
  * index/PQ, priced selectivities, unsplittable-cell memos) are keyed
  * by artifact path, and `invalidateIvfIndex` only clears the JVM that
  * ran the maintenance. The durable stamp closes the two-driver gap:
  * every stamped cache re-derives the artifact FINGERPRINT (file
  * listing + `_maint_stamp` content) on each hit, so maintenance run
  * by a DIFFERENT driver is visible at this driver's next serve. A
  * second JVM is simulated the honest way: by performing exactly the
  * durable effect its maintenance would leave on disk (the stamp
  * bump / the artifact rewrite) WITHOUT the in-process invalidation
  * call this JVM would have made.
  */
class StampSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = {
    val dim = 8
    (0 until 40).map { i =>
      val rnd = new scala.util.Random(i * 7919L)
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("loadIvfIndex serves the cached instance while the fingerprint " +
       "holds, reloads after a foreign stamp bump, and reloads after a " +
       "foreign artifact rewrite") {
    val tmp = java.nio.file.Files.createTempDirectory("stampload").toString
    val idx = s"$tmp/ivf_index"
    Similarity.saveIvfIndex(emb, idx, nlist = 4, sampleRows = 40)
    val a = Similarity.loadIvfIndex(spark, idx)
    assert(Similarity.loadIvfIndex(spark, idx) eq a,
      "unchanged artifact must serve the cached instance")
    // a second driver's store maintenance: durable stamp, no local call
    Similarity.bumpMaintStamp(spark, idx)
    val b = Similarity.loadIvfIndex(spark, idx)
    assert(!(b eq a), "a foreign stamp bump must force a reload")
    assert(a.length == b.length &&
      a.indices.forall(i => a(i).sameElements(b(i))),
      "centroid values are unchanged by a store-only maintenance")
    // a second driver RETRAINS the artifact in place (overwrite = new
    // part-file names): the listing leg of the fingerprint catches it
    // even though no stamp survives the overwrite
    Similarity.saveIvfIndex(emb.where(col("vec_id") < 20L), idx,
      nlist = 4, sampleRows = 20)
    val c = Similarity.loadIvfIndex(spark, idx)
    assert(!(c eq b), "a foreign artifact rewrite must force a reload")
  }

  test("priced selectivity re-prices after a foreign stamp bump") {
    val labeled = emb.withColumn("label", (col("vec_id") % 4).cast("int"))
    val tmp = java.nio.file.Files.createTempDirectory("stampsel").toString
    val idx = s"$tmp/ivf_index"; val data = s"$tmp/cells"
    Similarity.streamIngestIvfBatch(labeled, 0L, idx, data, nlist = 4, sampleRows = 40)
    val probes = labeled.where(col("vec_id") === 0L)
    def serve(): Unit = Similarity.ivfProbeSetTopKStoredFiltered(
        spark.read.parquet(data).drop("batch"), idx, probes,
        rowFilter = col("label") === 1, k = 5, nprobe = 1)
      .select("vec_id").as[Long].collect()
    val p0 = Similarity.selectivityPricings
    serve()
    assert(Similarity.selectivityPricings == p0 + 1)
    serve()
    assert(Similarity.selectivityPricings == p0 + 1,
      "repeat serve prices from the cache")
    Similarity.bumpMaintStamp(spark, idx) // the other driver's delete/retain
    serve()
    assert(Similarity.selectivityPricings == p0 + 2,
      "foreign maintenance must re-price at the next serve")
  }

  test("artifact-preserving maintenance writes the durable stamp " +
       "(erasure here; compaction/retention share the same call)") {
    val tmp = java.nio.file.Files.createTempDirectory("stampdel").toString
    val idx = s"$tmp/ivf_index"; val data = s"$tmp/cells"
    Similarity.streamIngestIvfBatch(emb, 0L, idx, data, nlist = 4, sampleRows = 40)
    val stamp = java.nio.file.Paths.get(idx, Similarity.MaintStampName)
    assert(!java.nio.file.Files.exists(stamp),
      "a fresh artifact carries no stamp")
    assert(Similarity.deleteFromIvfStore(spark, tmp, Seq(1L, 2L)) == 2L)
    assert(java.nio.file.Files.exists(stamp),
      "erasure must leave the durable stamp for other drivers' caches")
    val s1 = new String(java.nio.file.Files.readAllBytes(stamp), "UTF-8")
    assert(Similarity.deleteFromIvfStore(spark, tmp, Seq(3L)) == 1L)
    val s2 = new String(java.nio.file.Files.readAllBytes(stamp), "UTF-8")
    assert(s1 != s2, "every maintenance run must write a fresh stamp")
  }
}
