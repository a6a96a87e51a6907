package graft

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: FIXED-batch steady-state cost of the incremental dedup tiers.
  *
  * The declared incremental queries grow their batch with the corpus, so a
  * sub-linear total can hide a per-batch term that scales with the STORE —
  * the curve that matters in production is "per-batch wall time for a
  * fixed-size increment as the standing corpus grows 1×/10×/100×". This
  * probe measures exactly that, for:
  *
  *   - `stored`  — [[Dedup.minhashIncrementalStored]]: the pre-banded,
  *     append-capped band index ([[Dedup.minhashStreamKeep]]'s layout;
  *     every micro-batch of `q_stream_fuzzy_dedup` runs this same path).
  *     Expected: flat (probe work bounded by batch + collisions).
  *   - `inmem`   — [[Dedup.minhashIncremental]]: corpus given as raw text,
  *     re-signed and re-ranked per call. Expected: grows with the corpus —
  *     the declared one-shot form, kept as the contrast line.
  *   - `census`  — [[Dedup.substringMassIncremental]] against a STORED
  *     pre-aggregated window census. Expected: flat modulo the map-side
  *     census scan.
  *
  * The store fanout (`nMods`) is the flatness knob: a fixed batch touches
  * at most batch×bands distinct band hashes, so the pruned scan reads
  * ≈ min(batch·bands, nMods)/nMods of the index — at the decade where
  * the batch's hashes saturate the default 16 mods the scan term
  * reappears, and raising nMods with the index restores flatness.
  *
  * Run: `sbt "Test/runMain graft.DedupSteadyProbe [baseDir] [nMods] [factors...]"`.
  */
object DedupSteadyProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nMods = args.lift(1).map(_.toInt).getOrElse(Dedup.NMods)
    val factors = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, base).select("doc_id", "text").persist()
    // the FIXED batch: the same 32 docs at every factor, ids above any
    // replicated corpus id so arrival order stays id order
    val fixedInc = docs.where(col("doc_id") < 32)
      .select((col("doc_id") + 900000000L).as("doc_id"),
        concat(col("text"), lit(" incsalt")).as("text"))
      .persist()
    fixedInc.count()

    def corpusAt(factor: Int): DataFrame =
      docs.crossJoin(spark.range(factor).select(col("id").as("rep")))
        .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"),
          concat(col("text"), lit(" copysalt"), col("rep")).as("text"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println(f"[steady] fixed batch = 32 docs; corpus = ${docs.count()} x factor")
    for (factor <- factors) {
      val corpus = corpusAt(factor).persist()
      val nCorpus = corpus.count()

      // --- stored pre-banded index: build once (untimed, disk-cached
      // across probe runs), probe per-batch
      val root = s"/tmp/graft_steady_f${factor}_m$nMods"
      val idx = s"$root/index"
      if (!new java.io.File(idx).exists()) {
        Dedup.seedStreamStores(corpus, idx, s"$root/acc", Seq("doc_id"),
          n = 3, perms = 32, nMods = nMods)
        Dedup.minhashIncrementalStored(spark, idx, corpus, batchId = 0L,
          minEstJaccard = 0.4, verifyJaccard = Some(0.9)).count() // bulk build
      }
      // warm + 2 measured fixed batches against the grown index
      val tStored = (1 to 3).map { b =>
        timed(Dedup.minhashIncrementalStored(spark, idx,
          fixedInc.select((col("doc_id") + b * 100L).as("doc_id"), col("text")),
          batchId = b.toLong, minEstJaccard = 0.4, verifyJaccard = Some(0.9)).count())
      }.drop(1).min

      // --- in-memory contrast: corpus re-signed + re-ranked per call
      val tInmem = (1 to 2).map { _ =>
        timed(Dedup.minhashIncremental(corpus, fixedInc,
          minEstJaccard = 0.4, verifyJaccard = Some(0.9)).count())
      }.min

      // --- substring census: build stored census once (untimed), probe
      val censusPath = s"$root/census"
      if (!new java.io.File(censusPath).exists())
        Dedup.windowCensus(Dedup.windowTable(corpus)).write.parquet(censusPath)
      val tCensus = (1 to 2).map { _ =>
        timed(Dedup.substringMassIncremental(
          spark.read.parquet(censusPath), fixedInc).count())
      }.min

      println(f"[steady] factor $factor%4d  nmods $nMods%4d  corpus $nCorpus%7d  " +
        f"stored $tStored%6.2f s  inmem $tInmem%6.2f s  census $tCensus%6.2f s")
      corpus.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
