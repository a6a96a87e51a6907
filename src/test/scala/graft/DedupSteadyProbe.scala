package graft

import graft.operators.{Dedup, Similarity}
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
  *   - `census`  — [[Dedup.substringMassIncrementalStored]] against a
  *     STORED hash-fanned-out `(win, n_docs)` census: partition-pruned to
  *     the batch's windows' `win_mod` dirs. Expected: flat, scan fraction
  *     ∝ min(batch·wins, nMods)/nMods.
  *   - `sem`     — [[Dedup.semDedupIncrementalStored]] vs
  *     [[Dedup.semDedupIncremental]]: the embedding tier. The stored form
  *     reads only the batch's cells' partitions of the persisted
  *     `(cell, vec_id, embedding)` index; the in-memory form re-assigns
  *     the whole corpus per call. nlist grows with the corpus (the FAISS
  *     √N-family sizing that keeps cell size constant), so the stored
  *     probe's membership is O(batch·cellsize).
  *
  * The store fanout (`nMods`) is the flatness knob: a fixed batch touches
  * at most batch×bands distinct band hashes, so the pruned scan reads
  * ≈ min(batch·bands, nMods)/nMods of the index — at the decade where
  * the batch's hashes saturate the default 16 mods the scan term
  * reappears, and raising nMods with the index restores flatness (run the
  * same factor at two nMods values to measure the knob).
  *
  * Run: `sbt "Test/runMain graft.DedupSteadyProbe [baseDir] [nMods] [tiers] [factors...]"`
  * where `tiers` is a csv subset of `minhash,census,sem,semrq,semq,annrq`
  * (default:
  * `minhash,census,sem`; `semrq` measures the quantizer-AGING term and
  * its in-place [[Dedup.requantizeSemStore]] cure: probe at the seed's
  * nlist=16, timed requantize to the decade's nlist, probe again).
  */
object DedupSteadyProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nMods = args.lift(1).map(_.toInt).getOrElse(Dedup.NMods)
    val tiers = args.lift(2).getOrElse("minhash,census,sem").split(",").toSet
    val factors = if (args.length > 3) args.drop(3).map(_.toInt).toSeq else Seq(1, 10, 100)
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

    // embeddings, deterministically PERTURBED per replica so replicated
    // points are distinct in embedding space (identical replicas would all
    // collapse into the same cells and fake constant cell sizes)
    val embs = Tables.embeddings(spark, base).select("vec_id", "embedding").persist()
    val fixedVecs = embs.where(col("vec_id") < 32)
      .select((col("vec_id") + 900000000L).as("vec_id"), col("embedding"))
      .persist()
    fixedVecs.count()
    def embCorpusAt(factor: Int): DataFrame =
      embs.crossJoin(spark.range(factor).select(col("id").as("rep")))
        .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + (sin(col("vec_id") * (i + lit(1)) + col("rep")) * lit(0.05))
              .cast("float"))
            .as("embedding"))

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // Scanned-bytes instrumentation for the nMods-knob measurement: wall
    // time at toy scale is floor-dominated (job overhead ≫ I/O), so the
    // term the fanout actually controls — bytes of the stored index read
    // per fixed batch — is accumulated from task input metrics. The
    // listener bus is async; a short drain sleep before reading keeps the
    // attribution honest for multi-second probes.
    val bytesRead = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
    })
    def timedIO(f: => Unit): (Double, Double) = {
      Thread.sleep(300); bytesRead.set(0L)
      val t = timed(f)
      Thread.sleep(300)
      (t, bytesRead.get() / 1e6)
    }
    def dirMB(path: String): Double = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) 0.0
      else fs.getContentSummary(p).getLength / 1e6
    }

    println(f"[steady] fixed batch = 32 docs/vecs; corpus = ${docs.count()} x factor; tiers=$tiers")
    for (factor <- factors) {
      val root = s"/tmp/graft_steady_f${factor}_m$nMods"
      var line = f"[steady] factor $factor%4d  nmods $nMods%4d"

      if (tiers("minhash")) {
        val corpus = corpusAt(factor).persist()
        val nCorpus = corpus.count()
        // --- stored pre-banded index: build once (untimed, disk-cached
        // across probe runs), probe per-batch
        val idx = s"$root/index"
        if (!new java.io.File(idx).exists()) {
          Dedup.seedStreamStores(corpus, idx, s"$root/acc", Seq("doc_id"),
            n = 3, perms = 32, nMods = nMods)
          Dedup.minhashIncrementalStored(spark, idx, corpus, batchId = 0L,
            minEstJaccard = 0.4, verifyJaccard = Some(0.9)).count() // bulk build
        }
        // warm + 2 measured fixed batches against the grown index
        val probes = (1 to 3).map { b =>
          timedIO(Dedup.minhashIncrementalStored(spark, idx,
            fixedInc.select((col("doc_id") + b * 100L).as("doc_id"), col("text")),
            batchId = b.toLong, minEstJaccard = 0.4, verifyJaccard = Some(0.9)).count())
        }.drop(1)
        val (tStored, mbStored) = probes.minBy(_._1)
        // --- in-memory contrast: corpus re-signed + re-ranked per call
        val tInmem = (1 to 2).map { _ =>
          timed(Dedup.minhashIncremental(corpus, fixedInc,
            minEstJaccard = 0.4, verifyJaccard = Some(0.9)).count())
        }.min
        line += f"  corpus $nCorpus%7d  stored $tStored%6.2f s  scan $mbStored%7.2f MB of ${dirMB(idx)}%7.2f MB  inmem $tInmem%6.2f s"
        corpus.unpersist()
      }

      if (tiers("census")) {
        val corpus = corpusAt(factor).persist()
        // --- substring census: build stored fanned-out census once
        // (untimed), probe with the partition-pruned existence semi-join
        val censusPath = s"$root/census_v2"
        if (!new java.io.File(censusPath).exists())
          Dedup.writeCensusStore(
            Dedup.windowCensus(Dedup.windowTable(corpus)), censusPath,
            width = 40, nMods = nMods)
        val cProbes = (1 to 2).map { _ =>
          timedIO(Dedup.substringMassIncrementalStored(
            spark, censusPath, fixedInc).count())
        }
        val (tCensus, mbCensus) = cProbes.minBy(_._1)
        line += f"  census $tCensus%6.2f s  scan $mbCensus%7.2f MB of ${dirMB(censusPath)}%7.2f MB"
        corpus.unpersist()
      }

      if (tiers("semrq")) {
        // the REQUANTIZE demonstration: the store seeds at nlist=16 at
        // EVERY decade (the aging quantizer), the probe is measured, then
        // requantizeSemStore grows nlist in place (timed: the maintenance
        // price, one parallel re-assign — NOT a re-seed) and the probe is
        // measured again. Flat `rq_probe` across decades with `probe16`
        // growing is the aging term and its in-place cure on one line.
        val nlistHi = math.min(512, 16 * factor)
        val semMods = math.min(64, nlistHi)
        val ec = embCorpusAt(factor).persist()
        val nVecs = ec.count()
        val semDir = s"$root/semrq"
        // fresh store every run: a disk-cached requantized store would
        // make the nlist=16 probe drift-throw
        val semDirP = new org.apache.hadoop.fs.Path(semDir)
        semDirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(semDirP, true)
        Dedup.seedSemStore(ec, semDir, nlist = 16, sampleRows = 2048,
          nMods = semMods) // untimed build (the one-off corpus assignment)
        val t16 = (1 to 3).map { b =>
          timed(Dedup.semDedupIncrementalStored(spark, semDir,
            fixedVecs.select((col("vec_id") + b * 100L).as("vec_id"), col("embedding")),
            batchId = b.toLong, nlist = 16).count())
        }.drop(1).min
        val sampleHi = math.max(2048, 2 * nlistHi)
        val tRq = timed(Dedup.requantizeSemStore(spark, semDir, nlistHi,
          sampleRows = sampleHi))
        val tHi = (4 to 6).map { b =>
          timed(Dedup.semDedupIncrementalStored(spark, semDir,
            fixedVecs.select((col("vec_id") + b * 100L).as("vec_id"), col("embedding")),
            batchId = b.toLong, nlist = nlistHi, sampleRows = sampleHi).count())
        }.drop(1).min
        line += f"  vecs $nVecs%7d  probe16 $t16%6.2f s  requant($nlistHi%3d) $tRq%6.2f s  rq_probe $tHi%6.2f s"
        ec.unpersist()
      }

      if (tiers("annrq")) {
        // ANN-store aging and its in-place cure: the streamed ingest's
        // serving path is the stored top-k probe, whose exact-cosine
        // re-rank touches nprobe·corpus/nlist rows. Frozen at the
        // bootstrap nlist=16 that term grows linearly with the corpus;
        // requantized to the decade's nlist (cell size constant, the
        // FAISS √N-family sizing) the same nprobe=4 probe compares a
        // constant number of vectors — flat `rq_topk` across decades
        // with `topk16` growing is the aging term and its cure on one
        // line. The requantize itself is timed: the maintenance price,
        // one parallel re-assign of the store's own rows, never a second
        // corpus read.
        val nlistHi = math.min(512, 16 * factor)
        val ec = embCorpusAt(factor).persist()
        val nVecs = ec.count()
        val annDir = s"$root/annrq"
        // fresh store every run: a disk-cached requantized store would
        // skew the frozen-nlist measurement
        val annDirP = new org.apache.hadoop.fs.Path(annDir)
        annDirP.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(annDirP, true)
        Similarity.invalidateIvfIndex(s"$annDir/ivf_index") // path reuse across factors
        Similarity.streamIngestIvfBatch(ec, 0L, s"$annDir/ivf_index",
          s"$annDir/cells", nlist = 16, sampleRows = 2048) // untimed seed
        def topk(): Double = (1 to 3).map { _ =>
          timed(Similarity.ivfTopKStored(
            Dedup.readStore(spark, s"$annDir/cells").drop("batch"),
            s"$annDir/ivf_index", probeId = 5L, k = 10, nprobe = 4)
            .write.mode("overwrite").format("noop").save())
        }.drop(1).min
        val t16 = topk()
        val tRq = timed(Similarity.requantizeIvfStore(spark, annDir, nlistHi,
          sampleRows = math.max(2048, 2 * nlistHi)))
        val tHi = topk()
        line += f"  vecs $nVecs%7d  topk16 $t16%6.2f s  requant($nlistHi%3d) $tRq%6.2f s  rq_topk $tHi%6.2f s"
        ec.unpersist()
      }

      if (tiers("semq")) {
        // the SQ8 stored form vs the full-precision stored form at the
        // same factor: same pruned-probe shape, ~1/4 the stored/scanned
        // bytes (the embedding column is the store's byte bottleneck)
        val nlist = math.min(512, 16 * factor)
        val sampleRows = math.max(2048, 2 * nlist)
        val semMods = math.min(64, nlist)
        val ec = embCorpusAt(factor).persist()
        val nVecs = ec.count()
        for ((tag, qzed) <- Seq(("full", false), ("sq8", true))) {
          val semDir = s"$root/semq_${tag}_n$nlist"
          if (!new java.io.File(semDir).exists())
            Dedup.seedSemStore(ec, semDir, nlist = nlist,
              sampleRows = sampleRows, nMods = semMods, quantized = qzed)
          val ps = (1 to 3).map { b =>
            timedIO(Dedup.semDedupIncrementalStored(spark, semDir,
              fixedVecs.select((col("vec_id") + b * 100L).as("vec_id"), col("embedding")),
              batchId = b.toLong, nlist = nlist, sampleRows = sampleRows).count())
          }.drop(1)
          val (t, mb) = ps.minBy(_._1)
          line += f"  $tag $t%6.2f s scan $mb%6.2f MB of ${dirMB(s"$semDir/cells")}%6.2f MB"
        }
        line += f"  vecs $nVecs%7d"
        ec.unpersist()
      }

      if (tiers("sem")) {
        // nlist ∝ corpus (cell size constant), fanout sized to nlist
        val nlist = math.min(512, 16 * factor)
        val sampleRows = math.max(2048, 2 * nlist)
        val semMods = math.min(64, nlist)
        val ec = embCorpusAt(factor).persist()
        val nVecs = ec.count()
        val semDir = s"$root/sem_n$nlist"
        if (!new java.io.File(semDir).exists())
          Dedup.seedSemStore(ec, semDir, nlist = nlist,
            sampleRows = sampleRows, nMods = semMods) // untimed build
        val tSemStored = (1 to 3).map { b =>
          timed(Dedup.semDedupIncrementalStored(spark, semDir,
            fixedVecs.select((col("vec_id") + b * 100L).as("vec_id"), col("embedding")),
            batchId = b.toLong, nlist = nlist, sampleRows = sampleRows).count())
        }.drop(1).min
        val tSemInmem = (1 to 2).map { _ =>
          timed(Dedup.semDedupIncremental(ec, fixedVecs,
            nlist = nlist, sampleRows = sampleRows).count())
        }.min
        line += f"  vecs $nVecs%7d  sem_stored $tSemStored%6.2f s  sem_inmem $tSemInmem%6.2f s"
        ec.unpersist()
      }

      println(line)
      spark.catalog.clearCache()
      docs.persist(); fixedInc.persist(); embs.persist(); fixedVecs.persist()
    }
    spark.stop()
  }
}
