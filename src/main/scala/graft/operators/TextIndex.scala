package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** STORED INVERTED INDEX for lexical (BM25) retrieval — the last serve
  * path that still scanned the raw corpus per query
  * ([[Corpus.bm25TopK]] tokenizes every document for every query). At
  * 100 TB a per-query corpus scan is the wrong physics: search engines
  * serve from a term-keyed postings store built once at ingest, and a
  * query touches only its own terms' slice of it. This family gives the
  * engine that store with the same lifecycle every other stored-index
  * family has (band index, census, sem store, IVF cells): incremental
  * batch append, pruned serve, compaction, right-to-erasure, and
  * batch-TTL retention.
  *
  * Layout (`idxDir/`):
  *   - `postings/batch=<b>/tm_mod=<m>/` — rows `(term, doc_id, tf, dl)`
  *     where `tm_mod = pmod(hash(term), nMods)`. A query's scan prunes
  *     to ≤ |query terms| of the nMods hash partitions — the census
  *     store's win_mod discipline applied to terms. `dl` (the document's
  *     token length) is DENORMALIZED into the posting row, so the serve
  *     path needs no doc-length join at all: at lake scale the doc-length
  *     table is corpus-sized and its join would shuffle candidates
  *     against billions of rows for one long each. 8 bytes per posting
  *     buys a join-free serve (the Lucene norms trade).
  *   - `stats/batch=<b>/` — ONE row per batch `(n_docs, total_toks)`.
  *     The global N and avgdl the scorer needs are the SUM over batch
  *     rows: O(batches) tiny files at serve, never a corpus scan.
  *     Erasure decrements the victims' own batches' rows in place, so
  *     retention (dropping whole batches) can never double-subtract.
  *   - `text_index_manifest.json` — pins `nMods`; every consumer
  *     re-renders and throws on drift ([[Dedup.ManifestIo]] contract).
  *
  * Append contract: each `doc_id` is indexed by exactly ONE batch (the
  * incremental-ingest discipline every stored family shares); postings
  * for a (doc, term) pair therefore live in exactly one row, and serve
  * needs no cross-batch re-aggregation.
  *
  * Single-writer contract: like every store family here, maintenance
  * (delete/compact/retain) assumes one writer; concurrent maintenance
  * collides on the shared [[Dedup.MaintenanceSentinel]] and fails
  * loudly rather than corrupting.
  */
object TextIndex {

  /** Term-hash fanout (partition count of each batch's postings). A
    * query prunes to ≤ |terms| of these regardless of corpus size;
    * sizing nMods ∝ index keeps per-partition bytes flat — 16 keeps
    * test-scale file counts sane, a 100 TB index uses thousands (same
    * sizing note as [[Dedup.NMods]]).
    */
  val DefaultNMods = 16

  private def postingsDir(idxDir: String) = s"$idxDir/postings"
  private def statsDir(idxDir: String)    = s"$idxDir/stats"

  /** Pinned store parameters — fanout is a property OF the store;
    * appends after the first, and every serve, read it back rather than
    * declare it.
    */
  private val manifest =
    new Dedup.ManifestIo("text index store", "text_index_manifest.json")
  private def renderManifest(nMods: Int): String =
    manifest.render("version" -> 1, "nmods" -> nMods)
  private def storeNMods(idxDir: String): Int =
    manifest.intField(idxDir, "nmods")

  /** Append one ingest batch of documents to the index: tokenize, count
    * per-(doc, term) tf, attach `dl` (= Σ tf over the doc — tokens
    * partition exactly into terms, so the window sum IS the token
    * count; no second pass over the fat text column), hash-fan by term
    * and write `postings/batch=<batchId>/tm_mod=*` term-clustered, plus
    * the batch's one-row stats partition.
    *
    * Shuffle budget: one tokenize-explode aggregation (the tf groupBy),
    * one postings-sized window exchange for `dl` (postings ≪ tokens),
    * one range-partitioned staging exchange (parallel across the
    * cluster — a single-task funnel here was measured at 200+ s for a
    * 400k-doc batch; range partitioning on (tm_mod, term) keeps each
    * output dir fed by the few tasks owning its contiguous range, so
    * files stay term-clustered AND few), and one cheap regexp-count
    * scan of the batch for the stats row (counts empty docs too — N
    * must match the full-scan scorer's doc count exactly). Nothing
    * corpus-sized: an append touches its batch only.
    */
  def appendTextIndexBatch(docs: DataFrame, idxDir: String, batchId: Long,
                           nMods: Int = DefaultNMods): Unit = {
    import org.apache.spark.sql.expressions.Window
    if (manifest.exists(idxDir)) manifest.check(idxDir, renderManifest(nMods))
    else manifest.write(idxDir, renderManifest(nMods))
    val spark = docs.sparkSession
    val tf = docs
      .select(col("doc_id"), explode(TF.tokens(lower(col("text")))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    tf.withColumn("dl", sum(col("tf")).over(Window.partitionBy(col("doc_id"))))
      .withColumn("tm_mod", pmod(hash(col("term")), lit(nMods)).cast("int"))
      .repartitionByRange(spark.sparkContext.defaultParallelism,
        col("tm_mod"), col("term"), col("doc_id"))
      .sortWithinPartitions(col("tm_mod"), col("term"), col("doc_id"))
      .write.mode("overwrite").partitionBy("tm_mod")
      .parquet(s"${postingsDir(idxDir)}/batch=$batchId")
    docs.agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(TF.tokenCount(col("text")).cast("long")), lit(0L))
          .as("total_toks"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${statsDir(idxDir)}/batch=$batchId")
  }

  /** BM25 top-k served FROM THE STORE — same scoring discipline as the
    * full-scan [[Corpus.bm25TopK]] (ln rounded at 6 dp, per-term
    * DECIMAL(18,8) fixing, final 4 dp; identical operation order), so on
    * the same corpus the two return byte-identical rows — which is what
    * makes every gate over this family an EXACT value oracle rather
    * than a recall bound.
    *
    * Serve shape: global (N, Σdl) from the per-batch stats rows —
    * O(batches) rows, no corpus scan; the postings scan prunes by
    * `tm_mod IN (mods of query terms)` (partition dirs skipped at
    * listing) AND `term IN (terms)` (row groups skipped by the
    * term-clustered layout's min/max stats). The matching candidates
    * (≤ Σ df(term) rows — bounded by the query's document frequencies,
    * not the store) are PERSISTED so the df aggregate and the scoring
    * pass share ONE store scan; df itself is a map-side-combined
    * aggregate broadcast back (a term-keyed window would collapse
    * parallelism to |terms| tasks — measured 2× slower than the scan at
    * 1.6M docs). One per-doc sum and a TakeOrderedAndProject finish.
    */
  def bm25TopKStored(spark: SparkSession, idxDir: String, terms: Seq[String],
                     k: Int = 20, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import spark.implicits._
    val nMods = storeNMods(idxDir)
    // the query terms' own hash partitions: computed with the SAME
    // catalyst hash the writer fanned with (a |terms|-row local job —
    // bounded by the query, not the data)
    val mods = terms.toDS()
      .select(pmod(hash(col("value")), lit(nMods)).cast("int").as("m"))
      .distinct().as[Int].collect().sorted
    val stats = Dedup.readStore(spark, statsDir(idxDir))
      .agg(sum(col("n_docs")).cast("double").as("n_docs"),
           sum(col("total_toks")).cast("double").as("total_toks"))
    // persisted: candidates feed the df aggregate AND the scoring join —
    // without it the pruned store slice is read twice (same discipline
    // as bm25TopK's tf)
    val cand = Dedup.readStore(spark, postingsDir(idxDir))
      .where(col("tm_mod").isin(mods.toIndexedSeq.map(Integer.valueOf): _*) &&
        col("term").isin(terms: _*))
      .persist()
    val dfreq = cand.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    cand.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6))
      .withColumn("score_t",
        (col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
            lit(b) * col("dl") / (col("total_toks") / col("n_docs")))))
          .cast("decimal(18,8)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("score_t")).cast("double"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** REAL streaming ingest of the text index: document drops arrive as
    * a file stream and each micro-batch appends its own postings batch
    * (`batch=<streaming batch id>`) plus its one-row stats partition —
    * the incremental-append contract, driven by Structured Streaming.
    * Idempotent under micro-batch replay (foreachBatch may re-run a
    * batch after a crash): the append overwrites its OWN `batch=` dirs
    * only, so a replay converges to the same store. Serves during
    * ingest see a consistent prefix (a batch's postings land before its
    * stats only transiently; the scorer's stats sum is conservative in
    * that window). Runs the stream to completion of available input.
    */
  def streamIngestTextIndex(spark: SparkSession, inputDir: String,
                            idxDir: String, nMods: Int = DefaultNMods): Unit = {
    val static = spark.read.parquet(inputDir)
    val q = spark.readStream
      .schema(static.schema)
      .option("maxFilesPerTrigger", 2) // two arrival slices per micro-batch
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", s"$idxDir/_textidx_chk")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                       batchId: Long) =>
        appendTextIndexBatch(batch.select(col("doc_id"), col("text")),
          idxDir, batchId, nMods)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Right-to-erasure from the text index: remove every posting of
    * `docIds` by file-targeted rewrite ([[Dedup.deleteRowsFromStore]] —
    * cold files byte-identical, moved bytes track victim placement) and
    * decrement the victims' OWN batches' stats rows in place, so the
    * scorer's N/avgdl match a corpus that never contained them and
    * batch-TTL retention still drops each batch's stats with its
    * postings (a separately-appended negative delta would double-count
    * when its source batch ages out).
    *
    * Two store passes, each with a distinct, irreducible purpose: the
    * PRE-scan (column-pruned to `batch, doc_id, dl` — no term strings)
    * reads the per-victim lengths the decrement needs, which the delete
    * is about to destroy; the delete core's own single job prices and
    * lists owning files. A doc's terms hash across all tm_mods, so
    * neither scan can partition-prune — that is the honest physics of
    * erasing a row scattered by design (same note as the IVF family).
    *
    * Stats rewrite happens AFTER the postings swap promotes (postings
    * without stats decrement = scores slightly conservative for a
    * moment; the reverse order could under-count N for surviving
    * postings). Single-writer contract as everywhere. Returns the
    * number of victim documents actually present.
    */
  def deleteFromTextIndex(spark: SparkSession, idxDir: String,
                          docIds: Seq[Long]): Long = {
    require(docIds.nonEmpty, "deleteFromTextIndex: empty id set")
    val ids = docIds.distinct
    val victimCol = col("doc_id").isin(ids.map(java.lang.Long.valueOf): _*)
    // bounded collect: one row per (victim batch, victim doc) — ≤ |ids|
    val present = Dedup.readStore(spark, postingsDir(idxDir))
      .where(victimCol)
      .groupBy(col("batch"), col("doc_id"))
      .agg(first(col("dl")).as("dl"))
      .select(col("batch").cast("long"), col("doc_id"), col("dl"))
      .collect()
    if (present.isEmpty) return 0L
    Dedup.deleteRowsFromStore(spark, postingsDir(idxDir), "deleteFromTextIndex",
      victimCol = victimCol,
      partitionCols = Seq("batch", "tm_mod"),
      clusterCols = Seq("term", "doc_id"))
    // per affected batch: subtract the victims' doc count and token mass
    // from that batch's one-row stats partition (tiny read + rewrite,
    // driver-looped over ≤ |affected batches| dirs)
    present.groupBy(_.getLong(0)).foreach { case (batch, rows) =>
      val dDocs = rows.length.toLong
      val dToks = rows.map(_.getLong(2)).sum
      val dir = s"${statsDir(idxDir)}/batch=$batch"
      val cur = spark.read.parquet(dir)
        .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_toks")).as("total_toks"))
        .head()
      spark.range(1)
        .select((lit(cur.getLong(0)) - lit(dDocs)).as("n_docs"),
                (lit(cur.getLong(1)) - lit(dToks)).as("total_toks"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    present.map(_.getLong(1)).distinct.length.toLong
  }

  /** Batch-TTL retention for the text index: drop `batch <= cutoff`
    * partitions of BOTH tables as pure metadata ([[Layout.dropPartitions]]
    * — no data file read, planned, or rewritten; postings and stats age
    * together or the scorer's N drifts from its postings). Aging is
    * EXACT for this family: a batch's docs contribute nothing outside
    * their own partitions, so post-retention serves equal a corpus that
    * never held the aged docs. Returns dropped batch ids per table.
    */
  def retainTextIndexBatches(spark: SparkSession, idxDir: String,
                             cutoff: Long): Map[String, Seq[Long]] = {
    def age(dir: String): Seq[Long] =
      Layout.dropPartitions(spark, dir, "batch", v => v.toLong <= cutoff)
        .map(_.toLong)
    Map("postings" -> age(postingsDir(idxDir)),
        "stats" -> age(statsDir(idxDir)))
  }

  /** Fold all postings batches `<= upTo` into ONE consolidated
    * `batch=upTo` per tm_mod — the small-batches maintenance op (every
    * micro-batch append adds nMods files; steady-state ingest compacts
    * periodically, exactly like the band index's [[Dedup.compactIndex]]).
    * Stats rows consolidate the same way (their sum is what serves, and
    * folding preserves the sum). Rewrites ONLY the folded batches —
    * younger batches stay byte-identical — behind the checked
    * recoverable swap. Compose with retention the usual way: compact
    * first only if `upTo` is younger than the retention cutoff.
    * Returns the number of source batches folded.
    */
  def compactTextIndexBatches(spark: SparkSession, idxDir: String,
                              upTo: Long): Long = {
    import org.apache.hadoop.fs.Path
    storeNMods(idxDir) // manifest-presence assert (the fold keeps the fanout)
    val folded = Seq(postingsDir(idxDir) -> true, statsDir(idxDir) -> false)
      .map { case (dir, isPostings) =>
        val root = new Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val srcBatches = fs.listStatus(root).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
          .map(st => st.getPath.getName.stripPrefix("batch=").toLong)
          .filter(_ <= upTo).sorted
        if (srcBatches.length > 1) {
          val sentinel = new Path(dir, Dedup.MaintenanceSentinel)
          val trash = new Path(root.getParent, s".${root.getName}_compact_old")
          val stage = new Path(root.getParent, s".${root.getName}_compact_stage")
          for (left <- Seq(sentinel, trash) if fs.exists(left))
            throw new IllegalStateException(
              s"compactTextIndexBatches: leftover $left from an unfinished swap " +
                s"at $dir — recover before retrying")
          fs.delete(stage, true)
          val src = Dedup.readStore(spark, dir)
            .where(col("batch") <= upTo)
          val staged =
            if (isPostings)
              src.select(col("term"), col("doc_id"), col("tf"), col("dl"), col("tm_mod"))
                .repartitionByRange(spark.sparkContext.defaultParallelism,
                  col("tm_mod"), col("term"), col("doc_id"))
                .sortWithinPartitions(col("tm_mod"), col("term"), col("doc_id"))
                .write.mode("overwrite").partitionBy("tm_mod")
            else
              src.agg(sum(col("n_docs")).as("n_docs"),
                      sum(col("total_toks")).as("total_toks"))
                .coalesce(1)
                .write.mode("overwrite")
          staged.parquet(new Path(stage, s"batch=$upTo").toString)
          val promotes = Seq(
            (new Path(stage, s"batch=$upTo"), new Path(root, s"batch=$upTo")))
          Dedup.recoverableSwap(fs, "compactTextIndexBatches",
            sentinelDir = root, trash = trash,
            asides = srcBatches.map(b => new Path(root, s"batch=$b")),
            promotes = promotes,
            cleanup = Seq(stage))
          srcBatches.length.toLong - 1L
        } else 0L
      }
    folded.max
  }
}
