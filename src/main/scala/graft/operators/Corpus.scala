package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data preparation operators: term weighting,
  * sequence packing, and reproducible ordering.
  *
  * The reference has no corpus analytics (its "query engine" is Cosmos DB,
  * `BigDataLogControl.cs:206-330`); these are the north-star operations a
  * large-scale LLM-data pipeline runs between dedup and training. Each is
  * a declarative pipeline whose shuffles are keyed (term, shard) — nothing
  * here funnels the corpus through one partition.
  */
object Corpus {

  /** Per-document top-k terms by TF-IDF (natural-log IDF, rounded to 4 dp
    * before ranking so the score is engine-portable).
    *
    * Scale shape: tokenize → (doc, term) counts (map-side combine) → join
    * the term-keyed document-frequency table on `term` — both sides of the
    * join are already term-partitioned aggregates, so this co-locates — →
    * per-doc window top-k. The corpus row count rides in as one scalar.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    // corpus row count as a broadcast 1-row aggregate, not an eager
    // .count(): the operator stays a single lazy pipeline (no extra scan
    // job at DataFrame-construction time, e.g. during plan inspection)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs_total"))
    val terms = docs.select(col("doc_id"),
      explode(TF.tokens(lower(col("text")))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs_total") / col("df")), 4))
      .withColumn("rk", row_number().over(byDoc))
      .where(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("score"))
      .orderBy(col("doc_id"), col("score").desc, col("term"))
  }

  /** Token-budget sequence packing: within each shard (`source`), documents
    * in `doc_id` order are assigned to consecutive bins of ~`budget`
    * whitespace tokens (bin = prior running total div budget; the document
    * that crosses the boundary overflows its bin — the standard pack-with-
    * overflow discipline). Returns per-bin document and token counts.
    *
    * Packing is per-shard BY DESIGN: a global running sum would funnel the
    * corpus through one partition, and training shards pack independently
    * anyway — the window partitions by `source`, so state stays shard-local
    * and shards pack in parallel.
    */
  def packSequences(docs: DataFrame, budget: Long = 512): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("toks"))
    val prior = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("bin", floor(coalesce(sum(col("toks")).over(prior), lit(0L)) / budget))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy(col("source"), col("bin"))
  }

  /** Unigram language-model quality score: train an add-1-smoothed unigram
    * LM on the train split (token counts), score each eval document by its
    * mean token log-probability — the cheap perplexity-style filter a
    * pre-training pipeline runs before an actual LM pass (low avg log-prob
    * = gibberish / OOV-heavy / wrong-register text).
    *
    * Scale shape: the LM is a token-keyed aggregate; scoring joins eval
    * tokens to it ON the token key (co-located, like TF-IDF); the two
    * scalars (train size, vocab) broadcast. Determinism: each ln() is
    * rounded to 6 dp (JVM and DuckDB libm agree far past that), then
    * summed in DECIMAL — the engine-wide exact-sum convention — so the
    * mean is bit-identical cross-engine.
    */
  def lmScore(train: DataFrame, eval: DataFrame): DataFrame = {
    val trainToks = train.select(explode(TF.tokens(lower(col("text")))).as("t"))
    // the LM feeds both the scoring join and the vocab count — persist so
    // the tokenize+aggregate runs once (the house reused-intermediate rule)
    val lm = trainToks.groupBy(col("t")).agg(count(lit(1)).as("c")).persist()
    val totals = trainToks.agg(count(lit(1)).as("n"))
      .crossJoin(lm.agg(count(lit(1)).as("v")))
    val evalToks = eval.select(col("doc_id"),
      explode(TF.tokens(lower(col("text")))).as("t"))
    evalToks
      .join(lm, Seq("t"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"))
      .agg(
        round(
          sum(round(log((coalesce(col("c"), lit(0L)) + lit(1.0)) / (col("n") + col("v"))), 6)
            .cast("decimal(18,6)")).cast("double") / count(lit(1)), 4).as("avg_logp"),
        count(lit(1)).as("n_tok"))
      .orderBy("doc_id")
  }

  /** Materialize [[packSequences]] bins as training rows: within each
    * (shard, bin), member texts concatenate in doc_id order — the step
    * that turns the packing PLAN into actual fixed-budget training
    * sequences. Declared output carries the packed text's md5 and length
    * (the content fingerprint), keeping result rows bounded; the same
    * expression minus the md5 yields the raw sequences. Ordering inside a
    * bin is by doc_id via array_sort over (doc_id, text) structs —
    * deterministic regardless of aggregation order.
    */
  def packedTexts(docs: DataFrame, budget: Long = 512): DataFrame = {
    val toks = docs.select(col("source"), col("doc_id"), col("text"),
      TF.tokenCount(col("text")).cast("long").as("toks"))
    val prior = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks
      .withColumn("bin", floor(coalesce(sum(col("toks")).over(prior), lit(0L)) / budget))
      .groupBy(col("source"), col("bin"))
      .agg(collect_list(struct(col("doc_id"), col("text"))).as("parts"))
      .withColumn("packed",
        concat_ws(" ", transform(array_sort(col("parts")), p => p.getField("text"))))
      .select(col("source"), col("bin"),
        size(col("parts")).as("n_docs"),
        length(col("packed")).as("packed_chars"),
        md5(col("packed")).as("packed_md5"))
      .orderBy("source", "bin")
  }

  /** Balanced token-budget sharding: rank documents by token count
    * descending and deal them round-robin into `nShards` shards
    * (`shard = (rank-1) mod n`) — the deterministic LPT-style greedy that
    * keeps per-shard token totals within one max-document of each other,
    * so no trainer rank starves while another overruns. Returns per-shard
    * document and token counts (the balance audit); the same rank
    * expression tags full rows when materializing the shards.
    *
    * Scale shape: the global rank runs over a two-column (doc_id, tokens)
    * projection — a narrow sort of ~16 bytes/doc, fine to ~10⁹ docs; past
    * that, rank via `repartitionByRange` on tokens + per-partition offsets
    * (the zorderWrite discipline). The heavy text column never sorts.
    */
  def tokenShard(docs: DataFrame, nShards: Int = 8): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("toks"))
    val byToks = Window.orderBy(col("toks").desc, col("doc_id"))
    toks
      .withColumn("shard", (row_number().over(byToks) - 1) % nShards)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy(col("shard"))
  }

  /** [[tokenShard]]'s lake-scale form: the same global rank WITHOUT a
    * single-partition window. The (doc_id, tokens) projection is
    * range-partitioned on the rank order (Spark's range partitioner
    * samples boundaries deterministically per partition), ranked locally
    * per partition (one mapPartitions counter over the sorted stream), and
    * globalized by adding each partition's cumulative predecessor count —
    * a 32-row offset table, broadcast back. Equality with [[tokenShard]]
    * is exact (the composite (toks desc, doc_id) order is total), which is
    * why the declared query shares the window form's oracle verbatim. The
    * only single-partition step left is the window over the `parts`-row
    * offset table — O(partitions), not O(docs).
    */
  def tokenShardRanged(docs: DataFrame, nShards: Int = 8, parts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("toks"))
    val ranged = toks
      .repartitionByRange(parts, col("toks").desc, col("doc_id"))
      .sortWithinPartitions(col("toks").desc, col("doc_id"))
      .select(col("doc_id"), col("toks"), spark_partition_id().as("pid"))
    // consumed by both the offset aggregate and the final join: persist so
    // the range shuffle + sort + rank pass runs once
    val local = ranged.as[(Long, Long, Int)].mapPartitions { it =>
      var i = 0L
      it.map { case (id, t, pid) => i += 1; (id, t, pid, i) }
    }.toDF("doc_id", "toks", "pid", "local_rk").persist()
    val byPid = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(byPid), lit(0L)))
      .select(col("pid"), col("offset"))
    local
      .join(broadcast(offsets), "pid")
      .withColumn("shard",
        ((col("local_rk") + col("offset") - 1) % nShards).cast("int"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .orderBy(col("shard"))
  }

  /** Train/eval decontamination audit: for each eval document, how many of
    * its distinct word n-grams appear anywhere in the train corpus. The
    * standard pre-release check that benchmark text leaked into training
    * data (n-gram overlap, the GPT-3/PaLM-style heuristic).
    *
    * Scale shape: both sides explode to distinct n-grams; the train side
    * deduplicates map-side before the shuffle, and the probe is ONE
    * left-semi join keyed on the gram — no pairwise doc comparison. The
    * lake-scale variant is [[contaminationBloom]], which pre-drops eval
    * grams with a train-side bloom filter before the shuffle; this form
    * stays the exact correctness anchor.
    */
  def contamination(train: DataFrame, eval: DataFrame, n: Int = 8): DataFrame =
    contaminationImpl(train, eval, n, evalPreFilter = identity)

  /** [[contamination]] with a bloom-filter pre-pass — the lake-scale form.
    *
    * A bloom filter is built over the train grams in one pass (duplicates
    * are harmless to a set sketch, so no distinct shuffle on the build) and
    * applied to the EVAL gram stream before the semi-join shuffle: at 100 TB
    * the overwhelming majority of eval grams miss the train set, so the
    * filter drops them map-side and the shuffle carries only (rare) hits and
    * fpp-rate false positives. The exact semi-join downstream then removes
    * the false positives — the RESULT is bit-identical to [[contamination]]
    * by construction; only the shuffled volume changes. The filter object is
    * closure-captured (≈ task-binary broadcast, the same shape as the IVF
    * centroid matrix); size it via `fpp` and the one-pass distinct-gram
    * sketch below.
    */
  def contaminationBloom(
      train: DataFrame, eval: DataFrame, n: Int = 8, fpp: Double = 0.01): DataFrame = {
    val trainGramsRaw = train.select(explode(TF.shingles(col("text"), n)).as("g"))
    // sizing pass: HLL++ sketch of the distinct-gram count, no shuffle of
    // the grams themselves (partial sketches merge at the driver)
    val expected = math.max(1L,
      trainGramsRaw.agg(approx_count_distinct(col("g")).as("n")).head().getLong(0))
    val bloom = trainGramsRaw.stat.bloomFilter("g", expected, fpp)
    val mightContain = udf((g: String) => bloom.mightContain(g))
    contaminationImpl(train, eval, n, evalPreFilter = _.where(mightContain(col("g"))))
  }

  /** [[contamination]] with the big side never shuffled — the form a
    * 100 TB train corpus actually needs when the eval set is benchmark-
    * sized (it always is).
    *
    * The exact and bloom forms shuffle the TRAIN grams (explode ≈ n× the
    * text bytes, then a distinct exchange) — the dominant cost at lake
    * scale; the bloom pre-pass only trims the already-small eval side. This
    * form inverts the join: the distinct EVAL gram set broadcasts, the
    * train gram stream is semi-joined against it MAP-SIDE (a broadcast
    * hash join — zero train-side exchange), and only the matched grams
    * (⊆ eval gram set, so bounded by the broadcast size) are distinct'd
    * and broadcast back to count per-doc hits. The train corpus is read
    * once and never shuffled; the result is bit-identical to
    * [[contamination]] because `matched` is exactly the set of eval grams
    * present in train.
    */
  def contaminationBroadcast(train: DataFrame, eval: DataFrame, n: Int = 8): DataFrame = {
    val evalGramSet = eval
      .select(explode(TF.shingles(col("text"), n)).as("g")).distinct()
    val matched = train
      .select(explode(TF.shingles(col("text"), n)).as("g"))
      .join(broadcast(evalGramSet), Seq("g"), "left_semi")
      .distinct()
    contaminationTail(eval, n,
      evalGrams => evalGrams.join(broadcast(matched), Seq("g"), "left_semi"))
  }

  private def contaminationImpl(
      train: DataFrame, eval: DataFrame, n: Int,
      evalPreFilter: DataFrame => DataFrame): DataFrame = {
    val trainGrams = train
      .select(explode(TF.shingles(col("text"), n)).as("g")).distinct()
    contaminationTail(eval, n,
      evalGrams => evalPreFilter(evalGrams).join(trainGrams, Seq("g"), "left_semi"))
  }

  /** Shared tail: count per-doc eval grams surviving `hitFilter` (the
    * grams found in train) and flag contamination.
    */
  private def contaminationTail(
      eval: DataFrame, n: Int,
      hitFilter: DataFrame => DataFrame): DataFrame = {
    val evalGrams = eval
      .select(col("doc_id"), explode(TF.shingles(col("text"), n)).as("g"))
    val totals = eval
      .select(col("doc_id"),
        size(TF.shingles(col("text"), n)).cast("long").as("n_grams"))
      .where(col("n_grams") > 0)
    val hits = hitFilter(evalGrams)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("hit"))
    totals.join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("hit"), lit(0L)).as("n_hit"),
        (coalesce(col("hit"), lit(0L)) > 0).as("contaminated"))
      .orderBy("doc_id")
  }

  /** Per-document repetition profile: total / distinct word n-grams and the
    * highest single-gram frequency — the cheap loops-and-boilerplate signal
    * applied before perplexity-based quality filters. Ratios are exact
    * small-integer divisions, rounded with the engine-wide floor(x·1e4+0.5)
    * convention (see `Dedup.ngramJaccard`): pure-double rounding of an
    * identical quotient is bit-reproducible cross-engine, while BigDecimal
    * HALF_UP vs binary-expansion rounding diverge on .xxxx5 boundaries.
    */
  def repetitionStats(docs: DataFrame, n: Int = 3): DataFrame = {
    def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
    docs
      .select(col("doc_id"), TF.ngramProfile(col("text"), n).as("p"))
      .where(col("p.total") > 0)
      .select(col("doc_id"),
        col("p.total").cast("long").as("n_grams"),
        r4(lit(1.0) - col("p.distinct").cast("double") / col("p.total"))
          .as("rep_ratio"),
        r4(col("p.max_freq").cast("double") / col("p.total"))
          .as("top_freq_ratio"))
      .orderBy("doc_id")
  }

  /** Reproducible shuffled sample: order the corpus by a salted md5 of the
    * key and take the first `n` — the deterministic "shuffle" a training
    * run uses to fix data order across re-runs. Plans as a distributed
    * top-k (`TakeOrderedAndProject`), never a global sort: each partition
    * keeps its n smallest keys and the driver merges n·partitions rows.
    */
  /** Tokenizer-vocabulary coverage audit: build the top-`v` train-corpus
    * vocabulary by frequency (ties broken by term so the cut is total-
    * ordered and engine-portable) and measure, per eval source, how many
    * token OCCURRENCES fall outside it — the OOV rate a fixed-vocab
    * tokenizer would hit on that slice. High OOV concentrations flag
    * domains the tokenizer will fragment into bytes.
    *
    * Scale shape: the vocab is a top-k over the term-frequency table
    * (vocab-sized, not corpus-sized) — `TakeOrderedAndProject`, no full
    * sort — and joins back to the eval token stream as a BROADCAST
    * left-semi probe keyed on the term: the eval corpus never shuffles;
    * the per-source rollup is one map-side-combined hash aggregate.
    */
  def vocabCoverage(train: DataFrame, eval: DataFrame, v: Int = 256): DataFrame = {
    val vocab = train
      .select(explode(TF.tokens(lower(col("text")))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("t")).limit(v)
      .select(col("t"))
    val evalToks = eval.select(col("source"),
      explode(TF.tokens(lower(col("text")))).as("t"))
    evalToks
      .join(broadcast(vocab.withColumn("in_vocab", lit(1))), Seq("t"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_pct",
        round(lit(100.0) * col("n_oov") / col("n_tokens"), 4))
      .orderBy(col("source"))
  }

  /** Length-curriculum buckets: split the corpus into `n` equal-count
    * tiers by token length (ntile over the total order (toks, doc_id)) and
    * report each tier's document count and token-length envelope — the
    * short-to-long schedule curriculum training samples from.
    *
    * Scale shape: the ntile runs over a two-column (doc_id, toks)
    * projection — same narrow-sort envelope as [[tokenShard]], fine to
    * ~10⁹ docs; past that the rank comes from [[tokenShardRanged]]'s
    * range-partition + offset-table form and the bucket is
    * `(rank-1)*n/total`. The text column never sorts.
    */
  def lengthCurriculum(docs: DataFrame, n: Int = 4): DataFrame = {
    val toks = docs.select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("toks"))
    val byLen = Window.orderBy(col("toks"), col("doc_id"))
    toks
      .withColumn("bucket", ntile(n).over(byLen))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("toks")).as("min_toks"),
        max(col("toks")).as("max_toks"),
        sum(col("toks")).as("n_tokens"))
      .orderBy(col("bucket"))
  }

  /** [[lengthCurriculum]]'s lake-scale form: the same equal-count tiers
    * WITHOUT a single-partition ntile window. The global rank comes from
    * [[tokenShardRanged]]'s machinery — range-partition on the (toks,
    * doc_id) total order, local per-partition counters, a partitions-row
    * offset table broadcast back — and the bucket reproduces ntile's exact
    * tiling: with T rows, base = ⌊T/n⌋ and rem = T mod n, the first rem
    * buckets take base+1 rows each (`bucket = ⌈rk/(base+1)⌉` below the
    * cut, `rem + ⌈(rk-cut)/base⌉` above). The composite order is total,
    * so equality with the window form is exact and the oracle is shared
    * verbatim. The only single-partition windows left run over the
    * `parts`-row offset table — O(partitions), not O(docs).
    */
  def lengthCurriculumRanged(docs: DataFrame, n: Int = 4, parts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("toks"))
    val ranged = toks
      .repartitionByRange(parts, col("toks"), col("doc_id"))
      .sortWithinPartitions(col("toks"), col("doc_id"))
      .select(col("doc_id"), col("toks"), spark_partition_id().as("pid"))
    val local = ranged.as[(Long, Long, Int)].mapPartitions { it =>
      var i = 0L
      it.map { case (id, t, pid) => i += 1; (id, t, pid, i) }
    }.toDF("doc_id", "toks", "pid", "local_rk").persist()
    val byPid = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val allPids = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = local.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("offset", coalesce(sum(col("cnt")).over(byPid), lit(0L)))
      .withColumn("total", sum(col("cnt")).over(allPids))
      .select(col("pid"), col("offset"), col("total"))
    val base = floor(col("total") / n)
    val rem = col("total") - base * n
    val cut = rem * (base + 1)
    val rk = col("local_rk") + col("offset")
    local
      .join(broadcast(offsets), "pid")
      // greatest(base,1): base=0 only when T < n, where every row sits
      // below the cut and the otherwise-branch is dead — the guard just
      // keeps the unevaluated division well-defined
      .withColumn("bucket",
        when(rk <= cut, floor((rk - 1) / (base + 1)) + 1)
          .otherwise(rem + floor((rk - cut - 1) / greatest(base, lit(1L))) + 1)
          .cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("toks")).as("min_toks"),
        max(col("toks")).as("max_toks"),
        sum(col("toks")).as("n_tokens"))
      .orderBy(col("bucket"))
  }

  def shuffledSample(docs: DataFrame, salt: String, n: Int = 100): DataFrame =
    docs
      .withColumn("shuffle_key", md5(concat(col("doc_id").cast("string"), lit(salt))))
      .select(col("shuffle_key"), col("doc_id"))
      .orderBy(col("shuffle_key"), col("doc_id"))
      .limit(n)

  /** C4-style boilerplate stripping: cut each document into fixed-width
    * token segments (the generator's texts carry no line breaks, so
    * `width`-token windows stand in for lines), count each segment's
    * document frequency across the corpus, remove every occurrence of a
    * segment that appears in `minDf`+ distinct documents, and reassemble
    * the survivors in order. This is the "remove lines repeated across
    * pages" pass a web-scale corpus runs before dedup. Output per doc:
    * kept/dropped segment counts and the md5 of the cleaned text (rows
    * stay bounded regardless of document size).
    *
    * Scale shape: tokenize → segment explode (map-only) → segment-keyed
    * document-frequency aggregate (map-side combine) → equi-join back on
    * the SAME segment key → per-doc ordered reassembly whose collect_list
    * is bounded by document length, never corpus size. No all-pairs and
    * no driver state; at 100 TB the frequency table is the corpus's
    * unique-segment set, and the join back is hash-partitioned on the key
    * its aggregate already produced.
    */
  def boilerplateStrip(docs: DataFrame, width: Int = 4, minDf: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), "\\s+"), t => t =!= "").as("tk"))
      .where(size(col("tk")) > 0)
    val seg = toks.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0), ceil(size(col("tk")) / lit(width.toDouble)).cast("int") - 1),
        i => array_join(slice(col("tk"), i * width + 1, lit(width)), " ")))
        .as(Seq("seg_idx", "seg")))
    val dfreq = seg.groupBy(col("seg"))
      .agg(countDistinct(col("doc_id")).as("dfreq"))
    seg.join(dfreq, "seg")
      .groupBy(col("doc_id"))
      .agg(
        sum(when(col("dfreq") < minDf, 1L).otherwise(0L)).cast("int").as("n_kept"),
        sum(when(col("dfreq") >= minDf, 1L).otherwise(0L)).cast("int").as("n_dropped"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("dfreq") < minDf,
            struct(col("seg_idx"), col("seg"))))),
          p => p.getField("seg")), " ")).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  /** Overlapping sliding-window chunking (the RAG / context-window prep
    * op): fixed `width`-char chunks starting every `stride` chars, so
    * consecutive chunks share `width - stride` chars of context and no
    * span is lost at a boundary — the complement of the reference tiler's
    * non-overlapping splits (`LogChange.cs:99-175`, exact-reassembly
    * contract) for retrieval, where boundary-straddling answers need the
    * overlap. Chunk count is exact integer arithmetic
    * (`1 + ⌈(len−width)/stride⌉` for len > width, else 1) so both engines
    * agree row-for-row; declared output carries per-chunk length + md5,
    * keeping result width bounded while fingerprinting full content.
    *
    * Scale shape: embarrassingly parallel — one generator pass, no
    * shuffle; output is ~len/stride rows per doc, linear in corpus bytes.
    */
  def overlapChunks(docs: DataFrame, width: Int = 512, stride: Int = 448): DataFrame = {
    require(stride >= 1 && stride <= width, s"need 1 <= stride <= width")
    val len = length(col("text")).cast("long")
    val n = when(len <= width, lit(1L))
      .otherwise(((len - width + (stride - 1)) / stride).cast("long") + 1L)
    docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0L), n - 1),
          i => col("text").substr((i * stride + 1).cast("int"), lit(width))))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        length(col("chunk")).cast("long").as("chunk_chars"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** BPE merge-candidate counting (Sennrich et al. 2016, the first
    * iteration of byte-pair-encoding tokenizer training): corpus-wide
    * frequency of adjacent CHARACTER pairs, each occurrence weighted by
    * its word's corpus frequency. Returns the top-k pairs — the merge
    * table's first k candidates.
    *
    * Scale shape: exactly the real trainer's trick — collapse the corpus
    * to its distinct-word frequency dictionary FIRST (one keyed agg; the
    * dictionary is vocabulary-sized, not corpus-sized), then generate
    * pairs over the dictionary only. A 100 TB corpus has millions of
    * distinct words, not trillions; the pair explode runs over that.
    */
  def bpePairs(docs: DataFrame, k: Int = 20): DataFrame = {
    val wordFreq = docs
      .select(explode(TF.tokens(lower(col("text")))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .where(length(col("word")) >= 2)
    wordFreq
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(k)
  }

  /** BPE tokenizer TRAINING past the first pair count (Sennrich et al.
    * 2016 — the greedy merge loop `q_bpe_pairs` only priced one round
    * of): `merges` rounds over the distinct-word dictionary, each round
    * (1) counting adjacent symbol pairs weighted by word frequency,
    * (2) picking the max-count pair (ties → lexicographically smallest,
    * cross-engine deterministic), (3) merging it corpus-wide. Returns
    * the merge TRAJECTORY `(step, left_sym, right_sym, n)` — the actual
    * trained artifact a tokenizer ships.
    *
    * Representation: words ride a marked symbol encoding (`"he"` →
    * `"<h><e>"`), so the merge is a LITERAL string replace that is
    * boundary-safe by construction — a pair `"<a><b>"` can never
    * false-match symbol `"a"` followed by symbol `"bc"` (the closing
    * mark disagrees), and left-to-right non-overlapping replace
    * semantics (identical in Spark and DuckDB, which is what makes the
    * unrolled SQL twin exact) match the reference BPE implementations
    * on runs like `l l l → ll l`. The dictionary admits lowercase
    * alphabetic words (≥ 2 chars), keeping the mark characters out of
    * the symbol alphabet.
    *
    * Scale shape: the dictionary is VOCABULARY-sized, not corpus-sized
    * — built once (one tokenize + keyed count over the corpus, the
    * trainer's collapse) and cached; each round is ONE map-side-combined
    * aggregate over it, of which a single row (the merge rule — bytes)
    * reaches the driver, and the merge maps a codegen'd literal replace
    * over the dictionary. Nothing corpus-sized moves after round 0; 20
    * rounds = 20 bounded aggregates. This is exactly how production BPE
    * trainers scale (HuggingFace/SentencePiece collapse to the word
    * histogram first).
    */
  def bpeTrain(docs: DataFrame, merges: Int = 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict0 = docs
      .select(explode(TF.tokens(lower(col("text")))).as("word"))
      .where(col("word").rlike("^[a-z]{2,}$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(regexp_replace(col("word"), "(.)", "<$1>").as("w"), col("freq"))
      .persist() // every round's aggregate re-reads the dictionary
    var dict = dict0.select(col("w"), col("freq"))
    val trajectory = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= merges && !exhausted) {
      val syms = split(regexp_replace(col("w"), "^<|>$", ""), "><")
      val pairs = zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => concat(lit("<"), a, lit("><"), b, lit(">")))
      // one keyed aggregate per round; exactly one row reaches the driver
      val top = dict.select(col("freq"), explode(pairs).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true // corpus fully merged before budget
      else {
        val pair = top.head.getString(0)
        val Array(leftSym, rightSym) = pair.drop(1).dropRight(1).split("><", 2)
        trajectory += ((step, leftSym, rightSym, top.head.getLong(1)))
        // chained literal replaces on the cached dictionary: round i
        // scans dict0 through i cheap codegen'd string ops — no per-round
        // materialization, one cache entry for the whole loop
        dict = dict.withColumn("w", replace(col("w"), lit(pair), lit(pair.replace("><", ""))))
        step += 1
      }
    }
    dict0.unpersist()
    trajectory.toSeq.toDF("step", "left_sym", "right_sym", "n")
  }

  /** BPE ENCODING with a TRAINED merge list — the serve side of
    * [[bpeTrain]]'s artifact (apply the shipped merges to text, in
    * training order), completing the tokenizer loop: returns the
    * corpus-wide encoded-vocabulary histogram `(sym, n_tokens)`, top-k by
    * mass — the vocabulary-coverage view a tokenizer pipeline reports.
    *
    * Same marked-symbol representation and literal-replace semantics as
    * training (boundary-safe, left-to-right non-overlapping — identical
    * in Spark and DuckDB, so the unrolled SQL twin is exact), same
    * dictionary admission (lowercase alphabetic, ≥ 2 chars).
    *
    * Scale shape: the corpus collapses to its distinct-word frequency
    * dictionary FIRST (the [[bpeTrain]] collapse — encoding a word is a
    * pure function of the word, so the corpus never re-tokenizes per
    * merge); the merge chain is |merges| chained codegen'd literal
    * replaces over the vocabulary-sized dictionary; the histogram is one
    * keyed aggregate.
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)], k: Int = 30): DataFrame = {
    val encoded = applyBpeMerges(bpeDict(docs), merges)
    encoded
      .select(col("freq"),
        explode(split(regexp_replace(col("w"), "^<|>$", ""), "><")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("freq")).as("n_tokens"))
      .orderBy(col("n_tokens").desc, col("sym"))
      .limit(k)
  }

  /** The marked-symbol word-frequency dictionary [[bpeTrain]] /
    * [[bpeEncode]] collapse to — shared so the held-out serve below uses
    * byte-identical admission and representation.
    */
  private def bpeDict(docs: DataFrame): DataFrame = docs
    .select(explode(TF.tokens(lower(col("text")))).as("word"))
    .where(col("word").rlike("^[a-z]{2,}$"))
    .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    .select(regexp_replace(col("word"), "(.)", "<$1>").as("w"), col("freq"))

  /** Replay a trained merge list over a dictionary, in training order —
    * |merges| chained codegen'd literal replaces (the [[bpeTrain]]
    * semantics, boundary-safe via the angle marking).
    */
  private def applyBpeMerges(dict: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(dict) { case (d, (l, r)) =>
      d.withColumn("w", replace(col("w"), lit(s"<$l><$r>"), lit(s"<$l$r>")))
    }

  /** BPE ENCODING OF HELD-OUT TEXT — the actual serve shape: the merges
    * were trained on `trainDocs` ([[bpeTrain]]), and here they encode an
    * EVAL split the trainer never saw, reporting the eval symbol
    * histogram with an `in_vocab` flag against the REAL trained
    * vocabulary (the distinct symbols of the encoded TRAIN dictionary).
    * Symbols with `in_vocab = false` are the OOV mass a tokenizer
    * pipeline alarms on — eval character sequences the training corpus's
    * merge rules leave in fragments the trained vocab doesn't contain.
    *
    * Scale shape: both splits collapse to their word dictionaries first
    * (encoding is a pure function of the word); the trained-vocab
    * membership test is a broadcast left join of the (bounded,
    * vocabulary-sized) symbol sets — eval text is never re-scanned per
    * merge, and nothing corpus-sized shuffles.
    */
  def bpeEncodeHeldout(trainDocs: DataFrame, evalDocs: DataFrame,
                       merges: Seq[(String, String)], k: Int = 30): DataFrame = {
    def symsCol =
      explode(split(regexp_replace(col("w"), "^<|>$", ""), "><")).as("sym")
    val trainVocab = applyBpeMerges(bpeDict(trainDocs), merges)
      .select(symsCol).distinct()
      .withColumn("in_train", lit(true))
    applyBpeMerges(bpeDict(evalDocs), merges)
      .select(col("freq"), symsCol)
      .groupBy(col("sym")).agg(sum(col("freq")).as("n_tokens"))
      .join(broadcast(trainVocab), Seq("sym"), "left")
      .select(col("sym"), col("n_tokens"),
        coalesce(col("in_train"), lit(false)).as("in_vocab"))
      .orderBy(col("n_tokens").desc, col("sym"))
      .limit(k)
  }

  /** PMI collocations over adjacent word bigrams:
    * `pmi = ln(n_ab · n_uni² / (n_bigrams · n_a · n_b))`, reported for
    * bigrams with support ≥ `minCount` — the classic collocation /
    * phrase-mining statistic (Church & Hanks 1990). Engine-portable float
    * discipline: counts are exact longs, the ratio is assembled in one
    * fixed operation order, and the single `ln` rounds to 4 dp.
    *
    * Scale shape: two keyed aggregates (unigrams, bigrams) over the token
    * stream — both map-side-combine shuffles on the gram key; the scalar
    * totals ride in as a broadcast 1-row cross join. No pair space beyond
    * bigrams that actually occur.
    */
  def pmiBigrams(docs: DataFrame, k: Int = 20, minCount: Long = 20): DataFrame = {
    // both scalar totals from ONE regexp_count scan — no tokenize-explode
    // job for a number: Σ tokens and Σ max(tokens−1, 0) are exactly n_uni
    // and n_bigrams (lowercasing doesn't change token boundaries)
    val scalars = docs
      .select(TF.tokenCount(col("text")).cast("long").as("nt"))
      .agg(sum(col("nt")).cast("double").as("n_uni"),
           sum(greatest(col("nt") - 1, lit(0L))).cast("double").as("n_bi"))
    // count-preserving JVM n-gram loop (TF.ngrams); grouping on the joined
    // "a b" string equals grouping on the pair (words contain no spaces),
    // and the split back to (a, b) runs on |bi| rows, not the gram stream.
    // Persisted: bi feeds its own term set and the final join.
    val bi = docs
      .select(explode(TF.ngrams(lower(col("text")), 2)).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minCount)
      .select(substring_index(col("g"), " ", 1).as("a"),
              substring_index(col("g"), " ", -1).as("b"), col("n_ab"))
      .persist()
    // unigram counts ONLY for the terms the surviving bigrams reference:
    // the token stream is semi-joined map-side against the broadcast term
    // set BEFORE the grouping shuffle (the bm25 postings shape) — the
    // vocabulary-sized aggregate a naive form would shuffle (100M+ terms
    // at lake scale) never exists, and nothing vocabulary-sized is ever
    // broadcast either
    val biTerms = bi.select(col("a").as("w"))
      .union(bi.select(col("b").as("w"))).distinct()
    val uniNeeded = docs
      .select(explode(TF.tokens(lower(col("text")))).as("w"))
      .join(broadcast(biTerms), Seq("w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("n_w"))
      .persist()
    bi
      .join(broadcast(uniNeeded.select(col("w").as("a"), col("n_w").as("n_a"))), "a")
      .join(broadcast(uniNeeded.select(col("w").as("b"), col("n_w").as("n_b"))), "b")
      .crossJoin(broadcast(scalars))
      .withColumn("pmi", round(log(
        (col("n_ab") * col("n_uni") * col("n_uni")) /
          (col("n_bi") * col("n_a") * col("n_b"))), 4))
      .select(col("a"), col("b"), col("n_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("a"), col("b"))
      .limit(k)
  }

  /** BM25 document retrieval (Robertson/Spärck Jones; the Okapi form with
    * the +1 idf floor Lucene uses): top-k documents for a bag of query
    * terms, `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`
    * with `idf = ln(1 + (N−df+0.5)/(df+0.5))`.
    *
    * Engine-portable float discipline: the one transcendental (`ln`) is
    * rounded to 6 dp the moment it's computed; every other step is IEEE
    * double arithmetic written in the same operation order as the oracle,
    * then each term's score is fixed to decimal(18,8) so the per-doc sum
    * is addition-order-free; the final score rounds to 4 dp.
    *
    * Scale shape: the corpus-wide work is two keyed aggregates (doc
    * lengths; per-doc query-term tf AFTER filtering the token stream to
    * the query terms — only matching postings ever shuffle). df and the
    * global length stats ride in as broadcasts of ≤|terms| rows, and the
    * result is a TakeOrderedAndProject, never a full sort.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 20,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // doc length via regexp_count, NOT a tokenize-explode-count pass: the
    // length pass needs only the count of \S+ runs (identical value), and
    // skipping the second array materialization halved the sf0.1 time
    // persisted: dl feeds the stats broadcast job AND the final join — one
    // regexp scan instead of two (same discipline as tf below)
    val dl = docs.select(col("doc_id"),
      TF.tokenCount(col("text")).cast("long").as("dl"))
      .persist()
    val stats = dl.agg(
      count(lit(1)).cast("double").as("n_docs"),
      sum(col("dl")).cast("double").as("total_toks"))
    // persisted: tf feeds both the dfreq broadcast job and the final join —
    // without it each job re-runs the tokenize-explode over the corpus
    val tf = docs.select(col("doc_id"),
        explode(TF.tokens(lower(col("text")))).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
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
}
