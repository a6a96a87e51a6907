package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline.
  *
  * Everything here is built from codegen'd Catalyst expressions
  * (`org.apache.spark.sql.functions`) — no UDFs on these paths — so at
  * 100 TB the whole stage stays inside WholeStageCodegen and the Parquet
  * scan keeps pushdown + vectorized reads. The only UDF in the text stack
  * is `simhash64` (bit-bucket voting is branchy; a single-pass JVM loop
  * beats a 64-expression tree).
  */
object TextFunctions {

  /** Whitespace tokens, empties dropped (stable under leading/trailing space). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Token count = number of non-whitespace runs. `regexp_count` is a native
    * codegen'd expression; the `size(filter(split(...)))` form goes through
    * interpreted higher-order functions and measured ~15× slower on the
    * text-stats aggregate.
    */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** "BPE-ish" subword token count: words, numbers, and single punctuation
    * marks each count as a token — a regex approximation of byte-pair
    * tokenizer granularity for budget estimation.
    */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^A-Za-z0-9])|(?<=[^A-Za-z0-9])"), t => t =!= lit("") && t =!= lit(" ")))

  /** Email-address regex shared with the DuckDB oracle twin — restricted to
    * the Java∩RE2 common dialect (no lookaround, no backrefs) so both
    * engines match identically.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone with the +1-555 test prefix (same dialect
    * constraint as [[EmailRe]]).
    */
  val PhoneRe = "\\+1-555-[0-9]{4}"

  /** PII scrub: replace every email then every phone with typed markers —
    * the standard pre-training redaction pass. Pure nested `regexp_replace`
    * (codegen'd, scan-side safe); replacement order is part of the
    * contract and mirrored in the oracle.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")

  /** Heuristic quality score in [0,1]: blends length, alpha ratio,
    * punctuation density, mean word length, and stopword presence — the
    * standard cheap pre-filters applied before expensive LLM-data scoring.
    */
  def qualityScore(text: Column): Column = {
    val len      = length(text).cast("double")
    val nTok     = tokenCount(text).cast("double")
    val alpha    = length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double")
    val alphaRatio = when(len > 0, alpha / len).otherwise(lit(0.0))
    val meanWord   = when(nTok > 0, len / nTok).otherwise(lit(0.0))
    val wordShape  = lit(1.0) - least(abs(meanWord - lit(5.0)) / lit(10.0), lit(1.0))
    val lenScore   = least(len / lit(200.0), lit(1.0))
    val stopHits   = size(array_intersect(tokens(lower(text)), lit(StopwordsEn.toArray)))
    val stopScore  = least(stopHits.cast("double") / lit(3.0), lit(1.0))
    round(lit(0.3) * lenScore + lit(0.3) * alphaRatio + lit(0.2) * wordShape + lit(0.2) * stopScore, 4)
  }

  private val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  private val StopwordsEnSet = StopwordsEn.toSet

  /** One-pass text profile: quality score, whitespace token count, BPE-ish
    * subword count, and rolling fingerprint, computed in a single traversal.
    * This is THE hot loop of a training-data pipeline (every document goes
    * through scoring), so it is a JVM function, not four expression trees:
    * the expression form (regexp passes + interpreted array_intersect +
    * interpreted aggregate fold) measured ~9× slower.
    *
    * Semantics match the expression versions: quality blends length, alpha
    * ratio, mean word length, and distinct-stopword presence; bpeish counts
    * alnum runs and single non-alnum non-space chars; fingerprint folds
    * token FNV hashes through splitmix64 (order-sensitive).
    */
  def textProfile(text: String): (Double, Int, Int, Long) = {
    if (text == null) return (0.0, 0, 0, 1469598103934665603L)
    val len = text.length
    var nTok = 0; var nBpeish = 0; var alpha = 0
    var fp = 1469598103934665603L
    val stopSeen = scala.collection.mutable.HashSet[String]()
    var i = 0
    var tokStart = -1 // current whitespace-token start
    var runStart = -1 // current alnum-run start (bpeish)
    while (i <= len) {
      val c = if (i < len) text.charAt(i) else ' '
      val isWs = Character.isWhitespace(c)
      val isAlnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
      // i < len: the i == len iteration is a sentinel space that must flush
      // the trailing token below without counting as an alpha character
      if (i < len && ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == ' ')) alpha += 1
      // whitespace tokens + fingerprint + stopwords
      if (!isWs && tokStart < 0) tokStart = i
      if (isWs && tokStart >= 0) {
        val tok = text.substring(tokStart, i)
        nTok += 1
        fp = splitmix64(fp ^ fnv1a64(tok))
        val lower = tok.toLowerCase
        if (StopwordsEnSet.contains(lower)) stopSeen += lower
        tokStart = -1
      }
      // bpeish: alnum runs count 1; other non-space chars count 1 each
      if (isAlnum && runStart < 0) runStart = i
      if (!isAlnum && runStart >= 0) { nBpeish += 1; runStart = -1 }
      if (i < len && !isAlnum && !isWs && c != ' ') nBpeish += 1
      i += 1
    }
    val dlen = len.toDouble
    val alphaRatio = if (len > 0) alpha / dlen else 0.0
    val meanWord = if (nTok > 0) dlen / nTok else 0.0
    val wordShape = 1.0 - math.min(math.abs(meanWord - 5.0) / 10.0, 1.0)
    val lenScore = math.min(dlen / 200.0, 1.0)
    val stopScore = math.min(stopSeen.size / 3.0, 1.0)
    // floor(x*1e4 + 0.5)/1e4, NOT BigDecimal HALF_UP: the raw score is
    // bit-identical across engines (integer inputs, fixed IEEE op order), so
    // this fully-double rounding is too — whereas decimal-expansion HALF_UP
    // vs DuckDB's round() disagree on exact .xxxx5 boundaries
    val q = math.floor((0.3 * lenScore + 0.3 * alphaRatio + 0.2 * wordShape + 0.2 * stopScore)
      * 10000.0 + 0.5) / 10000.0
    (q, nTok, nBpeish, fp)
  }

  /** Column form of [[textProfile]]: struct(quality, n_tokens, n_bpeish,
    * fingerprint).
    */
  private val textProfileUdf = udf((t: String) => textProfile(t))

  def textProfileCol(text: Column): Column =
    textProfileUdf(text)
      .cast("struct<quality:double,n_tokens:int,n_bpeish:int,fingerprint:bigint>")

  /** Per-language stopword marker sets for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: langid at lake scale is a cheap first pass,
    * refined downstream.
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "for", "with", "this"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "como", "para"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour", "que", "sur", "avec"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "für", "auf"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "就", "不", "人"),
  )

  // word → every language list containing it ("que" is both es and fr)
  private val MarkerIndex: Map[String, List[Int]] = {
    val m = scala.collection.mutable.HashMap[String, List[Int]]()
    LangMarkers.zipWithIndex.foreach { case ((_, markers), idx) =>
      markers.foreach(w => m(w) = idx :: m.getOrElse(w, Nil))
    }
    m.toMap
  }

  /** Heuristic language-ID: count DISTINCT marker-token hits per language in
    * one pass over the tokens; highest count wins, ties broken by language
    * order; no hits → "und". JVM loop for the CodegenFallback reason above
    * (measured 6.6 ms/doc as an expression tree).
    */
  def langIdScala(text: String): String = {
    if (text == null) return "und"
    val hits = Array.fill(LangMarkers.length)(scala.collection.mutable.HashSet[String]())
    text.toLowerCase.split("\\s+").foreach { t =>
      MarkerIndex.getOrElse(t, Nil).foreach(idx => hits(idx) += t)
    }
    var best = -1; var bestHits = 0
    var i = 0
    while (i < hits.length) {
      if (hits(i).size > bestHits) { bestHits = hits(i).size; best = i }
      i += 1
    }
    if (best < 0) "und" else LangMarkers(best)._1
  }

  private val langIdUdf = udf((t: String) => langIdScala(t))

  def langId(text: Column): Column = langIdUdf(text)

  /** Rolling 64-bit document fingerprint over tokens: fold the accumulator
    * through `xxhash64(acc, token)` — order-sensitive like a Rabin-Karp
    * rolling hash, but free of the multiply-overflow that ANSI mode rejects.
    * Pure expressions, codegen'd.
    */
  def fingerprint(text: Column): Column =
    aggregate(tokens(text), lit(1469598103934665603L),
      (acc, t) => xxhash64(acc, t))

  /** FNV-1a 64-bit — deterministic token hash shared by simhash and tests. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** SimHash-64 of a token sequence: each token votes ±1 per bit of its
    * 64-bit hash; the sign vector is the fingerprint. Near-duplicate docs
    * land within a small Hamming distance.
    */
  def simhash64(tokens: Seq[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b   = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  private val simhashUdf = udf((toks: Seq[String]) => simhash64(toks))

  /** Column form of simhash: text → 64-bit signature. */
  def simhash(text: Column): Column = simhashUdf(tokens(text))

  /** Word n-gram shingles (distinct) — the unit set for exact Jaccard.
    * JVM loop for the same CodegenFallback reason as `minhashSigScala`.
    */
  def shinglesScala(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    val seen = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      seen += sb.toString
      i += 1
    }
    seen.toArray
  }

  // parameterized UDFs are memoized per parameter value so repeated query
  // construction doesn't re-instantiate them (planning overhead only, but
  // consistent with the hoisted vals above)
  private val shinglesUdfs =
    new scala.collection.concurrent.TrieMap[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Column form of distinct word n-gram shingles. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesUdfs.getOrElseUpdate(n, udf((t: String) => shinglesScala(t, n))).apply(text)

  /** Word n-grams WITH multiplicities (document order) — the
    * count-preserving sibling of [[shinglesScala]] for collocation /
    * bigram statistics, same JVM-loop rationale (the transform/sequence/
    * element_at expression form is CodegenFallback and measured ~3×
    * slower on the bigram explode).
    */
  def ngramsScala(text: String, n: Int): Array[String] = {
    if (text == null) return Array.empty
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return Array.empty
    val out = new Array[String](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = sb.toString
      i += 1
    }
    out
  }

  private val ngramsUdfs =
    new scala.collection.concurrent.TrieMap[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Column form of count-preserving word n-grams. */
  def ngrams(text: Column, n: Int): Column =
    ngramsUdfs.getOrElseUpdate(n, udf((t: String) => ngramsScala(t, n))).apply(text)

  /** splitmix64 finalizer — cheap, well-mixed 64-bit permutation hash. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Single-pass MinHash: tokenize, slide an n-word shingle window, and for
    * each shingle derive `perms` permuted hashes (one FNV base hash +
    * splitmix64 seed mixes), keeping per-permutation minima. Duplicate
    * shingles can't change a minimum, so no distinct pass is needed.
    *
    * Deliberately a JVM loop, not an expression tree: Spark's higher-order
    * array functions are CodegenFallback (interpreted), and the nested
    * per-seed `transform` version measured 62 ms/doc — this loop is ~1000×
    * faster and allocation-free per shingle. Returns null when the document
    * has fewer than `n` tokens (no shingles).
    */
  def minhashSigScala(text: String, n: Int, perms: Int): Array[Long] = {
    if (text == null) return null
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return null
    val mins = Array.fill(perms)(Long.MaxValue)
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val base = fnv1a64(sb.toString)
      var p = 0
      while (p < perms) {
        val h = splitmix64(base ^ (p.toLong * 0xd6e8feb86659fd93L))
        if (h < mins(p)) mins(p) = h
        p += 1
      }
      i += 1
    }
    mins
  }

  private val minhashUdfs =
    new scala.collection.concurrent.TrieMap[(Int, Int), org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Column form of single-pass MinHash; null for docs with no shingles. */
  def minhashSig(text: Column, n: Int = 3, perms: Int = 32): Column =
    minhashUdfs.getOrElseUpdate((n, perms),
      udf((t: String) => Option(minhashSigScala(t, n, perms)))).apply(text)

  // null-propagating like the expression form it replaced: minhashSig is
  // null for docs with no shingles, and a null signature must yield a null
  // count (dropped pair), not an NPE-failed task
  private val sigEqUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
    if (a == null || b == null) None
    else {
      var i = 0; var c = 0
      val n = math.min(a.length, b.length)
      while (i < n) { if (a(i) == b(i)) c += 1; i += 1 }
      Some(c)
    }
  }

  /** Equal-position count between two signatures — the numerator of the
    * signature-estimated Jaccard. JVM loop for the same CodegenFallback
    * reason as `minhashSigScala`: the `zip_with`+`filter`+`size` expression
    * form interprets (and allocates a boolean array) per candidate pair.
    */
  def sigEqCount(a: Column, b: Column): Column = sigEqUdf(a, b)

  /** Word n-gram multiset profile: (total, distinct, max single-gram
    * frequency) in one pass — the repetition signal. Same single-pass JVM
    * shape as `minhashSigScala` (the explode-and-regroup expression form
    * shuffles every gram; this shuffles three ints per doc).
    */
  def ngramProfileScala(text: String, n: Int): (Int, Int, Int) = {
    if (text == null) return (0, 0, 0)
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return (0, 0, 0)
    val freq = new java.util.HashMap[String, Int]()
    var i = 0
    var total = 0
    var maxFreq = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      val c = freq.merge(sb.toString, 1, (a, b) => a + b)
      if (c > maxFreq) maxFreq = c
      total += 1
      i += 1
    }
    (total, freq.size, maxFreq)
  }

  private val ngramProfileUdfs =
    new scala.collection.concurrent.TrieMap[Int, org.apache.spark.sql.expressions.UserDefinedFunction]

  /** Column form of the n-gram profile: struct(total, distinct, max_freq). */
  def ngramProfile(text: Column, n: Int = 3): Column = {
    val u = ngramProfileUdfs.getOrElseUpdate(n, udf { (t: String) =>
      val (total, dist, mx) = ngramProfileScala(t, n)
      NgramProfile(total, dist, mx)
    })
    u(text)
  }

  /** Public: the UDF encoder constructs it reflectively. */
  case class NgramProfile(total: Int, distinct: Int, max_freq: Int)
}
