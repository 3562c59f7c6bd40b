package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.Hashing

/**
 * Text-analysis operators for training-data pipelines: language ID,
 * quality scoring, token counting, document fingerprinting. All pure
 * built-in expressions (codegen'd, no UDFs) so a 100 TB corpus pays one
 * narrow pass; every formula is integer/double arithmetic the DuckDB
 * oracle reproduces bit-for-bit.
 */
object TextAnalysis {

  /** Marker-word profiles for the n-gram-heuristic language ID. Ordered:
   * ties break toward the earlier entry (then 'und' when nothing hits). */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "en"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "dans"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Language ID: count marker-word hits per profile over whitespace
   * tokens; emit the best-scoring language, 'und' if nothing matched.
   * Ties resolve by profile order (deterministic). */
  def langId(text: Column): Column =
    langIdFromTokens(Dedup.tokens(lower(text)))

  /**
   * FEATURE-HASHED text embedding (the hashing trick — Weinberger et
   * al. 2009, the fastText/Vowpal-Wabbit input layer): every token
   * hashes to a bucket in [0, dim) and contributes ±1 (the sign comes
   * from the hash's next bit — the trick that makes the estimator
   * unbiased), giving each document a dim-wide signed term-count
   * vector. This is the TEXT → VECTOR-SPACE bridge that lets every
   * similarity operator in the library (cosine top-k, LSH near-dup,
   * SemDeDup, MMR, k-NN graph) run directly on raw text with no
   * external embedding model — the degenerate-but-real baseline a
   * production pipeline starts from before a learned encoder exists.
   *
   * Returned UN-normalized as `array<float>`: the signed counts are
   * integers far below 2²⁴, so the float representation is EXACT (and
   * the DuckDB oracle rebuilds it bit-for-bit), while cosine — the
   * metric every downstream op uses — normalizes inherently. Row-local
   * (one codegen kernel over the token-hash array, no explode, no
   * shuffle — [[graft.functions.HashedEmbed]]; the sign comes from
   * hash bit 30, integer-exact where a double division of a 60-bit
   * hash would not be): at 100 TB the embedding pass fuses into
   * whatever narrow scan follows it, O(tokens + dim) per document with
   * one array allocation per row.
   */
  def hashedEmbedding(toks: Column, dim: Int): Column = {
    require(dim >= 1 && dim <= (1 << 30), s"bad embedding dim $dim")
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.HashedEmbed(
        org.apache.spark.sql.graft.ColumnBridge.expression(
          transform(toks, t => Hashing.h60(t))), dim))
  }

  /** Language ID from pre-lowercased tokens. Pass an attribute (aliased
   * column): the token array is referenced once per profile. */
  def langIdFromTokens(toks: Column): Column = {
    val scored = LangProfiles.zipWithIndex.map { case ((lang, words), i) =>
      val hits = size(filter(toks, t => t.isin(words.map(lit): _*)))
      struct(hits.as("hits"), lit(LangProfiles.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Within-document repetition ratio: 1 - distinct/total word k-grams —
   * the boilerplate/template detector (C4-style repetition filter).
   * Documents shorter than k words score 0. */
  def repetitionRatio(toks: Column, k: Int = 3): Column = {
    val grams = when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
    when(grams.isNull, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(grams)).cast(DoubleType) /
        size(grams).cast(DoubleType))
  }

  /** Token count, whitespace definition. */
  def tokenCountWs(text: Column): Column = size(Dedup.tokens(text))

  /** BPE-ish token count: alphabetic runs count ceil(len/4) subword
   * units, digits and other symbols one each — a deterministic stand-in
   * for a real tokenizer's piece count. */
  def tokenCountBpe(text: Column): Column = {
    val words = regexp_extract_all(text, lit("[A-Za-z]+"), lit(0))
    val wordPieces = aggregate(words, lit(0L),
      (acc, w) => acc + ceil(length(w) / lit(4.0)).cast(LongType))
    val others = length(regexp_replace(text, "[A-Za-z\\s]+", ""))
    wordPieces + others
  }

  /** Quality features + composite score (length / punctuation / stopword
   * / repetition heuristics, cf. C4-style corpus filtering). */
  def qualityFeatures(text: Column): Column = {
    val toks = Dedup.tokens(text)
    val nChars = length(text).cast(DoubleType)
    val nWords = size(toks).cast(DoubleType)
    val meanWordLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast(DoubleType) / nWords
    val punctRatio = length(regexp_replace(text, "[^.,;:!?]", ""))
      .cast(DoubleType) / nChars
    val stopRatio = size(filter(toks, t =>
      lower(t).isin(LangProfiles.flatMap(_._2).distinct.map(lit): _*)))
      .cast(DoubleType) / nWords
    val distinctRatio = size(array_distinct(toks)).cast(DoubleType) / nWords
    struct(nWords.cast(LongType).as("n_words"),
      meanWordLen.as("mean_word_len"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"),
      distinctRatio.as("distinct_ratio"))
  }

  /** Classifier-head quality filter (the fasttext/logreg filtering stage
   * of CCNet/GPT-3-style pipelines): a linear head over the
   * interpretable [[qualityFeatures]], squashed by the RATIONAL fast
   * sigmoid `0.5·(1 + z/(1+|z|))` — pure arithmetic, so the score is
   * bit-identical across engines (a transcendental `exp()` sigmoid is
   * not: libm rounding differs). Weights are deployment constants — a
   * trained head exports to exactly this shape; only the numbers change.
   * Takes the ALIASED feature struct (compute `qualityFeatures` once
   * behind an alias; referencing it five times inline would re-tokenize
   * per term). */
  val QualityBias: Double = -3.6
  val QualityWeights: Seq[(String, Double)] = Seq(
    "n_words" -> 0.015,
    "mean_word_len" -> 0.35,
    "punct_ratio" -> -8.0,
    "stopword_ratio" -> 4.0,
    "distinct_ratio" -> 2.0)

  def classifierLogit(features: Column): Column =
    QualityWeights.foldLeft(lit(QualityBias): Column) { case (acc, (name, w)) =>
      acc + lit(w) * features.getField(name).cast(DoubleType)
    }

  /** `0.5·(1 + z/(1+|z|))` ∈ (0,1), monotone in z, engine-exact. */
  def fastSigmoid(z: Column): Column =
    lit(0.5) * (lit(1.0) + z / (lit(1.0) + abs(z)))

  /**
   * Language-model likelihood scoring — the perplexity-filter stage of
   * CCNet-style pipelines, as a char-bigram model: score = mean over
   * positions of the Laplace-smoothed in-context bigram probability
   * `(count(c_i c_{i+1}) + 1) / (count(c_i ·) + V)`. Log-free on
   * purpose: the mean probability is a monotone proxy for (negative)
   * perplexity, and pure arithmetic stays bit-identical across engines
   * where `log()`'s libm rounding does not.
   *
   * The model LIVES AS A DATAFRAME, never as plan literals: a
   * charset²-sized map (10⁷-10⁸ entries on a CJK/multilingual corpus)
   * embedded via `typedLit` would blow up the driver, the plan, and
   * every task binary. Here the counts stay distributed — scoring
   * reduces each doc to its DISTINCT (bigram, occurrence-count) pairs
   * first (an order-of-magnitude fewer rows than per-position
   * exploding), joins the counts frames (threshold-decided: an ASCII
   * model broadcasts, a CJK model shuffles on the bigram key), and
   * folds `cnt · p(bigram)` back per doc in BIGRAM-sorted order, so
   * the mean is the same sequential left fold as the oracle's
   * `list_reduce` over an identically-ordered list. A production run
   * trains on a TRUSTED reference corpus instead of the corpus being
   * scored — same scoring join, different training frame.
   */

  /** All char bigrams of a text column in one linear byte pass
   * ([[graft.functions.CharNGrams]]) — the `transform(sequence, i =>
   * substr(text, i, 2))` formulation it replaces re-seeks codepoint i
   * from byte 0 per element (O(len²) per doc) and evaluates its
   * lambda interpreted, which measured as a 10× JIT-maturity swing on
   * the x16 bench. */
  private def charBigrams(text: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CharNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(text), 2))

  /** Train: exact char-bigram counts `(b, bcnt)` over a corpus — one
   * explode + count aggregation, map-side combined, never collected. */
  def bigramCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(length(col(textCol)) >= 2)
      .select(explode(charBigrams(col(textCol))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("bcnt"))

  /** Score `docs(idCol)` against a trained counts frame: mean
   * Laplace-smoothed bigram probability per doc. Char-context counts
   * and vocabulary size derive from the bigram frame itself
   * (`count(c·) = Σ count(c*)`, `V` = distinct bigrams — a 1-row
   * frame, the only scalar in the plan). Docs shorter than 2 chars are
   * excluded (no bigram positions). */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    bigramCounts: DataFrame): DataFrame = {
    val mc = bigramCounts.groupBy(substring(col("b"), 1, 1).as("_c"))
      .agg(sum(col("bcnt")).as("ccnt"))
    val v = bigramCounts.agg(count(lit(1)).as("v"))
    // per-doc DISTINCT bigrams with occurrence counts: the join and the
    // per-doc fold see ~charset-bounded rows per doc, not one per
    // position (the partial count aggregation collapses map-side)
    val perDoc = docs.filter(length(col(textCol)) >= 2)
      .select(col(idCol), (length(col(textCol)) - 1).as("_n"),
        explode(charBigrams(col(textCol))).as("_b"))
      .groupBy(col(idCol), col("_n"), col("_b"))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_c", substring(col("_b"), 1, 1))
    perDoc
      .join(bigramCounts.withColumnRenamed("b", "_b"), Seq("_b"), "left")
      .join(mc, Seq("_c"), "left")
      .crossJoin(broadcast(v)) // 1-row scalar — the audited pattern
      .select(col(idCol), col("_n"), col("_b"),
        (col("_cnt") * ((coalesce(col("bcnt"), lit(0L)) + lit(1.0)) /
          (coalesce(col("ccnt"), lit(0L)) + col("v")))).as("_t"))
      .groupBy(col(idCol), col("_n"))
      .agg(collect_list(struct(col("_b"), col("_t"))).as("_ts"))
      .select(col(idCol),
        (aggregate(array_sort(col("_ts")), lit(0.0),
          (acc, x) => acc + x.getField("_t")) / col("_n")).as("lm_score"))
  }

  /** Composite quality score in [0,1]: reward mid-length docs, stopword
   * presence, lexical diversity; penalize punctuation walls. Weights are
   * arbitrary but fixed — the oracle reproduces them exactly. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text)
    val lenScore = least(f.getField("n_words").cast(DoubleType) / lit(50.0), lit(1.0))
    val divScore = f.getField("distinct_ratio")
    val stopScore = least(f.getField("stopword_ratio") * 5.0, lit(1.0))
    val punctPenalty = least(f.getField("punct_ratio") * 10.0, lit(1.0))
    (lenScore * 0.3 + divScore * 0.4 + stopScore * 0.3) * (lit(1.0) - punctPenalty * 0.5)
  }

  /** PII patterns for detection/redaction — emails, international-ish
   * phone numbers, 16-digit card-like numbers. (ASCII regex classes so
   * Java and RE2-style engines agree.) */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone" -> "\\+[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{4}",
    "card" -> "[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}")

  /** Count PII matches of one category. */
  def piiCount(text: Column, category: String): Column =
    size(regexp_extract_all(text,
      lit(PiiPatterns.toMap.apply(category)), lit(0)))

  /** Redact all PII categories (each replaced by its `[CATEGORY]` tag) —
   * the scrubbing stage of a training-data pipeline. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (name, pat)) =>
      regexp_replace(c, pat, s"[${name.toUpperCase}]")
    }

  /** Deterministic hash-based sampling decision: keep a row iff
   * h(text) mod 1000 < rate*1000. Reproducible across engines and runs
   * (unlike `DataFrame.sample`), stable under re-partitioning, and
   * per-stratum rates compose by branching on the stratum column —
   * how large corpus pipelines downsample over-represented sources. */
  def hashSampleKeep(text: Column, rate: Double): Column =
    pmod(graft.functions.Hashing.h60(text), lit(1000L)) < (rate * 1000).toLong

  /**
   * Per-domain quota sampling: keep at most `cap` documents per domain,
   * chosen by HASH order (h60 of "domain|id") with id tiebreak — the
   * standard cap on over-represented sources in a pretraining mix.
   * Hash order makes the selection deterministic, reproducible across
   * runs/engines, and unbiased within the domain (id order would favor
   * old documents; random order would not reproduce).
   *
   * One shuffle on the domain key (rank window). Pathological
   * single-domain skew — one domain too large for a single reducer — is
   * pre-thinned at scale with a per-domain hash THRESHOLD sized from a
   * broadcast count so that well over `cap` rows survive, then this
   * exact rank runs on the survivors; because selection is rank-by-hash,
   * the two-phase filter keeps the identical document set (the `cap`
   * smallest hashes all clear any threshold that keeps >= cap rows).
   */
  def domainCap(df: org.apache.spark.sql.DataFrame, domainCol: String,
                idCol: String, cap: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Hashing.h60(
      concat(col(domainCol), lit("|"), col(idCol).cast(StringType)))
    val w = Window.partitionBy(domainCol).orderBy(h, col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
  }

  /** The Gopher rule set's stop words (Rae et al. 2021, appendix A1.1). */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher quality rules (Rae et al. 2021, A1.1) — the published
   * heuristic filter battery most pretraining pipelines start from:
   * word-count bounds, mean-word-length bounds, symbol-to-word ratio
   * (# and ellipses), bullet-line and ellipsis-line ratios, the
   * alphabetic-word ratio, and a minimum stop-word presence. Emits the
   * per-rule measurements plus the combined `keep` verdict so a
   * pipeline can both filter and report which rule fired.
   *
   * All counts are integers and every ratio is one double division, so
   * the verdict is engine-exact. One struct per doc, all codegen'd
   * built-ins — no UDFs, no extra scans.
   *
   * `minStopWords` defaults to the paper's 2; corpora that aren't
   * English prose (this repo's synthetic tables have almost no English
   * function words) tune it down rather than dropping everything.
   */
  def gopherRules(text: Column, minStopWords: Int = 2): Column = {
    val toks = Dedup.tokens(text)
    val nWords = size(toks).cast(LongType)
    val nWordsD = size(toks).cast(DoubleType)
    val meanWordLen =
      aggregate(toks, lit(0L), (a, t) => a + length(t)).cast(DoubleType) / nWordsD
    val symbolRatio =
      (regexp_count(text, lit("#")) + regexp_count(text, lit("\\.\\.\\.")))
        .cast(DoubleType) / nWordsD
    val lines = split(text, "\n")
    val nLinesD = size(lines).cast(DoubleType)
    val bulletRatio = size(filter(lines,
      l => trim(l).rlike("^[-*•]"))).cast(DoubleType) / nLinesD
    val ellipsisRatio = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)$"))).cast(DoubleType) / nLinesD
    val alphaRatio = size(filter(toks,
      t => t.rlike("[A-Za-z]"))).cast(DoubleType) / nWordsD
    val lowToks = transform(toks, t => lower(t))
    val stopHits = size(filter(typedLit(GopherStopWords),
      w => array_contains(lowToks, w)))
    val keep = nWords >= 50L && nWords <= 100000L &&
      meanWordLen >= 3.0 && meanWordLen <= 10.0 &&
      symbolRatio <= 0.1 &&
      bulletRatio <= 0.1 && ellipsisRatio <= 0.3 &&
      alphaRatio >= 0.8 && stopHits >= minStopWords
    struct(nWords.as("n_words"), meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
      ellipsisRatio.as("ellipsis_ratio"), alphaRatio.as("alpha_word_ratio"),
      stopHits.as("n_stopwords"), keep.as("keep"))
  }

  /**
   * Temperature-weighted mixing quotas: per-source document quotas
   * proportional to `ns^alpha / Σ ns^alpha` of a `target` total — the
   * standard rebalancing between over- and under-represented sources in
   * a multilingual/multi-domain pretraining mix (alpha=1 keeps natural
   * proportions; alpha→0 flattens toward uniform). Runs on the DRIVER
   * over the per-source counts (a handful of rows — the same O(domains)
   * pattern as the incremental watermark), so the corpus-side work is
   * one count aggregation plus one rank window.
   *
   * Determinism contract: the fold over sources runs in NAME order and
   * alpha=0.5 routes through `sqrt` (correctly rounded in IEEE where
   * `pow` is not), so an oracle re-deriving the quotas in SQL lands on
   * identical doubles, hence identical integer quotas.
   */
  def temperatureQuotas(counts: Seq[(String, Long)], target: Long,
                        alpha: Double = 0.5): Seq[(String, Long, Long)] = {
    val sorted = counts.sortBy(_._1)
    def p(n: Long): Double =
      if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
    val z = sorted.foldLeft(0.0)((a, x) => a + p(x._2))
    sorted.map { case (src, n) =>
      (src, n, math.min(n, math.floor(target * p(n) / z).toLong))
    }
  }

  /** Per-domain VARIABLE-quota sampling — [[domainCap]] with a quota map
   * instead of one cap: keep the `quota(domain)` hash-smallest documents
   * of each domain (deterministic rank-by-hash order, id tiebreak). The
   * quota map is a plan literal (O(domains) entries, broadcast with the
   * task binary); one shuffle on the domain key. A domain absent from
   * the map fails LOUDLY (quota maps derived from a stale snapshot would
   * otherwise silently drop every row of the new domain — `rk <= NULL`
   * filters to nothing). */
  def quotaSample(df: org.apache.spark.sql.DataFrame, domainCol: String,
                  idCol: String, quotas: Map[String, Long]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = Hashing.h60(
      concat(col(domainCol), lit("|"), col(idCol).cast(StringType)))
    val w = Window.partitionBy(domainCol).orderBy(h, col(idCol))
    val quota = coalesce(element_at(typedLit(quotas), col(domainCol)),
      raise_error(concat(lit("quotaSample: no quota for domain "),
        col(domainCol))).cast(LongType))
    df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
  }

  /** Rolling polynomial fingerprint of the normalized document (lowercase,
   * collapsed whitespace): fold h = (h*31 + codepoint) mod P over every
   * character. Order-sensitive (unlike bag-of-words hashes).
   *
   * NULL propagates: a NULL text fingerprints as NULL (SQL semantics —
   * `aggregate` over a NULL array is NULL), distinct from the empty
   * string's 0L. Callers that want the legacy 0L-for-NULL contract wrap
   * with `coalesce(fingerprint(c), lit(0L))`. */
  def fingerprint(text: Column): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    // fold over CharNGrams(norm, 1): ONE linear codepoint pass. The old
    // index fold's substr(i, 1) re-seeks codepoint i from byte 0 —
    // O(len²) per document, the same interpreted-substr pathology the
    // bigram kernel already eliminated (see charBigrams). ascii() of a
    // 1-gram is codepoint(norm[i]), so the hash is bit-identical to the
    // index formulation and to the DuckDB oracle. CharNGrams on an
    // empty string returns an empty array — the fold's zero (0L) is the
    // empty-text value, no guard needed.
    val chars = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.CharNGrams(
        org.apache.spark.sql.graft.ColumnBridge.expression(norm), 1))
    aggregate(chars, lit(0L),
      (acc, ch) => pmod(acc * 31 + ascii(ch), lit(Hashing.P)))
  }
}
