package graft.operators


import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.roundHU

/** Text analysis for training-data pipelines: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting. All pure
  * column arithmetic (codegen'd, engine-portable for the DuckDB oracle);
  * no external models.
  */
object TextStats {

  /** Tiny built-in stopword profiles. A real pipeline would use proper
    * lists; the OPERATOR shape (explode->join->ratio->argmax) is what
    * matters at scale. */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "que", "es" -> "los",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les", "fr" -> "des",
    "zh" -> "的", "zh" -> "是", "zh" -> "了", "zh" -> "在", "zh" -> "我")

  /** Per-language stopword-hit ratio + argmax prediction:
    * (id, lang_pred, best_ratio). Ties break on the lexicographically LAST
    * language name (max(struct) semantics; the q29 oracle mirrors it with
    * ORDER BY ratio DESC, lang DESC). */
  def langId(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val sw = broadcast(stopwords.toDF("sw_lang", "word"))
    val toks = docs
      .select(col("id"), explode(split(col("text"), " ")).as("word"))
    val scores = toks
      .join(sw, Seq("word"), "inner")
      .groupBy(col("id"), col("sw_lang"))
      .agg(count(lit(1)).as("hits"))
    val withRatio = docs.select(col("id"), size(split(col("text"), " ")).as("n_words"))
      .join(scores, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("sw_lang"), lit("und")).as("sw_lang"),
        roundHU(coalesce(col("hits"), lit(0L)).cast("double") / col("n_words"), 4).as("ratio"))
    withRatio
      .groupBy(col("id"))
      .agg(max(struct(col("ratio"), col("sw_lang"))).as("m"))
      .select(col("id"),
        col("m.sw_lang").as("lang_pred"),
        col("m.ratio").as("best_ratio"))
  }

  /** Quality metrics + composite score in [0,1]:
    * word stats, punctuation/digit ratios, English stopword ratio. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val nChars = length(col("text"))
    val nWords = size(w)
    val punct = nChars - length(regexp_replace(col("text"), "[.!?,;:]", ""))
    val digits = nChars - length(regexp_replace(col("text"), "[0-9]", ""))
    val enSw = Seq("the", "a", "of", "and", "to")
    val swHits = size(filter(w, x => x.isin(enSw.map(_.asInstanceOf[Any]): _*)))
    docs.select(
      col("id"),
      nWords.as("n_words"),
      roundHU(nChars.cast("double") / nWords, 4).as("avg_word_len"),
      roundHU(punct.cast("double") / nChars, 4).as("punct_ratio"),
      roundHU(digits.cast("double") / nChars, 4).as("digit_ratio"),
      roundHU(swHits.cast("double") / nWords, 4).as("stopword_ratio"))
      .withColumn("quality",
        roundHU(least(lit(1.0), greatest(lit(0.0),
          lit(0.4) * least(lit(1.0), col("n_words").cast("double") / 100)
            + lit(0.3) * least(lit(1.0), col("stopword_ratio") * 5)
            + lit(0.3) * (lit(1.0) - least(lit(1.0), col("punct_ratio") * 10)))), 4))
  }

  /** Gopher-style rule-based quality FILTER (the MassiveText rule family:
    * word-count bounds, mean-word-length bounds, duplicate-word fraction,
    * minimum distinct stopwords), emitting per-rule booleans plus the
    * final `keep` — a pipeline drops failing docs before tokenization.
    * Thresholds are parameters; ratios are exact integer/integer doubles,
    * so the booleans are engine-portable without rounding. Pure per-doc
    * column arithmetic — a map-only stage at any scale. */
  def gopherRules(
      docs: DataFrame,
      minWords: Int = 10,
      maxWords: Int = 100000,
      minAvgLen: Double = 2.0,
      maxAvgLen: Double = 12.0,
      maxDupWordFrac: Double = 0.6,
      minStopwords: Int = 2): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(w)
    val avgLen = length(regexp_replace(col("text"), " ", "")).cast("double") / nWords
    val dupFrac = lit(1.0) - size(array_distinct(w)).cast("double") / nWords
    val enSw = Seq("the", "a", "of", "and", "to")
    val swDistinct = size(array_intersect(array_distinct(w),
      array(enSw.map(lit): _*)))
    docs.select(
      col("id"),
      nWords.as("n_words"),
      (nWords >= minWords && nWords <= maxWords).as("r_word_count"),
      (avgLen >= minAvgLen && avgLen <= maxAvgLen).as("r_avg_word_len"),
      (dupFrac <= maxDupWordFrac).as("r_dup_word"),
      (swDistinct >= minStopwords).as("r_stopword"))
      .withColumn("keep",
        col("r_word_count") && col("r_avg_word_len") &&
          col("r_dup_word") && col("r_stopword"))
  }

  /** PMI bigram collocations — pointwise mutual information of adjacent
    * word pairs against unigram frequencies:
    * pmi(a,b) = ln((c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni))), bigrams with
    * c_ab >= minCount, top N by (rounded pmi desc, w1, w2) — ranking on
    * the ROUNDED value with a lexicographic tie-break keeps the selected
    * set engine-portable. Two linear explodes + small-key aggregations;
    * corpus totals are driver scalars (bounded, like the KS denominator). */
  /** Word-bigram struct array of a words column: adjacent (w1, w2) pairs
    * for >= 2 words, empty otherwise — the ONE bigram convention, shared
    * by [[pmiBigrams]], [[lmScore]], and the q143 heavy-hitter probe (a
    * drifted copy would silently de-align their oracles). */
  def bigramPairs(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(w) >= 2, transform(sequence(lit(1), size(w) - 1),
      i => struct(element_at(w, i).as("w1"), element_at(w, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Adjacent word triples, [[bigramPairs]]' 3-gram sibling. */
  def trigramTriples(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(size(w) >= 3, transform(sequence(lit(1), size(w) - 2),
      i => struct(element_at(w, i).as("w1"), element_at(w, i + 1).as("w2"),
        element_at(w, i + 2).as("w3"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string,w3:string>>"))

  def pmiBigrams(docs: DataFrame, minCount: Long = 5, topN: Int = 50): DataFrame = {
    val w = split(col("text"), " ")
    val toks = docs.select(explode(w).as("tok"))
    val bi = docs.select(explode(bigramPairs(w)).as("b"))
      .select(col("b.w1"), col("b.w2"))
      // NOT checkpointed: the groupBy consumers re-run the explode, which
      // is a cheap map-only scan — materializing the full bigram table
      // costs more than recomputing it
    // both corpus totals in ONE action over per-doc token counts (a doc of
    // n tokens contributes n unigrams and max(n-1, 0) bigrams) — no
    // separate count() scans
    val totals = docs
      .select(size(w).as("n"))
      .agg(sum(col("n")).as("nu"), sum(greatest(col("n") - 1, lit(0))).as("nb"))
      .head()
    val nUni = totals.getLong(0).toDouble
    val nBi = totals.getLong(1).toDouble
    val uc = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
      .join(uc.select(col("tok").as("w1"), col("c").as("ca")), "w1")
      .join(uc.select(col("tok").as("w2"), col("c").as("cb")), "w2")
      .select(col("w1"), col("w2"), col("c_ab"),
        // roundHU, not round(): the rounded value drives the top-N cutoff,
        // so the repo's cross-engine rounding convention applies doubly
        roundHU(log(
          (col("c_ab").cast("double") / lit(nBi)) /
            ((col("ca").cast("double") / lit(nUni)) *
              (col("cb").cast("double") / lit(nUni)))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** Token counts: whitespace words plus a BPE-ish regex token count
    * (letter runs, single digits, single punctuation marks). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("id"),
      size(split(col("text"), " ")).as("n_words"),
      size(expr("regexp_extract_all(text, '[a-z]+|[A-Z][a-z]*|[0-9]|[^A-Za-z0-9 ]', 0)"))
        .as("n_tokens"))

  /** Document fingerprint: the 5 lexicographically-smallest md5s of the
    * distinct word-3-gram shingles, joined — a compact containment sketch
    * (winnowing-style min-k). */
  def fingerprint(docs: DataFrame, k: Int = 5): DataFrame =
    docs.select(
      col("id"),
      array_join(
        slice(array_sort(transform(Dedup.shingles(col("text")), s => md5(s))), 1, k),
        "|").as("fingerprint"))

  /** Deterministic stratified sample: keep `n` rows per group, chosen by
    * ranking on md5(id) — the data-MIXING primitive of a training
    * pipeline (per-source/per-language quotas). The hash order is a
    * reproducible shuffle (same rows on every engine and every run,
    * unlike rand()-based sampleBy); the rank is a per-group
    * WindowGroupLimit — no global sort. Returns (group, id, rk). */
  def stratifiedSample(docs: DataFrame, groupCol: String, n: Int): DataFrame =
    docs.select(col(groupCol).as("grp"), col("id"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(md5(col("id").cast("string")), col("id"))))
      .where(col("rk") <= n)

  /** Repetition metrics per document — the repetition family of
    * training-data quality filters (the "duplicate n-gram fraction" rules
    * popularized by the Gopher/MassiveText filtering literature):
    *  - dup_word_frac: 1 - distinct(words)/words
    *  - top_bigram_frac: occurrences of the most frequent word bigram /
    *    total bigrams (ties: lexicographically first bigram)
    *  - dup_3gram_frac: 1 - distinct(word-3-grams)/3-grams
    * All ratios roundHU(4); degenerate short docs score 0. Pure per-doc
    * column math + one small groupBy for the bigram mode — linear. */
  def repetitionScores(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    def grams(n: Int) =
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => array_join(slice(w, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    val base = docs.select(col("id"),
      roundHU(lit(1.0) - size(array_distinct(w)).cast("double") / size(w), 4)
        .as("dup_word_frac"),
      when(size(w) >= 3,
        roundHU(lit(1.0) -
          size(array_distinct(grams(3))).cast("double") / (size(w) - 2), 4))
        .otherwise(lit(0.0)).as("dup_3gram_frac"),
      grams(2).as("bigrams"))
    // mode bigram with (cnt desc, bg asc) tie-break: min of (-cnt, bg)
    val topBg = base.select(col("id"), explode(col("bigrams")).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(
        min(struct((-col("cnt")).as("nc"), col("bg"))).as("m"),
        sum(col("cnt")).as("nbg"))
      .select(col("id"),
        roundHU((-col("m.nc")).cast("double") / col("nbg"), 4).as("top_bigram_frac"))
    base.select(col("id"), col("dup_word_frac"), col("dup_3gram_frac"))
      .join(topBg, Seq("id"), "left")
      .select(col("id"), col("dup_word_frac"), col("dup_3gram_frac"),
        coalesce(col("top_bigram_frac"), lit(0.0)).as("top_bigram_frac"))
  }

  /** TF-IDF top terms per document: tf = term count in doc, idf =
    * ln(N/df) over the corpus, top `topN` terms by (score desc, word asc).
    * The classic relevance/keyword-extraction scoring of a text pipeline;
    * both aggregations are partial-agg shuffles on small keys.
    * Returns (id, rank, word, score). */
  def tfidfTopTerms(docs: DataFrame, topN: Int = 3): DataFrame = {
    val n = docs.count()
    val toks = docs.select(col("id"), explode(split(col("text"), " ")).as("word"))
    val tf = toks.groupBy(col("id"), col("word")).agg(count(lit(1)).as("tf"))
    val df = toks.select(col("id"), col("word")).distinct()
      .groupBy(col("word")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("score").desc, col("word"))
    tf.join(df, "word")
      .select(col("id"), col("word"),
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topN)
      .select(col("id"), col("rank"), col("word"), col("score"))
  }

  /** Hashed-feature linear classifier INFERENCE (the fastText /
    * DCLM-style quality-classifier scoring pass every modern pretraining
    * pipeline runs to keep or drop documents). The model is a weight
    * vector over `nBuckets` hashed token features; scoring is
    * tf-weighted: score(doc) = Σ_tokens weight[hash(token) mod nBuckets].
    *
    * Everything is exact int64 arithmetic so the decision boundary is
    * bit-stable across engines: the token hash is the Karp–Rabin fold
    * (acc*257 + code) mod 1e9+7 (the `winnowingFingerprint` family), and
    * the weights here are a deterministic synthetic model
    * w(b) = (b * 2654435761) mod 4097 - 2048 — a stand-in for trained
    * parameters, which would arrive as exactly this (bucket, weight)
    * table. Scale shape: one map over exploded tokens computes buckets; a
    * BROADCAST equi-join against the nBuckets-row weight table prices
    * them (the model is tiny by construction — broadcast is right at any
    * corpus size); one per-id partial agg sums. No driver loop, no UDF.
    *
    * @return (id, n_toks, score, keep) — keep = score >= 0; empty docs
    *         score 0 and are kept. */
  def hashedClassifierScore(docs: DataFrame, nBuckets: Int = 1024): DataFrame = {
    val M = 1000000007L
    val weights = docs.sparkSession.range(nBuckets.toLong)
      .select(col("id").as("bucket"),
        ((col("id") * 2654435761L) % 4097L - 2048L).as("wgt"))
    val toks = docs
      .select(col("id"), explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .select(col("id"),
        (aggregate(sequence(lit(1), length(col("word"))), lit(0L),
          (acc, i) => (acc * 257L + ascii(col("word").substr(i, lit(1)))) % M)
          % nBuckets).as("bucket"))
    val scored = toks.join(broadcast(weights), Seq("bucket"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("wgt")).as("score"))
    docs.select(col("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"),
        coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("keep", col("score") >= 0)
  }

  /** Winnowing fingerprint (the MOSS algorithm) over ROLLING char-k-gram
    * hashes: Karp–Rabin polynomial hash h(i) = Σ_j ord(text[i+j])·B^(k-1-j)
    * mod M in pure 64-bit integer arithmetic (engine-portable, no floats),
    * then the minimum hash of every w-length hash window; the distinct
    * window minima, sorted, are the fingerprint. Short docs (< k+w-1
    * chars) fingerprint to the empty string.
    *
    * Scale shape: positions explode linearly (n per doc); the sliding
    * minimum is a per-doc ROWS window — partitioned by id, never global. */
  def winnowingFingerprint(docs: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    val B = 257L
    val M = 1000000007L
    val pows = Array.iterate(1L, k)(p => p * B % M).reverse // B^(k-1-j) mod M
    val powCol = array(pows.map(lit): _*)
    val positions = docs.select(col("id"),
      posexplode(
        when(length(col("text")) >= k,
          transform(sequence(lit(1), length(col("text")) - (k - 1)), i =>
            aggregate(sequence(lit(0), lit(k - 1)), lit(0L),
              (acc, j) => acc + ascii(col("text").substr(i + j, lit(1))) *
                element_at(powCol, j + 1)) % M))
          .otherwise(array().cast("array<bigint>"))).as(Seq("pos", "h")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos")).rowsBetween(-(w - 1), 0)
    val minima = positions
      .withColumn("wmin", min(col("h")).over(win))
      .where(col("pos") >= w - 1) // full windows only (pos is 0-based)
      .select(col("id"), col("wmin")).distinct()
      .groupBy(col("id"))
      .agg(array_join(
        transform(array_sort(collect_list(col("wmin"))), _.cast("string")),
        "|").as("fp"))
    docs.select(col("id"))
      .join(minima, Seq("id"), "left")
      .select(col("id"), coalesce(col("fp"), lit("")).as("fingerprint"))
  }

  /** Distinct word n-grams per row: (idCol, gram). */
  private def wordGrams(d: DataFrame, idCol: String, n: Int): DataFrame = {
    val w = split(col("text"), " ")
    d.select(col(idCol),
        explode(
          when(size(w) >= n, transform(sequence(lit(1), size(w) - (n - 1)),
            i => array_join(slice(w, i, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))).as("gram"))
      .distinct()
  }

  /** Benchmark decontamination — the train-set sweep every LLM data
    * pipeline runs before training: flag every corpus document sharing at
    * least one word `n`-gram with a benchmark document. Grams are distinct
    * per doc and the collision check is a gram-keyed equi-join; benchmark
    * grams appearing in more than `maxGramDf` benchmark docs are dropped
    * (boilerplate — the same capped-equi-join discipline as the dedup
    * candidate generators; rare grams, the actual contamination signal,
    * are checked exactly). Self-matches (same id) are excluded. Output:
    * (id, n_bench_docs, contaminated) for EVERY corpus doc. */
  def contamination(
      docs: DataFrame, // (id, text)
      bench: DataFrame, // (bench_id, text)
      n: Int = 8,
      maxGramDf: Int = 200): DataFrame = {
    val bg = wordGrams(bench, "bench_id", n)
    val dfw = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
    val bgCapped = bg
      .withColumn("__df", count(lit(1)).over(dfw))
      .where(col("__df") <= maxGramDf)
      .select(col("bench_id"), col("gram"))
    val hits = wordGrams(docs, "id", n)
      .join(bgCapped, "gram")
      .where(col("id") =!= col("bench_id"))
      .groupBy(col("id"))
      .agg(countDistinct(col("bench_id")).as("n_bench_docs"))
    docs.select(col("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bench_docs"), lit(0L)).as("n_bench_docs"),
        (coalesce(col("n_bench_docs"), lit(0L)) > 0).as("contaminated"))
  }

  /** Trigram STUPID-BACKOFF LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the distributed-counts LM
    * built for exactly this MapReduce/Spark shape): score every doc by
    * the average log stupid-backoff score of its trigram instances under
    * counts trained on the `isTrain` half of the corpus — the
    * train-on-reference / score-everything perplexity filter a CCNet-
    * style pretraining pipeline runs (docs that look like the reference
    * corpus score near 0, junk scores very negative). Unlike [[lmScore]]
    * (self-counts, every n-gram seen), the held-out side genuinely
    * exercises the backoff ladder:
    *
    *   S(w3|w1 w2) = c(w1 w2 w3)/c(w1 w2)            if the trigram is in train
    *               = α·c(w2 w3)/c(w2)                 else if the bigram is
    *               = α²·c(w3)/N                       else if w3 is in vocab
    *               = α²·0.5/N                         else (OOV floor)
    *
    * with α = 0.4 (the paper's constant). Scores are NOT normalized
    * probabilities — stupid backoff trades normalization for counts-only
    * distributable training, which is the point at corpus scale.
    *
    * Scale shape: three count aggregations over the train half (uni/bi/
    * tri — vocabulary-bounded, the heavy one is the trigram table, still
    * sublinear in corpus size for natural text), then the score side is
    * one exploded trigram-position table LEFT-joined against the count
    * tables on their n-gram keys (equi-joins; Catalyst broadcasts the
    * small orders automatically at small SF, hash-shuffles at scale) and
    * one per-doc aggregation. No iteration, no global structure; the
    * count tables are reusable artifacts (train once, score any stream —
    * the natural split of a quality-filter deployment). Docs with < 3
    * tokens emit n_trigrams = 0 and a null score. */
  def stupidBackoffScore(docs: DataFrame,
      isTrain: org.apache.spark.sql.Column, alpha: Double = 0.4): DataFrame = {
    val w = split(col("text"), " ")
    val train = docs.where(isTrain)
    val uni = train.select(explode(w).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("c1"))
    val nTok = train.select(explode(w).as("u")).count().toDouble
    val bi = train
      .select(explode(bigramPairs(w)).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val tri = train
      .select(explode(trigramTriples(w)).as("t"))
      .groupBy(col("t.w1").as("w1"), col("t.w2").as("w2"), col("t.w3").as("w3"))
      .agg(count(lit(1)).as("c3"))
    // score side: every trigram position of EVERY doc
    val pos = docs
      .select(col("id"), explode(trigramTriples(w)).as("t"))
      .select(col("id"), col("t.w1").as("w1"), col("t.w2").as("w2"),
        col("t.w3").as("w3"))
    val joined = pos
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1"), col("w2"), col("c2").as("c2_ctx")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c2").as("c2_23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("u").as("w2"), col("c1").as("c1_2")), Seq("w2"), "left")
      .join(uni.select(col("u").as("w3"), col("c1").as("c1_3")), Seq("w3"), "left")
    val a = lit(alpha)
    val score = when(col("c3").isNotNull,
        col("c3").cast("double") / col("c2_ctx").cast("double"))
      .when(col("c2_23").isNotNull,
        a * col("c2_23").cast("double") / col("c1_2").cast("double"))
      .when(col("c1_3").isNotNull,
        a * a * col("c1_3").cast("double") / lit(nTok))
      .otherwise(a * a * lit(0.5) / lit(nTok))
    val scored = joined
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_trigrams"),
        roundHU(avg(log(score)), 4).as("avg_logscore"))
    docs.select(col("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("avg_logscore"))
  }

  /** Corpus bigram-LM quality score (the CCNet-style perplexity proxy):
    * score = avg over the doc's bigram INSTANCES of ln(c(w1,w2)/c(w1)),
    * counts taken from the scoring corpus itself — every scored bigram has
    * count ≥ 1, so no smoothing is needed; higher (closer to 0) = more
    * predictable text. Two vocabulary-bounded count shuffles + one
    * bigram-keyed join + one per-doc aggregation; nothing global. Docs
    * with < 2 tokens emit n_bigrams = 0 and a null score. */
  def lmScore(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val bi = docs.select(col("id"), explode(bigramPairs(w)).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uc = docs.select(explode(w).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("ca"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_ab"))
    val scored = bi
      .join(bc, Seq("w1", "w2"))
      .join(uc.select(col("tok").as("w1"), col("ca")), "w1")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        roundHU(avg(log(col("c_ab").cast("double") / col("ca").cast("double"))), 4)
          .as("score"))
    docs.select(col("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("score"))
  }

  /** LEARNED quality filter, training half: multinomial Naive Bayes
    * log-odds over tokens, trained on bootstrap labels — the standard way
    * corpus quality classifiers are built when no human labels exist
    * (label a seed set with heuristic rules, train a classifier, let it
    * generalize; CCNet/LLaMA-style pipelines do exactly this with
    * fasttext). Naive Bayes is the closed-form member of that family:
    * training is two integer count aggregations + Laplace smoothing — no
    * SGD, no iteration — which is what makes the whole train→apply loop
    * hash-replayable in the oracle (the fasttext/logreg upgrade changes
    * the scoring formula, not the pipeline shape).
    *
    * Returns one row per vocabulary word:
    * (w, c_keep, c_drop, log_odds) where log_odds =
    * ln((c_keep+1)/(t_keep+V)) − ln((c_drop+1)/(t_drop+V)) — exactly this
    * operation order, so the oracle's ln arithmetic is bit-identical
    * (the q144/q155 transcendental caveat; outputs round at use).
    *
    * Scale: one token explode (map-only), one vocab-keyed count agg
    * (map-side partial), one 1-row total crossJoined back — the
    * vocabulary is the small dimension, like the BM25 idf table.
    *
    * @param labeled (id, text, keep: boolean) — bootstrap labels ride in
    */
  def nbTrain(labeled: DataFrame): DataFrame = {
    val toks = labeled
      .select(col("keep"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
    val counts = toks.groupBy(col("w"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("c_keep"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("c_drop"))
    val tot = counts.agg(sum(col("c_keep")).as("t_keep"),
      sum(col("c_drop")).as("t_drop"), count(lit(1)).as("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("w"), col("c_keep"), col("c_drop"),
        (log((col("c_keep") + 1).cast("double") /
            (col("t_keep") + col("v")).cast("double")) -
          log((col("c_drop") + 1).cast("double") /
            (col("t_drop") + col("v")).cast("double"))).as("log_odds"))
  }

  /** [[nbTrain]]'s apply half: per-doc score = class-prior log-odds +
    * Σ_tokens log_odds(w), pred = score > 0. Every token occurrence
    * contributes (multinomial NB); the per-occurrence values are
    * bit-identical across engines and the per-doc sum rounds at 4 dp
    * (the q107 BM25 sum convention). Tokens outside the model vocabulary
    * contribute nothing (inner join) — vacuous when scoring the training
    * corpus, and the documented behavior for new corpora (the Laplace
    * floor belongs to words SEEN in one class, not to never-seen words).
    *
    * Plan shape: token explode → broadcast vocab join → one groupBy(id)
    * with map-side partial sums; the prior is a 1-row crossJoin.
    *
    * @param docs  (id, text) to score
    * @param model [[nbTrain]] output
    * @param prior (n_keep, n_drop) doc counts — ln((n_keep+1)/(n_drop+1))
    *              rides as the intercept
    */
  def nbScore(docs: DataFrame, model: DataFrame, prior: DataFrame): DataFrame = {
    val pr = prior.select(
      log((col("n_keep") + 1).cast("double") /
        (col("n_drop") + 1).cast("double")).as("prior_lo"))
    docs.select(col("id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .join(broadcast(model.select(col("w"), col("log_odds"))), Seq("w"))
      .groupBy(col("id"))
      .agg(sum(col("log_odds")).as("s"))
      .crossJoin(broadcast(pr))
      .select(col("id"),
        round(col("prior_lo") + col("s"), 4).as("score"),
        (col("prior_lo") + col("s") > 0).as("pred"))
  }
}
