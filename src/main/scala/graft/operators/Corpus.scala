package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-preparation operators for an LLM training-data pipeline: PII
  * redaction, text normalization, vocabulary construction, domain-mixture
  * resampling, and boilerplate removal. All are either map-only column
  * arithmetic or shuffles on bounded keys — each function's scaladoc
  * carries its 100 TB story.
  *
  * The reference engine has no text-pipeline stage; these extend the
  * SURVEY §2 pipeline family alongside TextStats/Dedup.
  */
object Corpus {

  /** Java-and-RE2-compatible patterns (no lookarounds, no backrefs), so
    * the Spark side and the DuckDB oracle run the LITERAL same regex. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val IdNumRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** PII detection + redaction: count emails / IPv4s / SSN-shaped ids and
    * replace them with typed placeholder tokens. Pure per-row regexp
    * column arithmetic — map-only, stays inside one WholeStageCodegen
    * span, embarrassingly parallel at any scale.
    *
    * Replacement order (email, then ip, then id) is part of the contract:
    * the oracle applies the same order, so overlapping matches resolve
    * identically.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        IdNumRe, "<ID>")
    docs.select(
      col("id"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0)))
        .cast("long").as("n_ips"),
      size(regexp_extract_all(col("text"), lit(IdNumRe), lit(0)))
        .cast("long").as("n_ids"),
      md5(redacted).as("redacted_md5"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_ids") > 0)
  }

  /** The canonical-form column itself — shared by [[normalizeText]] and
    * pipeline compositions that keep working on the normalized text. */
  def normCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(
      regexp_replace(
        regexp_replace(lower(text), "[^a-z0-9 ]", " "),
        " +", " "))

  /** Canonical text normalization (the CCNet-style pre-dedup pass):
    * lowercase, non-alphanumerics to spaces, whitespace collapsed, ends
    * trimmed. Map-only. (Unicode NFC is a no-op on the ASCII testdata and
    * DuckDB/JVM agree on it; the contract here is the ASCII pipeline.) */
  def normalizeText(docs: DataFrame): DataFrame = {
    val norm = normCol(col("text"))
    docs.select(
      col("id"),
      length(norm).cast("long").as("n_chars_norm"),
      md5(norm).as("norm_md5"))
  }

  /** Frequency-cutoff vocabulary: tokens with count >= minCount, top
    * `topN` by (count desc, token), dense ids 0..topN-1 assigned by that
    * rank. The global shuffle is a word-count aggregation (map-side
    * combine; key space = vocabulary, not corpus). The ordering is a
    * TakeOrdered (per-partition top-N, driver merge of N rows) — the
    * rank window runs AFTER the limit, over at most topN rows, so no
    * full-vocabulary single-partition sort ever happens. */
  /** BPE merge-rule LEARNING (Sennrich et al.'s pair-merge loop) — the
    * missing half of the tokenizer story next to
    * [[wordpieceTokenize]]'s apply-a-vocab path.
    *
    * Classic BPE trains on the distinct-WORD frequency table, not the
    * corpus: after one distributed word count, every round is a
    * vocab-sized job — at 100 TB training cost is independent of corpus
    * size. Each round: explode adjacent symbol pairs weighted by word
    * count (map + small-key agg), take the argmax pair via TakeOrdered
    * (count desc, then the `"l r"` pair string asc — symbols never
    * contain spaces or control chars, so the string order equals the
    * (l, r) tuple order in both engines), and apply the merge as a pure
    * map: the symbol string is padded with spaces and `" l r "` is
    * replaced by `" lr "` FIVE times — replace is leftmost-first
    * non-overlapping, and a run of n identical symbols needs
    * ceil(log2(n)) passes, so 5 passes are a fixpoint for any word of
    * <= 32 symbols (require()d). The DuckDB oracle replays the identical
    * padded-replace chain, so the hash pins the exact merge semantics,
    * overlaps included.
    *
    * Rounds are driver-orchestrated like Lloyd's: one tiny argmax collect
    * per round; the mutated symbol table is localCheckpoint'ed per round
    * (vocab-sized) to keep lineage flat, superseded rounds freed.
    *
    * @return one row per learned rule: (step, lhs, rhs, merged,
    *         pair_count), step 1-based in merge order */
  def bpeTrain(docs: DataFrame, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    def tracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet
      val out = df.localCheckpoint()
      (out, (sc.getPersistentRDDs.keySet -- before).toSet)
    }
    def free(ids: Set[Int]): Unit =
      ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    // seed: one symbol per character + the word-end marker
    var (syms, prevIds) = tracked(words.select(col("word"), col("cnt"),
      concat(
        array_join(
          expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
          " "),
        lit(" </w>")).as("sym")))
    require(syms.where(length(col("word")) > 31).isEmpty,
      "bpeTrain: a word exceeds 31 symbols — raise the replace-pass count")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    for (step <- 1 to numMerges) {
      val best = syms
        .select(col("cnt"), split(col("sym"), " ").as("a"))
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(a) - 1), i -> concat(a[i - 1], ' ', a[i]))"))
          .as("pair"))
        .groupBy(col("pair")).agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("pair"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val pair = best(0).getString(0)
        val c = best(0).getLong(1)
        val Array(l, r) = pair.split(" ", 2)
        merges += ((step, l, r, l + r, c))
        var merged: org.apache.spark.sql.Column = concat(lit(" "), col("sym"), lit(" "))
        for (_ <- 1 to 5)
          merged = call_function("replace", merged, lit(s" $l $r "), lit(s" $l$r "))
        val (next, ids) = tracked(
          syms.select(col("word"), col("cnt"), trim(merged).as("sym")))
        free(prevIds)
        prevIds = ids
        syms = next
      }
    }
    free(prevIds)
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      sc.parallelize(merges.toIndexedSeq.map { case (s, l, r, m, c) =>
        org.apache.spark.sql.Row(s, l, r, m, c)
      }, 1),
      StructType(Seq(
        StructField("step", IntegerType, false),
        StructField("lhs", StringType, false),
        StructField("rhs", StringType, false),
        StructField("merged", StringType, false),
        StructField("pair_count", LongType, false))))
  }

  /** BPE ENCODE — apply learned merge rules to tokenize a corpus (the
    * missing apply-half next to [[bpeTrain]]'s learn-half; together they
    * close the tokenizer train -> apply loop).
    *
    * The corpus-scale shape is distinct-words-then-join (the same
    * discipline as `wordpieceTokenize`): the rule chain runs once per
    * DISTINCT word — all `rules.size * 5` padded replaces compose into one
    * whole-stage-codegen'd map over the vocab-sized table (identical
    * 5-pass ` l r ` -> ` lr ` fixpoint semantics as training; words must
    * be <= 31 symbols, which [[bpeTrain]] enforced on the same corpus) —
    * and the corpus-sized side only pays a vocab-keyed equi-join (AQE
    * broadcasts the dictionary side when it fits). Per-doc reassembly is a
    * per-id aggregate ordered by token position — bounded by doc length,
    * never a global window.
    *
    * @param rules (lhs, rhs) merge pairs IN LEARNED ORDER
    * @return one row per doc: (id, n_tokens, toks_md5) where toks_md5
    *         hashes the space-joined symbol sequence of the whole doc */
  def bpeEncode(docs: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) > 0).distinct()
    val seed = concat(
      array_join(
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"),
        " "),
      lit(" </w>"))
    var merged: org.apache.spark.sql.Column = concat(lit(" "), seed, lit(" "))
    rules.foreach { case (l, r) =>
      for (_ <- 1 to 5)
        merged = call_function("replace", merged, lit(s" $l $r "), lit(s" $l$r "))
    }
    val wsym = words.select(col("word"), trim(merged).as("sym"))
    val enc = docs
      .select(col("id"), posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
      .where(length(col("word")) > 0)
      .join(wsym, Seq("word"))
      .groupBy(col("id"))
      .agg(
        sum(size(split(col("sym"), " "))).cast("long").as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("sym")))),
            x => x.getField("sym")),
          " ")).as("toks_md5"))
    docs.select(col("id")).join(enc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("toks_md5"), md5(lit(""))).as("toks_md5"))
  }

  /** RAG-style document chunking: overlapping token windows of `chunkSize`
    * tokens every `stride` tokens (overlap = chunkSize - stride), the
    * split every retrieval pipeline runs before embedding. Chunk starts
    * are i*stride for i in 0..nc-1 with nc = 1 if n <= chunkSize else
    * 1 + ceil((n - chunkSize) / stride) — the last chunk may be short,
    * every token is covered, empty docs produce one empty chunk. Map-only:
    * the token array never leaves its row; chunks posexplode from one
    * `transform` over the start sequence. */
  def chunkWindows(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"chunkWindows: need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    docs
      .select(col("id"), toks.as("a"), size(toks).as("n"))
      // exact integer chunk count (DIV, not float division)
      .withColumn("nc", expr(
        s"CASE WHEN n <= $chunkSize THEN 1 ELSE 1 + (n - $chunkSize + ${stride - 1}) DIV $stride END"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), col("nc").cast("int") - 1), i =>
          struct(
            size(slice(col("a"), i * stride + 1, lit(chunkSize))).as("nt"),
            array_join(slice(col("a"), i * stride + 1, lit(chunkSize)), " ").as("ct"))))
          .as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx"),
        col("c.nt").cast("long").as("n_chunk_tokens"),
        md5(col("c.ct")).as("chunk_md5"))
  }

  /** Token-budget epoch allocation (the LLaMA/DoReMi-style data-recipe
    * planning step): given per-source token counts and mixture weights,
    * split a total token budget across sources proportionally to weight,
    * cap repetition at `maxEpochs` passes over a source, and report the
    * shortfall the cap leaves unfilled. The budget is
    * total_tokens·budgetPct/100 so the plan is self-contained on any
    * corpus. All arithmetic is int64 (DIV/ceil-DIV) — the plan is
    * bit-stable across engines; epochs counts partial passes as a full
    * epoch number (ceil), alloc never exceeds epochs·available.
    *
    * Scale shape: one partial-agg over (source) — a handful of rows —
    * then a 1-row broadcast of the corpus totals (the [[mixtureSample]]
    * convention). Nothing else touches corpus-sized data.
    *
    * @param weight per-source mixture weight column (evaluated on the
    *               one-row-per-source agg, the q84 convention)
    * @return (source, src_tokens, weight, target_tokens, epochs,
    *         alloc_tokens, shortfall) for sources with tokens */
  def tokenBudgetPlan(
      docs: DataFrame /* (id, source, text) */,
      weight: org.apache.spark.sql.Column,
      budgetPct: Int = 300,
      maxEpochs: Int = 4): DataFrame = {
    val perSrc = docs
      .select(col("source"),
        size(filter(split(col("text"), " "), t => length(t) > 0))
          .cast("long").as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("src_tokens"))
      .where(col("src_tokens") > 0)
      .withColumn("weight", weight.cast("long"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("tot_tokens"),
      sum(col("weight")).as("tot_w"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("src_tokens"), col("weight"),
        expr(s"tot_tokens * $budgetPct DIV 100 * weight DIV tot_w")
          .as("target_tokens"))
      .withColumn("epochs",
        least(expr("(target_tokens + src_tokens - 1) DIV src_tokens"),
          lit(maxEpochs.toLong)))
      .withColumn("alloc_tokens",
        least(col("target_tokens"), col("epochs") * col("src_tokens")))
      .withColumn("shortfall", col("target_tokens") - col("alloc_tokens"))
  }

  def vocabulary(docs: DataFrame, minCount: Long, topN: Int): DataFrame = {
    val counts = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col("tok"))
      .limit(topN)
    counts.withColumn("token_id",
      row_number().over(Window.orderBy(col("cnt").desc, col("tok")))
        .cast("long") - 1L)
  }

  /** Domain-mixture resampling: hit integer target proportions
    * `weight(source)` as closely as possible without oversampling any
    * source. The binding source m minimizes cnt/weight (exact integer
    * cross-comparison via doubles only for ORDERING, ties by source
    * name); every source's quota is then the exact integer
    * `weight_s * cnt_m div weight_m`, and each source keeps its quota of
    * docs ranked by md5(source|id) — a deterministic uniform draw.
    *
    * Scale: per-source counts are a map-side-combined agg on a tiny key
    * space; quotas are a broadcast join; the rank is a per-source window
    * (partition-local sort, never global). Output keeps every doc with a
    * boolean, so the selection is auditable.
    */
  def mixtureSample(docs: DataFrame, weight: org.apache.spark.sql.Column)
      : DataFrame = {
    val counts = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("weight", weight.cast("long"))
    // binding source: smallest cnt/weight (double order only; quota math
    // below is pure integer, so no float crosses an equality boundary)
    val binding = counts
      .orderBy((col("cnt").cast("double") / col("weight")).asc, col("source"))
      .limit(1)
      .select(col("cnt").as("m_cnt"), col("weight").as("m_weight"))
    val quotas = counts.crossJoin(broadcast(binding))
      .select(col("source"),
        expr("weight * m_cnt div m_weight").as("quota"))
    val ranked = docs.withColumn("rk",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(md5(concat_ws("|", col("source"), col("id"))), col("id")))
        .cast("long"))
    ranked.join(broadcast(quotas), "source")
      .select(col("id"), col("source"), col("rk"),
        (col("rk") <= col("quota")).as("keep"))
  }

  /** Corpus WordPiece tokenization: greedy longest-match subword encoding
    * of every document against a fixed vocab, via the
    * [[graft.functions.WordpieceTokens]] native expression.
    *
    * Scale shape: the expression runs over the corpus's DISTINCT words —
    * a vocabulary-sized table, orders of magnitude smaller than the token
    * stream — and the result joins back on the word as an equi-key (AQE
    * broadcasts it when it fits). Reassembly per doc is array_sort over
    * collected (pos, toks) structs; token order inside the doc is exact.
    * Output: (id, n_subtokens, n_unk, tok_md5).
    */
  def wordpieceTokenize(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    import graft.functions.TextExpressions
    val words = docs.select(col("id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
    val uniq = words.select(col("word")).distinct()
      .withColumn("toks", TextExpressions.wordpiece(col("word"), vocab))
    words.join(uniq, "word")
      .groupBy(col("id"))
      .agg(
        sum(size(col("toks"))).cast("long").as("n_subtokens"),
        sum(size(filter(col("toks"), t => t === "[UNK]"))).cast("long")
          .as("n_unk"),
        md5(array_join(flatten(transform(
          array_sort(collect_list(struct(col("pos"), col("toks")))),
          s => s.getField("toks"))), " ")).as("tok_md5"))
  }

  /** Curriculum binning: assign every document its EXACT global quantile
    * bucket of a score column — the ordering step of curriculum training
    * schedules (easy->hard) and quality-tiered sampling.
    *
    * Exactness without a global window: the global rank is a two-phase
    * distributed computation (range-partition by (score, id) ->
    * per-partition row counts, ≤ #partitions driver rows -> broadcast
    * exclusive offsets -> partition-local rank assignment). The bucket is
    * then pure integer math `(rank-1)*nBuckets div n`, so ties broken by
    * id make every engine agree. A `Window.orderBy(score)` ntile would
    * serialize the corpus through one task; approximate percentiles would
    * disagree across engines.
    *
    * Output: (id, score, rank, bucket); rank is 1-based dense global,
    * bucket in [0, nBuckets).
    */
  def curriculumBuckets(scored: DataFrame, nBuckets: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // materialize the RDD handle ONCE so the rank pass reuses the count
    // pass's shuffle map outputs (same lineage -> same shuffle id ->
    // skipped stages) instead of re-shuffling the corpus
    val parted = scored.select(col("id").cast("long"), col("score"))
      .repartitionByRange(col("score"), col("id"))
      .sortWithinPartitions(col("score"), col("id"))
      .rdd
    val counts = parted.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.length.toLong))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](counts.length)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val n = acc
    val bc = spark.sparkContext.broadcast(offsets)
    val b = nBuckets.toLong
    parted.mapPartitionsWithIndex { (pid, it) =>
      var rk = bc.value(pid)
      it.map { r =>
        rk += 1
        (r.getLong(0), r.getDouble(1), rk, (rk - 1) * b / n)
      }
    }.toDF("id", "score", "rank", "bucket")
  }

  /** Deterministic seeded EPOCH SHUFFLE: the global training-order
    * shuffle every LLM data pipeline runs before sequence packing. Each
    * row gets a reproducible pseudorandom sort key md5(seed:id); the
    * corpus is ordered by that key and dealt round-robin into `nShards`
    * worker shards (shard = rank % S, pos = rank / S) — every worker
    * streams an evenly-sized, disjoint, well-mixed slice, and changing
    * the seed re-deals the next epoch with zero data movement of the
    * underlying docs (the shuffle output is an (id, shard, pos) manifest
    * to join or zip against the packed blocks).
    *
    * Scale: the global order is computed WITHOUT a single-partition
    * window — repartitionByRange on the hash range-partitions the
    * corpus, each partition sorts locally, and the global rank is the
    * local rank plus a per-partition offset (one count row per
    * partition, driver-merged: the [[curriculumBuckets]] discipline).
    * One range shuffle, linear in the corpus. */
  def epochShuffle(docs: DataFrame, seed: String, nShards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs.select(col("id").cast("long"),
        md5(concat_ws(":", lit(seed), col("id").cast("string"))).as("h"))
      .repartitionByRange(col("h"), col("id"))
      .sortWithinPartitions(col("h"), col("id"))
      .rdd
    val counts = keyed.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.length.toLong))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](counts.length)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val bc = spark.sparkContext.broadcast(offsets)
    val s = nShards.toLong
    keyed.mapPartitionsWithIndex { (pid, it) =>
      var rk = bc.value(pid) // 0-based global rank in hash order
      it.map { r =>
        val k = rk
        rk += 1
        (r.getLong(0), (k % s).toInt, k / s)
      }
    }.toDF("id", "shard", "pos")
  }

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score each candidate
    * document by how much more likely its hashed word-bigram features are
    * under the TARGET distribution than under the RAW corpus
    * distribution. score(doc) = avg over its bigrams of
    * ln p̂_tgt(bucket) − ln p̂_raw(bucket), with add-0.5 smoothing over
    * `nBuckets` hashed feature buckets; high scores = raw docs that look
    * like the target domain — the standard cheap proxy for "select
    * pretraining data resembling a trusted corpus".
    *
    * Bucket hash is md5-based so an external engine replays it verbatim;
    * the per-doc average is half-up rounded to 4 dp (the repo-wide ln
    * convention) so summation order never flips a comparison.
    *
    * Scale: one explode pass over the corpus (linear), TWO aggregations
    * whose result is `nBuckets` rows (map-side combined — the shuffle
    * carries ≤ nBuckets rows per partition regardless of corpus size), a
    * broadcast of the nBuckets-row log-ratio table back onto the
    * exploded grams, and a per-doc aggregation. No all-pairs, no
    * corpus-sized broadcast, no driver loop — the same shape at 100 TB
    * with a bigger bucket count. */
  def dsirScores(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      nBuckets: Int = 512): DataFrame = {
    import graft.functions.VectorFunctions.roundHU
    val bkt = docs
      .select(col("id"), isTarget.as("tgt"), split(col("text"), " ").as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("id"), col("tgt"), explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), " +
          "(w, i) -> concat(w, ' ', ws[i + 1]))")).as("g"))
      .select(col("id"), col("tgt"),
        (conv(substring(md5(concat(lit("dsir:"), col("g"))), 1, 8), 16, 10)
          .cast("long") % nBuckets).as("b"))
    val stats = bkt.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
    // corpus-total gram counts: one broadcast-able row
    val tot = stats.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val half = lit(nBuckets * 0.5)
    val lr = stats.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + lit(0.5)) / (col("nt") + half)) -
          log((col("cr") + lit(0.5)) / (col("nr") + half))).as("lr"))
    // buckets absent from the corpus cannot occur in any doc (docs are a
    // subset of the corpus), so the stats table is complete for the join
    bkt.where(!col("tgt"))
      .join(broadcast(lr), "b")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_grams"), roundHU(avg(col("lr")), 4).as("score"))
  }

  /** LEAKAGE-SAFE deterministic train/val/test split: the split key is a
    * hash of the TEXT, not the id — exact duplicates always land in the
    * same split, so a held-out doc can never have a train-set twin (the
    * classic contamination bug an id-keyed split invites; q115 audits
    * NEAR-dup leakage across a given split, this prevents the exact-dup
    * case by construction). Deterministic, data-independent, map-only:
    * any executor can split any row with no coordination, and re-running
    * on a grown corpus never moves a previously-assigned text.
    *
    * Buckets are md5-derived (the oracle-replayable convention);
    * `trainPct`/`valPct` are integer percents of the 100-bucket space. */
  def safeSplit(docs: DataFrame, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct + valPct < 100, "need a nonempty test slice")
    val b = conv(substring(md5(concat(lit("split:"), col("text"))), 1, 8), 16, 10)
      .cast("long") % 100
    docs.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Boilerplate removal (CCNet-shape): split each doc into fixed
    * `chunkWords`-word chunks, count each chunk text's document frequency
    * WITHIN its source (the "per-domain" grouping), drop chunks appearing
    * in >= dfThreshold docs of that source, and reassemble the survivors
    * in order. Output: id, n_chunks, n_kept, clean_md5.
    *
    * Scale: the explode is linear in corpus size; the df count is a
    * groupBy on (source, chunk-hash) with map-side combine; the join back
    * is an equi-join on the same key; reassembly groups by doc id.
    * Chunk ORDER inside a doc rides along as a position column —
    * array_sort on (pos, chunk) structs, no window needed.
    */
  def boilerplateClean(docs: DataFrame, chunkWords: Int, dfThreshold: Long)
      : DataFrame = {
    val w = split(col("text"), " ")
    val nChunks = ceil(size(w).cast("double") / chunkWords).cast("int")
    val chunks = docs.select(col("id"), col("source"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => array_join(slice(w, i * chunkWords + 1, lit(chunkWords)), " "))))
      .withColumnRenamed("pos", "chunk_pos")
      .withColumnRenamed("col", "chunk")
    val df = chunks.select(col("source"), col("chunk"), col("id")).distinct()
      .groupBy(col("source"), col("chunk"))
      .agg(count(lit(1)).as("chunk_df"))
    chunks.join(df, Seq("source", "chunk"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_df") < dfThreshold, 1L).otherwise(0L))
          .as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(when(col("chunk_df") < dfThreshold,
            struct(col("chunk_pos"), col("chunk"))))),
          c => c.getField("chunk")), " ")).as("clean_md5"))
  }
}
