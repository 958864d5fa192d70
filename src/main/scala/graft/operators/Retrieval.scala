package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval + hybrid fusion — the lexical counterpart of the
  * vector-search family, completing the retrieval stack a training-data
  * pipeline queries with (near-dup mining by keyword, targeted corpus
  * slicing, hybrid recall for eval sets).
  *
  * BM25 is computed relationally: term stats (tf, df, dl) are small-key
  * aggregations over the token explode, the query side joins on the term
  * equi-key, and the per-(query, doc) score is one map-side-combinable
  * SUM — no cross product anywhere; at 100 TB this is the inverted-index
  * shape (term -> postings) expressed as joins, with the scan cost
  * bounded by the posting lists the query terms touch.
  *
  * Fusion uses reciprocal-rank fusion with an INTEGER-SCALED reciprocal
  * (1e12 div (K + rank), summed as BIGINT) — deliberately, so the fused
  * score is exact integer arithmetic: float RRF sums a handful of
  * near-equal doubles whose addition order differs between engines, and
  * a last-ULP flip would change a rank. Integer RRF is order-independent
  * and therefore hash-checkable (the same monotone ordering as float RRF
  * for any list shorter than ~1e6).
  */
object Retrieval {

  /** BM25 top-k (Robertson/Lucene form): idf = ln(1 + (N - df + 0.5) /
    * (df + 0.5)), tf saturation k1, length normalization b against the
    * mean doc length. Query terms are DISTINCT (duplicate query words
    * score once, the Lucene convention). Ranking on the 4-dp-rounded
    * score DESC with doc id tie-break.
    *
    * @param docs    (id, text) corpus
    * @param queries (qid, qtext) keyword queries
    * @return (qid, rank, id, score), rank <= k
    */
  /** The BM25 index: per-(doc, term) frequencies, per-doc lengths, the
    * idf table, and the corpus mean length — built ONCE over the corpus
    * (index-build work, like the PQ codes or the shard layout) and
    * consumed by every query batch. */
  final case class Bm25Index(tf: DataFrame, dl: DataFrame, idf: DataFrame,
      avgdl: Double)

  def bm25Index(docs: DataFrame): Bm25Index = {
    val toks = docs
      .select(col("id"), explode(split(col("text"), " ")).as("term"))
      .where(length(col("term")) > 0)
    val tf = toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = toks.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    // corpus constants: two scalars (index metadata, like the centroids)
    val nDocs = docs.agg(count(lit(1))).head().getLong(0)
    val avgdl = dl.agg(avg(col("dl"))).head().getDouble(0)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = df.select(col("term"),
      log(lit(1.0) + (lit(nDocs.toDouble) - col("df") + lit(0.5)) /
        (col("df") + lit(0.5))).as("idf"))
    Bm25Index(tf, dl, idf, avgdl)
  }

  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKWith(bm25Index(docs), queries, k, k1, b)

  /** The PROBE over a prebuilt index: query terms equi-join the posting
    * stats, one map-side-combinable SUM per (query, doc), one top-k. */
  def bm25TopKWith(idx: Bm25Index, queries: DataFrame, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qterms = queries
      .select(col("qid"), explode(split(col("qtext"), " ")).as("term"))
      .where(length(col("term")) > 0)
      .distinct()
    val contrib = qterms
      .join(idx.idf, "term")
      .join(idx.tf, "term")
      .join(idx.dl, "id")
      .select(col("qid"), col("id"),
        (col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(idx.avgdl))))
          .as("c"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    contrib
      .groupBy(col("qid"), col("id"))
      .agg(round(sum(col("c")), 4).as("score"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Max-passage (late-interaction) retrieval over RAG chunks: each doc
    * is scored by its BEST chunk against the query — the BERT-era
    * max-passage pattern (and the k=1 core of ColBERT's MaxSim), which
    * beats whole-doc scoring when the answer lives in one passage of a
    * long document.
    *
    * The featurizer is a hashed bag-of-words: token -> Karp–Rabin fold
    * (the q112 convention) mod `nBuckets`, chunk vector = int64 bucket
    * counts. It deterministically stands in for a learned chunk embedder
    * (which would arrive as exactly this (chunk, bucket, weight) shape);
    * all the retrieval plumbing — chunk grid, sparse dot, per-doc max,
    * top-k — is real and identical for a trained model.
    *
    * Scale shape: chunk vectors stay SPARSE (chunk, bucket, count) rows —
    * never a dense matrix; the query side is tiny and broadcast; the dot
    * product is a bucket-keyed equi-join + one partial-agg SUM (the
    * inverted-index shape, like BM25); per-chunk cosine rounds rHU(4)
    * BEFORE the per-doc max so tie behavior is engine-exact; the final
    * top-k is a WindowGroupLimit. Empty chunks have no buckets and
    * naturally never score.
    *
    * @param docs    (id, text) corpus
    * @param queries (qid, qtext) short queries
    * @return (qid, rank, id, score), rank <= k by (best-chunk cosine
    *         DESC, id) */
  /** Positional inverted index: one (id, pos, term) row per token — the
    * index layout phrase/proximity search needs (tf alone cannot see
    * adjacency). At scale this is the standard postings-with-positions
    * shape: partitioned by term for the probe equi-join, positions as
    * plain int64 columns. */
  def positionalIndex(docs: DataFrame): DataFrame =
    docs
      .select(col("id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .where(length(col("term")) > 0)

  /** EXACT phrase search over the positional index, entirely as
    * relational algebra — no per-document string rescans: phrase terms
    * arrive long-form as (qid, i, term) with i the 0-based offset; each
    * joins the index on term (the ONLY join key — an equi-join a 100 TB
    * postings layout co-locates by term), projecting candidate start
    * `pos - i`; a (qid, id, start) group containing ALL n offsets is one
    * occurrence (count(*) = n — the i-th row can only come from position
    * start+i, so multiplicity is impossible). Output: (qid, id, n_occ)
    * per document with at least one occurrence — the adjacency-aware
    * complement of [[bm25TopKWith]]'s bag-of-words scoring.
    *
    * @param coLocated when true, the term join is forced to a sort-merge
    *        join so a term-BUCKETED postings table joins with zero
    *        Exchange on the postings side (the q127 layout discipline —
    *        what "postings partitioned by term" buys at scale); when
    *        false (default) the tiny query side is broadcast instead. */
  def phraseMatch(index: DataFrame, phraseTerms: DataFrame,
      coLocated: Boolean = false): DataFrame = {
    val n = phraseTerms
      .groupBy(col("qid")).agg(count(lit(1)).as("n_terms"))
    // broadcast the QUERY side explicitly: postings are the corpus-sized
    // side (checkpoint-backed here, so the CBO has no stats and would
    // happily build the hash table on the INDEX — backwards at any scale)
    val probe =
      if (coLocated) phraseTerms.join(index.hint("merge"), "term")
      else broadcast(phraseTerms).join(index, "term")
    probe
      .select(col("qid"), col("id"), (col("pos") - col("i")).as("start"))
      .groupBy(col("qid"), col("id"), col("start"))
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(n), "qid")
      .where(col("n_hit") === col("n_terms"))
      .groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** Bigram positional index: (id, pos, b) with b = word(pos) ⊕ ' ' ⊕
    * word(pos+1) over the same raw split positions as [[positionalIndex]]
    * (a row only when both component words are non-empty, mirroring the
    * unigram index's empty-term filter; words cannot contain the space
    * delimiter, so the concatenation is collision-free).
    *
    * Why a second index layout: phrase probes over UNIGRAM postings pay
    * Σ df(term) join output — on a stopword-heavy (or small-vocabulary)
    * corpus that is corpus-sized per frequent term (measured 54M joined
    * rows for 200 three-word phrases at 10× sf0.1, the q145 scaling
    * ceiling). Adjacent-PAIR postings make the join key the pair, whose
    * df is the co-occurrence count — measured 100× smaller on the same
    * probe (498k rows). Same index size (one row per token), same
    * equi-join shape, same bucketable-by-key layout; this is the
    * selectivity step a positional index takes before full n-gram
    * indexing. */
  def positionalBigramIndex(docs: DataFrame): DataFrame =
    docs
      .select(col("id"), split(col("text"), " ").as("ws"))
      .select(col("id"), posexplode(expr(
        "transform(slice(ws, 1, greatest(size(ws) - 1, 0)), " +
          "(w, i) -> struct(w AS w1, ws[i + 1] AS w2))")).as(Seq("pos", "p")))
      .where(length(col("p.w1")) > 0 && length(col("p.w2")) > 0)
      .select(col("id"), col("pos"),
        concat(col("p.w1"), lit(" "), col("p.w2")).as("b"))

  /** EXACT phrase search over the bigram positional index — identical
    * answers to [[phraseMatch]] for phrases of ≥ 2 terms (RetrievalSpec
    * asserts row-identity): the phrase's n−1 adjacent-pair constraints
    * at offsets i ∈ [0, n−2] each join the index on the pair key and
    * project candidate start `pos − i`; a (qid, id, start) group holding
    * all n−1 pairs chains into the full n-term adjacency. Multiplicity
    * is impossible for the same reason as the unigram proof: constraint
    * i can only produce a given start from position start+i, once.
    * Single-term phrases have no pair constraint and are out of this
    * operator's contract — route those to [[phraseMatch]]. */
  def phraseMatchBigram(bgIndex: DataFrame, phraseTerms: DataFrame,
      coLocated: Boolean = false): DataFrame = {
    val a = phraseTerms.select(col("qid"), col("i"), col("term"))
    val bg = a.as("a").join(a.as("b"),
        col("a.qid") === col("b.qid") && col("b.i") === col("a.i") + 1)
      .select(col("a.qid").as("qid"), col("a.i").as("i"),
        concat(col("a.term"), lit(" "), col("b.term")).as("b"))
    val n = bg.groupBy(col("qid")).agg(count(lit(1)).as("n_pairs"))
    // coLocated: the index is a bucketBy(b) table — the SMJ reads its
    // hash distribution, so ONLY the tiny pair-constraint side shuffles
    // (the q149 layout discipline applied to the selective bigram key)
    val probe =
      if (coLocated) bg.join(bgIndex.hint("merge"), "b")
      else broadcast(bg).join(bgIndex, "b")
    probe
      .select(col("qid"), col("id"), (col("pos") - col("i")).as("start"))
      .groupBy(col("qid"), col("id"), col("start"))
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(n), "qid")
      .where(col("n_hit") === col("n_pairs"))
      .groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** The chunk index: sparse (id, ci, bucket, cc) hashed-BOW chunk
    * vectors + per-chunk norms — built ONCE over the corpus (index-build
    * work, like [[Bm25Index]] or the PQ codes) and consumed by every
    * query batch. */
  final case class ChunkIndex(cb: DataFrame, cn: DataFrame)

  private def krBucketCol(word: org.apache.spark.sql.Column, nBuckets: Int) =
    aggregate(sequence(lit(1), length(word)), lit(0L),
      (acc, i) => (acc * 257L + ascii(word.substr(i, lit(1)))) % 1000000007L) %
      nBuckets

  def maxPassageIndex(docs: DataFrame, chunkSize: Int = 32, stride: Int = 24,
      nBuckets: Int = 64): ChunkIndex = {
    val toks = filter(split(col("text"), " "), t => length(t) > 0)
    // the KR fold runs once per DISTINCT word (vocab-sized dict, AQE
    // broadcasts it), not once per (token, chunk) occurrence
    val dict = docs.select(explode(toks).as("w")).distinct()
      .select(col("w"), krBucketCol(col("w"), nBuckets).as("bucket"))
    // chunk membership is arithmetic on the 0-based token position: token
    // p sits in chunks ci ∈ [ceil((p-chunkSize+1)/stride), p DIV stride]
    // clamped to the grid — ≤ ceil(chunkSize/stride) rows per token, no
    // chunk arrays ever materialized
    val cb = docs
      .select(col("id"), posexplode(toks).as(Seq("p", "w")),
        size(toks).as("n"))
      .withColumn("nc", expr(
        s"CASE WHEN n <= $chunkSize THEN 1 ELSE 1 + (n - $chunkSize + ${stride - 1}) DIV $stride END"))
      .select(col("id"), col("w"),
        explode(sequence(
          greatest(lit(0), expr(s"(p - $chunkSize + $stride) DIV $stride")),
          least(col("nc") - 1, expr(s"p DIV $stride")))).as("ci"))
      .join(dict, Seq("w"))
      .groupBy(col("id"), col("ci"), col("bucket"))
      .agg(count(lit(1)).as("cc"))
    val cn = cb.groupBy(col("id"), col("ci"))
      .agg(sqrt(sum(col("cc") * col("cc"))).as("cn"))
    ChunkIndex(cb, cn)
  }

  def maxPassage(docs: DataFrame, queries: DataFrame, k: Int = 10,
      chunkSize: Int = 32, stride: Int = 24, nBuckets: Int = 64): DataFrame =
    maxPassageWith(maxPassageIndex(docs, chunkSize, stride, nBuckets),
      queries, k, nBuckets)

  /** The PROBE over a prebuilt chunk index: query vectors broadcast into
    * the bucket-keyed sparse dot, rHU(4) cosine per chunk, per-doc max,
    * WindowGroupLimit top-k. */
  def maxPassageWith(idx: ChunkIndex, queries: DataFrame, k: Int = 10,
      nBuckets: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions.roundHU
    val cb = idx.cb
    val cn = idx.cn
    val qb = queries
      .select(col("qid"), explode(split(col("qtext"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .select(col("qid"), krBucketCol(col("w"), nBuckets).as("bucket"))
      .groupBy(col("qid"), col("bucket")).agg(count(lit(1)).as("qc"))
    val qn = qb.groupBy(col("qid"))
      .agg(sqrt(sum(col("qc") * col("qc"))).as("qn"))
    val best = cb.join(broadcast(qb), Seq("bucket"))
      .groupBy(col("qid"), col("id"), col("ci"))
      .agg(sum(col("cc") * col("qc")).as("dot"))
      .join(cn, Seq("id", "ci"))
      .join(broadcast(qn), Seq("qid"))
      .select(col("qid"), col("id"),
        roundHU(col("dot").cast("double") / (col("qn") * col("cn")), 4)
          .as("cscore"))
      .groupBy(col("qid"), col("id")).agg(max(col("cscore")).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    best
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score"))
  }

  /** Integer reciprocal-rank fusion of ranked lists: fused(qid, id) =
    * Σ_lists 1e12 div (kRrf + rank). Input lists carry (qid, rank, id);
    * output re-ranks by (fused DESC, id). */
  def rrfFuse(lists: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    val scaled = lists
      .map(_.select(col("qid"), col("id"),
        // `div`, not `/`: Spark's / on integers is double division, and
        // the whole point is exact integer arithmetic
        expr(s"1000000000000 div ($kRrf + rank)").cast("long").as("rr")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy(col("qid")).orderBy(col("fused").desc, col("id"))
    scaled
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("rr")).as("fused"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("fused"))
  }
}
