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
