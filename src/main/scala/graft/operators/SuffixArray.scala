package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed SUFFIX ARRAY construction by prefix doubling — the
  * infrastructure behind exact-substring dedup at corpus scale (Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models Better",
  * builds exactly this over the concatenated corpus; q110's winnowed
  * Karp–Rabin anchors are the sampled approximation, this is the exact
  * tool). The corpus string is the concatenation of `text || chr(1)`
  * in id order; the result ranks every suffix of that string.
  *
  * Algorithm (Manber–Myers prefix doubling): rank suffixes by their
  * first character, then repeatedly re-rank by the pair
  * (rank of pos, rank of pos+k) for k = 1, 2, 4, … — after round k every
  * rank reflects the suffix's first 2k characters, and once all ranks
  * are distinct they equal the final suffix-array ranks. ceil(log2 n)
  * rounds, each round two relational primitives:
  *
  *  - the k-shift is a positional EQUI-JOIN (pos ↔ pos+k), never an
  *    unpartitioned window;
  *  - the pair re-rank is a DENSE RANK computed with the repo's
  *    range-partition discipline (epochShuffle / packCounts): range
  *    partition + partition-local sort, one count row per partition
  *    driver-merged into exclusive offsets, then a partition-local sweep
  *    — equal keys are never split across range partitions, so local
  *    distinct counts compose into an exact global dense rank. No
  *    single-partition sort anywhere.
  *
  * Each round materializes via localCheckpoint: the next round's sampling
  * pass plus two sweep passes would otherwise re-execute the whole
  * doubling chain (and 20 rounds of lineage would re-sample the range
  * partitioner per pass).
  *
  * Scale: rounds = ceil(log2 n) (~47 at 100 T chars); per round one
  * equi-join shuffle + one range shuffle over n rows. The driver holds
  * one long per partition per round plus a 1-row max aggregate (the
  * early-exit check — extra rounds past distinctness are no-ops, which
  * is what lets a fixed-round oracle replay an early-exiting build).
  * Positions are int64; ranks stay < n so nothing overflows. */
object SuffixArray {

  /** Dense rank of `df`'s rows under the (r, r2) sort key, as
    * (pos, r = dense rank, 0-based). Equal keys co-locate under the range
    * partitioner, so partition-local distinct counts + exclusive offsets
    * give the exact global dense rank. */
  private def denseRankPairs(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col("pos"), col("r"), col("r2"))
      .repartitionByRange(col("r"), col("r2"))
      .sortWithinPartitions(col("r"), col("r2"))
      .rdd
    val counts = keyed.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var lastR = Long.MinValue
      var lastR2 = Long.MinValue
      var seen = false
      it.foreach { row =>
        val r = row.getLong(1); val r2 = row.getLong(2)
        if (!seen || r != lastR || r2 != lastR2) { n += 1; seen = true }
        lastR = r; lastR2 = r2
      }
      Iterator.single((pid, n))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](counts.length)
    var acc = 0L
    counts.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    val bc = spark.sparkContext.broadcast(offsets)
    keyed.mapPartitionsWithIndex { (pid, it) =>
      var rk = bc.value(pid) - 1
      var lastR = Long.MinValue
      var lastR2 = Long.MinValue
      var seen = false
      it.map { row =>
        val r = row.getLong(1); val r2 = row.getLong(2)
        if (!seen || r != lastR || r2 != lastR2) { rk += 1; seen = true }
        lastR = r; lastR2 = r2
        (row.getLong(0), rk)
      }
    }.toDF("pos", "r")
  }

  /** Suffix-array ranks of the corpus string concat(text || chr(1)
    * ORDER BY id). Returns (pos, rank), one row per character position,
    * rank ∈ [0, n) = the suffix's position in the sorted suffix order.
    * `docs` must have (id, text). */
  def build(docs: DataFrame): DataFrame = {
    // per-doc start offsets: the packCounts two-phase prefix sum over
    // (length + 1 terminator) in id order
    val offs = Packing.packCounts(
        docs.select(col("id"), (length(col("text")) + 1).as("n")),
        blockTokens = Long.MaxValue)
      .select(col("id"), col("start_off"))
    // one row per character; initial rank = code point (terminator = 1),
    // correct because single-char ranks only need to be ORDER-consistent
    var sa = docs.join(offs, "id")
      .select(col("start_off"),
        posexplode(split(concat(col("text"), lit("\u0001")), "")))
      .select((col("start_off") + col("pos")).as("pos"),
        ascii(col("col")).cast("long").as("r"))
      .localCheckpoint()
    val n = sa.count()
    var k = 1L
    var done = false
    while (!done && k < n) {
      val shifted = sa.select((col("pos") - k).as("pos"), col("r").as("r2"))
      val paired = sa.join(shifted, Seq("pos"), "left")
        .select(col("pos"), col("r"),
          coalesce(col("r2"), lit(-1L)).as("r2")) // past-end = smallest
      val next = denseRankPairs(paired).localCheckpoint()
      sa.unpersist(blocking = false)
      sa = next
      // all ranks distinct <=> max rank == n-1: further rounds are no-ops
      done = sa.agg(max(col("r"))).collect()(0).getLong(0) == n - 1
      k *= 2
    }
    sa.select(col("pos"), col("r").as("rank"))
  }
}
