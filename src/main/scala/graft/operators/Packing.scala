package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training: concatenate the corpus in doc-id
  * order and chunk the token stream into fixed-length training blocks
  * (GPT-style "concat and chunk"). The output maps every document to its
  * place in the packed stream: global token offset plus the
  * [block_first, block_last] span of training sequences it lands in.
  *
  * Scale design: the only order-sensitive step is the global running token
  * offset, computed as a distributed two-phase prefix sum over the
  * (id, n_tokens) table — range-partition by id, per-partition local
  * cumsum, per-partition totals (≤ #partitions driver rows) collected once
  * and rebroadcast as exclusive prefix offsets. Both passes consume the
  * SAME shuffled DataFrame instance, so the shuffle map stage runs once
  * (the Intervals boundary-sweep idiom). The naive alternative — a
  * `Window.orderBy(id)` with no partition key — funnels the whole corpus
  * through ONE task and is exactly the 100 TB killer this avoids.
  *
  * The reference has no packing operator; this is part of the
  * training-data-pipeline extension family (SURVEY §2 additions).
  */
object Packing {

  /** Per-document packing map for fixed-size blocks of `blockTokens`
    * tokens. Tokens are whitespace words (the engine's corpus-wide
    * convention, `string_split(text, ' ')`).
    *
    * Output: id, n_tokens, start_off (exclusive prefix sum in id order),
    * block_first, block_last, n_blocks — all long. A document spans
    * `floor(start/B) .. floor((start+n-1)/B)`; documents never pad blocks
    * (concat-and-chunk splits documents across block boundaries, unlike
    * first-fit padding packers).
    */
  def packChunks(docs: DataFrame, blockTokens: Long): DataFrame =
    packCounts(
      docs.select(col("id").cast("long"),
        size(split(col("text"), " ")).cast("long").as("n")),
      blockTokens)

  /** [[packChunks]] over precomputed token counts (id, n). Callers whose
    * counts are the tail of an expensive pipeline should localCheckpoint
    * the input: the range partitioner's SAMPLING pass plus the two sweep
    * passes otherwise each re-run the upstream plan. */
  def packCounts(tokenCounts: DataFrame, blockTokens: Long): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val spark = tokenCounts.sparkSession
    import spark.implicits._
    val counts = tokenCounts
      .select(col("id").cast("long"), col("n").cast("long"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
    // pass 1: per-partition token totals -> exclusive prefix offsets
    val sums = counts.rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(1))
      Iterator.single((pid, s))
    }.collect().sortBy(_._1)
    val offsets = new Array[Long](sums.length)
    var acc = 0L
    sums.foreach { case (pid, s) => offsets(pid) = acc; acc += s }
    val bc = spark.sparkContext.broadcast(offsets)
    val b = blockTokens
    // pass 2 (same shuffle output): partition-local cumsum + global offset
    counts.rdd.mapPartitionsWithIndex { (pid, it) =>
      var off = bc.value(pid)
      it.map { r =>
        val id = r.getLong(0)
        val n = r.getLong(1)
        val start = off
        off += n
        val bf = start / b
        val bl = if (n == 0) bf else (start + n - 1) / b
        (id, n, start, bf, bl, bl - bf + 1)
      }
    }.toDF("id", "n_tokens", "start_off", "block_first", "block_last",
      "n_blocks")
  }

  /** Per-GROUP concat-and-chunk packing: each group (source/domain/epoch
    * shard) packs its own token stream independently. This is the form a
    * sharded 100 TB pipeline actually runs — the window is partitioned by
    * the group key, so every sort is partition-local and the global
    * single-task pitfall of an unpartitioned ORDER BY never arises (the
    * cross-group variant is [[packChunks]]'s two-phase sweep). Offsets
    * and block ids are group-local. */
  def packChunksByGroup(docs: DataFrame, blockTokens: Long): DataFrame = {
    require(blockTokens > 0, s"blockTokens must be positive: $blockTokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col("id").cast("long"), col("grp"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("start_off",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("block_first", expr(s"start_off div ${blockTokens}L"))
      // n == 0 guard mirrors packChunks: without it a zero-token row at a
      // block boundary hits div's truncate-toward-zero vs the oracle's
      // floor on (start_off - 1)
      .withColumn("block_last",
        when(col("n_tokens") === 0L, col("block_first"))
          .otherwise(expr(s"(start_off + n_tokens - 1) div ${blockTokens}L")))
  }

  /** Materialized training-block CONTENTS: the actual fixed-length token
    * sequences a trainer reads. Every doc contributes its token slice to
    * each block it spans; blocks reassemble from (start_off, piece)
    * structs — start offsets are globally unique, so array_sort gives the
    * exact stream order with no window. The one shuffle moves each token
    * exactly once, keyed by block_id (bounded, uniform) — this IS the
    * output write of a packing run, linear and unavoidable.
    * Output: (block_id, n_docs, n_tokens_blk, block_md5); every block
    * except the last has exactly blockTokens tokens. */
  def blockContents(docs: DataFrame, blockTokens: Long): DataFrame = {
    val b = blockTokens
    val joined = packChunks(docs, b)
      .join(docs.select(col("id").cast("long").as("id"), col("text")), "id")
    val e = joined.select(col("start_off"), col("n_tokens"),
      split(col("text"), " ").as("w"),
      explode(sequence(col("block_first"), col("block_last"))).as("block_id"))
    val from = greatest(lit(0L), col("block_id") * b - col("start_off"))
    val until = least(col("n_tokens"), (col("block_id") + 1) * b - col("start_off"))
    e.select(col("block_id"), col("start_off"),
        (until - from).as("len"),
        slice(col("w"), (from + 1).cast("int"), (until - from).cast("int"))
          .as("piece"))
      .groupBy(col("block_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("len")).cast("long").as("n_tokens_blk"),
        md5(array_join(flatten(transform(
          array_sort(collect_list(struct(col("start_off"), col("piece")))),
          x => x.getField("piece"))), " ")).as("block_md5"))
  }

  /** Block-level composition summary derived from [[packChunks]]: how many
    * documents contribute to each training sequence and how many of them
    * are fully contained (vs split across a boundary). Pure relational
    * fan-out — each doc emits its (≤ n_blocks) spanned block ids; the
    * aggregation shuffles on block_id, a key with bounded cardinality
    * (total_tokens / blockTokens).
    */
  def blockSummary(packed: DataFrame): DataFrame =
    packed
      .select(col("id"), col("block_first"), col("block_last"),
        explode(sequence(col("block_first"), col("block_last"))).as("block_id"))
      .groupBy(col("block_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("block_first") === col("block_id") &&
          col("block_last") === col("block_id"), 1L).otherwise(0L))
          .as("n_full_docs"))
}
