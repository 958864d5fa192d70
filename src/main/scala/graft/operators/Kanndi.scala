package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorFunctions._

/** KANNDI — "K Approximate Nearest Neighbours DIstance-based" sharding
  * (/root/reference/src/algorithms/sharding/kanndi/shard_by_distance.py:82-372).
  *
  * Reference semantics: greedy single pass — pick a seed (next unprocessed
  * point in file order), absorb unprocessed points within distance `d` of
  * the seed until the shard reaches `N/M` points; on starvation multiply
  * `d` by DIST_MULTIPLIER=2 (line 23,161-182); leftovers accumulate into a
  * special shard (lines 313-358); seeds are persisted as the routing
  * centroids (lines 365-370).
  *
  * Spark redesign (SURVEY §7.2 M5): the seed loop is inherently sequential,
  * so it runs as M driver-orchestrated rounds, each ONE distributed pass
  * over the unassigned remainder:
  *   candidates = unassigned.where(dist(seed,·) <= d)     — a filter, no shuffle
  *   admitted   = candidates.orderBy(dist,id).limit(cap)  — TakeOrdered, no full sort
  *   unassigned = unassigned antijoin admitted
  * Deviation from the reference (documented): admission is nearest-first
  * instead of file-order — same capacity/saturation semantics, better shards.
  * Lineage is cut with localCheckpoint every few rounds; at cluster scale
  * substitute a checkpoint dir. M is bounded (reference exercises M<=1000),
  * so the driver loop is M small jobs over a shrinking remainder.
  */
object Kanndi {

  final case class KanndiResult(assigned: DataFrame, seeds: DataFrame)

  val SpecialShard: Int = -2 // leftover accumulator (shard_by_distance.py:313-358)

  /** @param m          target number of shards
    * @param d0         initial admission distance (median pairwise distance
    *                   of a sample — compute_median_dist)
    * @param capacity   shard capacity; reference N/M
    * @param saturationPctMin minimum fill to accept without escalation (75)
    * @param adaptive   double `d` (up to maxDoublings) when a round starves
    */
  def shardByDistance(
      spark: SparkSession,
      points: DataFrame,
      m: Int,
      d0: Double,
      capacity: Long,
      saturationPctMin: Int = 75,
      adaptive: Boolean = false,
      maxDoublings: Int = 3,
      knownRows: Long = -1L): KanndiResult = {
    // Right-size partitioning for the round loop: each round runs several
    // tiny jobs (seed collect, admit, anti-join), so partitions should hold
    // ~50k+ rows or scheduling overhead dominates. Capped at the session's
    // parallelism; a real cluster run would raise the cap with its size.
    val nRows = if (knownRows >= 0) knownRows else points.count()
    val nParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nRows / 50000L).toInt + 1))
    var unassigned = points.select(col("id"), col("vec"))
      .repartition(nParts).localCheckpoint()
    val parts = ArrayBuffer.empty[DataFrame]
    val seedRows = ArrayBuffer.empty[(Int, Seq[Float])]
    var d = d0
    var sid = 0
    var exhausted = false
    while (sid < m && !exhausted) {
      // ONE TakeOrdered job doubles as the emptiness probe (empty result =>
      // no unassigned points left) and the seed fetch.
      val seedArr = unassigned.orderBy(col("id")).limit(1).collect()
      if (seedArr.isEmpty) { exhausted = true }
      else {
      val seed = seedArr(0)
      val seedVec = seed.getSeq[Float](seed.fieldIndex("vec"))
      seedRows += ((sid, seedVec))
      val seedLit = typedLit(seedVec)

      // limit() takes an Int; guard the Long capacity instead of silently
      // wrapping (a >2^31 per-shard capacity needs a window-based admission)
      require(capacity > 0 && capacity <= Int.MaxValue,
        s"shard capacity $capacity out of supported range (1, 2^31-1]")
      val distCol = round(l2Dist(col("vec"), seedLit), 4)
      def admit(dd: Double): DataFrame =
        unassigned
          .withColumn("dist", distCol)
          .where(col("dist") <= dd)
          .orderBy(col("dist"), col("id"))
          .limit(capacity.toInt)

      if (adaptive) {
        // Fold ALL escalation probes into ONE aggregate: candidate counts at
        // d, 2d, ... 2^maxDoublings·d in a single pass over the remainder,
        // then pick the smallest doubling that satisfies the saturation
        // floor (exactly the reference's sequential d*=2 loop,
        // shard_by_distance.py:161-182, without its per-step re-scan).
        val cnts = unassigned
          .select(distCol.as("dist"))
          .agg(
            sum(when(col("dist") <= d, 1L).otherwise(0L)).as("c0"),
            (1 to maxDoublings).map(i =>
              sum(when(col("dist") <= d * (1L << i), 1L).otherwise(0L)).as(s"c$i")): _*)
          .collect()(0)
        var dbl = 0
        while (dbl < maxDoublings &&
            math.min(cnts.getLong(dbl), capacity) * 100 < capacity * saturationPctMin) {
          dbl += 1
        }
        d *= (1L << dbl).toDouble // escalated d persists into later rounds
      }
      val admittedIds = admit(d).select(col("id"), col("dist")).localCheckpoint()
      parts += admittedIds.select(col("id"), lit(sid).as("shard_id"), col("dist"))
      unassigned = unassigned.join(admittedIds.select("id"), Seq("id"), "left_anti")
      if (sid % 4 == 3) unassigned = unassigned.localCheckpoint()
      sid += 1
      }
    }
    // leftovers -> special shard, dist undefined
    val leftover = unassigned.select(
      col("id"),
      lit(SpecialShard).as("shard_id"),
      lit(null).cast(DoubleType).as("dist"))
    val assigned = (parts :+ leftover).reduce(_.unionByName(_))

    val schema = StructType(Seq(
      StructField("shard_id", IntegerType, false),
      StructField("centroid", ArrayType(FloatType, true), true)))
    val seeds = spark.createDataFrame(
      spark.sparkContext.parallelize(seedRows.toSeq.map { case (s, v) => Row(s, v) }, 1),
      schema)
    KanndiResult(assigned, seeds)
  }

  /** Batched multi-seed KANNDI — the 100 TB path for the build loop.
    *
    * The reference's loop is seed-sequential, which costs M driver rounds
    * (its own 100M-point build ran 5h24m). This variant admits to
    * `batchSeeds` seeds per round: the batch's seeds are the lowest
    * unprocessed ids, every unassigned point within `d` of ANY batch seed
    * goes to its NEAREST one (engine ranking convention), and per-shard
    * capacity is enforced nearest-first via a per-shard rank
    * (`row_number <= cap` → WindowGroupLimit partial limits before the
    * shuffle). Rounds drop from M to ceil(M/batchSeeds).
    *
    * With batchSeeds=1 this is EXACTLY [[shardByDistance]] (KanndiSpec
    * asserts result equality, adaptive included); with larger batches it
    * deviates from the sequential reference the same way mini-batch K-Means
    * deviates from Lloyd's — same capacity/distance invariants,
    * near-identical shards, documented as the scale path.
    *
    * Adaptive escalation (`adaptive=true`) — the reference's starvation
    * recovery (d*=2 up to maxDoublings, shard_by_distance.py:161-182) on
    * the batch: ONE per-seed aggregate pass counts each seed's candidates
    * at d, 2d, ..., 2^maxDoublings·d (the sequential form's one-pass probe,
    * grouped by shard), each seed admits at ITS smallest doubling that
    * clears the saturation floor, and the escalated d persists into later
    * rounds as the max across the batch (escalation is monotone in the
    * reference too). At batchSeeds=1 this degenerates to the sequential
    * semantics bit-for-bit. */
  def shardByDistanceBatched(
      spark: SparkSession,
      points: DataFrame,
      m: Int,
      d0: Double,
      capacity: Long,
      batchSeeds: Int = 8,
      adaptive: Boolean = false,
      saturationPctMin: Int = 75,
      maxDoublings: Int = 3,
      knownRows: Long = -1L): KanndiResult = {
    require(capacity > 0 && capacity <= Int.MaxValue,
      s"shard capacity $capacity out of supported range (1, 2^31-1]")
    val nRows = if (knownRows >= 0) knownRows else points.count()
    val nParts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (nRows / 50000L).toInt + 1))
    var unassigned = points.select(col("id"), col("vec"))
      .repartition(nParts).localCheckpoint()
    val parts = ArrayBuffer.empty[DataFrame]
    val seedRows = ArrayBuffer.empty[(Int, Seq[Float])]
    var d = d0
    var sid = 0
    var exhausted = false
    while (sid < m && !exhausted) {
      val s = math.min(batchSeeds, m - sid)
      val batch = unassigned.orderBy(col("id")).limit(s).collect()
      if (batch.isEmpty) { exhausted = true }
      else {
        val seeds = batch.zipWithIndex.map { case (r, i) =>
          (sid + i, r.getSeq[Float](r.fieldIndex("vec")))
        }
        seeds.foreach(seedRows += _)
        // per-seed effective admission distance for this round
        val dEff: Map[Int, Double] =
          if (!adaptive) seeds.map(sd => sd._1 -> d).toMap
          else {
            val probeDf = spark.createDataFrame(
              spark.sparkContext.parallelize(
                seeds.toIndexedSeq.map { case (id0, v) => Row(id0, v) }, 1),
              StructType(Seq(
                StructField("shard_id", IntegerType, false),
                StructField("centroid", ArrayType(FloatType, true), true))))
            // one distributed pass: per-seed candidate counts at every
            // doubling (mirrors the sequential probe, grouped by shard)
            val cnts = unassigned
              .join(broadcast(probeDf))
              .select(col("shard_id"),
                round(l2Dist(col("vec"), col("centroid")), 4).as("dist"))
              .groupBy(col("shard_id"))
              .agg(
                sum(when(col("dist") <= d, 1L).otherwise(0L)).as("c0"),
                (1 to maxDoublings).map(i =>
                  sum(when(col("dist") <= d * (1L << i), 1L).otherwise(0L)).as(s"c$i")): _*)
              .collect()
            cnts.map { r =>
              var dbl = 0
              while (dbl < maxDoublings &&
                  math.min(r.getLong(1 + dbl), capacity) * 100 < capacity * saturationPctMin) {
                dbl += 1
              }
              r.getInt(0) -> d * (1L << dbl).toDouble
            }.toMap
          }
        if (adaptive) d = dEff.values.max // escalation persists across rounds
        val seedsDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            seeds.toIndexedSeq.map { case (id0, v) =>
              Row(id0, v, dEff(id0))
            }, 1),
          StructType(Seq(
            StructField("shard_id", IntegerType, false),
            StructField("centroid", ArrayType(FloatType, true), true),
            StructField("d_eff", DoubleType, false))))
        val admitted = unassigned
          .join(broadcast(seedsDf))
          .withColumn("dist", round(l2Dist(col("vec"), col("centroid")), 4))
          .where(col("dist") <= col("d_eff"))
          .groupBy(col("id"))
          .agg(min(struct(col("dist"), col("shard_id"))).as("best"))
          .select(col("id"), col("best.shard_id").as("shard_id"), col("best.dist").as("dist"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("shard_id")).orderBy(col("dist"), col("id"))))
          .where(col("rk") <= capacity.toInt)
          .select(col("id"), col("shard_id"), col("dist"))
          .localCheckpoint()
        parts += admitted
        unassigned = unassigned.join(admitted.select("id"), Seq("id"), "left_anti")
          .localCheckpoint()
        sid += seeds.length
      }
    }
    val leftover = unassigned.select(
      col("id"),
      lit(SpecialShard).as("shard_id"),
      lit(null).cast(DoubleType).as("dist"))
    val assigned = (parts :+ leftover).reduce(_.unionByName(_))
    val schema = StructType(Seq(
      StructField("shard_id", IntegerType, false),
      StructField("centroid", ArrayType(FloatType, true), true)))
    val seedsOut = spark.createDataFrame(
      spark.sparkContext.parallelize(seedRows.toSeq.map { case (s0, v) => Row(s0, v) }, 1),
      schema)
    KanndiResult(assigned, seedsOut)
  }

  /** Convenience: full reference pipeline — estimate d from a sample median,
    * capacity = N/M (shard_by_distance.py:98), then shard. */
  def shardAuto(
      spark: SparkSession,
      points: DataFrame,
      m: Int,
      sampleSize: Int,
      distScale: Double = 1.0,
      adaptive: Boolean = false): KanndiResult = {
    val medRow = Sharding.medianPairwiseDist(points, sampleSize).collect()(0)
    val d0 = medRow.getDouble(medRow.fieldIndex("median_dist")) * distScale
    val n = points.count()
    shardByDistance(spark, points, m, d0, capacity = n / m, adaptive = adaptive,
      knownRows = n)
  }
}
