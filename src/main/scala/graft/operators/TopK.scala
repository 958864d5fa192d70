package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact top-k-by-distance as a typed Aggregator (SURVEY §2.9) — the
  * aggregate alternative to the window/rank form of kNN.
  *
  * Scale shape: a bounded max-heap of k candidates per group per
  * partition; partial buffers combine map-side, so the shuffle carries at
  * most |queries| * k * numPartitions rows, with NO sort of the candidate
  * stream (the window form pays a per-partition sort under
  * WindowGroupLimit). Preferable when k is small and candidates per
  * partition are huge — exactly the 100 TB search case.
  *
  * Ordering matches the engine convention: (rounded dist, id) ascending.
  */
object TopK {

  final case class Cand(qid: Long, id: Long, dist: Double)
  final case class Neighbor(id: Long, dist: Double)

  /** Max-heap on (dist, id): the WORST neighbor is on top for O(log k)
    * eviction. */
  private def heapOrdering: Ordering[Neighbor] =
    Ordering.by((n: Neighbor) => (n.dist, n.id))

  class TopKAggregator(k: Int)
      extends Aggregator[Cand, mutable.PriorityQueue[Neighbor], Seq[Neighbor]] {
    override def zero: mutable.PriorityQueue[Neighbor] =
      mutable.PriorityQueue.empty(heapOrdering)

    override def reduce(
        b: mutable.PriorityQueue[Neighbor],
        a: Cand): mutable.PriorityQueue[Neighbor] = {
      b.enqueue(Neighbor(a.id, a.dist))
      if (b.size > k) b.dequeue()
      b
    }

    override def merge(
        a: mutable.PriorityQueue[Neighbor],
        b: mutable.PriorityQueue[Neighbor]): mutable.PriorityQueue[Neighbor] = {
      b.foreach { n => a.enqueue(n); if (a.size > k) a.dequeue() }
      a
    }

    override def finish(b: mutable.PriorityQueue[Neighbor]): Seq[Neighbor] =
      b.toSeq.sortBy(n => (n.dist, n.id))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[Neighbor]] =
      Encoders.kryo[mutable.PriorityQueue[Neighbor]]
    override def outputEncoder: Encoder[Seq[Neighbor]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Neighbor]]()
  }

  final case class CandS(qid: Long, id: Long, dist: Double, shard_id: Int)
  final case class NeighborS(id: Long, dist: Double, shard_id: Int)

  private def heapOrderingS: Ordering[NeighborS] =
    Ordering.by((n: NeighborS) => (n.dist, n.id))

  /** Shard-aware twin of [[TopKAggregator]] — carries the source shard of
    * each hit through the heap (the routed-search result schema). */
  class TopKSAggregator(k: Int)
      extends Aggregator[CandS, mutable.PriorityQueue[NeighborS], Seq[NeighborS]] {
    override def zero: mutable.PriorityQueue[NeighborS] =
      mutable.PriorityQueue.empty(heapOrderingS)

    override def reduce(
        b: mutable.PriorityQueue[NeighborS],
        a: CandS): mutable.PriorityQueue[NeighborS] = {
      b.enqueue(NeighborS(a.id, a.dist, a.shard_id))
      if (b.size > k) b.dequeue()
      b
    }

    override def merge(
        a: mutable.PriorityQueue[NeighborS],
        b: mutable.PriorityQueue[NeighborS]): mutable.PriorityQueue[NeighborS] = {
      b.foreach { n => a.enqueue(n); if (a.size > k) a.dequeue() }
      a
    }

    override def finish(b: mutable.PriorityQueue[NeighborS]): Seq[NeighborS] =
      b.toSeq.sortBy(n => (n.dist, n.id))

    override def bufferEncoder: Encoder[mutable.PriorityQueue[NeighborS]] =
      Encoders.kryo[mutable.PriorityQueue[NeighborS]]
    override def outputEncoder: Encoder[Seq[NeighborS]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NeighborS]]()
  }

  /** Exact kNN via the aggregator: same output as Knn.knnExact. */
  def knnExactAgg(
      spark: SparkSession,
      points: DataFrame,
      queries: DataFrame,
      k: Int): DataFrame = {
    import spark.implicits._
    import graft.functions.VectorFunctions._
    val cands = points
      .join(broadcast(queries))
      .select(col("qid"), col("id"),
        round(l2Dist(col("qvec"), col("vec")), 4).as("dist"))
      .as[Cand]
    cands
      .groupByKey(_.qid)
      .agg(new TopKAggregator(k).toColumn.name("nn"))
      .toDF("qid", "nn")
      .select(col("qid"), posexplode(col("nn")).as(Seq("pos", "n")))
      .select(col("qid"), (col("pos") + 1).cast("int").as("rank"),
        col("n.id").as("neighbor_id"), col("n.dist").as("dist"))
  }
}
