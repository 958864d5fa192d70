package graft

import org.apache.spark.sql.functions._
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  /** Sequential single-threaded reference: exclusive prefix sum + block
    * span, computed driver-side over the same (id, text) rows. */
  private def reference(rows: Seq[(Long, String)], b: Long)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    var off = 0L
    rows.sortBy(_._1).map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val start = off
      off += n
      val bf = start / b
      val bl = (start + n - 1) / b
      id -> ((n, start, bf, bl, bl - bf + 1))
    }.toMap
  }

  private def mkDocs(rows: Seq[(Long, String)], parts: Int) =
    spark.createDataset(rows).toDF("id", "text").repartition(parts)

  test("packChunks matches the sequential reference across partitions") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 500L).map { id =>
      val n = 1 + rnd.nextInt(40)
      id -> Seq.fill(n)("w").mkString(" ")
    }
    val exp = reference(rows, 16)
    for (parts <- Seq(1, 3, 13)) {
      val got = Packing.packChunks(mkDocs(rows, parts), 16)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5))))
        .toMap
      assert(got === exp, s"parts=$parts")
    }
  }

  test("packChunks handles a doc exactly filling a block and one spanning many") {
    val rows = Seq(
      1L -> Seq.fill(8)("a").mkString(" "),  // fills block 0 exactly
      2L -> Seq.fill(20)("b").mkString(" "), // spans blocks 1..3
      3L -> "c")                             // lands in block 3
    val got = Packing.packChunks(mkDocs(rows, 2), 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array((1L, 0L, 0L, 0L), (2L, 8L, 1L, 3L), (3L, 28L, 3L, 3L)))
  }

  test("packCounts: zero-token rows occupy their start block (block_last == block_first)") {
    import spark.implicits._
    // row 2 has n=0 AT a block boundary (start_off=8): floor((8+0-1)/8)=0
    // would put block_last in the PREVIOUS block; the contract (mirrored in
    // the Oracles.packFromCounts CASE) is block_last = block_first = 1
    val counts = Seq((1L, 8L), (2L, 0L), (3L, 3L)).toDF("id", "n")
    val got = Packing.packCounts(counts, 8)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got === Array((1L, 0L, 0L, 0L), (2L, 8L, 1L, 1L), (3L, 8L, 1L, 1L)))
  }

  test("blockSummary counts contained vs spanning docs") {
    val rows = Seq(
      1L -> Seq.fill(4)("a").mkString(" "),
      2L -> Seq.fill(4)("b").mkString(" "),  // blocks 0: docs 1,2 both full
      3L -> Seq.fill(12)("c").mkString(" ")) // spans blocks 1..2
    val got = Packing.blockSummary(Packing.packChunks(mkDocs(rows, 2), 8))
      .orderBy("block_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got === Array((0L, 2L, 2L), (1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("blockContents: every block but the last is exactly B tokens; stream reassembles") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 120L).map { id =>
      val n = 1 + rnd.nextInt(20)
      id -> (0 until n).map(j => s"w${id}_$j").mkString(" ")
    }
    val blocks = Packing.blockContents(mkDocs(rows, 5), 16)
      .orderBy("block_id").collect()
    val total = rows.map(_._2.split(" ").length.toLong).sum
    assert(blocks.map(_.getLong(2)).sum === total)
    // all but the last block hold exactly 16 tokens
    blocks.dropRight(1).foreach(b => assert(b.getLong(2) === 16L, s"block $b"))
    assert(blocks.last.getLong(2) <= 16L)
    // block ids are dense from 0
    assert(blocks.map(_.getLong(0)).toSeq === (0L until blocks.length).toSeq)
    // content check: block 0's md5 equals the first 16 tokens of the stream
    import org.apache.spark.sql.functions.md5
    val stream = rows.sortBy(_._1).flatMap(_._2.split(" "))
    val expect0 = Seq((0L, stream.take(16).mkString(" "))).toDF("id", "t")
      .select(md5(col("t"))).as[String].head()
    assert(blocks.head.getString(3) === expect0)
  }

  test("packChunks token stream is gap-free: total blocks cover total tokens") {
    val rows = (0L until 97L).map(id => id -> Seq.fill(5)("x").mkString(" "))
    val packed = Packing.packChunks(mkDocs(rows, 4), 7)
    val total = packed.agg(sum("n_tokens")).as[Long].head()
    val lastBlock = packed.agg(max("block_last")).as[Long].head()
    assert(total === 97L * 5)
    assert(lastBlock === (total - 1) / 7)
    // offsets are dense: sorted start_offs equal the running sum
    val offs = packed.orderBy("id").select("start_off").as[Long].collect()
    assert(offs === (0L until 97L).map(_ * 5).toArray)
  }
}
