package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Contract tests for the measured-scale generator (graft.ScaleGen).
  *
  * The scale harness's numbers are only evidence if the replicated corpus
  * behaves like a corpus that GREW — these pin the replication model's
  * invariants at n=3 over sf0.001:
  *
  *  - per-replica vocabulary bijection: word order kept, shingle
  *    intersections/unions preserved exactly → a mapped near-dup pair has
  *    the SAME exact Jaccard as its base pair (the dedup-rate invariance
  *    the scaladoc claims);
  *  - cross-replica isolation: LSH candidates never span replicas (no
  *    phantom N-way dups — the first-cut word-shuffle generator failed
  *    exactly this, 1000× candidate blow-up at 10×);
  *  - id discipline: all ids distinct, probe-safe (never ≡ 0 mod 25),
  *    and disjoint from the dedup queries' planted-dup range (id + 1e5);
  *  - volume: tokens scale ×n while the vocabulary stays shared (unigram
  *    df grows — the postings-probe scaling realism claim).
  */
class ScaleGenSpec extends SparkSpec {
  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("scalegen").toString
    ScaleGen.generate(spark, sf0, 3, dir)
    dir
  }
  private def baseDocs =
    Tables.documents(spark, sf0).select(col("doc_id").as("id"), col("text"))
  private def repDocs =
    spark.read.parquet(s"$out/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
  /** Replica of base id `id` in rep r (the generator's probe-safe offset). */
  private def off(id: Long, r: Long): Long =
    if (r == 0) id else r * 1000000L + id + id / 24 + 1

  test("replica ids: distinct, probe-safe, disjoint from planted-dup range") {
    val n = baseDocs.count()
    assert(repDocs.count() === 3 * n)
    assert(repDocs.select("id").distinct().count() === 3 * n)
    // r>0 ids never ≡ 0 (mod 25): the stride-derived probe batches stay
    // replica-0-only, so query workloads are fixed while the corpus grows
    assert(repDocs.where(col("id") >= 1000000L && col("id") % 25 === 0)
      .count() === 0)
    // docsWithDups plants exact dups at id + 100000: that range must never
    // collide with a real id at ANY replica count (the base-1e6 contract)
    val ids = repDocs.select(col("id"))
    assert(ids.join(ids.select((col("id") + 100000L).as("id")), "id")
      .count() === 0)
  }

  test("vocabulary bijection preserves word order structure and exact Jaccard") {
    // invariance holds for ANY doc pair (not only near-dups): π_r-renamed
    // shingle sets have identical intersection/union sizes, so a mapped
    // pair must verify at EXACTLY the same (rounded) Jaccard. Pair
    // consecutive ids (50 of them) + whatever LSH candidates exist.
    val ids = baseDocs.select(col("id"))
    val consecutive = ids.as("a")
      .join(ids.select((col("id") + 1).as("id")).as("b"), "id")
      .select((col("id") - 1).as("id_a"), col("id").as("id_b")).limit(50)
    val basePairs = consecutive
      .unionByName(Dedup.lshCandidates(baseDocs, maxBandSize = 100))
      .distinct().localCheckpoint()
    val baseJ = Dedup.jaccardVerify(baseDocs, basePairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(baseJ.size >= 25, "fixture too small to exercise the invariance")
    for (r <- 1 to 2) {
      def offCol(c: org.apache.spark.sql.Column) =
        lit(r * 1000000L) + c + floor(c / 24).cast("long") + 1
      val mapped = basePairs.select(
        offCol(col("id_a")).as("id_a"), offCol(col("id_b")).as("id_b"))
      val repJ = Dedup.jaccardVerify(repDocs, mapped)
        .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getDouble(2)).toMap
      assert(repJ.size === baseJ.size)
      for (((a, b), j) <- baseJ)
        assert(repJ((off(a, r), off(b, r))) === j,
          s"pair ($a,$b) rep $r jaccard drifted")
    }
  }

  test("LSH candidates never span replicas; band sizes stay base-shaped") {
    val banded = Dedup.minhashBandsLong(repDocs)
    // replica of a doc id: 0 for base ids, else the 1e6 quotient
    val withRep = banded.withColumn("rep", floor(col("id") / 1000000L))
    val crossRep = withRep.as("a")
      .join(withRep.as("b"),
        col("a.band") === col("b.band") && col("a.rep") < col("b.rep"))
      .count()
    assert(crossRep === 0,
      s"$crossRep cross-replica band collisions: replicas must be " +
        "shingle-disjoint or dedup candidates blow up quadratically")
    // the word-shuffle bug's signature was mega-bands (max 755 vs base 5):
    // each replica is a fresh LSH draw at the base corpus's J structure,
    // so its max band stays within a small factor of the base draw
    val baseMax = Dedup.minhashBandsLong(baseDocs)
      .groupBy("band").count().agg(max("count")).collect()(0).getLong(0)
    val repMax = banded.groupBy("band").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(repMax <= 2 * baseMax + 2,
      s"replica max band $repMax vs base $baseMax: canonicalization artifact")
  }

  test("tokens scale ×n over a shared vocabulary (df grows)") {
    def stats(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .agg(count(lit(1)), countDistinct(col("w")))
      .collect()(0)
    val b = stats(baseDocs)
    val r = stats(repDocs)
    assert(r.getLong(0) === 3 * b.getLong(0), "token volume must scale ×n")
    assert(r.getLong(1) === b.getLong(1),
      "vocabulary must stay shared (π_r is a bijection on the base vocab)")
  }
}
