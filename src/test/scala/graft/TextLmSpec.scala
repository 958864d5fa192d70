package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

/** TextStats.stupidBackoffScore — the trigram stupid-backoff LM filter.
  * Pins every arm of the backoff ladder on a corpus small enough to check
  * by hand: trigram hit, backoff-to-bigram, backoff-to-unigram, and the
  * OOV floor, with counts trained on the even-id half only. */
class TextLmSpec extends SparkSpec {

  test("every backoff arm scores exactly by the ladder") {
    import spark.implicits._
    // train half (even ids): N = 8 tokens; c1: a=3 b=2 c=2 d=1
    // tri counts: (a,b,c)=2 (b,c,d)=1 (b,c,a)=1; bi: (a,b)=2 (b,c)=2 (c,d)=1 (c,a)=1
    val docs = Seq(
      (0L, "a b c d"),     // train
      (2L, "a b c a"),     // train
      (1L, "a b c x d"),   // held out: trigram hit + OOV floor + unigram arm
      (5L, "c a b")        // held out: backoff-to-bigram arm
    ).toDF("id", "text")
    val out = TextStats.stupidBackoffScore(docs, isTrain = col("id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    def rhu4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = 8.0
    // id 1: (a,b,c) seen -> 2/2; (b,c,x) OOV x -> 0.4*0.4*0.5/N;
    //       (c,x,d) unseen bigram, d in vocab -> 0.4*0.4*1/N
    val exp1 = rhu4((math.log(2.0 / 2.0) + math.log(0.4 * 0.4 * 0.5 / n) +
      math.log(0.4 * 0.4 * 1.0 / n)) / 3)
    assert(out(1L) === ((3L, exp1)))
    // id 5: (c,a,b) no trigram, bigram (a,b)=2 over c1(a)=3 -> 0.4*2/3
    val exp5 = rhu4(math.log(0.4 * 2.0 / 3.0))
    assert(out(5L) === ((1L, exp5)))
    // train docs score through the same cascade (all trigrams seen)
    // id 0: (a,b,c): 2/2; (b,c,d): 1/2
    val exp0 = rhu4((math.log(1.0) + math.log(0.5)) / 2)
    assert(out(0L) === ((2L, exp0)))
    // id 2: (a,b,c): 2/2; (b,c,a): 1/2
    assert(out(2L) === ((2L, exp0)))
  }

  test("short docs emit zero trigrams and a null score") {
    import spark.implicits._
    val docs = Seq((0L, "a b c"), (1L, "a b")).toDF("id", "text")
    val out = TextStats.stupidBackoffScore(docs, isTrain = col("id") % 2 === 0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.isNullAt(2)))).toMap
    assert(out(1L) === ((0L, true)))
    assert(out(0L)._1 === 1L)
  }
}
