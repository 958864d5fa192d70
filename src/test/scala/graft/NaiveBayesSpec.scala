package graft

import org.apache.spark.sql.functions._

import graft.operators.TextStats

/** TextStats.nbTrain / nbScore — the learned quality filter (bootstrap
  * labels → closed-form multinomial Naive Bayes → per-doc log-odds). */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  test("nbTrain: hand-computed Laplace-smoothed log-odds on a tiny corpus") {
    val labeled = Seq(
      (1L, "good good fine", true),
      (2L, "good fine", true),
      (3L, "bad bad ugly", false),
      (4L, "bad ugly", false)).toDF("id", "text", "keep")
    val m = TextStats.nbTrain(labeled).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // t_keep = 5, t_drop = 5, V = 4; lo(w) = ln((ck+1)/9) - ln((cd+1)/9)
    def lo(ck: Long, cd: Long): Double =
      math.log((ck + 1).toDouble / 9) - math.log((cd + 1).toDouble / 9)
    assert(m.keySet === Set("good", "fine", "bad", "ugly"))
    assert(m("good")._1 === 3L && m("good")._2 === 0L)
    assert(math.abs(m("good")._3 - lo(3, 0)) < 1e-12)
    assert(math.abs(m("fine")._3 - lo(2, 0)) < 1e-12)
    assert(math.abs(m("bad")._3 - lo(0, 3)) < 1e-12)
    assert(math.abs(m("ugly")._3 - lo(0, 2)) < 1e-12)
    // symmetry of the planted corpus: bad is good's mirror
    assert(math.abs(m("bad")._3 + m("good")._3) < 1e-12)
  }

  test("nbScore: prior + per-occurrence sum; unseen tokens contribute nothing") {
    val labeled = Seq(
      (1L, "good good fine", true),
      (2L, "good fine", true),
      (3L, "bad bad ugly", false),
      (4L, "bad ugly", false)).toDF("id", "text", "keep")
    val model = TextStats.nbTrain(labeled)
    val prior = labeled.agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("n_drop"))
    val toScore = Seq(
      (1L, "good good fine"), // 2·lo(good) + lo(fine), prior ln(3/3)=0
      (3L, "bad bad ugly"),
      (5L, "good zzz-never-seen")).toDF("id", "text")
    val got = TextStats.nbScore(toScore, model, prior).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).sortBy(_._1)
    def lo(ck: Long, cd: Long): Double =
      math.log((ck + 1).toDouble / 9) - math.log((cd + 1).toDouble / 9)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) === ((1L, r4(2 * lo(3, 0) + lo(2, 0)), true)))
    assert(got(1) === ((3L, r4(2 * lo(0, 3) + lo(0, 2)), false)))
    // the unseen token is dropped by the vocab join, not Laplace-floored
    assert(got(2) === ((5L, r4(lo(3, 0)), true)))
  }

  test("end-to-end distillation: the classifier separates its bootstrap labels") {
    val docs = Tables.documents(spark, sf0).select(col("doc_id").as("id"), col("text"))
    val labels = TextStats.gopherRules(docs).select(col("id"), col("keep"))
    val model = TextStats.nbTrain(docs.join(labels, "id"))
    val prior = labels.agg(
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
      sum(when(col("keep"), 0L).otherwise(1L)).as("n_drop"))
    val joined = TextStats.nbScore(docs, model, prior)
      .join(labels, "id")
      .select(col("keep"), col("score")).collect()
      .map(r => (r.getBoolean(0), r.getDouble(1)))
    val keepScores = joined.filter(_._1).map(_._2)
    val dropScores = joined.filterNot(_._1).map(_._2)
    assert(keepScores.nonEmpty && dropScores.nonEmpty)
    // separation in the mean — a trained filter, not a coin flip
    val mk = keepScores.sum / keepScores.length
    val md = dropScores.sum / dropScores.length
    assert(mk > md, s"keep mean $mk vs drop mean $md")
  }
}
