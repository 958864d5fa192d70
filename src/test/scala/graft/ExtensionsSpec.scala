package graft

class ExtensionsSpec extends SparkSpec {

  test("native expressions callable from SQL after registration") {
    GraftExtensions.register(spark)
    Tables.points(spark, sf0).createOrReplaceTempView("pts")
    val r = spark.sql(
      """SELECT p.id, round(l2_dist(p.vec, q.vec), 4) AS d,
        |  round(dot_product(p.vec, q.vec), 4) AS dp,
        |  round(l2_sq_distance(p.vec, q.vec), 4) AS dsq
        |FROM pts p JOIN pts q ON q.id = 0 AND p.id = 1""".stripMargin).head()
    assert(r.getDouble(1) > 0 && math.abs(r.getDouble(1) * r.getDouble(1) - r.getDouble(3)) < 1e-3)

    val sig = spark.sql(
      "SELECT minhash_signature(array('a b c', 'b c d'), 4) AS s").head().getSeq[String](0)
    assert(sig.length === 4 && sig.forall(_.length == 32))

    val cs = spark.sql(
      "SELECT cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c," +
        " cosine_sim(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS o").head()
    assert(cs.getDouble(0) === 1.0 && cs.getDouble(1) === 0.0)

    val sh = spark.sql(
      "SELECT simhash32(array('the', 'quick', 'fox')) AS h").head().getString(0)
    assert(sh.length === 32 && sh.forall(c => c == '0' || c == '1'))
  }
}
