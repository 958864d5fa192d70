package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, L2SqDistance, MinHashSignature, SimHash32}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT l2_dist(a, b) ...")` works next to the Column API.
  *
  * Install via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`, or call
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("l2_sq_distance",
      info("l2_sq_distance", "l2_sq_distance(a, b) - squared euclidean distance of two numeric arrays"),
      (es: Seq[Expression]) => L2SqDistance(es(0), es(1))),
    ("l2_dist",
      info("l2_dist", "l2_dist(a, b) - euclidean distance of two numeric arrays"),
      (es: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Sqrt(L2SqDistance(es(0), es(1)))),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two numeric arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two numeric arrays"),
      (es: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(
          DotProduct(es(0), es(1)),
          Multiply(
            Sqrt(DotProduct(es(0), es(0))),
            Sqrt(DotProduct(es(1), es(1)))))
      }),
    ("minhash_signature",
      info("minhash_signature", "minhash_signature(shingles, k) - array of k md5 minhash hex strings"),
      (es: Seq[Expression]) => {
        val k = es(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => other.eval(null).asInstanceOf[Int]
        }
        MinHashSignature(es(0), k)
      }),
    ("simhash32",
      info("simhash32", "simhash32(tokens) - 32-char '0'/'1' simhash bit string of a token array"),
      (es: Seq[Expression]) => SimHash32(es(0))))

  /** Register on a live session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
