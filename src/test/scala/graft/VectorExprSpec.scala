package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** The codegen'd native kernels must be BIT-IDENTICAL to the interpreted
  * HOF reference forms — the DuckDB oracles depend on it. */
class VectorExprSpec extends SparkSpec {

  lazy val pairs = {
    val p = Tables.points(spark, sf0)
    p.select(col("id").as("ia"), col("vec").as("a"))
      .join(p.select(col("id").as("ib"), col("vec").as("b")),
        col("ia") =!= col("ib") && col("ia") < 40 && col("ib") < 40)
  }

  test("native l2Sq is bit-identical to the HOF fold") {
    val d = pairs.select(
      l2Sq(col("a"), col("b")).as("native"),
      l2SqHof(col("a"), col("b")).as("hof"))
    assert(d.where(col("native") =!= col("hof")).count() === 0)
    assert(d.count() > 1000)
  }

  test("native dot is bit-identical to the HOF fold") {
    val d = pairs.select(
      dot(col("a"), col("b")).as("native"),
      dotHof(col("a"), col("b")).as("hof"))
    assert(d.where(col("native") =!= col("hof")).count() === 0)
  }

  test("native kernels work on double arrays too (centroids)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0), Array(3.0, 5.0))).toDF("a", "b")
    val r = df.select(
      l2Sq(col("a"), col("b")), dot(col("a"), col("b")),
      l2Sq(col("a"), transform(col("b"), _.cast("float")))).head()
    assert(r.getDouble(0) === 13.0) // (1-3)^2 + (2-5)^2
    assert(r.getDouble(1) === 13.0) // 1*3 + 2*5
    assert(r.getDouble(2) === 13.0) // mixed double/float
  }

  test("wordpiece: longest match wins, ties lexicographic, [UNK] advances one char") {
    import spark.implicits._
    import graft.functions.TextExpressions.wordpiece
    val vocab = Seq("hel", "he", "##llo", "##lo", "##l", "a", "ab", "##b",
      "x", "##x")
    val words = Seq("hello", "ab", "abxa", "zzx", "axq").toDF("word")
    val got = words
      .select(col("word"), wordpiece(col("word"), vocab).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("hello") === List("hel", "##lo")) // hel > he; ##lo after pos 3
    assert(got("ab") === List("ab")) // ab (len 2) beats a (len 1)
    assert(got("abxa") === List("ab", "##x", "[UNK]")) // no ##a: UNK skips 1
    assert(got("zzx") === List("[UNK]", "[UNK]", "##x")) // z unknown; x continues
    assert(got("axq") === List("a", "##x", "[UNK]"))
    // interpreted eval (driver-side, no codegen) agrees with the codegen run
    val expr = graft.functions.WordpieceTokens(
      org.apache.spark.sql.catalyst.expressions.Literal("hello"), vocab)
    val arr = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until arr.numElements())
      .map(arr.getUTF8String(_).toString) === Seq("hel", "##lo"))
    // [UNK] advances a full CODEPOINT: one astral char = ONE [UNK], never a
    // split surrogate pair (oracle substr/len are codepoint-based)
    val astral = graft.functions.WordpieceTokens(
      org.apache.spark.sql.catalyst.expressions.Literal("a😀b"),
      Seq("a", "##b"))
    val arr2 = astral.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert((0 until arr2.numElements())
      .map(arr2.getUTF8String(_).toString) === Seq("a", "[UNK]", "##b"))
  }
}
