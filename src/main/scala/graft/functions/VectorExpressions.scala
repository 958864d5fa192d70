package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/** Native Catalyst expressions for the hot distance kernels (SURVEY §7.3:
  * "l2/cosine distance — custom: UDF → Catalyst Expression w/ codegen").
  *
  * The higher-order-function formulations in [[VectorFunctions]] are
  * interpreted (HOF lambdas don't participate in whole-stage codegen) and
  * box every element; these expressions generate a tight primitive loop.
  * Semantics are IDENTICAL to the HOF forms — elementwise double arithmetic
  * accumulated left-to-right in array order — so the DuckDB oracles and all
  * rounding conventions are unchanged.
  *
  * Replaces the reference's NumPy/BLAS kernels
  * (/root/reference/src/algorithms/sharding/kanndi/shard_by_distance.py:68,
  * clustering/shard.py:127).
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    // restricted to the element types the codegen accessors implement —
    // a wider NumericType check would crash the generated code on e.g.
    // int arrays reaching the SQL-registered functions
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float> or array<double> arguments")
  }

  protected def elemAccessor(dt: DataType): (ArrayData, Int) => Double = dt match {
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
    case other =>
      (a, i) => org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Literal(a.get(i, other), other),
        DoubleType).eval(InternalRow.empty).asInstanceOf[Double]
  }

  /** java accessor snippet for one element as double */
  protected def javaGet(arr: String, i: String, dt: DataType): String = dt match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case _ => s"((Number) $arr.get($i, null)).doubleValue()" // not hit for our types
  }
}

/** Squared L2 distance between two numeric arrays. */
case class L2SqDistance(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "l2_sq_distance"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val ga = elemAccessor(left.dataType.asInstanceOf[ArrayType].elementType)
    val gb = elemAccessor(right.dataType.asInstanceOf[ArrayType].elementType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = ga(a, i) - gb(b, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val at = left.dataType.asInstanceOf[ArrayType].elementType
      val bt = right.dataType.asInstanceOf[ArrayType].elementType
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${javaGet(a, i, at)} - ${javaGet(b, i, bt)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Dot product between two numeric arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val ga = elemAccessor(left.dataType.asInstanceOf[ArrayType].elementType)
    val gb = elemAccessor(right.dataType.asInstanceOf[ArrayType].elementType)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val at = left.dataType.asInstanceOf[ArrayType].elementType
      val bt = right.dataType.asInstanceOf[ArrayType].elementType
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${javaGet(a, i, at)}) * (${javaGet(b, i, bt)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExpressions {
  /** Column API for the native kernels. */
  def l2Sq(a: Column, b: Column): Column = column(L2SqDistance(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
}
