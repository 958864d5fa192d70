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

/** argmin over a driver-held centroid matrix: returns
  * struct(dist: double, shard_id: int) for the nearest of `sids.length`
  * centroids, where dist = HALF_UP-4dp-rounded L2 (Spark `round(x, 4)`
  * semantics, bit-for-bit) and ties break on the smaller shard id —
  * exactly the ordering `array_min` applies to
  * Sharding.assignLit's unrolled candidate structs.
  *
  * Why it exists: the unrolled form inlines k copies of the distance
  * loop + one typedLit per centroid into ONE projection; around k≈80
  * that overflows janino's 64 KB method limit and the whole stage falls
  * back to interpreted mode (measured 12.8× at 10× corpus in ScaleBench).
  * Here the centroid matrix rides the plan as a single flat double[]
  * reference object and the generated code is ONE doubly-nested loop —
  * code size independent of k, which is what a 100 TB corpus with
  * thousands of shards needs. ShardingSpec asserts row-identity with the
  * unrolled form. */
case class NearestCentroid(
    child: Expression,
    sids: Array[Int],
    flat: Array[Double],
    dim: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(sids.length * dim == flat.length,
    s"flat centroid matrix: ${flat.length} != ${sids.length} shards * $dim dims")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dist", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("shard_id",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(_: NumericType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid needs a numeric array, got $other")
    }

  /** The rounding Spark's Round applies to a double (HALF_UP on
    * BigDecimal.valueOf) — called from both eval and generated code. */
  @inline private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val get: (ArrayData, Int) => Double = elemType match {
      case FloatType  => (arr, i) => arr.getFloat(i).toDouble
      case DoubleType => (arr, i) => arr.getDouble(i)
      case _ => (arr, i) => arr.getLong(i).toDouble
    }
    val n = math.min(a.numElements(), dim)
    var bestD = Double.PositiveInfinity
    var bestS = Int.MaxValue
    var s = 0
    while (s < sids.length) {
      val off = s * dim
      var acc = 0.0
      var j = 0
      while (j < n) {
        val d = get(a, j) - flat(off + j)
        acc += d * d
        j += 1
      }
      val dist = NearestCentroid.round4(math.sqrt(acc))
      if (dist < bestD || (dist == bestD && sids(s) < bestS)) {
        bestD = dist; bestS = sids(s)
      }
      s += 1
    }
    InternalRow(bestD, bestS)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val flatRef = ctx.addReferenceObj("cents", flat, "double[]")
      val sidRef = ctx.addReferenceObj("sids", sids, "int[]")
      val (s, j, n, off, acc, d, dist, bestD, bestS) =
        (ctx.freshName("s"), ctx.freshName("j"), ctx.freshName("n"),
          ctx.freshName("off"), ctx.freshName("acc"), ctx.freshName("d"),
          ctx.freshName("dist"), ctx.freshName("bestD"), ctx.freshName("bestS"))
      val getA = elemType match {
        case FloatType  => s"(double) $a.getFloat($j)"
        case DoubleType => s"$a.getDouble($j)"
        case _          => s"(double) $a.getLong($j)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |double $bestD = Double.POSITIVE_INFINITY;
         |int $bestS = Integer.MAX_VALUE;
         |for (int $s = 0; $s < $sidRef.length; $s++) {
         |  int $off = $s * $dim;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    double $d = ($getA) - $flatRef[$off + $j];
         |    $acc += $d * $d;
         |  }
         |  double $dist = graft.functions.NearestCentroid.round4(java.lang.Math.sqrt($acc));
         |  if ($dist < $bestD || ($dist == $bestD && $sidRef[$s] < $bestS)) {
         |    $bestD = $dist; $bestS = $sidRef[$s];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{$bestD, $bestS});
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object NearestCentroid {
  /** Spark `round(x, 4)` on a double: HALF_UP over BigDecimal.valueOf. */
  def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
}

object VectorExpressions {
  /** Column API for the native kernels. */
  def l2Sq(a: Column, b: Column): Column = column(L2SqDistance(expression(a), expression(b)))
  def dot(a: Column, b: Column): Column = column(DotProduct(expression(a), expression(b)))
  def nearestCentroid(vec: Column, sids: Array[Int], flat: Array[Double], dim: Int): Column =
    column(NearestCentroid(expression(vec), sids, flat, dim))
}
