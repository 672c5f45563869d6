package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused dot product over two float-array columns (SURVEY §4.3.2).
  *
  * For equal-length arrays with no null elements this is bit-equal to
  * `aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *            0D, (acc, v) -> acc + v)`
  * — the same element order and left-fold association (and matches the
  * DuckDB oracle's `list_reduce(list_transform(list_zip(...)))` twin) —
  * but compiles to a tight primitive loop inside whole-stage codegen
  * instead of interpreted higher-order-function machinery: no per-element
  * lambda dispatch, no intermediate zipped array allocation. On the
  * blocked all-pairs similarity scans this is the hot inner kernel.
  *
  * OFF the happy path the semantics deliberately diverge from the lambda
  * (asserted in RobustnessSpec):
  *   - mismatched lengths: zip_with null-pads so the lambda yields NULL;
  *     vec_dot returns the min-length partial dot product instead;
  *   - null ELEMENTS (ArrayType(FloatType, containsNull=true) is accepted):
  *     getFloat reads a null slot as 0.0, contributing 0 to the sum, where
  *     the lambda would yield NULL.
  * A NULL on either whole-array input still yields NULL (nullSafeEval).
  * Callers needing strict lambda parity must pre-validate lengths and
  * element nullability.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two ARRAY<FLOAT> arguments, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
