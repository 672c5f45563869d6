package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, LongType}

/** Fused bitmap-intersection cardinality over two long-array bitmaps:
  * `mask_and_count(a, b)` = Σᵢ popcount(aᵢ & bᵢ) over the common prefix.
  *
  * For equal-length arrays with no null elements this equals
  * `aggregate(zip_with(a, b, (x, y) -> bit_count(x & y)), 0, (acc, v) -> acc + v)`
  * (and the DuckDB oracle's `list_sum(list_transform(list_zip(...)))` twin)
  * but compiles to a primitive `Long.bitCount` loop inside whole-stage
  * codegen — the hot inner kernel of the bitmap set-similarity joins, which
  * evaluate it once per candidate pair. Mismatched lengths count over the
  * common prefix; null elements read as 0 (contribute nothing); a NULL on
  * either whole-array input yields NULL (nullSafeEval) — same conventions
  * as [[VecDot]].
  */
case class MaskAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mask_and_count expects two ARRAY<BIGINT> arguments, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def dataType: DataType = DataTypes.LongType

  override def prettyName: String = "mask_and_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(x.getLong(i) & y.getLong(i))
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
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) & $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaskAndCount =
    copy(left = newLeft, right = newRight)
}
