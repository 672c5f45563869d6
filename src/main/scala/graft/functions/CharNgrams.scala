package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character n-grams of a string as an array:
  * `char_ngrams(s, n)` ≡ `transform(sequence(1, length(s) - n + 1),
  *                                  i -> substring(s, i, n))`
  * (and DuckDB's `list_transform(generate_series(...), ...)` twin) but as
  * one tight codegen loop over UTF8 code points — no per-element lambda
  * dispatch, no sequence array allocation. `substringSQL` slicing matches
  * SQL `substring` for multi-byte code points, so results are identical to
  * the lambda formulation on any input. Strings shorter than n yield an
  * empty array; n must be a foldable positive integer.
  *
  * This is the hot kernel of the char-ngram text operators
  * (q_text_langid_ngram): corpus-linear substring extraction.
  */
case class CharNgrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects (STRING, INT), got ${left.dataType.sql} as first argument")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure("char_ngrams expects a foldable INT n")
    else if (right.eval() == null || right.eval().asInstanceOf[Int] <= 0)
      TypeCheckResult.TypeCheckFailure("char_ngrams: n must be a positive integer")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  @transient private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(s: Any, nv: Any): Any = {
    val str = s.asInstanceOf[UTF8String]
    val total = str.numChars() - n + 1
    if (total <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](total)
      var i = 0
      while (i < total) {
        out(i) = str.substringSQL(i + 1, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, _) => {
      val i = ctx.freshName("i")
      val total = ctx.freshName("total")
      val arr = ctx.freshName("arr")
      s"""
         |int $total = $s.numChars() - $n + 1;
         |if ($total < 0) $total = 0;
         |UTF8String[] $arr = new UTF8String[$total];
         |for (int $i = 0; $i < $total; $i++) {
         |  $arr[$i] = $s.substringSQL($i + 1, $n);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgrams =
    copy(left = newLeft, right = newRight)
}
