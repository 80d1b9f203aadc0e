package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two `array<float>` columns
  * as a single codegen'd loop — the ANN hot path.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the
  * higher-order-function route allocates an intermediate array per row
  * and evaluates a lambda per element outside whole-stage codegen; this
  * expression compiles to one primitive float loop inside the generated
  * code (`doGenCode`), reading both arrays' backing storage directly —
  * the preference order the engine follows everywhere (builtin function
  * > native Expression > UDF). Used by the approximate-ANN rerank, where
  * throughput matters and bit-for-bit oracle parity does not (the
  * oracle-checked brute-force path keeps the decimal-exact formulation).
  *
  * Null semantics: null if either side is null (BinaryExpression
  * default); mismatched lengths score over the common prefix, mirroring
  * `zip_with`'s truncating behavior for the well-formed equal-length
  * case and never throwing on ragged data.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  /** Inputs must be `array<float>`: `ArrayData.getFloat` on any other
    * element width silently reads garbage, so misuse (e.g. an
    * `array<double>` column) must fail at ANALYSIS time, not score
    * nonsense at runtime (round-3 ADVICE). */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $x.getFloat($i)) * ((double) $y.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftSqlBridge.columnOf(DotProduct(
      GraftSqlBridge.expressionOf(a), GraftSqlBridge.expressionOf(b)))
}
