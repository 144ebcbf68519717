package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** `dot(a, b)` — native codegen'd dot product over float/double arrays
  * (SURVEY §7.5: "custom `Expression` for codegen" on the similarity
  * path).
  *
  * Replaces the `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`
  * higher-order composition, which (a) runs interpreted per row and
  * (b) materializes an intermediate products array PER CANDIDATE PAIR —
  * the dominant allocation in pairwise similarity at scale. This
  * expression is one fused loop inside whole-stage codegen.
  *
  * Numerics: elements are widened to double and accumulated
  * left-to-right — bit-identical to the sequential HOF fold and to
  * DuckDB's list arithmetic on DOUBLE[], so oracle hash-parity is
  * preserved. Null ELEMENTS contribute 0 to the sum (deterministic in
  * both the interpreted and generated paths — parquet array schemas
  * declare containsNull even when vectors never hold nulls, so
  * rejecting nullable element types would break the main input); the
  * shorter length bounds the loop.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (elemType(left) == FloatType, elemType(right) == FloatType)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, acc, i) = (ctx.freshName("n"), ctx.freshName("acc"), ctx.freshName("i"))
      def get(arr: String, side: Expression, idx: String) =
        if (elemType(side) == FloatType) s"(double) $arr.getFloat($idx)"
        else s"$arr.getDouble($idx)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += ${get(a, left, i)} * ${get(b, right, i)};
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge

  /** Column-API entry point: `dot(a, b)` over array<float|double>. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Register as SQL function `graft_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)))
}
