package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `graft_zval(a, b)` — 64-bit Morton (Z-order) interleaving of the low
  * 32 bits of two non-negative longs: bit i of `a` lands at position 2i,
  * bit i of `b` at 2i+1.
  *
  * The layout primitive behind multi-dimensional data clustering (P2's
  * generalization): sorting/range-partitioning by the z-value keeps
  * rows close in BOTH dimensions close in file order, so per-file and
  * per-row-group min/max stats form tight boxes and predicates on
  * EITHER dimension prune files — a single-column sort only prunes its
  * own column. The same curve underlies ClickHouse's experimental
  * `mortonEncode` and the Delta/Iceberg OPTIMIZE ZORDER layouts.
  *
  * Dimension values must be rank- or quantile-normalized small ints for
  * the curve to balance (done by the caller; see `ops/Layouts`). Bit
  * spreading uses the standard mask-shift cascade (public-domain Morton
  * technique), fused into whole-stage codegen via the static helper.
  */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zval"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_zval needs (bigint, bigint) inputs, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.ZValue.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge

  /** Spread the low 32 bits of `v` to the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of (a, b), low 32 bits each. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Column-API entry point; casts inputs to long. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(ZValue(
      Bridge.expression(a.cast("long")), Bridge.expression(b.cast("long"))))

  /** Register as SQL function `graft_zval(a, b)`; casts args to long
    * (custom expressions cannot declare ImplicitCastInputTypes — see
    * the Bridge scaladoc). */
  def register(spark: SparkSession): Unit =
    Bridge.registerFunction(spark, "graft_zval",
      exprs => ZValue(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), LongType)))
}
