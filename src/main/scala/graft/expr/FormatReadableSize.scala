package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `formatReadableSize(bytes)` — ClickHouse's human-readable byte
  * formatter (C7, used diagnostically in
  * `usdc-transfers/sql/monitoring.sql:24`), as a native Catalyst
  * expression with whole-stage codegen (`doGenCode` emits a static
  * call, so the expression stays inside the generated loop — no UDF
  * serialization, no codegen fallback).
  */
case class FormatReadableSize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "format_readable_size"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(FormatReadableSize.format(input.asInstanceOf[Double]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expr.FormatReadableSize.format($c))")

  override protected def withNewChildInternal(newChild: Expression): FormatReadableSize =
    copy(child = newChild)
}

object FormatReadableSize {
  private val units = Array("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB")

  /** ClickHouse semantics: binary (1024) units, two decimals. */
  def format(v: Double): String = {
    var x = math.abs(v)
    var i = 0
    while (x >= 1024.0 && i < units.length - 1) { x /= 1024.0; i += 1 }
    val signed = if (v < 0) -x else x
    String.format(java.util.Locale.ROOT, "%.2f %s", Double.box(signed), units(i))
  }

  /** Column-API entry point; casts any numeric input to double. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftx.Bridge.column(
      FormatReadableSize(Cast(org.apache.spark.sql.graftx.Bridge.expression(c), DoubleType)))

  /** Register as a SQL function on a session: `format_readable_size(x)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftx.Bridge.registerFunction(spark,
      "format_readable_size", exprs => FormatReadableSize(Cast(exprs.head, DoubleType)))
}
