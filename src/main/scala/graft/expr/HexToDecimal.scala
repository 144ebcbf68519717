package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}
import org.apache.spark.unsafe.types.UTF8String

/** Big-integer hex → DECIMAL(38,0) — the uint256 word decoder (C8).
  *
  * The reference ABI-decodes 32-byte words into addresses and uint256
  * amounts (`usdc-transfers/src/main.ts:86`, codec `src/abi/usdc.ts:20`).
  * Spark's `conv(s, 16, 10)` is 64-bit only; this expression parses up
  * to 38 decimal digits of magnitude into Spark's Decimal — the engine's
  * documented value domain (SURVEY §7.4: full 78-digit uint256 fidelity
  * is explicitly out of scope; overflow yields null, like ANSI-off
  * decimal overflow).
  *
  * Generates code (a static-helper call) rather than CodegenFallback:
  * fallback would break the surrounding WholeStageCodegen stage into
  * interpreted per-row evaluation for the whole projection — measured
  * ~2× slower on the decode benchmark query.
  */
case class HexToDecimal(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DecimalType(38, 0)
  // null even for non-null input: invalid hex / >38-digit overflow
  override def nullable: Boolean = true
  override def prettyName: String = "hex_to_decimal"

  override protected def nullSafeEval(input: Any): Any =
    HexToDecimal.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |org.apache.spark.sql.types.Decimal ${ev.value}_d =
      |  graft.expr.HexToDecimal.parse($c);
      |if (${ev.value}_d == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}_d; }
      |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HexToDecimal =
    copy(child = newChild)
}

object HexToDecimal {
  /** Shared parse used by both the interpreted and generated paths.
    * Null for invalid hex or >38-digit magnitude. */
  def parse(input: UTF8String): Decimal = {
    val s0 = input.toString.trim
    val s = if (s0.startsWith("0x") || s0.startsWith("0X")) s0.substring(2) else s0
    if (s.isEmpty) null
    else
      try {
        val bi = new java.math.BigInteger(s, 16)
        val d = Decimal(new java.math.BigDecimal(bi))
        if (d.changePrecision(38, 0)) d else null
      } catch { case _: NumberFormatException => null }
  }

  /** Column-API entry point. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftx.Bridge.column(
      HexToDecimal(org.apache.spark.sql.graftx.Bridge.expression(c)))

  /** Register as a SQL function on a session: `hex_to_decimal(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftx.Bridge.registerFunction(spark,
      "hex_to_decimal", exprs => HexToDecimal(exprs.head))
}
