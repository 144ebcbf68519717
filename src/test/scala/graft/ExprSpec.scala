package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.{FormatReadableSize, HexToDecimal}

/** Custom Catalyst expressions: semantics + SQL registration + codegen. */
class ExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("format_readable_size matches ClickHouse-style binary units") {
    assert(FormatReadableSize.format(0) == "0.00 B")
    assert(FormatReadableSize.format(1023) == "1023.00 B")
    assert(FormatReadableSize.format(1024) == "1.00 KiB")
    assert(FormatReadableSize.format(1536) == "1.50 KiB")
    assert(FormatReadableSize.format(1048576) == "1.00 MiB")
    assert(FormatReadableSize.format(-2048) == "-2.00 KiB")
  }

  test("format_readable_size runs inside whole-stage codegen") {
    val df = spark.range(1, 4)
      .select(FormatReadableSize(col("id") * 1024).as("r"))
    assert(df.as[String].collect().toSeq == Seq("1.00 KiB", "2.00 KiB", "3.00 KiB"))
    // UnaryExpression with doGenCode (not CodegenFallback) keeps the
    // projection inside WholeStageCodegen — rendered as the `*(n)` prefix
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("format_readable_size"))
  }

  test("hex_to_decimal: 64-bit, >64-bit, 0x prefix, garbage, overflow") {
    FormatReadableSize.register(spark)
    HexToDecimal.register(spark)
    val got = spark.sql("""SELECT
        hex_to_decimal('ff'),
        hex_to_decimal('0xff'),
        hex_to_decimal('00000000000000000000000000000000000000000000000000000000000000ff'),
        hex_to_decimal('de0b6b3a7640000'),
        hex_to_decimal(repeat('ff', 32)),
        hex_to_decimal('zz')""").head
    assert(got.getDecimal(0).longValueExact == 255L)
    assert(got.getDecimal(1).longValueExact == 255L)
    assert(got.getDecimal(2).longValueExact == 255L)
    assert(got.getDecimal(3).toBigInteger == new java.math.BigInteger("1000000000000000000"))
    assert(got.isNullAt(4)) // uint256 max has 78 digits > DECIMAL(38)
    assert(got.isNullAt(5)) // invalid hex → null, not an exception
  }
}
