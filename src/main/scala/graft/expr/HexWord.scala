package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Structural well-formedness check for a 0x-prefixed 32-byte hex word —
  * the defensive re-check the reference's handler applies to every log
  * before decoding (`usdc-transfers/src/main.ts:83-84`).
  *
  * Semantically identical to `rlike("^0x[0-9a-f]{64}$")` but a direct
  * byte scan instead of a java.util.regex Matcher: no Matcher allocation
  * per row, no backtracking machinery, early exit on the first bad byte.
  * On the always-on ingest path (two topic words per log) the regex pair
  * was the top row-level cost after the uint256 parse.
  */
case class IsHexWord(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_hex_word"

  override protected def nullSafeEval(input: Any): Any =
    IsHexWord.check(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.IsHexWord.check($c)")

  override protected def withNewChildInternal(newChild: Expression): IsHexWord =
    copy(child = newChild)
}

/** Whole-payload well-formedness for PACKED calldata — "0x" + 8-hex
  * selector + `words` × 64-hex argument words, validated in ONE byte
  * scan over the original string. The per-word alternative
  * (`IsHexWord(concat(lit("0x"), substring(...)))` per argument per
  * candidate shape) allocates two UTF8Strings per check; a five-shape
  * router evaluates up to eight of those per row. Checking the selector
  * bytes for hexness too is strictly tighter and free: a non-hex
  * selector can never equal a declared selector literal, so no row
  * changes routing.
  */
case class IsHexCalldata(child: Expression, words: Int)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_hex_calldata"

  override protected def nullSafeEval(input: Any): Any =
    IsHexCalldata.check(input.asInstanceOf[UTF8String], words)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.IsHexCalldata.check($c, $words)")

  override protected def withNewChildInternal(newChild: Expression): IsHexCalldata =
    copy(child = newChild)
}

object IsHexCalldata {
  /** True iff the value is exactly "0x" + (8 + 64*words) lowercase hex. */
  def check(s: UTF8String, words: Int): Boolean = {
    val n = 10 + 64 * words
    if (s.numBytes != n) return false
    if (s.getByte(0) != '0' || s.getByte(1) != 'x') return false
    var i = 2
    while (i < n) {
      val b = s.getByte(i)
      if (!((b >= '0' && b <= '9') || (b >= 'a' && b <= 'f'))) return false
      i += 1
    }
    true
  }

  /** Column-API entry point. */
  def apply(c: org.apache.spark.sql.Column, words: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftx.Bridge.column(
      IsHexCalldata(org.apache.spark.sql.graftx.Bridge.expression(c), words))
}

/** Shape-agnostic variant of [[IsHexCalldata]] for a CATALOG-wide
  * router: true iff the value is "0x" + 8-hex selector + any whole
  * number (≥0) of 64-hex words. Paired with a per-selector expected
  * LENGTH check it gives the same exact-layout semantics as one
  * [[IsHexCalldata]] per candidate shape, but the payload is scanned
  * ONCE per row instead of once per declared selector — with ~50
  * catalog entries the per-shape form also alias-substitutes ~50
  * copies of the payload expression into the pushed scan filter,
  * exploding the codegen'd task binary. */
case class IsHexPayload(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "is_hex_payload"

  override protected def nullSafeEval(input: Any): Any =
    IsHexPayload.check(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.IsHexPayload.check($c)")

  override protected def withNewChildInternal(newChild: Expression): IsHexPayload =
    copy(child = newChild)
}

object IsHexPayload {
  /** True iff "0x" + 8 hex + k*64 hex for some k ≥ 0. */
  def check(s: UTF8String): Boolean = {
    val n = s.numBytes
    if (n < 10 || (n - 10) % 64 != 0) return false
    if (s.getByte(0) != '0' || s.getByte(1) != 'x') return false
    var i = 2
    while (i < n) {
      val b = s.getByte(i)
      if (!((b >= '0' && b <= '9') || (b >= 'a' && b <= 'f'))) return false
      i += 1
    }
    true
  }

  /** Column-API entry point. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftx.Bridge.column(
      IsHexPayload(org.apache.spark.sql.graftx.Bridge.expression(c)))
}

object IsHexWord {
  /** True iff the value is exactly "0x" + 64 lowercase hex chars. */
  def check(s: UTF8String): Boolean = {
    if (s.numBytes != 66) return false
    if (s.getByte(0) != '0' || s.getByte(1) != 'x') return false
    var i = 2
    while (i < 66) {
      val b = s.getByte(i)
      if (!((b >= '0' && b <= '9') || (b >= 'a' && b <= 'f'))) return false
      i += 1
    }
    true
  }

  /** Column-API entry point. */
  def apply(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftx.Bridge.column(
      IsHexWord(org.apache.spark.sql.graftx.Bridge.expression(c)))

  /** Register as a SQL function on a session: `is_hex_word(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftx.Bridge.registerFunction(spark,
      "is_hex_word", exprs => IsHexWord(exprs.head))
}
