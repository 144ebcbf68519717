package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared expression helpers used across operators.
  *
  * Oracle determinism (SURVEY.md §5.2/§5.3): the driver hash-compares our
  * parquet output to DuckDB's result. Floating-point SUM is
  * order-dependent, so every money/value aggregation routes through
  * DECIMAL(38,6) — exact and associative, hence partition-order-proof —
  * and is cast back to DOUBLE only at the very end. The oracle SQL does
  * the identical CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) dance.
  * This also mirrors the reference's unbounded-numeric `value` column
  * (`usdc-transfers/db/migrations/1691424065505-Data.js:5`; SURVEY §7.4).
  */
object Fns {
  private val Money = DecimalType(38, 6)

  /** Exact, shuffle-order-independent sum of a double column → double. */
  def dsum(c: Column): Column = sum(c.cast(Money)).cast(DoubleType)

  /** Partial-state twin of [[dsum]]: keeps the exact DECIMAL partial —
    * additive, so persisted rollup partials re-aggregate losslessly with
    * [[dsumFinal]] regardless of batch boundaries or merge order. */
  def dsumPartial(c: Column): Column = sum(c.cast(Money))

  /** Merge persisted [[dsumPartial]] partials to the [[dsum]] result. */
  def dsumFinal(c: Column): Column = sum(c).cast(DoubleType)

  /** Exact average: decimal sum over long count, divided in double space
    * (both engines perform the identical IEEE division). */
  def davg(c: Column): Column =
    (sum(c.cast(Money)).cast(DoubleType) / count(c).cast(DoubleType))

  /** Oracle-side twin of [[dsum]]. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(38,6))) AS DOUBLE)"

  /** Oracle-side twin of [[davg]]. */
  def davgSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT($col) AS DOUBLE)"
}
