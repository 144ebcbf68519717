package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-series ORDERED folds (round 19) — the tight-loop scalar kernels
  * behind the counter-aggregate family's state-served reads
  * (q283/q284/q286/q290). The reads stay spelled as routable
  * collects (`sort_array(collect_list(struct(...)))` — the registered
  * ListOf/DeltaSumOf patterns), and these expressions consume the
  * MATERIALIZED array exactly like [[FunnelLevel]] does for funnels:
  * one compiled JVM pass per row. The first spelling used builtin
  * higher-order functions (`transform`/`aggregate`); those are
  * INTERPRETED per element (lambda-variable binding + expression-tree
  * eval each step), measured 3–31× at the ×100 replica where this
  * family's FunnelLevel-style kernels sit flat at ~2.5× — the exact
  * preference order the build follows (compose builtins where they are
  * codegen'd; drop to a native Expression when the builtin path is the
  * bottleneck).
  *
  * All three kernels take the LAST struct field as the LONG measure
  * (the preceding fields are the sort key that `sort_array` already
  * ordered — (ts, event_id) for event series, day for day-state
  * series) and skip null entries/fields defensively, matching the
  * builtin HOFs' null-skipping the oracles pin. */
private[graft] trait SeriesInput { self: UnaryExpression =>
  /** Accepts array<struct<..., measure: long>> — measure LAST. */
  def checkSeries(dt: DataType, name: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = dt match {
    case ArrayType(s: StructType, _)
        if s.nonEmpty && s.last.dataType == LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$name needs array<struct<..., measure: long>>, got $other")
  }
  /** The measure column of each element, in array order. A NULL
    * MEASURE REFUSES LOUDLY (review finding, r19): the raw window
    * spellings these kernels share oracles with keep a null-measure
    * row's POSITION (row_number counts it, the frame sum skips it),
    * so silently dropping it here would shift every later position
    * and silently break the shared-oracle equivalence — the family's
    * contract is a non-null measure (the cents expressions are
    * null-free over the loader's schema), and a violation must
    * surface as an error, not a hash drift. Null ELEMENTS cannot
    * arise (collect_list and flatten skip them) but are skipped
    * defensively. */
  def longSeries(input: Any): Array[Long] = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val width = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].length
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, width)
        if (row.isNullAt(width - 1))
          throw new IllegalArgumentException(
            s"$prettyName: null measure at element $i — the series " +
              "contract is a non-null measure (a dropped element would " +
              "silently shift positions vs the raw window spelling)")
        out(m) = row.getLong(width - 1); m += 1
      }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }
}

/** `groupArrayMovingSum(k)` over the sorted series, rendered as the
  * q282 csv — ring-buffer sliding sum, one pass. */
case class MovingSumCsv(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback with SeriesInput {
  require(k >= 1, s"the moving window needs k >= 1, got $k")
  override def prettyName: String = "graft_moving_sum_csv"
  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkSeries(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any = {
    val c = longSeries(input)
    val sb = new java.lang.StringBuilder(c.length * 6)
    var run = 0L
    var i = 0
    while (i < c.length) {
      run += c(i)
      if (i >= k) run -= c(i - k)
      if (i > 0) sb.append(',')
      sb.append(run)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): MovingSumCsv =
    copy(child = c)
}

/** `groupArrayMovingAvg(k)` — the k-window moving sums divided by k in
  * DOUBLE (ClickHouse's always-k divisor), returned as an array for
  * the caller's posexplode. */
case class MovingAvgArr(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback with SeriesInput {
  require(k >= 1, s"the moving window needs k >= 1, got $k")
  override def prettyName: String = "graft_moving_avg"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkSeries(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any = {
    val c = longSeries(input)
    val out = new Array[Double](c.length)
    val div = k.toDouble
    var run = 0L
    var i = 0
    while (i < c.length) {
      run += c(i)
      if (i >= k) run -= c(i - k)
      out(i) = run.toDouble / div
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MovingAvgArr =
    copy(child = c)
}

/** `exponentialMovingAverage(alpha)` — the per-observation EWMA fold
  * `ema_i = c_i·α + ema_{i−1}·(1−α)`, seeded at the first value. The
  * op ORDER matches the recursive-CTE oracle exactly (multiply each
  * side, then add), so the double is bit-deterministic. NULL on an
  * empty series. */
case class EmaFold(child: Expression, alpha: Double)
  extends UnaryExpression with CodegenFallback with SeriesInput {
  require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
  override def prettyName: String = "graft_ema"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkSeries(child.dataType, prettyName)
  override def nullSafeEval(input: Any): Any = {
    val c = longSeries(input)
    if (c.isEmpty) return null
    val keep = 1.0d - alpha
    var ema = c(0).toDouble
    var i = 1
    while (i < c.length) {
      ema = c(i).toDouble * alpha + ema * keep
      i += 1
    }
    ema
  }
  override protected def withNewChildInternal(c: Expression): EmaFold =
    copy(child = c)
}

/** The q293 day-state fold: over the DAY-SORTED array of
  * `struct(day, tot, maxp, at_us)` max-prefix states, the composed
  * sweep peak and its EARLIEST instant — the segment-tree combine
  * `cand_i = run_before_i + maxp_i; run += tot_i`, strict > keeping
  * the first day (and, via the state's own at_us, the first in-day
  * point) achieving the global max. Returns
  * struct(peak: long, at_us: long); NULL on an empty array. */
case class SweepPeakFold(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_sweep_peak_fold"
  override def dataType: DataType = StructType(Seq(
    StructField("peak", LongType, nullable = false),
    StructField("at_us", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 4 && s.drop(1).forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<struct<day, tot: long, maxp: long, " +
            s"at_us: long>>, got $other")
    }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var run = 0L
    var peak = Long.MinValue
    var at = 0L
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 4)
        if (!row.isNullAt(1) && !row.isNullAt(2) && !row.isNullAt(3)) {
          val cand = run + row.getLong(2)
          if (cand > peak) { peak = cand; at = row.getLong(3) }
          run += row.getLong(1)
          seen = true
        }
      }
      i += 1
    }
    if (!seen) null
    else org.apache.spark.sql.catalyst.InternalRow(peak, at)
  }
  override protected def withNewChildInternal(c: Expression): SweepPeakFold =
    copy(child = c)
}

/** The q283 day-state fold: over the DAY-SORTED array of
  * `struct(day, first, last, dsum)` states, the composed deltaSum —
  * `Σ dsum_i + Σ max(0, first_i − last_{i−1})`. Field layout:
  * (day, first: long, last: long, dsum: long); the day key is only
  * the sort key, the loop reads the three longs. */
case class DeltaStateFold(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "graft_delta_state_fold"
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
          if s.length == 4 && s.drop(1).forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<struct<day, first: long, last: long, " +
            s"dsum: long>>, got $other")
    }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var total = 0L
    var prevLast = 0L
    var have = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 4)
        if (!row.isNullAt(1) && !row.isNullAt(2) && !row.isNullAt(3)) {
          val first = row.getLong(1)
          total += row.getLong(3)
          if (have && first > prevLast) total += first - prevLast
          prevLast = row.getLong(2)
          have = true
        }
      }
      i += 1
    }
    total
  }
  override protected def withNewChildInternal(c: Expression): DeltaStateFold =
    copy(child = c)
}
