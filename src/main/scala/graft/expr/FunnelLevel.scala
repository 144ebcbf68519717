package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** The funnel scan (round 15) — ClickHouse's `windowFunnel(window)
  * (ts, cond1, …, condN)` as a scalar over a user's SORTED event
  * sequence: the deepest step K such that a chain e1 < e2 < … < eK
  * exists with e1 the EARLIEST step-1 event, each e_{i+1} the earliest
  * step-(i+1) event STRICTLY after e_i, and every chained event within
  * `windowMicros` of e1. The greedy earliest-first chain is what the
  * equivalent SQL (nested min-timestamp CTEs — the DuckDB oracle
  * spelling) computes, so the semantics are deterministic and
  * oracle-checkable; `windowMicros = Long.MaxValue` degrades to
  * sequence matching (`sequenceMatch('(?1).*(?2)')` — order only, no
  * window).
  *
  * Input: `array<struct<ts: timestamp, step: int>>` sorted ascending
  * (build it with `sort_array(collect_list(struct(ts, step)))` —
  * struct ordering is lexicographic, so ties on ts order by step;
  * the scan requires STRICTLY increasing ts between chained steps, so
  * tie order never changes the level). Steps are 0-based and rows
  * with other step values are ignored. One forward pass: the
  * distributed cost is the one hash shuffle that gathered each user's
  * events — the same economics as ClickHouse's per-user sorted scan
  * inside `windowFunnel` — and the scan is bounded by a user's own
  * event count, never the corpus. */
case class FunnelLevel(child: Expression, steps: Int, windowMicros: Long)
  extends UnaryExpression with CodegenFallback {

  require(steps >= 1, s"a funnel needs at least one step, got $steps")
  require(windowMicros > 0, s"the funnel window must be positive, got $windowMicros")

  override def prettyName: String = "graft_funnel_level"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 &&
           (s(0).dataType == TimestampType || s(0).dataType == TimestampNTZType ||
            s(0).dataType == LongType) &&
           s(1).dataType == IntegerType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_funnel_level needs array<struct<ts: timestamp, step: int>>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var level = 0
    var t1 = 0L
    var tPrev = 0L
    var i = 0
    while (i < n && level < steps) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val ts = row.getLong(0) // timestamps are micros internally
          val st = row.getInt(1)
          if (level == 0) {
            if (st == 0) { t1 = ts; tPrev = ts; level = 1 }
          } else if (st == level && ts > tPrev && ts - t1 <= windowMicros) {
            tPrev = ts; level += 1
          }
        }
      }
      i += 1
    }
    level
  }

  override protected def withNewChildInternal(c: Expression): FunnelLevel =
    copy(child = c)
}

/** `sequenceCount` (round 15) — the NON-OVERLAPPING chain count over
  * a user's sorted event sequence, by REPEATED EARLIEST-ANCHOR
  * matching (the [[FunnelLevel]] semantics, applied again after each
  * completed chain): each chain anchors at the first step-1 event
  * after the previous chain completed, extends to the earliest
  * strictly-later next step within the window of its OWN anchor, and
  * on completion the scan restarts. Deterministic and brute-force
  * checkable; honestly NOT always the maximum packing — a stalled
  * earliest anchor (its window expiring before the chain completes)
  * is not retried at a later anchor, exactly as [[FunnelLevel]]'s
  * earliest-anchor contract (and its SQL twin) defines the family's
  * semantics. Same input contract as [[FunnelLevel]]. */
case class FunnelCount(child: Expression, steps: Int, windowMicros: Long)
  extends UnaryExpression with CodegenFallback {

  require(steps >= 1, s"a chain needs at least one step, got $steps")
  require(windowMicros > 0, s"the window must be positive, got $windowMicros")

  override def prettyName: String = "graft_funnel_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 &&
           (s(0).dataType == TimestampType || s(0).dataType == TimestampNTZType ||
            s(0).dataType == LongType) &&
           s(1).dataType == IntegerType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case dt =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_funnel_count needs array<struct<ts: timestamp, step: int>>, got $dt")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var count = 0
    var level = 0
    var t1 = 0L
    var tPrev = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val ts = row.getLong(0)
          val st = row.getInt(1)
          if (level == 0) {
            if (st == 0) { t1 = ts; tPrev = ts; level = 1 }
          } else if (st == level && ts > tPrev && ts - t1 <= windowMicros) {
            tPrev = ts; level += 1
          }
          if (level == steps) { count += 1; level = 0 } // reset: next chain
        }
      }
      i += 1
    }
    count
  }

  override protected def withNewChildInternal(c: Expression): FunnelCount =
    copy(child = c)
}
