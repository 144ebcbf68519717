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
  * window). DIVERGENCE, honestly stated: ClickHouse's windowFunnel
  * returns the max level over ANY anchor; this scan anchors at the
  * earliest step-0 event and never retries (see COVERAGE.md).
  *
  * PARAMETRIC MODES (round 16 — ClickHouse's windowFunnel mode
  * arguments, applied within the same greedy-anchored contract):
  *  - `strictOrder` (`strict_order`): once the chain is anchored, ANY
  *    event that does not advance it ends the scan — interfering
  *    events (including step −1 markers for non-funnel rows, and
  *    duplicates of matched steps) freeze the level; ClickHouse's
  *    "A→B→D→C stops at D". Events before the anchor never interrupt
  *    (there is no chain yet).
  *  - `strictDedup` (`strict_dedup`): a REPEAT of an already-matched
  *    condition (step < current level) before the next step matches
  *    ends the scan; unrelated events still pass.
  *  - `strictIncrease = false` (ClickHouse's DEFAULT, our mode flag
  *    inverted so the existing oracle-pinned strict behavior stays
  *    the default): chained steps may share a timestamp (`ts >=
  *    prev`); tie order is the lexicographic (ts, step) sort, so the
  *    result stays deterministic.
  *  - `maxOverAnchors` (round 16): ClickHouse's OWN anchor semantics
  *    — the deepest chain over ANY anchor, not just the earliest
  *    (view@0, view@5, click@6 with window 3 is level 2 here, 1 on
  *    the greedy default) — resolving the documented divergence as an
  *    opt-in exact-parity mode. Computed by reachability DP per level
  *    with a two-pointer prefix-max over chain starts (the window
  *    measures from a chain's FIRST event, and a later start strictly
  *    dominates), O(levels × events) after the sort — no per-anchor
  *    rescans. Orthogonal to the interference modes (combining them
  *    is refused: strict_order/strict_dedup are defined relative to
  *    ONE growing chain).
  *
  * Input: `array<struct<ts: timestamp, step: int>>` sorted ascending
  * (build it with `sort_array(collect_list(struct(ts, step)))` —
  * struct ordering is lexicographic, so ties on ts order by step;
  * the scan requires STRICTLY increasing ts between chained steps, so
  * tie order never changes the level). Steps are 0-based and rows
  * with other step values are ignored (except under `strictOrder`,
  * where a post-anchor non-advancing row ends the scan — callers pass
  * non-funnel rows as step −1 there). One forward pass: the
  * distributed cost is the one hash shuffle that gathered each user's
  * events — the same economics as ClickHouse's per-user sorted scan
  * inside `windowFunnel` — and the scan is bounded by a user's own
  * event count, never the corpus. */
case class FunnelLevel(child: Expression, steps: Int, windowMicros: Long,
                       strictOrder: Boolean = false,
                       strictDedup: Boolean = false,
                       strictIncrease: Boolean = true,
                       maxOverAnchors: Boolean = false)
  extends UnaryExpression with CodegenFallback {

  require(steps >= 1, s"a funnel needs at least one step, got $steps")
  require(windowMicros > 0, s"the funnel window must be positive, got $windowMicros")
  require(!(maxOverAnchors && (strictOrder || strictDedup)),
    "maxOverAnchors is a whole-sequence existential — the interference " +
      "modes are defined relative to one growing chain; combine is refused")

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

  override def nullSafeEval(input: Any): Any =
    if (maxOverAnchors) evalMaxOverAnchors(input) else evalGreedy(input)

  /** ClickHouse-parity level: per level j, the ascending (endTs,
    * latest-feasible-chain-start) frontier; an event extends j+1 if
    * SOME frontier entry precedes it (strictly, or ≥ under relaxed
    * increase) with the chain start inside the window — a later start
    * strictly dominates, so a running prefix-max of starts decides
    * feasibility in one two-pointer sweep per level. */
  private def evalMaxOverAnchors(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ts = new Array[Long](n)
    val st = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          ts(m) = row.getLong(0); st(m) = row.getInt(1); m += 1
        }
      }
      i += 1
    }
    // frontier for the current level: ascending end timestamps with
    // the latest chain start that reaches each end
    var endTs = new Array[Long](m)
    var startOf = new Array[Long](m)
    var fLen = 0
    var k = 0
    while (k < m) {
      if (st(k) == 0) { endTs(fLen) = ts(k); startOf(fLen) = ts(k); fLen += 1 }
      k += 1
    }
    if (fLen == 0) return 0
    var level = 1
    while (level < steps && fLen > 0) {
      val nEnd = new Array[Long](m)
      val nStart = new Array[Long](m)
      var nLen = 0
      var p = 0 // frontier pointer (events and frontier both ascend)
      var bestStart = Long.MinValue
      k = 0
      while (k < m) {
        if (st(k) == level) {
          while (p < fLen &&
                 (if (strictIncrease) endTs(p) < ts(k) else endTs(p) <= ts(k))) {
            if (startOf(p) > bestStart) bestStart = startOf(p)
            p += 1
          }
          if (bestStart != Long.MinValue && ts(k) - bestStart <= windowMicros) {
            nEnd(nLen) = ts(k); nStart(nLen) = bestStart; nLen += 1
          }
        }
        k += 1
      }
      if (nLen > 0) { level += 1; endTs = nEnd; startOf = nStart; fLen = nLen }
      else fLen = 0
    }
    level
  }

  private def evalGreedy(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var level = 0
    var t1 = 0L
    var tPrev = 0L
    var stopped = false
    var i = 0
    while (i < n && level < steps && !stopped) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val ts = row.getLong(0) // timestamps are micros internally
          val st = row.getInt(1)
          if (level == 0) {
            if (st == 0) { t1 = ts; tPrev = ts; level = 1 }
            // pre-anchor events never interrupt: no chain exists yet
          } else {
            val advances = st == level &&
              (if (strictIncrease) ts > tPrev else ts >= tPrev) &&
              ts - t1 <= windowMicros
            if (advances) { tPrev = ts; level += 1 }
            else if (strictOrder) stopped = true // any interference ends it
            else if (strictDedup && st >= 0 && st < level) stopped = true
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

/** `sequenceMatch('(?1)(?t<3600)(?2).*(?3)')` (round 16) —
  * ClickHouse's pattern-grammar sequence matching as a scalar over a
  * user's SORTED event sequence (same input contract as
  * [[FunnelLevel]]): TRUE iff SOME subsequence of the user's events
  * matches the pattern. Grammar (ClickHouse's):
  *  - `(?N)` — an event whose step is N−1 (conditions are 1-based);
  *  - `.*` — any number of events between two conditions (adjacency
  *    `(?1)(?2)` already means "eventually after", ClickHouse's own
  *    semantics, so `.*` is documentation more than constraint);
  *  - `(?t<S)` / `(?t<=S)` / `(?t>S)` / `(?t>=S)` — the gap between
  *    the two ADJACENT conditions' timestamps, in SECONDS.
  *
  * Unlike the funnel's greedy scan, matching is TRUE EXISTENTIAL —
  * an early candidate whose window dies does not kill a later one —
  * via reachability DP: for each condition j keep the ascending
  * timestamps where a prefix match can end; an event extends j+1 if
  * some end satisfies (strictly-before + the gap constraint). Cost is
  * O(conditions × events²) worst-case on a USER'S OWN events (small
  * by construction); the distributed cost is the one hash shuffle
  * that gathered them. Deterministic: existence over a fixed event
  * multiset. The whole chain must fit inside `windowMicros` of its
  * first event (pass Long.MaxValue/4 for unbounded — ClickHouse's
  * sequenceMatch has no window, its timed gaps are the constraints). */
case class SequenceMatchPattern(child: Expression, pattern: String,
                                windowMicros: Long = Long.MaxValue / 4)
  extends UnaryExpression with CodegenFallback {

  import SequenceMatchPattern._

  /** (step, constraint-vs-previous); head's constraint is None.
    * EAGER: a bad pattern must be rejected at construction on the
    * driver (the parser's fail-fast contract), never surface as a
    * task failure on executors. */
  private val conds: Seq[(Int, Option[(String, Long)])] = parse(pattern)

  override def prettyName: String = "graft_sequence_match"
  override def dataType: DataType = BooleanType
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
        s"graft_sequence_match needs array<struct<ts: timestamp, step: int>>, got $dt")
  }

  private def gapOk(c: Option[(String, Long)], dt: Long): Boolean = c match {
    case None => true
    case Some(("<", s)) => dt < s * 1000000L
    case Some(("<=", s)) => dt <= s * 1000000L
    case Some((">", s)) => dt > s * 1000000L
    case Some((">=", s)) => dt >= s * 1000000L
    case Some((op, _)) => throw new IllegalStateException(s"unknown op $op")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ts = new Array[Long](n)
    val st = new Array[Int](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val row = arr.getStruct(i, 2)
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          ts(m) = row.getLong(0); st(m) = row.getInt(1); m += 1
        }
      }
      i += 1
    }
    // reachability DP: ends(k) = ts of events where conds 0..j can end,
    // paired with the chain's FIRST timestamp (for the whole-chain
    // window); ascending by construction (events scan in order). Per
    // end we keep the LATEST feasible chain start — the window
    // measures from the chain's first event, so a later start leaves
    // the most room for the remaining conditions (dominance: the only
    // start-dependent constraint is the window, monotone in it).
    var endT = new Array[Long](m)
    var firstT = new Array[Long](m)
    var len = 0
    var k = 0
    while (k < m) {
      if (st(k) == conds.head._1) { endT(len) = ts(k); firstT(len) = ts(k); len += 1 }
      k += 1
    }
    var j = 1
    while (j < conds.size && len > 0) {
      val (step, constraint) = conds(j)
      val nEnd = new Array[Long](m)
      val nFirst = new Array[Long](m)
      var nLen = 0
      k = 0
      while (k < m) {
        if (st(k) == step) {
          // one pass over the frontier: the latest feasible start
          var best = Long.MinValue
          var p = 0
          while (p < len) {
            if (endT(p) < ts(k) && gapOk(constraint, ts(k) - endT(p)) &&
                ts(k) - firstT(p) <= windowMicros && firstT(p) > best)
              best = firstT(p)
            p += 1
          }
          if (best != Long.MinValue) {
            nEnd(nLen) = ts(k); nFirst(nLen) = best; nLen += 1
          }
        }
        k += 1
      }
      endT = nEnd; firstT = nFirst; len = nLen
      j += 1
    }
    len > 0
  }

  override protected def withNewChildInternal(c: Expression): SequenceMatchPattern =
    copy(child = c)
}

/** Column-DSL + SQL surface for the behavioral scan family —
  * `graft_funnel_level(seq, steps, windowMicros[, 'modes'])`,
  * `graft_funnel_count(seq, steps, windowMicros)`,
  * `graft_sequence_match(seq, 'pattern'[, windowMicros])` — so
  * SQL-only users (the reference's `clickhouse-client` audience) run
  * funnels over collected sequences without the Column API. Modes are
  * a comma-separated literal: `strict_order`, `strict_dedup`,
  * `relaxed_increase` (the engine's DEFAULT is ClickHouse's
  * strict_increase — the oracle-pinned contract — so relaxing is the
  * opt-in here), `max_anchors` (ClickHouse's own anchor semantics). */
object Funnel {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.unsafe.types.UTF8String

  def level(seq: Column, steps: Int, windowMicros: Long,
            modes: String = ""): Column = {
    val (so, sd, si, ma) = parseModes(modes)
    Bridge.column(FunnelLevel(Bridge.expressionEager(seq), steps, windowMicros,
      strictOrder = so, strictDedup = sd, strictIncrease = si,
      maxOverAnchors = ma))
  }
  def count(seq: Column, steps: Int, windowMicros: Long): Column =
    Bridge.column(FunnelCount(Bridge.expressionEager(seq), steps, windowMicros))
  def matches(seq: Column, pattern: String): Column =
    Bridge.column(SequenceMatchPattern(Bridge.expressionEager(seq), pattern))

  private def parseModes(modes: String): (Boolean, Boolean, Boolean, Boolean) = {
    val ts = modes.split(',').map(_.trim).filter(_.nonEmpty).toSet
    val known = Set("strict_order", "strict_dedup", "relaxed_increase",
      "max_anchors")
    val bad = ts -- known
    require(bad.isEmpty,
      s"unknown funnel mode(s) ${bad.mkString(",")} — supported: " +
        known.toSeq.sorted.mkString(", "))
    (ts("strict_order"), ts("strict_dedup"),
     !ts("relaxed_increase"), ts("max_anchors"))
  }

  def register(spark: SparkSession): Unit = {
    def intOf(e: Expression): Int = e match {
      case Literal(i: Int, _) => i
      case other => throw new IllegalArgumentException(
        s"expected an int literal, got ${other.sql}")
    }
    def longOf(e: Expression): Long = e match {
      case Literal(l: Long, _) => l
      case Literal(i: Int, _) => i.toLong
      case other => throw new IllegalArgumentException(
        s"expected a long literal, got ${other.sql}")
    }
    def strOf(e: Expression): String = e match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"expected a string literal, got ${other.sql}")
    }
    Bridge.registerFunction(spark, "graft_funnel_level", {
      case Seq(c, s, w) => FunnelLevel(c, intOf(s), longOf(w))
      case Seq(c, s, w, m) =>
        val (so, sd, si, ma) = parseModes(strOf(m))
        FunnelLevel(c, intOf(s), longOf(w), strictOrder = so,
          strictDedup = sd, strictIncrease = si, maxOverAnchors = ma)
      case args => throw new IllegalArgumentException(
        s"graft_funnel_level takes (seq, steps, windowMicros[, modes]), " +
          s"got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_funnel_count", {
      case Seq(c, s, w) => FunnelCount(c, intOf(s), longOf(w))
      case args => throw new IllegalArgumentException(
        s"graft_funnel_count takes (seq, steps, windowMicros), got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_sequence_match", {
      case Seq(c, p) => SequenceMatchPattern(c, strOf(p))
      case Seq(c, p, w) => SequenceMatchPattern(c, strOf(p), longOf(w))
      case args => throw new IllegalArgumentException(
        s"graft_sequence_match takes (seq, pattern[, windowMicros]), " +
          s"got ${args.size}")
    })
  }
}

object SequenceMatchPattern {
  /** Test hook: the production parser, for differential specs. */
  private[graft] def parseForTest(p: String): Seq[(Int, Option[(String, Long)])] =
    parse(p)
  private val CondRe = """\(\?(\d+)\)""".r
  private val TimeRe = """\(\?t(<=|>=|<|>)(\d+)\)""".r
  private val AnyRe = """\.\*""".r

  /** Parse the ClickHouse pattern grammar to (step, gap-vs-previous)
    * pairs. Refused shapes fail fast at construction with the exact
    * offending token — a silent partial parse would match the wrong
    * sequences. */
  private[expr] def parse(pattern: String): Seq[(Int, Option[(String, Long)])] = {
    var rest = pattern
    val out = scala.collection.mutable.Buffer.empty[(Int, Option[(String, Long)])]
    var pending: Option[(String, Long)] = None
    var first = true
    while (rest.nonEmpty) {
      CondRe.findPrefixMatchOf(rest) match {
        case Some(mm) =>
          val n = mm.group(1).toInt
          require(n >= 1, s"conditions are 1-based, got (?$n) in '$pattern'")
          require(!first || pending.isEmpty,
            s"a time constraint cannot precede the first condition in '$pattern'")
          out += ((n - 1, pending))
          pending = None
          first = false
          rest = rest.substring(mm.end)
        case None =>
          TimeRe.findPrefixMatchOf(rest) match {
            case Some(mm) =>
              require(!first,
                s"a time constraint cannot open the pattern '$pattern'")
              require(pending.isEmpty,
                s"two adjacent time constraints in '$pattern'")
              pending = Some((mm.group(1), mm.group(2).toLong))
              rest = rest.substring(mm.end)
            case None =>
              AnyRe.findPrefixMatchOf(rest) match {
                case Some(mm) =>
                  require(pending.isEmpty,
                    s"'.*' cannot follow a time constraint in '$pattern'")
                  rest = rest.substring(mm.end)
                case None => throw new IllegalArgumentException(
                  s"unsupported pattern token at '…$rest' in '$pattern' — " +
                    "supported: (?N), (?t<S) / (?t<=S) / (?t>S) / (?t>=S), .*")
              }
          }
      }
    }
    require(pending.isEmpty, s"dangling time constraint at the end of '$pattern'")
    require(out.nonEmpty, s"pattern '$pattern' names no condition")
    out.toSeq
  }
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
