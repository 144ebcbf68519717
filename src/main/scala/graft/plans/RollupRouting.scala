package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Expand, Filter, Join, JoinHint, LogicalPlan, Project, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, DecimalType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Transparent materialized-rollup routing (SURVEY §4 / §7.3 stretch).
  *
  * The reference pre-aggregates with insert-maintained MVs and users
  * query the MV by name (`usdc-transfers/README.md:66-71`). This rule
  * goes one step further than the reference: queries written against the
  * RAW events table are rewritten to re-aggregate the partial-state
  * rollup when one is registered — the classic "answering queries using
  * materialized views" optimization, scoped to the lossless cases:
  *
  *  - grouping keys ⊆ {to_date(ts) → day, user_id} (any subset: coarser
  *    grains re-aggregate losslessly)
  *  - aggregates ∈ { SUM(value-with-casts) → SUM(v_partial),
  *                   COUNT(*)/COUNT(lit)   → SUM(c_partial),
  *                   MIN(value) → MIN(mn_partial),
  *                   MAX(value) → MAX(mx_partial) }
  *    (AVG is deliberately absent: decimal-partial division is not
  *    bit-identical to a raw double average — rewrite only the lossless)
  *  - PREDICATE SUBSUMPTION (round 11): a Filter between the aggregate
  *    and the scan no longer always blocks routing — a conjunct whose
  *    every scan-side term is itself a rollup KEY expression (a
  *    day-grained term over `ts`, any term over `user_id`) partitions
  *    rows exactly along rollup-group boundaries, so it is lossless to
  *    re-apply the same predicate over the rollup's key columns and
  *    route. Whole-day half-open `ts` ranges (`ts >= midnight`,
  *    `ts < midnight` — the reference's own dashboard WHERE shape,
  *    `usdc-transfers/sql/analytics.sql:106`) rewrite to the equivalent
  *    `day` bounds. One conjunct outside the lossless set (an
  *    `event_type` filter, a mid-day cut) → the whole query stays live.
  *  - GRAIN HIERARCHY (round 11): single-table rollups carry a time
  *    grain (`day` or `hour`). A rollup answers queries at its own
  *    grain or coarser — a day-grain query re-aggregates the hourly
  *    rollup through day = to_date(hour) (roll-up matching), and
  *    subsumption generalizes to whole-GRAIN boundary cuts (any
  *    whole-hour literal against the hourly rollup; midnights only
  *    against the daily). It never answers a finer grain. When several
  *    registered rollups can answer, the COARSEST wins — fewest rows
  *    scanned (the classic view-selection cost choice; pinned by
  *    RollupRoutingSpec and the routing PropertySpec).
  *
  * A second matcher ([[RollupRouting.JoinSpec]]) extends the same idea
  * across a JOIN — and since round 11 it is a REGISTRY, not a single
  * hardcoded shape: each spec carries its join core (base-table set +
  * equi-join key pairs), its grouping-column map, and its
  * aggregate→partial-column mappings; the rule tries every registered
  * spec and routes onto the first whose core and aggregate set match
  * (the reference maintains SIX MVs side by side,
  * `usdc-transfers/sql/analytics.sql:9-94` — a user of this engine can
  * likewise register several join rollups). The join path gets its own
  * predicate subsumption (round 11): a residual filter conjunct found
  * anywhere in the join tree whose every reference is a PRESERVED
  * grouping column (group-constant by construction — the rollup stores
  * it per row) commutes with the partial aggregation and re-applies
  * above the rollup scan, so `WHERE c_mktsegment IN (…)` dashboards
  * route; a conjunct touching a fact-side measure or an unpreserved
  * dim column keeps the query on the live join. Shipped specs:
  * [[JoinSpec.revenueSegment]] (lineitem⋈orders⋈customer →
  * (orderkey, segment) partials, built by
  * [[graft.ops.StarJoins.revenueSegmentPartialsOf]]) and
  * [[JoinSpec.customerVolume]] (orders⋈customer → per-customer volume
  * partials, [[graft.ops.StarJoins.customerVolumePartialsOf]]).
  *
  * At scale this turns a full fact-table scan + shuffle into a scan of a
  * rollup that is orders of magnitude smaller — the same reason the
  * reference's dashboards read MVs instead of `usdc_transfer`.
  */
object RollupRouting {

  /** A registered single-table rollup (written by
    * [[graft.streaming.Live.appendDailyPartials]] /
    * [[graft.ops.Rollups.hourlyPartialsOf]]). `grain` names the
    * rollup's time grain — `"day"` (a `day: DATE` key) or `"hour"`
    * (an `hour: TIMESTAMP` key, `date_trunc('hour', ts)`). A rollup
    * answers queries AT its grain or COARSER (a day-grain query
    * re-aggregates 24 hourly rows per day — partial states are
    * additive, so roll-up matching is lossless); it can never answer a
    * finer grain. When several registered rollups match, the rule
    * routes onto the COARSEST one — fewest rows scanned (classic
    * view-selection cost choice; the spec pins it).
    *
    * Round 12: the spec carries the SAME vocabulary as [[JoinSpec]]
    * instead of hardcoded `user_id`/`value`/`v_partial` names —
    * `timeCol` is the source's event-time column (a normalized
    * TIMESTAMP like `events.ts`, or a DATE column, in which case the
    * day grain is the bare column and EVERY deterministic predicate
    * over it subsumes — a date key is group-constant at day grain),
    * `keyCols` maps each non-time source grouping column to its
    * rollup column, and `aggs` lists the aggregate→partial rewrites
    * the rollup supports. The defaults are exactly the events-schema
    * rollup every existing registration used, so a bare
    * `Spec(suffix, path)` is unchanged; a user can now register a
    * daily rollup over any table — the reference maintains six
    * differently-shaped MVs side by side
    * (`usdc-transfers/sql/analytics.sql:9-94`).
    *
    * Round 15 adds the GRAINLESS grain `"all"` — a keys-only,
    * all-time rollup (one row per key group; the most common real
    * dashboard shape, "total per user over all time", which every
    * time-bucketed MV shape under-serves: all six reference MVs
    * bucket time, `usdc-transfers/sql/analytics.sql:19,31,50,65,85,
    * 106`). The rollup stores NO time key, so it answers only
    * time-free queries: a time grouping or a time-range predicate
    * provably keeps the query live (there is no rollup-side
    * expression to substitute). It is the COARSEST grain — fewest
    * rows — so the cost choice prefers it whenever it can answer.
    * Coverage contract: with no sidecar the rollup must be COMPLETE
    * (the one-shot build the advisor performs). With a sidecar, the
    * hybrid tail rides `timeCol` (which must then name a real source
    * time column): rollup partials ∪ tail partials over
    * `timeCol ≥ watermark` — lossless at ANY watermark because the
    * time column is not a group key, so a group's partials merely
    * split across the two sides and the final aggregate re-merges
    * them. But with no time key there is also no commit-point filter
    * to hide APPENDED-uncommitted partials, so a grainless rollup is
    * REBUILD-ONLY: build the files for rows `< wm` and stamp `wm`
    * before registration (or swap in a freshly built directory —
    * [[graft.ops.Rollups.writeRollupUpTo]] is that one-call: its
    * scratch-build + sidecar + atomic-swap commit works for any
    * grain, this one included);
    * [[graft.streaming.Live.maintainRollup]] refuses the grain. A
    * grainless spec may set `timeCol = ""` to declare it has no time
    * column at all — then a sidecar can never be honored and the
    * rollup must always be complete. */
  /** `truncatedToWindowUs` (round 19 — the r18 verdict's #3): when the
    * directory holds WINDOW-TRUNCATED list states (the
    * [[graft.ops.Behavior.truncatedFunnelAllPartials]] builder: step
    * −1 rows beyond `window` of every step-0 anchor are dropped), the
    * builder declares that window here and [[RuleImpl]] REFUSES to
    * serve any read whose consumers are not provably
    * truncation-invariant ([[RuleImpl.truncationSafe]] documents the
    * whitelist) — the read falls back to raw or to an untruncated
    * registration. `None` (every non-truncated build) gates nothing. */
  case class Spec(sourceSuffix: String, rollupPath: String, grain: String = "day",
                  timeCol: String = "ts",
                  keyCols: Map[String, String] = Spec.defaultKeys,
                  aggs: Seq[AggMap] = Spec.defaultAggs,
                  truncatedToWindowUs: Option[Long] = None)

  object Spec {
    /** Cost order across grains: a grainless rollup has one row per
      * key group (fewest), a daily ~24× fewer than the hourly it
      * subsumes. [[RuleImpl.apply]] routes onto the lowest rank that
      * can answer. */
    private[graft] def grainRank(g: String): Int =
      g match { case "all" => 0; case "day" => 1; case _ => 2 }
    val defaultKeys: Map[String, String] = Map("user_id" -> "user_id")
    /** The [[graft.ops.Rollups.dailyPartialsOf]] partial block. */
    val defaultAggs: Seq[AggMap] = Seq(
      SumOf(ColRef("value"), "v_partial"),
      CountStarTo("c_partial"),
      MinOf("value", "mn_partial"),
      MaxOf("value", "mx_partial"),
      AvgOf("value", "v_partial", "vn_partial"))
  }

  /** Sidecar file a HYBRID rollup writer stamps inside the rollup dir:
    * the exclusive upper bound (epoch micros) of the event time the
    * rollup covers. When present, the router answers queries as
    * `rollup partials ∪ live-tail partials(ts ≥ watermark)` under the
    * final aggregate — the MV-plus-recent-data dashboard read. The
    * WRITER's contract makes it lossless: the rollup holds partials of
    * exactly the rows with ts < watermark
    * ([[graft.ops.Rollups.writeDailyRollupUpTo]] stamps it
    * transactionally with the build). */
  val CoverageSidecar = "_graft_covered_up_to"

  /** Atomically stamp the coverage sidecar (temp file + ATOMIC_MOVE in
    * the same directory): a reader can never observe a half-written
    * watermark — it sees the old value or the new one. The temp name
    * is dot-prefixed so Parquet readers ignore it. */
  def stampCoverage(rollupDir: String, coveredUpToUs: Long): Unit = {
    val dir = java.nio.file.Paths.get(rollupDir)
    java.nio.file.Files.createDirectories(dir)
    val tmp = java.nio.file.Files.createTempFile(dir, ".wm", ".tmp")
    java.nio.file.Files.write(tmp,
      coveredUpToUs.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve(CoverageSidecar),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // ——— join-MV registry vocabulary ———

  /** Pattern over the CAST-STRIPPED, project-resolved source expression
    * inside an aggregate — what the spec's partial column is a partial
    * OF. Kept as a tiny closed AST (not a function) so a spec is data:
    * printable, comparable, and serializable into docs/tests.
    * [[rebuild]] re-creates the source expression over a raw scan's
    * attributes — what the hybrid live-tail partial block aggregates. */
  sealed trait SrcPat {
    def matches(e: Expression): Boolean
    /** ORDER-SENSITIVE / VALUE-PRESERVING match (round 14), used by
      * the extremum members (Min/MaxPatOf) AND the measure members
      * (SumOf/CountOf pattern matching). [[matches]] strips EVERY
      * cast before comparing — a hole: a nested VALUE-CHANGING cast
      * (`max(struct(CAST(CAST(value AS INT) AS DECIMAL(38,6)) …))`,
      * `sum(cast(CAST(x AS FLOAT) as decimal(38,6)))`,
      * `count(CAST(s AS INT))` whose failed casts change null-ness)
      * canon-matches the registered pattern yet computes different
      * values. Here casts are retained unless provably
      * ORDER-EMBEDDING (injective + monotone, which on this whitelist
      * is also exactly value-preserving — identity, NTZ→TZ relabel,
      * integral widening, lossless numeric promotion), so only trees
      * that compute the same values route; everything else stays
      * live. */
    def matchesOrdered(e: Expression): Boolean = matches(e)
    def rebuild(resolve: String => Option[Attribute]): Option[Expression]
    /** Source column names the measure reads (drives the spec-driven
      * build's fact-table identification and column pruning). */
    def refs: Set[String]
  }
  /** A bare source-column reference, e.g. SUM(o_totalprice). */
  case class ColRef(name: String) extends SrcPat {
    def matches(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == name
      case _ => false
    }
    /** Order-embedding casts strip from the QUERY side before the
      * bare-reference compare — mirroring [[ExprPat.canonOrdered]]'s
      * treatment on both sides. Without this, the advisor's minted
      * `SumOf(ColRef(x))` for a `sum(cast(x as double))` demand over an
      * int column could never route its own workload (the whitelist is
      * value-preserving, so the stripped tree computes the same sums/
      * counts); value-CHANGING casts still refuse. */
    override def matchesOrdered(e: Expression): Boolean =
      ExprPat.stripOrderEmbedding(e) match {
        case a: AttributeReference => a.name == name
        case _ => false
      }
    def rebuild(resolve: String => Option[Attribute]): Option[Expression] = resolve(name)
    def refs: Set[String] = Set(name)
  }
  /** The net-of-discount revenue shape `a * (1 - b)`. */
  case class OneMinusProduct(a: String, b: String) extends SrcPat {
    def matches(e: Expression): Boolean = e match {
      case Multiply(x: AttributeReference,
                    Subtract(Literal(one, _), y: AttributeReference, _), _) =>
        x.name == a && y.name == b && one == 1.0d
      case _ => false
    }
    /** Same order-embedding strip as [[ColRef.matchesOrdered]] —
      * nested value-preserving casts (the loader's relabel, lossless
      * widenings) must not hide the registered product shape. */
    override def matchesOrdered(e: Expression): Boolean =
      matches(ExprPat.stripOrderEmbedding(e))
    def rebuild(resolve: String => Option[Attribute]): Option[Expression] =
      for (x <- resolve(a); y <- resolve(b))
        yield Multiply(x, Subtract(Literal(1.0d), y))
    def refs: Set[String] = Set(a, b)
  }
  /** A USER-REGISTERED measure expression (round 12): any expression
    * over the source columns, matched by CANONICALIZED structural
    * equality — casts stripped, attributes compared by name, numeric
    * literals compared by exact value, ANSI eval-mode tags erased.
    * Those are exactly the shapes the analyzer legitimately varies
    * between what a user registers (`lit(1)`, unresolved columns) and
    * what reaches the optimizer (promoted literals, resolved refs,
    * inserted casts); everything else — a different operator, a
    * different column, a commuted non-identical tree — stays a
    * non-match, so near-miss queries keep their live plan. This
    * closes the registry under user-defined measures: registering an
    * MV whose measure is `l_extendedprice * (1 + l_tax)` no longer
    * requires editing the engine. */
  case class ExprPat(expr: Expression) extends SrcPat {
    private lazy val canonical = ExprPat.canon(expr)
    private lazy val canonicalOrdered = ExprPat.canonOrdered(expr)
    def matches(e: Expression): Boolean = ExprPat.canon(e) == canonical
    override def matchesOrdered(e: Expression): Boolean =
      ExprPat.canonOrdered(e) == canonicalOrdered
    def rebuild(resolve: String => Option[Attribute]): Option[Expression] = {
      var ok = true
      val r = ExprPat.resolveOps(expr).transformUp {
        case a: AttributeReference =>
          resolve(a.name).getOrElse { ok = false; a }
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          resolve(u.name).getOrElse { ok = false; u }
      }
      if (ok) Some(ExprPat.coerceLiterals(r)) else None
    }
    def refs: Set[String] = expr.collect {
      case a: AttributeReference => a.name
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => u.name
    }.toSet
  }
  object ExprPat {
    /** r19 (found by the cents-sequence hybrid tail): a registered
      * pattern like `col("value") * 100` stores an INT literal beside
      * a DOUBLE column — the ANALYZER coerces the query's own copy,
      * but [[ExprPat.rebuild]] re-roots the raw tree over scan
      * attributes with no analysis pass, so the tail aggregate came
      * out UNRESOLVED and plan validation failed the whole read.
      * Upcast foldable literals to the other operand's type where the
      * cast is provably value-preserving (`Cast.canUpCast`) — exactly
      * the analyzer's own widening for these shapes; anything it
      * cannot fix stays unresolved and [[RuleImpl.apply]]'s resolved
      * guard falls the read back to live instead of crashing. */
    private[plans] def coerceLiterals(e: Expression): Expression = e.transformUp {
      case b: BinaryOperator
          if b.left.resolved && b.right.resolved &&
             b.left.dataType != b.right.dataType =>
        (b.left, b.right) match {
          case (l, lit: Literal) if Cast.canUpCast(lit.dataType, l.dataType) =>
            b.withNewChildren(Seq(l, Cast(lit, l.dataType)))
          case (lit: Literal, r) if Cast.canUpCast(lit.dataType, r.dataType) =>
            b.withNewChildren(Seq(Cast(lit, r.dataType), r))
          case _ => b
        }
    }

    /** Registration surface: a DataFrame-API `Column`, e.g.
      * `ExprPat(col("l_extendedprice") * (lit(1) + col("l_tax")))`.
      * The classic Column DSL encodes operators as unresolved function
      * nodes; [[canon]]/[[resolveOps]] normalize those to the same
      * arithmetic nodes the analyzer produces, so either registration
      * surface matches the same queries. */
    def apply(c: org.apache.spark.sql.Column): ExprPat =
      ExprPat(org.apache.spark.sql.graftx.Bridge.expressionEager(c))
    /** The Column DSL's operator spellings → resolved arithmetic
      * nodes (session-default eval mode — what the analyzer would
      * produce for the same source text). */
    private[plans] def resolveOps(e: Expression): Expression = e.transformUp {
      // the Column DSL's struct(...) → the analyzer's CreateNamedStruct
      // (round 15 — sequence patterns register struct measures from
      // the DSL): field names follow the analyzer's rule — the
      // argument's own name when it has one, positional colN otherwise
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts == Seq("struct") && f.arguments.nonEmpty &&
             !f.isDistinct && f.filter.isEmpty =>
        CreateNamedStruct(f.arguments.zipWithIndex.flatMap {
          case (Alias(c, n), _) => Seq(Literal(n), c)
          case (u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute, _) =>
            Seq(Literal(u.nameParts.last), u)
          case (a: AttributeReference, _) => Seq(Literal(a.name), a)
          case (other, i) => Seq(Literal(s"col${i + 1}"), other)
        })
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 && f.arguments.length == 2 &&
             !f.isDistinct && f.filter.isEmpty =>
        val Seq(l, r) = f.arguments
        f.nameParts.head match {
          case "+" => Add(l, r)
          case "-" => Subtract(l, r)
          case "*" => Multiply(l, r)
          case "/" => Divide(l, r)
          // comparisons/booleans (round 14 — the conditional-measure
          // members register CASE patterns whose predicates the
          // Column DSL spells as these operator functions)
          case ">" => GreaterThan(l, r)
          case "<" => LessThan(l, r)
          case ">=" => GreaterThanOrEqual(l, r)
          case "<=" => LessThanOrEqual(l, r)
          case "=" | "==" => EqualTo(l, r)
          case "<=>" => EqualNullSafe(l, r)
          case "!=" => Not(EqualTo(l, r))
          case "and" => And(l, r)
          case "or" => Or(l, r)
          // round(e, scale) — weighted-top-k scaling measures (r16);
          // the ANSI tag is erased by canon/canonOrdered on both sides
          case "round" => Round(l, r, ansiEnabled = false)
          case _ => f
        }
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 && f.arguments.length == 1 &&
             !f.isDistinct && f.filter.isEmpty =>
        val Seq(c) = f.arguments
        f.nameParts.head match {
          case "!" | "not" => Not(c)
          case "isnull" => IsNull(c)
          case "isnotnull" => IsNotNull(c)
          // round(e) — the weighted-top-k members register scaling
          // measures like round(value*100) (round 16); the analyzer's
          // node carries an ANSI tag that [[canon]]/[[canonOrdered]]
          // erase, so either registration surface matches
          case "round" => Round(c, Literal(0), ansiEnabled = false)
          case _ => f
        }
      // a struct measure's SQL rendering (the JSON catalog's travel
      // form) parses back as `named_struct(...)` — normalize to the
      // analyzer's node so a reloaded pattern matches the same queries
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.length == 1 && !f.isDistinct && f.filter.isEmpty &&
             f.nameParts.head.equalsIgnoreCase("named_struct") &&
             f.arguments.length % 2 == 0 =>
        CreateNamedStruct(f.arguments)
    }
    /** Canonical form for matching: strip casts, name-compare
      * attributes, erase arithmetic eval-mode tags, and normalize
      * every numeric literal to its exact decimal string (so `lit(1)`
      * ≡ the analyzer's promoted `1.0d`). Structural equality of case
      * classes does the rest. */
    private[plans] def canon(e: Expression): Expression = resolveOps(e).transformUp {
      case Cast(c, _, _, _) => c
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
      case Add(l, r, _) => Add(l, r, EvalMode.LEGACY)
      case Subtract(l, r, _) => Subtract(l, r, EvalMode.LEGACY)
      case Multiply(l, r, _) => Multiply(l, r, EvalMode.LEGACY)
      case Divide(l, r, _) => Divide(l, r, EvalMode.LEGACY)
      case Round(c, s, _) => Round(c, s, ansiEnabled = false)
      case l @ Literal(v, _) if v != null && numericString(v).isDefined =>
        Literal.create(numericString(v).get, org.apache.spark.sql.types.StringType)
    }
    /** Canonical form for the EXTREMUM members (round 14): like
      * [[canon]] but a cast survives unless provably order-embedding.
      * Casts are classified BEFORE attribute de-resolution (the
      * child's dataType is still known); an unresolved child — the
      * registration surface's `UnresolvedAttribute` — conservatively
      * KEEPS its cast, so a registered pattern spelling a redundant
      * lossless cast simply matches fewer queries (never more). Kept
      * casts normalize to a bare `Cast(child, dt)` (time-zone and
      * ANSI tags erased — those never change the computed ordering
      * between the values that reach an extremum). */
    private[plans] def canonOrdered(e: Expression): Expression = {
      val pre = resolveOps(e).transformUp {
        case Cast(c, dt, _, _) if c.resolved && orderEmbedding(c.dataType, dt) => c
        case Cast(c, dt, _, _) => Cast(c, dt)
      }
      pre.transformUp {
        case a: AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
        case Add(l, r, _) => Add(l, r, EvalMode.LEGACY)
        case Subtract(l, r, _) => Subtract(l, r, EvalMode.LEGACY)
        case Multiply(l, r, _) => Multiply(l, r, EvalMode.LEGACY)
        case Divide(l, r, _) => Divide(l, r, EvalMode.LEGACY)
        case Round(c, s, _) => Round(c, s, ansiEnabled = false)
        case l @ Literal(v, _) if v != null && numericString(v).isDefined =>
          Literal.create(numericString(v).get, org.apache.spark.sql.types.StringType)
      }
    }
    /** Strip the order-embedding casts from a RESOLVED expression —
      * what [[canonOrdered]] does to the query side. The ADVISOR runs
      * this before de-resolving a mined extremum pattern: a registered
      * cast over an unresolved attribute is conservatively KEPT at
      * match time, so the registration must not carry casts the query
      * side will strip (e.g. the loader's NTZ relabel). */
    private[plans] def stripOrderEmbedding(e: Expression): Expression = e.transformUp {
      case Cast(c, dt, _, _) if c.resolved && orderEmbedding(c.dataType, dt) => c
    }
    /** Injective + monotone casts — the only ones an extremum measure
      * may look through: they embed the source order, so the tree with
      * and without the cast selects the SAME extreme rows. Everything
      * lossy (double→int truncation, double→decimal rounding, →string
      * lexicographic re-ordering) is excluded: monotone-but-not-
      * injective casts change which rows tie, and a struct's later
      * fields then differ between the two trees. */
    private def orderEmbedding(from: org.apache.spark.sql.types.DataType,
                               to: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      def intDigits(dt: DataType): Int = dt match {
        case ByteType => 3; case ShortType => 5; case IntegerType => 10
        case LongType => 19; case _ => Int.MaxValue
      }
      (from, to) match {
        case (f, t) if f == t => true
        // the loader-contract relabel: same instant under the pinned
        // UTC session ([[graft.Tables.normalizeTs]])
        case (TimestampNTZType, TimestampType) => true
        case (DateType, TimestampType) => true
        case (ByteType, ShortType | IntegerType | LongType) => true
        case (ShortType, IntegerType | LongType) => true
        case (IntegerType, LongType) => true
        case (FloatType, DoubleType) => true
        case (ByteType | ShortType | IntegerType, DoubleType) => true
        case (ByteType | ShortType, FloatType) => true
        case (f @ (ByteType | ShortType | IntegerType | LongType), d: DecimalType) =>
          d.precision - d.scale >= intDigits(f)
        case (f: DecimalType, t: DecimalType) =>
          t.scale >= f.scale && t.precision - t.scale >= f.precision - f.scale
        case _ => false
      }
    }
    private def numericString(v: Any): Option[String] = {
      val bd: java.math.BigDecimal = v match {
        case d: java.lang.Double => java.math.BigDecimal.valueOf(d)
        case f: java.lang.Float => java.math.BigDecimal.valueOf(f.toDouble)
        case i: java.lang.Integer => java.math.BigDecimal.valueOf(i.toLong)
        case l: java.lang.Long => java.math.BigDecimal.valueOf(l)
        case s: java.lang.Short => java.math.BigDecimal.valueOf(s.toLong)
        case b: java.lang.Byte => java.math.BigDecimal.valueOf(b.toLong)
        case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
        case _ => null
      }
      Option(bd).map(_.stripTrailingZeros.toPlainString)
    }
  }

  /** The canonical normalized event-time expression: the named time
    * column through (only) the loader-contract normalization wrappers
    * ([[graft.Tables.normalizeTs]]) — the NTZ→TZ cast relabel or the
    * nanos-long `timestamp_micros(ts DIV 1000)` truncation. A SHIFTED
    * or otherwise derived timestamp (`ts + INTERVAL …`) deliberately
    * does not match: `to_date` of it is not the rollup's day, and a
    * midnight bound on it does not cut along day-group boundaries
    * (round 11 tightening — the earlier any-DateType-expr-of-ts match
    * would have routed those shapes wrongly). A DATE-typed time column
    * (e.g. `orders.o_orderdate`) matches as the bare reference. */
  private[plans] def isNormTime(e: Expression, timeCol: String): Boolean = e match {
    case a: AttributeReference => a.name == timeCol
    case Cast(c, TimestampType, _, _) => isNormTime(c, timeCol)
    case MicrosToTimestamp(IntegralDivide(c, Literal(v, _), _))
        if v == 1000 || v == 1000L => isNormTime(c, timeCol)
    case _ => false
  }

  /** A registered TIME-TRUNCATION grouping on the JOIN path (round
    * 12): the rollup's group key holds `date_trunc('hour', col)`
    * (grain "hour", TimestampType under the pinned-UTC session) or
    * `to_date(col)` (grain "day", DateType) of a source time column
    * the rollup does NOT otherwise preserve — the one join grouping
    * shape [[JoinSpec.groupings]]' bare-column vocabulary cannot
    * express (a truncation of an unpreserved TIMESTAMP is not the
    * identity on any preserved column). [[subst]] recognizes the
    * query spellings the analyzer produces for the SAME truncation
    * over the normalized time column, plus every COARSER derivation —
    * a day grouping over an hourly rollup column, week/month/quarter/
    * year over either — because calendar truncations compose:
    * `date_trunc(coarse, date_trunc('hour', ts)) = date_trunc(coarse,
    * ts)` for every coarser unit. A FINER grain (minutes against an
    * hourly rollup), a shifted timestamp, or a different column never
    * substitutes, so those queries keep their live join. Like
    * [[SrcPat]], kept as data: printable, comparable, serializable. */
  case class TimeGrainPat(grain: String, col: String) {
    require(grain == "hour" || grain == "day", s"unsupported time grain: $grain")
    /** Grain width — the alignment a coverage watermark must have. */
    def micros: Long = if (grain == "hour") 3600000000L else 86400000000L

    /** `date_trunc` format aliases → canonical unit name. */
    private def fmtName(l: Any): Option[String] = Option(l).map(_.toString.toLowerCase)
      .map { case "yyyy" | "yy" => "year"; case "mm" | "mon" => "month"
             case "dd" => "day"; case s => s }
    private val coarserUnits: Set[String] =
      if (grain == "hour") Set("day", "week", "month", "quarter", "year")
      else Set("week", "month", "quarter", "year")

    /** The query subtree rewritten over the rollup attribute `a`, when
      * it is this pattern's own truncation of the time column or a
      * coarser derivation of it; None otherwise. Constructed nodes
      * reuse the ORIGINAL node's time zone (the query is analyzed, so
      * it is the resolved session zone). */
    def subst(e: Expression, a: Attribute): Option[Expression] = e match {
      // the pattern's own grain, exactly the rollup column's value
      case TruncTimestamp(Literal(f, _), t, tz)
          if fmtName(f).contains(grain) && isNormTime(t, col) =>
        // an hourly column IS the hour truncation; a day column holds
        // the DATE, so date_trunc('day', ts) is its midnight timestamp
        Some(if (grain == "hour") a else Cast(a, TimestampType, tz))
      case Cast(t, DateType, tz, _) if grain == "day" && isNormTime(t, col) =>
        Some(a)
      // coarser derivations compose over the rollup column
      case Cast(t, DateType, tz, _) if grain == "hour" && isNormTime(t, col) =>
        Some(Cast(a, DateType, tz))
      case TruncTimestamp(lit @ Literal(f, _), t, tz)
          if fmtName(f).exists(coarserUnits.contains) && isNormTime(t, col) =>
        val base = if (grain == "hour") a else Cast(a, TimestampType, tz)
        Some(TruncTimestamp(lit, base, tz))
      case _ => None
    }

    /** The truncation over a RAW source attribute (the hybrid tail's
      * scans carry the un-normalized NTZ/date/timestamp column — the
      * cast to session TIMESTAMP is the loader contract's relabel,
      * an instant identity under the pinned-UTC session). */
    def rebuild(resolve: String => Option[Attribute], tz: String): Option[Expression] =
      resolve(col).map { t =>
        val ts = if (t.dataType == TimestampType) t
                 else Cast(t, TimestampType, Some(tz))
        if (grain == "hour") TruncTimestamp(Literal("hour"), ts, Some(tz))
        else Cast(ts, DateType, Some(tz))
      }
  }

  /** How one aggregate over the raw join rewrites onto the rollup. */
  sealed trait AggMap
  /** `SUM(expr-with-casts)` → `SUM(partial)` — lossless because the
    * partial is the exact DECIMAL partial of the same expression
    * ([[graft.ops.Fns.dsumPartial]]); the query's own outer casts are
    * preserved above the rewritten Sum. */
  case class SumOf(pat: SrcPat, partial: String) extends AggMap
  /** `COUNT(*)` / `COUNT(lit)` → `SUM(partial)` of the per-group row
    * count. */
  case class CountStarTo(partial: String) extends AggMap
  /** `COUNT(expr)` — the NULL-SKIPPING count of any pattern measure —
    * → `SUM(partial)` of the per-group non-null count (round 14).
    * Counts add across any regrouping, so the member is fully
    * mergeable like [[CountStarTo]]; the pattern vocabulary makes it
    * ClickHouse's `countIf` in an MV: `count(CASE WHEN pred THEN 1
    * END)` registers as the ExprPat of the CASE and the unchanged
    * conditional count routes (its non-match branch is NULL, exactly
    * the null-skipping this member stores). Bare `count(col)` over a
    * nullable column is the degenerate ColRef form. */
  case class CountOf(pat: SrcPat, partial: String) extends AggMap
  /** `COUNT(DISTINCT grainCol)` → `COUNT(*)` over the rollup — valid
    * exactly because `grainCol` IS the rollup's grain (one rollup row
    * per distinct value). */
  case class CountDistinctGrain(grainCol: String) extends AggMap
  /** `MIN(col)` → `MIN(partial)`. Routes only a BARE column reference
    * (a cast in between could reorder or change the output type under
    * a preserved ExprId — round-11 tightening; SUM tolerates the dsum
    * cast because the decimal partial subsumes it exactly). */
  case class MinOf(col: String, partial: String) extends AggMap
  /** `MAX(col)` → `MAX(partial)`; same bare-reference rule. */
  case class MaxOf(col: String, partial: String) extends AggMap
  /** `AVG(cast(col as decimal(38,6)))` → the EXACT decimal average
    * from partials (round 12, SURVEY A6's "avg must be kept as
    * sum+count" made transparent). AVG is not generally routable —
    * dividing decimal partials is not bit-identical to a raw DOUBLE
    * average — so only the dsum-shaped exact form routes, and the
    * rewrite reproduces Spark's own `Average`-over-decimal evaluate
    * tree node for node: `DecimalDivideWithOverflowCheck(sum(sumP),
    * cast(sum(cntP) as decimal(20,0)), decimal(38,10))`. Both sides
    * then compute the identical exact decimal sum (38,6), the
    * identical count, and the identical single HALF_UP division —
    * bit-equal by construction (pinned by RollupRoutingSpec's
    * routed≡live compare). CONTRACT: `cntPartial` must count exactly
    * the NON-NULL `col` rows per group — `count(col)`, not
    * `count(*)` — or a null-bearing source averages wrong; the
    * default block's `vn_partial` is built that way. */
  case class AvgOf(col: String, sumPartial: String, cntPartial: String) extends AggMap
  /** `hll_sketch_agg(col, lgK)` (usually under `hll_sketch_estimate`)
    * → `hll_union_agg(partial)` when the rollup stores the per-group
    * Datasketches-HLL SKETCH STATE `hll_sketch_agg(col, lgK)` as a
    * binary partial — the approx-distinct member of the registry
    * (round 12): ClickHouse's AggregatingMergeTree `uniqState` /
    * `uniqMerge` pattern (the reference's `uniq()` dashboards, SURVEY
    * A3) as an [[AggMap]]. An HLL sketch is a pure set-function of its
    * input values — sparse coupons set-union, dense registers
    * max-merge, both associative and commutative — so union of
    * per-group partials and the single-pass sketch reach the same
    * final state, and the estimate re-aggregates losslessly at any
    * coarser grain (routed ≡ live is spec-pinned). Routing requires
    * the query's lgK to EQUAL the registered one: a different
    * precision is a different register array (a union could only
    * degrade it, silently changing the estimate), so those queries
    * stay live. `approx_count_distinct` (HLL++, a different sketch
    * family) routes onto this member ONLY under precision dominance
    * (round 13): the registered rsd 1.04/√2^lgK must be at or under
    * the query's relativeSD — estimator substitution within the
    * approx function's own accuracy contract, which also unlocks
    * CUBE/ROLLUP distinct-count dashboards (states union across any
    * subtotal regrouping, where exact COUNT(DISTINCT) never can). */
  case class HllUniqOf(pat: SrcPat, partial: String, lgK: Int = 12) extends AggMap
  object HllUniqOf {
    /** Bare-column registration shorthand (the pre-r15 surface). */
    def apply(col: String, partial: String): HllUniqOf =
      HllUniqOf(ColRef(col), partial)
    def apply(col: String, partial: String, lgK: Int): HllUniqOf =
      HllUniqOf(ColRef(col), partial, lgK)
  }
  /** The standard HLL relative standard deviation at a given register
    * count, 1.04/√2^lgK — the precision-dominance bound [[HllUniqOf]]
    * routing and the advisor's demand mining share. (Conservative for
    * Datasketches' HIP estimator, which does slightly better.) */
  def hllRsd(lgK: Int): Double = 1.04 / math.sqrt((1L << lgK).toDouble)
  /** Datasketches KLL's published normalized rank error at parameter
    * k (single-quantile regime), ≈ 2.296/k^0.9329 — ~1.65% at the
    * default k = 200. The dominance bound for substituting a KLL
    * state under a `percentile_approx` query: GK guarantees rank
    * error ≤ 1/accuracy, so the state answers within the query's OWN
    * tolerance only when kllRankError(k) ≤ 1/accuracy (the HLL++
    * precedent — see [[HllUniqOf]]; same opt-out knob). */
  def kllRankError(k: Int): Double = 2.296 / math.pow(k.toDouble, 0.9329)
  /** `graft_kll_agg(col, k)` (usually under `graft_kll_quantile`) →
    * `graft_kll_merge(partial)` when the rollup stores the per-group
    * KLL quantile state ([[graft.expr.KllDoublesAgg]], binary) — the
    * QUANTILE member (round 12): ClickHouse's `quantileState` /
    * `quantileMerge`. KLL merge has the same bounded rank error as
    * the single-pass sketch but its compaction is randomized, so
    * routed ≡ live holds in RANK ERROR, not bits — the spec pins the
    * ±ε bound against the exact CDF on both plans. Routing requires
    * the registered k; a different k stays live. Round 15: the source
    * may be a PATTERN (quantileIf — the CASE's NULLs never enter the
    * sketch), and `percentile_approx` (GK) SUBSTITUTES the state's
    * estimate under RANK DOMINANCE — GK promises rank error ≤
    * 1/accuracy, so the state answers inside the query's own
    * tolerance when [[kllRankError]](k) ≤ 1/accuracy (scalar double
    * form; default accuracy 10000 is ~100× tighter than k = 200 and
    * correctly stays live; `spark.graft.routing.estimatorSubstitution
    * = false` disables, same as the HLL++ rule). */
  case class KllQuantileOf(pat: SrcPat, partial: String, k: Int = 200) extends AggMap
  object KllQuantileOf {
    /** Bare-column registration shorthand (the pre-r15 surface). */
    def apply(col: String, partial: String): KllQuantileOf =
      KllQuantileOf(ColRef(col), partial)
    def apply(col: String, partial: String, k: Int): KllQuantileOf =
      KllQuantileOf(ColRef(col), partial, k)
  }
  /** `approx_top_k(col, k, maxItems)` →
    * `approx_top_k_estimate(approx_top_k_combine(partial), k)` when
    * the rollup stores the per-group frequent-items SKETCH STATE
    * (`approx_top_k_accumulate(col, maxItems)`) — the TOP-K member
    * (round 12): ClickHouse's `topKState`/`topKMerge`, the third leg
    * of the state trio next to uniq and quantile. The Datasketches
    * frequent-items sketch merges deterministically and is EXACT
    * while a group's distinct count stays under ~0.75·maxItems (the
    * fixture regime; beyond it estimates carry the sketch's published
    * error bound — same contract as the reference's `topK`). The
    * query's own k is free (any k the estimate can answer); the
    * registered `maxItems` must match — a different capacity is a
    * different sketch. Round 15: the source may be a PATTERN (topKIf,
    * `approx_top_k(CASE WHEN pred THEN col END, …)`). NOTE Spark's
    * approx_top_k counts the CASE's NULL bucket as an item —
    * IDENTICALLY on live and routed plans (the same expression builds
    * both states) — so the non-matching rows surface as one NULL
    * entry the dashboard filters. The rewrite additionally requires
    * item-type equality between the estimate over the partial and the
    * query's own output (a widening the tree match tolerates must not
    * change the routed type). */
  case class TopKOf(pat: SrcPat, partial: String, maxItems: Int = 10000) extends AggMap
  object TopKOf {
    /** Bare-column registration shorthand (the pre-r15 surface). */
    def apply(col: String, partial: String): TopKOf =
      TopKOf(ColRef(col), partial)
    def apply(col: String, partial: String, maxItems: Int): TopKOf =
      TopKOf(ColRef(col), partial, maxItems)
  }
  /** `collect_set(col)` → set-union of per-group partials when the
    * rollup stores the per-group distinct-values array — ClickHouse's
    * `groupUniqArrayState` in an AggregatingMergeTree served by
    * `groupUniqArrayMerge` (round 13; the reference's q70
    * `groupUniqArray` shape as a registry member, the fourth state
    * next to HLL/KLL/top-k). A distinct set is a pure set-function of
    * its inputs, so union across any regrouping — coarser grains,
    * grouping-set subtotals, the hybrid tail — is lossless in SET
    * terms; ELEMENT ORDER is unspecified on every plan, exactly
    * `collect_set`'s own contract, so a deterministic dashboard sorts
    * the array (and then routed ≡ live bit-for-bit). `size(...)` of
    * the set gives the EXACT distinct count from the same state.
    * State size grows with per-group distinct cardinality — the same
    * caveat as ClickHouse's member; register the HLL state for
    * unbounded keys, this one for bounded-cardinality sets. Round 15:
    * the source may be a PATTERN (setIf — `collect_set(CASE WHEN pred
    * THEN col END)`; collect_set skips NULLs, so the state is the
    * conditional set exactly), with an element-type guard on the
    * routed array. */
  case class SetOf(pat: SrcPat, partial: String) extends AggMap
  object SetOf {
    /** Bare-column registration shorthand (the pre-r15 surface). */
    def apply(col: String, partial: String): SetOf = SetOf(ColRef(col), partial)
  }
  /** `least(count(DISTINCT col), n+1)` — ClickHouse's `uniqUpTo(N)` —
    * answered from a CAPPED set state (round 13): the rollup stores
    * `slice(collect_set(col), 1, n+1)` per group, so state is bounded
    * at n+1 members regardless of group cardinality. Sound under any
    * regrouping: a partial that truncated already carries n+1 members,
    * so every union that lost members still reports ≥ n+1 and the
    * final `least(size(union), n+1)` answers EXACTLY — true counts up
    * to n, the single `n+1` sentinel ("more than n") above. Routing
    * requires the query's limit literal to equal the registered n+1
    * (a different cap is a different state). The whole-expression
    * `least(...)` shape is matched at the output level (the distinct
    * aggregate alone is NOT mergeable — only the capped form is). */
  case class UniqUpToOf(pat: SrcPat, partial: String, n: Int) extends AggMap
  object UniqUpToOf {
    /** Bare-column registration shorthand (the pre-r15 surface). */
    def apply(col: String, partial: String, n: Int): UniqUpToOf =
      UniqUpToOf(ColRef(col), partial, n)
  }
  /** EXACT `COUNT(DISTINCT expr)` over an INTEGRAL column answered
    * from a compressed-bitmap state (round 15) — ClickHouse's
    * `groupBitmapState`/`groupBitmapMerge` member
    * ([[graft.expr.BitmapAgg]], Roaring64 on Spark's own shipped
    * RoaringBitmap). A bitmap IS the distinct set of an integral
    * column, and set-union is bitwise OR — associative, commutative,
    * idempotent — so per-group states merge losslessly at ANY
    * regrouping: coarser grains, grouping-set subtotals (exact
    * distinct-count LATTICES, which the row-count mapping can never
    * serve), and the hybrid tail. The answer is EXACT and the
    * serialized form canonical, so routed ≡ live bit-for-bit.
    *
    * This is the scale member for exact distincts: state is ~2 bytes
    * per member worst-case (runs compress far below that), vs the
    * [[SetOf]] array state's 8+ bytes per member plus array
    * distinct-flatten merge cost — the regime the round-14 audit
    * measured at 4.8-5.8× at ×100 (q204/q217). Register [[SetOf]]
    * when the dashboard also wants the members themselves
    * (`collect_set`), the HLL state for non-integral unbounded keys;
    * this member whenever the count is the read. The source may be a
    * PATTERN (uniqExactIf — `count(DISTINCT CASE WHEN pred THEN col
    * END)`: count-distinct skips NULLs exactly like the build side).
    * Non-integral sources are refused at build time
    * ([[graft.expr.Bitmap.integralCheck]]): hashing first would trade
    * exactness for collision risk. */
  case class BitmapUniqOf(pat: SrcPat, partial: String) extends AggMap
  object BitmapUniqOf {
    def apply(col: String, partial: String): BitmapUniqOf =
      BitmapUniqOf(ColRef(col), partial)
  }
  /** `graft_theta_agg(col, lgK)` (usually under `graft_theta_estimate`
    * or the set-algebra scalars) → `graft_theta_union(partial)` when
    * the rollup stores the per-group THETA state
    * ([[graft.expr.ThetaAgg]], binary) — the SET-ALGEBRA sketch
    * member (round 15): ClickHouse's `uniqThetaState`/`uniqThetaMerge`
    * next to the HLL member (estimate-only) and the bitmap member
    * (exact, integral-only). A theta state's retained set is a pure
    * function of its input VALUE SET (hash threshold, no RNG), so
    * union across any regrouping — coarser grains, lattices, the
    * hybrid tail — reproduces the single-pass state BIT-FOR-BIT, and
    * downstream intersect/a-not-b reads get the same states either
    * way. Routing requires the registered lgK (a different nominal
    * size is a different sketch). Exact COUNT(DISTINCT) never maps
    * here (theta is exact only below nominal entries — that claim
    * belongs to the set/bitmap members); only the explicit theta
    * vocabulary routes. */
  case class ThetaUniqOf(pat: SrcPat, partial: String, lgK: Int = 12) extends AggMap
  object ThetaUniqOf {
    def apply(col: String, partial: String): ThetaUniqOf =
      ThetaUniqOf(ColRef(col), partial)
    def apply(col: String, partial: String, lgK: Int): ThetaUniqOf =
      ThetaUniqOf(ColRef(col), partial, lgK)
  }
  /** `collect_list(expr)` → multiset-union of per-group LIST states
    * (round 15) — ClickHouse's `groupArrayState`/`groupArrayMerge`,
    * the sequence member behind funnel-from-MV reads: a rollup stores
    * each group's collected rows (typically `struct(ts, step)` event
    * sequences guarded by a CASE whose non-match is NULL —
    * collect_list skips NULLs, so only qualifying events enter the
    * state), and a coarser read flattens the per-grain lists back
    * into one. A list is a MULTISET function of its input rows —
    * duplicates preserved, element ORDER unspecified on every plan
    * (collect_list's own contract, the [[SetOf]] argument) — so
    * flatten across any regrouping is exact in multiset terms and a
    * deterministic dashboard sorts (`sort_array` above the aggregate,
    * where [[graft.expr.FunnelLevel]] consumes it). Routed arrays
    * carry the partial's element type — a same-shaped struct with
    * different field names/types must not rewrite (type guard).
    * State size is the group's own row count — the member for
    * BOUNDED per-group sequences (per-user-per-day events). The
    * advisor mints it ONLY for CASE-guarded pattern sources (round
    * 16 — a captured funnel workload's `collect_list(struct(ts,
    * step))`, where the guard's NULLs bound the state to qualifying
    * events); a bare-column collect_list stays register-only, like
    * ClickHouse's groupArray MVs. */
  case class ListOf(pat: SrcPat, partial: String) extends AggMap
  object ListOf {
    def apply(col: String, partial: String): ListOf = ListOf(ColRef(col), partial)
  }
  /** `graft_topk_weighted_agg(item, weight[, maxMapSize])` (usually
    * under the `graft_topk_weighted(state, k)` estimate) →
    * `graft_topk_weighted_merge(partial, maxMapSize)` — the WEIGHTED
    * frequent-items member (round 16): ClickHouse's
    * `topKWeightedState`/`topKWeightedMerge`, the aggregate behind
    * "top senders by VOLUME" dashboards (the reference's flagship
    * ranked read, `usdc-transfers/README.md:73-78`, is a weighted
    * top-k: rank by summed value, not row count — which the
    * count-only [[TopKOf]] member cannot answer). The rollup stores
    * the per-group [[graft.expr.TopKWeightedAgg]] state (binary); the
    * merge is the member-wise SUM of the states' weight maps —
    * associative and commutative — so per-group partials re-aggregate
    * losslessly at any regrouping: coarser grains, grouping-set
    * subtotals, the hybrid tail. In the exact regime (a group's
    * distinct items under ~0.75·maxMapSize) the merged state IS the
    * single-pass state and the `(weight DESC, item ASC)`-ordered
    * estimate is bit-deterministic — routed ≡ live, hash-oracled;
    * above it the sketch's published error bound applies identically
    * on both plans. TWO patterns register (the item and the weight
    * measure — typically an ExprPat like `round(value*100)::long`,
    * the cent-scaling that keeps weights integral); both must match
    * the query's own expressions ORDER-SENSITIVELY, and the
    * registered maxMapSize must equal the query's (a different
    * capacity is a different sketch). */
  case class TopKWeightedOf(itemPat: SrcPat, weightPat: SrcPat,
                            partial: String, maxMapSize: Int = 1024) extends AggMap
  object TopKWeightedOf {
    def apply(item: String, weight: String, partial: String): TopKWeightedOf =
      TopKWeightedOf(ColRef(item), ColRef(weight), partial)
  }
  /** `min(expr)` / `max(expr)` over a PATTERN measure — the argMax /
    * argMin shape (round 13): the reference's `max(struct(value,
    * user)).getField(user)` dashboards (ClickHouse `argMaxState`)
    * register the whole struct expression as the measure; extrema
    * fold associatively over ANY expression, so partial maxima merge
    * losslessly at any regrouping and the scalar `getField` above the
    * aggregate survives the rewrite untouched. Matching is the
    * ORDER-SENSITIVE [[ExprPat]] canonical equality (round 14: casts
    * retained unless provably order-embedding — a nested
    * value-changing cast orders rows differently and must stay live)
    * PLUS a result-type equality guard (a differently-typed struct
    * must not rewrite under a preserved ExprId). */
  case class MinPatOf(pat: SrcPat, partial: String) extends AggMap
  case class MaxPatOf(pat: SrcPat, partial: String) extends AggMap
  /** ClickHouse's `deltaSumTimestamp` state (round 19 — the r18
    * verdict's #2): per group, the ORDER-AWARE positive-delta partial
    * `struct(first, last, dsum)` of the measure's series sorted by
    * `orderCols` — first/last are the series' boundary values, dsum
    * the sum of positive consecutive deltas INSIDE the group. Partials
    * of adjacent grain buckets compose exactly (ClickHouse stores
    * timestamps in the state for the same reason): fold buckets in
    * grain order with `dsum += next.dsum + max(0, next.first −
    * prev.last)` — [[graft.ops.Windows.deltaSumPerUserFromStates]] is
    * that read, sharing the raw window query's oracle. State is three
    * LONGs per group vs the cents-sequence ListOf's one struct per
    * EVENT — the compact member whenever only the delta (not the
    * series) is read.
    *
    * CONTRACTS, honestly stated: (a) the read is an EXPLICIT state
    * fold, not a transparent rewrite — the raw spelling is a
    * Window(lag) plan, outside this rule's Aggregate-only contract
    * (the same documented boundary as the q277 ARRAY-JOIN rollup);
    * (b) the member is REBUILD-ONLY (`writeRollupUpTo` /
    * scratch-build + swap): two partial rows of the SAME group have
    * no well-defined merge (their rows may interleave in series
    * order — exactly why ClickHouse tells you not to feed `deltaSum`
    * through out-of-order merges), so [[mergeColumnMap]] refuses
    * compaction for specs carrying it. */
  case class DeltaSumOf(pat: SrcPat, orderCols: Seq[String],
                        partial: String) extends AggMap
  /** The MAX-PREFIX-SUM monoid (round 19) — the mergeable state behind
    * sweep-line PEAKS (`maxIntersections`): per group, over the
    * measure's series sorted by `orderCols`, the struct
    * `(tot = Σ delta, maxp = max non-empty prefix sum, at_us = the
    * series' earliest point achieving maxp)`. Adjacent grain buckets
    * compose exactly — the textbook segment-tree combine
    * `maxp = max(a.maxp, a.tot + b.maxp)` — so a calendar-sized
    * rollup answers the peak (and its earliest instant) at ANY fact
    * volume ([[graft.ops.Windows.maxIntersectionsFromStates]] folds
    * the day states in day order). Same contracts as [[DeltaSumOf]]:
    * explicit state-fold read (the raw plan is a sweep, not an
    * Aggregate) and REBUILD-ONLY (same-group partial rows have no
    * defined merge). */
  case class MaxPrefixOf(pat: SrcPat, orderCols: Seq[String],
                         partial: String) extends AggMap

  /** A pattern's expression form, for cross-member comparison (the
    * avgIf pairing, round 14). */
  private def patExpr(p: SrcPat): Expression = p match {
    case ColRef(n) => org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n))
    case OneMinusProduct(a, b) => Multiply(
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a)),
      Subtract(Literal(1.0d),
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(b))))
    case ExprPat(e) => e
  }
  /** Two patterns denote the same measure (value-preserving canon). */
  private[plans] def samePattern(a: SrcPat, b: SrcPat): Boolean =
    ExprPat.canonOrdered(patExpr(a)) == ExprPat.canonOrdered(patExpr(b))

  /** The rollup column an AggMap writes — used to recognize the
    * rule's own hybrid-tail partial block (fixed-point guard). */
  private def partialName(m: AggMap): Option[String] = m match {
    case SumOf(_, p) => Some(p)
    case CountStarTo(p) => Some(p)
    case CountOf(_, p) => Some(p)
    case MinOf(_, p) => Some(p)
    case MaxOf(_, p) => Some(p)
    case AvgOf(_, _, p) => Some(p)
    case HllUniqOf(_, p, _) => Some(p)
    case KllQuantileOf(_, p, _) => Some(p)
    case TopKOf(_, p, _) => Some(p)
    case SetOf(_, p) => Some(p)
    case UniqUpToOf(_, p, _) => Some(p)
    case BitmapUniqOf(_, p) => Some(p)
    case ThetaUniqOf(_, p, _) => Some(p)
    case ListOf(_, p) => Some(p)
    case TopKWeightedOf(_, _, p, _) => Some(p)
    case MinPatOf(_, p) => Some(p)
    case MaxPatOf(_, p) => Some(p)
    case DeltaSumOf(_, _, p) => Some(p)
    case MaxPrefixOf(_, _, p) => Some(p)
    case CountDistinctGrain(_) => None
  }

  /** A registered JOIN-DERIVED rollup: `tables` + `joinKeys` pin the
    * join core the rollup pre-paid (base-table name set and the sorted
    * equi-join column pairs), `groupings` maps each source grouping
    * column the rollup preserves to its rollup column, and `aggs` lists
    * the aggregate rewrites the partial columns support. A query routes
    * onto the spec iff its join core matches EXACTLY, every grouping is
    * a preserved column (or the aggregate is global — coarser grains
    * re-aggregate losslessly), and every aggregate has a mapping. */
  /** `coverage` (round 12) names the SOURCE column a stale join
    * rollup's coverage watermark is measured on (it must be one of the
    * spec's preserved `grainCols`/`groupings` keys, so the rollup
    * stores it per row). With it, a join rollup stamped with the
    * [[CoverageSidecar]] answers queries HYBRID — rollup partials
    * where coverage < watermark ∪ a live re-join of the raw tables
    * where coverage ≥ watermark — exactly like the single-table path.
    * Without it, a stamped join rollup can never answer (the query
    * stays on the live join): a writer claimed partial coverage and
    * the router has no way to serve the rest. A `CountDistinctGrain`
    * registration on a covered spec additionally claims the coverage
    * column is CONSTANT per grain value (e.g. `o_orderdate` per
    * `o_orderkey`), so no grain ever splits across the watermark. */
  /** `timeGroupings` (round 12) registers TRUNCATED time group keys —
    * `(pattern, rollupCol)` pairs; the rollup column holds the
    * pattern's truncation per group. The one grouping shape the
    * bare-column `groupings` vocabulary cannot express; `coverage`
    * may name a timeGrouping's ROLLUP column, in which case the
    * hybrid watermark must be aligned to the pattern's grain. */
  case class JoinSpec(
      rollupPath: String,
      tables: Set[String],
      joinKeys: Set[(String, String)],
      groupings: Map[String, String],
      aggs: Seq[AggMap],
      grainCols: Map[String, String] = Map.empty,
      coverage: Option[String] = None,
      timeGroupings: Seq[(TimeGrainPat, String)] = Nil) {
    /** Source columns a residual filter may reference → the rollup
      * column carrying the same per-row value: the preserved groupings
      * and the grain columns (both group-constant by construction),
      * CLOSED over the join-key equivalences — the optimizer propagates
      * a predicate on `c_custkey` to the other side as `o_custkey < …`
      * (inner equi-join ⟹ equal values), so a join-key alias of a
      * preserved column is just another spelling of it. */
    lazy val filterCols: Map[String, String] = {
      val base = groupings ++ grainCols
      val viaEquiv = joinKeys.toSeq.flatMap { case (a, b) =>
        base.get(a).map(b -> _).toSeq ++ base.get(b).map(a -> _).toSeq
      }.toMap
      viaEquiv ++ base // a direct mapping wins over an equivalence hop
    }
  }

  object JoinSpec {
    /** The flagship revenue-by-segment MV over
      * lineitem⋈orders⋈customer (build:
      * [[graft.ops.StarJoins.revenueSegmentPartialsOf]], grain =
      * o_orderkey). */
    def revenueSegment(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("lineitem", "orders", "customer"),
      joinKeys = Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        SumOf(OneMinusProduct("l_extendedprice", "l_discount"), "rev_partial"),
        CountStarTo("n_lines_partial"),
        CountDistinctGrain("o_orderkey")),
      grainCols = Map("o_orderkey" -> "o_orderkey"))

    /** The per-customer order-volume MV over orders⋈customer (build:
      * [[graft.ops.StarJoins.customerVolumePartialsOf]], grain =
      * c_custkey) — answers the q17 top-customers shape join-free. */
    def customerVolume(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("orders", "customer"),
      joinKeys = Set(("c_custkey", "o_custkey")),
      groupings = Map("c_custkey" -> "c_custkey", "c_name" -> "c_name"),
      aggs = Seq(
        SumOf(ColRef("o_totalprice"), "vol_partial"),
        CountStarTo("n_orders_partial")))

    /** [[revenueSegment]] with a COVERAGE column (round 12): the
      * order date — functionally dependent on the order key, so it
      * joins the grain without changing the rollup's cardinality —
      * lets a stale, streaming-maintained revenue rollup answer the
      * unchanged q16 query as rollup ∪ live-tail re-join
      * ([[graft.streaming.Live.maintainJoinRollup]] maintains it,
      * [[graft.streaming.Live.streamingRevenueSegmentHybrid]] runs the
      * whole lifecycle). */
    def revenueSegmentDated(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("lineitem", "orders", "customer"),
      joinKeys = Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        SumOf(OneMinusProduct("l_extendedprice", "l_discount"), "rev_partial"),
        CountStarTo("n_lines_partial"),
        CountDistinctGrain("o_orderkey")),
      grainCols = Map("o_orderkey" -> "o_orderkey",
                      "o_orderdate" -> "o_orderdate"),
      coverage = Some("o_orderdate"))

    /** A join MV whose value is the FULL aggregate vocabulary (round
      * 12): per-segment line-quantity stats — min/max partials and
      * the exact-avg sum + non-null-count pair, alongside the row
      * count — proving the join path routes every AggMap the
      * single-table path does. `l_quantity` is integer-valued in the
      * fixture, so the decimal casts are representation-exact on both
      * engines (the oracle-safety rule every routed measure follows). */
    def segmentQty(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("lineitem", "orders", "customer"),
      joinKeys = Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        AvgOf("l_quantity", "qty_partial", "qtyn_partial"),
        MinOf("l_quantity", "qmn_partial"),
        MaxOf("l_quantity", "qmx_partial"),
        CountStarTo("n_lines_partial")),
      grainCols = Map("o_orderkey" -> "o_orderkey"))

    /** A join MV whose value is the EXACT-DISTINCT BITMAP member on
      * the JOIN path (round 16): per-segment distinct CUSTOMERS over
      * orders⋈customer — `COUNT(DISTINCT o_custkey)` dashboards
      * served by OR-union of compressed bitmap states, the star-schema
      * twin of the single-table q218 member. The build pre-aggregates
      * per customer key on the fact, attaches the dim, and merges the
      * states down to five segment rows; the read never joins. */
    def segmentCustomers(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("orders", "customer"),
      joinKeys = Set(("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        BitmapUniqOf("o_custkey", "cust_bm"),
        CountStarTo("n_orders_p")))

    /** The gross-charge measure
      * `l_extendedprice * (1 - l_discount) * (1 + l_tax)` — a
      * USER-DEFINED expression outside the named pattern vocabulary,
      * registered via [[ExprPat]] (round 12; a user would equivalently
      * write `ExprPat(col("l_extendedprice") * (lit(1.0) -
      * col("l_discount")) * (lit(1.0) + col("l_tax")))`). */
    def chargeMeasure: Expression = {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
      Multiply(
        Multiply(UnresolvedAttribute("l_extendedprice"),
                 Subtract(Literal(1.0d), UnresolvedAttribute("l_discount"))),
        Add(Literal(1.0d), UnresolvedAttribute("l_tax")))
    }

    /** A THIRD join MV whose measure is [[chargeMeasure]] (build:
      * [[graft.ops.StarJoins.chargeSegmentPartialsOf]]): proves the
      * registry is closed under user-defined measures — no engine
      * pattern edits, the spec is still pure data. */
    def chargeSegment(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("lineitem", "orders", "customer"),
      joinKeys = Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        SumOf(ExprPat(chargeMeasure), "charge_partial"),
        CountStarTo("n_lines_partial")),
      grainCols = Map("o_orderkey" -> "o_orderkey"))

    /** [[chargeSegment]] at the COARSEST useful grain — segment only,
      * no per-order column: the "aggregate table at exactly the
      * dashboard's grain" a warehouse team ships next to the reusable
      * per-order MV. [[buildJoinPartials]] merges the fact partials
      * down to five segment rows, and the router's size-based cost
      * choice picks it over the per-order rollup whenever both can
      * answer (q175; either registration order). */
    def chargeSegmentCoarse(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("lineitem", "orders", "customer"),
      joinKeys = Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        SumOf(ExprPat(chargeMeasure), "charge_partial"),
        CountStarTo("n_lines_partial")))

    /** An HOURLY events⋈customer MV (round 12): the time key is a real
      * TRUNCATION of the fact's TIMESTAMP — `date_trunc('hour', ts)`
      * registered via [[TimeGrainPat]] — so one (hour, segment) rollup
      * answers the hourly dashboard directly AND every coarser cut
      * (day, month, year) by truncation composition. Coverage rides
      * the hour column itself: a stamped sidecar serves hybrid
      * rollup ∪ live-tail with an hour-aligned watermark. */
    def eventsSegmentHourly(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("events", "customer"),
      joinKeys = Set(("c_custkey", "user_id")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        SumOf(ColRef("value"), "v_partial"),
        CountStarTo("n_events_partial")),
      coverage = Some("ts_hour"),
      timeGroupings = Seq(TimeGrainPat("hour", "ts") -> "ts_hour"))

    /** Daily DISTINCT-USERS-per-segment over events⋈customer via HLL
      * sketch states (round 12): the [[HllUniqOf]] member on the JOIN
      * path. The build pre-aggregates one sketch per (user, day) on
      * the fact, joins the dim, and the coarse-merge path unions them
      * down to (day, segment) — sketch union is the partial-merge, so
      * the two-level build IS the single-pass sketch. The rollup is
      * (days × segments)-sized; the raw join never runs at read time. */
    def uniqSegmentDaily(rollupPath: String): JoinSpec = JoinSpec(
      rollupPath,
      tables = Set("events", "customer"),
      joinKeys = Set(("c_custkey", "user_id")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        HllUniqOf("user_id", "uniq_state", 12),
        CountStarTo("n_events_partial")),
      // coverage rides the day column itself: a COMPLETE build never
      // stamps a sidecar (q186 answers alone); a streaming maintainer
      // stamps it and the router serves states ∪ live-tail re-join
      // (q197's lifecycle)
      coverage = Some("ts_day"),
      timeGroupings = Seq(TimeGrainPat("day", "ts") -> "ts_day"))
  }

  /** The BUILD side of the registry (round 12): derive a spec's
    * partial block from the same `aggs` that drive query rewriting —
    * registration is the single source of truth, the CREATE
    * MATERIALIZED VIEW equivalence (the reference declares each MV
    * once and its engine both maintains and serves it,
    * `usdc-transfers/sql/analytics.sql:9-94`). The block groups by
    * the grain key + key columns and emits one mergeable partial per
    * AggMap: the exact decimal(38,6) sum for SumOf (the only shape
    * the router re-aggregates), row count, min/max, and AvgOf's
    * non-null count (plus its sum if no SumOf already writes it).
    * `CountDistinctGrain` needs no column — the rollup's grain IS the
    * distinct set. Equivalence with the hand-written builders and an
    * end-to-end build→register→route→hash-match are spec-pinned. */
  /** The user-facing Column for a measure pattern (build side). */
  private[plans] def srcColumn(pat: SrcPat): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    pat match {
      case ColRef(n) => col(n)
      case OneMinusProduct(a, b) => col(a) * (lit(1.0d) - col(b))
      case ExprPat(e) =>
        org.apache.spark.sql.graftx.Bridge.column(ExprPat.resolveOps(e))
    }
  }

  /** The mergeable partial column per AggMap, keyed by its rollup
    * column name (a LinkedHashMap so spec order is output order; an
    * AvgOf whose sum partial another AggMap already writes reuses
    * it). */
  private def partialColumns(aggs: Seq[AggMap])
      : scala.collection.mutable.LinkedHashMap[String, org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    val partials =
      scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.Column]
    aggs.foreach {
      case SumOf(pat, p) =>
        partials.getOrElseUpdate(p, sum(srcColumn(pat).cast("decimal(38,6)")).as(p))
      case CountStarTo(p) =>
        partials.getOrElseUpdate(p, count(lit(1)).as(p))
      case CountOf(pat, p) =>
        partials.getOrElseUpdate(p, count(srcColumn(pat)).as(p))
      case MinOf(c, p) => partials.getOrElseUpdate(p, min(col(c)).as(p))
      case MaxOf(c, p) => partials.getOrElseUpdate(p, max(col(c)).as(p))
      case AvgOf(c, sp, cp) =>
        partials.getOrElseUpdate(sp, sum(col(c).cast("decimal(38,6)")).as(sp))
        partials.getOrElseUpdate(cp, count(col(c)).as(cp))
      case HllUniqOf(pt, p, lgK) =>
        partials.getOrElseUpdate(p, hll_sketch_agg(srcColumn(pt), lgK).as(p))
      case KllQuantileOf(pt, p, k) =>
        partials.getOrElseUpdate(p, graft.expr.Kll.agg(srcColumn(pt), k).as(p))
      case TopKOf(pt, p, m) =>
        partials.getOrElseUpdate(p,
          call_function("approx_top_k_accumulate", srcColumn(pt), lit(m)).as(p))
      case SetOf(pt, p) =>
        partials.getOrElseUpdate(p, collect_set(srcColumn(pt)).as(p))
      case UniqUpToOf(pt, p, n) =>
        partials.getOrElseUpdate(p, slice(collect_set(srcColumn(pt)), 1, n + 1).as(p))
      case BitmapUniqOf(pt, p) =>
        partials.getOrElseUpdate(p, graft.expr.Bmp.agg(srcColumn(pt)).as(p))
      case ThetaUniqOf(pt, p, k) =>
        partials.getOrElseUpdate(p, graft.expr.Tht.agg(srcColumn(pt), k).as(p))
      case ListOf(pt, p) =>
        partials.getOrElseUpdate(p, collect_list(srcColumn(pt)).as(p))
      case TopKWeightedOf(ip, wp, p, m) =>
        partials.getOrElseUpdate(p,
          graft.expr.TkW.agg(srcColumn(ip), srcColumn(wp), m).as(p))
      case MinPatOf(pat, p) => partials.getOrElseUpdate(p, min(srcColumn(pat)).as(p))
      case MaxPatOf(pat, p) => partials.getOrElseUpdate(p, max(srcColumn(pat)).as(p))
      case DeltaSumOf(pat, ord, p) =>
        // ONE sorted in-group pass: collect (orderCols..., measure),
        // sort lexicographically (orderCols must totally order the
        // group's rows), fold first/last/dsum in a single aggregate()
        // — the collect is build-time-only and bounded by the group's
        // own rows, never carried into any read
        // the measure field is aliased __m so it can never collide
        // with an orderCols name inside the collected struct
        val seq = sort_array(collect_list(
          struct(ord.map(col) :+ srcColumn(pat).cast("long").as("__m"): _*)))
        val zero = struct(
          lit(null).cast("long").as("first"), lit(null).cast("long").as("last"),
          lit(0L).as("dsum"))
        partials.getOrElseUpdate(p, aggregate(seq, zero, (acc, x) => struct(
          coalesce(acc.getField("first"), x.getField("__m")).as("first"),
          x.getField("__m").as("last"),
          (acc.getField("dsum") + coalesce(
            when(x.getField("__m") > acc.getField("last"),
              x.getField("__m") - acc.getField("last")), lit(0L))).as("dsum")))
          .as(p))
      case MaxPrefixOf(pat, ord, p) =>
        // same build shape as DeltaSumOf: one sorted in-group pass;
        // the fold keeps (tot, maxp, at_us) — at_us is the EARLIEST
        // point achieving the max prefix (strict > keeps the first)
        val seq = sort_array(collect_list(
          struct(ord.map(col) :+ srcColumn(pat).cast("long").as("__m"): _*)))
        val zero = struct(lit(0L).as("tot"),
          lit(Long.MinValue).as("maxp"), lit(0L).as("at_us"))
        partials.getOrElseUpdate(p, aggregate(seq, zero, (acc, x) => {
          val newTot = acc.getField("tot") + x.getField("__m")
          val isNew = newTot > acc.getField("maxp")
          struct(newTot.as("tot"),
            when(isNew, newTot).otherwise(acc.getField("maxp")).as("maxp"),
            when(isNew, unix_micros(x.getField(ord.head)))
              .otherwise(acc.getField("at_us")).as("at_us"))
        }).as(p))
      case CountDistinctGrain(_) => ()
    }
    partials
  }

  def buildPartials(src: org.apache.spark.sql.DataFrame, spec: Spec)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    // a GRAINLESS spec groups by its key columns only (possibly none —
    // a single global row of partials); no time key is stored
    val keys: Seq[org.apache.spark.sql.Column] =
      if (spec.grain == "all") spec.keyCols.toSeq.map { case (s, r) => col(s).as(r) }
      else {
        val timeKeyName = if (spec.grain == "hour") "hour" else "day"
        val grainKey =
          if (spec.grain == "hour") date_trunc("hour", col(spec.timeCol))
          else to_date(col(spec.timeCol)) // identity on a DATE column
        grainKey.as(timeKeyName) +:
          spec.keyCols.toSeq.map { case (s, r) => col(s).as(r) }
      }
    val partials = partialColumns(spec.aggs)
    require(partials.nonEmpty, s"spec for ${spec.rollupPath} declares no partials")
    val aggCols = partials.values.toSeq
    src.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** The JOIN registry's build side (round 12): derive a join MV's
    * partial block from its [[JoinSpec]] — the same one-registration
    * economy as [[buildPartials]], with the star-join build plan the
    * hand-written builders use derived automatically:
    *
    *  1. the FACT is the table owning the SUM measures' columns;
    *  2. the fact PRE-AGGREGATES per its own join-key columns BEFORE
    *     any join (the partial block per fact grain), so the
    *     fact-fact exchange carries one row per grain, never raw
    *     rows — the SummingMergeTree insert-trigger economy;
    *  3. remaining tables attach along the spec's equi-join pairs,
    *     pruned to the columns the rollup keeps; their sizes are
    *     unknown at registration, so broadcast choice stays with the
    *     optimizer/AQE (the hand-written builders pin `broadcast()`
    *     for their known-small dims — the pruned selects here keep
    *     each side under the auto-broadcast threshold in practice);
    *  4. the output is grain columns + preserved groupings (under
    *     their rollup names) + the partial columns — exactly the
    *     schema [[RuleImpl.rewriteJoin]] routes onto.
    *
    * Spec-pinned identical (columns and rows) to all three
    * hand-written builders and routed end-to-end. */
  def buildJoinPartials(tables: Map[String, org.apache.spark.sql.DataFrame],
                        spec: JoinSpec): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(tables.keySet == spec.tables,
      s"need exactly ${spec.tables}, got ${tables.keySet}")
    def owner(c: String): String = {
      val os = spec.tables.filter(t => tables(t).columns.contains(c))
      require(os.size == 1, s"column $c must belong to exactly one table, found $os")
      os.head
    }
    val measureRefs = spec.aggs.flatMap {
      case SumOf(pat, _) => pat.refs
      case CountOf(pat, _) => pat.refs
      case MinOf(c, _) => Seq(c)
      case MaxOf(c, _) => Seq(c)
      case AvgOf(c, _, _) => Seq(c)
      case HllUniqOf(pt, _, _) => pt.refs.toSeq
      case KllQuantileOf(pt, _, _) => pt.refs.toSeq
      case TopKOf(pt, _, _) => pt.refs.toSeq
      case SetOf(pt, _) => pt.refs.toSeq
      case UniqUpToOf(pt, _, _) => pt.refs.toSeq
      case BitmapUniqOf(pt, _) => pt.refs.toSeq
      case ThetaUniqOf(pt, _, _) => pt.refs.toSeq
      case ListOf(pt, _) => pt.refs.toSeq
      case TopKWeightedOf(ip, wp, _, _) => (ip.refs ++ wp.refs).toSeq
      case MinPatOf(pat, _) => pat.refs.toSeq
      case MaxPatOf(pat, _) => pat.refs.toSeq
      case DeltaSumOf(pat, ord, _) => pat.refs.toSeq ++ ord
      case MaxPrefixOf(pat, ord, _) => pat.refs.toSeq ++ ord
      case _ => Nil
    }.toSet
    require(measureRefs.nonEmpty, "join spec declares no measure to locate the fact")
    val factOwners = measureRefs.map(owner)
    require(factOwners.size == 1,
      s"measures must live on one fact table, found $factOwners")
    val fact = factOwners.head
    val allKeyCols = spec.joinKeys.toSeq.flatMap { case (x, y) => Seq(x, y) }
    val factKeys = allKeyCols.filter(tables(fact).columns.contains).distinct
    require(factKeys.nonEmpty, s"fact $fact carries no join-key column")
    val partials = partialColumns(spec.aggs)
    val aggCols = partials.values.toSeq
    // a registered time truncation is one more group key: computed on
    // the FACT side it joins the pre-aggregation keys (the rollup
    // grain gains the grain bucket); on a DIM side it is computed
    // after that table attaches (per-row over the joined result)
    def timeColumn(p: TimeGrainPat): org.apache.spark.sql.Column =
      if (p.grain == "hour") date_trunc("hour", col(p.col).cast("timestamp"))
      else to_date(col(p.col))
    val (factTimes, dimTimes) =
      spec.timeGroupings.partition { case (p, _) => owner(p.col) == fact }
    val factTimeCols = factTimes.map { case (p, rc) => timeColumn(p).as(rc) }
    var acc = tables(fact)
      .groupBy(factKeys.map(col) ++ factTimeCols: _*)
      .agg(aggCols.head, aggCols.tail: _*)
    var joined = Set(fact)
    var have: Set[String] = factKeys.toSet ++ partials.keySet
    val outSrc = spec.grainCols.keySet ++ spec.groupings.keySet
    val pruneKeep = outSrc ++ dimTimes.map(_._1.col)
    while (joined != spec.tables) {
      val step = spec.joinKeys.toSeq.collectFirst(Function.unlift {
        case (x, y) =>
          if (have.contains(x) && !joined.contains(owner(y))) Some((x, y, owner(y)))
          else if (have.contains(y) && !joined.contains(owner(x))) Some((y, x, owner(x)))
          else None
      }).getOrElse(throw new IllegalArgumentException(
        s"join keys do not connect ${spec.tables -- joined} to $joined"))
      val (lhs, rhs, t) = step
      val keep = (Set(rhs) ++ (pruneKeep ++ allKeyCols)
        .filter(tables(t).columns.contains)).toSeq.distinct
      acc = acc.join(tables(t).select(keep.map(col): _*),
                     col(lhs) === col(rhs))
      joined += t
      have ++= keep
    }
    dimTimes.foreach { case (p, rc) => acc = acc.withColumn(rc, timeColumn(p)) }
    val outCols = spec.grainCols.toSeq.map { case (s, r) => col(s).as(r) } ++
      spec.groupings.toSeq.map { case (s, r) => col(s).as(r) } ++
      spec.timeGroupings.map { case (_, rc) => col(rc) } ++
      partials.keys.toSeq.map(col)
    // When the declared grain (grainCols + groupings) is COARSER than
    // the fact's pre-aggregation keys — a spec that keeps no per-grain
    // column, e.g. a segment-only aggregate table — merge the partials
    // down to the declared grain: partials are additive by
    // construction (exact decimal sums, counts, min/max, avg's
    // sum+count), so the merge is the same lossless re-aggregation the
    // router performs at read time, paid once at build. "Preserved" is
    // judged up to join-key equivalence (l_orderkey rows ARE o_orderkey
    // rows under the inner join), so today's per-grain specs skip the
    // merge — one output row per fact grain, no extra shuffle. A
    // CountDistinctGrain claim cannot survive the merge (the grain
    // column is gone), so it refuses rather than registering a
    // silently-wrong distinct count.
    val equivClass = {
      val cls = scala.collection.mutable.Map.empty[String, Set[String]]
      spec.joinKeys.foreach { case (a, b) =>
        val s = cls.getOrElse(a, Set(a)) ++ cls.getOrElse(b, Set(b))
        s.foreach(c => cls(c) = s)
      }
      cls
    }
    def preserved(k: String): Boolean =
      equivClass.getOrElse(k, Set(k)).exists(outSrc.contains) || outSrc.contains(k)
    if (factKeys.forall(preserved)) acc.select(outCols: _*)
    else {
      require(!spec.aggs.exists(_.isInstanceOf[CountDistinctGrain]),
        s"CountDistinctGrain needs its grain column in the rollup output; " +
          s"spec for ${spec.rollupPath} drops fact keys $factKeys")
      val keyCols = spec.grainCols.toSeq.map { case (s, r) => col(s).as(r) } ++
        spec.groupings.toSeq.map { case (s, r) => col(s).as(r) } ++
        spec.timeGroupings.map { case (_, rc) => col(rc) } // materialized above
      require(keyCols.nonEmpty,
        s"spec for ${spec.rollupPath} declares no output key columns")
      val merges = mergeColumns(spec.aggs)
      acc.groupBy(keyCols: _*).agg(merges.head, merges.tail: _*)
    }
  }

  /** The partial-MERGE aggregate per AggMap — how two partial rows of
    * the same group combine (build-side coarsening and any compaction
    * share it): exact decimal sums and counts add, min/max fold,
    * avg's sum+count add. Output names and types equal the build
    * partials', so merged rollups route identically. */
  private def mergeColumns(aggs: Seq[AggMap]): Seq[org.apache.spark.sql.Column] =
    mergeColumnMap(aggs).map(_._2)

  /** [[mergeColumns]] with the target partial names — the ONE place
    * the per-member merge shapes live; any compaction or coarsening
    * (incl. [[graft.ops.Rollups.compactRollup]]) must come through
    * here so a new member can never miss a merge site. */
  private[graft] def mergeColumnMap(aggs: Seq[AggMap])
      : Seq[(String, org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.functions._
    val merges =
      scala.collection.mutable.LinkedHashMap.empty[String, org.apache.spark.sql.Column]
    aggs.foreach {
      case SumOf(_, p) => merges.getOrElseUpdate(p, sum(col(p)).as(p))
      case CountStarTo(p) => merges.getOrElseUpdate(p, sum(col(p)).as(p))
      case CountOf(_, p) => merges.getOrElseUpdate(p, sum(col(p)).as(p))
      case MinOf(_, p) => merges.getOrElseUpdate(p, min(col(p)).as(p))
      case MaxOf(_, p) => merges.getOrElseUpdate(p, max(col(p)).as(p))
      case AvgOf(_, sp, cp) =>
        merges.getOrElseUpdate(sp, sum(col(sp)).as(sp))
        merges.getOrElseUpdate(cp, sum(col(cp)).as(cp))
      case HllUniqOf(_, p, _) => merges.getOrElseUpdate(p, hll_union_agg(col(p)).as(p))
      case KllQuantileOf(_, p, k) =>
        merges.getOrElseUpdate(p, graft.expr.Kll.merge(col(p), k).as(p))
      case TopKOf(_, p, m) =>
        merges.getOrElseUpdate(p, expr(s"approx_top_k_combine(`$p`, $m)").as(p))
      case SetOf(_, p) =>
        merges.getOrElseUpdate(p, array_distinct(flatten(collect_list(col(p)))).as(p))
      case UniqUpToOf(_, p, n) =>
        merges.getOrElseUpdate(p,
          slice(array_distinct(flatten(collect_list(col(p)))), 1, n + 1).as(p))
      case BitmapUniqOf(_, p) =>
        merges.getOrElseUpdate(p, graft.expr.Bmp.merge(col(p)).as(p))
      case ThetaUniqOf(_, p, k) =>
        merges.getOrElseUpdate(p, graft.expr.Tht.union(col(p), k).as(p))
      case ListOf(_, p) =>
        merges.getOrElseUpdate(p, flatten(collect_list(col(p))).as(p))
      case TopKWeightedOf(_, _, p, m) =>
        merges.getOrElseUpdate(p, graft.expr.TkW.merge(col(p), m).as(p))
      case MinPatOf(_, p) => merges.getOrElseUpdate(p, min(col(p)).as(p))
      case MaxPatOf(_, p) => merges.getOrElseUpdate(p, max(col(p)).as(p))
      case d: DeltaSumOf =>
        // REBUILD-ONLY (see the member's scaladoc): two partial rows
        // of one group have no well-defined merge — their underlying
        // rows may interleave in series order, and a wrong merge
        // would silently under/over-count deltas. Refuse loudly.
        throw new IllegalArgumentException(
          s"DeltaSumOf(${d.partial}) is rebuild-only: same-group partial " +
            "rows cannot merge (series order is lost across parts) — " +
            "maintain via writeRollupUpTo's scratch-build + swap")
      case m: MaxPrefixOf =>
        throw new IllegalArgumentException(
          s"MaxPrefixOf(${m.partial}) is rebuild-only: same-group partial " +
            "rows cannot merge (series order is lost across parts) — " +
            "maintain via writeRollupUpTo's scratch-build + swap")
      case CountDistinctGrain(_) => ()
    }
    merges.toSeq
  }

  private var specs: List[Spec] = Nil
  private var joinSpecs: List[JoinSpec] = Nil
  // registration is idempotent (specs are pure data with structural
  // equality) so re-running an adopt/setup script never bloats the
  // catalog or the persisted JSON with duplicates
  def register(spec: Spec): Unit = synchronized {
    if (!specs.contains(spec)) specs = spec :: specs
  }
  def registerJoin(spec: JoinSpec): Unit = synchronized {
    if (!joinSpecs.contains(spec)) joinSpecs = spec :: joinSpecs
  }
  def clear(): Unit = synchronized { specs = Nil; joinSpecs = Nil }
  /** RETIRE one registration by its rollup path (the spec's identity —
    * the reference's `DROP TABLE mv` analog, round 14). Returns true
    * if something was removed. Queries immediately fall back to the
    * next-cheapest matching MV or their live plan — which also means
    * any estimator-substituted `approx_count_distinct` values revert
    * to HLL++'s own (the documented plan-dependence of routed approx
    * reads; see the `estimatorSubstitution` knob). The rollup's FILES
    * are deliberately left in place: dropping data is the owner's
    * call, and a re-register of the same spec serves them again. */
  def unregister(rollupPath: String): Boolean = synchronized {
    val before = specs.size + joinSpecs.size
    specs = specs.filterNot(_.rollupPath == rollupPath)
    joinSpecs = joinSpecs.filterNot(_.rollupPath == rollupPath)
    specs.size + joinSpecs.size < before
  }
  def registered: List[Spec] = specs
  def registeredJoins: List[JoinSpec] = joinSpecs

  // ——— registry persistence (round 12) ———
  //
  // The reference's MVs are DDL in files that outlive any process
  // (`usdc-transfers/sql/analytics.sql:9-94`); this registry was
  // session-state only. Specs are pure data, so they serialize: both
  // registries round-trip through one JSON document — an ExprPat
  // measure travels as its SQL rendering and is re-parsed on load
  // (canonicalized matching makes the round-trip semantically exact
  // even though the parsed tree is built fresh). Written atomically
  // (temp + rename) so a catalog reader never sees a torn file.

  private[plans] def patJson(p: SrcPat): org.json4s.JValue = {
    import org.json4s.JsonDSL._
    p match {
      case ColRef(n) => ("kind" -> "col") ~ ("name" -> n)
      case OneMinusProduct(a, b) =>
        ("kind" -> "oneMinusProduct") ~ ("a" -> a) ~ ("b" -> b)
      case ExprPat(e) => ("kind" -> "expr") ~ ("sql" -> e.sql)
    }
  }

  private[plans] def aggJson(m: AggMap): org.json4s.JValue = {
    import org.json4s.JsonDSL._
    m match {
      case SumOf(pat, p) => ("kind" -> "sum") ~ ("pat" -> patJson(pat)) ~ ("partial" -> p)
      case CountStarTo(p) => ("kind" -> "count") ~ ("partial" -> p)
      case CountOf(pat, p) =>
        ("kind" -> "countOf") ~ ("pat" -> patJson(pat)) ~ ("partial" -> p)
      case MinOf(c, p) => ("kind" -> "min") ~ ("col" -> c) ~ ("partial" -> p)
      case MaxOf(c, p) => ("kind" -> "max") ~ ("col" -> c) ~ ("partial" -> p)
      case AvgOf(c, sp, cp) =>
        ("kind" -> "avg") ~ ("col" -> c) ~ ("sumPartial" -> sp) ~ ("cntPartial" -> cp)
      case HllUniqOf(pt, p, k) =>
        ("kind" -> "hllUniq") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p) ~ ("lgK" -> k)
      case KllQuantileOf(pt, p, k) =>
        ("kind" -> "kllQuantile") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p) ~ ("k" -> k)
      case TopKOf(pt, p, m) =>
        ("kind" -> "topK") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p) ~ ("maxItems" -> m)
      case SetOf(pt, p) =>
        ("kind" -> "setUniq") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p)
      case UniqUpToOf(pt, p, n) =>
        ("kind" -> "uniqUpTo") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p) ~ ("n" -> n)
      case BitmapUniqOf(pt, p) =>
        ("kind" -> "bitmapUniq") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p)
      case ThetaUniqOf(pt, p, k) =>
        ("kind" -> "thetaUniq") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p) ~ ("lgK" -> k)
      case ListOf(pt, p) =>
        ("kind" -> "groupArray") ~ ("pat" -> patJson(pt)) ~ ("partial" -> p)
      case TopKWeightedOf(ip, wp, p, m) =>
        ("kind" -> "topKWeighted") ~ ("item" -> patJson(ip)) ~
          ("weight" -> patJson(wp)) ~ ("partial" -> p) ~ ("maxMapSize" -> m)
      case MinPatOf(pat, p) =>
        ("kind" -> "minPat") ~ ("pat" -> patJson(pat)) ~ ("partial" -> p)
      case MaxPatOf(pat, p) =>
        ("kind" -> "maxPat") ~ ("pat" -> patJson(pat)) ~ ("partial" -> p)
      case DeltaSumOf(pat, ord, p) =>
        ("kind" -> "deltaSum") ~ ("pat" -> patJson(pat)) ~
          ("orderCols" -> ord.toList) ~ ("partial" -> p)
      case MaxPrefixOf(pat, ord, p) =>
        ("kind" -> "maxPrefix") ~ ("pat" -> patJson(pat)) ~
          ("orderCols" -> ord.toList) ~ ("partial" -> p)
      case CountDistinctGrain(g) => ("kind" -> "countDistinctGrain") ~ ("grainCol" -> g)
    }
  }

  /** Persist BOTH registries as one JSON document. */
  def saveRegistry(path: String): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val doc =
      ("singles" -> registered.map { s =>
        ("sourceSuffix" -> s.sourceSuffix) ~ ("rollupPath" -> s.rollupPath) ~
        ("grain" -> s.grain) ~ ("timeCol" -> s.timeCol) ~
        ("keyCols" -> s.keyCols) ~ ("aggs" -> s.aggs.map(aggJson)) ~
        ("truncatedToWindowUs" -> s.truncatedToWindowUs)
      }) ~
      ("joins" -> registeredJoins.map { j =>
        ("rollupPath" -> j.rollupPath) ~ ("tables" -> j.tables.toList.sorted) ~
        ("joinKeys" -> j.joinKeys.toList.sorted.map(p => List(p._1, p._2))) ~
        ("groupings" -> j.groupings) ~ ("aggs" -> j.aggs.map(aggJson)) ~
        ("grainCols" -> j.grainCols) ~ ("coverage" -> j.coverage) ~
        ("timeGroupings" -> j.timeGroupings.map { case (p, rc) =>
          ("grain" -> p.grain) ~ ("col" -> p.col) ~ ("rollupCol" -> rc)
        })
      })
    val target = java.nio.file.Paths.get(path)
    Option(target.getParent).foreach(java.nio.file.Files.createDirectories(_))
    val tmp = java.nio.file.Files.createTempFile(
      Option(target.getParent).getOrElse(java.nio.file.Paths.get(".")), ".reg", ".tmp")
    java.nio.file.Files.write(tmp,
      JsonMethods.pretty(JsonMethods.render(doc))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Parse one [[patJson]]/[[aggJson]] value back — shared by
    * [[loadRegistry]] and the advisor's offline workload capture
    * (round 14). The session parses ExprPat measures back from their
    * SQL. */
  private[plans] def patFromJson(spark: SparkSession,
                                 j: org.json4s.JValue): SrcPat = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    (j \ "kind").extract[String] match {
      case "col" => ColRef((j \ "name").extract[String])
      case "oneMinusProduct" =>
        OneMinusProduct((j \ "a").extract[String], (j \ "b").extract[String])
      case "expr" => ExprPat(
        spark.sessionState.sqlParser.parseExpression((j \ "sql").extract[String]))
      case k => throw new IllegalArgumentException(s"unknown pattern kind $k")
    }
  }

  private[plans] def aggFromJson(spark: SparkSession,
                                 j: org.json4s.JValue): AggMap = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    def pat(v: JValue): SrcPat = patFromJson(spark, v)
    // r15 widened the sketch/set members to SrcPat sources (the -If
    // combinator family); a pre-r15 catalog's bare "col" field loads
    // as the degenerate ColRef
    def patOrLegacyCol(j: JValue): SrcPat = (j \ "pat") match {
      case JNothing => ColRef((j \ "col").extract[String])
      case v => pat(v)
    }
    (j \ "kind").extract[String] match {
      case "sum" => SumOf(pat(j \ "pat"), (j \ "partial").extract[String])
      case "count" => CountStarTo((j \ "partial").extract[String])
      case "countOf" => CountOf(pat(j \ "pat"), (j \ "partial").extract[String])
      case "min" => MinOf((j \ "col").extract[String], (j \ "partial").extract[String])
      case "max" => MaxOf((j \ "col").extract[String], (j \ "partial").extract[String])
      case "avg" => AvgOf((j \ "col").extract[String],
        (j \ "sumPartial").extract[String], (j \ "cntPartial").extract[String])
      case "hllUniq" =>
        HllUniqOf(patOrLegacyCol(j),
          (j \ "partial").extract[String], (j \ "lgK").extract[Int])
      case "kllQuantile" => KllQuantileOf(patOrLegacyCol(j),
        (j \ "partial").extract[String], (j \ "k").extract[Int])
      case "topK" => TopKOf(patOrLegacyCol(j),
        (j \ "partial").extract[String], (j \ "maxItems").extract[Int])
      case "setUniq" => SetOf(patOrLegacyCol(j),
        (j \ "partial").extract[String])
      case "uniqUpTo" => UniqUpToOf(patOrLegacyCol(j),
        (j \ "partial").extract[String], (j \ "n").extract[Int])
      case "bitmapUniq" => BitmapUniqOf(patOrLegacyCol(j),
        (j \ "partial").extract[String])
      case "thetaUniq" => ThetaUniqOf(patOrLegacyCol(j),
        (j \ "partial").extract[String], (j \ "lgK").extract[Int])
      case "groupArray" => ListOf(patOrLegacyCol(j),
        (j \ "partial").extract[String])
      case "topKWeighted" => TopKWeightedOf(pat(j \ "item"), pat(j \ "weight"),
        (j \ "partial").extract[String], (j \ "maxMapSize").extract[Int])
      case "minPat" => MinPatOf(pat(j \ "pat"), (j \ "partial").extract[String])
      case "maxPat" => MaxPatOf(pat(j \ "pat"), (j \ "partial").extract[String])
      case "deltaSum" => DeltaSumOf(pat(j \ "pat"),
        (j \ "orderCols").extract[List[String]], (j \ "partial").extract[String])
      case "maxPrefix" => MaxPrefixOf(pat(j \ "pat"),
        (j \ "orderCols").extract[List[String]], (j \ "partial").extract[String])
      case "countDistinctGrain" =>
        CountDistinctGrain((j \ "grainCol").extract[String])
      case k => throw new IllegalArgumentException(s"unknown agg kind $k")
    }
  }

  /** Load a [[saveRegistry]] document and register everything in it
    * (appending to whatever is already registered, in saved order). */
  def loadRegistry(spark: SparkSession, path: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    def agg(j: JValue): AggMap = aggFromJson(spark, j)
    val doc = JsonMethods.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
    val singles = (doc \ "singles").children.map { j =>
      Spec((j \ "sourceSuffix").extract[String], (j \ "rollupPath").extract[String],
        (j \ "grain").extract[String], (j \ "timeCol").extract[String],
        (j \ "keyCols").extract[Map[String, String]],
        (j \ "aggs").children.map(agg),
        (j \ "truncatedToWindowUs").extractOpt[Long])
    }
    val joins = (doc \ "joins").children.map { j =>
      JoinSpec((j \ "rollupPath").extract[String],
        (j \ "tables").extract[List[String]].toSet,
        (j \ "joinKeys").extract[List[List[String]]]
          .map { case List(a, b) => (a, b) }.toSet,
        (j \ "groupings").extract[Map[String, String]],
        (j \ "aggs").children.map(agg),
        (j \ "grainCols").extract[Map[String, String]],
        (j \ "coverage").extractOpt[String],
        (j \ "timeGroupings").children.map { t =>
          TimeGrainPat((t \ "grain").extract[String], (t \ "col").extract[String]) ->
            (t \ "rollupCol").extract[String]
        })
    }
    synchronized {
      singles.reverse.foreach(register)
      joins.reverse.foreach(registerJoin)
    }
  }

  /** Per-(path, directory-mtime) cache of each rollup's ANALYZED scan
    * plan (round 12). Without it, every Aggregate visit × every
    * candidate spec re-ran `spark.read.parquet` — file listing +
    * schema inference — INSIDE an optimizer rule that runs to a fixed
    * point, so planning latency grew O(specs × aggregates × listing):
    * invisible at 4 registered specs, a scale-killer at a 100-MV
    * deployment. The directory mtime keys invalidation — every writer
    * here creates/removes files in the rollup dir (parquet overwrite,
    * partial appends, the sidecar's ATOMIC_MOVE), each of which
    * updates it — so a rebuilt rollup misses the cache and re-lists.
    * The coverage SIDECAR is deliberately NOT cached: it is the
    * hybrid read's commit point and is re-read fresh on every rewrite
    * ([[RuleImpl.coveredUpTo]]). Each cache hit is handed out via
    * `MultiInstanceRelation.newInstance()` so every use gets fresh
    * ExprIds — exactly what a fresh read produced before. */
  /** Keyed by (session, path, mtime): an analyzed relation holds its
    * session's state, so a cached plan must never outlive its session
    * into a new one (single-session deployments never notice; the
    * guard costs one string compare). */
  private[plans] val planCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Long), LogicalPlan]
  /** Actual listing+inference reads performed (cache misses); the
    * RollupRoutingSpec planning-cost case asserts one per distinct
    * path per rollup state, not one per optimizer visit. */
  @volatile private[graft] var planListings: Long = 0L

  class RuleImpl(spark: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

    /** The exact shape every decimal partial is built from
      * ([[graft.ops.Fns.dsumPartial]]): `cast(<source expr> as
      * decimal(38,6))` with `inner` matching the source expression.
      * Routing a SUM requires this exact cast — the partial column IS
      * `sum(cast(expr as decimal(38,6)))` per group, so only that
      * aggregate re-aggregates bit-identically (a bare double sum has
      * different type and rounding; a different-precision cast is a
      * different number). */
    private def isExactPartialCast(e: Expression,
                                   inner: Expression => Boolean): Boolean = e match {
      case Cast(x, dt: org.apache.spark.sql.types.DecimalType, _, _) =>
        dt.precision == 38 && dt.scale == 6 && inner(x)
      // the optimizer pushes the exact cast INTO conditional branches
      // (`sum(cast(CASE … END as dec))` → `sum(CASE … cast(v) …
      // END)`, PushFoldableIntoBranches/SimplifyCasts) — value-equal
      // because a cast distributes over branches and NULL stays NULL,
      // so unwrap each branch's dec(38,6) cast and match the CASE the
      // measure registered (round 14, the -If members' spelling)
      case cw @ CaseWhen(branches, elseV)
          if branches.nonEmpty && branches.forall {
               case (_, Cast(_, dt: org.apache.spark.sql.types.DecimalType, _, _)) =>
                 dt.precision == 38 && dt.scale == 6
               case _ => false
             } && elseV.forall {
               case Cast(_, dt: org.apache.spark.sql.types.DecimalType, _, _) =>
                 dt.precision == 38 && dt.scale == 6
               case Literal(null, _) => true
               case _ => false
             } =>
        def unwrap(x: Expression): Expression = x match {
          case Cast(c, _, _, _) => c
          case Literal(null, _) => Literal(null, org.apache.spark.sql.types.NullType)
          case other => other
        }
        inner(CaseWhen(branches.map { case (c, v) => (c, unwrap(v)) },
                       elseV.map(unwrap)))
      case _ => false
    }

    /** Substitute attributes through the Project chain below the
      * aggregate: by the time optimizer rules run, grouping expressions
      * have been pulled out into `_groupingexpression` project aliases
      * (PullOutGroupingExpressions) and `to_date` has been lowered to a
      * cast — resolve back to source-column terms before matching. */
    private def resolveThroughProjects(e: Expression, plan: LogicalPlan): Expression = {
      val aliasMap: Map[ExprId, Expression] = plan.collect {
        case p: Project =>
          p.projectList.collect { case a @ Alias(child, _) => a.exprId -> child }
      }.flatten.toMap
      def subst(x: Expression): Expression = x.transformUp {
        case a: AttributeReference if aliasMap.contains(a.exprId) => subst(aliasMap(a.exprId))
      }
      subst(e)
    }

    // isNormTime lives on the companion (shared with TimeGrainPat).
    private def isNormTime(e: Expression, timeCol: String): Boolean =
      RollupRouting.isNormTime(e, timeCol)

    /** Which rollup key a grouping expression computes, if any: a
      * registered non-time key column (returned under its SOURCE
      * name), or one of the time-grain keys `"day"`/`"hour"`. A grain
      * key maps onto a rollup at the SAME grain directly, or derives
      * from a FINER-grain rollup's key (to_date(hour) ≡ to_date(ts)
      * because hour = date_trunc('hour', ts) — roll-up matching). A
      * DATE-typed time column IS the day grain (its bare reference). */
    private def keyOf(e: Expression, spec: Spec): Option[String] = e match {
      case a: AttributeReference if spec.keyCols.contains(a.name) => Some(a.name)
      case a: AttributeReference
          if a.name == spec.timeCol && a.dataType == DateType => Some("day")
      case Cast(c, DateType, _, _) if isNormTime(c, spec.timeCol) => Some("day")
      case TruncTimestamp(Literal(fmt, _), c, _)
          if fmt != null && fmt.toString.equalsIgnoreCase("hour") &&
             isNormTime(c, spec.timeCol) =>
        Some("hour")
      case _ => None
    }

    /** The rollup's analyzed scan, via the companion's per-(path,
      * dir-mtime) cache — one file listing + schema inference per
      * rollup state, however many optimizer visits and candidate specs
      * probe it. Every hand-out goes through `newInstance()` for fresh
      * output ExprIds (two routed subtrees in one query must not share
      * attribute ids — a fresh read never did). */
    private def analyzedRollup(path: String): Option[LogicalPlan] = {
      val mtime = new java.io.File(path).lastModified // 0 when missing
      if (mtime == 0L) return None
      val key = (System.identityHashCode(spark).toString, path, mtime)
      planCache.get(key).orElse {
        val read = try Some(spark.read.parquet(path).queryExecution.analyzed)
                   catch { case scala.util.control.NonFatal(_) => None }
        read.foreach { p =>
          RollupRouting.planListings += 1
          // drop stale states of the same path so the cache stays
          // bounded by the registry size, not its rebuild history
          planCache.filterInPlace { case ((_, pth, mt), _) => pth != path || mt == mtime }
          planCache.put(key, p)
        }
        read
      }.map {
        case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
          m.newInstance().asInstanceOf[LogicalPlan]
        case other => other
      }
    }

    /** All registered rollups over the scanned source. Order is not
      * the cost choice ([[apply]] ranks every successful rewrite by
      * grain then size); the sort only keeps tie-breaks stable. */
    private def specsOf(plan: LogicalPlan): Seq[Spec] = {
      val matching = plan.collect {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          specs.filter(s => fs.location.rootPaths.exists(_.toString.endsWith(s.sourceSuffix)))
      }.flatten
      matching.distinct.sortBy(s => Spec.grainRank(s.grain))
    }

    /** A candidate rollup's on-disk footprint, from the plan cache's
      * analyzed scan (the relation computed its size during listing —
      * no extra I/O here). Unreadable ⇒ max cost, so a competing
      * readable rollup always wins. */
    private def rollupSizeBytes(path: String): BigInt =
      analyzedRollup(path).map(_.stats.sizeInBytes)
        .getOrElse(BigInt(Long.MaxValue))

    /** Idempotency guards: extraOptimizations run to a FIXED POINT, so
      * the rule re-visits its own output. A routed aggregate's child
      * contains a registered rollup scan ([[alreadyRouted]]), and the
      * hybrid tail it plants is itself an Aggregate over the raw scan
      * whose output is the partial block ([[isPartialBlock]]) — both
      * must be left alone or the plan grows a union level per
      * iteration until the optimizer's iteration cap. */
    private def alreadyRouted(plan: LogicalPlan): Boolean = plan.exists {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        specs.exists(s => fs.location.rootPaths.exists(_.toString.endsWith(s.rollupPath)))
      case _ => false
    }
    private def isPartialBlock(aggExprs: Seq[NamedExpression]): Boolean = {
      // BOTH registries' partial names (round 12): the join-path
      // hybrid tail is an Aggregate over the raw join whose output is
      // the spec's partial block — without the join names here, a
      // covered spec whose tail groups only by preserved groupings
      // would be re-routed on the next fixed-point pass, growing a
      // union level per iteration
      val partials = (specs.flatMap(_.aggs.flatMap(partialName)) ++
        joinSpecs.flatMap(_.aggs.flatMap(partialName))).toSet
      aggExprs.exists(ne => partials.contains(ne.name))
    }

    /** r19 (the r18 verdict's #3) — the TRUNCATED-member contract,
      * machine-checked: a spec with [[Spec.truncatedToWindowUs]] holds
      * list states whose step −1 rows beyond the declared window of
      * every step-0 anchor were DROPPED at build time
      * ([[graft.ops.Behavior.truncatedFunnelAllPartials]]'s keep-rule).
      * Such states are value-identical only for readers that cannot
      * observe the dropped rows, so before a truncated spec may compete
      * for an Aggregate, EVERY consumer of the aggregate's
      * collected-list outputs anywhere in the root plan must be on the
      * truncation-invariant whitelist:
      *  - [[graft.expr.FunnelLevel]] — under `strict_order` (the ONE
      *    mode that reads step −1 rows, and then only inside the
      *    anchor's window) its `windowMicros` must be ≤ the declared
      *    truncation window; every other mode (base, strict_dedup,
      *    relaxed increase, max-anchors) skips non-step rows entirely
      *    and is invariant at any window;
      *  - [[graft.expr.FunnelCount]] and
      *    [[graft.expr.SequenceMatchPattern]] — their conditions are
      *    step ≥ 0 by the pattern grammar, dropped rows are invisible;
      *  - the cohort filter `exists(seq, x -> x.step >= 0)` —
      *    truncation never drops a step event;
      *  - a bare pass-through Alias (its output is traced
      *    transitively).
      * ANY other reference — a sequenceNextNode adjacency scan
      * (`filter(sequence(...))`/`element_at`, whose answer can cross
      * an arbitrary gap), `size(seq)`, a raw export — refuses the
      * spec and the read falls back to raw or to a registered
      * UNTRUNCATED directory. Negative-path spec: BehaviorSpec
      * "truncated states refuse an unwindowed read". */
    private def truncationSafe(root: LogicalPlan, agg: Aggregate,
                               spec: Spec): Boolean =
      spec.truncatedToWindowUs.forall { w =>
        // the aggregate outputs that carry a collected list state
        var tracked: Set[ExprId] = agg.aggregateExpressions.collect {
          case a: Alias if a.exists {
            case _: CollectList => true; case _ => false } => a.exprId
        }.toSet
        // a truncated directory serves ONLY whitelisted list reads: an
        // aggregate with no collect at all (a count(*) dashboard —
        // whose c_p counted KEPT rows, not the fact's) must refuse too,
        // not sail through with nothing tracked
        if (tracked.isEmpty) false
        else {
          // propagate through pass-through aliases to a fixpoint so a
          // `select(col("seq"))` re-projection cannot launder a
          // tracked sequence into an untracked name
          var changed = true
          while (changed) {
            changed = false
            root.foreach(_.expressions.foreach(_.foreach {
              case al: Alias => al.child match {
                case ar: AttributeReference
                    if tracked(ar.exprId) && !tracked(al.exprId) =>
                  tracked += al.exprId; changed = true
                case _ => ()
              }
              case _ => ()
            }))
          }
          def isCohortFilter(e: Expression): Boolean = e match {
            case ArrayExists(ar: AttributeReference,
                LambdaFunction(
                  GreaterThanOrEqual(g: GetStructField, Literal(0, IntegerType)),
                  _, _), _) if tracked(ar.exprId) =>
              g.extractFieldName == "step"
            case _ => false
          }
          def safe(e: Expression): Boolean = e match {
            case fl: graft.expr.FunnelLevel =>
              !fl.strictOrder || fl.windowMicros <= w
            case _: graft.expr.FunnelCount => true
            case _: graft.expr.SequenceMatchPattern => true
            case ae: ArrayExists if isCohortFilter(ae) => true
            case al: Alias => al.child match {
              case _: AttributeReference => true // pass-through, traced above
              case c => safe(c)
            }
            case ar: AttributeReference => !tracked(ar.exprId)
            case other => other.children.forall(safe)
          }
          // a tracked sequence ESCAPING as a plan output is a raw
          // export of (possibly truncated) state — refuse even though
          // no expression "consumes" it
          var ok = !root.output.exists(a => tracked(a.exprId))
          root.foreach(n => ok &&= n.expressions.forall(safe))
          ok
        }
      }

    /** One handler tries BOTH registries (round 12): a child can
      * contain a registered single-table scan AND a Join (a table in
      * the spec registry participating in a registered join MV) — two
      * alternative match cases would let the failing single-table
      * branch shadow the join registry, silently missing a routing
      * opportunity. Single-table rewrites that fail now fall through
      * to the join specs. */
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(groupings, aggExprs, child, _)
          if (specs.nonEmpty && specsOf(child).nonEmpty) ||
             (joinSpecs.nonEmpty && child.exists(_.isInstanceOf[Join])) =>
        val viaSingle =
          if (specs.nonEmpty && specsOf(child).nonEmpty &&
              !alreadyRouted(child) && !isPartialBlock(aggExprs))
            // COST CHOICE (round 12): every candidate that CAN answer
            // competes, and the cheapest rollup wins — coarser grain
            // first (a day rollup is ~24× smaller than the hourly one
            // it subsumes), actual on-disk bytes as the tiebreaker
            // within a grain (a dedicated day-only rollup beats the
            // (day, user) one for a day-only query by the key
            // cardinality). Sizes come from the cached analyzed scan,
            // so the choice adds no I/O.
            specsOf(child)
              // r19: a truncated-directory spec competes only for
              // provably truncation-invariant consumers (see
              // truncationSafe above)
              .filter(s => truncationSafe(plan, agg, s))
              .flatMap(s => rewrite(agg, groupings, aggExprs, s)
                              .orElse(rewriteExpand(agg, groupings, aggExprs,
                                rewrite(_, _, _, s, inLattice = true)))
                              .orElse(rewriteMultiDistinct(agg, groupings,
                                aggExprs, rewrite(_, _, _, s)))
                              .map(s -> _))
              .minByOption { case (s, _) =>
                (Spec.grainRank(s.grain), rollupSizeBytes(s.rollupPath))
              }.map(_._2)
          else None
        viaSingle.orElse {
          if (joinSpecs.nonEmpty && child.exists(_.isInstanceOf[Join]) &&
              !isPartialBlock(aggExprs))
            // same cost choice on the join registry: among every join
            // MV whose core + groupings + measures match, the fewest
            // on-disk bytes answers (a segment-grain aggregate table
            // beats the per-order rollup by orders of magnitude);
            // registration order only breaks exact ties
            joinSpecs
              .flatMap(s => rewriteJoin(agg, groupings, aggExprs, s)
                              .orElse(rewriteExpand(agg, groupings, aggExprs,
                                rewriteJoin(_, _, _, s, inLattice = true)))
                              .orElse(rewriteMultiDistinct(agg, groupings,
                                aggExprs, rewriteJoin(_, _, _, s)))
                              .map(s -> _))
              .minByOption { case (s, _) => rollupSizeBytes(s.rollupPath) }
              .map(_._2)
          else None
        }
          // r19 safety net: a rewrite that came out unresolved (a
          // rebuilt tail expression the coercion above could not fix)
          // must FALL BACK to the live plan, never crash the query at
          // plan validation
          .filter(_.resolved)
          .map(pruneRewritten)
          .getOrElse(agg)
    }

    /** r19 (optimization round, guide §6/§2.3): extraOptimizations run
      * AFTER the main optimizer, so the subtrees this rule plants — the
      * rollup scan and especially the hybrid live-tail rebuilt over
      * FULL-SCHEMA base relations — never see column pruning or
      * predicate pushdown again. Measured on q171's tail before this:
      * the lineitem scan read all 11 columns (3 used) and the orders
      * broadcast hashed every row with the coverage bound
      * `o_orderdate ≥ wm` evaluated only ABOVE the join. Re-running the
      * three standard rules on just the rewritten subtree restores
      * scan-level pruning + pushdown (PushedFilters/ReadSchema) without
      * touching the rest of the plan; every rule is Spark's own, so the
      * result is bit-identical by construction. The fixed point is tiny
      * (≤ a few iterations) — 10 is a safety bound. */
    private def pruneRewritten(p: LogicalPlan): LogicalPlan = {
      import org.apache.spark.sql.catalyst.optimizer.{
        CollapseProject, ColumnPruning, PushDownPredicates}
      var cur = p
      var i = 0
      while (i < 10) {
        val next = CollapseProject(ColumnPruning(PushDownPredicates(cur)))
        if (next.fastEquals(cur)) return cur
        cur = next
        i += 1
      }
      cur
    }

    // ——— join-derived rollups: registry-driven matching ———

    /** Strip pruning Projects, drop the IsNotNull Filters that
      * InferFiltersFromConstraints plants on inner-join keys by rule-run
      * time (row-set no-ops relative to the rollup — the build ran the
      * same inner joins, which drop null keys anyway), and COLLECT every
      * other Filter conjunct for the caller to prove lossless (predicate
      * subsumption) or abandon the rewrite. By rule-run time the
      * optimizer has pushed a dimension predicate below the join onto
      * its scan, so conjuncts are gathered from every level of the
      * tree, not just above the topmost join. */
    private def stripCollect(p: LogicalPlan, joinKeyCols: Set[String])
        : (LogicalPlan, Seq[Expression]) = p match {
      case pr: Project => stripCollect(pr.child, joinKeyCols)
      case f: Filter =>
        val (core, below) = stripCollect(f.child, joinKeyCols)
        val kept = splitConjunctivePredicates(f.condition).filterNot {
          case IsNotNull(a: AttributeReference) => joinKeyCols.contains(a.name)
          case _ => false
        }
        (core, kept ++ below)
      case other => (other, Nil)
    }

    private def baseTableName(stripped: LogicalPlan, tables: Set[String])
        : Option[(String, LogicalRelation)] =
      stripped match {
        case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location.rootPaths.map(_.toString).collectFirst {
            Function.unlift { rp: String =>
              tables.find(t => rp.endsWith(s"$t.parquet"))
            }
          }.map(_ -> lr)
        case _ => None
      }

    /** Flatten an inner-join tree to its base-table scans +
      * equi-conditions + the residual filter conjuncts found anywhere
      * in the tree; None as soon as anything but Project/Filter/
      * Inner-Join over the spec's expected scans appears. The scans
      * come back by name so the hybrid path can rebuild a live tail
      * join over the query's own relations. */
    private def flattenJoin(p: LogicalPlan, spec: JoinSpec)
        : Option[(Map[String, LogicalRelation], Seq[Expression], Seq[Expression])] = {
      val keyCols = spec.joinKeys.flatMap(p => Set(p._1, p._2))
      val (core, kept) = stripCollect(p, keyCols)
      core match {
        case Join(l, r, Inner, Some(cond), _) =>
          for {
            (lt, lc, lf) <- flattenJoin(l, spec)
            (rt, rc, rf) <- flattenJoin(r, spec)
          } yield (lt ++ rt, lc ++ rc ++ splitConjunctivePredicates(cond),
                   kept ++ lf ++ rf)
        case other =>
          baseTableName(other, spec.tables)
            .map { case (n, lr) => (Map(n -> lr), Seq.empty[Expression], kept) }
      }
    }

    private def condPairs(conds: Seq[Expression]): Option[Set[(String, String)]] = {
      val pairs = conds.map {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          val s = Seq(a.name, b.name).sorted
          Some((s(0), s(1)))
        case _ => None
      }
      if (pairs.forall(_.isDefined)) Some(pairs.flatten.toSet) else None
    }

    /** Answering-queries-using-views for a registered join MV: an
      * Aggregate whose join core matches `spec` exactly, whose groupings
      * are preserved columns (or global — both grains re-aggregate
      * losslessly), whose every aggregate has a mapping in `spec.aggs`,
      * and whose residual filters are all subsumable (references ⊆
      * preserved grouping columns), is rewritten onto the rollup scan
      * with the filters re-applied above it. Anything else — extra
      * tables, non-subsumable filters, unmapped aggregates or
      * groupings — leaves the plan untouched. Output ExprIds are
      * preserved so parent sorts/limits/projects re-bind. */
    private def rewriteJoin(agg: Aggregate, groupings: Seq[Expression],
                            aggExprs: Seq[NamedExpression],
                            spec: JoinSpec,
                            inLattice: Boolean = false): Option[LogicalPlan] = {
      val (scans, residualFilters): (Map[String, LogicalRelation], Seq[Expression]) =
        flattenJoin(agg.child, spec) match {
          case Some((tables, conds, filters))
              if tables.keySet == spec.tables &&
                 condPairs(conds).contains(spec.joinKeys) => (tables, filters)
          case _ => return None
        }
      val rollup = analyzedRollup(spec.rollupPath).getOrElse(return None)
      def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
      val child = agg.child
      def resolved(e: Expression): Expression = resolveThroughProjects(e, child)
      // PREDICATE SUBSUMPTION across the join: a conjunct whose every
      // reference is group-constant against the rollup — a preserved
      // grouping column, a grain column, or a join-key alias of either
      // (spec.filterCols; the optimizer propagates predicates across
      // inner equi-join keys, so both spellings arrive here) — commutes
      // with the partial aggregation and re-applies losslessly above
      // the rollup scan. Any reference outside that set (a fact-side
      // measure, an unpreserved dim attribute) keeps the whole query
      // on the live join. NONDETERMINISTIC conjuncts never commute —
      // rand() < 0.5 has no references, so it would pass the subset
      // check and then filter pre-aggregated GROUPS instead of raw
      // rows — so they keep the query live too (round-12 guard).
      // Registered time-truncation group keys (round 12): a query
      // subtree that IS a registered truncation of the time column —
      // or a coarser derivation of it (day/month/… over an hourly
      // key) — substitutes to the rollup column carrying that value.
      val rollupIds = AttributeSet(rollup.output)
      def substTime(e: Expression): Option[Expression] =
        spec.timeGroupings.view.flatMap { case (p, rc) =>
          attr(rc).flatMap(a => p.subst(e, a))
        }.headOption
      // whole-grain bounds on the RAW time column subsume onto the
      // truncated key (the optimizer rewrites `to_date(ts) >= d` into
      // `ts >= midnight` and pushes it to the scan — the same shapes
      // the single-table subsumeConjunct proves lossless: a grain-g
      // group's rows all lie in [g, g+grain), so an aligned boundary
      // cut never splits a group; the inclusive-upper dashboard bound
      // `ts <= boundary − 1µs` is the same half-open cut)
      def substTimeBound(e: Expression): Option[Expression] =
        spec.timeGroupings.view.flatMap { case (p, rc) =>
          attr(rc).map { a =>
            val g = p.micros
            def keyLit(us: Long): Expression =
              if (p.grain == "day") Literal((us / 86400000000L).toInt, DateType)
              else Literal(us, TimestampType)
            object Bound {
              def unapply(x: Expression): Option[Long] = x match {
                case Literal(us: Long, TimestampType | TimestampNTZType)
                    if us % g == 0 => Some(us)
                case _ => None
              }
            }
            object InclUpper {
              def unapply(x: Expression): Option[Long] = x match {
                case Literal(us: Long, TimestampType | TimestampNTZType)
                    if (us + 1) % g == 0 => Some(us + 1)
                case _ => None
              }
            }
            def isT(t: Expression): Boolean = isNormTime(t, p.col)
            e match {
              case IsNotNull(t) if isT(t) => Some(IsNotNull(a))
              case GreaterThanOrEqual(t, Bound(us)) if isT(t) =>
                Some(GreaterThanOrEqual(a, keyLit(us)))
              case LessThan(t, Bound(us)) if isT(t) => Some(LessThan(a, keyLit(us)))
              case LessThanOrEqual(Bound(us), t) if isT(t) =>
                Some(GreaterThanOrEqual(a, keyLit(us)))
              case GreaterThan(Bound(us), t) if isT(t) => Some(LessThan(a, keyLit(us)))
              case LessThanOrEqual(t, InclUpper(us)) if isT(t) =>
                Some(LessThan(a, keyLit(us)))
              case GreaterThanOrEqual(InclUpper(us), t) if isT(t) =>
                Some(LessThan(a, keyLit(us)))
              case _ => None
            }
          }
        }.flatten.headOption
      /** Rewrite an expression onto the rollup's columns: registered
        * truncations substitute whole subtrees (top-down, so the
        * replacement's own rollup attribute is not re-visited), then
        * every remaining source attribute must map through
        * `spec.filterCols`; anything unmapped fails. */
      def mapToRollup(e: Expression): Option[Expression] = {
        var ok = true
        val mapped = e.transformDown {
          case sub if substTimeBound(sub).isDefined => substTimeBound(sub).get
          case sub if substTime(sub).isDefined => substTime(sub).get
          case a: AttributeReference if !rollupIds.contains(a) =>
            spec.filterCols.get(a.name).flatMap(attr).getOrElse { ok = false; a }
        }
        if (ok && mapped.references.subsetOf(rollupIds)) Some(mapped) else None
      }
      val routedFilters: Seq[Expression] = residualFilters.map { c =>
        if (!c.deterministic) return None
        mapToRollup(resolved(c)).getOrElse(return None)
      }
      /** A grouping expression the rollup preserves → the SAME
        * expression over the rollup's columns (round 12). The
        * preserved groupings and grain columns are the rollup's own
        * group keys — per-row constants of the rollup — so any
        * DETERMINISTIC expression over them (a bare column, `to_date`
        * of the order timestamp, `year(...)`, a shifted date, a
        * join-key alias via the equivalence closure) partitions
        * rollup rows exactly as it partitions raw rows, and grouping
        * by it re-aggregates losslessly. A reference outside the
        * preserved set (a fact measure, an unpreserved dim column),
        * nondeterminism, or a reference-free expression keeps the
        * query live. */
      def groupingExpr(e: Expression): Option[Expression] = {
        val r = resolved(e)
        if (!r.deterministic || r.references.isEmpty ||
            r.exists(_.isInstanceOf[AggregateExpression])) return None
        mapToRollup(r)
      }
      val keyMap: Map[Expression, Expression] = groupings.map { g =>
        groupingExpr(g) match {
          case Some(target) => g -> target
          case None => return None
        }
      }.toMap
      def isBareRefJ(se: Expression, name: String): Boolean =
        resolved(se) match {
          case a: AttributeReference => a.name == name
          case _ => false
        }
      def mapAgg(ae: AggregateExpression): Option[Expression] =
        spec.aggs.view.flatMap { m =>
          (m, ae.aggregateFunction) match {
            // the Sum's child must be the EXACT dsum shape the partial
            // was built from — `cast(expr as decimal(38,6))` — not any
            // cast chain: a bare double sum routed onto decimal
            // partials would change the result type and its rounding
            // under a preserved ExprId (round-11 tightening, caught by
            // the routing PropertySpec)
            case (SumOf(pat, partial), Sum(se, _))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   isExactPartialCast(resolved(se), pat.matchesOrdered) =>
              attr(partial).map(p => ae.copy(aggregateFunction = Sum(p)))
            // COUNT is non-nullable and 0 on empty input; SUM of the
            // partial is nullable and null on empty — coalesce restores
            // the exact contract (schema AND the empty-group value)
            case (CountStarTo(partial), Count(children))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   children.forall(_.isInstanceOf[Literal]) =>
              attr(partial).map(p => Coalesce(Seq(
                ae.copy(aggregateFunction = Sum(p)), Literal(0L))))
            // null-skipping COUNT(expr) — the countIf member (round
            // 14): non-null counts add, so SUM of the per-group
            // partial with the same 0-on-empty coalesce
            case (CountOf(pat, partial), Count(Seq(se)))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pat.matchesOrdered(resolved(se)) =>
              attr(partial).map(p => Coalesce(Seq(
                ae.copy(aggregateFunction = Sum(p)), Literal(0L))))
            // NEVER inside a grouping-set lattice: a subtotal group
            // holds more rollup rows than distinct grain values, so
            // the row-count mapping is not subtotal-safe (the SetOf
            // mapping below is — set union)
            case (CountDistinctGrain(grain), Count(Seq(se)))
                if !inLattice &&
                   ae.isDistinct && ae.filter.isEmpty && (resolved(se) match {
                  case a: AttributeReference => a.name == grain
                  case _ => false
                }) =>
              Some(ae.copy(aggregateFunction = Count(Seq(Literal(1))),
                           isDistinct = false))
            // uniqExact / uniqExactIf (round 15): the EXACT
            // COUNT(DISTINCT expr) answered from the distinct-set
            // state — count-distinct skips NULLs exactly like the
            // collect_set that built the state, and set union is
            // subtotal-safe, so unlike the row-count mapping this one
            // also serves grouping-set lattices
            case (SetOf(pt, partial), Count(Seq(se)))
                if ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(se)) =>
              attr(partial).map { p =>
                val merged = ae.copy(aggregateFunction = CollectList(p),
                  isDistinct = false,
                  resultId = NamedExpression.newExprId)
                Cast(Size(ArrayDistinct(Flatten(merged)), false), LongType)
              }
            // uniqExact from BITMAP states (round 15) — see the
            // single-table twin: exact, OR-union mergeable, the scale
            // member for integral keys
            case (BitmapUniqOf(pt, partial), Count(Seq(se)))
                if ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(se)) =>
              attr(partial).map { p =>
                val merged = ae.copy(
                  aggregateFunction = graft.expr.BitmapMergeAgg(p),
                  isDistinct = false,
                  resultId = NamedExpression.newExprId)
                graft.expr.BitmapCardinality(merged)
              }
            case (BitmapUniqOf(pt, partial), ba: graft.expr.BitmapAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(ba.child)) =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.BitmapMergeAgg(p)))
            case (ThetaUniqOf(pt, partial, k), ta: graft.expr.ThetaAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(ta.child)) && ta.lgK == k =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.ThetaUnionAgg(p, k)))
            // the weighted top-k member on the JOIN path (round 16) —
            // same two-pattern + capacity guards as the single-table
            // twin; the estimate scalar above survives untouched
            case (TopKWeightedOf(ip, wp, partial, m), tk: graft.expr.TopKWeightedAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   ip.matchesOrdered(resolved(tk.left)) &&
                   wp.matchesOrdered(resolved(tk.right)) &&
                   tk.maxMapSize == m =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.TopKWeightedMergeAgg(p, m)))
            case (ListOf(pt, partial), cl: CollectList)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(cl.child)) =>
              // sameType: the parquet roundtrip relaxes struct-field
              // nullability inside the stored element type — values
              // and ordering are unaffected, so nullability must not
              // block the rewrite (strict equality would)
              attr(partial).collect {
                case p if (p.dataType match {
                      case org.apache.spark.sql.types.ArrayType(et, _) =>
                        org.apache.spark.sql.graftx.Bridge.sameTypeIgnoreNullability(et, cl.child.dataType)
                      case _ => false
                    }) =>
                  val merged = ae.copy(
                    aggregateFunction = CollectList(p),
                    resultId = NamedExpression.newExprId)
                  Flatten(merged)
              }
            case (BitmapUniqOf(pt, partial), h: HyperLogLogPlusPlus)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(h.child)) &&
                   estimatorSubstitutionEnabled =>
              attr(partial).map { p =>
                val merged = ae.copy(
                  aggregateFunction = graft.expr.BitmapMergeAgg(p),
                  resultId = NamedExpression.newExprId)
                graft.expr.BitmapCardinality(merged)
              }
            // MIN/MAX/AVG on the join path (round 12) — the same
            // vocabulary and guards as the single-table mapAgg: bare
            // column refs for min/max, the dsum-shaped exact form for
            // avg (reproducing Average's own decimal evaluate tree
            // over sum + non-null-count partials, fresh resultIds).
            case (MinOf(cn, partial), Min(se))
                if !ae.isDistinct && ae.filter.isEmpty && isBareRefJ(se, cn) =>
              attr(partial).map(p => ae.copy(aggregateFunction = Min(p)))
            case (MaxOf(cn, partial), Max(se))
                if !ae.isDistinct && ae.filter.isEmpty && isBareRefJ(se, cn) =>
              attr(partial).map(p => ae.copy(aggregateFunction = Max(p)))
            // PATTERN extrema (round 13, the argMax/argMin shape):
            // ORDER-SENSITIVE measure match (casts retained unless
            // order-embedding — round 14) + RESULT-TYPE equality
            case (MinPatOf(pt, partial), Min(se))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(se)) =>
              attr(partial).filter(_.dataType == se.dataType)
                .map(p => ae.copy(aggregateFunction = Min(p)))
            case (MaxPatOf(pt, partial), Max(se))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(se)) =>
              attr(partial).filter(_.dataType == se.dataType)
                .map(p => ae.copy(aggregateFunction = Max(p)))
            case (AvgOf(cn, sp, cp), Average(se, mode))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   isExactPartialCast(resolved(se),
                                      x => x.isInstanceOf[AttributeReference] &&
                                           x.asInstanceOf[AttributeReference].name == cn) =>
              for (s <- attr(sp); c <- attr(cp)) yield {
                val sumAE = ae.copy(aggregateFunction = Sum(s),
                                    resultId = NamedExpression.newExprId)
                val cntAE = ae.copy(aggregateFunction = Sum(c),
                                    resultId = NamedExpression.newExprId)
                DecimalDivideWithOverflowCheck(
                  sumAE, Cast(cntAE, DecimalType(20, 0)),
                  DecimalType(38, 10), null,
                  mode != EvalMode.ANSI)
              }
            // avgIf (round 14): Average over a PATTERN measure pairs
            // the registered SumOf with the CountOf counting the SAME
            // pattern's non-null rows — exactly Average's numerator
            // and denominator, reproduced from two partial columns
            case (SumOf(pat, sp), Average(se, mode))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   isExactPartialCast(resolved(se), pat.matchesOrdered) =>
              spec.aggs.collectFirst {
                case CountOf(patC, cp) if samePattern(patC, pat) => cp
              }.flatMap { cp =>
                for (s <- attr(sp); c <- attr(cp)) yield {
                  val sumAE = ae.copy(aggregateFunction = Sum(s),
                                      resultId = NamedExpression.newExprId)
                  val cntAE = ae.copy(aggregateFunction = Sum(c),
                                      resultId = NamedExpression.newExprId)
                  DecimalDivideWithOverflowCheck(
                    sumAE, Cast(cntAE, DecimalType(20, 0)),
                    DecimalType(38, 10), null,
                    mode != EvalMode.ANSI)
                }
              }
            // the sketch members (round 12) — same guards as the
            // single-table path: bare column, EQUAL precision (a
            // different lgK/k is a different sketch)
            case (HllUniqOf(pt, partial, lgK), hs: HllSketchAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(hs.left)) && (hs.right match {
                     case Literal(k: Int, _) => k == lgK
                     case _ => false
                   }) =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = HllUnionAgg(p, Literal(false))))
            // approx_count_distinct onto the state member (round 13)
            // — same precision-dominance rule as the single-table
            // path: route only when the registered sketch's rsd
            // 1.04/√2^lgK is at or under the query's tolerance
            case (HllUniqOf(pt, partial, lgK), h: HyperLogLogPlusPlus)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(h.child)) &&
                   hllRsd(lgK) <= h.relativeSD &&
                   estimatorSubstitutionEnabled =>
              attr(partial).map { p =>
                val union = ae.copy(
                  aggregateFunction = HllUnionAgg(p, Literal(false)),
                  resultId = NamedExpression.newExprId)
                HllSketchEstimate(union)
              }
            case (KllQuantileOf(pt, partial, k), ka: graft.expr.KllDoublesAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(ka.child)) && ka.k == k =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.KllMergeAgg(p, k)))
            // percentile_approx (GK) onto the KLL state under RANK
            // dominance (round 15) — the HLL++ precedent on quantiles:
            // GK promises rank error ≤ 1/accuracy, so the state's
            // published error must fit inside the query's own
            // tolerance; same opt-out knob, scalar double form only
            // (the substituted estimate must keep the output type)
            case (KllQuantileOf(pt, partial, k), pa: ApproximatePercentile)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pa.dataType == org.apache.spark.sql.types.DoubleType &&
                   pt.matchesOrdered(resolved(pa.child)) &&
                   pa.percentageExpression.foldable &&
                   pa.accuracyExpression.foldable &&
                   estimatorSubstitutionEnabled && {
                     val acc = pa.accuracyExpression.eval() match {
                       case i: Int => i.toDouble
                       case l: Long => l.toDouble
                       case _ => Double.MaxValue
                     }
                     kllRankError(k) <= 1.0 / acc
                   } =>
              attr(partial).flatMap { p =>
                pa.percentageExpression.eval() match {
                  case d: Double =>
                    val merged = ae.copy(
                      aggregateFunction = graft.expr.KllMergeAgg(p, k),
                      resultId = NamedExpression.newExprId)
                    Some(graft.expr.KllQuantileEst(merged, d))
                  case _ => None // array percentages stay live
                }
              }
            // topKIf (r15 pattern members): the ESTIMATE's item type is
            // the sketch's — a widening the order-embedding strip
            // tolerates on the tree would CHANGE the routed output's
            // element type under a preserved ExprId, so the rewrite
            // additionally requires type equality of the items
            case (TopKOf(pt, partial, m), t: ApproxTopK)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(t.expr)) && t.k.foldable &&
                   (t.maxItemsTracked match {
                     case Literal(i: Int, _) => i == m
                     case _ => false
                   }) =>
              attr(partial).flatMap { p =>
                val combined = ae.copy(
                  aggregateFunction = ApproxTopKCombine(p, Literal(m)),
                  resultId = NamedExpression.newExprId)
                val est = ApproxTopKEstimate(combined, t.k)
                val same = try est.dataType == ae.dataType
                  catch { case scala.util.control.NonFatal(_) => false }
                if (same) Some(est) else None
              }
            // distinct-set member (round 13): groupUniqArrayMerge —
            // union of per-group set partials, set-equal to the
            // single-pass collect_set (order unspecified on BOTH
            // plans; see SetOf). Same element-type guard as topK: the
            // routed array's element type is the partial's.
            case (SetOf(pt, partial), cs: CollectSet)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolved(cs.child)) =>
              attr(partial).collect {
                case p if (p.dataType match {
                      case org.apache.spark.sql.types.ArrayType(et, _) =>
                        et == cs.child.dataType
                      case _ => false
                    }) =>
                  val merged = ae.copy(
                    aggregateFunction = CollectList(p),
                    resultId = NamedExpression.newExprId)
                  ArrayDistinct(Flatten(merged))
              }
            case _ => None
          }
        }.headOption
      // uniqUpTo (round 13): the whole `least(count(DISTINCT col), n+1)`
      // OUTPUT maps onto the capped-set partial — the distinct
      // aggregate alone is not mergeable; only the capped form is
      // (see [[UniqUpToOf]]), so the match lives at the expression
      // level where the limit literal is visible
      def mapUpTo(l: Least): Option[Expression] = l.children match {
        case Seq(ae: AggregateExpression, limE)
            if limE.foldable && limE.dataType == LongType =>
          val lim = limE.eval().asInstanceOf[Long]
          (ae.aggregateFunction, ae.isDistinct, ae.filter) match {
            case (Count(Seq(se)), true, None) =>
              spec.aggs.view.flatMap {
                case UniqUpToOf(pt, partial, n)
                    if lim == n + 1 && pt.matchesOrdered(resolved(se)) =>
                  attr(partial).map { p =>
                    val merged = ae.copy(aggregateFunction = CollectList(p),
                      isDistinct = false,
                      resultId = NamedExpression.newExprId)
                    Least(Seq(
                      Cast(Size(ArrayDistinct(Flatten(merged)), false), LongType),
                      Literal((n + 1).toLong)))
                  }
                case _ => None
              }.headOption
            case _ => None
          }
        case _ => None
      }
      var ok = true
      val newAggExprs: Seq[NamedExpression] = aggExprs.map {
        case ne if groupingExpr(ne match { case Alias(c, _) => c; case x => x }).isDefined =>
          val target = groupingExpr(ne match { case Alias(c, _) => c; case x => x }).get
          Alias(target, ne.name)(exprId = ne.exprId)
        case ne =>
          val rewritten = ne.transformUp {
            case l: Least => mapUpTo(l).getOrElse(l)
            case ae: AggregateExpression => mapAgg(ae).getOrElse(ae)
          }.asInstanceOf[NamedExpression]
          if (!rewritten.references.subsetOf(AttributeSet(rollup.output))) ok = false
          rewritten
      }
      if (!ok) return None
      // HYBRID on the JOIN path (round 12): a join rollup stamped with
      // a coverage watermark is STALE — it must never answer alone.
      // With a declared coverage column (preserved per rollup row) the
      // read becomes rollup rows where coverage < watermark ∪ a live
      // re-join of the query's own scans where coverage ≥ watermark,
      // each pre-aggregated to the partial block — mergeability does
      // the rest, exactly as on the single-table path, and the
      // coverage filter on the rollup side is the COMMIT POINT that
      // hides appended-but-uncommitted partials. Without a coverage
      // column (or with an unreadable sidecar) the query stays live.
      val newChild: LogicalPlan = coveredUpToPath(spec.rollupPath) match {
        case None => return None // unreadable sidecar: never answer from it
        case Some(None) =>
          routedFilters.reduceOption(And).map(Filter(_, rollup)).getOrElse(rollup)
        case Some(Some(wm)) =>
          val covSrc = spec.coverage.getOrElse(return None)
          // coverage on a registered time truncation (by its ROLLUP
          // column name): the watermark must be aligned to the
          // pattern's grain, or the boundary bucket would split
          // between the rollup and the live tail
          val covAttr = spec.filterCols.get(covSrc).flatMap(attr)
            .orElse(spec.timeGroupings.collectFirst {
              case (p, rc) if rc == covSrc && wm % p.micros == 0 => attr(rc)
            }.flatten)
            .getOrElse(return None)
          val wmLit = coverageLit(covAttr.dataType, wm).getOrElse(return None)
          val rollupSide =
            Filter((LessThan(covAttr, wmLit) +: routedFilters).reduce(And), rollup)
          hybridJoinTail(spec, scans, residualFilters.map(resolved), covSrc, wm,
                         rollup) match {
            case Some(tail) => Union(Seq(rollupSide, tail))
            case None => return None
          }
      }
      Some(Aggregate(groupings.map(keyMap), newAggExprs, newChild))
    }

    /** The coverage watermark as a literal of the coverage column's own
      * type. A DATE column can only express whole-day boundaries — a
      * finer watermark would split a day between the two sides, so the
      * rewrite refuses it. A TIMESTAMP_NTZ column holds the same
      * micros value the writer measured (the session is pinned to UTC,
      * so `unix_micros(cast(ntz as timestamp))` is the NTZ's own
      * micros — the loader-contract convention all graft time columns
      * follow). */
    private def coverageLit(dt: org.apache.spark.sql.types.DataType,
                            wm: Long): Option[Expression] = dt match {
      case DateType =>
        if (wm % MicrosPerDay != 0) None
        else Some(Literal((wm / MicrosPerDay).toInt, DateType))
      case TimestampType => Some(Literal(wm, TimestampType))
      case TimestampNTZType => Some(Literal(wm, TimestampNTZType))
      case _ => None
    }

    /** The live-tail side of a hybrid JOIN read: rebuild the spec's
      * inner-join tree over the query's own scan relations (full-schema
      * LogicalRelations, so the coverage and measure columns are
      * present even when the query's projects pruned them), filter to
      * coverage ≥ watermark plus the query's residual conjuncts (raw
      * form — both sides must see the same predicate), and
      * pre-aggregate to the spec's partial block, column-aligned with
      * the rollup so the Union merges under the final aggregate. */
    private def hybridJoinTail(spec: JoinSpec, scans: Map[String, LogicalRelation],
                               residualsRaw: Seq[Expression], covSrc: String,
                               wm: Long, rollup: LogicalPlan): Option[LogicalPlan] = {
      def attrOf(n: String): Option[Attribute] =
        scans.values.view.flatMap(_.output).find(_.name == n)
      def ownerOf(n: String): Option[String] =
        scans.collectFirst { case (t, lr) if lr.output.exists(_.name == n) => t }
      // left-deep rebuild along the spec's key pairs (greedy
      // connectivity — the spec's registration already proved the
      // pairs connect the table set); leftover pairs (cycles) re-apply
      // as filters
      var joined = Set(spec.tables.head)
      var tree: LogicalPlan = scans(spec.tables.head)
      var pairs = spec.joinKeys
      while (joined != spec.tables) {
        val step = pairs.collectFirst(Function.unlift { p: (String, String) =>
          val (a, b) = p
          (ownerOf(a), ownerOf(b)) match {
            case (Some(oa), Some(ob)) if joined.contains(oa) && !joined.contains(ob) =>
              Some((a, b, ob, p))
            case (Some(oa), Some(ob)) if joined.contains(ob) && !joined.contains(oa) =>
              Some((b, a, oa, p))
            case _ => None
          }
        }).getOrElse(return None)
        val (lhs, rhs, t, used) = step
        val cond = EqualTo(attrOf(lhs).getOrElse(return None),
                           attrOf(rhs).getOrElse(return None))
        tree = Join(tree, scans(t), Inner, Some(cond), JoinHint.NONE)
        joined += t
        pairs -= used
      }
      val cyclePreds = pairs.toSeq.map { case (a, b) =>
        EqualTo(attrOf(a).getOrElse(return None), attrOf(b).getOrElse(return None))
      }
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      /** A registered time truncation rebuilt over the raw scans. */
      def rebuildTime(p: TimeGrainPat): Option[Expression] = p.rebuild(attrOf, tz)
      val timeOfRollupCol: Map[String, TimeGrainPat] =
        spec.timeGroupings.map(_.swap).toMap
      // coverage is a preserved source column, or a registered time
      // truncation named by its rollup column — for the latter the
      // tail bounds the RAW time column instead of recomputing the
      // truncation: the watermark is grain-aligned (the rewrite
      // checked), so `ts >= wm ⟺ trunc(ts) >= wm` row for row, and
      // the raw bound pushes down to the tail's parquet scan
      val covExpr: Expression = attrOf(covSrc)
        .orElse(timeOfRollupCol.get(covSrc).flatMap(p => attrOf(p.col)))
        .getOrElse(return None)
      val wmLit = coverageLit(covExpr.dataType, wm).getOrElse(return None)
      val tailCond = (GreaterThanOrEqual(covExpr, wmLit) +:
        (cyclePreds ++ residualsRaw)).reduce(And)
      val srcOfRollupCol: Map[String, String] =
        (spec.groupings ++ spec.grainCols).map(_.swap)
      val groupKeys: Seq[Expression] =
        (spec.grainCols.keySet ++ spec.groupings.keySet).toSeq.sorted
          .map(n => attrOf(n).getOrElse(return None)) ++
        spec.timeGroupings.map { case (p, _) => rebuildTime(p).getOrElse(return None) }
      val aggExprs: Seq[NamedExpression] = rollup.output.map(_.name).map {
        case n if srcOfRollupCol.contains(n) =>
          Alias(attrOf(srcOfRollupCol(n)).getOrElse(return None), n)()
        case n if timeOfRollupCol.contains(n) =>
          Alias(rebuildTime(timeOfRollupCol(n)).getOrElse(return None), n)()
        case n => spec.aggs.view.flatMap {
          case SumOf(pat, p) if p == n =>
            pat.rebuild(attrOf).map(e =>
              Alias(Sum(Cast(e, DecimalType(38, 6))).toAggregateExpression(), n)())
          case CountStarTo(p) if p == n =>
            Some(Alias(Count(Seq(Literal(1))).toAggregateExpression(), n)())
          case CountOf(pat, p) if p == n => // the tail's own non-null count
            pat.rebuild(attrOf).map(e =>
              Alias(Count(Seq(e)).toAggregateExpression(), n)())
          case MinOf(cn, p) if p == n =>
            attrOf(cn).map(a => Alias(Min(a).toAggregateExpression(), n)())
          case MaxOf(cn, p) if p == n =>
            attrOf(cn).map(a => Alias(Max(a).toAggregateExpression(), n)())
          case AvgOf(cn, _, p) if p == n =>
            attrOf(cn).map(a => Alias(Count(Seq(a)).toAggregateExpression(), n)())
          case AvgOf(cn, sp, _) if sp == n =>
            attrOf(cn).map(a => Alias(
              Sum(Cast(a, DecimalType(38, 6))).toAggregateExpression(), n)())
          case HllUniqOf(pt, p, lgK) if p == n => // the tail's own sketch
            pt.rebuild(attrOf).map(e => Alias(
              HllSketchAgg(e, Literal(lgK)).toAggregateExpression(), n)())
          case KllQuantileOf(pt, p, k) if p == n =>
            pt.rebuild(attrOf).map(e => Alias(
              graft.expr.KllDoublesAgg(e, k).toAggregateExpression(), n)())
          case TopKOf(pt, p, m) if p == n =>
            pt.rebuild(attrOf).map(e => Alias(
              ApproxTopKAccumulate(e, Literal(m)).toAggregateExpression(), n)())
          case SetOf(pt, p) if p == n =>
            pt.rebuild(attrOf).map(e =>
              Alias(CollectSet(e).toAggregateExpression(), n)())
          case UniqUpToOf(pt, p, lim) if p == n =>
            pt.rebuild(attrOf).map(e => Alias(
              Slice(CollectSet(e).toAggregateExpression(),
                Literal(1), Literal(lim + 1)), n)())
          case MinPatOf(pt, p) if p == n =>
            pt.rebuild(attrOf).map(e => Alias(Min(e).toAggregateExpression(), n)())
          case MaxPatOf(pt, p) if p == n =>
            pt.rebuild(attrOf).map(e => Alias(Max(e).toAggregateExpression(), n)())
          case _ => None
        }.headOption.getOrElse(return None) // a column the tail can't rebuild
      }
      alignTailTypes(aggExprs, rollup.output)
        .map(as => Aggregate(groupKeys, as, Filter(tailCond, tree)))
    }

    // ——— single-table daily rollup, with predicate subsumption ———

    /** Collect the Filter conjuncts between the Aggregate and the scan
      * (Project/Filter shape only — anything else bails). */
    private def filterConjuncts(plan: LogicalPlan): Option[Seq[Expression]] = plan match {
      case _: LogicalRelation => Some(Nil)
      case p: Project => filterConjuncts(p.child)
      case f: Filter =>
        filterConjuncts(f.child).map(splitConjunctivePredicates(f.condition) ++ _)
      case _ => None
    }

    private val MicrosPerDay = 86400000000L
    private val MicrosPerHour = 3600000000L

    /** Rewrite one raw-side filter conjunct into an equivalent predicate
      * over the rollup's key columns — or None if it is not provably
      * lossless. Lossless forms (parameterized by the rollup's grain):
      *  - any subterm that IS a key expression at a grain the rollup
      *    can express (a registered key column; the rollup's own
      *    grain; a COARSER grain derived from it — to_date(hour) for
      *    an hourly rollup) substitutes to the rollup-side expression;
      *    if afterwards every reference is a rollup column the
      *    predicate cuts exactly along group boundaries. A FINER-grain
      *    subterm (an hour term against a daily rollup) has no
      *    rollup-side expression, so the raw time reference survives
      *    and the subset check bails. A DATE-typed time column is
      *    itself the day key, so ANY deterministic predicate over it
      *    subsumes — a date key is group-constant at day grain.
      *  - `IsNotNull(ts)` ⟺ `IsNotNull(<time key>)` (to_date and
      *    date_trunc both preserve null-ness) — the shape
      *    InferFiltersFromConstraints plants
      *  - half-open whole-GRAIN `ts` bounds (`ts >= boundary`,
      *    `ts < boundary`, and their commuted forms) ⟺ the same bound
      *    on the time key — a grain-g group's rows all lie in
      *    [g, g+grain), so a boundary cut never splits a group. For an
      *    hourly rollup any whole-hour literal qualifies (midnights
      *    included); for a daily rollup only midnights do; a mid-grain
      *    literal splits a group, and bails.
      *  - the INCLUSIVE-upper dashboard bound `ts <= boundary − 1µs`
      *    (the `BETWEEN d1 AND 'd2 23:59:59.999999'` shape) ⟺
      *    `time key < boundary` — the literal is the last instant of
      *    its grain, so the cut is the same half-open boundary. A
      *    whole-grain INCLUSIVE upper (`ts <= midnight`) keeps only
      *    one instant of the next group and bails.
      * A NONDETERMINISTIC conjunct never subsumes (round-12 guard): it
      * may carry no references at all (`rand() < 0.5`), passing the
      * subset check while filtering pre-aggregated groups instead of
      * raw rows — and on a hybrid read it would even evaluate
      * independently on each side of the union. */
    private def subsumeConjunct(c: Expression, spec: Spec,
                                timeKeyOpt: Option[Attribute],
                                keyAttrs: Map[String, Attribute],
                                grainExpr: Map[String, Expression]): Option[Expression] = {
      if (!c.deterministic) return None
      // GRAINLESS rollup (round 15): only registered key columns can
      // subsume — there is no rollup-side time expression, so any
      // time-range or time-derived conjunct leaves its raw reference
      // standing and the subset check below keeps the query live
      // (the near-miss pin: a windowed query must never read an
      // all-time rollup).
      val timeKey = timeKeyOpt.getOrElse {
        val rewrittenK = c.transformDown {
          case e if keyOf(e, spec).exists(keyAttrs.contains) =>
            keyAttrs(keyOf(e, spec).get)
        }
        return if (rewrittenK.references.subsetOf(AttributeSet(keyAttrs.values.toSeq)))
          Some(rewrittenK)
        else None
      }
      val grainMicros = if (spec.grain == "hour") MicrosPerHour else MicrosPerDay
      def timeLit(us: Long): Expression =
        if (spec.grain == "hour") Literal(us, TimestampType)
        else Literal((us / MicrosPerDay).toInt, DateType)
      // a whole-grain boundary literal, in either timestamp flavor: the
      // session pins UTC, so an NTZ literal (the shape
      // UnwrapCastInBinaryComparison leaves after pushing a comparison
      // through the loader's NTZ→TZ relabel cast) holds the same micros
      object Boundary {
        def unapply(e: Expression): Option[Long] = e match {
          case Literal(us: Long, TimestampType | TimestampNTZType)
              if us % grainMicros == 0 => Some(us)
          case _ => None
        }
      }
      // the last representable instant of a grain: us + 1µs is a
      // whole-grain boundary (returned), so `<= us` ⟺ `< boundary`
      object InclusiveUpper {
        def unapply(e: Expression): Option[Long] = e match {
          case Literal(us: Long, TimestampType | TimestampNTZType)
              if (us + 1) % grainMicros == 0 => Some(us + 1)
          case _ => None
        }
      }
      def isTs(t: Expression): Boolean = isNormTime(t, spec.timeCol)
      val rewritten = c.transformDown {
        case e if keyOf(e, spec).exists(k =>
            keyAttrs.contains(k) || grainExpr.contains(k)) =>
          keyOf(e, spec).get match {
            case k if keyAttrs.contains(k) => keyAttrs(k)
            case k => grainExpr(k)
          }
        case e if calendarTarget(e, spec, timeKey).isDefined =>
          calendarTarget(e, spec, timeKey).get
        case IsNotNull(t) if isTs(t) => IsNotNull(timeKey)
        case GreaterThanOrEqual(t, Boundary(us)) if isTs(t) =>
          GreaterThanOrEqual(timeKey, timeLit(us))
        case LessThan(t, Boundary(us)) if isTs(t) => LessThan(timeKey, timeLit(us))
        case LessThanOrEqual(Boundary(us), t) if isTs(t) =>
          GreaterThanOrEqual(timeKey, timeLit(us))
        case GreaterThan(Boundary(us), t) if isTs(t) => LessThan(timeKey, timeLit(us))
        case LessThanOrEqual(t, InclusiveUpper(us)) if isTs(t) =>
          LessThan(timeKey, timeLit(us))
        case GreaterThanOrEqual(InclusiveUpper(us), t) if isTs(t) =>
          LessThan(timeKey, timeLit(us))
      }
      if (rewritten.references.subsetOf(
            AttributeSet(timeKey +: keyAttrs.values.toSeq)))
        Some(rewritten)
      else None
    }

    /** A COARSER CALENDAR TRUNCATION of the time column, rewritten
      * over the rollup's grain key (round 12 — the single-table twin
      * of [[TimeGrainPat.subst]]'s coarser-derivation rule): calendar
      * truncations compose, `date_trunc(coarse, grain key) =
      * date_trunc(coarse, ts)` for every unit at or above the
      * rollup's grain, so a monthly/weekly/quarterly/yearly dashboard
      * re-aggregates the daily (or hourly) rollup losslessly. Field
      * extractors (`year(ts)`, `month(ts)` …) need no cases of their
      * own: the analyzer plants `Cast(ts as date)` under them, which
      * [[keyOf]] already maps to the day key, so they compose through
      * the same transform. A FINER truncation (minute against a
      * daily rollup) has no case and keeps the query live. */
    private def calendarTarget(e: Expression, spec: Spec,
                               timeKey: Attribute): Option[Expression] = {
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      def tsOfKey: Expression =
        if (timeKey.dataType == TimestampType) timeKey
        else Cast(timeKey, TimestampType, tz)
      def dateOfKey: Expression =
        if (timeKey.dataType == DateType) timeKey else Cast(timeKey, DateType, tz)
      def unit(l: Any): Option[String] = Option(l).map(_.toString.toLowerCase)
        .map { case "yyyy" | "yy" => "year"; case "mm" | "mon" => "month"
               case "dd" => "day"; case s => s }
        .filter(Set("day", "week", "month", "quarter", "year").contains)
      e match {
        case TruncTimestamp(Literal(f, _), t, tzE)
            if unit(f).isDefined && isNormTime(t, spec.timeCol) =>
          Some(TruncTimestamp(Literal(unit(f).get), tsOfKey, tzE))
        case TruncDate(t, Literal(f, _))
            if unit(f).isDefined && isNormTime(t, spec.timeCol) =>
          Some(TruncDate(dateOfKey, Literal(unit(f).get)))
        case _ => None
      }
    }

    private def rewrite(agg: Aggregate, groupings: Seq[Expression],
                        aggExprs: Seq[NamedExpression], spec: Spec,
                        inLattice: Boolean = false): Option[LogicalPlan] = {
      val rollup = analyzedRollup(spec.rollupPath).getOrElse(return None)
      def attr(n: String): Option[Attribute] = rollup.output.find(_.name == n)
      // a GRAINLESS ("all") rollup stores no time key; grained rollups
      // must expose theirs in the files
      val timeKeyOpt: Option[Attribute] =
        if (spec.grain == "all") None
        else Some(attr(if (spec.grain == "hour") "hour" else "day")
                    .getOrElse(return None))
      // every registered key column must exist in the rollup files
      val keyAttrs: Map[String, Attribute] = spec.keyCols.map { case (src, rcol) =>
        attr(rcol) match {
          case Some(a) => src -> a
          case None => return None
        }
      }
      // the rollup-side expression for each query grain this rollup can
      // answer: its own grain directly; for an hourly rollup also the
      // coarser day grain, derived (to_date(hour) ≡ to_date(ts) since
      // hour = date_trunc('hour', ts) — roll-up matching). A grain
      // absent here (finer than the rollup) cannot route — which for
      // the grainless rollup is EVERY time grain: the map is empty, so
      // any time grouping provably keeps the query live.
      val grainExpr: Map[String, Expression] = timeKeyOpt match {
        case None => Map.empty
        case Some(timeKey) if spec.grain == "hour" =>
          Map("hour" -> timeKey,
              "day" -> Cast(timeKey, DateType,
                            Some(spark.sessionState.conf.sessionLocalTimeZone)))
        case Some(timeKey) => Map("day" -> timeKey)
      }

      val child = agg.child
      def keyOfResolved(e: Expression): Option[String] =
        keyOf(resolveThroughProjects(e, child), spec)

      // every filter conjunct between aggregate and scan must be
      // provably lossless against the rollup grain — else stay live
      val resolvedConjuncts: Seq[Expression] = filterConjuncts(child) match {
        case None => return None // non-Project/Filter shape below the agg
        case Some(conjuncts) => conjuncts.map(resolveThroughProjects(_, child))
      }
      val routedFilters: Seq[Expression] = resolvedConjuncts.map { c =>
        subsumeConjunct(c, spec, timeKeyOpt, keyAttrs, grainExpr) match {
          case Some(r) => r
          case None => return None
        }
      }

      // every grouping must map onto a rollup-expressible key: a
      // registered key column, the rollup's own grain, or a coarser
      // grain derived from it; a FINER grain than the rollup (hour
      // over a daily rollup) bails
      def keyTarget(k: String): Option[Expression] =
        keyAttrs.get(k).orElse(grainExpr.get(k))
      /** GENERAL time-derived groupings (round 12): any deterministic
        * expression whose time/key subtrees all substitute — a grain
        * key, a registered key column, or a coarser calendar
        * truncation ([[calendarTarget]]) — partitions raw rows
        * exactly as it partitions rollup rows (it is a function of
        * the rollup's own group keys), so grouping by it
        * re-aggregates losslessly: `date_trunc('month', ts)`,
        * `year(ts)` (the analyzer's Cast-to-date composes through
        * the day key), `year(ts)*100+month(ts)`, a shifted date. A
        * leftover raw reference, nondeterminism, or a nested
        * aggregate keeps the query live. */
      def mapTimeExpr(g: Expression): Option[Expression] = {
        val r = resolveThroughProjects(g, child)
        if (!r.deterministic || r.references.isEmpty ||
            r.exists(_.isInstanceOf[AggregateExpression])) return None
        val mapped = r.transformDown {
          case e if keyOf(e, spec).exists(k => keyTarget(k).isDefined) =>
            keyTarget(keyOf(e, spec).get).get
          case e if timeKeyOpt.exists(tk =>
              calendarTarget(e, spec, tk).isDefined) =>
            calendarTarget(e, spec, timeKeyOpt.get).get
        }
        if (mapped.references.subsetOf(
              AttributeSet(timeKeyOpt.toSeq ++ keyAttrs.values))) Some(mapped)
        else None
      }
      val keyMap: Map[Expression, Expression] = groupings.map { g =>
        keyOfResolved(g).flatMap(keyTarget).orElse(mapTimeExpr(g)) match {
          case Some(target) => g -> target
          case None => return None
        }
      }.toMap

      // aggregate mapping is registry-driven (round 12) — the same
      // AggMap vocabulary as the join path, so a spec over any table
      // shape can register. The guards are unchanged from round 11:
      // SUM routes only for the exact dsum cast the partial was built
      // from; COUNT re-routes through coalesce(SUM(partial), 0) to
      // keep its non-nullable 0-on-empty contract; MIN/MAX only for a
      // bare column reference (a cast in between could reorder or
      // change the output type under a preserved ExprId).
      def isBareRef(se: Expression, name: String): Boolean =
        resolveThroughProjects(se, child) match {
          case a: AttributeReference => a.name == name
          case _ => false
        }
      def mapAgg(ae: AggregateExpression): Option[Expression] =
        spec.aggs.view.flatMap { m =>
          (m, ae.aggregateFunction) match {
            case (SumOf(pat, partial), Sum(se, _))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   isExactPartialCast(resolveThroughProjects(se, child),
                                      pat.matchesOrdered) =>
              attr(partial).map(p => ae.copy(aggregateFunction = Sum(p)))
            case (CountStarTo(partial), Count(children))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   children.forall(_.isInstanceOf[Literal]) =>
              attr(partial).map(p => Coalesce(Seq(
                ae.copy(aggregateFunction = Sum(p)), Literal(0L))))
            // null-skipping COUNT(expr) — the countIf member (round 14)
            case (CountOf(pat, partial), Count(Seq(se)))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pat.matchesOrdered(resolveThroughProjects(se, child)) =>
              attr(partial).map(p => Coalesce(Seq(
                ae.copy(aggregateFunction = Sum(p)), Literal(0L))))
            case (MinOf(cn, partial), Min(se))
                if !ae.isDistinct && ae.filter.isEmpty && isBareRef(se, cn) =>
              attr(partial).map(p => ae.copy(aggregateFunction = Min(p)))
            case (MaxOf(cn, partial), Max(se))
                if !ae.isDistinct && ae.filter.isEmpty && isBareRef(se, cn) =>
              attr(partial).map(p => ae.copy(aggregateFunction = Max(p)))
            // PATTERN extrema (round 13, the argMax/argMin shape) —
            // same ORDER-SENSITIVE match + result-type guard as the
            // join path (casts retained unless order-embedding, r14)
            case (MinPatOf(pt, partial), Min(se))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(se, child)) =>
              attr(partial).filter(_.dataType == se.dataType)
                .map(p => ae.copy(aggregateFunction = Min(p)))
            case (MaxPatOf(pt, partial), Max(se))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(se, child)) =>
              attr(partial).filter(_.dataType == se.dataType)
                .map(p => ae.copy(aggregateFunction = Max(p)))
            // COUNT(DISTINCT keyCol) → COUNT(keyCol) over rollup ROWS
            // (round 12, the reference's uniq() dashboard shape):
            // valid exactly when the rollup is grain-unique (the
            // registration's claim — a one-shot groupBy build; NOT a
            // partial-block append stream, whose groups span rows) AND
            // the query groups by every OTHER rollup key at exactly
            // the rollup's own grain, so rollup rows per group =
            // distinct keyCol values per group. Count of the key
            // attribute (not COUNT(*)) preserves countDistinct's
            // null-skipping.
            // NEVER inside a grouping-set lattice: a subtotal group
            // holds more rollup rows than distinct grain values (the
            // SetOf mapping below IS subtotal-safe — set union)
            case (CountDistinctGrain(gcol), Count(Seq(se)))
                if !inLattice &&
                   ae.isDistinct && ae.filter.isEmpty &&
                   isBareRef(se, gcol) && keyAttrs.contains(gcol) &&
                   keyMap.values.toSet ==
                     ((timeKeyOpt.toSet[Expression] ++ keyAttrs.values) -
                        keyAttrs(gcol)) =>
              Some(ae.copy(aggregateFunction = Count(Seq(keyAttrs(gcol))),
                           isDistinct = false))
            // uniqExact / uniqExactIf (round 15): EXACT COUNT(DISTINCT
            // expr) from the distinct-set state — null-skipping on
            // both sides, set union subtotal-safe, so this mapping
            // (unlike the row-count one above) serves lattices too
            case (SetOf(pt, partial), Count(Seq(se)))
                if ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(se, child)) =>
              attr(partial).map { p =>
                val merged = ae.copy(aggregateFunction = CollectList(p),
                  isDistinct = false,
                  resultId = NamedExpression.newExprId)
                Cast(Size(ArrayDistinct(Flatten(merged)), false), LongType)
              }
            // uniqExact from BITMAP states (round 15): the same exact
            // COUNT(DISTINCT expr), answered by OR-union of compressed
            // bitmaps instead of array merges — the scale member for
            // integral keys; subtotal-safe (set union), so lattices
            // route here too
            case (BitmapUniqOf(pt, partial), Count(Seq(se)))
                if ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(se, child)) =>
              attr(partial).map { p =>
                val merged = ae.copy(
                  aggregateFunction = graft.expr.BitmapMergeAgg(p),
                  isDistinct = false,
                  resultId = NamedExpression.newExprId)
                graft.expr.BitmapCardinality(merged)
              }
            // the explicit state read `graft_bitmap_agg(col)` (usually
            // under graft_bitmap_count) re-aggregates as the OR-union
            // of the stored states — bit-equal (canonical serialized
            // form of the identical exact set)
            case (BitmapUniqOf(pt, partial), ba: graft.expr.BitmapAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(ba.child, child)) =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.BitmapMergeAgg(p)))
            // the theta member (round 15): the explicit state read
            // re-aggregates as union at the REGISTERED lgK — states
            // are value-set deterministic, so routed ≡ live bit-equal
            case (ThetaUniqOf(pt, partial, k), ta: graft.expr.ThetaAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(ta.child, child)) &&
                   ta.lgK == k =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.ThetaUnionAgg(p, k)))
            // the LIST member (round 15, groupArrayMerge): collect_list
            // re-aggregates as flatten of per-grain list states —
            // multiset-exact, order unspecified on both plans (the
            // collect_list contract); element-type guard as SetOf
            case (ListOf(pt, partial), cl: CollectList)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(cl.child, child)) =>
              // sameType: the parquet roundtrip relaxes struct-field
              // nullability inside the stored element type — values
              // and ordering are unaffected, so nullability must not
              // block the rewrite (strict equality would). Round 16:
              // an ADVISED sequence rollup is built from the RAW scan,
              // so its stored ts labels may be the pre-loader NTZ
              // while the query reads the relabeled TimestampType —
              // value-identical under the pinned-UTC session, aligned
              // with an explicit element cast (see relabelFlatten).
              attr(partial).collect {
                case p if (p.dataType match {
                      case org.apache.spark.sql.types.ArrayType(et, _) =>
                        org.apache.spark.sql.graftx.Bridge.sameTypeIgnoreNullability(et, cl.child.dataType) ||
                          relabelOnly(et, cl.child.dataType)
                      case _ => false
                    }) =>
                  val merged = ae.copy(
                    aggregateFunction = CollectList(p),
                    resultId = NamedExpression.newExprId)
                  relabelFlatten(merged, p.dataType, cl.child.dataType)
              }
            // approx_count_distinct onto the EXACT bitmap state: a
            // zero-error answer dominates ANY requested tolerance, so
            // the substitution is always inside the approx function's
            // contract (values remain plan-dependent — same knob)
            case (BitmapUniqOf(pt, partial), h: HyperLogLogPlusPlus)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(h.child, child)) &&
                   estimatorSubstitutionEnabled =>
              attr(partial).map { p =>
                val merged = ae.copy(
                  aggregateFunction = graft.expr.BitmapMergeAgg(p),
                  resultId = NamedExpression.newExprId)
                graft.expr.BitmapCardinality(merged)
              }
            // AVG routes only in its dsum-shaped exact form —
            // avg(cast(col as decimal(38,6))) — and reproduces
            // Average's own decimal evaluate tree over the partials:
            // identical exact sum type (38,6), identical count, the
            // identical single HALF_UP division to (38,10). A bare
            // double avg stays live (not bit-reproducible from
            // decimal partials). Each re-aggregated partial gets a
            // fresh resultId: two AggregateExpressions sharing one id
            // would collide in the aggregate buffer.
            case (AvgOf(cn, sp, cp), Average(se, mode))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   isExactPartialCast(resolveThroughProjects(se, child),
                                      x => x.isInstanceOf[AttributeReference] &&
                                           x.asInstanceOf[AttributeReference].name == cn) =>
              for (s <- attr(sp); c <- attr(cp)) yield {
                val sumAE = ae.copy(aggregateFunction = Sum(s),
                                    resultId = NamedExpression.newExprId)
                val cntAE = ae.copy(aggregateFunction = Sum(c),
                                    resultId = NamedExpression.newExprId)
                DecimalDivideWithOverflowCheck(
                  sumAE, Cast(cntAE, DecimalType(20, 0)),
                  DecimalType(38, 10), null,
                  mode != EvalMode.ANSI)
              }
            // avgIf (round 14) — same pairing as the join path: the
            // SumOf and the same-pattern CountOf reproduce Average
            case (SumOf(pat, sp), Average(se, mode))
                if !ae.isDistinct && ae.filter.isEmpty &&
                   isExactPartialCast(resolveThroughProjects(se, child),
                                      pat.matchesOrdered) =>
              spec.aggs.collectFirst {
                case CountOf(patC, cp) if samePattern(patC, pat) => cp
              }.flatMap { cp =>
                for (s <- attr(sp); c <- attr(cp)) yield {
                  val sumAE = ae.copy(aggregateFunction = Sum(s),
                                      resultId = NamedExpression.newExprId)
                  val cntAE = ae.copy(aggregateFunction = Sum(c),
                                      resultId = NamedExpression.newExprId)
                  DecimalDivideWithOverflowCheck(
                    sumAE, Cast(cntAE, DecimalType(20, 0)),
                    DecimalType(38, 10), null,
                    mode != EvalMode.ANSI)
                }
              }
            // APPROX-DISTINCT via sketch state (round 12, the
            // uniqState/uniqMerge member): `hll_sketch_agg(col, lgK)`
            // re-aggregates as `hll_union_agg(partial)` — an HLL state
            // is a set-function of its inputs (coupons set-union,
            // registers max-merge), so the union of per-group partials
            // IS the single-pass sketch. Only a BARE column with the
            // registered lgK routes; a different precision or a cast
            // stays live. Both node types are BinaryType, so the
            // preserved ExprId keeps its type.
            case (HllUniqOf(pt, partial, lgK), hs: HllSketchAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(hs.left, child)) &&
                   (hs.right match {
                     case Literal(k: Int, _) => k == lgK
                     case _ => false
                   }) =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = HllUnionAgg(p, Literal(false))))
            // approx_count_distinct (HLL++) routed onto the SAME
            // state (round 13): its contract is "estimate within
            // relativeSD", and the registered sketch's error
            // 1.04/√2^lgK at or under the query's rsd keeps the
            // answer inside that contract without scanning the fact
            // — estimator substitution, the thing an approx function
            // permits by definition (values differ between sketch
            // families, so this routes only where the precision
            // dominates). States union across ANY regrouping, so
            // CUBE/ROLLUP lattices route too — where the EXACT
            // count-distinct correctly never can (subtotal rows
            // cannot re-count; that guard is unchanged).
            case (HllUniqOf(pt, partial, lgK), h: HyperLogLogPlusPlus)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(h.child, child)) &&
                   hllRsd(lgK) <= h.relativeSD &&
                   estimatorSubstitutionEnabled =>
              attr(partial).map { p =>
                val union = ae.copy(
                  aggregateFunction = HllUnionAgg(p, Literal(false)),
                  resultId = NamedExpression.newExprId)
                HllSketchEstimate(union)
              }
            // QUANTILE via KLL state (round 12, quantileState/
            // quantileMerge): same bare-column + registered-k guards;
            // percentile_approx (GK, no storable state) never matches
            case (KllQuantileOf(pt, partial, k), ka: graft.expr.KllDoublesAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(ka.child, child)) &&
                   ka.k == k =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.KllMergeAgg(p, k)))
            // percentile_approx (GK) onto the KLL state under RANK
            // dominance (round 15) — see the join-path twin's note
            case (KllQuantileOf(pt, partial, k), pa: ApproximatePercentile)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pa.dataType == org.apache.spark.sql.types.DoubleType &&
                   pt.matchesOrdered(resolveThroughProjects(pa.child, child)) &&
                   pa.percentageExpression.foldable &&
                   pa.accuracyExpression.foldable &&
                   estimatorSubstitutionEnabled && {
                     val acc = pa.accuracyExpression.eval() match {
                       case i: Int => i.toDouble
                       case l: Long => l.toDouble
                       case _ => Double.MaxValue
                     }
                     kllRankError(k) <= 1.0 / acc
                   } =>
              attr(partial).flatMap { p =>
                pa.percentageExpression.eval() match {
                  case d: Double =>
                    val merged = ae.copy(
                      aggregateFunction = graft.expr.KllMergeAgg(p, k),
                      resultId = NamedExpression.newExprId)
                    Some(graft.expr.KllQuantileEst(merged, d))
                  case _ => None // array percentages stay live
                }
              }
            // TOP-K via frequent-items state (round 12, topKState/
            // topKMerge): the query's own k is free; the registered
            // CAPACITY must match — a different maxItems is a
            // different sketch. The rewrite wraps the combine in the
            // estimate scalar (same output type as approx_top_k).
            // r15: pattern sources (topKIf); the estimate's item type
            // is the SKETCH's, so the rewrite additionally requires
            // item-type equality (a widening the tree match tolerates
            // must not change the routed output type)
            case (TopKOf(pt, partial, m), t: ApproxTopK)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(t.expr, child)) &&
                   t.k.foldable &&
                   (t.maxItemsTracked match {
                     case Literal(i: Int, _) => i == m
                     case _ => false
                   }) =>
              attr(partial).flatMap { p =>
                val combined = ae.copy(
                  aggregateFunction = ApproxTopKCombine(p, Literal(m)),
                  resultId = NamedExpression.newExprId)
                val est = ApproxTopKEstimate(combined, t.k)
                val same = try est.dataType == ae.dataType
                  catch { case scala.util.control.NonFatal(_) => false }
                if (same) Some(est) else None
              }
            // WEIGHTED TOP-K via frequent-items state (round 16,
            // topKWeightedState/topKWeightedMerge): the state read
            // `graft_topk_weighted_agg(item, w, m)` re-aggregates as
            // the weight-map sum-merge of the stored per-group states
            // — both item AND weight patterns must match the query's
            // own expressions, and the registered capacity must equal
            // the query's (a different maxMapSize is a different
            // sketch). Both nodes are BinaryType, so the preserved
            // ExprId keeps its type; the `graft_topk_weighted(st, k)`
            // estimate scalar above survives the rewrite untouched.
            case (TopKWeightedOf(ip, wp, partial, m), tk: graft.expr.TopKWeightedAgg)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   ip.matchesOrdered(resolveThroughProjects(tk.left, child)) &&
                   wp.matchesOrdered(resolveThroughProjects(tk.right, child)) &&
                   tk.maxMapSize == m =>
              attr(partial).map(p =>
                ae.copy(aggregateFunction = graft.expr.TopKWeightedMergeAgg(p, m)))
            // DISTINCT-SET via array state (round 13, the
            // groupUniqArrayState/Merge member): `collect_set(col)`
            // re-aggregates as distinct-flatten over the per-group set
            // partials — a set is a set-function of its inputs, so the
            // union IS the single-pass set (order unspecified on both
            // plans, collect_set's own contract; `size(...)` on top
            // yields the EXACT distinct count from the same state).
            // r15: pattern sources (setIf) with the element-type guard.
            case (SetOf(pt, partial), cs: CollectSet)
                if !ae.isDistinct && ae.filter.isEmpty &&
                   pt.matchesOrdered(resolveThroughProjects(cs.child, child)) =>
              attr(partial).collect {
                case p if (p.dataType match {
                      case org.apache.spark.sql.types.ArrayType(et, _) =>
                        et == cs.child.dataType
                      case _ => false
                    }) =>
                  val merged = ae.copy(
                    aggregateFunction = CollectList(p),
                    resultId = NamedExpression.newExprId)
                  ArrayDistinct(Flatten(merged))
              }
            case _ => None
          }
        }.headOption
      // uniqUpTo (round 13): the whole `least(count(DISTINCT col), n+1)`
      // OUTPUT maps onto the capped-set partial — the distinct
      // aggregate alone is not mergeable; only the capped form is
      // (see [[UniqUpToOf]]), so the match lives at the expression
      // level where the limit literal is visible
      def mapUpTo(l: Least): Option[Expression] = l.children match {
        case Seq(ae: AggregateExpression, limE)
            if limE.foldable && limE.dataType == LongType =>
          val lim = limE.eval().asInstanceOf[Long]
          (ae.aggregateFunction, ae.isDistinct, ae.filter) match {
            case (Count(Seq(se)), true, None) =>
              spec.aggs.view.flatMap {
                case UniqUpToOf(pt, partial, n)
                    if lim == n + 1 &&
                       pt.matchesOrdered(resolveThroughProjects(se, child)) =>
                  attr(partial).map { p =>
                    val merged = ae.copy(aggregateFunction = CollectList(p),
                      isDistinct = false,
                      resultId = NamedExpression.newExprId)
                    Least(Seq(
                      Cast(Size(ArrayDistinct(Flatten(merged)), false), LongType),
                      Literal((n + 1).toLong)))
                  }
                case _ => None
              }.headOption
            case _ => None
          }
        case _ => None
      }
      var ok = true
      val newAggExprs: Seq[NamedExpression] = aggExprs.map {
        case ne if keyOfResolved(ne match { case Alias(c, _) => c; case x => x }).isDefined =>
          val k = keyOfResolved(ne match { case Alias(c, _) => c; case x => x }).get
          val target = keyTarget(k).getOrElse(return None)
          Alias(target, ne.name)(exprId = ne.exprId)
        case ne if mapTimeExpr(ne match { case Alias(c, _) => c; case x => x }).isDefined =>
          Alias(mapTimeExpr(ne match { case Alias(c, _) => c; case x => x }).get,
                ne.name)(exprId = ne.exprId)
        case ne =>
          val rewritten = ne.transformUp {
            case l: Least => mapUpTo(l).getOrElse(l)
            case ae: AggregateExpression => mapAgg(ae).getOrElse(ae)
          }.asInstanceOf[NamedExpression]
          // bail if any raw-table reference survived (unknown aggregate)
          if (!rewritten.references.subsetOf(AttributeSet(rollup.output))) ok = false
          rewritten
      }
      if (!ok) return None

      // HYBRID read (round 11): a rollup stamped with a coverage
      // watermark doesn't hold the freshest rows — union its partials
      // with a live-tail partial aggregate over only ts ≥ watermark.
      // Mergeability does the rest: a group's partials may split
      // across the two sides and the final aggregate re-merges them
      // exactly (sum/count/min/max — the only aggregates the router
      // maps — are fully mergeable). If no provable tail can be built
      // the whole query stays live: a stale rollup must never answer
      // alone. The SIDECAR IS THE COMMIT POINT: the rollup side is
      // additionally filtered to `timeKey < watermark`, so partials a
      // writer appended but has not yet committed (by advancing the
      // sidecar) are invisible — which makes the TTL-expiry protocol
      // (append partials → advance sidecar → drop raw) crash-safe at
      // every step. A watermark that is not a whole-grain boundary
      // would split the boundary group across the two sides, so the
      // rule refuses it (stays live) rather than answer wrong.
      val newChild: LogicalPlan = coveredUpTo(spec) match {
        case None => return None // unreadable sidecar: never answer from it
        case Some(None) =>
          routedFilters.reduceOption(And).map(Filter(_, rollup)).getOrElse(rollup)
        case Some(Some(wm)) => timeKeyOpt match {
          case Some(timeKey) =>
            val grainMicros = if (spec.grain == "hour") MicrosPerHour else MicrosPerDay
            if (wm % grainMicros != 0) return None
            val wmLit: Expression =
              if (spec.grain == "hour") Literal(wm, TimestampType)
              else Literal((wm / MicrosPerDay).toInt, DateType)
            val rollupSide = Filter(
              (LessThan(timeKey, wmLit) +: routedFilters).reduce(And), rollup)
            hybridTail(spec, child, rollup,
                       groupings.map(resolveThroughProjects(_, child)) ++ resolvedConjuncts,
                       resolvedConjuncts, wm) match {
              case Some(tail) => Union(Seq(rollupSide, tail))
              case None => return None
            }
          case None =>
            // GRAINLESS hybrid: the time column is not a group key, so
            // ANY watermark is lossless — a key group's partials merely
            // split across rollup and tail and the final aggregate
            // re-merges them. There is no commit-point filter (nothing
            // to filter on), so the WRITER contract is rebuild-only:
            // files + sidecar are stamped together before registration
            // (never appended-then-stamped; Live.maintainRollup refuses
            // the grain). A spec with no time column at all
            // (timeCol = "") can never prove a tail — stay live.
            if (spec.timeCol.isEmpty) return None
            val rollupSide =
              routedFilters.reduceOption(And).map(Filter(_, rollup)).getOrElse(rollup)
            hybridTail(spec, child, rollup,
                       groupings.map(resolveThroughProjects(_, child)) ++ resolvedConjuncts,
                       resolvedConjuncts, wm) match {
              case Some(tail) => Union(Seq(rollupSide, tail))
              case None => return None
            }
        }
      }
      Some(Aggregate(groupings.map(keyMap), newAggExprs, newChild))
    }

    /** GROUPING SETS / ROLLUP / CUBE routing (round 12): the analyzer
      * lowers a multi-grain dashboard to `Aggregate(groupByAttrs :+
      * gid, …, Expand(projections, output, child))` — each projection
      * row nulls the grouping columns its set drops and tags the row
      * with a grouping-id literal, and the aggregate runs once over
      * the expanded rows. A subtotal row merely merges MORE partials
      * per group, and every aggregate the registry maps (SUM/COUNT/
      * MIN/MAX partials, the AVG sum+count pair, HLL/KLL/top-k
      * states) is fully mergeable, so replaying the IDENTICAL
      * projection structure over the ROLLUP'S rows is lossless — one
      * rollup-sized scan answers every grain of the dashboard at
      * once, where the reference maintains one MV per grain
      * (`usdc-transfers/sql/analytics.sql:9-94`). The rewrite
      * delegates the real work to [[rewrite]] on a PSEUDO flat
      * aggregate (the full grouping set, only the aggregate-valued
      * output columns) — inheriting predicate subsumption, grain
      * hierarchy, the hybrid rollup∪tail read, and every mapAgg guard
      * — then rebuilds Expand on top of the routed child, preserving
      * each expanded-attribute and grouping-id ExprId so the parent
      * plan and the null/gid semantics are untouched. The one
      * registry member that is NOT subtotal-safe is the exact
      * COUNT(DISTINCT key)→row-count mapping (a coarser subtotal
      * group holds more rollup rows than distinct keys), so ANY
      * distinct aggregate keeps the whole query live.
      *
      * `flat` is the flat-aggregate rewriter to delegate to — the
      * single-table [[rewrite]] or the join-path [[rewriteJoin]]
      * curried with its spec: the decomposition and the rebuild are
      * identical on both paths because both return the same
      * `Aggregate(mappedGroupings, mappedAggs, routedChild)` shape. */
    private def rewriteExpand(agg: Aggregate, groupings: Seq[Expression],
                              aggExprs: Seq[NamedExpression],
                              flat: (Aggregate, Seq[Expression], Seq[NamedExpression])
                                      => Option[LogicalPlan]): Option[LogicalPlan] = {
      // the optimizer pushes grouping-id / grouping-key predicates (a
      // subtotal-slice `WHERE grouping_id() = 1`, inferred IsNotNull)
      // BETWEEN the aggregate and the Expand — peel them here and
      // re-apply verbatim above the rebuilt Expand: they reference
      // only attributes the rewrite preserves, and they select whole
      // grouping-set copies / whole groups (the expanded attrs ARE
      // the aggregate's group keys), so they never split a group
      var latticeFilters: Seq[Expression] = Nil
      var node: LogicalPlan = agg.child
      while (node.isInstanceOf[Filter]) {
        val f = node.asInstanceOf[Filter]
        latticeFilters = latticeFilters ++ splitConjunctivePredicates(f.condition)
        node = f.child
      }
      val ex = node match {
        case e: Expand => e
        case _ => return None
      }
      val exOut = ex.output
      val gidIdx = exOut.indexWhere(_.name == VirtualColumn.groupingIdName)
      if (gidIdx < 0 || !ex.projections.forall(_.length == exOut.length))
        return None
      val gid = exOut(gidIdx)
      val childOut = ex.child.outputSet
      val gdIdx = exOut.indices
        .filter(i => i != gidIdx && !childOut.contains(exOut(i)))
      val passIdx = exOut.indices
        .filter(i => i != gidIdx && childOut.contains(exOut(i)))
      // the recognized lowering only: passthrough slots carry the
      // attribute itself in EVERY set; the gid slot is a literal tag
      if (!ex.projections.forall { row =>
            passIdx.forall(i => row(i).semanticEquals(exOut(i))) &&
            row(gidIdx).isInstanceOf[Literal] }) return None
      val gdAttrs: Seq[Attribute] = gdIdx.map(exOut)
      // one consistent pre-expand source expression per expanded attr
      // (the grouping expression the analyzer aliased below Expand)
      val srcOf: Seq[Expression] = gdIdx.map { i =>
        val nonNull = ex.projections.map(_(i)).filter {
          case Literal(null, _) => false
          case _ => true
        }
        if (nonNull.isEmpty ||
            !nonNull.tail.forall(_.semanticEquals(nonNull.head))) return None
        nonNull.head
      }
      val gdSet = AttributeSet(gdAttrs :+ gid)
      if (!groupings.forall {
            case a: Attribute => gdSet.contains(a)
            case _ => false }) return None
      // peeled lattice filters must be deterministic bit tests /
      // predicates over the preserved attrs only — anything touching a
      // pre-expand column keeps the query live (it cuts raw rows, the
      // flat path's subsumption owns that proof)
      if (!latticeFilters.forall(c =>
            c.deterministic && c.references.subsetOf(gdSet))) return None
      // distinct aggregates are not GENERALLY subtotal-safe: the
      // CountDistinctGrain row-count mapping over-counts subtotal
      // groups (the flat rewriters receive `inLattice = true` and
      // refuse it). Two distinct shapes DO pass, because their
      // set-state mappings union across any regrouping: the uniqUpTo
      // `least(count(DISTINCT c), n+1)` (round 13, capped sets) and a
      // single-argument COUNT(DISTINCT expr) (round 15 — uniqExact
      // from SetOf states). A distinct that no member actually maps
      // still falls back live downstream (the flat rewrite's
      // raw-reference check), so letting the shapes through is safe.
      val underUpTo: Set[Expression] = aggExprs.flatMap(_.collect {
        case Least(Seq(ae: AggregateExpression, limE))
            if ae.isDistinct && limE.foldable && limE.dataType == LongType => ae
      }).toSet
      if (aggExprs.exists(_.exists {
            case ae: AggregateExpression =>
              ae.isDistinct && !underUpTo.contains(ae) &&
                (ae.aggregateFunction match {
                  case Count(Seq(_)) => false // uniqExact may map via SetOf
                  case _ => true
                })
            case _ => false })) return None
      // split the output: grouping-valued columns (expanded attrs/gid
      // only — grouping()/grouping_id() are bit tests on gid) pass
      // through untouched; aggregate-valued columns (pre-expand
      // references only) route through the pseudo rewrite; a column
      // mixing the two stays live
      val (keyExprs, aggOnly) = aggExprs.partition(
        ne => !ne.exists(_.isInstanceOf[AggregateExpression]))
      if (!keyExprs.forall(_.references.subsetOf(gdSet))) return None
      if (aggOnly.exists(_.references.exists(gdSet.contains))) return None
      val pseudo = Aggregate(srcOf, aggOnly, ex.child)
      val routed = flat(pseudo, srcOf, aggOnly) match {
        case Some(a: Aggregate) => a
        case _ => return None
      }
      val mappedGroupings = routed.groupingExpressions // positional w/ gdAttrs
      if (mappedGroupings.zip(gdAttrs).exists {
            case (m, a) => m.dataType != a.dataType }) return None
      val mappedAggs: Map[ExprId, NamedExpression] =
        aggOnly.map(_.exprId).zip(routed.aggregateExpressions).toMap
      val newAggExprs = aggExprs.map(ne => mappedAggs.getOrElse(ne.exprId, ne))
      val newChild = routed.child
      // the rule runs after column pruning, so prune the passthrough
      // block by hand — only the partial columns the mapped aggregates
      // read flow through Expand (the physical scan's requiredSchema
      // follows Expand's references)
      val needed = AttributeSet(newAggExprs.flatMap(_.references))
      val passAttrs = newChild.output.filter(needed.contains)
      val aliases = mappedGroupings.zip(gdAttrs).map {
        case (m, a) => Alias(m, a.name)()
      }
      // ADJUDICATED NON-CHANGE (round 15): merging array-valued
      // partials (SetOf/uniqUpTo states) ONCE at base grain below the
      // Expand — so the lattice's ×N copies replay over pre-merged
      // rows — was hypothesized to remove a per-copy array merge from
      // the q209 read (4.7× at ×100 in the r14 audit). MEASURED and
      // REJECTED: the per-copy merge already happens MAP-SIDE — the
      // partial ObjectHashAggregate above the Expand unions each
      // copy's arrays locally, pre-shuffle — so a base-grain
      // pre-aggregate only adds an exchange. Paired ×100 runs, same
      // replica: compacted rollup 3.20 s → 3.09 s, a 4-part appended
      // rollup 3.12 s → 3.20 s (noise both ways), while sf0.1 paid
      // 0.56 s → 0.77 s for the extra shuffle. Half the ×100 time is
      // the query's OWN output rendering (sort_array + csv-join over
      // arrays sized by distinct members: 1.71 s without it), the
      // rest the member's documented array-size regime (q204 measures
      // the same ratio with no Expand at all) — neither is plan
      // overhead. The lattice therefore keeps the one-pass Expand
      // shape that scalar lattices want, for array states too.
      val proj = Project(passAttrs.map(a => a: NamedExpression) ++ aliases,
                         newChild)
      val newProjections = ex.projections.map { row =>
        passAttrs.map(a => a: Expression) ++
          gdIdx.zipWithIndex.map { case (i, k) =>
            row(i) match {
              case Literal(null, _) => Literal(null, exOut(i).dataType)
              case _ => aliases(k).toAttribute
            }
          } :+ row(gidIdx)
      }
      val newExpand =
        Expand(newProjections, passAttrs ++ gdAttrs :+ gid, proj)
      val filtered = latticeFilters.reduceOption(And)
        .map(Filter(_, newExpand)).getOrElse(newExpand: LogicalPlan)
      Some(Aggregate(groupings, newAggExprs, filtered))
    }

    /** Route a MULTI-DISTINCT dashboard (round 15). A query with two
      * or more DISTINCT aggregates over different children — `SELECT
      * count(DISTINCT a), count(DISTINCT CASE …) …` — reaches this
      * rule only AFTER Spark's own `RewriteDistinctAggregates` has
      * re-encoded it (extraOptimizations run at the optimizer's tail),
      * as the double-Aggregate-over-Expand plan:
      *
      * {{{
      * Aggregate(keys, [agg(col_i) FILTER gid=i…, first(x) FILTER gid=0…],
      *   Aggregate(keys ++ distinctCols ++ gid, [regular partials x…],
      *     Expand([keys ++ nulled-per-copy cols ++ gid-literal]×copies,
      *       rawChild)))
      * }}}
      *
      * The single-aggregate rewriters can't see the original distinct
      * shapes in that encoding, so every multi-distinct dashboard
      * silently stayed live — including ones whose members
      * (SetOf/BitmapUniqOf exact-distinct states) answer each distinct
      * exactly. This handler INVERTS the encoding: it reconstructs the
      * user's original flat aggregate — each `agg(col) FILTER gid=i`
      * becomes the distinct aggregate over copy i's source expression,
      * each `first(x) FILTER gid=0` inlines the inner regular
      * aggregate over copy 0's expressions — and delegates to the
      * ordinary flat rewrite. Inversion is exact by construction (it
      * is the inverse of a semantics-preserving rewrite, keyed on the
      * gid structure that rewrite plants); anything not matching the
      * encoding — a user filter, an unexpected picker, a grouping
      * whose value differs across copies — bails to live. Output
      * names/ExprIds ride the outer aliases, so downstream operators
      * are untouched. */
    private def rewriteMultiDistinct(agg: Aggregate, groupings: Seq[Expression],
        aggExprs: Seq[NamedExpression],
        flat: (Aggregate, Seq[Expression], Seq[NamedExpression]) => Option[LogicalPlan])
        : Option[LogicalPlan] = agg.child match {
      case Aggregate(_, innerAggExprs, ex: Expand, _) =>
        val exOut = ex.output
        val idxOf: Map[ExprId, Int] = exOut.map(_.exprId).zipWithIndex.toMap
        // the gid column RewriteDistinctAggregates plants. The probe is
        // STRUCTURAL, not name-first (round 16, hardening a name-based
        // indexWhere): the attribute must be rewrite-planted (absent
        // from ex.child.output — a user column named "gid" flows
        // through the child and is excluded), non-nullable IntegerType,
        // and carry a DISTINCT int literal in EVERY projection row.
        // The name is kept as the last tiebreak only because the
        // rewrite offers no public tag; if several columns qualify
        // structurally the LAST one wins (the rewrite appends its
        // bookkeeping after the expanded data columns).
        val childIds = AttributeSet(ex.child.output)
        def distinctLiteralAt(i: Int): Boolean = {
          val lits = ex.projections.map(_(i)).collect {
            case Literal(v: Int, IntegerType) => v
          }
          lits.size == ex.projections.size && lits.distinct.size == lits.size
        }
        val gidCandidates = exOut.indices.filter { i =>
          val a = exOut(i)
          a.name == "gid" && a.dataType == IntegerType && !a.nullable &&
            !childIds.contains(a) && distinctLiteralAt(i)
        }
        if (gidCandidates.isEmpty) return None
        val gidIdx = gidCandidates.last
        val gidAttr = exOut(gidIdx)
        val rowsByGid: Map[Int, Seq[Expression]] = ex.projections.map { row =>
          row(gidIdx) match {
            case Literal(i: Int, IntegerType) => i -> row
            case other => throw new IllegalStateException(
              s"gid probe accepted a non-literal projection entry: $other")
          }
        }.toMap
        val row0 = rowsByGid.getOrElse(0, return None)
        // inner regular-aggregate definitions, by their output ExprId
        val innerMap: Map[ExprId, AggregateExpression] = innerAggExprs.collect {
          case al @ Alias(ae: AggregateExpression, _) => al.exprId -> ae
        }.toMap
        var ok = true
        def subst(row: Seq[Expression], e: Expression): Expression = e.transformUp {
          case a: AttributeReference if idxOf.contains(a.exprId) =>
            row(idxOf(a.exprId))
        }
        def gidOf(f: Option[Expression]): Option[Int] = f match {
          case Some(EqualTo(a: AttributeReference, Literal(i: Int, IntegerType)))
              if a.exprId == gidAttr.exprId => Some(i)
          case Some(EqualTo(Literal(i: Int, IntegerType), a: AttributeReference))
              if a.exprId == gidAttr.exprId => Some(i)
          case _ => None
        }
        val rebuilt: Seq[NamedExpression] = aggExprs.map { ne =>
          val r = ne.transformUp {
            case ae: AggregateExpression =>
              gidOf(ae.filter) match {
                case Some(0) => ae.aggregateFunction match {
                  // the regular-aggregate picker: inline the inner
                  // definition, re-sourced from copy 0
                  case First(x: AttributeReference, _) =>
                    innerMap.get(x.exprId) match {
                      case Some(innerAe) if innerAe.filter.isEmpty =>
                        innerAe.copy(aggregateFunction =
                          subst(row0, innerAe.aggregateFunction)
                            .asInstanceOf[AggregateFunction])
                      case _ => ok = false; ae
                    }
                  case _ => ok = false; ae
                }
                // a distinct group: its aggregate re-sourced from copy
                // i IS the original distinct aggregate
                case Some(i) => ae.copy(
                  aggregateFunction = subst(rowsByGid.getOrElse(i, {
                      ok = false; row0
                    }), ae.aggregateFunction).asInstanceOf[AggregateFunction],
                  isDistinct = true, filter = None)
                case None => ok = false; ae
              }
          }.asInstanceOf[NamedExpression]
          // passthrough groupings: re-source from copy 0, but only if
          // every copy agrees on the value (true for group-by
          // positions; a per-copy column here means we misread the
          // shape — bail). A substituted bare attribute keeps the
          // OUTER output's name/ExprId via an alias, so downstream
          // operators' references stay valid.
          val s2 = subst(row0, r)
          r match {
            case a: Attribute if !s2.fastEquals(a) =>
              if (!rowsByGid.values.forall(row =>
                    subst(row, a).semanticEquals(s2))) { ok = false; a }
              else Alias(s2, a.name)(exprId = a.exprId)
            case _ => s2 match {
              case nee: NamedExpression => nee
              case _ => ok = false; ne
            }
          }
        }
        val newGroupings = groupings.map { g =>
          val s = subst(row0, g)
          if (!rowsByGid.values.forall(row => subst(row, g).semanticEquals(s)))
            ok = false
          s
        }
        if (!ok) return None
        val childOut = AttributeSet(ex.child.output)
        if (!(rebuilt ++ newGroupings).forall(_.references.subsetOf(childOut)))
          return None
        flat(Aggregate(newGroupings, rebuilt, ex.child), newGroupings, rebuilt)
      case _ => None
    }

    /** CROSS-FAMILY estimator substitution opt-out (round 14, a
      * session conf): routing `approx_count_distinct` (HLL++) onto a
      * registered Datasketches uniqState is inside the approx
      * function's own accuracy contract when the state's rsd
      * dominates, but the VALUES are plan-dependent — a dashboard's
      * numbers change the day a uniqState MV is registered and revert
      * if it is dropped, and relativeSD is a probabilistic sigma, not
      * a hard per-value bound. Deployments that need plan-stable
      * values set `spark.graft.routing.estimatorSubstitution=false`;
      * same-family sketch routing (`hll_sketch_agg` onto its own
      * state — bit-equal by construction) is unaffected. */
    private def estimatorSubstitutionEnabled: Boolean =
      spark.sessionState.conf.getConfString(
        "spark.graft.routing.estimatorSubstitution", "true") != "false"

    /** True when two types differ only by the loader-contract
      * timestamp relabel (TimestampNTZ vs Timestamp) at any nesting —
      * a cast between them changes no value under the pinned-UTC
      * session (round 14). */
    private def relabelOnly(from: org.apache.spark.sql.types.DataType,
                            to: org.apache.spark.sql.types.DataType): Boolean = {
      import org.apache.spark.sql.types._
      (from, to) match {
        case (f, t) if f == t => true
        // the NTZ<->TZ relabel is value-preserving ONLY under the
        // pinned-UTC session (the loader contract); a non-UTC session
        // would silently SHIFT stored timestamps, so the rewrite
        // degrades to no-route there instead (round 17, review
        // finding). UTC is recognized by ZONE RULES, not string
        // equality — "Etc/UTC"/"GMT"/"+00:00" are all the same fixed
        // zero offset and must not silently disable routing.
        case (TimestampNTZType, TimestampType) =>
          scala.util.Try(java.time.ZoneId
            .of(spark.sessionState.conf.sessionLocalTimeZone)
            .normalized() == java.time.ZoneOffset.UTC).getOrElse(false)
        case (f: StructType, t: StructType) =>
          f.length == t.length && f.fields.zip(t.fields).forall { case (a, b) =>
            a.name == b.name && relabelOnly(a.dataType, b.dataType) }
        case (f: ArrayType, t: ArrayType) =>
          relabelOnly(f.elementType, t.elementType)
        case _ => false
      }
    }

    /** `src`'s structure and NULLABILITY with `like`'s timestamp
      * LABELS (TimestampNTZ vs Timestamp) at every nesting — the cast
      * target that aligns a raw-scan-built rollup's stored time label
      * with the loader-relabeled query side without touching the
      * nullability flags a Cast cannot change (round 16). */
    private def withTimeLabelsOf(src: org.apache.spark.sql.types.DataType,
                                 like: org.apache.spark.sql.types.DataType)
        : org.apache.spark.sql.types.DataType = {
      import org.apache.spark.sql.types._
      (src, like) match {
        case (TimestampNTZType, TimestampType) => TimestampType
        case (TimestampType, TimestampNTZType) => TimestampNTZType
        case (f: StructType, t: StructType) if f.length == t.length =>
          StructType(f.fields.zip(t.fields).map { case (a, b) =>
            a.copy(dataType = withTimeLabelsOf(a.dataType, b.dataType)) })
        case (f: ArrayType, t: ArrayType) =>
          f.copy(elementType = withTimeLabelsOf(f.elementType, t.elementType))
        case _ => src
      }
    }

    /** Flatten of merged list states, with the element type's time
      * labels aligned to the query's own element type when the stored
      * states carry the pre-loader NTZ label (an advised rollup built
      * from the raw scan). The relabel cast changes NO value under
      * the pinned-UTC session — the loader-contract invariant — and
      * the cast target keeps the stored nullability flags, so the
      * routed output differs from the live one only where the
      * existing sameTypeIgnoreNullability contract already allows. */
    private def relabelFlatten(merged: Expression,
                               storedType: org.apache.spark.sql.types.DataType,
                               queryElem: org.apache.spark.sql.types.DataType)
        : Expression = {
      import org.apache.spark.sql.types._
      val flat = Flatten(merged)
      storedType match {
        case ArrayType(et, cn)
            if !org.apache.spark.sql.graftx.Bridge
              .sameTypeIgnoreNullability(et, queryElem) =>
          Cast(flat, ArrayType(withTimeLabelsOf(et, queryElem), cn),
            Some(spark.sessionState.conf.sessionLocalTimeZone))
        case _ => flat
      }
    }

    /** Align a hybrid tail's output types with the rollup block it
      * unions against. The tail rebuilds measures from the RAW scan,
      * below the loader's normalization project, so a measure that
      * embeds the time column (a struct-extremum state) carries the
      * NTZ type where the rollup stored the session type — relabel
      * casts reconcile those exactly; ANY other mismatch aborts the
      * rewrite (stay live) instead of emitting an unresolvable Union
      * (round 14 — previously such a plan failed validation and
      * crashed the query). */
    private def alignTailTypes(aggExprs: Seq[NamedExpression],
                               rollupOut: Seq[Attribute])
        : Option[Seq[NamedExpression]] = {
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      Some(aggExprs.zip(rollupOut).map { case (ne, target) =>
        if (ne.dataType == target.dataType) ne
        else if (relabelOnly(ne.dataType, target.dataType)) ne match {
          case Alias(c, n) => Alias(Cast(c, target.dataType, tz), n)()
          case _ => return None
        }
        else return None
      })
    }

    /** The coverage watermark a hybrid rollup writer stamped, if any.
      * Outer None = UNREADABLE sidecar (present but unparseable) — the
      * rollup claims partial coverage without proving the boundary, so
      * the rewrite must ABORT (stay live) rather than fall back to
      * treating it as complete; inner None = no sidecar at all (a
      * complete rollup). */
    private def coveredUpTo(spec: Spec): Option[Option[Long]] =
      coveredUpToPath(spec.rollupPath)

    private def coveredUpToPath(rollupPath: String): Option[Option[Long]] = {
      val f = new java.io.File(rollupPath, RollupRouting.CoverageSidecar)
      if (!f.exists()) Some(None)
      else scala.util.Try(new String(
        java.nio.file.Files.readAllBytes(f.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong).toOption match {
        case Some(wm) => Some(Some(wm))
        case None => None
      }
    }

    /** Build the LIVE-TAIL partial aggregate for a hybrid read: the
      * same partial block the rollup stores, computed over only the raw
      * rows at or past the coverage watermark, column-aligned with the
      * rollup schema so the Union merges under the final aggregate.
      * Needs (a) the source scan below the aggregate, (b) a
      * normalized time term somewhere in the query to rebuild the
      * grain key over the scan (any dashboard's time grouping or
      * window provides one — a query with no time term at all stays
      * live), and (c) the spec's key and measure columns at the scan.
      * The query's own subsumable conjuncts re-apply to the tail in
      * their raw form, so both sides see the same predicate. The
      * partial block is rebuilt from the spec's `aggs` (round 12) —
      * each partial column's source expression comes from its
      * [[AggMap]], so any registered table shape gets a tail. */
    private def hybridTail(spec: Spec, child: LogicalPlan, rollup: LogicalPlan,
                           normTsCandidates: Seq[Expression],
                           resolvedConjuncts: Seq[Expression],
                           wm: Long): Option[LogicalPlan] = {
      val scanRel = child.collectFirst {
        case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
            if fs.location.rootPaths.exists(_.toString.endsWith(spec.sourceSuffix)) => lr
      }.getOrElse(return None)
      def findNormTs(e: Expression): Option[Expression] =
        if (isNormTime(e, spec.timeCol) && e.references.nonEmpty &&
            e.references.subsetOf(scanRel.outputSet)) Some(e)
        else e.children.view.flatMap(findNormTs).headOption
      def scanAttr(n: String): Option[Attribute] = scanRel.output.find(_.name == n)
      val tz = Some(spark.sessionState.conf.sessionLocalTimeZone)
      // a GRAINLESS query has no time term to mine the normalized time
      // expression from — rebuild it directly over the scan's own
      // column through the loader-contract wrappers ([[isNormTime]]'s
      // exact vocabulary: DATE/TIMESTAMP as-is, the NTZ relabel, the
      // nanos-long truncation); any other encoding stays live
      def rebuiltNormTs: Option[Expression] = scanAttr(spec.timeCol).flatMap { a =>
        a.dataType match {
          case DateType | TimestampType => Some(a)
          case TimestampNTZType => Some(Cast(a, TimestampType, tz))
          case LongType =>
            Some(MicrosToTimestamp(IntegralDivide(a, Literal(1000L))))
          case _ => None
        }
      }
      // round 17: a GRAINED spec can also serve a query with NO time
      // term (an all-time dashboard over the maintained daily MV) —
      // the query then never groups by time, so a group's partials
      // merely split across rollup (timeKey < wm) and tail (ts ≥ wm)
      // and the final aggregate re-merges them, the same losslessness
      // argument as the grainless branch; the normalized ts rebuilds
      // from the scan exactly as there
      val normTsE = normTsCandidates.view.flatMap(findNormTs).headOption
        .orElse(rebuiltNormTs)
        .getOrElse(return None)
      val timeIsDate = normTsE.dataType == DateType
      // a DATE time column is day-granular: a mid-day watermark would
      // split the boundary day's rows ambiguously (grained specs
      // enforce the boundary in [[rewrite]]; the grainless path allows
      // any watermark only on a true timestamp column)
      if (spec.grain == "all" && timeIsDate && wm % MicrosPerDay != 0) return None
      val grainKey: Expression =
        if (spec.grain == "hour") TruncTimestamp(Literal("hour"), normTsE, tz)
        else if (timeIsDate) normTsE // a DATE time column IS the day key
        else Cast(normTsE, DateType, tz)
      val wmLit: Expression =
        if (timeIsDate) Literal((wm / MicrosPerDay).toInt, DateType)
        else Literal(wm, TimestampType)
      val tailCond = (GreaterThanOrEqual(normTsE, wmLit) +:
        resolvedConjuncts).reduce(And)
      // the grainless rollup stores no time key — no rollup column can
      // carry this name, so its aggExprs case below never fires
      val timeKeyName = if (spec.grain == "all") ""
                        else if (spec.grain == "hour") "hour" else "day"
      // rollup column name -> its source attribute at the scan
      val keyByRollupCol: Seq[(String, Attribute)] = spec.keyCols.toSeq.map {
        case (src, rcol) => rcol -> scanAttr(src).getOrElse(return None)
      }
      val keyLookup = keyByRollupCol.toMap
      val aggExprs: Seq[NamedExpression] = rollup.output.map(_.name).map {
        case n if n == timeKeyName => Alias(grainKey, n)()
        case n if keyLookup.contains(n) => Alias(keyLookup(n), n)()
        case n => spec.aggs.view.flatMap {
          case SumOf(pat, p) if p == n =>
            pat.rebuild(scanAttr).map(e =>
              Alias(Sum(Cast(e, DecimalType(38, 6))).toAggregateExpression(), n)())
          case CountStarTo(p) if p == n =>
            Some(Alias(Count(Seq(Literal(1))).toAggregateExpression(), n)())
          case CountOf(pat, p) if p == n => // the tail's own non-null count
            pat.rebuild(scanAttr).map(e =>
              Alias(Count(Seq(e)).toAggregateExpression(), n)())
          case MinOf(cn, p) if p == n =>
            scanAttr(cn).map(a => Alias(Min(a).toAggregateExpression(), n)())
          case MaxOf(cn, p) if p == n =>
            scanAttr(cn).map(a => Alias(Max(a).toAggregateExpression(), n)())
          case AvgOf(cn, _, p) if p == n => // non-null count of cn
            scanAttr(cn).map(a => Alias(Count(Seq(a)).toAggregateExpression(), n)())
          case AvgOf(cn, sp, _) if sp == n => // avg's sum partial, when
            // no SumOf writes the same column (the builder reuses it)
            scanAttr(cn).map(a => Alias(
              Sum(Cast(a, DecimalType(38, 6))).toAggregateExpression(), n)())
          case HllUniqOf(pt, p, lgK) if p == n => // the tail's own sketch
            pt.rebuild(scanAttr).map(e => Alias(
              HllSketchAgg(e, Literal(lgK)).toAggregateExpression(), n)())
          case KllQuantileOf(pt, p, k) if p == n =>
            pt.rebuild(scanAttr).map(e => Alias(
              graft.expr.KllDoublesAgg(e, k).toAggregateExpression(), n)())
          case TopKOf(pt, p, m) if p == n =>
            pt.rebuild(scanAttr).map(e => Alias(
              ApproxTopKAccumulate(e, Literal(m)).toAggregateExpression(), n)())
          case SetOf(pt, p) if p == n => // the tail's own distinct set
            pt.rebuild(scanAttr).map(e =>
              Alias(CollectSet(e).toAggregateExpression(), n)())
          case UniqUpToOf(pt, p, lim) if p == n => // the tail's capped set
            pt.rebuild(scanAttr).map(e => Alias(
              Slice(CollectSet(e).toAggregateExpression(),
                Literal(1), Literal(lim + 1)), n)())
          case BitmapUniqOf(pt, p) if p == n => // the tail's own bitmap
            pt.rebuild(scanAttr).map(e => Alias(
              graft.expr.BitmapAgg(e).toAggregateExpression(), n)())
          case ThetaUniqOf(pt, p, k) if p == n => // the tail's own theta state
            pt.rebuild(scanAttr).map(e => Alias(
              graft.expr.ThetaAgg(e, k).toAggregateExpression(), n)())
          case ListOf(pt, p) if p == n => // the tail's own list state
            pt.rebuild(scanAttr).map(e =>
              Alias(CollectList(e).toAggregateExpression(), n)())
          case TopKWeightedOf(ip, wp, p, m) if p == n => // the tail's own state
            for {
              ie <- ip.rebuild(scanAttr)
              we <- wp.rebuild(scanAttr)
            } yield Alias(
              graft.expr.TopKWeightedAgg(ie, we, m).toAggregateExpression(), n)()
          case MinPatOf(pt, p) if p == n =>
            pt.rebuild(scanAttr).map(e => Alias(Min(e).toAggregateExpression(), n)())
          case MaxPatOf(pt, p) if p == n =>
            pt.rebuild(scanAttr).map(e => Alias(Max(e).toAggregateExpression(), n)())
          case _ => None
        }.headOption.getOrElse(return None) // a column the tail can't rebuild
      }
      val tailGroupings: Seq[Expression] =
        if (spec.grain == "all") keyByRollupCol.map(_._2)
        else grainKey +: keyByRollupCol.map(_._2)
      alignTailTypes(aggExprs, rollup.output)
        .map(as => Aggregate(tailGroupings, as, Filter(tailCond, scanRel)))
    }
  }
}

/** `SparkSessionExtensions` hook:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(session => new RollupRouting.RuleImpl(session))
    e.injectPlannerStrategy(_ => TopKPerGroup.Strategy)
  }
}
