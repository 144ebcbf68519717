package graft.expr

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** THETA distinct sketches with full SET ALGEBRA (round 15) —
  * ClickHouse's `uniqTheta` / `uniqThetaUnion` / `uniqThetaIntersect`
  * / `uniqThetaNot`, on the same Datasketches library Spark ships for
  * its own `hll_sketch_agg`. The HLL member answers "how many
  * distinct"; the bitmap member answers set questions EXACTLY but
  * only for integral keys. Theta completes the triangle: approximate
  * distinct sets over ANY key type (strings, binaries, doubles) whose
  * states support union, intersection, and difference with published
  * error bounds — the audience-overlap vocabulary ("users who did A
  * and B", "A but never B") at 100 TB state sizes.
  *
  * Functions, mirroring the KLL/bitmap trios:
  *  - [[ThetaAgg]] `(col[, lgK])` → the group's compact theta state;
  *  - [[ThetaUnionAgg]] `(state)` → OR across rows (re-aggregation);
  *  - [[ThetaIntersectAgg]] `(state)` → AND across rows (the cohort
  *    read; empty input → empty set, the same identity choice as the
  *    bitmap intersect);
  *  - [[ThetaANotB]] `(a, b)` → set difference of two states (scalar);
  *  - [[ThetaEstimate]] `(state)` → the distinct estimate.
  *
  * Honest precision contract: a theta sketch is EXACT while a group's
  * distinct count stays under its nominal entries (2^lgK, default
  * 4096 — the fixture regime, which is why the driver query is
  * hash-ORACLED); above that, estimates carry the published theta
  * bounds and INTERSECTION error grows with 1/Jaccard (the
  * Datasketches caveat: tiny overlaps of huge sets are where AND
  * estimates get noisy — the exact bitmap member is the right tool
  * when keys are integral). Determinism: the retained set is a pure
  * function of the input VALUE SET (hash threshold, no RNG), so
  * states and estimates are reproducible across partitionings. */
object Theta {
  /** Datasketches' largest nominal-entries exponent — the
    * "never downsample" buffer size for state UNIONS whose inputs'
    * precision is unknown (a union buffer must be at least as large
    * as its inputs or it silently degrades them; a buffer at the max
    * preserves whatever precision the inputs carry, and its memory
    * tracks RETAINED entries, not capacity). */
  val MaxLgK: Int = 26
  private[expr] def emptyState(lgK: Int): Array[Byte] =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      .getResult.toByteArray
  private[expr] def wrap(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))
  private[expr] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | StringType |
         FloatType | DoubleType | BinaryType => true
    case _ => false
  }
}

/** Per-group theta state of a column (NULLs skipped). */
case class ThetaAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Theta.supported(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_agg supports integral/string/double/binary inputs, " +
          s"got ${child.dataType}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  private lazy val updater: (Union, Any) => Unit = child.dataType match {
    case LongType => (u, v) => u.update(v.asInstanceOf[Long])
    case IntegerType => (u, v) => u.update(v.asInstanceOf[Int].toLong)
    case ShortType => (u, v) => u.update(v.asInstanceOf[Short].toLong)
    case ByteType => (u, v) => u.update(v.asInstanceOf[Byte].toLong)
    case StringType => (u, v) => u.update(v.asInstanceOf[UTF8String].toString)
    case DoubleType => (u, v) => u.update(v.asInstanceOf[Double])
    case FloatType => (u, v) => u.update(v.asInstanceOf[Float].toDouble)
    case BinaryType => (u, v) => u.update(v.asInstanceOf[Array[Byte]])
    case dt => throw new IllegalStateException(s"unsupported input $dt")
  }

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) updater(buffer, v)
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaAgg =
    copy(child = c)
}

/** Union of serialized theta states across rows. `lgK` sizes the
  * UNION BUFFER, not the inputs: a buffer smaller than an input state
  * silently downsamples it (Datasketches' documented union behavior),
  * so the no-argument surface (`graft_theta_union(st)`, `Tht.union(c)`)
  * defaults to [[Theta.MaxLgK]] — the union then carries exactly its
  * inputs' own precision (result θ = min over inputs), whatever lgK
  * they were built with. The ROUTER still pins the registered lgK
  * explicitly ([[graft.plans.RollupRouting.ThetaUniqOf]]): there the
  * inputs' precision is known and bit-equality with the live plan is
  * the contract (a union at the registered size is bit-identical to
  * one at the max for those inputs — neither downsamples). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = Theta.MaxLgK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_union"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_union needs a binary theta state, got ${child.dataType}")

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray
  override def serialize(buffer: Union): Array[Byte] = buffer.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** Intersection of serialized theta states across rows — the cohort
  * AND. None = no state seen (the identity); a seen state intersects. */
case class ThetaIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[CompactSketch]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_theta_intersect"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_intersect needs a binary theta state, got ${child.dataType}")

  override def createAggregationBuffer(): Option[CompactSketch] = None

  private def intersectPair(a: Sketch, b: Sketch): CompactSketch = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(a)
    i.intersect(b)
    i.getResult
  }

  override def update(buffer: Option[CompactSketch],
                      input: InternalRow): Option[CompactSketch] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = Theta.wrap(v.asInstanceOf[Array[Byte]])
      Some(buffer match {
        case None => in.compact()
        case Some(cur) => intersectPair(cur, in)
      })
    }
  }

  override def merge(buffer: Option[CompactSketch],
                     other: Option[CompactSketch]): Option[CompactSketch] =
    (buffer, other) match {
      case (Some(a), Some(b)) => Some(intersectPair(a, b))
      case (a @ Some(_), None) => a
      case (None, b) => b
    }

  override def eval(buffer: Option[CompactSketch]): Any = buffer match {
    case Some(s) => s.toByteArray
    case None => Theta.emptyState(12)
  }
  override def serialize(buffer: Option[CompactSketch]): Array[Byte] = buffer match {
    case None => Array.emptyByteArray // identity sentinel, not the empty set
    case Some(s) => s.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): Option[CompactSketch] =
    if (bytes.isEmpty) None
    else Some(Theta.wrap(bytes).compact())

  override def withNewMutableAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaIntersectAgg =
    copy(child = c)
}

/** `graft_theta_and(a, b)` — the intersection state of two serialized
  * theta states (the scalar pair form of [[ThetaIntersectAgg]], for
  * reads that AND one row's state against a broadcast cohort). */
case class ThetaAndPair(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_and"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_and needs two binary theta states, got " +
          s"${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Theta.wrap(a.asInstanceOf[Array[Byte]]))
    i.intersect(Theta.wrap(b.asInstanceOf[Array[Byte]]))
    i.getResult.toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : ThetaAndPair = copy(left = l, right = r)
}

/** `graft_theta_not(a, b)` — the state of (a AND NOT b), scalar over
  * two serialized theta states. */
case class ThetaANotB(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_not"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_not needs two binary theta states, got " +
          s"${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.setA(Theta.wrap(a.asInstanceOf[Array[Byte]]))
    op.notB(Theta.wrap(b.asInstanceOf[Array[Byte]]))
    op.getResult(true).toByteArray
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : ThetaANotB = copy(left = l, right = r)
}

/** `graft_theta_estimate(state)` — the distinct estimate (exact while
  * the state stayed under its nominal entries). */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_theta_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_estimate needs a binary theta state, got ${child.dataType}")

  override def nullSafeEval(state: Any): Any =
    Theta.wrap(state.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}

/** `graft_theta_bounds(state[, numStdDevs])` — the estimate WITH its
  * published confidence bounds and the exact-regime flag (round 16):
  * `struct<estimate, lower, upper, is_exact>`. A deployment reads
  * `is_exact` (θ = 1 — every input value retained, zero error) to see
  * when a dashboard's distinct count left the exact regime, and the
  * bounds (Datasketches' published ±1/2/3-σ intervals) to price the
  * error when it did — the honesty column the scalar estimate alone
  * cannot carry. */
case class ThetaBounds(child: Expression, numStdDevs: Int = 2)
  extends UnaryExpression with CodegenFallback {

  require(numStdDevs >= 1 && numStdDevs <= 3,
    s"Datasketches publishes 1-3 sigma bounds, got $numStdDevs")

  override def prettyName: String = "graft_theta_bounds"
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("lower", DoubleType, nullable = false),
    StructField("upper", DoubleType, nullable = false),
    StructField("is_exact", BooleanType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_theta_bounds needs a binary theta state, got ${child.dataType}")

  override def nullSafeEval(state: Any): Any = {
    val sk = Theta.wrap(state.asInstanceOf[Array[Byte]])
    org.apache.spark.sql.catalyst.InternalRow(
      sk.getEstimate,
      sk.getLowerBound(numStdDevs),
      sk.getUpperBound(numStdDevs),
      !sk.isEstimationMode)
  }

  override protected def withNewChildInternal(c: Expression): ThetaBounds =
    copy(child = c)
}

/** Column-DSL + SQL surface for the theta family. */
object Tht {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge

  def agg(c: Column, lgK: Int = 12): Column =
    Bridge.column(ThetaAgg(Bridge.expressionEager(c), lgK).toAggregateExpression())
  def union(c: Column, lgK: Int = Theta.MaxLgK): Column =
    Bridge.column(ThetaUnionAgg(Bridge.expressionEager(c), lgK)
      .toAggregateExpression())
  def intersect(c: Column): Column =
    Bridge.column(ThetaIntersectAgg(Bridge.expressionEager(c))
      .toAggregateExpression())
  def aNotB(a: Column, b: Column): Column =
    Bridge.column(ThetaANotB(Bridge.expressionEager(a), Bridge.expressionEager(b)))
  def and(a: Column, b: Column): Column =
    Bridge.column(ThetaAndPair(Bridge.expressionEager(a), Bridge.expressionEager(b)))
  def estimate(c: Column): Column =
    Bridge.column(ThetaEstimate(Bridge.expressionEager(c)))
  def bounds(c: Column, numStdDevs: Int = 2): Column =
    Bridge.column(ThetaBounds(Bridge.expressionEager(c), numStdDevs))

  /** SQL surface: `graft_theta_agg(v[, lgK])`, `graft_theta_union(st)`,
    * `graft_theta_intersect(st)`, `graft_theta_not(a, b)`,
    * `graft_theta_estimate(st)`. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def intOf(e: Expression): Int = e match {
      case Literal(i: Int, _) => i
      case other => throw new IllegalArgumentException(
        s"expected an int literal, got ${other.sql}")
    }
    Bridge.registerFunction(spark, "graft_theta_agg", {
      case Seq(c) => ThetaAgg(c)
      case Seq(c, k) => ThetaAgg(c, intOf(k))
      case args => throw new IllegalArgumentException(
        s"graft_theta_agg takes (value[, lgK]), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_theta_union", {
      case Seq(c) => ThetaUnionAgg(c)
      case Seq(c, k) => ThetaUnionAgg(c, intOf(k))
      case args => throw new IllegalArgumentException(
        s"graft_theta_union takes (state[, lgK]), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_theta_intersect", {
      case Seq(c) => ThetaIntersectAgg(c)
      case args => throw new IllegalArgumentException(
        s"graft_theta_intersect takes (state), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_theta_and", {
      case Seq(a, b) => ThetaAndPair(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_theta_and takes (a, b), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_theta_not", {
      case Seq(a, b) => ThetaANotB(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_theta_not takes (a, b), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_theta_estimate", {
      case Seq(c) => ThetaEstimate(c)
      case args => throw new IllegalArgumentException(
        s"graft_theta_estimate takes (state), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_theta_bounds", {
      case Seq(c) => ThetaBounds(c)
      case Seq(c, n) => ThetaBounds(c, intOf(n))
      case args => throw new IllegalArgumentException(
        s"graft_theta_bounds takes (state[, numStdDevs]), got ${args.size} args")
    })
  }
}
