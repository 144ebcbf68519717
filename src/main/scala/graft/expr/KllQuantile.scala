package graft.expr

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** QUANTILE sketch states (round 12): the `quantileState` /
  * `quantileMerge` half of the reference-style AggregatingMergeTree
  * pattern (ClickHouse stores intermediate quantile states in MVs and
  * serves dashboards by merging them), built on the Datasketches KLL
  * doubles sketch already shipped with Spark (`datasketches-java`,
  * the library behind Spark's own `hll_sketch_agg`).
  *
  * Spark exposes NO mergeable-state quantile aggregate — its
  * `percentile_approx` keeps the GK summary internal to one
  * aggregation — so these are custom [[TypedImperativeAggregate]]s:
  *
  *  - [[KllDoublesAgg]] `(col, k)` → the serialized KLL state of the
  *    group's values (BinaryType) — the BUILD side, what a rollup
  *    stores per group;
  *  - [[KllMergeAgg]] `(state)` → the union of serialized states —
  *    the READ side, how coarser grains re-aggregate (KLL merge is
  *    associative/commutative with bounded rank error, the property
  *    that makes the partial mergeable);
  *  - [[KllQuantileEst]] `(state, q)` → the quantile estimate.
  *
  * Unlike the HLL member, KLL compaction is RANDOMIZED (public
  * Datasketches design: random offset per compaction), so routed and
  * single-pass estimates agree in RANK ERROR (±~1.65% at the default
  * k=200, 99% confidence), not bit-for-bit — the same contract
  * ClickHouse gives `quantileMerge` vs `quantile`. Specs therefore
  * pin the rank-error bound against the exact CDF on BOTH plans, and
  * the routed plan's shape (rollup scanned, fact not).
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: NumericType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_kll_agg needs a numeric input, got $dt")
    }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  private lazy val toDouble: Any => Double = child.dataType match {
    case DoubleType => v => v.asInstanceOf[Double]
    case FloatType => v => v.asInstanceOf[Float].toDouble
    case LongType => v => v.asInstanceOf[Long].toDouble
    case IntegerType => v => v.asInstanceOf[Int].toDouble
    case ShortType => v => v.asInstanceOf[Short].toDouble
    case ByteType => v => v.asInstanceOf[Byte].toDouble
    case _: DecimalType => v => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toDouble
    case dt => throw new IllegalStateException(s"unsupported input $dt")
  }

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(toDouble(v))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllDoublesAgg =
    copy(child = c)
}

/** Union of serialized KLL states — the read-side re-aggregation
  * ([[KllDoublesAgg]] builds them). Merging adopts the smallest k
  * among the inputs (the Datasketches contract), so states built at
  * one registered k merge at that k. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_kll_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kll_merge needs a binary KLL state, got ${child.dataType}")

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `graft_kll_quantile(state, q)` — the quantile estimate of a
  * serialized KLL state (NULL for an empty state, matching SQL
  * aggregate semantics on empty groups). */
case class KllQuantileEst(child: Expression, q: Double)
  extends UnaryExpression with CodegenFallback {

  require(q >= 0.0 && q <= 1.0, s"quantile rank must be in [0,1], got $q")

  override def prettyName: String = "graft_kll_quantile"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_kll_quantile needs a binary KLL state, got ${child.dataType}")

  override def nullSafeEval(state: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(state.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(q)
  }

  override protected def withNewChildInternal(c: Expression): KllQuantileEst =
    copy(child = c)
}

/** Column-DSL surface for the KLL family. */
object Kll {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge

  /** Per-group KLL state of a numeric column. */
  def agg(c: Column, k: Int = 200): Column =
    Bridge.column(KllDoublesAgg(Bridge.expressionEager(c), k)
      .toAggregateExpression())

  /** Union of KLL states. */
  def merge(c: Column, k: Int = 200): Column =
    Bridge.column(KllMergeAgg(Bridge.expressionEager(c), k)
      .toAggregateExpression())

  /** Quantile estimate of a KLL state. */
  def quantile(c: Column, q: Double): Column =
    Bridge.column(KllQuantileEst(Bridge.expressionEager(c), q))

  /** SQL surface: `graft_kll_agg(v[, k])`, `graft_kll_merge(st[, k])`,
    * `graft_kll_quantile(st, q)` — q and k must be foldable literals
    * (the sketch precision and rank are plan-time parameters). Bare
    * aggregate functions are wrapped by the analyzer. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    def lit(e: Expression): Any = e match {
      case Literal(v, _) => v
      case other => throw new IllegalArgumentException(
        s"expected a literal parameter, got ${other.sql}")
    }
    def intOf(e: Expression): Int = lit(e) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"expected an int, got $other")
    }
    def doubleOf(e: Expression): Double = lit(e) match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case other => throw new IllegalArgumentException(s"expected a double, got $other")
    }
    Bridge.registerFunction(spark, "graft_kll_agg", {
      case Seq(c) => KllDoublesAgg(c)
      case Seq(c, k) => KllDoublesAgg(c, intOf(k))
      case args => throw new IllegalArgumentException(
        s"graft_kll_agg takes (value[, k]), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_kll_merge", {
      case Seq(c) => KllMergeAgg(c)
      case Seq(c, k) => KllMergeAgg(c, intOf(k))
      case args => throw new IllegalArgumentException(
        s"graft_kll_merge takes (state[, k]), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_kll_quantile", {
      case Seq(c, q) => KllQuantileEst(c, doubleOf(q))
      case args => throw new IllegalArgumentException(
        s"graft_kll_quantile takes (state, q), got ${args.size} args")
    })
  }
}
