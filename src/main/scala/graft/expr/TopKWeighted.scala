package graft.expr

import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** WEIGHTED frequent items (round 15) — ClickHouse's
  * `topKWeighted(k)(item, weight)`: the heaviest items by SUMMED
  * WEIGHT, not row count — "top users by volume", "top pages by
  * bytes" — which Spark's `approx_top_k` (count-only) cannot answer.
  * Built on the Datasketches frequent-items sketch (`LongsSketch`),
  * whose `update(item, count)` is exactly a weighted increment and
  * whose merge is the member-wise sum of the two sketches' weight
  * maps.
  *
  * The trio, mirroring the other sketch families:
  *  - [[TopKWeightedAgg]] `(item, weight, maxMapSize)` → the group's
  *    serialized weighted-frequency state (items integral; weights
  *    non-negative longs — scale fractional weights to integer units
  *    first, e.g. cents);
  *  - [[TopKWeightedMergeAgg]] `(state, maxMapSize)` → the sum-merge
  *    across rows (re-aggregation at any regrouping);
  *  - [[TopKWeightedEstimate]] `(state, k)` → the top-k
  *    `array<struct<item, weight>>`, ordered (weight DESC, item ASC)
  *    — a TOTAL order, so results are deterministic wherever the
  *    sketch is exact.
  *
  * Honest precision contract (the [[graft.plans.RollupRouting.TopKOf]]
  * member's, weighted): EXACT while a group's distinct items stay
  * under ~0.75 × maxMapSize; above that, estimates carry the sketch's
  * published error (≤ 3.5 × totalWeight / maxMapSize) and the
  * returned weights are upper-bound estimates under
  * NO_FALSE_NEGATIVES. The merge is deterministic in the exact regime
  * (a pure weight-map sum). */
case class TopKWeightedAgg(
    left: Expression,
    right: Expression,
    maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with BinaryLike[Expression] {

  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two ≥ 8, got $maxMapSize")

  override def prettyName: String = "graft_topk_weighted_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType,
            ByteType | ShortType | IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_topk_weighted_agg needs integral (item, weight), got ($l, $r) — " +
            "scale fractional weights to integer units first")
    }

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val item = left.eval(input)
    val w = right.eval(input)
    if (item != null && w != null) {
      val weight = asLong(w)
      if (weight < 0)
        throw new IllegalArgumentException(
          s"graft_topk_weighted_agg weight must be non-negative, got $weight")
      if (weight > 0) buffer.update(asLong(item), weight)
    }
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray
  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): TopKWeightedAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKWeightedAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : TopKWeightedAgg = copy(left = l, right = r)
}

/** Sum-merge of serialized weighted-frequency states across rows. */
case class TopKWeightedMergeAgg(
    child: Expression,
    maxMapSize: Int = 1024,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongsSketch] with UnaryLike[Expression] {

  override def prettyName: String = "graft_topk_weighted_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk_weighted_merge needs a binary state, got ${child.dataType}")

  override def createAggregationBuffer(): LongsSketch = new LongsSketch(maxMapSize)

  override def update(buffer: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(LongsSketch.getInstance(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: LongsSketch, other: LongsSketch): LongsSketch =
    buffer.merge(other)

  override def eval(buffer: LongsSketch): Any = buffer.toByteArray
  override def serialize(buffer: LongsSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    LongsSketch.getInstance(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): TopKWeightedMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKWeightedMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TopKWeightedMergeAgg =
    copy(child = c)
}

/** `graft_topk_weighted(state, k)` — the top-k items by summed weight
  * as `array<struct<item: long, weight: long>>`, totally ordered
  * (weight DESC, item ASC). NO_FALSE_NEGATIVES: in the estimation
  * regime every true heavy hitter appears (weights are estimates);
  * in the exact regime this IS the exact weighted top-k. */
case class TopKWeightedEstimate(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1, s"k must be positive, got $k")

  override def prettyName: String = "graft_topk_weighted"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("weight", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_topk_weighted needs a binary state, got ${child.dataType}")

  override def nullSafeEval(state: Any): Any = {
    val sk = LongsSketch.getInstance(Memory.wrap(state.asInstanceOf[Array[Byte]]))
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k)
      .map { r =>
        org.apache.spark.sql.catalyst.InternalRow(r.getItem, r.getEstimate)
      }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): TopKWeightedEstimate =
    copy(child = c)
}

/** Column-DSL + SQL surface for the weighted top-k family. */
object TkW {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge

  def agg(item: Column, weight: Column, maxMapSize: Int = 1024): Column =
    Bridge.column(TopKWeightedAgg(Bridge.expressionEager(item),
      Bridge.expressionEager(weight), maxMapSize).toAggregateExpression())
  def merge(c: Column, maxMapSize: Int = 1024): Column =
    Bridge.column(TopKWeightedMergeAgg(Bridge.expressionEager(c), maxMapSize)
      .toAggregateExpression())
  def topK(c: Column, k: Int): Column =
    Bridge.column(TopKWeightedEstimate(Bridge.expressionEager(c), k))

  /** SQL surface: `graft_topk_weighted_agg(item, w[, maxMapSize])`,
    * `graft_topk_weighted_merge(st[, maxMapSize])`,
    * `graft_topk_weighted(st, k)`. */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def intOf(e: Expression): Int = e match {
      case Literal(i: Int, _) => i
      case other => throw new IllegalArgumentException(
        s"expected an int literal, got ${other.sql}")
    }
    Bridge.registerFunction(spark, "graft_topk_weighted_agg", {
      case Seq(i, w) => TopKWeightedAgg(i, w)
      case Seq(i, w, m) => TopKWeightedAgg(i, w, intOf(m))
      case args => throw new IllegalArgumentException(
        s"graft_topk_weighted_agg takes (item, weight[, maxMapSize]), got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_topk_weighted_merge", {
      case Seq(c) => TopKWeightedMergeAgg(c)
      case Seq(c, m) => TopKWeightedMergeAgg(c, intOf(m))
      case args => throw new IllegalArgumentException(
        s"graft_topk_weighted_merge takes (state[, maxMapSize]), got ${args.size}")
    })
    Bridge.registerFunction(spark, "graft_topk_weighted", {
      case Seq(c, k) => TopKWeightedEstimate(c, intOf(k))
      case args => throw new IllegalArgumentException(
        s"graft_topk_weighted takes (state, k), got ${args.size}")
    })
  }
}
