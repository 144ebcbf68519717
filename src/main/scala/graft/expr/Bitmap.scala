package graft.expr

import java.io.{DataInputStream, DataOutputStream, ByteArrayInputStream, ByteArrayOutputStream}

import org.roaringbitmap.longlong.Roaring64Bitmap
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** EXACT-DISTINCT bitmap states (round 15): ClickHouse's
  * `groupBitmapState` / `groupBitmapMerge` — the AggregatingMergeTree
  * member that answers exact `COUNT(DISTINCT int_col)` from MV state
  * at ANY cardinality (the reference's `uniq()` dashboards want
  * approximate; uniqExact dashboards previously rode the
  * [[graft.plans.RollupRouting.SetOf]] array states, whose per-group
  * state grows 8-16 bytes per member plus array-merge cost — the one
  * perf-weak family the round-14 audit left, q217 measured 5.8× at
  * ×100 at 600 k distinct members).
  *
  * A compressed bitmap IS the distinct set of an integral column:
  * set-union is bitwise OR (associative, commutative, idempotent), so
  * per-group partials merge losslessly at any regrouping — coarser
  * grains, grouping-set subtotals, the hybrid tail — and the
  * cardinality is EXACT, not a sketch estimate. ClickHouse implements
  * this with CRoaring; Spark ships the same data structure
  * (RoaringBitmap, used by its own shuffle MapStatus tracking), so the
  * member builds on [[Roaring64Bitmap]] — the 64-bit variant, keys the
  * full long domain including negatives (stored as unsigned). State
  * size is ~2 bytes per distinct value worst-case and FAR less on
  * clustered id spaces (runs compress to constants), vs 8+ bytes per
  * value in a `collect_set` array — and the union is word-parallel OR,
  * not an array distinct-flatten.
  *
  * Three functions, mirroring the KLL trio's split ([[KllDoublesAgg]]):
  *
  *  - [[BitmapAgg]] `(intCol)` → the group's serialized bitmap
  *    (BinaryType) — the BUILD side, what a rollup stores per group;
  *  - [[BitmapMergeAgg]] `(state)` → the OR-union of serialized
  *    states — the READ side, how coarser grains re-aggregate;
  *  - [[BitmapCardinality]] `(state)` → the exact distinct count.
  *
  * Unlike HLL/KLL there is no precision parameter: every state is
  * exact, so any two states of the same column merge. NULLs never
  * enter the bitmap (SQL count-distinct semantics). Non-integral
  * columns are refused at type-check: a bitmap of doubles or strings
  * would need a hash first, which silently trades exactness for
  * collision risk — the honest members for those are the set state
  * (exact, array-sized) and the HLL state (bounded, approximate).
  */
object Bitmap {
  private[expr] def serializeBitmap(b: Roaring64Bitmap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream(math.max(32, b.serializedSizeInBytes().toInt))
    val out = new DataOutputStream(bos)
    b.serialize(out)
    out.flush()
    bos.toByteArray
  }
  private[expr] def deserializeBitmap(bytes: Array[Byte]): Roaring64Bitmap = {
    val b = new Roaring64Bitmap()
    b.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    b
  }
  private[expr] def integralCheck(fn: String, dt: DataType)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$fn needs an integral input (byte/short/int/long) — a bitmap of " +
          s"$other would hash first and lose exactness; use the set or HLL member")
  }
}

/** Per-group exact-distinct bitmap state of an integral column. */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    Bitmap.integralCheck(prettyName, child.dataType)

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  private lazy val toLong: Any => Long = child.dataType match {
    case LongType => v => v.asInstanceOf[Long]
    case IntegerType => v => v.asInstanceOf[Int].toLong
    case ShortType => v => v.asInstanceOf[Short].toLong
    case ByteType => v => v.asInstanceOf[Byte].toLong
    case dt => throw new IllegalStateException(s"unsupported input $dt")
  }

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(toLong(v))
    buffer
  }

  override def merge(buffer: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64Bitmap): Any = Bitmap.serializeBitmap(buffer)
  override def serialize(buffer: Roaring64Bitmap): Array[Byte] =
    Bitmap.serializeBitmap(buffer)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    Bitmap.deserializeBitmap(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapAgg =
    copy(child = c)
}

/** OR-union of serialized bitmap states — the read-side re-aggregation
  * ([[BitmapAgg]] builds them). Union of exact sets is the exact set
  * of the union, so routed ≡ live holds BIT-FOR-BIT at any regrouping
  * (the serialized form is canonical after `runOptimize`). */
case class BitmapMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap_merge"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_merge needs a binary bitmap state, got ${child.dataType}")

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(buffer: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buffer.or(Bitmap.deserializeBitmap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    buffer.or(other)
    buffer
  }

  override def eval(buffer: Roaring64Bitmap): Any = Bitmap.serializeBitmap(buffer)
  override def serialize(buffer: Roaring64Bitmap): Array[Byte] =
    Bitmap.serializeBitmap(buffer)
  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    Bitmap.deserializeBitmap(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMergeAgg =
    copy(child = c)
}

/** AND-intersection of serialized bitmap states — ClickHouse's
  * `groupBitmapAnd`: "members present in EVERY state", the cohort
  * read (users active on day 1 AND day 7 = intersect the two day
  * states; its cardinality is the retention numerator). Intersection
  * is associative/commutative, so the aggregate is order-proof — but
  * NOT subtotal-safe across regroupings (AND over a different row
  * partition intersects different operands), so the router never maps
  * it onto coarser grains; it is a READ over states at their own
  * grain. Empty input yields the empty bitmap — the identity choice
  * (an all-ones identity does not exist in an unbounded domain), so
  * `AND` of zero states counts 0, matching "no cohort evidence". */
case class BitmapIntersectAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Roaring64Bitmap]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_bitmap_intersect"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_intersect needs a binary bitmap state, got ${child.dataType}")

  // None = "no state seen yet" (the AND identity), distinct from an
  // empty bitmap (a seen-but-empty state, which annihilates)
  override def createAggregationBuffer(): Option[Roaring64Bitmap] = None

  override def update(buffer: Option[Roaring64Bitmap],
                      input: InternalRow): Option[Roaring64Bitmap] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = Bitmap.deserializeBitmap(v.asInstanceOf[Array[Byte]])
      buffer match {
        case None => Some(in)
        case Some(b) => b.and(in); Some(b)
      }
    }
  }

  override def merge(buffer: Option[Roaring64Bitmap],
                     other: Option[Roaring64Bitmap]): Option[Roaring64Bitmap] =
    (buffer, other) match {
      case (Some(b), Some(o)) => b.and(o); Some(b)
      case (some @ Some(_), None) => some
      case (None, o) => o
    }

  override def eval(buffer: Option[Roaring64Bitmap]): Any =
    Bitmap.serializeBitmap(buffer.getOrElse(new Roaring64Bitmap()))
  override def serialize(buffer: Option[Roaring64Bitmap]): Array[Byte] = buffer match {
    case None => Array.emptyByteArray // sentinel: identity, not empty-set
    case Some(b) => Bitmap.serializeBitmap(b)
  }
  override def deserialize(bytes: Array[Byte]): Option[Roaring64Bitmap] =
    if (bytes.isEmpty) None else Some(Bitmap.deserializeBitmap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): BitmapIntersectAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapIntersectAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapIntersectAgg =
    copy(child = c)
}

/** `graft_bitmap_count(state)` — the EXACT cardinality of a serialized
  * bitmap state. */
case class BitmapCardinality(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "graft_bitmap_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_count needs a binary bitmap state, got ${child.dataType}")

  override def nullSafeEval(state: Any): Any =
    Bitmap.deserializeBitmap(state.asInstanceOf[Array[Byte]]).getLongCardinality

  override protected def withNewChildInternal(c: Expression): BitmapCardinality =
    copy(child = c)
}

/** `graft_bitmap_and(a, b)` — the AND of two serialized bitmap states
  * as a state (round 16): the scalar pair form of
  * [[BitmapIntersectAgg]], for reads that intersect one row's state
  * against another column of the SAME row (condition-based retention
  * cells; the theta family's [[ThetaAndPair]] twin). Exact. */
case class BitmapAndPair(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with CodegenFallback {

  override def prettyName: String = "graft_bitmap_and"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_and needs two binary bitmap states, got " +
          s"${left.dataType}, ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = Bitmap.deserializeBitmap(a.asInstanceOf[Array[Byte]])
    x.and(Bitmap.deserializeBitmap(b.asInstanceOf[Array[Byte]]))
    Bitmap.serializeBitmap(x)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : BitmapAndPair = copy(left = l, right = r)
}

/** Column-DSL + SQL surface for the bitmap family. */
object Bmp {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.graftx.Bridge

  /** The serialized EMPTY bitmap state — the OR identity and the AND
    * annihilator. Cohort reads coalesce a MISSING group's state to it
    * so "day with no events" means "no members" (cells intersecting
    * it become 0), never "skip the day" (which would silently return
    * the other side's full cardinality). A fresh copy per call: the
    * array gets embedded by reference into Literal nodes, so a shared
    * mutable instance would let one accidental mutation corrupt every
    * retention plan built after it (round 17, review finding). */
  private val emptyBytes: Array[Byte] =
    Bitmap.serializeBitmap(new Roaring64Bitmap())
  def empty: Array[Byte] = emptyBytes.clone()

  /** Per-group exact-distinct bitmap state of an integral column. */
  def agg(c: Column): Column =
    Bridge.column(BitmapAgg(Bridge.expressionEager(c)).toAggregateExpression())

  /** OR-union of bitmap states. */
  def merge(c: Column): Column =
    Bridge.column(BitmapMergeAgg(Bridge.expressionEager(c)).toAggregateExpression())

  /** AND-intersection of bitmap states (the cohort read). */
  def intersect(c: Column): Column =
    Bridge.column(BitmapIntersectAgg(Bridge.expressionEager(c)).toAggregateExpression())

  /** Exact cardinality of a bitmap state. */
  def count(c: Column): Column =
    Bridge.column(BitmapCardinality(Bridge.expressionEager(c)))

  /** Scalar AND of two bitmap states (the pair form of [[intersect]]). */
  def and(a: Column, b: Column): Column =
    Bridge.column(BitmapAndPair(Bridge.expressionEager(a), Bridge.expressionEager(b)))

  /** SQL surface: `graft_bitmap_agg(v)`, `graft_bitmap_merge(st)`,
    * `graft_bitmap_intersect(st)`, `graft_bitmap_count(st)`. */
  def register(spark: SparkSession): Unit = {
    Bridge.registerFunction(spark, "graft_bitmap_agg", {
      case Seq(c) => BitmapAgg(c)
      case args => throw new IllegalArgumentException(
        s"graft_bitmap_agg takes (value), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_bitmap_merge", {
      case Seq(c) => BitmapMergeAgg(c)
      case args => throw new IllegalArgumentException(
        s"graft_bitmap_merge takes (state), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_bitmap_intersect", {
      case Seq(c) => BitmapIntersectAgg(c)
      case args => throw new IllegalArgumentException(
        s"graft_bitmap_intersect takes (state), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_bitmap_count", {
      case Seq(c) => BitmapCardinality(c)
      case args => throw new IllegalArgumentException(
        s"graft_bitmap_count takes (state), got ${args.size} args")
    })
    Bridge.registerFunction(spark, "graft_bitmap_and", {
      case Seq(a, b) => BitmapAndPair(a, b)
      case args => throw new IllegalArgumentException(
        s"graft_bitmap_and takes (a, b), got ${args.size} args")
    })
  }
}
