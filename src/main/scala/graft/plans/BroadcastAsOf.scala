package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.Partitioning
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types._

/** Native broadcast as-of join — the second whole-operator Catalyst
  * extension (SURVEY §7.3 ladder rung (c), same pattern as
  * [[TopKPerGroup]]).
  *
  * The composed as-of join ([[graft.ops.AsOf.asofJoin]]: tag → union →
  * running `last() ignoreNulls`) is the right fact-fact plan: one
  * shuffle of both inputs on the key. But when the build side is SMALL
  * — a rates table, account events, any slowly-changing dimension —
  * that shuffle moves the 100 TB probe side to meet kilobytes. This
  * operator is the as-of analog of a broadcast hash join: collect the
  * build side, sort each key's rows by timestamp once, broadcast, and
  * probe with an O(log n) binary search per row. The probe side is
  * NEVER exchanged (no required distribution), so the join runs at
  * scan speed with no shuffle anywhere in the plan.
  *
  * Use the composed form when the build side is fact-sized; Spark's
  * own BroadcastHashJoin draws the same line.
  */
object BroadcastAsOf {

  /** Logical node: output = left columns + a nullable struct of the
    * matched right row (same contract as the composed `__asof`). */
  case class Node(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTs: Expression,
      rightTs: Expression,
      asofAttr: Attribute,
      left: LogicalPlan,
      right: LogicalPlan) extends BinaryNode {
    override def output: Seq[Attribute] = left.output :+ asofAttr
    override def producedAttributes: AttributeSet = AttributeSet(asofAttr)
    /** The node consumes BOTH children's full outputs: left rows pass
      * through whole, and `asofAttr`'s struct type pins every right
      * column. Declaring this stops ColumnPruning from slimming the
      * children underneath the fixed struct schema (observed: a pruned
      * build side makes the stored rows shorter than the struct type —
      * field reads go out of alignment and return garbage). */
    override def references: AttributeSet =
      AttributeSet(left.output ++ right.output ++
        leftKeys.flatMap(_.references) ++ rightKeys.flatMap(_.references) ++
        leftTs.references ++ rightTs.references)
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): Node =
      copy(left = newLeft, right = newRight)
  }

  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case Node(lk, rk, lts, rts, a, l, r) =>
        Exec(lk, rk, lts, rts, a, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  case class Exec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTs: Expression,
      rightTs: Expression,
      asofAttr: Attribute,
      left: SparkPlan,
      right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] = left.output :+ asofAttr
    override def producedAttributes: AttributeSet = AttributeSet(asofAttr)
    // no required child distribution AT ALL: the probe side stays where
    // the scan put it (the whole point), the build side is collected
    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def simpleString(maxFields: Int): String =
      s"GraftBroadcastAsOf keys=[${leftKeys.mkString(", ")}]"

    /** Timestamp-ish eval → long; the engine's ts columns are
      * timestamp/long (extend the match to adopt more). */
    private def toLong(dt: DataType, v: Any): Long = dt match {
      case TimestampType | TimestampNTZType | LongType => v.asInstanceOf[Long]
      case IntegerType | DateType => v.asInstanceOf[Int].toLong
      case other => throw new UnsupportedOperationException(s"as-of ts type $other")
    }

    protected override def doExecute(): RDD[InternalRow] = {
      val leftOutput = left.output
      val lKeys = leftKeys
      val lTs = leftTs
      val asof = asofAttr
      // —— build: collect, group by key, sort each group by ts ——
      val rightOutput = right.output
      val keyProj = UnsafeProjection.create(rightKeys, rightOutput)
      val rTsBound = BindReferences.bindReference(rightTs, rightOutput)
      val rTsType = rTsBound.dataType
      val grouped = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      // misuse guard: the build side must be dimension-sized. Fail fast
      // with a redirect BEFORE the broadcast multiplies a fact-sized
      // build into every executor (BroadcastHashJoin draws the same
      // line with its byte threshold; rows are the natural unit here
      // because the build is re-grouped and sorted per key on the
      // driver). The composed AsOf.asofJoin is the fact-fact path.
      // Probe with executeTake(cap+1) rather than a full executeCollect:
      // the take stops pulling partitions once cap+1 rows arrive, so a
      // genuinely fact-sized build trips the guard without ever
      // materializing on the driver; an under-cap take IS the collect.
      val cap = math.min(org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.broadcastAsOf.maxBuildRows", "5000000").toLong,
        Int.MaxValue - 1L).toInt
      val collected = right.executeTake(cap + 1)
      require(collected.length <= cap,
        s"BroadcastAsOf build side exceeds $cap rows (cap): " +
        "this operator broadcasts a dimension-sized build; use " +
        "AsOf.asofJoin for fact-fact as-of joins, or raise " +
        "spark.graft.broadcastAsOf.maxBuildRows")
      collected.foreach { row =>
        val ts = rTsBound.eval(row)
        if (ts != null) { // a build row with no timestamp can never match
          val k = keyProj(row)
          var buf = grouped.get(k)
          if (buf == null) {
            buf = scala.collection.mutable.ArrayBuffer.empty[(Long, InternalRow)]
            grouped.put(k.copy(), buf)
          }
          buf += ((toLong(rTsType, ts), row.copy()))
        }
      }
      val builtMap = new java.util.HashMap[UnsafeRow, (Array[Long], Array[InternalRow])]()
      grouped.forEach { (k, buf) =>
        val sorted = buf.sortBy(_._1)
        builtMap.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      }
      val bc = sparkContext.broadcast(builtMap)
      // —— probe: binary search per row, no exchange ——
      left.execute().mapPartitions({ iter =>
        val built = bc.value
        val probeKey = UnsafeProjection.create(lKeys, leftOutput)
        val lTsBound = BindReferences.bindReference(lTs, leftOutput)
        val lTsType = lTsBound.dataType
        val outProj = UnsafeProjection.create(
          (leftOutput :+ asof).zipWithIndex.map { case (a, i) =>
            BoundReference(i, a.dataType, a.nullable)
          })
        val joined = new JoinedRow
        val wrap = new GenericInternalRow(1)
        iter.map { row =>
          var m: InternalRow = null
          val tsAny = lTsBound.eval(row)
          if (tsAny != null) {
            val entry = built.get(probeKey(row))
            if (entry != null) {
              val (tss, rows) = entry
              val probeTs = toLong(lTsType, tsAny)
              // greatest index with tss(i) <= probeTs
              var lo = 0
              var hi = tss.length - 1
              var best = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) <= probeTs) { best = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (best >= 0) m = rows(best)
            }
          }
          wrap.update(0, m)
          outProj(joined(row, wrap))
        }
      }, preservesPartitioning = true)
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): Exec =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent per-session registration (same pattern as TopKPerGroup). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(Strategy)) spark.experimental.extraStrategies = cur :+ Strategy
  }

  /** User-facing builder, mirroring [[graft.ops.AsOf.asofJoin]]'s
    * contract: left columns + `__asof` struct of the most recent right
    * row with `right.ts <= left.ts` per key (null when none). */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    ensureRegistered(spark)
    val lPlan = left.queryExecution.analyzed
    // self-join shape (both sides off the same scan): the analyzer
    // deduplicates the right child's exprIds underneath this node but
    // cannot rewrite the node's own captured key expressions — give the
    // right side fresh ids up front via an alias projection
    val rPlan0 = right.queryExecution.analyzed
    val rPlan =
      if (rPlan0.outputSet.intersect(lPlan.outputSet).isEmpty) rPlan0
      else right.select(right.columns.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*)
        .queryExecution.analyzed
    def resolve(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    // hard type guards: the probe's UnsafeRow hash lookup and the
    // long-domain ts compare are both silently wrong across types — an
    // int-vs-long key never matches (all-null __asof), and DateType
    // (days) probed against TimestampType (micros) compares different
    // units. Fail loudly instead.
    keys.foreach { k =>
      val (lt, rt) = (resolve(lPlan, k).dataType, resolve(rPlan, k).dataType)
      require(lt == rt,
        s"as-of key '$k' type mismatch: left $lt vs right $rt — cast one side first")
    }
    val tsFamily: DataType => Int = {
      case TimestampType | TimestampNTZType | LongType => 0 // micros/long domain
      case IntegerType | DateType => 1                      // days/int domain
      case other => throw new IllegalArgumentException(
        s"unsupported as-of timestamp type $other")
    }
    val (ltsT, rtsT) = (resolve(lPlan, leftTs).dataType, resolve(rPlan, rightTs).dataType)
    require(tsFamily(ltsT) == tsFamily(rtsT),
      s"as-of timestamp type mismatch: left $ltsT vs right $rtsT compare in " +
        "different units — cast one side first")
    val asofAttr = AttributeReference("__asof",
      StructType(rPlan.output.map(a =>
        StructField(a.name, a.dataType, a.nullable, a.metadata))),
      nullable = true)()
    Bridge.ofRows(spark, Node(
      keys.map(resolve(lPlan, _)), keys.map(resolve(rPlan, _)),
      resolve(lPlan, leftTs), resolve(rPlan, rightTs),
      asofAttr, lPlan, rPlan))
  }
}
