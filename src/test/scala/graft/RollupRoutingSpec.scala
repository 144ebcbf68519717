package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RollupRouting
import graft.streaming.Live

/** Transparent MV routing (SURVEY §4 stretch): queries on the raw table
  * silently re-aggregate the partial-state rollup. */
class RollupRoutingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  private def withRouting[A](f: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toString
    Live.maintainDailyRollup(spark, sf, s"$dir/rollup")
    RollupRouting.register(RollupRouting.Spec("events.parquet", s"$dir/rollup"))
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try f finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("daily query is routed to the rollup and matches the raw answer") {
    val plain = graft.ops.Rollups.daily(spark, sf).collect().toSeq
    withRouting {
      val routed = graft.ops.Rollups.daily(spark, sf)
      val scan = routed.queryExecution.executedPlan.toString
      assert(scan.contains("rollup"), s"expected rollup scan in:\n$scan")
      assert(routed.collect().toSeq == plain)
    }
  }

  test("coarser grain (day only) also routes and stays correct") {
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
      .orderBy("day")
    val plain = q().collect().toSeq
    withRouting {
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("rollup"))
      assert(routed.collect().toSeq == plain)
    }
  }

  test("min/max route through the rollup's min/max partials") {
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(min($"value").as("mn"), max($"value").as("mx"),
           count(lit(1)).as("c"))
      .orderBy("day")
    val plain = q().collect().toSeq
    withRouting {
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("rollup"))
      assert(routed.collect().toSeq == plain)
    }
  }

  /** The q16/q143 MV pair: the persisted (orderkey, segment) rollup must
    * answer revenue-by-segment exactly (same oracle as the live 3-table
    * join), its read plan must be join-free, and its partials must be
    * additive — batch-wise appends re-aggregate to the same answer, the
    * insert-maintenance invariant. */
  test("revenue-segment rollup: join-free read, exact, additive across batches") {
    import graft.ops.StarJoins
    val live = StarJoins.revenueBySegment(spark, sf).collect().toSeq
    val viaRollup = StarJoins.revenueSegmentViaRollup(spark, sf)
    // read side: one rollup scan, zero joins, no lineitem
    val readPlan = viaRollup.queryExecution.executedPlan.toString
    assert(readPlan.contains("revseg_rollup"), s"expected rollup scan in:\n$readPlan")
    assert(!readPlan.toLowerCase.contains("join"), s"read plan must be join-free:\n$readPlan")
    assert(!readPlan.contains("lineitem"), s"read plan must not scan the fact:\n$readPlan")
    assert(viaRollup.collect().toSeq == live)
    // additivity: build the same rollup in two appended halves → same answer
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_revseg_inc").toString
    StarJoins.revenueSegmentPartialsOf(li.filter($"l_orderkey" % 2 === 0), o, c)
      .write.mode("append").parquet(dir)
    StarJoins.revenueSegmentPartialsOf(li.filter($"l_orderkey" % 2 =!= 0), o, c)
      .write.mode("append").parquet(dir)
    assert(StarJoins.readRevenueSegmentRollup(spark, dir).collect().toSeq == live)
  }

  /** Transparent answering-queries-using-views over a JOIN: with the
    * revenue-segment rollup registered, the RAW 3-table query is
    * rewritten to a join-free rollup re-aggregation — and near-miss
    * shapes (extra filter, different aggregate, different grouping) are
    * left on the live join. */
  test("aggregate-over-join routes to the registered join rollup; near-misses don't") {
    import graft.ops.StarJoins
    val plain = StarJoins.revenueBySegment(spark, sf).collect().toSeq
    // build + register the join rollup
    StarJoins.revenueSegmentViaRollup(spark, sf).collect()
    RollupRouting.registerJoin(
      RollupRouting.JoinSpec(StarJoins.revenueSegmentRollupDir(sf)))
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = StarJoins.revenueBySegment(spark, sf)
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("revseg_rollup"), s"expected rollup scan in:\n$plan")
      assert(!plan.toLowerCase.contains("join"), s"routed plan must be join-free:\n$plan")
      assert(routed.collect().toSeq == plain)
      // global grain (no GROUP BY) also routes and re-aggregates exactly
      val globalQ = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, sf)), col("o_custkey") === col("c_custkey"))
        .agg(graft.ops.Fns.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
             countDistinct($"o_orderkey").as("n_orders"),
             count(lit(1)).as("n_lines"))
      assert(globalQ.queryExecution.executedPlan.toString.contains("revseg_rollup"))
      val globalRow = globalQ.collect().head
      assert(globalRow.getLong(1) == plain.map(_.getLong(2)).sum) // n_orders
      assert(globalRow.getLong(2) == plain.map(_.getLong(3)).sum) // n_lines
      assert(math.abs(globalRow.getDouble(0) - plain.map(_.getDouble(1)).sum) < 1e-6)
      // near-miss: a filter below the aggregate → live join stays
      val filtered = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, sf)), col("o_custkey") === col("c_custkey"))
        .filter($"o_orderpriority" === "1-URGENT")
        .groupBy($"c_mktsegment")
        .agg(graft.ops.Fns.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
      assert(!filtered.queryExecution.executedPlan.toString.contains("revseg_rollup"))
      // near-miss: different aggregate (avg) → live join stays
      val avgq = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, sf)), col("o_custkey") === col("c_custkey"))
        .groupBy($"c_mktsegment").agg(avg($"l_quantity"))
      assert(!avgq.queryExecution.executedPlan.toString.contains("revseg_rollup"))
      // near-miss: grouping by another column → live join stays
      val byPrio = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, sf)), col("o_custkey") === col("c_custkey"))
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      assert(!byPrio.queryExecution.executedPlan.toString.contains("revseg_rollup"))
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("ineligible queries are left untouched") {
    withRouting {
      // filter below the aggregate → must scan raw
      val filtered = Tables.events(spark, sf)
        .filter($"event_type" === "purchase")
        .groupBy(to_date($"ts").as("day")).agg(sum($"value"))
      assert(!filtered.queryExecution.executedPlan.toString.contains("rollup"))
      // unsupported aggregate (avg: not losslessly decomposable from
      // decimal partials) → must scan raw
      val avgq = Tables.events(spark, sf)
        .groupBy(to_date($"ts").as("day")).agg(avg($"value"))
      assert(!avgq.queryExecution.executedPlan.toString.contains("rollup"))
      // unsupported grouping column → must scan raw
      val byType = Tables.events(spark, sf)
        .groupBy($"event_type").agg(count(lit(1)))
      assert(!byType.queryExecution.executedPlan.toString.contains("rollup"))
    }
  }
}
