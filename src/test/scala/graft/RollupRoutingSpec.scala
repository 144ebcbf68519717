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
