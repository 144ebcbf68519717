package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{Advisor, RollupRouting}
import graft.ops.{Rollups, StarJoins}

/** MV advisor (round 12): the registry's specs INFERRED from the raw
  * workload — view selection scoped to the router's lossless
  * vocabulary. Advised specs must be exactly what a human would have
  * registered: build, register, and the unchanged queries route and
  * hash-match their live answers. */
class AdvisorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  private def routedWith(advice: Advisor.Advice)(f: => Unit): Unit = {
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try f finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("orders dashboard advises one daily spec; the unchanged query routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise").toString
    val q = () => Rollups.ordersDailySalesRaw(spark, sf)
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.joins.isEmpty && advice.singles.size == 1)
    val spec = advice.singles.head.spec
    assert(spec.sourceSuffix == "orders.parquet")
    assert(spec.grain == "day" && spec.timeCol == "o_orderdate")
    // the year-window filter references only the time column, so no
    // extra keys: the advised rollup is day-grain only
    assert(spec.keyCols.isEmpty, spec.keyCols)
    val plain = q().collect().toSeq
    routedWith(advice) {
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("orders_advised"))
      assert(routed.collect().toSeq == plain)
    }
  }

  /** r14, cost-aware merging: pooling the keyless hourly count with a
    * user-keyed daily rollup would put the count's read on a rollup
    * whose rows grow with the user count, so the advisor emits
    * per-grain specs; each unchanged query routes through its own. */
  test("a keyed + keyless workload advises per-grain specs answering all") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_ev").toString
    val daily = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"user_id")
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
      .orderBy("day", "user_id")
    val hourly = () => Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("c"))
      .orderBy("h")
    val advice = Advisor.advise(Seq(daily(), hourly()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.size == 2 && advice.splits.nonEmpty, advice)
    val byKeys = advice.singles.map(_.spec).groupBy(_.keyCols.keySet)
    val keyed = byKeys(Set("user_id")).head
    val keyless = byKeys(Set.empty[String]).head
    assert(keyed.grain == "day" && keyless.grain == "hour",
      s"each spec lands at its demand's natural grain: ${advice.singles.map(_.spec)}")
    val plainDaily = daily().collect().toSeq
    val plainHourly = hourly().collect().toSeq
    routedWith(advice) {
      for ((q, plain) <- Seq(daily -> plainDaily, hourly -> plainHourly)) {
        val routed = q()
        assert(routed.queryExecution.executedPlan.toString.contains("events_advised"),
          s"must route:\n${routed.queryExecution.executedPlan}")
        assert(routed.collect().toSeq == plain)
      }
    }
  }

  /** r15: the grain-claim → bitmap swap. A split-forcing integral
    * COUNT(DISTINCT) pools into the calendar-sized spec as a bitmap
    * member (one MV for the distinct AND volume dashboards); a
    * non-integral claim keeps the r14 behavior — its own spec, the
    * claim intact (bitmaps need integral inputs). */
  test("split-forcing integral grain claims swap to bitmap members and pool") {
    import graft.plans.RollupRouting.{BitmapUniqOf, CountDistinctGrain}
    val root = java.nio.file.Files.createTempDirectory("graft_advise_swap").toString
    val qA = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n"))
      .orderBy("day")
    val qB = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(graft.ops.Fns.dsum($"value").as("volume"))
      .orderBy("day")
    val advice = Advisor.advise(Seq(qA(), qB()), root)
    assert(advice.skipped.isEmpty && advice.singles.size == 1,
      s"the swap must pool one calendar-sized spec: $advice")
    val spec = advice.singles.head.spec
    assert(spec.keyCols.isEmpty && spec.grain == "day", spec)
    assert(spec.aggs.exists {
        case BitmapUniqOf(_, _) => true; case _ => false }, spec.aggs)
    assert(advice.splits.exists(_.contains("bitmap")), advice.splits)
    val truthA = qA().collect().toSeq
    val truthB = qB().collect().toSeq
    routedWith(advice) {
      for ((q, truth) <- Seq(qA -> truthA, qB -> truthB)) {
        val routed = q()
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("advise_swap") && !plan.contains("events.parquet"),
          s"both dashboards must read the pooled spec:\n$plan")
        assert(routed.collect().toSeq == truth)
      }
    }
    // non-integral claim: no bitmap exists for strings — the r14
    // behavior holds (two specs, the claim kept on its own)
    val root2 = java.nio.file.Files.createTempDirectory("graft_advise_noswap").toString
    val qC = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(countDistinct($"event_type").as("n_types"))
    val advice2 = Advisor.advise(Seq(qC(), qB()), root2)
    assert(advice2.singles.size == 2, s"a string claim must not swap: $advice2")
    assert(advice2.singles.flatMap(_.spec.aggs).exists {
        case CountDistinctGrain("event_type") => true; case _ => false }, advice2)
  }

  test("three star dashboards advise per-grain join MVs answering all three") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_star").toString
    val qs: Seq[() => org.apache.spark.sql.DataFrame] = Seq(
      () => StarJoins.revenueBySegment(spark, sf),
      () => StarJoins.chargeBySegment(spark, sf),
      () => StarJoins.segmentQtyStats(spark, sf))
    val advice = Advisor.advise(qs.map(_()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    // r14 cost-aware merge on the JOIN path: revenue's per-order
    // grain would inflate the segment-only reads ~orders-fold, so
    // the workload advises TWO MVs at their natural grains
    assert(advice.singles.isEmpty && advice.joins.size == 2, advice)
    assert(advice.splits.exists(_.contains("join MVs")), advice.splits)
    val byGrain = advice.joins.map(_.spec).groupBy(_.grainCols.nonEmpty)
    val orderGrain = byGrain(true).head
    val segGrain = byGrain(false).head
    assert(orderGrain.tables == Set("lineitem", "orders", "customer"))
    assert(orderGrain.groupings == Map("c_mktsegment" -> "c_mktsegment"))
    // revenue's COUNT(DISTINCT o_orderkey) pins the per-order grain
    // and its claim — on ITS OWN MV only
    assert(orderGrain.grainCols == Map("o_orderkey" -> "o_orderkey"))
    assert(orderGrain.aggs.exists {
      case RollupRouting.CountDistinctGrain("o_orderkey") => true; case _ => false })
    assert(segGrain.groupings == Map("c_mktsegment" -> "c_mktsegment"))
    assert(segGrain.aggs.exists {
      case RollupRouting.SumOf(_: RollupRouting.ExprPat, _) => true; case _ => false },
      "the charge measure must register as an ExprPat")
    assert(segGrain.aggs.exists {
      case RollupRouting.AvgOf("l_quantity", _, _) => true; case _ => false })
    val plains = qs.map(q => q().collect().toSeq)
    routedWith(advice) {
      qs.zip(plains).foreach { case (q, plain) =>
        val routed = q()
        // the display string truncates long scan paths, so match the
        // root dir name rather than the rollup's "_advised" suffix
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("graft_advise_star"), s"must route:\n$plan")
        assert(routed.collect().toSeq == plain)
      }
    }
  }

  test("a by-date star dashboard advises a (date, segment)-grain merge-built MV") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_dated").toString
    val q = () => StarJoins.revenueByDaySegment(spark, sf)
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.joins.size == 1, advice)
    val spec = advice.joins.head.spec
    // the DATE grouping registers as a preserved column; no per-order
    // grain, so the build MERGES to exactly the dashboard's grain
    assert(spec.groupings == Map("o_orderdate" -> "o_orderdate",
                                 "c_mktsegment" -> "c_mktsegment"))
    assert(spec.grainCols.isEmpty)
    val plain = q().collect().toSeq
    routedWith(advice) {
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("graft_advise_dated"))
      assert(routed.collect().toSeq == plain)
    }
    // a TRUNCATING time grouping over a join (to_date of a TIMESTAMP
    // — a real day cut, not an identity) advises a TimeGrainPat key
    // (round 12); a truncation of a SHIFTED timestamp still cannot
    val truncating = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(to_date(col("ts")).as("day"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val advice2 = Advisor.advise(Seq(truncating), root)
    assert(advice2.skipped.isEmpty && advice2.joins.size == 1 &&
      advice2.joins.head.spec.timeGroupings ==
        Seq(RollupRouting.TimeGrainPat("day", "ts") -> "ts_day"), advice2)
    val shifted = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(to_date(col("ts") + expr("INTERVAL 1 HOUR")).as("day"),
               col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))
    val advice3 = Advisor.advise(Seq(shifted), root)
    assert(advice3.joins.isEmpty &&
      advice3.skipped.exists(_.contains("unmappable grouping")), advice3)
  }

  test("hour + day star dashboards merge into one hourly time-grain join MV") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_hr").toString
    def hourly = Tables.events(spark, sf)
      .join(broadcast(Tables.customer(spark, sf)), col("user_id") === col("c_custkey"))
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("c_mktsegment"))
      .agg(graft.ops.Fns.dsum(col("value")).as("sum_value"), count(lit(1)).as("n"))
      .orderBy("hour", "c_mktsegment")
    def daily = StarJoins.eventsSegmentDaily(spark, sf)
    val advice = Advisor.advise(Seq(hourly, daily), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.joins.size == 1, advice)
    val spec = advice.joins.head.spec
    // merged at the FINEST demanded grain, segment preserved, both
    // measures pooled into one partial block
    assert(spec.timeGroupings ==
      Seq(RollupRouting.TimeGrainPat("hour", "ts") -> "ts_hour"), spec)
    assert(spec.groupings == Map("c_mktsegment" -> "c_mktsegment"), spec)
    val plainHourly = hourly.collect().toSeq
    val plainDaily = daily.collect().toSeq
    routedWith(advice) {
      val rh = hourly
      val rd = daily
      assert(rh.queryExecution.executedPlan.toString.contains("graft_advise_hr"),
        "the hourly dashboard must route onto the advised MV")
      assert(rd.queryExecution.executedPlan.toString.contains("graft_advise_hr"),
        "the daily dashboard must route via truncation composition")
      assert(rh.collect().toSeq == plainHourly)
      assert(rd.collect().toSeq == plainDaily)
    }
  }

  /** The declare-NOTHING lifecycle: the spec is mined from the raw
    * dashboard, survives the JSON catalog, is maintained by the
    * streaming maintainer across a restart, and the unchanged query
    * hybrid-routes through it — no human wrote any registration. */
  test("advised spec persists, reloads, stream-maintains, and hybrid-routes") {
    val base = java.nio.file.Files.createTempDirectory("graft_advlife")
    val q = () => Rollups.ordersDailySalesRaw(spark, sf)
    val advice = Advisor.advise(Seq(q()), base.resolve("mv").toString)
    assert(advice.singles.size == 1, advice)
    val spec = advice.singles.head.spec
    // catalog round trip FIRST: everything downstream uses the
    // reloaded registration, not the advised object
    RollupRouting.clear()
    RollupRouting.register(spec)
    val reg = base.resolve("registry.json").toString
    RollupRouting.saveRegistry(reg)
    RollupRouting.clear()
    RollupRouting.loadRegistry(spark, reg)
    val reloaded = RollupRouting.registered.head
    assert(reloaded == spec, "advised spec must round-trip the catalog")
    RollupRouting.clear()
    // stream-maintain the advised rollup from two date-ordered
    // deliveries with a restart between (persistent checkpoint)
    val orders = Tables.orders(spark, sf)
    val srcDir = base.resolve("deliveries").toString
    val ckpt = base.resolve("ckpt").toString
    val cut = to_date(lit("1996-01-01"))
    def drain(): Unit = graft.streaming.Live.maintainRollup(
      spark.readStream.schema(orders.schema).parquet(srcDir), reloaded,
      checkpointDir = Some(ckpt))
    orders.filter($"o_orderdate" < cut).write.mode("append").parquet(srcDir)
    drain()
    orders.filter($"o_orderdate" >= cut).write.mode("append").parquet(srcDir)
    drain()
    val plain = q().collect().toSeq
    RollupRouting.register(reloaded)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("graft_advlife"),
        s"the advised + maintained rollup must answer:\n$plan")
      assert(routed.collect().toSeq == plain,
        "hybrid rollup ∪ tail must equal the raw dashboard")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  /** r13: [[Advisor.adopt]] closes the loop the reference's
    * setup-analytics.sh does by hand — ONE call builds, registers,
    * persists the catalog, and installs the rule; the persisted JSON
    * alone re-wires a fresh registry; re-adopting is idempotent. */
  test("adopt() is the one-call create-and-wire: build + register + persist + route") {
    val base = java.nio.file.Files.createTempDirectory("graft_adopt")
    val q = () => Rollups.ordersDailySalesRaw(spark, sf)
    val jq = () => StarJoins.revenueByDaySegment(spark, sf)
    val plain = q().collect().toSeq
    val jPlain = jq().collect().toSeq
    // a MIXED workload: one single-table and one join demand adopt in
    // the same call, and both kinds round-trip the persisted catalog
    val advice = Advisor.advise(Seq(q(), jq()), base.resolve("mv").toString)
    assert(advice.singles.size == 1 && advice.joins.size == 1 &&
           advice.skipped.isEmpty, advice)
    val prev = spark.experimental.extraOptimizations
    try {
      val adopted = Advisor.adopt(spark, advice, base.resolve("registry.json").toString)
      assert(spark.experimental.extraOptimizations
        .exists(_.isInstanceOf[RollupRouting.RuleImpl]),
        "adopt must install the routing rule")
      // the persisted catalog IS the wiring: drop in-memory state and
      // reload from the adopt-written file
      val before = RollupRouting.registered
      val beforeJ = RollupRouting.registeredJoins
      RollupRouting.clear()
      RollupRouting.loadRegistry(spark, adopted.registryPath)
      assert(RollupRouting.registered == before &&
             RollupRouting.registeredJoins == beforeJ,
        "adopt must persist exactly the registry it registered, both kinds")
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("orders_advised") && !plan.contains("orders.parquet"),
        s"the adopted rollup must answer, fact unscanned:\n$plan")
      assert(routed.collect().toSeq == plain,
        "the adopted read must equal the live dashboard")
      val jRouted = jq()
      // (the plan string truncates long paths, so match the MV's
      // table-name stem rather than the _advised suffix)
      assert(jRouted.queryExecution.executedPlan.toString
               .contains("customer_lineitem_orders"),
        "the adopted join MV must answer the star dashboard")
      assert(jRouted.collect().toSeq == jPlain)
      // re-adopt is idempotent: same catalog, same answer, no dupes
      Advisor.adopt(spark, advice, adopted.registryPath, memoized = true)
      assert(RollupRouting.registered.size == before.size &&
             RollupRouting.registeredJoins.size == beforeJ.size,
        "re-adopt must not duplicate registrations")
      assert(q().collect().toSeq == plain)
    } finally {
      spark.experimental.extraOptimizations = prev
      RollupRouting.clear()
    }
  }

  /** r14: spec RETIREMENT — the DROP half of the adopt lifecycle. An
    * unregistered spec stops answering on the next planning pass (the
    * query falls back live), the re-persisted catalog stays retired
    * across a reload, and estimator-substituted approx_count_distinct
    * values revert to HLL++'s own — the documented plan-dependence. */
  test("retiring an adopted spec falls back live, persists, and reverts approx values") {
    import graft.ops.Rollups
    val base = java.nio.file.Files.createTempDirectory("graft_retire")
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(approx_count_distinct($"user_id").as("u"), count(lit(1)).as("c"))
      .orderBy("day")
    val hllppTruth = q().collect().toSeq // no rule installed: HLL++'s own values
    val advice = Advisor.advise(Seq(q()), base.resolve("mv").toString)
    assert(advice.singles.size == 1, advice)
    val prev = spark.experimental.extraOptimizations
    try {
      val adopted = Advisor.adopt(spark, advice, base.resolve("registry.json").toString)
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("events_advised"),
        "the adopted uniqState spec must answer before retirement")
      val sketchValues = routed.collect().toSeq
      // retire: the SAME query falls back live and the values revert
      val path = advice.singles.head.spec.rollupPath
      assert(adopted.retire(path), "retire must report the removal")
      assert(!adopted.retire(path), "a second retire is a no-op")
      val after = q()
      assert(!after.queryExecution.executedPlan.toString.contains("events_advised"),
        "a retired spec must stop answering")
      assert(after.collect().toSeq == hllppTruth,
        "approx values must revert to HLL++'s own after retirement")
      assert(sketchValues.map(_.getLong(2)).sum == hllppTruth.map(_.getLong(2)).sum,
        "sanity: the exact count column agreed on both plans")
      // the retirement is DURABLE: a fresh registry loaded from the
      // re-persisted catalog does not contain the spec
      RollupRouting.clear()
      RollupRouting.loadRegistry(spark, adopted.registryPath)
      assert(!RollupRouting.registered.exists(_.rollupPath == path),
        "the re-persisted catalog must stay retired")
    } finally {
      spark.experimental.extraOptimizations = prev
      RollupRouting.clear()
    }
  }

  test("out-of-scope queries are skipped with reasons, never mis-advised") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_skip").toString
    val median = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(expr("percentile_approx(value, 0.5)").as("p50"))
    val noAgg = Tables.events(spark, sf).select($"user_id").limit(5)
    val advice = Advisor.advise(Seq(median, noAgg), root)
    assert(advice.singles.isEmpty && advice.joins.isEmpty)
    assert(advice.skipped.size == 2, advice.skipped)
    assert(advice.skipped.exists(_.contains("unmappable aggregate")))
    assert(advice.skipped.exists(_.contains("no top-level aggregate")))
  }

  test("a ROLLUP lattice advises its flat-grain spec; distinct lattices skip with reason") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_gs").toString
    val q = () => Tables.events(spark, sf)
      .rollup(to_date($"ts").as("day"), $"user_id")
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
      .orderBy($"day".asc_nulls_first, $"user_id".asc_nulls_first)
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.size == 1, advice)
    val spec = advice.singles.head.spec
    // the demand is the FULL grouping set — exactly what a flat
    // (day, user) dashboard would have advised
    assert(spec.grain == "day" && spec.timeCol == "ts")
    assert(spec.keyCols == Map("user_id" -> "user_id"))
    val plain = q().collect().toSeq
    routedWith(advice) {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("events_advised"), s"lattice must route:\n$plan")
      assert(!plan.contains("events.parquet"), s"fact must not be scanned:\n$plan")
      assert(routed.collect().toSeq == plain)
    }
    // a NON-integral distinct aggregate under the lattice would never
    // route — the advisor refuses the dead registration and says why
    val dq = Tables.events(spark, sf)
      .rollup(to_date($"ts").as("day"))
      .agg(countDistinct($"event_type").as("u"))
    val dAdvice = Advisor.advise(Seq(dq), root)
    assert(dAdvice.singles.isEmpty && dAdvice.joins.isEmpty)
    assert(dAdvice.skipped.exists(_.contains("distinct aggregate under grouping sets")),
      dAdvice.skipped)
    // an INTEGRAL count-distinct lattice advises the BITMAP state
    // (r15 — exact and OR-union subtotal-safe) and the unchanged
    // lattice routes through it, every grain exact
    val broot = java.nio.file.Files.createTempDirectory("graft_advise_gsbm").toString
    val bq = () => Tables.events(spark, sf)
      .rollup(to_date($"ts").as("day"), $"event_type")
      .agg(countDistinct($"user_id").as("u"), count(lit(1)).as("n"))
      .orderBy($"day".asc_nulls_first, $"event_type".asc_nulls_first)
    val bAdvice = Advisor.advise(Seq(bq()), broot)
    assert(bAdvice.skipped.isEmpty, bAdvice.skipped)
    assert(bAdvice.singles.size == 1, bAdvice)
    import graft.plans.RollupRouting.{BitmapUniqOf, ColRef}
    assert(bAdvice.singles.head.spec.aggs.exists {
        case BitmapUniqOf(ColRef("user_id"), _) => true; case _ => false },
      s"the lattice distinct must mint the bitmap state: ${bAdvice.singles.head.spec.aggs}")
    val bTruth = bq().collect().toSeq
    routedWith(bAdvice) {
      val routed = bq()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_gsbm") && !plan.contains("events.parquet"),
        s"the exact distinct lattice must read the advised bitmap states:\n$plan")
      assert(routed.collect().toSeq == bTruth,
        "every advised-lattice grain must be exact")
    }
    // the flattening is path-agnostic: a ROLLUP over the 3-table star
    // advises a JOIN MV, and the unchanged join lattice routes
    val jroot = java.nio.file.Files.createTempDirectory("graft_advise_gsj").toString
    val jq = () => Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .rollup($"c_mktsegment")
      .agg(graft.ops.Fns.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
           count(lit(1)).as("n_lines"))
      .orderBy($"c_mktsegment".asc_nulls_first)
    val jAdvice = Advisor.advise(Seq(jq()), jroot)
    assert(jAdvice.skipped.isEmpty, jAdvice.skipped)
    assert(jAdvice.joins.size == 1, jAdvice)
    assert(jAdvice.joins.head.spec.groupings == Map("c_mktsegment" -> "c_mktsegment"))
    val jPlain = jq().collect().toSeq
    routedWith(jAdvice) {
      val routed = jq()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("graft_advise_gsj"), s"join lattice must route:\n$plan")
      assert(!plan.toLowerCase.contains("sortmergejoin") &&
             !plan.toLowerCase.contains("broadcasthashjoin"),
        s"routed join lattice must be join-free:\n$plan")
      assert(routed.collect().toSeq == jPlain)
    }
  }

  test("a monthly workload advises a day-grain spec; the month query routes through it") {
    import graft.ops.Rollups
    val plain = Rollups.monthlyVolumeRaw(spark, sf).collect().toSeq
    val routed = Advisor.advisedMonthly(spark, sf)
    assert(routed.collect().toSeq == plain,
      "advised day-grain rollup must answer the monthly dashboard exactly")
  }

  test("the five-dashboard state suite advises per-grain specs answering all five") {
    import graft.ops.Rollups
    val queries = Advisor.stateSuiteQueries(spark, sf)
    val raws = queries.map(_.collect().toSeq)
    val root = java.nio.file.Files.createTempDirectory("graft_advise_suite").toString
    val advice = Advisor.advise(Advisor.stateSuiteQueries(spark, sf), root)
    // r14 cost-aware merge: the four keyless day dashboards pool into
    // ONE calendar-sized spec carrying all three sketch states; the
    // (day, user) volume rollup splits off — its rows grow with the
    // user count and would inflate every sketch read
    assert(advice.singles.size == 2 && advice.skipped.isEmpty, advice.skipped)
    val byKeys = advice.singles.map(_.spec).groupBy(_.keyCols.keySet)
    val spec = byKeys(Set.empty[String]).head
    assert(spec.grain == "day", s"the pooled sketch spec is day-grain: $spec")
    assert(byKeys(Set("user_id")).head.grain == "day")
    val kinds = spec.aggs.map(_.getClass.getSimpleName).toSet
    assert(Set("HllUniqOf", "KllQuantileOf", "TopKOf", "SumOf", "CountStarTo")
      .subsetOf(kinds), s"partial block must carry all three states: $kinds")
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      Advisor.stateSuiteQueries(spark, sf).zip(raws).zipWithIndex.foreach {
        case ((routed, raw), i) =>
          val plan = routed.queryExecution.executedPlan.toString
          assert(plan.contains("advise_suite") && !plan.contains("events.parquet"),
            s"suite query #$i must read the advised rollup:\n$plan")
          if (i == 2) {
            // top-k: tied last slots are selection-free — compare counts
            // per day as multisets plus the shared scalar column
            def c(rows: Seq[org.apache.spark.sql.Row]) = rows.map { r =>
              (r.getDate(0).toString,
               r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1)).sorted,
               r.getLong(2))
            }
            assert(c(routed.collect().toSeq) == c(raw), s"suite query #$i routed ≠ live")
          } else
            assert(routed.collect().toSeq == raw, s"suite query #$i routed ≠ live")
      }
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("a sketch dashboard advises an HLL-state partial; both merged queries route") {
    import graft.ops.Rollups
    val sketchRaw = Rollups.dailyUniqSketchRaw(spark, sf).collect().toSeq
    val volumeRaw = Rollups.daily(spark, sf).collect().toSeq
    val root = java.nio.file.Files.createTempDirectory("graft_advise_hll").toString
    val advice = Advisor.advise(Seq(
      Rollups.dailyUniqSketchRaw(spark, sf), Rollups.daily(spark, sf)), root)
    // r14: the keyless sketch read and the user-keyed volume rollup
    // advise separately — the cost-aware split
    assert(advice.singles.size == 2 && advice.skipped.isEmpty, advice.skipped)
    val spec = advice.singles.map(_.spec).find(_.keyCols.isEmpty).get
    assert(spec.aggs.exists {
      case RollupRouting.HllUniqOf(RollupRouting.ColRef("user_id"), _, 12) => true; case _ => false
    }, s"advised aggs must carry the HLL state: ${spec.aggs}")
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routedSketch = Rollups.dailyUniqSketchRaw(spark, sf)
      val plan = routedSketch.queryExecution.executedPlan.toString
      assert(plan.contains("advise_hll") && !plan.contains("events.parquet"),
        s"sketch query must read the advised rollup:\n$plan")
      assert(routedSketch.collect().toSeq == sketchRaw)
      assert(Rollups.daily(spark, sf).collect().toSeq == volumeRaw,
        "the merged volume query must route through the same spec unchanged")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  /** r13: a sorted-collect_set dashboard (the q70/q204 shape) ADVISES
    * the distinct-set state member, and the unchanged query routes
    * through the advised array states bit-for-bit. */
  test("a collect_set dashboard advises the distinct-set state and routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_set").toString
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(sort_array(collect_set($"user_id")).as("users"),
           size(collect_set($"user_id")).as("n_users"),
           count(lit(1)).as("c"))
      .orderBy("day")
    val truth = q().collect().toSeq
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.singles.size == 1 && advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.head.spec.aggs.exists {
      case RollupRouting.SetOf(RollupRouting.ColRef("user_id"), _) => true; case _ => false
    }, s"advised aggs must carry the set state: ${advice.singles.head.spec.aggs}")
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_set") && !plan.contains("events.parquet"),
        s"the set dashboard must read the advised array states:\n$plan")
      assert(routed.collect().toSeq == truth,
        "routed sorted set + exact size must equal the live dashboard")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  /** r13 capstone, r14 cost-aware: the four-state workload advises a
    * PER-GRAIN catalog — sketches on the calendar-sized (day) spec,
    * the volume rollup on (day, user), the distinct-set state on
    * (day, type) — and the q204-shape set dashboard ROUTES through
    * its natural spec (the oracle alone cannot prove the read came
    * from the rollup — the plan assertion does). */
  test("the four-state suite advises a per-grain catalog; the set dashboard routes") {
    import graft.ops.Rollups
    val root = java.nio.file.Files.createTempDirectory("graft_adv4st").toString
    val setDemand = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(sort_array(collect_set($"user_id")).as("users"),
           size(collect_set($"user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
    val advice = Advisor.advise(
      Advisor.stateSuiteQueries(spark, sf) :+ setDemand, root)
    assert(advice.singles.size == 3 && advice.skipped.isEmpty, advice.skipped)
    val aggs = advice.singles.flatMap(_.spec.aggs)
    assert(aggs.exists(_.isInstanceOf[RollupRouting.HllUniqOf]) &&
           aggs.exists(_.isInstanceOf[RollupRouting.KllQuantileOf]) &&
           aggs.exists(_.isInstanceOf[RollupRouting.TopKOf]) &&
           aggs.exists(_.isInstanceOf[RollupRouting.SetOf]),
      s"the catalog must carry all four state members: $aggs")
    // the split's point: the set state sits on a (day, type) spec with
    // NO user-shaped key — its rollup stays calendar-sized
    val setSpec = advice.singles.map(_.spec)
      .find(_.aggs.exists(_.isInstanceOf[RollupRouting.SetOf])).get
    assert(setSpec.keyCols.keySet == Set("event_type"), setSpec.toString)
    val q = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(sort_array(collect_set($"user_id")).as("users"),
           size(collect_set($"user_id")).cast("long").as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy("event_type")
    val truth = q().collect().toSeq
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("adv4st") && !plan.contains("events.parquet"),
        s"the set dashboard must read the merged multi-state rollup:\n$plan")
      assert(routed.collect().toSeq == truth)
      // the sketch reads route through the SAME spec
      val sketch = Rollups.dailyUniqSketchRaw(spark, sf)
      assert(sketch.queryExecution.executedPlan.toString.contains("adv4st"),
        "the uniques sketch must route through the same merged spec")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  /** r14: the cost-aware merge policy, pinned from both sides — same
    * key set (or pure calendar refinement) keeps the merge; a gained
    * key whose distinct count explodes the read splits it. */
  test("spec merging is cost-aware: same-grain pools, exploding grains split") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_cost").toString
    // MERGE KEPT: identical (day, type) key sets — two dashboards,
    // one spec, no split records
    val a = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("v"))
    val b = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("c"), min($"value").as("lo"))
    val kept = Advisor.advise(Seq(a, b), root)
    assert(kept.singles.size == 1 && kept.splits.isEmpty && kept.skipped.isEmpty,
      s"same-grain demands must pool into one spec: $kept")
    assert(kept.singles.head.spec.keyCols.keySet == Set("event_type"))
    // MERGE KEPT: keyless hour + keyless day — calendar refinement is
    // bounded at any data volume, never a split reason
    val hourless = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("h")).agg(count(lit(1)).as("c"))
    val dayless = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day")).agg(count(lit(1)).as("c"))
    val calendar = Advisor.advise(Seq(hourless, dayless), root)
    assert(calendar.singles.size == 1 && calendar.splits.isEmpty &&
           calendar.singles.head.spec.grain == "hour",
      s"calendar refinement must merge at the finest grain: $calendar")
    // SPLIT: a keyless day count must not ride a user-keyed rollup —
    // the gained key's distinct count exceeds the inflation bound
    val keyed = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"user_id")
      .agg(count(lit(1)).as("c"))
    val split = Advisor.advise(Seq(dayless, keyed), root)
    assert(split.singles.size == 2 && split.skipped.isEmpty,
      s"a user-shaped gained key must split the specs: $split")
    assert(split.splits.exists(_.contains("split into 2 specs")), split.splits)
    // the two rollup paths are distinct and deterministic
    assert(split.singles.map(_.spec.rollupPath).distinct.size == 2)
  }

  /** r14: the split also protects COUNT(DISTINCT) routability — the
    * cdg rewrite requires the query to group by every OTHER rollup
    * key, so the r13 merge-everything policy could produce advice
    * whose distinct dashboard never routed (dead advice); per-grain
    * specs keep both demands servable. */
  test("splitting keeps a COUNT(DISTINCT) demand routable next to a keyed demand") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_cdg").toString
    val distinctQ = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(countDistinct($"user_id").as("u"), count(lit(1)).as("c"))
      .orderBy("day")
    val keyedQ = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("v"))
      .orderBy("day", "event_type")
    val advice = Advisor.advise(Seq(distinctQ(), keyedQ()), root)
    assert(advice.singles.size == 2 && advice.skipped.isEmpty, advice)
    val dTruth = distinctQ().collect().toSeq
    val kTruth = keyedQ().collect().toSeq
    routedWith(advice) {
      val d = distinctQ()
      assert(d.queryExecution.executedPlan.toString.contains("events_advised"),
        s"the distinct dashboard must route on ITS OWN grain-claimed spec:\n" +
          d.queryExecution.executedPlan)
      assert(d.collect().toSeq == dTruth)
      val k = keyedQ()
      assert(k.queryExecution.executedPlan.toString.contains("events_advised"))
      assert(k.collect().toSeq == kTruth)
    }
  }

  /** r14 guard, r15 granularity: a distinct-set state over a
    * near-unique column stores ~every row; the advisor refuses THAT
    * MEMBER with the reason recorded — the demand's remaining
    * measures (counts, sums) keep advising, so a mixed dashboard
    * doesn't lose its whole advice to one id-shaped collect_set. */
  test("a collect_set member over a near-unique column is refused, the rest advises") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_setg").toString
    val unbounded = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(sort_array(collect_set($"event_id")).as("ids"), count(lit(1)).as("c"))
    val bounded = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(sort_array(collect_set($"user_id")).as("users"), count(lit(1)).as("c"))
    val advice = Advisor.advise(Seq(unbounded, bounded), root)
    // the near-unique event_id MEMBER is refused; the demand's count
    // and the bounded user_id set still advise (same keys → one spec)
    assert(advice.splits.exists(_.contains("collect_set(event_id) member refused")),
      advice.splits)
    assert(advice.skipped.isEmpty,
      s"a mixed demand must not be skipped whole: ${advice.skipped}")
    assert(advice.singles.size == 1, advice)
    val aggs = advice.singles.head.spec.aggs
    assert(aggs.exists {
      case RollupRouting.SetOf(RollupRouting.ColRef("user_id"), _) => true; case _ => false
    }, s"the bounded set must still advise: $aggs")
    assert(!aggs.exists {
      case RollupRouting.SetOf(RollupRouting.ColRef("event_id"), _) => true; case _ => false
    }, s"the refused set must not register: $aggs")
    assert(aggs.exists(_.isInstanceOf[RollupRouting.CountStarTo]),
      s"the mixed demand's count must survive the member refusal: $aggs")
    // a demand whose ONLY measure is the refused set is skipped whole
    val setOnly = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(sort_array(collect_set($"event_id")).as("ids"))
    val soAdvice = Advisor.advise(Seq(setOnly), root)
    assert(soAdvice.singles.isEmpty &&
           soAdvice.skipped.exists(_.contains("set state refused")), soAdvice)
    // the same per-member guard holds on the JOIN path, stats from
    // the owning base table: the count advises, the set does not
    val joinUnbounded = Tables.events(spark, sf)
      .join(Tables.customer(spark, sf), col("user_id") === col("c_custkey"))
      .groupBy(to_date($"ts").as("day"), $"c_mktsegment")
      .agg(sort_array(collect_set($"event_id")).as("ids"), count(lit(1)).as("c"))
    val jAdvice = Advisor.advise(Seq(joinUnbounded), root)
    assert(jAdvice.joins.size == 1 &&
           jAdvice.splits.exists(_.contains("collect_set(event_id) member refused")),
      jAdvice)
    assert(!jAdvice.joins.head.spec.aggs.exists(_.isInstanceOf[RollupRouting.SetOf]),
      jAdvice.joins.head.spec.aggs)
  }

  /** r14: a `-If` combinator dashboard (countIf/sumIf as CASE
    * patterns) ADVISES the conditional members and the unchanged
    * query routes bit-equally. */
  test("a conditional-aggregate dashboard advises countIf/sumIf states and routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_cond").toString
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(when($"value" > 1.0, 1)).as("n_over_1"),
           graft.ops.Fns.dsum(when($"value" > 1.0, $"value")).as("sum_over_1"),
           count(lit(1)).as("n"))
      .orderBy("day", "event_type")
    val truth = q().collect().toSeq
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.singles.size == 1 && advice.skipped.isEmpty, advice.skipped)
    val aggs = advice.singles.head.spec.aggs
    assert(aggs.exists(_.isInstanceOf[RollupRouting.CountOf]),
      s"the conditional count must advise the CountOf member: $aggs")
    routedWith(advice) {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_cond") && !plan.contains("events.parquet"),
        s"the conditional dashboard must read the advised -If states:\n$plan")
      assert(routed.collect().toSeq == truth)
    }
  }

  /** r14: the argMax/argMin dashboard (q133's max(struct(...)).getField
    * shape) ADVISES the struct-extremum member — the sixth state,
    * register-only until now — and the unchanged query routes through
    * the advised states bit-for-bit. */
  test("an arg-extrema dashboard advises Min/MaxPatOf states and routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_ext").toString
    val q = () => Rollups.argExtremes(spark, sf)
    val volume = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("total_value"),
           count(lit(1)).as("n_events"))
    val truth = q().collect().toSeq
    val advice = Advisor.advise(Seq(q(), volume()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.size == 1, advice)
    val aggs = advice.singles.head.spec.aggs
    assert(aggs.exists(_.isInstanceOf[RollupRouting.MaxPatOf]) &&
           aggs.exists(_.isInstanceOf[RollupRouting.MinPatOf]),
      s"advised aggs must carry both struct-extremum states: $aggs")
    // two same-column extremum demands over DIFFERENT structs must
    // not dedupe into one partial
    assert(aggs.count(_.isInstanceOf[RollupRouting.MaxPatOf]) == 1 &&
           aggs.count(_.isInstanceOf[RollupRouting.MinPatOf]) == 1)
    routedWith(advice) {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_ext") && !plan.contains("events.parquet"),
        s"the extrema dashboard must read the advised struct states:\n$plan")
      assert(routed.collect().toSeq == truth,
        "routed extrema must equal the live dashboard (ties broken by the struct order)")
    }
    // the driver entry wraps the same loop
    assert(Advisor.advisedArgExtremes(spark, sf).collect().toSeq == truth)
  }

  /** r14: the OFFLINE loop — demands captured to a JSON log, advice
    * mined from the FILE with no live workload DataFrames, and the
    * unchanged queries route. Pattern measures (the extremum struct)
    * travel as their SQL rendering, the same form the persisted
    * catalog uses; JOIN demands travel as (table→path, join keys,
    * groupings) and advise join MVs offline; unmappable queries
    * record skip reasons instead of silently vanishing. */
  test("a captured workload advises offline and routes, patterns and joins included") {
    val base = java.nio.file.Files.createTempDirectory("graft_capture")
    val capture = base.resolve("workload.json").toString
    val extrema = () => Rollups.argExtremes(spark, sf)
    val volume = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("total_value"),
           count(lit(1)).as("n_events"))
    val join = () => StarJoins.revenueBySegment(spark, sf)
    val median = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(expr("percentile_approx(value, 0.5)").as("p50"))
    Advisor.captureWorkload(Seq(extrema(), volume(), join(), median), capture)
    val advice = Advisor.adviseCaptured(spark, capture, base.resolve("mv").toString)
    assert(advice.singles.size == 1 && advice.joins.size == 1, advice)
    assert(advice.skipped.exists(_.contains("unmappable aggregate")), advice.skipped)
    val aggs = advice.singles.head.spec.aggs
    assert(aggs.exists(_.isInstanceOf[RollupRouting.MaxPatOf]) &&
           aggs.exists(_.isInstanceOf[RollupRouting.MinPatOf]),
      s"the struct-extremum demands must survive the JSON travel form: $aggs")
    val jSpec = advice.joins.head.spec
    assert(jSpec.tables == Set("lineitem", "orders", "customer") &&
           jSpec.grainCols == Map("o_orderkey" -> "o_orderkey"),
      s"the join demand must survive the file round-trip whole: $jSpec")
    val truth = extrema().collect().toSeq
    val jTruth = join().collect().toSeq
    routedWith(advice) {
      val routed = extrema()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("graft_capture") && !plan.contains("events.parquet"),
        s"the offline-advised extrema states must answer:\n$plan")
      assert(routed.collect().toSeq == truth)
      val jRouted = join()
      val jPlan = jRouted.queryExecution.executedPlan.toString
      assert(jPlan.contains("graft_capture"),
        s"the offline-advised join MV must answer the star dashboard:\n$jPlan")
      assert(jRouted.collect().toSeq == jTruth)
    }
    // the driver entry wraps the same loop over the q205 workload
    val viaEntry = Advisor.capturedStateSuite(spark, sf).collect().toSeq
    val adopted = Advisor.adoptedStateSuite(spark, sf).collect().toSeq
    assert(viaEntry == adopted,
      "the captured-offline catalog must serve the same answer as the live-advised one")
  }

  /** r13: a uniqUpTo dashboard (least(countDistinct, N+1)) ADVISES the
    * capped-set state at exactly that limit, and the unchanged query
    * routes exactly through the advised states. */
  test("a uniqUpTo dashboard advises the capped-set state and routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_upto").toString
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(least(countDistinct($"user_id"), lit(6).cast("long")).as("u"),
           count(lit(1)).as("c"))
      .orderBy("day")
    val truth = q().collect().toSeq
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.singles.size == 1 && advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.head.spec.aggs.exists {
      case RollupRouting.UniqUpToOf(RollupRouting.ColRef("user_id"), _, 5) => true; case _ => false
    }, s"advised aggs must carry the capped set: ${advice.singles.head.spec.aggs}")
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_upto") && !plan.contains("events.parquet"),
        s"the uniqUpTo dashboard must read the advised capped states:\n$plan")
      assert(routed.collect().toSeq == truth)
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  /** r13: an approx_count_distinct dashboard ADVISES the uniqState
    * member (the advisor mirrors the router's precision-dominance
    * rule), and the unchanged query routes through the advised spec
    * with the substituted estimator. */
  test("an approx_count_distinct dashboard advises an HLL-state spec and routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_acd").toString
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(approx_count_distinct($"user_id").as("u"), count(lit(1)).as("c"))
      .orderBy("day")
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.singles.size == 1 && advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.head.spec.aggs.exists {
      case RollupRouting.HllUniqOf(RollupRouting.ColRef("user_id"), _, 12) => true; case _ => false
    }, s"advised aggs must carry the HLL state: ${advice.singles.head.spec.aggs}")
    // the routed answer is the Datasketches estimate — the truth to
    // pin against is the single-pass sketch, not HLL++
    val truth = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id", 12)).as("u"),
           count(lit(1)).as("c"))
      .orderBy("day").collect().toSeq
    Advisor.buildAndRegister(spark, advice)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_acd") && !plan.contains("events.parquet"),
        s"the approx-distinct dashboard must read the advised rollup:\n$plan")
      assert(routed.collect().toSeq == truth,
        "routed approx_count_distinct must equal the single-pass sketch estimate")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  /** r15, the ADVICE cast-hole's measure twin: a sum demand over an
    * ORDER-EMBEDDING cast of a bare column (int widened to double)
    * mints `SumOf(ColRef)` — and the routed side now strips the same
    * whitelist from the query tree, so the advised spec ANSWERS its
    * own workload instead of being dead advice. */
  test("a sum over an order-embedding cast advises a ColRef member that routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_oec").toString
    val q = () => Tables.lineitem(spark, sf)
      .groupBy(to_date($"l_shipdate").as("day"))
      .agg(graft.ops.Fns.dsum($"l_linenumber".cast("double")).as("s"),
           count($"l_linenumber".cast("double")).as("n"))
      .orderBy("day")
    val truth = q().collect().toSeq
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.singles.size == 1 && advice.skipped.isEmpty, advice.skipped)
    val aggs = advice.singles.head.spec.aggs
    assert(aggs.exists {
      case RollupRouting.SumOf(RollupRouting.ColRef("l_linenumber"), _) => true
      case _ => false
    }, s"the stripped demand must mint the bare-column member: $aggs")
    routedWith(advice) {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_oec") && !plan.contains("lineitem.parquet"),
        s"the minted ColRef member must route its own workload:\n$plan")
      assert(routed.collect().toSeq == truth)
    }
  }

  /** r15: dedupe keys and partial names ride the ORDER-SENSITIVE canon
    * — two demands whose patterns differ only by a value-CHANGING cast
    * register DISTINCT members, and each query routes onto its own
    * (previously the value-insensitive canon aliased them into one
    * partial and the second query silently never routed). */
  test("value-distinct cast patterns advise distinct members, both route") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_vdc").toString
    val qLong = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(graft.ops.Fns.dsum($"value".cast("long")).as("s"), count(lit(1)).as("c"))
      .orderBy("day")
    val qInt = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(graft.ops.Fns.dsum($"value".cast("int")).as("s"), count(lit(1)).as("c"))
      .orderBy("day")
    val advice = Advisor.advise(Seq(qLong(), qInt()), root)
    assert(advice.singles.size == 1 && advice.skipped.isEmpty, advice)
    val sums = advice.singles.head.spec.aggs.collect {
      case RollupRouting.SumOf(p, partial) => (p, partial)
    }
    assert(sums.size == 2 && sums.map(_._2).distinct.size == 2,
      s"the two value-changing casts must mint distinct partials: $sums")
    val truthLong = qLong().collect().toSeq
    val truthInt = qInt().collect().toSeq
    routedWith(advice) {
      for ((q, truth) <- Seq(qLong -> truthLong, qInt -> truthInt)) {
        val routed = q()
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("advise_vdc") && !plan.contains("events.parquet"),
          s"each value-distinct demand must route onto its own member:\n$plan")
        assert(routed.collect().toSeq == truth)
      }
    }
  }

  /** r15: a purely GRAINLESS workload — keys-only, all-time — advises
    * "all"-grain specs (previously refused: nothing pinned a rollup
    * grain). The two key sets split under the same gained-key bound as
    * grained demands, each unchanged query routes with the fact never
    * scanned, and the catalog round-trips adopt's persisted JSON. */
  test("a grainless workload advises all-grain specs; both route; adopt round-trips") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_all").toString
    val perUser = () => Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
      .orderBy("user_id")
    val perType = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("c"))
      .orderBy("event_type")
    val advice = Advisor.advise(Seq(perUser(), perType()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.size == 2 &&
           advice.singles.forall(_.spec.grain == "all"),
      s"both grainless key sets must advise all-grain specs: $advice")
    assert(advice.singles.forall(_.spec.timeCol == ""),
      s"a purely grainless workload pins no time column: ${advice.singles.map(_.spec)}")
    val uTruth = perUser().collect().toSeq
    val tTruth = perType().collect().toSeq
    // adopt → drop the registry → reload from the persisted JSON —
    // the grainless spec kind must survive the catalog round-trip
    val prev = spark.experimental.extraOptimizations
    try {
      val adopted = Advisor.adopt(spark, advice, s"$root/registry.json",
        memoized = true)
      RollupRouting.clear()
      RollupRouting.loadRegistry(spark, adopted.registryPath)
      for ((q, truth) <- Seq(perUser -> uTruth, perType -> tTruth)) {
        val routed = q()
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("advise_all") && !plan.contains("events.parquet"),
          s"each grainless dashboard must route, fact never scanned:\n$plan")
        assert(routed.collect().toSeq == truth)
      }
    } finally {
      spark.experimental.extraOptimizations = prev
      RollupRouting.clear()
    }
  }

  /** r15: a grainless demand next to a grained workload SEEDS its own
    * all-grain spec when pooling would blow the inflation bound —
    * round 14 stranded it ("left live"); now both queries route. */
  test("a grainless demand seeds its own spec beside a grained workload") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_seed").toString
    val grained = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"user_id")
      .agg(graft.ops.Fns.dsum($"value").as("v"))
      .orderBy("day", "user_id")
    val grainless = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
      .orderBy("event_type")
    val advice = Advisor.advise(Seq(grained(), grainless()), root)
    assert(advice.skipped.isEmpty,
      s"the grainless demand must no longer be stranded: ${advice.skipped}")
    assert(advice.singles.size == 2, advice)
    val byGrain = advice.singles.map(_.spec).groupBy(_.grain)
    assert(byGrain.keySet == Set("day", "all"), byGrain.keySet)
    assert(byGrain("all").head.keyCols.keySet == Set("event_type"))
    // the grainless spec inherits the merge set's time column — a
    // later owner can stamp coverage and get the hybrid read
    assert(byGrain("all").head.timeCol == "ts", byGrain("all").head)
    val gTruth = grained().collect().toSeq
    val lTruth = grainless().collect().toSeq
    routedWith(advice) {
      for ((q, truth) <- Seq(grained -> gTruth, grainless -> lTruth)) {
        val routed = q()
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("advise_seed") && !plan.contains("events.parquet"),
          s"each demand must route through its own spec:\n$plan")
        assert(routed.collect().toSeq == truth)
      }
    }
  }

  /** r15 stretch: a MIXED grainless workload — a grainless single-table
    * demand, a grainless JOIN demand (the segment-only star: the join
    * path's grainless shape existed since r12 — a JoinSpec with no
    * grain/time columns), and a grained daily demand — adopts through
    * ONE call, and every unchanged query routes after the registry
    * reloads from the persisted catalog: both paths share the
    * coverage/rebuild contract (no sidecar ⇒ complete one-shot build). */
  test("adopt handles a mixed grainless workload across single and join paths") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_mixed").toString
    // per-type, not per-user: a grainless demand whose keys MATCH the
    // grained demand's correctly pools into it (the day rollup answers
    // all-time queries by re-aggregation); disjoint keys force the
    // grainless single-table seed this test is about
    val perType = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
      .orderBy("event_type")
    val daily = () => Rollups.daily(spark, sf)
    val segment = () => StarJoins.chargeBySegment(spark, sf)
    val advice = Advisor.advise(Seq(perType(), daily(), segment()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.size == 2 && advice.joins.size == 1, advice)
    assert(advice.singles.map(_.spec.grain).toSet == Set("all", "day"),
      advice.singles.map(_.spec))
    val j = advice.joins.head.spec
    assert(j.grainCols.isEmpty && j.timeGroupings.isEmpty,
      s"the segment star is the join path's grainless shape: $j")
    val uTruth = perType().collect().toSeq
    val dTruth = daily().collect().toSeq
    val sTruth = segment().collect().toSeq
    val prev = spark.experimental.extraOptimizations
    try {
      val adopted = Advisor.adopt(spark, advice, s"$root/registry.json",
        memoized = true)
      RollupRouting.clear()
      RollupRouting.loadRegistry(spark, adopted.registryPath)
      for ((q, truth) <- Seq(perType -> uTruth, daily -> dTruth,
                             segment -> sTruth)) {
        val routed = q()
        val plan = routed.queryExecution.executedPlan.toString
        assert(plan.contains("advise_mixed") &&
               !plan.contains("events.parquet") &&
               !plan.contains("lineitem.parquet"),
          s"every demand of the mixed workload must route:\n$plan")
        assert(routed.collect().toSeq == truth)
      }
    } finally {
      spark.experimental.extraOptimizations = prev
      RollupRouting.clear()
    }
  }

  /** r15: the merge bound is a session conf
    * (`spark.graft.advisor.maxReadInflation`) — a deployment can trade
    * spec count against read inflation without code; an explicit
    * argument still wins. */
  test("the read-inflation bound reads from the session conf") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_conf").toString
    val daily = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"user_id")
      .agg(graft.ops.Fns.dsum($"value").as("v"))
    val hourly = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("c"))
    // default bound: the user-keyed + keyless demands split (pinned
    // by the per-grain test above); an effectively-unbounded conf
    // pools them into ONE spec
    spark.conf.set(Advisor.MaxReadInflationConf, "1e18")
    try {
      val pooled = Advisor.advise(Seq(daily, hourly), root)
      assert(pooled.singles.size == 1 && pooled.splits.isEmpty,
        s"an unbounded conf must pool the workload: $pooled")
      // an explicit argument overrides the conf
      val split = Advisor.advise(Seq(daily, hourly), root,
        maxReadInflation = Advisor.DefaultMaxReadInflation)
      assert(split.singles.size == 2 && split.splits.nonEmpty,
        s"the explicit bound must win over the conf: $split")
    } finally spark.conf.unset(Advisor.MaxReadInflationConf)
    // r15: the stats-sample bound is a conf too — a 1-row sample sees
    // ~1 distinct per key, so the gained-key products collapse and the
    // same workload POOLS where the default sample splits it (the
    // deployment knob trading advise cost for split stability)
    spark.conf.set(Advisor.StatsSampleRowsConf, "1")
    try {
      val pooled1 = Advisor.advise(Seq(daily, hourly), root)
      assert(pooled1.singles.size == 1,
        s"a 1-row stats sample must pool the workload: $pooled1")
    } finally spark.conf.unset(Advisor.StatsSampleRowsConf)
  }

  /** r15: the -If family ADVISES across every state member — the
    * conditional sketch/set demands (uniqIf, quantileIf, topKIf,
    * setIf, uniqUpToIf) mine as PATTERN sources, the SetOf guard
    * prices the pattern's own distinct values (a conditional set over
    * a bounded column passes even when the base column count is
    * higher), and the unchanged exact dashboards route through the
    * advised spec. */
  test("conditional sketch/set demands advise pattern states and route") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_if").toString
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(array_join(sort_array(collect_set(
             when($"value" > 2.0d, $"event_type"))), ",").as("big_types"),
           least(countDistinct(when($"event_type" === "click", $"user_id")),
                 lit(6L)).as("clickers_upto"),
           hll_sketch_estimate(hll_sketch_agg(
             when($"event_type" === "click", $"user_id"), 12)).as("clickers_est"),
           graft.expr.Kll.quantile(graft.expr.Kll.agg(
             when($"event_type" === "click", $"value"), 200), 0.5).as("click_p50"),
           // uniqExactIf: the conditional EXACT distinct advises a
           // pattern state (no grain-claim analog exists for a
           // pattern) — the BITMAP member for this integral column
           // (r15; a non-integral value would advise SetOf)
           countDistinct(when($"event_type" === "click", $"user_id"))
             .as("clickers_exact"),
           count(lit(1)).as("n"))
      .orderBy("day")
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty, advice.skipped)
    assert(advice.singles.size == 1, advice)
    val aggs = advice.singles.head.spec.aggs
    import graft.plans.RollupRouting._
    assert(aggs.exists { case SetOf(_: ExprPat, _) => true; case _ => false } &&
           aggs.exists { case UniqUpToOf(_: ExprPat, _, 5) => true; case _ => false } &&
           aggs.exists { case HllUniqOf(_: ExprPat, _, 12) => true; case _ => false } &&
           aggs.exists { case KllQuantileOf(_: ExprPat, _, 200) => true; case _ => false },
      s"every conditional demand must mine as a pattern member: $aggs")
    assert(aggs.count { case SetOf(_: ExprPat, _) => true; case _ => false } == 1 &&
           aggs.exists { case BitmapUniqOf(_: ExprPat, _) => true; case _ => false },
      s"setIf mints its pattern set state and the integral uniqExactIf " +
        s"mints the bitmap state: $aggs")
    val truth = q().collect().toSeq
    routedWith(advice) {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("advise_if") && !plan.contains("events.parquet"),
        s"the conditional dashboard must read the advised states:\n$plan")
      // exact members bit-equal; sketch members equal HERE because one
      // one-shot partial row per day merges to itself (the dedicated
      // -If routing test pins the general error contracts)
      assert(routed.collect().toSeq == truth)
    }
  }

  /** r15: the quantile twin of the approx_count_distinct rule — a
    * COARSE-tolerance percentile_approx (rank error 1/accuracy at or
    * above the default state's ~1.65%) advises the KLL member and the
    * unchanged query routes with the substituted estimate; the default
    * accuracy stays unmappable (dominance fails), exactly what the
    * router would refuse. */
  test("a coarse percentile_approx dashboard advises the KLL state and routes") {
    val root = java.nio.file.Files.createTempDirectory("graft_advise_gk").toString
    val q = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(expr("percentile_approx(value, 0.5, 50)").as("p50"),
           count(lit(1)).as("n"))
      .orderBy("day")
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty && advice.singles.size == 1, advice)
    assert(advice.singles.head.spec.aggs.exists {
      case RollupRouting.KllQuantileOf(RollupRouting.ColRef("value"), _, 200) => true
      case _ => false
    }, s"the coarse GK demand must advise the KLL state: ${advice.singles.head.spec.aggs}")
    routedWith(advice) {
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("advise_gk") &&
             !routed.queryExecution.executedPlan.toString.contains("events.parquet"),
        "the substituted estimate must answer from the advised state")
      routed.collect() // values under the state's rank bound (router spec pins it)
    }
    // the DEFAULT accuracy is unmappable — dominance fails, so the
    // advisor skips with a reason instead of minting dead advice
    val tight = Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"))
      .agg(expr("percentile_approx(value, 0.5)").as("p50"))
    val none = Advisor.advise(Seq(tight), root)
    assert(none.singles.isEmpty && none.skipped.exists(_.contains("unmappable")),
      s"the default-accuracy demand must skip, not advise: $none")
  }

  /** r15: the daily loop is IDEMPOTENT — re-advising a log against the
    * catalog it already produced proposes NOTHING (every demand records
    * as served), and a log that gained one new dashboard proposes
    * exactly that spec. With retireCandidates this makes capture →
    * advise → adopt → retire a convergent fixed point. */
  test("delta advising: served demands propose nothing; a new dashboard advises alone") {
    val base = java.nio.file.Files.createTempDirectory("graft_delta")
    val log = base.resolve("workload.json").toString
    val volume = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("v"), count(lit(1)).as("c"))
    val orders = () => Rollups.ordersDailySalesRaw(spark, sf)
    Advisor.captureWorkload(Seq(volume(), orders()), log)
    val prev = spark.experimental.extraOptimizations
    try {
      val day1 = Advisor.adviseCaptured(spark, log, base.resolve("mv").toString)
      assert(day1.singles.size == 2, day1)
      Advisor.adopt(spark, day1, s"$base/registry.json", memoized = true)
      // day 2, same log: nothing new, both demands recorded as served
      val day2 = Advisor.adviseCaptured(spark, log, base.resolve("mv").toString,
        skipServed = true)
      assert(day2.singles.isEmpty && day2.joins.isEmpty,
        s"a fully-served log must propose nothing: $day2")
      assert(day2.skipped.count(_.contains("already served")) == 2, day2.skipped)
      // day 3: the log gains a min/max dashboard — exactly one new spec
      val extrema = () => Tables.events(spark, sf)
        .groupBy(to_date($"ts").as("day"))
        .agg(min($"value").as("lo"), max($"value").as("hi"))
      Advisor.captureWorkload(Seq(extrema()), log, append = true)
      val day3 = Advisor.adviseCaptured(spark, log, base.resolve("mv").toString,
        skipServed = true)
      assert(day3.singles.size == 1 && day3.joins.isEmpty &&
             day3.singles.head.spec.aggs.exists(_.isInstanceOf[RollupRouting.MinOf]),
        s"only the new dashboard may advise: $day3")
      // adopting the DELTA serves the new dashboard too
      val truth = extrema().orderBy("day").collect().toSeq
      Advisor.adopt(spark, day3, s"$base/registry.json", memoized = true)
      val routed = extrema().orderBy("day")
      assert(routed.queryExecution.executedPlan.toString.contains("graft_delta"),
        "the delta-advised spec must route its dashboard")
      assert(routed.collect().toSeq == truth)
    } finally {
      spark.experimental.extraOptimizations = prev
      RollupRouting.clear()
    }
  }

  /** r15: the offline loop is FREQUENCY-AWARE — an appended capture
    * log carries one entry per run, advising aggregates the duplicates
    * into demand frequencies, and a budgeted advise ranks specs by
    * frequency × estimated read savings: the dashboard run six times
    * out-ranks the one-off ad-hoc query; the spec past the budget is
    * recorded, not silently dropped. The same log then drives the DROP
    * half: a registered spec no demand in the window reads reports as
    * a retirement candidate for [[Advisor.Adopted.retire]]. */
  test("budgeted advise ranks hot demands first; stale specs report for retirement") {
    val base = java.nio.file.Files.createTempDirectory("graft_budget")
    val capture = base.resolve("workload.json").toString
    val hot = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(graft.ops.Fns.dsum($"value").as("total_value"),
           count(lit(1)).as("n_events"))
      .orderBy("day", "event_type")
    val oneOff = () => Rollups.ordersDailySalesRaw(spark, sf)
    Advisor.captureWorkload(Seq(hot()), capture)
    (1 to 5).foreach(_ =>
      Advisor.captureWorkload(Seq(hot()), capture, append = true))
    Advisor.captureWorkload(Seq(oneOff()), capture, append = true)
    // unbudgeted: both sources advise (frequency changes nothing —
    // duplicate entries collapse into one demand per shape)
    val full = Advisor.adviseCaptured(spark, capture, base.resolve("mv").toString)
    assert(full.singles.size == 2 && full.skipped.isEmpty, full)
    // budget 1: the 6×-captured events dashboard out-ranks the one-off
    // orders query; the dropped spec is recorded with rank and weight
    val budgeted = Advisor.adviseCaptured(spark, capture,
      base.resolve("mv").toString, budget = 1)
    assert(budgeted.singles.size == 1 &&
           budgeted.singles.head.spec.sourceSuffix == "events.parquet",
      s"the hot demand must win the budget: $budgeted")
    assert(budgeted.skipped.exists(s =>
        s.contains("budget(1)") && s.contains("orders")),
      s"the dropped spec must be recorded: ${budgeted.skipped}")
    // the routed read still serves the hot dashboard
    val truth = hot().collect().toSeq
    routedWith(budgeted) {
      val routed = hot()
      assert(routed.queryExecution.executedPlan.toString.contains("graft_budget"),
        "the budgeted spec must route its workload")
      assert(routed.collect().toSeq == truth)
    }
    // RETIREMENT: register both specs, then shrink the window to the
    // hot demand only — the orders spec is the one candidate
    Advisor.buildAndRegister(spark, full, memoized = true)
    try {
      val window = base.resolve("window.json").toString
      Advisor.captureWorkload(Seq(hot()), window)
      val stale = Advisor.retireCandidates(spark, window)
      assert(stale.map(_._1).exists(_.contains("orders")) &&
             !stale.map(_._1).exists(_.contains("events")),
        s"only the vanished demand's spec may report: $stale")
      // wiring: the report feeds unregister/retire and the catalog obeys
      stale.foreach { case (p, _) => RollupRouting.unregister(p) }
      assert(RollupRouting.registered.forall(_.sourceSuffix == "events.parquet"))
    } finally RollupRouting.clear()
  }

  test("a join-lattice exact-distinct dashboard advises the bitmap " +
       "member on the JOIN path and routes") {
    // per-(segment) AND grand-total distinct customers over
    // orders⋈customer — the subtotal makes the grain-claim mapping
    // unusable, so the integral distinct must advise BitmapUniqOf
    val q = () => Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), $"c_custkey" === $"o_custkey")
      .rollup($"c_mktsegment")
      .agg(countDistinct($"o_custkey").as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy($"c_mktsegment".asc_nulls_first)
    val root = java.nio.file.Files.createTempDirectory("graft_jbm").toString
    val advice = Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty && advice.joins.size == 1, advice)
    assert(advice.joins.head.spec.aggs.exists {
        case RollupRouting.BitmapUniqOf(_, _) => true; case _ => false },
      s"the join lattice must advise the bitmap member: ${advice.joins.head.spec.aggs}")
    val truth = q().collect().toSeq
    routedWith(advice) {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(!plan.contains("orders.parquet") && !plan.contains("customer.parquet"),
        s"the advised join bitmap MV must serve the lattice join-free:\n$plan")
      assert(routed.collect().toSeq == truth,
        "the advised lattice must equal the live join (exact bitmaps)")
    }
  }

  test("a funnel sequence workload advises the ListOf member and the " +
       "unchanged funnel routes; bare-column collect_list stays live") {
    // the captured workload: per-user when-guarded event sequences —
    // the collect_list(struct(ts, step)) shape behind windowFunnel MVs
    val steps = Seq("view", "click", "purchase")
    def guard = steps.zipWithIndex.tail.foldLeft(
        when($"event_type" === steps.head,
          struct($"ts".as("ts"), lit(0).as("step")))) { case (acc, (s, i)) =>
      acc.when($"event_type" === s, struct($"ts".as("ts"), lit(i).as("step")))
    }
    val workload = () => Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(sort_array(collect_list(guard)).as("seq"))
    val root = java.nio.file.Files.createTempDirectory("graft_funadv").toString
    val advice = Advisor.advise(Seq(workload()), root)
    assert(advice.skipped.isEmpty && advice.singles.size == 1, advice)
    assert(advice.singles.head.spec.aggs.exists {
        case RollupRouting.ListOf(_: RollupRouting.ExprPat, _) => true
        case _ => false },
      s"the sequence demand must mint ListOf: ${advice.singles.head.spec.aggs}")
    val truth = ops.Behavior.windowFunnel(spark, sf).collect().toSeq
    routedWith(advice) {
      val funnel = Tables.events(spark, sf)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(guard)).as("seq"))
        .filter(size($"seq") > 0)
        .select(org.apache.spark.sql.graftx.Bridge.column(
          graft.expr.FunnelLevel(
            org.apache.spark.sql.graftx.Bridge.expressionEager($"seq"),
            3, 7L * 24 * 3600 * 1000000L)).as("level"))
        .groupBy($"level").agg(count(lit(1)).as("users")).orderBy("level")
      val plan = funnel.queryExecution.executedPlan.toString
      assert(plan.contains("advised") && !plan.contains("events.parquet"),
        s"the advised sequence MV must serve the funnel:\n$plan")
      assert(funnel.collect().toSeq == truth,
        "the advised funnel histogram must equal the live one")
    }
    // a BARE-COLUMN collect_list is refused (no compression story) —
    // the demand is skipped, never silently registered
    val bare = Tables.events(spark, sf)
      .groupBy($"user_id").agg(collect_list($"value").as("vs"))
    val advice2 = Advisor.advise(Seq(bare), root)
    assert(advice2.singles.isEmpty && advice2.skipped.nonEmpty,
      s"bare-column collect_list must be skipped, got $advice2")
    // an UNGUARDED expression (every row enters the list — full
    // duplication) is refused too: only a CASE with no else mints
    val unguarded = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(collect_list(struct($"ts", $"value")).as("vs"))
    val advice3 = Advisor.advise(Seq(unguarded), root)
    assert(advice3.singles.isEmpty && advice3.skipped.nonEmpty,
      s"unguarded collect_list must be skipped, got $advice3")
    // ...and a CASE WITH an else branch (every row still enters)
    val withElse = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(collect_list(when($"event_type" === "view", $"value")
        .otherwise(lit(0.0d))).as("vs"))
    val advice4 = Advisor.advise(Seq(withElse), root)
    assert(advice4.singles.isEmpty && advice4.skipped.nonEmpty,
      s"else-carrying CASE collect_list must be skipped, got $advice4")
  }

  test("bounds/count reads advise through their scalar shells: " +
       "graft_theta_bounds and graft_bitmap_count demands mint state members") {
    import graft.expr.{Bmp, Tht}
    val boundsQ = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(Tht.bounds(Tht.agg($"user_id")).as("b"))
      .orderBy("event_type")
    val countQ = () => Tables.events(spark, sf)
      .agg(Bmp.count(Bmp.agg(when($"event_type" === "click", $"user_id")))
        .as("clickers"))
    val root = java.nio.file.Files.createTempDirectory("graft_shelladv").toString
    val advice = Advisor.advise(Seq(boundsQ(), countQ()), root)
    assert(advice.skipped.isEmpty && advice.singles.nonEmpty, advice)
    val aggs = advice.singles.flatMap(_.spec.aggs)
    assert(aggs.exists { case _: RollupRouting.ThetaUniqOf => true; case _ => false },
      s"the bounds read must mint the theta member: $aggs")
    assert(aggs.exists {
        case RollupRouting.BitmapUniqOf(_: RollupRouting.ExprPat, _) => true
        case _ => false },
      s"the guarded count read must mint the bitmap member: $aggs")
    val boundsTruth = boundsQ().collect().toSeq
    val countTruth = countQ().collect().toSeq
    routedWith(advice) {
      val b = boundsQ()
      assert(!b.queryExecution.executedPlan.toString.contains("events.parquet"),
        s"the bounds read must route:\n${b.queryExecution.executedPlan}")
      assert(b.collect().toSeq == boundsTruth,
        "routed bounds must be bit-equal (value-set-deterministic states)")
      val c = countQ()
      assert(!c.queryExecution.executedPlan.toString.contains("events.parquet"),
        s"the guarded count read must route:\n${c.queryExecution.executedPlan}")
      assert(c.collect().toSeq == countTruth,
        "routed guarded count must be exact")
    }
  }

  test("a per-condition bitmap-state workload advises one BitmapUniqOf " +
       "member per guard pattern and the retention read routes") {
    import graft.expr.Bmp
    // the captured workload: the q247 condition-retention state build —
    // graft_bitmap_agg(CASE WHEN cond THEN user END) per condition
    val conds = Seq(
      $"event_type" === "purchase" && $"value" > 100.0d,
      $"event_type" === "click")
    def states = Tables.events(spark, sf).agg(
      Bmp.agg(when(conds(0), $"user_id")).as("bm0"),
      Bmp.agg(when(conds(1), $"user_id")).as("bm1"))
    val root = java.nio.file.Files.createTempDirectory("graft_retadvised").toString
    val advice = Advisor.advise(Seq(states), root)
    assert(advice.skipped.isEmpty && advice.singles.size == 1, advice)
    val bms = advice.singles.head.spec.aggs.collect {
      case RollupRouting.BitmapUniqOf(_: RollupRouting.ExprPat, _) => 1
    }
    assert(bms.size == 2,
      s"two guard patterns must mint two bitmap members: ${advice.singles.head.spec.aggs}")
    val truth = ops.Behavior.retentionConds(Tables.events(spark, sf), conds)
      .collect().toSeq
    routedWith(advice) {
      val read = ops.Behavior.retentionConds(Tables.events(spark, sf), conds)
      val plan = read.queryExecution.executedPlan.toString
      assert(!plan.contains("events.parquet"),
        s"the advised bitmap MV must serve the retention read:\n$plan")
      assert(read.collect().toSeq == truth,
        "advised condition cells must be bit-equal to the live scan")
    }
  }
}
