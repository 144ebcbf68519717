package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerGroup

/** The custom bounded-heap top-k operator (logical node + strategy +
  * physical exec) must agree row-for-row with the window-rank
  * composition and must plan without any per-group sort. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native top-k equals window row_number composition on events") {
    val native = ops.Windows.topDaysPerUserNative(spark, TestSpark.sf).collect()
    val window = ops.Windows.topDaysPerUser(spark, TestSpark.sf).collect()
    assert(native.length == window.length && native.length > 0)
    assert(native.map(_.toSeq) sameElements window.map(_.toSeq))
  }

  test("plan is Exchange -> heap exec, with no sort below the operator") {
    val daily = Tables.events(spark, TestSpark.sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("day_value"))
    val plan = TopKPerGroup.topK(
      daily, Seq("user_id"), Seq("day_value" -> false, "day" -> true), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopKPerGroup"))
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
    // the window composition by contrast needs a full per-partition sort
    val w = Window.partitionBy($"user_id").orderBy($"day_value".desc, $"day")
    val windowPlan = daily.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= 3).queryExecution.executedPlan.toString
    assert(windowPlan.contains("Sort "))
  }

  test("ties, k larger than group, and null ordering behave like row_number") {
    val df = Seq(
      ("a", Some(5.0), 1), ("a", Some(5.0), 2), ("a", Some(1.0), 3),
      ("b", Some(2.0), 1), ("b", None, 2),
      ("c", Some(9.0), 1)
    ).toDF("g", "v", "tie")
    val native = TopKPerGroup.topK(df, Seq("g"), Seq("v" -> false, "tie" -> true), 2)
      .orderBy("g", "rnk").collect().map(_.toSeq)
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"tie")
    val expected = df.withColumn("rnk", row_number().over(w).cast("int"))
      .filter($"rnk" <= 2).orderBy("g", "rnk").collect().map(_.toSeq)
    assert(native sameElements expected)
  }

  /** r15: topKWeighted — exact under capacity against the rank truth,
    * merge across partitions deterministic, negative weights refused. */
  test("topKWeighted = exact weighted rank under capacity; merge deterministic") {
    import graft.expr.TkW
    val events = Tables.events(spark, TestSpark.sf)
    val weight = round($"value" * lit(100.0d)).cast("long")
    val got = ops.Rollups.topKWeightedUsers(spark, TestSpark.sf)
      .collect().map(_.toSeq).toSeq
    val w = Window.partitionBy($"event_type").orderBy($"wt".desc, $"user_id")
    val truth = events.groupBy($"event_type", $"user_id")
      .agg(sum(weight).as("wt"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"event_type", $"user_id", $"wt")
      .orderBy($"event_type", $"wt".desc, $"user_id")
      .collect().map(_.toSeq).toSeq
    assert(got == truth, "the sketch report must equal the exact weighted rank")
    // split-build states merge to the single-pass report
    val single = events.groupBy($"event_type")
      .agg(TkW.topK(TkW.agg($"user_id", weight), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    val merged = events.withColumn("half", pmod($"user_id", lit(2)))
      .groupBy($"event_type", $"half")
      .agg(TkW.agg($"user_id", weight).as("st"))
      .groupBy($"event_type")
      .agg(TkW.topK(TkW.merge($"st"), 3).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    single.foreach { case (k, v) => assert(merged(k) == v,
      s"merged weighted top-k for $k must equal the single pass") }
    // a negative weight is a contract violation, not a silent skip
    val ex = intercept[Exception] {
      Seq((1L, -5L)).toDF("u", "w")
        .agg(TkW.topK(TkW.agg($"u", $"w"), 1)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("weighted top-k member routes: MV states read, bit-equal; guards; " +
       "lattice; catalog; advised") {
    import graft.expr.TkW
    import graft.plans.RollupRouting
    val sf = TestSpark.sf
    val dir = java.nio.file.Files.createTempDirectory("graft_topkw")
      .resolve("topkwrollup").toString
    val spec = ops.Rollups.topKWeightedSpec(dir)
    RollupRouting.buildPartials(Tables.events(spark, sf), spec).write.parquet(dir)
    val weight = round($"value" * lit(100.0d)).cast("long")
    val q = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(TkW.topK(TkW.agg($"user_id", weight), 3).as("top"),
           count(lit(1)).as("n"))
      .orderBy("event_type")
    val truth = q().collect().toSeq
    RollupRouting.register(spec)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("topkwrollup") && !plan.contains("events.parquet"),
        s"the weighted top-k read must route onto the MV states:\n$plan")
      assert(routed.collect().toSeq == truth,
        "routed weighted top-k must be bit-equal to live (exact regime)")
      // a DIFFERENT capacity is a different sketch — stays live
      val otherCap = Tables.events(spark, sf)
        .groupBy($"event_type")
        .agg(TkW.topK(TkW.agg($"user_id", weight, maxMapSize = 64), 3).as("top"))
      assert(otherCap.queryExecution.executedPlan.toString.contains("events.parquet"),
        "a different maxMapSize must not route onto the registered state")
      // a DIFFERENT weight measure is a different state — stays live
      val otherWeight = Tables.events(spark, sf)
        .groupBy($"event_type")
        .agg(TkW.topK(TkW.agg($"user_id",
          round($"value" * lit(10.0d)).cast("long")), 3).as("top"))
      assert(otherWeight.queryExecution.executedPlan.toString
          .contains("events.parquet"),
        "a different weight pattern must not route onto the registered state")
      // LATTICE: the weight-map sum is subtotal-safe, so a ROLLUP
      // dashboard over the estimate routes per grain
      spark.experimental.extraOptimizations = Nil
      val latQ = () => Tables.events(spark, sf)
        .rollup($"event_type")
        .agg(TkW.topK(TkW.agg($"user_id", weight), 2).as("top"))
        .orderBy($"event_type".asc_nulls_first)
      val latPlain = latQ().collect().toSeq
      spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
      val lat = latQ()
      assert(lat.queryExecution.executedPlan.toString.contains("topkwrollup"),
        "the weighted top-k lattice must route through the states")
      assert(lat.collect().toSeq == latPlain,
        "every lattice grain's weighted top-k must equal the live one")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
    // JSON catalog: the two-pattern member saves, loads (ExprPat
    // reparses from SQL), is a save-load-save fixed point, and the
    // RELOADED registration still routes the unchanged query
    val regDir = java.nio.file.Files.createTempDirectory("graft_topkwreg")
    val reg = regDir.resolve("r.json").toString
    val reg2 = regDir.resolve("r2.json").toString
    RollupRouting.register(spec)
    RollupRouting.saveRegistry(reg)
    RollupRouting.clear()
    RollupRouting.loadRegistry(spark, reg)
    RollupRouting.saveRegistry(reg2)
    assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(reg)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(reg2))),
      "the weighted top-k catalog document must be a save-load-save fixed point")
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      assert(routed.queryExecution.executedPlan.toString.contains("topkwrollup"),
        "the RELOADED TopKWeightedOf registration must still route")
      assert(routed.collect().toSeq == truth)
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
    // the raw weighted-rank dashboard ADVISES the member
    val root = java.nio.file.Files.createTempDirectory("graft_topkwadv").toString
    val advice = graft.plans.Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty && advice.singles.size == 1, advice)
    assert(advice.singles.head.spec.aggs.exists {
        case RollupRouting.TopKWeightedOf(_, _, _, 1024) => true; case _ => false },
      s"the weighted-rank demand must mint its member: ${advice.singles.head.spec.aggs}")
  }

  test("weighted top-k member routes on the JOIN path: top parts by " +
       "summed quantity per segment, join never runs") {
    import graft.expr.TkW
    import graft.plans.RollupRouting
    val sf = TestSpark.sf
    val weight = $"l_quantity".cast("long")
    val spec = RollupRouting.JoinSpec(
      java.nio.file.Files.createTempDirectory("graft_jtopkw")
        .resolve("jtopkwrollup").toString,
      tables = Set("lineitem", "orders", "customer"),
      joinKeys = Set(("l_orderkey", "o_orderkey"), ("c_custkey", "o_custkey")),
      groupings = Map("c_mktsegment" -> "c_mktsegment"),
      aggs = Seq(
        RollupRouting.TopKWeightedOf(RollupRouting.ColRef("l_partkey"),
          RollupRouting.ExprPat(weight), "pq_topkw_p"),
        RollupRouting.CountStarTo("n_lines_p")))
    RollupRouting.buildJoinPartials(
      Map("lineitem" -> Tables.lineitem(spark, sf),
          "orders" -> Tables.orders(spark, sf),
          "customer" -> Tables.customer(spark, sf)), spec)
      .write.parquet(spec.rollupPath)
    val q = () => Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(TkW.topK(TkW.agg($"l_partkey", weight), 2).as("top"),
           count(lit(1)).as("n"))
      .orderBy("c_mktsegment")
    val truth = q().collect().toSeq
    RollupRouting.registerJoin(spec)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("jtopkwrollup") && !plan.contains("lineitem.parquet"),
        s"the join-path weighted top-k must read the MV, join-free:\n$plan")
      assert(routed.collect().toSeq == truth,
        "the routed join dashboard must be bit-equal (exact regime)")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("funnel family SQL surface: graft_funnel_level modes, " +
       "graft_sequence_match, rejection of junk modes") {
    Functions.registerAll(spark)
    val rows = spark.sql(
      """SELECT graft_funnel_level(seq, 3, 100L) AS greedy,
                graft_funnel_level(seq, 3, 100L, 'max_anchors') AS ma,
                graft_funnel_level(seq, 3, 100L, 'strict_order') AS so,
                graft_sequence_match(seq, '(?1).*(?2)') AS m
         FROM (SELECT array(
                 named_struct('ts', TIMESTAMP '2024-01-01 00:00:00', 'step', 0),
                 named_struct('ts', TIMESTAMP '2024-01-01 00:00:01', 'step', -1),
                 named_struct('ts', TIMESTAMP '2024-01-01 00:00:02', 'step', 1)
               ) AS seq)""").collect().head
    // window 100 MICROS: the 1-second gaps blow it — greedy and
    // max-anchor level 1; strict_order stops at the -1 row (level 1);
    // the unwindowed pattern still matches
    assert(rows.getInt(0) == 1 && rows.getInt(1) == 1 && rows.getInt(2) == 1)
    assert(rows.getBoolean(3), "(?1).*(?2) must match regardless of window")
    val wide = spark.sql(
      """SELECT graft_funnel_level(seq, 2, 10000000L) AS greedy
         FROM (SELECT array(
                 named_struct('ts', TIMESTAMP '2024-01-01 00:00:00', 'step', 0),
                 named_struct('ts', TIMESTAMP '2024-01-01 00:00:01', 'step', 1)
               ) AS seq)""").collect().head
    assert(wide.getInt(0) == 2, "a 10-second window must chain 1-second steps")
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_funnel_level(array(named_struct('ts', " +
        "TIMESTAMP '2024-01-01 00:00:00', 'step', 0)), 2, 10L, 'bogus')")
        .collect()
    }
    assert(ex.getMessage.contains("bogus"),
      s"junk modes must be named in the refusal: ${ex.getMessage}")
  }

  test("weighted top-k states stream-maintain: merged partials equal the batch answer") {
    import graft.expr.TkW
    import graft.plans.RollupRouting
    val sf = TestSpark.sf
    val base = java.nio.file.Files.createTempDirectory("graft_topkwmv")
    val weight = round($"value" * lit(100.0d)).cast("long")
    val spec = RollupRouting.Spec("events.parquet",
      base.resolve("topkwstream").toString, grain = "day", timeCol = "ts",
      keyCols = Map("event_type" -> "event_type"),
      aggs = Seq(
        RollupRouting.TopKWeightedOf(RollupRouting.ColRef("user_id"),
          RollupRouting.ExprPat(weight), "user_topkw_p"),
        RollupRouting.CountStarTo("c_p")))
    val events = Tables.events(spark, sf)
    val srcDir = base.resolve("deliveries").toString
    val cut = lit("2024-01-15 12:00:00").cast("timestamp") // mid-day: groups split
    events.filter($"ts" < cut).write.mode("append").parquet(srcDir)
    events.filter($"ts" >= cut).write.mode("append").parquet(srcDir)
    graft.streaming.Live.maintainRollup(
      spark.readStream.schema(events.schema).option("maxFilesPerTrigger", "1")
        .parquet(srcDir), spec)
    val dayQ = () => Tables.events(spark, sf)
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(TkW.topK(TkW.agg($"user_id", weight), 2).as("top"),
           count(lit(1)).as("n"))
      .orderBy("day", "event_type")
    val truth = dayQ().collect().toSeq
    RollupRouting.register(spec)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val maintained = dayQ()
      assert(maintained.queryExecution.executedPlan.toString.contains("topkwstream"),
        "the stream-maintained weighted top-k rollup must answer")
      assert(maintained.collect().toSeq == truth,
        "stream-maintained states must sum-merge to the batch answer")
      ops.Rollups.compactRollup(spark, spec)
      assert(spark.read.parquet(spec.rollupPath).groupBy("day", "event_type")
               .count().filter($"count" > 1).isEmpty,
        "compaction must restore one row per (day, type)")
      assert(dayQ().collect().toSeq == truth,
        "compaction must not change any routed answer")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
  }

  test("multi-column grouping and string order keys") {
    val df = Seq(
      ("x", 1, "bb", 10L), ("x", 1, "aa", 20L), ("x", 2, "cc", 30L),
      ("y", 1, "dd", 40L), ("y", 1, "ee", 50L)
    ).toDF("g1", "g2", "s", "n")
    val native = TopKPerGroup.topK(df, Seq("g1", "g2"), Seq("s" -> true), 1)
      .orderBy("g1", "g2").collect().map(_.toSeq)
    val w = Window.partitionBy($"g1", $"g2").orderBy($"s")
    val expected = df.withColumn("rnk", row_number().over(w).cast("int"))
      .filter($"rnk" <= 1).orderBy("g1", "g2").collect().map(_.toSeq)
    assert(native sameElements expected)
  }
}
