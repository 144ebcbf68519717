package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.expr.Tht

/** The theta set-algebra family (round 15): exact below nominal
  * entries, bounded error above, deterministic by value set. */
class ThetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  test("theta estimate = exact COUNT(DISTINCT) below nominal entries") {
    val got = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(Tht.estimate(Tht.agg($"user_id")).cast("long").as("est"),
           countDistinct($"user_id").as("truth"))
      .collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(2),
      s"type ${r.getString(0)}: theta ${r.getLong(1)} != exact ${r.getLong(2)}"))
  }

  test("theta intersect / aNotB = set-op truth on the fixture") {
    val truth = ops.Behavior.audienceOverlap(spark, sf).collect()
    // independent check: also_click + never_click partitions users
    truth.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"AND + A-NOT-B must partition the audience: $r")
    }
    val clickUsers = Tables.events(spark, sf)
      .filter($"event_type" === "click").select($"user_id").distinct()
    val viewUsers = Tables.events(spark, sf)
      .filter($"event_type" === "view").select($"user_id").distinct()
    val expectBoth = viewUsers.intersect(clickUsers).count()
    val viewRow = truth.find(_.getString(0) == "view").get
    assert(viewRow.getLong(2) == expectBoth,
      "theta AND must equal the exact intersection below nominal entries")
  }

  test("states are deterministic by value set: split build = single pass, bit-for-bit") {
    val df = Tables.events(spark, sf).select($"event_type", $"user_id")
    val single = df.groupBy($"event_type").agg(Tht.agg($"user_id").as("st"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val merged = df.withColumn("half", pmod($"user_id", lit(2)))
      .groupBy($"event_type", $"half").agg(Tht.agg($"user_id").as("st"))
      .groupBy($"event_type").agg(Tht.union($"st").as("st"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    single.foreach { case (k, bytes) =>
      assert(java.util.Arrays.equals(bytes, merged(k)),
        s"theta state for $k must be identical however the build was split")
    }
  }

  test("theta bounds: exact regime collapses to the exact count; " +
       "estimation regime brackets the truth and flags it") {
    // exact regime: every audience under 2^12 nominal entries
    ops.Behavior.audienceBounds(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(4), s"fixture states must be exact: $r")
      assert(r.getLong(1) == r.getLong(2) && r.getLong(1) == r.getLong(3),
        s"exact-regime bounds must collapse to the estimate: $r")
    }
    // estimation regime: 100k distinct at lgK 12 — flagged, bracketed
    val b = spark.range(100000)
      .agg(Tht.bounds(Tht.agg($"id")).as("b"))
      .select($"b.estimate", $"b.lower", $"b.upper", $"b.is_exact")
      .collect().head
    assert(!b.getBoolean(3), "100k >> 4096 nominal entries must flag estimation")
    assert(b.getDouble(1) <= 100000.0 && 100000.0 <= b.getDouble(2),
      s"2-sigma bounds must bracket the truth: $b")
    assert(b.getDouble(1) < b.getDouble(0) && b.getDouble(0) < b.getDouble(2),
      s"bounds must be a proper interval around the estimate: $b")
  }

  test("above nominal entries the estimate stays inside the published bound") {
    // 100k distinct longs >> 2^12 nominal entries: rsd ≈ 1/√4096 ≈
    // 1.6%; assert within 5% (≈ 3 sigma)
    val n = 100000
    val est = spark.range(n.toLong)
      .agg(Tht.estimate(Tht.agg($"id")).as("est"))
      .collect().head.getDouble(0)
    assert(math.abs(est - n) / n < 0.05,
      s"estimate $est must be within 5% of $n")
  }

  test("theta member routes: MV states read, fact never scanned, bit-equal; catalog; advised") {
    import graft.plans.RollupRouting
    val dir = java.nio.file.Files.createTempDirectory("graft_theta")
      .resolve("throllup").toString
    val spec = ops.Behavior.thetaSpec(dir)
    RollupRouting.buildPartials(Tables.events(spark, sf), spec).write.parquet(dir)
    val q = () => Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(Tht.estimate(Tht.agg($"user_id")).cast("long").as("users"),
           count(lit(1)).as("n"))
      .orderBy("event_type")
    val truth = q().collect().toSeq
    RollupRouting.register(spec)
    spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
    try {
      val routed = q()
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("throllup") && !plan.contains("events.parquet"),
        s"the theta read must route onto the MV states:\n$plan")
      assert(routed.collect().toSeq == truth,
        "routed theta estimates must be bit-equal to live (value-set determinism)")
      // a DIFFERENT lgK is a different sketch — stays live
      val other = Tables.events(spark, sf)
        .groupBy($"event_type")
        .agg(Tht.estimate(Tht.agg($"user_id", lgK = 10)).as("u"))
      assert(other.queryExecution.executedPlan.toString.contains("events.parquet"),
        "a different lgK must not route onto the registered state")
      // LATTICE: theta union is subtotal-safe, so a ROLLUP dashboard
      // over the estimate routes per grain — and the grainless spec's
      // keys-only lattice stays state-sized
      val latTruth = Tables.events(spark, sf)
        .rollup($"event_type")
        .agg(Tht.estimate(Tht.agg($"user_id")).cast("long").as("u"))
        .orderBy($"event_type".asc_nulls_first)
      spark.experimental.extraOptimizations = Nil
      val latPlain = latTruth.collect().toSeq
      spark.experimental.extraOptimizations = Seq(new RollupRouting.RuleImpl(spark))
      val lat = Tables.events(spark, sf)
        .rollup($"event_type")
        .agg(Tht.estimate(Tht.agg($"user_id")).cast("long").as("u"))
        .orderBy($"event_type".asc_nulls_first)
      assert(lat.queryExecution.executedPlan.toString.contains("throllup"),
        "the theta lattice must route through the states")
      assert(lat.collect().toSeq == latPlain,
        "every lattice grain's theta estimate must equal the live one")
    } finally {
      spark.experimental.extraOptimizations = Nil
      RollupRouting.clear()
    }
    // JSON catalog fixed point
    val regDir = java.nio.file.Files.createTempDirectory("graft_threg")
    val reg = regDir.resolve("r.json").toString
    val reg2 = regDir.resolve("r2.json").toString
    RollupRouting.register(spec)
    RollupRouting.saveRegistry(reg)
    RollupRouting.clear()
    RollupRouting.loadRegistry(spark, reg)
    assert(RollupRouting.registered.contains(spec),
      "ThetaUniqOf must survive the JSON catalog round-trip")
    RollupRouting.saveRegistry(reg2)
    assert(java.util.Arrays.equals(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(reg)),
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(reg2))))
    RollupRouting.clear()
    // the raw theta dashboard ADVISES the member and routes
    val root = java.nio.file.Files.createTempDirectory("graft_thadv").toString
    val advice = graft.plans.Advisor.advise(Seq(q()), root)
    assert(advice.skipped.isEmpty && advice.singles.size == 1, advice)
    assert(advice.singles.head.spec.aggs.exists {
        case RollupRouting.ThetaUniqOf(_, _, 12) => true; case _ => false },
      s"the theta demand must mint its member: ${advice.singles.head.spec.aggs}")
  }

  /** The T5 contract for the round's two new members in one spec:
    * bitmap + theta partials stream-maintain — micro-batched
    * deliveries scatter a group's states across appended blocks, the
    * routed read merges them to the batch answer, and compaction
    * (mergeColumnMap's OR-union shapes) restores one row per group
    * without changing anything. */
  test("bitmap + theta states stream-maintain: merged partials equal the batch answer") {
    import graft.plans.RollupRouting
    val base = java.nio.file.Files.createTempDirectory("graft_bmthmv")
    val spec = RollupRouting.Spec("events.parquet",
      base.resolve("bmthstream").toString, grain = "day", timeCol = "ts",
      keyCols = Map("event_type" -> "event_type"),
      aggs = Seq(
        RollupRouting.BitmapUniqOf("user_id", "users_bm"),
        RollupRouting.ThetaUniqOf("user_id", "users_theta"),
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
      .agg(countDistinct($"user_id").as("n_users"),
           Tht.estimate(Tht.agg($"user_id")).cast("long").as("theta_users"),
           count(lit(1)).as("n"))
      .orderBy("day", "event_type")
    val truth = dayQ().collect().toSeq
    graft.plans.RollupRouting.register(spec)
    spark.experimental.extraOptimizations =
      Seq(new graft.plans.RollupRouting.RuleImpl(spark))
    try {
      val maintained = dayQ()
      assert(maintained.queryExecution.executedPlan.toString.contains("bmthstream"),
        "the stream-maintained bitmap+theta rollup must answer")
      assert(maintained.collect().toSeq == truth,
        "stream-maintained states must OR-union to the batch answer")
      ops.Rollups.compactRollup(spark, spec)
      assert(spark.read.parquet(spec.rollupPath).groupBy("day", "event_type")
               .count().filter($"count" > 1).isEmpty,
        "compaction must restore one row per (day, type)")
      assert(dayQ().collect().toSeq == truth,
        "compaction must not change any routed answer")
    } finally {
      spark.experimental.extraOptimizations = Nil
      graft.plans.RollupRouting.clear()
    }
  }

  test("unsupported input types are refused at analysis") {
    val df = Seq((1, Seq(1, 2))).toDF("k", "arr")
    val ex = intercept[Exception] {
      df.groupBy($"k").agg(Tht.estimate(Tht.agg($"arr"))).collect()
    }
    assert(ex.getMessage.contains("graft_theta_agg"),
      s"refusal must name the function: ${ex.getMessage}")
  }
}
