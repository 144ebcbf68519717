package graft

import org.apache.spark.sql.functions._

/** Dev phase-timing probe for the big lifecycle queries (r19). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/region.parquet").count() // warm JVM

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // ——— q173 phases ———
    for (round <- 1 to 2) {
      println(s"=== q173 round $round")
      import graft.plans.RollupRouting
      val base = java.nio.file.Files.createTempDirectory("probe_ttl_orders")
      val lakeDir = base.resolve("orders_ttl_lake").toString
      val rollupDir = base.resolve("orders_ttl_rollup").toString
      val spec = ops.Rollups.ordersSpec(rollupDir).copy(sourceSuffix = "orders_ttl_lake")
      val orders97 = graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderdate").cast("timestamp") >=
                  lit("1997-01-01 00:00:00").cast("timestamp") &&
                col("o_orderdate").cast("timestamp") <
                  lit("1998-01-01 00:00:00").cast("timestamp"))
      t("write lake")(ops.Lifecycle.writeDayPartitionedLakeFast(orders97, spec, lakeDir))
      val cutoffUs =
        java.time.Instant.parse("1997-07-01T00:00:00Z").toEpochMilli * 1000L
      val expireTasks = t("sizing read") {
        val lake = spark.read.parquet(lakeDir)
        math.max(8,
          (lake.queryExecution.optimizedPlan.stats.sizeInBytes / BigInt(64L << 20))
            .min(BigInt(2048)).toInt)
      }
      t("expire")(ops.Lifecycle.expireIntoRollup(spark, lakeDir, spec, cutoffUs, expireTasks))
      val df = t("routed read plan") {
        ops.Rollups.withRoutingSpecs(spark, Seq(spec)) {
          spark.read.parquet(lakeDir)
            .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
            .filter(col("o_orderdate") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
                    col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
            .groupBy(to_date(col("o_orderdate")).as("o_day"))
            .agg(ops.Fns.dsum(col("o_totalprice")).as("daily_sales"),
                 count(lit(1)).as("n_orders"))
            .orderBy("o_day")
        }
      }
      t("routed read exec")(df.write.format("noop").mode("overwrite").save())
    }

    // ——— q171 phases ———
    for (round <- 1 to 2) {
      println(s"=== q171 round $round")
      import graft.plans.RollupRouting
      val rollupDir = java.nio.file.Files.createTempDirectory("probe_revseg_hy")
        .resolve("revseg_rollup").toString
      val spec = RollupRouting.JoinSpec.revenueSegmentDated(rollupDir)
      val cut = lit("1997-01-01 00:00:00").cast("timestamp")
      val o = graft.Tables.orders(spark, sfDir)
        .filter(col("o_orderdate").cast("timestamp") < cut)
      val c = graft.Tables.customer(spark, sfDir)
      t("maintain (stream drain)") {
        val rawSchema = spark.read.parquet(s"$sfDir/lineitem.parquet").schema
        val st = spark.readStream.schema(rawSchema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "lineitem.parquet").parquet(sfDir)
        streaming.Live.maintainJoinRollup(
          st, "lineitem", Map("orders" -> o, "customer" -> c), spec)
      }
      t("compact")(ops.Rollups.compactJoinRollup(spark, spec))
      val df = t("routed plan") {
        ops.Rollups.withRoutingJoinSpecs(spark, Seq(spec)) {
          ops.StarJoins.revenueBySegment(spark, sfDir)
        }
      }
      t("routed exec")(df.write.format("noop").mode("overwrite").save())
      if (round == 2) {
        // the routed INNER plan (before the localCheckpoint snapshot):
        // rebuild under routing, execute with noop, print the final plan
        import graft.plans.RollupRouting
        val prev = spark.experimental.extraOptimizations
        RollupRouting.registerJoin(spec)
        spark.experimental.extraOptimizations =
          prev :+ new RollupRouting.RuleImpl(spark)
        try {
          val inner = ops.StarJoins.revenueBySegment(spark, sfDir)
          t("inner routed exec")(
            inner.write.format("noop").mode("overwrite").save())
          println(inner.queryExecution.executedPlan.toString.take(9000))
        } finally {
          spark.experimental.extraOptimizations = prev
          RollupRouting.clear()
        }
      }
    }
    spark.stop()
  }
}
