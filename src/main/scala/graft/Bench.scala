package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    // Warm the session (JVM, codegen pipeline, parquet reader init) so
    // the first timed query isn't charged for process startup.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    spark.range(100).selectExpr("sum(id)").count()
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink: full materialization of every output column — count()
      // would let Catalyst prune aggregate values and eliminate sorts,
      // under-measuring the actual query work.
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() } catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal rounding keeps the whole JSON line under ~2 kB so a
    // tail-window capture of the sbt log still contains it intact.
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    // totals cover SUCCESSFUL queries only — a failure's elapsed time is
    // not work done; the failed list makes partial runs machine-visible
    val ok = results.filter { case (k, _) => !failed.contains(k) }
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    // informational split: streaming queries carry constant microbatch +
    // state-store machinery that a continuous deployment amortizes
    val streaming = Set("q32_stream_daily", "q52_stream_join",
                        "q56_stateful_totals", "q96_stream_sessions")
    val batchTotal = ok.collect {
      case (k, v) if !streaming.contains(k) => v
    }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","batch_value":${f(batchTotal)},"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,"sink":"noop"}""")
    spark.stop()
  }
}
