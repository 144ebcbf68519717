package graft

/** Dev harness: time one named query (default sf0.1, 32 threads), twice
  * — cold then warm — and print both. Usage:
  *   sbt "runMain graft.TimeOne q63_cc_clusters [sfDir]"
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val fn = SparkEntry.queries(name)
    for (run <- Seq("cold", "warm")) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name $run ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
