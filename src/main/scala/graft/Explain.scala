package graft

/** Dev tool: print the executed plan (and optionally run) a named
  * SparkEntry query — `runMain graft.Explain q46_set_cohorts [sfDir]`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.local(cpus)
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"rows=$n sec=${(System.nanoTime() - t0) / 1e9}")
    spark.stop()
  }
}
