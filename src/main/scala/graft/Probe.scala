package graft

import org.apache.spark.sql.functions._

/** Dev probe: writer-task sweep for the 365-day partitioned lake write. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val orders97 = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderdate").cast("timestamp") >=
                lit("1997-01-01 00:00:00").cast("timestamp") &&
              col("o_orderdate").cast("timestamp") <
                lit("1998-01-01 00:00:00").cast("timestamp"))
      .withColumn("day", to_date(col("o_orderdate").cast("timestamp")))
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).resolve("out").toString
    def write(n: Int): Double = {
      val t0 = System.nanoTime()
      orders97.repartition(n, col("day"))
        .sortWithinPartitions("day", "o_custkey", "o_orderdate")
        .write.mode("overwrite").partitionBy("day").parquet(tmp("probe_n"))
      (System.nanoTime() - t0) / 1e9
    }
    val ns = Seq(2, 4, 8, 16, 32)
    ns.foreach(write) // warm
    val m = collection.mutable.Map[Int, collection.mutable.ArrayBuffer[Double]]()
    for (_ <- 1 to 4; n <- ns)
      m.getOrElseUpdate(n, collection.mutable.ArrayBuffer()) += write(n)
    for (n <- ns)
      println(f"[probe] n=$n%-3d " + m(n).map(x => f"$x%.2f").mkString(" ") +
        f"  med=${m(n).sorted.apply(m(n).size / 2)}%.2f")
    spark.stop()
  }
}
