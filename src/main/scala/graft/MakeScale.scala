package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: write a key-shifted N× replica of a fixture dir for scale
  * rehearsals past the largest driver fixture (docs/SCALING.md).
  * Usage: `runMain graft.MakeScale <srcSfDir> <outDir> [copies=10]`.
  *
  * Each copy shifts every entity key by copy × (max+1) so the replica
  * keeps the fixture's referential structure (every lineitem still
  * joins to exactly one order, every order to one customer) while
  * multiplying row counts and key cardinalities by N — what another
  * decade of data would do to the relational plans. `ts` is left
  * unchanged: event density per time unit grows ×N, the window span
  * doesn't (the fixture's own 0.01→0.1 step grows the span instead;
  * both regimes occur in production). The tiny dims (nation/region)
  * and the text corpus (documents/embeddings) are copied ×1: nation
  * keys are FK targets kept stable, and replicating TEXT would measure
  * duplicate-pathology (every doc in a 10-way near-dup clique), not
  * scale — the corpus decade is probed by the real 0.01→0.1 fixtures. */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    build(spark, args(0), args(1),
          if (args.length > 2) args(2).toInt else 10)
    spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, copies: Int): Unit = {
    def maxOf(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1L

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val custs = spark.read.parquet(s"$src/customer.parquet")
    val parts = spark.read.parquet(s"$src/part.parquet")
    val supps = spark.read.parquet(s"$src/supplier.parquet")
    val events = Tables.events(spark, src)
    val (oMax, cMax, pMax, sMax) =
      (maxOf(orders, "o_orderkey"), maxOf(custs, "c_custkey"),
       maxOf(parts, "p_partkey"), maxOf(supps, "s_suppkey"))
    val (eMax, uMax) = (maxOf(events, "event_id"), maxOf(events, "user_id"))

    // one scan per table: explode a copy-index array, shift keys by it
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val withI = df.withColumn("__i",
        explode(sequence(lit(0L), lit(copies - 1L))))
      shifts.foldLeft(withI) { case (d, (c, base)) =>
        d.withColumn(c, col(c) + col("__i") * base)
      }.drop("__i")
    }

    // 4 part files: enough that the per-file streaming drives
    // (maxFilesPerTrigger=1) exercise multi-batch accumulation without
    // their wall-clock becoming a micro-batch-count measurement, while
    // batch scans still parallelize fine — parquet splits by row-group
    // byte ranges, not by file count
    def write(df: DataFrame, name: String): Unit =
      df.repartition(4).write.mode("overwrite").parquet(s"$out/$name.parquet")

    write(replicate(orders, Map("o_orderkey" -> oMax, "o_custkey" -> cMax)), "orders")
    write(replicate(spark.read.parquet(s"$src/lineitem.parquet"),
      Map("l_orderkey" -> oMax, "l_partkey" -> pMax, "l_suppkey" -> sMax)), "lineitem")
    write(replicate(custs, Map("c_custkey" -> cMax)), "customer")
    write(replicate(parts, Map("p_partkey" -> pMax)), "part")
    write(replicate(supps, Map("s_suppkey" -> sMax)), "supplier")
    write(replicate(events, Map("event_id" -> eMax, "user_id" -> uMax)), "events")
    for (t <- Seq("nation", "region", "documents", "embeddings"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    println(s"[makescale] wrote ${copies}x replica of $src to $out")
  }
}
