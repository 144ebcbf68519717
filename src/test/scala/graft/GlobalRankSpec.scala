package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GlobalRank

/** Distributed global rank ≡ the single-partition window it replaces —
  * exact rank equality across many partitions, plus the ntile /
  * percent_rank reconstructions against Spark's own window functions
  * over every (n, k) shape that exercises the uneven-tile arithmetic. */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("withRank equals the unpartitioned window rank on a shuffled fixture") {
    // values chosen to collide heavily on the primary key so the unique
    // tiebreaker (id) does the ordering work across range boundaries
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("v", pmod(col("id") * 37, lit(50)))
      .repartition(13) // scatter before ranking
    val (ranked, n) = GlobalRank.withRank(
      df, Seq(col("v").desc, col("id")), "rnk", partitions = 7)
    assert(n == 2000L)
    val w = Window.orderBy(col("v").desc, col("id"))
    val expected = df.withColumn("exp", row_number().over(w).cast("long"))
    val joined = ranked.join(expected, Seq("id", "v"))
    assert(joined.filter(col("rnk") =!= col("exp")).count() == 0)
    assert(ranked.agg(min("rnk"), max("rnk"), countDistinct("rnk")).head() ==
      org.apache.spark.sql.Row(1L, 2000L, 2000L))
  }

  test("ntile and percent_rank reconstructions match Spark's window functions") {
    for (n <- Seq(1, 3, 4, 5, 7, 16, 97); k <- Seq(1, 2, 4, 5, 13)) {
      val df = spark.range(1, n + 1).toDF("id")
      val w = Window.orderBy(col("id"))
      val viaWindow = df
        .withColumn("t", ntile(k).over(w).cast("long"))
        .withColumn("p", percent_rank().over(w))
      val viaRank = df
        .withColumn("t", GlobalRank.ntileFromRank(col("id"), n, k).cast("long"))
        .withColumn("p", GlobalRank.percentRankFromRank(col("id"), n))
      val diff = viaWindow.except(viaRank).count() +
        viaRank.except(viaWindow).count()
      assert(diff == 0, s"mismatch at n=$n k=$k")
    }
  }

  test("empty input ranks to an empty frame with n = 0") {
    val df = spark.range(0).toDF("id")
    val (ranked, n) = GlobalRank.withRank(df, Seq(col("id")), "rnk")
    assert(n == 0L && ranked.count() == 0)
  }

  test("withRunningTotal equals the unpartitioned cumulative window") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("v", pmod(col("id") * 37, lit(50)))
      .withColumn("toks", pmod(col("id") * 7919, lit(400)) + 1)
      .repartition(13)
    val cum = GlobalRank.withRunningTotal(
      df, Seq(col("v").desc, col("id")), col("toks"), "cum", partitions = 7)
    val w = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("exp",
      sum(col("toks").cast("decimal(38,6)")).over(w))
    val joined = cum.join(expected, Seq("id", "v", "toks"))
    assert(joined.count() == 2000)
    assert(joined.filter(col("cum") =!= col("exp")).count() == 0)
  }

  test("withRunningTotal on empty input returns an empty frame") {
    val df = spark.range(0).toDF("id").withColumn("toks", lit(1L))
    val cum = GlobalRank.withRunningTotal(df, Seq(col("id")), col("toks"), "cum")
    assert(cum.count() == 0)
  }
}
