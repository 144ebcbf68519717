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
