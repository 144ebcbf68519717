package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsOf
import graft.plans.BroadcastAsOf

/** Native broadcast as-of join: equivalence with the composed
  * union+window form, shuffle-free plan shape, and edge semantics. */
class BroadcastAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.sf

  private def purchasesAndViews() = {
    val ev = Tables.events(spark, sf)
    (ev.filter($"event_type" === "purchase")
       .select($"event_id", $"user_id", $"ts"),
     ev.filter($"event_type" === "view").select($"user_id", $"ts"))
  }

  test("native as-of equals the composed union+window form row-for-row") {
    val (p, v) = purchasesAndViews()
    def render(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", $"user_id", $"ts", $"__asof.ts".as("m"))
        .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
        .collect().sortBy(_._1)
    val native = render(BroadcastAsOf.join(p, v, Seq("user_id"), "ts", "ts"))
    val composed = render(AsOf.asofJoin(p, v, Seq("user_id"), "ts", "ts"))
    assert(native.nonEmpty && native.sameElements(composed))
    // both leave organic purchases (no prior view) unmatched
    assert(native.exists(_._4.isEmpty) || composed.forall(_._4.nonEmpty))
  }

  test("native as-of plans with zero exchanges on the probe side") {
    val (p, v) = purchasesAndViews()
    val plan = BroadcastAsOf.join(p, v, Seq("user_id"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("GraftBroadcastAsOf"), s"native node missing in:\n$plan")
    // the entire point: no shuffle anywhere — neither probe nor build
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle in:\n$plan")
  }

  test("native as-of rejects mismatched key and timestamp types loudly") {
    // int-vs-long key: the UnsafeRow hash probe would miss every row
    // (silent all-null __asof) — must throw instead
    val l = Seq((1, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, "x")).toDF("k", "t", "tag")
    val eKey = intercept[IllegalArgumentException] {
      BroadcastAsOf.join(l, r, Seq("k"), "t", "t")
    }
    assert(eKey.getMessage.contains("key 'k' type mismatch"))
    // date-vs-timestamp ts: days would compare against micros — throw
    val ld = Seq((1L, java.sql.Date.valueOf("2024-01-02"))).toDF("k", "d")
    val rt = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x"))
      .toDF("k", "t", "tag")
    val eTs = intercept[IllegalArgumentException] {
      BroadcastAsOf.join(ld, rt, Seq("k"), "d", "t")
    }
    assert(eTs.getMessage.contains("timestamp type mismatch"))
  }

  test("native as-of edge semantics: equal ts matches, future rows do not") {
    val left = Seq((1L, 100L), (2L, 50L), (3L, 10L)).toDF("id", "t")
    val right = Seq((7L, 50L, "a"), (7L, 90L, "b")).toDF("k", "t", "tag")
      .select($"k", $"t", $"tag")
    val l = left.withColumn("k", lit(7L)).select($"id", $"k", $"t")
    val out = BroadcastAsOf.join(l, right.select($"k", $"t", $"tag"),
        Seq("k"), "t", "t")
      .select($"id", $"__asof.tag".as("tag"))
      .as[(Long, Option[String])].collect().sortBy(_._1).toSeq
    // id 1 (t=100): latest right t<=100 is 90 → b; id 2 (t=50): equal ts
    // matches inclusively → a; id 3 (t=10): nothing prior → null
    assert(out == Seq((1L, Some("b")), (2L, Some("a")), (3L, None)))
  }

  test("native as-of rejects a fact-sized build side with a redirect, not an OOM") {
    val key = "spark.graft.broadcastAsOf.maxBuildRows"
    spark.conf.set(key, "10")
    try {
      val left = Seq((1L, 5L)).toDF("k", "t")
      val right = spark.range(100).select(($"id" % 3).as("k"), $"id".as("t"))
      val e = intercept[Exception] {
        BroadcastAsOf.join(left, right, Seq("k"), "t", "t").collect()
      }
      def messages(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
      assert(messages(e).exists(m => m != null && m.contains("AsOf.asofJoin")),
        s"expected the fact-fact redirect in: ${messages(e)}")
    } finally spark.conf.unset(key)
  }
}
