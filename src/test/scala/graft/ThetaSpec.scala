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

  test("unsupported input types are refused at analysis") {
    val df = Seq((1, Seq(1, 2))).toDF("k", "arr")
    val ex = intercept[Exception] {
      df.groupBy($"k").agg(Tht.estimate(Tht.agg($"arr"))).collect()
    }
    assert(ex.getMessage.contains("graft_theta_agg"),
      s"refusal must name the function: ${ex.getMessage}")
  }
}
