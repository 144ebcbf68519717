package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Fns._

/** Skew-handling operators (the reference's hot-address problem:
  * top-senders concentrate volume on a handful of keys,
  * `usdc-transfers/README.md:73-78`).
  *
  * Salted two-stage aggregation: stage 1 groups by (key, salt) so a hot
  * key's rows spread over N reducers; stage 2 merges the N partial
  * states per key. Correct for any associative aggregate — here the
  * decimal sums and counts re-merge losslessly (A6), which is why this
  * query can share the plain rollup's oracle.
  *
  * Note Spark's map-side partial aggregation already absorbs most
  * aggregation skew; explicit salting is the tool for when the
  * *post-shuffle* key cardinality is small enough that single reducers
  * still drown (or for skewed JOIN keys, where the same trick splits the
  * hot key across copies of the build side). AQE's skew-join handles the
  * join case automatically when statistics surface it.
  */
object Skew {

  /** Salted daily rollup — identical results to [[Rollups.daily]]. */
  def saltedDaily(spark: SparkSession, sfDir: String, buckets: Int = 8): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(buckets)))
      .groupBy(to_date(col("ts")).as("day"), col("user_id"), col("salt"))
      .agg(sum(col("value").cast("decimal(38,6)")).as("v"), count(lit(1)).as("c"))
      .groupBy(col("day"), col("user_id"))
      .agg(sum(col("v")).cast("double").as("total_value"),
           sum(col("c")).as("tx_count"))
      .orderBy("day", "user_id")

  /** Salted shuffle join: the manual fix when ONE join key drowns its
    * reducer and AQE's skew split cannot apply (e.g. the skewed side
    * feeds a co-partitioned downstream op, or stats miss the skew).
    *
    * The probe (skewed) side gets a random-ish salt in [0, buckets);
    * the build side is replicated `buckets` times with every salt
    * value. The join key becomes (key, salt): a hot key's rows now land
    * on `buckets` distinct reducers instead of one. Row-for-row
    * equivalent to the unsalted join — every probe row still meets
    * exactly one copy of each matching build row.
    *
    * Cost model at 100 TB: build-side bytes × buckets extra shuffle
    * write — worth it when the hot reducer is the wall-clock tail;
    * prefer `broadcast()` when the build side fits, AQE skew-join when
    * stats surface the skew. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val salted = probe
      .withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val replicated = build
      .withColumn("__salt", explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** [[StarJoins.topCustomers]] through [[saltedJoin]] — shares q17's
    * oracle: the skew rewrite must be invisible in results. (With a
    * dim this small Spark will still broadcast; the salting pattern is
    * exercised and verified, the shuffle path engages when the build
    * side outgrows the broadcast threshold.) */
  def saltedTopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .withColumn("custkey", col("o_custkey"))
    val customer = Tables.customer(spark, sfDir)
      .withColumn("custkey", col("c_custkey"))
    saltedJoin(orders, customer, "custkey")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(dsum(col("o_totalprice")).as("volume"), count(lit(1)).as("n_orders"))
      .orderBy(col("volume").desc, col("c_custkey"))
      .limit(10)
  }
}
