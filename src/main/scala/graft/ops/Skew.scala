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
}
