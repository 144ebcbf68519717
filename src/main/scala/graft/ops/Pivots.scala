package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Fns._

/** UNION ALL composition operators (SURVEY §2.6 U1/U2, §2.2 F7).
  *
  * Scale note: `unionByName` is a zero-shuffle plan union — both branches
  * keep their own partitioning and the downstream aggregate shuffles
  * once on the group key. Aggregating each branch BEFORE the union (as
  * here) keeps the union input at rollup, not raw, cardinality.
  */
object Pivots {

  /** mv_address_activity pivot-by-role (U1,
    * `usdc-transfers/scripts/setup-analytics.sh:91-113`): the senders
    * view ∪ receivers view with a literal role discriminator (F7,
    * `'sender' AS address_type`). Star-schema casting: order customers
    * play senders, lineitem suppliers play receivers. */
  def unionPivot(spark: SparkSession, sfDir: String): DataFrame = {
    val buyers = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").as("address"))
      .agg(count(lit(1)).as("n_tx"), dsum(col("o_totalprice")).as("volume"))
      .withColumn("address_type", lit("buyer"))
    val suppliers = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_suppkey").as("address"))
      .agg(count(lit(1)).as("n_tx"), dsum(col("l_extendedprice")).as("volume"))
      .withColumn("address_type", lit("supplier"))
    buyers.unionByName(suppliers)
      .select("address_type", "address", "n_tx", "volume")
      .orderBy("address_type", "address")
  }

  /** Archive ∪ live view (U2, `usdc-transfers/sql/archive-strategy.sql:
    * 41-44`; lifecycle S11 :57-64): cold rows split off by a time
    * threshold and recomposed. With a partitioned lake this is a pure
    * multi-path scan — no shuffle until the rollup. */
  def archiveUnion(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val threshold = lit("2024-01-15 00:00:00").cast("timestamp")
    val archive = ev.filter(col("ts") < threshold).withColumn("store", lit("archive"))
    val live = ev.filter(col("ts") >= threshold).withColumn("store", lit("live"))
    archive.unionByName(live)
      .groupBy(col("store"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("value")).as("total_value"))
      .orderBy("store")
  }

  /** INTERSECT / EXCEPT cohorts (set ops beyond the reference's UNION
    * ALL): users who both clicked and purchased, and users who viewed
    * but never purchased. Each branch is a distinct projection of one
    * column, so the set ops run over deduplicated key sets — Spark plans
    * them as left-semi / left-anti aggregates on the hashed key, never
    * materializing a cross product. */
  def setCohorts(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def usersOf(t: String) =
      ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val both = usersOf("click").intersect(usersOf("purchase"))
      .withColumn("cohort", lit("click_and_purchase"))
    val viewOnly = usersOf("view").except(usersOf("purchase"))
      .withColumn("cohort", lit("view_no_purchase"))
    both.unionByName(viewOnly)
      .select(col("cohort"), col("user_id"))
      .orderBy("cohort", "user_id")
  }
}
