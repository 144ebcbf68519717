package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scale-safe replacement for an
  * unpartitioned window (`Window.orderBy(...)` with no PARTITION BY),
  * which moves EVERY row to a single task and caps the operator at one
  * core's memory and throughput no matter how large the cluster is.
  *
  * Two-pass plan (the classic distributed zipWithIndex, in DataFrame
  * terms so downstream stays codegen'd):
  *
  *  1. `repartitionByRange` on the ordering — rows in partition p all
  *     sort before rows in partition p+1 (Spark's RangePartitioner
  *     routes equal keys to one partition, and every caller's ordering
  *     ends in a unique tiebreaker).  The layout is frozen with
  *     `localCheckpoint`: the range sampler re-draws per execution, and
  *     the counts pass and the rank pass must see identical boundaries.
  *  2. Per-partition row counts are collected (bounded by the PARTITION
  *     COUNT — a cluster-config constant, not a data size — so the
  *     driver hop is legitimate) and turned into cumulative offsets;
  *     a partition-local `row_number` plus the broadcast offset is the
  *     exact global rank.
  *
  * Cost at 100 TB: one range shuffle + one hash shuffle of the rank
  * INPUT (always a pre-reduced table here — per-user aggregates,
  * distinct dimension values), vs. the single-partition window's
  * all-rows-to-one-task collapse. Every consumer below feeds it an
  * aggregate, never a fact scan. */
object GlobalRank {

  private val Money = org.apache.spark.sql.types.DecimalType(38, 6)

  /** Shared two-pass scaffolding: freeze a range layout over `order`
    * (the sampler re-draws per execution, and both passes must see the
    * same boundaries), collect ONE per-partition aggregate as an exact
    * decimal, and return the laid-out frame, the broadcastable
    * (__pid, __off) prefix-offset frame, and the grand total. Offsets
    * travel as STRINGS and cast to decimal on the far side: tuple
    * reflection would infer DECIMAL(38,18), whose 20 integer digits
    * overflow before money's 32 at extreme totals. */
  private def rangeLayoutWithOffsets(df: DataFrame, order: Seq[Column],
      partitions: Int, stat: Column): (DataFrame, DataFrame, java.math.BigDecimal) = {
    val spark = df.sparkSession
    val nPart =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(nPart, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val stats = parted.groupBy(col("__pid")).agg(stat.cast(Money).as("s"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) java.math.BigDecimal.ZERO
                                else r.getDecimal(1)))
      .sortBy(_._1)
    val total = stats.map(_._2)
      .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val offsets = stats.map(_._1)
      .zip(stats.map(_._2).scanLeft(java.math.BigDecimal.ZERO)(_.add(_)))
      .map { case (p, o) => (p, o.toPlainString) }
      .toSeq
    val offDf = spark.createDataFrame(offsets).toDF("__pid", "__off")
      .withColumn("__off", col("__off").cast(Money))
    (parted, offDf, total)
  }

  /** Appends 1-based global rank over `order` as `rankCol` (LongType).
    * Returns the ranked frame and the total row count (free — it is the
    * sum of the per-partition counts already on the driver).
    *
    * `order` must be a total order (include a unique tiebreaker):
    * ties split across a range boundary would otherwise rank
    * nondeterministically. */
  def withRank(df: DataFrame, order: Seq[Column], rankCol: String,
               partitions: Int = 0): (DataFrame, Long) = {
    val (parted, offDf, total) =
      rangeLayoutWithOffsets(df, order, partitions, count(lit(1)))
    val local = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val ranked = parted
      .withColumn("__local", row_number().over(local))
      .join(broadcast(offDf), "__pid")
      .withColumn(rankCol, (col("__off") + col("__local")).cast("long"))
      .drop("__pid", "__local", "__off")
    (ranked, total.longValueExact)
  }

  /** Appends the global RUNNING TOTAL of `value` over `order` as
    * `outCol` — the distributed form of
    * `sum(value) OVER (ORDER BY order ROWS UNBOUNDED PRECEDING)`, which
    * as a plain window would funnel every row through one task. Same
    * two-pass shape as [[withRank]] (shared scaffolding): range-layout
    * once, collect the per-partition SUMS (bounded by partition count),
    * and add each partition's prefix offset to its local cumulative
    * frame.
    *
    * `value` is summed as DECIMAL(38,6) — exact and associative, so the
    * distributed total is bit-equal to the single-task window whatever
    * the partition boundaries (see [[Fns.dsum]]). Returned column is
    * DECIMAL(38,6); cast at the call site. */
  def withRunningTotal(df: DataFrame, order: Seq[Column], value: Column,
                       outCol: String, partitions: Int = 0): DataFrame = {
    val (parted, offDf, _) = rangeLayoutWithOffsets(
      df.withColumn("__v", value.cast(Money)), order, partitions,
      sum(col("__v")))
    val frame = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn("__local", sum(col("__v")).over(frame))
      .join(broadcast(offDf), "__pid")
      .withColumn(outCol, (col("__off") + col("__local")).cast(Money))
      .drop("__pid", "__local", "__off", "__v")
  }

  /** SQL `ntile(k)` reconstructed from a global rank: with q = n/k and
    * r = n mod k, the first r tiles hold q+1 rows and the rest q.
    * Double-precision floor is exact here (operands < 2^53). */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    require(k >= 1, s"ntile bucket count must be >= 1, got $k")
    val q = n / k
    val r = n % k
    if (q == 0) rank // n <= k: tile i is exactly rank i
    else {
      val cut = r * (q + 1)
      when(rank <= cut, floor((rank + q) / lit(q + 1.0)))
        .otherwise(lit(r) + floor((rank - cut + q - 1) / lit(q.toDouble)))
    }
  }

  /** SQL `percent_rank()` from a global rank over a total order (no
    * ties): (rank - 1) / (n - 1), with the single-row edge case 0.0. */
  def percentRankFromRank(rank: Column, n: Long): Column =
    if (n <= 1) lit(0.0)
    else (rank - lit(1L)).cast("double") / lit((n - 1).toDouble)
}
