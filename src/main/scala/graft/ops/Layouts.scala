package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout mechanics (the P2 `ORDER BY` clustering
  * generalized — reference analog: MergeTree `ORDER BY (from, to, block)`
  * in `usdc-transfers/sql/analytics.sql`).
  *
  * A single-column sort gives perfect pruning on one column and none on
  * any other. Z-ordering ([[graft.expr.ZValue]]) range-partitions and
  * sorts by the Morton interleave of two dimensions instead: every file
  * then covers a tight BOX in (d1, d2) space, and parquet min/max stats
  * prune scans on either dimension. This is the layout to write 100 TB
  * fact tables in when the query mix filters on more than one column
  * (the Delta/Iceberg OPTIMIZE ZORDER pattern, built here from
  * repartitionByRange + sortWithinPartitions — no table format needed).
  *
  * Dimensions should be rank/quantile-normalized or already-dense small
  * ints: the curve balances only when both inputs occupy comparable
  * ranges. */
object Layouts {

  /** Rank-normalize a column to dense [0, buckets) via ntile — the
    * ZValue precondition when raw dims have skewed or incomparable
    * ranges. Ranks run over the DISTINCT values (not the fact rows)
    * through [[GlobalRank]] — a distinct dim can itself be huge (every
    * user_id at 100 TB), so the rank must stay partition-parallel, not
    * an unpartitioned-window single task — then joined back broadcast;
    * per-value ties stay deterministic. */
  def rankNormalize(df: DataFrame, dim: String, buckets: Int,
                    outCol: String): DataFrame = {
    val distinctDims = df.select(col(dim)).distinct()
    val (ranked, n) = GlobalRank.withRank(distinctDims, Seq(col(dim)), "__rank")
    val ranks = ranked
      .withColumn(outCol,
        (GlobalRank.ntileFromRank(col("__rank"), n, buckets) - 1).cast("long"))
      .drop("__rank")
    // left join + sentinel: an inner equi-join would silently DROP rows
    // whose dim is NULL (NULL never equi-joins); they get bucket 0
    df.join(broadcast(ranks), Seq(dim), "left")
      .withColumn(outCol, coalesce(col(outCol), lit(0L)))
  }

  /** Write `df` Z-clustered on (dimA, dimB) into `nFiles` range-
    * partitioned, internally sorted parquet files. */
  def writeZClustered(df: DataFrame, dimA: String, dimB: String,
                      outDir: String, nFiles: Int): Unit =
    df.withColumn("__z", graft.expr.ZValue(col(dimA), col(dimB)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** The single-column baseline: range-partitioned + sorted on one dim. */
  def writeLinear(df: DataFrame, dim: String, outDir: String,
                  nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(dim))
      .sortWithinPartitions(dim)
      .write.mode("overwrite").parquet(outDir)

  /** Per-file [min,max] boxes of two dims — the same statistics the
    * parquet footers carry, recomputed engine-side to evaluate a
    * layout's pruning power. */
  def fileBoxes(spark: SparkSession, dir: String,
                dimA: String, dimB: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(dimA)).as("a_min"), max(col(dimA)).as("a_max"),
           min(col(dimB)).as("b_min"), max(col(dimB)).as("b_max"))

  /** How many files a range predicate on one dim would have to read
    * under the layout in `dir` (stats-pruning simulation: a file is a
    * candidate iff its [min,max] overlaps [lo, hi]). */
  def candidateFiles(spark: SparkSession, dir: String, dimA: String,
                     dimB: String, onA: Boolean, lo: Long, hi: Long): Long = {
    val boxes = fileBoxes(spark, dir, dimA, dimB)
    val (mn, mx) = if (onA) ("a_min", "a_max") else ("b_min", "b_max")
    boxes.filter(col(mx) >= lo && col(mn) <= hi).count()
  }
}
